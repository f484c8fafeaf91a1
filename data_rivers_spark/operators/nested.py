"""Ragged nested-structure operators (SURVEY.md §2.4 — the InTime deep-nest
extraction, intime_employees_pandas.py:41-148).

The reference iterates dynamically-typed JSON (a field may be a struct, a
list of structs, or a list of lists) row by row in pandas. Spark-first, the
engine declares the *most general* shape — array<struct<...>> — upstream
(the lenient ndjson reader coerces scalars to single-element arrays via the
declared schema) and resolves everything with native array expressions:
filter → sort → element_at. Null-on-miss matches the reference's
except-KeyError/TypeError → None behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_email(
    df: DataFrame,
    contacts_col: str,
    domain: str = "@pittsburghpa.gov",
    out_col: str = "email",
) -> DataFrame:
    """First EMAIL-typed contact info ending with the domain
    (intime_employees_pandas.py:41-68: phone numbers sometimes pollute the
    email field — the endswith guard controls for that).

    contacts: array<struct<type:string, infos:array<struct<info:string>>>>."""
    emails = F.flatten(
        F.transform(
            F.filter(F.col(contacts_col), lambda c: c["type"] == "EMAIL"),
            lambda c: F.filter(
                F.coalesce(c["infos"], F.array()),
                lambda i: i["info"].endswith(domain),
            ),
        )
    )
    return df.withColumn(
        out_col, F.when(F.size(emails) > 0, F.element_at(emails, 1)["info"])
    )


def current_assignment(
    df: DataFrame,
    asg_col: str,
    name_field: str,
    out_col: str,
    today: Column | None = None,
) -> DataFrame:
    """Resolve the currently-valid assignment from an officer's full history
    (intime_employees_pandas.py:77-135): an item is current when
    validFrom < today AND (validTo absent OR validTo > today); among open
    items the latest validFrom wins. Emits ``out_col`` and
    ``{out_col}_valid_date``; no valid item → NULLs.

    assignments: array<struct<{name_field}:string, validFrom:string,
    validTo:string>> (dates as ISO strings, matching the reference's string
    comparisons)."""
    today = today if today is not None else F.date_format(F.current_date(), "yyyy-MM-dd")
    valid = F.filter(
        F.col(asg_col),
        lambda a: (a["validFrom"] < today)
        & (a["validTo"].isNull() | (a["validTo"] > today)),
    )
    # latest validFrom wins → sort desc by validFrom (then name for determinism)
    best = F.element_at(
        F.reverse(
            F.array_sort(
                F.transform(valid, lambda a: F.struct(a["validFrom"].alias("vf"), a[name_field].alias("nm")))
            )
        ),
        1,
    )
    has = F.size(valid) > 0
    return df.withColumn(out_col, F.when(has, best["nm"])).withColumn(
        f"{out_col}_valid_date", F.when(has, best["vf"])
    )


def search_attribute(
    df: DataFrame,
    attrs_col: str,
    key_field: str,
    key_value: str,
    value_field: str,
    out_col: str,
) -> DataFrame:
    """First attribute whose key matches → its value
    (intime_employees_pandas.py:137-148; same shape as the Cherwell fields[]
    search, operators.transforms.extract_field_with_complexity)."""
    matched = F.filter(F.col(attrs_col), lambda a: a[key_field] == F.lit(key_value))
    return df.withColumn(
        out_col, F.when(F.size(matched) > 0, F.element_at(matched, 1)[value_field])
    )


def explode_nested_xref(
    df: DataFrame, outer_col: str, inner_field: str, keep_cols: list[str]
) -> DataFrame:
    """Flatten a 2-level nested xref (array<struct<...inner:array<struct>>>)
    into one row per innermost record, keeping parent columns
    (unnest_domi_street_seg shape, gcs_utils.py:597-662 — the reference moved
    this out of Beam for fusion reasons; explode is native here)."""
    return (
        df.select(*keep_cols, F.explode_outer(F.col(outer_col)).alias("__o"))
        .select(
            *keep_cols, F.col("__o"), F.explode_outer(F.col(f"__o.{inner_field}")).alias("__i")
        )
        .select(*keep_cols, F.col("__o.*"), F.col("__i.*"))
        .drop(inner_field)
    )
