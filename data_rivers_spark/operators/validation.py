"""Expectations-style data validation (single-pass rule evaluation).

The reference's data-quality posture is ad-hoc (build_data_quality_table
collects new distinct values for review, general_queries.py:23-44; dedup
checks; manual BQ audits). This module generalizes it into declarative
table expectations — the check layer a pipeline runs before publishing a
batch:

    report = validate(df, [
        not_null("o_orderkey"),
        unique(["o_orderkey"]),
        accepted_values("o_orderstatus", ["O", "F", "P"]),
        in_range("o_totalprice", 0, None),
    ])

Scale design: every row-predicate rule compiles into ONE aggregation pass —
``sum(when(violated, 1))`` per rule in a single ``agg`` (map-side
combinable, one scan, no shuffle beyond the 1-row combine). The report is
then unpivoted to one row per rule with ``stack``. ``unique`` and
``referential`` need their own keyed aggregate/anti-join (inherently a
shuffle) and are unioned in as separate small frames.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    """A named row-level expectation: ``violated`` marks failing rows."""

    name: str
    violated: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNull())


def accepted_values(col: str, values: list) -> Rule:
    return Rule(
        f"accepted_values({col})",
        ~F.col(col).isin(values) | F.col(col).isNull(),
    )


def in_range(col: str, lo=None, hi=None) -> Rule:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(col) > F.lit(hi))
    return Rule(f"in_range({col})", cond | F.col(col).isNull())


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        f"matches({col})", ~F.col(col).rlike(pattern) | F.col(col).isNull()
    )


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate row-level rules in ONE aggregation pass.

    Returns (rule, violations, total, passed) — one row per rule. All rule
    counters ride the same partial-aggregate, so cost is a single scan
    regardless of rule count."""
    if not rules:
        # 'stack(0, ...)' would be invalid SQL; an empty report is the
        # correct degenerate answer (nothing to check, nothing failed).
        return df.sparkSession.createDataFrame(
            [], "rule string, violations long, total long, passed boolean"
        )
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.sum(r.violated.cast("int")).alias(f"__v{i}") for i, r in enumerate(rules)
    ]
    row = df.agg(*aggs)
    # Unpivot via explode of literal structs rather than a stack() SQL
    # string: rule names pass through as Column literals, so quotes and
    # other SQL metacharacters in names survive verbatim.
    pairs = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"), F.col(f"__v{i}").alias("violations")
            )
            for i, r in enumerate(rules)
        ]
    )
    return row.select(
        F.explode(pairs).alias("kv"), F.col("__total").alias("total")
    ).select(
        F.col("kv.rule").alias("rule"),
        F.col("kv.violations").alias("violations"),
        "total",
    ).select(
        "rule",
        F.coalesce(F.col("violations"), F.lit(0)).cast("long").alias("violations"),
        F.col("total").cast("long").alias("total"),
        (F.coalesce(F.col("violations"), F.lit(0)) == 0).alias("passed"),
    )


def unique_check(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Uniqueness expectation: violations = rows beyond the first per key.

    One keyed aggregate (map-side combinable count per key) + a 1-row
    re-aggregate; same output schema as ``validate`` for unioning."""
    name = name or f"unique({','.join(cols)})"
    per_key = df.groupBy(*[F.col(c) for c in cols]).agg(
        F.count(F.lit(1)).alias("__n")
    )
    return per_key.agg(
        F.sum(F.col("__n") - 1).alias("violations"), F.sum("__n").alias("total")
    ).select(
        F.lit(name).alias("rule"),
        F.coalesce(F.col("violations"), F.lit(0)).cast("long").alias("violations"),
        F.coalesce(F.col("total"), F.lit(0)).cast("long").alias("total"),
        (F.coalesce(F.col("violations"), F.lit(0)) == 0).alias("passed"),
    )


def referential_check(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
) -> DataFrame:
    """Referential-integrity expectation: violations = child rows whose key
    has no parent row (NULL child keys are orphans too, matching FK-with-
    NOT-NULL semantics; relax upstream with a filter if NULLs are legal).

    Anti-join on the key — broadcast when the parent is a dim, shuffle-hash
    otherwise; AQE decides."""
    name = name or f"referential({child_col}->{parent_col})"
    total = child.agg(F.count(F.lit(1)).alias("total"))
    orphans = (
        child.select(F.col(child_col))
        .join(
            parent.select(F.col(parent_col).alias(child_col)).distinct(),
            child_col,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    return orphans.crossJoin(total).select(
        F.lit(name).alias("rule"),
        F.col("violations").cast("long").alias("violations"),
        F.col("total").cast("long").alias("total"),
        (F.col("violations") == 0).alias("passed"),
    )
