"""CSV reader/writer with declared schema + dead-letter quarantine.

The reference consumes CSV both ways: comma/pipe exports pushed to WPRDC
(gcs_utils.py direct_gcs_export → sources/export.py here) and CSV pulls from
partner systems loaded with a declared schema. This module is the read side,
with the same quarantine posture as the ndjson path: schema is DECLARED,
never inferred (SURVEY §1.2 — inference on a 100 TB landing zone means a
full extra pass AND schema drift by file), and rows that fail the schema
keep their raw text in a quarantine column instead of killing the job.

Spark-first: the PERMISSIVE mode + columnNameOfCorruptRecord contract is
native to the CSV datasource — the malformed-row routing happens inside the
scan, before any shuffle, at full codegen speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    quarantine_col: str = "_corrupt_record",
    **options: str,
) -> DataFrame:
    """Read CSV with a declared schema; malformed rows (wrong arity, failed
    casts) carry their raw line in ``quarantine_col`` and NULL fields.

    Caveat baked into the implementation: the CSV scanner only *materializes*
    the corrupt-record column if it is also selected, and drops corrupt rows
    entirely under column pruning — so the quarantine column is part of the
    read schema here, and callers split it off with ``split_quarantine``
    (shared with the ndjson path)."""
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(quarantine_col, T.StringType())]
    )
    reader = (
        spark.read.schema(read_schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", quarantine_col)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def split_quarantine(
    df: DataFrame, quarantine_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_the_column, bad_rows_with_all_columns).

    Unlike the ndjson splitter (which projects the raw line only), the bad
    side keeps every column (partial casts show WHICH field broke) and is
    CACHED: Spark disallows any query over a raw CSV scan whose only
    referenced column is the corrupt-record column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — even a count() prunes down to it —
    and the documented escape is materializing first. The bad side is the
    dead-letter trickle, so caching it is by-construction cheap."""
    qc = F.col(quarantine_col)
    clean = df.filter(qc.isNull()).drop(quarantine_col)
    bad = df.filter(qc.isNotNull()).cache()
    return clean, bad


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    delimiter: str = ",",
    partition_cols: list[str] | None = None,
) -> None:
    """CSV writer for export feeds. Arrays/structs/maps are JSON-encoded
    first (CSV is flat; this mirrors the reference exporting ARRAY columns
    as JSON strings in WPRDC feeds)."""
    flat = df.select(
        *[
            F.to_json(F.col(f.name)).alias(f.name)
            if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )
    w = flat.write.mode("overwrite").option("header", str(header).lower()).option(
        "sep", delimiter
    )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.csv(path)
