"""Export sinks (SURVEY.md §2.5): CSV/JSON publishing, the WPRDC open-data
path (direct_gcs_export general_queries.py:151-162, EXPORT DATA with
header/delimiter; BigQueryToCloudStorageOperator qalert_airflow.py:231-237).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    delimiter: str = ",",
    single_file: bool = False,
) -> None:
    """CSV export with header/delimiter. ``single_file`` coalesces to one
    part (the reference exports one object per table for WPRDC) — only for
    export-sized results; large tables keep parallel parts."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .csv(path)
    )


def export_json(df: DataFrame, path: str, single_file: bool = False) -> None:
    """ndjson export (json_to_gcs shape, gcs_utils.py:570-594)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)
