"""Avro file IO — the reference's landing format (WriteToAvro,
qalert_requests_dataflow.py:145-146; avro_to_gcs, gcs_utils.py:543-567).

Spark ships Avro as an *external* module (spark-avro); this container has no
jar for it, so every entry point here is capability-gated: when the format
is loadable we use it directly (with the .avsc as the writer schema), and
when it is not, ``fallback='parquet'`` lands the same rows as Parquet plus a
``_avro_schema`` sidecar carrying the .avsc JSON — readable on any
Hadoop-compatible FS and invisible to Parquet directory scans (underscore
prefix). ``fallback='error'`` raises ``AvroCapabilityError`` instead, for
pipelines where the landing format is a hard contract.

Scale notes: both paths are plain ``df.write`` — partitioned, no driver
materialization; the sidecar is one tiny text write. Column alignment to the
.avsc happens once in the plan (select + cast), not per row.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from data_rivers_spark.sources.avro_schema import avsc_to_struct_type

_SIDECAR = "_avro_schema"


class AvroCapabilityError(RuntimeError):
    """The spark-avro module is not on the classpath and no fallback was allowed."""


def avro_available(spark: SparkSession) -> bool:
    """True when the 'avro' data source is registered — the same lookup Spark
    runs for ``format('avro')``, so this cannot disagree with a real write.
    (A bare Class.forName probe is wrong here: the distro ships the avro
    *classes* but not the DataSourceRegister service entry.)"""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # noqa: SLF001
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:  # noqa: BLE001 - lookup failure means absent
        return False


def _align_to_avsc(df: DataFrame, avsc: dict | str) -> DataFrame:
    """Project df onto the .avsc's declared fields, in order, with casts —
    the landing contract is the schema file, not whatever the extract
    produced (conv_avsc_to_bq_schema posture, gcs_utils.py:249-268)."""
    struct = avsc_to_struct_type(avsc)
    cols = []
    for field in struct.fields:
        if field.name in df.columns:
            cols.append(df[field.name].cast(field.dataType).alias(field.name))
        else:
            from pyspark.sql import functions as F

            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def write_avro(
    df: DataFrame,
    path: str,
    avsc: dict | str | None = None,
    mode: str = "overwrite",
    fallback: str = "parquet",
) -> str:
    """Write df as Avro (landing format). Returns the format actually used
    ('avro' or 'parquet').

    With ``avsc`` the frame is first aligned to the schema file (declared
    field order, casts, NULL for absent fields) and, on the real Avro path,
    the .avsc is passed as the writer schema so unions-with-null are
    preserved exactly."""
    if avsc is not None:
        df = _align_to_avsc(df, avsc)
    spark = df.sparkSession
    if avro_available(spark):
        writer = df.write.mode(mode)
        if avsc is not None:
            avsc_json = avsc if isinstance(avsc, str) else json.dumps(avsc)
            writer = writer.option("avroSchema", avsc_json)
        writer.format("avro").save(path)
        return "avro"
    if fallback != "parquet":
        raise AvroCapabilityError(
            "spark-avro is not on the classpath; add the org.apache.spark:spark-avro "
            "package or call write_avro(..., fallback='parquet')"
        )
    df.write.mode(mode).parquet(path)
    if avsc is not None:
        avsc_json = avsc if isinstance(avsc, str) else json.dumps(avsc)
        # sidecar via spark.write.text → works on HDFS/objstore, not just local
        spark.createDataFrame([(avsc_json,)], "value string").coalesce(1).write.mode(
            "overwrite"
        ).text(f"{path}/{_SIDECAR}")
    return "parquet"


def read_avro(spark: SparkSession, path: str, avsc: dict | str | None = None) -> DataFrame:
    """Read an Avro landing written by ``write_avro`` (either format).

    Preference order: real Avro read when the module is loadable; otherwise
    the Parquet fallback layout. When ``avsc`` is given the result is aligned
    to it either way, so downstream code sees one schema regardless of which
    physical format landed."""
    if avro_available(spark):
        try:
            df = spark.read.format("avro").load(path)
            return _align_to_avsc(df, avsc) if avsc is not None else df
        except Exception:  # noqa: BLE001 - fall through to the fallback layout
            pass
    df = spark.read.parquet(path)
    if avsc is None:
        avsc = read_sidecar_schema(spark, path)
    return _align_to_avsc(df, avsc) if avsc is not None else df


def read_sidecar_schema(spark: SparkSession, path: str) -> str | None:
    """The .avsc JSON stored next to a Parquet-fallback landing, or None."""
    try:
        rows = spark.read.text(f"{path}/{_SIDECAR}").collect()
        return "\n".join(r.value for r in rows) or None
    except Exception:  # noqa: BLE001 - no sidecar ⇒ plain directory
        return None
