"""Avro .avsc ↔ Spark StructType conversion (SURVEY.md §1.2).

The reference declares schemas as .avsc JSON files (union-with-null for every
field) fetched at pipeline start (dataflow_utils.py:836-841 get_schema) and
converts them for the warehouse with a small type switch
(gcs_utils.py:249-268 conv_avsc_to_bq_schema: strip null, float→FLOAT64,
integer→INT64). Same switch here, to StructType; plus the reverse
(gen_schema_from_df, gcs_utils.py:378-400).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_AVRO_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.LongType(),  # reference's avsc files use 'integer' → INT64
    "long": T.LongType(),
    "float": T.DoubleType(),  # reference maps float → FLOAT64
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
}


def _field_type(avro_type) -> tuple[T.DataType, bool]:
    """Resolve an avsc type (possibly a union with 'null') → (spark, nullable)."""
    nullable = False
    t = avro_type
    if isinstance(t, list):
        nullable = "null" in t
        non_null = [x for x in t if x != "null"]
        t = non_null[0] if non_null else "string"
    if isinstance(t, dict):
        if t.get("type") == "array":
            item, _ = _field_type(t["items"])
            return T.ArrayType(item, containsNull=True), nullable
        if t.get("type") == "record":
            return avsc_to_struct_type(t), nullable
        t = t.get("logicalType") or t.get("type", "string")
        if t in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampType(), nullable
        if t == "date":
            return T.DateType(), nullable
    return _AVRO_TO_SPARK.get(t, T.StringType()), nullable


def avsc_to_struct_type(avsc: dict | str) -> T.StructType:
    """avsc record (dict or JSON string) → StructType; union-with-null →
    nullable field (every reference field is nullable, gcs_utils.py:249-268)."""
    if isinstance(avsc, str):
        avsc = json.loads(avsc)
    fields = []
    for f in avsc.get("fields", []):
        dtype, nullable = _field_type(f["type"])
        fields.append(T.StructField(f["name"], dtype, nullable or True))
    return T.StructType(fields)


_SPARK_TO_AVRO = {
    T.StringType(): "string",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.BooleanType(): "boolean",
    T.BinaryType(): "bytes",
}


def struct_type_to_avsc(schema: T.StructType, name: str = "record") -> dict:
    """StructType → avsc record with union-with-null fields
    (gen_schema_from_df, gcs_utils.py:378-400)."""
    fields = []
    for f in schema.fields:
        avro_t = _SPARK_TO_AVRO.get(f.dataType, "string")
        fields.append({"name": f.name, "type": ["null", avro_t]})
    return {"type": "record", "name": name, "fields": fields}


def schema_from_df(df: DataFrame, name: str = "record") -> dict:
    return struct_type_to_avsc(df.schema, name)
