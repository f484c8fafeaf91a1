"""data_rivers_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of CityofPittsburgh/data-rivers.

The reference (surveyed in SURVEY.md) is an Airflow + Beam + BigQuery ETL
platform. This package re-expresses its capability surface idiomatically on
Spark:

- ``operators.transforms``   — the Beam record-transform library (SURVEY §2.1/2.2)
  as composable ``DataFrame -> DataFrame`` functions built from
  ``pyspark.sql.functions`` expressions (JVM-side, codegen-friendly).
- ``operators.relational``   — the BigQuery SQL-builder capabilities (SURVEY §2.3):
  window dedup, incremental merge, snapshot append, top-k join, parent/child
  aggregation, bucketing reports.
- ``operators.geo``          — timebound reverse-geocode spatial joins and
  city-limits classification (broadcast point-in-polygon).
- ``operators.dedup`` / ``operators.similarity`` / ``operators.textstats`` /
  ``operators.multimodal`` — large-scale training-data pipeline operators
  (MinHash-LSH/SimHash dedup, ANN search, language-ID/quality/tokens, binary
  media column plumbing).
- ``catalog``                — managed mutable-table semantics over immutable
  Parquet (create_or_replace / insert_into / merge_upsert / delete_where).
- ``sources``                — lenient ndjson with JsonCoder-style repair,
  Avro schema conversion, watermark run-state.
- ``streaming``              — Structured Streaming variants of the incremental
  patterns (the reference is batch-cron; streams are the Spark-native upgrade).
"""

__version__ = "0.1.0"
