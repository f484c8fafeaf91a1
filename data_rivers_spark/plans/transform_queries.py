"""Driver-contract queries for the record-transform layer (SURVEY.md §2.1/2.2).

Each query runs a transform operator over fixture columns synthesized
deterministically from the driver tables, with the oracle restating the
operator's semantics in ANSI SQL. This puts the Beam-DoFn-parity layer under
the same hash-compare gate as the relational layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_rivers_spark.operators import transforms as X
from data_rivers_spark.plans.registry import query
from data_rivers_spark.session import load_tables


@query(
    "q_cast_ladder",
    oracle="""
    SELECT event_id,
           CASE WHEN REGEXP_MATCHES(CASE WHEN event_id % 3 = 0 THEN '31.1'
                                         WHEN event_id % 3 = 1 THEN '42'
                                         ELSE 'abc' END, '^-?[0-9]+$')
                THEN CAST(CASE WHEN event_id % 3 = 0 THEN '31.1'
                               WHEN event_id % 3 = 1 THEN '42'
                               ELSE 'abc' END AS BIGINT) END AS casted,
           CASE WHEN value < 0 OR value > 2147483647 THEN NULL
                ELSE CAST(TRUNC(value) AS BIGINT) END AS pos_val,
           NULLIF(CAST(user_id AS VARCHAR), '') AS uid_str
    FROM events
    """,
)
def q_cast_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChangeDataTypes failed-cast→NULL ladder (dataflow_utils.py:158-205)."""
    t = load_tables(spark, sf_dir, ["events"])
    df = t["events"].withColumn(
        "casted",
        F.when(F.col("event_id") % 3 == 0, F.lit("31.1"))
        .when(F.col("event_id") % 3 == 1, F.lit("42"))
        .otherwise(F.lit("abc")),
    )
    df = X.change_data_types(
        df, [("casted", "int"), ("value", "posint"), ("user_id", "nullstr")]
    )
    return df.select(
        "event_id",
        "casted",
        F.col("value").alias("pos_val"),
        F.col("user_id").alias("uid_str"),
    )


@query(
    "q_status_decode",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
                              WHEN 'P' THEN 'pending' ELSE o_orderstatus END AS status_name
    FROM orders
    """,
)
def q_status_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crosswalk/status-code decode (qalert GetStatus + GetValsFromExternalFile
    shapes, qalert_requests_dataflow.py:31-43, dataflow_utils.py:451-479)."""
    t = load_tables(spark, sf_dir, ["orders"])
    out = X.get_vals_from_crosswalk(
        t["orders"],
        {"F": "finished", "O": "open", "P": "pending"},
        "o_orderstatus",
        "status_name",
    )
    return out.select("o_orderkey", "status_name")


@query(
    "q_anonymize_block",
    oracle="""
    WITH a AS (
      SELECT c_custkey,
             CAST((c_custkey * 7 + 3) // 100 * 100 AS VARCHAR) AS blk
      FROM customer
    )
    SELECT c_custkey,
           CASE WHEN LEN(blk) <= 2 THEN TRANSLATE(blk, '0', 'X')
                ELSE SUBSTR(blk, 1, LEN(blk) - 2) ||
                     TRANSLATE(SUBSTR(blk, LEN(blk) - 1, 2), '0', 'X') END
           || ' MAIN ST, Pittsburgh' AS anon_addr
    FROM a
    """,
)
def q_anonymize_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Address-block anonymization @accuracy=100 (dataflow_utils.py:78-115)."""
    t = load_tables(spark, sf_dir, ["customer"])
    df = t["customer"].withColumn(
        "pii_addr",
        F.concat((F.col("c_custkey") * 7 + 3).cast("string"), F.lit(" MAIN ST, Pittsburgh")),
    )
    out = X.anonymize_address_block(df, [("pii_addr", 100)])
    return out.select("c_custkey", F.col("anon_addr"))


@query(
    "q_time_triplet",
    oracle="""
    WITH b AS (
      SELECT event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS unix_sec,
             TIMEZONE('America/New_York', TIMEZONE('UTC', ts)) AS east_naive,
             ts
      FROM events
    )
    SELECT event_id, unix_sec,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') || '+00:00' AS ts_utc,
           STRFTIME(east_naive, '%Y-%m-%d %H:%M:%S') ||
             CASE WHEN EPOCH(east_naive) - EPOCH(ts) < 0 THEN '-' ELSE '+' END ||
             LPAD(CAST(CAST(ABS(EPOCH(east_naive) - EPOCH(ts)) // 3600 AS BIGINT) AS VARCHAR), 2, '0')
             || ':00' AS ts_east
    FROM b
    """,
)
def q_time_triplet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unix→UTC/Eastern string triplet (dataflow_utils.py:398-412, :884-894).

    Note: second-truncated unix input (the reference's input is unix seconds)."""
    t = load_tables(spark, sf_dir, ["events"])
    df = t["events"].withColumn("unix_sec", F.col("ts").cast("long"))
    out = X.get_date_strings_from_unix(df, [("unix_sec", "ts_utc", "ts_east")])
    return out.select("event_id", "unix_sec", "ts_utc", "ts_east")


@query(
    "q_phone_format",
    oracle="""
    SELECT user_id,
           '+1 (412) 636-' || LPAD(CAST(user_id % 10000 AS VARCHAR), 4, '0') AS phone
    FROM (SELECT DISTINCT user_id FROM events)
    """,
)
def q_phone_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NANP phone normalization (dataflow_utils.py:548-567) — raw digits with
    separators in, '+1 (AAA) XXX-XXXX' out."""
    t = load_tables(spark, sf_dir, ["events"])
    df = (
        t["events"]
        .select("user_id")
        .distinct()
        .withColumn(
            "phone",
            F.concat(
                F.lit("1-412-636-"),
                F.lpad((F.col("user_id") % 10000).cast("string"), 4, "0"),
            ),
        )
    )
    return X.reformat_phone_numbers(df, "phone").select("user_id", "phone")


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id, TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-string column field extraction (the TO_JSON_STRING/JSON column
    pattern, transform_enrich_requests.py:104-108)."""
    t = load_tables(spark, sf_dir, ["events"])
    return t["events"].select(
        "event_id", F.get_json_object("props", "$.k").try_cast("long").alias("k")
    )


@query(
    "q_convert_booleans",
    oracle="""
    SELECT event_id,
           CASE WHEN tok IS NULL OR tok = '' THEN NULL
                WHEN LOWER(tok) IN ('yes','y','t','true','1','positive','yeah') THEN TRUE
                WHEN LOWER(tok) IN ('no','n','f','false','0','negative','nope') THEN FALSE
                ELSE NULL END AS flag
    FROM (
      SELECT event_id,
             CASE event_type WHEN 'click' THEN 'yes' WHEN 'view' THEN 'NO'
                             WHEN 'signup' THEN 'T' WHEN 'purchase' THEN 'yeah'
                             ELSE 'maybe' END AS tok
      FROM events
    )
    """,
)
def q_convert_booleans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean token mapping with default lists (dataflow_utils.py:226-263)."""
    t = load_tables(spark, sf_dir, ["events"])
    df = t["events"].withColumn(
        "flag",
        F.when(F.col("event_type") == "click", "yes")
        .when(F.col("event_type") == "view", "NO")
        .when(F.col("event_type") == "signup", "T")
        .when(F.col("event_type") == "purchase", "yeah")
        .otherwise("maybe"),
    )
    out = X.convert_booleans(df, [("flag", "yeah", "nope", None)], include_defaults=True)
    return out.select("event_id", "flag")


@query(
    "q_string_case",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS up,
           LOWER(c_mktsegment) AS lo,
           UPPER(SUBSTR(c_name, 1, 1)) || LOWER(SUBSTR(c_name, 2)) AS cap
    FROM customer
    """,
)
def q_string_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConvertStringCase modes (dataflow_utils.py:300-323)."""
    t = load_tables(spark, sf_dir, ["customer"])
    df = t["customer"].select(
        "c_custkey",
        F.col("c_name").alias("up"),
        F.col("c_mktsegment").alias("lo"),
        F.col("c_name").alias("cap"),
    )
    out = X.convert_string_case(df, [("up", "upper"), ("lo", "lower"), ("cap", "capitalize")])
    return out


@query(
    "q_parcel_standardize",
    oracle="""
    WITH p AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 11 = 0 THEN CAST(c_custkey AS VARCHAR) || '#X'
                  WHEN c_custkey % 3 = 0 THEN
                    CAST(c_custkey % 9999 AS VARCHAR) || '-X-' || CAST(c_custkey % 99999 AS VARCHAR)
                  WHEN c_custkey % 3 = 1 THEN
                    LPAD(CAST(c_custkey % 9999 AS VARCHAR), 4, '0') || 'B' ||
                    LPAD(CAST(c_custkey % 99999 AS VARCHAR), 5, '0') || '000100'
                  ELSE 'shortie' END AS parc
      FROM customer
    ), std AS (
      SELECT c_custkey, parc,
             CASE
               WHEN parc LIKE '%#%' THEN 'invalid input'
               WHEN parc = 'shortie' THEN 'invalid input'
               WHEN parc LIKE '%-%' THEN
                 LPAD(STRING_SPLIT(parc, '-')[1], 4, '0') || STRING_SPLIT(parc, '-')[2] ||
                 LPAD(STRING_SPLIT(parc, '-')[3], 5, '0') || '0000' || '00'
               ELSE parc
             END AS built
      FROM p
    )
    SELECT c_custkey,
           CASE WHEN built = 'invalid input' THEN built
                WHEN LEN(built) = 16
                     AND LEN(LIST_DISTINCT(REGEXP_EXTRACT_ALL(built, '.'))) > 2 THEN built
                ELSE 'invalid input' END AS parc
    FROM std
    """,
)
def q_parcel_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """County 16-char parcel standardization (dataflow_utils.py:597-616,
    :1335-1456): dehyphenate, zero-pad 5 components, validate."""
    t = load_tables(spark, sf_dir, ["customer"])
    df = t["customer"].withColumn(
        "parc",
        F.when(
            F.col("c_custkey") % 11 == 0,
            F.concat(F.col("c_custkey").cast("string"), F.lit("#X")),
        )
        .when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                (F.col("c_custkey") % 9999).cast("string"),
                F.lit("-X-"),
                (F.col("c_custkey") % 99999).cast("string"),
            ),
        )
        .when(
            F.col("c_custkey") % 3 == 1,
            F.concat(
                F.lpad((F.col("c_custkey") % 9999).cast("string"), 4, "0"),
                F.lit("B"),
                F.lpad((F.col("c_custkey") % 99999).cast("string"), 5, "0"),
                F.lit("000100"),
            ),
        )
        .otherwise(F.lit("shortie")),
    )
    return X.standardize_parcel_numbers(df, "parc").select("c_custkey", "parc")


@query(
    "q_classify_address",
    oracle="""
    WITH f AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 4 = 0 THEN CAST(o_orderkey AS VARCHAR)
                  WHEN o_orderkey % 4 = 2 THEN '12-14' ELSE '' END AS street_num,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE 'MAIN ST' END AS street_name,
             CASE WHEN o_orderkey % 4 = 3 THEN 'OAK AVE' ELSE '' END AS cross_street,
             'Pittsburgh' AS city,
             CASE WHEN o_orderkey % 7 = 0 THEN 0.0 ELSE 40.4 END AS lat,
             CASE WHEN o_orderkey % 7 = 0 THEN 0.0 ELSE -79.9 END AS long
      FROM orders
    )
    SELECT o_orderkey,
           CASE WHEN street_name IS NOT NULL AND REGEXP_MATCHES(street_num, '^[0-9]+$')
                  THEN 'Precise'
                WHEN street_name IS NOT NULL AND street_num = '' AND cross_street != ''
                  THEN 'Intersection'
                WHEN street_name IS NOT NULL THEN 'Underspecified'
                WHEN lat != 0.0 AND long != 0.0 THEN 'Coordinates Only'
                ELSE 'Missing' END AS address_type,
           CASE WHEN street_name IS NOT NULL AND street_num = '' AND cross_street != ''
                  THEN street_name || ' and ' || cross_street || ', ' || city
                WHEN street_name IS NOT NULL
                  THEN street_num || ' ' || street_name || ', ' || city
                ELSE NULL END AS pii_input_address
    FROM f
    """,
)
def q_classify_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Address formatting + specificity classification
    (dataflow_utils.py:415-448, :962-1000)."""
    t = load_tables(spark, sf_dir, ["orders"])
    k = F.col("o_orderkey")
    df = t["orders"].select(
        "o_orderkey",
        F.when(k % 4 == 0, k.cast("string")).when(k % 4 == 2, F.lit("12-14")).otherwise(F.lit("")).alias("street_num"),
        F.when(k % 5 == 0, F.lit(None).cast("string")).otherwise(F.lit("MAIN ST")).alias("street_name"),
        F.when(k % 4 == 3, F.lit("OAK AVE")).otherwise(F.lit("")).alias("cross_street"),
        F.lit("Pittsburgh").alias("city"),
        F.when(k % 7 == 0, F.lit(0.0)).otherwise(F.lit(40.4)).alias("lat"),
        F.when(k % 7 == 0, F.lit(0.0)).otherwise(F.lit(-79.9)).alias("long"),
    )
    out = X.format_and_classify_address(
        df,
        {
            "street_num_field": "street_num",
            "street_name_field": "street_name",
            "cross_street_field": "cross_street",
            "city_field": "city",
            "lat_field": "lat",
            "long_field": "long",
        },
        contains_pii=True,
    )
    return out.select("o_orderkey", "address_type", "pii_input_address")


@query(
    "q_spec_pipeline",
    oracle="""
    WITH deduped AS (
      SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderstatus = 'O'
      ) WHERE rn = 1
    )
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS order_day
    FROM deduped WHERE o_totalprice > 1000
    """,
)
def q_spec_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A pipeline built ENTIRELY from a declarative spec (plans/spec.py
    run_spec): filter → latest-order-per-customer dedup → threshold filter
    → derived columns → projection, with the oracle restating the same
    chain in SQL. This puts the spec interpreter itself under the driver's
    hash gate — a regression in op dispatch, param plumbing, or step
    ordering breaks the compare, not just a unit test."""
    from data_rivers_spark.plans.spec import run_spec

    spec = {
        "source": {"table": "orders"},
        "steps": [
            {"op": "filter", "where": "o_orderstatus = 'O'"},
            {
                "op": "dedup_latest",
                "keys": ["o_custkey"],
                "order_cols": ["o_orderdate", "o_orderkey"],
            },
            {"op": "filter", "where": "o_totalprice > 1000"},
            {"op": "with_column", "name": "total",
             "expr": "ROUND(o_totalprice, 2)"},
            {"op": "with_column", "name": "order_day",
             "expr": "DATE_FORMAT(o_orderdate, 'yyyy-MM-dd')"},
        ],
        "select": ["o_custkey", "o_orderkey", "total", "order_day"],
    }
    return run_spec(spark, spec, sf_dir)
