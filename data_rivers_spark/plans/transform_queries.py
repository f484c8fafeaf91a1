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


@query(
    "q_spec_two_frame_merge",
    oracle="""
    WITH t AS (
      SELECT o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS flagged,
             o_orderkey
      FROM orders
    ), g AS (
      SELECT o_orderstatus, flagged, COUNT(DISTINCT o_orderkey) AS n
      FROM t GROUP BY o_orderstatus, flagged
    )
    SELECT o_orderstatus, flagged, CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / (SELECT SUM(n) FROM g), 4) AS pct
    FROM g
    """,
)
def q_spec_two_frame_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A TWO-FRAME pipeline built entirely from a declarative spec (r12):
    the upsert CTX verb resolves its ``incoming`` param as a nested
    sub-spec (filter + derived column over the same table), replaces the
    matching master rows, and a percentage_table step summarizes the
    merged frame. Puts the _two adapter (nested-frame resolution + kwarg
    passthrough) under the driver's hash gate; the oracle restates the
    merge's net effect (every o_orderkey%7 row carries the incoming
    flag) plus the distinct-count share table."""
    from data_rivers_spark.plans.spec import run_spec

    spec = {
        "source": {"table": "orders"},
        "steps": [
            {"op": "with_column", "name": "flagged", "expr": "CAST(0 AS INT)"},
            {"op": "upsert", "key": "o_orderkey",
             "incoming": {
                 "source": {"table": "orders"},
                 "steps": [
                     {"op": "filter", "where": "o_orderkey % 7 = 0"},
                     {"op": "with_column", "name": "flagged",
                      "expr": "CAST(1 AS INT)"},
                 ],
             }},
            {"op": "percentage_table",
             "group_cols": ["o_orderstatus", "flagged"],
             "id_col": "o_orderkey"},
        ],
    }
    return run_spec(spark, spec, sf_dir)


@query(
    "q_spec_curation",
    oracle="""
    WITH ex AS (
      SELECT doc_id,
             UNNEST(STRING_SPLIT_REGEX(REGEXP_REPLACE(LOWER(text), '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token
      FROM documents WHERE REGEXP_REPLACE(text, '^\\s+|\\s+$', '', 'g') != ''
    ), lm AS (
      SELECT token, COUNT(*) AS cnt FROM ex GROUP BY token
    ), t AS (
      SELECT SUM(cnt) AS total FROM lm
    ), scored AS (
      SELECT e.doc_id, ROUND(AVG(LN(lm.cnt * 1.0 / t.total)), 4) AS unigram_logprob
      FROM ex e JOIN lm USING (token) CROSS JOIN t
      GROUP BY e.doc_id
    ), ranked AS (
      SELECT s.doc_id, d.lang, s.unigram_logprob,
             PERCENT_RANK() OVER (PARTITION BY d.lang
               ORDER BY s.unigram_logprob DESC, s.doc_id) AS pr
      FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT doc_id, lang, unigram_logprob
    FROM ranked WHERE pr < 1.0/3
    """,
)
def q_spec_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A CURATION pipeline built entirely from a declarative spec: the
    CCNet perplexity-bucket trim (keep the most-fluent third per language)
    as two spec steps — the round-7 verb additions under the driver's hash
    gate through the interpreter's dispatch, not just as direct calls."""
    from data_rivers_spark.plans.spec import run_spec

    spec = {
        "source": {"table": "documents"},
        "steps": [
            {"op": "perplexity_buckets", "text_col": "text",
             "id_col": "doc_id", "group_col": "lang"},
            {"op": "filter", "where": "bucket = 'head'"},
        ],
        "select": ["doc_id", "lang", "unigram_logprob"],
    }
    return run_spec(spark, spec, sf_dir)


def _spec_select_mix_oracle() -> str:
    # reuse q_dsir_weights' verified feature/weight CTE chain verbatim, then
    # bolt on the Gumbel-top-120 selection and the UniMax mixing tail —
    # the oracle mirrors the spec step-for-step
    from data_rivers_spark.plans.dataops_queries import _DSIR_FEATS_SQL

    return "WITH " + _DSIR_FEATS_SQL + """
    SELECT doc_id, lang, log_weight, epoch FROM (
      WITH selw AS MATERIALIZED (
        SELECT w.doc_id, w.lang, w.log_weight, d.n_chars
        FROM weights w JOIN documents d USING (doc_id)
        ORDER BY w.log_weight
                 - LN(-LN((CAST(CONCAT('0x', SUBSTR(MD5('sm:' || CAST(w.doc_id AS VARCHAR)), 1, 8))
                                AS BIGINT) + 0.5) / 4294967296.0))
                 DESC, w.doc_id
        LIMIT 120
      ), mcounts AS (
        SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS n FROM selw GROUP BY lang
      ), msized AS (
        SELECT lang, n, n * 4.0 AS cap,
               ROW_NUMBER() OVER (ORDER BY n * 4.0 ASC, lang ASC) AS r,
               SUM(n * 4.0) OVER (ORDER BY n * 4.0 ASC, lang ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               COUNT(*) OVER () AS L
        FROM mcounts
      ), mflag AS (
        SELECT *, cap * CAST(L - r + 1 AS DOUBLE) <= 100000.0 - (cum - cap) AS sat
        FROM msized
      ), mlev AS (
        SELECT *,
               SUM(CASE WHEN sat THEN 1 ELSE 0 END) OVER () AS p,
               COALESCE(SUM(CASE WHEN sat THEN cap END) OVER (), 0.0) AS cumsat
        FROM mflag
      ), malloc AS (
        SELECT lang, n,
               CASE WHEN sat THEN cap
                    ELSE (100000.0 - cumsat) / CAST(L - p AS DOUBLE) END AS a
        FROM mlev
      ), mrates AS (
        SELECT lang, CAST(FLOOR(ROUND(a, 6) / n) AS INT) AS fullep,
               ROUND(a, 6) - CAST(FLOOR(ROUND(a, 6) / n) AS DOUBLE) * n AS rem
        FROM malloc
      ), mcum AS (
        SELECT s.doc_id, s.lang, s.log_weight, s.n_chars, r.fullep, r.rem,
               SUM(CAST(s.n_chars AS DOUBLE)) OVER (
                 PARTITION BY s.lang
                 ORDER BY SUBSTR(MD5('47:' || CAST(s.doc_id AS VARCHAR)), 1, 8), s.doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM selw s JOIN mrates r ON s.lang = r.lang
      ), mnc AS (
        SELECT doc_id, lang, log_weight,
               fullep + CASE WHEN c <= rem THEN 1 ELSE 0 END AS n_copies
        FROM mcum
      )
      SELECT doc_id, lang, log_weight,
             UNNEST(GENERATE_SERIES(0, n_copies - 1)) AS epoch
      FROM mnc WHERE n_copies > 0
    )
    """


@query("q_spec_select_mix", oracle=_spec_select_mix_oracle())
def q_spec_select_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-10/11 data-selection close-out as ONE declarative spec:
    DSIR importance weights toward the English subset (target derived from
    the input frame itself), Gumbel-top-120 resampling, a materialize
    stage boundary, then a UniMax epoch-capped mix over languages —
    select → mix chained through run_spec's verb dispatch, under the
    driver's hash gate. The spec is plain JSON-shaped data: a deployment
    could version and review this exact pipeline."""
    from data_rivers_spark.plans.spec import run_spec

    spec = {
        "source": {"table": "documents"},
        "steps": [
            {"op": "select", "columns": ["doc_id", "lang", "n_chars", "text"]},
            {"op": "dsir_importance_weights",
             "target": {"from": "input",
                        "steps": [{"op": "filter", "where": "lang = 'en'"}]},
             "text_col": "text", "id_col": "doc_id",
             "num_buckets": 4096, "seed": 0},
            {"op": "dsir_resample", "key_col": "doc_id",
             "log_weight_col": "log_weight", "k": 120, "seed": "sm"},
            # stage boundary: unimax_sample consumes the selected frame
            # twice (allocation aggregate + broadcast join) — without this
            # the whole DSIR subtree above would replay per consumer
            {"op": "materialize"},
            {"op": "unimax_sample", "key_col": "doc_id", "group_col": "lang",
             "tokens_col": "n_chars", "total_budget": 100000.0,
             "epoch_cap": 4.0, "seed": 47},
        ],
        "select": ["doc_id", "lang", "log_weight", "epoch"],
    }
    return run_spec(spark, spec, sf_dir)


@query(
    "q_spec_bpe",
    oracle="""
    WITH w AS (
      SELECT CASE WHEN REGEXP_REPLACE(text, '^\\s+|\\s+$', '', 'g') = '' THEN []::VARCHAR[]
                  ELSE STRING_SPLIT_REGEX(REGEXP_REPLACE(LOWER(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END AS ws
      FROM documents
    ), wf AS (
      SELECT word, COUNT(*) AS freq
      FROM w, UNNEST(ws) AS t(word) GROUP BY word
    ), pairs AS (
      SELECT SUBSTRING(word, i, 1) AS l, SUBSTRING(word, i + 1, 1) AS r, freq
      FROM wf, UNNEST(GENERATE_SERIES(1, LEN(word) - 1)) AS t(i)
      WHERE LEN(word) >= 2
    ), pc AS (
      SELECT l, r, CAST(SUM(freq) AS BIGINT) AS pair_count FROM pairs GROUP BY l, r
    )
    SELECT l AS left, r AS right, pair_count, rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pair_count DESC, l, r) AS rank
      FROM pc
    ) WHERE rank <= 10
    """,
)
def q_spec_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-training front half as a spec: corpus → word/frequency
    vocabulary → one BPE pair-count round, dispatched through run_spec
    (the word_frequency_table and bpe_pair_counts verbs). The steps change
    the frame's shape entirely (corpus rows → vocab rows → pair rows) —
    exercising that a spec is a pipeline of operators, not column edits."""
    from data_rivers_spark.plans.spec import run_spec

    spec = {
        "source": {"table": "documents"},
        "steps": [
            {"op": "word_frequency_table", "text_col": "text"},
            {"op": "bpe_pair_counts", "top_k": 10},
        ],
    }
    return run_spec(spark, spec, sf_dir)


@query(
    "q_string_shaping",
    oracle="""
    SELECT c_custkey,
           CASE WHEN LEN(CAST(c_custkey % 100000 AS VARCHAR)) < 4
                THEN LPAD(CAST(c_custkey % 100000 AS VARCHAR), 4, '0')
                ELSE CAST(c_custkey % 100000 AS VARCHAR) END AS padded,
           CASE WHEN REGEXP_MATCHES(
                  CASE WHEN c_custkey % 4 = 0 THEN 'abc12'
                       ELSE CAST(c_custkey % 1000 AS VARCHAR) END,
                  '^[0-9]+$')
                THEN LPAD(CASE WHEN c_custkey % 4 = 0 THEN 'abc12'
                               ELSE CAST(c_custkey % 1000 AS VARCHAR) END, 8, '0')
                END AS zfilled,
           TRIM('  ' || c_mktsegment || ' ') AS trimmed,
           CASE WHEN LEN(STRING_SPLIT(c_name, '#')) > 1
                THEN STRING_SPLIT(c_name, '#')[2] END AS after_hash,
           CASE WHEN LEN(STRING_SPLIT(c_mktsegment, '#')) > 1
                THEN STRING_SPLIT(c_mktsegment, '#')[2] END AS miss_split,
           REGEXP_REPLACE(c_name, 'Customer', 'Cust', 'g') AS replaced,
           CASE WHEN c_acctbal BETWEEN 0 AND 5000 THEN c_acctbal END AS bal_guard
    FROM customer
    """,
)
def q_string_shaping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string-shaping DoFn family under the hash gate in one pass:
    PrependCharacters (numeric-guarded left-pad, dataflow_utils.py:525-545),
    fill_leading_zeroes (null-on-non-numeric, pandas_utils.py:109-112),
    StripStrings (:688-701), StripBeforeDelim incl. the missing-delimiter →
    NULL branch (:663-685), ReplaceChar global substitution
    (intime_assignments_dataflow.py:23-40), and FilterOutliers'
    out-of-range → NULL (:364-381)."""
    t = load_tables(spark, sf_dir, ["customer"])
    df = t["customer"].select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal",
        (F.col("c_custkey") % 100000).cast("string").alias("padded"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit("abc12"))
        .otherwise((F.col("c_custkey") % 1000).cast("string"))
        .alias("zfilled"),
        F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" ")).alias("trimmed"),
        F.col("c_name").alias("after_hash"),
        F.col("c_mktsegment").alias("miss_split"),
        F.col("c_name").alias("replaced"),
        F.col("c_acctbal").alias("bal_guard"),
    )
    df = X.prepend_characters(df, "padded", 4, "0", check_numeric=True)
    df = X.fill_leading_zeroes(df, "zfilled", 8)
    df = X.strip_strings(df, ["trimmed"])
    df = X.strip_before_delim(df, ["after_hash", "miss_split"], ["#", "#"], [1, 1])
    df = X.replace_chars(df, [("replaced", "Customer", "Cust")])
    df = X.filter_outliers(df, [("bal_guard", 0.0, 5000.0)])
    return df.select(
        "c_custkey", "padded", "zfilled", "trimmed",
        "after_hash", "miss_split", "replaced", "bal_guard",
    )


@query(
    "q_name_shaping",
    oracle="""
    SELECT c_custkey AS cust_key,
           c_mktsegment AS mkt_segment,
           c_nationkey AS nation_key,
           CAST(NULL AS VARCHAR) AS ghost_col,
           NULLIF(REGEXP_EXTRACT(
             'Doe, ' || c_mktsegment ||
             CASE c_custkey % 3 WHEN 0 THEN ' A' WHEN 1 THEN ' B.' ELSE '' END,
             ',\\s*\\S+\\s+([A-Za-z])\\.?\\s*$', 1), '') AS middle_initial,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 'y' ELSE 'n' END AS flag
    FROM customer
    """,
)
def q_name_shaping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name/rename DoFn family: extract_middle_initial's 'Last, First M'
    parse incl. no-middle → NULL (ceridian_new_hires_etl.py:29-47),
    set_col_b_based_on_col_a_val (pandas_utils.py:183-190), SwapFieldNames'
    missing-source → NULL column (dataflow_utils.py:704-722), and
    ColumnsCamelToSnakeCase over camelCase projections
    (dataflow_utils.py:208-217)."""
    t = load_tables(spark, sf_dir, ["customer"])
    df = t["customer"].select(
        F.col("c_custkey").alias("custKey"),
        F.col("c_mktsegment").alias("mktSegment"),
        F.concat(
            F.lit("Doe, "),
            F.col("c_mktsegment"),
            F.when(F.col("c_custkey") % 3 == 0, F.lit(" A"))
            .when(F.col("c_custkey") % 3 == 1, F.lit(" B."))
            .otherwise(F.lit("")),
        ).alias("fullName"),
        F.col("c_nationkey").alias("nationKey"),
        F.lit("n").alias("flag"),
    )
    df = X.extract_middle_initial(df, "fullName", "middleInitial")
    df = X.set_col_b_based_on_col_a_val(df, "mktSegment", "flag", "BUILDING", "y")
    df = X.swap_field_names(df, [("nationKey", "nation_key"), ("ghost", "ghost_col")])
    df = X.columns_camel_to_snake_case(df)
    return df.select(
        "cust_key", "mkt_segment", "nation_key", "ghost_col",
        "middle_initial", "flag",
    )


@query(
    "q_ticket_lifecycle",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'F' THEN 'closed' ELSE 'open' END AS status_name,
             CAST(o_orderkey * 1000 + 5 AS BIGINT) AS last_action_unix,
             'est_' || CAST(o_orderkey AS VARCHAR) AS last_action_est,
             'utc_' || CAST(o_orderkey AS VARCHAR) AS last_action_utc,
             CAST(o_orderkey % 7 AS VARCHAR) AS parent_ticket_id,
             CASE o_orderkey % 3 WHEN 0 THEN 'Asian (not Hispanic)'
                                 WHEN 1 THEN 'White ' END AS ethnicity,
             CASE o_orderkey % 4 WHEN 0 THEN '512' WHEN 1 THEN '514'
                                 WHEN 2 THEN '99' ELSE '262656' END AS uac
      FROM orders
    )
    SELECT o_orderkey, status_name,
           CASE WHEN status_name = 'closed' THEN last_action_est END AS closed_date_est,
           CASE WHEN status_name = 'closed' THEN last_action_utc END AS closed_date_utc,
           CASE WHEN status_name = 'closed' THEN last_action_unix END AS closed_date_unix,
           parent_ticket_id <> '0' AS child_ticket,
           COALESCE(TRIM(STRING_SPLIT(ethnicity, ' (')[1]), 'Decline to Answer') AS ethnicity,
           CASE WHEN CAST(uac AS BIGINT) IN (512, 544, 66048, 262656) THEN TRUE
                WHEN CAST(uac AS BIGINT) IN (514, 546, 66050, 66082, 262658) THEN FALSE
                END AS enabled
    FROM base
    """,
)
def q_ticket_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 311-ticket lifecycle DoFn family under the hash gate:
    GetClosedDate's closed-only triplet copy (qalert_requests_dataflow.py:
    46-54), DetectChildTicketStatus (:57-63), StandardizeEthnicityNames'
    suffix-trim + NULL → 'Decline to Answer' (ceridian_employees_dataflow.py:
    23-29), and AD account-code conversion incl. unknown-code → NULL
    (active_directory_users_dataflow.py:23-40)."""
    t = load_tables(spark, sf_dir, ["orders"])
    key = F.col("o_orderkey")
    df = t["orders"].select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", F.lit("closed"))
        .otherwise(F.lit("open"))
        .alias("status_name"),
        (key * 1000 + 5).cast("long").alias("last_action_unix"),
        F.concat(F.lit("est_"), key.cast("string")).alias("last_action_est"),
        F.concat(F.lit("utc_"), key.cast("string")).alias("last_action_utc"),
        (key % 7).cast("string").alias("parent_ticket_id"),
        F.when(key % 3 == 0, F.lit("Asian (not Hispanic)"))
        .when(key % 3 == 1, F.lit("White "))
        .alias("ethnicity"),
        F.when(key % 4 == 0, F.lit("512"))
        .when(key % 4 == 1, F.lit("514"))
        .when(key % 4 == 2, F.lit("99"))
        .otherwise(F.lit("262656"))
        .alias("uac"),
    )
    df = X.get_closed_date(df)
    df = X.detect_child_ticket(df)
    df = X.standardize_ethnicity_names(df, "ethnicity")
    df = X.account_code_conversion(df, "uac")
    return df.select(
        "o_orderkey", "status_name", "closed_date_est", "closed_date_utc",
        "closed_date_unix", "child_ticket", "ethnicity", "enabled",
    )


@query(
    "q_anonymize_latlong",
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 9 THEN '0'
                  WHEN c_custkey % 10 = 8 THEN NULL
                  ELSE CAST(40.0 + (c_custkey % 1000) / 1000.0 AS VARCHAR) END AS pii_lat,
             CASE WHEN c_custkey % 10 = 8 THEN NULL
                  ELSE CAST(-80.0 - (c_custkey % 1000) / 1000.0 AS VARCHAR) END AS pii_long
      FROM customer
    )
    SELECT c_custkey,
           CASE WHEN pii_lat IS NULL OR TRY_CAST(pii_lat AS DOUBLE) = 0.0 OR pii_lat = ''
                THEN NULL ELSE pii_lat END AS pii_lat,
           CASE WHEN pii_lat IS NULL OR TRY_CAST(pii_lat AS DOUBLE) = 0.0 OR pii_lat = ''
                THEN NULL
                ELSE PRINTF('%.3f', ROUND(TRY_CAST(pii_lat AS DOUBLE), 3)) END AS anon_lat,
           CASE WHEN pii_long IS NULL OR TRY_CAST(pii_long AS DOUBLE) = 0.0 OR pii_long = ''
                THEN NULL ELSE pii_long END AS pii_long,
           CASE WHEN pii_long IS NULL OR TRY_CAST(pii_long AS DOUBLE) = 0.0 OR pii_long = ''
                THEN NULL
                ELSE PRINTF('%.3f', ROUND(TRY_CAST(pii_long AS DOUBLE), 3)) END AS anon_long
    FROM base
    """,
)
def q_anonymize_latlong(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AnonymizeLatLong under the hash gate (dataflow_utils.py:118-155):
    block-accuracy rounding (accuracy 100 m → 3 decimals) with the
    reference's missing-value semantics — NULL, empty, and 0.0 coordinates
    null BOTH the original and the anon_* column. Fixture coordinates are
    exact 3-decimal values so HALF_UP-vs-banker's rounding can never
    diverge between engines; the formatted string is what both emit."""
    t = load_tables(spark, sf_dir, ["customer"])
    key = F.col("c_custkey")
    df = t["customer"].select(
        "c_custkey",
        F.when(key % 10 == 9, F.lit("0"))
        .when(key % 10 == 8, F.lit(None).cast("string"))
        .otherwise((F.lit(40.0) + (key % 1000) / 1000.0).cast("string"))
        .alias("pii_lat"),
        F.when(key % 10 == 8, F.lit(None).cast("string"))
        .otherwise((F.lit(-80.0) - (key % 1000) / 1000.0).cast("string"))
        .alias("pii_long"),
    )
    df = X.anonymize_lat_long(df, [("pii_lat", "pii_long", 100)])
    return df.select("c_custkey", "pii_lat", "anon_lat", "pii_long", "anon_long")


@query(
    "q_active_permits",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey * 100 AS BIGINT) AS valid_from,
           CAST(o_orderkey * 100 + 5000 AS BIGINT) AS valid_to,
           CASE WHEN 500000 BETWEEN o_orderkey * 100 AND o_orderkey * 100 + 5000
                THEN 1 ELSE 0 END AS active
    FROM orders
    """,
)
def q_active_permits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IdentifyActivePermits with an injected evaluation instant
    (computronix_gis_street_closures_dataflow.py:66-79): permits are
    active iff now ∈ [from, to]. Synthesized windows sweep past the fixed
    now=500000, exercising both branches deterministically."""
    t = load_tables(spark, sf_dir, ["orders"])
    key = F.col("o_orderkey")
    df = t["orders"].select(
        "o_orderkey",
        (key * 100).cast("long").alias("valid_from"),
        (key * 100 + 5000).cast("long").alias("valid_to"),
    )
    df = X.identify_active_permits(df, "valid_from", "valid_to", now_unix=500000)
    return df.select("o_orderkey", "valid_from", "valid_to", "active")


@query(
    "q_nested_extraction",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_custkey % 4 IN (0, 2)
                THEN 'u' || CAST(c_custkey AS VARCHAR) || '@pittsburghpa.gov'
                END AS email,
           CASE WHEN c_custkey % 3 = 0 THEN 'C' ELSE 'B' END
             || CAST(c_custkey AS VARCHAR) AS unit,
           CASE WHEN c_custkey % 3 = 0 THEN '2025-07-01'
                ELSE '2023-06-01' END AS unit_valid_date,
           CASE WHEN c_custkey % 5 <> 0
                THEN 'rank' || CAST(c_custkey % 7 AS VARCHAR) END AS rank_val
    FROM customer
    """,
)
def q_nested_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.4 nested-navigation family against closed-form expectations:
    extract_email's typed-contact scan with domain guard
    (intime_employees_pandas.py:41-68 — phone entries and wrong-domain
    emails must be skipped), current_assignment's validFrom/validTo
    resolution (latest open assignment wins, :77-135), and
    search_attribute's first-matching-key lookup (:137-148). The fixture
    synthesizes each nested array<struct> from key arithmetic, so the
    oracle states the expected extraction directly — the Spark side must
    navigate the real nested shape to agree."""
    from data_rivers_spark.operators import nested as N

    t = load_tables(spark, sf_dir, ["customer"])
    key = F.col("c_custkey")
    kstr = key.cast("string")
    good = F.concat(F.lit("u"), kstr, F.lit("@pittsburghpa.gov"))
    bad = F.concat(F.lit("u"), kstr, F.lit("@example.org"))
    email_entry = lambda addr: F.struct(  # noqa: E731
        F.lit("EMAIL").alias("type"),
        F.array(F.struct(addr.alias("info"))).alias("infos"),
    )
    phone_entry = F.struct(
        F.lit("PHONE").alias("type"),
        F.array(F.struct(F.lit("555-0000").alias("info"))).alias("infos"),
    )
    contacts = (
        F.when(key % 4 == 0, F.array(email_entry(good)))
        .when(key % 4 == 1, F.array(phone_entry))
        .when(key % 4 == 2, F.array(email_entry(bad), email_entry(good)))
        .otherwise(F.array().cast(
            "array<struct<type:string,infos:array<struct<info:string>>>>"
        ))
    )
    asg = lambda unit, vf, vt: F.struct(  # noqa: E731
        unit.alias("unit"), F.lit(vf).alias("validFrom"),
        (F.lit(vt) if vt else F.lit(None)).cast("string").alias("validTo"),
    )
    expired = asg(F.concat(F.lit("A"), kstr), "2020-01-01", "2024-01-01")
    open_b = asg(F.concat(F.lit("B"), kstr), "2023-06-01", None)
    open_c = asg(F.concat(F.lit("C"), kstr), "2025-07-01", None)
    assignments = F.when(
        key % 3 == 0, F.array(expired, open_b, open_c)
    ).otherwise(F.array(expired, open_b))
    attr = lambda k, v: F.struct(k.alias("key"), v.alias("value"))  # noqa: E731
    attrs = F.when(
        key % 5 != 0,
        F.array(
            attr(F.lit("badge"), kstr),
            attr(F.lit("rank"), F.concat(F.lit("rank"), (key % 7).cast("string"))),
        ),
    ).otherwise(F.array(attr(F.lit("badge"), kstr)))
    df = t["customer"].select(
        "c_custkey",
        contacts.alias("contacts"),
        assignments.alias("assignments"),
        attrs.alias("attributes"),
    )
    df = N.extract_email(df, "contacts")
    df = N.current_assignment(df, "assignments", "unit", "unit", today=F.lit("2026-01-01"))
    df = N.search_attribute(df, "attributes", "key", "rank", "value", "rank_val")
    return df.select("c_custkey", "email", "unit", "unit_valid_date", "rank_val")


@query(
    "q_struct_hoist_explode",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_orderkey % 3 AS n_segs
      FROM orders
    ), segs AS (
      SELECT o_orderkey, o_orderstatus,
             'closure' || CAST(o_orderkey AS VARCHAR) AS closure_id,
             'seg' || CAST(o_orderkey AS VARCHAR) || '_' || CAST(i AS VARCHAR) AS seg_id,
             o_orderkey * 10 + i AS seg_len
      FROM base, UNNEST(GENERATE_SERIES(1, n_segs)) AS t(i)
    )
    SELECT o_orderkey, o_orderstatus AS status_hoisted, closure_id, seg_id, seg_len
    FROM segs
    """,
)
def q_struct_hoist_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractField's nested-struct hoist (dataflow_utils.py:326-341) +
    the DOMI street-closure two-level unnest (gcs_utils.py:597-662) under
    the hash gate: each order carries a struct payload and an
    array<struct<segments:array<struct>>> xref; the engine hoists
    payload.status and explodes closures × segments, dropping rows with
    empty closures (orderkey % 3 == 0 → zero segments → no rows, matching
    the reference's inner-unnest semantics for present closures)."""
    from data_rivers_spark.operators import nested as N

    t = load_tables(spark, sf_dir, ["orders"])
    key = F.col("o_orderkey")
    kstr = key.cast("string")
    seg = lambda i: F.struct(  # noqa: E731
        F.concat(F.lit("seg"), kstr, F.lit("_"), i.cast("string")).alias("seg_id"),
        (key * 10 + i).alias("seg_len"),
    )
    segments = F.transform(F.sequence(F.lit(1), (key % 3).cast("int")), seg)
    closures = F.when(
        key % 3 != 0,
        F.array(
            F.struct(
                F.concat(F.lit("closure"), kstr).alias("closure_id"),
                segments.alias("segments"),
            )
        ),
    ).otherwise(
        F.array().cast(
            "array<struct<closure_id:string,"
            "segments:array<struct<seg_id:string,seg_len:bigint>>>>"
        )
    )
    df = t["orders"].select(
        "o_orderkey",
        F.struct(F.col("o_orderstatus").alias("status")).alias("payload"),
        closures.alias("closures"),
    )
    df = X.extract_field(df, ["payload"], ["status"], ["status_hoisted"])
    out = N.explode_nested_xref(
        df, "closures", "segments", ["o_orderkey", "status_hoisted"]
    )
    # inner explode_outer keeps a NULL row for empty closures; the DOMI
    # shape drops parents with no closure (they re-enter via the parent
    # table) — filter to present segments like the reference's UNNEST
    return out.filter(F.col("seg_id").isNotNull()).select(
        "o_orderkey", "status_hoisted", "closure_id", "seg_id", "seg_len"
    )


@query(
    "q_geocode_crosswalk",
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             'ADDR_' || CAST(c_custkey AS VARCHAR) AS address,
             CASE c_custkey % 4 WHEN 0 THEN 'Precise' WHEN 1 THEN 'Intersection'
                                WHEN 2 THEN 'Underspecified' ELSE 'Raw' END AS atype,
             CAST(c_custkey AS DOUBLE) * 0.5 AS in_lat,
             CAST(c_custkey AS DOUBLE) * -0.25 AS in_long,
             c_custkey % 2 = 0 AS hit
      FROM customer
    )
    SELECT c_custkey, address,
           CASE WHEN atype <> 'Raw' AND NOT hit THEN 'Unmappable'
                ELSE atype END AS address_type,
           CASE WHEN atype <> 'Raw' AND hit
                THEN 'FMT ADDR_' || CAST(c_custkey AS VARCHAR) END
             AS google_formatted_address,
           CASE WHEN atype <> 'Raw' AND hit THEN CAST(c_custkey AS DOUBLE)
                WHEN atype = 'Raw' THEN in_lat END AS latitude,
           CASE WHEN atype <> 'Raw' AND hit THEN CAST(c_custkey AS DOUBLE) * -1.0
                WHEN atype = 'Raw' THEN in_long END AS longitude,
           in_lat AS input_latitude, in_long AS input_longitude
    FROM base
    """,
)
def q_geocode_crosswalk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GoogleMapsGeocodeAddress semantics via the hermetic broadcast
    crosswalk (dataflow_utils.py geocoding DoFns; geocode.py:27): geocodable
    rows (Precise/Intersection/Underspecified) take crosswalk coordinates on
    a hit and become 'Unmappable' with NULL coords on a miss; 'Raw' rows
    pass their input coordinates through untouched; input_* columns preserve
    the pre-enrichment values. Crosswalk = even keys only, so both branches
    run on every address type."""
    from data_rivers_spark.operators import geocode as G

    t = load_tables(spark, sf_dir, ["customer"])
    key = F.col("c_custkey")
    base = t["customer"].select(
        "c_custkey",
        F.concat(F.lit("ADDR_"), key.cast("string")).alias("address"),
        F.when(key % 4 == 0, F.lit("Precise"))
        .when(key % 4 == 1, F.lit("Intersection"))
        .when(key % 4 == 2, F.lit("Underspecified"))
        .otherwise(F.lit("Raw"))
        .alias("address_type"),
        (key * 0.5).alias("latitude"),
        (key * -0.25).alias("longitude"),
    )
    cw = (
        t["customer"]
        .filter(key % 2 == 0)
        .select(
            F.concat(F.lit("ADDR_"), key.cast("string")).alias("address"),
            F.concat(F.lit("FMT ADDR_"), key.cast("string")).alias("formatted_address"),
            (key * 1.0).alias("lat"),
            (key * -1.0).alias("long"),
        )
    )
    out = G.geocode_with_crosswalk(base, cw, "address")
    return out.select(
        "c_custkey", "address", "address_type", "google_formatted_address",
        "latitude", "longitude", "input_latitude", "input_longitude",
    )
