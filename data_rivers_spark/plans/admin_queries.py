"""Driver-contract queries for the employee-admin SQL builders
(SURVEY.md §2.3: ceridian_admin / ad_admin / intime_admin / qscend submitter).

Fixtures are synthesized from customer/supplier/orders/events columns so each
builder's relational shape (3-way comma joins, fallback joins, composite-key
unions, temporal CASE resolution) runs under the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_rivers_spark.plans.registry import query
from data_rivers_spark.session import load_tables


@query(
    "q_timebank_discrepancy",
    oracle="""
    WITH a AS (SELECT o_custkey AS emp,
                      CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS bal_a_cents
               FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey),
         b AS (SELECT o_custkey AS emp,
                      CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS bal_b_cents
               FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_orderstatus = 'F'
               GROUP BY o_custkey)
    SELECT a.emp, bal_a_cents, bal_b_cents
    FROM a JOIN b ON a.emp = b.emp
    WHERE bal_a_cents != bal_b_cents
    """,
)
def q_timebank_discrepancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timebank balance comparison: multi-source equi join + rounded-balance
    discrepancy detection (ceridian_admin.py:82-109). Balances sum as exact
    integer cents — double sums rounded to 1 decimal flip at bucket
    boundaries under summation-order noise."""
    t = load_tables(spark, sf_dir, ["orders"])
    o = t["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    a = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("emp"))
        .agg(F.sum(cents).alias("bal_a_cents"))
    )
    b = (
        o.filter(
            (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("o_orderstatus") == "F")
        )
        .groupBy(F.col("o_custkey").alias("emp"))
        .agg(F.sum(cents).alias("bal_b_cents"))
    )
    return a.join(b, "emp").filter(F.col("bal_a_cents") != F.col("bal_b_cents"))


@query(
    "q_new_hires",
    oracle="""
    SELECT user_id, event_id,
           CASE WHEN event_type LIKE '%sign%' THEN 'New Signup' ELSE 'Other' END AS hire_kind
    FROM events
    WHERE DATE_DIFF('day', ts, TIMESTAMP '2024-02-01') <= 14
      AND DATE_DIFF('day', ts, TIMESTAMP '2024-02-01') >= 0
    ORDER BY event_id
    """,
)
def q_new_hires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency filter + LIKE-derived class (extract_new_hires,
    ceridian_admin.py:122-140), pinned to a fixed 'today' for determinism."""
    t = load_tables(spark, sf_dir, ["events"])
    today = F.lit("2024-02-01").cast("timestamp")
    dd = F.datediff(today, F.col("ts"))
    return (
        t["events"]
        .filter((dd <= 14) & (dd >= 0))
        .select(
            "user_id",
            "event_id",
            F.when(F.col("event_type").like("%sign%"), "New Signup")
            .otherwise("Other")
            .alias("hire_kind"),
        )
        .orderBy("event_id")
    )


@query(
    "q_id_fallback_join",
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 4 = 0 THEN NULL ELSE CAST(c_custkey AS VARCHAR) END AS maybe_id,
             c_name, c_nationkey
    FROM customer
    ), primary_match AS (
      SELECT b.c_custkey, s.s_suppkey AS matched
      FROM base b JOIN supplier s ON TRY_CAST(b.maybe_id AS BIGINT) % 10 = s.s_suppkey
      WHERE b.maybe_id IS NOT NULL
    ), fallback_match AS (
      SELECT b.c_custkey, s.s_suppkey AS matched
      FROM base b JOIN supplier s ON b.c_nationkey % 10 = s.s_suppkey
      WHERE b.maybe_id IS NULL
    )
    SELECT c_custkey, matched FROM primary_match
    UNION ALL
    SELECT c_custkey, matched FROM fallback_match
    """,
)
def q_id_fallback_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invalid-id detection (SAFE_CAST IS NULL) + primary-then-fallback join
    staging (update_ids_from_ceridian, ad_admin.py:53-87)."""
    t = load_tables(spark, sf_dir, ["customer", "supplier"])
    base = t["customer"].select(
        "c_custkey",
        F.when(F.col("c_custkey") % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_custkey").cast("string"))
        .alias("maybe_id"),
        "c_nationkey",
    )
    sup = F.broadcast(t["supplier"].select("s_suppkey"))
    primary = (
        base.filter(F.col("maybe_id").isNotNull())
        .join(sup, F.col("maybe_id").try_cast("long") % 10 == F.col("s_suppkey"))
        .select("c_custkey", F.col("s_suppkey").alias("matched"))
    )
    fallback = (
        base.filter(F.col("maybe_id").isNull())
        .join(sup, F.col("c_nationkey") % 10 == F.col("s_suppkey"))
        .select("c_custkey", F.col("s_suppkey").alias("matched"))
    )
    return primary.unionByName(fallback)


@query(
    "q_submitter_linkage",
    oracle="""
    WITH existing AS (
      SELECT CAST(o_orderkey AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR) AS link_key,
             o_orderkey, o_custkey
      FROM orders WHERE o_orderkey % 2 = 0
    ), incoming AS (
      SELECT CAST(o_orderkey AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR) AS link_key,
             o_orderkey, o_custkey
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    )
    SELECT o_orderkey, o_custkey FROM existing
    UNION ALL
    SELECT o_orderkey, o_custkey FROM incoming
    WHERE link_key NOT IN (SELECT link_key FROM existing)
    """,
)
def q_submitter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key (CONCAT) NOT-IN ∪ UNION ALL linkage
    (join_submitter_to_request, submitter_admin.py:4-22)."""
    t = load_tables(spark, sf_dir, ["orders"])
    o = t["orders"]
    key = F.concat_ws(":", F.col("o_orderkey").cast("string"), F.col("o_custkey").cast("string"))
    existing = o.filter(F.col("o_orderkey") % 2 == 0).select(
        key.alias("link_key"), "o_orderkey", "o_custkey"
    )
    incoming = o.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")).select(
        key.alias("link_key"), "o_orderkey", "o_custkey"
    )
    fresh = incoming.join(existing.select("link_key"), "link_key", "left_anti")
    return existing.select("o_orderkey", "o_custkey").unionByName(
        fresh.select("o_orderkey", "o_custkey")
    )


@query(
    "q_rank_resolution",
    oracle="""
    SELECT s_suppkey,
           CASE WHEN s_suppkey % 5 = 0 THEN 'Acting ' ||
                     CASE WHEN s_nationkey % 3 = 0 THEN 'Sergeant' ELSE 'Officer' END
                WHEN s_nationkey % 3 = 0 THEN 'Sergeant'
                ELSE 'Officer' END AS rank,
           s_name
    FROM supplier
    WHERE s_acctbal BETWEEN -1000 AND 10000
    """,
)
def q_rank_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE precedence rank resolution + BETWEEN temporal-style filter
    (extract_current_intime_details, intime_admin.py:4-30)."""
    t = load_tables(spark, sf_dir, ["supplier"])
    base_rank = F.when(F.col("s_nationkey") % 3 == 0, "Sergeant").otherwise("Officer")
    return (
        t["supplier"]
        .filter(F.col("s_acctbal").between(-1000, 10000))
        .select(
            "s_suppkey",
            F.when(F.col("s_suppkey") % 5 == 0, F.concat(F.lit("Acting "), base_rank))
            .otherwise(base_rank)
            .alias("rank"),
            "s_name",
        )
    )


@query(
    "q_sync_311_updates",
    oracle="""
    WITH master AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
    ), updated AS (
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 4 = 0
    )
    SELECT m.o_orderkey, m.o_orderstatus, ROUND(m.o_totalprice, 2) AS price
    FROM master m
    WHERE m.o_orderkey NOT IN (SELECT o_orderkey FROM updated)
    UNION ALL
    SELECT m.o_orderkey, u.o_orderstatus, ROUND(m.o_totalprice, 2) AS price
    FROM master m, updated u WHERE m.o_orderkey = u.o_orderkey
    """,
)
def q_sync_311_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-IN base rows ∪ re-joined updated rows (comma cross join with WHERE
    equi) — sync_311_updates (transform_enrich_requests.py:154-171)."""
    t = load_tables(spark, sf_dir, ["orders"])
    o = t["orders"]
    master = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updated = o.filter(F.col("o_orderkey") % 4 == 0).select(
        "o_orderkey", F.col("o_orderstatus").alias("__new_status")
    )
    untouched = master.join(updated.select("o_orderkey"), "o_orderkey", "left_anti").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price")
    )
    refreshed = master.join(updated, "o_orderkey").select(
        "o_orderkey",
        F.col("__new_status").alias("o_orderstatus"),
        F.round("o_totalprice", 2).alias("price"),
    )
    return untouched.unionByName(refreshed)


@query(
    "q_current_assignment",
    oracle="""
    WITH a AS (
      SELECT l_orderkey,
             l_returnflag || CAST(l_linenumber AS VARCHAR) AS nm,
             STRFTIME(l_shipdate, '%Y-%m-%d') AS vf,
             CASE WHEN l_linestatus = 'F'
                  THEN CAST(YEAR(l_shipdate) + 1 AS VARCHAR) || STRFTIME(l_shipdate, '-%m-%d')
             END AS vt
      FROM lineitem
    ), valid AS (
      SELECT * FROM a WHERE vf < '1997-06-01' AND (vt IS NULL OR vt > '1997-06-01')
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY vf DESC, nm DESC) AS rn
      FROM valid
    )
    SELECT o.l_orderkey, r.nm AS rank, r.vf AS rank_valid_date
    FROM (SELECT DISTINCT l_orderkey FROM lineitem) o
    LEFT JOIN ranked r ON o.l_orderkey = r.l_orderkey AND r.rn = 1
    """,
)
def q_current_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """validFrom/validTo current-assignment resolution over an assignment
    history array (InTime deep-nest, intime_employees_pandas.py:77-135) —
    the array-native operator vs the oracle's ROW_NUMBER formulation."""
    from data_rivers_spark.operators import nested as N

    t = load_tables(spark, sf_dir, ["lineitem"])
    li = t["lineitem"]
    item = F.struct(
        F.concat(F.col("l_returnflag"), F.col("l_linenumber").cast("string")).alias("rankName"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("validFrom"),
        F.when(
            F.col("l_linestatus") == "F",
            F.concat(
                (F.year("l_shipdate") + 1).cast("string"),
                F.date_format("l_shipdate", "-MM-dd"),
            ),
        ).alias("validTo"),
    )
    ranks = li.groupBy("l_orderkey").agg(F.array_agg(item).alias("ranks"))
    out = N.current_assignment(ranks, "ranks", "rankName", "rank", F.lit("1997-06-01"))
    return out.select("l_orderkey", "rank", "rank_valid_date")


@query(
    "q_update_submitter",
    oracle="""
    WITH fresh AS (
      SELECT o_custkey, o_orderstatus,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
             COUNT(*) AS n
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      GROUP BY o_custkey, o_orderstatus
    ), old AS (
      SELECT o_custkey, o_orderstatus,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
             COUNT(*) AS n
      FROM orders GROUP BY o_custkey, o_orderstatus
    )
    SELECT * FROM fresh
    UNION ALL
    SELECT * FROM old
    WHERE (CAST(o_custkey AS VARCHAR) || ':' || o_orderstatus) NOT IN
          (SELECT CAST(o_custkey AS VARCHAR) || ':' || o_orderstatus FROM fresh)
    """,
)
def q_update_submitter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Submitter-table refresh: re-aggregated fresh groups ∪ old rows whose
    composite key didn't re-appear (update_submitter_table,
    submitter_admin.py:25-38)."""
    from data_rivers_spark.operators import relational as R

    t = load_tables(spark, sf_dir, ["orders"])
    o = t["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey", "o_orderstatus").agg(
            F.sum(cents).alias("total_cents"), F.count(F.lit(1)).alias("n")
        )

    fresh = agg(o.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")))
    old = agg(o)
    return R.snapshot_append(old, fresh, ["o_custkey", "o_orderstatus"])


@query(
    "q_eeo4_full_report",
    oracle="""
    WITH bands AS (
      SELECT * FROM (VALUES
        (0.0, 2500.0, 'B1'), (2500.0, 5000.0, 'B2'),
        (5000.0, 7500.0, 'B3'), (7500.0, 100000.0, 'B4')) AS t(lo, hi, band)
    ), emp AS (
      SELECT c_mktsegment AS job_function, c_acctbal AS salary,
             CASE WHEN c_custkey % 2 = 0 THEN 'F' ELSE 'M' END AS gender
      FROM customer WHERE c_acctbal >= 0
    ), joined AS (
      SELECT b.band, e.job_function, e.gender
      FROM emp e RIGHT JOIN bands b ON e.salary >= b.lo AND e.salary < b.hi
    )
    SELECT job_function, band, gender, COUNT(job_function) AS n FROM joined
    GROUP BY job_function, band, gender
    UNION ALL
    SELECT 'ALL' AS job_function, band, gender, COUNT(job_function) AS n FROM joined
    GROUP BY band, gender
    """,
)
def q_eeo4_full_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EEO4 report's full relational shape (ceridian_admin.py:5-57):
    salary bands as a dimension RIGHT OUTER JOINed to employees (empty bands
    survive) + UNION ALL of per-function and all-function sections."""
    t = load_tables(spark, sf_dir, ["customer"])
    bands = spark.createDataFrame(
        [(0.0, 2500.0, "B1"), (2500.0, 5000.0, "B2"),
         (5000.0, 7500.0, "B3"), (7500.0, 100000.0, "B4")],
        "lo double, hi double, band string",
    )
    emp = (
        t["customer"]
        .filter(F.col("c_acctbal") >= 0)
        .select(
            F.col("c_mktsegment").alias("job_function"),
            F.col("c_acctbal").alias("salary"),
            F.when(F.col("c_custkey") % 2 == 0, "F").otherwise("M").alias("gender"),
        )
    )
    joined = emp.join(
        F.broadcast(bands),
        (F.col("salary") >= F.col("lo")) & (F.col("salary") < F.col("hi")),
        "right",
    ).select("band", "job_function", "gender")
    per_fn = joined.groupBy("job_function", "band", "gender").agg(
        F.count("job_function").alias("n")
    )
    overall = joined.groupBy("band", "gender").agg(
        F.count("job_function").alias("n")
    ).select(F.lit("ALL").alias("job_function"), "band", "gender", "n")
    return per_fn.unionByName(overall)
