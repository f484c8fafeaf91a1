"""SQL-surface breadth beyond the reference (SURVEY §2.6 notes the reference
has no grouping sets/rollup/cube, no EXCEPT, no rank/ntile): a migrating user
expects them from an analytics engine, and they're native Catalyst operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_rivers_spark.plans.registry import query
from data_rivers_spark.session import load_tables


@query(
    "q_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → priority → grand total)."""
    t = load_tables(spark, sf_dir, ["orders"])
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("total_cents"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total_cents",
        )
    )


@query(
    "q_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: every subtotal combination."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
        )
    )


@query(
    "q_except_intersect",
    oracle="""
    SELECT 'only_f' AS side, custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'both' AS side, custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    )
    """,
)
def q_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT and INTERSECT set operations."""
    t = load_tables(spark, sf_dir, ["orders"])
    f_side = (
        t["orders"].filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    )
    o_side = (
        t["orders"].filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    )
    # subtract = EXCEPT DISTINCT; exceptAll is the multiset variant and keeps
    # leftover occurrences of keys present on both sides
    only_f = f_side.subtract(o_side).select(F.lit("only_f").alias("side"), "custkey")
    both = f_side.intersect(o_side).select(F.lit("both").alias("side"), "custkey")
    return only_f.unionByName(both)


@query(
    "q_rank_ntile",
    oracle="""
    SELECT c_custkey,
           RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
           NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile,
           ROUND(PERCENT_RANK() OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey), 4) AS pr
    FROM customer
    """,
)
def q_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / ntile / percent_rank window functions."""
    t = load_tables(spark, sf_dir, ["customer"])
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return t["customer"].select(
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pr"),
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (status-only, priority-only, grand total) —
    distinct from rollup/cube; expressed via spark.sql over the loaded view."""
    load_tables(spark, sf_dir, ["orders"])
    return spark.sql("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@query(
    "q_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS p50,
           ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (Spark `percentile` ==
    DuckDB QUANTILE_CONT interpolation)."""
    t = load_tables(spark, sf_dir, ["orders"])
    return t["orders"].groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 600000 THEN 13
                ELSE CAST(FLOOR(o_totalprice / 50000) AS BIGINT) + 1 END AS bucket,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """width_bucket histogram of order totals."""
    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t["orders"]
        .select(F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_stats_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           ROUND(STDDEV_SAMP(l_discount), 4) AS disc_stddev
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation + sample stddev per group."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.stddev_samp("l_discount"), 4).alias("disc_stddev"),
    )
