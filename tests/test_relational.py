"""Unit tests for relational ops not covered by the driver oracle queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_rivers_spark.operators import relational as R


def test_full_refresh_merge(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    new = spark.createDataFrame([(1, "a2"), (1, "a2"), (3, "c")], ["k", "v"])
    out = {(r.k, r.v) for r in R.full_refresh_merge(new, old, "k").collect()}
    assert out == {(1, "a2"), (3, "c"), (2, "b")}


def test_filter_old_values(spark):
    master = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    temp = spark.createDataFrame([(2,)], ["k"])
    out = {r.k for r in R.filter_old_values(master, temp, "k").collect()}
    assert out == {1, 3}


def test_upsert_replaces_and_inserts(spark):
    master = spark.createDataFrame([(1, "old"), (2, "keep")], ["k", "v"])
    incoming = spark.createDataFrame([(1, "new"), (9, "ins")], ["k", "v"])
    out = {(r.k, r.v) for r in R.upsert(master, incoming, "k").collect()}
    assert out == {(1, "new"), (2, "keep"), (9, "ins")}


def test_split_table_by_range(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    shards = R.split_table_by_range(df, "x", [0, 5, 10])
    assert [s.count() for s in shards] == [5, 5]


def test_incremental_merge_updates_and_inserts(spark):
    master = spark.createDataFrame([(1, "a", 10), (2, "b", 10)], ["k", "v", "t"])
    incoming = spark.createDataFrame(
        [(1, "a9", 30), (1, "a8", 20), (3, "c", 5)], ["k", "v", "t"]
    )
    out = {(r.k, r.v, r.t) for r in
           R.incremental_merge(master, incoming, "k", ["v", "t"], ["t"]).collect()}
    assert out == {(1, "a9", 30), (2, "b", 10), (3, "c", 5)}


def test_salted_join_matches_plain(spark):
    from pyspark.sql import functions as F

    big = spark.range(0, 10000).select(
        (F.when(F.col("id") % 100 < 90, 1).otherwise(F.col("id") % 7)).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(7)], "k long, name string")
    plain = {(r.v, r.name) for r in big.join(small, "k").collect()}
    salted = {(r.v, r.name) for r in R.salted_join(big, small, "k").collect()}
    assert salted == plain


def test_salted_count_matches_plain(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 5000).select((F.col("id") % 3).alias("k"))
    plain = {(r.k, r["count"]) for r in df.groupBy("k").count().collect()}
    salted = {(r.k, r.n) for r in R.salted_count(df, "k").collect()}
    assert salted == plain


def test_asof_join_semantics(spark):
    quotes = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 5, 50.0)], "k long, ts long, quote double"
    )
    trades = spark.createDataFrame(
        [(1, 15, "a"), (1, 20, "b"), (1, 5, "c"), (2, 99, "d"), (3, 10, "e")],
        "k long, ts long, tid string",
    )
    out = {r.tid: r.quote for r in
           R.asof_join(trades, quotes, "ts", "k", ["quote"]).collect()}
    assert out == {
        "a": 100.0,  # latest quote at ts<=15
        "b": 200.0,  # equal-ts quote visible
        "c": None,   # before first quote
        "d": 50.0,
        "e": None,   # key with no quotes
    }


def test_global_row_number_scalable_matches_exact(spark):
    # 1000 rows with duplicate order keys (ties) across several input partitions
    df = (
        spark.range(1000)
        .selectExpr("id AS k", "CAST(id % 37 AS INT) AS grp", "id % 3 AS tie")
        .repartition(7)
    )
    exact = R.global_row_number(df, ["grp", "k"], "seq")
    scal = R.global_row_number_scalable(df, ["grp", "k"], "seq", num_partitions=5)
    a = {(r.k, r.seq) for r in exact.collect()}
    b = {(r.k, r.seq) for r in scal.collect()}
    assert a == b
    # contract: a dense 1..n permutation
    assert sorted(s for _, s in b) == list(range(1, 1001))
    # the offsets are only valid if the counts branch and the output branch
    # read the SAME computed partitioning — the materialized (checkpointed)
    # frame guarantees it structurally; a plan that re-ranges per branch
    # (two rangepartitioning exchanges, no reuse) would corrupt seq silently
    # the moment the branches' subplans diverge
    plan = scal._jdf.queryExecution().executedPlan().toString()
    assert plan.count("rangepartitioning") == 0, plan


def test_refresh_time_rollup_incremental(spark, tmp_path):
    """Continuous-aggregate maintenance: the refresh recomputes ONLY the
    buckets touched by the new batch (late rows included), leaves other
    buckets' partitions untouched, and converges to the full-rebuild
    answer."""
    from data_rivers_spark.catalog.tables import ManagedCatalog
    from data_rivers_spark.operators.relational import (
        refresh_time_rollup,
        time_bucket_rollup,
    )

    cat = ManagedCatalog(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [
            (1, "2024-01-01 10:05:00", "a", 1.0),
            (2, "2024-01-01 10:45:00", "a", 2.0),
            (3, "2024-01-01 11:10:00", "b", 4.0),
        ],
        "event_id long, ts string, k string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cat.create_or_replace(base, "events_src")
    aggs = {"n": ("count", "value"), "total": ("sum", "value")}

    # bootstrap: full build
    n0 = refresh_time_rollup(cat, "events_src", "hourly", "ts", "hour",
                             ["k"], aggs)
    assert n0 == 2
    got = {(r.bucket, r.k): (r.n, r.total) for r in cat.read("hourly")
           .withColumn("bucket", F.date_format("bucket", "yyyy-MM-dd HH:mm:ss"))
           .collect()}
    assert got[("2024-01-01 10:00:00", "a")] == (2, 3.0)
    assert got[("2024-01-01 11:00:00", "b")] == (1, 4.0)

    # a LATE row lands in the 10:00 bucket; refresh scoped by the batch
    late = spark.createDataFrame(
        [(4, "2024-01-01 10:55:00", "a", 10.0)],
        "event_id long, ts string, k string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cat.insert_into("events_src", late)
    n1 = refresh_time_rollup(cat, "events_src", "hourly", "ts", "hour",
                             ["k"], aggs, touched=late)
    assert n1 == 1  # only the 10:00 bucket recomputed
    got = {(r.bucket, r.k): (r.n, r.total) for r in cat.read("hourly")
           .withColumn("bucket", F.date_format("bucket", "yyyy-MM-dd HH:mm:ss"))
           .collect()}
    # the touched bucket CONVERGED (recomputed from source, not delta-added)
    assert got[("2024-01-01 10:00:00", "a")] == (3, 13.0)
    assert got[("2024-01-01 11:00:00", "b")] == (1, 4.0)

    # equivalently: matches the from-scratch rollup over the full source
    full = {
        (r.bucket, r.k): (r.n, r.total)
        for r in time_bucket_rollup(
            cat.read("events_src"), "ts", "hour", ["k"], aggs
        ).collect()
    }
    assert got == full

    # an empty touched set is a no-op
    assert refresh_time_rollup(cat, "events_src", "hourly", "ts", "hour",
                               ["k"], aggs, touched=[]) == 0


def test_flatten_hierarchy_chain_forest_and_cycle(spark):
    from data_rivers_spark.operators.relational import flatten_hierarchy

    # one deep chain 1<-2<-...<-30 plus a small star rooted at 100
    chain = [(i + 1, i) for i in range(1, 30)]
    star = [(101, 100), (102, 100), (103, 101)]
    edges = spark.createDataFrame(chain + star, ["child", "parent"])
    out = {r.node: (r.root, r.depth) for r in
           flatten_hierarchy(edges, "child", "parent").collect()}
    assert len(out) == len(chain) + len(star)
    assert out[30] == (1, 29)          # deepest chain node
    assert out[2] == (1, 1)
    assert out[103] == (100, 2)        # star grandchild
    assert out[102] == (100, 1)
    # a cycle has no root: must raise, not silently drop
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["child", "parent"])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="cycle"):
        flatten_hierarchy(cyc, "child", "parent", max_iterations=5)
