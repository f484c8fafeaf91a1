"""Accuracy/semantics tests for analytics extensions."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_rivers_spark.session import load_tables


def test_approx_distinct_within_rsd(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.approx - r.exact) <= max(3, 0.1 * r.exact), r


def test_asof_join_directions_and_tolerance(spark):
    from data_rivers_spark.operators import relational as R

    left = spark.createDataFrame(
        [(1, 100.0, "a"), (1, 205.0, "b"), (2, 50.0, "c")],
        "k long, ts double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 90.0, 9.0), (1, 200.0, 20.0), (1, 210.0, 21.0), (2, 400.0, 40.0)],
        "k long, ts double, v double",
    )
    back = {r.tag: r.v for r in R.asof_join(left, right, "ts", "k", ["v"]).collect()}
    assert back == {"a": 9.0, "b": 20.0, "c": None}
    fwd = {r.tag: r.v for r in R.asof_join(
        left, right, "ts", "k", ["v"], direction="forward").collect()}
    assert fwd == {"a": 20.0, "b": 21.0, "c": 40.0}
    # tolerance: backward match for 'a' is 10 units away -> survives tol=15,
    # dies at tol=5; forward 'c' match is 350 away -> nulled
    tol_b = {r.tag: r.v for r in R.asof_join(
        left, right, "ts", "k", ["v"], tolerance=5.0).collect()}
    assert tol_b == {"a": None, "b": 20.0, "c": None}
    tol_f = {r.tag: r.v for r in R.asof_join(
        left, right, "ts", "k", ["v"], direction="forward", tolerance=15.0).collect()}
    assert tol_f == {"a": None, "b": 21.0, "c": None}
    # equal-ts tie is inclusive in both directions
    eq = spark.createDataFrame([(3, 200.0, "z")], "k long, ts double, tag string")
    r2 = spark.createDataFrame([(3, 200.0, 7.0)], "k long, ts double, v double")
    assert R.asof_join(eq, r2, "ts", "k", ["v"]).first().v == 7.0
    assert R.asof_join(eq, r2, "ts", "k", ["v"], direction="forward").first().v == 7.0
    # ts_col/by in value_cols would mint duplicate __r_ aliases -> clear error
    import pytest

    with pytest.raises(ValueError, match="value_cols"):
        R.asof_join(left, right, "ts", "k", ["v", "ts"])
    with pytest.raises(ValueError, match="value_cols"):
        R.asof_join(left, right, "ts", "k", ["k"])


def test_asof_join_nearest(spark):
    from data_rivers_spark.operators import relational as R

    left = spark.createDataFrame(
        [(1, 100.0, "a"), (1, 205.0, "b"), (2, 50.0, "c"), (3, 10.0, "d")],
        "k long, ts double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 90.0, 9.0), (1, 200.0, 20.0), (1, 212.0, 21.0), (2, 400.0, 40.0)],
        "k long, ts double, v double",
    )
    near = {r.tag: r.v for r in R.asof_join(
        left, right, "ts", "k", ["v"], direction="nearest").collect()}
    # a: backward 90 (gap 10) vs forward 200 (gap 100) -> 9.0
    # b: backward 200 (gap 5) vs forward 212 (gap 7) -> 20.0
    # c: only forward exists (gap 350) -> 40.0;  d: no right rows -> None
    assert near == {"a": 9.0, "b": 20.0, "c": 40.0, "d": None}
    # tolerance nulls the far-away forward-only match
    tol = {r.tag: r.v for r in R.asof_join(
        left, right, "ts", "k", ["v"], direction="nearest", tolerance=100.0
    ).collect()}
    assert tol == {"a": 9.0, "b": 20.0, "c": None, "d": None}
    # equal distance prefers the backward (earlier) match, pandas-style
    mid = spark.createDataFrame([(1, 206.0, "m")], "k long, ts double, tag string")
    assert R.asof_join(
        mid, right, "ts", "k", ["v"], direction="nearest"
    ).first().v == 20.0
    # equal-ts right row matches with gap 0 via the backward frame
    eq = spark.createDataFrame([(1, 212.0, "e")], "k long, ts double, tag string")
    assert R.asof_join(
        eq, right, "ts", "k", ["v"], direction="nearest"
    ).first().v == 21.0
