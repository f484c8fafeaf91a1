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
