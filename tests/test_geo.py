"""Point-in-polygon correctness on non-rectangular shapes (the oracle queries
cover rectangles; these pin triangles, concave rings, and edge behavior)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_rivers_spark.functions.geo import (
    point_in_wkt_polygon,
    polygon_centroid,
    wkt_polygon_vertices,
)

TRIANGLE = "POLYGON((0 0, 10 0, 5 10, 0 0))"
# U-shaped concave polygon: the notch (4..6, 2..10) is outside
CONCAVE = "POLYGON((0 0, 10 0, 10 10, 6 10, 6 2, 4 2, 4 10, 0 10, 0 0))"


def _check(spark, wkt, points):
    df = spark.createDataFrame(points, "px double, py double")
    out = df.withColumn(
        "inside", point_in_wkt_polygon(F.col("px"), F.col("py"), F.lit(wkt))
    )
    return [r.inside for r in out.collect()]


def test_triangle(spark):
    got = _check(
        spark,
        TRIANGLE,
        [(5.0, 1.0), (5.0, 9.9), (0.5, 5.0), (9.5, 5.0), (5.0, -1.0), (11.0, 0.5)],
    )
    assert got == [True, True, False, False, False, False]


def test_concave(spark):
    got = _check(
        spark,
        CONCAVE,
        [(2.0, 5.0), (8.0, 5.0), (5.0, 5.0), (5.0, 1.0), (5.0, 11.0), (-1.0, 5.0)],
    )
    #          left arm      right arm    notch       bridge      above       outside
    assert got == [True, True, False, True, False, False]


def test_centroid(spark):
    df = spark.createDataFrame([("POLYGON((2 4, 6 4, 6 8, 2 8, 2 4))",)], "wkt string")
    out = df.select(
        polygon_centroid(wkt_polygon_vertices(F.col("wkt"))).alias("c")
    ).collect()[0]["c"]
    assert (out["x"], out["y"]) == (4.0, 6.0)
