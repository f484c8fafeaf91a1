"""Geospatial expression library — WKT parsing and point-in-polygon as pure
Catalyst expressions (higher-order functions), no Python UDFs.

The reference stores geometry as WKT strings and uses BigQuery
ST_CONTAINS/ST_COVERS/ST_GEOGFROMTEXT (geo_queries.py:4-108, :123-154;
ConvertGeography dataflow_utils.py:266-297). Zone tables number in the
dozens → always broadcast; the expensive side is the point fact table, and
keeping the predicate JVM-side keeps the probe inside codegen.

Limitations (match the reference's actual usage): planar geometry (the
reference's zones are city-scale where geodesic vs planar is negligible),
single-ring polygons (no holes), LINESTRING/POLYGON/POINT WKT.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def wkt_polygon_vertices(wkt: Column) -> Column:
    """POLYGON((x1 y1, x2 y2, ...)) → array<struct<x:double, y:double>>.

    The outer ring only; the closing vertex is kept (harmless for ray
    casting, as the closing edge has zero extent when repeated)."""
    inner = F.regexp_extract(wkt, r"\(\(([^)]*)\)\)", 1)
    pairs = F.split(inner, r",\s*")
    return F.transform(
        pairs,
        lambda p: F.struct(
            F.split(F.trim(p), r"\s+").getItem(0).try_cast("double").alias("x"),
            F.split(F.trim(p), r"\s+").getItem(1).try_cast("double").alias("y"),
        ),
    )


def point_in_polygon(px: Column, py: Column, vertices: Column) -> Column:
    """Ray-casting point-in-polygon over a vertex array — expressed with
    zip_with/filter so it compiles to JVM codegen (no UDF).

    Counts edges crossed by a horizontal ray from (px, py) to +∞; odd →
    inside. Points exactly on an edge are implementation-defined (same caveat
    as BigQuery ST_CONTAINS vs ST_COVERS polarity the reference works around,
    geo_queries.py:133-137)."""
    n = F.size(vertices)
    starts = F.slice(vertices, 1, n - 1)
    ends = F.slice(vertices, 2, n - 1)
    crossings = F.zip_with(
        starts,
        ends,
        lambda a, b: (
            ((a["y"] > py) != (b["y"] > py))
            & (px < (b["x"] - a["x"]) * (py - a["y"]) / (b["y"] - a["y"]) + a["x"])
        ),
    )
    return (F.size(F.filter(crossings, lambda c: c)) % 2) == 1


def point_in_wkt_polygon(px: Column, py: Column, wkt: Column) -> Column:
    """Convenience: parse + test in one expression. For a broadcast zone table
    prefer pre-parsing the vertex array once (see operators.geo)."""
    return point_in_polygon(px, py, wkt_polygon_vertices(wkt))


def make_wkt_point(x: Column, y: Column) -> Column:
    """POINT(x y) — ST_GEOGPOINT equivalent as text."""
    return F.concat(F.lit("POINT("), x.cast("string"), F.lit(" "), y.cast("string"), F.lit(")"))


def polygon_centroid(vertices: Column) -> Column:
    """Centroid of a polygon ring (ST_CENTROID over parcels,
    general_queries.py:75-84) — vertex-average approximation over the open
    ring (drops the repeated closing vertex), returned as
    struct<x:double,y:double>.

    A true area-weighted centroid is the shoelace formula; the reference's
    use (parcel → representative coordinate) tolerates vertex-average for
    convex parcel rings. TODO(round 2): shoelace via aggregate()."""
    n = F.size(vertices)
    ring = F.slice(vertices, 1, n - 1)
    sx = F.aggregate(ring, F.lit(0.0), lambda acc, v: acc + v["x"])
    sy = F.aggregate(ring, F.lit(0.0), lambda acc, v: acc + v["y"])
    cnt = F.size(ring).cast("double")
    return F.struct((sx / cnt).alias("x"), (sy / cnt).alias("y"))
