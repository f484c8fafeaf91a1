"""Pluggable geocoding (SURVEY.md §4 hard-part #3: external enrichment
services with hermetic offline substitutes).

The reference geocodes via Google Maps / Allegheny County HTTP APIs
(GoogleMapsGeocodeAddress dataflow_utils.py:482-511, GeocodeAddress :514-522,
regularize_and_geocode_address :1004-1083) with retry/backoff. Network stays
at the edge: the engine-level operator is a broadcast join against a
crosswalk table (address → canonical address + lat/long) that a production
deployment populates by batch-calling the real service (through
sources.extract.backoff_retry) and caching results — the pattern the
reference itself uses for other lookups (GetValsFromExternalFile).

Semantics preserved from the reference:
- only rows with address_type != 'Missing' are geocoded (dataflow_utils.py:508)
- a Precise/Intersection/Underspecified address that fails to geocode is
  reclassified 'Unmappable' with NULL coordinates (pinned by the reference's
  golden tests, test_dataflow_utils.py:186: streetNum 99999 → Unmappable)
- input coordinates are preserved in input_* columns when requested
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def geocode_with_crosswalk(
    df: DataFrame,
    crosswalk: DataFrame,
    address_col: str,
    lat_col: str = "latitude",
    long_col: str = "longitude",
    type_col: str = "address_type",
    formatted_col: str = "google_formatted_address",
    keep_input: bool = True,
) -> DataFrame:
    """Geocode via a broadcast crosswalk with columns
    (address, formatted_address, lat, long).

    Scale: the crosswalk is a dim (unique addresses seen so far) — broadcast;
    the fact side streams with no shuffle. Cache misses surface as
    'Unmappable' rows, which a production loop feeds back to the external
    service and appends to the crosswalk (exactly the reference's
    incremental-enrichment posture)."""
    cw = F.broadcast(
        crosswalk.select(
            F.col("address").alias("__cw_addr"),
            F.col("formatted_address").alias("__cw_fmt"),
            F.col("lat").alias("__cw_lat"),
            F.col("long").alias("__cw_long"),
        )
    )
    joined = df.join(cw, F.col(address_col) == F.col("__cw_addr"), "left")
    if keep_input:
        joined = joined.withColumn(f"input_{lat_col}", F.col(lat_col)).withColumn(
            f"input_{long_col}", F.col(long_col)
        )
    geocodable = F.col(type_col).isin("Precise", "Intersection", "Underspecified")
    hit = F.col("__cw_fmt").isNotNull()
    return (
        joined.withColumn(formatted_col, F.when(geocodable & hit, F.col("__cw_fmt")))
        .withColumn(
            lat_col,
            F.when(geocodable & hit, F.col("__cw_lat")).otherwise(
                F.when(~geocodable, F.col(lat_col))
            ),
        )
        .withColumn(
            long_col,
            F.when(geocodable & hit, F.col("__cw_long")).otherwise(
                F.when(~geocodable, F.col(long_col))
            ),
        )
        .withColumn(
            type_col,
            F.when(geocodable & ~hit, F.lit("Unmappable")).otherwise(F.col(type_col)),
        )
        .drop("__cw_addr", "__cw_fmt", "__cw_lat", "__cw_long")
    )
