"""Pluggable geocoder with hermetic crosswalk default (SURVEY §4 hard part)."""

from __future__ import annotations

from data_rivers_spark.operators.geocode import geocode_with_crosswalk


def test_geocode_crosswalk_hit_miss_and_skip(spark):
    df = spark.createDataFrame(
        [
            ("5939 5TH AVE, Pittsburgh", "Precise", 0.0, 0.0),
            ("99999 53483u9TH AVE, Pittsburgh", "Precise", 0.0, 0.0),  # miss → Unmappable
            (None, "Missing", 0.0, 0.0),  # not geocoded
            (None, "Coordinates Only", 40.48, -79.93),  # coords preserved
        ],
        "pii_input_address string, address_type string, latitude double, longitude double",
    )
    cw = spark.createDataFrame(
        [("5939 5TH AVE, Pittsburgh", "5939 Fifth Ave, Pittsburgh, PA 15232, USA", 40.4519661, -79.924539)],
        "address string, formatted_address string, lat double, long double",
    )
    out = {r.address_type: r for r in
           geocode_with_crosswalk(df, cw, "pii_input_address").collect()}
    # hit: formatted + coords filled, type preserved
    hit = [r for r in out.values() if r.google_formatted_address]
    assert len(hit) == 1 and hit[0].latitude == 40.4519661
    # miss on a geocodable address → Unmappable with NULL coords
    assert "Unmappable" in out and out["Unmappable"].latitude is None
    # Missing skipped entirely; Coordinates Only keeps its input coords
    assert out["Missing"].google_formatted_address is None
    assert out["Coordinates Only"].latitude == 40.48
    # originals preserved
    assert hit[0].input_latitude == 0.0
