"""Ragged nested-extraction operator tests (InTime shapes, SURVEY §2.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_rivers_spark.operators import nested as N

CONTACTS_SCHEMA = (
    "id long, contacts array<struct<type:string, infos:array<struct<info:string>>>>"
)


def test_extract_email(spark):
    rows = [
        (1, [("EMAIL", [("jdoe@pittsburghpa.gov",)])]),
        (2, [("PHONE", [("412-555-1212",)]), ("EMAIL", [("412-555-1212",), ("a@pittsburghpa.gov",)])]),
        (3, [("PHONE", [("412-555-1212",)])]),
        (4, None),
    ]
    df = spark.createDataFrame(rows, CONTACTS_SCHEMA)
    out = {r.id: r.email for r in N.extract_email(df, "contacts").collect()}
    assert out == {1: "jdoe@pittsburghpa.gov", 2: "a@pittsburghpa.gov", 3: None, 4: None}


ASG_SCHEMA = (
    "id long, ranks array<struct<rankName:string, validFrom:string, validTo:string>>"
)


def test_current_assignment(spark):
    today = F.lit("2024-06-01")
    rows = [
        # history: old closed rank, then open current rank → latest open wins
        (1, [("Officer", "2015-01-01", "2020-01-01"), ("Sergeant", "2020-01-01", None), ("Lieutenant", "2023-01-01", None)]),
        # closed-but-currently-valid interval
        (2, [("Officer", "2020-01-01", "2030-01-01")]),
        # only future assignment → no current value
        (3, [("Chief", "2030-01-01", None)]),
        # expired only
        (4, [("Officer", "2010-01-01", "2012-01-01")]),
        (5, None),
    ]
    df = spark.createDataFrame(rows, ASG_SCHEMA)
    out = {r.id: (r.rank, r.rank_valid_date) for r in
           N.current_assignment(df, "ranks", "rankName", "rank", today).collect()}
    assert out[1] == ("Lieutenant", "2023-01-01")
    assert out[2] == ("Officer", "2020-01-01")
    assert out[3] == (None, None)
    assert out[4] == (None, None)
    assert out[5] == (None, None)


def test_search_attribute(spark):
    rows = [
        (1, [("Race", "White"), ("Gender", "F")]),
        (2, [("Gender", "M")]),
        (3, []),
    ]
    df = spark.createDataFrame(
        rows, "id long, attributes array<struct<attributeName:string, attributeValue:string>>"
    )
    out = {r.id: (r.race, r.gender) for r in
           N.search_attribute(
               N.search_attribute(df, "attributes", "attributeName", "Race", "attributeValue", "race"),
               "attributes", "attributeName", "Gender", "attributeValue", "gender",
           ).collect()}
    assert out == {1: ("White", "F"), 2: (None, "M"), 3: (None, None)}


def test_explode_nested_xref(spark):
    rows = [
        (1, [
            {"seg_id": "A", "pts": [{"x": 1.0}, {"x": 2.0}]},
            {"seg_id": "B", "pts": [{"x": 3.0}]},
        ]),
    ]
    df = spark.createDataFrame(
        rows, "permit long, segs array<struct<seg_id:string, pts:array<struct<x:double>>>>"
    )
    flat = N.explode_nested_xref(df, "segs", "pts", ["permit"])
    got = {(r.permit, r.seg_id, r.x) for r in flat.collect()}
    assert got == {(1, "A", 1.0), (1, "A", 2.0), (1, "B", 3.0)}
