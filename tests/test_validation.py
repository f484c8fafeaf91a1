"""Expectations-style validation: rule semantics on hand-built violations."""

from __future__ import annotations

from data_rivers_spark.operators import validation as V


def test_validate_single_pass_rules(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (2, None, -5.0),   # null status, negative price
            (3, "X", 20.0),    # bad status
            (None, "F", None), # null key, null price
        ],
        "k long, status string, price double",
    )
    out = {r.rule: r for r in V.validate(df, [
        V.not_null("k"),
        V.accepted_values("status", ["O", "F"]),
        V.in_range("price", 0, 100),
    ]).collect()}
    assert out["not_null(k)"].violations == 1
    assert out["accepted_values(status)"].violations == 2  # None + 'X'
    assert out["in_range(price)"].violations == 2          # -5 + None
    assert all(r.total == 4 for r in out.values())
    assert not out["not_null(k)"].passed


def test_unique_and_referential_checks(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    u = V.unique_check(child, ["fk"]).collect()[0]
    assert u.violations == 1 and u.total == 4 and not u.passed  # fk=10 twice
    r = V.referential_check(child, "fk", parent, "pk").collect()[0]
    assert r.violations == 2 and not r.passed  # fk=99 and fk=NULL orphaned
    ok = V.referential_check(
        child.filter("fk = 10"), "fk", parent, "pk"
    ).collect()[0]
    assert ok.passed and ok.violations == 0


def test_validate_empty_frame(spark):
    df = spark.createDataFrame([], "k long, status string")
    out = {r.rule: r for r in V.validate(df, [V.not_null("k")]).collect()}
    assert out["not_null(k)"].violations == 0 and out["not_null(k)"].passed


def test_validate_empty_rules_returns_empty_report(spark):
    df = spark.createDataFrame([(1,)], "k long")
    out = V.validate(df, [])
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "rule", "violations", "total", "passed"
    ]


def test_validate_rule_names_with_quotes_survive(spark):
    df = spark.createDataFrame([(1,), (None,)], "k long")
    rule = V.Rule("it's a 'quoted' rule", V.F.col("k").isNull())
    out = V.validate(df, [rule]).collect()
    assert out[0].rule == "it's a 'quoted' rule"
    assert out[0].violations == 1 and not out[0].passed
