"""Registered SQL functions mirror their DataFrame-level transforms."""

from __future__ import annotations

from data_rivers_spark.functions.sql_udfs import register_sql_functions


def test_sql_udfs(spark):
    names = register_sql_functions(spark)
    assert names == ["clean_phone", "fingerprint64", "jaccard_words", "nullstr", "token_count_ws"]
    row = spark.sql("""
        SELECT clean_phone('412,636,8126') AS phone,
               token_count_ws('  a b   c ') AS n,
               ROUND(jaccard_words('a b c', 'b c d'), 4) AS j,
               nullstr('') AS empty,
               fingerprint64('Hello   World') = fingerprint64(' hello world ') AS fp_eq
    """).collect()[0]
    assert row.phone == "+1 (412) 636-8126"
    assert row.n == 3
    assert row.j == 0.5
    assert row.empty is None
    assert row.fp_eq is True
