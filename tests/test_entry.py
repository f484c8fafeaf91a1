"""Driver-contract smoke tests."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_contract_shapes(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    for name in oracles:
        assert name in qs, f"oracle {name} has no matching query"


def test_each_query_runs_sf0001(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()


def test_oracle_types_are_portable(sf_dir):
    """No oracle may emit a DuckDB-exotic result type (HUGEINT/DECIMAL/
    unsigned). DuckDB SUM(integer) returns HUGEINT (int128); an Arrow-based
    comparator fetches that as decimal128 while a fetchall-based one sees a
    plain int, so the same values hash differently across harnesses. Wrap
    integer SUMs in CAST(... AS BIGINT) on the oracle side (round-1 verdict:
    q_timebank_discrepancy / q_update_submitter / q_media_stats)."""
    import os

    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    exotic_markers = (
        "HUGEINT",
        "DECIMAL",
        "UINTEGER",
        "UBIGINT",
        "USMALLINT",
        "UTINYINT",
        # The driver canonicalizes results via pandas sort_values, which
        # raises "unhashable type" on list/struct cells (round-2 verdict:
        # q_embedding_quantize). Serialize nested values to strings
        # (ARRAY_TO_STRING / to_json) on both sides.
        "[]",
        "STRUCT",
        "MAP",
    )
    offenders = []
    for name, sql in entry_mod.oracle_sql().items():
        rel = con.sql(sql)
        for c, ty in zip(rel.columns, rel.types):
            if any(m in str(ty) for m in exotic_markers):
                offenders.append(f"{name}.{c}: {ty}")
    assert not offenders, offenders
