"""Pure-python contract tests for the scaling harness's history handling.

The SCALING.md table is only meaningful if every cell in a row measured
the same algorithm (tools/scaling.py OP_CONFIG) and each cell is the
min over cold-JVM attempts (_merge_min). These tests pin both without
touching Spark.
"""
from __future__ import annotations

import tools.scaling as sc


def test_config_reset_drops_mismatched_rows():
    # a row measured under an older algorithm config must be dropped, not
    # min-merged against fresh cells from the new algorithm
    raw = {
        "_config": {"kmeans_semantic_dedup": "flat-blas-r8"},
        "kmeans_semantic_dedup": {"1": 1.0, "256": 50.0},
        # paragraph_dedup has no OP_CONFIG entry (simhash_pairs, the old
        # example here, gained one in r10 and now correctly gets dropped
        # when its stored tag is absent)
        "paragraph_dedup": {"1": 0.5},
    }
    out = sc._apply_config_reset(raw)
    assert "kmeans_semantic_dedup" not in out
    assert out["paragraph_dedup"] == {"1": 0.5}
    assert "_config" not in out


def test_config_reset_keeps_matching_rows():
    raw = {
        "_config": dict(sc.OP_CONFIG),
        **{op: {"1": 1.0} for op in sc.OP_CONFIG},
        "untagged_op": {"1": 2.0},
    }
    out = sc._apply_config_reset(raw)
    for op in sc.OP_CONFIG:
        assert out[op] == {"1": 1.0}
    # rows with no OP_CONFIG entry are never dropped
    assert out["untagged_op"] == {"1": 2.0}


def test_config_reset_handles_legacy_file_without_config_key():
    # pre-r9 files carry no _config: every tagged row is treated as
    # unknown-config and dropped
    raw = {op: {"1": 1.0} for op in sc.OP_CONFIG}
    raw["plain"] = {"4": 3.0}
    out = sc._apply_config_reset(raw)
    assert set(out) == {"plain"}


def test_merge_min_takes_lower_envelope():
    base = {"op": {1: 2.0, 4: 8.0}}
    new = {"op": {1: 1.5, 4: 9.0, 16: 30.0}, "other": {1: 0.3}}
    out = sc._merge_min(base, new)
    assert out["op"] == {1: 1.5, 4: 8.0, 16: 30.0}
    assert out["other"] == {1: 0.3}
    # inputs not mutated
    assert base == {"op": {1: 2.0, 4: 8.0}}


def test_report_ks_is_ks_plus_one_octave():
    assert sc.REPORT_KS[:-1] == sc.KS
    assert sc.REPORT_KS[-1] == 4 * sc.KS[-1]


def test_bench_round_artifact_is_write_once(tmp_path, monkeypatch):
    """bench.py's round-tagged record must never be clobbered by a second
    run in the same round (the r9 round-close artifact was overwritten by
    the driver's own post-round re-run): later runs overflow to
    {tag}.2.json, {tag}.3.json, ...; an explicit env opt-in restores
    last-write-wins for deliberate re-records."""
    import bench

    monkeypatch.delenv("SPARK_GRAFT_BENCH_OVERWRITE", raising=False)
    d = str(tmp_path)
    p1 = bench._tag_artifact_path(d, "r99")
    assert p1.endswith("r99.json")
    open(p1, "w").write("{}")
    p2 = bench._tag_artifact_path(d, "r99")
    assert p2.endswith("r99.2.json")
    open(p2, "w").write("{}")
    assert bench._tag_artifact_path(d, "r99").endswith("r99.3.json")
    # committed record untouched throughout
    assert open(p1).read() == "{}"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OVERWRITE", "1")
    assert bench._tag_artifact_path(d, "r99").endswith("r99.json")


def test_bench_stdout_line_is_tail_proof():
    """The driver keeps only a 2,000-char stdout tail and parses the LAST
    line; a full-result line (tens of KB of per-sample diagnostics)
    survives that tail only by luck — r12's record lost its "queries" dict
    mid-tail and PERF_r13's entire round-over-round table came up null.
    The stdout line must carry the aggregates alone and stay comfortably
    under the tail for the full headline set."""
    import json

    import bench

    result = {
        "metric": "headline_queries_total",
        "unit": "sec",
        "bench_runs": 3,
        "sf": 0.1,
        "iters": {q: [1.234] * 9 for q in bench.HEADLINE},
        "telemetry": {q: [{"sec": 1.2, "gc_sec": 0.1}] for q in bench.HEADLINE},
        "runs": [{q: 1.234 for q in bench.HEADLINE}] * 3,
        "outliers": {},
        "queries": {q: 123.456 for q in bench.HEADLINE},
        "min": {q: 123.456 for q in bench.HEADLINE},
        "calib_sec": 0.269,
        "value": 9999.999,
    }
    line = json.dumps(bench._stdout_line(result))
    assert len(line) < 2000, f"stdout line {len(line)} chars >= 2000"
    parsed = json.loads(line)
    # the driver contract fields survive; the bulky diagnostics do not
    for key in ("metric", "value", "unit", "queries", "sf", "calib_sec"):
        assert key in parsed
    for key in ("iters", "telemetry", "runs", "min", "outliers"):
        assert key not in parsed
    assert set(parsed["queries"]) == set(bench.HEADLINE)


def test_bytes_norm_top_normalizes_char_growth():
    # a char-proportional op whose raw top ratio is 5.3 must read ~4 once
    # normalized to the fixture's measured byte growth
    render = (64, 256, 1024)
    r = {64: 1.0, 256: 4.0, 1024: 4.0 * 5.3}
    byt = {"documents": {64: 100, 256: 400, 1024: int(400 * 5.3)}}
    assert sc._bytes_norm_top("chunk_documents", r, render, byt) == "4.0"
    # embeddings ops normalize against the embeddings table (exact 4x/octave)
    r2 = {256: 1.0, 1024: 3.9}
    byt2 = {"embeddings": {256: 100, 1024: 400}, "documents": {256: 1, 1024: 99}}
    assert sc._bytes_norm_top("kmeans_semantic_dedup", r2, render, byt2) == "3.9"
    # missing bytes for the top pair -> em dash, never a misleading number
    assert sc._bytes_norm_top("exact_dedup", {4: 1.0, 16: 4.0}, (4, 16), {}) == "—"
