"""Engine benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line — ALWAYS the last stdout line (the driver parses the last line;
round 4's record was lost because a plan-regeneration notice printed after
the JSON):

  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": ..., ...}

Measurement discipline (round-5, mirroring tools/scaling.py): the parent
process launches $SPARK_GRAFT_BENCH_RUNS (default 3) INDEPENDENT child
bench processes, each a cold JVM that (1) runs every headline query ONCE
untimed — a deterministic warmup sweep, so each query's timed samples see
the same JIT warmth regardless of its position in the suite (sub-second
queries measured ~25% slower in a per-query cold cell than at their warm
floor) — then (2) times every query $SPARK_GRAFT_BENCH_ITERS (default 3)
times. The reported per-query number is the MIN over runs of each run's
per-query MEDIAN: the within-run median absorbs JIT/GC noise, and the
across-run min absorbs shared-host contention spikes (observed: the
data-free calibration probe itself swings ±30% between children minutes
apart, and a single query swung 3x across children with identical plans —
exactly what made the r4 single-process numbers +31% across the board and
unfalsifiable). Per-run medians are kept under "runs", raw samples under
"iters", and the across-everything per-query min under "min" for variance
inspection; "calib_sec" anchors cross-round host-speed attribution.

Each query executes fully via a noop-format write (drains every partition
through the whole plan, no driver-side collect overhead).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # TPC-H-shaped scan/join/agg core
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q14_promo_revenue",
    # reference workload: window dedup, merge, spatial join, parent/child agg
    "q_dedup_latest",
    "q_incremental_merge",
    "q_revgeo_timebound",
    "q_top_k_types",
    "q_child_rollup",
    # training-data ops
    "q_exact_dedup",
    "q_cosine_topk",
    "q_minhash_lsh_dedup",
    # scale paths: big-agg top-k, ANN bucketing, 8-way broadcast spatial join
    "q18_large_volume_customer",
    "q_signlsh_topk",
    "q_revgeo_multizone",
    # corpus-curation paths (round 3): zero-shuffle line rules, corpus-global
    # paragraph dedup, token-keyed LM join, the full composed pipeline
    "q_c4_filter",
    "q_paragraph_dedup",
    "q_unigram_logprob",
    "q_curation_pipeline",
    # round 4: production dedup modes (signature-store incremental, char-mode
    # CJK), event analytics (funnel/retention/histogram), grid-mode revgeo
    "q_incremental_dedup",
    "q_char_lsh_dedup",
    "q_funnel",
    "q_retention_cohorts",
    "q_value_histogram",
    "q_revgeo_multizone_grid",
    # mapInPandas + blocked hamming join over a binary media column
    "q_media_phash_dedup",
    # the widest fact-side join: lineitem x derived-partsupp on a 2-col key
    "q09_product_profit",
    # round 5: positioned-gram span dedup, k-means semantic dedup, one BPE
    # round, and the composed span-gate -> mixture -> split pipeline
    "q_duplicate_spans",
    "q_semantic_dedup_kmeans",
    "q_bpe_pair_counts",
    "q_curation_mix",
    # round 5b: token-window + sentence-boundary chunking (zero/one-shuffle
    # explodes) and the one Arrow-UDF hot path (NFC normalization)
    "q_chunk_documents",
    "q_chunk_sentences",
    "q_nfc_normalize",
]


def _release_new_rdds(spark, keep: set) -> None:
    """Unpersist RDD blocks a query's operators localCheckpointed internally.

    Without this, blocks from every dedup/LSH query accumulate across the
    28-query x 3-iter session and the resulting heap pressure inflates later
    queries (measured up to +85% on q_paragraph_dedup once the round-4 set
    grew past 20 queries). A real pipeline run exits the JVM between jobs;
    the bench must emulate that between timed queries."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(jmap.keys()):
        if rid not in keep:
            jmap[rid].unpersist()


def _sf_of(sf_dir: str) -> float | None:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else None


def run_child(sf_dir: str, gen_plans_after: bool) -> None:
    """One cold-JVM measurement cell: warmup + iters x every headline query.

    Prints a child JSON line (parent aggregates): {"queries": medians,
    "iters": raw}. When ``gen_plans_after`` is set, also regenerates
    PLANS.md from this session before printing (notice goes to stderr so the
    JSON stays the last stdout line)."""
    from data_rivers_spark.plans import registry
    from data_rivers_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="bench")

    # Full warmup pass: run EVERY headline query once untimed before any
    # timing. Sub-second queries are dominated by global JIT state — in a
    # single-session bench (r3/r4 protocol) each query ran after dozens of
    # prior queries had compiled Spark's scan/codegen/shuffle stack, so its
    # number reflected a warm JVM; a per-query cold cell measures q01 at
    # ~0.65s where the warm floor is ~0.52s (measured). One untimed sweep
    # reproduces that warmth DETERMINISTICALLY (same warmth for every
    # query, independent of suite order), keeping cross-round comparability
    # without giving up cold-JVM run isolation.
    keep = set()
    for name in HEADLINE:
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        _release_new_rdds(spark, keep)
    keep = set(spark.sparkContext._jsc.getPersistentRDDs().keys())

    # host-speed calibration: a fixed, data-free, whole-stage-codegen
    # CPU-bound job (xxhash64 over a 1B range, ~1s). Its wall time measures
    # the host's Spark compute throughput AT MEASUREMENT TIME, so
    # cross-round query deltas can be attributed: if calib moved by the
    # same factor as the queries, the host changed, not the plans (the
    # r3->r4 +31%-on-everything episode was unfalsifiable precisely for
    # lack of this number). Median of 3.
    from pyspark.sql import functions as _F

    calib_samples = []
    for _ in range(3):
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr(
            "bit_xor(xxhash64(id)) AS x"
        ).collect()
        calib_samples.append(round(time.time() - t0, 3))
    calib = sorted(calib_samples)[1]

    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    times: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    # NOTE: an explicit System.gc() per sample was tried and REJECTED — it
    # produced an 18.8s first-iteration outlier on the curation pipeline
    # (full GC landing mid-query) and no measurable stabilization; the
    # across-run min already absorbs heap-state and host noise.
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        samples: list[float] = []
        for _ in range(iters):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            _release_new_rdds(spark, keep)
        raw[name] = samples
        times[name] = sorted(samples)[len(samples) // 2]

    if gen_plans_after and not os.environ.get("SPARK_GRAFT_SKIP_PLANS"):
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
        )
        import gen_plans

        gen_plans.generate(spark, sf_dir, HEADLINE)
        print("PLANS.md regenerated", file=sys.stderr)

    print(json.dumps({"queries": times, "iters": raw, "calib_sec": calib}))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--child" in sys.argv:
        run_child(sf_dir, gen_plans_after="--plans" in sys.argv)
        return

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    per_run: list[dict[str, float]] = []
    calibs: list[float] = []
    all_iters: dict[str, list[float]] = {q: [] for q in HEADLINE}
    for i in range(runs):
        argv = [sys.executable, os.path.abspath(__file__), "--child"]
        if i == runs - 1:
            argv.append("--plans")  # last (already-measured) session pays it
        proc = subprocess.run(argv, capture_output=True, text=True)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"bench child run {i} failed rc={proc.returncode}")
        child = json.loads(proc.stdout.strip().splitlines()[-1])
        per_run.append(child["queries"])
        calibs.append(child.get("calib_sec"))
        for q, samples in child["iters"].items():
            all_iters[q].extend(samples)
        sys.stderr.write(
            f"run {i + 1}/{runs}: total {round(sum(child['queries'].values()), 3)}s\n"
        )

    merged = {q: min(r[q] for r in per_run) for q in HEADLINE}
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(merged.values()), 3),
                "unit": "sec",
                # min over cold-JVM runs of each run's per-query median —
                # the host-contention-robust number (see module docstring)
                "queries": merged,
                "runs": per_run,
                "iters": all_iters,
                "min": {q: min(all_iters[q]) for q in HEADLINE},
                "bench_runs": runs,
                # min over runs of the in-child median — compare across
                # rounds to separate host-speed shifts from plan changes
                "calib_sec": min([c for c in calibs if c is not None], default=None),
                "sf": _sf_of(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
