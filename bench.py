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

Round-7 additions, closing the r6 verdict's two measurement gaps:

1. **Per-sample telemetry**: every timed sample records the JVM's GC-time
   delta and the peak heap across that sample (GarbageCollector/MemoryPool
   MXBeans, peaks reset per sample). Samples exceeding 3x their query's
   across-everything min get a named cause in "outliers": "gc" when the
   GC delta explains >=50% of the excess, else "host" (the r6 record had
   a 43.8s sample on a 1.5s-floor query with no way to attribute it).
2. **Full-artifact persistence**: the parent writes the COMPLETE result
   JSON to bench_out/latest.json (the driver keeps only a 2,000-char tail
   of stdout, which destroyed r6's per-run medians and r5's record
   entirely); round close commits it as bench_out/rN.json. The stdout
   JSON also orders the headline aggregates (queries/min/value/calib)
   LAST so the tail the driver retains contains the numbers that matter.
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
    # round 7: the composed 3-round BPE training loop (driver-side argmax
    # alternation over the vocabulary frame — measures the per-round
    # collect+checkpoint overhead the one-round row doesn't see)
    "q_bpe_train_rounds",
    # round 5b: token-window + sentence-boundary chunking (zero/one-shuffle
    # explodes) and the one Arrow-UDF hot path (NFC normalization)
    "q_chunk_documents",
    "q_chunk_sentences",
    "q_nfc_normalize",
    # round 8: the abbrev-aware opt-in sentence mode (same plan shape as
    # q_chunk_sentences plus four masking regexp_replaces — the row pins
    # the masking overhead next to the naive mode's floor), and the full
    # tokenizer lifecycle (3 trained merges + corpus encode: vocab-sized
    # merge folds, one word-keyed join, id-keyed reassembly)
    "q_chunk_sentences_abbrev",
    "q_bpe_encode",
    # round 9: near-dup-cluster-aware train/test split (LSH verified pairs
    # -> exact CC -> md5 on the component representative) — pins the cost
    # of closing the split over the dup graph next to q_minhash_lsh_dedup's
    # pair-generation floor
    "q_cluster_safe_split",
    # round 10: DSIR importance weighting (hashed n-gram LM ratio — one
    # featurize pass per side, a 4096-row broadcast join, doc-keyed sum)
    # and its Gumbel-top-k resample (TakeOrderedAndProject, no global
    # sort); plus the pre-grouped signature-store incremental dedup (the
    # production store shape — joins the inverted-index store instead of
    # union+re-aggregating it, priced next to q_incremental_dedup's
    # row-store plan)
    "q_dsir_weights",
    "q_dsir_resample",
    "q_incremental_dedup_grouped",
    # round 11: the curation composite's selection/mixing tail (shared
    # clean+dedup prefix -> DSIR select -> UniMax mix) — prices the full
    # pretraining-curation close-out next to q_curation_pipeline's
    # split+pack tail; and classifier TRAINING (2 GD epochs = 2 corpus
    # passes over the checkpointed feature frame + model-sized collects —
    # the DCLM/FineWeb-Edu quality-scorer recipe)
    "q_curation_select_mix",
    "q_quality_classifier_train",
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


class _JvmTelemetry:
    """Per-sample JVM counters via the management MXBeans (py4j): total GC
    time across collectors, and peak heap usage across heap pools (peaks
    reset before each sample so the number is per-sample, not per-JVM).
    Driver-side and O(#beans) per call — nanoseconds next to any query.

    Scope: observes the DRIVER JVM only, which is the whole story under
    local-mode execution (driver == executor) — the bench's regime. On a
    real cluster this would need executor-side metrics instead; don't
    reuse as-is there."""

    def __init__(self, spark) -> None:
        mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
        self._gc_beans = list(mf.getGarbageCollectorMXBeans())
        self._heap_pools = [
            p
            for p in mf.getMemoryPoolMXBeans()
            if p.getType().toString() == "Heap memory"
        ]

    def gc_ms(self) -> int:
        # getCollectionTime() is spec'd to return -1 when the collector
        # doesn't support the metric — clamp so one undefined bean can't
        # corrupt the per-sample delta (and misattribute outliers to "host")
        return sum(max(0, b.getCollectionTime()) for b in self._gc_beans)

    def reset_peaks(self) -> None:
        for p in self._heap_pools:
            p.resetPeakUsage()

    def peak_heap_mb(self) -> int:
        return sum(p.getPeakUsage().getUsed() for p in self._heap_pools) // (
            1024 * 1024
        )


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
    telem: dict[str, list[dict]] = {}
    jvm = _JvmTelemetry(spark)
    # NOTE: an explicit System.gc() per sample was tried and REJECTED — it
    # produced an 18.8s first-iteration outlier on the curation pipeline
    # (full GC landing mid-query) and no measurable stabilization; the
    # across-run min already absorbs heap-state and host noise.
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        samples: list[float] = []
        tsamples: list[dict] = []
        for _ in range(iters):
            jvm.reset_peaks()
            gc0 = jvm.gc_ms()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 3)
            samples.append(sec)
            tsamples.append(
                {
                    "sec": sec,
                    "gc_sec": round((jvm.gc_ms() - gc0) / 1000.0, 3),
                    "peak_heap_mb": jvm.peak_heap_mb(),
                }
            )
            _release_new_rdds(spark, keep)
        raw[name] = samples
        telem[name] = tsamples
        times[name] = sorted(samples)[len(samples) // 2]

    if gen_plans_after and not os.environ.get("SPARK_GRAFT_SKIP_PLANS"):
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
        )
        import gen_plans

        gen_plans.generate(spark, sf_dir, HEADLINE)
        print("PLANS.md regenerated", file=sys.stderr)

    print(
        json.dumps(
            {"queries": times, "iters": raw, "telemetry": telem, "calib_sec": calib}
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--child" in sys.argv:
        run_child(sf_dir, gen_plans_after="--plans" in sys.argv)
        return

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    per_run: list[dict[str, float]] = []
    calibs: list[float] = []
    all_iters: dict[str, list[float]] = {q: [] for q in HEADLINE}
    all_telem: dict[str, list[dict]] = {q: [] for q in HEADLINE}
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
        for q, tsamples in child.get("telemetry", {}).items():
            all_telem[q].extend({**t, "run": i} for t in tsamples)
        sys.stderr.write(
            f"run {i + 1}/{runs}: total {round(sum(child['queries'].values()), 3)}s\n"
        )

    merged = {q: min(r[q] for r in per_run) for q in HEADLINE}
    mins = {q: min(all_iters[q]) for q in HEADLINE}
    # name the cause of every >3x-of-min sample: "gc" when the sample's GC
    # delta covers >=50% of its excess over the query min, else "host"
    # (shared-machine contention — nothing inside the JVM accounts for it)
    outliers: dict[str, list[dict]] = {}
    for q, tsamples in all_telem.items():
        flagged = []
        for t in tsamples:
            if t["sec"] > 3 * mins[q] and t["sec"] - mins[q] > 0.5:
                excess = t["sec"] - mins[q]
                cause = "gc" if t.get("gc_sec", 0) >= 0.5 * excess else "host"
                flagged.append({**t, "cause": cause})
        if flagged:
            outliers[q] = flagged

    result = {
        "metric": "headline_queries_total",
        "unit": "sec",
        "bench_runs": runs,
        "sf": _sf_of(sf_dir),
        # bulky diagnostics live in the bench_out/ artifact only (see the
        # stdout-line note below)
        "iters": all_iters,
        "telemetry": all_telem,
        "runs": per_run,
        "outliers": outliers,
        # min over cold-JVM runs of each run's per-query median — the
        # host-contention-robust number (see module docstring)
        "queries": merged,
        "min": mins,
        # min over runs of the in-child median — compare across rounds to
        # separate host-speed shifts from plan changes
        "calib_sec": min([c for c in calibs if c is not None], default=None),
        "value": round(sum(merged.values()), 3),
    }
    # persist the COMPLETE artifact (the driver's 2,000-char stdout tail
    # lost r6's per-run medians; bench_out/rN.json is committed per round).
    # latest.json is per-run scratch and GITIGNORED — every bench run
    # (including the driver's own post-round run) rewrites it, which kept
    # the tree dirty at round close for four straight rounds; the tracked
    # record is the round-stamped copy written when $SPARK_GRAFT_BENCH_TAG
    # is set (e.g. r08 — r7's round-close artifact survived only because
    # the driver's snapshot commit happened to land before the next run).
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "latest.json"), "w") as f:
        json.dump(result, f, indent=1)
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG") or _round_tag()
    if tag and re.fullmatch(r"[A-Za-z0-9._-]+", tag):
        path = _tag_artifact_path(out_dir, tag)
        with open(path, "w") as f:
            json.dump(result, f, indent=1)
    # The stdout contract line must be TAIL-PROOF: the driver keeps only a
    # 2,000-char stdout tail and parses the last line, and a full-result
    # line (tens of KB of iters/telemetry) survives that tail only by luck
    # — r12's record printed aggregates last yet still lost its "queries"
    # dict mid-tail, so PERF_r13's whole round-over-round table came up
    # null. Measurement-methodology unchanged (same queries, same timing,
    # same aggregates); only the stdout SHAPE changes: the last line now
    # carries the aggregates alone (~1.6 KB — metric/value/unit/queries/
    # sf/calib_sec), while iters/telemetry/runs/outliers/min stay in the
    # bench_out/ artifact (gitignored latest.json + the committed
    # round-tagged record).
    print(json.dumps(_stdout_line(result)))


def _stdout_line(result: dict) -> dict:
    """Aggregates-only stdout record (see the tail-proof note in main):
    the per-query headline numbers plus scalars, NEVER the bulky
    per-sample diagnostics — the whole line must fit the driver's
    2,000-char stdout tail with room to spare."""
    return {
        k: result[k]
        for k in (
            "metric", "unit", "bench_runs", "sf", "queries",
            "calib_sec", "value",
        )
        if k in result
    }


def _tag_artifact_path(out_dir: str, tag: str) -> str:
    """Write-once round record: the first run of a round owns
    bench_out/{tag}.json; later runs in the same round land at
    {tag}.2.json, {tag}.3.json, ... instead of clobbering the committed
    record (the r9 round-close artifact was overwritten by the driver's
    own post-round re-run — 1,518 lines of re-sampled timings over the
    committed numbers). $SPARK_GRAFT_BENCH_OVERWRITE=1 restores
    last-write-wins for deliberate re-records."""
    base = os.path.join(out_dir, f"{tag}.json")
    if os.environ.get("SPARK_GRAFT_BENCH_OVERWRITE") == "1" or not os.path.exists(base):
        return base
    i = 2
    while os.path.exists(os.path.join(out_dir, f"{tag}.{i}.json")):
        i += 1
    return os.path.join(out_dir, f"{tag}.{i}.json")


def _round_tag() -> str | None:
    """Default round tag from PROGRESS.jsonl's last `round` field (r09…):
    a forgotten $SPARK_GRAFT_BENCH_TAG used to silently demote a
    round-close run to gitignored latest.json scratch — r5's record was
    lost exactly that way. Env var still wins when set."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "PROGRESS.jsonl"
    )
    try:
        with open(path) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        rnd = json.loads(lines[-1]).get("round")
        return f"r{int(rnd):02d}" if rnd is not None else None
    except Exception:  # noqa: BLE001 - no progress file outside driver runs
        return None


if __name__ == "__main__":
    main()
