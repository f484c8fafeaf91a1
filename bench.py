"""Engine benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully via a noop-format write (drains every partition
through the whole plan, no driver-side collect overhead). Every query runs
$SPARK_GRAFT_BENCH_ITERS times (default 3); the reported per-query second
count is the MEDIAN so single-run JIT/GC noise (±15% round-over-round on
sub-2s queries) doesn't masquerade as a regression. Per-iteration raw
timings are included under "iters" for min/variance inspection.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_rivers_spark.plans import registry  # noqa: E402
from data_rivers_spark.session import get_spark  # noqa: E402

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    registry.load_all()
    spark = get_spark(app_name="bench")

    # warm the JVM + parquet footers so per-query numbers measure the engine
    registry.QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    keep = set(spark.sparkContext._jsc.getPersistentRDDs().keys())

    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    times: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
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

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "iters": raw,
                "sf": sf,
            }
        )
    )

    # regenerate PLANS.md for the exact set just benched, so the plan
    # evidence can never lag the bench set (set SPARK_GRAFT_SKIP_PLANS=1
    # to skip, e.g. when timing the bench itself)
    if not os.environ.get("SPARK_GRAFT_SKIP_PLANS"):
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        import gen_plans

        gen_plans.generate(spark, sf_dir, HEADLINE)


if __name__ == "__main__":
    main()
