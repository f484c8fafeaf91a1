"""Cold-JVM envelope re-bench for ONE headline query — the burn-down tool
for a single >20% cross-round bench mover (the scaling harness's
--remeasure analogue at the bench layer).

Usage: python tools/rebench_one.py q_minhash_lsh_dedup [attempts]

Protocol (mirrors bench.py's child cell exactly, so numbers are
comparable to bench_out/rNN.json "min" entries): each attempt is an
independent cold JVM that (1) runs the query once untimed (JIT warmup),
(2) times it SPARK_GRAFT_BENCH_ITERS (default 3) times with
{sec, gc_sec, peak_heap_mb} telemetry per sample. The parent prints every
attempt's samples plus the running envelope min; stop when the min
stabilizes across consecutive attempts (the shared host swings 2-3x
across hours — never conclude from one window)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(name: str, sf_dir: str) -> None:
    import bench as B
    from data_rivers_spark.plans import registry
    from data_rivers_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name=f"rebench-{name}")
    fn = registry.QUERIES[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
    B._release_new_rdds(spark, set())
    keep = set(spark.sparkContext._jsc.getPersistentRDDs().keys())
    jvm = B._JvmTelemetry(spark)
    samples = []
    for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))):
        jvm.reset_peaks()
        gc0 = jvm.gc_ms()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(
            {
                "sec": round(time.time() - t0, 3),
                "gc_sec": round((jvm.gc_ms() - gc0) / 1000.0, 3),
                "peak_heap_mb": jvm.peak_heap_mb(),
            }
        )
        B._release_new_rdds(spark, keep)
    print("SAMPLES:" + json.dumps(samples))


def main() -> None:
    if "--child" in sys.argv:
        child(sys.argv[1], os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        return
    name = sys.argv[1]
    attempts = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    env_min = None
    all_samples = []
    for i in range(attempts):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name, "--child"],
            capture_output=True, text=True, timeout=1800,
        )
        pay = [ln for ln in proc.stdout.splitlines() if ln.startswith("SAMPLES:")]
        if not pay:
            print(f"attempt {i} FAILED:\n{proc.stdout[-500:]}\n{proc.stderr[-500:]}")
            continue
        samples = json.loads(pay[0][len("SAMPLES:"):])
        all_samples.extend(samples)
        att_min = min(s["sec"] for s in samples)
        env_min = att_min if env_min is None else min(env_min, att_min)
        print(f"attempt {i}: {json.dumps(samples)} -> attempt min {att_min}, "
              f"envelope min {env_min}", flush=True)
    print(json.dumps({"query": name, "envelope_min": env_min,
                      "samples": all_samples}))


if __name__ == "__main__":
    main()
