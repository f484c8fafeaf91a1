"""Core-count scaling cells: does per-row map work actually parallelize?

The sf0.1 bench cannot certify data parallelism — every headline ratio at
cpus=8 vs cpus=32 reads ~1 because per-query FIXED cost (plan construction,
py4j, job scheduling, eager barriers) dominates at that scale (the r13
scaling block: 8 cores matched 32 on all 44 queries). This harness measures
the two biggest fan-out beneficiaries on a LARGER fixture (default 64x =
320k docs), where the timed region is one long map stage and the fixed cost
is amortized:

  dsir_featurize     hashed_ngram_features (gram explode + md5 bucket +
                     (id,bucket) count agg) -> noop — q_dsir_weights' core
  corpus_prep_chain  normalize -> quality_features -> detect_language
                     -> noop — q_corpus_prep's per-row derivation chain

Each cell is an independent cold JVM (SPARK_GRAFT_CPUS=<n> -> local[n] and
shuffle partitions, the bench's own env contract) over the SAME
parquet-materialized fixture; per cell: one untimed warmup + N timed runs,
min reported. The low/high wall ratio approaching cores_high/cores_low
(here 4.0) demonstrates the map stages scale with cores; ~1.0 would mean
fixed cost still dominates.

Usage:
    python tools/core_scaling.py [--k 64] [--cpus 8,32] [--iters 2]
    python tools/core_scaling.py --child <fixture> <op> <iters>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = ("dsir_featurize", "corpus_prep_chain")
RESULTS_JSON = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "core_scaling_results.json"
)


def _op_frame(spark, fixture: str, op: str):
    from data_rivers_spark.operators import importance as IMP
    from data_rivers_spark.operators import textstats as TX

    docs = spark.read.parquet(os.path.join(fixture, "documents"))
    if op == "dsir_featurize":
        return IMP.hashed_ngram_features(
            docs, "text", "doc_id", num_buckets=4096, n_max=2, seed=0
        )
    if op == "corpus_prep_chain":
        norm = TX.normalize_text(
            docs, "text", out_col="norm", mask_digits=True
        ).drop("text")
        q = TX.quality_features(norm, "norm")
        return TX.detect_language(q, "norm")
    raise ValueError(op)


def child(fixture: str, op: str, iters: int) -> None:
    from data_rivers_spark.session import get_spark

    spark = get_spark(app_name=f"core_scaling_{op}")
    fn = lambda: _op_frame(spark, fixture, op).write.format("noop").mode(  # noqa: E731
        "overwrite"
    ).save()
    fn()  # warmup (JIT + scan cache state parity across cells)
    samples = []
    for _ in range(iters):
        t0 = time.time()
        fn()
        samples.append(round(time.time() - t0, 3))
    print(json.dumps({"op": op, "cpus": spark.sparkContext.defaultParallelism,
                      "samples": samples, "min": min(samples)}))


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--child":
        child(args[1], args[2], int(args[3]))
        return
    k = 64
    cpus_list = [8, 32]
    iters = 2
    if "--k" in args:
        k = int(args[args.index("--k") + 1])
    if "--cpus" in args:
        cpus_list = [int(x) for x in args[args.index("--cpus") + 1].split(",")]
    if "--iters" in args:
        iters = int(args[args.index("--iters") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_rivers_spark.session import get_spark
    import tools.scaling as sc

    spark = get_spark(app_name="core_scaling_fixture")
    fixture = sc.materialize_fixture(spark, sf_dir, k)
    spark.stop()

    out: dict[str, dict[str, dict]] = {}
    for op in OPS:
        out[op] = {}
        for cpus in cpus_list:
            env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus)}
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 fixture, op, str(iters)],
                capture_output=True, text=True, env=env,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-3000:])
                raise SystemExit(f"child failed: {op} cpus={cpus}")
            rec = json.loads(proc.stdout.strip().splitlines()[-1])
            out[op][str(cpus)] = rec
            print(f"{op} cpus={cpus}: {rec['samples']} min={rec['min']}")
        lo, hi = str(min(cpus_list)), str(max(cpus_list))
        ratio = round(out[op][lo]["min"] / out[op][hi]["min"], 2)
        out[op]["low_over_high_ratio"] = ratio
        print(f"{op}: {lo}-core / {hi}-core wall ratio = {ratio} "
              f"(ideal {int(hi) / int(lo):.1f})")
    record = {"k": k, "sf_dir": sf_dir, "cpus": cpus_list, "iters": iters,
              "results": out}
    history = []
    try:
        with open(RESULTS_JSON) as f:
            history = json.load(f)
    except (OSError, ValueError):
        pass
    history.append(record)
    with open(RESULTS_JSON, "w") as f:
        json.dump(history, f, indent=1)
    print(f"recorded -> {RESULTS_JSON}")


if __name__ == "__main__":
    main()
