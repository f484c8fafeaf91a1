"""Stage decomposition for the incremental_lsh_dedup scaling cell — the
burn-down tool for SCALING.md's heaviest non-composite row.

Usage: python tools/decompose_incremental.py [k] (default 1024)

Replays tools/scaling.py's exact cell (same fixture, same _prep_incremental
shape: master = lower id half with a prebuilt banded store, batch = upper
half) but times CUMULATIVE prefixes of the operator pipeline in ONE JVM,
each prefix ending at an eager materialization so the next prefix reuses
nothing un-checkpointed:

  t_shingle   — shingle_sets(batch) -> localCheckpoint
  t_band      — _banded_from_sets(sets_b) -> localCheckpoint
  t_expand    — union with master store -> _expand_buckets -> noop write
  t_hits      — master semi-join on bucket-hit ids -> shingle hit docs -> noop
  t_verify    — verify_pairs_jaccard + dupes checkpoint
  t_anti      — survivor + survivor_banded anti-joins -> noop

The sum approximates the cell (same work, one extra candidate pass split
between t_expand and t_verify); the RATIO between stages is the signal:
which stage to optimize, or whether the row is linear-with-constant across
all of them."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    from data_rivers_spark.operators import dedup as D
    from data_rivers_spark.session import get_spark
    from tools.scaling import _prep_incremental, materialize_fixture

    spark = get_spark(app_name=f"decompose-incremental-{k}x")
    fixture = materialize_fixture(spark, "/root/testdata/sf0.1", k)
    frame = (
        spark.read.parquet(os.path.join(fixture, "documents"))
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    ctx = _prep_incremental(frame)  # untimed, as in the cell
    batch, master, mbanded, mid = (
        ctx["batch"], ctx["master"], ctx["mbanded"], ctx["mid"]
    )

    stages: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        stages[name] = round(time.time() - t0, 2)
        print(f"{name}: {stages[name]}s", flush=True)
        return out

    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731

    sets_b = timed(
        "t_shingle",
        lambda: D.shingle_sets(batch, "text", "doc_id", 3).localCheckpoint(eager=True),
    )
    banded_b = timed(
        "t_band",
        lambda: D._banded_from_sets(sets_b, "doc_id", 32, 16).localCheckpoint(
            eager=True
        ),
    )
    all_banded = banded_b.unionByName(mbanded)
    cands = timed(
        "t_expand",
        lambda: D._expand_buckets(
            all_banded, "doc_id", 1000, min_id_b=mid + 1
        ).localCheckpoint(eager=True),
    )
    sets = timed(
        "t_hits",
        lambda: sets_b.unionByName(
            D.shingle_sets(
                master.join(
                    cands.filter(F.col("id_a") < F.lit(mid + 1))
                    .select(F.col("id_a").alias("doc_id"))
                    .distinct(),
                    "doc_id",
                    "left_semi",
                ),
                "text",
                "doc_id",
                3,
            )
        ).localCheckpoint(eager=True),
    )
    dupes = timed(
        "t_verify",
        lambda: D.verify_pairs_jaccard(
            batch, cands, "text", "doc_id", 0.7, shingle_n=3, sets=sets
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=True),
    )
    timed(
        "t_anti",
        lambda: (
            noop(batch.join(dupes, "doc_id", "left_anti")),
            noop(banded_b.join(dupes, "doc_id", "left_anti")),
        ),
    )
    stages["total"] = round(sum(v for s, v in stages.items() if s != "total"), 2)
    print("DECOMP:" + json.dumps({"k": k, **stages}))


if __name__ == "__main__":
    main()
