"""applyInPandasWithState: per-key state must accumulate across micro-batches."""

from __future__ import annotations

import json


def test_running_user_totals_across_batches(spark, tmp_path):
    from data_rivers_spark.streaming.events import read_events_stream
    from data_rivers_spark.streaming.stateful import running_user_totals

    src = tmp_path / "in"
    src.mkdir()
    b1 = [
        {"event_id": 1, "ts": "2024-01-01T00:10:00.000Z", "user_id": 1, "event_type": "c", "value": 1.5, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:11:00.000Z", "user_id": 2, "event_type": "c", "value": 2.0, "props": "{}"},
    ]
    b2 = [
        {"event_id": 3, "ts": "2024-01-01T00:12:00.000Z", "user_id": 1, "event_type": "c", "value": 4.0, "props": "{}"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))

    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    out = running_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM running_totals ORDER BY user_id, n_events"
    ).collect()
    # user 1 appears per batch with accumulating state; final totals must
    # reflect both batches regardless of file processing order
    final = {}
    for r in rows:
        final[r.user_id] = (r.n_events, r.total_value)
    assert final[1] == (2, 5.5)
    assert final[2] == (1, 2.0)


def test_stream_dedup_into_corpus_across_batches(spark, tmp_path):
    """foreachBatch incremental dedup: the second micro-batch must dedup
    against the signature store the first micro-batch persisted — exact
    copies of already-ingested docs are rejected, novel docs land, and the
    store grows by exactly the survivors."""
    import json as _json

    from data_rivers_spark.catalog.tables import ManagedCatalog
    from data_rivers_spark.streaming.events import stream_dedup_into_corpus

    src = tmp_path / "docs_in"
    src.mkdir()
    d1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d2 = "one two three four five six seven eight nine ten"
    d3 = "red orange yellow green blue indigo violet bright shine colors"
    # maxFilesPerTrigger=1 → two micro-batches in id order
    (src / "a_batch1.json").write_text(
        "\n".join(_json.dumps({"doc_id": i, "text": t})
                  for i, t in [(1, d1), (2, d2)])
    )
    (src / "b_batch2.json").write_text(
        "\n".join(_json.dumps({"doc_id": i, "text": t})
                  for i, t in [(10, d1), (11, d3)])  # 10 = copy of doc 1
    )
    # FileStreamSource orders files by modification time — pin distinct
    # mtimes so batch 1 (the lower ids) genuinely ingests first
    import os as _os

    _os.utime(src / "a_batch1.json", (1_700_000_000, 1_700_000_000))
    _os.utime(src / "b_batch2.json", (1_700_000_100, 1_700_000_100))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    cat = ManagedCatalog(spark, str(tmp_path / "warehouse"))
    q = stream_dedup_into_corpus(
        stream, cat, "corpus", "corpus_sigs", "text", "doc_id",
        checkpoint=str(tmp_path / "ckpt2"), threshold=0.8,
    )
    q.awaitTermination(180)
    got = sorted(r.doc_id for r in cat.read("corpus").collect())
    assert got == [1, 2, 11], got  # copy of doc 1 rejected, novel doc kept
    sig_ids = sorted(r.doc_id for r in
                     cat.read("corpus_sigs").select("doc_id").distinct().collect())
    assert sig_ids == [1, 2, 11]
