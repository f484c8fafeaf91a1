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


def _twenty_words():
    return [
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
        "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho",
        "sigma", "tau", "upsilon",
    ]


def test_keep_dropped_signatures_requires_history(spark, tmp_path):
    import pytest

    from data_rivers_spark.catalog.tables import ManagedCatalog
    from data_rivers_spark.streaming.events import make_dedup_batch_fn

    cat = ManagedCatalog(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="history_table"):
        make_dedup_batch_fn(
            cat, "corpus", "sigs", "text", "doc_id",
            keep_dropped_signatures=True,
        )


def test_keep_dropped_signatures_rejects_dup_of_dropped_doc(spark, tmp_path):
    """The flag's whole point: a later doc that duplicates a DROPPED doc
    (but not its kept representative — similarity is not transitive) must
    be rejected. Batch 1: doc1 = base, doc2 = base with the LAST word
    swapped (J3-shingle 17/19 ≈ 0.895 vs doc1 → dropped). Batch 2:
    doc10 = doc2 with the FIRST word swapped (≈0.895 vs doc2, but only
    16/20 = 0.80 vs doc1 < threshold 0.85). Without the history table the
    store's doc2 signature has no text to verify against and doc10 slips
    in; with it, doc10 is rejected."""
    from data_rivers_spark.catalog.tables import ManagedCatalog
    from data_rivers_spark.streaming.events import make_dedup_batch_fn

    w = _twenty_words()
    d1 = " ".join(w)
    d2 = " ".join(w[:-1] + ["zzz"])
    d10 = " ".join(["qqq"] + w[1:-1] + ["zzz"])

    def run(root, keep_dropped, history):
        cat = ManagedCatalog(spark, root)
        fn = make_dedup_batch_fn(
            cat, "corpus", "sigs", "text", "doc_id", threshold=0.85,
            keep_dropped_signatures=keep_dropped, history_table=history,
        )
        b1 = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
        b2 = spark.createDataFrame([(10, d10)], "doc_id long, text string")
        fn(b1, 0)
        fn(b2, 1)
        return sorted(r.doc_id for r in cat.read("corpus").collect()), cat

    # default mode: doc10 matches only the dropped doc2 → admitted
    got_default, _ = run(str(tmp_path / "wh_default"), False, None)
    assert got_default == [1, 10]
    # keep-dropped mode with history: doc10 rejected via doc2's signature
    got_hist, cat = run(str(tmp_path / "wh_hist"), True, "hist")
    assert got_hist == [1]
    # the history table holds the FULL ingest (dropped docs included)
    assert sorted(r.doc_id for r in cat.read("hist").collect()) == [1, 2, 10]


def test_dedup_batch_replay_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a committed batch_id must
    not re-append corpus or signature rows."""
    from data_rivers_spark.catalog.tables import ManagedCatalog
    from data_rivers_spark.streaming.events import make_dedup_batch_fn

    cat = ManagedCatalog(spark, str(tmp_path / "wh_replay"))
    fn = make_dedup_batch_fn(cat, "corpus", "sigs", "text", "doc_id")
    w = _twenty_words()
    b1 = spark.createDataFrame(
        [(1, " ".join(w)), (2, " ".join(reversed(w)))], "doc_id long, text string"
    )
    fn(b1, 0)
    n_corpus = cat.read("corpus").count()
    n_sigs = cat.read("sigs").count()
    fn(b1, 0)  # replay: same batch_id → no-op
    assert cat.read("corpus").count() == n_corpus
    assert cat.read("sigs").count() == n_sigs
    # a genuinely new batch still lands
    b2 = spark.createDataFrame(
        [(10, "totally different words entirely novel content here okay fine yes")],
        "doc_id long, text string",
    )
    fn(b2, 1)
    assert cat.read("corpus").count() == n_corpus + 1


def test_sessionized_event_counts_stream(spark, tmp_path):
    """session_window over a file stream: events within the 30-min gap
    merge into one session; a later event opens a new one; sessions span
    micro-batch boundaries (user 1's second event arrives in batch 2 but
    lands in the batch-1 session)."""
    import json as _json

    from data_rivers_spark.streaming.events import (
        read_events_stream,
        sessionized_event_counts,
    )

    src = tmp_path / "sess_in"
    src.mkdir()
    b1 = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00.000Z", "user_id": 1,
         "event_type": "c", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T05:00:00.000Z", "user_id": 2,
         "event_type": "c", "value": 2.0, "props": "{}"},
    ]
    b2 = [
        # 10 min after user 1's first event: same session
        {"event_id": 3, "ts": "2024-01-01T00:10:00.000Z", "user_id": 1,
         "event_type": "c", "value": 4.0, "props": "{}"},
        # 3h later: new session for user 1
        {"event_id": 4, "ts": "2024-01-01T03:00:00.000Z", "user_id": 1,
         "event_type": "c", "value": 8.0, "props": "{}"},
    ]
    (src / "b1.json").write_text("\n".join(_json.dumps(r) for r in b1))
    (src / "b2.json").write_text("\n".join(_json.dumps(r) for r in b2))
    import os as _os

    _os.utime(src / "b1.json", (1_700_000_000, 1_700_000_000))
    _os.utime(src / "b2.json", (1_700_000_100, 1_700_000_100))

    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    out = sessionized_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT user_id, n_events, total_value FROM sessions "
        "ORDER BY user_id, session_start"
    ).collect()
    got = [(r.user_id, r.n_events, r.total_value) for r in rows]
    # user 1: events 1+3 merge (10-min gap), event 4 is its own session
    assert got == [(1, 2, 5.0), (1, 1, 8.0), (2, 1, 2.0)], got


def test_stream_stream_attribution_join(spark, tmp_path):
    """Windowed stream-stream join: a purchase pairs with the same user's
    clicks within the preceding hour — across micro-batches — and clicks
    outside the window never pair."""
    import json as _json
    import os as _os

    from data_rivers_spark.streaming.events import (
        read_events_stream,
        stream_stream_attribution_join,
    )

    src = tmp_path / "ss_in"
    src.mkdir()
    rows = [
        # user 1: click at 00:00, purchase at 00:30 (within window, joins)
        {"event_id": 1, "ts": "2024-01-01T00:00:00.000Z", "user_id": 1,
         "event_type": "click", "value": 1.0, "props": "{}"},
        # user 2: click at 00:00, purchase at 02:30 (outside 1h window)
        {"event_id": 2, "ts": "2024-01-01T00:00:00.000Z", "user_id": 2,
         "event_type": "click", "value": 2.0, "props": "{}"},
    ]
    rows2 = [
        {"event_id": 3, "ts": "2024-01-01T00:30:00.000Z", "user_id": 1,
         "event_type": "purchase", "value": 10.0, "props": "{}"},
        {"event_id": 4, "ts": "2024-01-01T02:30:00.000Z", "user_id": 2,
         "event_type": "purchase", "value": 20.0, "props": "{}"},
    ]
    (src / "b1.json").write_text("\n".join(_json.dumps(r) for r in rows))
    (src / "b2.json").write_text("\n".join(_json.dumps(r) for r in rows2))
    _os.utime(src / "b1.json", (1_700_000_000, 1_700_000_000))
    _os.utime(src / "b2.json", (1_700_000_100, 1_700_000_100))

    ev = read_events_stream(spark, str(src), max_files_per_trigger=1)
    clicks = ev.filter(ev.event_type == "click")
    purchases = ev.filter(ev.event_type == "purchase")
    out = stream_stream_attribution_join(clicks, purchases, window="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in spark.sql("SELECT * FROM attributed ORDER BY user_id").collect()
    ]
    # user 1's purchase attributes to its click; user 2's is out of window
    assert got == [(1, 1, 3)], got


def test_closed_user_sessions_emit_on_watermark(spark, tmp_path):
    """EventTimeTimeout sessions: a session row is emitted exactly once, only
    after the watermark passes its end + gap, with the custom event-type
    digest session_window cannot produce."""
    from data_rivers_spark.streaming.events import read_events_stream
    from data_rivers_spark.streaming.stateful import closed_user_sessions

    src = tmp_path / "sess_in"
    src.mkdir()
    # user 1: two events 5 min apart (one session); user 2: one event.
    # batch 2 jumps event time far ahead so the watermark closes everything.
    b1 = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00.000Z", "user_id": 1, "event_type": "view", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:05:00.000Z", "user_id": 1, "event_type": "click", "value": 2.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-01-01T00:01:00.000Z", "user_id": 2, "event_type": "view", "value": 5.0, "props": "{}"},
    ]
    b2 = [
        {"event_id": 9, "ts": "2024-01-02T12:00:00.000Z", "user_id": 3, "event_type": "view", "value": 0.5, "props": "{}"},
    ]
    b3 = [
        {"event_id": 10, "ts": "2024-01-03T12:00:00.000Z", "user_id": 4, "event_type": "view", "value": 0.5, "props": "{}"},
    ]
    import os as _os
    import time as _time

    # FileStreamSource orders batches by file mtime: stagger them so b1's
    # events are processed BEFORE b2/b3 advance the watermark past them —
    # otherwise the session state is created when the watermark is already
    # final and its (clamped) timer can never fire before end-of-input.
    now = _time.time()
    for i, (name, rows_) in enumerate([("b1", b1), ("b2", b2), ("b3", b3)]):
        p = src / f"{name}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows_))
        _os.utime(p, (now + i * 10, now + i * 10))

    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    out = closed_user_sessions(stream, gap="30 minutes", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r.user_id: r for r in spark.sql("SELECT * FROM closed_sessions").collect()}
    # users 1 and 2 must have closed (watermark advanced a full day past them)
    assert 1 in rows and 2 in rows
    s1 = rows[1]
    assert s1.n_events == 2 and s1.total_value == 3.0
    assert s1.event_types == "click,view"
    assert s1.session_start.minute == 0 and s1.session_end.minute == 5
    assert rows[2].n_events == 1 and rows[2].event_types == "view"
    # exactly one row per closed session (emit-once contract)
    all_rows = spark.sql("SELECT user_id, COUNT(*) c FROM closed_sessions GROUP BY user_id").collect()
    assert all(r.c == 1 for r in all_rows)


def test_read_open_sessions_from_state_store(spark, tmp_path):
    """The statestore data source must expose sessions still open at
    end-of-input — the flush/monitoring view complementing emit-on-close."""
    from data_rivers_spark.streaming.events import read_events_stream
    from data_rivers_spark.streaming.stateful import (
        closed_user_sessions,
        read_open_sessions,
    )

    src = tmp_path / "open_in"
    src.mkdir()
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00.000Z", "user_id": 7, "event_type": "view", "value": 2.5, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:10:00.000Z", "user_id": 7, "event_type": "click", "value": 1.5, "props": "{}"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    ckpt = str(tmp_path / "open_ckpt")
    q = (
        closed_user_sessions(
            read_events_stream(spark, str(src)), gap="30 minutes", watermark="1 hour"
        )
        .writeStream.format("memory")
        .queryName("open_sessions_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # nothing emitted (watermark never passed end+gap) ...
    assert spark.sql("SELECT * FROM open_sessions_sink").count() == 0
    # ... but the open session is visible in the state store
    open_rows = {r.user_id: r for r in read_open_sessions(spark, ckpt).collect()}
    assert 7 in open_rows
    s = open_rows[7]
    assert s.n_events == 2 and s.total_value == 4.0
    assert s.event_types == "click,view"
    assert s.session_start.minute == 0 and s.session_end.minute == 10
