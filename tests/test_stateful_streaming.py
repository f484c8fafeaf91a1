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
