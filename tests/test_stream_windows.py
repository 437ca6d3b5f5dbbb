"""Watermarked event-time windowed aggregation (streaming/windows.py):
append mode emits each finalized window exactly once; late-but-in-horizon
events count; events behind the watermark are dropped."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

SCHEMA = (
    "doc_id string, event_ts timestamp, "
    "spans array<struct<kind string, text string, media_ref string, offset int>>"
)


def _write_batch(spark, in_dir: str, batch: int, rows: list[tuple]) -> None:
    df = spark.createDataFrame(rows, SCHEMA)
    tmp = in_dir + f"_tmp{batch}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = glob.glob(f"{tmp}/part-*.parquet")[0]
    os.makedirs(in_dir, exist_ok=True)
    shutil.move(src, os.path.join(in_dir, f"b{batch}.parquet"))
    shutil.rmtree(tmp)


def _row(doc_id: str, sec: int, n_spans: int = 1):
    import datetime

    ts = datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=sec)
    spans = [("text", f"s{i}", None, i) for i in range(n_spans)]
    return (doc_id, ts, spans)


def test_watermarked_window_counts(spark, tmp_path):
    from entity_extractor_spark.streaming.windows import doc_arrival_counts

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, in_dir, 0, [_row("d1", 0), _row("d2", 30, 2), _row("d3", 100)])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    counts = doc_arrival_counts(stream, window_seconds=60, watermark_delay="2 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark = 100s - 120s < 0: nothing finalized yet
        assert spark.sql("select * from win_counts").count() == 0

        # batch 1 advances event time to 400s -> watermark 280s: the first
        # two windows ([0,60) and [60,120)) finalize and emit exactly once
        _write_batch(spark, in_dir, 1, [_row("d4", 400)])
        q.processAllAvailable()
        got = {
            int(r["ws"]): (r["n_docs"], r["n_spans"])
            for r in spark.sql(
                "select unix_timestamp(window_start) - unix_timestamp(timestamp'2026-01-01') as ws,"
                " n_docs, n_spans from win_counts"
            ).collect()
        }
        assert got == {0: (2, 3), 60: (1, 1)}

        # a late event at 50s is BEHIND the 280s watermark: dropped; a live
        # event at 500s advances the watermark to 380s -> window [360,420)
        # containing d4 finalizes; the dropped event never appears
        _write_batch(spark, in_dir, 2, [_row("late", 50), _row("d5", 500)])
        q.processAllAvailable()
        _write_batch(spark, in_dir, 3, [_row("d6", 700)])
        q.processAllAvailable()
        got = {
            int(r["ws"]): (r["n_docs"], r["n_spans"])
            for r in spark.sql(
                "select unix_timestamp(window_start) - unix_timestamp(timestamp'2026-01-01') as ws,"
                " n_docs, n_spans from win_counts"
            ).collect()
        }
        assert got[0] == (2, 3), "finalized window must not change on late data"
        assert 360 in got and got[360] == (1, 1)
        assert 480 in got and got[480] == (1, 1)
    finally:
        q.stop()


EVENTS_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, value double"
HOP_SCHEMA = "event_id bigint, ts timestamp, event_type string, value double"


def _hrow(eid: int, sec: int, etype: str, value: float):
    import datetime

    return (eid, datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=sec), etype, value)


def test_hopping_streaming_matches_batch(spark, tmp_path):
    """hopping_counts runs UNCHANGED on a stream: each event lands in two
    overlapping 1h/30m windows, the watermark finalizes windows whose end
    has passed, and every appended row equals the batch run's row."""
    from entity_extractor_spark.streaming.windows import hopping_counts

    rows0 = [_hrow(0, 0, "view", 1.25), _hrow(1, 900, "view", 2.50), _hrow(2, 100, "buy", 4.00)]
    rows1 = [_hrow(3, 2000, "view", 0.25)]      # second half-hour slot
    rows2 = [_hrow(4, 20000, "view", 9.75)]     # far future: finalizes all prior windows
    in_dir = str(tmp_path / "hop_in")
    for i, rows in enumerate([rows0, rows1, rows2]):
        df = spark.createDataFrame(rows, HOP_SCHEMA)
        tmp = in_dir + f"_tmp{i}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.makedirs(in_dir, exist_ok=True)
        shutil.move(src, os.path.join(in_dir, f"b{i}.parquet"))
        shutil.rmtree(tmp)

    stream = (
        spark.readStream.schema(HOP_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    hop = hopping_counts(stream.withWatermark("ts", "10 minutes"))
    q = (
        hop.writeStream.format("memory")
        .queryName("hops")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "hop_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["window_end"], r["n_events"], r["total_value"])
            for r in spark.sql("select * from hops").collect()
        }
    finally:
        q.stop()

    batch = spark.createDataFrame(rows0 + rows1 + rows2, HOP_SCHEMA)
    want_all = {
        (r["window_start"], r["event_type"]): (r["window_end"], r["n_events"], r["total_value"])
        for r in hopping_counts(batch).collect()
    }
    assert got, "stream emitted no finalized windows"
    for k, v in got.items():
        assert want_all[k] == v, (k, v, want_all[k])
    # the three batch-0/1 events merged across micro-batches: the window
    # starting at -30min and the one at 0 both carry all 4 'view' events'
    # first-hour subset; check the [0,1h) view window aggregated 3 events
    import datetime

    w0 = datetime.datetime(2026, 1, 1)
    assert (w0, "view") in got
    assert got[(w0, "view")][1:] == (3, 1.25 + 2.50 + 0.25)


def _erow(eid: int, sec: int, user: int, value: float):
    import datetime

    return (eid, datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=sec), user, value)


def test_sessionize_streaming_matches_batch(spark, tmp_path):
    """sessionize runs UNCHANGED on a stream: session-window state merges
    events across micro-batches, a watermark finalizes closed sessions, and
    the appended output equals the batch run over the same events."""
    from entity_extractor_spark.streaming.windows import sessionize

    rows0 = [_erow(0, 0, 1, 1.25), _erow(1, 60, 1, 2.50), _erow(2, 10, 2, 4.00)]
    rows1 = [_erow(3, 120, 1, 0.25)]          # merges into user 1's open session
    rows2 = [_erow(4, 7200, 1, 9.75)]         # 2h later: new session + watermark push
    rows3 = [_erow(5, 20000, 9, 1.00)]        # far future: finalizes everything prior
    in_dir = str(tmp_path / "ev_in")
    for i, rows in enumerate([rows0, rows1, rows2, rows3]):
        df = spark.createDataFrame(rows, EVENTS_SCHEMA)
        tmp = in_dir + f"_tmp{i}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.makedirs(in_dir, exist_ok=True)
        shutil.move(src, os.path.join(in_dir, f"b{i}.parquet"))
        shutil.rmtree(tmp)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    sess = sessionize(stream.withWatermark("ts", "10 minutes"), gap="30 minutes")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ev_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["sum_value"])
            for r in spark.sql("select * from sessions").collect()
        }
    finally:
        q.stop()

    batch = spark.createDataFrame(rows0 + rows1 + rows2 + rows3, EVENTS_SCHEMA)
    # the far-future session may not be finalized by the stream's watermark;
    # compare on the sessions the stream emitted (all CLOSED sessions)
    want_all = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["sum_value"])
        for r in sessionize(batch, gap="30 minutes").collect()
    }
    assert got, "stream emitted no finalized sessions"
    for k, v in got.items():
        assert want_all[k] == v, (k, v, want_all[k])
    # user 1's first session (merged across micro-batches 0 and 1) emitted
    sess1_start = _erow(0, 0, 1, 0.0)[1]
    assert (1, sess1_start) in got
    assert got[(1, sess1_start)][1] == 3
