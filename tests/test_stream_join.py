"""Stream-stream interval join gates: the streamed (watermarked,
micro-batched) result must equal the batch join on the same data, and the
watermark must actually bound state (a right event arriving after the
watermark passed its join window never emits)."""

from __future__ import annotations

import datetime
import os
import shutil

from pyspark.sql import functions as F

from entity_extractor_spark.streaming.join import interval_join

V_SCHEMA = "user_id bigint, view_id bigint, view_ts timestamp"
C_SCHEMA = "user_id bigint, click_id bigint, click_ts timestamp"
T0 = datetime.datetime(2026, 1, 1)


def _ts(sec: int) -> datetime.datetime:
    return T0 + datetime.timedelta(seconds=sec)


def _write_batch(spark, in_dir, name, rows, schema):
    tmp = in_dir + f"_tmp_{name}"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(in_dir, exist_ok=True)
    src = next(
        os.path.join(tmp, f) for f in os.listdir(tmp) if f.endswith(".parquet")
    )
    shutil.move(src, os.path.join(in_dir, f"{name}.parquet"))
    shutil.rmtree(tmp)


VIEWS = [(1, 10, _ts(0)), (1, 11, _ts(100)), (2, 20, _ts(50))]
CLICKS = [
    (1, 100, _ts(30)),    # joins view 10 (lag 30)
    (1, 101, _ts(130)),   # joins views 10 (lag 130 > 60? no) and 11 (lag 30)
    (2, 200, _ts(200)),   # lag 150 from view 20 -> outside 60s window
]


def _batch_expected(spark):
    v = spark.createDataFrame(VIEWS, V_SCHEMA)
    c = spark.createDataFrame(CLICKS, C_SCHEMA)
    return sorted(
        tuple(r)
        for r in interval_join(
            v, c, "user_id", "view_ts", "click_ts", 60
        ).collect()
    )


def test_interval_join_batch_semantics(spark):
    got = _batch_expected(spark)
    assert [(r[1], r[3]) for r in got] == [(10, 100), (11, 101)]


def test_interval_join_rejects_overlapping_columns(spark):
    import pytest

    v = spark.createDataFrame(VIEWS, V_SCHEMA)
    with pytest.raises(ValueError):
        interval_join(v, v, "user_id", "view_ts", "view_ts", 60)


def test_stream_equals_batch(spark, tmp_path):
    v_dir, c_dir = str(tmp_path / "views"), str(tmp_path / "clicks")
    ckpt = str(tmp_path / "ckpt")
    # split the inputs across two micro-batch files per side
    _write_batch(spark, v_dir, "b0", VIEWS[:2], V_SCHEMA)
    _write_batch(spark, v_dir, "b1", VIEWS[2:], V_SCHEMA)
    _write_batch(spark, c_dir, "b0", CLICKS[:1], C_SCHEMA)
    _write_batch(spark, c_dir, "b1", CLICKS[1:], C_SCHEMA)

    vs = (
        spark.readStream.schema(V_SCHEMA).option("maxFilesPerTrigger", "1").parquet(v_dir)
    )
    cs = (
        spark.readStream.schema(C_SCHEMA).option("maxFilesPerTrigger", "1").parquet(c_dir)
    )
    joined = interval_join(vs, cs, "user_id", "view_ts", "click_ts", 60)
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(tuple(r) for r in spark.sql("select * from sj_out").collect())
        assert got == _batch_expected(spark)
    finally:
        q.stop()


def test_watermark_drops_too_late_click(spark, tmp_path):
    v_dir, c_dir = str(tmp_path / "views"), str(tmp_path / "clicks")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, v_dir, "b0", [(1, 10, _ts(0))], V_SCHEMA)
    # first click batch races event time far ahead: watermark (max - 10s)
    # passes view 10's join window [0, 60] on BOTH sides
    _write_batch(spark, c_dir, "b0", [(9, 900, _ts(10000))], C_SCHEMA)
    # advance the VIEW side's event time too (watermark is the min of both);
    # different user than the click above so the two advancers can't join
    _write_batch(spark, v_dir, "b1", [(8, 90, _ts(10000))], V_SCHEMA)

    vs = (
        spark.readStream.schema(V_SCHEMA).option("maxFilesPerTrigger", "1").parquet(v_dir)
    )
    cs = (
        spark.readStream.schema(C_SCHEMA).option("maxFilesPerTrigger", "1").parquet(c_dir)
    )
    joined = interval_join(
        vs, cs, "user_id", "view_ts", "click_ts", 60, watermark_delay="10 seconds"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_late")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # now a click that WOULD match view 10 arrives — but the watermark
        # already evicted that view's state: it must not emit
        _write_batch(spark, c_dir, "b1", [(1, 100, _ts(30))], C_SCHEMA)
        q.processAllAvailable()
        assert spark.sql("select * from sj_late").count() == 0
    finally:
        q.stop()
