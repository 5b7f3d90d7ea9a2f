"""Structured Streaming: the continuous-aggregate workload runs as a
real stream (file source → watermarked windowed agg → memory sink) and
matches the batch plan on the same data."""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import functions as F

from hermod_spark.sources.messages import message_stream
from hermod_spark.streaming.windows import windowed_agg

UTC = dt.timezone.utc


def _mk_batch(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 10, m, tzinfo=UTC)  # noqa: E731
    rows = [
        (t(0), "a", 1.0),
        (t(30), "a", 3.0),
        (t(59), "b", 10.0),
        (dt.datetime(2024, 1, 1, 11, 5, tzinfo=UTC), "a", 5.0),
    ]
    return spark.createDataFrame(rows, "time TIMESTAMP, topic STRING, value DOUBLE")


def test_windowed_agg_batch(spark):
    out = windowed_agg(_mk_batch(spark), window="1 hour")
    rows = {(r["bucket_start"].hour, r["topic"]): r for r in out.collect()}
    a10 = rows[(10, "a")]
    assert a10["avg_value"] == 2.0 and a10["min_value"] == 1.0
    assert a10["max_value"] == 3.0 and a10["value_count"] == 2
    assert rows[(11, "a")]["avg_value"] == 5.0
    assert rows[(10, "b")]["value_count"] == 1


def test_windowed_agg_stream_matches_batch(spark, tmp_path):
    batch = _mk_batch(spark)
    src = str(tmp_path / "src")
    batch.write.parquet(src)

    stream = message_stream(spark, src, schema=batch.schema)
    assert stream.isStreaming
    out = windowed_agg(stream, window="1 hour", watermark="2 hours")

    sink = f"win_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(f"SELECT * FROM {sink}").collect()
    finally:
        q.stop()

    want = {
        (r["bucket_start"], r["topic"]): (r["avg_value"], r["value_count"])
        for r in windowed_agg(batch, window="1 hour").collect()
    }
    got_map = {
        (r["bucket_start"], r["topic"]): (r["avg_value"], r["value_count"]) for r in got
    }
    assert got_map == want


def test_stream_plan_has_watermark(spark, tmp_path):
    batch = _mk_batch(spark)
    src = str(tmp_path / "src2")
    batch.write.parquet(src)
    stream = message_stream(spark, src, schema=batch.schema)
    out = windowed_agg(stream, window="1 hour", watermark="2 hours")
    assert "EventTimeWatermark" in out._jdf.queryExecution().analyzed().toString()
