"""Custom stateful streaming operators: streaming dedup + custom state
via applyInPandasWithState."""

from __future__ import annotations

import datetime as dt
import uuid

from hermod_spark.sources.messages import message_stream
from hermod_spark.streaming.stateful import dedup_stream, running_counts

UTC = dt.timezone.utc


def _mk_messages(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 10, m, tzinfo=UTC)  # noqa: E731
    rows = [
        (t(0), "a", "p1"),
        (t(1), "a", "p1"),  # dup of (a, p1)
        (t(2), "a", "p2"),
        (t(3), "b", "p1"),
        (t(4), "a", "p1"),  # another dup within horizon
    ]
    return spark.createDataFrame(rows, "time TIMESTAMP, topic STRING, payload STRING")


def _run_stream(spark, tmp_path, out, mode="append"):
    sink = f"s_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {sink}").collect()
    finally:
        q.stop()


def test_dedup_stream(spark, tmp_path):
    batch = _mk_messages(spark)
    src = str(tmp_path / "src")
    batch.write.parquet(src)
    stream = message_stream(spark, src, schema=batch.schema)
    got = _run_stream(spark, tmp_path, dedup_stream(stream, watermark="1 hour"))
    pairs = sorted((r["topic"], r["payload"]) for r in got)
    assert pairs == [("a", "p1"), ("a", "p2"), ("b", "p1")]


def test_running_counts_state(spark, tmp_path):
    batch = _mk_messages(spark)
    src = str(tmp_path / "src")
    batch.write.parquet(src)
    stream = message_stream(spark, src, schema=batch.schema)
    got = _run_stream(
        spark, tmp_path, running_counts(stream, key_col="topic"), mode="update"
    )
    # final state per key: a=4 messages, b=1
    final = {}
    for r in got:
        final[r["key"]] = max(final.get(r["key"], 0), r["n"])
    assert final == {"a": 4, "b": 1}
