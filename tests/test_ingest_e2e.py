"""End-to-end ingest parity: recorded spool → mqtt_replay stream →
Engine (routes + passthrough) → parquet sink must land exactly the
rows the same Engine writes in batch mode over the same spool.

This is the engine-shaped throughput path bench.py measures
(ingest_replay); the parity test pins its correctness at smoke scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

import hermod_spark.config as C
from hermod_spark.engine import Engine
from hermod_spark.sources.messages import render_replay_spool
from hermod_spark.sources.mqtt import MqttReplayDataSource

INGEST_TOML = """
[[routes]]
filter = "sensors/error/#"
table = "error_events"

[[routes]]
filter = "sensors/#"
table = "sensor_events"
"""


@pytest.fixture(scope="module")
def spool(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("spool") / "messages.jsonl")
    n = render_replay_spool(spark, SF_SMOKE, path)
    assert n == 1000
    return path


def _engine() -> Engine:
    return Engine(C.loads(INGEST_TOML))


def test_spool_roundtrips_message_frame(spark, spool):
    """The rendered spool, read back through mqtt_replay batch, is the
    message frame: same count, same topics, timestamps preserved to
    the microsecond."""
    spark.dataSource.register(MqttReplayDataSource)
    df = spark.read.format("mqtt_replay").option("path", spool).load()
    assert df.count() == 1000
    from hermod_spark.sources.messages import message_frame

    want = message_frame(spark, SF_SMOKE)
    got_agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("topic").alias("topics"),
        F.sum(F.unix_micros(F.col("time").cast("timestamp"))).alias("tsum"),
    ).first()
    want_agg = want.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("topic").alias("topics"),
        F.sum(F.unix_micros(F.col("time").cast("timestamp"))).alias("tsum"),
    ).first()
    assert got_agg == want_agg


def test_stream_ingest_matches_batch_ingest(spark, spool, tmp_path):
    """availableNow streaming ingest (multiple micro-batches) and the
    batch run over the same spool write identical per-table counts."""
    spark.dataSource.register(MqttReplayDataSource)

    batch_out = str(tmp_path / "batch")
    msgs = spark.read.format("mqtt_replay").option("path", spool).load()
    batch_results = _engine().run_batch(msgs, base_path=batch_out)
    batch_counts = {r["table"]: r["n_rows"] for r in batch_results}

    stream_out = str(tmp_path / "stream")
    stream = (
        spark.readStream.format("mqtt_replay")
        .option("path", spool)
        .option("maxMessagesPerBatch", 256)  # forces 4 micro-batches
        .load()
    )
    q = _engine().run_stream(
        stream, base_path=stream_out, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    stream_counts = {
        t: spark.read.parquet(f"{stream_out}/{t}").count()
        for t in batch_counts
        if batch_counts[t]
    }
    assert {t: n for t, n in batch_counts.items() if n} == stream_counts
    assert sum(batch_counts.values()) == 1000  # every message routed
