"""MQTT sources (src-mqtt): replay DataSource batch + stream, live
source gating."""

from __future__ import annotations

import datetime as dt
import uuid

import pytest

from hermod_spark.sources import mqtt as M

UTC = dt.timezone.utc

MESSAGES = [
    {"time": dt.datetime(2024, 1, 1, 10, 0, tzinfo=UTC), "topic": "sensors/a/1",
     "qos": 1, "retain": False, "payload": '{"temperature": 20.5}'},
    {"time": dt.datetime(2024, 1, 1, 10, 1, tzinfo=UTC), "topic": "sensors/b/2",
     "payload": "not json"},
    {"time": dt.datetime(2024, 1, 1, 10, 2, tzinfo=UTC), "topic": "other",
     "qos": 2, "retain": True, "payload": "x"},
]


@pytest.fixture
def log_path(tmp_path):
    return M.write_message_log(str(tmp_path / "messages.jsonl"), MESSAGES)


def test_replay_batch_read(spark, log_path):
    M.register(spark)
    df = spark.read.format("mqtt_replay").option("path", log_path).load()
    rows = sorted(df.collect(), key=lambda r: r["time"])
    assert len(rows) == 3
    assert rows[0]["topic"] == "sensors/a/1" and rows[0]["qos"] == 1
    assert rows[1]["qos"] == 0 and rows[1]["retain"] is False  # defaults
    assert rows[2]["retain"] is True
    assert df.columns == ["time", "topic", "qos", "retain", "payload"]


def test_replay_batch_partitioning(spark, log_path):
    M.register(spark)
    df = (
        spark.read.format("mqtt_replay")
        .option("path", log_path)
        .option("numPartitions", 2)
        .load()
    )
    assert df.count() == 3
    assert df.rdd.getNumPartitions() == 2


def test_replay_stream_end_to_end(spark, log_path, tmp_path):
    """The recorded log plays through the streaming engine and feeds
    the same downstream plan shapes the live source would."""
    M.register(spark)
    stream = (
        spark.readStream.format("mqtt_replay")
        .option("path", log_path)
        .option("maxMessagesPerBatch", 2)
        .load()
    )
    assert stream.isStreaming
    sink = f"mqtt_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(f"SELECT topic FROM {sink}").collect()
    finally:
        q.stop()
    assert sorted(r["topic"] for r in got) == ["other", "sensors/a/1", "sensors/b/2"]


def test_replay_skips_malformed_lines(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"topic": "ok/1", "payload": "a"}\n'
        "this is not json\n"
        '{"topic": "ok/2", "payload": "b"}\n'
    )
    M.register(spark)
    df = spark.read.format("mqtt_replay").option("path", str(p)).load()
    assert sorted(r["topic"] for r in df.collect()) == ["ok/1", "ok/2"]


def test_live_source_requires_paho(spark):
    with pytest.raises(ImportError, match="paho-mqtt"):
        M.MqttLiveStreamReader({})
