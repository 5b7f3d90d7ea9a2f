"""Config parsing (reference: internal/config/config_test.go:9-140) and
the assembled engine: config -> routes -> transforms -> multi-table
sink, batch and streaming."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hermod_spark import config as C
from hermod_spark.engine import Engine
from hermod_spark.plans.schema import Schema

UTC = dt.timezone.utc

VALID_TOML = """
[mqtt]
broker = "tcp://localhost:1883"
client_id = "test-client"
username = "user"
password = "pass"
topics = ["test/#"]
qos = 1

[database]
host = "localhost"
port = 5432
user = "testuser"
password = "testpass"
database = "testdb"
sslmode = "disable"
pool_size = 10

[pipeline]
lua_script = "script.lua"
table_name = "test_table"

[[routes]]
filter = "sensors/temp/#"
script = "c2f"
table = "temps"

[[routes]]
filter = "sensors/#"
table = "sensor_raw"
"""


def test_load_valid_config(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text(VALID_TOML)
    cfg = C.load(str(p))
    # config_test.go:70-88 assertions
    assert cfg.mqtt.broker == "tcp://localhost:1883"
    assert cfg.mqtt.client_id == "test-client"
    assert cfg.database.host == "localhost"
    assert cfg.database.port == 5432
    assert cfg.pipeline.table_name == "test_table"
    assert [r.table for r in cfg.routes] == ["temps", "sensor_raw"]
    assert cfg.routes[0].workers == 1 and cfg.routes[0].queue_size == 100  # defaults


def test_load_invalid_toml(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text("[mqtt\nbroker = invalid")
    with pytest.raises(Exception):
        C.load(str(p))


def test_load_missing_file():
    with pytest.raises(FileNotFoundError):
        C.load("/nonexistent/config.toml")


def test_connection_string_golden():
    # config_test.go:98-140 — byte-identical format
    db = C.DatabaseConfig(
        host="localhost", port=5432, user="testuser", password="testpass",
        database="testdb", sslmode="disable", pool_size=10,
    )
    assert db.connection_string() == (
        "host=localhost port=5432 user=testuser password=testpass"
        " dbname=testdb sslmode=disable pool_max_conns=10"
    )
    db2 = C.DatabaseConfig(
        host="db.example.com", port=5433, user="admin", password="secret123",
        database="proddb", sslmode="require", pool_size=20,
    )
    assert db2.connection_string() == (
        "host=db.example.com port=5433 user=admin password=secret123"
        " dbname=proddb sslmode=require pool_max_conns=20"
    )


# --- assembled engine ----------------------------------------------------


def _c2f(df):
    j = F.from_json(F.col("payload").cast("string"), "temperature double")
    return df.select(
        F.col("time"),
        F.col("topic"),
        j.getField("temperature").alias("temperature_celsius"),
        (j.getField("temperature") * 9 / 5 + 32).alias("temperature_fahrenheit"),
    )


@pytest.fixture
def engine():
    cfg = C.loads(VALID_TOML)
    return Engine(cfg, transforms={"c2f": _c2f})


@pytest.fixture
def messages(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, tzinfo=UTC)
    return spark.createDataFrame(
        [
            (t0, "sensors/temp/a", 0, False, '{"temperature": 0}'),
            (t0, "sensors/hum/b", 0, False, '{"humidity": 40}'),
            (t0, "other/topic", 0, False, "raw"),
        ],
        "time TIMESTAMP, topic STRING, qos INT, retain BOOLEAN, payload STRING",
    )


def test_engine_requires_registered_transforms():
    cfg = C.loads(VALID_TOML)
    with pytest.raises(KeyError, match="c2f"):
        Engine(cfg)


def test_engine_batch_end_to_end(spark, engine, messages, tmp_path):
    engine.run_batch(messages, base_path=str(tmp_path))
    temps = spark.read.parquet(str(tmp_path / "temps"))
    raw = spark.read.parquet(str(tmp_path / "sensor_raw"))
    passthrough = spark.read.parquet(str(tmp_path / "iot_raw"))
    assert temps.count() == 1
    assert temps.first()["temperature_fahrenheit"] == 32.0  # C->F golden
    assert raw.first()["topic"] == "sensors/hum/b"  # shadowed by route 1
    assert passthrough.first()["topic"] == "other/topic"


def test_engine_stream_end_to_end(spark, engine, messages, tmp_path):
    src = str(tmp_path / "src")
    messages.write.parquet(src)
    stream = spark.readStream.schema(messages.schema).parquet(src)
    q = engine.run_stream(
        stream, base_path=str(tmp_path / "out"), checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(60)
    temps = spark.read.parquet(str(tmp_path / "out" / "temps"))
    assert temps.count() == 1 and temps.first()["temperature_fahrenheit"] == 32.0


def test_engine_ddl_mode():
    cfg = C.loads(VALID_TOML)
    schemas = {
        "c2f": Schema.declare(
            {"temps": {"time": "timestamptz", "temperature_fahrenheit": "double precision"}}
        )
    }
    eng = Engine(cfg, transforms={"c2f": _c2f}, schemas=schemas)
    sql = eng.generate_sql()
    assert "CREATE TABLE IF NOT EXISTS temps" in sql


def test_engine_with_mqtt_replay_source(spark, engine, tmp_path):
    """The full reference main loop, Spark-shaped: recorded MQTT log →
    replay DataSource stream → first-match routing → transform →
    multi-table parquet sink (cmd/hermod/main.go:100-199 analogue)."""
    from hermod_spark.sources import mqtt as M

    log = M.write_message_log(
        str(tmp_path / "log.jsonl"),
        [
            {"time": dt.datetime(2024, 1, 1, 12, tzinfo=UTC),
             "topic": "sensors/temp/a", "payload": '{"temperature": 100}'},
            {"time": dt.datetime(2024, 1, 1, 12, tzinfo=UTC),
             "topic": "elsewhere", "payload": "x"},
        ],
    )
    M.register(spark)
    stream = spark.readStream.format("mqtt_replay").option("path", log).load()
    q = engine.run_stream(
        stream, base_path=str(tmp_path / "out"), checkpoint=str(tmp_path / "ck")
    )
    q.awaitTermination(60)
    temps = spark.read.parquet(str(tmp_path / "out" / "temps"))
    assert temps.first()["temperature_fahrenheit"] == 212.0
    raw = spark.read.parquet(str(tmp_path / "out" / "iot_raw"))
    assert raw.first()["topic"] == "elsewhere"


def test_engine_stream_exactly_once_restart(spark, engine, messages, tmp_path):
    """Restarting the stream over the same source with the same
    commit dir must not duplicate rows even though the checkpoint is
    wiped (the replayed batch hits its commit marker)."""
    src = str(tmp_path / "src")
    messages.write.parquet(src)

    def run(ck):
        stream = spark.readStream.schema(messages.schema).parquet(src)
        q = engine.run_stream(
            stream,
            base_path=str(tmp_path / "out"),
            checkpoint=str(tmp_path / ck),
            exactly_once_commit_dir=str(tmp_path / "commits"),
        )
        q.awaitTermination(60)

    run("ck1")
    run("ck2")  # fresh checkpoint -> batch 0 replays -> must be skipped
    temps = spark.read.parquet(str(tmp_path / "out" / "temps"))
    assert temps.count() == 1


def test_engine_dry_run_writes_nothing(spark, messages, tmp_path):
    cfg = C.loads("dry_run = true\n" + VALID_TOML)
    eng = Engine(cfg, transforms={"c2f": _c2f})
    results = eng.run_batch(messages, base_path=str(tmp_path))
    assert all("plan" in r for r in results)
    assert not any(tmp_path.iterdir())


def test_engine_quarantine_branch(spark, engine, tmp_path):
    """quarantine=True: the corrupt message lands raw+reason in
    _quarantine; valid ones route exactly as before; nothing dropped."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, tzinfo=UTC)
    msgs = spark.createDataFrame(
        [
            (t0, "sensors/temp/a", 0, False, '{"temperature": 100}'),
            (t0, "sensors/temp/a", 0, False, "{broken json"),
            (t0, "", 0, False, '{"temperature": 1}'),
        ],
        "time TIMESTAMP, topic STRING, qos INT, retain BOOLEAN, payload STRING",
    )
    from hermod_spark.sinks.writer import MultiTableWriter

    out = str(tmp_path / "out")
    results = {
        r["table"]: r["n_rows"]
        for r in MultiTableWriter(base_path=out).write(
            dict(engine.plan(msgs, quarantine=True))
        )
    }
    assert results["_quarantine"] == 2
    assert results["temps"] == 1
    q = spark.read.parquet(f"{out}/_quarantine")
    assert sorted(r["reason"] for r in q.collect()) == ["bad_json", "empty_topic"]
    assert "payload" in q.columns  # raw bytes preserved for replay


def test_engine_stream_quarantine(spark, engine, tmp_path):
    """Streaming with quarantine=True: the corrupt record lands in
    _quarantine from inside the foreachBatch loop; the stream never
    dies on it."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, tzinfo=UTC)
    msgs = spark.createDataFrame(
        [
            (t0, "sensors/temp/a", 0, False, '{"temperature": 0}'),
            (t0, "sensors/temp/a", 0, False, "{broken"),
        ],
        "time TIMESTAMP, topic STRING, qos INT, retain BOOLEAN, payload STRING",
    )
    src = str(tmp_path / "src")
    msgs.write.parquet(src)
    stream = spark.readStream.schema(msgs.schema).parquet(src)
    q = engine.run_stream(
        stream,
        base_path=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
        quarantine=True,
    )
    q.awaitTermination(60)
    quarantined = spark.read.parquet(str(tmp_path / "out" / "_quarantine"))
    assert quarantined.count() == 1
    assert quarantined.first()["reason"] == "bad_json"
    temps = spark.read.parquet(str(tmp_path / "out" / "temps"))
    assert temps.count() == 1 and temps.first()["temperature_fahrenheit"] == 32.0


def test_quarantine_split_single_reason_eval(spark, engine):
    """VERDICT r10 #6: plan(quarantine=True) must evaluate
    quarantine_reason (try_parse_json over the payload) ONCE per row,
    not once per branch — the tagged frame is persisted and every
    branch scans the cache. Gate: each branch's executed plan reads
    InMemoryTableScan, and the reason expression appears only inside
    the cached relation, not above the cache boundary."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, tzinfo=UTC)
    msgs = spark.createDataFrame(
        [(t0, "sensors/temp/a", 0, False, '{"temperature": 100}')],
        "time TIMESTAMP, topic STRING, qos INT, retain BOOLEAN, payload STRING",
    )
    branches, cached = engine.plan_cached(msgs, quarantine=True)
    try:
        assert cached is not None and cached.storageLevel.useMemory
        for table, df in branches:
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "InMemoryTableScan" in plan, table
            # the reason expression lives BELOW the cache: nothing
            # above the InMemoryTableScan re-runs try_parse_json (route
            # transforms above the cache may still from_json their own
            # typed extraction — that's the transform, not the reason)
            above_cache = plan.split("InMemoryTableScan", 1)[0]
            assert "try_parse_json" not in above_cache, table
    finally:
        if cached is not None:
            cached.unpersist()
