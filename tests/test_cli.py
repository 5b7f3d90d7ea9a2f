"""CLI surface (the reference binary's modes: -sql offline, batch run)."""

from __future__ import annotations

import pytest

from hermod_spark.__main__ import main

CONFIG = """
[pipeline]
table_name = "mqtt_messages"

[[routes]]
filter = "sensors/#"
table = "sensor_raw"
"""


@pytest.fixture
def config_path(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text(CONFIG)
    return str(p)


def test_sql_mode_prints_ddl(config_path, tmp_path, capsys, monkeypatch):
    mod = tmp_path / "my_transforms.py"
    mod.write_text(
        "from hermod_spark.plans.schema import Schema\n"
        "TRANSFORMS = {}\n"
        "SCHEMAS = {'x': Schema.declare({'sensor_raw': {'time': 'timestamptz',"
        " 'raw': 'text'}})}\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    rc = main(["--config", config_path, "--sql", "--transforms", "my_transforms"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "CREATE TABLE IF NOT EXISTS sensor_raw" in out


def test_source_required_without_sql(config_path):
    with pytest.raises(SystemExit):
        main(["--config", config_path])


def test_batch_run_jsonl(spark, config_path, tmp_path):
    """Batch replay of a JSONL log through the CLI path writes routed
    + passthrough tables. Uses the already-running test session (the
    CLI's get_spark getOrCreate reuses it)."""
    from hermod_spark.sources.mqtt import write_message_log

    log = write_message_log(
        str(tmp_path / "log.jsonl"),
        [
            {"topic": "sensors/a", "payload": "x"},
            {"topic": "other", "payload": "y"},
        ],
    )
    out = tmp_path / "out"
    rc = main(["--config", config_path, "--source", log, "--out", str(out)])
    assert rc == 0
    assert spark.read.parquet(str(out / "sensor_raw")).count() == 1
    assert spark.read.parquet(str(out / "iot_raw")).count() == 1


def test_is_spool_detection(tmp_path):
    from hermod_spark.__main__ import _is_spool

    assert _is_spool("log.jsonl")
    assert _is_spool("archive/log.jsonl.gz")
    d = tmp_path / "shards"
    d.mkdir()
    assert not _is_spool(str(d))  # empty dir: not a spool
    (d / "shard-0000.jsonl").write_text("{}\n")
    assert _is_spool(str(d))
    p = tmp_path / "pq"
    p.mkdir()
    (p / "part-0.parquet").write_text("")
    assert not _is_spool(str(p))


def test_batch_run_sharded_spool_dir(spark, config_path, tmp_path):
    """r11: --source pointing at a SHARDED spool directory (gz + plain
    mix) replays through mqtt_replay, not the parquet branch."""
    import gzip
    import json

    d = tmp_path / "spool_dir"
    d.mkdir()
    (d / "shard-0000.jsonl").write_text(
        json.dumps({"topic": "sensors/a", "payload": "x"}) + "\n"
    )
    with gzip.open(d / "shard-0001.jsonl.gz", "wt") as fh:
        fh.write(json.dumps({"topic": "other", "payload": "y"}) + "\n")
    out = tmp_path / "out_sh"
    rc = main(["--config", config_path, "--source", str(d), "--out", str(out)])
    assert rc == 0
    assert spark.read.parquet(str(out / "sensor_raw")).count() == 1
    assert spark.read.parquet(str(out / "iot_raw")).count() == 1


def test_batch_run_with_quarantine_flag(spark, config_path, tmp_path):
    """--quarantine: a structurally broken message lands raw+reason in
    _quarantine through the CLI path; valid ones route as usual."""
    import json

    log = tmp_path / "mixed.jsonl"
    t = 1704110400.0  # 2024-01-01T12:00:00Z
    log.write_text(
        json.dumps(
            {"time": t, "topic": "sensors/a", "payload": '{"v": 1}'}
        ) + "\n"
        + json.dumps({"time": t, "topic": "", "payload": '{"v": 2}'}) + "\n"
    )
    out = tmp_path / "out_q"
    rc = main(
        ["--config", config_path, "--source", str(log), "--out", str(out),
         "--quarantine"]
    )
    assert rc == 0
    q = spark.read.parquet(str(out / "_quarantine"))
    assert q.count() == 1
    assert q.collect()[0]["reason"] == "empty_topic"
    assert spark.read.parquet(str(out / "sensor_raw")).count() == 1
