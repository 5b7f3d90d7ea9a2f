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
