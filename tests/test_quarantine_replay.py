"""Quarantine replay-after-fix e2e (VERDICT r8 #4): the dead-letter
promise is not just "bad rows are kept" but "kept FOR REPLAY" — after
an upstream fix, `_quarantine` rows re-enter the normal route pipeline
and the final tables are indistinguishable from a world where the
corruption never happened."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hermod_spark import config as C
from hermod_spark.engine import Engine

UTC = dt.timezone.utc

TOML = """
[[routes]]
filter = "sensors/temp/#"
script = "c2f"
table = "temps"

[[routes]]
filter = "sensors/#"
table = "sensor_raw"
"""


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
    return Engine(C.loads(TOML), transforms={"c2f": _c2f})


MSG_SCHEMA = "time TIMESTAMP, topic STRING, qos INT, retain BOOLEAN, payload STRING"


def _fixed_messages(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, tzinfo=UTC)
    return spark.createDataFrame(
        [
            (t0, "sensors/temp/a", 0, False, '{"temperature": 100}'),
            (t0, "sensors/temp/b", 0, False, '{"temperature": 0}'),
            (t0, "sensors/hum/c", 0, False, '{"humidity": 40}'),
            (t0, "other/topic", 0, False, '{"x": 1}'),
        ],
        MSG_SCHEMA,
    )


def _corrupt(df):
    """Deterministic upstream fault: a 'CORRUPT|' prefix glued onto
    some payloads makes them unparseable; the repair strips it."""
    return df.withColumn(
        "payload",
        F.when(
            F.col("topic").isin("sensors/temp/a", "other/topic"),
            F.concat(F.lit("CORRUPT|"), F.col("payload")),
        ).otherwise(F.col("payload")),
    )


def _tables(spark, base, names):
    out = {}
    for t in names:
        try:
            df = spark.read.parquet(f"{base}/{t}")
        except Exception:  # noqa: BLE001 - table never written
            out[t] = []
            continue
        out[t] = sorted(map(tuple, df.select(*sorted(df.columns)).collect()))
    return out


def test_replay_after_fix_matches_direct_ingest(spark, engine, tmp_path):
    """Corrupted ingest + repair + replay ≡ clean ingest: every route
    table byte-identical, and _quarantine drains to zero unreplayable
    rows."""
    fixed = _fixed_messages(spark)
    broken = _corrupt(fixed)
    out, clean = str(tmp_path / "out"), str(tmp_path / "clean")

    engine.run_batch(broken, base_path=out, quarantine=True)
    q1 = spark.read.parquet(f"{out}/_quarantine")
    assert q1.count() == 2  # the two prefixed payloads
    assert set(r["reason"] for r in q1.collect()) == {"bad_json"}

    # incident fixed: strip the prefix and replay the dead letters
    repair = lambda df: df.withColumn(  # noqa: E731
        "payload", F.regexp_replace("payload", r"^CORRUPT\|", "")
    )
    results = {
        r["table"]: r["n_rows"]
        for r in engine.replay_quarantine(q1, repair, base_path=out)
    }
    assert results["_quarantine"] == 0  # every row repaired
    assert results["temps"] == 1 and results["iot_raw"] == 1

    # parity with a world that never corrupted anything
    engine.run_batch(fixed, base_path=clean, quarantine=True)
    names = ("temps", "sensor_raw", "iot_raw")
    assert _tables(spark, out, names) == _tables(spark, clean, names)


def test_replay_is_not_a_validation_bypass(spark, engine, tmp_path):
    """Rows the repair does NOT fix go straight back to _quarantine —
    replay re-validates, never force-routes."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, tzinfo=UTC)
    msgs = spark.createDataFrame(
        [
            (t0, "sensors/temp/a", 0, False, "CORRUPT|{\"temperature\": 7}"),
            (t0, "sensors/temp/b", 0, False, "{forever broken"),
        ],
        MSG_SCHEMA,
    )
    out = str(tmp_path / "out")
    engine.run_batch(msgs, base_path=out, quarantine=True)
    q1 = spark.read.parquet(f"{out}/_quarantine")
    assert q1.count() == 2

    repair = lambda df: df.withColumn(  # noqa: E731
        "payload", F.regexp_replace("payload", r"^CORRUPT\|", "")
    )
    results = {
        r["table"]: r["n_rows"]
        for r in engine.replay_quarantine(q1, repair, base_path=out)
    }
    assert results["temps"] == 1
    assert results["_quarantine"] == 1  # the unrepairable row came back
    # and replaying the REMAINING dead letters again is a no-op cycle
    q2 = spark.read.parquet(f"{out}/_quarantine").filter(
        F.col("payload") == "{forever broken"
    )
    # first write + replay re-write of the same unrepairable row
    assert q2.count() == 2
