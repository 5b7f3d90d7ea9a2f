"""Transform conformance (reference: examples/transform.lua,
examples/multi_table.lua; goldens internal/lua/lua_test.go:108-125;
multi-table behavior internal/router/integration_test.go:151-373)."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from hermod_spark.operators import transforms as XF

UTC = dt.timezone.utc
T0 = dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=UTC)


def test_c2f_golden(spark):
    # lua_test.go:108-125: 0°C -> 32°F
    df = spark.createDataFrame([(0.0,), (100.0,), (-40.0,)], "temperature DOUBLE")
    rows = {
        r["temperature"]: r["f"]
        for r in df.select("temperature", XF.c2f("temperature").alias("f")).collect()
    }
    assert rows == {0.0: 32.0, 100.0: 212.0, -40.0: -40.0}


def test_celsius_transform_keeps_both(spark):
    df = spark.createDataFrame([(0.0,)], "temperature DOUBLE")
    row = XF.celsius_transform(df).first()
    assert row["temperature_celsius"] == 0.0
    assert row["temperature_fahrenheit"] == 32.0


def test_extract_sensor_id(spark):
    # multi_table.lua:30,38 — nil-match -> 'unknown'
    df = spark.createDataFrame(
        [("sensors/abc/temp",), ("other/x",), ("sensors//t",)], "topic STRING"
    )
    got = {
        r["topic"]: r["sid"]
        for r in df.select("topic", XF.extract_sensor_id("topic").alias("sid")).collect()
    }
    assert got == {"sensors/abc/temp": "abc", "other/x": "unknown", "sensors//t": "unknown"}


def test_with_default_chain(spark):
    # routing_transform.lua:24 — temperature or value or 0
    df = spark.createDataFrame(
        [(1.0, 10.0), (None, 10.0), (None, None)], "temperature DOUBLE, value DOUBLE"
    )
    got = [
        r["v"]
        for r in df.select(
            XF.with_default("temperature", "value", default=0.0).alias("v")
        ).collect()
    ]
    assert got == [1.0, 10.0, 0.0]


def test_copy_except(spark):
    df = spark.createDataFrame([(1, 2.0, "x")], "id INT, value DOUBLE, note STRING")
    out = XF.copy_except(df, ["value"], XF.c2f("value").alias("f"))
    assert out.columns == ["id", "note", "f"]
    assert out.first()["f"] == 35.6


def test_stamp_metadata(spark):
    df = spark.createDataFrame([(1,)], "id INT")
    before = int(time.time())
    row = XF.stamp_metadata(df).first()
    assert row["processed_by"] == "hermod"
    assert before - 5 <= row["processed_at"] <= int(time.time()) + 5


def _canonical(spark, rows):
    """Canonical message frame with parsed JSON fields, as multi_table
    expects (time, topic, json, temperature, humidity, battery, alert)."""
    return spark.createDataFrame(
        rows,
        "time TIMESTAMP, topic STRING, json STRING, temperature DOUBLE,"
        " humidity DOUBLE, battery DOUBLE, alert STRING",
    )


def test_multi_table_both_tables(spark):
    # integration_test.go:151-224: temp+alert message lands in both tables
    df = _canonical(
        spark, [(T0, "sensors/s1/data", '{"temperature":25.5,"alert":"hot"}', 25.5, None, None, "hot")]
    )
    out = XF.multi_table(df)
    readings = out["sensor_readings"].collect()
    events = out["sensor_events"].collect()
    assert len(readings) == 1 and len(events) == 1
    r = readings[0]
    assert r["sensor_id"] == "s1"
    assert r["temperature"] == 25.5
    assert r["humidity"] == 0.0  # default coalescing multi_table.lua:39-41
    assert r["battery"] == 100.0
    e = events[0]
    assert e["event_type"] == "alert" and e["sensor_id"] == "s1"


def test_multi_table_readings_only(spark):
    df = _canonical(spark, [(T0, "sensors/s2/data", '{"humidity":40}', None, 40.0, None, None)])
    out = XF.multi_table(df)
    assert out["sensor_readings"].count() == 1
    assert out["sensor_events"].count() == 0


def test_multi_table_non_json_emits_nothing(spark):
    # integration_test.go:286-373: msg.json nil -> empty record set
    df = _canonical(spark, [(T0, "sensors/s3/data", None, None, None, None, None)])
    out = XF.multi_table(df)
    assert out["sensor_readings"].count() == 0
    assert out["sensor_events"].count() == 0


def test_iot_metrics_value_fallback(spark):
    df = spark.createDataFrame(
        [
            (T0, "t/a", '{"temperature":1.5}', 1.5, None),
            (T0, "t/b", '{"value":7.0}', None, 7.0),
            (T0, "t/c", None, None, None),
        ],
        "time TIMESTAMP, topic STRING, json STRING, temperature DOUBLE, value DOUBLE",
    )
    rows = XF.iot_metrics(df).collect()
    got = {r["device"]: r["value"] for r in rows}
    assert got == {"t/a": 1.5, "t/b": 7.0}  # non-JSON row filtered out


def test_route_records_udtf_contract(spark):
    """UDTF form of the Lua row→0..N contract: unparseable JSON,
    non-dict payloads, non-numeric and boolean temperatures emit ZERO
    records (router.go:308-314 nil-json path); a numeric temperature
    emits exactly the C→F record (0°C → 32°F golden)."""
    from hermod_spark.operators.transforms import route_records_udtf

    spark.udtf.register("hr_test", route_records_udtf())
    df = spark.createDataFrame(
        [
            ("{broken",),
            ('"just a string"',),
            ('{"temperature": "cold"}',),
            ('{"temperature": true}',),
            (None,),
            ('{"temperature": 0}',),
            ('{"temperature": 100}',),
        ],
        "payload STRING",
    )
    df.createOrReplaceTempView("hr_probe")
    rows = sorted(
        (r["tbl"], r["temperature_c"], r["temperature_f"])
        for r in spark.sql(
            "SELECT t.* FROM hr_probe p, LATERAL hr_test(p.payload) t"
        ).collect()
    )
    assert rows == [("temps", 0.0, 32.0), ("temps", 100.0, 212.0)]
