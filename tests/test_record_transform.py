"""xf-new / xf-legacy envelope conformance (reference: internal/router/
router.go:248-341 contract; internal/pipeline/pipeline.go:33-68;
internal/router/integration_test.go:11-373)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql.utils import PythonException

from hermod_spark.operators.transforms import (
    TransformError,
    legacy_transform,
    record_transform,
)
from hermod_spark.plans.schema import Schema

UTC = dt.timezone.utc
T0 = dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=UTC)


def _msgs(spark, rows):
    return spark.createDataFrame(rows, "time TIMESTAMP, topic STRING, payload STRING")


def test_zero_one_n_records(spark):
    df = _msgs(
        spark,
        [
            (T0, "a", "not json"),  # 0 records
            (T0, "b", '{"v": 1}'),  # 1 record
            (T0, "c", '{"v": 99}'),  # 2 records
        ],
    )

    def fn(msg):
        if msg["json"] is None:
            return []
        recs = [{"columns": {"v": msg["json"]["v"]}}]
        if msg["json"]["v"] > 50:
            recs.append({"table": "hot", "columns": {"v": msg["json"]["v"]}})
        return recs

    rows = record_transform(df, fn, default_table="dflt").collect()
    tables = sorted(r["table"] for r in rows)
    assert tables == ["dflt", "dflt", "hot"]


def test_missing_table_gets_default(spark):
    df = _msgs(spark, [(T0, "t", "{}")])
    out = record_transform(
        df, lambda m: [{"columns": {"a": 1}}], default_table="my_default"
    ).first()
    assert out["table"] == "my_default"


def test_invalid_column_names_silently_skipped(spark):
    # router.go:330-332
    df = _msgs(spark, [(T0, "t", "{}")])
    out = record_transform(
        df,
        lambda m: [{"columns": {"good_col": 1, "bad col": 2, "drop;me": 3}}],
        default_table="t",
    ).first()
    assert set(out["columns"]) == {"good_col"}


def test_msg_shape(spark):
    df = _msgs(spark, [(T0, "a/b", '{"x": 1.5}')])
    captured = record_transform(
        df,
        lambda m: [{"columns": {
            "topic": m["topic"],
            "ts": m["ts"],
            "x": m["json"]["x"],
            "raw": m["payload"],
        }}],
        default_table="t",
    ).first()["columns"]
    assert captured["topic"] == "a/b"
    assert captured["ts"].startswith("2024-01-01T12:00:00")
    assert captured["x"] == "1.5"
    assert captured["raw"] == '{"x": 1.5}'


def test_non_list_return_errors(spark):
    # router.go:291-305: non-table return is an error
    df = _msgs(spark, [(T0, "t", "{}")])
    with pytest.raises(PythonException, match="TransformError"):
        record_transform(df, lambda m: "not a list", default_table="t").collect()


def test_schema_validation_rejects_undeclared(spark):
    """An undeclared column drops THAT record and the job continues
    (router.go:230-237) — one poisoned row must not abort the run."""
    sch = Schema.declare({"t": {"ok": "text"}})
    df = _msgs(spark, [(T0, "a/b", "1"), (T0, "a/c", "2")])
    out = record_transform(
        df,
        lambda m: [
            {"columns": {"zzz": 1}},   # undeclared -> dropped
            {"columns": {"ok": m["payload"]}},
        ],
        default_table="t",
        schema=sch,
    ).collect()
    assert len(out) == 2  # one surviving record per message
    assert all(set(r["columns"]) == {"ok"} for r in out)


def test_value_stringification(spark):
    df = _msgs(spark, [(T0, "t", "{}")])
    cols = record_transform(
        df,
        lambda m: [{"columns": {"b": True, "f": 2.5, "i": 7, "s": "x", "j": {"a": [1]}}}],
        default_table="t",
    ).first()["columns"]
    assert cols == {"b": "true", "f": "2.5", "i": "7", "s": "x", "j": '{"a":[1]}'}


def test_legacy_merges_topic_and_falls_back(spark):
    # pipeline.go:37-53: JSON payload merged with topic; non-JSON ->
    # {topic, payload} fallback map
    df = _msgs(spark, [(T0, "top/ic", '{"temperature": 0}'), (T0, "t2", "raw")])

    def fn(data):
        return {"got_topic": data["topic"], "keys": " ".join(sorted(data))}

    rows = {r["columns"]["got_topic"]: r for r in legacy_transform(df, fn, table="iot").collect()}
    assert rows["top/ic"]["table"] == "iot"
    assert rows["top/ic"]["columns"]["keys"] == "temperature topic"
    assert rows["t2"]["columns"]["keys"] == "payload topic"


def test_legacy_c2f_golden(spark):
    # lua_test.go:108-125: 0 C -> 32 F through the legacy contract
    df = _msgs(spark, [(T0, "t", '{"temperature": 0}')])

    def fn(data):
        c = data["temperature"]
        return {"celsius": c, "fahrenheit": c * 9 / 5 + 32}

    cols = legacy_transform(df, fn, table="iot").first()["columns"]
    assert cols["celsius"] == "0" and cols["fahrenheit"] == "32.0"
