"""Route planner conformance: passthrough record format
(reference: internal/router/router_test.go:38-86), dispatch + fallback
(router_test.go:104-177), and first-match-wins shadowing semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hermod_spark.plans.routes import DEFAULT_TABLE, Route, RoutePlanner, passthrough_record
from hermod_spark.plans.schema import IdentifierError

UTC = dt.timezone.utc


def _messages(spark, rows):
    return spark.createDataFrame(
        rows, "time TIMESTAMP, topic STRING, qos INT, retain BOOLEAN, payload STRING"
    )


def test_passthrough_record_format(spark):
    # router_test.go:38-86
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=UTC)
    df = _messages(
        spark,
        [
            (t0, "test/topic", 1, True, '{"temperature": 25.5}'),
            (t0, "test/topic", 0, False, "not json"),
        ],
    )
    rows = passthrough_record(df).orderBy("qos").collect()
    assert [r["topic"] for r in rows] == ["test/topic"] * 2
    bad, good = rows
    assert good["qos"] == 1 and good["retain"] is True
    assert good["raw"] == '{"temperature": 25.5}'
    assert good["json"] is not None  # valid JSON populated
    assert bad["json"] is None  # non-JSON -> null
    assert bad["raw"] == "not json"
    assert set(passthrough_record(df).columns) == {
        "time", "topic", "qos", "retain", "raw", "json",
    }


def test_dispatch_first_match(spark):
    # router_test.go:104-145: matched topic -> route table
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    df = _messages(spark, [(t0, "sensors/temp1", 1, False, "test")])
    planner = RoutePlanner([Route("sensors/+", "sensor_data")])
    row = planner.label(df).first()
    assert row["_table"] == "sensor_data"


def test_dispatch_passthrough_fallback(spark):
    # router_test.go:147-177: no matching route -> iot_raw
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    df = _messages(spark, [(t0, "unmatched/topic", 0, False, "test data")])
    planner = RoutePlanner([])
    assert planner.label(df).first()["_table"] == DEFAULT_TABLE == "iot_raw"


def test_first_match_wins_shadowing(spark):
    """Config order is priority: an earlier broad filter shadows a later
    specific one (router.go:344-363 linear scan)."""
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    df = _messages(
        spark,
        [
            (t0, "sensors/error/5", 0, False, "x"),  # matches both routes
            (t0, "sensors/temp/5", 0, False, "x"),  # matches only second
            (t0, "other", 0, False, "x"),  # matches none
        ],
    )
    planner = RoutePlanner(
        [Route("sensors/error/#", "error_events"), Route("sensors/+/5", "user5")]
    )
    got = {r["topic"]: r["_table"] for r in planner.label(df).collect()}
    assert got == {
        "sensors/error/5": "error_events",
        "sensors/temp/5": "user5",
        "other": "iot_raw",
    }


def test_branches_partition_the_input(spark):
    """branches() must form a disjoint cover: every row lands in exactly
    one branch, and branch labels agree with label()."""
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    topics = ["sensors/error/5", "sensors/a/5", "sensors/error/x", "z", "sensors/signup/1"]
    df = _messages(spark, [(t0, t, 0, False, "p") for t in topics])
    planner = RoutePlanner(
        [
            Route("sensors/error/#", "error_events"),
            Route("sensors/+/5", "user5"),
            Route("sensors/signup/#", "signups"),
        ]
    )
    seen: dict[str, str] = {}
    for route, branch in planner.branches(df):
        table = route.table if route else planner.default_table
        for r in branch.select("topic").collect():
            assert r["topic"] not in seen, "row in two branches"
            seen[r["topic"]] = table
    labeled = {r["topic"]: r["_table"] for r in planner.label(df).collect()}
    assert seen == labeled
    assert len(seen) == len(topics)


def test_route_table_identifier_gate():
    with pytest.raises(IdentifierError):
        Route("a/#", "users; DROP TABLE students")


def test_apply_uses_transform(spark):
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    df = _messages(spark, [(t0, "sensors/t/1", 0, False, '{"v": 1}')])
    planner = RoutePlanner(
        [Route("sensors/#", "t1", transform=lambda d: d.select("topic"))]
    )
    planned = dict(planner.apply(df))
    assert planned["t1"].columns == ["topic"]
    assert set(planned["iot_raw"].columns) == {"time", "topic", "qos", "retain", "raw", "json"}


def test_label_with_quarantine_first_match_reasons(spark):
    """Dead-letter routing: invalid records keep every byte and get a
    first-match reason; valid records route exactly as label() does."""
    import datetime as dt

    from pyspark.sql import functions as F

    from hermod_spark.plans.routes import QUARANTINE_TABLE, Route, RoutePlanner

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        (t0, "sensors/temp/a", '{"v": 1}'),      # valid -> temps
        (t0, "sensors/temp/a", None),             # null_payload
        (t0, "sensors/temp/a", "{broken"),        # bad_json
        (t0, "", '{"v": 1}'),                     # empty_topic
        (None, "sensors/temp/a", '{"v": 1}'),     # null_time
        (None, "", "{broken"),                    # bad_json wins (order)
    ]
    df = spark.createDataFrame(rows, "time TIMESTAMP, topic STRING, payload STRING")
    planner = RoutePlanner([Route("sensors/temp/#", "temps")])
    out = planner.label_with_quarantine(df).collect()
    got = [(r["_table"], r["_reason"]) for r in out]
    assert got == [
        ("temps", None),
        (QUARANTINE_TABLE, "null_payload"),
        (QUARANTINE_TABLE, "bad_json"),
        (QUARANTINE_TABLE, "empty_topic"),
        (QUARANTINE_TABLE, "null_time"),
        (QUARANTINE_TABLE, "bad_json"),
    ]
    # nothing dropped, all source columns preserved for replay
    assert len(out) == len(rows)
    assert {"time", "topic", "payload"} <= set(out[0].asDict())
