"""Topic-filter conformance: the reference's 10-case truth table
(reference: internal/router/router_test.go:9-36) plus the edge cases the
matcher impl (router.go:422-448) implies, run both through the pure-
Python helper and the compiled Spark Column predicate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hermod_spark.functions.topic import (
    topic_filter_to_regex,
    topic_matches,
    topic_matches_py,
)

# (filter, topic, matches) — verbatim from router_test.go:9-36
TRUTH_TABLE = [
    ("ruuvi/sensor1", "ruuvi/sensor1", True),  # exact match
    ("#", "any/topic/here", True),  # wildcard #
    ("ruuvi/+", "ruuvi/sensor1", True),  # single level +
    ("ruuvi/+", "ruuvi/sensor1/data", False),  # single level + no match
    ("ruuvi/#", "ruuvi/sensor1/data", True),  # multi level #
    ("ruuvi/+/#", "ruuvi/sensor1/data/temp", True),  # multi level # at end
    ("ruuvi/+", "p1ib/sensor1", False),  # no match different prefix
    ("ruuvi/+/data", "ruuvi//data", True),  # + matches empty
    ("devices/+/telemetry", "devices/sensor123/telemetry", True),
    ("devices/+/telemetry", "devices/sensor123/status", False),
]

# Edge cases pinned by the matcher implementation (router.go:422-448)
EDGE_CASES = [
    ("ruuvi/#", "ruuvi", True),  # trailing # matches the parent level
    ("ruuvi/+", "ruuvi", False),  # + needs the level to exist
    ("a/#/b", "a/#/b", True),  # equality fast path beats structure
    ("a/#/b", "a/x/b", False),  # non-final # never matches structurally
    ("#", "", True),  # '#' matches everything, even empty
    ("sensors/+/5", "sensors/error/5", True),
    ("sensors/error/#", "sensors/error/5", True),
    ("+", "one", True),
    ("+", "one/two", False),
    ("a.b/+", "a.b/c", True),  # regex metachars in segments are escaped
    ("a.b/+", "axb/c", False),
]

ALL_CASES = TRUTH_TABLE + EDGE_CASES


@pytest.mark.parametrize("filt,topic,want", ALL_CASES)
def test_topic_matches_py(filt, topic, want):
    assert topic_matches_py(filt, topic) is want


def test_topic_matches_spark(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (_, t, _) in enumerate(ALL_CASES)], "i INT, topic STRING"
    )
    cols = [
        topic_matches(f, "topic").alias(f"m{i}") for i, (f, _, _) in enumerate(ALL_CASES)
    ]
    rows = {r["i"]: r for r in df.select("i", *cols).collect()}
    for i, (filt, topic, want) in enumerate(ALL_CASES):
        assert rows[i][f"m{i}"] is want, (filt, topic, want)


def test_regex_is_anchored():
    rx = topic_filter_to_regex("ruuvi/+")
    assert rx.startswith("^") and rx.endswith("$")


def test_predicate_is_native_no_udf(spark):
    """The compiled predicate must stay JVM-side (no BatchEvalPython)."""
    df = spark.createDataFrame([("a/b",)], "topic STRING")
    plan = (
        df.filter(topic_matches("sensors/+", "topic"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
