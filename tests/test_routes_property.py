"""Property-based routing conformance: for random route tables and
topics, the one-pass CASE labeling, the negation-chain branches, and a
pure-Python first-match scan must all agree."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hermod_spark.functions.topic import topic_matches_py
from hermod_spark.plans.routes import Route, RoutePlanner

segment = st.sampled_from(["a", "b", "+", "#", ""])
path = st.lists(segment, min_size=1, max_size=4).map("/".join)
routes_strategy = st.lists(path, min_size=0, max_size=5)
topics_strategy = st.lists(path, min_size=1, max_size=8)


def python_first_match(filters: list[str], topic: str) -> str:
    for i, f in enumerate(filters):
        if topic_matches_py(f, topic):
            return f"t{i}"
    return "iot_raw"


@settings(max_examples=25, deadline=None)
@given(filters=routes_strategy, topics=topics_strategy)
def test_label_matches_python_scan(spark, filters, topics):
    planner = RoutePlanner([Route(f, f"t{i}") for i, f in enumerate(filters)])
    df = spark.createDataFrame([(t,) for t in topics], "topic STRING")
    got = {r["topic"]: r["_table"] for r in planner.label(df).collect()}
    for t in set(topics):
        assert got[t] == python_first_match(filters, t), (filters, t)


@settings(max_examples=10, deadline=None)
@given(filters=routes_strategy, topics=topics_strategy)
def test_branches_agree_with_label(spark, filters, topics):
    planner = RoutePlanner([Route(f, f"t{i}") for i, f in enumerate(filters)])
    df = spark.createDataFrame([(t,) for t in set(topics)], "topic STRING")
    labeled = {r["topic"]: r["_table"] for r in planner.label(df).collect()}
    seen = {}
    for route, branch in planner.branches(df):
        table = route.table if route else planner.default_table
        for r in branch.collect():
            assert r["topic"] not in seen
            seen[r["topic"]] = table
    assert seen == labeled
