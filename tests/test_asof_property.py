"""Property-based as-of join conformance: the union+window encoding
must agree with pandas ``merge_asof`` (the de-facto reference
semantics for backward as-of) on random inputs."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from hermod_spark.operators.relational import asof_join

UTC = dt.timezone.utc
BASE = dt.datetime(2024, 1, 1, tzinfo=UTC)


rows_left = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=12
)
# right times are made unique per key (merge_asof picks the LAST of
# exactly-equal right rows — our contract dedups them first, so the
# property is stated over unique (key, time) right sides)
rows_right = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(0, 999)),
    min_size=1,
    max_size=12,
    unique_by=lambda r: (r[0], r[1]),
)


@settings(max_examples=25, deadline=None)
@given(left_rows=rows_left, right_rows=rows_right)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    left_pdf = pd.DataFrame(
        {
            "event_id": range(len(left_rows)),
            "user_id": [k for k, _ in left_rows],
            "ts": [BASE + dt.timedelta(minutes=m) for _, m in left_rows],
        }
    )
    right_pdf = pd.DataFrame(
        {
            "user_id": [k for k, _, _ in right_rows],
            "ts": [BASE + dt.timedelta(minutes=m) for _, m, _ in right_rows],
            "payload": [p for _, _, p in right_rows],
        }
    )

    left = spark.createDataFrame(left_pdf)
    right = spark.createDataFrame(right_pdf)
    got = {
        r["event_id"]: r["payload_asof"]
        for r in asof_join(
            left, right, key="user_id", time_left="ts", time_right="ts",
            right_cols=["payload"],
        ).collect()
    }

    expected = pd.merge_asof(
        left_pdf.sort_values("ts", kind="stable"),
        right_pdf.sort_values("ts", kind="stable"),
        on="ts",
        by="user_id",
        direction="backward",
    )
    for _, row in expected.iterrows():
        want = None if pd.isna(row["payload"]) else int(row["payload"])
        assert got[row["event_id"]] == want, (left_rows, right_rows, row["event_id"])


@settings(max_examples=15, deadline=None)
@given(left_rows=rows_left, right_rows=rows_right)
def test_asof_forward_and_nearest_match_pandas(spark, left_rows, right_rows):
    """The forward and nearest directions must agree with pandas
    merge_asof on random inputs (pandas breaks exact nearest-ties
    backward — verified convention, mirrored in the operator)."""
    left_pdf = pd.DataFrame(
        {
            "event_id": range(len(left_rows)),
            "user_id": [k for k, _ in left_rows],
            "ts": [BASE + dt.timedelta(minutes=m) for _, m in left_rows],
        }
    )
    right_pdf = pd.DataFrame(
        {
            "user_id": [k for k, _, _ in right_rows],
            "ts": [BASE + dt.timedelta(minutes=m) for _, m, _ in right_rows],
            "payload": [p for _, _, p in right_rows],
        }
    )
    left = spark.createDataFrame(left_pdf)
    right = spark.createDataFrame(right_pdf)
    for direction in ("forward", "nearest"):
        got = {
            r["event_id"]: r["payload_asof"]
            for r in asof_join(
                left, right, key="user_id", time_left="ts", time_right="ts",
                right_cols=["payload"], direction=direction,
            ).collect()
        }
        expected = pd.merge_asof(
            left_pdf.sort_values("ts", kind="stable"),
            right_pdf.sort_values("ts", kind="stable"),
            on="ts",
            by="user_id",
            direction=direction,
        )
        for _, row in expected.iterrows():
            want = None if pd.isna(row["payload"]) else int(row["payload"])
            assert got[row["event_id"]] == want, (
                direction, left_rows, right_rows, row["event_id"],
            )


@settings(max_examples=15, deadline=None)
@given(left_rows=rows_left, right_rows=rows_right)
def test_asof_tolerance_matches_pandas(spark, left_rows, right_rows):
    """All three directions with a tolerance window must agree with
    pandas merge_asof(tolerance=...), including keys that only have a
    match on ONE side (the r8 null-safety regression)."""
    left_pdf = pd.DataFrame(
        {
            "event_id": range(len(left_rows)),
            "user_id": [k for k, _ in left_rows],
            "ts": [BASE + dt.timedelta(minutes=m) for _, m in left_rows],
        }
    )
    right_pdf = pd.DataFrame(
        {
            "user_id": [k for k, _, _ in right_rows],
            "ts": [BASE + dt.timedelta(minutes=m) for _, m, _ in right_rows],
            "payload": [p for _, _, p in right_rows],
        }
    )
    left = spark.createDataFrame(left_pdf)
    right = spark.createDataFrame(right_pdf)
    for direction in ("backward", "forward", "nearest"):
        got = {
            r["event_id"]: r["payload_asof"]
            for r in asof_join(
                left, right, key="user_id", time_left="ts", time_right="ts",
                right_cols=["payload"], direction=direction,
                tolerance="17 minutes",
            ).collect()
        }
        expected = pd.merge_asof(
            left_pdf.sort_values("ts", kind="stable"),
            right_pdf.sort_values("ts", kind="stable"),
            on="ts",
            by="user_id",
            direction=direction,
            tolerance=pd.Timedelta(minutes=17),
        )
        for _, row in expected.iterrows():
            want = None if pd.isna(row["payload"]) else int(row["payload"])
            assert got[row["event_id"]] == want, (
                direction, left_rows, right_rows, row["event_id"],
            )


def test_asof_null_value_in_nearest_row_is_served(spark):
    """pandas merge_asof contract: the NEAREST row's value is served
    even when that value is NULL — per-column last(ignorenulls) used
    to skip it and serve a STALER row's value while reporting the
    nearest row's time (under tolerance, an arbitrarily old value
    gated by the wrong timestamp)."""
    import datetime as _dt

    t = lambda m: _dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [("k", t(3))], "key STRING, lt TIMESTAMP"
    )
    right = spark.createDataFrame(
        [("k", t(1), 5.0), ("k", t(2), None)],
        "key STRING, rt TIMESTAMP, v DOUBLE",
    )
    got = asof_join(
        left, right, key="key", time_left="lt", time_right="rt",
        right_cols=["v"],
    ).collect()
    assert len(got) == 1 and got[0]["v_asof"] is None  # nearest row (t=2)
    # pandas agrees
    pd_got = pd.merge_asof(
        left.toPandas().sort_values("lt"),
        right.toPandas().sort_values("rt"),
        left_on="lt", right_on="rt", by="key",
    )
    assert pd_got["v"].isna().all()
