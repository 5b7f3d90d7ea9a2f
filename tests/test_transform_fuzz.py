"""Fuzz the xf-new envelope: arbitrary payloads (unicode, nested JSON,
junk) must never crash the job; contract invariants hold on every
input. One poisoned message killing a 100 TB run is the failure mode
this guards against."""

from __future__ import annotations

import datetime as dt
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from hermod_spark.operators.transforms import record_transform

UTC = dt.timezone.utc
T0 = dt.datetime(2024, 1, 1, tzinfo=UTC)

json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-1e6, 1e6),
    st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=20),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.text(max_size=8), children, max_size=3),
    ),
    max_leaves=8,
)
payloads = st.one_of(
    st.text(max_size=40),  # junk / unicode
    json_values.map(lambda v: json.dumps(v)),
    st.none(),
)


@settings(max_examples=15, deadline=None)
@given(batch=st.lists(payloads, min_size=1, max_size=8))
def test_envelope_never_crashes_and_honours_contract(spark, batch):
    df = spark.createDataFrame(
        [(T0, f"t/{i}", p) for i, p in enumerate(batch)],
        "time TIMESTAMP, topic STRING, payload STRING",
    )

    def fn(msg):
        # emit one record per dict payload carrying its key count, and
        # a column name that must be silently skipped
        if isinstance(msg["json"], dict):
            return [{"columns": {"n_keys": len(msg["json"]), "bad name": 1}}]
        return []

    rows = record_transform(df, fn, default_table="t").collect()
    expected = sum(
        1
        for p in batch
        if p is not None and _is_json_object(p)
    )
    assert len(rows) == expected
    for r in rows:
        assert r["table"] == "t"
        assert set(r["columns"]) == {"n_keys"}  # bad column silently skipped


def _is_json_object(p: str) -> bool:
    try:
        return isinstance(json.loads(p), dict)
    except (ValueError, TypeError):
        return False
