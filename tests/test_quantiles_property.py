"""Property test: the scale-safe two-pass exact quantile must equal the
single-window exact form on ARBITRARY data — values of any sign/scale,
ties, tiny groups, any bucket width. Example count is kept small
(Spark round-trips are ~1s each); the generator is seeded by Hypothesis
so failures replay deterministically."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hermod_spark.operators import relational as R

values = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), values), min_size=1, max_size=60
    ),
    width=st.sampled_from([0.7, 5.0, 123.0]),
)
def test_twopass_equals_exact(spark, data, width):
    rows = [(i, g, v) for i, (g, v) in enumerate(data)]
    events = spark.createDataFrame(
        rows, "event_id LONG, event_type STRING, value DOUBLE"
    )
    exact = {r["event_type"]: r for r in R.value_quantiles(events).collect()}
    twop = {
        r["event_type"]: r
        for r in R.value_quantiles_twopass(events, width=width).collect()
    }
    assert set(exact) == set(twop)
    for g in exact:
        for c in ("p50", "p90", "p99"):
            assert exact[g][c] == twop[g][c], (g, c, width)
