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


# r5: the asinh-bucketed histogram must stay exact AND model-sized for
# PATHOLOGICAL value ranges — the case that OOM'd the raw floor(v/w)
# histogram design (a ±1e12 range at width=5 would have needed ~4e11
# uniform buckets; asinh's bounded range caps the index space by
# construction).
extreme_values = st.floats(
    min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), extreme_values),
        min_size=1,
        max_size=50,
    ),
)
def test_twopass_exact_on_pathological_ranges(spark, data):
    rows = [(i, g, v) for i, (g, v) in enumerate(data)]
    events = spark.createDataFrame(
        rows, "event_id LONG, event_type STRING, value DOUBLE"
    )
    exact = {r["event_type"]: r for r in R.value_quantiles(events).collect()}
    twop = {
        r["event_type"]: r for r in R.value_quantiles_twopass(events).collect()
    }
    assert set(exact) == set(twop)
    for g, e in exact.items():
        t = twop[g]
        for c in ("p50", "p90", "p99"):
            assert e[c] == t[c], (g, c, e[c], t[c])


def test_asinh_bucket_count_is_bounded(spark):
    """Direct check of the model-size claim: the full double range
    lands in ≤ max_buckets_per_group bucket indexes."""
    import math

    from pyspark.sql import functions as F

    mb = 32768
    k = mb / 1421.0
    # the extreme representable magnitudes map inside the bound (for
    # widths where value/width stays finite; a width small enough to
    # overflow the division collapses those values into the single
    # ±inf bucket — still monotonic, still bounded)
    for w in [5.0, 1e9]:
        top = math.floor(math.asinh(1.7e308 / w) * k)
        bot = math.floor(math.asinh(-1.7e308 / w) * k)
        assert top - bot + 1 <= mb, (w, top, bot)
    # and Spark's sign-split |v| bucketing agrees with math.asinh on a
    # spread of values INCLUDING the band where Spark's raw ASINH
    # cancels to -inf for negatives (log(x+sqrt(x²+1)) with
    # sqrt(x²+1) == |x| in double): the operator evaluates on |v| and
    # restores the sign, so no value ever hits the cancellation.
    vals = [0.0, 1e-300, 5.0, -5.0, 1e12, -1e12, -1e100, 1.7e308, -1.7e308]
    df = spark.createDataFrame([(v,) for v in vals], "v DOUBLE")
    mag = F.floor(F.asinh(F.abs(F.col("v")) / F.lit(5.0)) * F.lit(k)).cast("long")
    got = [
        r["b"]
        for r in df.select(
            F.when(F.col("v") < 0, -mag).otherwise(mag).alias("b")
        ).collect()
    ]
    sgn = lambda v: -1 if v < 0 else 1  # noqa: E731
    want = [sgn(v) * math.floor(math.asinh(abs(v) / 5.0) * k) for v in vals]
    assert got == want


def test_twopass_exact_across_asinh_cancellation_band(spark):
    """Explicit regression for the Spark ASINH -inf cancellation: data
    spanning BOTH sides of the negative band (values below -1.3e154,
    inside it, and small) must still produce exact quantiles."""
    vals = [
        -1.7e308, -1e200, -2e154, -1e120, -1e12, -6.8e7, -5.0,
        0.0, 3.0, 1e9, 2e200,
    ]
    rows = [(i, "a", v) for i, v in enumerate(vals)]
    events = spark.createDataFrame(
        rows, "event_id LONG, event_type STRING, value DOUBLE"
    )
    exact = R.value_quantiles(events).first()
    twop = R.value_quantiles_twopass(events).first()
    for c in ("p50", "p90", "p99"):
        assert exact[c] == twop[c], (c, exact[c], twop[c])
