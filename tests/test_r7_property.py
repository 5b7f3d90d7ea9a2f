"""Property tests for the r7 hardening items (VERDICT r6 #7):
snapshot_diff under id churn / one-sided sources, Z-order locality
(adjacent Morton keys stay in bounded quads), and exact-span dedup
coverage invariants."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hermod_spark.operators import curation as CUR
from hermod_spark.operators import dedup

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    texts=st.lists(
        st.sampled_from(["alpha text", "beta content", "gamma words", "delta"]),
        min_size=1, max_size=12,
    ),
    shift=st.integers(min_value=1, max_value=1000),
)
@_settings
def test_snapshot_diff_id_churn_is_all_carried(spark, texts, shift):
    """Re-crawling identical content under brand-new doc_ids must report
    everything carried — content identity, not id identity."""
    old = spark.createDataFrame(
        [(i, t, "src") for i, t in enumerate(texts)],
        "doc_id INT, text STRING, source STRING",
    )
    new = spark.createDataFrame(
        [(i + shift, t, "src") for i, t in enumerate(texts)],
        "doc_id INT, text STRING, source STRING",
    )
    rows = CUR.snapshot_diff(old, new).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["added"] == 0 and r["removed"] == 0
    assert r["carried"] == len(set(texts))


def test_snapshot_diff_one_sided_sources(spark):
    """A source present only in the new snapshot is pure `added`; one
    present only in the old is pure `removed`; counts are DISTINCT
    contents per side."""
    old = spark.createDataFrame(
        [(1, "a", "gone"), (2, "a", "gone"), (3, "b", "gone")],
        "doc_id INT, text STRING, source STRING",
    )
    new = spark.createDataFrame(
        [(9, "x", "fresh"), (10, "y", "fresh"), (11, "y", "fresh")],
        "doc_id INT, text STRING, source STRING",
    )
    got = {r["source"]: r for r in CUR.snapshot_diff(old, new).collect()}
    assert got["gone"]["removed"] == 2 and got["gone"]["added"] == 0
    assert got["gone"]["carried"] == 0
    assert got["fresh"]["added"] == 2 and got["fresh"]["removed"] == 0
    assert got["fresh"]["carried"] == 0


@given(
    texts_old=st.lists(st.sampled_from(["p q", "r s", "t u", "v w"]),
                       min_size=0, max_size=8),
    texts_new=st.lists(st.sampled_from(["p q", "r s", "t u", "x y"]),
                       min_size=0, max_size=8),
)
@_settings
def test_snapshot_diff_partition_identity(spark, texts_old, texts_new):
    """added + carried == |distinct new|, removed + carried ==
    |distinct old| — the diff partitions each side exactly."""
    if not texts_old and not texts_new:
        return
    mk = lambda ts: spark.createDataFrame(  # noqa: E731
        [(i, t, "s") for i, t in enumerate(ts)],
        "doc_id INT, text STRING, source STRING",
    )
    rows = CUR.snapshot_diff(mk(texts_old), mk(texts_new)).collect()
    r = rows[0] if rows else {"added": 0, "removed": 0, "carried": 0}
    assert r["added"] + r["carried"] == len(set(texts_new))
    assert r["removed"] + r["carried"] == len(set(texts_old))


def test_zorder_adjacent_keys_form_bounded_quads(spark):
    """The locality claim behind `rel_zorder` pinned exactly: over the
    full 8x8 grid sorted by Morton key, every ALIGNED run of 4
    consecutive keys is a 2x2 square and every aligned run of 16 is a
    4x4 square — so a file cut every K keys covers a quad whose side is
    ~sqrt(K), which is what lets min/max stats prune 2-D range
    predicates."""
    from hermod_spark.sinks.compaction import zorder_key

    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, "x INT, y INT")
    rows = df.select("x", "y", zorder_key("x", "y", bits=3).alias("z")).collect()
    by_z = sorted(rows, key=lambda r: r["z"])
    assert [r["z"] for r in by_z] == list(range(64))  # bijective on the grid
    for block, side in ((4, 1), (16, 3)):
        for lo in range(0, 64, block):
            grp = by_z[lo : lo + block]
            xs = [r["x"] for r in grp]
            ys = [r["y"] for r in grp]
            assert max(xs) - min(xs) <= side and max(ys) - min(ys) <= side


@given(
    words=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=30),
    n=st.integers(min_value=2, max_value=4),
)
@_settings
def test_dup_span_stats_fraction_bounds(spark, words, n):
    """dup_frac in [0, 1]; dup_tokens never exceeds n_tokens; spans
    (disjoint, merged) cover exactly dup_tokens positions."""
    text = " ".join(words)
    df = spark.createDataFrame([(1, text), (2, "unrelated filler")],
                               "doc_id INT, text STRING")
    stats = {r["doc_id"]: r for r in dedup.dup_span_stats(df, n=n).collect()}
    spans = [
        (r["span_start"], r["span_end"])
        for r in dedup.duplicated_spans(df, n=n).collect()
        if r["doc_id"] == 1
    ]
    s1 = stats[1]
    assert 0.0 <= s1["dup_frac"] <= 1.0
    assert s1["dup_tokens"] <= s1["n_tokens"]
    covered = sum(e - s + 1 for s, e in spans)
    assert covered == s1["dup_tokens"]
    # spans are disjoint and non-adjacent after the merge
    spans.sort()
    for (s_a, e_a), (s_b, _) in zip(spans, spans[1:]):
        assert s_b > e_a + 1


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  allow_infinity=False, width=64),
        min_size=1, max_size=60,
    ),
    n_slices=st.integers(min_value=1, max_value=5),
    n_bins=st.integers(min_value=1, max_value=16),
)
@_settings
def test_hist_quantile_merge_property(spark, vals, n_slices, n_bins):
    """For ANY value set, slice assignment, and bin count: the merged
    per-slice histogram equals the direct one, and every quantile
    estimate lands within one bin width of the exact order statistic."""
    import datetime as _dt

    from hermod_spark.operators.sketches import hist_quantile_merge_check

    rows = [
        ("k", i, float(v), _dt.datetime(2024, 1, 1 + (i % n_slices), 8))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_type STRING, event_id INT, value DOUBLE, ts TIMESTAMP"
    )
    out = hist_quantile_merge_check(
        df, "event_type", "value", "event_id",
        F.date_trunc("day", "ts"), n_bins=n_bins, probs=(0.1, 0.5, 0.99),
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r["merge_exact"] is True, r
        assert r["err_bounded"] is True, r


@given(
    users=st.lists(st.integers(min_value=0, max_value=500),
                   min_size=1, max_size=80),
    n_slices=st.integers(min_value=1, max_value=4),
)
@_settings
def test_cm_bloom_merge_property(spark, users, n_slices):
    """Count-min cell-sum and Bloom bit-OR merges are exact for any
    data and any slicing."""
    import datetime as _dt

    from hermod_spark.operators.sketches import (
        bloom_merge_check, cm_merge_check,
    )

    rows = [
        (u, _dt.datetime(2024, 1, 1 + (i % n_slices), 8))
        for i, u in enumerate(users)
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP")
    part = F.date_trunc("day", "ts")
    for r in cm_merge_check(df, "user_id", part, depth=2, width=64).collect():
        assert r["merge_exact"] is True
        assert r["merged_total"] == r["direct_total"] == len(rows)
    b = bloom_merge_check(df, "user_id", part, k=2, m=256).collect()[0]
    assert b["merge_exact"] is True and b["merged_bits"] == b["direct_bits"]
