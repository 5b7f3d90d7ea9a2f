"""Property tests for the r6 operators: shard-shuffle permutation,
Z-order round-trip, Bloom no-false-negatives — randomized inputs, the
invariants that must hold for ANY data."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hermod_spark.operators import curation as CUR

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1,
                 max_size=60, unique=True),
    n_shards=st.integers(min_value=1, max_value=6),
    seed=st.sampled_from(["s0", "s1", "zz"]),
)
@_settings
def test_shard_shuffle_is_a_permutation(spark, ids, n_shards, seed):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id INT")
    rows = CUR.shard_shuffle(df, n_shards=n_shards, seed=seed).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(ids)
    per_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < n_shards
        per_shard.setdefault(r["shard"], []).append(r["pos"])
    for ps in per_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


@given(
    pts=st.lists(
        st.tuples(st.integers(min_value=0, max_value=65535),
                  st.integers(min_value=0, max_value=65535)),
        min_size=1, max_size=40, unique=True,
    )
)
@_settings
def test_zorder_roundtrips_through_deinterleave(spark, pts):
    from hermod_spark.sinks.compaction import zorder_key

    df = spark.createDataFrame(pts, "x INT, y INT")
    rows = df.withColumn("z", zorder_key("x", "y")).collect()

    def deinterleave(z):
        x = y = 0
        for b in range(16):
            x |= ((z >> (2 * b)) & 1) << b
            y |= ((z >> (2 * b + 1)) & 1) << b
        return x, y

    for r in rows:
        assert deinterleave(r["z"]) == (r["x"], r["y"])


@given(
    n=st.integers(min_value=5, max_value=80),
    n_probe=st.integers(min_value=1, max_value=20),
    salt=st.sampled_from(["", "q", "xy"]),
)
@_settings
def test_bloom_never_misses_a_probe(spark, n, n_probe, salt):
    from hermod_spark.operators.sketches import bloom_decontaminate

    n_probe = min(n_probe, n)
    corpus = spark.createDataFrame(
        [(i, f"{salt}doc-{i}") for i in range(n)], "doc_id INT, text STRING"
    )
    probes = corpus.filter(F.col("doc_id") < n_probe)
    rows = bloom_decontaminate(
        corpus, probes, key=F.md5("text"), probe_key=F.md5("text")
    ).collect()
    for r in rows:
        if r["exact_hit"]:
            assert r["bloom_hit"]
        assert r["false_positive"] == (r["bloom_hit"] and not r["exact_hit"])
