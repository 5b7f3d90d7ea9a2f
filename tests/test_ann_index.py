"""Persisted ANN band index: save / extend / incremental KNN serve.

The gate from VERDICT r12 next-round #2: the incremental serve equals
the full knn_join rebuild on (corpus ∪ snapshot) bit-for-bit, extend
is crash-safe and idempotent, and the serve never re-bands the corpus.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hermod_spark.operators.similarity import (
    extend_ann_index,
    knn_join,
    knn_join_incremental,
    load_ann_index,
    save_ann_index,
)

SF = "/root/testdata/sf0.001"
DIM = 64


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _full_filtered(emb, snap_pred, **kw):
    return _rows(
        knn_join(emb, k=5, n_planes=4, n_bands=4, dim=DIM, **kw).filter(
            snap_pred
        )
    )


def test_incremental_equals_full_rebuild(spark, tmp_path):
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 10 != 7)
    snap = emb.filter(F.col("vec_id") % 10 == 7)
    path = str(tmp_path / "ann")
    save_ann_index(corpus, path, n_planes=4, n_bands=4, dim=DIM)
    idx = load_ann_index(spark, path)
    got = _rows(knn_join_incremental(snap, idx, k=5))
    want = _full_filtered(emb, F.col("query_id") % 10 == 7)
    assert got == want and len(want) > 0

    # max_bucket counts over the UNION band table, like knn_join
    got_c = _rows(knn_join_incremental(snap, idx, k=5, max_bucket=40))
    want_c = _full_filtered(
        emb, F.col("query_id") % 10 == 7, max_bucket=40
    )
    assert got_c == want_c
    assert got_c != got  # the cap actually bit on this corpus


def test_extend_then_serve_and_idempotency(spark, tmp_path):
    emb = _emb(spark)
    part_a = emb.filter(F.col("vec_id") % 10 < 5)
    part_b = emb.filter((F.col("vec_id") % 10 >= 5) & (F.col("vec_id") % 10 != 7))
    snap = emb.filter(F.col("vec_id") % 10 == 7)
    path = str(tmp_path / "ann")
    save_ann_index(part_a, path, n_planes=4, n_bands=4, dim=DIM)
    n = extend_ann_index(part_b, path)
    assert n == part_b.count()
    # redelivery admits nothing
    assert extend_ann_index(part_b, path) == 0
    idx = load_ann_index(spark, path)
    assert len(idx["meta"]["generations"]) == 2
    got = _rows(knn_join_incremental(snap, idx, k=5))
    assert got == _full_filtered(emb, F.col("query_id") % 10 == 7)
    # serve drops snapshot rows already indexed (corpus redelivery)
    got2 = _rows(knn_join_incremental(snap.unionByName(part_a), idx, k=5))
    assert got2 == got


def test_extend_crash_window(spark, tmp_path):
    emb = _emb(spark)
    part_a = emb.filter(F.col("vec_id") % 10 < 5)
    part_b = emb.filter((F.col("vec_id") % 10 >= 5) & (F.col("vec_id") % 10 != 7))
    snap = emb.filter(F.col("vec_id") % 10 == 7)
    path = str(tmp_path / "ann")
    save_ann_index(part_a, path, n_planes=4, n_bands=4, dim=DIM)
    before = _rows(
        knn_join_incremental(snap, load_ann_index(spark, path), k=5)
    )
    with pytest.raises(RuntimeError, match="boom"):
        extend_ann_index(
            part_b, path,
            on_before_commit=lambda seq: (_ for _ in ()).throw(
                RuntimeError("boom")
            ),
        )
    idx = load_ann_index(spark, path)
    assert idx["meta"]["generations"] == ["gen-000000000"]
    assert _rows(knn_join_incremental(snap, idx, k=5)) == before
    # redelivery heals: full snapshot admits, final state = never-crashed
    assert extend_ann_index(part_b, path) == part_b.count()
    got = _rows(
        knn_join_incremental(snap, load_ann_index(spark, path), k=5)
    )
    assert got == _full_filtered(emb, F.col("query_id") % 10 == 7)
    # build over a committed index refuses
    with pytest.raises(IOError, match="already has committed"):
        save_ann_index(part_a, path, n_planes=4, n_bands=4, dim=DIM)
    # vanished meta over committed generations refuses
    os.remove(os.path.join(path, "_ann_index_meta.json"))
    with pytest.raises(IOError, match="refusing to restart"):
        load_ann_index(spark, path)


def test_serve_never_rebands_corpus(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "ann")
    save_ann_index(
        emb.filter(F.col("vec_id") % 10 != 7), path,
        n_planes=4, n_bands=4, dim=DIM,
    )
    idx = load_ann_index(spark, path)
    # snapshot from a LOCAL relation: any 'embeddings' scan in the
    # serve plan would be a corpus re-band
    snap = spark.createDataFrame(
        [(10_000_001, [0.1] * DIM), (10_000_002, [-0.2] * DIM)],
        "vec_id long, embedding array<float>",
    )
    served = knn_join_incremental(snap, idx, k=5)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "embeddings" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert served.count() > 0


def test_banded_buckets_matches_python_construction(spark):
    """The one-parsed-expression banding (r13 driver-overhead fix) is
    value-identical to the per-plane Python construction it replaced."""
    from hermod_spark.operators.similarity import (
        band_hyperplanes,
        banded_buckets,
        lsh_bucket,
    )

    bands = band_hyperplanes(DIM, 4, 8, seed=42)
    emb = _emb(spark).limit(200)
    old = [
        r["b"]
        for r in emb.select(
            F.array(*[lsh_bucket("embedding", p) for p in bands]).alias("b")
        ).collect()
    ]
    new = [
        r["b"]
        for r in emb.select(banded_buckets("embedding", bands).alias("b")).collect()
    ]
    assert old == new


def test_compact_folds_chain_and_preserves_serve(spark, tmp_path):
    from hermod_spark.operators.similarity import compact_ann_index

    emb = _emb(spark)
    snap = emb.filter(F.col("vec_id") % 10 == 7)
    path = str(tmp_path / "ann")
    save_ann_index(
        emb.filter(F.col("vec_id") % 10 == 0), path,
        n_planes=4, n_bands=4, dim=DIM,
    )
    extend_ann_index(emb.filter(F.col("vec_id") % 10 == 1), path)
    extend_ann_index(
        emb.filter((F.col("vec_id") % 10 > 1) & (F.col("vec_id") % 10 != 7)),
        path,
    )
    want = _rows(knn_join_incremental(snap, load_ann_index(spark, path), k=5))
    assert compact_ann_index(path, spark) == 3
    idx = load_ann_index(spark, path)
    assert idx["meta"]["generations"] == ["gen-000000003"]
    assert idx["meta"]["n_planes"] == 4  # banding identity survives
    on_disk = sorted(n for n in os.listdir(path) if n.startswith("gen-"))
    assert on_disk == ["gen-000000003"]
    assert _rows(knn_join_incremental(snap, idx, k=5)) == want
    assert compact_ann_index(path, spark) == 0


def test_semantic_decontaminate_flags_probe_duplicates(spark, tmp_path):
    """Exact duplicates of a probe collide in EVERY sign-LSH bucket
    (recall 1 for the pairs decontamination cares about): corpus
    vectors equal to a probe are flagged at max_sim 1.0; near-copies
    pass the threshold; orthogonal vectors are not flagged; and the
    anti-join filter form removes exactly the flagged ids."""
    from hermod_spark.operators.similarity import semantic_decontaminate

    base = [float(i % 5 - 2) for i in range(DIM)]
    near = list(base)
    near[0] += 0.05
    ortho = [0.0] * DIM
    ortho[1] = 3.0  # base[1] == -1 -> negative cosine
    corpus = spark.createDataFrame(
        [(1, base), (2, near), (3, ortho), (4, [0.5] * DIM)],
        "vec_id long, embedding array<float>",
    )
    probes = spark.createDataFrame(
        [(100, base)], "vec_id long, embedding array<float>"
    )
    path = str(tmp_path / "ann")
    save_ann_index(corpus, path, n_planes=4, n_bands=4, dim=DIM)
    idx = load_ann_index(spark, path)
    got = {
        r["corpus_id"]: (r["n_probes"], r["max_sim"])
        for r in semantic_decontaminate(
            probes, idx, threshold=0.9
        ).collect()
    }
    assert got[1] == (1, 1.0)
    assert 1 in got and 2 in got and 3 not in got
    # filter form: anti-join removes exactly the flagged ids
    flagged = semantic_decontaminate(probes, idx, threshold=0.9).select(
        F.col("corpus_id").alias("vec_id")
    )
    kept = sorted(
        r["vec_id"]
        for r in corpus.join(flagged, "vec_id", "left_anti").collect()
    )
    assert kept == sorted(set([1, 2, 3, 4]) - set(got))
    with pytest.raises(ValueError, match="threshold"):
        semantic_decontaminate(probes, idx, threshold=0.0)


def test_first_build_crash_is_replayable(spark, tmp_path):
    """r13 review: same first-build crash window as the text index —
    the init meta keeps the root replayable."""
    emb = _emb(spark)
    path = str(tmp_path / "ann")
    with pytest.raises(RuntimeError, match="boom"):
        save_ann_index(
            emb, path, n_planes=4, n_bands=4, dim=DIM,
            on_before_commit=lambda seq: (_ for _ in ()).throw(
                RuntimeError("boom")
            ),
        )
    with pytest.raises(IOError, match="no committed data"):
        load_ann_index(spark, path)
    save_ann_index(emb, path, n_planes=4, n_bands=4, dim=DIM)
    assert load_ann_index(spark, path)["meta"]["generations"] == [
        "gen-000000000"
    ]


def test_dimension_guard_refuses_wrong_dim(spark, tmp_path):
    """r13 review: a wrong-dimension snapshot must REFUSE, not band
    silently into bucket 0 and persist a corrupted generation. The
    guard is a per-row CASE riding the existing checkpoints."""
    emb = _emb(spark)
    path = str(tmp_path / "ann")
    save_ann_index(
        emb.filter(F.col("vec_id") % 10 != 7), path,
        n_planes=4, n_bands=4, dim=DIM,
    )
    bad = spark.createDataFrame(
        [(9_000_001, [0.5] * (DIM // 2))],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="dimension"):
        extend_ann_index(bad, path)
    idx = load_ann_index(spark, path)
    assert len(idx["meta"]["generations"]) == 1  # nothing persisted
    with pytest.raises(ValueError, match="dimension"):
        knn_join_incremental(bad, idx, k=5)
    # and the index itself still serves correctly
    snap = emb.filter(F.col("vec_id") % 10 == 7)
    assert len(_rows(knn_join_incremental(snap, idx, k=5))) > 0
