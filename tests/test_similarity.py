"""Similarity search: cosine math, brute-force top-k, LSH bucketing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hermod_spark.operators import similarity as S


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 0.0], [1.0, 0.0]), ([1.0, 1.0], [1.0, 0.0])],
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
    )
    got = [r["c"] for r in df.select(S.cosine("a", "b").alias("c")).collect()]
    assert got[0] == pytest.approx(0.0)
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(1 / math.sqrt(2))


@pytest.fixture
def embeddings(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),  # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.1]),  # closest to 2
        (4, [-1.0, 0.0, 0.0]),  # opposite of 0
    ]
    return spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")


def test_brute_force_topk(embeddings):
    out = S.brute_force_topk(embeddings, k=2, n_queries=1)
    rows = sorted(out.collect(), key=lambda r: r["rnk"])
    assert [r["query_id"] for r in rows] == [0, 0]
    assert rows[0]["neighbor_id"] == 1  # nearest
    assert rows[0]["sim"] > rows[1]["sim"]
    assert all(r["neighbor_id"] != 0 for r in rows)  # self excluded


def test_brute_force_topk_k_bound(embeddings):
    out = S.brute_force_topk(embeddings, k=3, n_queries=2)
    per_q = {}
    for r in out.collect():
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1}
    assert all(len(v) == 3 for v in per_q.values())


def test_hyperplanes_deterministic():
    assert S.hyperplanes(8, 4, seed=42) == S.hyperplanes(8, 4, seed=42)
    assert S.hyperplanes(8, 4, seed=1) != S.hyperplanes(8, 4, seed=2)


def test_lsh_bucket_same_vector_same_bucket(spark):
    planes = S.hyperplanes(3, 4, seed=7)
    df = spark.createDataFrame(
        [(0, [0.5, 0.5, 0.0]), (1, [0.5, 0.5, 0.0]), (2, [-0.5, -0.5, 0.0])],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    rows = {
        r["vec_id"]: r["b"]
        for r in df.select("vec_id", S.lsh_bucket("embedding", planes).alias("b")).collect()
    }
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]  # opposite vector flips every plane sign


def test_lsh_topk_subset_of_bucketmates(embeddings):
    out = S.lsh_topk(embeddings, k=3, n_queries=1, n_planes=2)
    for r in out.collect():
        assert r["query_id"] == 0 and r["neighbor_id"] != 0


def test_ivf_probe_lists_ordering(spark):
    planes = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    df = spark.createDataFrame([(0, [2.0, 1.0])], "vec_id INT, embedding ARRAY<DOUBLE>")
    got = df.select(
        S.ivf_probe_lists("embedding", planes, 2).alias("l")
    ).first()["l"]
    # dots: 2.0, 1.0, -2.0 -> top-2 lists [0, 1]
    assert got == [0, 1]


def test_ivf_probe2_recall_not_worse(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, k=3, n_queries=4).collect()
    }

    def recall(n_probe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in S.ivf_topk(emb, k=3, n_queries=4, n_centroids=4, n_probe=n_probe).collect()
        }
        return len(got & exact) / len(exact)

    assert recall(2) >= recall(1)


def test_train_centroids_kmeans_deterministic_and_unit(spark):
    from hermod_spark.data import table
    from conftest import SF_SMALL

    emb = table(spark, SF_SMALL, "embeddings")
    a = S.train_centroids_kmeans(emb, 8)
    b = S.train_centroids_kmeans(emb, 8)
    assert a == b  # hash-ordered sample + seeded init + fixed iters
    assert len(a) == 8 and len(a[0]) == 64
    for c in a:
        n = math.sqrt(sum(x * x for x in c))
        assert abs(n - 1.0) < 1e-4  # spherical: unit centroids


def test_train_centroids_kmeans_separates_obvious_clusters(spark):
    # two tight clusters on orthogonal axes -> k=2 must split them
    rows = [(i, [1.0, 0.01 * i, 0.0]) for i in range(50)] + [
        (100 + i, [0.0, 0.01 * i, 1.0]) for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    cents = S.train_centroids_kmeans(emb, 2, sample_size=100)
    assigned = emb.select(
        "vec_id", S.ivf_assign("embedding", cents).alias("l")
    ).collect()
    by_cluster = {}
    for r in assigned:
        by_cluster.setdefault(r["l"], set()).add(r["vec_id"] < 100)
    # each list holds exactly one of the two ground-truth clusters
    assert sorted(by_cluster) == [0, 1]
    assert all(len(v) == 1 for v in by_cluster.values())


def test_ivf_trained_recall_at_sf01(spark):
    """VERDICT r3 #4 done-gate: trained-centroid IVF recall@5 vs the
    brute-force oracle at sf0.1, stated threshold: mean >= 0.6 and
    every query >= 0.3 with n_probe=4 of 8 lists (measured 0.74 mean,
    0.4 min — deterministic pipeline, fixed data)."""
    from hermod_spark.data import table

    emb = table(spark, "/root/testdata/sf0.1", "embeddings")
    rows = S.ivf_recall_check(
        emb, k=5, n_queries=10, n_centroids=8, n_probe=4, min_recall=0.3
    ).collect()
    assert len(rows) == 10
    assert all(r["n_truth"] == 5 for r in rows)
    assert all(r["recall_ok"] for r in rows)
    # tighter aggregate: recompute mean recall from the raw paths
    ivf = S.ivf_topk(emb, k=5, n_queries=10, n_centroids=8, n_probe=4)
    bf = S.brute_force_topk(emb, k=5, n_queries=10)
    ivf_pairs = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    bf_pairs = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    hits = sum(1 for p in bf_pairs if p in ivf_pairs)
    assert hits / len(bf_pairs) >= 0.6


def test_quantize_embeddings_roundtrip_error_bounded(spark):
    rows = [(0, [0.0, 0.5, 1.0]), (1, [2.0, 2.0, 2.0])]  # incl. constant vec
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    got = {r["vec_id"]: r for r in S.quantize_embeddings(df).collect()}
    r0 = got[0]
    assert r0["codes"] == [0, 128, 255]  # full-range mapping
    # dequantized error bounded by scale/2 (+ slack for the 6-decimal
    # rounding of the reported scale: codes * 5e-7 each way)
    true_scale = (1.0 - 0.0) / 255.0
    for orig, code in zip([0.0, 0.5, 1.0], r0["codes"]):
        err = abs(orig - (r0["zero_point"] + code * r0["scale"]))
        assert err <= true_scale / 2 + 255 * 5e-7
    r1 = got[1]
    assert r1["scale"] == 0.0 and r1["codes"] == [0, 0, 0]  # degenerate vec


def test_embedding_near_dups_symmetric_dedup(embeddings):
    out = S.embedding_near_dups(embeddings, threshold=0.9, n_planes=2).collect()
    for r in out:
        assert r["id_a"] < r["id_b"]
        assert r["sim"] >= 0.9


def test_normalize_embeddings_unit_norm_and_zero_guard(spark):
    from hermod_spark.operators.similarity import normalize_embeddings

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    rows = {r["vec_id"]: r for r in normalize_embeddings(df).collect()}
    assert rows[1]["l2_norm"] == 5.0
    assert rows[1]["unit"] == [0.6, 0.8]
    assert rows[2]["l2_norm"] == 0.0
    assert rows[2]["unit"] == [0.0, 0.0]


def test_class_stats(spark):
    import math

    from hermod_spark.operators.similarity import class_stats

    # label 0: two identical unit-x vectors -> cohesion 1, norm 1
    # label 1: orthogonal pair -> avg cosine to centroid = cos(45deg)
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),
            (3, [2.0, 0.0], 1),
            (4, [0.0, 2.0], 1),
        ],
        "vec_id INT, embedding ARRAY<FLOAT>, label INT",
    )
    rows = {r["label"]: r for r in class_stats(df).collect()}
    assert rows[0]["n_vectors"] == 2
    assert abs(rows[0]["avg_norm"] - 1.0) < 1e-6
    assert abs(rows[0]["avg_cos_centroid"] - 1.0) < 1e-6
    assert abs(rows[1]["avg_norm"] - 2.0) < 1e-6
    assert abs(rows[1]["avg_cos_centroid"] - math.cos(math.pi / 4)) < 1e-6


def test_pq_encode_matches_numpy_argmin(spark):
    import numpy as np

    from hermod_spark.operators import similarity as S

    books = S.pq_random_codebooks(8, m=2, n_codes=4, seed=3)
    vecs = [
        (0, [0.1, -0.2, 0.3, 0.0, 0.5, 0.5, -0.5, 0.1]),
        (1, [1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id INT, embedding ARRAY<FLOAT>")
    got = {
        r["vec_id"]: list(r["codes"])
        for r in df.select(
            "vec_id", S.pq_encode("embedding", books).alias("codes")
        ).collect()
    }
    for vid, v in vecs:
        want = []
        for b, book in enumerate(books):
            sub = np.asarray(v[b * 4 : (b + 1) * 4], dtype=np.float32).astype(
                np.float64
            )
            d = ((np.asarray(book) - sub) ** 2).sum(axis=1)
            want.append(int(np.argmin(d)))
        assert got[vid] == want, vid


def test_pq_trained_beats_random_recon(spark):
    from pyspark.sql import functions as F

    from hermod_spark.data import table
    from hermod_spark.operators import similarity as S

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    trained = S.train_pq_codebooks(emb, m=8, n_codes=16)
    random_b = S.pq_random_codebooks(dim, m=8, n_codes=16)
    err = {}
    for name, books in [("trained", trained), ("random", random_b)]:
        err[name] = (
            S.pq_codes(emb, codebooks=books)
            .agg(F.avg("recon_error"))
            .first()[0]
        )
    assert err["trained"] < err["random"], err


def test_pq_training_deterministic(spark):
    from hermod_spark.data import table
    from hermod_spark.operators import similarity as S

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    a = S.train_pq_codebooks(emb, m=4, n_codes=8)
    b = S.train_pq_codebooks(emb, m=4, n_codes=8)
    assert a == b


def test_pq_topk_self_excluded_and_ranked(spark):
    from hermod_spark.data import table
    from hermod_spark.operators import similarity as S

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    out = S.pq_topk(emb, k=3, n_queries=4, codebooks=S.pq_random_codebooks(dim)).collect()
    assert len(out) == 12
    for r in out:
        assert r["query_id"] != r["neighbor_id"]
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rnk"])
        dists = [r["est_dist"] for r in rows]
        assert dists == sorted(dists)


def test_semantic_dedup_clusters_and_survivors(spark):
    from hermod_spark.operators.similarity import semantic_dedup

    # two duplicate pairs (cosine 1.0) + one singleton
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [2.0, 0.0, 0.0, 0.0]),   # same direction as 0
            (2, [0.0, 1.0, 0.0, 0.0]),
            (5, [0.0, 0.5, 0.0, 0.0]),   # same direction as 2
            (7, [0.0, 0.0, 1.0, 1.0]),   # alone
        ],
        "vec_id INT, embedding ARRAY<FLOAT>",
    )
    rows = {r["vec_id"]: r for r in semantic_dedup(df, threshold=0.99, dim=4).collect()}
    assert rows[0]["cluster_id"] == 0 and rows[0]["keep"] is True
    assert rows[1]["cluster_id"] == 0 and rows[1]["keep"] is False
    assert rows[2]["cluster_id"] == 2 and rows[2]["keep"] is True
    assert rows[5]["cluster_id"] == 2 and rows[5]["keep"] is False
    assert rows[7]["cluster_id"] == 7 and rows[7]["keep"] is True


def test_class_outliers_flags_planted_outlier(spark):
    # 9 vectors tight around (1,0) plus one far point in the same class
    rows = [(i, "a", [1.0 + 0.01 * i, 0.0]) for i in range(9)]
    rows.append((9, "a", [50.0, 50.0]))
    rows.append((10, "b", [0.0, 1.0]))  # singleton class: sigma 0 -> z 0
    df = spark.createDataFrame(
        rows, "vec_id INT, label STRING, embedding ARRAY<DOUBLE>"
    )
    got = {r["vec_id"]: r for r in S.class_outliers(df).collect()}
    assert got[9]["is_outlier"] is True
    assert all(not got[i]["is_outlier"] for i in range(9))
    assert got[10]["z"] == 0.0 and got[10]["is_outlier"] is False
    # z is standardized: the planted outlier dominates
    assert got[9]["z"] > 2.0 > max(got[i]["z"] for i in range(9))


def test_trained_pca_beats_random_projection(spark):
    """The quality pin for the dimensionality-reduction family (same
    contract as trained-PQ-beats-random): top-k PCA components from the
    bounded deterministic sample must reconstruct the corpus strictly
    better than the seeded random orthonormal matrix."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    mean, comps = S.train_pca(emb, k=8)
    rand = S.random_projection(dim, k=8)
    err_pca = S.pca_reconstruction_error(emb, comps, mean)
    err_rand = S.pca_reconstruction_error(emb, rand)
    assert err_pca < err_rand
    # training is deterministic: same sample, same SVD, same literals
    mean2, comps2 = S.train_pca(emb, k=8)
    assert mean2 == mean and comps2 == comps


def test_project_embeddings_shapes_and_orthonormal_matrix(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    rp = S.random_projection(dim, k=4)
    # orthonormal rows (to rounding): unit norm, pairwise ~0 dot
    import math
    for i, a in enumerate(rp):
        assert abs(math.fsum(x * x for x in a) - 1.0) < 1e-4
        for b in rp[i + 1:]:
            assert abs(math.fsum(x * y for x, y in zip(a, b))) < 1e-4
    out = S.project_embeddings(emb, rp)
    assert out.columns == ["vec_id", "p0", "p1", "p2", "p3"]
    assert out.count() == emb.count()


def test_pq_recall_measurement_shape_and_truth(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = S.pq_recall_check(
        emb, k=5, n_queries=4, codebooks=S.pq_random_codebooks(64)
    ).collect()
    assert len(out) == 4
    for r in out:
        assert r["n_truth"] == 5
        assert 0 <= r["n_hits"] <= 5
        assert r["recall"] == round(r["n_hits"] / 5, 6)
    # the truth side really is exact L2: self-exclusion + full ranking
    truth = S.l2_brute_force_topk(emb, k=3, n_queries=2).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in truth)
    assert {r["query_id"] for r in truth} == {0, 1}


def test_ivfpq_topk_matches_full_pq_on_probed_lists(spark):
    """IVFPQ = PQ ADC restricted to the query's probed lists: every
    (query, neighbor) pair IVFPQ returns must carry the exact same
    est_dist plain pq_topk computes, and k rows per query."""
    from hermod_spark.operators.similarity import (
        centroids_of, ivfpq_topk, pq_random_codebooks, pq_topk,
    )

    rows = [
        (i, [float(((i * 7 + j * 3) % 11) - 5) / 5.0 for j in range(4)])
        for i in range(10)
    ]
    embeddings = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    books = pq_random_codebooks(4, m=4, n_codes=8)
    cents = centroids_of(embeddings, 4)
    got = ivfpq_topk(
        embeddings, k=3, n_queries=4, n_centroids=4, n_probe=4,
        m=4, n_codes=8, centroids=cents, codebooks=books,
    ).collect()
    full = {
        (r["query_id"], r["neighbor_id"]): r["est_dist"]
        for r in pq_topk(
            embeddings, k=10**6, n_queries=4, m=4, n_codes=8, codebooks=books
        ).collect()
    }
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r)
        assert full[(r["query_id"], r["neighbor_id"])] == r["est_dist"]
    assert all(len(v) == 3 for v in per_q.values())
    # n_probe = n_centroids probes EVERY list -> identical to full PQ rank
    full_rank = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in pq_topk(
            embeddings, k=3, n_queries=4, m=4, n_codes=8, codebooks=books
        ).collect()
    }
    for r in got:
        assert full_rank[(r["query_id"], r["rnk"])] == r["neighbor_id"]


def test_lsh_recall_measurement_shape_and_more_planes_not_better(spark):
    """Recall rows are well-formed, and widening buckets (fewer planes)
    can only grow the candidate set, so mean recall at 1 plane must be
    >= mean recall at 6 planes (1-plane buckets strictly contain the
    finer partition's candidate pairs on average)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def mean_recall(n_planes):
        out = S.lsh_recall_check(
            emb, k=5, n_queries=4, n_planes=n_planes, dim=64
        ).collect()
        assert len(out) == 4
        for r in out:
            assert r["n_truth"] == 5
            assert 0 <= r["n_hits"] <= 5
            assert r["recall"] == round(r["n_hits"] / 5, 6)
        return sum(r["recall"] for r in out) / len(out)

    assert mean_recall(1) >= mean_recall(6)


def test_ivf_recall_curve_monotone_with_floor(spark):
    """The recall-vs-cost curve (VERDICT r7 #4): recall and scan cost
    must both be non-decreasing in n_probe, the widest probe setting
    must clear the 0.6 recall floor the trained path promises, and the
    cost axis must stay a strict subset of the corpus (the whole point
    of IVF: never a full scan)."""
    from hermod_spark.data import table

    emb = table(spark, "/root/testdata/sf0.1", "embeddings")
    rows = {
        r["n_probe"]: r
        for r in S.ivf_recall_curve(
            emb, k=5, n_queries=10, n_centroids=8, probes=(1, 2, 4)
        ).collect()
    }
    assert set(rows) == {1, 2, 4}
    recalls = [rows[p]["n_hits"] / rows[p]["n_truth"] for p in (1, 2, 4)]
    scans = [rows[p]["n_scanned"] for p in (1, 2, 4)]
    assert recalls == sorted(recalls)
    assert scans == sorted(scans) and scans[0] < scans[-1]
    assert recalls[-1] >= 0.6
    n = rows[4]["n_corpus"]
    assert rows[4]["n_scanned"] < 10 * (n - 1)  # probing 4/8 lists ≪ full scan


def test_ivfpq_rerank_beats_raw_adc_and_is_exact_on_candidates(spark):
    """r10 (VERDICT r9 #4): the exact re-rank must (a) return distances
    equal to true L2² for every returned pair (it re-scored them
    exactly), and (b) lift recall@k above the raw compressed-domain
    ranking with the same models — the number that justifies the
    bounded join back to the embedding table."""
    import pyspark.sql.functions as F

    from hermod_spark.data import table

    emb = table(spark, "/root/testdata/sf0.01", "embeddings")
    cents = S.centroids_of(emb, 8)
    books = S.pq_random_codebooks(64)
    kw = dict(
        k=5, n_queries=10, n_centroids=8, n_probe=2,
        centroids=cents, codebooks=books,
    )

    rr = S.ivfpq_rerank_topk(emb, rerank=4, **kw).collect()
    assert len(rr) == 50 and all(1 <= r["rnk"] <= 5 for r in rr)
    # (a) returned dist2 values are the TRUE L2² (cross-checked against
    # a direct exact computation for those exact pairs)
    pairs = {(r["query_id"], r["neighbor_id"]): r["dist2"] for r in rr}
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(
            F.col("vec_id").isin(
                [q for q, _ in pairs] + [n for _, n in pairs]
            )
        ).collect()
    }
    for (qid, nid), d in pairs.items():
        exact = round(
            sum((float(a) - float(b)) ** 2 for a, b in zip(vecs[qid], vecs[nid])), 6
        )
        assert abs(exact - d) < 1e-6

    # (b) recall floor above the raw ADC path (same models)
    def mean(df):
        rows = df.collect()
        return sum(r["recall"] for r in rows) / len(rows)

    rerank_recall = mean(
        S.ivfpq_rerank_recall_check(emb, rerank=4, **kw)
    )
    adc_recall = mean(S.pq_recall_check(emb, k=5, n_queries=10, codebooks=books))
    assert rerank_recall >= adc_recall
    assert rerank_recall >= 0.2  # absolute floor at this SF (measured 0.34)


def test_ann_model_save_load_roundtrip_exact(spark, tmp_path):
    """Train-once/serve-many: every model kind round-trips through the
    parquet artifact bit-for-bit (Python floats are IEEE doubles;
    parquet DOUBLE preserves them), and a served query over the loaded
    model equals the same query over the in-memory model."""
    from hermod_spark.data import table
    from hermod_spark.operators import similarity as S

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = S.train_centroids_kmeans(emb, n_centroids=4, sample_size=256)
    books = S.train_pq_codebooks(emb, m=4, n_codes=8, sample_size=256)
    pca = S.train_pca(emb, k=3, sample_size=256)
    path = str(tmp_path / "ann_model")
    S.save_ann_model(spark, path, centroids=cents, codebooks=books, pca=pca)
    loaded = S.load_ann_model(spark, path)
    assert loaded["centroids"] == cents
    assert loaded["codebooks"] == books
    assert loaded["pca"] == pca
    served_mem = S.ivfpq_topk(
        emb, k=3, n_queries=2, centroids=cents, codebooks=books
    ).collect()
    served_disk = S.ivfpq_topk(
        emb, k=3, n_queries=2,
        centroids=loaded["centroids"], codebooks=loaded["codebooks"],
    ).collect()
    assert served_mem == served_disk


def test_ann_model_save_load_partial_and_errors(spark, tmp_path):
    """Partial artifacts load only what they hold; foreign/truncated
    parquet raises instead of serving a partial model."""
    from hermod_spark.operators import similarity as S

    p1 = str(tmp_path / "cents_only")
    S.save_ann_model(spark, p1, centroids=[[1.0, 2.0], [3.0, 4.0]])
    loaded = S.load_ann_model(spark, p1)
    assert loaded == {"centroids": [[1.0, 2.0], [3.0, 4.0]]}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="nothing to save"):
        S.save_ann_model(spark, str(tmp_path / "empty"))

    p2 = str(tmp_path / "foreign")
    spark.createDataFrame(
        [("mystery", 0, 0, [1.0])], S._MODEL_SCHEMA
    ).write.parquet(p2)
    with _pytest.raises(ValueError, match="unknown components"):
        S.load_ann_model(spark, p2)

    p3 = str(tmp_path / "sparse_grid")
    spark.createDataFrame(
        [("codebook", 0, 0, [1.0]), ("codebook", 1, 1, [2.0])],
        S._MODEL_SCHEMA,
    ).write.parquet(p3)
    with _pytest.raises(ValueError, match="grid not dense"):
        S.load_ann_model(spark, p3)

    p4 = str(tmp_path / "pca_no_mean")
    spark.createDataFrame(
        [("pca_component", 0, 0, [1.0])], S._MODEL_SCHEMA
    ).write.parquet(p4)
    with _pytest.raises(ValueError, match="incomplete PCA"):
        S.load_ann_model(spark, p4)


def test_ann_model_load_rejects_duplicated_codebook_cell(spark, tmp_path):
    """A duplicated grid cell + a missing one passes the count check
    alone — the exact-cell-set check must still raise."""
    from hermod_spark.operators import similarity as S

    p = str(tmp_path / "dup_cell")
    spark.createDataFrame(
        [
            ("codebook", 0, 0, [1.0]),
            ("codebook", 0, 0, [2.0]),
            ("codebook", 0, 1, [3.0]),
            ("codebook", 1, 1, [4.0]),
        ],
        S._MODEL_SCHEMA,
    ).write.parquet(p)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="grid not dense"):
        S.load_ann_model(spark, p)


def test_ann_model_load_rejects_sparse_pca_components(spark, tmp_path):
    """A truncated artifact missing pca_component i=1 (or carrying a
    duplicate index) must raise, same dense contract as codebooks."""
    from hermod_spark.operators import similarity as S

    p = str(tmp_path / "pca_gap")
    spark.createDataFrame(
        [
            ("pca_mean", 0, 0, [0.0]),
            ("pca_component", 0, 0, [1.0]),
            ("pca_component", 2, 0, [2.0]),
        ],
        S._MODEL_SCHEMA,
    ).write.parquet(p)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pca_component indices"):
        S.load_ann_model(spark, p)


def test_class_stats_zero_vector_does_not_bias_cohesion(spark):
    """A zero vector has undefined cosine (NULL): the cohesion average
    must divide by the DEFINED count, not n_vectors — averaging NULL-
    as-zero silently biased classes containing zero vectors."""
    from hermod_spark.operators.similarity import class_stats

    rows = [(i, [1.0, 0.0], 0) for i in range(4)] + [(9, [0.0, 0.0], 0)]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT"
    )
    got = class_stats(df).collect()[0]
    assert got["n_vectors"] == 5
    # centroid = (0.8, 0.0); all four unit vectors have cosine 1.0 —
    # the zero vector must not drag the average to 0.8
    assert got["avg_cos_centroid"] == 1.0


def test_ivf_recall_curve_reports_empty_probe_settings(spark):
    """A probe setting whose candidate set is empty must still appear
    in the curve with zero counters, not vanish (the groupBy-join
    shape silently dropped it)."""
    from hermod_spark.operators.similarity import ivf_recall_curve

    # two vectors, one per centroid: each query's rank-0 list holds
    # only itself (self-pairs filtered), so probe 1 scores NOTHING
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    got = {
        r["n_probe"]: r
        for r in ivf_recall_curve(
            df, k=1, n_queries=2, probes=(1, 2),
            centroids=[[1.0, 0.0], [0.0, 1.0]],
        ).collect()
    }
    assert set(got) == {1, 2}
    assert got[1]["n_hits"] == 0 and got[1]["n_scanned"] == 0
    assert got[2]["n_scanned"] == 2


def test_knn_join_finds_cluster_neighbors_exactly(spark):
    """Two tight clusters + deterministic tie-breaks: with generous
    banding every vector's top-k comes back exactly (recall 1 on
    clustered data — the regime the operator exists for)."""
    from hermod_spark.operators.similarity import knn_join

    rows = [
        # cluster A around (1, 0, 0)
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0]),
        (2, [0.98, -0.01, 0.0]),
        # cluster B around (0, 1, 0)
        (10, [0.0, 1.0, 0.0]),
        (11, [0.01, 0.99, 0.0]),
        (12, [-0.01, 0.98, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in knn_join(df, k=2, n_planes=2, n_bands=6, dim=3).collect()
    }
    # every A member's 2-NN stay inside A, B's inside B
    for q in (0, 1, 2):
        assert {got[(q, 1)], got[(q, 2)]} <= {0, 1, 2} - {q}
    for q in (10, 11, 12):
        assert {got[(q, 1)], got[(q, 2)]} <= {10, 11, 12} - {q}


def test_knn_join_plan_has_no_cartesian_and_ships_bare_ids(spark):
    """Plan gate: every join is equi-keyed (bucket or id) — no
    CartesianProduct / BroadcastNestedLoopJoin anywhere; and the
    candidate distinct runs BEFORE vectors are joined back (the
    HashAggregate for pair-dedup must sit below the embedding joins,
    i.e. its output carries only the two id columns)."""
    from hermod_spark.operators.similarity import knn_join

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = knn_join(df, k=3, n_planes=2, n_bands=2, dim=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    # the pair dedup carries EXACTLY the bare id pair — vectors must
    # not ride the candidate exchange. (r14 opt round: the pairs
    # frame is no longer checkpointed — single consumer, measured
    # slower with any lineage cut — so the gate pins the pair-dedup
    # Aggregate node's grouping list instead of a LogicalRDD schema;
    # distinct() groups on every output column, so a vector riding
    # along would appear in this list.)
    pairs_rows = [
        ln for ln in opt.splitlines() if "Aggregate [query_id" in ln
    ]
    assert pairs_rows, "bare-id pair dedup stage missing from plan"
    assert "neighbor_id#" in pairs_rows[0]
    assert "embedding" not in pairs_rows[0] and "_v" not in pairs_rows[0]


def test_knn_join_k_and_validation(spark):
    from hermod_spark.operators.similarity import knn_join
    import pytest as _pytest

    df = spark.createDataFrame(
        [(i, [1.0, float(i % 3) * 0.01]) for i in range(8)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = knn_join(df, k=3, n_planes=1, n_bands=2, dim=2).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
        assert r["neighbor_id"] != r["query_id"]
    for q, rows in per_q.items():
        assert len(rows) <= 3
        assert sorted(r["rnk"] for r in rows) == list(range(1, len(rows) + 1))
    with _pytest.raises(ValueError, match="k="):
        knn_join(df, k=0, dim=2)
    with _pytest.raises(ValueError, match="n_bands"):
        knn_join(df, k=1, n_bands=0, dim=2)


def test_knn_join_max_bucket_caps_hot_buckets(spark):
    """A degenerate corpus (all vectors identical ⇒ one bucket per
    band) with max_bucket set produces NO pairs — the hot bucket is
    dropped whole, the LSH max_bucket semantics."""
    from hermod_spark.operators.similarity import knn_join

    df = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(50)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    assert knn_join(df, k=2, n_planes=2, n_bands=2, dim=2,
                    max_bucket=10).count() == 0
    assert knn_join(df, k=2, n_planes=2, n_bands=2, dim=2).count() == 100


def test_knn_recall_floor_on_fixture_corpus(spark):
    """Pinned recall floor (VERDICT r11 #4): the registry's banding
    (4 planes × 8 bands) must hold mean recall@5 ≥ 0.6 against exact
    truth on the sf0.01 embeddings fixture — uniform-noise vectors,
    the WORST case for sign-LSH (neighbors barely beat random, so
    bucket collisions carry little signal); measured 0.76 here and
    0.69 on the sf0.001 fixture. Clustered real corpora only do
    better; the floor guards against a banding/seed regression, not
    noise."""
    from hermod_spark.operators.similarity import knn_join_recall_check
    from hermod_spark.data import table

    emb = table(spark, "/root/testdata/sf0.01", "embeddings")
    rc = knn_join_recall_check(
        emb, k=5, n_check=25, n_planes=4, n_bands=8, dim=64
    )
    mean = rc.agg(F.avg("recall")).first()[0]
    assert mean >= 0.6


def test_knn_split_leakage_counts_undirected_pairs(spark):
    """The audit counts each undirected KNN adjacency ONCE (including
    pairs only the higher id lists), splits sum to the distinct pair
    count, and is_leak flags exactly the cross-split rows."""
    from hermod_spark.operators.curation import split_assign
    from hermod_spark.operators.similarity import (
        knn_join,
        knn_split_leakage,
    )

    df = spark.createDataFrame(
        [(i, [1.0, float(i) * 0.05]) for i in range(40)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    kw = dict(k=3, n_planes=2, n_bands=4, dim=2)
    out = knn_split_leakage(df, **kw).collect()
    pairs = {
        (min(r["query_id"], r["neighbor_id"]),
         max(r["query_id"], r["neighbor_id"]))
        for r in knn_join(df, **kw).collect()
    }
    assert sum(r["n_pairs"] for r in out) == len(pairs)
    splits = {
        r["vec_id"]: r["split"]
        for r in split_assign(df.select("vec_id"), "vec_id").collect()
    }
    want = {}
    for a, b in pairs:
        key = tuple(sorted((splits[a], splits[b])))
        want[key] = want.get(key, 0) + 1
    got = {(r["split_a"], r["split_b"]): r["n_pairs"] for r in out}
    assert got == want
    for r in out:
        assert r["is_leak"] == (r["split_a"] != r["split_b"])


def test_sql_string_lsh_paths_reject_non_identifier_columns(spark):
    """ADVICE r13: the F.expr string paths interpolate the vector
    column name — a backtick or dot must be refused (the layout.py
    _IDENT discipline), not parsed into something else."""
    import pytest

    from hermod_spark.operators import similarity as sim

    planes = sim.hyperplanes(4, 2)
    bands = sim.band_hyperplanes(4, 2, 2)
    for bad in ["a`b", "a.b", "a b", "", "1x"]:
        with pytest.raises(ValueError, match="plain identifier"):
            sim.lsh_bucket(bad, planes)
        with pytest.raises(ValueError, match="plain identifier"):
            sim.banded_buckets(bad, bands)
        with pytest.raises(ValueError, match="plain identifier"):
            sim._dot_literal_self(bad)
    # plain identifiers still work end-to-end
    df = spark.createDataFrame([(1, [1.0, 0.0, 0.0, 0.0])], "id int, v array<float>")
    assert df.select(sim.lsh_bucket("v", planes)).count() == 1
