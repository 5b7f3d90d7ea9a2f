"""Property tests for the r12 items: star-contraction connected
components must label ANY random multigraph identically to a
driver-side union-find (the ground-truth algorithm, independent code
path), and weighted neighbor-Jaccard must satisfy the Σmax identity
against a brute-force per-pair computation.

Spark-backed properties keep example counts small (each example is a
distributed job); the generators bias toward the structures that
break naive CC (chains, self-loops, duplicate and reversed edges).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    ),
    chain_len=st.integers(0, 25),
)
@_settings
def test_star_contraction_equals_union_find(spark, edges, chain_len):
    """Random multigraph (self-loops, duplicates, both orientations)
    PLUS an attached chain (the O(d)-killer shape): labels must equal
    the union-find ground truth exactly, and rounds must stay
    logarithmic, never linear, in the chain length."""
    from hermod_spark.operators import dedup

    chain = [(100 + i, 100 + i + 1) for i in range(chain_len)]
    all_edges = edges + chain
    pairs = spark.createDataFrame(all_edges, "id_a LONG, id_b LONG")
    labels, rounds = dedup.star_contraction_components(pairs)
    got = {r["node"]: r["label"] for r in labels.collect()}
    want = dict(dedup._driver_union_find(all_edges))
    assert got == want
    assert rounds <= 12  # log2(66) ≈ 6 alternations + slack, never O(d)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(0, 6),          # src (customer)
            st.sampled_from("ABCD"),    # dst (supplier)
            st.floats(0.25, 8.0, allow_nan=False, width=16),
        ),
        min_size=2,
        max_size=24,
    ),
)
@_settings
def test_weighted_jaccard_matches_bruteforce(spark, edges):
    """Σmin / (W_a + W_b − Σmin) computed by the operator equals the
    definitionally-computed weighted Jaccard Σmin/Σmax over the
    neighborhood union, with duplicate edges summing weights."""
    from collections import defaultdict

    from hermod_spark.operators.graph import neighbor_jaccard

    w = defaultdict(float)
    for c, s, x in edges:
        w[(c, s)] += x
    by_s = defaultdict(dict)
    for (c, s), x in w.items():
        by_s[s][c] = x
    df = spark.createDataFrame(edges, "src int, dst string, w double")
    got = {
        (r["node_a"], r["node_b"]): (r["shared"], r["jaccard"])
        for r in neighbor_jaccard(df, weight="w").collect()
    }
    nodes = sorted(by_s)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            shared = set(by_s[a]) & set(by_s[b])
            if not shared:
                assert (a, b) not in got
                continue
            union = set(by_s[a]) | set(by_s[b])
            minsum = sum(min(by_s[a][c], by_s[b][c]) for c in shared)
            maxsum = sum(
                max(by_s[a].get(c, 0.0), by_s[b].get(c, 0.0)) for c in union
            )
            n_shared, jac = got[(a, b)]
            assert n_shared == len(shared)
            assert jac == __import__("pytest").approx(
                minsum / maxsum, rel=1e-9
            )


@given(
    n_vecs=st.integers(6, 24),
    k=st.integers(1, 4),
    seed=st.integers(0, 5),
)
@_settings
def test_knn_join_is_subset_of_exact_and_correctly_ranked(
    spark, n_vecs, k, seed
):
    """For ANY corpus: every returned (query, rnk) run is a prefix
    ranking of the candidate set by (sim desc, neighbor asc), never
    contains self-pairs, and every similarity matches the exact cosine of
    that pair (the rerank is exact even when the candidate set is
    approximate)."""
    import math
    import random

    from hermod_spark.operators.similarity import knn_join

    rng = random.Random(seed)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(n_vecs)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    rows = knn_join(df, k=k, n_planes=2, n_bands=3, dim=6).collect()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    per_q = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        assert r["sim"] == __import__("pytest").approx(
            round(cos(vecs[r["query_id"]], vecs[r["neighbor_id"]]), 6),
            abs=1e-6,
        )
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= k
        key = [(-r["sim"], r["neighbor_id"]) for r in rs]
        assert key == sorted(key)  # ranked exactly by (sim desc, id asc)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=1,
        max_size=30,
    )
)
@_settings
def test_kcore_hindex_equals_reference_peel(spark, edges):
    """r13: the distributed h-index iteration at a node-count round
    bound equals the exact Batagelj–Zaveršnik min-degree peel on
    arbitrary small multigraphs (self-loops, duplicates, both
    orientations)."""
    from hermod_spark.operators.graph import kcore_numbers
    from tests.test_graph import _ref_core_numbers

    want = _ref_core_numbers(edges)
    if not want:
        return
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["node"]: r["core"]
        for r in kcore_numbers(df, iterations=12).collect()
    }
    assert got == want
