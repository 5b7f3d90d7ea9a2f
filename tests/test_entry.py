"""Driver-contract smoke: entry() returns rows with a stable schema;
every oracle has a matching query; queries are well-formed at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as E

from conftest import SF_SMOKE


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "bucket", "route_table", "avg_value", "min_value", "max_value", "n",
    ]


def test_every_oracle_has_a_query():
    q, o = set(E.queries()), set(E.oracle_sql())
    assert o <= q
    # r5: zero rows-only entries. fn_hmac (the last holdout — DuckDB
    # 1.0 sha256() is VARCHAR-only, so HMAC's raw-byte inner digest
    # cannot be composed in SQL) now runs over the nation table, which
    # is byte-identical at every sf, against a literal-VALUES oracle
    # precomputed with Python's stdlib hmac.
    assert q - o == set()


def test_driver_window_covers_unchecked_block():
    """The driver hashes only the first 50 queries() entries. The
    never-driver-checked block now exceeds 50, so the rotation is
    tiered: every query ADDED or CHANGED this round must land inside
    the window (tier 0); the remainder of the never-checked block
    fills the rest and its tail spills — a handful of entries —
    rotating in next round."""
    qs = list(E.queries())
    first50 = set(qs[:50])
    tier0 = {
        # r7 new operators (never driver-checked)
        "dedup_report", "dedup_exact_spans", "text_dup_span_frac",
        "dedup_span_removal", "dedup_span_keep_one",
        "cur_decontaminate_ngram", "cur_funnel", "cur_decon_ngram_bloom",
        "sim_ivfpq_topk", "sim_lsh_recall", "sketch_hist_merge",
        "cur_distill_nb", "cur_sample_weighted",
        "sketch_cm_merge", "sketch_bloom_merge",
        "rel_asof_forward", "rel_asof_nearest", "text_surprisal",
        "sketch_kmv_stream_replay", "stream_ewma_replay",
        # stalest driver evidence: the r2-vintage block (VERDICT r6 #2)
        "dedup_minhash_cand", "dedup_jaccard_adjacent", "dedup_simhash",
        "dedup_clusters", "sim_bruteforce_topk", "sim_lsh_topk",
        "sim_embedding_neardups",
        # then the r3-vintage block — spot-check its corners; the full
        # list lives in _rotate_for_driver_window (fn_b64e/fn_b64d/
        # fn_hexd/fn_hexe/fn_jenc/fn_jdec/xf_c2f/xf_copy spilled to
        # tier1: golden-value pytest coverage, lowest risk)
        "fn_rot13", "flt_topic", "xf_new", "val_rec", "ddl_gen",
        "rel_pricing_summary", "rel_recent_events",
    }
    assert tier0 <= first50, sorted(tier0 - first50)
    # tier0 must lead the dict so no later growth can push it out
    assert set(qs[:20]) == {
        "dedup_report", "dedup_exact_spans", "text_dup_span_frac",
        "dedup_span_removal", "dedup_span_keep_one",
        "cur_decontaminate_ngram", "cur_funnel", "cur_decon_ngram_bloom",
        "sim_ivfpq_topk", "sim_lsh_recall", "sketch_hist_merge",
        "cur_distill_nb", "cur_sample_weighted",
        "sketch_cm_merge", "sketch_bloom_merge",
        "rel_asof_forward", "rel_asof_nearest", "text_surprisal",
        "sketch_kmv_stream_replay", "stream_ewma_replay",
    }


def test_driver_window_prioritizes_unevidenced_queries():
    """Self-maintaining rotation invariant: every queries() entry that
    has NEVER appeared in any driver CORRECTNESS file must sit inside
    the 50-entry window the driver will hash this round — otherwise
    union coverage can never reach the full set."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    greens: set[str] = set()
    for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            d = json.load(open(f))
        except Exception:  # noqa: BLE001 - unreadable file = no evidence
            continue
        if isinstance(d, dict):
            greens |= set(d.keys())
    qs = list(E.queries())
    never = [k for k in qs if k not in greens]
    window = set(qs[:50])
    missing = [k for k in never if k not in window]
    # if there are more unevidenced entries than window slots, the
    # rotation can only fix it over multiple rounds — require best
    # effort: no slack slots while unevidenced entries wait outside
    if missing:
        assert len(never) > 50, (
            f"unevidenced queries left outside the driver window: {missing}"
        )


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_each_query_builds_a_plan(spark, name):
    """Every entry must at least analyze at sf0.001 (no execution)."""
    df = E.queries()[name](spark, SF_SMOKE)
    assert df.schema is not None and len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_each_query_surface_is_canon_safe(spark, name):
    """Driver-canon contract (VERDICT r5): no array/map/struct column
    may reach the gated surface — the driver's pandas canon dies on
    container cells (the literal r5 `err` rows). Library APIs keep the
    real array forms; the queries() wrapper must serialize them."""
    df = E.queries()[name](spark, SF_SMOKE)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.dataType.simpleString().startswith(("array<", "map<", "struct<"))
    ]
    assert not bad, bad
