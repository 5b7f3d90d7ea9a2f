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
    """The driver hashes only the first 50 queries() entries; round 4
    front-loads the 32 entries never driver-checked in r01-r03 plus the
    queries whose hashed surface changed this round (VERDICT r3 #2)."""
    first50 = set(list(E.queries())[:50])
    required = {
        k
        for k in E.queries()
        if k.startswith(("text_", "cur_", "mm_", "emb_", "stream_", "sim_ivf_"))
    } | {"sketch_hll", "rel_histogram_equidepth", "rel_funnel", "rel_quantiles_approx"}
    assert required <= first50, sorted(required - first50)


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_each_query_builds_a_plan(spark, name):
    """Every entry must at least analyze at sf0.001 (no execution)."""
    df = E.queries()[name](spark, SF_SMOKE)
    assert df.schema is not None and len(df.columns) > 0
