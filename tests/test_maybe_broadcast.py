"""maybe_broadcast (r10, VERDICT r9 #1): the size-aware hint.

A forced ``F.broadcast()`` on an O(SF) dimension is the one plan shape
that is fine at sf0.1 and fatal at 100 TB. These tests pin the helper's
contract: hint iff provably small (caller row bound, or Catalyst's
compile-time size estimate under the session threshold), otherwise
return the frame UNTOUCHED so AQE owns the strategy.
"""

from __future__ import annotations

import pytest

from hermod_spark.operators.joins import (
    BROADCAST_HINT_MAX_ROWS,
    _parse_size_bytes,
    maybe_broadcast,
)

from conftest import SF_SMOKE


def _hinted(df) -> bool:
    return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()


def test_parse_size_bytes():
    assert _parse_size_bytes("67108864") == 64 * 1024 * 1024
    assert _parse_size_bytes("64MB") == 64 * 1024 * 1024
    assert _parse_size_bytes("10m") == 10 * 1024 * 1024
    assert _parse_size_bytes("1g") == 1 << 30
    assert _parse_size_bytes("512k") == 512 * 1024
    assert _parse_size_bytes("-1") == -1
    assert _parse_size_bytes("10b") == 10


def test_hint_rows_bound_respected(spark):
    df = spark.range(10)
    assert _hinted(maybe_broadcast(df, hint_rows=25))
    # above the bound → the SAME frame comes back, no hint attached
    big = maybe_broadcast(df, hint_rows=BROADCAST_HINT_MAX_ROWS + 1)
    assert big is df


def test_small_scan_gets_stats_hint(spark):
    nation = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    assert _hinted(maybe_broadcast(nation))


def test_threshold_minus_one_disables_stats_hint(spark):
    nation = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert maybe_broadcast(nation) is nation
        # an explicit caller bound still hints — -1 only kills the
        # estimate path, not asserted-small frames
        assert _hinted(maybe_broadcast(nation, hint_rows=25))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_huge_estimate_defers_to_aqe(spark):
    """A join-product subtree has a conservative (huge) compile-time
    estimate — exactly the derived-aggregate case where the honest
    answer is 'unknown, let AQE decide'."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    prod = li.crossJoin(li.selectExpr("l_orderkey as k2")).groupBy(
        "l_orderkey"
    ).count()
    assert maybe_broadcast(prod) is prod


def test_explicit_max_bytes_overrides_session_conf(spark):
    nation = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    assert maybe_broadcast(nation, max_bytes=1) is nation
    assert _hinted(maybe_broadcast(nation, max_bytes=1 << 30))
