"""Bucketed co-located joins: the storage-layout half of the 100 TB
strategy (SCALE.md) — facts bucketed on the join key join WITHOUT any
exchange, demonstrated end-to-end."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_fact_fact_join_has_no_shuffle(spark, tmp_path, no_broadcast):
    suffix = uuid.uuid4().hex[:8]
    li, od = f"li_{suffix}", f"od_{suffix}"
    lineitem = spark.range(0, 2000).select(
        F.col("id").alias("l_orderkey"), (F.col("id") % 7).alias("l_quantity")
    )
    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 3).alias("o_status")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(tmp_path / li)).mode("overwrite").saveAsTable(li)
    )
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / od)).mode("overwrite").saveAsTable(od)
    )
    try:
        joined = spark.table(li).join(
            spark.table(od), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: bucket layout satisfies the join's distribution
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 1000
        # the unbucketed control DOES shuffle
        control = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        cplan = control._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in cplan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {li}")
        spark.sql(f"DROP TABLE IF EXISTS {od}")


def test_ensure_bucketed_refuses_foreign_location(spark):
    """ADVICE r8: ensure_bucketed_table must never rmtree a warehouse
    directory it didn't create (shared-warehouse concurrent-session
    hazard). A marker-less non-empty directory at the managed location
    raises instead of deleting."""
    import os
    import shutil
    import uuid
    from urllib.parse import urlparse

    from hermod_spark.sinks.writer import ensure_bucketed_table

    name = f"hermod_bkt_foreign_{uuid.uuid4().hex[:8]}"
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(wh, name.lower())
    os.makedirs(loc)
    with open(os.path.join(loc, "somebody-elses-data.parquet"), "w") as fh:
        fh.write("x")
    df = spark.range(10).select(F.col("id").alias("k"))
    try:
        with pytest.raises(RuntimeError, match="refusing to clear"):
            ensure_bucketed_table(spark, df, name, "k", 2)
        assert os.path.exists(os.path.join(loc, "somebody-elses-data.parquet"))
    finally:
        shutil.rmtree(loc, ignore_errors=True)


def test_ensure_layout_rebuilds_on_fingerprint_change(spark, tmp_path):
    """ADVICE r8: a regenerated source under the same tag/path must
    rebuild the derived copy — the content fingerprint in the owner
    marker invalidates the cache."""
    import uuid

    from hermod_spark.sinks.writer import (
        ensure_bucketed_table,
        ensure_partitioned_copy,
    )

    name = f"hermod_bkt_fp_{uuid.uuid4().hex[:8]}"
    d1 = spark.range(5).select(F.col("id").alias("k"))
    d2 = spark.range(9).select(F.col("id").alias("k"))
    try:
        assert ensure_bucketed_table(spark, d1, name, "k", 2, fingerprint="v1").count() == 5
        # same fingerprint: cached copy served even though df changed
        assert ensure_bucketed_table(spark, d2, name, "k", 2, fingerprint="v1").count() == 5
        # new fingerprint: rebuilt
        assert ensure_bucketed_table(spark, d2, name, "k", 2, fingerprint="v2").count() == 9
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    path = str(tmp_path / "pcopy")
    p1 = spark.range(4).select(F.col("id").alias("k"), (F.col("id") % 2).alias("p"))
    p2 = spark.range(8).select(F.col("id").alias("k"), (F.col("id") % 2).alias("p"))
    assert ensure_partitioned_copy(spark, p1, path, "p", fingerprint="v1").count() == 4
    assert ensure_partitioned_copy(spark, p2, path, "p", fingerprint="v1").count() == 4
    assert ensure_partitioned_copy(spark, p2, path, "p", fingerprint="v2").count() == 8


def test_partitioned_copy_refuses_foreign_complete_dataset(spark, tmp_path):
    """ADVICE r9: a COMPLETE parquet dataset (has _SUCCESS) with no
    _hermod_owner marker at the target path is someone else's data —
    the helper must refuse to overwrite it, mirroring the bucketed
    guard, instead of destroying it via mode('overwrite')."""
    import os

    from hermod_spark.sinks.writer import ensure_partitioned_copy

    path = str(tmp_path / "foreign")
    foreign = spark.range(6).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    foreign.write.partitionBy("p").parquet(path)  # plain write: no marker
    assert os.path.exists(os.path.join(path, "_SUCCESS"))

    mine = spark.range(3).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    with pytest.raises(RuntimeError, match="refusing to overwrite"):
        ensure_partitioned_copy(spark, mine, path, "p")
    # the foreign dataset is intact
    assert spark.read.parquet(path).count() == 6
