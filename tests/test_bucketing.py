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
