"""Partitioned writes + retention-by-partition-drop (the Timescale
drop_chunks analogue) and partition pruning on read."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hermod_spark.sinks.retention import drop_partitions_before, list_partitions
from hermod_spark.sinks.writer import MultiTableWriter

UTC = dt.timezone.utc


@pytest.fixture
def partitioned_table(spark, tmp_path):
    rows = [
        (1, dt.datetime(2024, 1, 1, 5, tzinfo=UTC), 1.0),
        (2, dt.datetime(2024, 1, 2, 6, tzinfo=UTC), 2.0),
        (3, dt.datetime(2024, 1, 3, 7, tzinfo=UTC), 3.0),
    ]
    df = (
        spark.createDataFrame(rows, "id INT, ts TIMESTAMP, value DOUBLE")
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    )
    w = MultiTableWriter(base_path=str(tmp_path), partition_by=("day",))
    w.write({"metrics": df})
    return tmp_path


def test_partitioned_write_layout(partitioned_table):
    parts = list_partitions(str(partitioned_table), "metrics", "day")
    assert parts == ["2024-01-01", "2024-01-02", "2024-01-03"]


def test_retention_drops_old_partitions(spark, partitioned_table):
    dropped = drop_partitions_before(
        str(partitioned_table), "metrics", "day", cutoff="2024-01-03"
    )
    assert [d.partition for d in dropped] == ["day=2024-01-01", "day=2024-01-02"]
    remaining = spark.read.parquet(str(partitioned_table / "metrics"))
    assert [r["id"] for r in remaining.collect()] == [3]


def test_retention_dry_run_removes_nothing(spark, partitioned_table):
    dropped = drop_partitions_before(
        str(partitioned_table), "metrics", "day", cutoff="2024-01-03", dry_run=True
    )
    assert len(dropped) == 2
    assert spark.read.parquet(str(partitioned_table / "metrics")).count() == 3


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from hermod_spark.sinks.compaction import compact_table, parquet_file_count

    path = tmp_path / "t"
    df = spark.createDataFrame([(i,) for i in range(100)], "x INT")
    for _ in range(10):  # simulate micro-batch appends
        df.limit(10).repartition(2).write.mode("append").parquet(str(path))
    before = parquet_file_count(str(path))
    assert before >= 20
    results = compact_table(spark, str(tmp_path), "t", min_files=8, target_files=1)
    assert len(results) == 1 and not results[0]["skipped"]
    assert parquet_file_count(str(path)) == 1
    assert spark.read.parquet(str(path)).count() == 100


def test_compaction_skips_small_dirs(spark, tmp_path):
    from hermod_spark.sinks.compaction import compact_table

    path = tmp_path / "t2"
    spark.createDataFrame([(1,)], "x INT").write.parquet(str(path))
    assert compact_table(spark, str(tmp_path), "t2", min_files=8) == []


def test_partition_pruning_on_read(spark, partitioned_table):
    df = spark.read.parquet(str(partitioned_table / "metrics")).filter(
        F.col("day") == "2024-01-02"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan  # pruned at the source
    assert df.count() == 1
