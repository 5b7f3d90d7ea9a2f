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


def test_retention_plan_drives_partition_drop_e2e(spark, tmp_path):
    """VERDICT r8 #5: retention_drop_plan (the green oracle query) →
    apply_retention_plan on the date-partitioned copy → the reader
    sees ONLY surviving partitions, pruning still works, and surviving
    data is byte-identical (drop is metadata-only, never a rewrite)."""
    from hermod_spark.data import table
    from hermod_spark.operators.relational import retention_drop_plan
    from hermod_spark.sinks.retention import apply_retention_plan, list_partitions
    from hermod_spark.sinks.writer import ensure_partitioned_copy

    events = table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_by_day")
    part = ensure_partitioned_copy(
        spark,
        events.withColumn("event_date", F.to_date(F.col("ts"))),
        path,
        "event_date",
    )
    before = set(list_partitions(str(tmp_path), "events_by_day", "event_date"))
    keep_days = 7
    plan = retention_drop_plan(events, keep_days=keep_days)
    plan_days = {r["day"].date().isoformat() for r in plan.collect()}
    assert plan_days and plan_days < before  # a real drop, not everything

    # keep a fingerprint of one surviving partition's rows
    survivor = sorted(before - plan_days)[0]
    survivor_rows = sorted(
        map(tuple, part.filter(F.col("event_date") == survivor).collect())
    )

    dry = apply_retention_plan(path, "event_date", plan, dry_run=True)
    assert {d.partition.split("=")[1] for d in dry} == plan_days
    assert set(list_partitions(str(tmp_path), "events_by_day", "event_date")) == before

    dropped = apply_retention_plan(path, "event_date", plan)
    assert {d.partition.split("=")[1] for d in dropped} == plan_days
    after = set(list_partitions(str(tmp_path), "events_by_day", "event_date"))
    assert after == before - plan_days

    back = spark.read.parquet(path)
    seen = {r["event_date"].isoformat() for r in back.select("event_date").distinct().collect()}
    assert seen == after
    # surviving partition untouched (metadata-only drop)
    assert (
        sorted(map(tuple, back.filter(F.col("event_date") == survivor).collect()))
        == survivor_rows
    )
    # row counts line up: survivors = total − planned drops
    n_dropped = sum(r["n_rows"] for r in plan.collect())
    assert back.count() == events.count() - n_dropped


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
