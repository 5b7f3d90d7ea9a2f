"""Multi-table sink conformance (reference: internal/storage/
storage.go:87-151 sorted+gated inserts; internal/router/router.go:222-242
multi-table fan-out; dry-run storage.go:139-143)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hermod_spark.plans.schema import IdentifierError, Schema, SchemaValidationError
from hermod_spark.sinks.writer import MultiTableWriter


@pytest.fixture
def labeled(spark):
    return spark.createDataFrame(
        [
            (1, 25.5, "sensor_readings"),
            (2, 30.0, "sensor_readings"),
            (3, 1.0, "sensor_events"),
        ],
        "id INT, value DOUBLE, _table STRING",
    )


def test_write_labeled_fans_out(spark, labeled, tmp_path):
    w = MultiTableWriter(base_path=str(tmp_path))
    results = w.write_labeled(labeled)
    assert [r["table"] for r in results] == ["sensor_events", "sensor_readings"]
    readings = spark.read.parquet(str(tmp_path / "sensor_readings"))
    events = spark.read.parquet(str(tmp_path / "sensor_events"))
    assert readings.count() == 2 and events.count() == 1
    assert "_table" not in readings.columns
    # sorted column order — storage.go:97-106
    assert readings.columns == sorted(readings.columns)


def test_write_dict_branches(spark, tmp_path):
    a = spark.createDataFrame([(1,)], "x INT")
    b = spark.createDataFrame([(2.0,)], "y DOUBLE")
    w = MultiTableWriter(base_path=str(tmp_path))
    w.write({"t_a": a, "t_b": b})
    assert spark.read.parquet(str(tmp_path / "t_a")).count() == 1
    assert spark.read.parquet(str(tmp_path / "t_b")).count() == 1


def test_dry_run_writes_nothing(spark, labeled, tmp_path):
    w = MultiTableWriter(base_path=str(tmp_path), dry_run=True)
    results = w.write_labeled(labeled)
    assert len(results) == 2
    assert all("plan" in r for r in results)  # the logged-SQL analogue
    assert not any(tmp_path.iterdir())  # nothing written


def test_identifier_gate_blocks_injection(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "x INT")
    w = MultiTableWriter(base_path=str(tmp_path))
    with pytest.raises(IdentifierError):
        w.write({"users; DROP TABLE students": df})


def test_column_gate_blocks_bad_names(spark, tmp_path):
    df = spark.createDataFrame([(1,)], ["column name"])
    w = MultiTableWriter(base_path=str(tmp_path))
    with pytest.raises(IdentifierError):
        w.write({"t": df})


def test_schema_validation_blocks_undeclared(spark, tmp_path):
    # integration_test.go:88-149: undeclared column -> error, zero inserts
    sch = Schema.declare({"declared": {"x": "int"}})
    df = spark.createDataFrame([(1, 2)], "x INT, y INT")
    w = MultiTableWriter(base_path=str(tmp_path), schema=sch)
    with pytest.raises(SchemaValidationError):
        w.write({"declared": df})
    assert not any(tmp_path.iterdir())


def test_manifest_counts_and_sorted_columns(spark, labeled):
    rows = {
        r["table_name"]: r
        for r in MultiTableWriter(dry_run=True).manifest(labeled).collect()
    }
    assert rows["sensor_readings"]["n_rows"] == 2
    assert rows["sensor_events"]["n_rows"] == 1
    assert rows["sensor_readings"]["insert_columns"] == "id, value"


def test_idempotent_foreach_batch_skips_replayed(spark, tmp_path):
    """A replayed micro-batch (same batch_id) must not duplicate rows —
    the exactly-once upgrade over the reference's at-most-once drops."""
    w = MultiTableWriter(base_path=str(tmp_path / "out"))
    fn = w.idempotent_foreach_batch(
        lambda df: {"t": df}, commit_dir=str(tmp_path / "commits")
    )
    batch = spark.createDataFrame([(1,), (2,)], "x INT")
    fn(batch, 7)
    fn(batch, 7)  # replay after simulated failure
    fn(batch, 8)  # a genuinely new batch still writes
    assert spark.read.parquet(str(tmp_path / "out" / "t")).count() == 4


def test_undeclared_table_skips_validation(spark, tmp_path):
    sch = Schema.declare({"declared": {"x": "int"}})
    df = spark.createDataFrame([(1, 2)], "x INT, y INT")
    w = MultiTableWriter(base_path=str(tmp_path), schema=sch)
    w.write({"other_table": df})  # router.go:230-237 — only declared tables
    assert spark.read.parquet(str(tmp_path / "other_table")).count() == 1


def test_jdbc_write_roundtrip_embedded_derby(spark, tmp_path):
    """Exercise the REAL JDBC branch (writer.py) against the embedded
    Derby database that ships in Spark's jars — the same code path the
    reference's Postgres/Timescale insert uses (storage.go:87-151),
    executed, not just code-reviewed. Verifies batched append semantics
    and the sorted-column insert order."""
    db = str(tmp_path / "derbydb")
    url = f"jdbc:derby:{db};create=true"
    opts = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.createDataFrame(
        [(1, 25.5, "a"), (2, 30.0, "b")], "id INT, value DOUBLE, name STRING"
    )
    w = MultiTableWriter(jdbc_url=url, jdbc_options=opts)
    out = w.write({"sensor_readings": df})
    assert out == [{"table": "sensor_readings", "columns": ["id", "name", "value"], "n_rows": 2}]

    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "sensor_readings")
        .options(**opts)
        .load()
    )
    # sorted column order survived the write (storage.go:97-106 parity)
    assert back.columns == ["id", "name", "value"]
    rows = sorted((r["id"], r["value"], r["name"]) for r in back.collect())
    assert rows == [(1, 25.5, "a"), (2, 30.0, "b")]

    # append mode: a second write adds, never truncates
    w.write({"sensor_readings": df})
    assert (
        spark.read.format("jdbc").option("url", url)
        .option("dbtable", "sensor_readings").options(**opts).load().count()
    ) == 4


def test_write_reports_observed_row_counts(spark, tmp_path):
    """n_rows in the write result comes from df.observe riding the
    write job — no extra count() action re-executing the branch."""
    from hermod_spark.sinks.writer import MultiTableWriter

    a = spark.createDataFrame([(1,), (2,), (3,)], "x INT")
    b = spark.createDataFrame([(9,)], "x INT")
    w = MultiTableWriter(base_path=str(tmp_path))
    res = {r["table"]: r for r in w.write({"ta": a, "tb": b})}
    assert res["ta"]["n_rows"] == 3
    assert res["tb"]["n_rows"] == 1
    assert spark.read.parquet(str(tmp_path / "ta")).count() == 3


def test_merge_branches_unions_same_table(spark):
    """dict(branches) used to keep only the LAST frame per table —
    two routes targeting one table silently lost the earlier branch's
    rows. _merge_branches unions them."""
    from hermod_spark.engine import _merge_branches

    a = spark.createDataFrame([(1,)], "x INT")
    b = spark.createDataFrame([(2,)], "x INT")
    c = spark.createDataFrame([(3,)], "y INT")
    merged = _merge_branches([("t", a), ("t", b), ("u", c)])
    assert sorted(r["x"] for r in merged["t"].collect()) == [1, 2]
    assert [r["y"] for r in merged["u"].collect()] == [3]


def test_ensure_bucketed_table_rejects_bad_name(spark):
    from hermod_spark.data import table
    from hermod_spark.plans.schema import SchemaValidationError
    from hermod_spark.sinks.writer import ensure_bucketed_table

    df = table(spark, "/root/testdata/sf0.001", "region")
    import pytest as _pytest

    for bad in ("other.victim", "x; DROP TABLE y", "../escape"):
        with _pytest.raises((SchemaValidationError, ValueError)):
            ensure_bucketed_table(spark, df, bad, "r_regionkey", 2)


def test_partitioned_copy_survives_crash_window(spark, tmp_path):
    """A kill between the overwrite and the owner-marker write used to
    brick the path forever (complete dataset, no owner) — the sibling
    'building' marker lets the next call rebuild."""
    import os

    from hermod_spark.data import table
    from hermod_spark.sinks.writer import (
        _OWNER_MARKER, ensure_partitioned_copy,
    )

    df = table(spark, "/root/testdata/sf0.001", "region")
    path = str(tmp_path / "part_copy")
    ensure_partitioned_copy(spark, df, path, "r_regionkey")
    # simulate the crash window: owner marker gone, building marker on
    os.remove(os.path.join(path, _OWNER_MARKER))
    with open(path + "._hermod_building", "w") as fh:
        fh.write("stale")
    got = ensure_partitioned_copy(spark, df, path, "r_regionkey")
    assert got.count() == df.count()
    assert os.path.exists(os.path.join(path, _OWNER_MARKER))
    assert not os.path.exists(path + "._hermod_building")
    # a genuinely foreign complete dataset (no building marker) still
    # refuses
    os.remove(os.path.join(path, _OWNER_MARKER))
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="refusing to overwrite"):
        ensure_partitioned_copy(spark, df, path, "r_regionkey")


def test_idempotent_foreach_batch_partial_failure_no_duplicates(spark, tmp_path):
    """Per-table markers: if table A commits and table B fails, the
    replayed batch must skip A — without the markers A received every
    row twice."""
    from hermod_spark.sinks.writer import MultiTableWriter

    base = str(tmp_path / "sink")
    commit = str(tmp_path / "commits")
    w = MultiTableWriter(base_path=base)
    calls = {"n": 0}

    def branches_of(batch_df):
        calls["n"] += 1
        fail_b = calls["n"] == 1
        b = batch_df if not fail_b else batch_df.select(
            (F.lit(1) / F.lit(0)).alias("boom")  # ANSI: throws on write
        )
        return {"a": batch_df, "b": b}

    fn = w.idempotent_foreach_batch(branches_of, commit_dir=commit)
    df = spark.createDataFrame([(1,), (2,)], "x INT")
    import pytest as _pytest

    with _pytest.raises(Exception):
        fn(df, 0)  # b's write throws AFTER a committed
    fn(df, 0)  # replay: a skipped, b written
    assert spark.read.parquet(f"{base}/a").count() == 2  # NOT 4
    assert spark.read.parquet(f"{base}/b").count() == 2
    fn(df, 0)  # fully replayed batch: no-op
    assert spark.read.parquet(f"{base}/a").count() == 2
