"""Multi-table batched sink (snk-insert / snk-multi / snk-dryrun).

Reference semantics (file:line into /root/reference):
- one transform invocation may emit records for several tables; each
  record routes to its own table insert — internal/router/
  router.go:222-242
- inserts use sorted column order and parameterized SQL; identifiers
  are gated by `^[a-zA-Z_][a-zA-Z0-9_]*$` — internal/storage/
  storage.go:87-151, 31-36
- dry-run logs the SQL instead of executing — storage.go:139-143,
  flag cmd/hermod/main.go:32

Spark-first: the reference inserts ONE ROW PER STATEMENT; here each
micro-batch/table branch is one batched write (`foreachBatch` in
streaming, direct `DataFrameWriter` in batch) — identical semantics,
orders of magnitude fewer round-trips, and the documented improvement
over the reference (SURVEY §2.7: at-most-once row inserts become
per-batch atomic appends per table).

Targets: ``parquet`` (tests/local), ``jdbc`` (the reference's
Postgres/Timescale path — e2e-tested against EMBEDDED Apache Derby,
the in-process JDBC database Spark bundles: tests/test_jdbc_sink.py
writes multi-table branches and reads them back over jdbc)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hermod_spark.plans.schema import Schema, validate_identifier


@dataclass
class MultiTableWriter:
    """Fan a labeled DataFrame (or {table: df} dict) out to per-table
    appends.

    base_path: parquet root (one subdir per table), OR jdbc_url+options
    for the JDBC path. dry_run collects nothing and writes nothing —
    it returns the per-table plans and row counts, the Spark analogue
    of logging the SQL it would have run."""

    base_path: str | None = None
    jdbc_url: str | None = None
    jdbc_options: dict = field(default_factory=dict)
    schema: Schema | None = None
    dry_run: bool = False
    # Hive-style partition columns for parquet targets (e.g. a derived
    # date column): enables partition pruning on read and retention by
    # partition drop — the Spark analogue of Timescale hypertable
    # chunking (migrations/001_initial_schema.sql:27-35).
    partition_by: tuple = ()

    def _write_one(self, table: str, df: DataFrame) -> dict:
        validate_identifier(table, strict=True)
        for c in df.columns:
            validate_identifier(c, strict=True)
        if self.schema is not None:
            self.schema.validate_record(table, df.columns)
        # sorted column order — storage.go:97-106 determinism, preserved
        df = df.select(*sorted(df.columns))
        if self.dry_run:
            return {"table": table, "columns": df.columns, "plan": df._jdf.queryExecution().simpleString()}
        # observe() rides the write job itself — per-table written-row
        # counts with ZERO extra actions (a separate count() would
        # re-execute the branch plan)
        import uuid as _uuid

        from pyspark.sql import Observation

        if self.jdbc_url:
            # Complex values → JSON text before the insert, exactly the
            # reference's marshaling (storage.go:118-128: map/array
            # values json.Marshal'd); parquet targets keep native
            # nested types — only the SQL trip flattens.
            from pyspark.sql import types as T

            df = df.select(
                *[
                    F.to_json(F.col(f.name)).alias(f.name)
                    if isinstance(
                        f.dataType, (T.ArrayType, T.MapType, T.StructType)
                    )
                    else F.col(f.name)
                    for f in df.schema.fields
                ]
            )
        obs = Observation(f"write_{table}_{_uuid.uuid4().hex[:8]}")
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        if self.jdbc_url:
            writer = (
                df.write.format("jdbc")
                .option("url", self.jdbc_url)
                .option("dbtable", table)
                .options(**self.jdbc_options)
                .mode("append")
            )
            # Typed CREATE (storage.go:87-96 + schema.go:136-161): the
            # declared schema's SQL types reach the table Spark creates
            # via createTableColumnTypes; undeclared columns keep the
            # dialect default.
            if self.schema is not None and table in self.schema.tables:
                from ..plans.schema import jdbc_dialect

                types = self.schema.tables[table].create_table_column_types(
                    df.columns, dialect=jdbc_dialect(self.jdbc_url)
                )
                if types:
                    writer = writer.option("createTableColumnTypes", types)
            writer.save()
        elif self.base_path:
            writer = df.write.mode("append")
            parts = [c for c in self.partition_by if c in df.columns]
            if parts:
                writer = writer.partitionBy(*parts)
            writer.parquet(os.path.join(self.base_path, table))
        else:
            raise ValueError("MultiTableWriter needs base_path or jdbc_url")
        return {"table": table, "columns": df.columns, "n_rows": obs.get["rows"]}

    def write(self, branches: dict[str, DataFrame]) -> list[dict]:
        """Batch-mode multi-table write: {table: df} → N appends."""
        return [self._write_one(t, df) for t, df in branches.items()]

    def write_labeled(self, df: DataFrame, label_col: str = "_table") -> list[dict]:
        """Single labeled frame → per-table filtered appends
        (router.go:222-242's loop, as N column-pruned branches over one
        cached scan). The frame is persisted across the distinct-probe
        and the N branch writes — without it the (possibly expensive)
        upstream plan re-executes N+1 times — and unpersisted after."""
        cached = df.persist()
        try:
            tables = [
                r[0] for r in cached.select(label_col).distinct().collect()
            ]
            return [
                self._write_one(
                    t, cached.filter(F.col(label_col) == t).drop(label_col)
                )
                for t in sorted(tables)
            ]
        finally:
            cached.unpersist()

    def manifest(self, df: DataFrame, label_col: str = "_table") -> DataFrame:
        """Dry-run as a QUERY: the per-table write manifest — (table,
        n_rows, insert_columns) with the sorted column order the insert
        would use (storage.go:97-106) — computed as one aggregation,
        nothing written. The distributed analogue of storage.go:139-143
        logging the SQL instead of executing it."""
        insert_cols = ", ".join(sorted(c for c in df.columns if c != label_col))
        for c in df.columns:
            if c != label_col:
                validate_identifier(c, strict=True)
        return (
            df.groupBy(F.col(label_col).alias("table_name"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .withColumn("insert_columns", F.lit(insert_cols))
        )

    def foreach_batch(self, branches_of):
        """Adapter for streaming: ``writeStream.foreachBatch(
        writer.foreach_batch(lambda batch_df: {table: df, ...}))``."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            self.write(branches_of(batch_df))

        return _fn

    def idempotent_foreach_batch(self, branches_of, commit_dir: str):
        """Exactly-once streaming sink: foreachBatch is at-least-once
        (a batch can replay after a failure between write and
        checkpoint commit), so each batch id is recorded in
        ``commit_dir`` AFTER its writes; a replayed id is skipped.
        This is the upgrade over the reference's at-most-once
        queue-drop semantics (SURVEY §2.7): checkpoint + idempotence =
        exactly-once into append-only tables.

        The marker write is atomic (os.replace); at 100 TB the same
        pattern holds — the marker is one tiny file per micro-batch,
        or natively a Delta/Iceberg txn id."""
        os.makedirs(commit_dir, exist_ok=True)

        def _mark(name: str) -> None:
            tmp = os.path.join(commit_dir, name + ".tmp")
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write("committed")
            os.replace(tmp, os.path.join(commit_dir, name))

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            marker = f"batch-{batch_id}"
            if os.path.exists(os.path.join(commit_dir, marker)):
                return  # replayed batch: already fully written
            # PER-TABLE markers close the partial-failure window: if
            # table A's append succeeds and table B's throws, the
            # batch replays — without the table markers A would
            # receive every row a second time. A table whose marker
            # exists is skipped on replay; the batch marker lands only
            # after all tables committed.
            for t, df in branches_of(batch_df).items():
                tmark = f"batch-{batch_id}.{t}"
                if os.path.exists(os.path.join(commit_dir, tmark)):
                    continue  # this table already committed pre-crash
                self._write_one(t, df)
                _mark(tmark)
            _mark(marker)

        return _fn


_OWNER_MARKER = "_hermod_owner"  # leading "_": invisible to parquet scans


def _layout_fingerprint(df: DataFrame, fingerprint: str | None) -> str:
    """Cache key for a derived-layout copy. Default = schema hash
    (free — no Spark job); callers whose source data can be
    REGENERATED IN PLACE under the same tag/path should pass an
    explicit fingerprint (source mtime, row count, snapshot id) so the
    copy rebuilds on content change (ADVICE r8)."""
    import hashlib

    if fingerprint is not None:
        return str(fingerprint)
    return hashlib.sha256(df.schema.json().encode()).hexdigest()[:16]


def _read_owner(loc: str) -> str | None:
    try:
        with open(os.path.join(loc, _OWNER_MARKER), encoding="utf-8") as fh:
            return fh.read().strip()
    except OSError:
        return None


def _write_owner(loc: str, fp: str) -> None:
    tmp = os.path.join(loc, _OWNER_MARKER + ".tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(fp)
    os.replace(tmp, os.path.join(loc, _OWNER_MARKER))


def ensure_bucketed_table(
    spark,
    df: DataFrame,
    name: str,
    bucket_col: str,
    num_buckets: int,
    sort_cols: tuple = (),
    fingerprint: str | None = None,
) -> DataFrame:
    """Create-if-absent a bucketed, per-bucket-sorted copy of ``df`` as
    a catalog table and return it.

    This is the storage leg of the shuffle-free fact⋈fact join: two
    facts bucketed by their join key into the SAME bucket count join
    with ZERO shuffle exchange — the bucket layout IS the hash
    partitioning, persisted, so every downstream join/agg on the key
    reuses it for free (`tests/test_plans.py` pins the plan shape).
    At 100 TB this is the difference between re-shuffling 100 TB per
    join and never shuffling the fact tables at all; pick
    ``num_buckets`` so one bucket ≈ 0.5–2 GB (e.g. 4096 buckets for a
    4 TB fact). The `repartition(num_buckets, key)` before the write
    makes each task own exactly one bucket → one file per bucket, so
    the layout stays tight at any scale.

    Uses `saveAsTable` because bucket metadata lives in the catalog —
    a path-read of the same parquet would NOT get a bucketed scan. In
    this sandbox the catalog is per-session in-memory, so the copy is
    (re)written once per session; a real deployment has a persistent
    metastore and writes once ever.
    """
    # `name` reaches DROP TABLE sql text AND the warehouse path used
    # for rmtree — gate it like every other identifier (a dotted or
    # slashed name could drop a foreign table or escape the warehouse)
    validate_identifier(name, strict=True)
    validate_identifier(bucket_col, strict=True)
    import shutil
    from urllib.parse import urlparse

    fp = _layout_fingerprint(df, fingerprint)
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    loc = (
        os.path.join(wh.path, name.lower())
        if wh.scheme in ("", "file")
        else None
    )
    if spark.catalog.tableExists(name):
        if loc is None or _read_owner(loc) == fp:
            return spark.table(name)
        # same table name, different content fingerprint: the source
        # was regenerated under the same tag — rebuild (ADVICE r8)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    # The copy is a derived cache. With this sandbox's per-session
    # in-memory catalog, a PREVIOUS session may have left the managed
    # location on disk while the table registration died with it —
    # saveAsTable then fails with LOCATION_ALREADY_EXISTS. Clear the
    # stale location and rebuild — but ONLY a location this helper
    # owns (its `_hermod_owner` marker): with a shared warehouse dir
    # an unmarked directory may be another session's live table, and
    # deleting it mid-query is data loss (ADVICE r8). A persistent
    # metastore (the real deployment) takes the tableExists fast path
    # instead.
    if loc is not None and os.path.exists(loc):
        if _read_owner(loc) is None and os.listdir(loc):
            raise RuntimeError(
                f"refusing to clear {loc}: directory exists but carries no "
                f"{_OWNER_MARKER} marker — not a hermod-derived layout. "
                "Remove it manually or pick a different table name."
            )
        shutil.rmtree(loc)
    (
        df.repartition(num_buckets, bucket_col)
        .write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col, *sort_cols)
        .saveAsTable(name)
    )
    if loc is not None:
        _write_owner(loc, fp)
    return spark.table(name)


def ensure_partitioned_copy(
    spark,
    df: DataFrame,
    path: str,
    partition_col: str,
    fingerprint: str | None = None,
) -> DataFrame:
    """Create-if-absent a Hive-partitioned parquet copy of ``df`` at
    ``path`` (one directory per ``partition_col`` value) and return a
    reader over it.

    The storage leg of PARTITION PRUNING — the other half of the
    layout story next to `ensure_bucketed_table`: bucketing kills the
    join shuffle, date-partitioning kills the scan for time-windowed
    queries (a 3-day query over a 30-day table reads 3 directories,
    plan-gated via PartitionFilters in tests/test_plans.py). At 100 TB
    this is the hypertable-chunking analogue the reference gets from
    TimescaleDB (migrations/001_initial_schema.sql:27-35): retention =
    partition drop, time filters = directory pruning. Idempotent via
    the _SUCCESS marker plus a content fingerprint (`_hermod_owner`) —
    a regenerated source under the same path rebuilds instead of
    silently serving the stale copy (ADVICE r8)."""
    validate_identifier(partition_col, strict=True)
    fp = _layout_fingerprint(df, fingerprint)
    complete = os.path.exists(os.path.join(path, "_SUCCESS"))
    owner = _read_owner(path)
    if complete and owner == fp:
        return spark.read.parquet(path)
    # Same shared-location hazard as ensure_bucketed_table (ADVICE r9):
    # a complete parquet dataset with NO owner marker is someone
    # else's data — mode('overwrite') here would silently destroy it.
    # Only a marker that exists and mismatches means "our stale copy".
    building = path.rstrip("/") + "._hermod_building"
    if complete and owner is None and not os.path.exists(building):
        raise RuntimeError(
            f"refusing to overwrite {path}: complete parquet dataset with "
            f"no {_OWNER_MARKER} marker — not a hermod-derived copy. "
            "Remove it manually or pick a different path."
        )
    # the sibling "building" marker closes the crash window between
    # the overwrite (which deletes the old owner marker) and
    # _write_owner: a kill in that window used to leave a complete,
    # ownerless dataset that every future call refused forever
    with open(building, "w", encoding="utf-8") as fh:
        fh.write(fp)
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    _write_owner(path, fp)
    os.remove(building)
    return spark.read.parquet(path)
