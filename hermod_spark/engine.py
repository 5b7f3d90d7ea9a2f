"""The assembled engine: config → source → routes → transforms → sinks.

The Spark re-expression of the reference's main loop
(reference: cmd/hermod/main.go:100-199): where the Go binary wires
MQTT subscriber → Router worker pools → pgx inserts, this builds ONE
declarative plan — source frame → first-match labeling → per-route
transforms → multi-table writer — and runs it in batch or as a
Structured Streaming query. Also exposes the offline ``-sql`` mode
(DDL generation without touching broker/DB — main.go:202-237).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hermod_spark.config import Config
from hermod_spark.plans.routes import Route, RoutePlanner, passthrough_record
from hermod_spark.plans.schema import Schema, merge as schema_merge
from hermod_spark.sinks.writer import MultiTableWriter

TransformFn = Callable[[DataFrame], DataFrame]



def _merge_branches(branches) -> dict:
    """Ordered (table, DataFrame) pairs → {table: DataFrame}, UNIONING
    frames that target the same table. A plain dict(branches) keeps
    only the LAST frame per table — two routes writing one table (or a
    route targeting the passthrough default) silently lost every row
    of the earlier branch."""
    out: dict = {}
    for table, df in branches:
        out[table] = (
            df
            if table not in out
            else out[table].unionByName(df, allowMissingColumns=True)
        )
    return out


class Engine:
    """config + transform registry + declared schemas → runnable plans.

    ``transforms`` maps a route's ``script`` name to a
    DataFrame→DataFrame builder; ``schemas`` maps script names to
    declared ``Schema`` objects (the Lua ``schema`` global's
    replacement) for validation + DDL.
    """

    def __init__(
        self,
        cfg: Config,
        transforms: dict[str, TransformFn] | None = None,
        schemas: dict[str, Schema] | None = None,
    ):
        self.cfg = cfg
        self.transforms = transforms or {}
        self.schemas = schemas or {}
        missing = [
            r.script for r in cfg.routes if r.script and r.script not in self.transforms
        ]
        if missing:
            raise KeyError(f"routes reference unregistered transforms: {missing}")
        self.planner = RoutePlanner(
            [
                Route(
                    r.filter,
                    r.table,
                    transform=self.transforms.get(r.script) if r.script else None,
                    workers=r.workers,
                    queue_size=r.queue_size,
                )
                for r in cfg.routes
            ]
        )

    # --- offline DDL mode (main.go:202-237) ---------------------------

    def merged_schema(self) -> Schema:
        return schema_merge(*self.schemas.values())

    def generate_sql(self) -> str:
        return self.merged_schema().generate_sql()

    # --- plan construction --------------------------------------------

    def plan(
        self, messages: DataFrame, quarantine: bool = False
    ) -> list[tuple[str, DataFrame]]:
        """(table, DataFrame) branches: routed transforms + passthrough
        default — the whole router as one declarative plan.

        ``quarantine=True`` prepends a dead-letter branch: structurally
        invalid records (see :func:`plans.routes.quarantine_reason`)
        land raw + reason in ``_quarantine`` instead of poisoning a
        transform or being dropped (the upgrade over the reference's
        log-and-skip, cmd/hermod/main.go:128-131); only valid records
        flow into the routes.

        NOTE: with ``quarantine=True`` the returned branches share a
        PERSISTED tagged frame (so the reason expression runs once per
        row across the branch actions); this call leaves the cache
        entry to Spark's LRU eviction. Callers that drive the writes
        themselves — especially in a loop — should use
        :meth:`plan_cached` and unpersist the returned frame after
        their actions, as ``run_batch``/``run_stream`` do."""
        branches, _cached = self.plan_cached(messages, quarantine)
        return branches

    def plan_cached(
        self, messages: DataFrame, quarantine: bool = False
    ) -> tuple[list[tuple[str, DataFrame]], DataFrame | None]:
        """`plan` plus the persisted tagged frame (None without
        quarantine) so callers that run the branch ACTIONS can
        unpersist afterwards — run_batch/run_stream do."""
        if not quarantine:
            return self.planner.apply(messages), None
        from pyspark import StorageLevel

        from hermod_spark.plans.routes import QUARANTINE_TABLE, quarantine_reason

        # PERSIST the tagged frame so the reason really is computed
        # once per row (VERDICT r10 #6): every branch here is a
        # separate write ACTION, and uncached branches would each
        # re-run try_parse_json over the full payload from the scan —
        # N+1 evaluations per row across the quarantine + route
        # branches, not one. The cache costs one serialized
        # materialization (disk-spillable, the standard multi-sink
        # fan-out trade) and every branch then reads
        # InMemoryTableScan; tests/test_config_engine.py gates the
        # plan shape.
        tagged = messages.withColumn(
            "_qreason", quarantine_reason()
        ).persist(StorageLevel.MEMORY_AND_DISK)
        bad = (
            tagged.filter(F.col("_qreason").isNotNull())
            .withColumn("reason", F.col("_qreason"))
            .drop("_qreason")
        )
        good = tagged.filter(F.col("_qreason").isNull()).drop("_qreason")
        return [(QUARANTINE_TABLE, bad), *self.planner.apply(good)], tagged

    def replay_quarantine(
        self,
        quarantined: DataFrame,
        repair: Callable[[DataFrame], DataFrame] | None = None,
        base_path: str | None = None,
        reason_col: str = "reason",
    ) -> list[dict]:
        """Replay-after-fix for the dead-letter table — the second half
        of the quarantine promise ("every byte kept FOR REPLAY",
        plans/routes.py). Takes `_quarantine` rows (raw message columns
        + reason), applies the caller's ``repair`` (fix payloads,
        backfill topics — whatever the incident called for), and pushes
        the repaired frame through the SAME ``plan(quarantine=True)``
        route pipeline into the same sink: rows the repair actually
        fixed route to their real tables exactly as if they had arrived
        clean; rows still structurally invalid land back in
        `_quarantine` — replay is safely re-runnable, never a bypass
        of validation. `tests/test_quarantine_replay.py` proves parity
        with direct ingest of the fixed messages end-to-end."""
        msgs = quarantined.drop(reason_col)
        if repair is not None:
            msgs = repair(msgs)
        w = self.writer(base_path)
        branches, cached = self.plan_cached(msgs, quarantine=True)
        try:
            return w.write(_merge_branches(branches))
        finally:
            if cached is not None:
                cached.unpersist()

    def writer(self, base_path: str | None = None) -> MultiTableWriter:
        db = self.cfg.database
        return MultiTableWriter(
            base_path=base_path,
            jdbc_url=None if base_path else (db.jdbc_url() if db.host else None),
            jdbc_options={"user": db.user, "password": db.password} if db.host else {},
            schema=self.merged_schema() if self.schemas else None,
            dry_run=self.cfg.dry_run,
        )

    # --- execution ----------------------------------------------------

    def run_batch(
        self,
        messages: DataFrame,
        base_path: str | None = None,
        quarantine: bool = False,
    ) -> list[dict]:
        """Batch: route + transform + write each branch (optionally
        with the dead-letter quarantine branch prepended)."""
        w = self.writer(base_path)
        branches, cached = self.plan_cached(messages, quarantine)
        try:
            return w.write(_merge_branches(branches))
        finally:
            if cached is not None:
                cached.unpersist()

    def run_stream(
        self,
        messages: DataFrame,
        base_path: str | None = None,
        checkpoint: str | None = None,
        trigger_once: bool = True,
        exactly_once_commit_dir: str | None = None,
        quarantine: bool = False,
    ):
        """Streaming: the same plan under foreachBatch. Returns the
        started StreamingQuery (caller stops/awaits). With
        ``exactly_once_commit_dir`` set, replayed micro-batches are
        skipped via batch-id commit markers (idempotent sink)."""
        w = self.writer(base_path)

        # per-micro-batch cache hygiene: the quarantine plan persists
        # the tagged frame (one try_parse_json per row across N+1
        # branch actions); unpersist after each batch's writes or the
        # caches accumulate across triggers
        if exactly_once_commit_dir is not None:
            _pending: list[DataFrame] = []

            def _plan_fn(batch_df: DataFrame) -> dict:
                branches, cached = self.plan_cached(batch_df, quarantine)
                if cached is not None:
                    _pending.append(cached)
                return _merge_branches(branches)

            inner = w.idempotent_foreach_batch(
                _plan_fn, commit_dir=exactly_once_commit_dir
            )

            def handle(batch_df: DataFrame, batch_id: int) -> None:
                try:
                    inner(batch_df, batch_id)
                finally:
                    for c in _pending:
                        c.unpersist()
                    _pending.clear()
        else:

            def handle(batch_df: DataFrame, _batch_id: int) -> None:
                branches, cached = self.plan_cached(batch_df, quarantine)
                try:
                    w.write(_merge_branches(branches))
                finally:
                    if cached is not None:
                        cached.unpersist()

        writer = messages.writeStream.foreachBatch(handle)
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
