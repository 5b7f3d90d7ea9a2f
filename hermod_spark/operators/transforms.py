"""Per-message transform contract and the reference example transforms.

The reference's user-facing surface is a Lua ``transform(msg)`` that
receives ``{topic, payload, ts, json|nil}`` and returns 0..N records of
``{table?, columns{}}`` (contract: /root/reference/internal/router/
router.go:248-341, README.md:184-220). Here a transform is a
DataFrame->DataFrame builder of native Column expressions — the whole
point of the Spark re-design is that "call a function per row" becomes
"declare the projection once"; Catalyst then fuses it into the scan.

Row → 0..N-rows semantics (xf-new):
- 0-or-1: a ``filter`` before the projection (see ``multi_table``).
- 1-to-N across tables: one filtered+projected branch per table — a
  dict {table: DataFrame} consumed by the multi-table sink. Same
  fan-out as the reference's record loop (router.go:222-242) but
  expressed as N column-pruned single-scan branches.
- Opaque Python logic (the true Lua-script equivalent): compose with
  ``mapInPandas`` yielding exploded records — see
  ``hermod_spark.operators.dedup``/``similarity`` for the pattern; the
  example transforms below never need it.

Example transforms ported (examples/transform.lua, multi_table.lua,
routing_transform.lua; goldens in internal/lua/lua_test.go:108-125:
0°C → 32°F).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hermod_spark.data import ensure_min_partitions
from hermod_spark.plans.schema import IDENT_RE, Schema, SchemaValidationError


def c2f(celsius: Column | str) -> Column:
    """xf-c2f — Celsius→Fahrenheit, (c*9/5)+32 (transform.lua:19-22)."""
    c = F.col(celsius) if isinstance(celsius, str) else celsius
    return c * 9 / 5 + 32


def extract_sensor_id(topic: Column | str, pattern: str = r"sensors/([^/]+)") -> Column:
    """xf-extract — regex capture from topic with 'unknown' fallback
    (multi_table.lua:30,38). Lua's match returns nil on no-match; Spark's
    regexp_extract returns '' — nullif maps '' back to the nil path."""
    t = F.col(topic) if isinstance(topic, str) else topic
    return F.coalesce(F.nullif(F.regexp_extract(t, pattern, 1), F.lit("")), F.lit("unknown"))


def with_default(*cols: Column | str, default) -> Column:
    """xf-default — ``a or b or default`` coalescing chain
    (routing_transform.lua:24, multi_table.lua:39-41). Divergence note:
    Lua ``or`` also replaces ``false``; these are numeric fields, so
    coalesce is equivalent on all reference inputs."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.coalesce(*cs, F.lit(default))


def copy_except(df: DataFrame, handled: list[str], *derived: Column) -> DataFrame:
    """xf-copy — pass through every column not already handled, plus the
    derived ones (transform.lua:45-49)."""
    kept = [c for c in df.columns if c not in handled]
    return df.select(*kept, *derived)


def stamp_metadata(df: DataFrame, engine: str = "hermod") -> DataFrame:
    """xf-meta — processed_by / processed_at(unix seconds) stamping
    (transform.lua:52-53)."""
    return df.withColumn("processed_by", F.lit(engine)).withColumn(
        "processed_at", F.unix_timestamp()
    )


def celsius_transform(df: DataFrame, temp_col: str = "temperature") -> DataFrame:
    """The transform.lua projection: keep celsius, derive fahrenheit
    (transform.lua:19-22); golden 0→32 (lua_test.go:108-125)."""
    return df.withColumn("temperature_celsius", F.col(temp_col)).withColumn(
        "temperature_fahrenheit", c2f(temp_col)
    )


def multi_table(
    df: DataFrame,
    time_col: str = "time",
    topic_col: str = "topic",
    json_col: str = "json",
) -> dict[str, DataFrame]:
    """The multi_table.lua transform as two filtered branches
    (multi_table.lua:20-59, pinned by integration_test.go:151-224).

    Input: canonical message frame with parsed fields ``temperature``,
    ``humidity``, ``battery``, ``alert`` (nullable). Returns
    {table: DataFrame}; the 0..N-record semantics are the branch
    filters — a message with temperature AND alert lands in both
    tables, a non-JSON message in neither (multi_table.lua:24-26).
    """
    has_json = F.col(json_col).isNotNull()
    sensor = extract_sensor_id(topic_col)
    readings = (
        df.filter(has_json & (F.col("temperature").isNotNull() | F.col("humidity").isNotNull()))
        .select(
            F.col(time_col).alias("time"),
            sensor.alias("sensor_id"),
            with_default("temperature", default=0.0).alias("temperature"),
            with_default("humidity", default=0.0).alias("humidity"),
            with_default("battery", default=100.0).alias("battery"),
        )
    )
    events = (
        df.filter(has_json & F.col("alert").isNotNull())
        .select(
            F.col(time_col).alias("time"),
            sensor.alias("sensor_id"),
            F.lit("alert").alias("event_type"),
            F.col(json_col).alias("details"),
        )
    )
    return {"sensor_readings": readings, "sensor_events": events}


class TransformError(ValueError):
    """A record transform returned something other than a list of
    record dicts (the reference errors the message: router.go:291-305)."""


def record_transform(
    df: DataFrame,
    fn: Callable[[dict], list[dict]],
    *,
    default_table: str,
    schema: Schema | None = None,
    time_col: str = "time",
    topic_col: str = "topic",
    payload_col: str = "payload",
) -> DataFrame:
    """xf-new — the opaque row → 0..N-records transform envelope.

    The true equivalent of the reference's Lua contract
    (router.go:248-341, README.md:184-220) for transforms that can't be
    expressed as native Column builders. ``fn`` receives one message
    dict ``{topic, payload, ts, json|None}`` (ts RFC3339-style ISO
    string, json the parsed payload or None — router.go:256-267) and
    returns a list of ``{table?: str, columns: dict}`` records:

    - empty list → message emits nothing (0-row case);
    - missing ``table`` → ``default_table`` (router.go:222-228);
    - column names failing the identifier gate are SILENTLY skipped
      (router.go:330-332);
    - a declared ``schema`` drops records with undeclared columns —
      the offending RECORD is skipped, the job continues
      (router.go:230-237; one poisoned row must not abort a 100 TB
      run — route suspect traffic through the quarantine plan to keep
      the rejects);
    - a non-list return raises TransformError (router.go:291-305).

    Output: ``(table STRING, columns MAP<STRING,STRING>)`` — dynamic
    record maps, exactly the reference's Record shape; values are
    stringified (floats via repr → shortest round-trip). Downstream
    either casts specific keys or hands the frame to the multi-table
    sink.

    Scale shape: ``mapInPandas`` — Arrow-batched, per-partition Python,
    no shuffle; the 0..N fan-out happens inside the batch iterator so
    Spark never materializes per-row lists.
    """

    def _stringify(v) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (dict, list)):
            return json.dumps(v, sort_keys=True, separators=(",", ":"))
        return str(v)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            tables: list[str] = []
            columns: list[dict] = []
            for topic, payload, ts in zip(
                pdf["_topic"], pdf["_payload"], pdf["_ts"]
            ):
                parsed = None
                if payload is not None:
                    try:
                        parsed = json.loads(payload)
                    except (ValueError, TypeError):
                        parsed = None
                msg = {
                    "topic": topic,
                    "payload": payload,
                    # pd.notna, not `is not None`: a null timestamp
                    # arrives as pandas NaT, which is not None and
                    # isoformat()s to the literal string 'NaT'
                    "ts": ts.isoformat() if pd.notna(ts) else None,
                    "json": parsed,
                }
                recs = fn(msg)
                if not isinstance(recs, list):
                    raise TransformError(
                        f"transform must return a list of records, got {type(recs).__name__}"
                    )
                for rec in recs:
                    if not isinstance(rec, dict):
                        raise TransformError("each record must be a dict")
                    table = rec.get("table") or default_table
                    cols = {
                        k: _stringify(v)
                        for k, v in rec.get("columns", {}).items()
                        if isinstance(k, str) and IDENT_RE.match(k)
                    }
                    if schema is not None:
                        try:
                            schema.validate_record(table, cols)
                        except SchemaValidationError:
                            # reference semantics (router.go:230-237):
                            # an invalid record errors THAT message and
                            # the router continues — raising here would
                            # abort the whole job for one poisoned row
                            # (the failure mode the quarantine
                            # machinery exists to avoid)
                            continue
                    tables.append(table)
                    columns.append(cols)
            # dtype=object even when empty: an empty float64 column
            # cannot convert to MAP and would kill the partition
            yield pd.DataFrame(
                {
                    "table": pd.Series(tables, dtype="object"),
                    "columns": pd.Series(columns, dtype="object"),
                }
            )

    # dict -> MAP<STRING,STRING> conversion in the Python worker needs
    # the Arrow pandas converter; the bare NumPy path raises
    # ArrowNotImplementedError. Set it here — the engine cannot assume
    # the caller's session is configured. NOTE: this is a session-wide
    # conf (Spark has no per-query scope for it) — building this plan
    # also enables Arrow for the session's other toPandas /
    # createDataFrame conversions, a documented prerequisite rather
    # than a silent assumption.
    df.sparkSession.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Python stage parallelism = partition count: a single-file scan
    # would serialize every batch through ONE worker (measured: the
    # whole envelope pinned to one task). No-op on well-split inputs.
    staged = ensure_min_partitions(df).select(
        F.col(topic_col).alias("_topic"),
        F.col(payload_col).cast("string").alias("_payload"),
        F.col(time_col).alias("_ts"),
    )
    return staged.mapInPandas(batches, "table STRING, columns MAP<STRING,STRING>")


def legacy_transform(
    df: DataFrame,
    fn: Callable[[dict], dict],
    *,
    table: str,
    topic_col: str = "topic",
    payload_col: str = "payload",
    time_col: str = "time",
) -> DataFrame:
    """xf-legacy — the map→map single-table pipeline contract
    (internal/lua/lua.go:255-288, internal/pipeline/pipeline.go:33-68):
    the JSON-decoded payload (fallback ``{topic, payload}``) is merged
    with ``topic``, transformed to ONE output map, inserted into the
    configured table."""

    def adapter(msg: dict) -> list[dict]:
        data = msg["json"] if isinstance(msg["json"], dict) else {
            "topic": msg["topic"],
            "payload": msg["payload"],
        }
        data = {**data, "topic": msg["topic"]}  # pipeline.go:50-53
        out = fn(data)
        if not isinstance(out, dict):
            raise TransformError("legacy transform must return a dict")
        return [{"table": table, "columns": out}]

    return record_transform(
        df,
        adapter,
        default_table=table,
        topic_col=topic_col,
        payload_col=payload_col,
        time_col=time_col,
    )


def iot_metrics(
    df: DataFrame,
    time_col: str = "time",
    topic_col: str = "topic",
    json_col: str = "json",
) -> DataFrame:
    """routing_transform.lua:16-31 — JSON messages only, value =
    temperature or value or 0, raw = the JSON payload."""
    return df.filter(F.col(json_col).isNotNull()).select(
        F.col(time_col).alias("time"),
        F.col(topic_col).alias("device"),
        with_default("temperature", "value", default=0.0).alias("value"),
        F.col(json_col).alias("raw"),
    )


def route_records_udtf():
    """The Lua row→0..N record contract as a Spark 4 Python UDTF — the
    third execution shape for xf-new next to native-expr branches and
    mapInPandas, and the SQL-callable one: ``SELECT m.event_id, t.*
    FROM msgs m, LATERAL hermod_records(m.payload) t``.

    Per input payload it yields 0..N (table, temperature_c,
    temperature_f) records with the reference's semantics: unparseable
    JSON → zero records (router.go:308-314's nil-json path),
    non-numeric temperature → zero records, else the C→F record
    (transform.lua:19-22). Leave
    ``spark.sql.execution.pythonUDTF.arrow.enabled`` UNSET: measured on
    pyspark 4.1.2, the Arrow UDTF path is ~10x slower than default
    pickle for this small-row shape (each yielded tuple is wrapped
    through pandas individually — not pandas_udf-style whole-batch
    vectorization). The class carries no state, so executors
    parallelize it like any projection.

    Returns the UDTF object; register with
    ``spark.udtf.register("hermod_records", route_records_udtf())``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="tbl STRING, temperature_c DOUBLE, temperature_f DOUBLE")
    class RouteRecords:
        def eval(self, payload: str):
            if payload is None:
                return
            try:
                obj = json.loads(payload)
            except (ValueError, TypeError):
                return
            if not isinstance(obj, dict):
                return
            t = obj.get("temperature")
            if isinstance(t, bool) or not isinstance(t, (int, float)):
                return
            c = float(t)
            yield "temps", c, c * 9 / 5 + 32

    return RouteRecords
