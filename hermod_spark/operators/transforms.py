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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
