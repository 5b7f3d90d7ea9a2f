"""Watermarked windowed aggregation — the streaming continuous
aggregate.

The reference delegates this workload to TimescaleDB (the commented
continuous aggregate in migrations/001_initial_schema.sql:38-53:
time_bucket('1 hour') × topic, AVG/MIN/MAX/COUNT). Structured
Streaming runs the same plan incrementally with real late-data
semantics the reference lacks entirely (SURVEY §2.6 'Streaming state:
none'): the watermark bounds state and admits late rows up to the
horizon instead of silently mis-bucketing them."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    df: DataFrame,
    time_col: str = "time",
    key_col: str = "topic",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is set) windowed
    avg/min/max/count per key. Works identically on batch and
    streaming frames; on streams the watermark enables state eviction
    + append-mode output."""
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    win = (
        F.window(time_col, window) if slide is None else F.window(time_col, window, slide)
    )
    return (
        df.groupBy(win.alias("bucket"), F.col(key_col))
        .agg(
            F.avg(value_col).alias("avg_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            F.count(value_col).alias("value_count"),
        )
        .select(
            F.col("bucket.start").alias("bucket_start"),
            F.col("bucket.end").alias("bucket_end"),
            key_col,
            "avg_value",
            "min_value",
            "max_value",
            "value_count",
        )
    )


def hourly_rollup_stream(messages: DataFrame, value_expr=None) -> DataFrame:
    """The continuous-aggregate workload on the canonical message
    stream: value parsed from the JSON payload (temperature), hourly
    tumbling windows, 2h watermark."""
    value = (
        value_expr
        if value_expr is not None
        else F.get_json_object(F.col("payload").cast("string"), "$.temperature").cast("double")
    )
    return windowed_agg(
        messages.withColumn("value", value),
        time_col="time",
        key_col="topic",
        window="1 hour",
        watermark="2 hours",
    )
