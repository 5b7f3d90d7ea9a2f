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


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "time",
    right_time: str = "time",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with an event-time interval
    bound: right rows join left rows with the same ``key`` whose
    timestamp lies in ``[left_time, left_time + within]``.

    Both sides carry a watermark and the join carries the time-range
    predicate — together they bound the join state Spark must retain
    (without the interval condition a stream-stream join would buffer
    both streams forever; with it, state older than watermark + within
    is evicted). Works identically on batch frames, where the interval
    condition is just a predicate.

    Outer variants (``how`` = left_outer/right_outer/full_outer) emit
    unmatched rows only once the watermark passes — exactly the
    late-data semantics the reference lacks."""
    if left.isStreaming:
        left = left.withWatermark(left_time, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_time, watermark)
    l, r = left.alias("l"), right.alias("r")
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)


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


def session_agg(
    df: DataFrame,
    time_col: str = "time",
    key_col: str = "topic",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Session-window aggregation per key: rows of a key separated by
    at most ``gap`` merge into one session (the boundary is INCLUSIVE —
    an event exactly ``gap`` after the last one extends the session; a
    new session needs a strictly larger quiet period). Works
    identically on batch and streaming frames — the batch form is the
    oracle for the streaming form (same `session_window` plan, same
    output schema).

    On streams the watermark is what makes sessions FINAL: a session
    closes only when the watermark passes its end + gap, so state per
    open session is O(aggregates), evicted on close, and late rows
    within the horizon still extend the right session — semantics the
    reference (which has no streaming state at all, SURVEY §2.6) can't
    express. Scale: state keyed by (key, session) — high-cardinality,
    hash-spread; per-session state is four scalars, never the row
    history."""
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return (
        df.groupBy(
            F.session_window(F.col(time_col), gap).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg(value_col).alias("avg_value"),
            F.min(time_col).alias("first_event"),
            F.max(time_col).alias("last_event"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "avg_value",
            "first_event",
            "last_event",
        )
    )


def decontaminate_stream(
    messages: DataFrame,
    probes: DataFrame,
    key,
    probe_key,
    k: int = 3,
    m: int = 4096,
    drop: bool = True,
):
    """Streaming Bloom decontamination: filter (or flag, ``drop=False``)
    stream rows whose ``key`` might belong to the static benchmark set
    ``probes`` — the ingest-time face of the batch
    :func:`sketches.bloom_decontaminate`.

    The static side is collapsed to its ≤m Bloom bit positions ONCE at
    plan build and shipped as a literal array (the same
    model-as-literals pattern as the IVF centroids), so the streaming
    plan is a pure stateless projection: no stream-static join, no
    state store, nothing to re-plan per micro-batch. Bloom semantics
    mean ``drop=True`` can only over-drop (bounded false positives,
    never false negatives) — the safe direction for decontamination.
    At 100 TB-of-probes scale the bit set saturates at m rows before
    leaving the probe aggregation, so the driver collect is bounded by
    m regardless of benchmark size."""
    from hermod_spark.operators.sketches import bloom_build, bloom_positions

    probed = probes.select(probe_key.alias("_k"))
    bits = sorted(r["pos"] for r in bloom_build(probed, "_k", k, m).collect())
    bit_arr = F.array(*[F.lit(int(p)) for p in bits])
    hit = F.forall(
        bloom_positions(key, k, m), lambda p: F.array_contains(bit_arr, p)
    )
    if drop:
        return messages.filter(~hit)
    return messages.withColumn("bloom_hit", hit)


def trending_topics(
    messages: DataFrame,
    time_col: str = "time",
    key_col: str = "topic",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed per-key counts — the streaming half of a trending
    top-k. Ranking inside a streaming aggregation is not expressible in
    append mode (a window's rank can change until the watermark closes
    it), so the contract splits: this incremental count aggregation
    runs as the stream, and :func:`topk_per_window` ranks each closed
    micro-batch output in ``foreachBatch`` — the standard Spark idiom
    for streaming top-k."""
    df = messages
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return (
        df.groupBy(F.window(time_col, window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col(key_col),
            "n_events",
        )
    )


def topk_per_window(counts: DataFrame, k: int = 3) -> DataFrame:
    """Rank a (bucket_start, key, n_events) counts frame to its top-k
    keys per bucket — the foreachBatch leg of the streaming trending
    pipeline (also works on the batch form for the oracle). The window
    partitions by bucket, so each sort sees only that bucket's keys —
    #keys rows, never raw events."""
    from pyspark.sql import Window

    w = Window.partitionBy("bucket_start").orderBy(
        F.col("n_events").desc(), F.col(counts.columns[1]).asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def with_ingest_observer(
    df: DataFrame,
    time_col: str = "time",
    payload_col: str = "payload",
    name: str = "ingest_metrics",
) -> DataFrame:
    """Attach per-micro-batch ingest observability via ``observe()``:
    row count, max event time (watermark-lag numerator — compare to
    the trigger's wall clock), and null-payload count, computed as
    accumulator-style aggregates WITH NO extra pass or shuffle over
    the data. On a stream the metrics surface on every
    ``QueryProgressEvent.observedMetrics[name]`` (drive dashboards /
    alerting from the listener); on a batch frame the same plan node
    feeds a registered ``Observation``.

    This is the operational counterpart of the reference's subscriber
    logging (cmd/hermod/main.go:119-131 logs drops per message) —
    Structured Streaming reports the same signals per batch from the
    engine itself, at zero marginal cost."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.max(F.col(time_col)).alias("max_event_time"),
        F.sum(
            F.when(F.col(payload_col).isNull(), 1).otherwise(0)
        ).alias("null_payloads"),
    )
