"""Custom stateful streaming operators.

The reference is stateless per-message (SURVEY §2.6 'Streaming state:
none'); these are the upgrades a production ingest pipeline layers on
top, built on Structured Streaming's state store:

- ``dedup_stream`` — exactly-once-per-key admission within the
  watermark horizon (the streaming face of the exact-dedup operator);
- ``running_counts`` — per-key running aggregates via
  ``applyInPandasWithState``, the template for arbitrary custom state
  (the Spark-native replacement for the reference's per-worker mutable
  Lua state, but fault-tolerant and rescalable).

State sizing at scale: both operators key state by a bounded-cardinality
column and evict via watermark/timeout — state volume is O(active keys),
not O(stream length).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(
    messages: DataFrame,
    key_cols: Iterable[str] = ("topic", "payload"),
    time_col: str = "time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate messages (same key columns) arriving within the
    watermark horizon. State: one entry per distinct key, evicted once
    the watermark passes — bounded by arrival-rate × horizon, not by
    stream history."""
    return messages.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def running_counts(
    messages: DataFrame,
    key_col: str = "topic",
    time_col: str = "time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key running message count across micro-batches — custom
    state via applyInPandasWithState (Arrow-batched per group). Emits
    one updated (key, n) row per key per batch."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"key": [key[0]], "n": [n]})

    return (
        messages.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType="key STRING, n BIGINT",
            stateStructType="n BIGINT",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def ewma_anomalies(
    messages: DataFrame,
    key_col: str = "topic",
    value_col: str = "value",
    time_col: str = "time",
    alpha: float = 0.2,
    threshold: float = 3.0,
    warmup: int = 5,
    watermark: str = "1 hour",
    idle_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Per-key EWMA anomaly detector — the full custom-state template
    (beyond ``running_counts``'s counter): state is the exponentially
    weighted mean/variance per key; a row deviating more than
    ``threshold``·σ after ``warmup`` observations is emitted as an
    anomaly. Rows inside a batch are processed in (time, value) order
    so the result is deterministic for a given batch decomposition.

    State lifecycle at scale: three scalars per ACTIVE key, updated
    Arrow-batched per group; keys idle (in EVENT time) longer than
    ``idle_timeout_ms`` past the watermark are EVICTED via
    EventTimeTimeout, so state volume is O(active keys), never
    O(stream history) — the piece the reference's per-worker mutable
    Lua state cannot do fault-tolerantly. Event-time (not
    processing-time) timeout on purpose: eviction is then a
    deterministic function of the data and replays identically from a
    checkpoint — and a wall-clock timeout keeps scheduling micro-
    batches forever, which livelocks drain-style consumers
    (`processAllAvailable`)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        mean, var, n = state.get if state.exists else (0.0, 0.0, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([time_col, value_col], ignore_index=True)
        out: list[tuple] = []
        for i in range(len(rows)):
            x = rows[value_col].iloc[i]
            if x is None or pd.isna(x):
                continue
            x = float(x)
            if n >= warmup:
                sigma = max(var, 0.0) ** 0.5
                if sigma > 0 and abs(x - mean) > threshold * sigma:
                    out.append(
                        (key[0], rows[time_col].iloc[i], x,
                         round(mean, 6), round(sigma, 6))
                    )
            if n == 0:
                mean, var = x, 0.0
            else:
                d = x - mean
                mean += alpha * d
                var = (1.0 - alpha) * (var + alpha * d * d)
            n += 1
        state.update((float(mean), float(var), int(n)))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(wm + idle_timeout_ms, wm + 1))
        if out:
            yield pd.DataFrame(
                out, columns=["key", "event_time", "value", "ewma", "sigma"]
            )

    return (
        messages.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=(
                "key STRING, event_time TIMESTAMP, value DOUBLE,"
                " ewma DOUBLE, sigma DOUBLE"
            ),
            stateStructType="mean DOUBLE, var DOUBLE, n BIGINT",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def kmv_distinct_stream(
    messages: DataFrame,
    key_col: str = "topic",
    value_col: str = "payload",
    k: int = 64,
    time_col: str = "time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key streaming distinct-count via a KMV sketch as custom
    state — the streaming face of ``sketches.kmv_distinct`` (same
    md5-fraction hash, same (k−1)/x_k estimator), and the operator the
    batch module's docstring promises ("a production incremental
    variant keeps the k-set as partial-aggregation state").

    The hash is computed JVM-side BEFORE the stateful op (one
    `uniform_hash` projection), so Python only merges sorted floats:
    state per key is the k smallest distinct hash fractions — O(k)
    doubles regardless of stream length, the mergeable-summary
    property that makes the sketch exact-once-replayable from a
    checkpoint. Emits one updated (key, n_distinct_est, exact) row per
    key per batch; ``exact`` is true while the key has seen < k
    distinct values (the estimate is exact there)."""
    from hermod_spark.operators.sketches import uniform_hash

    hashed = messages.withWatermark(time_col, watermark).select(
        F.col(key_col).alias("key"), uniform_hash(F.col(value_col)).alias("h")
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        mins = list(state.get[0]) if state.exists else []
        seen = set(mins)
        for pdf in pdfs:
            for h in pdf["h"]:
                hf = float(h)
                if hf not in seen:
                    seen.add(hf)
                    mins.append(hf)
        mins.sort()
        del mins[k:]
        state.update((mins,))
        if len(mins) < k:
            est, exact = float(len(mins)), True
        else:
            # 4dp to match the batch sketch exactly
            est, exact = round((k - 1) / mins[k - 1], 4), False
        yield pd.DataFrame(
            {"key": [key[0]], "n_distinct_est": [est], "exact": [exact]}
        )

    return hashed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType="key STRING, n_distinct_est DOUBLE, exact BOOLEAN",
        stateStructType="mins ARRAY<DOUBLE>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
