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
