"""Route planner: ordered topic-filter routes → Catalyst-friendly plans.

Reference semantics (file:line into /root/reference):
- first-match-wins linear scan over routes in config order; no match →
  passthrough to table ``iot_raw`` — internal/router/router.go:344-363,
  default table router.go:210-213,394
- passthrough canonical record {time, topic, qos, retain, raw, json?}
  with ``json`` only when the payload parses — router.go:402-418,
  README.md:313-321
- per-route optional transform (row → 0..N records) — router.go:248-341

Spark-first design: first-match ordering is encoded structurally, not
imperatively. Two equivalent physical shapes are offered:

1. ``label(df)`` — ONE pass adding a ``_table`` column via a chained
   ``CASE WHEN`` (F.when) in route order. No shuffle, no duplicate
   scan; at 100 TB this is the shape you want feeding the multi-table
   sink (single scan, fan-out by filter on the label).
2. ``branches(df)`` — N filtered DataFrames (route i's predicate
   conjoined with the negation of routes 0..i-1) plus the passthrough
   remainder. Catalyst folds each compiled topic regex to a constant
   and can push the branch predicate into the scan; use when branches
   get genuinely different downstream plans.

Route filters are compiled ONCE driver-side to anchored regexes
(hermod_spark.functions.topic) — per-row work stays JVM-side.

Scale note (N routes): shape 1 evaluates at most N regexes per row with
short-circuit CASE semantics; shape 2 makes the planner emit O(N²)
negated terms across branches — fine for tens of routes, prefer shape 1
beyond that.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hermod_spark.functions.topic import topic_matches
from hermod_spark.plans.schema import validate_identifier

DEFAULT_TABLE = "iot_raw"  # router.go:394
QUARANTINE_TABLE = "_quarantine"


def quarantine_reason(
    time_col: str = "time",
    topic_col: str = "topic",
    payload_col: str = "payload",
) -> Column:
    """First-match structural-validity reason, NULL when the record is
    routable: null_payload → bad_json (try_parse_json, the same probe
    passthrough_record uses) → empty_topic → null_time. Order is part
    of the contract (the oracle mirrors it)."""
    return (
        F.when(F.col(payload_col).isNull(), F.lit("null_payload"))
        .when(F.try_parse_json(F.col(payload_col)).isNull(), F.lit("bad_json"))
        .when(
            F.col(topic_col).isNull() | (F.trim(F.col(topic_col)) == ""),
            F.lit("empty_topic"),
        )
        .when(F.col(time_col).isNull(), F.lit("null_time"))
    )


@dataclass
class Route:
    """One declarative route (router.go:32-39, config.go:51-58).

    ``transform`` is a DataFrame->DataFrame builder (the Spark-native
    replacement for the Lua script); None → passthrough projection.
    ``workers``/``queue_size`` are accepted for config parity; Spark's
    partitioning and backpressure replace them (SURVEY §2.7).
    """

    filter: str
    table: str
    transform: Callable[[DataFrame], DataFrame] | None = None
    workers: int = 1
    queue_size: int = 100

    def __post_init__(self) -> None:
        validate_identifier(self.table, strict=False)


class RoutePlanner:
    def __init__(self, routes: list[Route], default_table: str = DEFAULT_TABLE):
        self.routes = list(routes)
        self.default_table = validate_identifier(default_table, strict=False)

    def match_cols(self, topic: Column | str) -> list[Column]:
        return [topic_matches(r.filter, topic) for r in self.routes]

    def label_col(self, topic: Column | str) -> Column:
        """First-match route table as a Column — a route-ordered CASE
        chain, whose short-circuit evaluation IS first-match-wins."""
        expr: Column | None = None
        for r in self.routes:
            m = topic_matches(r.filter, topic)
            expr = F.when(m, F.lit(r.table)) if expr is None else expr.when(m, F.lit(r.table))
        if expr is None:
            return F.lit(self.default_table)
        return expr.otherwise(F.lit(self.default_table))

    def label(self, df: DataFrame, topic_col: str = "topic") -> DataFrame:
        return df.withColumn("_table", self.label_col(F.col(topic_col)))

    def label_with_quarantine(
        self,
        df: DataFrame,
        topic_col: str = "topic",
        payload_col: str = "payload",
        time_col: str = "time",
        quarantine_table: str = QUARANTINE_TABLE,
    ) -> DataFrame:
        """`label` plus dead-letter routing: structurally invalid
        records get ``_table = quarantine_table`` and a ``_reason``
        column instead of being dropped.

        The reference LOGS and skips bad messages (subscriber error
        logging, cmd/hermod/main.go:128-131); at 100 TB silent drops
        are unacceptable — the quarantine table preserves every byte
        for replay after a fix, and the reason column makes the
        failure mix a queryable metric (see the flt_quarantine gated
        query). Pure native exprs: one CASE per row, no second scan,
        no shuffle."""
        validate_identifier(quarantine_table, strict=False)
        reason = quarantine_reason(
            time_col=time_col, topic_col=topic_col, payload_col=payload_col
        )
        return df.withColumn("_reason", reason).withColumn(
            "_table",
            F.when(F.col("_reason").isNotNull(), F.lit(quarantine_table)).otherwise(
                self.label_col(F.col(topic_col))
            ),
        )

    def branches(
        self, df: DataFrame, topic_col: str = "topic"
    ) -> list[tuple[Route | None, DataFrame]]:
        """(route, branch) pairs in priority order; the final pair is
        ``(None, passthrough_remainder)`` — router.go:344-363."""
        out: list[tuple[Route | None, DataFrame]] = []
        topic = F.col(topic_col)
        prior: Column | None = None
        for r in self.routes:
            # null-safe match: topic_matches(NULL topic) is NULL, and a
            # NULL predicate excludes the row from BOTH the branch
            # filter and the ~prior remainder — the row would vanish
            # from apply() entirely while label() routes it to the
            # default table. Coalescing to False keeps the two shapes
            # equivalent and honors the no-match→passthrough guarantee
            # (router.go:344-363).
            m = F.coalesce(topic_matches(r.filter, topic), F.lit(False))
            pred = m if prior is None else (m & ~prior)
            out.append((r, df.filter(pred)))
            prior = m if prior is None else (prior | m)
        out.append((None, df if prior is None else df.filter(~prior)))
        return out

    def apply(self, df: DataFrame, topic_col: str = "topic") -> list[tuple[str, DataFrame]]:
        """Fully-planned (table, DataFrame) pairs: per-route transform
        (or passthrough projection) applied to each branch."""
        planned: list[tuple[str, DataFrame]] = []
        for route, branch in self.branches(df, topic_col):
            if route is None:
                planned.append((self.default_table, passthrough_record(branch)))
            elif route.transform is None:
                planned.append((route.table, passthrough_record(branch)))
            else:
                planned.append((route.table, route.transform(branch)))
        return planned


def passthrough_record(
    df: DataFrame,
    time_col: str = "time",
    topic_col: str = "topic",
    qos_col: str = "qos",
    retain_col: str = "retain",
    payload_col: str = "payload",
    keep: list[str] | None = None,
) -> DataFrame:
    """Canonical passthrough projection (router.go:402-418).

    {time, topic, qos, retain, raw, json} — ``json`` is the payload
    itself when it parses as JSON (object, array, or scalar — Go's
    json.Unmarshal accepts all), else null. Pure native exprs; the JSON
    validity probe is `try_parse_json` (VariantType), no Python.

    Missing qos/retain columns default to 0 / false (batch stand-in
    tables don't carry MQTT metadata).
    """
    cols = dict.fromkeys(df.columns)
    time_c = F.col(time_col) if time_col in cols else F.current_timestamp()
    qos_c = F.col(qos_col).cast("int") if qos_col in cols else F.lit(0)
    retain_c = F.col(retain_col) if retain_col in cols else F.lit(False)
    payload_c = (
        F.col(payload_col).cast("string") if payload_col in cols else F.lit(None).cast("string")
    )
    return df.select(
        *[F.col(c) for c in (keep or [])],
        time_c.alias("time"),
        F.col(topic_col).alias("topic"),
        qos_c.alias("qos"),
        retain_c.alias("retain"),
        payload_c.alias("raw"),
        F.when(F.try_parse_json(payload_c).isNotNull(), payload_c).alias("json"),
    )
