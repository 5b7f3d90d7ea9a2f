"""Relational query surface over the star schema.

The reference has NO relational engine (SURVEY §2.6) — its analytical
workload is delegated to TimescaleDB: the hourly continuous aggregate
(migrations/001_initial_schema.sql:38-53) and doc examples
(README.md:520-527). Spark provides joins/aggs/windows/sorts/set-ops
natively; this module exposes them through engine-shaped builders so
the oracle can hash-check each one.

Scale posture baked in:
- FIXED-cardinality frames (region=5, nation=25, literal tier tables,
  1-row global aggregates, #types-row bounds) are explicit
  ``broadcast()`` — provably small at any scale; O(SF) dimensions
  (customer/supplier/part and aggregates derived from them) take
  :func:`hermod_spark.operators.joins.maybe_broadcast` instead — a
  hint only while the compile-time size estimate is under the session
  threshold, otherwise the plan ships unhinted and AQE picks
  broadcast-vs-shuffle from the ACTUAL runtime size (r10);
- aggregations are plain groupBy → map-side partial aggregation is
  automatic; decimal-cast sums keep money math exact AND make results
  bit-reproducible across engines and partitionings (float sums are
  order-dependent; a 100 TB re-run should not flap the answer);
- top-k per group uses a window over a single shuffle, not a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hermod_spark.operators.joins import maybe_broadcast


# Exact, order-independent money arithmetic. Precisions are chosen so
# every product stays within decimal(38,_) WITHOUT precision-loss
# rounding (whose rules differ between engines): price(12,4) x
# rate(7,4) -> (20,8); x rate again -> (28,12). Sums of decimals are
# exact in any engine and any partitioning -- a 100 TB re-run cannot
# flap the answer the way float summation order can.
PRICE = "decimal(12,4)"
RATE = "decimal(6,4)"


def dec(col, typ: str = PRICE):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dbl(decimal_col):
    """decimal → double for result columns, via round-to-scale-4 first.

    Casting a high-scale decimal (e.g. the (28,12) charge sum) straight
    to double is correctly-rounded in the JVM but not in every engine —
    DuckDB converts int128/10^s with two roundings, off by 1 ulp. At
    scale 4 the unscaled value fits in 2^53 for any test-scale sum, so
    int→double is exact and the single division rounds identically
    everywhere: bit-reproducible results.

    Width is (38,4), NOT (18,4): a returnflag-group charge sum at the
    100 TB design point exceeds 10^14, and a (18,4) cast would
    silently overflow to NULL (or throw under ANSI) even though the
    upstream (38,12) sum was fine. Same values wherever (18,4) fit."""
    return F.round(decimal_col, 4).cast("decimal(38,4)").cast("double")


def one_minus(rate_col: str):
    return F.lit(1).cast(RATE) - dec(rate_col, RATE)


def one_plus(rate_col: str):
    return F.lit(1).cast(RATE) + dec(rate_col, RATE)


def pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-01") -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical partial-agg
    workload. All sums decimal-exact, averages derived from exact sums
    so every engine computes the same doubles."""
    li = lineitem.filter(F.col("l_shipdate") < F.lit(ship_before).cast("timestamp"))
    disc_price = dec("l_extendedprice") * one_minus("l_discount")
    charge = disc_price * one_plus("l_tax")
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).alias("_sq"),
        F.sum(dec("l_extendedprice")).alias("_sbp"),
        F.sum(disc_price).alias("_sdp"),
        F.sum(charge).alias("_sc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    n = F.col("count_order")
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_sq").cast("double").alias("sum_qty"),
        F.col("_sbp").cast("double").alias("sum_base_price"),
        dbl(F.col("_sdp")).alias("sum_disc_price"),
        dbl(F.col("_sc")).alias("sum_charge"),
        (F.col("_sq").cast("double") / n).alias("avg_qty"),
        (F.col("_sbp").cast("double") / n).alias("avg_price"),
        n,
    ).orderBy("l_returnflag", "l_linestatus")


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Fact⋈fact shuffle join + broadcast dim chain: revenue per nation.
    nation/region are FIXED 25/5-row enumerations (broadcast at any
    scale); customer is O(SF) — size-conditional hint so the same plan
    degrades to an AQE shuffle join at 100 TB instead of OOMing the
    build side (r10, VERDICT r9 #1). lineitem⋈orders is the only
    unconditional shuffle pair."""
    rev = dec("l_extendedprice") * one_minus("l_discount")
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(nation, hint_rows=25), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(maybe_broadcast(region, hint_rows=5), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("r_name", "n_name")
        .agg(dbl(F.sum(rev)).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("r_name", "n_name")
    )


def top_customers_per_nation(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, k: int = 3
) -> DataFrame:
    """Window-function top-k: rank customers by total spend within each
    nation. One shuffle for the agg, one for the window partition —
    never a self-join."""
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).cast("double").alias("total_spend"))
        .join(maybe_broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(nation, hint_rows=25), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("total_spend"), F.asc("c_custkey"))
    return (
        spend.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("n_name", "c_name", "total_spend", "rnk")
        .orderBy("n_name", "rnk")
    )


def order_priority_rollup(orders: DataFrame) -> DataFrame:
    """Grouping-sets aggregation: order counts by (status, priority)
    with ROLLUP subtotals — grouping_id disambiguates null-vs-subtotal."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
            F.grouping_id().alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def running_order_total(orders: DataFrame, custkey: int | None = None) -> DataFrame:
    """Analytic frame window: per-customer running revenue ordered by
    order date — cumulative sums over an unbounded-preceding frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = orders
    if custkey is not None:
        df = df.filter(F.col("o_custkey") == custkey)
    return df.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )  # unsorted: O(orders) output; the window already sorted within keys


def part_supplier_overlap(lineitem: DataFrame) -> DataFrame:
    """Set operations: parts shipped by supplier 1 INTERSECT supplier 2,
    and EXCEPT, via the engine's set-op surface."""
    s1 = lineitem.filter(F.col("l_suppkey") == 1).select("l_partkey")
    s2 = lineitem.filter(F.col("l_suppkey") == 2).select("l_partkey")
    both = s1.intersect(s2).withColumn("which", F.lit("both"))
    # subtract == SQL EXCEPT (set semantics); exceptAll would keep a
    # value whose multiplicity in s1 exceeds its multiplicity in s2
    only1 = s1.subtract(s2).withColumn("which", F.lit("only_s1"))
    return both.unionByName(only1)  # unsorted: O(parts) output


def hourly_event_rollup(events: DataFrame) -> DataFrame:
    """THE reference analytical workload: the TimescaleDB continuous
    aggregate (migrations/001_initial_schema.sql:38-53) —
    time_bucket('1 hour') × topic with avg/min/max/count — expressed as
    date_trunc groupBy. In streaming mode the same plan runs under
    ``withWatermark`` (hermod_spark.streaming.windows)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.col("event_type").alias("topic"),
        )
        .agg(
            F.sum(dec("value")).cast("double").alias("_sum"),
            F.count(F.col("value")).alias("value_count"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            "bucket",
            "topic",
            (F.col("_sum") / F.col("value_count")).alias("avg_value"),
            "min_value",
            "max_value",
            "value_count",
        )
        .orderBy("bucket", "topic")
    )


def recent_events(events: DataFrame, n: int = 10) -> DataFrame:
    """README.md:520-521 — ORDER BY timestamp DESC LIMIT n (tie-broken
    by event_id so the row set is deterministic)."""
    return events.orderBy(F.desc("ts"), F.desc("event_id")).limit(n)


def customers_with_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi/anti join surface: customers tagged by order existence.

    ``left_semi``/``left_anti`` never materialize the right side's
    columns, so at scale the orders side reduces to a broadcast/shuffled
    key set — strictly cheaper than an outer-join-then-filter."""
    keys = orders.select("o_custkey")
    with_orders = customer.join(keys, customer.c_custkey == keys.o_custkey, "left_semi")
    without = customer.join(keys, customer.c_custkey == keys.o_custkey, "left_anti")
    return (
        with_orders.select("c_custkey", F.lit("with_orders").alias("which"))
        .unionByName(without.select("c_custkey", F.lit("no_orders").alias("which")))
    )


def order_status_cube(orders: DataFrame) -> DataFrame:
    """CUBE over (status, order year): every grouping-set combination
    with a GROUPING id — one pass, Spark expands the sets internally."""
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .cube("o_orderstatus", "order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
            (F.grouping("o_orderstatus") * 2 + F.grouping("order_year")).alias("gid"),
        )
    )


def value_quantiles(
    events: DataFrame, probs: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Per-event-type quantiles as EXACT order statistics: the value at
    rank ceil(p·n), ties broken by event_id. No interpolation — the
    answer is an element of the data, so it is bit-identical in every
    engine and under any partitioning (interpolating quantiles differ
    in float rounding between engines). One shuffle for the window
    sort; at scale prefer approx_percentile for a sketch, this for the
    audited-exact path."""
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    ranked = (
        events.filter(F.col("value").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("event_type")))
    )
    aggs = [
        F.max(
            F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("value"))
        ).alias(n)
        for p, n in zip(probs, quantile_column_names(probs))
    ]
    return ranked.groupBy("event_type").agg(*aggs)


# sentinel join key for the NULL group (equi-joins drop NULL keys; the
# sentinel keeps the NULL group flowing through the metadata joins)
_NULL_KEY = "\x00<null-group>"


def quantile_column_names(probs: tuple[float, ...]) -> list[str]:
    """p0.29 → 'p29' (round, not truncate — int(0.29*100) is 28 in
    binary float). Duplicate/colliding probs are a caller bug: fail
    loudly rather than emit two identically-named columns."""
    names = [f"p{int(round(p * 100))}" for p in probs]
    if len(set(names)) != len(names):
        raise ValueError(f"probs {probs} collide into duplicate columns {names}")
    return names


def value_quantiles_twopass(
    events: DataFrame,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    width: float = 5.0,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    max_buckets_per_group: int = 32768,
) -> DataFrame:
    """EXACT per-type quantiles, scale-safe: the same order statistics
    as :func:`value_quantiles` (value at rank ceil(p·n), ties by
    event_id) without its killer window — `row_number` partitioned by
    event_type alone sorts the WHOLE table in #types partitions, and
    AQE cannot split window exchanges.

    Two passes (r5 shape — one eager pre-agg + a one-scan refine plan;
    replaces r4's extra min/max pre-agg, which cost a third full scan
    and regressed ~2×; VERDICT r4 #3):

    1. histogram (the ONE eager job): count rows per (group,
       ``floor(asinh(value/width)·K)``) bucket — a map-side-combinable
       aggregation. asinh is monotonic over ALL doubles with a bounded
       range (|asinh(x)| ≤ ~710.48 for any finite double), so the
       bucket-index range — and therefore the collected histogram —
       is ≤ ``max_buckets_per_group`` per group BY CONSTRUCTION, with
       no prior knowledge of the value range (K =
       max_buckets_per_group/1421). This closes the r3 pathological-
       range driver-OOM case without r4's extra min/max pass: a
       ±1e12-range group simply lands in log-spaced buckets instead
       of 4e11 uniform ones.
    2. refine (lazy, in the returned plan): from the cumulative
       histogram, each target rank ceil(p·n) lands in exactly one
       bucket. Only those ≤ len(probs) buckets per group are
       re-scanned and sorted, with the window partitioned by (group,
       bucket) — each sort partition is ONE bucket, never the table.
       The in-bucket row_number plus the exact cumulative count below
       the bucket reconstructs the exact global (value, tie) rank.

    asinh-bucketing is monotonic, so in-bucket order + bucket order is
    the global order and the answer is bit-identical to the
    single-window exact query — same DuckDB oracle, hash-green.
    Near zero the granularity is ~width/K (finer than ``width``); at
    magnitude m it is ~m/K (log-spaced). A refine bucket therefore
    holds ~n/(K·span) rows — at very large per-group n, raise
    ``max_buckets_per_group`` to shrink refine partitions (the
    histogram collect grows linearly with it; 32768 ≈ a few MB per
    group worst-case, pathological ranges only).

    Generic over (group_col, value_col, id_col) — `cur_length_filter`
    reuses it for document-length percentiles. The metadata joins run
    on a string-normalized group key (`_grpk`: cast-to-string, NULL →
    sentinel) so non-string group columns and the NULL group both
    survive the equi-joins; the ORIGINAL typed group value is carried
    alongside and restored on output, matching the one-window exact
    form exactly.

    Eager by design: the histogram pass runs a Spark job at plan-build
    time — its result is the literal bucket metadata the returned plan
    embeds (unlike lsh_topk, whose model is seed-derived and therefore
    lazy)."""
    import math

    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    names = quantile_column_names(probs)
    vals = events.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_grp"),
        F.coalesce(F.col(group_col).cast("string"), F.lit(_NULL_KEY)).alias("_grpk"),
        F.col(value_col).alias("_val"),
        F.col(id_col).alias("_tie"),
    )
    spark = events.sparkSession
    # |asinh(x)| ≤ asinh(max double) ≈ 710.48 for any finite double, so
    # bucket indexes span ≤ 2·710.48·K + 1 ≤ max_buckets_per_group.
    # asinh is evaluated on |v| with the sign restored afterwards:
    # Spark's ASINH is the naive log(x + sqrt(x²+1)), which cancels to
    # -inf for NEGATIVE x in the wide band where sqrt(x²+1) == |x| in
    # double (≈ -1.3e154 < x < -6.7e7) — that collapse is non-monotonic
    # against the correctly-computed buckets of even more negative
    # values. On non-negative input the formula never cancels.
    k_scale = max_buckets_per_group / 1421.0
    vd = F.col("_val").cast("double")
    mag_bucket = F.floor(
        F.asinh(F.abs(vd) / F.lit(float(width))) * F.lit(k_scale)
    ).cast("long")
    bucket_expr = F.when(vd < 0, -mag_bucket).otherwise(mag_bucket)
    bucketed = vals.withColumn("bucket", bucket_expr)
    hist = (
        bucketed.groupBy("_grpk", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    per_type: dict[str, list[tuple[int, int]]] = {}
    for r in hist:
        per_type.setdefault(r["_grpk"], []).append((r["bucket"], r["cnt"]))

    cand_rows = []  # (_grpk, bucket, base = rows in lower buckets)
    rank_rows = []  # (_grpk, rank_p0, rank_p1, ...)
    for et, lst in per_type.items():
        lst.sort()
        n = sum(c for _, c in lst)
        targets = [math.ceil(p * n) for p in probs]
        rank_rows.append((et, *targets))
        cum = 0
        for b, c in lst:
            if any(cum < t <= cum + c for t in targets):
                cand_rows.append((et, b, cum))
            cum += c

    cand_meta = spark.createDataFrame(
        cand_rows, "_grpk string, bucket long, base long"
    )
    rank_meta = spark.createDataFrame(
        rank_rows, "_grpk string, " + ", ".join(f"_r_{c} long" for c in names)
    )
    w = Window.partitionBy("_grpk", "bucket").orderBy(
        F.col("_val").asc(), F.col("_tie").asc()
    )
    ranked = (
        bucketed.join(F.broadcast(cand_meta), ["_grpk", "bucket"])
        .withColumn("rn", F.row_number().over(w) + F.col("base"))
        .join(F.broadcast(rank_meta), "_grpk")
    )
    aggs = [
        F.max(F.when(F.col("rn") == F.col(f"_r_{c}"), F.col("_val"))).alias(c)
        for c in names
    ]
    # group by the ORIGINAL typed value (1:1 with _grpk by construction)
    return ranked.groupBy(F.col("_grp").alias(group_col)).agg(*aggs)


def value_quantiles_approx(
    events: DataFrame,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based per-type quantiles: ONE map-side-combinable
    aggregation (Greenwald-Khanna via `approx_percentile`), error
    bounded by 1/accuracy of rank. The cheapest shape at 100 TB — no
    window, no second pass, mergeable partial sketches. Values are
    sketch-dependent, so this has no cross-engine oracle; the
    error-bound test pins it against the exact path instead."""
    aggs = [
        F.percentile_approx("value", F.lit(p), F.lit(accuracy)).alias(n)
        for p, n in zip(probs, quantile_column_names(probs))
    ]
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(*aggs)
    )


def value_quantiles_approx_checked(
    events: DataFrame,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Hash-checkable wrapper around :func:`value_quantiles_approx`:
    instead of exposing the sketch-dependent estimates (which no other
    engine can reproduce), expose the *claim* the sketch makes — that
    each returned value's true rank sits within n/accuracy of the
    target rank — as booleans, alongside the exact per-type row count.

    A cross-engine oracle computes the exact surface (`n` and literal
    TRUE bounds) so a drifting sketch turns the row red instead of
    being unverifiable.  Production callers use the unchecked
    :func:`value_quantiles_approx` (one mergeable agg); this wrapper
    adds a second scan + a #types-row broadcast join, which is
    verification cost, not query cost."""
    names = quantile_column_names(probs)
    approx = value_quantiles_approx(events, probs, accuracy)
    base = events.filter(F.col("value").isNotNull()).select("event_type", "value")
    joined = base.join(F.broadcast(approx), "event_type")
    rank_aggs = [F.count(F.lit(1)).alias("n")]
    for c in names:
        rank_aggs.append(
            F.sum((F.col("value") <= F.col(c)).cast("long")).alias(f"_{c}_le")
        )
        rank_aggs.append(
            F.sum((F.col("value") < F.col(c)).cast("long")).alias(f"_{c}_lt")
        )
    counted = joined.groupBy("event_type").agg(*rank_aggs)
    tol = F.greatest(F.lit(1), F.ceil(F.col("n") / F.lit(accuracy)))
    checks = []
    for p, c in zip(probs, names):
        target = F.ceil(F.lit(p) * F.col("n"))
        # the value occupies rank interval [lt+1, le]; in-bounds iff that
        # interval overlaps [target - tol, target + tol] (ties included)
        checks.append(
            (
                (F.col(f"_{c}_le") >= target - tol)
                & (F.col(f"_{c}_lt") + F.lit(1) <= target + tol)
            ).alias(f"{c}_ok")
        )
    return counted.select("event_type", "n", *checks)


def event_grouping_sets(events: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS — the general form `rollup`/`cube`
    specialize: per-type totals, per-(type, day) details, and the
    grand total in ONE pass (Spark expands the sets inside a single
    aggregation; no union of three scans). GROUPING ids disambiguate
    the null-as-aggregate rows."""
    framed = events.select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    return (
        framed.groupingSets(
            [["event_type"], ["event_type", "day"], []], "event_type", "day"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
            (F.grouping("event_type") * 2 + F.grouping("day")).alias("gid"),
        )
    )


def retention_drop_plan(events: DataFrame, keep_days: int = 7) -> DataFrame:
    """Retention as a QUERY: the daily partitions a drop-before policy
    would remove (everything older than max(day) − keep_days), with
    per-partition row counts — the planning half of
    `sinks.retention.drop_partitions_before`, computed as one rollup +
    a scalar broadcast. At 100 TB the real drop is a metadata
    operation per partition directory; this plan is what it reads."""
    days = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    horizon = days.agg(
        F.date_sub(F.max("day"), keep_days).cast("timestamp").alias("_cutoff")
    )
    return (
        days.crossJoin(F.broadcast(horizon))
        .filter(F.col("day") < F.col("_cutoff"))
        .select("day", "n_rows")
    )


def latest_event_per_key(
    events: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Keep-latest dedup: the newest event per key (ties broken by
    ``tiebreak_col`` desc). One shuffle on the high-cardinality key;
    row_number + filter(=1) compiles to a rank-limited sort Spark
    evaluates with per-key top-1 state, not a full materialized rank."""
    w = Window.partitionBy(key).orderBy(
        F.col(time_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


_DEFAULT_TIERS = (("low", 0.0, 30.0), ("mid", 30.0, 70.0), ("high", 70.0, 1e9))


def value_tier_rollup(
    events: DataFrame,
    tiers: tuple[tuple[str, float, float], ...] = _DEFAULT_TIERS,
) -> DataFrame:
    """Range join: classify events against a band dimension
    (value ∈ [lo, hi)) and roll up per tier. The tier table is a
    literal — Spark plans a broadcast nested-loop join, the right
    physical strategy for a non-equi join against a constant-size dim:
    the fact side streams through unshuffled, each row probing #tiers
    intervals. (With many bands, pre-discretize to an equi-key
    instead — that's `value_histogram`.)"""
    spark = events.sparkSession
    tier_df = spark.createDataFrame(
        list(tiers), "tier string, lo double, hi double"
    )
    joined = events.join(
        F.broadcast(tier_df),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(dec("value")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_value"),
    )


def weekly_seasonality(events: DataFrame) -> DataFrame:
    """Day-of-week × hour-of-day activity matrix (the ops-dashboard
    seasonality rollup): one map-side-combinable aggregation over a
    168-key space. Day numbering is normalized to 0=Sunday explicitly
    — Spark's `dayofweek` is 1-based (1=Sunday), DuckDB's `dow`
    0-based; the -1 keeps both engines on the same scale."""
    return (
        events.groupBy(
            (F.dayofweek("ts") - 1).alias("dow"),
            F.hour("ts").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(dec("value")).cast("double") / F.count("value"), 6
            ).alias("avg_value"),
        )
    )


def hourly_moving_avg(events: DataFrame, hours: int = 3) -> DataFrame:
    """Trailing ``hours``-hour moving average over the per-type hourly
    rollup — the continuous-aggregate + rolling-window shape of the
    reference's Timescale workload (migrations/001_initial_schema.sql
    hypertable + time_bucket usage).

    Scale note: the rolling window partitions by event_type
    (low-cardinality) but its INPUT is the hourly rollup — rows =
    #types × #hours, already collapsed by a map-side-combinable
    aggregation. A century of hourly buckets is <1M rows per type;
    the window sorts the series, not the events. The raw-event shuffle
    happens once, keyed by (type, hour) — high cardinality, skew-free."""
    hourly = (
        events.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).alias("_sum"),
        )
    )
    # RANGE frame on the integer epoch-hour, NOT a rows frame: with a
    # rows frame an hour with no events makes the "trailing N hours"
    # silently span more than N wall-clock hours (rows are only the
    # POPULATED buckets). The integer range frame skips the gap
    # instead — same semantics in any engine's window RANGE.
    eh = (F.unix_timestamp("hour") / 3600).cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy(eh.asc())
        .rangeBetween(-(hours - 1), 0)
    )
    # decimal sums keep the rolling numerator exact (order-independent);
    # one double divide at the end
    return hourly.select(
        "event_type",
        "hour",
        "n",
        F.round(
            (F.sum("_sum").over(w).cast("double") / F.sum("n").over(w)), 6
        ).alias(f"avg_{hours}h"),
    )


def value_histogram_equidepth(
    events: DataFrame, probs: tuple[float, ...] = (0.25, 0.5, 0.75)
) -> DataFrame:
    """Equi-depth (quantile-boundary) histogram per type — the
    statistics shape query optimizers keep. Boundaries come from the
    scale-safe two-pass exact quantile; rows are then assigned to
    buckets by VALUE comparison against the broadcast boundaries
    (bucket = #boundaries strictly below the value) — a map-side
    projection, no global rank, no single-partition NTILE sort.
    Value-threshold assignment (not exact rank split) means duplicate
    values straddling a boundary land together — the property that
    makes the answer partitioning-independent and engine-identical."""
    names = quantile_column_names(probs)
    bounds = value_quantiles_twopass(events, probs=probs)
    bucket = sum(
        (F.col("value") > F.col(n)).cast("int") for n in names
    )
    return (
        events.filter(F.col("value").isNotNull())
        .join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def value_outliers(events: DataFrame, prob: float = 0.99) -> DataFrame:
    """Events strictly above their type's exact p-quantile — the
    per-metric anomaly gate. Thresholds come from the scale-safe
    two-pass quantile (histogram → bucket refine), then broadcast-join
    back onto the fact: the events table is scanned, never shuffled,
    and the threshold side is #types rows."""
    name = quantile_column_names((prob,))[0]
    thresholds = value_quantiles_twopass(events, probs=(prob,))
    return (
        events.join(F.broadcast(thresholds), "event_type")
        .filter(F.col("value") > F.col(name))
        .select("event_id", "event_type", "value", name)
    )


def user_event_deltas(events: DataFrame) -> DataFrame:
    """Per-user inter-event time statistics: lag over (user_id, ts,
    event_id), aggregated to (n_events, avg/max gap seconds). The
    window partitions by user_id — high-cardinality and hash-spread,
    the shape that DOES scale (contrast the per-type quantile window).
    Gap math stays in integer microseconds (`unix_micros`) until the
    final divide, so both engines see identical longs.

    The window orders by the SAME casted microsecond expression the
    gap is computed from (ADVICE r4): ordering by the raw column
    while differencing the cast could disagree if ts ever arrived as
    a string (lexicographic vs temporal order). The cast itself is
    purely defensive — `hermod_spark.data.table` loads events.ts as
    TimestampType already, and a string ts would be a loader bug."""
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(
        ts_us.asc(), F.col("event_id").asc()
    )
    delta_us = ts_us - F.lag(ts_us).over(w)
    per_event = events.select("user_id", delta_us.alias("delta_us"))
    return (
        per_event.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("delta_us").alias("_s"),
            F.count("delta_us").alias("_n"),
            F.max("delta_us").alias("_mx"),
        )
        .filter(F.col("n_events") >= 2)
        .select(
            "user_id",
            "n_events",
            # The mean gap is rounded HALF-UP to whole µs in PURE
            # INTEGER math — (2s+n) div 2n — then divided once.
            # Float round() is unusable here: µs sums over small
            # counts land near exact decimal midpoints (sf0.1 users
            # 1124/113), where Spark rounds the shortest decimal repr
            # of the double while DuckDB rounds its binary value, so
            # HALF_UP and HALF_EVEN BOTH mismatch on some row (r6
            # sf0.1 gate). Integer div has no such ambiguity.
            (
                F.expr("(2 * _s + _n) div (2 * _n)") / F.lit(1e6)
            ).alias("avg_gap_s"),
            (F.col("_mx") / 1e6).alias("max_gap_s"),
        )
    )


def retention_cohorts(
    events: DataFrame, offsets: tuple[int, ...] = (1, 3, 7)
) -> DataFrame:
    """Classic day-N retention: cohort users by first-seen day, count
    how many were active again exactly N days later. Three shuffles,
    all on high-cardinality keys: first-seen agg (user_id), active-day
    distinct (user_id, day), final rollup (cohort_day — counts only,
    rows per group already collapsed)."""
    first = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    active = events.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    off = F.datediff(F.col("day"), F.col("cohort_day"))
    return (
        active.join(first, "user_id")
        .groupBy("cohort_day")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            *[
                F.count_distinct(
                    F.when(off == d, F.col("user_id"))
                ).alias(f"d{d}")
                for d in offsets
            ],
        )
    )


def sequence_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-sequence funnel (ClickHouse `windowFunnel` shape): per
    user, how deep into the ``steps`` sequence their event history
    progresses IN TIME ORDER (a purchase before any view counts 0),
    rolled up to users-per-depth.

    ONE shuffle (groupBy user) — no per-step self-joins: each user's
    step events are collected, sorted by (µs timestamp, step index),
    and folded with a native `aggregate` whose state is the last
    matched step — per-user work is O(events·1) in codegen, and state
    is one struct. The µs-long sort key (not raw timestamps) keeps the
    fold order engine-identical. The cast('timestamp') is purely
    defensive (ADVICE r4): events.ts is TimestampType from
    `hermod_spark.data.table`; a string ts would silently null-parse
    here and is a loader bug, not a supported input."""
    idx: Column | None = None
    for i, s in enumerate(steps):
        c = F.col("event_type") == s
        idx = F.when(c, i + 1) if idx is None else idx.when(c, i + 1)
    evs = events.filter(F.col("event_type").isin(*steps)).select(
        "user_id",
        F.struct(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
            idx.cast("int").alias("s"),
        ).alias("e"),
    )
    seqs = evs.groupBy("user_id").agg(F.array_sort(F.collect_list("e")).alias("seq"))
    init = F.struct(F.lit(0).cast("long").alias("t"), F.lit(0).cast("int").alias("s"))
    depth = F.aggregate(
        "seq",
        init,
        lambda acc, x: F.when(
            x.getField("s") == acc.getField("s") + 1, x
        ).otherwise(acc),
    ).getField("s")
    return (
        seqs.select(depth.alias("funnel_depth"))
        .groupBy("funnel_depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("funnel_depth")
    )


def signup_purchase_funnel(events: DataFrame, within_days: int = 7) -> DataFrame:
    """Conversion funnel: per signup-day cohort, how many users made a
    purchase within ``within_days`` of their FIRST signup.

    Two filtered aggregations + one equi-join on user_id (single
    shuffle each); the conversion flag is a per-user EXISTS, expressed
    as max(boolean) under the join so no row explosion survives the
    final rollup."""
    signups = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    joined = signups.join(purchases, "user_id", "left").withColumn(
        "converted",
        (F.col("purchase_ts") >= F.col("signup_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("signup_ts") + F.expr(f"INTERVAL {within_days} DAYS")
        ),
    )
    per_user = joined.groupBy("user_id", "signup_ts").agg(
        F.coalesce(F.max("converted"), F.lit(False)).alias("converted")
    )
    return (
        per_user.groupBy(F.date_trunc("day", "signup_ts").alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum(F.col("converted").cast("int")).alias("n_converted"),
        )
        .withColumn(
            # exact integer micro-rate: (n_converted·1e6) div n_signups.
            # Kept INTEGER (parts-per-million) rather than a float: a
            # float in the result surface hashes differently across
            # engines whenever literal typing flips DOUBLE vs DECIMAL
            # (DuckDB versions disagree on `/ 1000000.0`), so the rate
            # is defined as micro-units and the caller divides by 1e6
            # for display.
            "micro_rate",
            F.expr("(n_converted * 1000000L) div n_signups"),
        )
    )


def event_type_pivot(events: DataFrame, modulus: int = 10) -> DataFrame:
    """PIVOT: per user-cohort counts, one column per event type.
    Explicit pivot values keep the schema static (no extra pass to
    discover them) — required for a deterministic plan at scale."""
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        events.withColumn("cohort", F.col("user_id") % modulus)
        .groupBy("cohort")
        .pivot("event_type", types)
        .count()
    )
    return pivoted.select(
        "cohort", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


def value_histogram(events: DataFrame, width: float = 5.0) -> DataFrame:
    """Fixed-width histogram of ``value``: floor(value/width) buckets —
    integer bucket math, single combined aggregation, no sampling."""
    bucket = F.floor(F.col("value") / width).cast("bigint")
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    time_left: str,
    time_right: str,
    right_cols: list[str],
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the nearest right row on the same
    key — ``backward`` (latest with ``time_right <= time_left``, the
    default), ``forward`` (earliest with ``time_right >= time_left``),
    or ``nearest`` (closer of the two; exact ties → backward, the
    deterministic convention documented here). The pandas
    ``merge_asof`` direction set, distributed.

    Spark has no ASOF JOIN; the naive encodings are a range cross join
    (quadratic) or a per-key collect (skew-bound). This is the
    scale-correct shape: UNION both sides, ONE shuffle on the key, and
    a running ``last(..., ignorenulls=True)`` window carries the
    nearest right-side values onto left rows — backward scans time
    ascending, forward descending (same exchange, one extra in-
    partition sort for ``nearest``, which needs both). No join, no row
    blowup; AQE handles key skew like any other shuffle.

    Ties (equal timestamps) match inclusively in both directions.
    ``tolerance`` (e.g. "3600 seconds") nulls matches farther than the
    window, like pandas ``merge_asof``. Right rows sharing (key, time)
    are ambiguous under any as-of semantics — pre-aggregate the right
    side to one row per (key, time), as the rel_asof queries do.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    lcols = [c for c in left.columns]
    l = left.select(
        F.col(key).alias("_k"),
        F.col(time_left).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(time_right).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    # backward: time asc, right-before-left at ties (inclusive <=).
    # forward: time desc, right-before-left at ties (inclusive >=).
    w_b = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l.unionByName(r)
    # the matched right row travels as ONE struct (non-null exactly on
    # right rows): per-column last(_r_c, ignorenulls) would SKIP a
    # genuine NULL value in the nearest row and serve a staler row's
    # value while the match time still reported the nearest row —
    # under tolerance, an arbitrarily old value gated by the wrong
    # timestamp. The struct keeps (time, values) atomic, matching
    # pandas merge_asof (the nearest row's value, even when NULL).
    rrow = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_t").alias("_mt"),
            *[F.col(f"_r_{c}").alias(c) for c in right_cols],
        ),
    )

    def _match(w, tag: str):
        m = F.last(rrow, ignorenulls=True).over(w)
        return [
            *[m.getField(c).alias(f"_m{tag}_{c}") for c in right_cols],
            m.getField("_mt").alias(f"_m{tag}_t"),
        ]

    cols = []
    if direction in ("backward", "nearest"):
        cols += _match(w_b, "b")
    if direction in ("forward", "nearest"):
        cols += _match(w_f, "f")
    out = unioned.select("*", *cols).filter(F.col("_side") == 1)

    def _keep(tag: str) -> Column:
        # Null-safe: a NULL match time must yield False, not NULL —
        # otherwise ~_keep('f') is NULL and the nearest-direction
        # when() chain drops a valid backward match for keys with no
        # forward row (three-valued logic swallows the branch).
        has = F.col(f"_m{tag}_t").isNotNull()
        if tolerance is None:
            return has
        bound = F.expr(f"INTERVAL {tolerance}")
        if tag == "b":
            return has & (F.col(f"_m{tag}_t") >= F.col("_t") - bound)
        return has & (F.col(f"_m{tag}_t") <= F.col("_t") + bound)

    if direction == "nearest":
        # closer side wins; ties and missing-forward fall back to
        # backward (both-null stays null via the keep gates)
        use_b = _keep("b") & (
            ~_keep("f")
            | (
                (F.col("_t") - F.col("_mb_t"))
                <= (F.col("_mf_t") - F.col("_t"))
            )
        )
        pick = [
            F.when(use_b, F.col(f"_mb_{c}"))
            .when(_keep("f"), F.col(f"_mf_{c}"))
            .alias(f"{c}_asof")
            for c in right_cols
        ]
    else:
        tag = "b" if direction == "backward" else "f"
        pick = [
            F.when(_keep(tag), F.col(f"_m{tag}_{c}")).alias(f"{c}_asof")
            for c in right_cols
        ]
    return out.select(*[F.col(c) for c in lcols], *pick)


def sessionize(
    events: DataFrame,
    *,
    key: str = "user_id",
    time_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Session windows in batch: ``session_window`` groups rows of a key
    into sessions separated by ≥gap of silence — one shuffle on the
    key, state merged by Spark's native session aggregation (the same
    operator Structured Streaming uses incrementally with a
    watermark)."""
    return (
        events.groupBy(F.session_window(F.col(time_col), gap).alias("w"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.col(time_col)).alias("last_event"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def bucketed_order_revenue(
    spark,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    num_buckets: int = 8,
    tag: str = "t",
) -> DataFrame:
    """Shuffle-free fact⋈fact join via bucketed storage: revenue and
    item counts per order priority, with orders⋈lineitem joined over
    bucketed copies so the join itself has ZERO shuffle exchange.

    This closes the one named 100 TB gap in SCALE.md's star-join row:
    an unbucketed orders⋈lineitem re-shuffles both facts on every
    query (3 exchanges for this rollup); with both facts bucketed by
    orderkey into the same bucket count, the persisted bucket layout
    satisfies the join's distribution requirement and only the final
    small per-priority aggregation exchanges (1). At 100 TB the facts
    are written bucketed ONCE at ingest (`ensure_bucketed_table`,
    ~4096 buckets), and every orderkey join thereafter is shuffle-free.
    `tests/test_plans.py` pins the plan: bucketed scans, SortMergeJoin
    with no Exchange beneath it.
    """
    from hermod_spark.sinks.writer import ensure_bucketed_table

    o = ensure_bucketed_table(
        spark, orders, f"hermod_bkt_orders_{tag}", "o_orderkey", num_buckets
    )
    l = ensure_bucketed_table(
        spark, lineitem, f"hermod_bkt_lineitem_{tag}", "l_orderkey", num_buckets
    )
    rev = dec("l_extendedprice") * one_minus("l_discount")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            dbl(F.sum(rev)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


def orders_with_returns(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4-shaped EXISTS subquery, decorrelated: order counts per
    priority among orders with at least one returned line item.

    The SQL form is `WHERE EXISTS (SELECT 1 FROM lineitem WHERE
    l_orderkey = o_orderkey AND l_returnflag = 'R')`; executed
    per-row that is a correlated subplan (a scan per outer row). The
    engine form is its decorrelation: ONE left-semi hash join on the
    order key — no per-row subplan anywhere in the physical plan
    (gated by tests/test_plans.py), one shuffle pair at scale, and
    the semi join carries no lineitem payload columns."""
    returned = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey")
    )
    return (
        orders.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#4"
) -> DataFrame:
    """TPC-H Q17-shaped scalar correlated subquery, decorrelated:
    average yearly revenue lost by not filling small orders — line
    items of one brand whose quantity is below half the part's average
    quantity.

    The SQL form compares each row against `(SELECT 0.5*AVG(l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)` — a correlated
    scalar subplan per row. The engine form (r9 shape, VERDICT r8 #2)
    first restricts lineitem to the brand's parts with a BROADCAST
    semi-ish join — the per-part average only matters for parts that
    survive the outer filter, and AVG over a part's rows is unchanged
    by dropping other parts — then aggregates per-part averages over
    that ~25×-smaller input (map-side partial agg) and equi-joins them
    back. The join-back frame is the O(branded-parts) aggregate, not
    O(all parts) — still O(SF) (≈800 M rows at 100 TB), so neither it
    nor the branded-parts filter is FORCE-broadcast (r10, VERDICT r9
    #1): `maybe_broadcast` hints only while the compile-time size
    estimate is under the session threshold, and past that AQE picks
    broadcast-vs-shuffle from the actual runtime size. Averages are
    ratios of decimal-exact sums so both engines compute identical
    doubles."""
    branded = lineitem.join(
        maybe_broadcast(part.filter(F.col("p_brand") == brand).select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    per_part = branded.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.sum(dec("l_quantity")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg_qty")
    )
    return (
        branded.join(maybe_broadcast(per_part), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("_avg_qty"))
        .agg(
            # exact decimal sum → double (scale 4: cast is exact in
            # every engine) → one double division: bit-reproducible
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13-shaped distribution: how many customers placed k
    orders, INCLUDING the zero-order customers the outer join exists
    for. Two-level aggregation — per-customer count (left outer join,
    count of the nullable right key), then histogram over the counts.
    Both aggs are partial-combined; the second input is O(customers)
    and the output O(distinct counts)."""
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_custs"))
        .orderBy(F.desc("n_custs"), F.desc("c_count"))
    )


def sole_returning_supplier(
    lineitem: DataFrame, supplier: DataFrame, k: int = 20
) -> DataFrame:
    """TPC-H Q21-shaped double correlated subquery, decorrelated:
    per supplier, how many multi-supplier orders had THIS supplier as
    the ONLY one with a returned line (the "who kept the order
    waiting" blame query, re-keyed to l_returnflag since the synthetic
    lineitem carries no commit/receipt dates).

    The SQL form nests `EXISTS (another supplier on the order)` AND
    `NOT EXISTS (another supplier with a returned line)` — two
    correlated subplans per row. The engine form decorrelates BOTH
    into one pass of per-order aggregates: n_suppliers and
    n_returning_suppliers per order (map-side-combined, one shuffle on
    orderkey), then the pair of EXISTS conditions becomes a scan-side
    compare (n_suppliers ≥ 2 AND n_returning = 1) joined back to the
    returning supplier. No per-row subplan, no self-join explosion;
    the O(SF) supplier dim takes a size-conditional broadcast hint for
    the name (shuffle join past the threshold — r10, VERDICT r9 #1).
    Top-k is TakeOrderedAndProject (never a global sort)."""
    pairs = lineitem.select(
        "l_orderkey", "l_suppkey", (F.col("l_returnflag") == "R").alias("_ret")
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("_ret"), F.col("l_suppkey"))).alias(
            "_n_ret"
        ),
    )
    returning = (
        pairs.filter(F.col("_ret"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    blamed = (
        returning.join(per_order, "l_orderkey")
        .filter((F.col("_n_supp") >= 2) & (F.col("_n_ret") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        blamed.join(
            maybe_broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(k)
    )


def inactive_rich_customers(
    customer: DataFrame, orders: DataFrame, priority: str = "1-URGENT"
) -> DataFrame:
    """TPC-H Q22-shaped: per nation, count and total balance of
    customers with above-average (positive-balance) account balance
    who never placed an order of the given priority (every synthetic
    customer HAS orders, so Q22's never-ordered predicate is re-keyed
    to priority to stay non-vacuous). Two decorrelations in one
    query: the scalar `(SELECT AVG(c_acctbal) WHERE c_acctbal > 0)`
    becomes a 1-row broadcast cross-join, and the `NOT EXISTS
    (orders WHERE priority)` becomes a LEFT ANTI hash join whose
    right side carries only the pre-filtered key column. Sums
    decimal-exact for cross-engine hashing."""
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("_avg")
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("_avg")
    )
    never_ordered = rich.join(
        orders.filter(F.col("o_orderpriority") == priority).select(
            "o_custkey"
        ),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return (
        never_ordered.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dbl(F.sum(dec("c_acctbal"))).alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


def important_parts(
    lineitem: DataFrame, alpha: float = 1.5
) -> DataFrame:
    """TPC-H Q11-shaped HAVING-scalar: parts whose total revenue
    exceeds ``alpha ×`` the AVERAGE per-part revenue — the scalar
    subquery sits in the HAVING clause this time (Q11's absolute
    fraction scales as 1/SF, so the scale-stable form keys on the
    average instead: same ~1.3% selectivity at every SF).
    Decorrelated the same way as the WHERE-site scalar: the global
    (total, count) is a 1-row aggregate over the per-part RESULT
    (O(parts) rows — the fact table is scanned once), cross-joined
    back broadcast, so the HAVING compares #parts rows against one
    1-row frame — no per-row subplan, no second fact scan. Both
    compare operands take the dbl() scale-4 rounding discipline
    (a direct high-scale decimal→double cast is off by 1 ulp between
    engines, which on a threshold boundary flips a row)."""
    rev = dec("l_extendedprice") * one_minus("l_discount")
    per_part = lineitem.groupBy("l_partkey").agg(
        F.sum(rev).alias("_rev")
    )
    stats = per_part.agg(
        F.sum("_rev").alias("_total"), F.count(F.lit(1)).alias("_n")
    )
    return (
        per_part.crossJoin(F.broadcast(stats))
        .filter(
            dbl(F.col("_rev"))
            > F.lit(float(alpha)) * dbl(F.col("_total")) / F.col("_n")
        )
        .select("l_partkey", dbl(F.col("_rev")).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_partkey"))
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
) -> DataFrame:
    """TPC-H Q18-shaped: customers whose single orders exceed
    ``min_qty`` total quantity. The `IN (SELECT l_orderkey ... GROUP
    BY ... HAVING SUM > q)` membership subquery decorrelates into a
    pre-aggregated big-order frame joined to orders; the per-order
    quantity aggregation happens ONCE (map-side combined) and only
    qualifying orderkeys flow into the join — at 100 TB the HAVING
    filter collapses billions of lineitem rows to the handful of
    jumbo orders before anything joins. customer is O(SF): its hint is
    size-conditional (AQE shuffle join past the threshold — r10)."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_qty"))
        .filter(F.col("_qty").cast("double") > min_qty)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            maybe_broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate"),
            dbl(F.col("o_totalprice").cast(PRICE)).alias("o_totalprice"),
            dbl(F.col("_qty")).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def supplier_variety(
    lineitem: DataFrame,
    part: DataFrame,
    exclude_factor: float = 1.05,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q16-shaped NOT IN subquery: distinct supplier counts per
    (brand, size) over non-ECONOMY parts, EXCLUDING suppliers whose
    returned-line count exceeds ``exclude_factor ×`` the average (the
    complaints-supplier exclusion, re-keyed to return counts since the
    synthetic supplier table carries no comments).

    NOT IN decorrelates to a LEFT ANTI join — which is only equivalent
    when the subquery produces no NULLs (SQL's NOT IN returns UNKNOWN,
    i.e. drops EVERYTHING, if any subquery value is NULL; the classic
    trap). Here the exclusion keys come out of a GROUP BY on a
    non-null join key, so the anti-join is exact — the docstring
    records the precondition the rewrite relies on. The exclusion set
    is O(suppliers) — O(SF), so its hint is size-conditional and AQE
    owns the strategy past the threshold (r10); the distinct-count
    aggregation expands to the standard two-phase partial-distinct
    plan. Top-k via TakeOrdered, ties broken by (brand, size)."""
    per_supp = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("_r"))
    )
    stats = per_supp.agg(
        F.sum("_r").alias("_t"), F.count(F.lit(1)).alias("_n")
    )
    bad = (
        per_supp.crossJoin(F.broadcast(stats))
        .filter(
            F.col("_r").cast("double")
            > F.lit(float(exclude_factor))
            * F.col("_t").cast("double")
            / F.col("_n")
        )
        .select(F.col("l_suppkey").alias("_bad"))
    )
    pairs = lineitem.join(
        maybe_broadcast(
            part.filter(F.col("p_type") != "ECONOMY").select(
                "p_partkey", "p_brand", "p_size"
            )
        ),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    kept = pairs.join(
        maybe_broadcast(bad), F.col("l_suppkey") == F.col("_bad"), "left_anti"
    )
    return (
        kept.groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_size"))
        .limit(k)
    )


def shipping_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    cutoff: str = "1998-06-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped shipping priority: top-k revenue among orders
    placed before ``cutoff`` whose items ship after it. Both date
    filters push to the parquet scans (plan-gated); the join is the
    orderkey fact pair; top-k is a TakeOrderedAndProject over the
    aggregated (order, revenue) rows — never a global sort of the
    fact tables. Ties broken by orderkey for determinism."""
    cut = F.lit(cutoff).cast("timestamp")
    o = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.filter(F.col("l_shipdate") > cut).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = dec("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dbl(F.sum(rev)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(k)
    )


def partitioned_event_rollup(
    spark,
    events: DataFrame,
    path: str,
    date_lo: str = "2024-01-10",
    date_hi: str = "2024-01-12",
) -> DataFrame:
    """Time-windowed rollup over a date-partitioned copy of events:
    per-type counts and value sums for a 3-day window of a 30-day
    table. The date filter is a PARTITION filter — the scan touches
    only the window's directories (plan-gated: PartitionFilters
    non-empty, no post-scan date predicate), which at 100 TB is the
    difference between reading 10 TB and reading 1 TB for the same
    answer. Sums decimal-exact for cross-engine hashing."""
    from hermod_spark.sinks.writer import ensure_partitioned_copy

    part = ensure_partitioned_copy(
        spark,
        events.withColumn("event_date", F.to_date(F.col("ts"))),
        path,
        "event_date",
    )
    lo = F.lit(date_lo).cast("date")
    hi = F.lit(date_hi).cast("date")
    return (
        part.filter(F.col("event_date").between(lo, hi))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", "decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


def column_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    ndv_mode: str = "exact",
    ndv_rsd: float = 0.05,
) -> DataFrame:
    """ANALYZE-TABLE-style one-scan column profiler: per column emits
    row count, null count, distinct count, and min/max (numeric
    columns as 6-dp doubles in ``min_v``/``max_v``; string and
    timestamp columns rendered deterministically in ``min_s``/
    ``max_s``). The reference has no profiler — this is the
    data-quality primitive a curation run fires before trusting a new
    100 TB drop (schema drift, null explosions, constant columns,
    key-cardinality sanity).

    Plan shape: ONE Aggregate over ONE scan. ``ndv_mode='exact'``
    uses ``count(DISTINCT c)`` per column — Catalyst rewrites the
    multi-distinct aggregate with Expand (k× row amplification for k
    profiled columns) but still a single shuffle; that is the
    oracle-checkable conformance form. At 100 TB pass
    ``ndv_mode='approx'``: HyperLogLog++ ``approx_count_distinct``
    needs no Expand and no second pass, so the whole profile is one
    map-side-partial aggregation at ~constant state per column. The
    long-form pivot is a driver-built literal struct array over the
    single aggregated row — no second job, no per-column scan.
    """
    if ndv_mode not in ("exact", "approx"):
        raise ValueError(f"ndv_mode must be exact|approx, got {ndv_mode!r}")
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"column_profile: unknown columns {missing}")
    numeric_kinds = ("int", "bigint", "smallint", "tinyint", "double",
                     "float", "decimal")
    dtypes = dict(df.dtypes)

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"_nul_{c}")
        )
        if ndv_mode == "exact":
            aggs.append(F.countDistinct(col).alias(f"_ndv_{c}"))
        else:
            aggs.append(
                F.approx_count_distinct(col, rsd=ndv_rsd).alias(f"_ndv_{c}")
            )
        t = dtypes[c]
        if t.startswith(numeric_kinds):
            aggs.append(F.round(F.min(col).cast("double"), 6).alias(f"_min_{c}"))
            aggs.append(F.round(F.max(col).cast("double"), 6).alias(f"_max_{c}"))
        elif t == "timestamp":
            fmt = "yyyy-MM-dd HH:mm:ss"
            aggs.append(F.date_format(F.min(col), fmt).alias(f"_min_{c}"))
            aggs.append(F.date_format(F.max(col), fmt).alias(f"_max_{c}"))
        else:
            aggs.append(F.min(col.cast("string")).alias(f"_min_{c}"))
            aggs.append(F.max(col.cast("string")).alias(f"_max_{c}"))

    one = df.agg(*aggs)

    rows = []
    for c in cols:
        t = dtypes[c]
        is_num = t.startswith(numeric_kinds)
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").cast("bigint").alias("n"),
                F.col(f"_nul_{c}").cast("bigint").alias("n_null"),
                F.col(f"_ndv_{c}").cast("bigint").alias("n_distinct"),
                (F.col(f"_min_{c}") if is_num else F.lit(None).cast("double")
                 ).alias("min_v"),
                (F.col(f"_max_{c}") if is_num else F.lit(None).cast("double")
                 ).alias("max_v"),
                (F.lit(None).cast("string") if is_num else F.col(f"_min_{c}")
                 ).alias("min_s"),
                (F.lit(None).cast("string") if is_num else F.col(f"_max_{c}")
                 ).alias("max_s"),
            )
        )
    return (
        one.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )


def validate_constraints(
    df: DataFrame,
    rules: list[tuple],
    *,
    ndv_mode: str = "exact",
    ndv_rsd: float = 0.05,
) -> DataFrame:
    """Deequ-style declarative data-quality gate: evaluate a rule set
    against a table in ONE aggregate over ONE scan and emit one row
    per rule — (rule, col_name, metric, threshold, passed). The
    check a 100 TB curation run fires on every new drop before any
    downstream job trusts it; `val_rec` (plans/schema.py) validates
    per-RECORD shape, this validates per-TABLE invariants.

    Rule forms (tuples):
      ("not_null", col)                  — metric: null count, passes at 0
      ("completeness", col, min_frac)    — metric: non-null fraction
      ("unique", col)                    — metric: estimated duplicate
                                           count (non-null rows − NDV);
                                           passes when |metric| is
                                           within threshold (0 exact;
                                           the HLL error budget
                                           3·rsd·n_nonnull in approx)
      ("in_range", col, lo, hi)          — metric: out-of-range count
                                           (NULLs don't violate), passes at 0
      ("accepted_values", col, [vals])   — metric: rejected-value count
      ("min_rows", n)                    — metric: row count

    Plan shape: every rule compiles to conditional aggregates in the
    SAME single Aggregate (map-side partial → one exchange of one
    row); the per-rule pivot is a literal struct array over that row,
    exactly like ``column_profile``. ``unique`` uses count(DISTINCT)
    in the conformance form; ``ndv_mode='approx'`` swaps in HLL so the
    plan needs no Expand at 100 TB (uniqueness then means |ndv -
    n_nonnull| within the sketch's rsd — surfaced through the same
    passed boolean).
    """
    if ndv_mode not in ("exact", "approx"):
        raise ValueError(f"ndv_mode must be exact|approx, got {ndv_mode!r}")
    arity = {"not_null": 2, "completeness": 3, "unique": 2,
             "in_range": 4, "accepted_values": 3, "min_rows": 2}
    for r in rules:
        if not r or r[0] not in arity or len(r) != arity[r[0]]:
            raise ValueError(f"validate_constraints: bad rule {r!r}")
        if r[0] != "min_rows" and r[1] not in df.columns:
            raise ValueError(f"validate_constraints: unknown column in {r!r}")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        kind = r[0]
        if kind == "min_rows":
            continue
        col = F.col(r[1])
        if kind in ("not_null", "completeness"):
            # coalesce: SUM over zero rows is NULL, and a NULL metric
            # would make passed NULL — an empty drop must gate loudly
            aggs.append(
                F.coalesce(
                    F.sum(F.when(col.isNull(), 1).otherwise(0)), F.lit(0)
                ).alias(f"_m{i}")
            )
        elif kind == "unique":
            if ndv_mode == "exact":
                aggs.append(F.countDistinct(col).alias(f"_m{i}"))
            else:
                aggs.append(
                    F.approx_count_distinct(col, rsd=ndv_rsd).alias(f"_m{i}")
                )
            aggs.append(
                F.coalesce(
                    F.sum(F.when(col.isNotNull(), 1).otherwise(0)), F.lit(0)
                ).alias(f"_c{i}")
            )
        elif kind == "in_range":
            lo, hi = r[2], r[3]
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(
                            col.isNotNull() & ((col < F.lit(lo)) | (col > F.lit(hi))), 1
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).alias(f"_m{i}")
            )
        elif kind == "accepted_values":
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(col.isNotNull() & ~col.isin(list(r[2])), 1).otherwise(0)
                    ),
                    F.lit(0),
                ).alias(f"_m{i}")
            )
    one = df.agg(*aggs)

    n = F.col("_n").cast("double")
    rows = []
    for i, r in enumerate(rules):
        kind = r[0]
        if kind == "not_null":
            metric = F.col(f"_m{i}").cast("double")
            threshold, passed = F.lit(0.0), F.col(f"_m{i}") == 0
        elif kind == "completeness":
            # try_divide: ANSI mode would THROW on the empty-table 0/0;
            # the metric is NULL there and the verdict coalesces to a
            # hard False, not NULL-propagated silence
            metric = F.round(F.try_divide(n - F.col(f"_m{i}"), n), 6)
            threshold = F.lit(float(r[2]))
            passed = F.coalesce(metric >= F.lit(float(r[2])), F.lit(False))
        elif kind == "unique":
            # self-consistent triple: metric = estimated duplicate
            # count (non-null rows minus NDV), threshold = the
            # tolerance that decides the verdict (0 exact; the HLL
            # error budget 3*rsd*n_nonnull in approx mode), and
            # passed = |metric| <= threshold — recomputable from the
            # emitted row alone
            metric = (
                F.col(f"_c{i}").cast("double") - F.col(f"_m{i}").cast("double")
            )
            if ndv_mode == "exact":
                threshold = F.lit(0.0)
            else:
                threshold = F.lit(3.0 * ndv_rsd) * F.col(f"_c{i}").cast("double")
            passed = F.abs(metric) <= threshold
        elif kind == "in_range":
            metric = F.col(f"_m{i}").cast("double")
            threshold, passed = F.lit(0.0), F.col(f"_m{i}") == 0
        elif kind == "accepted_values":
            metric = F.col(f"_m{i}").cast("double")
            threshold, passed = F.lit(0.0), F.col(f"_m{i}") == 0
        else:  # min_rows
            metric = n
            threshold = F.lit(float(r[1]))
            passed = F.col("_n") >= F.lit(int(r[1]))
        rows.append(
            F.struct(
                F.lit(kind).alias("rule"),
                F.lit("*" if kind == "min_rows" else r[1]).alias("col_name"),
                metric.cast("double").alias("metric"),
                threshold.cast("double").alias("threshold"),
                passed.alias("passed"),
            )
        )
    return (
        one.select(F.explode(F.array(*rows)).alias("c"))
        .select("c.*")
        .orderBy("rule", "col_name")
    )


def gapfill_interpolate(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    val_col: str = "value",
) -> DataFrame:
    """Hypertable-style gap-filled hourly rollup: aggregate per
    (key, hour), densify every key onto the global hourly spine, and
    fill gaps two ways — LOCF (``locf_value``) and linear
    interpolation between the bracketing observed hours
    (``interp_value``; NULL at unbracketed edges). The
    ``time_bucket_gapfill + locf + interpolate`` surface of a
    TimescaleDB continuous aggregate, re-expressed declaratively.

    Scale shape: raw events are touched ONLY by the first hourly
    aggregation (one map-side-combined shuffle on (key, hour)); every
    later stage — spine generation (keys × sequence(min,max)), the
    densify join, and the per-key fill windows — operates on the
    rollup, whose cardinality is time-range × key-count, INDEPENDENT
    of raw row count. 100 TB of events over a month at 1k keys is
    still a ~720k-row spine. Per-key windows need one exchange on the
    key; bounds are a 1-row broadcast.
    """
    hr = F.date_trunc("hour", F.col(ts_col))
    # decimal-sum average, NOT F.avg: a double sum is partition-order-
    # dependent, and at sf0.1 a 32-event bucket landed a 6dp rounding
    # boundary differently than the oracle's own summation order (the
    # r11 sf0.1 sweep catch). (38,4) keeps the cast-to-double exact
    # (see dbl()) and survives 100 TB bucket sums.
    hourly = (
        events.select(F.col(key_col).alias("k"), hr.alias("hr"),
                      F.col(val_col).alias("v"))
        .groupBy("k", "hr")
        .agg(F.count(F.lit(1)).alias("n_events"),
             (F.sum(dec("v", "decimal(38,4)")).cast("double")
              / F.count(F.lit(1))).alias("avg_value"))
        # three consumers (bounds, key list, densify join) — checkpoint
        # the bounded rollup so the raw-event scan + shuffle run ONCE
        .localCheckpoint(eager=False)
    )
    bounds = hourly.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = (
        hourly.select("k").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "k",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("hr"),
        )
    )
    dense = spine.join(hourly, ["k", "hr"], "left")

    w_back = (
        Window.partitionBy("k").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("k").orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("avg_value").isNotNull(), F.col("hr"))
    prev_v = F.last("avg_value", ignorenulls=True).over(w_back)
    prev_h = F.last(obs_h, ignorenulls=True).over(w_back)
    next_v = F.first("avg_value", ignorenulls=True).over(w_fwd)
    next_h = F.first(obs_h, ignorenulls=True).over(w_fwd)

    sec = lambda c: c.cast("long")  # noqa: E731 - epoch seconds
    interp = F.when(F.col("avg_value").isNotNull(), F.col("avg_value")).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v
            + (next_v - prev_v)
            * (sec(F.col("hr")) - sec(prev_h))
            / (sec(next_h) - sec(prev_h)),
        )
    )
    return dense.select(
        F.col("k").alias(key_col),
        "hr",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.round("avg_value", 6).alias("avg_value"),
        F.round(prev_v, 6).alias("locf_value"),
        F.round(interp, 6).alias("interp_value"),
    )


def point_in_time_join(
    facts: DataFrame,
    versions: DataFrame,
    *,
    key: str,
    time_fact: str,
    valid_from: str,
    attrs: list[str],
) -> DataFrame:
    """Point-in-time-correct enrichment against a slowly-changing
    (SCD2-style) dimension: each fact row gets the version whose
    ``valid_from`` is the LATEST at or before the fact's time — the
    as-of semantics every feature-store / warehouse "temporal join"
    needs, with no valid_to bookkeeping required (a version ends where
    the next one starts; facts before the first version get NULLs).

    The naive encodings are a BETWEEN-range join (row blowup ∝
    versions/key, then a dedup) or a correlated subquery per fact. This
    delegates to :func:`asof_join`'s union + running-window shape: ONE
    shuffle on the key for |facts|+|versions| rows, no join node, no
    blowup — at 100 TB the version side is dimension-sized and rides
    the same exchange. Output: fact columns + ``{attr}_asof``.
    """
    return asof_join(
        facts,
        versions,
        key=key,
        time_left=time_fact,
        time_right=valid_from,
        right_cols=attrs,
        direction="backward",
    )


def rollup_partials(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    val_col: str = "value",
) -> DataFrame:
    """Mergeable partial state of the hourly rollup: (bucket, topic,
    value_count, _sum decimal, min_value, max_value). Every component
    is a commutative monoid, so partials computed independently — per
    executor, per day, per ingest batch — merge exactly via
    :func:`merge_rollups`; the decimal sum keeps the merge
    order-independent (the sketch-merge property, for plain stats)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
            F.col(key_col).alias("topic"),
        )
        .agg(
            F.count(F.col(val_col)).alias("value_count"),
            F.sum(dec(val_col, "decimal(38,4)")).alias("_sum"),
            F.min(val_col).alias("min_value"),
            F.max(val_col).alias("max_value"),
        )
    )


def merge_rollups(*partials: DataFrame) -> DataFrame:
    """Merge :func:`rollup_partials` frames into one — the
    continuous-aggregate MAINTENANCE step: history stays rolled up,
    each new ingest batch contributes only its own partials, and the
    merge touches rollup-sized state (buckets × keys), never raw
    history. Serve with :func:`serve_rollup`."""
    if not partials:
        raise ValueError("merge_rollups: need at least one partials frame")
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    return out.groupBy("bucket", "topic").agg(
        F.sum("value_count").alias("value_count"),
        F.sum("_sum").alias("_sum"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def serve_rollup(partials: DataFrame) -> DataFrame:
    """Finalize partials into the hourly_event_rollup serving shape
    (avg from the exact decimal sum; identical arithmetic to the
    direct rollup, so merged-then-served == computed-from-scratch
    bit-for-bit)."""
    return partials.select(
        "bucket",
        "topic",
        (F.col("_sum").cast("double") / F.col("value_count")).alias("avg_value"),
        "min_value",
        "max_value",
        "value_count",
    )
