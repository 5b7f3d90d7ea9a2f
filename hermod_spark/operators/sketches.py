"""Distinct-count sketching (KMV) — deterministic across engines.

HLL (Spark's ``approx_count_distinct``) is engine-specific: no second
system reproduces its register layout, so its answers can't be
oracle-checked. KMV (k-minimum-values) is the classic alternative whose
estimate is a pure function of the data: hash every value to [0,1),
keep the k smallest per group, estimate distinct = (k-1)/x_k where x_k
is the k-th minimum. Same md5-derived hash in any engine ⇒ identical
estimates everywhere — sketch accuracy AND bit-reproducibility.

Scale note: this formulation (distinct → per-key rank ≤ k) shuffles
the distinct (key, hash) pairs — the right demonstration shape, and
already no worse than exact count-distinct. A production incremental
variant keeps the k-set as partial-aggregation state (streaming:
``applyInPandasWithState`` with a bounded sorted list per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TWO_32 = float(1 << 32)


def uniform_hash(col: Column | str) -> Column:
    """Deterministic value → [0,1) hash: first 8 hex chars of md5 as a
    32-bit integer fraction. Reproducible in any engine with md5."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("double")
        / F.lit(TWO_32)
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-key approximate distinct count of ``value_col``.

    Returns (key, est_distinct): exact when a key has < k distinct
    values (the k-set IS the value set), else the KMV estimator
    (k-1)/x_k. Estimates are rounded to 4 decimals — far coarser than
    double noise, identical across engines."""
    hashes = (
        df.select(F.col(key_col).alias("key"), uniform_hash(value_col).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("key").orderBy("h")
    ranked = hashes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return (
        ranked.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max(F.when(F.col("rn") == k, F.col("h"))).alias("x_k"),
        )
        .select(
            F.col("key").alias(key_col),
            F.round(
                F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
                    (k - 1) / F.col("x_k")
                ),
                4,
            ).alias("est_distinct"),
        )
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    value_col: str,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-key HyperLogLog++ distinct count (`approx_count_distinct`)
    — the production sketch at 100 TB: O(1) memory per key, partial
    sketches merge map-side, one shuffle of sketch bytes (not values).

    Unlike KMV (deterministic, oracle-checkable), HLL register values
    are engine-internal — there is no cross-engine oracle; the
    rsd-bound pytest pins it against the exact count instead."""
    return (
        df.groupBy(F.col(key_col))
        .agg(F.approx_count_distinct(value_col, rsd).alias("est_distinct"))
    )


def hll_distinct_checked(
    df: DataFrame,
    key_col: str,
    value_col: str,
    rsd: float = 0.02,
    sigmas: float = 5.0,
) -> DataFrame:
    """Hash-checkable wrapper around :func:`hll_distinct`: exposes the
    exact per-key distinct count (cross-engine reproducible) plus a
    boolean asserting the HLL estimate landed within ``sigmas``·rsd of
    it.  The oracle computes the exact count and literal TRUE, so an
    out-of-bounds sketch turns the row red instead of being
    unverifiable.  Production callers use :func:`hll_distinct` (no
    exact count, O(1) memory per key); the exact count here is
    verification cost."""
    agg = df.groupBy(F.col(key_col)).agg(
        F.approx_count_distinct(value_col, rsd).alias("_est"),
        F.countDistinct(value_col).alias("exact_distinct"),
    )
    slack = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.lit(sigmas * rsd) * F.col("exact_distinct")),
    )
    return agg.select(
        key_col,
        "exact_distinct",
        (
            F.abs(F.col("_est") - F.col("exact_distinct")) <= slack
        ).alias("within_bounds"),
    )


# Count-min sketch hash family: d independent affine transforms over
# the 32-bit md5-prefix base hash (same universal-hash construction as
# dedup.MINHASH_A/B: a < 2^31 and base < 2^32 keep products < 2^63).
# Fixed-seed so every engine (and the DuckDB oracle) reproduces the
# exact cell layout.
CM_P = 4294967291  # largest prime < 2^32
_cm_rng = __import__("random").Random(1337)
CM_A = [_cm_rng.randrange(1, 1 << 31) for _ in range(8)]
CM_B = [_cm_rng.randrange(0, 1 << 31) for _ in range(8)]


def _cm_base(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")


def _cm_cell(base: Column, i: int, width: int) -> Column:
    return ((F.lit(CM_A[i]) * base + F.lit(CM_B[i])) % F.lit(CM_P)) % F.lit(width)


def cm_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies as a (row, cell,
    cnt) frame — the mergeable frequency summary whose size is d×w
    CELLS regardless of key cardinality (Cormode & Muthukrishnan '05).

    Scale shape: each input row emits ``depth`` (row, cell) pairs
    map-side; the single shuffle is a count aggregation over at most
    d×w distinct keys — partial aggregation collapses almost
    everything before the exchange, so the exchange carries the MODEL,
    not the data. This is the frequency structure that still fits on
    one reducer when the key space is billions."""
    base = _cm_base(key_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cm_cell(base, i, width).alias("cell"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("s")
    ).select("s.i", "s.cell")
    return cells.groupBy("i", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def cm_estimate(
    df: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min frequency estimates for the keys in ``probes`` (one
    column named ``key_col``): est = min over the d rows of the probed
    cell — an OVERestimate (never under; collisions only add), within
    ε·N with probability 1−δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉.

    The sketch is model-sized and broadcast to the probe join; the
    estimate is deterministic given the fixed hash family, so a DuckDB
    oracle reproduces it bit-for-bit (the property HLL lacks)."""
    sketch = cm_sketch(df, key_col, depth, width)
    base = _cm_base(key_col)
    pcells = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cm_cell(base, i, width).alias("cell"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("s"),
    ).select(key_col, "s.i", "s.cell")
    return (
        pcells.join(F.broadcast(sketch), ["i", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def bloom_positions(col: Column | str, k: int = 3, m: int = 4096) -> Column:
    """Key → array of its k Bloom bit positions, using the same
    md5-seeded pairwise-independent family as the count-min cells
    (deterministic, so any engine replays the filter exactly)."""
    base = _cm_base(col)
    return F.array(*[_cm_cell(base, i, m) for i in range(k)])


def bloom_build(df: DataFrame, key_col: str, k: int = 3, m: int = 4096) -> DataFrame:
    """Mergeable Bloom filter of ``key_col``: the DISTINCT set-bit
    positions, one row per bit. Size ≤ m rows no matter how many keys —
    partial aggregation collapses the explode map-side, so the exchange
    carries at most m cells (the model), never the data."""
    return (
        df.select(F.explode(bloom_positions(key_col, k, m)).alias("pos"))
        .distinct()
    )


def bloom_decontaminate(
    corpus: DataFrame,
    probes: DataFrame,
    key: Column,
    probe_key: Column,
    id_col: str = "doc_id",
    k: int = 3,
    m: int = 4096,
) -> DataFrame:
    """Bloom-filter benchmark decontamination: mark every corpus row
    whose key MIGHT be in the probe set (``bloom_hit`` — no false
    negatives, bounded false positives), alongside the exact answer
    (``exact_hit``) so the false-positive rate is auditable.

    This is the 100 TB decontamination shape: the probe set is hashed
    ONCE into ≤m bits that ship to every executor as one broadcast row,
    and the corpus pass is scan-side (`forall` over k array lookups) —
    no shuffle of corpus data at all. The exact join here is the audit
    leg; at a scale where the probe set itself is huge, the Bloom leg
    alone prefilters candidates for a narrow exact verify (same
    candidates-then-verify pattern as the MinHash pipeline)."""
    bits = bloom_build(
        probes.select(probe_key.alias("_k")), "_k", k, m
    ).agg(F.array_sort(F.collect_list("pos")).alias("_bits"))
    exact = probes.select(probe_key.alias("_pk")).distinct()
    scored = (
        corpus.select(F.col(id_col), key.alias("_key"))
        .crossJoin(F.broadcast(bits))
        .join(F.broadcast(exact), F.col("_key") == F.col("_pk"), "left")
    )
    hit = F.forall(
        bloom_positions("_key", k, m),
        lambda p: F.array_contains(F.col("_bits"), p),
    )
    return scored.select(
        id_col,
        hit.alias("bloom_hit"),
        F.col("_pk").isNotNull().alias("exact_hit"),
        (hit & F.col("_pk").isNull()).alias("false_positive"),
    )


def kmv_merge_check(
    df: DataFrame,
    key_col: str,
    value_col: str,
    part_expr: Column,
    k: int = 64,
) -> DataFrame:
    """Mergeability proof for the KMV sketch, as a checkable query: per
    key, build one k-minimum-values set per PARTITION SLICE (e.g. per
    day), merge them (union → k smallest — the sketch's merge
    operator), and put the merged estimate next to the direct
    whole-data estimate. Because min-sets compose exactly —
    kmv(A ∪ B) = merge(kmv(A), kmv(B)) — the two estimates are EQUAL,
    and the oracle value-checks that equality. This is the property
    that lets 1000 executors sketch independently and combine results
    without re-reading data.

    Shape: distinct (key, slice, hash) → per-slice rank-k filter →
    merged rank-k — shuffles carry ≤ k·slices rows per key after the
    first distinct."""
    hashed = df.select(
        F.col(key_col).alias("key"),
        part_expr.alias("slice"),
        uniform_hash(F.col(value_col).cast("string")).alias("h"),
    ).distinct()
    w_slice = Window.partitionBy("key", "slice").orderBy(F.asc("h"))
    per_slice = (
        hashed.withColumn("_rn", F.row_number().over(w_slice))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    # merge = k smallest DISTINCT hashes of the union of slice sets
    w_key = Window.partitionBy("key").orderBy(F.asc("h"))
    merged = (
        per_slice.select("key", "h")
        .distinct()
        .withColumn("_rn", F.row_number().over(w_key))
        .filter(F.col("_rn") <= k)
    )

    def estimate(grouped: DataFrame) -> DataFrame:
        return grouped.groupBy("key").agg(
            F.count(F.lit(1)).alias("_n"), F.max("h").alias("_xk")
        ).select(
            "key",
            F.when(F.col("_n") < k, F.col("_n").cast("double"))
            .otherwise(F.round((k - 1) / F.col("_xk"), 4))
            .alias("est"),
        )
    merged_est = estimate(merged).withColumnRenamed("est", "merged_est")
    direct = (
        hashed.select("key", "h")
        .distinct()
        .withColumn("_rn", F.row_number().over(w_key))
        .filter(F.col("_rn") <= k)
    )
    direct_est = estimate(direct).withColumnRenamed("est", "direct_est")
    return (
        merged_est.join(direct_est, "key")
        .select(
            "key",
            "merged_est",
            "direct_est",
            (F.col("merged_est") == F.col("direct_est")).alias("merge_exact"),
        )
    )


def ngram_bloom_decontaminate(
    corpus: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    k: int = 3,
    m: int = 65536,
) -> DataFrame:
    """SUBSTRING-granularity Bloom decontamination — the streaming face
    of `dedup.contamination_spans`: the probe set's n-gram hashes are
    folded once into ≤m bits, and a corpus/stream document is flagged
    when ANY of its n-grams bloom-hits. No false negatives (every true
    13-gram overlap is caught); false positives bounded by m and
    audited here via the exact semi-join leg.

    Stateless by construction: the bloom leg is one per-row
    higher-order expression over the doc's scan-side n-gram hash array
    (`dedup.ngram_hash_array`) against a broadcast bit set — zero
    shuffle, zero state — so the same expression drops contaminated
    docs inside a `readStream` plan, where the exact join (which needs
    the probe table) cannot run. Output per doc: n-gram count, bloom
    hit count, the bloom flag, the exact flag, and the FP flag."""
    from hermod_spark.operators.dedup import _ngram_positions, ngram_hash_array

    probe_h = _ngram_positions(probes, text_col, id_col, n).select("h")
    bits = bloom_build(probe_h, "h", k, m).agg(
        F.array_sort(F.collect_list("pos")).alias("_bits")
    )
    exact_ids = (
        _ngram_positions(corpus, text_col, id_col, n)
        .join(F.broadcast(probe_h.distinct()), "h", "leftsemi")
        .select(id_col)
        .distinct()
        .withColumn("_exact", F.lit(True))
    )
    grams = ngram_hash_array(text_col, n)
    scored = corpus.select(F.col(id_col), grams.alias("_g")).crossJoin(
        F.broadcast(bits)
    )
    hit = lambda h: F.forall(  # noqa: E731
        bloom_positions(h, k, m), lambda p: F.array_contains(F.col("_bits"), p)
    )
    n_hits = F.size(F.filter(F.col("_g"), hit))
    out = scored.select(
        id_col,
        F.size("_g").cast("long").alias("n_grams"),
        n_hits.cast("long").alias("n_bloom_hits"),
        (n_hits > 0).alias("bloom_contaminated"),
    ).join(F.broadcast(exact_ids), id_col, "left")
    return out.select(
        id_col,
        "n_grams",
        "n_bloom_hits",
        "bloom_contaminated",
        F.coalesce("_exact", F.lit(False)).alias("exact_contaminated"),
        (
            F.col("bloom_contaminated")
            & ~F.coalesce("_exact", F.lit(False))
        ).alias("false_positive"),
    )


def hist_quantile_merge_check(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    part_expr: Column,
    n_bins: int = 32,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Mergeable equi-width-histogram quantile sketch, proven and
    error-audited in one query — the third mergeability proof in the
    family (KMV for distincts, count-min for frequencies, this for
    quantiles): per key, each PARTITION SLICE builds its own fixed-bin
    count vector, the merge operator is vector addition, and because
    binning is pointwise the merged histogram is EXACTLY the
    whole-data histogram — 1000 executors can sketch independently.

    Per (key, prob) the output row carries the histogram estimate (the
    upper edge of the first merged bin whose cumulative count reaches
    rank ceil(p·n)), the EXACT order statistic at that rank (ties by
    ``id_col``, the engine-portable convention of
    ``relational.value_quantiles``), the measured error, the bin width,
    ``err_bounded`` (the sketch's guarantee: the exact rank-r element
    lies inside the bin whose upper edge we report, so
    |est − exact| ≤ bin width — always true, value-checked not
    asserted), and ``merge_exact`` (zero per-bin count mismatches
    between merged-from-slices and direct).

    Scale shape: bounds are a per-key 3-scalar agg broadcast back; the
    slice partials and both merge aggs are map-side-combinable counts
    over ≤ n_bins·slices rows per key. Only the exact-quantile audit
    leg sorts per key (disclosed — same cost note as
    ``value_quantiles``; the production exact path is
    ``value_quantiles_twopass``, and a production sketch would skip
    the audit leg entirely)."""
    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        part_expr.alias("slice"),
        F.col(value_col).cast("double").alias("v"),
        F.col(id_col).alias("_id"),
    )
    bounds = vals.groupBy("key").agg(
        F.min("v").alias("_lo"),
        F.max("v").alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    w_bin = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    binned = vals.join(F.broadcast(bounds), "key").select(
        "key",
        "slice",
        "v",
        "_id",
        "_lo",
        "_n",
        w_bin.alias("_w"),
        F.when(w_bin == 0, F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("v") - F.col("_lo")) / w_bin),
                F.lit(n_bins - 1),
            )
        )
        .cast("int")
        .alias("_bin"),
    )
    per_slice = binned.groupBy("key", "slice", "_bin").agg(
        F.count(F.lit(1)).alias("_c")
    )
    merged = per_slice.groupBy("key", "_bin").agg(F.sum("_c").alias("_mc"))
    direct = binned.groupBy("key", "_bin").agg(F.count(F.lit(1)).alias("_dc"))
    bad_bins = (
        merged.join(direct, ["key", "_bin"], "full")
        .groupBy("key")
        .agg(
            F.sum(
                F.when(
                    F.coalesce("_mc", F.lit(-1)) != F.coalesce("_dc", F.lit(-2)),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("_n_bad")
        )
    )
    pf = F.explode(
        F.array(*[F.lit(float(p)) for p in probs])
    ).alias("prob")
    ranks = bounds.select("key", "_lo", "_n", pf).withColumn(
        "_r", F.ceil(F.col("prob") * F.col("_n"))
    )
    # estimate: upper edge of the first merged bin reaching rank r
    cum_w = (
        Window.partitionBy("key")
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = merged.withColumn("_cum", F.sum("_mc").over(cum_w))
    est = (
        ranks.join(cum, "key")
        .filter(F.col("_cum") >= F.col("_r"))
        .groupBy("key", "prob", "_r", "_lo", "_n")
        .agg(F.min("_bin").alias("_qbin"))
    )
    # exact order statistic at the same rank (audit leg)
    w_rank = Window.partitionBy("key").orderBy(F.asc("v"), F.asc("_id"))
    ranked = binned.withColumn("_rn", F.row_number().over(w_rank))
    exact = ranks.join(
        ranked.select("key", "v", "_w", "_rn"),
        (F.col("_rn") == F.col("_r")) & (ranks["key"] == ranked["key"]),
    ).select(ranks["key"], "prob", F.col("v").alias("_exact"), "_w")
    edge = F.col("_lo") + (F.col("_qbin") + 1) * F.col("_w")
    return (
        est.join(exact, ["key", "prob"])
        .join(bad_bins, "key")
        .select(
            "key",
            "prob",
            F.round(edge, 6).alias("est"),
            F.round("_exact", 6).alias("exact"),
            F.round(F.abs(edge - F.col("_exact")), 6).alias("abs_err"),
            F.round("_w", 6).alias("bin_w"),
            (F.abs(edge - F.col("_exact")) <= F.col("_w") + F.lit(1e-9)).alias(
                "err_bounded"
            ),
            (F.col("_n_bad") == 0).alias("merge_exact"),
        )
    )


def cm_merge_check(
    df: DataFrame,
    key_col: str,
    part_expr: Column,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min mergeability proof, as a checkable query (the KMV /
    histogram-quantile pattern, closing the family: every sketch the
    engine ships is PROVEN mergeable by a value-checked identity):
    per PARTITION SLICE, each slice builds its own d×w cell-count
    sketch; the merge operator is cell-wise addition; because each
    input row increments exactly one cell per depth row regardless of
    which slice counted it, the merged matrix EQUALS the whole-data
    sketch. Output: one row per depth row i with merged/direct cell
    counts and the mismatch count (0 ⇔ merge exact).

    Scale shape: the per-slice shuffle carries ≤ d×w×slices count
    rows (the models), never the data; the comparison join is over
    ≤ d×w cells."""
    base = _cm_base(key_col)
    cells = df.select(
        part_expr.alias("_slice"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cm_cell(base, i, width).alias("cell"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("s"),
    ).select("_slice", "s.i", "s.cell")
    per_slice = cells.groupBy("_slice", "i", "cell").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    merged = per_slice.groupBy("i", "cell").agg(F.sum("cnt").alias("mc"))
    direct = cm_sketch(df, key_col, depth, width).withColumnRenamed("cnt", "dc")
    j = merged.join(direct, ["i", "cell"], "full")
    return (
        j.groupBy("i")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(F.coalesce("mc", F.lit(0))).cast("bigint").alias("merged_total"),
            F.sum(F.coalesce("dc", F.lit(0))).cast("bigint").alias("direct_total"),
            F.sum(
                F.when(
                    F.coalesce("mc", F.lit(-1)) != F.coalesce("dc", F.lit(-2)),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_mismatch"),
        )
        .select(
            "i",
            F.col("n_cells").cast("bigint").alias("n_cells"),
            "merged_total",
            "direct_total",
            (F.col("n_mismatch") == 0).alias("merge_exact"),
        )
    )


def bloom_merge_check(
    df: DataFrame,
    key_col: str,
    part_expr: Column,
    k: int = 3,
    m: int = 4096,
) -> DataFrame:
    """Bloom mergeability proof: per-slice bit sets OR-ed together
    (set union of bit positions) vs the whole-data filter — equal by
    construction (a bit is set iff SOME key sets it, regardless of
    which slice saw the key), value-checked as one summary row:
    merged/direct bit counts and the symmetric difference (0 ⇔ merge
    exact). The identity that lets every executor build its filter
    independently and a reducer OR m bits instead of re-reading data."""
    sliced = df.select(
        part_expr.alias("_slice"),
        F.explode(bloom_positions(key_col, k, m)).alias("pos"),
    ).distinct()  # per-slice bit sets
    merged = sliced.select("pos").distinct().withColumn("_m", F.lit(1))
    direct = bloom_build(df, key_col, k, m).withColumn("_d", F.lit(1))
    j = merged.join(direct, "pos", "full")
    return j.agg(
        F.sum(F.coalesce("_m", F.lit(0))).cast("bigint").alias("merged_bits"),
        F.sum(F.coalesce("_d", F.lit(0))).cast("bigint").alias("direct_bits"),
        F.sum(
            F.when(F.col("_m").isNull() | F.col("_d").isNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_sym_diff"),
    ).select(
        "merged_bits",
        "direct_bits",
        (F.col("n_sym_diff") == 0).alias("merge_exact"),
    )


def kmv_pairwise_overlap(
    df: DataFrame,
    set_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise Jaccard / union / intersection ESTIMATES between the
    ``value_col`` sets of every pair of ``set_col`` groups, from
    per-group KMV sketches (Beyer et al., "On synopses for distinct-
    value estimation under multiset operations", SIGMOD 2007) — the
    sketch counterpart of the exact ``source_overlap_matrix``: at
    100 TB the exact form shuffles every distinct (set, value) pair
    twice, while this one reduces each group to k hashes and compares
    O(sets² · k) rows.

    Estimator: merge each pair's two k-sets, keep the k smallest of
    the union (= the KMV sketch of A∪B); ρ = fraction of kept hashes
    present in BOTH k-sets estimates J(A,B); union ≈ (k-1)/x_k (exact
    when the merged set has < k hashes); intersection ≈ ρ · union.
    Deterministic md5 hashing makes every estimate a pure function of
    the data — bit-reproducible in the DuckDB oracle.

    Shape: one distinct + one per-group rank window bound the corpus
    leg; everything after runs on ≤ sets·k rows (pair expansion via a
    broadcast equi-join, never a nested loop)."""
    hashes = (
        df.select(F.col(set_col).alias("s"), uniform_hash(value_col).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("s").orderBy("h")
    ksets = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("s", "h")
        .localCheckpoint()
    )
    sets = ksets.select("s").distinct()
    pairs = (
        sets.alias("x")
        .join(sets.alias("y"), F.col("x.s") < F.col("y.s"))
        .select(F.col("x.s").alias("sa"), F.col("y.s").alias("sb"))
    )
    # equi-join on the member set (each pair explodes to its two
    # members) so the tiny pair table broadcasts — no nested loop
    members = pairs.select(
        "sa", "sb", F.explode(F.array("sa", "sb")).alias("s")
    )
    merged = (
        F.broadcast(members)
        .join(ksets, "s")
        .groupBy("sa", "sb", "h")
        .agg(
            F.max((F.col("s") == F.col("sa")).cast("int")).alias("in_a"),
            F.max((F.col("s") == F.col("sb")).cast("int")).alias("in_b"),
        )
    )
    w2 = Window.partitionBy("sa", "sb").orderBy("h")
    kept = merged.withColumn("rn", F.row_number().over(w2)).filter(
        F.col("rn") <= k
    )
    jac = F.sum(F.col("in_a") * F.col("in_b")).cast("double") / F.count(
        F.lit(1)
    )
    uni = F.when(
        F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
    ).otherwise((k - 1) / F.max(F.when(F.col("rn") == k, F.col("h"))))
    return (
        kept.groupBy("sa", "sb")
        .agg(
            F.round(jac, 4).alias("est_jaccard"),
            F.round(uni, 4).alias("est_union"),
            F.round(jac * uni, 4).alias("est_intersection"),
        )
        .select(
            F.col("sa").alias(f"{set_col}_a"),
            F.col("sb").alias(f"{set_col}_b"),
            "est_jaccard",
            "est_union",
            "est_intersection",
        )
    )
