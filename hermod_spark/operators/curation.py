"""Training-data curation operators over ``documents`` — the pipeline
steps between raw corpus and training shards.

All native Column expressions (the chunker uses the same let-binding
explode shape as the shingler); the split assignment reuses the
deterministic md5 uniform hash, so shard membership is a pure function
of the key — stable across runs, engines, and cluster sizes, which is
what makes train/test splits reproducible at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hermod_spark.functions.text import tokens
from hermod_spark.operators.sketches import uniform_hash


def split_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic hash split: md5-fraction of the key against
    cumulative weight boundaries. Same key → same split, forever,
    everywhere; no sampling state, no shuffle."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    h = uniform_hash(key_col)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        expr = (
            F.when(h < acc, F.lit(name))
            if expr is None
            else expr.when(h < acc, F.lit(name))
        )
    split = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", split)


def clean_text(col: Column | str) -> Column:
    """Normalization: lowercase, collapse whitespace runs to single
    spaces, strip non-alphanumeric-basic-punctuation characters, trim."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.lower(c), r"[^a-z0-9\s\.,;:!\?'\-]", " ")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 100,
    overlap: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — one
    output row per chunk (the reference's row→N-rows shape, fully
    native: no Python, no shuffle; chunk fan-out happens in the scan
    projection).

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens); stride =
    chunk_tokens - overlap; the final partial chunk is kept."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(text_col)

    def _chunks(t: Column) -> Column:
        n_chunks = F.when(F.size(t) <= chunk_tokens, F.lit(1)).otherwise(
            F.ceil((F.size(t) - F.lit(chunk_tokens)) / F.lit(stride)) + 1
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.concat_ws(
                    " ", F.slice(t, i * stride + 1, F.lit(chunk_tokens))
                ).alias("chunk_text"),
                F.least(F.size(t) - i * stride, F.lit(chunk_tokens)).alias(
                    "chunk_len"
                ),
            ),
        )

    # explode_outer: plain explode's implicit size>0 filter would
    # re-evaluate the whole chunk array per row (dedup.shingles note);
    # the array is never empty (short/empty docs yield one chunk)
    chunked = df.select(
        F.col(id_col),
        F.explode_outer(
            F.flatten(F.transform(F.array(toks), _chunks))
        ).alias("c"),
    ).filter(F.col("c").isNotNull())
    return chunked.select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.chunk_len").alias("chunk_len"),
    )


def sample_mixture(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus-mixture resampling (domain reweighting):
    keep a row iff uniform_hash(key) < rates[source]; sources not
    listed keep everything. A pure filter — membership is a function
    of the key alone, so the sampled corpus is reproducible at any
    parallelism and the predicate pushes into the scan; no sampling
    state, no shuffle, no RNG."""
    h = uniform_hash(key_col)
    rate: Column | None = None
    for s, r in sorted(rates.items()):
        cond = F.col(source_col) == s
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate_expr = F.lit(1.0) if rate is None else rate.otherwise(F.lit(1.0))
    return df.filter(h < rate_expr)


def pack_chunks(
    chunks: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    len_col: str = "chunk_len",
) -> DataFrame:
    """Context-window packing: assign chunks to fixed token-budget
    training bins. A chunk whose exclusive prefix sum (within its
    shard's (doc_id, chunk_id) order) lies in [k·budget, (k+1)·budget)
    lands in bin k — a bin may overrun by at most one straddling chunk,
    the standard streaming-pack tradeoff.

    Scale shape: packing is inherently sequential, so we shard first
    (doc_id mod n_shards — deterministic, engine-independent) and run
    the running sum per shard. Parallelism = n_shards; pick it near the
    cluster width. One shuffle (the window partition), no Python. A bin
    is globally identified by (shard, bin_id)."""
    from pyspark.sql import Window

    sharded = chunks.withColumn("shard", (F.col(id_col) % n_shards).cast("int"))
    w = Window.partitionBy("shard").orderBy(F.col(id_col), F.col(chunk_col))
    cum_excl = F.sum(len_col).over(w) - F.col(len_col)
    return sharded.withColumn(
        "bin_id", F.floor(cum_excl / F.lit(budget)).cast("int")
    )


def contamination_check(
    df: DataFrame,
    probe_ngrams: list[str],
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination scan: documents containing ANY probe
    n-gram. The probe set is a literal array (broadcast by
    construction); membership is `arrays_overlap` against the doc's
    n-gram array — one scan, no join, no shuffle.

    Probes are validated up front: doc-side grams are exactly-n-word
    single-space-joined lowercase strings, so a probe with a
    different word count (or stray whitespace) could never match ANY
    document — the leak would silently pass the gate. Probes are
    whitespace-normalized here; a wrong word count raises."""
    from hermod_spark.functions.text import ngrams

    norm = [" ".join(p.lower().split()) for p in probe_ngrams]
    bad = [p for p in norm if len(p.split(" ")) != n]
    if bad:
        raise ValueError(
            f"contamination_check: probes must be exactly {n} words "
            f"(doc n-grams are {n}-word strings; these can never "
            f"match): {bad[:3]}"
        )
    probes = F.array(*[F.lit(p) for p in norm])
    return df.filter(F.arrays_overlap(ngrams(text_col, n), probes)).select(id_col)


def stratified_sample_exact(
    df: DataFrame,
    k: int = 50,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    oversample: float = 8.0,
    verify_counts: bool = True,
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: the k smallest
    ``uniform_hash(key)`` in each stratum — reproducible at any
    parallelism (membership is a pure function of the key), unlike
    ``df.sample`` whose output depends on partitioning.

    Scale shape (two-pass hash-threshold): the naive form —
    ``row_number`` partitioned by stratum — sorts ENTIRE strata, and
    strata are few (the low-cardinality-window trap, same as exact
    quantiles). Instead:

    1. count per stratum (map-side-combinable agg; collected result is
       #strata rows, model-sized);
    2. filter ``hash < oversample·k/n`` per stratum — a scan-side
       predicate that keeps ~oversample·k rows per stratum regardless
       of n;
    3. rank only the survivors — the window sorts ~8k rows per
       stratum, not n.

    The hash-threshold filter is PROBABILISTICALLY a superset of the
    answer: a stratum loses rows versus the full ranking iff its k-th
    smallest hash exceeds oversample·k/n, which happens with
    probability ~exp(−Θ(k·oversample)) (Chernoff on the binomial
    survivor count) — ~1e-100 at the defaults, but not zero (ADVICE
    r3). ``verify_counts=True`` (default) closes the gap exactly: one
    extra model-sized agg checks each stratum kept ≥ min(k, n)
    survivors, and any stratum that missed falls back to ranking its
    full population (threshold 1.0), making the result
    UNCONDITIONALLY identical to the full-sort oracle. Pass
    ``verify_counts=False`` to skip the check (saves one job when the
    probabilistic guarantee is acceptable).

    Eager by design: the stratum-count pass (and the verify pass) run
    Spark jobs at plan-build time — the counts ARE the thresholds the
    returned plan embeds."""
    from pyspark.sql import Window

    h = uniform_hash(key_col)
    counts = (
        df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n")).collect()
    )
    if not counts:  # empty input
        return df.select(F.col(key_col), F.col(stratum_col)).withColumn(
            "rn", F.lit(0)
        ).limit(0)

    def build_thr(full_rank_strata: set) -> Column:
        thr: Column | None = None
        for r in sorted(counts, key=lambda r: (r[0] is None, str(r[0]))):
            if r[0] in full_rank_strata:
                t = 1.1  # hash ∈ [0,1): keep the whole stratum
            else:
                t = min(1.0, oversample * k / max(r["n"], 1))
            # eqNullSafe: a NULL stratum must match its own threshold
            # too — `==` would leave every NULL row on the
            # otherwise(1.0) branch and full-sort the whole NULL stratum
            cond = (
                F.col(stratum_col).isNull()
                if r[0] is None
                else F.col(stratum_col).eqNullSafe(F.lit(r[0]))
            )
            thr = (
                F.when(cond, F.lit(t)) if thr is None else thr.when(cond, F.lit(t))
            )
        return thr.otherwise(F.lit(1.0))

    survivors = df.filter(h < build_thr(set()))
    if verify_counts:
        kept = {
            r[0]: r["kept"]
            for r in survivors.groupBy(stratum_col)
            .agg(F.count(F.lit(1)).alias("kept"))
            .collect()
        }
        short = {
            r[0]
            for r in counts
            if kept.get(r[0], 0) < min(k, r["n"])
        }
        if short:
            survivors = df.filter(h < build_thr(short))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(key_col, stratum_col, "rn")
    )


def length_percentile_filter(
    df: DataFrame,
    lo: float = 0.05,
    hi: float = 0.95,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop length-outlier documents: keep docs whose token count sits
    within the corpus's exact [p_lo, p_hi] (a standard curation gate —
    truncated fragments and concatenation blobs sit in the tails).

    The thresholds come from the generic two-pass exact quantile
    (`relational.value_quantiles_twopass` over a single corpus-wide
    group) — at 100 TB the single-group case is exactly where the
    naive one-window form degenerates to ONE sort partition, and the
    histogram-refine shape keeps every sort bucket-sized. The 2-row
    threshold frame broadcasts back onto the scan."""
    from hermod_spark.functions.text import token_count
    from hermod_spark.operators.relational import value_quantiles_twopass

    lengths = df.select(
        F.lit("all").alias("_g"),
        F.col(id_col),
        token_count(text_col).cast("double").alias("n_tok"),
    # LAZY checkpoint (r14): three consumers re-evaluated the
    # token_count text scan — the quantile's eager histogram job, its
    # lazy refine pass, and the final filter scan. Cutting here makes
    # the histogram job materialize the (id, n_tok) frame (16 B/doc —
    # vastly cheaper to keep than to re-tokenize KBs/doc of text
    # twice more) and the other two passes read the cache; measured
    # count3 1.88 → 1.15 s at sf0.1, identical rows.
    ).localCheckpoint(eager=False)
    from hermod_spark.operators.relational import quantile_column_names

    lo_name, hi_name = quantile_column_names((lo, hi))
    qs = value_quantiles_twopass(
        lengths, probs=(lo, hi), width=16.0,
        group_col="_g", value_col="n_tok", id_col=id_col,
    ).drop("_g")
    return (
        lengths.crossJoin(F.broadcast(qs))
        .filter(
            (F.col("n_tok") >= F.col(lo_name)) & (F.col("n_tok") <= F.col(hi_name))
        )
        .select(
            id_col,
            F.col("n_tok").cast("int").alias("n_tokens"),
            lo_name,
            hi_name,
        )
    )


def token_budget_by_split(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    weights: dict[str, float] | None = None,
    count_expr: Column | None = None,
) -> DataFrame:
    """The 'how many training tokens do I have' rollup: deterministic
    split assignment + per-split doc/token totals. Pure scan-side
    split hash + one map-side-combinable aggregation.

    ``count_expr`` swaps the default whitespace ``token_count`` for a
    tokenizer-faithful counter — e.g.
    ``functions.bpe.bpe_token_count(text_col, merges)`` (VERDICT r12
    #6: real packing budgets are BPE tokens, and whitespace counts
    mis-budget code/CJK-heavy corpora badly)."""
    from hermod_spark.functions.text import token_count

    nt = count_expr if count_expr is not None else token_count(text_col)
    split = split_assign(df.select(key_col, text_col), key_col, weights)
    return (
        split.select("split", nt.alias("_nt"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("total_tokens"),
        )
    )


def group_centroids(
    embeddings: DataFrame,
    group_expr: Column,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group element-wise mean embedding: posexplode → (group, pos)
    partial-aggregated sums → re-assembled ordered array. The shuffle
    key is (group, position) — dim× more keys than groups, which is
    exactly what keeps hot groups from concentrating on one reducer."""
    exploded = embeddings.select(
        group_expr.alias("grp"), F.posexplode(F.col(vec_col))
    ).toDF("grp", "pos", "x")
    sums = exploded.groupBy("grp", "pos").agg(
        F.sum(F.col("x").cast("double")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        sums.groupBy("grp")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", (F.col("s") / F.col("n")).alias("m")))
            ).alias("pairs")
        )
        .select(
            "grp",
            F.transform(F.col("pairs"), lambda p: F.round(p.getField("m"), 6)).alias(
                "centroid"
            ),
        )
    )


def boilerplate_ngrams(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document boilerplate detector (the C4/RefinedWeb
    repeated-passage rule family): word n-grams appearing in
    ``min_docs``-or-more DISTINCT documents, with their document
    frequencies — headers, footers, license blurbs, templated spans.

    Scale shape: `array_distinct` INSIDE each document before the
    explode makes every emitted (ngram) row already doc-unique, so the
    single shuffle is a plain count aggregation with map-side combine
    — no `count_distinct`, no second shuffle. Hot boilerplate n-grams
    are exactly the high-row-count keys, and partial aggregation
    absorbs them before the exchange."""
    from hermod_spark.functions.text import ngrams

    pairs = df.select(
        F.explode_outer(
            F.array_distinct(ngrams(F.col(text_col), n))
        ).alias("ngram")
    ).filter(F.col("ngram").isNotNull())
    return (
        pairs.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def boilerplate_fraction(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_dict: bool = True,
) -> DataFrame:
    """Per-document boilerplate load: the fraction of the document's
    n-gram occurrences (with multiplicity) that are corpus boilerplate
    per :func:`boilerplate_ngrams`. The downstream gate drops or
    de-prioritizes documents above a threshold.

    The dictionary side is a corpus aggregate but typically tiny
    relative to the corpus (only n-grams crossing the ``min_docs``
    bar); ``broadcast_dict=True`` (default) broadcasts it so the
    per-document pass stays shuffle-on-ngram-free. At 100 TB with a
    low bar the dictionary can be large — set ``broadcast_dict=False``
    to fall back to a shuffle join (AQE will still broadcast if it
    turns out small)."""
    from hermod_spark.functions.text import ngrams

    bp = boilerplate_ngrams(df, n, min_docs, text_col, id_col).select(
        "ngram", F.lit(1).alias("_bp")
    )
    if broadcast_dict:
        bp = F.broadcast(bp)
    occ = df.select(
        F.col(id_col),
        F.explode_outer(ngrams(F.col(text_col), n)).alias("ngram"),
    )
    agg = occ.join(bp, "ngram", "left").groupBy(id_col).agg(
        F.count("ngram").alias("n_ngrams"),
        F.sum(F.coalesce(F.col("_bp"), F.lit(0))).alias("n_boilerplate"),
    )
    return agg.select(
        id_col,
        "n_ngrams",
        "n_boilerplate",
        F.round(
            F.col("n_boilerplate") / F.greatest(F.col("n_ngrams"), F.lit(1)), 6
        ).alias("boilerplate_frac"),
    )


def gopher_flags(
    df: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopwords: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style quality rule battery (Rae et al. 2021, the public
    MassiveText filters, doc-level subset): word-count bounds, mean
    word length bounds, symbol-to-word ratio, minimum stopword hits —
    one boolean per rule plus the conjunction ``keep``. Pure
    scan-side expressions, zero shuffles, zero Python.

    The token array is materialized ONCE through a first projection
    (multi-referenced non-cheap aliases are not collapsed), so the
    tokenizer runs once per row, not once per flag."""
    from hermod_spark.functions.text import STOPWORDS, tokens

    sym = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9\s]", "")
    )
    bound = df.select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("_t"),
        sym.alias("_nsym"),
    )
    n_words = F.size(F.col("_t"))
    mean_len = F.aggregate(
        "_t", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ) / F.greatest(n_words, F.lit(1)).cast("double")
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.col("_t")),
            F.array(*[F.lit(w) for w in STOPWORDS["en"]]),
        )
    )
    sym_ratio = F.col("_nsym") / F.greatest(n_words, F.lit(1)).cast("double")
    stats = bound.select(
        id_col,
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        stop_hits.alias("stopword_hits"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
    )
    f_wc = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    f_ml = (F.col("mean_word_len") >= min_mean_len) & (
        F.col("mean_word_len") <= max_mean_len
    )
    f_sw = F.col("stopword_hits") >= min_stopwords
    f_sym = F.col("symbol_ratio") <= max_symbol_ratio
    return stats.select(
        "*",
        f_wc.alias("flag_word_count"),
        f_ml.alias("flag_mean_len"),
        f_sw.alias("flag_stopwords"),
        f_sym.alias("flag_symbols"),
        (f_wc & f_ml & f_sw & f_sym).alias("keep"),
    )


# Fixed linear quality-model weights (fasttext-style shape: at 100 TB
# the weights come from a trained classifier; the engine contract is
# the feature build + dot product, which is what the oracle checks).
# Ordered: intercept, saturated-length, mean word len, stopword frac,
# symbol ratio, digit ratio.
QUALITY_WEIGHTS = (-1.0, 2.5, 0.2, 3.0, -8.0, -2.0)


def quality_logistic(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_score: bool = False,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Linear quality classifier over cheap scan-side text features —
    the fasttext-classifier stage of a pretraining filter (CCNet /
    LLaMA-style), expressed as pure native expressions: one projection
    builds the token array once, the logit is a fixed dot product, and
    ``keep`` is the logit sign. Zero shuffles, zero Python, one text
    scan — the cheapest possible per-doc pass at corpus scale.

    The gated surface exposes the LOGIT (rounded), not the sigmoid
    score: every feature is rounded to 6dp first and the combination is
    a fixed left-to-right double chain, so DuckDB reproduces it
    bit-for-bit; exp() is NOT correctly-rounded-identical across
    engines, so the probability (``with_score=True``) stays a
    library-only column.

    ``passthrough`` carries original columns into the result, so a
    pipeline (batch OR stream) filters on ``keep`` with no self-join —
    the property that lets this stage chain statelessly inside a
    streaming ingest plan."""
    from hermod_spark.functions.text import STOPWORDS, tokens

    w0, w_len, w_ml, w_sf, w_sym, w_dig = QUALITY_WEIGHTS
    txt = F.col(text_col)
    sym = F.length(txt) - F.length(
        F.regexp_replace(txt, r"[^a-zA-Z0-9\s]", "")
    )
    dig = F.length(txt) - F.length(F.regexp_replace(txt, r"[0-9]", ""))
    bound = df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        tokens(F.lower(txt)).alias("_t"),
        sym.alias("_nsym"),
        dig.alias("_ndig"),
        F.length(txt).alias("_nchr"),
    )
    n_words = F.size(F.col("_t"))
    denom = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = F.round(
        F.aggregate("_t", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        / denom,
        6,
    )
    stop_frac = F.round(
        F.size(
            F.array_intersect(
                F.array_distinct(F.col("_t")),
                F.array(*[F.lit(w) for w in STOPWORDS["en"]]),
            )
        )
        / denom,
        6,
    )
    sym_ratio = F.round(F.col("_nsym") / denom, 6)
    dig_ratio = F.round(
        F.col("_ndig") / F.greatest(F.col("_nchr"), F.lit(1)).cast("double"), 6
    )
    w_sat = F.least(n_words, F.lit(256)).cast("double") / F.lit(256.0)
    logit = (
        F.lit(w0)
        + F.lit(w_len) * w_sat
        + F.lit(w_ml) * mean_len
        + F.lit(w_sf) * stop_frac
        + F.lit(w_sym) * sym_ratio
        + F.lit(w_dig) * dig_ratio
    )
    cols = [
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        n_words.alias("n_words"),
        F.round(logit, 6).alias("quality_logit"),
        (logit > 0).alias("keep"),
    ]
    if with_score:
        cols.append(
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score")
        )
    return bound.select(*cols)


def shard_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "s0",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    (shard, pos) address from a seeded content hash — the "shuffle the
    corpus before tokenizing" step of a pretraining data build, made
    reproducible (same seed ⇒ same order on any cluster, any partition
    layout).

    Scale shape: NO global sort. The md5 hash both assigns the shard
    (uniform by construction) and orders rows WITHIN the shard via a
    shard-partitioned window — n_shards independent sorts over n/shards
    rows each, which is exactly how a 100 TB corpus gets written out as
    shuffled shards in parallel. A global ORDER BY rank would be a
    range-exchange over everything for no additional randomness."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col), h.alias("_h"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def source_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source corpus health rollup — the dashboard a curation run
    publishes per ingest source: volume, token mass, quality-filter
    pass rate, and exact-duplicate rate. Composes the scan-side
    operators (token count, quality logit) with one corpus-wide
    duplicate count; the final rollup groups by source.

    Scale shape: per-doc metrics are pure projection — the text rides
    quality_logistic's ``passthrough`` so token count and content hash
    compute scan-side on the SAME pass (joining them back by id would
    scan the corpus twice and add a corpus-sized id shuffle); the
    duplicate flag is ONE shuffle on the content hash (≈uniform md5
    keys, the exact-dedup shape); the rollup is a map-side-combinable
    agg over #sources groups."""
    from pyspark.sql import Window

    from hermod_spark.functions.text import token_count

    keyed = (
        quality_logistic(
            df, text_col=text_col, id_col=id_col,
            passthrough=(source_col, text_col),
        )
        .withColumn("_nt", token_count(F.col(text_col)))
        .withColumn("_k", F.md5(F.col(text_col)))
        .drop(text_col)
    )
    dup = F.count(F.lit(1)).over(Window.partitionBy("_k")) > 1
    flagged = keyed.withColumn("_dup", dup)
    return (
        flagged.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("_nt").cast("bigint")).alias("total_tokens"),
            F.round(
                F.sum(F.col("_nt").cast("bigint"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_doc_tokens"),
            F.round(
                F.count(F.when(F.col("keep"), 1))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("quality_keep_frac"),
            F.round(
                F.count(F.when(F.col("_dup"), 1))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("exact_dup_frac"),
        )
        .orderBy(source_col)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    seed: str = "s0",
    id_col: str = "doc_id",
) -> dict:
    """End of the curation pipeline: materialize the deterministically
    shuffled corpus as training shards — one parquet directory
    partition per shard, rows stored in shard-shuffle order (the order
    a sequential reader should consume them in).

    Scale shape: :func:`shard_shuffle` assigns (shard, pos); the write
    repartitions BY SHARD (n_shards exchanges-worth of data moves once)
    and sorts within each partition by pos — n_shards independent
    sorts, no global ORDER BY, one file per shard. Returns a manifest
    {shard: n_rows} read back from the written data (the audit a
    training job checks before consuming)."""
    addressed = df.join(shard_shuffle(df, id_col, n_shards, seed), id_col)
    (
        # sort by (shard, pos), not pos alone: partitionBy('shard')
        # REQUIRES an ordering on the partition column, and a
        # pos-only sort makes the writer insert its own sort-by-shard
        # on top — which is not guaranteed stable on pos when it
        # spills, silently breaking the shard-shuffle row order (and
        # always paying a redundant re-sort). Leading with shard
        # satisfies the writer's requirement; pos then orders rows
        # within each shard file.
        addressed.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    spark = df.sparkSession
    back = spark.read.parquet(path).groupBy("shard").count().collect()
    return {int(r["shard"]): r["count"] for r in back}


def _per_source_share(
    df: DataFrame,
    budget_tokens: int,
    weights: dict[str, float] | None,
    text_col: str,
    source_col: str,
) -> tuple[DataFrame, Column]:
    """Shared planning core of mixture_plan / epoch_plan (and
    sample_mixture's weight chain): ONE map-side-combinable agg to
    (source, n_docs, available_tokens) plus the per-source budgeted
    token share (uniform over present sources when weights is None —
    the window runs over the #sources-row aggregate, not the corpus).
    A fix to rate/weight semantics lands in both planners at once."""
    from hermod_spark.functions.text import token_count

    per = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col)).cast("bigint")).alias(
            "available_tokens"
        ),
    )
    if weights is None:
        n_sources = F.count(F.lit(1)).over(Window.partitionBy())
        share = (F.lit(float(budget_tokens)) / n_sources).cast("double")
    else:
        w: Column | None = None
        for s, r in sorted(weights.items()):
            cond = F.col(source_col) == s
            w = F.when(cond, F.lit(r)) if w is None else w.when(cond, F.lit(r))
        share = F.lit(float(budget_tokens)) * (
            F.lit(0.0) if w is None else w.otherwise(F.lit(0.0))
        )
    return per, share


def mixture_plan(
    df: DataFrame,
    budget_tokens: int,
    weights: dict[str, float] | None = None,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Token-budget-driven mixture planning: given a total training
    token budget and target source weights, compute per source the
    available token mass, the budgeted share, and the deterministic
    sampling rate (min(1, share/available)) that
    :func:`sample_mixture` then applies. This is the planning half of
    domain reweighting — the numbers a pipeline pins BEFORE sampling,
    so the sampled corpus hits the budget by construction.

    Uniform weights by default. One map-side-combinable agg (#sources
    groups); token counts are exact long sums, the rate a single
    double division — partitioning-independent, oracle-replayable."""
    per, share = _per_source_share(
        df, budget_tokens, weights, text_col, source_col
    )
    return per.select(
        source_col,
        "n_docs",
        "available_tokens",
        F.round(share, 6).alias("budget_tokens"),
        F.round(
            F.least(
                F.lit(1.0),
                share / F.greatest(F.col("available_tokens"), F.lit(1)).cast("double"),
            ),
            6,
        ).alias("sample_rate"),
    )


def epoch_plan(
    df: DataFrame,
    budget_tokens: int,
    weights: dict[str, float] | None = None,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Data-constrained mixture planning (the Muennighoff et al. 2023
    "Scaling Data-Constrained Language Models" regime): when a
    source's budgeted share EXCEEDS its available tokens,
    `mixture_plan`'s sample_rate caps at 1.0 and silently under-fills
    the budget. This operator plans the UPSAMPLING instead: per
    source, ``n_epochs`` full passes (floor of share/available) plus a
    fractional ``tail_rate`` pass, so
    n_epochs·available + tail_rate·available ≈ share.

    Same scale shape as mixture_plan: ONE map-side-combinable
    aggregation to #sources rows; ratios are single double divisions
    of exact long sums — partitioning-independent, oracle-replayable."""
    per, share = _per_source_share(
        df, budget_tokens, weights, text_col, source_col
    )
    ratio = share / F.greatest(F.col("available_tokens"), F.lit(1)).cast(
        "double"
    )
    n_epochs = F.floor(ratio).cast("long")
    tail = F.round(ratio - n_epochs, 6)
    return per.select(
        source_col,
        "n_docs",
        "available_tokens",
        F.round(share, 6).alias("budget_tokens"),
        n_epochs.alias("n_epochs"),
        tail.alias("tail_rate"),
        (
            n_epochs * F.col("available_tokens")
            + F.floor(tail * F.col("available_tokens")).cast("long")
        ).alias("planned_tokens"),
    )


def materialize_epochs(
    df: DataFrame,
    budget_tokens: int,
    weights: dict[str, float] | None = None,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Execute an :func:`epoch_plan`: one output row per (doc, epoch)
    the schedule trains on — every doc repeats for each full epoch,
    and the fractional tail epoch takes the deterministic md5-fraction
    subset (``uniform_hash(doc_id:tail) < tail_rate`` — same rule
    family as `split_assign`, salted so the tail subset is independent
    of the train/val split). Repetition is a scan-side
    explode(sequence(0, n_epochs)) against the BROADCAST #sources-row
    plan — the corpus never shuffles, and the fan-out is exactly the
    repetition factor a trainer would apply."""
    from hermod_spark.operators.sketches import uniform_hash

    plan = epoch_plan(df, budget_tokens, weights, text_col, source_col)
    tail_hash = uniform_hash(
        F.concat(F.col(id_col).cast("string"), F.lit(":tail"))
    )
    return (
        df.select(id_col, source_col)
        .join(
            F.broadcast(plan.select(source_col, "n_epochs", "tail_rate")),
            source_col,
        )
        .select(
            id_col,
            source_col,
            F.explode(F.sequence(F.lit(0), F.col("n_epochs"))).alias("epoch"),
            "n_epochs",
            "tail_rate",
            tail_hash.alias("_th"),
        )
        .filter(
            (F.col("epoch") < F.col("n_epochs"))
            | (F.col("_th") < F.col("tail_rate"))
        )
        .select(id_col, source_col, F.col("epoch").cast("int").alias("epoch"))
    )


def split_leakage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Eval-hygiene audit: near-duplicate pairs that STRADDLE the
    train/val/test boundary — the leakage a hash split cannot prevent
    (near-dups hash independently) and the reason serious pipelines
    dedup BEFORE splitting. Output is one row per (split_a, split_b)
    combination with the candidate-pair count, same-split pairs
    included as the baseline.

    Scale shape: reuses the single-pass banded candidate generator
    (never all-pairs); the split labels are scan-side hash functions of
    the id, so the join only carries the candidate pair list; the
    rollup is ≤ |splits|² rows."""
    from hermod_spark.operators.dedup import near_dup_candidates

    pairs = near_dup_candidates(df, text_col, id_col, max_bucket=max_bucket)
    labeled = split_assign(df.select(id_col), id_col, weights).select(
        F.col(id_col), F.col("split")
    )
    a = labeled.select(
        F.col(id_col).alias("id_a"), F.col("split").alias("_sa")
    )
    b = labeled.select(
        F.col(id_col).alias("id_b"), F.col("split").alias("_sb")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.least("_sa", "_sb").alias("split_a"),
            F.greatest("_sa", "_sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("is_leak", F.col("split_a") != F.col("split_b"))
    )


def pack_efficiency(
    packed: DataFrame,
    budget: int = 512,
    len_col: str = "chunk_len",
) -> DataFrame:
    """Packing-efficiency report over :func:`pack_chunks` output — the
    number a training job actually pays for: per (shard, bin) token
    fill, rolled up per shard to bin count, mean fill rate, and the
    fraction of bins that overran the budget (bounded by design at one
    straddling chunk each). Low fill = wasted accelerator steps; high
    overrun = truncation loss.

    One (shard, bin) agg + one per-shard rollup, both
    map-side-combinable; exact long sums and single divisions keep the
    doubles oracle-replayable."""
    bins = packed.groupBy("shard", "bin_id").agg(
        # len_col mirrors pack_chunks' parameter — a non-default name
        # there must not break the report stage here
        F.sum(F.col(len_col).cast("bigint")).alias("_fill")
    )
    return (
        bins.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("_fill").alias("_tokens"),
            F.count(F.when(F.col("_fill") > budget, 1)).alias("_over"),
        )
        .select(
            "shard",
            "n_bins",
            F.col("_tokens").cast("bigint").alias("total_tokens"),
            F.round(
                F.col("_tokens") / (F.col("n_bins") * F.lit(float(budget))), 6
            ).alias("avg_fill"),
            F.round(F.col("_over") / F.col("n_bins").cast("double"), 6).alias(
                "overrun_frac"
            ),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Incremental-crawl bookkeeping: per source, how the new corpus
    snapshot differs from the previous one BY CONTENT — docs whose
    content hash appears only in the new snapshot (added), only in the
    old (removed), and in both (carried). Content identity, not id
    identity: a re-crawled page with a new id but identical text is
    `carried`, which is exactly what incremental dedup-aware ingestion
    needs to know.

    Scale shape: one distinct per side on (source, md5) — ~uniform
    hash keys — then a full outer join on those keys and a per-source
    rollup; the exchange carries one row per distinct content, never
    the texts."""
    o = old.select(
        F.col(source_col).alias("src"), F.md5(F.col(text_col)).alias("k")
    ).distinct()
    n = new.select(
        F.col(source_col).alias("src"), F.md5(F.col(text_col)).alias("k")
    ).distinct()
    joined = o.withColumn("_o", F.lit(1)).join(
        n.withColumn("_n", F.lit(1)), ["src", "k"], "full_outer"
    )
    return (
        joined.groupBy(F.col("src").alias(source_col))
        .agg(
            F.count(F.when(F.col("_n").isNotNull() & F.col("_o").isNull(), 1)).alias(
                "added"
            ),
            F.count(F.when(F.col("_o").isNotNull() & F.col("_n").isNull(), 1)).alias(
                "removed"
            ),
            F.count(
                F.when(F.col("_o").isNotNull() & F.col("_n").isNotNull(), 1)
            ).alias("carried"),
        )
        .orderBy(source_col)
    )


def dedup_keep_best(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Quality-aware exact dedup: within each canonical-fingerprint
    duplicate group (functions.text.fingerprint — word-set key), keep
    the HIGHEST-quality member (heuristic quality_score; doc_id breaks
    ties deterministically) instead of exact_dedup's min-id survivor.
    This is the curation-pipeline form: duplicate clusters usually
    differ in boilerplate/truncation, and the kept copy should be the
    best one, not the first-crawled one.

    One hash shuffle on the fingerprint; both windows share the same
    partitioning so Spark plans a single exchange + sort. Key space is
    ~|docs| (uniform md5), so partitions stay balanced at any scale.
    Output: survivor doc_id, its quality (rounded for a stable gated
    surface), and the group size n_dups.
    """
    from pyspark.sql import Window

    from hermod_spark.functions.text import fingerprint, quality_score

    w = Window.partitionBy("_fp").orderBy(
        F.col("_q").desc(), F.col(id_col).asc()
    )
    wc = Window.partitionBy("_fp")
    return (
        df.withColumn("_fp", fingerprint(text_col))
        .withColumn("_q", quality_score(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("n_dups", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.round("_q", 6).alias("quality"), "n_dups")
    )


def curation_funnel(
    corpus: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    *,
    n: int = 13,
) -> DataFrame:
    """End-to-end curation FUNNEL: per-source survivor counts through
    the three gates every pretraining-data run chains — quality
    classifier → exact n-gram benchmark decontamination → exact dedup —
    as ONE composed lazy plan. This is the report a curation run is
    judged by ("how much did each stage cost this source?"), and the
    executable proof that the stage operators compose: each stage is
    the library operator, not a re-implementation.

    Returns (source, n_raw, n_quality, n_decontaminated, n_unique),
    each count ≤ the previous — all BIGINT, hash-stable.

    Scale shape: quality is a scan-side projection; contamination ids
    come from the broadcast probe-hash semi-join (doc ids only, no run
    merge needed for a drop decision); dedup is one md5-key window.
    The four per-source aggregates reuse the same filtered lineage —
    Spark evaluates them as one job tree with no collects."""
    from pyspark.sql import Window

    from hermod_spark.operators.dedup import _ngram_positions

    q = quality_logistic(
        corpus, text_col, id_col, passthrough=(source_col, text_col)
    )
    probe_hashes = (
        _ngram_positions(probes, text_col, id_col, n).select("h").distinct()
    )
    contaminated = (
        _ngram_positions(corpus, text_col, id_col, n)
        .join(F.broadcast(probe_hashes), "h", "leftsemi")
        .select(id_col)
        .distinct()
    )
    kept_q = q.filter(F.col("keep"))
    kept_d = kept_q.join(contaminated, id_col, "left_anti")
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    unique = (
        kept_d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )

    def _cnt(frame: DataFrame, name: str) -> DataFrame:
        return frame.groupBy(F.col(source_col)).agg(
            F.count(F.lit(1)).cast("long").alias(name)
        )

    out = (
        _cnt(corpus, "n_raw")
        .join(_cnt(kept_q, "n_quality"), source_col, "left")
        .join(_cnt(kept_d, "n_decontaminated"), source_col, "left")
        .join(_cnt(unique, "n_unique"), source_col, "left")
    )
    zero = F.lit(0).cast("long")
    return out.select(
        source_col,
        "n_raw",
        F.coalesce("n_quality", zero).alias("n_quality"),
        F.coalesce("n_decontaminated", zero).alias("n_decontaminated"),
        F.coalesce("n_unique", zero).alias("n_unique"),
    )


def nb_distill(
    df: DataFrame,
    vocab_size: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
    return_model: bool = False,
) -> DataFrame:
    """Distill the Gopher rule battery into a token-level Naive Bayes
    quality classifier, trained IN-ENGINE — the bootstrap every cheap
    pretraining-quality filter starts from (label with rules, train a
    text model that generalizes past them; the fastText-classifier
    recipe of CCNet/LLaMA, with NB standing in because its training IS
    a grouped aggregation, so the whole train+score round trip stays
    declarative and oracle-checkable — no gradient loop).

    Train: weak label y = :func:`gopher_flags` ``keep``; per-token
    class counts (c1, c0) over the full token stream; vocabulary =
    top-``vocab_size`` tokens by total count (ties → token asc, the
    `oov_rate` convention); per-token weight is the Laplace-smoothed
    log-likelihood ratio ln((c1+1)/(n1+V)) − ln((c0+1)/(n0+V)), with
    n1/n0 the whole-stream class token totals and V the vocab size.
    Score: per-doc sum of in-vocab token weights (OOV contributes 0)
    plus the doc-count prior ln((d1+1)/(d0+1)); prediction is the
    score sign, reported next to the teacher label as the AGREEMENT
    audit (how faithfully the distilled model reproduces its teacher
    — the number you check before replacing the rules).

    Float determinism: every log term is cast DECIMAL(18,9) before
    the per-doc sum (the `unigram_surprisal` pattern), so the score
    is exact and partitioning-independent.

    Scale shape: labels join back on ``id_col`` (both sides co-
    partition on the same key; the text scan runs twice — disclosed);
    token-class counts are one map-side-combinable shuffle; vocab is
    TakeOrderedAndProject → broadcast; totals and prior are lazy
    1-row aggs cross-joined in; scoring is a broadcast join + one
    groupBy(doc). The corpus never shuffles for the model."""
    from hermod_spark.functions.text import tokens

    labels = gopher_flags(df, text_col=text_col, id_col=id_col).select(
        id_col, F.when(F.col("keep"), 1).otherwise(0).alias("_y")
    )
    toks = (
        df.select(
            F.col(id_col), tokens(F.lower(F.col(text_col))).alias("_t")
        )
        .join(labels, id_col)
        .select(
            id_col, "_y", F.explode_outer(F.col("_t")).alias("tok")
        )
    )
    tokc = (
        toks.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(
            F.sum("_y").alias("c1"),
            F.sum(F.lit(1) - F.col("_y")).alias("c0"),
        )
    )
    tot = tokc.agg(F.sum("c1").alias("_n1"), F.sum("c0").alias("_n0"))
    voc = tokc.orderBy(
        (F.col("c1") + F.col("c0")).desc(), F.col("tok").asc()
    ).limit(vocab_size)
    v = float(vocab_size)
    # each log term is ROUNDED to 6dp before the decimal cast (the
    # quality_logistic feature discipline): a last-ulp ln() difference
    # between engines can flip the 9th decimal of a raw cast, and one
    # flipped term puts the summed score on a 6dp rounding boundary —
    # observed once at sf0.1 (round 7). 6dp quantization keeps the
    # whole train+score path bit-stable at any scale.
    llr = F.round(
        F.log((F.col("c1") + 1.0) / (F.col("_n1") + v))
        - F.log((F.col("c0") + 1.0) / (F.col("_n0") + v)),
        6,
    ).cast("decimal(18,9)")
    model = voc.crossJoin(F.broadcast(tot)).select(
        "tok", "c1", "c0", llr.alias("_w")
    )
    if return_model:
        return model.select(
            "tok", "c1", "c0", F.round(F.col("_w").cast("double"), 6).alias("llr")
        )
    prior = labels.agg(
        F.round(
            F.log(
                (F.sum("_y") + F.lit(1.0))
                / (F.sum(F.lit(1) - F.col("_y")) + F.lit(1.0))
            ),
            6,
        )
        .cast("decimal(18,9)")
        .alias("_pri")
    )
    agg = (
        toks.join(F.broadcast(model.select("tok", "_w")), "tok", "left")
        .groupBy(id_col, "_y")
        .agg(
            F.count("tok").alias("n_tokens"),
            F.sum("_w").alias("_s"),
        )
    )
    zero = F.lit(0).cast("decimal(18,9)")
    score = F.coalesce(F.col("_s"), zero) + F.col("_pri")
    return (
        agg.crossJoin(F.broadcast(prior))
        .select(
            id_col,
            "n_tokens",
            F.round(score.cast("double"), 6).alias("score"),
            (score > 0).alias("predicted_keep"),
            (F.col("_y") == 1).alias("teacher_keep"),
            ((score > 0) == (F.col("_y") == 1)).alias("agree"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int = 100,
    weight: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement at corpus
    scale — Efraimidis–Spirakis A-Res reduced to one top-k: each doc
    gets the key ln(u)/w (u = its deterministic md5 uniform, w > 0 its
    weight; the log form of u^(1/w), same argmax order, no pow()
    cross-engine risk), and the sample is the k largest keys. This is
    how a quality-weighted training subset is drawn from 100 TB: no
    global shuffle, no state — Catalyst compiles orderBy+limit to
    TakeOrderedAndProject, so only k rows leave each partition.

    Default weight = token count (longer docs proportionally more
    likely — the tokens-budget-aware draw); pass any positive Column
    (e.g. a quality score) to reweight. Determinism: u derives from
    ``id_col`` via md5, so the sample is a pure function of the data —
    re-running selects the same docs, and the DuckDB oracle replays it
    exactly. u ∈ (0,1] (never 0: offset by 1 before the divide), so
    ln(u) is finite; ties break by id.

    Cites reference scope: the reference has no sampling operator at
    all (SURVEY §2.6); this extends the curation family
    (`cur_sample_stratified` draws exact per-stratum counts; this
    draws one corpus-wide weighted sample)."""
    from hermod_spark.functions.text import token_count
    from hermod_spark.operators.sketches import TWO_32

    w = (
        F.greatest(token_count(F.col(text_col)), F.lit(1)).cast("double")
        if weight is None
        else weight.cast("double")
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(TWO_32)
    keyed = df.select(
        F.col(id_col),
        w.alias("w"),
        F.round(F.log(u) / w, 9).alias("key"),
    )
    return (
        keyed.orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            F.col("w").cast("double").alias("weight"),
            F.col("key"),
        )
    )


def dsir_weights(
    source: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 1024,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every source
    document by how target-like its HASHED unigram distribution is —
    the log importance ratio Σ_tokens [ln p_tgt(bucket) − ln
    p_src(bucket)] over ``n_buckets`` hashed feature buckets with
    add-``alpha`` smoothing. Sampling ∝ exp(weight) biases a mixture
    toward the target domain without training a model — the cheap
    domain-matching selector between rule filters (gopher_flags) and a
    learned classifier (nb_distill).

    Output: (doc_id, n_tokens, dsir_logweight) for every source doc.

    Float determinism: each bucket's log-ratio is rounded to 6dp and
    cast DECIMAL(18,9) before the per-doc sum (the `nb_distill`
    discipline), so the score is exact under any partitioning and
    bit-equal across engines.

    Scale shape: hashing is scan-side (md5-prefix, the dedup base
    hash, mod buckets); the bucket histograms are two map-side-
    combinable aggs of ≤``n_buckets`` rows each; the weight table
    (full-outer of the two histograms + 1-row totals) is ≤n_buckets
    rows → broadcast back onto the token stream; one groupBy(doc)
    sums. The corpus never shuffles for the model — train-small/
    serve-as-broadcast, same as every model-shaped operator here."""
    from hermod_spark.data import ensure_min_partitions
    from hermod_spark.operators.dedup import _base_hash

    def bucketed(df: DataFrame) -> DataFrame:
        # explode_outer + null-bucket passthrough: a zero-token doc
        # keeps ONE null-_b row so it still gets an output row
        # (n_tokens=0, weight 0.0 — ADVICE r8; the unigram_surprisal
        # discipline), with no join-back shuffle
        return (
            ensure_min_partitions(df)
            .select(
                F.col(id_col).alias("_id"),
                F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("_t"),
            )
            .select(
                "_id",
                F.when(
                    F.col("_t").isNotNull(),
                    F.pmod(_base_hash(F.col("_t")), F.lit(n_buckets)),
                ).alias("_b"),
            )
        )

    src_toks = bucketed(source)
    src_hist = (
        src_toks.filter(F.col("_b").isNotNull())
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_sc"))
    )
    tgt_hist = (
        bucketed(target)
        .filter(F.col("_b").isNotNull())
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_tc"))
    )
    hist = (
        src_hist.join(tgt_hist, "_b", "full")
        .select(
            "_b",
            F.coalesce("_sc", F.lit(0)).alias("_sc"),
            F.coalesce("_tc", F.lit(0)).alias("_tc"),
        )
    )
    totals = hist.agg(
        F.sum("_sc").alias("_S"), F.sum("_tc").alias("_T")
    )
    a, ab = float(alpha), float(alpha) * n_buckets
    w = hist.crossJoin(F.broadcast(totals)).select(
        "_b",
        F.round(
            F.log((F.col("_tc") + a) / (F.col("_T") + ab))
            - F.log((F.col("_sc") + a) / (F.col("_S") + ab)),
            6,
        )
        .cast("decimal(18,9)")
        .alias("_w"),
    )
    return (
        src_toks.join(F.broadcast(w), "_b", "left")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count("_b").alias("n_tokens"),
            F.round(
                F.coalesce(F.sum("_w").cast("double"), F.lit(0.0)), 6
            ).alias("dsir_logweight"),
        )
    )
