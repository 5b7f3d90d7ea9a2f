"""Query-shaped text-analysis operators over ``documents``.

Thin wrappers turning the column builders in
hermod_spark.functions.text into engine queries — per-document metric
projections and per-group aggregate rollups. Everything stays native
Column exprs (whole-stage codegen; zero Python per row)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hermod_spark.functions import text as X


def doc_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document metric projection: token counts, BPE-ish subword
    count, punctuation density, language ID, quality, fingerprint."""
    return df.select(
        F.col(id_col),
        X.token_count(text_col).alias("n_tokens"),
        X.distinct_token_count(text_col).alias("n_distinct_tokens"),
        X.bpe_token_count(text_col).alias("n_bpe_tokens"),
        F.round(X.punct_ratio(text_col), 6).alias("punct_ratio"),
        X.lang_id(text_col).alias("lang_pred"),
        F.round(X.quality_score(text_col), 6).alias("quality"),
        X.fingerprint(text_col).alias("fingerprint"),
    )
    # no orderBy: a global sort of a per-document projection is a full
    # range shuffle that buys nothing — at 100 TB it would dominate


def corpus_stats(df: DataFrame, text_col: str = "text", by: str = "source") -> DataFrame:
    """Per-group corpus rollup: doc counts, token totals, mean quality.
    groupBy → partial aggregation; sums are longs (exact)."""
    n_tok = X.token_count(text_col)
    # quality sums ride an exact decimal, not a raw double: double
    # summation is partition-order-dependent and can flip the 6dp
    # rounding on a boundary between runs/engines (the determinism
    # discipline class_stats and unigram_surprisal already follow)
    return (
        df.select(
            F.col(by),
            n_tok.alias("_nt"),
            X.quality_score(text_col).cast("decimal(18,9)").alias("_q"),
        )
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("total_tokens"),
            F.round(F.avg("_nt"), 6).alias("avg_tokens"),
            F.round(
                F.sum("_q").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_quality"),
        )
        .orderBy(by)
    )


def lang_confusion(df: DataFrame, text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """Declared language vs heuristic language-ID — the operator a
    filtering pipeline runs to find mislabeled documents."""
    return (
        df.select(F.col(lang_col).alias("lang_declared"), X.lang_id(text_col).alias("lang_pred"))
        .groupBy("lang_declared", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_declared", "lang_pred")
    )


def top_ngrams(
    df: DataFrame, n: int = 2, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide top-k word n-grams: explode → count → top-k.

    The shuffle is the count groupBy (map-side combined); n-gram keys
    are long-tailed, and AQE coalesces the mostly-tiny post-agg
    partitions. The rank step is `orderBy(...).limit(k)` which Spark
    compiles to TakeOrderedAndProject — each task keeps its local
    top-k and the driver merges k·n_tasks rows — NOT a global window,
    which would funnel the entire (billions-row at 100 TB) n-gram
    vocabulary through one partition. `rank` is derived afterwards
    over the k-row result (a window over k rows, not the corpus).
    Ties rank lexicographically so the result set is deterministic at
    any parallelism."""
    from pyspark.sql import Window

    counts = (
        df.select(F.explode_outer(X.ngrams(text_col, n)).alias("ngram"))
        .filter(F.col("ngram").isNotNull())
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("ngram")).limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("ngram"))
    return top.withColumn("rank", F.row_number().over(w)).orderBy("rank")


def vocab_stats(df: DataFrame, text_col: str = "text", by: str = "source") -> DataFrame:
    """Per-group vocabulary rollup: token totals, distinct-token
    (vocabulary) size, type-token ratio. `count_distinct` expands to
    Spark's two-phase distinct aggregate — partial de-dup on
    (group, token) map-side, so the shuffle carries the vocabulary,
    not the corpus."""
    toks = df.select(
        F.col(by),
        F.explode_outer(X.tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).filter(F.col("tok").isNotNull())
    return (
        toks.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_distinct("tok").alias("n_vocab"),
            F.round(F.count_distinct("tok") / F.count(F.lit(1)), 6).alias(
                "type_token_ratio"
            ),
        )
    )


def dup_rate_by_group(
    df: DataFrame, text_col: str = "text", by: str = "source"
) -> DataFrame:
    """Corpus-health rollup: per group, document count, distinct
    canonical fingerprints, and the duplicate rate 1 − distinct/total.
    Two-phase distinct aggregate — the shuffle carries (group,
    fingerprint), map-side de-duplicated."""
    from hermod_spark.functions.text import fingerprint

    fp = fingerprint(text_col)
    return (
        df.select(F.col(by), fp.alias("_fp"))
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("_fp").alias("n_unique"),
            F.round(
                1.0 - F.count_distinct("_fp") / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 10,
    min_tf: int = 5,
    text_col: str = "text",
    by: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group top-k TF-IDF terms: tf per (group, token), document
    frequency across the corpus, score = tf·ln(N/df), ranked within
    group.

    Scale shape: both heavy aggregations shuffle on high-cardinality
    keys ((group, token) and token); N is a 1-row broadcast, never a
    driver action. The per-group rank window runs AFTER the
    ``tf >= min_tf`` gate — the long Zipf tail (hapax legomena, the
    overwhelming bulk of any corpus vocabulary) never reaches it.
    Scores are rounded to 6 BEFORE ranking so rank order can't flap on
    a final-ulp ln() difference; exact score ties break on the token."""
    from pyspark.sql import Window

    tok = df.select(
        F.col(by), F.col(id_col),
        F.explode_outer(X.tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).filter(F.col("tok").isNotNull())
    tf = tok.groupBy(by, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("tok").agg(F.count_distinct(id_col).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.filter(F.col("tf") >= min_tf)
        .join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy(by).orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(by, "tok", "tf", "tfidf", "rank")
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style per-document repetition metrics — the signals a
    training-data filter uses to drop boilerplate and degenerate
    repeated text (cf. Rae et al. 2021 §A1.1):

    - ``dup_token_frac``: 1 − distinct/total tokens,
    - ``top_token_frac``: occurrences of the most frequent token / total,
    - ``top_bigram_frac``: occurrences of the most frequent bigram / total.

    All native exprs; the per-doc mode is a sort + run-length fold
    (`max_run_length`), never a per-doc groupBy — one scan, no shuffle,
    no Python. Empty documents score 0 on every fraction."""
    toks = F.array_sort(X.tokens(F.lower(F.col(text_col))))
    grams = F.array_sort(X.ngrams(text_col, 2))

    def _signals(t: Column, g: Column) -> Column:
        n_tok = F.size(t)
        n_gram = F.size(g)
        zero = F.lit(0.0)
        return F.struct(
            n_tok.alias("n_tokens"),
            F.round(
                F.when(n_tok > 0, 1.0 - F.size(F.array_distinct(t)) / n_tok).otherwise(zero), 6
            ).alias("dup_token_frac"),
            F.round(
                F.when(n_tok > 0, X.max_run_length(t) / n_tok).otherwise(zero), 6
            ).alias("top_token_frac"),
            F.round(
                F.when(n_gram > 0, X.max_run_length(g) / n_gram).otherwise(zero), 6
            ).alias("top_bigram_frac"),
        )

    # bind both arrays once (single-element-array lambda trick) so the
    # sort and fold don't re-evaluate the split per metric
    s = F.flatten(F.transform(F.array(toks), lambda t: F.array(
        F.transform(F.array(grams), lambda g: _signals(t, g))[0]
    )))[0]
    return df.select(
        F.col(id_col),
        s.getField("n_tokens").alias("n_tokens"),
        s.getField("dup_token_frac").alias("dup_token_frac"),
        s.getField("top_token_frac").alias("top_token_frac"),
        s.getField("top_bigram_frac").alias("top_bigram_frac"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.5,
    min_tokens: int = 5,
) -> DataFrame:
    """The training-data gate: drop short/low-quality docs. Pure filter
    → pushes to the scan."""
    return df.filter(
        (X.quality_score(text_col) >= min_quality) & (X.token_count(text_col) >= min_tokens)
    )


def kgram_hashes(s: Column, k: int) -> Column:
    """Hash of every character k-gram of ``s`` (first 8 md5 hex digits
    as a long — identical in any engine), as an array.

    ``s`` must be a lambda-bound variable (or a cheap column ref): a
    free expensive expression here would be re-inlined per gram by
    Catalyst (see winnow_fingerprints). sequence(1, 0) is DESCENDING
    [1, 0] in Spark (step defaults to -1), not empty like DuckDB
    range — strings shorter than k need the explicit empty branch."""
    grams = F.when(
        F.length(s) < F.lit(k), F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(s) - F.lit(k - 1)),
            lambda i: F.substring(s, i, k),
        )
    )
    return F.transform(
        grams,
        lambda g: F.conv(
            F.substring(F.md5(F.encode(g, "utf-8")), 1, 8), 16, 10
        ).cast("long"),
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    emit_sets: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the rolling-hash fingerprint family; guarantees any
    shared substring of length ≥ k+window-1 yields a shared
    fingerprint): normalize to an alphanumeric character stream, hash
    every k-gram, take the minimum hash of each ``window`` consecutive
    hashes, and keep the distinct selected hashes as the document's
    fingerprint set.

    Emits the per-document fingerprint-set summary — count, min, max,
    sum — a stable O(1)-per-doc surface; with ``emit_sets=True`` the
    raw distinct-fingerprint array instead (feeds near-dup candidate
    joins; the LSH path in operators/dedup.py is the scale tool for
    that, this is the substring-robust complement). Docs shorter than
    ``k + window - 1`` normalized chars get an empty fingerprint set
    (count 0, null min/max, sum 0), matching the DuckDB oracle.

    Scale shape: pure scan-side array expressions, ZERO shuffles and
    zero Python — per-doc cost O(len·window) inside whole-stage
    codegen. The k-gram hash is the first 8 md5 hex digits as a
    bigint, identical in any engine (rolling-hash evaluation is a
    constant-factor trick, not a semantic one).

    Every intermediate (``s``, ``hashes``, ``fps``) is let-bound
    exactly once via the single-element-array lambda trick from
    shingles() (operators/dedup.py): a free (non-lambda) variable
    referenced inside ``transform`` is re-inlined by Catalyst per
    element, which made the first version O(len²·window)×4 md5 chains
    per document (~50 min for 500 sf0.001 docs). Lambda variables are
    leaves — evaluated once per binding, never re-inlined."""

    def _hashes_of(s: Column) -> Column:
        return kgram_hashes(s, k)

    def _fps_of(hashes: Column) -> Column:
        mins = F.when(
            F.size(hashes) < F.lit(window), F.array().cast("array<long>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(hashes) - F.lit(window - 1)),
                lambda j: F.array_min(F.slice(hashes, j, window)),
            )
        )
        return F.array_distinct(mins)

    def _summary_of(fps: Column) -> Column:
        return F.struct(
            F.size(fps).alias("n_fingerprints"),
            F.array_min(fps).alias("fp_min"),
            F.array_max(fps).alias("fp_max"),
            F.aggregate(fps, F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
                "fp_sum"
            ),
        )

    s0 = F.lower(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", ""))
    fps_col = F.transform(
        F.array(s0), lambda s: F.transform(F.array(_hashes_of(s)), _fps_of)[0]
    )[0]
    if emit_sets:
        return df.select(F.col(id_col), fps_col.alias("fingerprints"))
    summary = F.transform(F.array(fps_col), _summary_of)[0]
    # Two selects on purpose: the struct is expensive and read four
    # times; CollapseProject leaves multi-referenced non-cheap aliases
    # alone, so the chain evaluates once per row.
    bound = df.select(F.col(id_col), summary.alias("_w"))
    return bound.select(
        F.col(id_col),
        F.col("_w.n_fingerprints").alias("n_fingerprints"),
        F.col("_w.fp_min").alias("fp_min"),
        F.col("_w.fp_max").alias("fp_max"),
        F.col("_w.fp_sum").alias("fp_sum"),
    )


def oov_rate(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` token vocabulary — the tokenizer-coverage
    question asked before committing a corpus to a fixed vocab.

    Vocabulary = tokens ranked by corpus frequency, ties broken by
    token ascending (deterministic across engines and partitionings).

    Scale shape: the vocab subplan is explode → count agg (map-side
    combined, one shuffle) → global top-V, which Catalyst compiles to
    TakeOrderedAndProject — only V rows ever reach the driver side of
    the plan, and the vocab is broadcast back (V is a model-sized
    constant; 1000 tokens ≈ KBs). The per-document pass is then a
    broadcast-hash join, shuffle-free on the corpus side, plus one
    groupBy(doc) count agg."""
    from hermod_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    vocab = (
        toks.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("_in"))
    )
    agg = toks.join(F.broadcast(vocab), "tok", "left").groupBy(id_col).agg(
        F.count("tok").alias("n_tokens"),
        F.sum(
            F.when(F.col("tok").isNotNull() & F.col("_in").isNull(), 1).otherwise(0)
        ).alias("n_oov"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_oov",
        F.round(
            F.col("n_oov") / F.greatest(F.col("n_tokens"), F.lit(1)), 6
        ).alias("oov_rate"),
    )


# PII rules applied in order; counts are per-rule over the ORIGINAL
# text (replacement is sequential, so a span consumed by an earlier
# rule can't be re-redacted, but it IS still counted by later rules if
# both match the original — documented, deterministic semantics).
# Patterns stick to the regex subset with identical meaning in Java
# regex (Spark) and RE2 (DuckDB): literal classes, \d, \b, {m,n}.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("number", r"\b\d{7,}\b", "<NUMBER>"),
]


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Regex PII scrub for training corpora: emails, SSNs, IPv4s, and
    long digit runs replaced by typed tags, with per-rule match counts
    (the audit surface — redaction rates per source feed curation
    dashboards). Pure scan-side `regexp_replace`/`regexp_count`
    chain: zero shuffles, zero Python, whole-stage codegen.

    Each rule's count is measured on the ORIGINAL text; replacements
    apply sequentially in ``PII_RULES`` order. The chain references
    each intermediate exactly once, so the expression tree stays
    linear (no Catalyst re-inlining blowup)."""
    red = F.col(text_col)
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]
    for _, pat, tag in PII_RULES:
        red = F.regexp_replace(red, pat, tag)
    return df.select(F.col(id_col), red.alias("redacted"), *counts)


def cdc_chunks(
    df: DataFrame,
    k: int = 8,
    modulus: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (the Rabin/FastCDC family): cut each
    document at positions where the rolling k-gram hash ≡ 0 (mod
    ``modulus``) — boundaries anchor to CONTENT, so an insertion early
    in a document shifts only the chunk it lands in, and every later
    chunk keeps its identity. Chunk hashes are the shift-robust dedup
    unit (winnowing fingerprints are the containment complement;
    MinHash LSH the whole-doc one). Expected chunk length ≈ modulus
    characters.

    Emits one row per chunk: (doc_id, chunk_id, chunk_len,
    chunk_hash). Docs shorter than k chars are one whole-doc chunk.

    Scale shape: zero shuffles, zero Python — the boundary scan, the
    cut-pair zip, and the per-chunk md5 all run as let-bound array
    expressions inside whole-stage codegen (every intermediate is
    lambda-bound once; see winnow_fingerprints for the re-inlining
    trap), then one posexplode emits the chunk rows map-side."""

    def _chunks_of(s: Column) -> Column:
        def _from_hashes(hashes: Column) -> Column:
            cuts = F.filter(
                F.when(
                    F.size(hashes) < 1, F.array().cast("array<int>")
                ).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.size(hashes)),
                        lambda j: j.cast("int"),
                    )
                ),
                lambda j: F.element_at(hashes, j) % modulus == 0,
            )
            starts = F.concat(F.array(F.lit(0)), cuts)
            ends = F.concat(cuts, F.array(F.length(s).cast("int")))
            return F.zip_with(
                starts,
                ends,
                lambda a, b: F.struct(
                    (b - a).alias("chunk_len"),
                    F.substring(
                        F.md5(F.encode(F.substring(s, a + 1, b - a), "utf-8")),
                        1,
                        16,
                    ).alias("chunk_hash"),
                ),
            )

        return F.transform(F.array(kgram_hashes(s, k)), _from_hashes)[0]

    from hermod_spark.data import ensure_min_partitions

    chunks = F.transform(F.array(F.col(text_col)), _chunks_of)[0]
    # per-row cost is len(text) md5s: a single-split small table would
    # serialize the whole corpus in one task (no-op on real multi-split
    # inputs)
    bound = ensure_min_partitions(df).select(F.col(id_col), chunks.alias("_chunks"))
    # posexplode_OUTER on purpose: plain posexplode adds an implicit
    # `size(_chunks) > 0` filter that predicate-pushdown moves below
    # the repartition exchange — re-evaluating the whole chunk
    # expression in the (possibly single-task) scan stage. The array
    # is never empty by construction (starts always holds [0]), so
    # outer is semantically identical and keeps the heavy projection
    # above the exchange.
    return bound.select(
        id_col, F.posexplode_outer("_chunks").alias("chunk_id", "_c")
    ).select(
        id_col,
        "chunk_id",
        F.col("_c.chunk_len").alias("chunk_len"),
        F.col("_c.chunk_hash").alias("chunk_hash"),
    )


def winnow_containment(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_posting: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Containment-candidate pairs from winnowing fingerprints — the
    use the SIGMOD'03 scheme exists for: documents sharing
    ``min_shared``-or-more selected fingerprints share substrings of
    length ≥ k+window-1 (plagiarism/quotation/containment detection,
    which whole-document MinHash misses when the overlap is a small
    fraction of either doc).

    Scale shape: the inverted fingerprint index (fp → doc posting
    list) is built by one explode + count; fingerprints whose posting
    list exceeds ``max_posting`` are DROPPED before the self-join —
    they are boilerplate substrings whose pair expansion is quadratic
    and whose evidence is weakest (the same hot-bucket cap as MinHash
    LSH's max_bucket). The pair join then shuffles on the fingerprint
    key and aggregates shared counts map-side."""
    posting = (
        winnow_fingerprints(
            df, k, window, text_col=text_col, id_col=id_col, emit_sets=True
        )
        .select(
            F.col(id_col).alias("_id"),
            F.explode_outer("fingerprints").alias("fp"),
        )
        .filter(F.col("fp").isNotNull())
    )
    fp_counts = posting.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
    cold = posting.join(
        fp_counts.filter(F.col("_n") <= max_posting).select("fp"), "fp"
    )
    a, b = cold.alias("a"), cold.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def ngram_novelty(
    df: DataFrame,
    reference: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram novelty against a reference corpus: the
    fraction of the doc's DISTINCT n-grams never seen in ``reference``
    — the freshness score a continual-pretraining pipeline uses to
    decide whether a new crawl adds anything (complement of the
    contamination direction: high novelty = keep, low = redundant).

    Scale shape: the reference collapses to its distinct n-gram set
    once (explode → distinct, one shuffle on gram — high-cardinality,
    hash-spread) and is broadcast back; the corpus side is scan-side
    gram build + one broadcast join + one per-doc count agg — the
    `text_oov` shape with a corpus-derived dictionary. For a reference
    too big to broadcast, prefilter with `bloom_decontaminate`'s bit
    set and exact-join only the survivors (same candidates-then-verify
    split as MinHash)."""
    from hermod_spark.functions.text import ngrams

    grams = lambda c: F.array_distinct(  # noqa: E731
        ngrams(F.lower(F.col(c)), n)
    )
    ref = (
        reference.select(F.explode(grams(text_col)).alias("g")).distinct()
    )
    per = (
        df.select(F.col(id_col), F.explode_outer(grams(text_col)).alias("g"))
        .join(F.broadcast(ref.withColumn("_seen", F.lit(1))), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("g")).alias("n_grams"),
            F.count(F.when(F.col("g").isNotNull() & F.col("_seen").isNull(), 1)).alias(
                "n_novel"
            ),
        )
    )
    return per.select(
        id_col,
        "n_grams",
        "n_novel",
        F.round(
            F.col("n_novel")
            / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
            6,
        ).alias("novelty"),
    )


def chunk_dedup_stats(
    df: DataFrame,
    k: int = 8,
    modulus: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document CDC dedup accounting: run content-defined
    chunking over the corpus, keep the FIRST occurrence of every chunk
    hash (ordered by (doc, chunk position) — deterministic), and report
    per-doc how many chunks / characters a content-addressed store
    would deduplicate away. This is the storage-dedup estimate behind
    CDC (the reason the chunker anchors to content): shifted or
    partially-edited near-copies share most chunk hashes.

    Scale shape: cdc_chunks is scan-side (0 shuffles); the first-copy
    rank is ONE shuffle on chunk_hash (≈uniform md5 keys), and the
    rollup is a per-doc agg. No pairwise comparison anywhere."""
    from pyspark.sql import Window

    chunks = cdc_chunks(df, k, modulus, text_col, id_col)
    w = Window.partitionBy("chunk_hash").orderBy(
        F.col(id_col).asc(), F.col("chunk_id").asc()
    )
    ranked = chunks.withColumn("_rn", F.row_number().over(w))
    per = ranked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("chunk_len").cast("bigint")).alias("total_chars"),
        F.count(F.when(F.col("_rn") > 1, 1)).alias("n_dup_chunks"),
        F.coalesce(
            F.sum(F.when(F.col("_rn") > 1, F.col("chunk_len").cast("bigint"))),
            F.lit(0),
        ).alias("dup_chars"),
    )
    return per.select(
        id_col,
        "n_chunks",
        "total_chars",
        "n_dup_chunks",
        "dup_chars",
        F.round(
            F.col("dup_chars")
            / F.greatest(F.col("total_chars"), F.lit(1)).cast("double"),
            6,
        ).alias("dup_frac"),
    )


def doc_char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document character-entropy quality signal (bits/char).

    Zero shuffles: the whole computation is one scan projection (see
    functions.text.char_entropy for the fold-determinism and
    let-binding notes) — at 100 TB this costs exactly one pass over
    the text bytes, no exchange, no Python.
    """
    return df.select(
        id_col, F.round(X.char_entropy(text_col), 6).alias("char_entropy")
    )


def unigram_surprisal(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model quality signal: per-document mean
    unigram SURPRISAL (nats/token) under the corpus's own MLE unigram
    model — the cheap stand-in for the KenLM-perplexity filter every
    large text-curation pipeline runs (low surprisal = formulaic/
    boilerplate, high = rare-token noise; the useful mass sits in the
    middle). Vocabulary = top-``vocab_size`` tokens (ties → token asc,
    the `oov_rate` convention); OOV tokens get the 1/total floor.

    Float determinism: each token's surprisal −ln(cnt/total) is cast
    to DECIMAL(18,9) BEFORE the per-doc sum (the `emb_class_stats`
    pattern), so the aggregate is exact and independent of row order /
    partitioning; only then divided and rounded.

    Scale shape: count agg (map-side combined, one shuffle on tokens)
    → top-V as TakeOrderedAndProject → broadcast back; the total is a
    lazy 1-row agg cross-joined in. The per-doc pass is broadcast-join
    + one groupBy(doc) — the corpus never shuffles for the model."""
    from hermod_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    counts = (
        toks.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("_total"))
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(vocab_size)
    )
    # -ln(p) is ROUNDED to 6dp before the decimal cast: ln() is not
    # correctly-rounded-identical across engines, and a last-ulp flip
    # in one term can land the per-doc sum on a 6dp rounding boundary
    # (the cur_distill_nb class, caught by the r7 sf0.1 sweep)
    surp = F.round(
        -F.log(
            F.coalesce(F.col("cnt"), F.lit(1)).cast("double")
            / F.col("_total").cast("double")
        ),
        6,
    ).cast("decimal(18,9)")
    agg = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("tok").alias("n_tokens"),
            F.sum(F.when(F.col("tok").isNotNull(), surp)).alias("_s"),
        )
    )
    return agg.select(
        id_col,
        "n_tokens",
        F.round(
            F.coalesce(
                F.col("_s").cast("double") / F.col("n_tokens"), F.lit(0.0)
            ),
            6,
        ).alias("mean_surprisal"),
    )


def _ccnet_select(s: DataFrame, bucket: Column, id_col: str) -> DataFrame:
    return s.select(
        id_col,
        "n_tokens",
        "mean_surprisal",
        bucket.alias("bucket"),
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), bucket
        ).alias("label"),
    )


def ccnet_buckets_exact(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-rank CCNet tertiles via ONE global window — the oracle
    cross-check form. Bucket = ceil(3·rank/n) over (mean_surprisal,
    doc_id) order; pure integer-exact math both engines reproduce
    bit-identically. NOT the serving form: the unpartitioned
    `row_number` window funnels the whole O(docs) summary frame into
    a single partition. Use :func:`ccnet_buckets` (two-pass boundary
    selection, scan-side compare) everywhere except test-scale
    cross-checks."""
    s = unigram_surprisal(
        df, vocab_size=vocab_size, text_col=text_col, id_col=id_col
    )
    w = Window.orderBy(F.col("mean_surprisal").asc(), F.col(id_col).asc())
    ranked = s.select(
        id_col,
        "n_tokens",
        "mean_surprisal",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("_n"),
    )
    bucket = F.ceil(F.lit(3) * F.col("_rn") / F.col("_n")).cast("int")
    return _ccnet_select(ranked, bucket, id_col)


def ccnet_buckets(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_buckets: int = 32768,
) -> DataFrame:
    """CCNet's head/middle/tail partition (Wenzek et al. 2020): rank
    documents by LM quality (here `unigram_surprisal`, the in-engine
    stand-in for KenLM perplexity) and split into exact tertiles —
    head = lowest surprisal (most fluent), tail = highest. The bucket
    is THE curation knob CCNet-style pipelines mix on (train on
    head+middle, sample tail).

    Serving form (r9): two-pass boundary selection — the
    `value_quantiles_twopass` discipline — instead of a global
    `row_number()` window (which sorts the whole O(docs) summary
    frame in ONE partition; fine at sf0.1, the textbook funnel at
    10^10 docs):

    1. histogram (eager): count docs per ``floor(asinh(surprisal)·K)``
       bucket — map-side-combinable agg, ≤ ``max_buckets`` rows
       collected by construction (asinh bounds the index range for
       any finite double).
    2. refine (eager, tiny): the tertile ranks floor(n/3) and
       floor(2n/3) each land in exactly one bucket; ONE job re-scans
       only those ≤2 buckets with the window PARTITIONED by bucket
       (each sort partition is one bucket, never the table) and
       recovers the exact (mean_surprisal, doc_id) tuple at each
       boundary rank.
    3. serve (the returned plan): bucket = scan-side tuple compare
       against the two boundary LITERALS — no window, no shuffle, no
       broadcast frame that grows with scale.

    asinh-bucketing is monotonic and doc_id breaks ties totally, so
    in-bucket order + bucket order is the global order: the result is
    bit-identical to the one-window exact form (same DuckDB oracle,
    hash-green; `ccnet_buckets_exact` is the in-repo cross-check).
    The O(docs) summary frame is persisted (MEMORY_AND_DISK) and
    SERVED from — the surprisal pipeline runs exactly once for the
    two eager boundary passes and the returned plan alike. The cache
    is released by Spark's ContextCleaner when the returned frame is
    garbage-collected (the lineage is retained, so the plan stays
    valid regardless); at 10^10 docs the summary is ~3 small columns
    × docs — the standard cacheable size for a serving layer."""
    s = unigram_surprisal(
        df, vocab_size=vocab_size, text_col=text_col, id_col=id_col
    )
    k_scale = float(max_buckets) / 1421.0
    bexpr = F.floor(F.asinh(F.col("mean_surprisal")) * F.lit(k_scale)).cast(
        "long"
    )
    cached = s.persist()
    hist = sorted(
        cached.groupBy(bexpr.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect(),
        key=lambda r: r["_b"],
    )
    n = sum(r["_c"] for r in hist)
    # boundary rank k: the LAST rank in bucket k is floor(k·n/3)
    # (ceil(3r/n) ≤ k  ⇔  r ≤ floor(k·n/3))
    targets = []  # (boundary_idx, target_hist_bucket, in_bucket_rank)
    for k in (1, 2):
        r_k = (k * n) // 3
        if r_k <= 0:
            targets.append(None)
            continue
        cum = 0
        for row in hist:
            if cum + row["_c"] >= r_k:
                targets.append((row["_b"], r_k - cum))
                break
            cum += row["_c"]
    bounds: list = [None, None]
    live = [(i, t) for i, t in enumerate(targets) if t is not None]
    if live:
        w = Window.partitionBy("_b").orderBy(
            F.col("mean_surprisal").asc(), F.col(id_col).asc()
        )
        cond = None
        for _, (tb, ib) in live:
            c = (F.col("_b") == F.lit(tb)) & (F.col("_rn") == F.lit(ib))
            cond = c if cond is None else (cond | c)
        hits = (
            cached.select(id_col, "mean_surprisal", bexpr.alias("_b"))
            .filter(
                F.col("_b").isin([tb for _, (tb, _) in live])
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(cond)
            .collect()
        )
        by_key = {(r["_b"], r["_rn"]): r for r in hits}
        for i, (tb, ib) in live:
            r = by_key[(tb, ib)]
            bounds[i] = (r["mean_surprisal"], r[id_col])


    def le_bound(bnd) -> Column:
        if bnd is None:
            return F.lit(False)
        bv, bid = bnd
        return (F.col("mean_surprisal") < F.lit(bv)) | (
            (F.col("mean_surprisal") == F.lit(bv))
            & (F.col(id_col) <= F.lit(bid))
        )

    bucket = (
        F.when(le_bound(bounds[0]), F.lit(1))
        .when(le_bound(bounds[1]), F.lit(2))
        .otherwise(F.lit(3))
        .cast("int")
    )
    return _ccnet_select(cached, bucket, id_col)


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k retrieval: for each (query_id, query_text) pair,
    score every document containing at least one query term with
    Lucene-shape BM25 (idf = ln(1 + (N − df + ½)/(df + ½)); tf
    saturation k1, length normalization b) and keep the k best. The
    retrieval primitive a curation pipeline uses for
    decontamination-by-retrieval and targeted quality audits.

    Scale shape (100 TB corpus, handful of queries): the query-term
    set is a literal broadcast, so the corpus-side explode is
    TERM-FILTERED BEFORE any shuffle — only postings for query terms
    ever leave the scan (a thousandth of the token stream for real
    vocabularies). Document length rides along in the same scan
    (max aggregate), so there is no separate doc-length join. Corpus
    N and avgdl are a 1-row broadcast. Shuffles: (doc,term) tf,
    term df (|query terms| rows), and the per-(query,doc) score sum —
    all bounded by the matched-candidate set, never the corpus.
    Scores round to 6dp before ranking (rank can't flap on a final
    ulp); ties break on ascending doc id.
    """
    if not queries:
        raise ValueError("bm25_topk: queries must be non-empty")
    qterms, _ = bm25_query_terms(df.sparkSession, queries)
    terms = qterms.select(F.col("term").alias("tok")).distinct()

    # Tokenize ONCE per row (the split is the scan's CPU cost; naming
    # the array first keeps Catalyst from inlining it into both the
    # length and the explode), then explode.
    base = df.select(
        F.col(id_col), X.tokens(F.lower(F.col(text_col))).alias("_tk")
    )
    toks = base.select(
        F.col(id_col),
        F.size("_tk").alias("dl"),
        F.explode_outer("_tk").alias("tok"),
    ).filter(F.col("tok").isNotNull())
    hits = toks.join(F.broadcast(terms), "tok")

    tf = hits.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    # df per term as a window over tf (tf rows are distinct (doc,term)):
    # reuses the candidate set already in flight instead of a second
    # corpus scan a broadcast-subquery branch would force.
    tf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("tok"))
    )
    stats = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(X.token_count(F.lower(F.col(text_col)))).alias("avgdl"),
    )
    return bm25_score_rank(tf, qterms, stats, k=k, k1=k1, b=b, id_col=id_col)


def bm25_query_terms(spark, queries: list[tuple[int, str]]):
    """(qterms frame, sorted distinct term list) from a query panel —
    whitespace-split, lowered, per-query deduped; shared by the
    direct :func:`bm25_topk` and the persisted-index serve
    (``textindex.bm25_topk_indexed``) so both retrievals tokenize
    queries identically."""
    qterm_rows = []
    for qid, qtext in queries:
        seen = set()
        for t in qtext.strip().lower().split():
            if t and t not in seen:
                seen.add(t)
                qterm_rows.append((int(qid), t))
    qterms = spark.createDataFrame(qterm_rows, "query_id INT, term STRING")
    return qterms, sorted({t for _, t in qterm_rows})


def bm25_score_rank(
    tf: DataFrame,
    qterms: DataFrame,
    stats: DataFrame,
    *,
    k: int,
    k1: float,
    b: float,
    id_col: str,
) -> DataFrame:
    """The BM25 scoring + top-k tail over a candidate-postings frame
    ``tf`` = (id_col, tok, tf, dl, df) with corpus ``stats`` =
    1×(n_docs, avgdl). ONE expression shared by the direct and
    index-served paths, so their scores are definitionally identical
    (the bit-for-bit equality `text_bm25_indexed` is gated on)."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (F.lit(k1) + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), tf["tok"] == qterms["term"])
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )
