"""Text-analysis column builders for the LLM-data-pipeline operators.

All pure native Column expressions (no Python in the hot path) so they
whole-stage-codegen and scale linearly with input splits — the design
constraint is a 100 TB documents table, where any per-row Python would
dominate runtime.

Functions return Columns; the query-shaped wrappers live in
hermod_spark.operators.textops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; strips BOTH ends of ANY whitespace so
    no empty edge tokens; blank or whitespace-only input yields an
    empty array (not ['']). The strip is regexp-based, not trim():
    trim() removes only ASCII spaces, so 'hello\n' would split to
    ['hello', ''] — an empty token that inflates token counts and
    changes fingerprints/shingles on virtually every real document
    (they end in newlines)."""
    c = _c(col)
    stripped = F.regexp_replace(c, r"^\s+|\s+$", "")
    return F.when(
        F.length(stripped) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(stripped, r"\s+"))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def word_set(col: Column | str) -> Column:
    """Sorted distinct lowercase words — canonical token set."""
    return F.array_sort(F.array_distinct(tokens(F.lower(_c(col)))))


# BPE-ish subword proxy: alternating letter-runs / digit-runs / single
# punctuation marks, the standard pre-tokenizer regex shape.
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(col: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(_BPE_RE), 0))


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small + hardcoded: language ID at 100 TB must
# be a broadcastable constant expression, not a model lookup.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "las", "es", "no", "un", "una", "por", "para"],
}


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang``."""
    toks = tokens(F.lower(_c(col)))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(toks), sw))


def lang_id(col: Column | str) -> Column:
    """Argmax of per-language distinct-stopword hits; ties broken by
    language code order; no hits at all -> 'und' (undetermined)."""
    scored = [(lang, stopword_hits(col, lang)) for lang in sorted(STOPWORDS)]
    best = None
    best_score = None
    for lang, score in scored:
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, score).otherwise(best_score)
    total = None
    for _, score in scored:
        total = score if total is None else total + score
    return F.when(total > 0, best).otherwise(F.lit("und"))


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: rewards reasonable length,
    low punctuation density, and stopword presence (English-weighted).

    score = 0.4*min(n_tokens/100,1) + 0.3*(1-min(punct_ratio*5,1))
          + 0.3*min(stopword_ratio*10,1)
    """
    n_tok = token_count(col).cast("double")
    sw_ratio = stopword_hits(col, "en").cast("double") / F.greatest(n_tok, F.lit(1.0))
    return (
        F.least(n_tok / 100.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct_ratio(col) * 5.0, F.lit(1.0))) * 0.3
        + F.least(sw_ratio * 10.0, F.lit(1.0)) * 0.3
    )


def ngrams(col: Column | str, n: int = 2) -> Column:
    """Word n-grams as an array; docs shorter than n words yield an
    empty array. Token array bound once via the single-element-array
    lambda trick (see operators.dedup.shingles for why)."""
    toks = tokens(F.lower(_c(col)))

    def _from_tokens(t: Column) -> Column:
        return F.when(
            F.size(t) < n, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(t, i, F.lit(n))),
            )
        )

    return F.flatten(F.transform(F.array(toks), _from_tokens))


def max_run_length(arr: Column) -> Column:
    """Longest run of equal adjacent elements in a string array; 0 for
    an empty array. Fed a *sorted* array this is the max element
    multiplicity — O(n log n) per row (the sort) instead of the O(n²)
    count-each-element nested loop, which matters when documents grow
    to book length. Single `aggregate` fold, fully codegen'd."""

    def _step(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc.getField("prev")), acc.getField("run") + 1).otherwise(
            F.lit(1)
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc.getField("best"), run).alias("best"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    return F.aggregate(arr, init, _step, lambda acc: acc.getField("best"))


def fingerprint(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 of the sorted distinct
    lowercase word set — whitespace/dup/word-order insensitive, exact
    content-set sensitive. A content-defined key usable as a shuffle/
    dedup key at any scale."""
    return F.md5(F.concat_ws(" ", word_set(col)))


def char_entropy(col: Column | str) -> Column:
    """Character-level Shannon entropy (bits/char) of the lowercased
    text — a zero-shuffle gibberish detector: repeated-char spam scores
    near 0, English prose ~4.0–4.5, base64/compressed blobs ~6.

    Entirely scan-side via nested higher-order functions: per row
    O(distinct_chars × len) with distinct_chars bounded by the
    alphabet, vs the explode→groupBy(doc,char) shape that shuffles
    O(total_chars) rows. The char array is let-bound ONCE through the
    single-element-array transform (the winnow lesson: inlining it
    into every per-char count re-evaluates the split per term).

    Float determinism: terms fold left-to-right over the SORTED
    distinct-char array from an init of 0.0 (0.0 + x == x in IEEE 754
    for finite x), so a DuckDB ``list_reduce((a,b) -> a+b)`` over the
    same sorted list reproduces the sum bit-for-bit.

    Case-mapping caveat (ASCII-ish assumption): lowercasing runs in the
    engine's own collation (JVM `lower` here, DuckDB `lower` in the
    oracle). On locale-sensitive code points (ß→ss, dotted/dotless İ/ı)
    the two can produce different char multisets. The test corpus is
    ASCII; callers feeding non-ASCII text should pre-normalize with an
    explicit ASCII-safe mapping mirrored on both sides.
    """
    chars = F.filter(F.split(F.lower(_c(col)), ""), lambda x: x != F.lit(""))

    def _entropy(cs: Column) -> Column:
        n = F.size(cs).cast("double")

        def term(ch: Column) -> Column:
            # let-bind p through the same single-element-array trick as
            # cs, so the O(len) per-char count runs ONCE per term, not
            # twice (once for p, once inside log2(p))
            p0 = F.size(F.filter(cs, lambda x: x == ch)).cast("double") / n
            return F.get(F.transform(F.array(p0), lambda p: p * F.log2(p)), 0)

        terms = F.transform(F.array_sort(F.array_distinct(cs)), term)
        # NULL text propagates NULL (unscored), like every other
        # function here — 0.0 would classify null documents as
        # repeated-char spam; empty text is genuinely entropy 0
        return (
            F.when(
                F.size(cs) > 0,
                -F.aggregate(terms, F.lit(0.0), lambda a, x: a + x),
            )
            .when(cs.isNotNull(), F.lit(0.0))
        )

    return F.get(F.transform(F.array(chars), _entropy), 0)
