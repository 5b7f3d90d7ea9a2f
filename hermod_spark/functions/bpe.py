"""Byte-pair-encoding tokenizer: real merge-table subword counts.

``text.bpe_token_count`` is a regex PROXY (letter-runs / digit-runs /
punct marks); packing and budgeting real training data wants counts
from an actual BPE merge table (VERDICT r12 next-round #6). This
module is the classic Sennrich/Haddow/Birch BPE (ACL 2016, the
subword-nmt algorithm — public literature), with two properties the
repo's gates need:

- **Deterministic everywhere.** Training breaks pair-frequency ties
  lexicographically; encoding applies merges strictly in learned
  order, each merge replacing leftmost-non-overlapping occurrences —
  the subword-nmt application order, which a chain of plain string
  replaces reproduces exactly. That makes the DuckDB oracle a chain
  of ``replace()`` calls and the Python reference a chain of
  ``str.replace`` — three implementations, one defined answer.
- **Driver-bounded training, scan-shaped encoding.** Training needs
  only the word-frequency table (the sufficient statistic): one
  distributed groupBy, a bounded top-``max_words`` collect, then the
  merge loop on the driver dict — the `centroids_of` discipline.
  Encoding is an Arrow-batched pandas_udf over a BROADCAST merge
  list (the `fn-hmac` discipline: semantically unavoidable Python),
  with a per-batch cache keyed by unique pretoken — real corpora are
  Zipfian, so the cache turns per-token cost into per-TYPE cost.

Symbol encoding: each symbol is wrapped ``\\x01sym\\x02``, so the
pair-pattern ``\\x01a\\x02\\x01b\\x02`` can never match across symbol
boundaries and leftmost-non-overlapping replacement merges runs
correctly (``aaaa`` + merge(a,a) → ``(aa)(aa)``, where space-joined
symbols would mis-consume the shared delimiter). Pretokenization is
the repo's whitespace tokens, lowered — same as every text operator.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

SYM_L = "\x01"
SYM_R = "\x02"

# pretokenizer: ASCII \s+ — the SAME whitespace class the repo's
# Spark tokens() (Java regex \s) and the DuckDB oracle
# (string_split_regex '\s+', RE2) split on. Python's bare
# str.split()/str.strip() are UNICODE-whitespace-aware and would
# split on NBSP/thin-space where the other two engines keep one
# token — a silent three-way divergence on real scraped text
# (r13 review finding).
_WS = re.compile(r"\s+", re.ASCII)


def pretokens(text: str) -> list[str]:
    """Lowered ASCII-whitespace word split shared by the encoder UDF
    and the test reference — definitionally the token set
    ``functions.text.tokens(lower(col))`` produces."""
    return [w for w in _WS.split(text.lower()) if w]


def train_bpe(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a word-frequency dict — the
    classic greedy loop: count symbol pairs weighted by word
    frequency, merge the most frequent (ties to the LEXICOGRAPHICALLY
    smallest pair, so training is deterministic), repeat. Stops early
    when no pair repeats."""
    words: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        if w:
            words[tuple(w)] = words.get(tuple(w), 0) + int(f)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged: dict[tuple[str, ...], int] = {}
        a, b = best
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            merged[t] = merged.get(t, 0) + f
        words = merged
    return merges


def train_bpe_from_corpus(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 64,
    max_words: int = 20_000,
) -> list[tuple[str, str]]:
    """Distributed word-frequency pass (one groupBy over the lowered
    whitespace tokens), bounded top-``max_words`` collect, driver
    merge loop. The collect is model-sized (word TYPES, Zipf-capped),
    never corpus-sized — the same bounded-model-state contract as
    `centroids_of`."""
    from hermod_spark.functions.text import tokens

    freqs = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.desc("f"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return train_bpe({r["w"]: r["f"] for r in freqs}, n_merges)


def _wrap(word: str) -> str:
    return "".join(SYM_L + ch + SYM_R for ch in word)


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encoder: apply merges in learned order, each as a
    leftmost-non-overlapping replace — subword-nmt semantics, and
    literally the same ``replace`` chain the pandas_udf and the
    DuckDB oracle run."""
    s = _wrap(word)
    for a, b in merges:
        s = s.replace(
            SYM_L + a + SYM_R + SYM_L + b + SYM_R, SYM_L + a + b + SYM_R
        )
    return [p[:-1] for p in s.split(SYM_L) if p]


def bpe_token_count(
    col: Column | str, merges: list[tuple[str, str]]
) -> Column:
    """Per-row BPE token count over the lowered whitespace pretokens —
    Arrow-batched pandas_udf with a per-batch unique-pretoken cache
    (Zipf: cost per TYPE, not per token). The merge list rides the
    closure (broadcast with the serialized udf, KBs)."""
    merges_t = tuple((a, b) for a, b in merges)

    @F.pandas_udf(LongType())
    def _count(texts: pd.Series) -> pd.Series:
        pats = [
            (SYM_L + a + SYM_R + SYM_L + b + SYM_R, SYM_L + a + b + SYM_R)
            for a, b in merges_t
        ]
        cache: dict[str, int] = {}

        def word_n(w: str) -> int:
            n = cache.get(w)
            if n is None:
                s = _wrap(w)
                for pat, rep in pats:
                    s = s.replace(pat, rep)
                n = s.count(SYM_L)
                cache[w] = n
            return n

        def doc_n(t) -> int | None:
            if t is None:
                return None
            return sum(word_n(w) for w in pretokens(str(t)))

        return pd.Series([doc_n(t) for t in texts], dtype="Int64")

    c = F.col(col) if isinstance(col, str) else col
    return _count(c)


def merges_sql(
    text_sql: str, merges: list[tuple[str, str]]
) -> str:
    """DuckDB expression computing the SAME count for one pretoken
    column: wrap chars, chain the replaces, count the symbol markers.
    Shared by the oracle so Spark and DuckDB run one algorithm.

    The guarded zero branch matters for raw columns: DuckDB's
    ``string_split('', '')`` yields ``['']`` (one empty element → one
    marker pair → count 1) where ``encode_word('')`` is 0. Current
    tokenizers never emit empty pretokens, but the SQL should not be
    one-off if applied to an unfiltered column (ADVICE r13)."""
    expr = (
        f"array_to_string(list_transform(string_split({text_sql}, ''), "
        f"x -> chr(1) || x || chr(2)), '')"
    )

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    for a, b in merges:
        pat = SYM_L + a + SYM_R + SYM_L + b + SYM_R
        rep = SYM_L + a + b + SYM_R
        expr = f"replace({expr}, {q(pat)}, {q(rep)})"
    return (
        f"(CASE WHEN length({text_sql}) = 0 THEN 0 ELSE "
        f"(length({expr}) - length(replace({expr}, chr(1), ''))) END)"
    )
