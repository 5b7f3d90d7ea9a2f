"""BPE encoder: training, goldens, and three-way count parity.

The defined-answer contract (VERDICT r12 #6): merges apply in learned
order as leftmost-non-overlapping replaces, so the Python reference
(`encode_word`), the Arrow-batched pandas_udf (`bpe_token_count`),
and the DuckDB replace chain (`merges_sql`) are one algorithm.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hermod_spark.functions import bpe

FREQS = {
    "low": 5, "lower": 2, "newest": 6, "widest": 3,
    "the": 50, "there": 8, "then": 6, "hello": 4, "world": 4,
}


def test_train_bpe_deterministic_and_classic_shape():
    """Same input -> same merges; the first merges are the textbook
    high-frequency pairs, ties broken lexicographically."""
    m1 = bpe.train_bpe(FREQS, 12)
    m2 = bpe.train_bpe(dict(reversed(list(FREQS.items()))), 12)
    assert m1 == m2 and len(m1) == 12
    # h+e spans the(50)+there(8)+then(6)+hello(4)=68 > t+h's 64,
    # then t+he reunites 'the'
    assert m1[0] == ("h", "e") and m1[1] == ("t", "he")
    # stops early when no pair repeats
    assert bpe.train_bpe({"ab": 1}, 10) == []
    assert bpe.train_bpe({"": 3}, 10) == []


def test_encode_word_goldens():
    merges = bpe.train_bpe(FREQS, 12)
    assert bpe.encode_word("the", merges) == ["the"]
    assert bpe.encode_word("", merges) == []
    # unseen word falls back toward characters, seen subwords merge
    toks = bpe.encode_word("thex", merges)
    assert toks[0] == "the" and toks[1:] == ["x"]
    # leftmost-non-overlapping: no (a,a) merge trained -> chars
    assert bpe.encode_word("aaaa", merges) == ["a", "a", "a", "a"]
    aa = bpe.train_bpe({"aaaa": 9}, 1)
    assert aa == [("a", "a")]
    assert bpe.encode_word("aaaa", aa) == ["aa", "aa"]
    assert bpe.encode_word("aaa", aa) == ["aa", "a"]


def test_udf_matches_reference_and_duckdb(spark):
    """Per-doc counts from the pandas_udf == sum of reference
    encode_word lengths == the DuckDB replace chain, over real
    corpus text plus nulls/blanks."""
    merges = bpe.train_bpe(FREQS, 12)
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(80)
        .unionByName(
            spark.createDataFrame(
                [(9_000_001, None), (9_000_002, "  \n\t "),
                 (9_000_003, "THE Newest  widest"),
                 # NBSP is NOT a separator in the shared ASCII \s
                 # class: all three engines must keep one pretoken
                 (9_000_004, "the\u00a0widest and\u2009more")],
                "doc_id long, text string",
            )
        )
    )
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe.bpe_token_count("text", merges).alias("n")
        ).collect()
    }

    def ref(t):
        if t is None:
            return None
        return sum(
            len(bpe.encode_word(w, merges)) for w in bpe.pretokens(t)
        )

    for row in docs.collect():
        assert got[row["doc_id"]] == ref(row["text"]), row["doc_id"]
    assert got[9_000_001] is None and got[9_000_002] == 0

    con = duckdb.connect()
    wsql = bpe.merges_sql("w", merges)
    for row in docs.collect():
        if not row["text"] or not row["text"].split():
            continue
        dd = con.execute(
            f"SELECT SUM({wsql}) FROM (SELECT unnest(string_split_regex("
            f"trim(lower(?)), '\\s+')) AS w)",
            [row["text"]],
        ).fetchone()[0]
        assert got[row["doc_id"]] == dd, row["doc_id"]


def test_train_from_corpus_bounded_and_effective(spark):
    """Distributed training collects only the word-frequency table;
    the corpus vocabulary's high-frequency words become single
    tokens, and the UDF count is well below the character count."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    merges = bpe.train_bpe_from_corpus(docs, n_merges=48, max_words=500)
    assert 0 < len(merges) <= 48
    assert bpe.encode_word("scan", merges) == ["scan"]  # top corpus word
    stats = docs.select(
        bpe.bpe_token_count("text", merges).alias("n"),
        F.length(F.regexp_replace(F.lower("text"), r"\s+", "")).alias("chars"),
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("words"),
    ).agg(F.sum("n").alias("n"), F.sum("chars").alias("c"),
          F.sum("words").alias("w")).first()
    assert stats["w"] <= stats["n"] <= stats["c"]  # words <= bpe <= chars
    # with the pinned entry merges, the registry numbers reproduce
    import __spark_entry__ as E

    assert E.BPE_MERGES == bpe.train_bpe(E.BPE_TRAIN_FREQS, 48)


def test_merges_sql_empty_pretoken_counts_zero():
    """ADVICE r13: DuckDB string_split('','') yields [''] — without
    the zero guard an empty pretoken counted 1 where encode_word('')
    is 0. NULL stays NULL (matching the UDF's None passthrough)."""
    import duckdb

    from hermod_spark.functions import bpe

    sql = bpe.merges_sql("w", [("a", "b")])
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {sql} FROM (SELECT '' AS w)"
    ).fetchone()[0]
    assert got == 0
    assert len(bpe.encode_word("", [("a", "b")])) == 0
    got_null = con.execute(
        f"SELECT {sql} FROM (SELECT CAST(NULL AS VARCHAR) AS w)"
    ).fetchone()[0]
    assert got_null is None
    got_ab = con.execute(
        f"SELECT {sql} FROM (SELECT 'ab' AS w)"
    ).fetchone()[0]
    assert got_ab == 1
