"""Text-analysis column builders (LLM-pipeline surface)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hermod_spark.functions import text as X
from hermod_spark.operators import textops


def _one(spark, expr, value):
    df = spark.createDataFrame([(value,)], "s STRING")
    return df.select(expr("s").alias("o")).first()["o"]


@pytest.mark.parametrize(
    "value,want",
    [
        ("hello world", 2),
        ("  padded   spaces  ", 2),
        ("", 0),  # ADVICE r1: blank -> 0, not 1
        ("   ", 0),
        ("one", 1),
        ("a\tb\nc", 3),
    ],
)
def test_token_count(spark, value, want):
    assert _one(spark, X.token_count, value) == want


def test_distinct_token_count(spark):
    assert _one(spark, X.distinct_token_count, "a b a c b") == 3


def test_bpe_token_count(spark):
    # letter-runs, digit-runs, single punct: 'abc', '123', ',', 'x' -> 4
    assert _one(spark, X.bpe_token_count, "abc123, x") == 4
    assert _one(spark, X.bpe_token_count, "") == 0


def test_punct_ratio(spark):
    assert _one(spark, X.punct_ratio, "abcd") == 0.0
    assert _one(spark, X.punct_ratio, "a!b!") == 0.5
    assert _one(spark, X.punct_ratio, "") == 0.0  # guarded denominator


@pytest.mark.parametrize(
    "value,want",
    [
        ("the cat and the dog is in that house", "en"),
        ("der hund und die katze ist nicht ein tier", "de"),
        ("le chat et la maison est pour un homme dans", "fr"),
        ("el perro es un animal por la casa", "es"),
        ("xyzzy plugh quux", "und"),
        ("", "und"),
    ],
)
def test_lang_id(spark, value, want):
    assert _one(spark, X.lang_id, value) == want


def test_lang_id_tie_prefers_earlier_code(spark):
    # 'la' is a stopword for both fr and es; tie -> first in sorted order
    # of codes with max hits among {de,en,es,fr}: es wins over fr.
    assert _one(spark, X.lang_id, "la la la") == "es"


def test_quality_score_bounds(spark):
    vals = [
        "the quick brown fox jumps over the lazy dog and runs to the hills",
        "!!!! ???? ....",
        "",
        "word " * 200,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s STRING")
    for r in df.select(X.quality_score("s").alias("q")).collect():
        assert 0.0 <= r["q"] <= 1.0


def test_quality_score_orders_sensibly(spark):
    good = "the cat and the dog is in that house with a friend for dinner"
    junk = "@# $% ^& *! ~~ ||"
    assert _one(spark, X.quality_score, good) > _one(spark, X.quality_score, junk)


def test_fingerprint_invariances(spark):
    """Order-, duplication-, whitespace-, and case-insensitive."""
    variants = ["b a c", "a   b c", "C B A", "a a b b c c"]
    df = spark.createDataFrame([(v,) for v in variants], "s STRING")
    fps = {r["f"] for r in df.select(X.fingerprint("s").alias("f")).collect()}
    assert len(fps) == 1
    assert fps.pop() == hashlib.md5(b"a b c").hexdigest()


def test_fingerprint_distinguishes_content(spark):
    assert _one(spark, X.fingerprint, "a b c") != _one(spark, X.fingerprint, "a b d")


def test_word_set(spark):
    assert _one(spark, X.word_set, "B a b A") == ["a", "b"]


def test_ngrams(spark):
    assert _one(spark, lambda c: X.ngrams(c, 2), "a b c") == ["a b", "b c"]
    assert _one(spark, lambda c: X.ngrams(c, 3), "a b") == []
    assert _one(spark, lambda c: X.ngrams(c, 2), "") == []


def test_top_ngrams(spark):
    from hermod_spark.operators.textops import top_ngrams

    df = spark.createDataFrame(
        [("x y x y",), ("x y z",)], "text STRING"
    )
    rows = top_ngrams(df, n=2, k=2).collect()
    assert [(r["ngram"], r["n_occurrences"], r["rank"]) for r in rows] == [
        ("x y", 3, 1),
        ("y x", 1, 2),  # tie with 'y z' broken lexicographically
    ]


def test_max_run_length(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(["a", "a", "a", "b"],), (["x"],), ([],)], "arr ARRAY<STRING>"
    )
    got = [r[0] for r in df.select(X.max_run_length(F.col("arr"))).collect()]
    assert got == [3, 1, 0]


def test_repetition_signals_goldens(spark):
    from hermod_spark.operators.textops import repetition_signals

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, ""), (3, "x y z"), (4, "go go go go")],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_token_frac"],
            r["top_token_frac"],
            r["top_bigram_frac"],
        )
        for r in repetition_signals(df).collect()
    }
    # doc 1: 4 tokens {a:3,b:1}; bigrams [a a, a a, a b] -> 2/3
    assert got[1] == (4, 0.5, 0.75, 0.666667)
    # empty doc: zero everywhere, never null
    assert got[2] == (0, 0.0, 0.0, 0.0)
    # all-distinct doc: dup 0, top token 1/3, each bigram unique -> 1/2
    assert got[3] == (3, 0.0, 0.333333, 0.5)
    # fully degenerate doc: everything 1.0 except dup 3/4
    assert got[4] == (4, 0.75, 1.0, 1.0)


def test_repetition_signals_no_python_in_plan(spark):
    from hermod_spark.operators.textops import repetition_signals

    df = spark.createDataFrame([(1, "a b")], "doc_id LONG, text STRING")
    plan = repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_stats(spark):
    from hermod_spark.operators import textops

    df = spark.createDataFrame(
        [
            (1, "a", "the cat the dog"),
            (2, "a", "the bird"),
            (3, "b", ""),
            (4, "b", "x y z"),
        ],
        "doc_id INT, source STRING, text STRING",
    )
    rows = {r["source"]: r for r in textops.vocab_stats(df).collect()}
    a = rows["a"]
    assert (a["n_tokens"], a["n_vocab"]) == (6, 4)  # the cat dog bird
    assert abs(a["type_token_ratio"] - 4 / 6) < 1e-6
    b = rows["b"]  # empty doc contributes nothing
    assert (b["n_tokens"], b["n_vocab"]) == (3, 3)


def test_tfidf_top_terms(spark):
    from hermod_spark.operators import textops

    docs = spark.createDataFrame(
        [
            (1, "a", "apple apple apple banana"),
            (2, "a", "apple cherry cherry cherry"),
            (3, "b", "banana banana banana banana"),
            (4, "b", "common common common common"),
            (5, "a", "common common"),
        ],
        "doc_id INT, source STRING, text STRING",
    )
    out = textops.tfidf_top_terms(docs, k=3, min_tf=3)
    rows = [(r["source"], r["tok"], r["tf"], r["rank"]) for r in out.collect()]
    import math

    # source a: apple tf=4 df=2, cherry tf=3 df=1, common tf=2 < min_tf
    # source b: banana tf=4 df=2, common tf=4 df=2
    a = [r for r in rows if r[0] == "a"]
    assert [(t, tf) for _, t, tf, _ in sorted(a, key=lambda r: r[3])] == [
        ("cherry", 3), ("apple", 4)
    ]  # cherry: 3*ln(5/1)=4.83 > apple: 4*ln(5/2)=3.67
    b = sorted([r for r in rows if r[0] == "b"], key=lambda r: r[3])
    assert [t for _, t, _, _ in b] == ["banana", "common"]  # tie → token asc
    scores = {r["tok"]: r["tfidf"] for r in out.collect() if r["source"] == "a"}
    assert abs(scores["cherry"] - round(3 * math.log(5 / 1), 6)) < 1e-9


def test_dup_rate_by_group(spark):
    from hermod_spark.operators import textops

    df = spark.createDataFrame(
        [
            (1, "a", "x y z"), (2, "a", "x y z"), (3, "a", "unique words"),
            (4, "b", "all distinct"),
        ],
        "doc_id INT, source STRING, text STRING",
    )
    rows = {r["source"]: r for r in textops.dup_rate_by_group(df).collect()}
    assert rows["a"]["n_docs"] == 3 and rows["a"]["n_unique"] == 2
    assert abs(rows["a"]["dup_rate"] - (1 - 2 / 3)) < 1e-6
    assert rows["b"]["dup_rate"] == 0.0


# ------------------------------------------------------- winnowing fingerprints


def _py_winnow(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Independent Python reference for winnow_fingerprints (SIGMOD'03):
    normalize, hash every k-gram (first 8 md5 hex digits as int), min of
    each `window` consecutive hashes, distinct in first-seen order."""
    import hashlib
    import re

    s = re.sub("[^a-zA-Z0-9]", "", text).lower()
    grams = [s[i : i + k] for i in range(max(len(s) - k + 1, 0))]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    if len(hs) < window:
        return []
    mins = [min(hs[j : j + window]) for j in range(len(hs) - window + 1)]
    out: list[int] = []
    for m in mins:
        if m not in out:
            out.append(m)
    return out


def test_winnow_golden_summary(spark):
    from hermod_spark.operators import textops

    docs = [
        (1, "The quick brown fox jumps over the lazy dog!"),
        (2, "Pack my box with five dozen liquor jugs, twice: "
            "pack my box with five dozen liquor jugs."),
        (3, "abcdefghijk"),  # exactly k+window-1 normalized chars -> 1 fp
    ]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    got = {r["doc_id"]: r for r in textops.winnow_fingerprints(df).collect()}
    for doc_id, text in docs:
        fps = _py_winnow(text)
        r = got[doc_id]
        assert r["n_fingerprints"] == len(fps), doc_id
        assert r["fp_min"] == min(fps), doc_id
        assert r["fp_max"] == max(fps), doc_id
        assert r["fp_sum"] == sum(fps), doc_id
    assert got[3]["n_fingerprints"] == 1


def test_winnow_short_docs_empty_set(spark):
    from hermod_spark.operators import textops

    df = spark.createDataFrame(
        [(1, ""), (2, "tiny"), (3, "abcdefgh"), (4, "abcdefghij")],
        "doc_id INT, text STRING",
    )  # len(s) < k, == k, and k <= len < k+window-1: all too short
    for r in textops.winnow_fingerprints(df).collect():
        assert r["n_fingerprints"] == 0
        assert r["fp_min"] is None and r["fp_max"] is None
        assert r["fp_sum"] == 0


def test_winnow_shared_substring_guarantee(spark):
    """SIGMOD'03: any shared substring of length >= k+window-1 yields at
    least one shared fingerprint (tested via emit_sets)."""
    from hermod_spark.operators import textops

    shared = "thecommonplagiarizedpassageofthedocument"  # 40 chars >= 11
    df = spark.createDataFrame(
        [
            (1, "totally original opening words " + shared + " and an ending"),
            (2, "different preamble text here " + shared + " other closing"),
            (3, "no overlap with anything else whatsoever in this one"),
        ],
        "doc_id INT, text STRING",
    )
    sets = {
        r["doc_id"]: set(r["fingerprints"])
        for r in textops.winnow_fingerprints(df, emit_sets=True).collect()
    }
    assert sets[1] & sets[2], "shared substring must share a fingerprint"
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])


def test_winnow_linear_cost_guard(spark):
    """Regression guard for the r4 expression re-inlining bug: 50 docs of
    2000 chars finished in ~1s fixed but took O(hours) quadratic. A
    generous wall-clock box still separates the two by >100x."""
    import time

    from pyspark.sql import functions as F

    from hermod_spark.operators import textops

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "", F.array_repeat(F.concat(F.lit("seg"), F.col("id").cast("string")), 400)
        ).alias("text"),
    )
    t0 = time.perf_counter()
    n = textops.winnow_fingerprints(df).count()
    assert n == 50
    assert time.perf_counter() - t0 < 60, "winnow cost is superlinear again"


# ------------------------------------------------------------ oov / pii


def test_oov_rate(spark):
    from hermod_spark.operators import textops

    # corpus freq: "common" x4, "word" x3, "rare" x1, "unique" x1
    df = spark.createDataFrame(
        [
            (1, "common word common"),
            (2, "common word rare"),
            (3, "common word unique"),
        ],
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r for r in textops.oov_rate(df, vocab_size=2).collect()}
    # vocab = {common, word}; rare/unique are OOV
    assert rows[1]["n_oov"] == 0 and rows[1]["oov_rate"] == 0.0
    assert rows[2]["n_oov"] == 1 and abs(rows[2]["oov_rate"] - 1 / 3) < 1e-6
    assert rows[3]["n_oov"] == 1


def test_oov_vocab_tie_break_deterministic(spark):
    from hermod_spark.operators import textops

    # "a" and "b" tie on frequency; vocab_size=1 must pick "a" (token asc)
    df = spark.createDataFrame([(1, "a b"), (2, "a b")], "doc_id INT, text STRING")
    rows = {r["doc_id"]: r for r in textops.oov_rate(df, vocab_size=1).collect()}
    assert rows[1]["n_oov"] == 1  # "b" is out


def test_pii_redact_rules(spark):
    from hermod_spark.operators import textops

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "ssn 123-45-6789 ip 192.168.0.1 acct 12345678"),
            (3, "clean text with no pii at all"),
            (4, "two mails a@b.io and c@d.co plus 10.0.0.1"),
        ],
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r for r in textops.pii_redact(df).collect()}
    assert rows[1]["redacted"] == "mail <EMAIL> now"
    assert rows[1]["n_email"] == 1 and rows[1]["n_ssn"] == 0
    assert rows[2]["redacted"] == "ssn <SSN> ip <IP> acct <NUMBER>"
    assert rows[2]["n_ssn"] == 1 and rows[2]["n_ipv4"] == 1 and rows[2]["n_number"] == 1
    assert rows[3]["redacted"] == "clean text with no pii at all"  # unchanged
    assert sum([rows[3]["n_email"], rows[3]["n_ssn"], rows[3]["n_ipv4"], rows[3]["n_number"]]) == 0
    assert rows[4]["redacted"] == "two mails <EMAIL> and <EMAIL> plus <IP>"
    assert rows[4]["n_email"] == 2 and rows[4]["n_ipv4"] == 1


# --------------------------------------------------- content-defined chunking


def test_cdc_chunks_reassemble(spark):
    import hashlib

    from hermod_spark.operators import textops

    text = "the quick brown fox jumps over the lazy dog " * 8
    df = spark.createDataFrame([(1, text)], "doc_id INT, text STRING")
    rows = sorted(textops.cdc_chunks(df).collect(), key=lambda r: r["chunk_id"])
    assert sum(r["chunk_len"] for r in rows) == len(text)
    # chunk hashes are the md5-prefix of the actual chunk text
    pos = 0
    for r in rows:
        chunk = text[pos : pos + r["chunk_len"]]
        assert r["chunk_hash"] == hashlib.md5(chunk.encode()).hexdigest()[:16]
        pos += r["chunk_len"]


def test_cdc_chunks_shift_robust(spark):
    from hermod_spark.operators import textops

    base = "many different words arranged into one long document body " * 10
    shifted = "PREFIX INSERTED " + base
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id INT, text STRING"
    )
    out = textops.cdc_chunks(df).collect()
    h1 = [r["chunk_hash"] for r in sorted(
        (r for r in out if r["doc_id"] == 1), key=lambda r: r["chunk_id"])]
    h2 = [r["chunk_hash"] for r in sorted(
        (r for r in out if r["doc_id"] == 2), key=lambda r: r["chunk_id"])]
    assert len(h1) > 2, "need multiple chunks for the property to bite"
    # content-anchored boundaries: all chunks after the first boundary
    # survive the prefix insertion (fixed-size chunking would share 0)
    assert h1[1:] == h2[-(len(h1) - 1):]


def test_cdc_short_doc_single_chunk(spark):
    import hashlib

    from hermod_spark.operators import textops

    df = spark.createDataFrame([(1, "tiny"), (2, "")], "doc_id INT, text STRING")
    rows = {r["doc_id"]: r for r in textops.cdc_chunks(df).collect()}
    assert rows[1]["chunk_len"] == 4 and rows[1]["chunk_id"] == 0
    assert rows[1]["chunk_hash"] == hashlib.md5(b"tiny").hexdigest()[:16]
    assert rows[2]["chunk_len"] == 0


def test_winnow_containment_detects_shared_passage(spark):
    from hermod_spark.operators import textops

    passage = "the incriminating shared passage that was copied verbatim between documents"
    df = spark.createDataFrame(
        [
            (1, "unique opening for one " + passage + " and a closing"),
            (2, "other intro words here " + passage + " different end"),
            (3, "nothing in common with either of those two documents"),
            (4, "yet another completely unrelated piece of writing"),
        ],
        "doc_id INT, text STRING",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in textops.winnow_containment(df, min_shared=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all(p == (1, 2) for p in pairs), pairs


def test_winnow_containment_hot_fp_cap(spark):
    from hermod_spark.operators import textops

    # a fingerprint present in EVERY doc is boilerplate: with
    # max_posting below the corpus size it must not produce pairs
    boiler = "this identical boilerplate footer appears in every document here"
    df = spark.createDataFrame(
        [(i, f"doc {i} unique words {i * 7} " + boiler) for i in range(6)],
        "doc_id INT, text STRING",
    )
    all_pairs = textops.winnow_containment(df, min_shared=1, max_posting=200).count()
    capped = textops.winnow_containment(df, min_shared=1, max_posting=5).count()
    assert all_pairs > 0
    assert capped < all_pairs


def test_ngram_novelty_scores_fresh_content(spark):
    from hermod_spark.operators import textops

    ref = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id INT, text STRING",
    )
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # 100% seen
            (2, "completely different words appear in this one"),  # 100% novel
            (3, "the quick brown fox eats entirely novel grams"),  # mixed
            (4, "ab"),  # < n words: no grams
        ],
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r for r in textops.ngram_novelty(df, ref, n=3).collect()}
    assert rows[1]["novelty"] == 0.0
    assert rows[2]["novelty"] == 1.0
    assert 0.0 < rows[3]["novelty"] < 1.0
    assert rows[4]["n_grams"] == 0 and rows[4]["novelty"] == 0.0


def test_chunk_dedup_stats_finds_shared_chunks(spark):
    from hermod_spark.operators import textops

    base = "abcdefgh" * 40  # long enough to produce several chunks
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "zyxwvuts" * 40)],
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r for r in textops.chunk_dedup_stats(df).collect()}
    # doc 1 holds every first copy of its hashes; doc 2 is all dups
    assert rows[1]["n_dup_chunks"] < rows[1]["n_chunks"]
    assert rows[2]["n_dup_chunks"] == rows[2]["n_chunks"]
    assert rows[2]["dup_frac"] == 1.0
    assert rows[1]["total_chars"] == len(base)
    # repeated-period text shares chunks internally but doc 3 shares
    # nothing with docs 1/2 beyond its own internal repeats
    assert rows[3]["total_chars"] == len(base)


def test_char_entropy_goldens(spark):
    import math

    from hermod_spark.operators import textops

    df = spark.createDataFrame(
        [
            (1, "aaaa"),          # one symbol -> 0 bits
            (2, "abab"),          # two equiprobable symbols -> 1 bit
            (3, ""),              # empty -> 0 by contract
            (4, "AaBb"),          # lowercased first: {a,b} -> 1 bit
            (5, "abcd"),          # four equiprobable -> 2 bits
        ],
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r["char_entropy"] for r in textops.doc_char_entropy(df).collect()}
    assert rows[1] == 0.0
    assert math.isclose(rows[2], 1.0)
    assert rows[3] == 0.0
    assert math.isclose(rows[4], 1.0)
    assert math.isclose(rows[5], 2.0)


def test_char_entropy_orders_gibberish_above_spam(spark):
    from hermod_spark.operators import textops

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "q8Zk3vWx1pT0mYr7dLs9bNc2fJh6gA4e"),  # base64-ish
        ],
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r["char_entropy"] for r in textops.doc_char_entropy(df).collect()}
    assert rows[1] < rows[2] < rows[3]


def test_unigram_surprisal_orders_rare_above_common(spark):
    """Docs made of rare tokens must score higher surprisal than docs
    of corpus-dominant tokens; OOV floor applies to singletons beyond
    the vocab; blank docs -> 0.0."""
    from hermod_spark.operators.textops import unigram_surprisal

    rows = (
        [(i, "common common common common") for i in range(10)]
        + [(100, "zzyzx qwfp vexing glyphs"), (101, "   ")]
    )
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = {r["doc_id"]: r for r in unigram_surprisal(df, vocab_size=2).collect()}
    assert got[101]["n_tokens"] == 0 and got[101]["mean_surprisal"] == 0.0
    assert got[0]["mean_surprisal"] < got[100]["mean_surprisal"]
    # common doc: p = 40/44 -> -ln(40/44) per token
    import math
    exp = round(-math.log(40.0 / 44.0), 6)
    assert abs(got[0]["mean_surprisal"] - exp) < 2e-6
    # rare doc: every token OOV (vocab=2 holds only 'common' + 1 more)
    # -> at least one token at the 1/total floor
    assert got[100]["mean_surprisal"] >= round(-math.log(2.0 / 44.0), 6) - 2e-6


def test_unigram_surprisal_partition_invariant(spark):
    """Decimal-cast per-token sums: the result must be identical under
    any repartitioning (the order-independence claim)."""
    from hermod_spark.operators.textops import unigram_surprisal

    rows = [(i, f"tok{i % 7} tok{i % 3} shared word here") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    a = sorted(map(tuple, unigram_surprisal(df, 5).collect()))
    b = sorted(map(tuple, unigram_surprisal(df.repartition(13), 5).collect()))
    assert a == b


def test_ccnet_buckets_tertiles(spark):
    """CCNet partition: even 3-way split, head = lowest surprisal,
    monotone boundaries, every doc bucketed exactly once."""
    from hermod_spark.data import table
    from hermod_spark.operators.textops import ccnet_buckets

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    out = ccnet_buckets(docs, vocab_size=50).collect()
    assert len(out) == docs.count()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["mean_surprisal"])
    assert set(by_bucket) == {1, 2, 3}
    sizes = sorted(len(v) for v in by_bucket.values())
    assert sizes[-1] - sizes[0] <= 1  # even split up to rounding
    assert max(by_bucket[1]) <= min(by_bucket[2]) or abs(
        max(by_bucket[1]) - min(by_bucket[2])
    ) < 1e-12
    assert max(by_bucket[2]) <= min(by_bucket[3]) or abs(
        max(by_bucket[2]) - min(by_bucket[3])
    ) < 1e-12
    labels = {r["bucket"]: r["label"] for r in out}
    assert labels == {1: "head", 2: "middle", 3: "tail"}


def test_ccnet_twopass_matches_exact_rank(spark):
    """The r9 two-pass serving form (histogram → boundary refine →
    scan-side compare) is bit-identical to the one-window exact-rank
    form — same buckets for every doc, including boundary ties."""
    from hermod_spark.data import table
    from hermod_spark.operators.textops import ccnet_buckets, ccnet_buckets_exact

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(map(tuple, ccnet_buckets(docs, vocab_size=50).collect()))
    b = sorted(map(tuple, ccnet_buckets_exact(docs, vocab_size=50).collect()))
    assert a == b


def test_ccnet_twopass_tiny_n(spark):
    """n < 3 edge: with one doc the single row is 'tail' (rank 1 of 1
    → ceil(3·1/1)=3); with two docs they land middle/tail — matching
    the exact-rank rule when the head boundary rank floor(n/3) is 0."""
    from hermod_spark.operators.textops import ccnet_buckets

    one = spark.createDataFrame([(1, "a b c")], "doc_id INT, text STRING")
    assert [r["label"] for r in ccnet_buckets(one, vocab_size=5).collect()] == ["tail"]
    two = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d")], "doc_id INT, text STRING"
    )
    got = {r["doc_id"]: r["label"] for r in ccnet_buckets(two, vocab_size=5).collect()}
    assert set(got.values()) == {"middle", "tail"}


# --- bm25_topk (r11) -------------------------------------------------

class TestBM25:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "spark spark spark join"),
                (2, "spark join hash join"),
                (3, "hash table scan"),
                (4, "unrelated words only here"),
                (5, ""),
            ],
            "doc_id LONG, text STRING",
        )

    def test_scores_and_ranks(self, spark):
        import math

        got = textops.bm25_topk(
            self._docs(spark), [(1, "spark join")], k=10
        ).collect()
        rows = {r["doc_id"]: r for r in got}
        # docs 3/4/5 share no query term -> absent
        assert set(rows) == {1, 2}
        # hand-computed: N=5, avgdl=(4+4+3+4+0)/5=3.0
        def bm25(tf, dl, df, N=5, avgdl=3.0, k1=1.2, b=0.75):
            idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
            return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

        exp1 = round(bm25(3, 4, 2) + bm25(1, 4, 2), 6)  # spark×3, join×1
        exp2 = round(bm25(1, 4, 2) + bm25(2, 4, 2), 6)
        assert rows[1]["score"] == pytest.approx(exp1, abs=1e-6)
        assert rows[2]["score"] == pytest.approx(exp2, abs=1e-6)
        assert rows[1]["rank"] == 1 and rows[2]["rank"] == 2

    def test_no_term_no_row(self, spark):
        got = textops.bm25_topk(self._docs(spark), [(7, "zzz")], k=3).collect()
        assert got == []

    def test_k_bounds_and_tiebreak(self, spark):
        docs = spark.createDataFrame(
            [(i, "tie tie") for i in range(1, 6)], "doc_id LONG, text STRING"
        )
        got = textops.bm25_topk(docs, [(1, "tie")], k=3).collect()
        assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == [1, 2, 3]

    def test_rejects_empty_queries(self, spark):
        with pytest.raises(ValueError, match="non-empty"):
            textops.bm25_topk(self._docs(spark), [])


def test_tokens_strip_any_whitespace(spark):
    """trim() strips only ASCII spaces — tabs/newlines used to leave
    empty edge tokens, inflating token counts and changing
    fingerprints on any text that ends in a newline."""
    df = spark.createDataFrame(
        [(1, "hello\n"), (2, "\tworld"), (3, "\t\n "), (4, "a\tb\nc"),
         (5, None)],
        "i INT, t STRING",
    )
    got = {r["i"]: r["n"] for r in df.select("i", X.token_count("t").alias("n")).collect()}
    assert got == {1: 1, 2: 1, 3: 0, 4: 3, 5: None}
    fp = df.select("i", X.fingerprint("t").alias("f")).collect()
    fps = {r["i"]: r["f"] for r in fp}
    base = spark.createDataFrame([(0, "hello")], "i INT, t STRING")
    clean = base.select(X.fingerprint("t").alias("f")).collect()[0]["f"]
    assert fps[1] == clean  # trailing newline no longer changes the fp


def test_char_entropy_null_propagates(spark):
    """NULL text is unscored (NULL), not 0.0 — 0.0 would classify null
    documents as repeated-char spam; empty text is genuinely 0."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "aaaa")], "i INT, t STRING"
    )
    got = {
        r["i"]: r["e"]
        for r in df.select("i", X.char_entropy("t").alias("e")).collect()
    }
    assert got[1] is None and got[2] == 0.0 and got[3] == 0.0
