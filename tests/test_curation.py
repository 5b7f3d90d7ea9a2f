"""Training-data curation: split, cleaning, chunking, contamination,
group centroids."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hermod_spark.operators import curation as CUR


def test_split_assign_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id INT")
    a = {r["doc_id"]: r["split"] for r in CUR.split_assign(df).collect()}
    b = {r["doc_id"]: r["split"] for r in CUR.split_assign(df).collect()}
    assert a == b  # pure function of the key
    counts = {s: list(a.values()).count(s) for s in ("train", "val", "test")}
    assert sum(counts.values()) == 500
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # roughly the 80/10/10 weights
    assert 0.7 < counts["train"] / 500 < 0.9


def test_split_assign_custom_weights(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id INT")
    out = CUR.split_assign(df, weights={"a": 0.5, "b": 0.5})
    assert set(r["split"] for r in out.collect()) == {"a", "b"}


def test_clean_text(spark):
    df = spark.createDataFrame([("  Héllo,   WORLD!! @#$ 123  ",)], "text STRING")
    got = df.select(CUR.clean_text("text").alias("c")).first()["c"]
    assert got == "h llo, world!! 123"


def test_chunk_documents_windows(spark):
    text = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame([(1, text)], "doc_id INT, text STRING")
    rows = CUR.chunk_documents(df, chunk_tokens=5, overlap=2).collect()
    # stride 3: starts 0,3,6 -> ceil((12-5)/3)+1 = 4 chunks (0,3,6,9)
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3 w4"
    assert rows[1]["chunk_text"] == "w3 w4 w5 w6 w7"
    assert rows[3]["chunk_text"] == "w9 w10 w11"
    assert rows[3]["chunk_len"] == 3  # final partial kept


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id INT, text STRING")
    rows = CUR.chunk_documents(df, chunk_tokens=100, overlap=10).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "a b c"


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id INT, text STRING")
    with pytest.raises(ValueError):
        CUR.chunk_documents(df, chunk_tokens=10, overlap=10)


def test_chunk_documents_invariants(spark):
    """For a spread of doc lengths: every token appears in some chunk,
    consecutive chunks overlap by exactly `overlap` (except the final
    partial), and reassembling chunk starts reproduces the stride."""
    chunk_tokens, overlap = 7, 3
    stride = chunk_tokens - overlap
    lengths = [1, 6, 7, 8, 13, 20, 29]
    rows = [(n, " ".join(f"t{n}_{i}" for i in range(n))) for n in lengths]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {}
    for r in CUR.chunk_documents(df, chunk_tokens, overlap).collect():
        out.setdefault(r["doc_id"], []).append(r)
    for n in lengths:
        chunks = sorted(out[n], key=lambda r: r["chunk_id"])
        toks = [t for c in chunks for t in c["chunk_text"].split()]
        assert set(toks) == {f"t{n}_{i}" for i in range(n)}  # full coverage
        for j, c in enumerate(chunks):
            assert c["chunk_len"] == len(c["chunk_text"].split())
            first = int(c["chunk_text"].split()[0].split("_")[1])
            assert first == j * stride  # stride respected
        assert chunks[-1]["chunk_len"] <= chunk_tokens


def test_contamination_check(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "completely unrelated words here"),
        ],
        "doc_id INT, text STRING",
    )
    hits = [r["doc_id"] for r in CUR.contamination_check(df, ["quick brown fox"]).collect()]
    assert hits == [1]
    # no-shuffle plan: probes are literals, membership is arrays_overlap
    plan = (
        CUR.contamination_check(df, ["quick brown fox"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_group_centroids(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (0, [3.0, 2.0]),
            (1, [10.0, 10.0]),
        ],
        "g INT, embedding ARRAY<DOUBLE>",
    )
    rows = {
        r["grp"]: r["centroid"]
        for r in CUR.group_centroids(df, F.col("g")).collect()
    }
    assert rows[0] == [2.0, 1.0]
    assert rows[1] == [10.0, 10.0]


def test_pack_chunks_exclusive_prefix_rule(spark):
    # one shard (n_shards=1): bins follow floor(exclusive_cumsum/budget)
    rows = [(1, 0, 60), (1, 1, 60), (2, 0, 60), (3, 0, 60), (3, 1, 10)]
    df = spark.createDataFrame(rows, "doc_id LONG, chunk_id INT, chunk_len INT")
    out = {
        (r["doc_id"], r["chunk_id"]): (r["shard"], r["bin_id"])
        for r in CUR.pack_chunks(df, budget=100, n_shards=1).collect()
    }
    # cumsums before each chunk: 0, 60, 120, 180, 240 -> bins 0,0,1,1,2
    assert out == {
        (1, 0): (0, 0),
        (1, 1): (0, 0),
        (2, 0): (0, 1),
        (3, 0): (0, 1),
        (3, 1): (0, 2),
    }


def test_pack_chunks_sharding_and_invariants(spark):
    import itertools

    rows = [
        (d, c, 25 + (d * 7 + c * 3) % 40)
        for d in range(20)
        for c in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, chunk_id INT, chunk_len INT")
    got = CUR.pack_chunks(df, budget=120, n_shards=4).collect()
    assert all(r["shard"] == r["doc_id"] % 4 for r in got)
    by_shard = {
        s: sorted(g, key=lambda r: (r["doc_id"], r["chunk_id"]))
        for s, g in itertools.groupby(
            sorted(got, key=lambda r: r["shard"]), key=lambda r: r["shard"]
        )
    }
    for s, chunk_rows in by_shard.items():
        cum = 0
        for r in chunk_rows:
            assert r["bin_id"] == cum // 120  # exclusive-prefix rule
            cum += r["chunk_len"]
        bins = [r["bin_id"] for r in chunk_rows]
        assert bins == sorted(bins)  # bins are monotone within a shard


def test_sample_mixture_deterministic_rates(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    kept1 = sorted(r["doc_id"] for r in CUR.sample_mixture(df, {"a": 0.3}).collect())
    kept2 = sorted(r["doc_id"] for r in CUR.sample_mixture(df, {"a": 0.3}).collect())
    assert kept1 == kept2  # pure function of the key
    by_src = {
        s: sum(1 for r in kept1 if (r % 2 == 0) == (s == "a")) for s in ("a", "b")
    }
    assert by_src["b"] == 500  # unlisted source keeps everything
    assert 0.2 < by_src["a"] / 500 < 0.4  # listed source near its rate

    # subset property: a lower rate keeps a subset of a higher rate
    lo = {r["doc_id"] for r in CUR.sample_mixture(df, {"a": 0.1}).collect()}
    hi = {r["doc_id"] for r in CUR.sample_mixture(df, {"a": 0.5}).collect()}
    assert lo <= hi


def test_stratified_sample_exact_matches_full_sort(spark):
    """The two-pass hash-threshold sample must equal the k smallest
    hashes per stratum computed by a full per-stratum sort."""
    from pyspark.sql import Window
    from hermod_spark.operators.sketches import uniform_hash

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    got = sorted(
        (r["source"], r["rn"], r["doc_id"])
        for r in CUR.stratified_sample_exact(df, k=7).collect()
    )
    w = Window.partitionBy("source").orderBy(
        uniform_hash("doc_id").asc(), F.col("doc_id").asc()
    )
    want = sorted(
        (r["source"], r["rn"], r["doc_id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 7)
        .collect()
    )
    assert got == want
    # exactly k per stratum
    per = {}
    for s, _, _ in got:
        per[s] = per.get(s, 0) + 1
    assert per == {"s0": 7, "s1": 7, "s2": 7}


def test_stratified_sample_fallback_restores_exactness(spark):
    """ADVICE r3: the hash-threshold filter is only probabilistically a
    superset of the answer. With a deliberately starved oversample the
    filter WILL drop answer rows; verify_counts must detect the short
    strata and fall back to their full ranking, matching the full-sort
    truth unconditionally."""
    from pyspark.sql import Window
    from hermod_spark.operators.sketches import uniform_hash

    rows = [(i, f"s{i % 2}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    # oversample=0.2 keeps ~0.2·k rows/stratum — guaranteed short
    got = sorted(
        (r["source"], r["rn"], r["doc_id"])
        for r in CUR.stratified_sample_exact(
            df, k=20, oversample=0.2, verify_counts=True
        ).collect()
    )
    w = Window.partitionBy("source").orderBy(
        uniform_hash("doc_id").asc(), F.col("doc_id").asc()
    )
    want = sorted(
        (r["source"], r["rn"], r["doc_id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .collect()
    )
    assert got == want
    # sanity: without the verify pass the starved filter really does
    # lose rows (otherwise this test proves nothing)
    unchecked = CUR.stratified_sample_exact(
        df, k=20, oversample=0.2, verify_counts=False
    ).count()
    assert unchecked < 40


def test_stratified_sample_small_stratum_keeps_all(spark):
    """A stratum with fewer than k rows returns every row (rate clamps
    to 1.0)."""
    df = spark.createDataFrame(
        [(i, "big") for i in range(100)] + [(1000 + i, "tiny") for i in range(3)],
        "doc_id LONG, source STRING",
    )
    out = CUR.stratified_sample_exact(df, k=10).collect()
    tiny = [r for r in out if r["source"] == "tiny"]
    assert len(tiny) == 3
    assert len([r for r in out if r["source"] == "big"]) == 10


def test_length_percentile_filter(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(
            [1] + [10] * 38 + [500]  # one short outlier, one long outlier
        )],
        "doc_id LONG, text STRING",
    )
    # ceil(0.05*40)=2nd smallest → p5=10; ceil(0.95*40)=38th → p95=10
    rows = CUR.length_percentile_filter(docs, lo=0.05, hi=0.95).collect()
    kept = {r["doc_id"] for r in rows}
    assert 0 not in kept and 39 not in kept  # both tails dropped
    assert len(kept) == 38
    assert all(r["n_tokens"] == 10 for r in rows)


def test_stratified_sample_null_stratum_not_full_sorted(spark):
    """A NULL stratum gets its own threshold (eqNullSafe) — not the
    fall-through 1.0 that would full-sort it — and still returns
    exactly k rows."""
    df = spark.createDataFrame(
        [(i, None if i < 200 else "s") for i in range(300)],
        "doc_id LONG, source STRING",
    )
    out = CUR.stratified_sample_exact(df, k=5)
    rows = out.collect()
    per = {}
    for r in rows:
        per[r["source"]] = per.get(r["source"], 0) + 1
    assert per == {None: 5, "s": 5}
    # and the survivor filter really dropped most of the NULL stratum
    # before the window (threshold 8*5/200 = 0.2, not 1.0)
    from hermod_spark.operators.sketches import uniform_hash

    survivors = df.filter(
        uniform_hash("doc_id")
        < F.when(F.col("source").isNull(), F.lit(8 * 5 / 200)).otherwise(F.lit(8 * 5 / 100))
    ).count()
    assert survivors < 100


def test_token_budget_by_split(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10)) for i in range(100)],
        "doc_id LONG, text STRING",
    )
    rows = {r["split"]: r for r in CUR.token_budget_by_split(docs).collect()}
    assert set(rows) == {"train", "val", "test"}
    assert sum(r["n_docs"] for r in rows.values()) == 100
    assert sum(r["total_tokens"] for r in rows.values()) == 1000
    assert rows["train"]["n_docs"] > rows["val"]["n_docs"]  # 0.8 vs 0.1


def test_boilerplate_ngrams_counts_distinct_docs(spark):
    from hermod_spark.operators import curation as CUR

    df = spark.createDataFrame(
        [
            (1, "all rights reserved on this page"),
            (2, "all rights reserved again here today"),
            (3, "all rights reserved all rights reserved"),  # twice in ONE doc
            (4, "completely different words entirely now"),
        ],
        "doc_id INT, text STRING",
    )
    got = {
        r["ngram"]: r["n_docs"]
        for r in CUR.boilerplate_ngrams(df, n=3, min_docs=3).collect()
    }
    # doc 3's repeat counts once: document frequency, not occurrences
    assert got == {"all rights reserved": 3}


def test_boilerplate_fraction(spark):
    from hermod_spark.operators import curation as CUR

    df = spark.createDataFrame(
        [
            (1, "all rights reserved on this page"),   # 4 3-grams, 1 bp
            (2, "all rights reserved again here"),     # 3 3-grams, 1 bp
            (3, "all rights reserved more text"),      # 3 3-grams, 1 bp
            (4, "no shared phrases in here"),          # 3 3-grams, 0 bp
            (5, "ab"),                                 # 0 3-grams
        ],
        "doc_id INT, text STRING",
    )
    rows = {
        r["doc_id"]: r
        for r in CUR.boilerplate_fraction(df, n=3, min_docs=3).collect()
    }
    assert rows[1]["n_ngrams"] == 4 and rows[1]["n_boilerplate"] == 1
    assert abs(rows[1]["boilerplate_frac"] - 0.25) < 1e-9
    assert rows[4]["n_boilerplate"] == 0 and rows[4]["boilerplate_frac"] == 0.0
    assert rows[5]["n_ngrams"] == 0 and rows[5]["boilerplate_frac"] == 0.0


def test_gopher_flags(spark):
    from hermod_spark.operators import curation as CUR

    # stopword-rich AND mean word length in [3,10] (pure stopword runs
    # average under 3 chars and would trip flag_mean_len)
    long_good = "think about these words that with from have been good " * 6
    df = spark.createDataFrame(
        [
            (1, long_good),                      # enough words + stopwords
            (2, "tiny doc"),                     # too short
            (3, "zz " * 60),                     # no stopwords
            (4, ("supercalifragilistic " * 60)), # mean word len too high
        ],
        "doc_id INT, text STRING",
    )
    rows = {
        r["doc_id"]: r for r in CUR.gopher_flags(df, min_words=50).collect()
    }
    assert rows[1]["keep"] is True
    assert rows[2]["flag_word_count"] is False and rows[2]["keep"] is False
    assert rows[3]["flag_stopwords"] is False and rows[3]["keep"] is False
    assert rows[4]["flag_mean_len"] is False and rows[4]["keep"] is False
    assert rows[2]["n_words"] == 2


def test_quality_logistic_orders_docs_sensibly(spark):
    # stopword-rich prose scores above symbol soup; logit sign drives keep
    good = "think about these words that with from have been good " * 6
    bad = "@#$% ^&*( )!~` " * 40
    digits = "12345 67890 " * 40
    df = spark.createDataFrame(
        [(1, good), (2, bad), (3, digits)], "doc_id INT, text STRING"
    )
    rows = {r["doc_id"]: r for r in CUR.quality_logistic(df).collect()}
    assert rows[1]["quality_logit"] > rows[2]["quality_logit"]
    assert rows[1]["quality_logit"] > rows[3]["quality_logit"]
    assert rows[1]["keep"] is True and rows[2]["keep"] is False
    # with_score adds a sigmoid column, monotone in the logit
    scored = {r["doc_id"]: r for r in CUR.quality_logistic(df, with_score=True).collect()}
    assert 0.0 <= scored[2]["score"] < scored[1]["score"] <= 1.0


def test_shard_shuffle_is_deterministic_partition_of_corpus(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id INT")
    a = CUR.shard_shuffle(df, n_shards=4).collect()
    b = CUR.shard_shuffle(df.repartition(7), n_shards=4).collect()
    # same (shard, pos) addresses regardless of input partitioning
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    shards = {}
    for r in a:
        shards.setdefault(r["shard"], []).append(r["pos"])
    assert set(shards) <= set(range(4))
    # positions within each shard are exactly 1..n_shard (a permutation)
    for s, ps in shards.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # a different seed produces a different order
    c = CUR.shard_shuffle(df, n_shards=4, seed="s1").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_source_report_rolls_up_health_metrics(spark):
    good = "think about these words that with from have been good " * 6
    df = spark.createDataFrame(
        [
            (1, "a", good),
            (2, "a", good),            # exact dup of 1
            (3, "a", "@#$ junk " * 30),  # fails quality
            (4, "b", good + " unique tail"),
        ],
        "doc_id INT, source STRING, text STRING",
    )
    rows = {r["source"]: r for r in CUR.source_report(df).collect()}
    a, b = rows["a"], rows["b"]
    assert a["n_docs"] == 3 and b["n_docs"] == 1
    assert a["exact_dup_frac"] == round(2 / 3, 6)  # docs 1+2 share text
    assert b["exact_dup_frac"] == 0.0
    assert a["quality_keep_frac"] == round(2 / 3, 6)  # doc 3 fails
    assert b["quality_keep_frac"] == 1.0
    assert a["total_tokens"] > 0 and a["avg_doc_tokens"] > 0


def test_write_training_shards_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id INT, text STRING"
    )
    path = str(tmp_path / "shards")
    manifest = CUR.write_training_shards(df, path, n_shards=4)
    assert sum(manifest.values()) == 100
    assert set(manifest) <= set(range(4))
    back = spark.read.parquet(path)
    assert back.count() == 100
    # within a shard, file order == pos order (sequential-consume contract)
    one = back.filter(F.col("shard") == list(manifest)[0]).collect()
    poses = [r["pos"] for r in one]
    assert poses == sorted(poses)
    # determinism: rewriting yields the same shard sizes
    manifest2 = CUR.write_training_shards(df, str(tmp_path / "s2"), n_shards=4)
    assert manifest2 == manifest


def test_mixture_plan_budget_and_rates(spark):
    df = spark.createDataFrame(
        [
            (1, "a", "one two three four"),        # 4 tokens
            (2, "a", "five six"),                  # 2 tokens
            (3, "b", "seven eight nine ten"),      # 4 tokens
        ],
        "doc_id INT, source STRING, text STRING",
    )
    rows = {r["source"]: r for r in CUR.mixture_plan(df, budget_tokens=4).collect()}
    # uniform split: 2 tokens budget per source
    assert rows["a"]["available_tokens"] == 6
    assert rows["a"]["budget_tokens"] == 2.0
    assert rows["a"]["sample_rate"] == round(2 / 6, 6)
    assert rows["b"]["sample_rate"] == 0.5
    # explicit weights: all budget to b -> rate capped at 1.0
    w = {r["source"]: r for r in CUR.mixture_plan(df, 8, weights={"b": 1.0}).collect()}
    assert w["b"]["sample_rate"] == 1.0
    assert w["a"]["sample_rate"] == 0.0


def test_split_leakage_detects_cross_split_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again today friends"
    # enough ids that the default hash split puts near-dups in
    # different splits with near-certainty
    rows = [(i, base + f" tail{i % 2}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = CUR.split_leakage(df).collect()
    total_pairs = sum(r["n_pairs"] for r in out)
    assert total_pairs > 0
    for r in out:
        assert r["is_leak"] == (r["split_a"] != r["split_b"])
        assert r["split_a"] <= r["split_b"]  # canonical pair order
    # with 60 near-dup docs split 80/10/10, SOME pair must straddle
    assert any(r["is_leak"] for r in out)


def test_pack_efficiency_accounts_fill_and_overrun(spark):
    chunks = spark.createDataFrame(
        # exclusive-prefix packing: cum_excl 0,90,180,270 -> bins
        # 0,0,0,1 -> bin0 = 270 (overran by the straddling chunk),
        # bin1 = 90
        [(0, 0, 90), (0, 1, 90), (0, 2, 90), (0, 3, 90)],
        "doc_id INT, chunk_id INT, chunk_len INT",
    )
    packed = CUR.pack_chunks(chunks, budget=200, n_shards=1)
    rows = CUR.pack_efficiency(packed, budget=200).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_bins"] == 2 and r["total_tokens"] == 360
    assert r["avg_fill"] == round(360 / (2 * 200.0), 6)
    assert r["overrun_frac"] == 0.5  # bin 0 exceeded 200, bin 1 did not
    # force an overrun: one chunk longer than the budget
    big = spark.createDataFrame(
        [(0, 0, 150), (0, 1, 150)], "doc_id INT, chunk_id INT, chunk_len INT"
    )
    r2 = CUR.pack_efficiency(CUR.pack_chunks(big, budget=200, n_shards=1), 200).first()
    # chunk 1 straddles into bin 0 (cum_excl 150 < 200): bin0 = 300 > 200
    assert r2["overrun_frac"] > 0.0


def test_snapshot_diff_by_content_not_id(spark):
    old = spark.createDataFrame(
        [(1, "a", "same text"), (2, "a", "gone text"), (3, "b", "kept")],
        "doc_id INT, source STRING, text STRING",
    )
    new = spark.createDataFrame(
        [
            (10, "a", "same text"),   # new id, same content -> carried
            (11, "a", "brand new"),   # added
            (3, "b", "kept"),          # carried
        ],
        "doc_id INT, source STRING, text STRING",
    )
    rows = {r["source"]: r for r in CUR.snapshot_diff(old, new).collect()}
    assert rows["a"]["carried"] == 1   # content identity, not id
    assert rows["a"]["added"] == 1
    assert rows["a"]["removed"] == 1   # "gone text"
    assert rows["b"]["carried"] == 1 and rows["b"]["added"] == 0


def test_dedup_keep_best_picks_highest_quality_survivor(spark):
    from hermod_spark.operators import curation

    # docs 1-3 share the same distinct word SET (the fingerprint key);
    # doc 2 repeats it, so its token-count quality term is highest.
    # doc 4 is unique.
    base = "the cat sat on a mat with one hat"
    df = spark.createDataFrame(
        [(1, base), (2, " ".join([base] * 4)), (3, base + " cat mat"),
         (4, "totally unrelated text here")],
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r for r in curation.dedup_keep_best(df).collect()}
    assert set(rows) == {2, 4}
    assert rows[2]["n_dups"] == 3
    assert rows[4]["n_dups"] == 1


def test_dedup_keep_best_tiebreaks_on_min_id(spark):
    from hermod_spark.operators import curation

    same = "identical content every time"
    df = spark.createDataFrame(
        [(7, same), (5, same), (9, same)], "doc_id INT, text STRING"
    )
    rows = curation.dedup_keep_best(df).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 5 and rows[0]["n_dups"] == 3


def test_curation_funnel_stage_monotone_and_correct(spark):
    """Each stage count <= the previous; quality drops the junk doc,
    decontamination drops the probe-overlapping doc, dedup collapses
    the exact pair."""
    from hermod_spark.operators.curation import curation_funnel

    good = ("this is a perfectly reasonable document with plenty of the "
            "usual common english words that the classifier likes to see "
            "and it keeps going for a while longer")
    corpus = spark.createDataFrame(
        [
            (100, good + " one", "web"),
            (101, "$$$ ### @@@ !!! %%% ^^^ &&& *** ((( )))", "web"),  # junk
            (102, good + " two " + " ".join(f"p{i}" for i in range(13)), "web"),
            (103, good + " three", "books"),
            (104, good + " three", "books"),  # exact dup of 103
        ],
        "doc_id INT, text STRING, source STRING",
    )
    probes = spark.createDataFrame(
        [(1, " ".join(f"p{i}" for i in range(13)), "bench")],
        "doc_id INT, text STRING, source STRING",
    )
    got = {r["source"]: r for r in
           curation_funnel(corpus, probes, n=13).collect()}
    web, books = got["web"], got["books"]
    assert web["n_raw"] == 3 and web["n_quality"] == 2
    assert web["n_decontaminated"] == 1 and web["n_unique"] == 1
    assert books["n_raw"] == 2 and books["n_quality"] == 2
    assert books["n_decontaminated"] == 2 and books["n_unique"] == 1
    for r in got.values():
        assert (r["n_raw"] >= r["n_quality"] >= r["n_decontaminated"]
                >= r["n_unique"])


def test_nb_distill_scores_and_agreement_audit(spark):
    """Distilled NB must (a) emit a consistent audit surface and (b)
    beat the majority-class baseline at reproducing its own teacher on
    the deterministic sf0.001 corpus — the minimum bar for calling the
    distillation a model rather than a coin flip."""
    from hermod_spark.operators.curation import nb_distill

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = nb_distill(d).collect()
    assert len(rows) == d.count()
    for r in rows:
        assert r["agree"] == (r["predicted_keep"] == r["teacher_keep"])
        assert r["n_tokens"] >= 0
    agreement = sum(r["agree"] for r in rows) / len(rows)
    keep_rate = sum(r["teacher_keep"] for r in rows) / len(rows)
    majority = max(keep_rate, 1 - keep_rate)
    assert agreement > majority, (agreement, majority)


def test_nb_distill_model_surface(spark):
    from hermod_spark.operators.curation import nb_distill

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m = nb_distill(d, vocab_size=50, return_model=True).collect()
    # sf0.001 has fewer than 50 distinct tokens; LIMIT caps, not pads
    assert 0 < len(m) <= 50
    for r in m:
        # smoothed LLR of observed counts is finite
        assert abs(r["llr"]) < 20
        assert r["c1"] + r["c0"] > 0


def test_weighted_sample_deterministic_and_biased(spark):
    """A-Res sample is a pure function of the data (same rows on
    re-run), k caps the size, and heavy-weight docs dominate: with
    120-token docs vs 1-token docs at 10:90 mix, a k=20 draw must pick
    mostly heavy docs (each heavy key ln(u)/120 is ~120x closer to 0)."""
    from hermod_spark.operators.curation import weighted_sample

    rows = [(i, "w " * 120) for i in range(10)]
    rows += [(i, "x") for i in range(10, 100)]
    d = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    a = weighted_sample(d, k=20).collect()
    b = weighted_sample(d, k=20).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 20
    heavy = sum(1 for r in a if r["doc_id"] < 10)
    assert heavy == 10  # all heavy docs make a k=20 sample
    # keys are sorted descending, finite
    keys = [r["key"] for r in a]
    assert keys == sorted(keys, reverse=True)
    assert all(k <= 0 for k in keys)
    # k > n returns everything
    assert weighted_sample(d, k=500).count() == 100


def test_dsir_weights_prefer_target_domain(spark):
    """DSIR log-weights must rank target-like documents above
    non-target ones: with the English docs as target, mean weight of
    English sources exceeds the non-English mean, and every source doc
    gets exactly one row."""
    from hermod_spark.data import table
    from hermod_spark.operators.curation import dsir_weights

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    out = dsir_weights(docs, docs.filter(F.col("lang") == "en"), n_buckets=256)
    joined = out.join(docs.select("doc_id", "lang"), "doc_id")
    rows = joined.groupBy(F.col("lang") == "en").agg(
        F.avg("dsir_logweight").alias("m"), F.count(F.lit(1)).alias("n")
    ).collect()
    means = {r[0]: (r["m"], r["n"]) for r in rows}
    assert means[True][0] > means[False][0]
    assert out.count() == docs.count()  # one weight per source doc
    # weights are finite (smoothing covers empty buckets)
    assert joined.filter(F.isnan("dsir_logweight")).count() == 0


def test_dsir_weights_zero_token_docs_get_rows(spark):
    """ADVICE r8: 'a row for every source doc' includes docs with no
    tokens — they score (n_tokens=0, dsir_logweight=0.0), not vanish."""
    from hermod_spark.operators.curation import dsir_weights

    src = spark.createDataFrame(
        [(1, "hello world data"), (2, ""), (3, "   "), (4, None)],
        "doc_id INT, text STRING",
    )
    tgt = spark.createDataFrame([(9, "hello data")], "doc_id INT, text STRING")
    got = {r["doc_id"]: r for r in dsir_weights(src, tgt, n_buckets=64).collect()}
    assert set(got) == {1, 2, 3, 4}
    for d in (2, 3, 4):
        assert got[d]["n_tokens"] == 0 and got[d]["dsir_logweight"] == 0.0
    assert got[1]["n_tokens"] == 3


def test_epoch_plan_upsampling_math(spark):
    """Data-constrained plan: share 90 tokens vs 40 available → 2 full
    epochs + 0.25 tail; planned = 2*40 + floor(0.25*40) = 90."""
    from hermod_spark.operators.curation import epoch_plan

    docs = spark.createDataFrame(
        [(i, "a b c d", "s0") for i in range(10)]
        + [(100 + i, "a b c d", "s1") for i in range(50)],
        "doc_id LONG, text STRING, source STRING",
    )
    # uniform: 2 sources, budget 180 -> share 90 each; s0 has 40
    # tokens (ratio 2.25), s1 has 200 (ratio 0.45)
    got = {r["source"]: r for r in epoch_plan(docs, budget_tokens=180).collect()}
    s0, s1 = got["s0"], got["s1"]
    assert (s0["available_tokens"], s0["n_epochs"], s0["tail_rate"]) == (40, 2, 0.25)
    assert s0["planned_tokens"] == 90
    assert (s1["n_epochs"], s1["tail_rate"]) == (0, 0.45)


def test_materialize_epochs_repeats_and_tail(spark):
    """Every doc appears exactly n_epochs times plus once more iff its
    salted hash admits it to the tail; repetition factor matches the
    plan in aggregate."""
    from hermod_spark.operators.curation import epoch_plan, materialize_epochs

    docs = spark.createDataFrame(
        [(i, "a b c d", "s0") for i in range(10)]
        + [(100 + i, "a b c d", "s1") for i in range(50)],
        "doc_id LONG, text STRING, source STRING",
    )
    plan = {r["source"]: r for r in epoch_plan(docs, budget_tokens=180).collect()}
    out = materialize_epochs(docs, budget_tokens=180).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault((r["source"], r["doc_id"]), []).append(r["epoch"])
    for (src, _), epochs in per_doc.items():
        n = plan[src]["n_epochs"]
        assert sorted(epochs) in ([list(range(n))] + [list(range(n + 1))])
    # s0 docs appear at least twice (2 full epochs)
    s0_counts = [len(v) for (s, _), v in per_doc.items() if s == "s0"]
    assert s0_counts and min(s0_counts) >= 2
    # determinism
    again = materialize_epochs(docs, budget_tokens=180).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_contamination_probe_validation(spark):
    """Wrong-word-count probes can never match any doc n-gram — they
    must raise, not silently pass the gate; stray whitespace in a
    valid probe is normalized so it still matches."""
    df = spark.createDataFrame(
        [(1, "The quick  Brown fox jumps")], "doc_id LONG, text STRING"
    )
    with pytest.raises(ValueError, match="exactly 3 words"):
        CUR.contamination_check(df, ["the quick brown fox jumps"], n=3)
    # double space + case normalize away; the probe still hits
    got = CUR.contamination_check(df, ["quick  BROWN   fox"], n=3).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_pack_efficiency_custom_len_col(spark):
    """pack_efficiency must honor pack_chunks' len_col parameter."""
    chunks = spark.createDataFrame(
        [(1, 0, "a b", 2), (1, 1, "c d", 2), (2, 0, "e", 1)],
        "doc_id LONG, chunk_id INT, chunk_text STRING, tok_len INT",
    )
    packed = CUR.pack_chunks(
        chunks, budget=3, n_shards=2, len_col="tok_len"
    )
    rep = CUR.pack_efficiency(packed, budget=3, len_col="tok_len").collect()
    assert sum(r["total_tokens"] for r in rep) == 5
