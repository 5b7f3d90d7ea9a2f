"""Persisted LSH corpus index: build once, serve snapshots.

The 100 TB workload this exists for: a re-crawl pipeline must near-dup
each incoming snapshot against the EXISTING corpus without re-banding
100 TB per snapshot. The index persists band buckets (+ build-time
bucket sizes for serve-side pushdown caps) and signatures; serving
minhashes only the snapshot.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hermod_spark.operators import dedup
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="module")
def built(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dedup-idx") / "index")
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    dedup.save_dedup_index(corpus, path)
    return path, corpus


def test_round_trip_meta(spark, built, docs):
    path, corpus = built
    idx = dedup.load_dedup_index(spark, path)
    assert idx["meta"]["num_hashes"] == 16
    assert idx["meta"]["bands"] == 4
    assert idx["meta"]["w"] == 3
    assert idx["meta"]["n_docs"] == corpus.count()
    # one row per (doc, band); one signature per doc
    assert idx["bands"].count() == idx["meta"]["n_docs"] * 4
    assert idx["sigs"].count() == idx["meta"]["n_docs"]


def test_partial_index_refused(spark, built, tmp_path):
    # a crashed build writes components but no meta — must not serve
    with pytest.raises(ValueError, match="no readable meta"):
        dedup.load_dedup_index(spark, str(tmp_path / "nothing-here"))


def test_bad_config_refused(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="multiple of bands"):
        dedup.save_dedup_index(docs, str(tmp_path / "x"), num_hashes=16, bands=5)


def test_parity_with_direct_banding(spark, built, docs):
    """Index-served candidates == the direct two-sided banding join,
    and est_jaccard == the per-component signature match fraction —
    the persisted artifact must change WHERE the corpus pass runs,
    never WHAT it computes."""
    path, corpus = built
    new = docs.filter(F.col("doc_id") % 10 == 7)
    idx = dedup.load_dedup_index(spark, path)
    got = {
        (r["new_id"], r["corpus_id"], r["n_match"])
        for r in dedup.incremental_near_dups(new, idx, threshold=0.0).collect()
    }

    nb = dedup.minhash_bands(new).withColumnRenamed("_id", "new_id")
    cb = dedup.minhash_bands(corpus).withColumnRenamed("_id", "corpus_id")
    cand = {
        (r["new_id"], r["corpus_id"])
        for r in nb.join(cb, ["band_id", "band_key"])
        .select("new_id", "corpus_id")
        .distinct()
        .collect()
    }
    assert {(a, b) for a, b, _ in got} == cand
    assert len(cand) > 0

    sig_new = {
        r["_id"]: r["sig"]
        for r in new.select(
            F.col("doc_id").alias("_id"),
            dedup.minhash_signature("text").alias("sig"),
        ).collect()
    }
    sig_corp = {
        r["corpus_id"]: r["sig"]
        for r in idx["sigs"].collect()
    }
    for a, b, nm in got:
        expect = sum(x == y for x, y in zip(sig_new[a], sig_corp[b]))
        assert nm == expect


def test_threshold_filters(spark, built, docs):
    path, _ = built
    new = docs.filter(F.col("doc_id") % 10 == 7)
    idx = dedup.load_dedup_index(spark, path)
    all_rows = dedup.incremental_near_dups(new, idx, threshold=0.0).collect()
    half = dedup.incremental_near_dups(new, idx, threshold=0.5).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in half} == {
        (r["new_id"], r["corpus_id"]) for r in all_rows if r["n_match"] >= 8
    }
    assert all(r["est_jaccard"] >= 0.5 for r in half)


def test_against_corpus_anti_form(spark, built, docs):
    path, _ = built
    new = docs.filter(F.col("doc_id") % 10 == 7)
    idx = dedup.load_dedup_index(spark, path)
    matched = {
        r["new_id"]
        for r in dedup.incremental_near_dups(new, idx, threshold=0.5).collect()
    }
    survivors = {
        r["doc_id"]
        for r in dedup.dedup_against_corpus(new, idx, threshold=0.5).collect()
    }
    all_new = {r["doc_id"] for r in new.collect()}
    assert survivors == all_new - matched
    assert matched, "fixture must exercise a non-empty match set"


def test_max_bucket_cap_is_pushed_and_applied(spark, docs, tmp_path):
    """A viral boilerplate bucket in the corpus must be excludable at
    serve time via the BUILD-time n_bucket column — and the cap must
    reach the parquet scan as a pushed filter, not a post-join one."""
    boiler = "the same viral boilerplate text repeated everywhere verbatim"
    corpus = docs.filter(F.col("doc_id") % 10 != 7).withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0, F.lit(boiler)).otherwise(F.col("text")),
    )
    path = str(tmp_path / "hotidx")
    dedup.save_dedup_index(corpus, path)
    idx = dedup.load_dedup_index(spark, path)
    # every even corpus doc shares one bucket per band
    flood = idx["bands"].agg(F.max("n_bucket")).first()[0]
    assert flood > 64

    new = docs.filter(F.col("doc_id") % 10 == 7).withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.lit(boiler)).otherwise(F.col("text")),
    )
    capped = dedup.incremental_near_dups(new, idx, threshold=0.5, max_bucket=64)
    uncapped = dedup.incremental_near_dups(new, idx, threshold=0.5)
    got_capped = {(r["new_id"], r["corpus_id"]) for r in capped.collect()}
    got_all = {(r["new_id"], r["corpus_id"]) for r in uncapped.collect()}
    # the boilerplate snapshot doc floods against every even corpus doc
    # without the cap, and against nothing with it
    assert all(a != 7 for a, _ in got_capped)
    assert sum(a == 7 for a, _ in got_all) == corpus.filter(
        F.col("doc_id") % 2 == 0
    ).count()
    assert got_capped <= got_all

    plan = capped._jdf.queryExecution().executedPlan().toString()
    import re

    scan_lines = [
        ln for ln in plan.split("\n") if "FileScan" in ln and "n_bucket" in ln
    ]
    assert scan_lines, plan
    # the cap reaches the bands scan as a data filter (toString
    # truncates the PushedFilters list, so assert on DataFilters)
    assert re.search(r"DataFilters: \[[^]]*\(n_bucket#\d+L <= 64\)", scan_lines[0]), (
        scan_lines[0][:600]
    )


def test_empty_snapshot(spark, built, docs):
    path, _ = built
    idx = dedup.load_dedup_index(spark, path)
    empty = docs.filter(F.lit(False))
    out = dedup.incremental_near_dups(empty, idx)
    assert out.count() == 0
    assert out.columns == ["new_id", "corpus_id", "n_match", "est_jaccard"]


def test_extend_equals_direct_build(spark, docs, tmp_path):
    """save(A) + extend(B) must serve EXACTLY like save(A∪B): same
    meta, same matches — the maintenance path may change where the
    corpus pass ran, never what the index answers."""
    rem = F.col("doc_id") % 10
    a = docs.filter((rem != 7) & (rem != 3))
    b = docs.filter(rem == 3)
    c = docs.filter(rem == 7)
    p_ext = str(tmp_path / "ext")
    p_dir = str(tmp_path / "direct")
    dedup.save_dedup_index(a, p_ext)
    added = dedup.extend_dedup_index(b, p_ext)
    assert added == b.count()
    dedup.save_dedup_index(docs.filter(rem != 7), p_dir)
    i_ext = dedup.load_dedup_index(spark, p_ext)
    i_dir = dedup.load_dedup_index(spark, p_dir)
    assert i_ext["meta"] == i_dir["meta"]
    got = {
        tuple(r)
        for r in dedup.incremental_near_dups(c, i_ext, threshold=0.5).collect()
    }
    want = {
        tuple(r)
        for r in dedup.incremental_near_dups(c, i_dir, threshold=0.5).collect()
    }
    assert got == want and got


def test_extend_is_idempotent_and_sweeps_orphans(spark, docs, tmp_path):
    import os

    rem = F.col("doc_id") % 10
    p = str(tmp_path / "idx")
    dedup.save_dedup_index(docs.filter((rem != 7) & (rem != 3)), p)
    # a crashed prior extend leaves staging/aside orphans next to the
    # index — the next extend must sweep STALE ones (>1h old) but
    # must NOT touch a fresh one (it could be a live concurrent
    # extend's staging directory)
    stale = tmp_path / ".extend-idx-99999"
    stale.mkdir()
    (stale / "junk").write_text("x")
    os.utime(stale, (1_000_000, 1_000_000))
    fresh = tmp_path / ".extend-idx-88888"
    fresh.mkdir()
    n1 = dedup.extend_dedup_index(docs.filter(rem == 3), p)
    assert n1 > 0
    assert not stale.exists()
    assert fresh.exists()
    # already-admitted ids are skipped: re-running a duplicated extend
    # cannot double-insert signatures or bands
    assert dedup.extend_dedup_index(docs.filter(rem == 3), p) == 0
    idx = dedup.load_dedup_index(spark, p)
    assert idx["sigs"].count() == idx["meta"]["n_docs"]
    assert idx["bands"].count() == idx["meta"]["n_docs"] * idx["meta"]["bands"]


def test_extend_recomputes_bucket_sizes_globally(spark, docs, tmp_path):
    """A bucket that becomes viral only AFTER an extend must be
    cap-excludable: n_bucket is recomputed over the merged bands, not
    frozen at each row's write time."""
    boiler = "the same viral boilerplate text repeated everywhere verbatim"
    rem = F.col("doc_id") % 10
    p = str(tmp_path / "idx")
    base = docs.filter((rem != 7) & (rem != 3))
    dedup.save_dedup_index(base, p)
    before = dedup.load_dedup_index(spark, p)
    flood_free_max = before["bands"].agg(F.max("n_bucket")).first()[0]
    dedup.extend_dedup_index(
        docs.filter(rem == 3).withColumn("text", F.lit(boiler)), p
    )
    after = dedup.load_dedup_index(spark, p)
    flooded_max = after["bands"].agg(F.max("n_bucket")).first()[0]
    assert flooded_max >= docs.filter(rem == 3).count() > flood_free_max


def test_scan_serve_matches_agg_serve(spark, built, docs):
    path, _ = built
    new = docs.filter(F.col("doc_id") % 10 == 7)
    idx = dedup.load_dedup_index(spark, path)
    agg = {
        tuple(r)
        for r in dedup.incremental_near_dups(new, idx, threshold=0.0).collect()
    }
    scan = {
        tuple(r)
        for r in dedup.incremental_near_dups_scan(
            new, idx, threshold=0.0
        ).collect()
    }
    assert scan == agg and scan


def test_scan_serve_runs_on_a_stream(spark, built, docs, tmp_path):
    """The scan-side serve must run as a readStream plan (stream-static
    band + signature joins, dropDuplicates pair dedup) and emit the
    batch result exactly."""
    import uuid

    path, _ = built
    idx = dedup.load_dedup_index(spark, path)
    new = docs.filter(F.col("doc_id") % 10 == 7)
    src = str(tmp_path / "snap")
    new.write.parquet(src)
    stream = spark.readStream.schema(new.schema).parquet(src)
    out = dedup.incremental_near_dups_scan(stream, idx, threshold=0.5)
    assert out.isStreaming
    sink = f"incdedup_{uuid.uuid4().hex[:8]}"
    query = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        got = {
            tuple(r) for r in spark.sql(f"SELECT * FROM {sink}").collect()
        }
    finally:
        query.stop()
    want = {
        tuple(r)
        for r in dedup.incremental_near_dups_scan(
            new, idx, threshold=0.5
        ).collect()
    }
    assert got == want and got


def test_continuous_corpus_build_foreachbatch(spark, docs, tmp_path):
    """The full lifecycle under streaming: each micro-batch of an
    incoming snapshot is served against the CURRENT index, its
    survivors are written to the corpus sink and admitted via
    extend_dedup_index, so later micro-batches dedup against earlier
    ones. End state must equal the sequential batch run of the same
    chunks — the composition proof for serve → filter → admit."""
    import os

    rem = F.col("doc_id") % 10
    seed = docs.filter((rem != 7) & (rem != 3))
    incoming = docs.filter((rem == 7) | (rem == 3))

    # make the cross-batch dedup observable: chunk 2 re-delivers a
    # DETERMINISTIC chunk-1 doc verbatim under a fresh id (collected
    # once by smallest id — a bare limit(1) is unstable across
    # evaluations and could pick different rows at write vs assert)
    orig = incoming.filter(rem == 7).orderBy("doc_id").first()
    redelivered = spark.createDataFrame(
        [tuple(999_999 if c == "doc_id" else orig[c] for c in docs.columns)],
        docs.schema,
    )
    incoming = incoming.unionByName(redelivered)

    p_idx = str(tmp_path / "idx")
    dedup.save_dedup_index(seed, p_idx)
    sink = str(tmp_path / "accepted")
    os.makedirs(sink)

    # two file-source micro-batches (maxFilesPerTrigger=1): the file
    # source triggers per FILE, so flatten each chunk's parquet part
    # into one ordered file under a single source directory
    src = str(tmp_path / "snap")
    incoming.filter(rem == 7).coalesce(1).write.parquet(src + "/part1")
    incoming.filter((rem == 3) | (F.col("doc_id") == 999_999)).coalesce(
        1
    ).write.parquet(src + "/part2")
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n = 0
    for sub in ["part1", "part2"]:
        for f in os.listdir(f"{src}/{sub}"):
            if f.endswith(".parquet"):
                dst = f"{flat}/{n:03d}.parquet"
                shutil.copy(f"{src}/{sub}/{f}", dst)
                # the file source orders micro-batches by modification
                # time; same-second copies tie and can invert the
                # chunks — pin strictly increasing mtimes
                os.utime(dst, (1_700_000_000 + n, 1_700_000_000 + n))
                n += 1
    assert n >= 2

    def admit(batch_df, batch_id):
        idx = dedup.load_dedup_index(batch_df.sparkSession, p_idx)
        survivors = dedup.dedup_against_corpus(
            batch_df, idx, threshold=0.5
        ).localCheckpoint()
        survivors.write.mode("append").parquet(sink)
        dedup.extend_dedup_index(survivors, p_idx)

    stream = spark.readStream.schema(incoming.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(flat)
    q = (
        stream.writeStream.foreachBatch(admit)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain in 120s"

    accepted = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    final = dedup.load_dedup_index(spark, p_idx)
    assert final["meta"]["n_docs"] == seed.count() + len(accepted)

    # sequential batch replay over the same chunk order
    p_ref = str(tmp_path / "ref")
    dedup.save_dedup_index(seed, p_ref)
    want = set()
    chunks = sorted(os.listdir(flat))
    for c in chunks:
        chunk = spark.read.parquet(f"{flat}/{c}")
        idx = dedup.load_dedup_index(spark, p_ref)
        surv = dedup.dedup_against_corpus(chunk, idx, threshold=0.5).localCheckpoint()
        want |= {r["doc_id"] for r in surv.collect()}
        dedup.extend_dedup_index(surv, p_ref)
    assert accepted == want
    # the cross-batch dedup actually fired: if the original survived
    # chunk 1 (i.e. was admitted), its verbatim re-delivery in chunk 2
    # must have been rejected against the EXTENDED index
    if orig["doc_id"] in accepted:
        assert 999_999 not in accepted
