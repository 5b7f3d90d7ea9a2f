"""Structured Streaming: the continuous-aggregate workload runs as a
real stream (file source → watermarked windowed agg → memory sink) and
matches the batch plan on the same data."""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import functions as F

from hermod_spark.sources.messages import message_stream
from hermod_spark.streaming.windows import windowed_agg

UTC = dt.timezone.utc


def _mk_batch(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 10, m, tzinfo=UTC)  # noqa: E731
    rows = [
        (t(0), "a", 1.0),
        (t(30), "a", 3.0),
        (t(59), "b", 10.0),
        (dt.datetime(2024, 1, 1, 11, 5, tzinfo=UTC), "a", 5.0),
    ]
    return spark.createDataFrame(rows, "time TIMESTAMP, topic STRING, value DOUBLE")


def test_windowed_agg_batch(spark):
    out = windowed_agg(_mk_batch(spark), window="1 hour")
    rows = {(r["bucket_start"].hour, r["topic"]): r for r in out.collect()}
    a10 = rows[(10, "a")]
    assert a10["avg_value"] == 2.0 and a10["min_value"] == 1.0
    assert a10["max_value"] == 3.0 and a10["value_count"] == 2
    assert rows[(11, "a")]["avg_value"] == 5.0
    assert rows[(10, "b")]["value_count"] == 1


def test_windowed_agg_stream_matches_batch(spark, tmp_path):
    batch = _mk_batch(spark)
    src = str(tmp_path / "src")
    batch.write.parquet(src)

    stream = message_stream(spark, src, schema=batch.schema)
    assert stream.isStreaming
    out = windowed_agg(stream, window="1 hour", watermark="2 hours")

    sink = f"win_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(f"SELECT * FROM {sink}").collect()
    finally:
        q.stop()

    want = {
        (r["bucket_start"], r["topic"]): (r["avg_value"], r["value_count"])
        for r in windowed_agg(batch, window="1 hour").collect()
    }
    got_map = {
        (r["bucket_start"], r["topic"]): (r["avg_value"], r["value_count"]) for r in got
    }
    assert got_map == want


def test_watermark_drops_too_late_rows(spark, tmp_path):
    """Late-data semantics: with a 1h watermark, an event older than
    (max seen - 1h) arriving in a LATER micro-batch is dropped from
    append-mode output; an in-horizon late event still lands in its
    original bucket. The reference has no late handling at all
    (SURVEY §2.6) — it would mis-bucket by arrival time."""
    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m, tzinfo=UTC)  # noqa: E731
    src = str(tmp_path / "late_src")
    # batch 1: advances the watermark to 12:00 - 1h = 11:00
    spark.createDataFrame(
        [(t(10, 30), "a", 1.0), (t(12, 0), "a", 9.0)],
        "time TIMESTAMP, topic STRING, value DOUBLE",
    ).repartition(1).write.mode("append").parquet(src)

    stream = message_stream(
        spark,
        src,
        schema="time TIMESTAMP, topic STRING, value DOUBLE",
    )
    out = windowed_agg(stream, window="1 hour", watermark="1 hour")
    sink = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one in-horizon late row (11:30 >= watermark 11:00)
        # and one too-late row (9:15 < 11:00)
        spark.createDataFrame(
            [(t(11, 30), "a", 5.0), (t(9, 15), "a", 100.0), (t(14, 0), "a", 2.0)],
            "time TIMESTAMP, topic STRING, value DOUBLE",
        ).repartition(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        # close every window by pushing the watermark far forward
        spark.createDataFrame(
            [(t(20, 0), "a", 0.0)],
            "time TIMESTAMP, topic STRING, value DOUBLE",
        ).repartition(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = {
            r["bucket_start"].hour: r
            for r in spark.sql(f"SELECT * FROM {sink}").collect()
        }
    finally:
        q.stop()

    assert 9 not in rows  # too-late row dropped entirely
    assert rows[11]["value_count"] == 1  # in-horizon late row landed
    assert rows[10]["value_count"] == 1


def test_stream_plan_has_watermark(spark, tmp_path):
    batch = _mk_batch(spark)
    src = str(tmp_path / "src2")
    batch.write.parquet(src)
    stream = message_stream(spark, src, schema=batch.schema)
    out = windowed_agg(stream, window="1 hour", watermark="2 hours")
    assert "EventTimeWatermark" in out._jdf.queryExecution().analyzed().toString()


def _join_fixture(spark):
    t = lambda h, m=0: dt.datetime(2024, 1, 2, h, m, tzinfo=UTC)  # noqa: E731
    readings = spark.createDataFrame(
        [(t(10, 0), "dev1", 20.0), (t(10, 30), "dev2", 30.0), (t(13, 0), "dev1", 25.0)],
        "time TIMESTAMP, device STRING, value DOUBLE",
    )
    alerts = spark.createDataFrame(
        [
            (t(10, 45), "dev1", "hi"),   # joins 10:00 reading (within 1h)
            (t(12, 59), "dev1", "warn"), # joins nothing (>1h after 10:00, before 13:00)
            (t(10, 40), "dev2", "lo"),   # joins 10:30 reading
            (t(9, 0), "dev1", "old"),    # before every reading -> no match
        ],
        "time TIMESTAMP, device STRING, level STRING",
    )
    return readings, alerts


def test_stream_stream_join_batch_semantics(spark):
    from hermod_spark.streaming.windows import stream_stream_join

    readings, alerts = _join_fixture(spark)
    out = stream_stream_join(
        readings, alerts, key="device", within="1 hour"
    ).select(
        F.col("l.device").alias("device"),
        F.col("l.value").alias("value"),
        F.col("r.level").alias("level"),
    )
    got = {(r["device"], r["value"], r["level"]) for r in out.collect()}
    assert got == {("dev1", 20.0, "hi"), ("dev2", 30.0, "lo")}


def test_stream_stream_join_e2e_matches_batch(spark, tmp_path):
    from hermod_spark.sources.messages import message_stream
    from hermod_spark.streaming.windows import stream_stream_join

    readings, alerts = _join_fixture(spark)
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    # ONE file per side: with maxFilesPerTrigger=1, multi-file sides
    # make ingestion ORDER matter — if the 13:00 reading's part-file is
    # consumed before dev2's 10:30 row, the 2h watermark passes 11:00
    # and the 10:30/10:40 dev2 rows are dropped as late INPUT, which no
    # amount of re-triggering can recover (ADVICE r3). One file per
    # side means each side's whole history enters in one micro-batch
    # and the global (min-across-inputs) watermark can't outrun unread
    # data.
    readings.coalesce(1).write.parquet(lsrc)
    alerts.coalesce(1).write.parquet(rsrc)

    lstream = message_stream(spark, lsrc, schema=readings.schema)
    rstream = message_stream(spark, rsrc, schema=alerts.schema)
    out = stream_stream_join(
        lstream, rstream, key="device", within="1 hour"
    ).select(
        F.col("l.device").alias("device"),
        F.col("l.value").alias("value"),
        F.col("r.level").alias("level"),
    )
    assert out.isStreaming

    sink = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .start()
    )
    want = {("dev1", 20.0, "hi"), ("dev2", 30.0, "lo")}
    try:
        q.processAllAvailable()
        got = {
            (r["device"], r["value"], r["level"])
            for r in spark.sql(f"SELECT * FROM {sink}").collect()
        }
    finally:
        q.stop()
    assert got == want


def test_sliding_window_stream_matches_batch(spark, tmp_path):
    """Sliding (2h window / 1h slide) variant: every event lands in two
    overlapping buckets and the stream output equals the batch plan."""
    batch = _mk_batch(spark)
    src = str(tmp_path / "slide_src")
    batch.write.parquet(src)

    stream = message_stream(spark, src, schema=batch.schema)
    out = windowed_agg(
        stream, window="2 hours", slide="1 hour", watermark="4 hours"
    )
    sink = f"slide_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "slide_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(f"SELECT * FROM {sink}").collect()
    finally:
        q.stop()

    want = {
        (r["bucket_start"], r["topic"]): (r["avg_value"], r["value_count"])
        for r in windowed_agg(batch, window="2 hours", slide="1 hour").collect()
    }
    got_map = {
        (r["bucket_start"], r["topic"]): (r["avg_value"], r["value_count"]) for r in got
    }
    assert got_map == want
    # each 10:xx event appears in the 09:00 and 10:00 windows
    assert (dt.datetime(2024, 1, 1, 9, 0), "a") in got_map
    assert (dt.datetime(2024, 1, 1, 10, 0), "a") in got_map


def test_engine_stop_and_recover_exactly_once(spark, tmp_path):
    """Graceful stop + checkpoint recovery with exactly-once sink
    verification across the restart (VERDICT r3 #9; reference
    main.go:154-159 graceful-shutdown semantics).

    The restart is made adversarial: the last micro-batch's commit
    marker is deleted from the CHECKPOINT (not the sink's commit dir),
    which is exactly the crash window foreachBatch leaves open —
    writes done, checkpoint commit missing. On recovery Spark replays
    that batch with the same batch_id; the idempotent sink must skip
    it, so the sink holds every input row exactly once."""
    import os

    from hermod_spark.sinks.writer import MultiTableWriter

    src = str(tmp_path / "restart_src")
    ckpt = str(tmp_path / "restart_ckpt")
    commit_dir = str(tmp_path / "restart_sink_commits")
    out = str(tmp_path / "restart_out")
    t = lambda m: dt.datetime(2024, 1, 3, 10, m, tzinfo=UTC)  # noqa: E731
    schema = "time TIMESTAMP, device STRING, value DOUBLE"

    batch1 = spark.createDataFrame(
        [(t(0), "dev1", 1.0), (t(1), "dev2", 2.0), (t(2), "dev1", 3.0)], schema
    )
    batch1.coalesce(1).write.mode("append").parquet(src)

    writer = MultiTableWriter(base_path=out)

    def run_until_drained(session):
        stream = message_stream(session, src, schema=batch1.schema)
        q = (
            stream.writeStream.foreachBatch(
                writer.idempotent_foreach_batch(
                    lambda df: {"readings": df}, commit_dir
                )
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()  # graceful stop: drains, then shuts down
            q.awaitTermination(30)

    run_until_drained(spark)
    assert spark.read.parquet(f"{out}/readings").count() == 3

    # crash-window simulation: checkpoint says the last batch never
    # committed, so recovery MUST replay it
    commits = [c for c in os.listdir(f"{ckpt}/commits") if not c.startswith(".")]
    last = max(commits, key=int)
    os.remove(os.path.join(f"{ckpt}/commits", last))
    crc = os.path.join(f"{ckpt}/commits", f".{last}.crc")
    if os.path.exists(crc):  # local-FS checksum sidecar blocks re-commit
        os.remove(crc)

    batch2 = spark.createDataFrame(
        [(t(10), "dev3", 4.0), (t(11), "dev1", 5.0)], schema
    )
    batch2.coalesce(1).write.mode("append").parquet(src)

    # recover in a FRESH session (the closest in-test analogue of a
    # process restart): the first session's metadata-log cache would
    # otherwise flag the deleted commit as concurrent modification
    run_until_drained(spark.newSession())

    rows = spark.read.parquet(f"{out}/readings").collect()
    got = sorted((r["device"], r["value"]) for r in rows)
    assert got == [
        ("dev1", 1.0),
        ("dev1", 3.0),
        ("dev1", 5.0),
        ("dev2", 2.0),
        ("dev3", 4.0),
    ]  # batch1 NOT duplicated despite the forced replay


def _mk_session_batch(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 10, m, tzinfo=UTC)  # noqa: E731
    rows = [
        # topic a: 10:00, 10:10, 10:25 merge (gaps < 30m); 11:30 is new
        (t(0), "a", 1.0),
        (t(10), "a", 2.0),
        (t(25), "a", 3.0),
        (dt.datetime(2024, 1, 1, 11, 30, tzinfo=UTC), "a", 4.0),
        # topic b: a single event is its own session
        (t(5), "b", 10.0),
        # exactly-at-gap boundary: 10:00 then 10:30 -> ONE session
        # (session_window's end boundary is inclusive: a new session
        # starts only when the gap is STRICTLY exceeded)
        (t(0), "c", 1.0),
        (t(30), "c", 2.0),
    ]
    return spark.createDataFrame(rows, "time TIMESTAMP, topic STRING, value DOUBLE")


def test_session_agg_batch_semantics(spark):
    from hermod_spark.streaming.windows import session_agg

    out = session_agg(_mk_session_batch(spark), gap="30 minutes")
    rows = sorted(
        out.collect(), key=lambda r: (r["topic"], r["session_start"])
    )
    by_topic = {}
    for r in rows:
        by_topic.setdefault(r["topic"], []).append(r)
    a = by_topic["a"]
    assert len(a) == 2
    assert a[0]["n_events"] == 3 and a[0]["avg_value"] == 2.0
    # session end = last event + gap
    assert a[0]["session_end"] == dt.datetime(2024, 1, 1, 10, 55)
    assert a[0]["first_event"] == dt.datetime(2024, 1, 1, 10, 0)
    assert a[0]["last_event"] == dt.datetime(2024, 1, 1, 10, 25)
    assert a[1]["n_events"] == 1
    assert len(by_topic["b"]) == 1 and by_topic["b"][0]["n_events"] == 1
    # an event exactly gap after the previous MERGES (boundary is
    # inclusive); its session end extends to 10:30 + 30m
    assert len(by_topic["c"]) == 1
    assert by_topic["c"][0]["n_events"] == 2
    assert by_topic["c"][0]["session_end"] == dt.datetime(2024, 1, 1, 11, 0)


def test_session_agg_stream_matches_batch(spark, tmp_path):
    from hermod_spark.streaming.windows import session_agg

    batch = _mk_session_batch(spark)
    src = str(tmp_path / "src")
    batch.write.parquet(src)

    stream = message_stream(spark, src, schema=batch.schema)
    out = session_agg(stream, gap="30 minutes", watermark="2 hours")

    sink = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(f"SELECT * FROM {sink}").collect()
    finally:
        q.stop()

    key = lambda r: (  # noqa: E731
        r["topic"], r["session_start"], r["session_end"], r["n_events"]
    )
    assert sorted(map(key, got)) == sorted(
        map(key, session_agg(batch, gap="30 minutes").collect())
    )


def test_decontaminate_stream_matches_batch_and_never_misses(spark, tmp_path):
    """Stream-side Bloom decontamination: the stream plan (literal bit
    set, stateless projection) must agree with the batch operator and
    can never pass a contaminated key through (no false negatives)."""
    import uuid as _uuid

    from hermod_spark.streaming.windows import decontaminate_stream

    corpus = spark.createDataFrame(
        [(i, f"payload-{i}") for i in range(100)], "msg_id INT, payload STRING"
    )
    probes = corpus.filter(F.col("msg_id") < 10)
    src = str(tmp_path / "src")
    corpus.write.parquet(src)

    stream = message_stream(spark, src, schema=corpus.schema)
    out = decontaminate_stream(
        stream, probes, key=F.md5("payload"), probe_key=F.md5("payload")
    )
    assert out.isStreaming
    sink = f"deco_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        kept = {r["msg_id"] for r in spark.sql(f"SELECT * FROM {sink}").collect()}
    finally:
        q.stop()

    # no false negatives: every probe row is dropped
    assert kept.isdisjoint(set(range(10)))
    # matches the batch form exactly (same literal bits, same hashes)
    batch_kept = {
        r["msg_id"]
        for r in decontaminate_stream(
            corpus, probes, key=F.md5("payload"), probe_key=F.md5("payload")
        ).collect()
    }
    assert kept == batch_kept
    # flag mode surfaces the audit column instead of dropping
    flagged = decontaminate_stream(
        corpus, probes, key=F.md5("payload"), probe_key=F.md5("payload"), drop=False
    )
    n_hit = flagged.filter(F.col("bloom_hit")).count()
    assert n_hit >= 10  # all probes + any false positives


def test_trending_topics_stream_foreachbatch_rank_matches_batch(spark, tmp_path):
    """Streaming trending top-k: the counts aggregation streams, the
    rank runs per micro-batch in foreachBatch (the standard streaming
    top-k idiom) — the final ranked output must equal the batch form."""
    from hermod_spark.streaming.windows import topk_per_window, trending_topics

    rows = []
    t0 = dt.datetime(2024, 1, 1, 10, 0, tzinfo=UTC)
    for m in range(30):
        rows.append((t0 + dt.timedelta(minutes=2 * m), f"t{m % 5}", 1.0))
    for m in range(10):  # t0 dominates hour 10
        rows.append((t0 + dt.timedelta(minutes=m), "t0", 1.0))
    batch = spark.createDataFrame(rows, "time TIMESTAMP, topic STRING, value DOUBLE")
    src = str(tmp_path / "src")
    batch.write.parquet(src)

    out_dir = str(tmp_path / "ranked")

    def rank_and_overwrite(b, _bid):
        # complete-mode batch = full counts; rank and replace
        topk_per_window(b, k=3).write.mode("overwrite").parquet(out_dir)

    stream = message_stream(spark, src, schema=batch.schema)
    counts = trending_topics(stream, window="1 hour")
    q = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(rank_and_overwrite)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["bucket_start"], r["rnk"]): (r["topic"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["bucket_start"], r["rnk"]): (r["topic"], r["n_events"])
        for r in topk_per_window(trending_topics(batch, window="1 hour"), k=3).collect()
    }
    assert got == want
    # the planted hot topic leads its hour
    lead = [v for (b, rk), v in want.items() if rk == 1 and b.hour == 10]
    assert lead and lead[0][0] == "t0"



def test_curation_ingest_pipeline_composes_on_stream(spark, tmp_path):
    """Composition e2e: quality filter (projection with passthrough) →
    Bloom decontamination (literal bit set) → windowed counts, chained
    on ONE stream. Every stage is stateless except the final windowed
    aggregation, so the whole curation chain streams with exactly one
    state store; result must equal the identical batch composition."""
    import uuid as _uuid

    from hermod_spark.operators.curation import quality_logistic
    from hermod_spark.streaming.windows import decontaminate_stream, windowed_agg

    good = "think about these words that with from have been good " * 6
    t0 = dt.datetime(2024, 1, 1, 10, 0, tzinfo=UTC)
    rows = [
        (i, good + f" tail{i}", t0 + dt.timedelta(minutes=i)) for i in range(40)
    ] + [
        (100 + i, "@#$% junk " * 30, t0 + dt.timedelta(minutes=i))
        for i in range(10)
    ]
    corpus = spark.createDataFrame(rows, "doc_id INT, text STRING, time TIMESTAMP")
    benchmark = corpus.filter(F.col("doc_id") < 5)
    src = str(tmp_path / "src")
    corpus.write.parquet(src)

    def chain(df, watermark=None):
        kept = quality_logistic(df, passthrough=("text", "time")).filter("keep")
        clean = decontaminate_stream(
            kept, benchmark, key=F.md5("text"), probe_key=F.md5("text")
        )
        counted = clean.withColumn("topic", F.lit("docs")).withColumn(
            "value", F.col("doc_id").cast("double")
        )
        kw = {"watermark": watermark} if watermark else {}
        return windowed_agg(counted, window="1 hour", **kw)

    want = {
        (r["bucket_start"], r["value_count"]) for r in chain(corpus).collect()
    }
    # sanity: the junk docs and the 5 benchmark docs are actually gone
    n_kept = quality_logistic(corpus).filter("keep").count()
    assert n_kept == 40  # junk filtered
    assert sum(c for _, c in want) == 35  # 40 good − 5 decontaminated

    stream = message_stream(spark, src, schema=corpus.schema)
    out = chain(stream, watermark="2 hours")
    sink = f"cur_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["bucket_start"], r["value_count"])
            for r in spark.sql(f"SELECT * FROM {sink}").collect()
        }
    finally:
        q.stop()
    assert got == want


def test_ngram_bloom_decontaminate_stream_parity(spark, tmp_path):
    """The bloom leg is stateless scan-side math — the SAME flags must
    come out of a readStream plan as out of the batch run (no false
    negatives either way)."""
    from pyspark.sql import functions as F

    from hermod_spark.operators.dedup import ngram_hash_array
    from hermod_spark.operators.sketches import (
        bloom_build, bloom_positions, ngram_bloom_decontaminate,
    )
    from hermod_spark.sources.messages import message_stream

    probe_text = " ".join(f"q{i}" for i in range(13))
    corpus = spark.createDataFrame(
        [
            (100, "padding words before " + probe_text + " after"),
            (101, " ".join(f"c{i}" for i in range(20))),
        ],
        "doc_id INT, text STRING",
    )
    probes = spark.createDataFrame([(1, probe_text)], "doc_id INT, text STRING")
    batch = {r["doc_id"]: r for r in
             ngram_bloom_decontaminate(corpus, probes, n=13).collect()}
    assert batch[100]["bloom_contaminated"] and batch[100]["exact_contaminated"]
    assert not batch[101]["exact_contaminated"]

    # streaming leg: collect the bit set once (driver-side model), then
    # apply the same scan-side expression inside a file stream
    bits = (
        bloom_build(
            probes.select(ngram_hash_array("text", 13).alias("_g"))
            .select(F.explode("_g").alias("h")), "h", 3, 65536
        )
        .agg(F.array_sort(F.collect_list("pos")).alias("_bits"))
        .first()["_bits"]
    )
    src = str(tmp_path / "src")
    corpus.write.parquet(src)
    stream = message_stream(spark, src, schema=corpus.schema)
    bits_col = F.array(*[F.lit(int(b)) for b in bits])
    flagged = stream.select(
        "doc_id",
        (
            F.size(
                F.filter(
                    ngram_hash_array("text", 13),
                    lambda h: F.forall(
                        bloom_positions(h, 3, 65536),
                        lambda p: F.array_contains(bits_col, p),
                    ),
                )
            )
            > 0
        ).alias("bloom_contaminated"),
    )
    import uuid

    sink = f"s_{uuid.uuid4().hex[:8]}"
    q = (
        flagged.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: r["bloom_contaminated"]
               for r in spark.sql(f"SELECT * FROM {sink}").collect()}
    finally:
        q.stop()
    assert got == {d: batch[d]["bloom_contaminated"] for d in got}


def test_ingest_observer_batch_observation(spark):
    """Batch form: the observe() node feeds an Observation at zero
    extra passes — metrics match a direct recompute."""
    from pyspark.sql import Observation

    from hermod_spark.streaming.windows import with_ingest_observer

    df = _mk_batch(spark).withColumn(
        "payload", F.when(F.col("value") > 4.0, None).otherwise(F.lit("x"))
    )
    obs = Observation("ingest_metrics")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.max("time").alias("max_event_time"),
        F.sum(F.when(F.col("payload").isNull(), 1).otherwise(0)).alias("null_payloads"),
    )
    assert observed.count() == 4
    got = obs.get
    assert got["n_rows"] == 4 and got["null_payloads"] == 2  # values 10 and 5 > 4
    # Observation returns the session-local naive form
    assert got["max_event_time"].replace(tzinfo=UTC) == dt.datetime(
        2024, 1, 1, 11, 5, tzinfo=UTC
    )
    # the library helper builds the identical plan node (named form)
    helper = with_ingest_observer(df)
    assert "CollectMetrics" in helper._jdf.queryExecution().optimizedPlan().toString()


def test_ingest_observer_stream_progress_metrics(spark, tmp_path):
    """Streaming form: every micro-batch surfaces the observed metrics
    in QueryProgressEvent/StreamingQueryProgress.observedMetrics —
    the engine-side counterpart of the reference's per-message
    subscriber logging (main.go:119-131), at zero marginal cost."""
    from hermod_spark.streaming.windows import windowed_agg, with_ingest_observer

    batch = _mk_batch(spark).withColumn(
        "payload", F.when(F.col("value") > 4.0, None).otherwise(F.lit("x"))
    )
    src = str(tmp_path / "src")
    batch.write.parquet(src)
    stream = with_ingest_observer(message_stream(spark, src, schema=batch.schema))
    out = windowed_agg(stream, window="1 hour", watermark="2 hours")
    sink = f"obs_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [
            p.observedMetrics["ingest_metrics"]
            for p in q.recentProgress
            if "ingest_metrics" in (p.observedMetrics or {})
        ]
    finally:
        q.stop()
    assert progress, "no observed metrics surfaced in query progress"
    assert sum(m["n_rows"] for m in progress) == 4
    assert sum(m["null_payloads"] for m in progress) == 2
    # progress JSON serializes the timestamp as a string
    assert max(str(m["max_event_time"]) for m in progress).startswith(
        "2024-01-01"
    )
