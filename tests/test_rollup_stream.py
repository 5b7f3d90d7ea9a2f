"""Persisted continuous-aggregate maintenance (streaming/rollup.py):
exactly-once merge of per-micro-batch rollup partials into versioned
parquet state, with the merged-then-served result equal to the
from-scratch rollup through replays, poisoned commits, and a real
stream restart."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from hermod_spark.streaming.rollup import (
    _read_meta,
    load_rollup_state,
    rollup_maintenance_sink,
    serve_rollup_state,
)

UTC = dt.timezone.utc


def _events(spark, n=60):
    t0 = dt.datetime(2024, 3, 1, 8, 0, tzinfo=UTC)
    rows = [
        (
            i,
            t0 + dt.timedelta(minutes=7 * i),
            ["click", "view", "purchase"][i % 3],
            float(i % 11) + 0.25,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
    )


def _direct_serve(events):
    """From-scratch serving rollup — the equality oracle."""
    from hermod_spark.operators.relational import rollup_partials, serve_rollup

    return serve_rollup(rollup_partials(events))


def _served_rows(df):
    return sorted(
        (
            str(r["bucket"]), r["topic"], r["avg_value"],
            r["min_value"], r["max_value"], r["value_count"],
        )
        for r in df.collect()
    )


def test_rollup_sink_merges_batches_and_skips_replays(spark, tmp_path):
    ev = _events(spark)
    state = str(tmp_path / "state")
    fn = rollup_maintenance_sink(state)
    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    fn(batches[0], 0)
    fn(batches[1], 1)
    fn(batches[1], 1)  # redelivered micro-batch: must NOT double-merge
    fn(batches[2], 2)
    fn(batches[0], 0)  # late replay of an old id: skipped
    assert _served_rows(serve_rollup_state(spark, state)) == _served_rows(
        _direct_serve(ev)
    )
    meta = _read_meta(spark, state)
    assert meta["last_batch_id"] == 2
    # prune keeps current + previous generations only
    gens = sorted(g for g in os.listdir(state) if g.startswith("gen-"))
    assert gens == ["gen-000000001", "gen-000000002"]


def test_rollup_sink_poisoned_commit_replay_is_exact(spark, tmp_path):
    """Worst-case crash window: the generation parquet is fully
    written but the process dies BEFORE the meta commit. The replayed
    batch must re-merge from the OLD state (the orphan generation was
    never referenced) — served result still equals from-scratch."""
    ev = _events(spark)
    state = str(tmp_path / "state")
    boom = {"armed": False}

    def poison(batch_id):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash between write and commit")

    fn = rollup_maintenance_sink(state, on_before_commit=poison)
    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    fn(batches[0], 0)
    boom["armed"] = True
    with pytest.raises(RuntimeError, match="injected crash"):
        fn(batches[1], 1)  # gen-…001 written, meta still at batch 0
    meta = _read_meta(spark, state)
    assert meta["last_batch_id"] == 0  # commit never happened
    fn(batches[1], 1)  # foreachBatch redelivery after restart
    fn(batches[2], 2)
    assert _served_rows(serve_rollup_state(spark, state)) == _served_rows(
        _direct_serve(ev)
    )


def test_rollup_state_guards(spark, tmp_path):
    state = str(tmp_path / "state")
    # before any commit: load is None, serve refuses
    assert load_rollup_state(spark, state) is None
    with pytest.raises(IOError, match="no committed data"):
        serve_rollup_state(spark, state)
    fn = rollup_maintenance_sink(state)
    fn(_events(spark, 9), 0)
    # a vanished meta over committed generations must refuse to
    # restart from empty (that would re-merge every replayed batch)
    os.remove(os.path.join(state, "_rollup_meta.json"))
    with pytest.raises(IOError, match="refusing to restart"):
        _read_meta(spark, state)
    with pytest.raises(ValueError, match="keep_generations"):
        rollup_maintenance_sink(state, keep_generations=1)


def test_rollup_stream_restart_e2e(spark, tmp_path):
    """Real stream: file source → rollup maintenance sink, crash
    simulated by deleting the last checkpoint commit (forces Spark to
    redeliver the final micro-batch on restart) — the served rollup
    still equals the from-scratch rollup over everything ingested."""
    from hermod_spark.sources.messages import message_stream

    ev = _events(spark)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    first = ev.filter(F.col("event_id") < 40)
    first.coalesce(1).write.mode("append").parquet(src)

    def run_until_drained(session):
        stream = message_stream(session, src, schema=ev.schema)
        q = (
            stream.writeStream.foreachBatch(rollup_maintenance_sink(state))
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    run_until_drained(spark)
    assert _served_rows(serve_rollup_state(spark, state)) == _served_rows(
        _direct_serve(first)
    )

    # crash-window simulation (same technique as the sink restart
    # test): checkpoint says the last batch never committed, so
    # recovery MUST redeliver it to the rollup sink
    commits = [
        c for c in os.listdir(f"{ckpt}/commits") if not c.startswith(".")
    ]
    last = max(commits, key=int)
    os.remove(os.path.join(f"{ckpt}/commits", last))
    crc = os.path.join(f"{ckpt}/commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    ev.filter(F.col("event_id") >= 40).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_until_drained(spark.newSession())

    assert _served_rows(serve_rollup_state(spark, state)) == _served_rows(
        _direct_serve(ev)
    )


def test_rollup_gen_prune_sorts_numerically_past_padding(spark, tmp_path):
    """ADVICE r12: generation names are zero-padded to 9 digits; a
    batch_id >= 10^9 overflows the padding and a LEXICOGRAPHIC prune
    would mis-sort (\"gen-1000000000\" < \"gen-999999999\") and delete
    the live generation. The prune sorts by the parsed integer, so
    the numerically-newest generations survive and the served state
    stays exactly the from-scratch rollup."""
    state = str(tmp_path / "state")
    ev = _events(spark)
    fn = rollup_maintenance_sink(state)
    # three commits straddling the 9-digit padding boundary; keep=2
    # must retain {10**9, 10**9 + 1}, prune 999_999_999
    for bid in (999_999_999, 10**9, 10**9 + 1):
        fn(ev.filter(F.col("event_id") % 3 == bid % 3), bid)
    gens = sorted(
        n for n in os.listdir(state) if n.startswith("gen-")
    )
    assert gens == [f"gen-{10**9:09d}", f"gen-{10**9 + 1:09d}"]
    meta = _read_meta(spark, state)
    assert meta["generation"] == f"gen-{10**9 + 1:09d}"
    got = _served_rows(serve_rollup_state(spark, state))
    assert got == _served_rows(_direct_serve(ev))
