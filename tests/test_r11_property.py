"""Property tests for the r11 items: the sharded-spool per-shard
offset model (arbitrary interleavings of appends/new shards/trigger
draws must deliver every line exactly once, in per-shard order), and
the streamed EWMA partition fold's batch-decomposition invariance
(any chunking of a key's rows folds to identical output)."""

from __future__ import annotations

import json
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hermod_spark.sources import mqtt as M

_settings = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _drain(reader, partition):
    for item in reader.read(partition):
        if hasattr(item, "to_pylist"):
            for d in item.to_pylist():
                yield d["payload"]
        else:
            yield item[4]


# Each step: (shard_index 0..2, n_lines_appended). A shard first
# touched mid-run is a "new shard appears between triggers" case.
@given(
    steps=st.lists(
        st.tuples(st.integers(0, 2), st.integers(1, 5)),
        min_size=1,
        max_size=12,
    ),
    draws_after=st.lists(st.booleans(), min_size=1, max_size=12),
)
@_settings
def test_sharded_offsets_exactly_once_any_interleaving(
    tmp_path_factory, steps, draws_after
):
    """Apply appends step by step; after step i, if draws_after[i]
    (cycled), advance the stream (latestOffset → partitions → read).
    Always finish with one final draw. Union of all draws must be
    every appended line EXACTLY once, and per-shard delivery order
    must equal append order — under ANY interleaving of appends, new
    shards, and trigger timings."""
    d = tmp_path_factory.mktemp("prop_spool")
    reader = M.MqttReplayStreamReader(
        {"path": str(d), "maxMessagesPerBatch": "3"}
    )
    start = reader.initialOffset()
    appended: dict[str, list[str]] = {}
    got: dict[str, list[str]] = {}
    seq = 0

    def draw():
        nonlocal start
        end = reader.latestOffset()
        for p in reader.partitions(start, end):
            name = os.path.basename(p.path)
            for payload in _drain(reader, p):
                got.setdefault(name, []).append(payload)
        start = end

    for i, (shard_i, n_lines) in enumerate(steps):
        name = f"shard-{shard_i:04d}.jsonl"
        with open(d / name, "a", encoding="utf-8") as fh:
            for _ in range(n_lines):
                payload = f"m{seq}"
                seq += 1
                fh.write(
                    json.dumps({"topic": "t", "payload": payload}) + "\n"
                )
                appended.setdefault(name, []).append(payload)
        if draws_after[i % len(draws_after)]:
            draw()
    # final DRAIN loop: maxMessagesPerBatch is a per-trigger admission
    # cap (per shard), so one draw may not reach the tail — keep
    # triggering until the offset stops advancing, like a real stream
    while True:
        before = start
        draw()
        if start == before:
            break

    assert got == appended  # exactly once, per-shard append order


@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=60,
    ),
    cuts=st.sets(st.integers(1, 59), max_size=6),
)
@_settings
def test_ewma_fold_chunking_invariance_property(values, cuts):
    """_ewma_fold_arrays is an exact recurrence: folding a key's rows
    in ONE chunk vs folding at ANY cut points with carried
    (mean, var, n) yields bit-identical anomaly rows — the property
    the streamed mapInPandas partition fold relies on when a key
    straddles Arrow batch boundaries."""
    import numpy as np

    from hermod_spark.streaming.stateful import _ewma_fold_arrays

    times = np.arange(len(values))
    vals = np.array(values, dtype=float)

    whole, m1, v1, n1 = _ewma_fold_arrays(
        "k", times, vals, 0.0, 0.0, 0,
        alpha=0.2, threshold=1.5, warmup=3,
    )

    bounds = sorted(c for c in cuts if c < len(values))
    out, mean, var, n = [], 0.0, 0.0, 0
    for lo, hi in zip([0, *bounds], [*bounds, len(values)]):
        o, mean, var, n = _ewma_fold_arrays(
            "k", times[lo:hi], vals[lo:hi], mean, var, n,
            alpha=0.2, threshold=1.5, warmup=3,
        )
        out.extend(o)

    assert out == whole
    assert (mean, var, n) == (m1, v1, n1)


# --- aHash kernel vs independent arithmetic (late r11) ----------------

@given(
    st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
        max_size=120,
    )
)
@settings(max_examples=200, deadline=None)
def test_ahash_matches_oracle_arithmetic(text):
    """_ahash_one(image_tile_blob(text)) must equal the DuckDB
    oracle's arithmetic recomputed independently: codes =
    min(codepoint, 255) space-padded to 64, mean = sum/64 (exact in
    double), bit = code >= mean. Any drift here silently breaks the
    bit-for-bit oracle parity of mm_image_ahash_dedup/neardup."""
    from hermod_spark.operators.multimodal import _ahash_one, image_tile_blob

    got = _ahash_one(image_tile_blob(text))
    codes = [min(ord(c), 255) for c in text[:64]]
    codes += [32] * (64 - len(codes))
    mean = sum(codes) / 64
    want = "".join("1" if c >= mean else "0" for c in codes)
    assert got == want


@given(st.lists(st.integers(0, 63), min_size=0, max_size=4), st.integers(0, 2**30))
@settings(max_examples=150, deadline=None)
def test_ahash_neardup_banding_pigeonhole(flips, seed):
    """Pure pigeonhole property behind ahash_neardup: flipping <= 4
    bits of any 64-bit hash always leaves at least one of the 5
    INTERLEAVED bands (band k = positions k, k+5, k+10, ...) untouched
    — the banded join can never miss a <= 4 pair. Interleaving (vs
    contiguous runs) is what keeps band values high-entropy on
    structurally skewed hashes; pigeonhole only needs disjointness."""
    import random

    rng = random.Random(seed)
    h = [rng.randrange(2) for _ in range(64)]
    h2 = list(h)
    for p in flips:
        h2[p] ^= 1
    groups = [list(range(k, 64, 5)) for k in range(5)]
    assert any(all(h[p] == h2[p] for p in g) for g in groups)


# --- audio fingerprint kernel vs independent arithmetic (late r11) ----

@given(
    st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
        max_size=120,
    )
)
@settings(max_examples=200, deadline=None)
def test_audio_fp_matches_oracle_arithmetic(text):
    """_audio_fp_one over wav_from_codes(text codes) must equal the
    DuckDB oracle's arithmetic recomputed independently: sample =
    (min(codepoint,255) - 128)·256 space(32)-padded to 64, energy =
    sample² (exact double), mean = sum/64, bit = energy >= mean. The
    16-bit PCM encode/decode round trip must never perturb a sample —
    any drift silently breaks mm_audio_fpdedup/neardup parity."""
    from hermod_spark.operators.multimodal import _audio_fp_one, wav_from_codes

    codes = [min(ord(c), 255) for c in text[:64]]
    codes += [32] * (64 - len(codes))
    got = _audio_fp_one(wav_from_codes(codes))
    en = [((c - 128) * 256) ** 2 for c in codes]
    mean = sum(en) / 64
    want = "".join("1" if e >= mean else "0" for e in en)
    assert got == want
