"""Multimodal plumbing: binary column conventions, Arrow-batched decode,
resize/frame-sample planning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hermod_spark.operators import multimodal as MM


@pytest.fixture
def blobs(spark):
    rows = [
        (1, MM.fake_image_blob(640, 480, 3)),
        (2, MM.fake_image_blob(100, 200, 1)),
        (3, b"not a real blob"),
        (4, None),
    ]
    return spark.createDataFrame(
        rows, T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ])
    )


def test_decode_images(blobs):
    rows = {r["doc_id"]: r for r in MM.decode_images(blobs).collect()}
    assert rows[1]["decode_ok"] and rows[1]["width"] == 640 and rows[1]["height"] == 480
    assert rows[2]["n_channels"] == 1
    assert 0.0 <= rows[1]["mean_intensity"] <= 1.0
    # corrupt / null blobs degrade to decode_ok=false, never raise
    assert rows[3]["decode_ok"] is False and rows[3]["width"] is None
    assert rows[4]["decode_ok"] is False


def test_resize_plan_aspect_ratio(spark):
    df = spark.createDataFrame(
        [(1, (1024, 512)), (2, (100, 50))],
        "doc_id INT, content_meta STRUCT<width INT, height INT>",
    )
    rows = {r["doc_id"]: r for r in MM.resize_plan(df, max_side=512).collect()}
    assert (rows[1]["target_width"], rows[1]["target_height"]) == (512, 256)
    # already small -> untouched
    assert (rows[2]["target_width"], rows[2]["target_height"]) == (100, 50)


def test_audio_chunk_plan(spark):
    df = spark.createDataFrame(
        [(1, (12000, 16000)), (2, (None, 16000))],
        "doc_id INT, content_meta STRUCT<duration_ms BIGINT, sample_rate INT>",
    )
    rows = MM.audio_chunk_plan(df, window_ms=5000).collect()
    got = [(r["chunk_start_ms"], r["chunk_end_ms"], r["start_sample"], r["end_sample"]) for r in rows]
    assert got == [
        (0, 5000, 0, 80000),
        (5000, 10000, 80000, 160000),
        (10000, 12000, 160000, 192000),  # final partial window kept
    ]


def test_extract_audio_features(spark):
    import pyspark.sql.types as T

    rows = [(1, MM.fake_image_blob(4, 4, 1)), (2, b"junk"), (3, None)]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]),
    )
    got = {r["doc_id"]: r for r in MM.extract_audio_features(df).collect()}
    assert got[1]["decode_ok"] and got[1]["n_samples"] == 32
    assert 0.0 <= got[1]["rms"] <= 1.0
    assert got[2]["decode_ok"] is False and got[3]["decode_ok"] is False


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, (2500,)), (2, (None,))],
        "doc_id INT, content_meta STRUCT<duration_ms BIGINT>",
    )
    rows = MM.frame_sample_plan(df, every_ms=1000).collect()
    assert [(r["doc_id"], r["frame_ts_ms"]) for r in rows] == [(1, 0), (1, 1000), (1, 2000)]


def test_batch_plan_packs_same_shape_batches(spark):
    from pyspark.sql import functions as F

    from hermod_spark.operators import multimodal as MM

    # 70 images in one bucket (square 100x100) + 5 in another
    rows = [(i, 100, 100) for i in range(70)] + [(100 + i, 640, 480) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id INT, w INT, h INT").withColumn(
        "content_meta",
        F.struct(F.col("w").alias("width"), F.col("h").alias("height")),
    )
    out = MM.batch_plan(df, batch_size=32, max_side=512).collect()
    by_bucket = {}
    for r in out:
        key = (r["target_width"], r["target_height"])
        by_bucket.setdefault(key, []).append((r["batch_id"], r["batch_pos"], r["doc_id"]))
    assert set(by_bucket) == {(100, 100), (512, 384)}
    big = sorted(by_bucket[(100, 100)])
    # 70 rows -> batches of 32, 32, 6; positions 0..31 within each
    sizes = {}
    for bid, pos, _ in big:
        sizes[bid] = sizes.get(bid, 0) + 1
        assert 0 <= pos < 32
    assert sizes == {0: 32, 1: 32, 2: 6}
    # deterministic assignment: ordered by doc_id within the bucket
    assert [d for _, _, d in big] == sorted(d for _, _, d in big)


# ----------------------------------------------------- real-codec legs


def test_decode_audio_real_wav_roundtrip(spark):
    """REAL codec e2e: stdlib-written WAV bytes decoded through the
    Arrow-batched operator — sample rate, channel count, frame count,
    duration, and sine RMS (A/√2) all recovered from genuine RIFF."""
    from hermod_spark.operators.multimodal import decode_audio, wav_blob

    rows = [
        (0, wav_blob(sample_rate=8000, freq_hz=440.0, ms=125, amplitude=0.5)),
        (1, wav_blob(sample_rate=16000, freq_hz=1000.0, ms=250, n_channels=2)),
        (2, b"not audio at all"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, content BINARY")
    got = {r["doc_id"]: r for r in decode_audio(df).collect()}
    assert got[0]["decode_ok"] and got[1]["decode_ok"]
    assert not got[2]["decode_ok"] and not got[3]["decode_ok"]
    assert got[0]["sample_rate"] == 8000 and got[0]["n_frames"] == 1000
    assert got[0]["duration_ms"] == 125
    assert got[1]["sample_rate"] == 16000 and got[1]["n_channels"] == 2
    assert got[1]["duration_ms"] == 250
    # 0.5-amplitude sine RMS = 0.5/sqrt(2) ≈ 0.3536 (quantized 16-bit)
    assert abs(got[0]["rms"] - 0.3536) < 0.01


def test_image_codec_gating():
    """codec='pil' without Pillow raises with instructions (no silent
    fake fallback); 'auto' resolves to the synthetic kernel instead."""
    from hermod_spark.operators.multimodal import (
        _decode_one, have_pillow, image_codec,
    )

    if have_pillow():
        import pytest

        pytest.skip("Pillow present: gating path not reachable")
    assert image_codec("auto") is _decode_one
    import pytest

    with pytest.raises(ImportError, match="Pillow"):
        image_codec("pil")


def test_decode_images_with_pil_real_png(spark):
    """Auto-skipping REAL image leg: a genuine PNG decoded through the
    same Arrow-batched operator (runs wherever Pillow is installed)."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from hermod_spark.operators.multimodal import decode_images_with

    buf = io.BytesIO()
    Image.new("RGB", (20, 10), color=(255, 0, 0)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(0, buf.getvalue()), (1, b"garbage")], "doc_id LONG, content BINARY"
    )
    got = {r["doc_id"]: r for r in decode_images_with(df, codec="pil").collect()}
    assert got[0]["decode_ok"] and (got[0]["width"], got[0]["height"]) == (20, 10)
    assert got[0]["n_channels"] == 3
    assert not got[1]["decode_ok"]


def test_decode_images_with_hspk_matches_decode_images(spark):
    """The selectable-kernel wrapper with the synthetic codec is
    row-identical to the original operator (same plumbing claim)."""
    from hermod_spark.operators.multimodal import (
        decode_images, decode_images_with, fake_image_blob,
    )

    df = spark.createDataFrame(
        [(i, fake_image_blob(32 + i, 16, 3)) for i in range(5)] + [(9, b"bad")],
        "doc_id LONG, content BINARY",
    )
    a = sorted(map(tuple, decode_images(df).collect()))
    b = sorted(map(tuple, decode_images_with(df, codec="hspk").collect()))
    assert a == b


# --- image aHash dedup (late r11) ------------------------------------

def test_image_tile_blob_and_ahash_known_values():
    from hermod_spark.operators.multimodal import _ahash_one, image_tile_blob

    # constant tile: every pixel == mean -> all bits 1
    blob = image_tile_blob("A" * 64)
    assert _ahash_one(blob) == "1" * 64
    # empty text: all space padding, mean 32, 32 >= 32 -> all 1s
    assert _ahash_one(image_tile_blob("")) == "1" * 64
    # half low / half high: bits split exactly at the mean
    txt = ("\x01" * 32) + ("c" * 32)  # codes 1 and 99, mean 50
    h = _ahash_one(image_tile_blob(txt))
    assert h == "0" * 32 + "1" * 32
    # non-ASCII clips at 255 like the oracle's LEAST(unicode, 255)
    blob_u = image_tile_blob("中" * 64)  # codepoint 20013
    assert _ahash_one(blob_u) == "1" * 64
    # corrupt blob -> None, not a crash
    assert _ahash_one(b"nope") is None
    assert _ahash_one(None) is None


def test_image_ahash_dedup_groups_and_keeper(spark):
    from hermod_spark.operators.multimodal import (
        ahash_dedup, fake_image_blob, image_ahash, image_tile_blob,
    )

    rows = [
        (1, image_tile_blob("same prefix")),
        (2, image_tile_blob("same prefix")),
        (3, image_tile_blob("different!")),
        (4, fake_image_blob(2, 2, 1, b"x")[:5]),  # truncated -> decode fail
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, content BINARY")
    out = {r["doc_id"]: r for r in ahash_dedup(image_ahash(df)).collect()}
    assert set(out) == {1, 2, 3}  # corrupt row dropped by decode_ok
    assert out[1]["ahash"] == out[2]["ahash"] != out[3]["ahash"]
    assert out[1]["group_size"] == 2 and out[3]["group_size"] == 1
    assert out[1]["keep"] and not out[2]["keep"] and out[3]["keep"]


def test_ahash_neardup_exact_vs_bruteforce(spark):
    """Completeness proof on seeded random hashes: the banded join's
    pair set must EQUAL the quadratic scan's (pigeonhole: hamming <= d
    forces a shared band among d+1 bands)."""
    import random

    from hermod_spark.operators.multimodal import ahash_neardup

    rng = random.Random(11)
    base = [rng.randrange(2) for _ in range(64)]
    hashes = []
    for i in range(40):
        h = list(base)
        for _ in range(rng.randrange(0, 9)):  # 0..8 flipped bits
            p = rng.randrange(64)
            h[p] ^= 1
        hashes.append((i, "".join(map(str, h))))
    df = spark.createDataFrame(
        [(i, h, True) for i, h in hashes],
        "doc_id LONG, ahash STRING, decode_ok BOOLEAN",
    )
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in ahash_neardup(df, max_hamming=4).collect()
    }
    want = set()
    for i, ha in hashes:
        for j, hb in hashes:
            if i < j:
                d = sum(x != y for x, y in zip(ha, hb))
                if d <= 4:
                    want.add((i, j, d))
    assert got == want and want  # non-trivial case


def test_ahash_neardup_skips_decode_failures(spark):
    from hermod_spark.operators.multimodal import ahash_neardup

    df = spark.createDataFrame(
        [(1, "1" * 64, True), (2, "1" * 64, True), (3, None, False)],
        "doc_id LONG, ahash STRING, decode_ok BOOLEAN",
    )
    got = ahash_neardup(df, max_hamming=0).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in got] == [(1, 2, 0)]


def test_ahash_rejects_zero_area_and_multichannel_blobs(spark):
    """Review fixes: a zero-area header must not divide by zero, and a
    channels=3 blob must not hash interleaved RGB as grayscale — both
    are decode FAILURES (decode_ok=false), never aborts."""
    import struct

    from hermod_spark.operators.multimodal import (
        _ahash_one, fake_image_blob, image_ahash,
    )

    zero_area = b"HSPK" + struct.pack("<HHB", 0, 0, 1)
    rgb = fake_image_blob(8, 8, 3, b"x") + b"\x00" * 200
    assert _ahash_one(zero_area) is None
    assert _ahash_one(rgb) is None
    df = spark.createDataFrame(
        [(1, zero_area), (2, rgb)], "doc_id LONG, content BINARY"
    )
    got = {r["doc_id"]: r["decode_ok"] for r in image_ahash(df).collect()}
    assert got == {1: False, 2: False}


def test_ahash_neardup_drops_wrong_length_hashes_and_validates(spark):
    import pytest as _pt

    from hermod_spark.operators.multimodal import ahash_neardup

    df = spark.createDataFrame(
        [(1, "1" * 64), (2, "1" * 64), (3, "1" * 16)],  # 16-bit intruder
        "doc_id LONG, ahash STRING",
    )
    got = ahash_neardup(df, max_hamming=0).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(1, 2)]
    with _pt.raises(ValueError, match="pigeonhole"):
        ahash_neardup(df, max_hamming=4, hash_bits=3)


def test_ahash_dedup_accepts_plain_hash_frame(spark):
    """ahash_dedup and ahash_neardup must agree on the input contract:
    a pre-hashed (id, ahash) frame without decode_ok works in both."""
    from hermod_spark.operators.multimodal import ahash_dedup

    df = spark.createDataFrame(
        [(1, "1" * 64), (2, "1" * 64)], "doc_id LONG, ahash STRING"
    )
    got = ahash_dedup(df).collect()
    assert {(r["doc_id"], r["group_size"], r["keep"]) for r in got} == {
        (1, 2, True), (2, 2, False)
    }


def test_frame_dedup_pairs_counts_distinct_shared_hashes(spark):
    """Repeated hash WITHIN one video counts once; pairs need
    min_shared distinct shared hashes; decode failures drop."""
    from hermod_spark.operators.multimodal import frame_dedup_pairs

    rows = [
        # video 1: frames h1, h1 (repeat), h2
        (1, "1" * 64, True), (1, "1" * 64, True), (1, "0" * 64, True),
        # video 2: h1, h2 -> shares 2 with video 1
        (2, "1" * 64, True), (2, "0" * 64, True),
        # video 3: h1 only -> shares 1, below threshold
        (3, "1" * 64, True),
        # video 4: decode failures only
        (4, None, False),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, ahash STRING, decode_ok BOOLEAN")
    got = [(r["video_a"], r["video_b"], r["shared_frames"])
           for r in frame_dedup_pairs(df, min_shared=2).collect()]
    assert got == [(1, 2, 2)]


def test_frame_dedup_pairs_max_bucket_caps_viral_frame(spark):
    """A frame hash shared by more videos than max_bucket (the black-
    frame/intro-card flood) is dropped BEFORE the pair join; genuine
    sharing through other frames survives."""
    from hermod_spark.operators.multimodal import frame_dedup_pairs

    viral = "1" * 64
    rows = []
    for v in range(1, 7):  # 6 videos all share the viral frame
        rows.append((v, viral, True))
    # videos 1 and 2 additionally share two REAL frames
    rows += [(1, "0" * 64, True), (2, "0" * 64, True),
             (1, "01" * 32, True), (2, "01" * 32, True)]
    df = spark.createDataFrame(rows, "doc_id LONG, ahash STRING, decode_ok BOOLEAN")
    capped = [(r["video_a"], r["video_b"], r["shared_frames"])
              for r in frame_dedup_pairs(df, min_shared=2, max_bucket=5).collect()]
    assert capped == [(1, 2, 2)]  # viral frame contributed nothing
    # without the cap the viral frame alone pairs every video with
    # every other (6-choose-2 = 15 at min_shared=1) — the O(bucket^2)
    # expansion the cap exists to stop
    uncapped = frame_dedup_pairs(df, min_shared=1).collect()
    assert len(uncapped) == 15


def test_wav_from_codes_roundtrip_bit_exact():
    """The oracle contract: 16-bit PCM written by wav_from_codes reads
    back as exactly (code - 128) * 256 per sample."""
    import io
    import wave

    import numpy as np

    codes = [0, 32, 127, 128, 129, 255, 64, 200]
    blob = MM.wav_from_codes(codes)
    with wave.open(io.BytesIO(blob), "rb") as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (
            1, 2, 8000,
        )
        raw = w.readframes(w.getnframes())
    got = np.frombuffer(raw, dtype="<i2").tolist()
    assert got == [(c - 128) * 256 for c in codes]


def test_audio_fp_matches_independent_arithmetic():
    """Kernel property: the fingerprint equals the bit string computed
    by independent integer arithmetic over the codes."""
    codes = [min(ord(ch), 255) for ch in "Hello, audio fingerprint!"]
    codes += [32] * (64 - len(codes))
    fp = MM._audio_fp_one(MM.wav_from_codes(codes))
    en = [((c - 128) * 256) ** 2 for c in codes]
    mean = sum(en) / 64
    want = "".join("1" if e >= mean else "0" for e in en)
    assert fp == want and len(fp) == 64 and set(fp) <= {"0", "1"}


def test_audio_fp_rejects_bad_blobs():
    """Contract: corrupt bytes, stereo, 8-bit width, and too-short
    clips all fingerprint to None — dropped, never an abort."""
    import io
    import wave

    assert MM._audio_fp_one(b"not a wav") is None
    assert MM._audio_fp_one(MM.wav_from_codes([32] * 16)) is None  # < 64
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:  # stereo
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 256)
    assert MM._audio_fp_one(buf.getvalue()) is None
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:  # 8-bit
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"\x80" * 128)
    assert MM._audio_fp_one(buf.getvalue()) is None


def test_audio_fingerprint_dedup_and_neardup_reuse(spark):
    """e2e over real WAV bytes: identical clips group under
    ahash_dedup(hash_col='afp'); a 2-bit-perturbed clip pairs with its
    source under ahash_neardup(hash_col='afp'); corrupt bytes drop."""
    base = [min(ord(ch), 255) for ch in "the quick brown fox jumps over it"]
    base += [32] * (64 - len(base))
    # flip the energy ORDER of two samples far from the mean so
    # exactly two fingerprint bits change
    near = list(base)
    near[0], near[1] = 255, 0  # base[0]='t'(116): below-mean -> above
    rows = [
        (1, MM.wav_from_codes(base)),
        (2, MM.wav_from_codes(base)),
        (3, MM.wav_from_codes(near)),
        (4, b"junk"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, content BINARY"
    )
    fp = MM.audio_fingerprint(df)
    got = {r["doc_id"]: r for r in MM.ahash_dedup(fp, hash_col="afp").collect()}
    assert set(got) == {1, 2, 3}  # corrupt row dropped
    assert got[1]["group_size"] == 2 and got[1]["keep"]
    assert got[2]["group_size"] == 2 and not got[2]["keep"]
    assert got[3]["group_size"] == 1
    pairs = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in MM.ahash_neardup(fp, max_hamming=4, hash_col="afp").collect()
    }
    assert (1, 2, 0) in pairs
    near_pairs = {(a, b) for a, b, _ in pairs}
    assert (1, 3) in near_pairs and (2, 3) in near_pairs


def test_ahash_neardup_partitioning_strategy(spark):
    """r14 policy pin (see ahash_neardup): the candidate join never
    forces a bucket-keyed exchange — the only explicit repartition is
    the round-robin re-spread of an under-partitioned checkpointed
    hash frame; the join's own exchange is left to
    ENSURE_REQUIREMENTS + AQE so broadcast conversion and skew-split
    stay available. Pin both regimes via the plan."""
    import random

    from hermod_spark.operators.multimodal import ahash_neardup

    rng = random.Random(7)

    def frame(n):
        rows = [
            (i, "".join(str(rng.randrange(2)) for _ in range(64)), True)
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "doc_id LONG, ahash STRING, decode_ok BOOLEAN"
        )

    # Already-spread input: no explicit repartition of ANY kind — the
    # checkpointed frame keeps its width and the join exchange (if
    # one survives AQE) is planner-inserted, not forced.
    wide_plan = ahash_neardup(frame(50))._jdf.queryExecution().toString()
    assert "REPARTITION_BY_NUM" not in wide_plan
    # Under-partitioned input (the serialized-expansion trap): the
    # checkpointed (id, hash) frame is round-robin re-spread; no
    # bucket-keyed force anywhere — every explicit exchange line is
    # the round-robin one.
    narrow_plan = (
        ahash_neardup(frame(50).coalesce(1))
        ._jdf.queryExecution()
        .toString()
    )
    assert "RoundRobinPartitioning" in narrow_plan
    for line in narrow_plan.splitlines():
        if "REPARTITION_BY_NUM" in line:
            assert "RoundRobinPartitioning" in line, line


def test_wav_from_codes_rejects_out_of_range():
    """Codes outside [0, 383] would wrap in int16 and silently break
    the oracle arithmetic — the synth refuses them loudly."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match=r"\[0, 383\]"):
        MM.wav_from_codes([400])
    with _pytest.raises(ValueError, match=r"\[0, 383\]"):
        MM.wav_from_codes([-1])
    assert MM.wav_from_codes([0, 383])  # boundary values encode fine


def test_hash_dedup_metrics_values(spark):
    """The composed report leg: exact_removable = rows - distinct
    hashes; near_pairs counts banded hamming<=4 pairs over min-id
    representatives only (the funnel's second stage)."""
    rows = [
        (1, "0" * 64, True),
        (2, "0" * 64, True),        # exact dup of 1 -> removable
        (3, "0" * 63 + "1", True),  # hamming 1 from the rep of {1,2}
        (4, None, False),           # decode failure drops
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, ahash STRING, decode_ok BOOLEAN"
    )
    parts = MM.hash_dedup_metrics(df, "image")
    got = {
        r["metric"]: r["value"]
        for p in parts
        for r in p.collect()
    }
    assert got == {"image_exact_removable": 1, "image_near_pairs": 1}


def test_batch_hash_kernels_match_row_kernels():
    """r14 opt round: the vectorized numpy kernels must be
    bit-identical to the per-row synth+hash compositions they replace
    (ahash_text_batch == _ahash_one∘image_tile_blob,
    audio_fp_text_batch == _audio_fp_one∘wav_from_codes) on the
    adversarial corners: empty text, exact-64/65 lengths, codepoints
    above 255, a lone surrogate, NUL bytes, and non-zero offsets."""
    from hermod_spark.operators.multimodal import (
        _ahash_one,
        _audio_fp_one,
        ahash_text_batch,
        audio_fp_text_batch,
        image_tile_blob,
        wav_from_codes,
    )

    texts = [
        "",
        " ",
        "a" * 63,
        "b" * 64,
        "c" * 65,
        "héllo wörld — ünïcode ẞ" * 4,
        "中文\U0001f600 emoji and CJK " * 5,
        "\ud800 lone surrogate",
        "\x00nul\x00bytes\x00",
        "mixed āAＡ widths" * 7,
    ]
    for offset in (0, 64, 128):
        batch = ahash_text_batch(texts, offset)
        rowwise = [
            _ahash_one(image_tile_blob(t[offset : offset + 64]))
            for t in texts
        ]
        assert batch == rowwise, f"ahash mismatch at offset {offset}"
    fp_batch = audio_fp_text_batch(texts)
    fp_rows = []
    for t in texts:
        s = t[:64]
        codes = [min(ord(ch), 255) for ch in s] + [32] * (64 - len(s))
        fp_rows.append(_audio_fp_one(wav_from_codes(codes)))
    assert fp_batch == fp_rows
