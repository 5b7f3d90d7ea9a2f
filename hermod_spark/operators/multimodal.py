"""Multimodal column conventions: opaque binary payloads + typed
metadata, with Arrow-batched decode/feature plumbing.

Convention (what a 100 TB multimodal corpus table looks like here):

    content        BINARY          -- the raw image/audio/video bytes
    content_type   STRING          -- MIME, e.g. 'image/png'
    content_meta   STRUCT<width INT, height INT, n_channels INT,
                          duration_ms BIGINT, sample_rate INT>

Rows are processed with ``mapInPandas`` — Arrow ships the binary
column to Python in columnar batches, the decode loop runs per batch
(not per row), and the output schema is declared up front so Catalyst
plans around it. Partitioning guidance: blobs dominate row size, so
size ``spark.sql.files.maxPartitionBytes`` to keep ~128 MB of blob per
task and never collect() the content column.

The actual codecs (Pillow/ffmpeg/torchaudio) are NOT in this
container, so the decode kernel is a deterministic fake — it parses
our synthetic header instead of a real PNG — clearly marked below.
The Spark-side plumbing (schema, batching, signature) is real and
tested; swapping in a real codec changes only `_decode_one`."""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hermod_spark.data import ensure_min_partitions

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("content", T.BinaryType()),
        T.StructField("content_type", T.StringType()),
        T.StructField(
            "content_meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_channels", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

# synthetic blob format: b'HSPK' + u16 width + u16 height + u8 channels + body
_MAGIC = b"HSPK"


def fake_image_blob(width: int, height: int, channels: int = 3, seed: bytes = b"") -> bytes:
    """Deterministic synthetic blob for tests (stands in for a PNG)."""
    body = hashlib.sha256(seed or struct.pack("<HHB", width, height, channels)).digest()
    return _MAGIC + struct.pack("<HHB", width, height, channels) + body


def _decode_one(blob: bytes) -> tuple[int, int, int, float] | None:
    """FAKE DECODER — parses the synthetic HSPK header. A real
    deployment replaces this with e.g. PIL.Image.open(BytesIO(blob));
    nothing else in the operator changes."""
    if blob is None or len(blob) < 9 or blob[:4] != _MAGIC:
        return None
    w, h, c = struct.unpack("<HHB", blob[4:9])
    mean = sum(blob[9:]) / max(len(blob) - 9, 1) / 255.0
    return w, h, c, mean


DECODED_FIELDS = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def decode_images(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched decode: (id, content) → (id, width, height,
    n_channels, mean_intensity, decode_ok). Corrupt/foreign blobs yield
    decode_ok=false rows, never a job abort."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + list(DECODED_FIELDS.fields)
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                dec = _decode_one(bytes(blob) if blob is not None else None)
                if dec is None:
                    rows.append((i, None, None, None, None, False))
                else:
                    rows.append((i, *dec[:3], dec[3], True))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "n_channels", "mean_intensity", "decode_ok"],
            )

    # parallelize the Python decode stage even off a single-file scan
    return (
        ensure_min_partitions(df)
        .select(id_col, content_col)
        .mapInPandas(batches, out_schema)
    )


def resize_plan(df: DataFrame, max_side: int = 512, id_col: str = "doc_id") -> DataFrame:
    """Resize planning (pure metadata math, native exprs): target dims
    preserving aspect ratio, capped at max_side — the shuffle-free
    prelude to a real resize kernel."""
    w = F.col("content_meta.width")
    h = F.col("content_meta.height")
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h).cast("double"))
    return df.select(
        id_col,
        w.alias("width"),
        h.alias("height"),
        F.ceil(w * scale).cast("int").alias("target_width"),
        F.ceil(h * scale).cast("int").alias("target_height"),
    )


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp
    (explode of a native sequence — the N-rows-per-input shape without
    any Python)."""
    dur = F.col("content_meta.duration_ms")
    return df.filter(dur.isNotNull()).select(
        id_col,
        F.explode(F.sequence(F.lit(0), dur - 1, F.lit(every_ms))).alias("frame_ts_ms"),
    )


def audio_chunk_plan(
    df: DataFrame, window_ms: int = 5000, id_col: str = "doc_id"
) -> DataFrame:
    """Audio chunking plan: fixed windows over duration, each with its
    sample span (start sample inclusive, end exclusive) derived from
    ``content_meta.sample_rate`` — the shuffle-free prelude to a
    decode/feature kernel; the final partial window is kept."""
    dur = F.col("content_meta.duration_ms")
    sr = F.col("content_meta.sample_rate")
    chunked = df.filter(dur.isNotNull() & sr.isNotNull()).select(
        id_col,
        sr.alias("_sr"),
        dur.alias("_dur"),
        F.explode(F.sequence(F.lit(0), dur - 1, F.lit(window_ms))).alias("chunk_start_ms"),
    )
    end_ms = F.least(F.col("chunk_start_ms") + window_ms, F.col("_dur"))
    return chunked.select(
        id_col,
        "chunk_start_ms",
        end_ms.alias("chunk_end_ms"),
        (F.col("chunk_start_ms") * F.col("_sr") / 1000).cast("bigint").alias("start_sample"),
        (end_ms * F.col("_sr") / 1000).cast("bigint").alias("end_sample"),
    )


AUDIO_FEATURES = T.StructType(
    [
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def extract_audio_features(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched audio feature extraction — same plumbing as
    decode_images. FAKE KERNEL: interprets the synthetic HSPK body as
    unsigned 8-bit samples (a real deployment swaps in soundfile/
    torchaudio; schema, batching, and error behavior stay as-is).
    Corrupt blobs yield decode_ok=false rows, never a job abort."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + list(AUDIO_FEATURES.fields)
    )

    def batches(it):
        for pdf in it:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob) if blob is not None else None
                if b is None or len(b) <= 9 or b[:4] != _MAGIC:
                    rows.append((i, None, None, False))
                    continue
                samples = b[9:]
                rms = (sum(x * x for x in samples) / len(samples)) ** 0.5 / 255.0
                rows.append((i, len(samples), rms, True))
            yield pd.DataFrame(rows, columns=[id_col, "n_samples", "rms", "decode_ok"])

    return (
        ensure_min_partitions(df)
        .select(id_col, content_col)
        .mapInPandas(batches, out_schema)
    )


def batch_plan(
    df: DataFrame,
    batch_size: int = 32,
    max_side: int = 512,
    id_col: str = "doc_id",
) -> DataFrame:
    """Aspect-bucket batch packing — the image-training batching trick:
    images resized to the same target dims are grouped, and each group
    is cut into fixed-size training batches with a stable in-batch
    position. Same-shape batches are what lets the training collator
    stack tensors without padding.

    Scale shape: :func:`resize_plan` stays scan-side; the only shuffle
    is the per-(target_w, target_h) rank window — partitions are
    resolution buckets (bounded by the dims grid, each hash-spread),
    and the window carries metadata rows, never pixel blobs."""
    from pyspark.sql import Window

    plan = resize_plan(df, max_side, id_col)
    w = Window.partitionBy("target_width", "target_height").orderBy(
        F.col(id_col).asc()
    )
    rn = F.row_number().over(w)
    return plan.select(
        id_col,
        "target_width",
        "target_height",
        F.floor((rn - 1) / batch_size).cast("int").alias("batch_id"),
        ((rn - 1) % batch_size).cast("int").alias("batch_pos"),
    )
