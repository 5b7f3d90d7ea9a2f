"""Small-file compaction for streaming parquet sinks.

Micro-batch appends accumulate small files (one+ per batch per
partition); scan efficiency degrades with file count. Compaction
rewrites ONE partition directory at a time into ``target_files``
right-sized files: read partition → coalesce → write to a sibling tmp
dir → atomic directory swap. Partition-scoped rewrites keep the unit
of work bounded (never "rewrite the table") and the swap keeps readers
consistent — the same contract Delta/Iceberg's OPTIMIZE gives, done
manually for plain parquet.
"""

from __future__ import annotations

import os
import shutil
import uuid


def parquet_file_count(path: str) -> int:
    return sum(
        1
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def compact_directory(spark, path: str, target_files: int = 1) -> dict:
    """Rewrite one directory of parquet files into ``target_files``."""
    before = parquet_file_count(path)
    if before <= target_files:
        return {"path": path, "files_before": before, "files_after": before, "skipped": True}
    df = spark.read.parquet(path)
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "path": path,
        "files_before": before,
        "files_after": parquet_file_count(path),
        "skipped": False,
    }


def compact_table(
    spark,
    base_path: str,
    table: str,
    partition_col: str | None = None,
    *,
    min_files: int = 8,
    target_files: int = 1,
) -> list[dict]:
    """Compact every partition directory (or the whole unpartitioned
    table dir) holding more than ``min_files`` parquet files."""
    root = os.path.join(base_path, table)
    if partition_col is None:
        dirs = [root]
    else:
        prefix = f"{partition_col}="
        dirs = [
            os.path.join(root, d)
            for d in sorted(os.listdir(root))
            if d.startswith(prefix) and os.path.isdir(os.path.join(root, d))
        ]
    results = []
    for d in dirs:
        if parquet_file_count(d) > min_files:
            results.append(compact_directory(spark, d, target_files))
    return results


def zorder_key(x, y, bits: int = 16):
    """Morton/Z-order interleave of two PRE-BUCKETED ints — the layout
    clustering key behind lakehouse OPTIMIZE ZORDER: sorting (and then
    range-partitioning files) by the interleaved key co-locates rows
    that are close in BOTH dimensions, so two-column range predicates
    prune file-level min/max stats instead of scanning everything.

    The GENERALIZED form lives in ``operators/layout.py`` (r13):
    N columns, automatic min/max cell scaling with pinnable anchors,
    one parsed expression, and ``zorder_layout`` doing the
    range-partition + sort — with the pruning claim MEASURED from
    parquet footers in tests/test_layout.py. This two-int form stays
    for callers that already hold bucket ids (bit-identical to the
    generalized form on identity anchors — pinned by test).

    Pure native bit math (2·bits shift/mask/or terms in one codegen
    projection, zero Python, zero shuffle) — the key computation adds
    nothing to the write path; the clustering sort the caller does with
    it is the same exchange a plain sorted write already pays."""
    from pyspark.sql import functions as F

    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(xc, b).bitwiseAND(F.lit(1)), 2 * b))
            .bitwiseOR(
                F.shiftleft(F.shiftright(yc, b).bitwiseAND(F.lit(1)), 2 * b + 1)
            )
        )
    return z
