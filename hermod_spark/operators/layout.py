"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the cheapest shuffle is the one a filter never causes: a
table physically clustered on its filter columns lets parquet
row-group min/max statistics (and partition/file pruning) skip
everything outside the predicate box. Single-column sorting buys
pruning on ONE column and destroys it on the rest; Z-ORDERING
(Morton-curve interleaving — the public technique behind Delta Lake's
OPTIMIZE ZORDER and time-honored in spatial indexing) interleaves the
bits of several columns' scaled ranks so locality is shared across
ALL of them: a range filter on any ordered dimension touches a
bounded band of the curve, hence a bounded set of files.

Spark-first shape: the z-value is ONE scan-side integer expression
(built as a single parsed `F.expr` — the repo's py4j lesson), and the
layout step is `repartitionByRange(zval)` + an intra-partition sort:
exactly the two primitives a lakehouse writer needs, no UDFs, no
driver data. Per-column min/max (the scaling anchors) are a single
bounded 1-row aggregate — the `centroids_of` bounded-model-state
contract; pass them explicitly to keep plan construction lazy or to
pin anchors across incremental writes (new files must share the old
files' scaling or the curve shifts under the reader).

Determinism: the scaled cell is floor((v − min)·(2^bits − 1)/(max −
min)) computed in IEEE double — identical in Spark and DuckDB from
identical inputs — and the interleave is pure integer bit algebra, so
the oracle replays z-values bit-for-bit. Values outside [min, max]
(possible when anchors are pinned from an older snapshot) clamp into
the edge cells, which only degrades their pruning, never correctness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


import re

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _cell_sql(col: str, vmin, vmax, bits: int) -> str:
    """SQL for the scaled integer cell of one column (clamped).
    ``vmin``/``vmax`` are float literals, or raw-SQL strings (the
    oracle anchors from in-query MIN/MAX subselects — identical
    values, identical double arithmetic)."""
    if not _IDENT.match(col):
        # bare identifiers only: the string is shared verbatim with
        # the DuckDB oracle, and the two engines disagree on quoting
        # (backtick vs double-quote)
        raise ValueError(f"zorder: column name {col!r} must be a plain "
                         f"identifier")
    top = (1 << bits) - 1
    if isinstance(vmin, str) or isinstance(vmax, str):
        mn = f"({vmin})" if isinstance(vmin, str) else repr(float(vmin))
        mx = f"({vmax})" if isinstance(vmax, str) else repr(float(vmax))
        # the degenerate-range guard must live IN the SQL here (the
        # anchors are runtime subselects): a constant column would
        # otherwise divide by zero where the float-literal branch
        # emits the constant-0 cell (r13 review)
        return (
            f"CAST(CASE WHEN {mx} <= {mn} THEN 0 ELSE "
            f"LEAST({top}.0, GREATEST(0.0, FLOOR((CAST({col} AS "
            f"DOUBLE) - {mn}) * {top}.0 / ({mx} - {mn})))) END AS BIGINT)"
        )
    if vmax <= vmin:
        return "CAST(0 AS BIGINT)"  # constant column: one cell
    return (
        f"CAST(LEAST({top}.0, GREATEST(0.0, FLOOR((CAST({col} AS DOUBLE)"
        f" - {vmin!r}) * {top}.0 / ({vmax!r} - {vmin!r})))) AS BIGINT)"
    )


def zorder_sql(
    cols: list[str],
    mins: list,
    maxs: list,
    bits: int = 16,
) -> str:
    """The full z-value SQL: per-column scaled cells, bits interleaved
    round-robin (column j contributes bit i at position i·n_cols + j).
    ONE string shared verbatim between Spark and the DuckDB oracle —
    both engines parse the <<, >>, & operator forms (Spark 4 added
    the operators; DuckDB has no shiftleft/shiftright functions)."""
    n = len(cols)
    if not (1 <= n * bits <= 62):
        raise ValueError(
            f"zorder_sql: {n} cols × {bits} bits = {n * bits} interleaved "
            f"bits must fit a signed 64-bit value"
        )
    cells = [
        f"({_cell_sql(c, mi, ma, bits)})"
        for c, mi, ma in zip(cols, mins, maxs)
    ]
    terms = []
    for j, cell in enumerate(cells):
        for i in range(bits):
            terms.append(f"((({cell} >> {i}) & 1) << {i * n + j})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_value(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    anchors: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """The z-value Column for ``df``. ``anchors`` pins per-column
    (min, max) scaling; omitted columns anchor from ONE bounded 1-row
    aggregate over ``df`` (an eager driver action — pass anchors to
    stay lazy, and ALWAYS pass the original anchors when laying out
    incremental snapshots of an existing table). Columns must be
    NUMERIC: the cell scaling is CAST(col AS DOUBLE), and non-numeric
    casts (timestamps, strings) follow engine-specific rules the
    shared-SQL contract can't honor — bucket such columns to ints
    first (epoch seconds, dictionary codes)."""
    anchors = dict(anchors or {})
    missing = [c for c in cols if c not in anchors]
    if missing:
        aggs = []
        for c in missing:
            aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
        row = df.agg(*aggs).first()
        for c in missing:
            mn, mx = row[f"_mn_{c}"], row[f"_mx_{c}"]
            if mn is None:
                raise ValueError(f"zorder_value: column {c!r} is all-null")
            anchors[c] = (float(mn), float(mx))
    mins = [anchors[c][0] for c in cols]
    maxs = [anchors[c][1] for c in cols]
    return F.expr(zorder_sql(cols, mins, maxs, bits))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    n_files: int | None = None,
    anchors: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """``df`` re-clustered along the Morton curve of ``cols``: range
    partitioning on the z-value (one skew-aware sampled shuffle —
    Spark's RangePartitioner) + an intra-partition sort, so each
    output file covers a contiguous curve segment and its row-group
    stats form tight boxes on EVERY z-ordered column. Write the
    result with plain ``.write.parquet`` — the layout IS the
    optimization; readers need nothing special."""
    z = zorder_value(df, cols, bits=bits, anchors=anchors)
    out = df.withColumn("_z", z)
    out = (
        out.repartitionByRange(n_files, "_z")
        if n_files is not None
        else out.repartitionByRange("_z")
    )
    return out.sortWithinPartitions("_z").drop("_z")
