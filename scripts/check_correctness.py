"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where present, the matching
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, sorted-by-name schema, and values. BOTH sides are fetched
through pandas (``sdf.toPandas()`` / ``cur.df()``) and canonicalised
from pandas dtypes, because that is what the driver's canon does
(VERDICT r5 "What's wrong" #3): the old ``fetchall()`` path returned
Python ints for DuckDB HUGEINT and serialized lists itself, so it was
structurally blind to the two classes that produced every r5 driver-red
row — uncast SUM() rendering float64 ``3.0`` vs bigint ``3``, and raw
array columns that make pandas' multi-column sort throw
``TypeError: unhashable type: 'numpy.ndarray'``.

A static SURFACE lint runs before the value compare and fails any query
whose Spark schema contains array/map/struct columns or whose
oracle-through-pandas dtype disagrees with the Spark-through-pandas
dtype (the judge's version of this scan found all 6 r5 reds + 2 latents
with zero false positives).

Each query (Spark run + oracle run + compare) gets a wall-clock budget
(``CHECK_TIMEOUT_SEC``, default 120 s): on breach the Spark job group is
cancelled, the DuckDB query interrupted, and the gate emits one
``FAIL <name>: timeout`` row and moves on — a single pathological query
can never blank the whole file again (VERDICT r4 #2: text_winnow hung
the driver's gate at query #19 and produced an empty CORRECTNESS_r04).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as E

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
BUDGET_SEC = float(os.environ.get("CHECK_TIMEOUT_SEC", "120"))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def cell_canon(v):
    """Pandas cell -> canonical string. Deliberately dtype-sensitive:
    np.float64(3.0) -> '3.0' but np.int64(3) -> '3', so an oracle-side
    HUGEINT->float64 coercion mismatches exactly as it does in the
    driver's canon."""
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (np.ndarray, list, tuple, dict)):
        # mirror the driver: container cells are not a legal surface
        raise TypeError(f"unhashable type: '{type(v).__name__}'")
    return str(v)


def pdf_canon(pdf: pd.DataFrame) -> list[str]:
    """Driver-style canon: columns sorted by name, rows sorted by ALL
    columns (pandas multi-column sort — throws on ndarray cells, same
    as the driver), cells rendered dtype-sensitively."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns) and len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return [
        "|".join(cell_canon(c) for c in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


_CONTAINER_TYPES = ("array<", "map<", "struct<")


def surface_lint(sdf_schema, spdf: pd.DataFrame, opdf: pd.DataFrame) -> list[str]:
    """Static canon-contract lint (VERDICT r5 fix #3): no container
    columns on the Spark surface; pandas dtypes must agree between the
    Spark result and the oracle result column-by-column."""
    problems = []
    for f in sdf_schema.fields:
        t = f.dataType.simpleString()
        if t.startswith(_CONTAINER_TYPES):
            problems.append(f"SURFACE spark column {f.name!r} is {t}")
    for c in sorted(set(spdf.columns) & set(opdf.columns)):
        sd, od = spdf[c].dtype, opdf[c].dtype
        # Compare dtype KIND, not width: int32 vs int64 both render '3'
        # (no driver hash risk), but float-vs-int is exactly the
        # HUGEINT / CUBE-null class, and object-vs-datetime is the
        # date-surface class.
        if sd.kind != od.kind:
            problems.append(f"SURFACE dtype mismatch {c!r}: spark={sd} oracle={od}")
    return problems


def duckdb_connection(sf_dir: str):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(spark, con, fn, sql, sf_dir: str) -> list[str]:
    """Run one Spark query + its oracle SQL through the driver-faithful
    pandas canon; return problem strings (empty = parity). Used by
    tests/test_oracle_parity.py as the in-suite gate."""
    sdf = fn(spark, sf_dir)
    spdf = sdf.toPandas()
    opdf = con.execute(sql).df()
    return compare_frames(sdf.schema, spdf, opdf)


def compare_frames(sdf_schema, spdf, opdf) -> list[str]:
    """The pure compare half of :func:`compare_query` — both sides
    already fetched through pandas. Split out so callers can overlap
    the fetches (the in-suite parity gate runs them from a thread
    pool, guide §2.6) without duplicating the canon."""
    problems: list[str] = []
    if len(spdf) != len(opdf):
        problems.append(f"rowcount spark={len(spdf)} oracle={len(opdf)}")
    if sorted(spdf.columns) != sorted(opdf.columns):
        problems.append(
            f"schema spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}"
        )
    if not problems:
        problems.extend(surface_lint(sdf_schema, spdf, opdf))
    if not problems:
        try:
            sc, oc = pdf_canon(spdf), pdf_canon(opdf)
        except TypeError as ex:
            problems.append(f"canon raised {type(ex).__name__}: {ex}")
        else:
            if sc != oc:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sc, oc)) if a != b), None
                )
                msg = "values differ"
                if diff is not None:
                    msg += f" @row {diff}: spark={sc[diff][:200]} oracle={oc[diff][:200]}"
                problems.append(msg)
    return problems


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb_connection(SF_DIR)

    qs = E.queries()
    oracles = E.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.perf_counter()
        out: dict[str, object] = {}

        def work(name=name, fn=fn, out=out):
            # Own job group so the watchdog can cancel mid-collect
            # (pinned-thread mode: job group is per-Python-thread).
            spark.sparkContext.setJobGroup(f"cc-{name}", name, True)
            # Own DuckDB cursor so a zombie worker surviving its grace
            # join cannot interleave with the next query's oracle run
            # (ADVICE r5): cursors share the catalog, not the lock.
            cur = con.cursor()
            try:
                sdf = fn(spark, SF_DIR)
                out["schema"] = sdf.schema
                out["spdf"] = sdf.toPandas()
                if name in oracles:
                    out["opdf"] = cur.execute(oracles[name]).df()
            except Exception as ex:  # noqa: BLE001
                out["err"] = ex
            finally:
                cur.close()
            # no clearJobGroup: the group is thread-local and the
            # worker thread ends here

        t = threading.Thread(target=work, daemon=True)
        t.start()
        t.join(BUDGET_SEC)
        if t.is_alive():
            spark.sparkContext.cancelJobGroup(f"cc-{name}")
            con.interrupt()
            t.join(10)
            if t.is_alive():
                # zombie worker still holds the old connection's lock:
                # abandon that connection entirely (ADVICE r5)
                con = duckdb_connection(SF_DIR)
            print(f"FAIL {name}: timeout (> {BUDGET_SEC:.0f}s budget)")
            n_fail += 1
            continue
        if "err" in out:
            ex = out["err"]
            print(f"FAIL {name}: raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        spdf = out["spdf"]
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spdf)} rows ({time.perf_counter()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        opdf = out["opdf"]
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} oracle={len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(
                f"schema spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}"
            )
        if not problems:
            problems.extend(surface_lint(out["schema"], spdf, opdf))
        if not problems:
            try:
                sc = pdf_canon(spdf)
                oc = pdf_canon(opdf)
            except TypeError as ex:
                # same failure the driver's canon produces on container
                # cells — belt to the surface lint's suspenders
                problems.append(f"canon raised {type(ex).__name__}: {ex}")
            else:
                if sc != oc:
                    diff = next(
                        (i for i, (a, b) in enumerate(zip(sc, oc)) if a != b), None
                    )
                    msg = "values differ"
                    if diff is not None:
                        msg += f" @sorted-row {diff}:\n  spark : {sc[diff][:300]}\n  oracle: {oc[diff][:300]}"
                    problems.append(msg)
        dt = time.perf_counter() - t0
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(spdf)} rows ({dt:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
