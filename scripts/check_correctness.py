"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where present, the matching
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, sorted-by-name schema, and values (rows sorted, columns
sorted by name, floats canonicalised through repr of float64).

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
from pyspark.sql import SparkSession

import __spark_entry__ as E

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
BUDGET_SEC = float(os.environ.get("CHECK_TIMEOUT_SEC", "120"))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def duckdb_connection(sf_dir: str):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(spark, con, fn, sql, sf_dir: str) -> list[str]:
    """Run one Spark query + its oracle SQL; return problem strings
    (empty = parity)."""
    sdf = fn(spark, sf_dir)
    scols, srows = sdf.columns, sdf.collect()
    rel = con.execute(sql)
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    problems: list[str] = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
    if not problems:
        sc = rows_canon(scols, [tuple(r) for r in srows])
        oc = rows_canon(ocols, orows)
        if sc != oc:
            diff = next((i for i, (a, b) in enumerate(zip(sc, oc)) if a != b), None)
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
            try:
                sdf = fn(spark, SF_DIR)
                out["scols"] = sdf.columns
                out["srows"] = sdf.collect()
                if name in oracles:
                    rel = con.execute(oracles[name])
                    out["ocols"] = [d[0] for d in rel.description]
                    out["orows"] = rel.fetchall()
            except Exception as ex:  # noqa: BLE001
                out["err"] = ex
            # no clearJobGroup: the group is thread-local and the
            # worker thread ends here

        t = threading.Thread(target=work, daemon=True)
        t.start()
        t.join(BUDGET_SEC)
        if t.is_alive():
            spark.sparkContext.cancelJobGroup(f"cc-{name}")
            con.interrupt()
            t.join(10)
            print(f"FAIL {name}: timeout (> {BUDGET_SEC:.0f}s budget)")
            n_fail += 1
            continue
        if "err" in out:
            ex = out["err"]
            print(f"FAIL {name}: raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        scols, srows = out["scols"], out["srows"]
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.perf_counter()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        ocols, orows = out["ocols"], out["orows"]
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sc = rows_canon(scols, [tuple(r) for r in srows])
            oc = rows_canon(ocols, orows)
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
            print(f"PASS {name}: {len(srows)} rows ({dt:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
