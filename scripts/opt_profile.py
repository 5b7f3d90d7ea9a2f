"""r14/r15 optimization profiler: per-query cost breakdown + plan capture.

For each named query (default: the bench HEADLINE set) at
$SPARK_GRAFT_SF_DIR this measures, with the bench's session config:

  - construct  seconds to build the DataFrame (py4j expression
               construction + any eager localCheckpoint jobs)
  - plan       seconds for queryExecution().executedPlan() on a fresh
               build (analysis + optimization + physical planning)
  - count x3   the bench methodology (build + .count()), best of 3
  - noop       build + noop-sink write (computes EVERY column), best
               of 2 — guide §1.4's isolation of computation from the
               count-pruned action

and writes plans/r14/<query>_before.txt (explain formatted) unless the
file already exists (pass --after to write _after.txt instead).

Usage: python scripts/opt_profile.py [--after] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from bench import HEADLINE  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLAN_DIR = os.path.join(HERE, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r15"))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    suffix = "_before"
    if "--after" in args:
        suffix = "_after"
        args.remove(args[args.index("--after")])
    names = args or HEADLINE

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("hermod-opt-profile")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(PLAN_DIR, exist_ok=True)

    queries = E.queries()
    # bench-identical warmup
    queries["rel_recent_events"](spark, SF_DIR).count()
    import pandas as _pd

    def _noop_py(it):
        for pdf in it:
            yield _pd.DataFrame({"x": [len(pdf)]})

    spark.range(0, CPUS, 1, CPUS).mapInPandas(_noop_py, "x LONG").count()
    warm_sf = "/root/testdata/sf0.001"
    for name in names:
        try:
            queries[name](spark, warm_sf).count()
        except Exception as ex:  # noqa: BLE001
            print(f"# warmup {name} failed: {ex}", file=sys.stderr)

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        row: dict[str, float] = {}
        t0 = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        row["construct"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        plan = df._jdf.queryExecution().executedPlan().toString()
        row["plan"] = time.perf_counter() - t0
        # capture explain(formatted) once per query
        fn = os.path.join(PLAN_DIR, f"{name}{suffix}.txt")
        if not os.path.exists(fn):
            try:
                formatted = (
                    df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                )
            except Exception:
                formatted = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            with open(fn, "w", encoding="utf-8") as fh:
                fh.write(formatted.replace("\x00", "\\x00"))
        import re as _re

        row["n_exchange"] = len(
            _re.findall(r"Exchange (hash|range|Round|Single)", plan)
        )
        row["n_scan"] = len(_re.findall(r"FileScan parquet", plan))
        row["n_python"] = len(_re.findall(r"EvalPython|MapInPandas", plan))
        best = float("inf")
        tracker = spark.sparkContext.statusTracker()
        for r in range(3):
            grp = f"prof-{name}-{r}"
            spark.sparkContext.setJobGroup(grp, name)
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            if dt < best:
                best = dt
                row["n_jobs"] = len(tracker.getJobIdsForGroup(grp))
        spark.sparkContext._jsc.clearJobGroup()
        row["count3"] = best
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        row["noop2"] = best
        out[name] = {
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in row.items()
        }
        print(
            f"# {name}: construct={row['construct']:.2f} plan={row['plan']:.2f} "
            f"count3={row['count3']:.2f} noop2={row['noop2']:.2f} "
            f"ex={row['n_exchange']} scan={row['n_scan']} py={row['n_python']}",
            file=sys.stderr,
        )
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
