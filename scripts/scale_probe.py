"""Real data-scale-decade probe: sf0.1 vs locally-synthesized sf1.

The 45 bench scale10x probes amplify rows IN MEMORY within sf0.1;
this crosses an actual on-disk decade (VERDICT r12 #5): every query
runs unchanged against the sf1 parquet dir from make_sf1.py, so scan
planning, pushdown, and shuffle sizing all see 10x the bytes.

Reports sec and per-row ratio t10/(10*t1) per query (1x side
best-of-2 warm, 10x single run, the scale10x convention). Index-served
queries (text_bm25_indexed, sim_knn_incremental) pre-build their sf1
index outside the timed run — the index is a persisted artifact, the
probe times SERVE. sim_knn_join additionally runs the documented
log-scaled-banding remedy (planes grow ceil(log2) with N) so the
fixed-banding ratio and the scale-path ratio are both on record.

Usage: python scripts/scale_probe.py [sf1dir]  -> markdown table on stdout
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402

SF1X = "/root/testdata/sf0.1"

QUERIES = [
    "sim_knn_join",
    "sim_knn_incremental",
    "text_bm25_indexed",
    "rel_pagerank",
    "rel_pagerank_weighted",
    "rel_sssp",
    "rel_components",
    "rel_communities",
    "dedup_linkage",
    "dedup_report",
    "mm_dedup_report",
    "cur_funnel",
]


def main() -> None:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hermod-sf1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = E.queries()

    import pandas as _pd

    def _noop(it):
        for pdf in it:
            yield _pd.DataFrame({"x": [len(pdf)]})

    spark.range(0, 32, 1, 32).mapInPandas(_noop, "x LONG").count()

    # pre-build persisted indexes at BOTH scales (artifact, not query)
    for sf in (SF1X, sf10):
        q["text_bm25_indexed"](spark, sf).count()
        q["sim_knn_incremental"](spark, sf).count()

    rows = []
    for name in QUERIES:
        t1 = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            q[name](spark, SF1X).count()
            t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        n10 = q[name](spark, sf10).count()
        t10 = time.perf_counter() - t0
        ratio = t10 / (10.0 * t1)
        rows.append((name, t1, t10, n10, ratio))
        print(
            f"# {name}: t1={t1:.2f}s t10={t10:.2f}s rows10={n10} "
            f"per-row {ratio:.2f}x",
            file=sys.stderr,
        )

    # the knn scale path: planes grow with ceil(log2 N) — 4 -> 8 at 10x
    from hermod_spark.data import table
    from hermod_spark.operators import similarity as S

    t1 = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        S.knn_join(
            table(spark, SF1X, "embeddings"), k=E._TOPK,
            n_planes=4, n_bands=8, dim=E._EMB_DIM,
        ).count()
        t1 = min(t1, time.perf_counter() - t0)
    t0 = time.perf_counter()
    n10 = S.knn_join(
        table(spark, sf10, "embeddings"), k=E._TOPK,
        n_planes=8, n_bands=8, dim=E._EMB_DIM,
    ).count()
    t10 = time.perf_counter() - t0
    rows.append(("sim_knn_join (planes 4->8 scale path)", t1, t10, n10,
                 t10 / (10.0 * t1)))

    print("| query | t(sf0.1) s | t(sf1) s | rows(sf1) | per-row ratio |")
    print("|---|---|---|---|---|")
    for name, t1, t10, n10, ratio in rows:
        print(f"| {name} | {t1:.2f} | {t10:.2f} | {n10} | {ratio:.2f}x |")


if __name__ == "__main__":
    main()
