"""Isolated interleaved A/B profiler for the graph family (r15).

Reproduces the bench session + the bench's 10x graph inputs, then times
query variants with the noop sink, interleaved A/B per guide SS1.4/SS1.5
and the bench-timing-eras rule (same session, alternate variants,
compare medians).

Usage: python scripts/prof_graph.py <mode> [reps]
  modes: locate (leg-by-leg cost of rel_cooccurrence 10x),
         base (purchase-graph construction variants at 10x),
         coocw (rel_cooccurrence_weighted lazy-ckpt A/B at 1x and 10x)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import bench
import __spark_entry__ as E

SF_DIR = bench.SF_DIR


def session():
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("prof-graph")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def noop_time(build, desc):
    """Time CONSTRUCTION + noop execution together — eager checkpoints
    run Spark jobs at construction, so timing only the sink would bias
    any eager-vs-lazy comparison."""
    t0 = time.perf_counter()
    df = build()
    df.sparkSession.sparkContext.setJobDescription(desc)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    df.sparkSession.sparkContext.setJobDescription(None)
    return dt


def interleave(variants: dict, reps: int, spark=None):
    """variants: name -> zero-arg DataFrame builder. Runs reps rounds,
    alternating variants inside each round with a bench-identical
    quiesce between runs; prints per-run times and median/tail per
    variant."""
    times = {k: [] for k in variants}
    for r in range(reps):
        for name, build in variants.items():
            if spark is not None:
                bench._quiesce(spark)
            dt = noop_time(build, f"{name}#r{r}")
            times[name].append(dt)
            print(f"  run {r} {name}: {dt:.3f}s", flush=True)
    print("--- medians ---")
    for name, ts in times.items():
        print(
            f"  {name}: median={statistics.median(ts):.3f} "
            f"min={min(ts):.3f} max={max(ts):.3f} n={len(ts)}"
        )
    return times


def graph_inputs(spark):
    lineitem10 = bench._lineitem_10x(spark)
    orders10g = bench._stack10(spark, "orders", ["o_orderkey", "o_custkey"])
    orders10g.count()
    lineitem10.count()
    return lineitem10, orders10g


def mode_locate(spark, reps):
    """Leg-by-leg cost of the rel_cooccurrence 10x probe."""
    from hermod_spark.operators.graph import neighbor_jaccard

    lineitem10, orders10g = graph_inputs(spark)

    def raw_edges():
        return lineitem10.select("l_orderkey", "l_suppkey").join(
            orders10g.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).select(
            F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst")
        )

    legs = {
        "full": lambda: neighbor_jaccard(
            raw_edges(), min_shared=3, max_src_degree=200
        ),
        "edges_join_only": raw_edges,
        "edges_distinct": lambda: raw_edges()
        .select(F.col("src").alias("_c"), F.col("dst").alias("_s"))
        .distinct(),
        "pairs_agg": lambda: _pairs_agg(raw_edges()),
    }
    interleave(legs, reps, spark)
    # row counts for context (once)
    e = (
        raw_edges()
        .select(F.col("src").alias("_c"), F.col("dst").alias("_s"))
        .distinct()
    )
    print("distinct edges:", e.count())
    print(
        "pairs (shared>=3):",
        _pairs_agg(raw_edges()).count(),
    )


def _pairs_agg(raw):
    e = (
        raw.select(F.col("src").alias("_c"), F.col("dst").alias("_s"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ok = (
        e.groupBy("_c")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= 200)
        .select("_c")
    )
    joined = e.join(ok, "_c")
    a = joined.select(F.col("_c"), F.col("_s").alias("node_a"))
    b = joined.select(F.col("_c"), F.col("_s").alias("node_b"))
    return (
        a.join(b, "_c")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 3)
    )


def mode_base(spark, reps):
    """Purchase-graph construction + pagerank variants at 10x."""
    from hermod_spark.operators.graph import pagerank

    lineitem10, orders10g = graph_inputs(spark)

    def pairs_current():
        return (
            lineitem10.select("l_orderkey", "l_suppkey")
            .join(
                orders10g.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select(
                (F.col("o_custkey") * 2).alias("c"),
                (F.col("l_suppkey") * 2 + 1).alias("s"),
            )
            .distinct()
        )

    def edges_union():
        p = pairs_current()
        return p.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
            p.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        )

    def edges_explode():
        p = pairs_current()
        return p.select(
            F.explode(
                F.array(
                    F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                    F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
                )
            ).alias("_e")
        ).select("_e.src", "_e.dst")

    variants = {
        "pr_union": lambda: pagerank(edges_union(), iterations=8),
        "pr_explode": lambda: pagerank(edges_explode(), iterations=8),
        "edges_union": edges_union,
        "edges_explode": edges_explode,
    }
    interleave(variants, reps, spark)


def mode_coocw(spark, reps, at10x=False):
    """rel_cooccurrence_weighted with/without the lazy edge ckpt."""
    from hermod_spark.data import table
    from hermod_spark.operators.graph import (
        PAGERANK_SUM_DECIMAL,
        _nonneg_weight,
    )

    if at10x:
        li10, orders10g = graph_inputs(spark)
        li = li10.select("l_orderkey", "l_suppkey", "l_quantity")
        orders = orders10g.select("o_orderkey", "o_custkey")
    else:
        li = table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_quantity"
        )
        orders = table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey"
        )

    def raw():
        return li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).select(
            F.col("o_custkey").alias("src"),
            F.col("l_suppkey").alias("dst"),
            F.col("l_quantity").alias("w"),
        )

    def jacc(ckpt: str):
        edges = raw()
        w_expr = _nonneg_weight(
            F.col("w").cast(PAGERANK_SUM_DECIMAL), "neighbor_jaccard"
        )
        e = (
            edges.select(
                F.col("src").alias("_c"),
                F.col("dst").alias("_s"),
                w_expr.alias("_w"),
            )
            .groupBy("_c", "_s")
            .agg(F.sum("_w").alias("_w"))
        )
        if ckpt == "lazy":
            e = e.localCheckpoint(eager=False)
        elif ckpt == "eager":
            e = e.localCheckpoint()
        deg = e.groupBy("_s").agg(F.sum("_w").alias("_deg"))
        ok = (
            e.groupBy("_c")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= 200)
            .select("_c")
        )
        joined = e.join(ok, "_c")
        a = joined.select(
            F.col("_c"), F.col("_s").alias("node_a"), F.col("_w").alias("_wa")
        )
        b = joined.select(
            F.col("_c"), F.col("_s").alias("node_b"), F.col("_w").alias("_wb")
        )
        shared = (
            a.join(b, "_c")
            .filter(F.col("node_a") < F.col("node_b"))
            .groupBy("node_a", "node_b")
            .agg(
                F.count(F.lit(1)).alias("shared"),
                F.sum(F.least("_wa", "_wb")).alias("_minsum"),
            )
            .filter(F.col("shared") >= 3)
        )
        overlap = F.col("_minsum")
        da = deg.select(F.col("_s").alias("node_a"), F.col("_deg").alias("_da"))
        db = deg.select(F.col("_s").alias("node_b"), F.col("_deg").alias("_db"))
        return (
            shared.join(da, "node_a")
            .join(db, "node_b")
            .select(
                "node_a",
                "node_b",
                "shared",
                (
                    overlap.cast("double")
                    / (F.col("_da") + F.col("_db") - overlap).cast("double")
                ).alias("jaccard"),
            )
        )

    variants = {
        "lazy_ckpt": lambda: jacc("lazy"),
        "no_ckpt": lambda: jacc("none"),
        "eager_ckpt": lambda: jacc("eager"),
    }
    interleave(variants, reps, spark)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "locate"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = session()
    # warm like the bench does
    E.queries()["rel_recent_events"](spark, SF_DIR).count()
    modes = {
        "locate": mode_locate,
        "base": mode_base,
        "coocw": mode_coocw,
        "coocw10": lambda s, r: mode_coocw(s, r, at10x=True),
    }
    modes[mode](spark, reps)
    spark.stop()


if __name__ == "__main__":
    main()
