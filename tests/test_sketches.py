

def test_kmv_pairwise_overlap_tracks_exact(spark):
    """Estimator quality gate (Beyer et al. 2007, k=64): across all
    190 source pairs at sf0.01, the Jaccard estimate tracks the exact
    shingle Jaccard (measured MAE 0.016, max 0.081) and the union
    estimate tracks the exact union size (rel MAE 0.083, max 0.244).
    Thresholds carry ~2x margin; a hashing or merge bug blows them."""
    import statistics as st

    from pyspark.sql import functions as F

    from hermod_spark.data import table
    from hermod_spark.functions import text as X
    from hermod_spark.operators.sketches import kmv_pairwise_overlap

    docs = table(spark, "/root/testdata/sf0.01", "documents")
    sh = docs.select("source", F.explode(X.ngrams("text", 3)).alias("sh"))
    est = {
        (r["source_a"], r["source_b"]): r
        for r in kmv_pairwise_overlap(sh, "source", "sh", 64).collect()
    }
    d = sh.distinct()
    inter = (
        d.alias("a")
        .join(
            d.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
        )
        .count()
    )
    nd = {
        r["source"]: r["n"]
        for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    exact = {}
    for r in inter.collect():
        u = nd[r["sa"]] + nd[r["sb"]] - r["count"]
        exact[(r["sa"], r["sb"])] = (r["count"] / u, u)
    assert len(est) == 190  # all 20-choose-2 pairs present
    ej_errs, eu_errs = [], []
    for key, e in est.items():
        jac, uni = exact.get(key, (0.0, nd[key[0]] + nd[key[1]]))
        ej_errs.append(abs(e["est_jaccard"] - jac))
        eu_errs.append(abs(e["est_union"] - uni) / uni)
    assert st.mean(ej_errs) < 0.03 and max(ej_errs) < 0.15
    assert st.mean(eu_errs) < 0.15 and max(eu_errs) < 0.40
