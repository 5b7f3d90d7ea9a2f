"""Synthesize a LOCAL sf1 decade (~10x sf0.1) as parquet on disk.

The driver's generators are not shipped with the repo, so sf1 is
derived from sf0.1 (seed-42 data) with the bench's _stack10
discipline — 10 copies with join-consistent disjoint key spaces per
copy — but PERSISTED to parquet, so the scale probe
(`scripts/scale_probe.py`) crosses a real data-scale decade through
file scans (pushdown, row groups, split planning), not in-memory
unions. Per-copy edits match bench.py's constructions:

- documents: letter-rotated text (copies are NOT near-dups of each
  other — candidate pairs grow linearly, the honest LSH scaling);
- embeddings: +i*1e-3 vector shift (copies are near but not
  bit-identical neighbors);
- TPC-H keys (orderkey/custkey/partkey/suppkey) shift by the SAME
  per-domain offset on every table that carries them, so every join
  stays consistent; region/nation (dimension constants) are copied
  unchanged.

Usage: python scripts/make_sf1.py [outdir]   (default /tmp/hermod-sf1)
Idempotent: skips tables whose parquet already exists.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from hermod_spark.data import table  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10

# per-table: columns shifted by a shared per-domain offset
SHIFTS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
COPY_AS_IS = ["region", "nation"]
LETTERS = "etaoinshrdlu"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hermod-sf1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    # one offset per key DOMAIN, computed from whichever table owns it
    domain_src = {
        "custkey": ("customer", "c_custkey"),
        "suppkey": ("supplier", "s_suppkey"),
        "partkey": ("part", "p_partkey"),
        "orderkey": ("orders", "o_orderkey"),
        "eventid": ("events", "event_id"),
        "userid": ("events", "user_id"),
        "docid": ("documents", "doc_id"),
        "vecid": ("embeddings", "vec_id"),
    }
    offs = {
        dom: table(spark, SRC, t).agg(F.max(c)).first()[0] + 1
        for dom, (t, c) in domain_src.items()
    }
    print(f"# domain offsets: {offs}", file=sys.stderr)

    for t in COPY_AS_IS:
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        table(spark, SRC, t).write.mode("overwrite").parquet(dst)

    for t, shifts in SHIFTS.items():
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(dst):
            print(f"# {t}: exists, skipping", file=sys.stderr)
            continue
        base = table(spark, SRC, t)
        parts = []
        for i in range(COPIES):
            p = base
            for col, dom in shifts.items():
                p = p.withColumn(col, F.col(col) + F.lit(i * offs[dom]))
            if t == "documents" and i > 0:
                p = p.withColumn(
                    "text",
                    F.translate("text", LETTERS, LETTERS[i:] + LETTERS[:i]),
                )
            if t == "customer" and i > 0:
                # per-copy digit rotation of names: each copy forms its
                # own ER blocks — block COUNT grows 10x at constant
                # block size (bench's _customer_10x; unrotated names
                # flood every block past max_block and linkage returns
                # nothing, which probes the cap, not the join)
                digits = "0123456789"
                p = p.withColumn(
                    "c_name",
                    F.translate(
                        "c_name", digits, digits[i:] + digits[:i]
                    ),
                )
            if t == "embeddings" and i > 0:
                p = p.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, _i=i: (x + F.lit(_i * 1e-3)).cast("float"),
                    ),
                )
            parts.append(p)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(dst)
        print(f"# {t}: {df.count()} rows -> {dst}", file=sys.stderr)
    print(f"sf1 ready at {out}")


if __name__ == "__main__":
    main()
