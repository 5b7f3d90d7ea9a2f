"""Skew-aware join strategies.

AQE's skew-join splitting (on by default, hermod_spark/session.py)
handles most hot keys by splitting oversized SHUFFLE partitions, but it
cannot help when (a) the skewed side must broadcast-build, or (b) a
single KEY (not partition) is hot enough that one task still gets the
whole key. Salting is the classic remedy: replicate the small side
``salt`` ways, scatter the big side uniformly across the replicas, join
on (key, salt), and the hot key's rows spread over ``salt`` tasks.

Results are EXACTLY those of the unsalted equi-join (inner/left) — the
salt column is internal and dropped. Deterministic scatter (hash of a
row id, not rand()) keeps reruns and retries identical — important for
exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt: int = 16,
    scatter_col: str | None = None,
    how: str = "inner",
    force_shuffle: bool = False,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with ``salt``-way key
    salting.

    big rows get a deterministic salt in [0, salt): hash of
    ``scatter_col`` (default: every big-side column — any unique-ish
    column works; pass one for cheapness). small is exploded
    ``salt``× — acceptable because small is the dimension side; its
    replicated size is |small|·salt rows, still broadcastable for real
    dims.

    Use when ONE key dominates (power-law fact keys). For uniform keys
    this only adds a cheap projection — the join count and result are
    identical either way (pinned by tests).

    ``force_shuffle=True`` pins a SHUFFLE_HASH join. Salting only does
    work when the join shuffles — the situation it exists for is a dim
    too big to broadcast next to a skewed fact. At test scale every dim
    fits the broadcast threshold, so Catalyst would silently pick a
    broadcast join and the salt would never reach an exchange; the hint
    reproduces the at-scale plan shape (hash-partition both sides on
    (key, salt)) so the plan gate can verify the hot key spreads."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (semantics-preserving)")
    scatter = (
        F.col(scatter_col) if scatter_col else F.struct(*[F.col(c) for c in big.columns])
    )
    b = big.withColumn("_salt", F.pmod(F.hash(scatter), F.lit(salt)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    if force_shuffle:
        s = s.hint("shuffle_hash")
    return b.join(s, [on, "_salt"], how).drop("_salt")


def skewed_nation_rollup(
    events: DataFrame, nation: DataFrame, salt: int = 16
) -> DataFrame:
    """Skewed fact→dim join exercised end-to-end (VERDICT r3 #7): 90%
    of event rows are remapped onto ONE hot key (7), joined to the
    nation dim, and rolled up per nation.

    Without salting, every row of the hot key lands in one shuffle
    partition — one straggler task owns 90% of the data at any scale.
    `salted_join` scatters the hot key over ``salt`` tasks; the rollup
    result is exactly the unsalted join's (oracle-checked). The sum is
    decimal-cast for cross-engine bit-identity."""
    fact = events.select(
        F.when(F.col("user_id") % 10 != 0, F.lit(7))
        .otherwise(F.col("user_id") % 25)
        .cast("int")
        .alias("k"),
        "event_id",
        "value",
    )
    dim = nation.select(
        F.col("n_nationkey").cast("int").alias("k"), "n_name"
    )
    joined = salted_join(
        fact, dim, "k", salt=salt, scatter_col="event_id", force_shuffle=True
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
    )
