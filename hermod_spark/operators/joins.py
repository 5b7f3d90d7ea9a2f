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
    identical either way (pinned by tests)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (semantics-preserving)")
    scatter = (
        F.col(scatter_col) if scatter_col else F.struct(*[F.col(c) for c in big.columns])
    )
    b = big.withColumn("_salt", F.pmod(F.hash(scatter), F.lit(salt)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, [on, "_salt"], how).drop("_salt")
