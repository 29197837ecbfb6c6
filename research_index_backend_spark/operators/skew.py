"""Skew mitigation utilities.

The engine's skew posture has four layers, applied in this order:
1. AQE skew-join (on by default, plans/queries._ensure_conf) — handles
   sort-merge join skew at runtime by splitting oversized partitions.
2. Broadcast the small side (hints throughout the catalog) — no shuffle of
   the big side at all.
3. Structural caps where output is super-linear in key frequency
   (TWO_HOP_DEGREE_CAP, LSH_BUCKET_CAP, the ANN salted top-k).
4. THIS module: explicit salting for the cases the above can't reach —
   a skewed shuffle join whose small side is too big to broadcast but
   cheap to replicate n_salts times.

salted_join replicates the small side once per salt and scatters the big
side's hot keys across salts via a row-content hash: a key with 10^8 rows
lands in n_salts partitions instead of one, at the cost of n_salts x
|small| replication — the classic trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join on `on` with the big side salted across n_salts splits.

    big rows get salt = hash(whole row) % n_salts (row-content hash: the
    same hot key's rows spread evenly without any random() — plans stay
    deterministic and re-runnable); the small side is exploded once per
    salt so every (key, salt) pair still meets its match. Result rows are
    identical to the unsalted join for how in {inner, left}: a big row
    joins the single replica carrying its salt.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (the skewed-big"
                         " shapes); right/full would salt the wrong side")
    big_s = big.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in big.columns]),
                         F.lit(n_salts)))
    small_s = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return big_s.join(small_s, on=[*on, SALT_COL], how=how).drop(SALT_COL)
