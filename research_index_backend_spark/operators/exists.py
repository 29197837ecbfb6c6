"""Existence probes and semi/anti splits.

Reference behavior: the one batched query in the codebase — `UNWIND $dois
AS doi OPTIONAL MATCH (o:Output {doi: doi}) RETURN doi, COUNT(o) > 0 AS
exists` (reference src/research_index_backend/doi.py:151-191), and the
existing/new partition of the work list (doi.py:175-180).

Spark-first design: a left join + grouped count>0, or the cheaper
semi/anti pair when only membership matters. At scale the probe side is
usually small → broadcast; the grouped count is map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def existence_probe(probe: DataFrame, target: DataFrame, key: str,
                    flag_col: str = "exists_flag") -> DataFrame:
    """Per probe key: does any target row match? (J1).

    Plan shape: distinct the target key FIRST, then one left join + null
    check. The naive left-join-then-groupBy multiplies probe rows by
    matches-per-key (orders per customer) before re-aggregating; distincting
    the target bounds the join output at one row per probe key — same
    answer, one aggregation instead of an exploded join + groupBy.
    """
    t = (target.select(F.col(key).alias("__t_key")).distinct()
         .withColumn("__hit", F.lit(True)))
    return (
        probe.select(key).distinct()
        .join(t, on=F.col(key) == F.col("__t_key"), how="left")
        .select(key, F.coalesce(F.col("__hit"), F.lit(False)).alias(flag_col))
    )


def semi_anti_split(probe: DataFrame, target: DataFrame, key: str) -> tuple[DataFrame, DataFrame]:
    """(existing, new) disjoint split of probe by membership in target (X1)."""
    existing = probe.join(target.select(key), on=key, how="left_semi")
    new = probe.join(target.select(key), on=key, how="left_anti")
    return existing, new
