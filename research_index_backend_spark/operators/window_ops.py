"""Window-function operators: per-group top-1 and keep-first dedup.

Reference behavior: correlated `LIMIT 1` inside per-author / per-country
match queries (reference src/research_index_backend/models.py:43,58;
create_graph_from_doi.py:310,326) and pandas `keep='first'` dedup
(reference notebooks/cleaning.ipynb cell 7). The reference relies on
unspecified result order; the engine makes the tiebreak explicit.

Spark-first design: row_number over (partitionBy key, orderBy tiebreak) —
the canonical replacement for correlated LIMIT. One shuffle on the
partition key; at scale this is a sort within partitions, AQE-coalesced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_top1(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """One row per key group, first by the given explicit ordering (W2)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_first(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Ordered keep-first dedup (A6/W3): dropDuplicates with a defined order."""
    return group_top1(df, keys, order)
