"""Multi-predicate scorecard aggregation.

Reference behavior: 14 scalar ingestion metrics computed by repeated Python
list comprehensions over the DOI tracker dict (reference
src/research_index_backend/doi.py:202-283) — 14 passes over the data.

Spark-first design: ONE aggregation pass with a conditional sum per metric;
partial (map-side) aggregation means the shuffle carries 14 longs per
partition, nothing else. This scales to any row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scorecard(df: DataFrame, metrics: dict[str, Column]) -> DataFrame:
    """metrics: name -> boolean Column; returns a 1-row frame of counts."""
    aggs = [
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(name)
        for name, cond in metrics.items()
    ]
    return df.agg(*aggs)


def dup_detect(df: DataFrame, keys: list[str], count_col: str = "n") -> DataFrame:
    """Keys appearing more than once (A2): Counter(...) > 1 re-expressed as
    a grouped count — map-side combined, no driver-side dict."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(count_col))
        .filter(F.col(count_col) > 1)
    )
