"""Blocked similarity join (fuzzy name matching at scale).

Reference behavior: per incoming author, fuzzy-verify against DB hits with
difflib ratio >= 0.8, trying word-order reversal (reference
src/research_index_backend/create_graph_from_doi.py:68-101,136-152) — one
Python comparison at a time.

Spark-first design: NEVER score the full cross product. Generate candidate
pairs with an equi-join on a cheap blocking key (surname / first-initial —
the same key the reference uses for its name index lookups,
create_graph_from_doi.py:53-65), then score only those pairs:

  - exact path: the difflib pandas UDF (functions.names.name_similarity_udf)
  - oracle path: JVM levenshtein ratio (functions.names.levenshtein_ratio)

Scale: the equi-join shuffles on the blocking key; block sizes bound the
quadratic blow-up. Skewed blocks (e.g. "Smith") are handled by AQE skew
splitting; for adversarial skew add a salt column to the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import get_config
from ..functions.names import levenshtein_ratio, name_similarity_udf


def blocked_pairs(left: DataFrame, right: DataFrame, block_key: Column | str,
                  left_prefix: str = "l_", right_prefix: str = "r_") -> DataFrame:
    """Equi-join candidate generation on a derived blocking key.

    Both inputs get the key column materialized, then an inner equi-join.
    Column name collisions are avoided by prefixing every non-key column.
    """
    key = "__block"
    lk = left.select(
        F.col(block_key).alias(key) if isinstance(block_key, str) else block_key.alias(key),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns],
    )
    rk = right.select(
        F.col(block_key).alias(key) if isinstance(block_key, str) else block_key.alias(key),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
    )
    return lk.join(rk, on=key, how="inner").drop(key)


def similarity_join(left: DataFrame, right: DataFrame,
                    left_name: str, right_name: str,
                    block_left: Column, block_right: Column,
                    threshold: float | None = None,
                    exact: bool = False,
                    score_col: str = "similarity") -> DataFrame:
    """Candidate-pairs-then-score similarity join.

    exact=True uses the reference's difflib algorithm (pandas UDF, no SQL
    oracle); exact=False uses the JVM levenshtein ratio (oracle-checkable).

    threshold=None reads (RIB_)NAME_SIMILARITY_THRESHOLD from the
    environment, defaulting to 0.8 (reference config.py:22-25).
    """
    if threshold is None:
        threshold = get_config().name_similarity_threshold
    l = left.withColumn("__bk", block_left)
    r = right.withColumn("__bk", block_right)
    rsel = r.select(F.col("__bk"),
                    *[F.col(c).alias(f"r_{c}") for c in right.columns])
    pairs = l.join(rsel, on="__bk", how="inner").drop("__bk")
    if exact:
        score = name_similarity_udf(F.col(left_name), F.col(f"r_{right_name}"))
    else:
        score = levenshtein_ratio(F.col(left_name), F.col(f"r_{right_name}"))
    return pairs.withColumn(score_col, score).filter(F.col(score_col) >= threshold)
