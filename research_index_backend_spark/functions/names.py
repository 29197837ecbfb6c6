"""Name splitting, derived name keys, and fuzzy name similarity.

Reference semantics:
- split_names (reference src/research_index_backend/utils.py:26-36):
  1 token -> ("", tokens) [a reference quirk: returns the list]; 2 tokens ->
  (first, second); >2 -> (first, rest joined).
- score_name_similarity (reference create_graph_from_doi.py:68-101):
  difflib SequenceMatcher.ratio() on strip/lower'd names; if below the 0.8
  threshold, retry with the first name's word order reversed; if still
  below, return the mean of the two ratios.
- derived match keys: "first last" and "f last" (models.py:56,
  create_graph_from_doi.py:59).

Spark-first split: key derivation and splitting are pure column
expressions; the difflib ratio is inherently algorithmic -> an
Arrow-batched pandas UDF with the exact reference algorithm, used ONLY
after a blocking-key equi-join has bounded the candidate pairs
(operators/similarity_join.py). An approximate JVM-side alternative
(levenshtein ratio) is provided for oracle-checkable plans.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

NAME_SIMILARITY_THRESHOLD = 0.8  # reference config.py:20-25


def split_names_cols(col: Column | str) -> tuple[Column, Column]:
    """(first, last) columns per the reference's split_names token cases."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, " ")
    n = F.size(toks)
    first = F.when(n == 1, F.lit("")).otherwise(F.element_at(toks, 1))
    last = F.when(n == 1, c).otherwise(
        F.array_join(F.slice(toks, 2, 1000), " "))
    return first, last


def full_name_col(first: Column | str, last: Column | str) -> Column:
    """Cypher `a.first_name + ' ' + a.last_name` (models.py:56)."""
    f = F.col(first) if isinstance(first, str) else first
    l = F.col(last) if isinstance(last, str) else last
    return F.concat_ws(" ", f, l)


def initial_name_col(first: Column | str, last: Column | str) -> Column:
    """Cypher `left(a.first_name,1) + ' ' + a.last_name`
    (create_graph_from_doi.py:59) — the blocking key for J4/J10."""
    f = F.col(first) if isinstance(first, str) else first
    l = F.col(last) if isinstance(last, str) else last
    return F.concat_ws(" ", F.substring(f, 1, 1), l)


def name_similarity(a: str, b: str,
                    threshold: float = NAME_SIMILARITY_THRESHOLD) -> float:
    """Exact reference scoring algorithm (create_graph_from_doi.py:68-101)."""
    a = a.strip().lower()
    b = b.strip().lower()
    matcher = SequenceMatcher(None, a=a, b=b)
    ratio_a = matcher.ratio()
    if ratio_a > threshold:
        return ratio_a
    matcher.set_seq1(" ".join(reversed(a.split(" "))))
    ratio_b = matcher.ratio()
    if ratio_b > threshold:
        return ratio_b
    return (ratio_a + ratio_b) / 2.0


@F.pandas_udf(DoubleType())
def name_similarity_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched exact difflib scoring — the slow path, only ever run on
    blocked candidate pairs, never a full cross product."""
    return pd.Series([
        name_similarity(x, y) if x is not None and y is not None else None
        for x, y in zip(a, b)
    ])


def levenshtein_ratio(a: Column | str, b: Column | str) -> Column:
    """JVM-side approximate similarity: 1 - lev(a,b)/max(len) on lower/trim.

    Oracle-expressible twin of the difflib score (DuckDB has levenshtein);
    used by the SQL-checkable similarity-join query.
    """
    ca = F.lower(F.trim(F.col(a) if isinstance(a, str) else a))
    cb = F.lower(F.trim(F.col(b) if isinstance(b, str) else b))
    return F.lit(1.0) - F.levenshtein(ca, cb) / F.greatest(F.length(ca), F.length(cb))
