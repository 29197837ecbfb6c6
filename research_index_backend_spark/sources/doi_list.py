"""DOI work-list scan (S2): newline-delimited text -> normalized DOI frame.

Reference behavior: open(csv_file); line.strip() per line (reference
src/research_index_backend/create_graph_from_doi.py:337-340), then
DOIManager normalizes/caps/dedupes (doi.py:97-110).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.doi import normalize_doi, valid_doi


def read_doi_list(spark: SparkSession, path: str,
                  limit: int | None = None) -> DataFrame:
    """(doi, valid_pattern) — normalized, blank lines dropped, capped at
    `limit` in file order (P2/P3/P1). Keying by doi dedupes downstream
    exactly like the reference's dict-keyed tracker (doi.py:108-110)."""
    df = (
        spark.read.text(path)
        .select(normalize_doi(F.trim("value")).alias("doi"))
        .filter(F.col("doi") != "")
    )
    if limit is not None:
        df = df.limit(limit)
    return df.withColumn("valid_pattern", valid_doi("doi"))
