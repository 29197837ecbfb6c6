"""JSON sink (S5): persist raw API envelopes for idempotent re-reads.

Reference behavior: one file per DOI under data/json/{source}/
(reference src/research_index_backend/get_metadata.py:29-38), filename =
doi with '/' stripped (F21).

Spark-first: a partitioned append-mode JSON write — the landed directory
IS the HTTP cache (S6): re-ingest reads the directory back instead of
re-fetching, and the anti-join against already-landed query_doi keys
skips work (the requests_cache equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_json(df: DataFrame, path: str, mode: str = "append") -> None:
    df.write.mode(mode).json(path)
