"""DOI work-list scan (S2): newline-delimited text -> normalized DOI frame.

Reference behavior: open(csv_file); line.strip() per line (reference
src/research_index_backend/create_graph_from_doi.py:337-340), then
DOIManager normalizes ALL lines and truncates to the FIRST `limit` lines
in file order before dict-keyed dedup (doi.py:97-110).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.doi import normalize_doi, valid_doi


def read_doi_list(spark: SparkSession, path: str,
                  limit: int | None = None) -> DataFrame:
    """(doi, valid_pattern) — normalized, blank lines dropped; `limit`
    caps to the first N FILE-ORDER lines, exactly the reference's
    list_of_dois[:limit] (doi.py:104-110).

    DataFrame.limit() on a split text scan is NOT file-ordered (Spark
    packs splits largest-first — round-2 ADVICE), so the capped path reads
    each file whole (wholetext) and derives (file, line_pos) explicitly:
    a DOI work list is operator input — thousands of lines, not data-lake
    scale — so one row per file is the right trade for a deterministic
    cap. The uncapped path stays a plain distributed text scan.
    """
    if limit is None:
        df = (
            spark.read.text(path)
            .select(normalize_doi(F.trim("value")).alias("doi"))
        )
    else:
        lines = (
            spark.read.text(path, wholetext=True)
            .select(F.input_file_name().alias("__f"),
                    F.posexplode(F.split("value", "\r?\n"))
                    .alias("__pos", "line"))
        )
        df = (
            lines.orderBy("__f", "__pos")
            .limit(limit)
            .select(normalize_doi(F.trim("line")).alias("doi"))
        )
    return (df.filter(F.col("doi") != "")
            .withColumn("valid_pattern", valid_doi("doi")))
