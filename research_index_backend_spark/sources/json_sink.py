"""JSON sink (S5): persist raw API envelopes for idempotent re-reads.

Reference behavior: one file per DOI under data/json/{source}/
(reference src/research_index_backend/get_metadata.py:29-38), filename =
doi with '/' stripped (F21), written with open(..., 'w') — so a re-fetch
of the same DOI REPLACES the landed envelope on disk.

Spark-first: one partitioned JSON dataset instead of a file per DOI, with
the same replace-by-key semantics: `land_envelopes` anti-joins the
EXISTING landed rows against the incoming (query_doi, source) keys and
rewrites (kept old rows + all fresh rows) via an adjacent staging dir +
atomic swap — fresh envelopes always win, old envelopes for untouched
keys survive, and the write never scans its own target. Each landed row
carries `landed_at` (epoch seconds) so re-fetch policies can expire stale
envelopes (the requests_cache expire_after=30 equivalent,
reference create_graph_from_doi.py:215).

Reads use an explicit schema (LANDED_SCHEMA): schema inference over a
directory holding only _SUCCESS/partition dirs raises AnalysisException,
and inference at 100 TB is a full extra pass over the data anyway.
"""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ..ingest.fetch import FETCH_SCHEMA
from ..operators.upsert import _recover

#: FETCH_SCHEMA + the landing timestamp. `source` doubles as the partition
#: column; giving the reader the full schema up front means partition
#: discovery fills it and no inference pass runs.
LANDED_SCHEMA = StructType(
    list(FETCH_SCHEMA.fields) + [StructField("landed_at", DoubleType())])


def write_json(df: DataFrame, path: str, mode: str = "append") -> None:
    df.write.mode(mode).json(path)


def _has_data_files(path: Path) -> bool:
    """True when the dataset dir holds at least one non-empty part file.
    A dir containing only _SUCCESS / empty partition dirs (a prior run
    that landed zero envelopes) must read as 'nothing landed'."""
    if not path.exists():
        return False
    return any(p.is_file() and p.stat().st_size > 0
               for p in path.rglob("part-*"))


def read_landed(spark: SparkSession, path: str) -> DataFrame:
    """Landed envelopes with the explicit schema; empty frame if the
    dataset has no data files yet (guards the AnalysisException that
    schema inference raises on an empty dir)."""
    p = Path(path)
    if not _has_data_files(p):
        return spark.createDataFrame([], LANDED_SCHEMA)
    return spark.read.schema(LANDED_SCHEMA).json(str(p))


def land_envelopes(spark: SparkSession, fresh: DataFrame, path: str,
                   now: float | None = None) -> None:
    """Land fetch envelopes with the reference's overwrite semantics: a
    fresh envelope REPLACES any previously-landed row for the same
    (query_doi, source); landed rows with no fresh twin are kept.

    Mechanics mirror operators.upsert.upsert_parquet: recover a crashed
    prior swap, write (kept ∪ fresh) to an adjacent .new staging dir,
    then rename-swap. The staged write reads the OLD target and writes
    elsewhere, so the file index is never scanned mid-append — the
    read-own-target hazard of a naive append is structurally gone.
    """
    target = Path(path)
    old = target.with_suffix(target.suffix + ".old")
    new = target.with_suffix(target.suffix + ".new")
    _recover(target, old, new)
    import shutil
    for stale in (old, new):
        if stale.exists():
            shutil.rmtree(stale)

    stamped = fresh.withColumn(
        "landed_at", F.lit(float(now if now is not None else time.time())))
    if _has_data_files(target):
        existing = read_landed(spark, str(target))
        incoming_keys = stamped.select("query_doi", "source").distinct()
        kept = existing.join(incoming_keys, ["query_doi", "source"],
                             "left_anti")
        merged = kept.unionByName(stamped)
    else:
        if target.exists():
            shutil.rmtree(target)
        merged = stamped
    merged.write.mode("overwrite").partitionBy("source").json(str(new))
    if target.exists():
        target.rename(old)
    new.rename(target)
    if old.exists():
        shutil.rmtree(old)
