"""Keyed upsert (Cypher MERGE semantics) on plain Parquet.

Reference behavior: every `.save()` is match-then-create — e.g. Article
checks `MATCH (a:Output {doi: $doi})` before `CREATE`
(reference src/research_index_backend/models.py:165-249), and edge MERGE
dedupes on endpoints (models.py:121-137). Uniqueness constraints are
declared server-side (create_graph.py:262-271).

Spark-first design: MERGE == anti-join new-vs-existing + unionByName.
One shuffle on the key (or zero, if the existing side is small enough to
broadcast the anti-join). Writes go to a temp dir then atomically rename —
single-writer assumption documented here. Uniqueness constraints become a
distributed assertion (groupBy key, any group >1 fails) — never a collect
of the data itself.

Scale: the anti-join shuffles both sides by the key once; with the node
tables bucketed by key on disk even that shuffle disappears (bucketed
scan-to-scan join). The assertion is a partial-aggregate count — map-side
combined, tiny result.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class UniquenessViolation(Exception):
    pass


def assert_unique(df: DataFrame, keys: list[str], label: str = "") -> None:
    """Distributed uniqueness check: the Spark analogue of
    `CREATE CONSTRAINT ... IS UNIQUE` (reference create_graph.py:263-266)."""
    dupes = (
        df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dupes:
        raise UniquenessViolation(
            f"duplicate key {dupes[0].asDict()} in {label or 'table'} on {keys}")


def upsert(existing: DataFrame, incoming: DataFrame, keys: list[str],
           check_unique: bool = False) -> DataFrame:
    """MERGE-by-key: keep all existing rows, append incoming rows whose key
    is absent. Incoming is deduped on the key first (keep arbitrary-first via
    dropDuplicates — deterministic variants use operators.window_ops.keep_first).
    """
    fresh = incoming.dropDuplicates(keys).join(existing, on=keys, how="left_anti")
    merged = existing.unionByName(fresh)
    if check_unique:
        assert_unique(merged, keys, "upsert result")
    return merged


def upsert_parquet(spark, incoming: DataFrame, path: str, keys: list[str]) -> None:
    """Upsert into a Parquet directory with write-adjacent-then-swap.

    Crash-safety ordering: (1) clean any stale .old/.new left by a crashed
    prior run, (2) write the merged data to a .new dir ADJACENT to the
    target (same filesystem, so the final moves are renames, not copies),
    (3) move target -> .old, (4) move .new -> target, (5) drop .old.
    A crash between (3) and (4) leaves .old recoverable; a crash anywhere
    earlier leaves the target untouched.

    Single-writer assumption: concurrent upserts to the same path race on
    the rename; a production lake would use a transactional table format,
    this keeps the engine dependency-free.
    """
    target = Path(path)
    old = target.with_suffix(target.suffix + ".old")
    new = target.with_suffix(target.suffix + ".new")
    for stale in (old, new):
        if stale.exists():
            shutil.rmtree(stale)
    if target.exists():
        existing = spark.read.parquet(str(target))
        merged = upsert(existing, incoming, keys)
    else:
        merged = incoming.dropDuplicates(keys)
    merged.write.mode("overwrite").parquet(str(new))
    if target.exists():
        target.rename(old)
    new.rename(target)
    if old.exists():
        shutil.rmtree(old)
