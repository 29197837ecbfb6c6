"""Small-file compaction for Parquet table directories.

Every incremental sink (micro-batch appends, per-run upserts, partitioned
landing zones) accretes small files, and small files are the quiet killer
at scale: each costs a listing round-trip, a parquet footer read, and a
scheduler task — a 100 TB table fragmented into 1 MB files is 100M tasks
before a single byte of query work. Compaction rewrites a directory into
~target-sized files with identical content.

Design:
- File count comes from the CURRENT on-disk byte size / target, not from
  row counts — Parquet compression makes rows a bad proxy. (The
  recompacted files can land somewhat smaller than target when the merge
  improves encoding locality; that direction is harmless.)
- repartition(n), not coalesce(n): coalesce merges whole input partitions
  without a shuffle, so one fat input file would keep its skew and the
  output sizes would mirror the input's imbalance. Compaction is
  precisely the moment to pay one shuffle for even output.
- Optional sort_cols: sortWithinPartitions before write clusters rows so
  parquet row-group min/max stats become selective — the poor man's
  Z-order, and the right hook for "compact and cluster by the common
  filter key".
- Same write-adjacent-then-swap crash-safety as upsert_parquet (reuses
  _recover): the table is never missing, readers racing the swap see
  either the old or the new complete directory.
"""

from __future__ import annotations

import math
import re
import shutil
from pathlib import Path

from pyspark.sql import SparkSession

_PART_DIR = re.compile(r"^([^=/]+)=([^/]*)$")


def _partition_cols(target: Path) -> list[str]:
    """Hive-style partition columns of a dataset dir, outermost first.
    Walks down the first key=value chain — Spark writes a homogeneous
    layout, so one branch determines the scheme. [] for unpartitioned."""
    cols: list[str] = []
    cur = target
    while True:
        sub = next((d for d in cur.iterdir()
                    if d.is_dir() and _PART_DIR.match(d.name)), None)
        if sub is None:
            return cols
        cols.append(_PART_DIR.match(sub.name).group(1))
        cur = sub


def compact_parquet(spark: SparkSession, path: str,
                    target_mb: int = 128,
                    sort_cols: list[str] | None = None) -> int:
    """Rewrite the Parquet dir at `path` into ~ceil(bytes/target_mb) files.
    Returns the shuffle-partition count used. Content is row-identical
    (asserted by the caller's tests, not re-read here — re-reading the
    whole table to verify would double the I/O this operator exists to
    save).

    A Hive-partitioned layout (key=value dirs) is detected and PRESERVED:
    the rewrite repartitions on the partition columns (so each output
    task holds few partition values) and writes with the same
    partitionBy — the directory scheme, and the PartitionFilters pruning
    that depends on it, survive compaction (round-4 ADVICE: the old code
    silently flattened partition columns into data columns)."""
    from .upsert import _recover

    target = Path(path)
    old = target.with_suffix(target.suffix + ".old")
    new = target.with_suffix(target.suffix + ".new")
    _recover(target, old, new)
    for stale in (old, new):
        if stale.exists():
            shutil.rmtree(stale)

    part_cols = _partition_cols(target)
    total_bytes = sum(f.stat().st_size
                      for f in target.rglob("*.parquet"))
    n_files = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(str(target))
    if part_cols:
        # hash-cluster on the partition columns so each task writes few
        # partition dirs (a plain round-robin repartition would scatter
        # every partition value across every task -> n_files small files
        # PER partition value, re-fragmenting what we just compacted)
        df = df.repartition(n_files, *part_cols)
    else:
        df = df.repartition(n_files)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    writer = df.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(str(new))

    target.rename(old)
    new.rename(target)
    shutil.rmtree(old)
    return n_files
