"""Bucketed Parquet tables: shuffle-free co-located joins.

The node/edge tables are joined on the same keys over and over (outputs by
doi, authors by uuid, edges by endpoint). Writing them BUCKETED by those
keys means Spark records the hash-partitioning in the catalog and a join
of two same-bucketed tables needs NO exchange at all — the single biggest
recurring shuffle in the reference workload (every ingest re-probes
existing nodes) disappears from the plan.

This is the at-rest complement of operators.upsert.upsert_parquet_bucketed
(which prunes WRITES to touched buckets); bucketing here prunes JOINs.
Tables are written as EXTERNAL tables (explicit path) so the parquet stays
a plain directory the rest of the engine can read; the catalog entry adds
the bucketing metadata joins key off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table: str, path: str, keys: list[str],
                  n_buckets: int = 16, sort: bool = True) -> None:
    """Write df as an external bucketed parquet table.

    Same n_buckets + same keys on both sides of a join -> no Exchange in
    the join plan (bucketed scan-to-scan sort-merge join); sort=True also
    pre-sorts within buckets so the join skips its Sort at read time.
    """
    w = (df.write.format("parquet").mode("overwrite")
         .option("path", path)
         .bucketBy(n_buckets, *keys))
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog — spark.read.parquet(path)
    would see the files but lose the bucketing metadata (and the no-shuffle
    join with it)."""
    return spark.table(table)
