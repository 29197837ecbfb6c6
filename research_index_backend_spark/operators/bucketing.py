"""Bucketed tables: co-located joins with NO shuffle exchange.

The reference pays one Bolt round trip per node/edge write and re-matches
keys on every MERGE (create_graph_from_doi.py upserts); the Spark-scale
equivalent of "the key's home is known" is BUCKETING — hash-partition a
table into a fixed number of buckets BY KEY AT WRITE TIME
(df.write.bucketBy(n, key).sortBy(key).saveAsTable). Every job that later
joins or aggregates on that key reads bucket i of every file into task i:
the exchange disappears from the plan entirely, which at 100 TB is the
difference between a join that moves 100 TB over the network per run and
one that moves nothing (the shuffle was paid ONCE, at write time).

Rules enforced by Spark for the exchange to be elided:
- both sides bucketed on the join key with the SAME bucket count
  (or a divisor — one side can coalesce buckets);
- bucket count chosen for target-file-size at scale (128-512 MB/bucket),
  NOT per-executor parallelism — buckets are split across tasks fine;
- sortBy(key) additionally pre-sorts within buckets so SortMergeJoin
  skips its sort (plan shows Sort only when sortBy was omitted).

tests/test_operators.py::TestBucketedJoin asserts the plan property:
join of two tables written through write_bucketed has zero
ShuffleExchange nodes (vs 2 for the same join on plain parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   n_buckets: int, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist df as a parquet table bucketed (and optionally
    bucket-sorted) by keys — the write-once-shuffle that co-locates
    every future join/agg on those keys."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two bucketed tables on their bucket keys. A plain .join —
    the co-location comes from the table metadata, not the query; this
    helper exists to name the pattern and carry the docstring."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
