"""Merkle-style bucket-fingerprint table diff — the reusable operator
behind plans.queries_ext7.q_merkle_diff.

Both table versions reduce to one order-independent fingerprint per
key-range bucket (sum of 40-bit md5 row hashes — exact in int64, plus
the row count, which is free state and rules out sum collisions for
add+remove pairs); row-level diffing then runs ONLY inside buckets
whose (fingerprint, count) disagree. At 100 TB this is the difference
between comparing ~1e5 bucket rows and full-outer-joining two 100 TB
tables: the fingerprint pass is a map-side-combinable aggregate per
version, and the dirty-bucket list is tiny and BROADCAST into both row
scans (partition pruning when the table is key-range partitioned,
which div-bucketing models).

Hash inputs must be exact integer/string renderings (cents, never
float-to-string: that formatting is engine-specific). The row hash is
collision-proof by construction: each column contributes the md5 of
its own string rendering (fixed 32-hex pieces — no delimiter games)
with NULL encoded as the 4-char sentinel 'null', which no md5 digest
can equal, so ('a|b','c') vs ('a','b|c') and (x, NULL) vs (NULL, x)
hash differently. Buckets use exact integer `div` (truncating — the
same semantics as DuckDB's `//`), never float division, so keys past
2^53 still land in the right bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_diff(v1: DataFrame, v2: DataFrame, key: str,
                hash_cols: list[str], bucket_width: int) -> DataFrame:
    """Per-dirty-bucket diff of two snapshot versions sharing a schema.

    key: integer row key; bucket = key div bucket_width. hash_cols: the
    columns (key included by the caller if desired) folded into the
    40-bit row hash. Returns (bucket, n_added, n_removed, n_changed) —
    clean buckets never reach the row-level FULL OUTER join.
    """
    def hashed(df: DataFrame) -> DataFrame:
        pieces = [F.coalesce(F.md5(F.col(c).cast("string")), F.lit("null"))
                  for c in hash_cols]
        h = F.conv(F.substring(
            F.md5(F.concat(*pieces)), 1, 10), 16, 10).cast("bigint")
        return df.select(
            F.col(key),
            F.expr(f"{key} div {bucket_width}").alias("b"),
            h.alias("h"))

    h1, h2 = hashed(v1), hashed(v2)
    fp1 = h1.groupBy("b").agg(F.sum("h").alias("fp1"),
                              F.count(F.lit(1)).alias("n1"))
    fp2 = h2.groupBy("b").agg(F.sum("h").alias("fp2"),
                              F.count(F.lit(1)).alias("n2"))
    dirty = (fp1.join(fp2, "b", "full_outer")
             .filter((F.col("fp1").isNull()) | (F.col("fp2").isNull())
                     | (F.col("fp1") != F.col("fp2"))
                     | (F.col("n1") != F.col("n2")))
             .select("b"))
    d1 = h1.join(F.broadcast(dirty), "b")
    d2 = h2.join(F.broadcast(dirty), "b")
    diff = (d1.withColumnRenamed("h", "h1")
            .join(d2.withColumnRenamed("h", "h2"), ["b", key],
                  "full_outer"))
    return (diff.groupBy("b")
            .agg(F.sum(F.col("h1").isNull().cast("bigint")).alias("n_added"),
                 F.sum(F.col("h2").isNull().cast("bigint"))
                 .alias("n_removed"),
                 F.sum((F.col("h1").isNotNull() & F.col("h2").isNotNull()
                        & (F.col("h1") != F.col("h2"))).cast("bigint"))
                 .alias("n_changed"))
            .withColumnRenamed("b", "bucket"))
