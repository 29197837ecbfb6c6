"""Synthesize a Kx corpus from sf0.1 (default 10x) for scaling probes (BENCH_HISTORY
"r7 scaling probe"). Writes to /tmp/sf1 (never under /root/testdata).

Shard k remaps identities so cross-shard rows never collide:
- documents: doc_id offset per shard; every word suffixed with the shard
  digit so shingles/minhashes stay shard-local. Replicating text VERBATIM
  would create 10-clone cliques real 10x corpora don't have (every
  pair-generating operator would go quadratic on the clones); per-shard
  dup structure stays identical to sf0.1.
- lineitem: order/part/supp keys offset per shard (TPC-H-style scaling:
  more parts and suppliers, same per-part degree).
- customer: custkey offset, name shard-suffixed (block count scales
  linearly, block sizes unchanged).
- embeddings: vec_id offset per shard; every dimension perturbed by a
  deterministic shard-and-dim-keyed offset (~±0.05) so cross-shard
  replicas are NOT near-duplicates of each other (verbatim copies would
  hand every cosine operator 10-clone cliques), while in-shard geometry
  — and therefore in-shard near-dup/cluster structure — is preserved.
- orders: order/cust keys offset per shard (tracks lineitem/customer);
  dates/prices verbatim (no pair-generating operator runs on orders).
- events: event/user ids offset per shard — 10x the user population on
  the same timeline.
- part: partkey offset per shard, names shard-suffixed (suffix lands on
  the second name token) so linkage operators never see 10 verbatim
  name clones per block — per-shard near-miss structure matches sf0.1.
- dims (region/nation/supplier) copied unscaled — queries driven by
  them are not probe-meaningful.

Usage: python tools/gen_10x.py [K]   (default K=10 shards)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from research_index_backend_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
# DST overridable for larger probes: K=100 -> RIB_GEN_DST=/tmp/sf10
# gives the 100x corpus (same shard remapping, shard ids 0..99).
DST = os.environ.get("RIB_GEN_DST", "/tmp/sf1")
OFF = 10 ** 7


def main(k_shards: int = 10) -> None:
    spark = get_spark(cpus="32")
    os.makedirs(DST, exist_ok=True)

    def shards(df, mk):
        out = mk(df, 0)
        for k in range(1, k_shards):
            out = out.unionAll(mk(df, k))
        return out

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    shards(docs, lambda d, k: d.select(
        (F.col("doc_id") + F.lit(k * OFF)).alias("doc_id"),
        F.regexp_replace("text", r"(\S+)", f"$1{k}").alias("text"),
        "lang", "source", "n_chars")) \
        .repartition(32).write.mode("overwrite") \
        .parquet(f"{DST}/documents.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    shards(li, lambda d, k: d
           .withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * OFF))
           .withColumn("l_partkey", F.col("l_partkey") + F.lit(k * OFF))
           .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(k * OFF))) \
        .repartition(32).write.mode("overwrite") \
        .parquet(f"{DST}/lineitem.parquet")

    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    shards(cust, lambda d, k: d
           .withColumn("c_custkey", F.col("c_custkey") + F.lit(k * OFF))
           .withColumn("c_name", F.concat("c_name", F.lit(f"#{k}")))) \
        .repartition(8).write.mode("overwrite") \
        .parquet(f"{DST}/customer.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")

    def mk_emb(d, k):
        # md5((k, dim)) -> uniform in [-0.05, 0.05): breaks cross-shard
        # near-duplicates, preserves in-shard distances exactly.
        def perturb(i):
            return ((F.conv(F.substring(
                F.md5(F.concat_ws("/", F.lit(k), i.cast("string"))),
                1, 6), 16, 10).cast("double") % 1000) / 10000.0 - 0.05)
        return d.select(
            (F.col("vec_id") + F.lit(k * OFF)).alias("vec_id"),
            F.transform(F.col("embedding"),
                        lambda x, i: (x + perturb(i)).cast("float"))
            .alias("embedding"),
            "label")

    shards(emb, mk_emb).repartition(16).write.mode("overwrite") \
        .parquet(f"{DST}/embeddings.parquet")

    # orders: key/custkey offsets track the lineitem/customer shards so
    # order-driven operators (merkle_diff, zone_map_prune,
    # trend_regression, hll_union_report) scale with their real input;
    # dates/prices replicate verbatim (no pair-generating operator runs
    # on orders, so clique inflation is not a concern here).
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    shards(orders, lambda d, k: d
           .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * OFF))
           .withColumn("o_custkey", F.col("o_custkey") + F.lit(k * OFF))) \
        .repartition(16).write.mode("overwrite") \
        .parquet(f"{DST}/orders.parquet")

    # events: user population scales 10x (user_id offset), timeline
    # unchanged — the shape real per-user operators (pit_join,
    # interpolate_linear, sessionize) meet at 10x traffic.
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    shards(ev, lambda d, k: d
           .withColumn("event_id", F.col("event_id") + F.lit(k * OFF))
           .withColumn("user_id", F.col("user_id") + F.lit(k * OFF))) \
        .repartition(16).write.mode("overwrite") \
        .parquet(f"{DST}/events.parquet")

    # part: partkey offsets track lineitem; names shard-suffixed on the
    # SECOND token so record_linkage's (brand, type) blocks grow 10x —
    # the honest stress for blocked linkage (blocks scale with corpus
    # unless the blocking key is corpus-sized; the probe exists to
    # surface exactly that).
    part = spark.read.parquet(f"{SRC}/part.parquet")
    shards(part, lambda d, k: d
           .withColumn("p_partkey", F.col("p_partkey") + F.lit(k * OFF))
           .withColumn("p_name", F.concat("p_name", F.lit(str(k))))) \
        .repartition(8).write.mode("overwrite") \
        .parquet(f"{DST}/part.parquet")

    for t in ("region", "nation", "supplier"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite") \
            .parquet(f"{DST}/{t}.parquet")
    print("done:", {t: spark.read.parquet(f"{DST}/{t}.parquet").count()
                    for t in ("documents", "lineitem", "customer",
                              "embeddings")})


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
