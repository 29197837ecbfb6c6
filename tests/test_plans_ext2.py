"""Plan + semantics tests for the round-4 catalog extension
(plans.queries_ext2). Value-level correctness is pinned by the DuckDB
oracles (tools/check.py / the driver's CORRECTNESS gate); these tests pin
the SCALE properties of each plan and the handful of semantics the
oracles can't see (determinism under repartitioning, banding recall).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from research_index_backend_spark.plans import queries_ext2 as Q2

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_rollup_is_single_expand_agg(self, spark):
        """ROLLUP must compile to Expand + one aggregate chain — not one
        scan/shuffle per hierarchy level."""
        p = plan_of(Q2.q_rollup_report(spark, SF))
        assert p.count("Expand") >= 1
        assert "Scan parquet" in p
        # one orders scan only: per-level re-scans would repeat the
        # Location line
        assert sum("orders.parquet" in ln
                   for ln in p.splitlines() if "Location" in ln) == 1

    def test_rollup_dims_broadcast(self, spark):
        p = plan_of(Q2.q_rollup_report(spark, SF))
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p

    def test_pivot_is_one_aggregate_chain(self, spark):
        """Pinned pivot values compile to pivotfirst aggregation over one
        scan — no distinct-values pass over the data (an unpinned pivot
        runs a whole extra job just to discover the columns)."""
        p = plan_of(Q2.q_pivot_report(spark, SF))
        assert "pivotfirst" in p.lower()
        assert sum("orders.parquet" in ln
                   for ln in p.splitlines() if "Location" in ln) == 1

    def test_funnel_is_single_agg_no_join(self, spark):
        """The funnel is one hash-agg over events — a per-step self-join
        would shuffle the full log k times."""
        p = plan_of(Q2.q_event_funnel(spark, SF))
        assert "Join" not in p
        assert p.count("HashAggregate") >= 2  # partial + final

    def test_simhash_pairs_is_equi_join_not_cross(self, spark):
        """Band blocking must plan as an equi-join on (band_id, band_val);
        a cross/nested-loop product over docs is the anti-pattern."""
        p = plan_of(Q2.q_simhash_hamming_pairs(spark, SF))
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p

    def test_tfidf_broadcasts_df_side(self, spark):
        """(token, df) and the 1-row corpus count are tiny — both must
        broadcast back onto the tf side."""
        p = plan_of(Q2.q_tfidf_topk(spark, SF))
        assert p.count("BroadcastExchange") >= 2

    def test_cohort_broadcasts_first_seen(self, spark):
        p = plan_of(Q2.q_retention_cohort(spark, SF))
        assert "BroadcastHashJoin" in p


class TestSemantics:
    def test_stratified_sample_partitioning_invariant(self, spark):
        """The content-hash sample must be identical under any physical
        partitioning — the property that makes it re-runnable (unlike
        df.sample, whose output depends on partition layout)."""
        base = Q2.q_stratified_sample(spark, SF)
        o = spark.read.parquet(f"{SF}/orders.parquet").repartition(7)
        h = (F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")),
                                1, 8), 16, 10).cast("bigint") % 100)
        thr = F.when(F.col("o_orderstatus") == "F", 10) \
               .when(F.col("o_orderstatus") == "O", 5).otherwise(50)
        again = o.filter(h < thr).select(
            "o_orderkey", F.col("o_orderstatus").alias("stratum"))
        assert sorted(map(tuple, base.collect())) \
            == sorted(map(tuple, again.collect()))

    def test_stratified_rates_differ_by_stratum(self, spark):
        rows = Q2.q_stratified_sample(spark, SF).groupBy("stratum") \
            .count().collect()
        got = {r["stratum"]: r["count"] for r in rows}
        # F sampled at 10%, O at 5% — F rate must exceed O rate
        o = spark.read.parquet(f"{SF}/orders.parquet")
        tot = {r["o_orderstatus"]: r["count"]
               for r in o.groupBy("o_orderstatus").count().collect()}
        assert got["F"] / tot["F"] > got["O"] / tot["O"]

    def test_simhash_banding_recall_exact(self, spark):
        """Pigeonhole guarantee: banded candidates + exact filter find
        EVERY pair with hamming <= 3 (compare against brute force)."""
        banded = {(r["doc_a"], r["doc_b"])
                  for r in Q2.q_simhash_hamming_pairs(spark, SF).collect()}
        from research_index_backend_spark.operators.dedup import simhash
        d = spark.read.parquet(f"{SF}/documents.parquet")
        fp = {r["id"]: r["simhash"]
              for r in simhash(d, "text", "doc_id",
                               bits=Q2._SH_BITS).collect()}
        ids = sorted(fp)
        brute = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
                 if bin(fp[a] ^ fp[b]).count("1") <= 3}
        assert banded == brute

    def test_funnel_requires_strict_order(self, spark):
        """A user with purchase before view must not qualify."""
        rows = Q2.q_event_funnel(spark, SF).collect()
        for r in rows:
            assert r["t_signup"] < r["t_view"] < r["t_purchase"]

    def test_scrub_removes_all_urls_and_emails(self, spark):
        df = Q2.q_text_scrub(spark, SF)
        assert df.filter((F.col("n_urls") < 1) | (F.col("n_emails") < 1)) \
            .isEmpty()


class TestPipelineOps:
    def test_doc_chunk_is_shuffle_free(self, spark):
        """Chunking is embarrassingly parallel per document — no hash or
        range repartitioning anywhere (the only Exchange allowed is the
        round-robin one _t() injects for test-SF file fan-out)."""
        p = plan_of(Q2.q_doc_chunk(spark, SF))
        assert "hashpartitioning" not in p
        assert "rangepartitioning" not in p

    def test_doc_chunk_overlap_semantics(self, spark):
        """Consecutive chunks overlap by CHUNK-STEP tokens and cover the
        whole token stream."""
        import pyspark.sql.functions as F
        rows = (Q2.q_doc_chunk(spark, SF)
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_chunks"),
                     F.sum("n_tokens").alias("tok_sum"),
                     F.max("chunk_idx").alias("max_idx"))
                .collect())
        d = spark.read.parquet(f"{SF}/documents.parquet")
        toks = {r["doc_id"]: r["n"] for r in d.select(
            "doc_id", F.size(F.filter(
                F.split(F.lower("text"), r"\s+"),
                lambda t: t != "")).alias("n")).collect()}
        for r in rows:
            n = toks[r["doc_id"]]
            # chunk count = number of stride starts
            assert r["n_chunks"] == (n + Q2._CHUNK_STEP - 1) // Q2._CHUNK_STEP
            assert r["max_idx"] == r["n_chunks"] - 1
            # total chunked tokens = n + overlap re-emissions
            overlap = sum(
                max(0, min(Q2._CHUNK_TOKENS, n - s) - Q2._CHUNK_STEP)
                for s in range(0, n, Q2._CHUNK_STEP)
                if n - s > Q2._CHUNK_STEP)
            assert r["tok_sum"] == n + overlap

    def test_sequence_pack_budget_respected(self, spark):
        """No pack's preceding-cumulative start may exceed its pack_id
        boundary, and pack ids are dense from 0 per source."""
        import pyspark.sql.functions as F
        df = Q2.q_sequence_pack(spark, SF)
        per_pack = (df.groupBy("source", "pack_id")
                    .agg(F.sum("n_tokens").alias("tok"))
                    .collect())
        by_source = {}
        for r in per_pack:
            by_source.setdefault(r["source"], []).append(r["pack_id"])
        for packs in by_source.values():
            assert sorted(packs) == list(range(len(packs)))

    def test_dedup_survivors_canonical_is_member_min(self, spark):
        """Every canonical id is the min doc_id of its group and is
        itself kept."""
        rows = Q2.q_dedup_survivors(spark, SF).collect()
        groups = {}
        for r in rows:
            groups.setdefault(r["canonical_id"], []).append(
                (r["doc_id"], r["kept"]))
        for canon, members in groups.items():
            ids = [m[0] for m in members]
            assert canon == min(ids)
            kept = [m[0] for m in members if m[1]]
            assert kept == [canon]


class TestSequencePackSharded:
    def test_window_partitions_by_shard(self, spark):
        """The greedy cum-sum window must partition on (source, shard),
        not source alone — otherwise a single giant source serializes
        one task (the exact bound this variant exists to provide)."""
        p = plan_of(Q2.q_sequence_pack_sharded(spark, SF))
        win_parts = [ln for ln in p.splitlines()
                     if "hashpartitioning" in ln and "shard" in ln]
        assert win_parts, f"no (source, shard) exchange in plan:\n{p}"
        assert "BroadcastHashJoin" in p      # offsets join side is tiny
        assert "SortMergeJoin" not in p

    def test_single_source_corpus_still_fans_out(self, spark):
        """A one-source corpus — the degenerate case for per-source
        packing — must still produce many window partitions."""
        d = (spark.read.parquet(f"{SF}/documents.parquet")
             .withColumn("source", F.lit("only")))
        n_shards = d.select(
            (F.floor(F.col("doc_id") / Q2._PACK_SHARD_ROWS))
            .alias("shard")).distinct().count()
        assert n_shards > 1

    def test_pack_ids_contiguous_per_source(self, spark):
        """Shard-local renumbering must yield one contiguous 0..N-1 pack
        sequence per source (no gaps, no collisions across shards)."""
        rows = Q2.q_sequence_pack_sharded(spark, SF).collect()
        per_src: dict[str, set[int]] = {}
        for r in rows:
            per_src.setdefault(r["source"], set()).add(r["pack_id"])
        assert per_src
        for packs in per_src.values():
            assert packs == set(range(len(packs)))


class TestPartitionPruning:
    def test_partitioned_write_prunes_at_scan(self, spark, tmp_path):
        """A table partitioned by a coarse key must show partition
        filters at the scan — the planner reads only matching dirs, the
        move that turns a 100 TB scan into a 100 GB one. Also pins that
        the pruned column survives as partition metadata (no data-file
        read for it)."""
        src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        tdir = str(tmp_path / "orders_by_status")
        src.write.partitionBy("o_orderstatus").parquet(tdir)
        df = (spark.read.parquet(tdir)
              .filter(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderstatus"))
        p = plan_of(df)
        assert "PartitionFilters" in p
        line = [ln for ln in p.splitlines() if "PartitionFilters" in ln][0]
        assert "o_orderstatus" in line
        # pruning really dropped rows: only status-F rows come back
        n_f = src.filter(F.col("o_orderstatus") == "F").count()
        assert df.count() == n_f
