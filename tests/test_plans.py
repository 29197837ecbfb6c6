"""Physical-plan regression tests: the engine's scale posture is a set of
plan properties (broadcasts where a dim is small, filters pushed to the
parquet scan, whole-stage codegen in the hot path, no exchange where none
is needed). Asserting on explain() output pins them against regressions —
the .explain-and-iterate loop, frozen into tests.

All plans are inspected lazily (no execution) on the sf0.001 tables.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_contains_tag_is_broadcast_nested_loop(self, spark):
        """J6 containment theta join: the dim side must broadcast — a
        shuffle of the big text side would be the wrong plan at 100 TB."""
        from research_index_backend_spark.operators.theta import contains_tag
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        words = spark.read.parquet(f"{SF}/part.parquet").select(
            F.col("p_name").alias("word")).limit(50)
        p = plan_of(contains_tag(docs, words, "text", "word"))
        assert "BroadcastNestedLoopJoin" in p
        assert "SortMergeJoin" not in p

    def test_dim_join_broadcasts(self, spark):
        """Small-dim equi-joins plan as BroadcastHashJoin, not a shuffle
        of the fact side."""
        from research_index_backend_spark.plans.queries import q_graph_degree
        p = plan_of(q_graph_degree(spark, SF))
        assert "BroadcastHashJoin" in p

    def test_filter_pushdown_reaches_parquet_scan(self, spark):
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        df = orders.filter(F.col("o_orderkey") > 1000).select("o_orderkey")
        p = plan_of(df)
        assert "PushedFilters" in p
        assert "GreaterThan(o_orderkey,1000)" in p

    def test_column_pruning_reaches_parquet_scan(self, spark):
        """A 2-column projection must not read the whole schema."""
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        p = plan_of(orders.select("o_orderkey", "o_custkey"))
        assert "ReadSchema" in p
        schema_line = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
        assert "o_orderkey" in schema_line and "o_custkey" in schema_line
        assert "o_comment" not in schema_line

    def test_aggregation_partial_and_codegen(self, spark):
        """Aggregations must (a) partial-aggregate map-side before the
        exchange and (b) run inside whole-stage codegen. AQE hides codegen
        markers until the plan finalizes, so (b) is asserted on the
        executed plan (the '* ' operator prefix in formatted mode)."""
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        agg = orders.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        assert "partial_count" in plan_of(agg)   # map-side combine
        agg.collect()
        p = plan_of(agg)
        assert "isFinalPlan=true" in p or "Final Plan" in p
        assert "* HashAggregate" in p            # codegen'd aggregate

    def test_ann_lsh_is_bucket_equi_join(self, spark):
        """The LSH path must plan a (broadcast) equi-join on the bucket —
        never the brute-force cross join."""
        from research_index_backend_spark.operators.ann import lsh_topk
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 5)
        p = plan_of(lsh_topk(emb, q, k=5))
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p

    def test_existence_probe_no_join_explosion(self, spark):
        """J1: grouped-count existence, not a row-multiplying join result
        (the round-1 regression, pinned at plan level: aggregation sits
        above the join)."""
        from research_index_backend_spark.operators.exists import (
            existence_probe,
        )
        cust = spark.read.parquet(f"{SF}/customer.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet").select(
            F.col("o_custkey").alias("c_custkey"))
        p = plan_of(existence_probe(cust, orders, "c_custkey", "has_orders"))
        assert "HashAggregate" in p

    def test_upsert_anti_join_on_key(self, spark):
        from research_index_backend_spark.operators.upsert import upsert
        a = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
        b = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
        p = plan_of(upsert(a, b, ["o_orderkey"]))
        assert "LeftAnti" in p

    def test_no_python_udf_in_builtin_queries(self, spark):
        """U1: the catalog's scalar surface stays JVM-side — no
        BatchEvalPython (row-wise Python) nodes in any checked plan that
        does not deliberately use a pandas UDF."""
        from research_index_backend_spark.plans.queries import (
            q_regex_filter,
            q_string_clean,
            q_text_quality,
        )
        for q in (q_regex_filter, q_string_clean, q_text_quality):
            p = plan_of(q(spark, SF))
            assert "BatchEvalPython" not in p, q.__name__


class TestBucketedJoin:
    def test_same_bucket_join_has_no_exchange(self, spark, tmp_path):
        """Two tables bucketed by the same key into the same bucket count
        must sort-merge join with ZERO exchanges — the at-rest co-location
        that removes the recurring node-table probe shuffle."""
        from research_index_backend_spark.sources.bucketed import (
            read_table,
            save_bucketed,
        )
        a = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS va")
        b = spark.range(0, 1000).selectExpr("id AS k", "id * 3 AS vb")
        save_bucketed(a, "bkt_a", str(tmp_path / "a"), ["k"], n_buckets=4)
        save_bucketed(b, "bkt_b", str(tmp_path / "b"), ["k"], n_buckets=4)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = read_table(spark, "bkt_a").join(read_table(spark, "bkt_b"), "k")
            p = plan_of(j)
            assert "SortMergeJoin" in p
            assert "Exchange" not in p        # the whole point
            assert j.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS bkt_a")
            spark.sql("DROP TABLE IF EXISTS bkt_b")
