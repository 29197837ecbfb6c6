"""Plan-shape + semantics tests for catalog extensions 20-22 (the
round-9 waves). Oracle values are pinned by tools/check.py / the driver
correctness run; these pin the scale-shape contracts (what the plan
must NOT contain) and the arithmetic/invariant edge cases the oracle
only proves on the data it happens to see.
"""

from __future__ import annotations

import contextlib
import io
import re

from research_index_backend_spark.plans import queries_ext20 as Q20
from research_index_backend_spark.plans import queries_ext21 as Q21
from research_index_backend_spark.plans import queries_ext22 as Q22

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_rrf_lexical_pool_is_take_ordered(self, spark):
        """The lexical arm must pool via TakeOrdered (orderBy+limit),
        never a global window over every scored doc — the only global
        windows rank the post-limit 30-row pools."""
        p = plan_of(Q20.q_hybrid_rrf_fusion(spark, SF), "simple")
        assert "TakeOrderedAndProject" in p
        assert "BatchEvalPython" not in p

    def test_link_prediction_no_cartesian(self, spark):
        p = plan_of(Q20.q_link_prediction_ra(spark, SF))
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p

    def test_ks_windows_are_partitioned_by_type(self, spark):
        """The CDF windows must be partitioned by event_type — an empty
        partition spec would sort the value domain through one task
        (the round-7-flagged class)."""
        p = plan_of(Q20.q_ks_test_drift(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "event_type" in args

    def test_mannwhitney_windows_are_partitioned_by_type(self, spark):
        p = plan_of(Q21.q_mannwhitney_auc(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "event_type" in args

    def test_gini_gain_single_scan_stack(self, spark):
        """The three feature columns stack via an in-row explode —
        the plan must contain exactly one Generate (explode) and no
        union of three base-table scans."""
        p = plan_of(Q20.q_gini_gain_report(spark, SF), "simple")
        assert p.count("Generate") == 1
        assert "Union" not in p

    def test_rfm_quintile_windows_partitioned_by_dim(self, spark):
        p = plan_of(Q22.q_rfm_segments(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "dim" in args

    def test_burstiness_lag_window_partitioned(self, spark):
        p = plan_of(Q21.q_interarrival_burstiness(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "event_type" in args and "user_id" in args


class TestSemantics:
    def test_rrf_scores_recompute_from_ranks(self, spark):
        """rrf_e6 must equal the RRF formula applied to the reported
        ranks (0 = absent from that arm's pool)."""
        rows = Q20.q_hybrid_rrf_fusion(spark, SF).collect()
        assert rows, "fusion returned no rows"
        for r in rows:
            want = (1000000 // (60 + r.lex_rank) if r.lex_rank > 0 else 0) \
                 + (1000000 // (60 + r.sem_rank) if r.sem_rank > 0 else 0)
            assert r.rrf_e6 == want
        scores = [r.rrf_e6 for r in rows]
        assert scores == sorted(scores, reverse=True)

    def test_link_prediction_pairs_are_non_adjacent(self, spark):
        """Every predicted pair must NOT be an existing co-purchase
        edge (the anti-join contract)."""
        from pyspark.sql import functions as F
        from research_index_backend_spark.plans.queries import _t
        preds = Q20.q_link_prediction_ra(spark, SF).collect()
        assert preds
        li = _t(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
        a = li.selectExpr("l_orderkey AS o", "l_partkey AS u")
        b = li.selectExpr("l_orderkey AS o", "l_partkey AS v")
        edges = set(
            (r.u, r.v)
            for r in a.join(b, "o").filter(F.col("u") < F.col("v"))
            .select("u", "v").distinct().collect())
        for p in preds:
            assert (p.x, p.y) not in edges
            assert p.x < p.y and p.cn >= 1 and p.ra_e6 >= 1

    def test_target_encoding_shrinks_toward_global_mean(self, spark):
        """The smoothed encoding must land between the segment's raw
        mean and the global mean (the shrinkage contract), within the
         1-unit floor slack."""
        rows = Q20.q_target_encode_smoothed(spark, SF).collect()
        assert rows
        # the global mean is recoverable: every row floors the same
        # (gn, gs); bound it by the raw means themselves
        lo_raw = min(r.raw_mean_cents for r in rows)
        hi_raw = max(r.raw_mean_cents for r in rows)
        for r in rows:
            assert lo_raw - 1 <= r.enc_cents <= hi_raw + 1
            lo, hi = sorted((r.raw_mean_cents, r.enc_cents))
            # enc is a convex combination of raw and global mean
            assert lo_raw - 1 <= lo and hi <= hi_raw + 1
            assert 0 < r.shrink_e4 < 10000

    def test_ks_statistic_bounds(self, spark):
        rows = Q20.q_ks_test_drift(spark, SF).collect()
        assert rows
        for r in rows:
            assert 0 <= r.d_e6 <= 1000000
            assert r.n_type > 0 and r.n_rest > 0

    def test_mannwhitney_auc_bounds_and_biserial(self, spark):
        rows = Q21.q_mannwhitney_auc(spark, SF).collect()
        assert rows
        for r in rows:
            assert 0 <= r.auc_e6 <= 1000000
            assert r.rank_biserial_e6 == 2 * r.auc_e6 - 1000000

    def test_gini_parent_matches_direct_computation(self, spark):
        """parent_gini_e6 must equal the label distribution's Gini
        computed directly from the joined base table."""
        from research_index_backend_spark.plans.queries import _t
        rows = Q20.q_gini_gain_report(spark, SF).collect()
        assert len(rows) == 3
        o = _t(spark, SF, "orders").select("o_orderstatus").collect()
        from collections import Counter
        c = Counter(r.o_orderstatus for r in o)
        n = sum(c.values())
        want = 1000000 - (1000000 * sum(v * v for v in c.values())) \
            // (n * n)
        for r in rows:
            assert r.parent_gini_e6 == want
            # floors can push gain a hair below exact-zero, never more
            assert r.gain_e6 >= -2

    def test_ndcg_bounds(self, spark):
        rows = Q21.q_ndcg_eval(spark, SF).collect()
        assert rows
        for r in rows:
            assert 0 <= r.n_hits <= r.n_ret <= 10
            assert 0 <= r.ndcg_e6 <= 1000000
            assert r.ndcg_e6 == (1000000 * r.dcg) // Q21._NDCG_IDCG

    def test_coreset_radius_curve_non_increasing(self, spark):
        rows = Q22.q_coreset_kcenter(spark, SF).collect()
        assert [r.pick for r in rows] == list(range(1, Q22._KC_K + 1))
        ids = [r.vec_id for r in rows]
        assert len(set(ids)) == len(ids), "centers must be distinct"
        radii = [r.radius_d2 for r in rows]
        assert all(a >= b for a, b in zip(radii, radii[1:])), \
            "coverage radius must not increase as centers are added"
        assert rows[0].vec_id == 0  # deterministic seed: smallest id

    def test_rfm_segments_partition_users(self, spark):
        from research_index_backend_spark.plans.queries import _t
        rows = Q22.q_rfm_segments(spark, SF).collect()
        assert rows
        for r in rows:
            assert 1 <= r.r_q <= 5 and 1 <= r.f_q <= 5 and 1 <= r.m_q <= 5
        n_users = _t(spark, SF, "events").select("user_id") \
            .distinct().count()
        assert sum(r.n_users for r in rows) == n_users

    def test_conversion_lag_percentiles_ordered(self, spark):
        row = Q22.q_conversion_lag_report(spark, SF).collect()[0]
        assert row.n_pairs > 0
        assert 0 <= row.p50_min <= row.p90_min <= row.p99_min
        assert row.mean_lag_min >= 0

    def test_loo_impact_mean_with_is_constant(self, spark):
        rows = Q22.q_loo_source_impact(spark, SF).collect()
        assert rows
        assert len(set(r.mean_with_e4 for r in rows)) == 1
        for r in rows:
            assert r.delta_e4 == r.mean_without_e4 - r.mean_with_e4

    def test_burstiness_moments_nonnegative(self, spark):
        rows = Q21.q_interarrival_burstiness(spark, SF).collect()
        assert rows
        for r in rows:
            assert r.n_gaps > 0 and r.mean_gap_s > 0
            assert r.fano_e3 >= 0 and r.cv2_e6 >= 0
