"""Plan-shape + semantics tests for catalog extension 27 (round 9,
second session, wave 2: Kruskal-Wallis, lift/gains, Kaplan-Meier).
Oracle values are pinned by tools/check.py; these pin the scale-shape
contracts and the recurrence/identity edge cases.
"""

from __future__ import annotations

import contextlib
import io

from research_index_backend_spark.plans import queries_ext27 as Q27

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_kruskal_no_corpus_window(self, spark):
        """The only window runs over the 50-value quantity marginal —
        the corpus itself must reduce through a hash aggregate, never
        flow into a Window/Sort."""
        p = plan_of(Q27.q_kruskal_wallis(spark, SF))
        assert "BatchEvalPython" not in p
        # the window input is the post-aggregate marginal: the plan
        # must contain a partial (merge) aggregate BEFORE any window
        assert "HashAggregate" in p

    def test_kaplan_meier_no_window_at_all(self, spark):
        """KM folds an in-row array — no windowspecdefinition
        anywhere (the day table is collected, not ranked)."""
        p = plan_of(Q27.q_kaplan_meier(spark, SF))
        assert "windowspecdefinition" not in p
        assert "BatchEvalPython" not in p

    def test_lift_gains_single_agg_before_window(self, spark):
        p = plan_of(Q27.q_lift_gains_report(spark, SF))
        assert "BatchEvalPython" not in p
        assert "CartesianProduct" not in p


class TestSemantics:
    def test_kruskal_h_nonnegative_and_adj_ge_h(self, spark):
        """H >= 0; the tie correction divides by (1 - T/(N^3-N)) < 1,
        so h_adj >= h for positive H."""
        r = Q27.q_kruskal_wallis(spark, SF).collect()[0]
        assert r["h_e6"] >= 0
        assert r["h_adj_e6"] >= r["h_e6"]
        assert r["k_groups"] == 3

    def test_kruskal_matches_scipy_formula(self, spark):
        """Recompute H from scratch in pure Python (tie-averaged
        ranks over all rows) and compare on the e6 lattice."""
        import duckdb
        rows = duckdb.connect().execute(
            f"SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT)"
            f" FROM '{SF}/lineitem.parquet'").fetchall()
        vals = sorted(v for _, v in rows)
        # average rank per distinct value
        from collections import Counter
        cnt = Counter(vals)
        ravg, cum = {}, 0
        for v in sorted(cnt):
            ravg[v] = cum + (cnt[v] + 1) / 2
            cum += cnt[v]
        groups = {}
        for g, v in rows:
            groups.setdefault(g, []).append(ravg[v])
        n = len(rows)
        s = sum(sum(rs) ** 2 / len(rs) for rs in groups.values())
        h = 12 * s / (n * (n + 1)) - 3 * (n + 1)
        got = Q27.q_kruskal_wallis(spark, SF).collect()[0]
        # the engine lattice floors sub-ppm terms; allow 2e-6 slack
        assert abs(got["h_e6"] - h * 1e6) < 2, (got["h_e6"], h * 1e6)

    def test_lift_monotone_and_terminal(self, spark):
        """gain_e6 is non-decreasing reading down the bands and ends
        at 1e6; lift at the last band is exactly 1e6 (the whole
        population has baseline rate)."""
        rows = Q27.q_lift_gains_report(spark, SF).collect()
        gains = [r["gain_e6"] for r in rows]
        assert gains == sorted(gains)
        assert rows[-1]["gain_e6"] == 1_000_000
        assert rows[-1]["lift_e6"] == 1_000_000

    def test_kaplan_meier_monotone_and_risk_conserved(self, spark):
        """surv_e9 is non-increasing; at-risk decrements by d + c
        step to step; first at_risk = total users."""
        rows = Q27.q_kaplan_meier(spark, SF).collect()
        assert rows, "empty KM table"
        prev_s = 1_000_000_000
        prev_risk = None
        total = sum(r["d_events"] + r["c_censored"] for r in rows)
        assert rows[0]["n_at_risk"] == total
        for r in rows:
            assert r["surv_e9"] <= prev_s
            if prev_risk is not None:
                assert r["n_at_risk"] == prev_risk
            prev_s = r["surv_e9"]
            prev_risk = (r["n_at_risk"] - r["d_events"]
                         - r["c_censored"])

    def test_kaplan_meier_matches_direct_product(self, spark):
        """Replay the floor recurrence in Python from the same day
        table and compare surv_e9 exactly (it is integer-exact)."""
        rows = Q27.q_kaplan_meier(spark, SF).collect()
        surv = 10 ** 9
        at_risk = rows[0]["n_at_risk"]
        for r in rows:
            surv = surv * (at_risk - r["d_events"]) // at_risk
            assert r["surv_e9"] == surv
            at_risk -= r["d_events"] + r["c_censored"]
