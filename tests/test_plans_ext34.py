"""Plan-shape + semantics tests for catalog extension 34 (round 9,
second session, wave 9: cohort LTV / reconciliation / backtest).
"""

from __future__ import annotations

import contextlib
import io
import re

from research_index_backend_spark.plans import queries_ext34 as Q34

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_cohort_ltv_window_partitioned(self, spark):
        p = plan_of(Q34.q_cohort_ltv(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "cohort_wk" in args
        assert "BatchEvalPython" not in p

    def test_invoice_join_no_cartesian(self, spark):
        p = plan_of(Q34.q_invoice_reconciliation(spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


class TestSemantics:
    def test_cohort_ltv_cumulative_consistent(self, spark):
        rows = Q34.q_cohort_ltv(spark, SF).collect()
        by_cohort = {}
        for r in rows:
            by_cohort.setdefault(r["cohort_wk"], []).append(r)
        for rs in by_cohort.values():
            run = 0
            for r in rs:
                run += r["value_c"]
                assert r["cum_value_c"] == run

    def test_invoice_totals_cover_all_orders(self, spark):
        import duckdb
        total = duckdb.connect().execute(
            f"SELECT count(*) FROM '{SF}/orders.parquet'").fetchone()[0]
        rows = Q34.q_invoice_reconciliation(spark, SF).collect()
        assert sum(r["n_orders"] for r in rows) == total

    def test_backtest_scores_match_manual(self, spark):
        import duckdb
        days = duckdb.connect().execute(
            f"""SELECT event_type, epoch_ns(ts) // 86400000000000,
                       sum(CAST(round(value * 100) AS BIGINT))
                FROM '{SF}/events.parquet'
                GROUP BY 1, 2""").fetchall()
        series = {}
        for et, d, y in days:
            series.setdefault(et, {})[d] = y
        got = {r["event_type"]: r for r in
               Q34.q_seasonal_naive_backtest(spark, SF).collect()}
        for et, s in series.items():
            aes = [abs(s[d] - s[d - 7]) for d in s if d - 7 in s]
            assert got[et]["n_days"] == len(aes)
            assert got[et]["mae_c"] == sum(aes) // len(aes)
