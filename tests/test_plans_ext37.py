"""Plan-shape + semantics tests for catalog extension 37 (round 9,
second session, wave 12: streaming sessionize twin / Qini uplift /
conformal coverage).
"""

from __future__ import annotations

import contextlib
import io
import re

from research_index_backend_spark.plans import queries_ext37 as Q37

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_sessionize_windows_partitioned_by_user(self, spark):
        p = plan_of(Q37.q_stream_sessionize_twin(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "user_id" in args

    def test_conformal_quantile_windows_partitioned(self, spark):
        p = plan_of(Q37.q_conformal_coverage_audit(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "event_type" in args


class TestSemantics:
    def test_sessionize_twin_totals(self, spark):
        import duckdb
        exp = dict(duckdb.connect().execute(
            f"""SELECT user_id, count(*)
                FROM '{SF}/events.parquet' GROUP BY 1""").fetchall())
        rows = Q37.q_stream_sessionize_twin(spark, SF).collect()
        for r in rows:
            assert r["n_events"] == exp[r["user_id"]]
            assert 1 <= r["max_session_events"] <= r["n_events"]
            assert r["n_sessions"] >= 1

    def test_qini_final_row_is_overall_uplift(self, spark):
        """The last (lowest band) row covers the whole population —
        cum counts equal the table totals."""
        import duckdb
        tot = duckdb.connect().execute(
            f"""SELECT sum(CASE WHEN l_discount >= 0.05
                         THEN 1 ELSE 0 END),
                       sum(CASE WHEN l_discount < 0.05
                         THEN 1 ELSE 0 END)
                FROM '{SF}/lineitem.parquet'""").fetchone()
        rows = Q37.q_qini_uplift_report(spark, SF).collect()
        last = rows[-1]
        assert last["cum_treated"] == tot[0]
        assert last["cum_control"] == tot[1]
        assert last["cum_treated_resp"] <= last["cum_treated"]

    def test_conformal_bounds_and_coverage(self, spark):
        """Bounds ordered; coverage within [0, 1e6]; train + test
        partition the per-type rows."""
        import duckdb
        tot = dict(duckdb.connect().execute(
            f"""SELECT event_type, count(*)
                FROM '{SF}/events.parquet' GROUP BY 1""").fetchall())
        for r in Q37.q_conformal_coverage_audit(spark, SF).collect():
            assert r["lo_c"] <= r["hi_c"]
            assert 0 <= r["coverage_e6"] <= 1_000_000
            assert r["n_train"] + r["n_test"] == tot[r["event_type"]]
