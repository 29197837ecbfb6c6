"""Plan-shape + semantics tests for catalog extension 32 (round 9,
second session, wave 7: WoW deltas / centroid drift / pinball loss).
"""

from __future__ import annotations

import contextlib
import io
import re

from research_index_backend_spark.plans import queries_ext32 as Q32

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_wow_window_partitioned_by_type(self, spark):
        p = plan_of(Q32.q_wow_delta_report(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "event_type" in args
        assert "BatchEvalPython" not in p

    def test_centroid_drift_no_window(self, spark):
        p = plan_of(Q32.q_embedding_centroid_drift(spark, SF))
        assert "windowspecdefinition" not in p
        assert "BatchEvalPython" not in p

    def test_pinball_single_scan(self, spark):
        p = plan_of(Q32.q_pinball_loss_eval(spark, SF), "simple")
        assert p.count("Generate") == 1
        assert "BatchEvalPython" not in p


class TestSemantics:
    def test_wow_deltas_match_manual(self, spark):
        """n_wow_e6 recomputes from consecutive n values."""
        rows = Q32.q_wow_delta_report(spark, SF).collect()
        by_type = {}
        for r in rows:
            by_type.setdefault(r["event_type"], []).append(r)
        for rs in by_type.values():
            assert rs[0]["n_wow_e6"] is None
            for prev, cur in zip(rs, rs[1:]):
                num = 1000000 * (cur["n_events"] - prev["n_events"])
                den = prev["n_events"]
                # engine div truncates toward zero (python // floors)
                exp = abs(num) // den * (1 if num >= 0 else -1)
                assert cur["n_wow_e6"] == exp

    def test_centroid_drift_nonneg_and_split_covers(self, spark):
        import duckdb
        total = duckdb.connect().execute(
            f"SELECT count(*) FROM '{SF}/embeddings.parquet'"
        ).fetchone()[0]
        rows = Q32.q_embedding_centroid_drift(spark, SF).collect()
        assert sum(r["n_a"] + r["n_b"] for r in rows) == total
        for r in rows:
            assert r["drift2_e12"] >= 0

    def test_pinball_p50_beats_bad_quantile_on_median(self, spark):
        """Structural: coverage increases with the forecast level
        (p90's $12000 forecast covers more than p50's $4000), and
        the mean loss is positive."""
        rows = Q32.q_pinball_loss_eval(spark, SF).collect()
        by_type = {}
        for r in rows:
            by_type.setdefault(r["event_type"], {})[r["q"]] = r
        for qs in by_type.values():
            assert qs[90]["coverage_e6"] >= qs[50]["coverage_e6"]
            assert qs[50]["mean_loss_c"] > 0

    def test_pinball_matches_manual(self, spark):
        import duckdb
        ys = [r[0] for r in duckdb.connect().execute(
            f"""SELECT CAST(round(value * 100) AS BIGINT)
                FROM '{SF}/events.parquet'
                WHERE event_type = 'click'""").fetchall()]
        f, q = 400000, 50
        sl = sum(q * (y - f) if y >= f else (100 - q) * (f - y)
                 for y in ys)
        exp = sl // (100 * len(ys))
        got = [r for r in Q32.q_pinball_loss_eval(spark, SF).collect()
               if r["event_type"] == "click" and r["q"] == 50][0]
        assert got["mean_loss_c"] == exp
