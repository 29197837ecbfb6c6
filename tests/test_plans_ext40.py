"""Semantics tests for catalog extension 40 (round 9, second
session, wave 15: effect sizes).
"""

from __future__ import annotations

from research_index_backend_spark.plans import queries_ext40 as Q40

SF = "/root/testdata/sf0.001"


class TestEffectSizes:
    def test_cohens_d_matches_direct(self, spark):
        import duckdb
        import math
        rows = duckdb.connect().execute(
            f"""SELECT l_discount >= 0.05,
                       CAST(round(l_quantity) AS BIGINT)
                FROM '{SF}/lineitem.parquet'""").fetchall()
        g1 = [q for t, q in rows if t]
        g0 = [q for t, q in rows if not t]

        def var(xs):
            n = len(xs)
            s = sum(xs)
            return (sum(x * x for x in xs) - s * s / n) / (n - 1)

        sp = math.sqrt(((len(g1) - 1) * var(g1)
                        + (len(g0) - 1) * var(g0))
                       / (len(g1) + len(g0) - 2))
        d = (sum(g1) / len(g1) - sum(g0) / len(g0)) / sp
        got = Q40.q_cohens_d_report(spark, SF).collect()[0]
        assert got["n_treated"] == len(g1)
        assert abs(got["d_e6"] - math.floor(d * 1e6)) <= 1

    def test_odds_ratio_cells_and_value(self, spark):
        r = Q40.q_odds_ratio_report(spark, SF).collect()[0]
        a, b = r["a_treat_resp"], r["b_treat_noresp"]
        c, d = r["c_ctrl_resp"], r["d_ctrl_noresp"]
        assert all(v > 0 for v in (a, b, c, d))
        assert r["odds_ratio_e6"] == a * d * 1000000 // (b * c)
