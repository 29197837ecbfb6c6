"""Plan-shape + semantics tests for catalog extension 39 (round 9,
second session, wave 14: novelty curve).
"""

from __future__ import annotations

import contextlib
import io

from research_index_backend_spark.plans import queries_ext39 as Q39

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestNoveltyCurve:
    def test_no_udf(self, spark):
        p = plan_of(Q39.q_novelty_curve_report(spark, SF))
        assert "BatchEvalPython" not in p

    def test_first_tranche_all_novel_and_shares_monotone(self, spark):
        rows = Q39.q_novelty_curve_report(spark, SF).collect()
        assert len(rows) == 10
        # tranche 0: every shingle is first-seen there
        assert rows[0]["novel_shingles"] > 0
        shares = [r["cum_novel_share_e6"] for r in rows]
        assert shares == sorted(shares)
        assert shares[-1] == 1_000_000
        # novelty rate decays overall: last tranche below first
        assert (rows[-1]["novelty_rate_e6"]
                < rows[0]["novelty_rate_e6"])

    def test_novel_sum_equals_distinct_shingles(self, spark):
        import duckdb
        exp = duckdb.connect().execute(
            rf"""SELECT count(DISTINCT s) FROM (
                  SELECT unnest([array_to_string(t[i : i + 2], ' ')
                           for i in range(1, len(t) - 1)]) AS s
                  FROM (SELECT list_filter(string_split_regex(
                          lower(text), '\s+'), x -> x <> '') AS t
                        FROM '{SF}/documents.parquet')
                  WHERE len(t) >= 3)""").fetchone()[0]
        rows = Q39.q_novelty_curve_report(spark, SF).collect()
        assert sum(r["novel_shingles"] for r in rows) == exp
