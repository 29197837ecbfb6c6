"""Plan-shape + semantics tests for catalog extensions 35/36 (round 9,
second session, waves 10-11: histogram-refine selection, trimmed
mean, curation funnel).

NOTE: this file covers BOTH queries_ext35.py and queries_ext36.py
(curation_funnel_report lives in ext36); there is deliberately no
test_plans_ext36.py.
"""

from __future__ import annotations

import contextlib
import io
import re

from research_index_backend_spark.plans import queries_ext35 as Q35
from research_index_backend_spark.plans import queries_ext36 as Q36

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_median_windows_partitioned(self, spark):
        """Both passes' windows carry the type partition key — the
        whole point of the refine plan is that nothing sorts the
        corpus through one task."""
        p = plan_of(Q35.q_histogram_refine_median(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "event_type" in args
        assert "BatchEvalPython" not in p

    def test_trimmed_mean_windows_partitioned(self, spark):
        p = plan_of(Q35.q_trimmed_mean_report(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "event_type" in args

    def test_funnel_no_udf_no_cartesian(self, spark):
        p = plan_of(Q36.q_curation_funnel_report(spark, SF), "simple")
        assert "BatchEvalPython" not in p
        assert "CartesianProduct" not in p


class TestSemantics:
    def test_median_matches_sorted_selection(self, spark):
        import duckdb
        exp = dict(duckdb.connect().execute(
            f"""SELECT event_type,
                       quantile_disc(CAST(round(value*100) AS BIGINT),
                                     0.5)
                FROM '{SF}/events.parquet' GROUP BY 1""").fetchall())
        got = {r["event_type"]: r["median_c"] for r in
               Q35.q_histogram_refine_median(spark, SF).collect()}
        # quantile_disc picks the lower median like rank ceil(n/2)
        assert got == exp

    def test_trimmed_mean_between_min_and_mean_bounds(self, spark):
        rows = Q35.q_trimmed_mean_report(spark, SF).collect()
        for r in rows:
            assert r["k_trimmed"] == r["n_rows"] * 50000 // 1000000
            # trimming a right-skewed positive distribution pulls the
            # mean down or keeps it close; sanity bound only
            assert r["trimmed_mean_c"] > 0

    def test_trimmed_mean_matches_direct(self, spark):
        import duckdb
        rows = duckdb.connect().execute(
            f"""SELECT event_type, CAST(round(value*100) AS BIGINT)
                FROM '{SF}/events.parquet'""").fetchall()
        series = {}
        for et, v in rows:
            series.setdefault(et, []).append(v)
        got = {r["event_type"]: r for r in
               Q35.q_trimmed_mean_report(spark, SF).collect()}
        for et, vs in series.items():
            vs.sort()
            k = len(vs) * 50000 // 1000000
            kept = vs[k:len(vs) - k]
            assert got[et]["trimmed_mean_c"] == sum(kept) // len(kept)

    def test_funnel_monotone_and_raw_matches(self, spark):
        import duckdb
        n_docs = duckdb.connect().execute(
            f"SELECT count(*) FROM '{SF}/documents.parquet'"
        ).fetchone()[0]
        rows = Q36.q_curation_funnel_report(spark, SF).collect()
        assert [r["stage"] for r in rows] == [0, 1, 2, 3]
        assert rows[0]["n_docs"] == n_docs
        for a, b in zip(rows, rows[1:]):
            assert b["n_docs"] <= a["n_docs"]
            assert b["n_tokens"] <= a["n_tokens"]
