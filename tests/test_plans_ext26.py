"""Plan-shape + semantics tests for catalog extension 26 (round 9,
second session, wave 1: Gopher/C4 curation gates + nonparametric
dependence). Oracle values are pinned by tools/check.py / the driver
correctness run; these pin the scale-shape contracts and the edge
cases the checked SFs may not exercise.
"""

from __future__ import annotations

import contextlib
import io
import re

import pyspark.sql.functions as F

from research_index_backend_spark.plans import queries_ext26 as Q26

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_gopher_is_single_scan_no_explode(self, spark):
        """Every per-doc metric must be a pure column expression — no
        Generate (explode) and no Python UDF in the plan; the corpus
        reduces through one combinable aggregate."""
        p = plan_of(Q26.q_gopher_quality_flags(spark, SF))
        assert "Generate" not in p
        assert "BatchEvalPython" not in p
        assert "CartesianProduct" not in p

    def test_c4_reassembly_no_global_window(self, spark):
        """Reassembly uses sort_array over per-doc collect_list — no
        window at all, so nothing can degenerate to one partition."""
        p = plan_of(Q26.q_c4_line_filter(spark, SF))
        assert "windowspecdefinition" not in p
        assert "BatchEvalPython" not in p

    def test_spearman_windows_partitioned_by_flag(self, spark):
        """Rank prefix sums run over the per-flag distinct-value
        marginals — every window must carry the flag partition key."""
        p = plan_of(Q26.q_spearman_corr(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "flag" in args

    def test_kendall_pairs_equi_join_not_cartesian(self, spark):
        """The pair enumeration must be an equi-join on l_orderkey
        (group-bounded fanout), never a cartesian/BNLJ product."""
        p = plan_of(Q26.q_kendall_tau_grouped(spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_cramers_v_marginals_broadcast(self, spark):
        """Row/column totals and the grand total join back onto the
        grid via broadcast — no shuffle join over the tiny grid."""
        p = plan_of(Q26.q_cramers_v_report(spark, SF), "simple")
        assert "SortMergeJoin" not in p


class TestSemantics:
    def test_spearman_matches_scipy_formula(self, spark):
        """Tie-averaged Spearman from the distinct-grid construction
        must equal the classic per-row average-rank computation (done
        here in pure Python on the same data)."""
        import duckdb
        rows = duckdb.connect().execute(
            f"SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT),"
            f" CAST(round(l_discount * 100) AS BIGINT)"
            f" FROM '{SF}/lineitem.parquet'").fetchall()
        by_flag = {}
        for fl, x, y in rows:
            by_flag.setdefault(fl, []).append((x, y))

        def avg_ranks(vals):
            order = sorted(range(len(vals)), key=lambda i: vals[i])
            ranks = [0.0] * len(vals)
            i = 0
            while i < len(order):
                j = i
                while (j + 1 < len(order)
                       and vals[order[j + 1]] == vals[order[i]]):
                    j += 1
                r = (i + j) / 2 + 1
                for k in range(i, j + 1):
                    ranks[order[k]] = r
                i = j + 1
            return ranks

        import math
        expect = {}
        for fl, pts in by_flag.items():
            xs = avg_ranks([p[0] for p in pts])
            ys = avg_ranks([p[1] for p in pts])
            n = len(pts)
            sx, sy = sum(xs), sum(ys)
            sxx = sum(v * v for v in xs)
            syy = sum(v * v for v in ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            rho = ((n * sxy - sx * sy)
                   / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
            expect[fl] = math.floor(rho * 1e6)
        got = {r["flag"]: r["rho_e6"]
               for r in Q26.q_spearman_corr(spark, SF).collect()}
        # the engine floors an IEEE double; allow 1 ulp of slack at the
        # e6 lattice boundary vs the pure-Python recomputation
        assert set(got) == set(expect)
        for fl in got:
            assert abs(got[fl] - expect[fl]) <= 1, (fl, got[fl], expect[fl])

    def test_kendall_counts_consistent(self, spark):
        """Per-bucket identities: conc + disc <= n_pairs, and n_pairs
        = sum over orders of C(n_items, 2)."""
        out = {r["n_items"]: r
               for r in Q26.q_kendall_tau_grouped(spark, SF).collect()}
        for n_items, r in out.items():
            assert r["conc"] + r["disc"] <= r["n_pairs"]
            assert r["n_pairs"] == r["n_orders"] * n_items * (n_items - 1) // 2
            if r["taub_e6"] is not None:
                assert -1_000_000 <= r["taub_e6"] <= 1_000_000

    def test_c4_signature_matches_manual_rebuild(self, spark):
        """Rebuild one doc's surviving text in Python and compare the
        md5 — pins the join-order/space conventions the oracle also
        asserts, independent of DuckDB."""
        import duckdb
        import hashlib
        doc = duckdb.connect().execute(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
            f" ORDER BY doc_id LIMIT 1").fetchone()
        words = doc[1].split(" ")
        kept = []
        for i in range(0, len(words), 10):
            line = words[i:i + 10]
            if len(line) >= 5 and "slow" not in line:
                kept.append(" ".join(line))
        rebuilt = " ".join(kept)
        row = (Q26.q_c4_line_filter(spark, SF)
               .filter(F.col("doc_id") == doc[0]).collect()[0])
        assert row["sig"] == hashlib.md5(rebuilt.encode()).hexdigest()
        assert row["chars_after"] == len(rebuilt)

    def test_gopher_pass_plus_fails_bounded(self, spark):
        """n_pass <= n_docs and every failure count <= n_docs."""
        for r in Q26.q_gopher_quality_flags(spark, SF).collect():
            assert 0 <= r["n_pass"] <= r["n_docs"]
            for c in ("fail_words", "fail_wordlen", "fail_dupfrac",
                      "fail_stopwords"):
                assert 0 <= r[c] <= r["n_docs"]

    def test_cramers_v_bounds(self, spark):
        """V^2 in [0, 1e6] on the lattice; dof = (r-1)(c-1) > 0."""
        r = Q26.q_cramers_v_report(spark, SF).collect()[0]
        assert 0 <= r["v2_e6"] <= 1_000_000
        assert r["dof"] > 0
