"""Plan-shape + semantics tests for catalog extension 11
(plans.queries_ext11). Oracle values are pinned by tools/check.py /
the driver correctness run; these pin the scale-shape contracts."""

from __future__ import annotations

import contextlib
import io
import re

from research_index_backend_spark.plans import queries_ext11 as Q11

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_referential_integrity_prunes_to_key_columns(self, spark):
        """Each FK edge's child scan must read ONLY the fk column — a
        full-width lineitem read per edge is the 100 TB killer this
        audit is designed to avoid."""
        p = plan_of(Q11.q_referential_integrity(spark, SF))
        for rs in re.findall(r"ReadSchema: struct<([^>]*)>", p):
            cols = [c.split(":")[0] for c in rs.split(",") if c]
            assert len(cols) <= 1, f"unpruned FK-audit scan: {rs}"

    def test_referential_integrity_no_cartesian(self, spark):
        """Only the 1-row coverage/parent aggregates may nested-loop
        (BNLJ-allowlisted); a CartesianProduct anywhere is a bug."""
        p = plan_of(Q11.q_referential_integrity(spark, SF))
        assert "CartesianProduct" not in p

    def test_readability_single_scan_no_corpus_shuffle(self, spark):
        """Pure column expressions + one lang groupBy: exactly one
        parquet scan, no join, no window, no Python."""
        p = plan_of(Q11.q_readability_report(spark, SF))
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
        for bad in ("Join", "Window", "BatchEvalPython", "ArrowEvalPython"):
            assert bad not in p, f"{bad} in readability plan"

    def test_source_overlap_no_cartesian_no_window(self, spark):
        """Pairs come from bounded collect_set explosion and totals
        join back broadcast — never a shingle self-join or a global
        window top-k."""
        p = plan_of(Q11.q_source_overlap(spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "Window" not in p
        assert "TakeOrderedAndProject" in p


class TestSemantics:
    def test_referential_integrity_edge_count_and_bounds(self, spark):
        rows = {(r["child_table"], r["fk_col"]): r
                for r in Q11.q_referential_integrity(spark, SF).collect()}
        assert len(rows) == len(Q11._FK_EDGES)
        for r in rows.values():
            assert r["n_fk_distinct"] <= r["n_rows"]
            assert r["n_orphan_keys"] <= r["n_fk_distinct"]
            assert r["n_parents_referenced"] <= r["n_parents"]
            assert (r["n_parents_referenced"]
                    == r["n_fk_distinct"] - r["n_orphan_keys"])
        # TPC-H generators emit no orphans; the audit must agree.
        assert all(r["n_orphan_keys"] == 0 for r in rows.values())
        li = rows[("lineitem", "l_orderkey")]
        assert li["n_parents"] > 0 and li["n_rows"] > li["n_parents"]

    def test_readability_scores_in_plausible_band(self, spark):
        rows = Q11.q_readability_report(spark, SF).collect()
        assert rows and all(r["total_words"] > 0 for r in rows)
        for r in rows:
            # syllables-per-word in [1, 4] for any natural-ish text
            assert 1000 <= r["spw_e3"] <= 4000
            assert r["flesch_e3"] < 206835

    def test_source_overlap_symmetric_bounds(self, spark):
        rows = Q11.q_source_overlap(spark, SF).collect()
        assert 0 < len(rows) <= Q11._SO_TOPK
        for r in rows:
            assert r["src_a"] < r["src_b"]
            assert r["n_shared"] <= min(r["na"], r["nb"])
            assert 0 < r["containment_e3"] <= 1000
        shared = [r["n_shared"] for r in rows]
        assert shared == sorted(shared, reverse=True)
