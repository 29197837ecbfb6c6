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

    def test_referential_integrity_one_scan_per_side(self, spark):
        """r13 single-pass shape: each FK edge costs exactly ONE child
        scan + ONE parent scan (the full-outer key join reads all six
        counts from one aggregate). The r8 form paid 2+2 per edge —
        separate row-count and key-coverage aggregates share no
        exchange, so the doubles were real scans (A/B: 0.83x at 10x)."""
        p = plan_of(Q11.q_referential_integrity(spark, SF))
        n_scans = len(re.findall(r"\(\d+\) Scan parquet", p))
        assert n_scans == 2 * len(Q11._FK_EDGES), (
            f"FK audit should scan 2 files per edge, saw {n_scans}")

    def test_referential_integrity_no_cartesian(self, spark):
        """The r13 single-pass FK audit reads all six counts from one
        full-outer join per edge — the plan should contain no
        nested-loop join of any kind."""
        p = plan_of(Q11.q_referential_integrity(spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

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


    def test_fd_discovery_no_joins_anywhere(self, spark):
        """Eight 1-row multi-distinct aggregates unioned — any Join
        node means the report stopped being a pure aggregate."""
        p = plan_of(Q11.q_fd_discovery(spark, SF))
        assert "Join" not in p

    def test_distribution_drift_bounded_shuffle(self, spark):
        """Only the 1-row bounds aggregate may nested-loop; the cells
        frame groups map-side and the totals dim joins broadcast."""
        p = plan_of(Q11.q_distribution_drift(spark, SF))
        assert "CartesianProduct" not in p
        assert "SortMergeJoin" not in p


    def test_metadata_consistency_single_scan(self, spark):
        p = plan_of(Q11.q_metadata_consistency(spark, SF))
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
        assert "Join" not in p and "Window" not in p

    def test_embedding_integrity_single_scan_no_python(self, spark):
        """Array folds stay inside codegen — no Python evaluation of
        the vector column, no join, one scan."""
        p = plan_of(Q11.q_embedding_integrity(spark, SF))
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
        for bad in ("Join", "BatchEvalPython", "ArrowEvalPython"):
            assert bad not in p


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

    def test_fd_discovery_keys_hold_segments_fail(self, spark):
        rows = {(r["table_name"], r["det_col"]): r
                for r in Q11.q_fd_discovery(spark, SF).collect()}
        assert len(rows) == len(Q11._FD_CANDIDATES)
        # primary keys determine every attribute
        assert rows[("nation", "n_nationkey")]["fd_holds"] == 1
        assert rows[("customer", "c_custkey")]["fd_holds"] == 1
        assert rows[("orders", "o_orderkey")]["fd_holds"] == 1
        # a 5-value segment cannot determine 25 nations
        seg = rows[("customer", "c_mktsegment")]
        assert seg["fd_holds"] == 0 and seg["n_violating_groups"] > 0
        for r in rows.values():
            assert r["ndv_pair"] >= r["ndv_det"]

    def test_distribution_drift_bounds(self, spark):
        rows = Q11.q_distribution_drift(spark, SF).collect()
        assert rows
        for r in rows:
            assert r["n_bins"] <= Q11._DD_BINS
            # L2^2 of two unit share vectors is at most 2 (e12: 2e12)
            assert 0 <= r["drift_e12"] <= 2_000_000_000_000
            assert r["n_first_half"] + r["n_second_half"] > 0

    def test_metadata_consistency_clean_corpus(self, spark):
        rows = Q11.q_metadata_consistency(spark, SF).collect()
        assert rows
        for r in rows:
            # the synthetic manifest is consistent — the audit must
            # prove the zero, and totals must reconcile exactly
            assert r["n_mismatch"] == 0 and r["max_abs_drift"] == 0
            assert r["declared_chars"] == r["actual_chars"] > 0

    def test_embedding_integrity_clean_corpus(self, spark):
        rows = Q11.q_embedding_integrity(spark, SF).collect()
        assert rows
        for r in rows:
            assert r["n_wrong_dim"] == 0 and r["n_with_nan"] == 0
            assert r["n_zero_norm"] == 0
            assert r["total_norm_q"] > 0 and r["n_vecs"] > 0

    def test_source_overlap_symmetric_bounds(self, spark):
        rows = Q11.q_source_overlap(spark, SF).collect()
        assert 0 < len(rows) <= Q11._SO_TOPK
        for r in rows:
            assert r["src_a"] < r["src_b"]
            assert r["n_shared"] <= min(r["na"], r["nb"])
            assert 0 < r["containment_e3"] <= 1000
        shared = [r["n_shared"] for r in rows]
        assert shared == sorted(shared, reverse=True)
