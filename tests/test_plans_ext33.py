"""Plan-shape + semantics tests for catalog extension 33 (round 9,
second session, wave 8: MRR / LOO-kNN label eval / k-anon ladder).
"""

from __future__ import annotations

import contextlib
import io

from research_index_backend_spark.plans import queries_ext33 as Q33

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_knn_label_no_cartesian(self, spark):
        p = plan_of(Q33.q_knn_label_eval(spark, SF), "simple")
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p

    def test_kanon_ladder_single_scan(self, spark):
        p = plan_of(Q33.q_kanon_generalization_ladder(spark, SF),
                    "simple")
        assert p.count("Generate") == 1
        assert "BatchEvalPython" not in p


class TestSemantics:
    def test_mrr_bounds_and_batch_row(self, spark):
        rows = Q33.q_mrr_eval(spark, SF).collect()
        per_q = [r for r in rows if r["query_id"] >= 0]
        batch = [r for r in rows if r["query_id"] == -1]
        assert len(per_q) == 10 and len(batch) == 1
        for r in per_q:
            assert 0 <= r["first_rel_rank"] <= 10
            if r["first_rel_rank"] > 0:
                assert r["rr_e6"] == 1000000 // r["first_rel_rank"]
            else:
                assert r["rr_e6"] == 0
        assert batch[0]["rr_e6"] == (
            sum(r["rr_e6"] for r in per_q) // len(per_q))

    def test_knn_accuracy_totals(self, spark):
        import duckdb
        total = duckdb.connect().execute(
            f"SELECT count(*), count(DISTINCT label)"
            f" FROM '{SF}/embeddings.parquet'").fetchone()
        rows = Q33.q_knn_label_eval(spark, SF).collect()
        assert len(rows) == total[1]
        assert sum(r["n"] for r in rows) == total[0]
        for r in rows:
            assert 0 <= r["correct"] <= r["n"]
            assert r["accuracy_e6"] == 1000000 * r["correct"] // r["n"]

    def test_kanon_ladder_monotone(self, spark):
        """Coarser bands can only merge classes: k_min is
        non-decreasing and class count non-increasing up the
        ladder; exposure non-increasing."""
        rows = Q33.q_kanon_generalization_ladder(spark, SF).collect()
        assert len(rows) == 8
        for a, b in zip(rows, rows[1:]):
            assert b["n_classes"] <= a["n_classes"]
            assert b["k_min"] >= a["k_min"]
            assert b["band_dollars"] == 2 * a["band_dollars"]
