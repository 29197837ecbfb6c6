"""Plan-shape tests for the retrieval/hygiene catalog extension
(plans.queries_ext3). Values are pinned by the DuckDB oracles; these pin
the scale properties."""

from __future__ import annotations

import contextlib
import io

from research_index_backend_spark.plans import queries_ext3 as Q3

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_bm25_topk_is_partial_topk(self, spark):
        """Top-k must compile to TakeOrderedAndProject (per-partition
        partial top-k), never a global sort; stats/df sides broadcast."""
        p = plan_of(Q3.q_bm25_topk(spark, SF))
        assert "TakeOrderedAndProject" in p
        assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
        assert "SortMergeJoin" not in p

    def test_decontaminate_broadcasts_eval_side(self, spark):
        """The eval shingle set must broadcast — contamination checking
        never shuffles the training corpus."""
        p = plan_of(Q3.q_decontaminate_overlap(spark, SF))
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p

    def test_range_join_is_equi_not_nested_loop(self, spark):
        """Banding must turn the interval predicate into a hash equi-join
        on the band key — a BroadcastNestedLoopJoin means every interval
        is scanned per row (the O(|F|*|D|) shape banding exists to
        avoid)."""
        p = plan_of(Q3.q_range_banded_join(spark, SF))
        assert "BroadcastHashJoin" in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "band" in p

    def test_text_repetition_tokenizes_once(self, spark):
        """Both repetition signals read one materialized tokenization —
        the raw corpus is scanned once, not once per signal."""
        p = plan_of(Q3.q_text_repetition(spark, SF))
        n_scans = sum("documents.parquet" in ln
                      for ln in p.splitlines() if "Location" in ln)
        assert n_scans == 0  # base is checkpointed; no raw re-scan


class TestSemantics:
    def test_bm25_scores_positive_and_ranked(self, spark):
        rows = Q3.q_bm25_topk(spark, SF).collect()
        assert 0 < len(rows) <= Q3._BM25_K
        scores = [r["score_e6"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)

    def test_eval_docs_never_flagged(self, spark):
        rows = Q3.q_decontaminate_overlap(spark, SF).collect()
        assert all(r["doc_id"] % Q3._DECON_EVAL_MOD != 0 for r in rows)

    def test_repetition_short_docs_survive(self, spark, tmp_path):
        """Docs with <2 tokens must not crash the bigram branch
        (F.sequence(1, size-1) is descending for size<2 and element_at
        would throw) and must emit null fractions like the DuckDB oracle,
        whose generate_series(1, 0) is simply empty."""
        sf = str(tmp_path)
        spark.createDataFrame(
            [(1, "", "en", "t", 0),
             (2, "solo", "en", "t", 4),
             (3, "two words", "en", "t", 9),
             (4, None, "en", "t", None),
             (5, "a a a a a a", "en", "t", 11)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
        rows = {r["doc_id"]: r for r in Q3.q_text_repetition(spark, sf).collect()}
        assert set(rows) == {1, 2, 3, 4, 5}
        for short_id in (1, 2, 4):
            assert rows[short_id]["top_bigram_frac_e6"] is None
            assert rows[short_id]["dup_5gram_frac_e6"] is None
        assert rows[3]["top_bigram_frac_e6"] == 1_000_000
        assert rows[5]["top_bigram_frac_e6"] == 1_000_000
        assert rows[5]["dup_5gram_frac_e6"] == 500_000

    def test_repetition_fractions_bounded(self, spark):
        rows = Q3.q_text_repetition(spark, SF).collect()
        assert rows
        for r in rows:
            if r["top_bigram_frac_e6"] is not None:
                assert 0 < r["top_bigram_frac_e6"] <= 1_000_000
            if r["dup_5gram_frac_e6"] is not None:
                assert 0 <= r["dup_5gram_frac_e6"] <= 1_000_000
