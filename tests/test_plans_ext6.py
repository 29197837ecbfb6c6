"""Plan-shape + semantics tests for catalog extension 6
(plans.queries_ext6). Values are pinned by the DuckDB oracles
(tools/check.py, driver correctness run); these pin the scale
properties and the determinism contracts."""

from __future__ import annotations

import contextlib
import io

from research_index_backend_spark.plans import queries_ext6 as Q6

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_lang_id_profile_broadcasts(self, spark):
        """The (n_langs x M) profile is a broadcast dim — the corpus
        side must never sort-merge against it, and no cartesian doc x
        lang expansion may appear."""
        p = plan_of(Q6.q_lang_id_trigram(spark, SF))
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_cms_topk_is_take_ordered_and_sketch_broadcasts(self, spark):
        """Top-k must be TakeOrdered (no single-partition global
        window); the 2048-cell sketch must broadcast to the probes."""
        p = plan_of(Q6.q_cms_heavy_hitters(spark, SF))
        assert "TakeOrdered" in p
        assert "Window" not in p
        assert "BroadcastHashJoin" in p

    def test_spatial_join_is_equi_join(self, spark):
        """The eps-neighbor join must be an equi-join on grid cells —
        never a nested-loop/cartesian distance join."""
        p = plan_of(Q6.q_spatial_core_points(spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_prefix_dedup_window_is_blocked(self, spark):
        """The sorted window must be partitioned by the block key (a
        per-block sort), not a global single-partition window."""
        df = Q6.q_prefix_dedup(spark, SF)
        p = plan_of(df)
        assert "Window" in p
        # the window's partition spec carries the substring block key
        assert "substring" in p.lower()


class TestSemantics:
    def test_prefix_dedup_finds_all_planted(self, spark):
        """Every planted truncation (45 < doc length) must be flagged a
        prefix-dup; natural corpus text has none."""
        rows = {r["planted"]: r
                for r in Q6.q_prefix_dedup(spark, SF).collect()}
        planted = rows[True]
        assert planted["n_prefix_dup"] + planted["n_exact_dup"] \
            == planted["n_docs"]
        assert rows[False]["n_short_unchecked"] == 0

    def test_cms_never_undercounts(self, spark):
        """Count-min is a one-sided estimator: est >= exact, always."""
        for r in Q6.q_cms_heavy_hitters(spark, SF).collect():
            assert r["cms_est"] >= r["exact"]
            assert r["overcount"] == r["cms_est"] - r["exact"]

    def test_hll_estimate_within_tolerance(self, spark):
        """m=256 gives ~6.5% standard error; assert within 4 sigma and
        that the audit columns are consistent."""
        for r in Q6.q_hll_distinct(spark, SF).collect():
            assert r["n_zero_regs"] >= 0
            if r["n_exact"] >= 100:
                rel = abs(r["hll_est"] - r["n_exact"]) / r["n_exact"]
                assert rel < 0.26, (r, rel)

    def test_span_dedup_fraction_bounds(self, spark):
        for r in Q6.q_span_dedup(spark, SF).collect():
            assert 0 <= r["n_dup_spans"] <= r["n_spans"]
            assert 0 <= r["dup_frac_e6"] <= 1_000_000

    def test_containment_at_least_jaccard_pairs(self, spark):
        """Containment >= Jaccard for every pair, so the containment
        join at threshold t must return a superset of the Jaccard join
        at t over the same capped shingle space."""
        from research_index_backend_spark.operators.dedup import (
            ngram_containment_pairs, ngram_jaccard_pairs)
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        cont = {(r["id_a"], r["id_b"])
                for r in ngram_containment_pairs(
                    docs, "text", "doc_id", n=5, threshold_e6=700_000,
                    max_token_df=100).collect()}
        jac = {(r["id_a"], r["id_b"])
               for r in ngram_jaccard_pairs(
                   docs, "text", "doc_id", n=5, threshold=0.7,
                   max_token_df=100).collect()}
        assert jac <= cont
        assert cont  # non-vacuous at this SF

    def test_train_split_covers_corpus_and_reruns_identically(self, spark):
        """Split membership is a pure function of doc_id: a re-run is
        bit-identical, every doc lands in exactly one split, and the
        proportions are 80/10/10-ish."""
        a = {(r["split"], r["lang"]): (r["n_docs"], r["n_tokens"])
             for r in Q6.q_train_split_report(spark, SF).collect()}
        b = {(r["split"], r["lang"]): (r["n_docs"], r["n_tokens"])
             for r in Q6.q_train_split_report(spark, SF).collect()}
        assert a == b
        total = sum(v[0] for v in a.values())
        n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
        assert total == n_docs
        train = sum(v[0] for k, v in a.items() if k[0] == "train")
        # md5 split at small n: generous binomial slack around 80%
        assert 0.6 * total <= train <= 0.95 * total
