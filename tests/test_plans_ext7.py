"""Plan-shape + semantics tests for catalog extension 7
(plans.queries_ext7). Values are pinned by the DuckDB oracles
(tools/check.py, driver correctness run); these pin the scale
properties and the semantic contracts (leakage-freedom, pruning,
sketch mergeability) that a value hash alone doesn't express."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from research_index_backend_spark.plans import queries_ext7 as Q7

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_pit_join_has_no_join_operator(self, spark):
        """The point-in-time match must compile to the union + sorted
        carry-forward plan — NO join operator anywhere (the naive
        inequality join is quadratic in per-key density)."""
        p = plan_of(Q7.q_pit_join(spark, SF))
        assert "Join" not in p
        assert "Window" in p

    def test_zone_map_prune_is_join_free(self, spark):
        """Thresholds explode inline; the whole report is one scan +
        two aggregates — no join, no cartesian."""
        p = plan_of(Q7.q_zone_map_prune(spark, SF))
        assert "Join" not in p

    def test_k_anonymity_is_join_free(self, spark):
        p = plan_of(Q7.q_k_anonymity(spark, SF))
        assert "Join" not in p

    def test_merkle_diff_broadcasts_dirty_buckets(self, spark):
        """The dirty-bucket list must be broadcast into both row scans
        (partition pruning); the fingerprint pass must not cartesian."""
        p = plan_of(Q7.q_merkle_diff(spark, SF))
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p

    def test_record_linkage_topk_is_take_ordered(self, spark):
        """Top-20 must be TakeOrdered (no single-partition global
        sort); the pair join must be the blocked equi-join."""
        p = plan_of(Q7.q_record_linkage(spark, SF))
        assert "TakeOrdered" in p
        assert "CartesianProduct" not in p

    def test_bpe_topk_is_take_ordered(self, spark):
        p = plan_of(Q7.q_bpe_pair_stats(spark, SF))
        assert "TakeOrdered" in p
        assert "CartesianProduct" not in p

    def test_clustering_coeff_no_cartesian(self, spark):
        p = plan_of(Q7.q_graph_clustering_coeff(spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


class TestSemantics:
    def test_pit_join_covers_every_purchase(self, spark):
        """Every purchase lands in exactly one bucket (the as-of left
        join drops nothing)."""
        out = Q7.q_pit_join(spark, SF).agg(F.sum("n_purchases")).collect()
        n_purchases = (
            spark.read.parquet(f"{SF}/events.parquet")
            .filter(F.col("event_type") == "purchase").count())
        assert out[0][0] == n_purchases

    def test_pit_join_first_day_purchases_are_cold(self, spark):
        """Leakage-freedom: a user's purchases on their own first
        active day must see NO features (bucket 'cold') — same-day
        activity is never visible."""
        e = spark.read.parquet(f"{SF}/events.parquet").select(
            "user_id", F.to_date("ts").alias("day"), "event_type")
        first = e.groupBy("user_id").agg(F.min("day").alias("day0"))
        n_first_day = (e.filter(F.col("event_type") == "purchase")
                       .join(first, "user_id")
                       .filter(F.col("day") == F.col("day0")).count())
        cold = {r["bucket"]: r["n_purchases"]
                for r in Q7.q_pit_join(spark, SF).collect()}
        assert cold.get("cold", 0) >= n_first_day

    def test_k_anonymity_monotone_in_k(self, spark):
        rows = sorted(Q7.q_k_anonymity(spark, SF).collect(),
                      key=lambda r: r["k"])
        classes = {r["n_classes"] for r in rows}
        assert len(classes) == 1  # class partition independent of k
        risk = [r["n_rows_at_risk"] for r in rows]
        assert risk == sorted(risk)  # larger k -> more rows at risk

    def test_merkle_diff_prunes_clean_buckets(self, spark):
        """Only a strict subset of buckets may be dirty, and each
        mutation class must be observed."""
        rows = Q7.q_merkle_diff(spark, SF).collect()
        o = spark.read.parquet(f"{SF}/orders.parquet")
        n_buckets = (o.select((F.col("o_orderkey") / Q7._MD_BUCKET)
                              .cast("bigint")).distinct().count())
        assert 0 < len(rows) < n_buckets
        assert sum(r["n_removed"] for r in rows) > 0
        assert sum(r["n_changed"] for r in rows) > 0
        assert sum(r["n_added"] for r in rows) > 0

    def test_zone_map_value_layout_prunes_no_worse(self, spark):
        """Clustering on the filter column must prune at least as hard
        as the time layout for every threshold, with identical match
        counts (pruning never changes the answer)."""
        rows = Q7.q_zone_map_prune(spark, SF).collect()
        by = {(r["layout"], r["thr"]): r for r in rows}
        for thr in Q7._ZM_THRESHOLDS:
            t, v = by[("time", thr)], by[("value", thr)]
            assert v["rows_matched"] == t["rows_matched"]
            assert v["scan_frac_e6"] <= t["scan_frac_e6"]

    def test_hll_union_merges_to_global(self, spark):
        """Sketch mergeability: the ALL row's exact count equals the
        sum of region exacts (disjoint keys) and the merged estimate
        stays within HLL's error envelope of it."""
        rows = {r["scope"]: r for r in
                Q7.q_hll_union_report(spark, SF).collect()}
        regions = [r for s, r in rows.items() if s != "ALL"]
        assert rows["ALL"]["n_exact"] == sum(r["n_exact"] for r in regions)
        exact = rows["ALL"]["n_exact"]
        assert abs(rows["ALL"]["hll_est"] - exact) <= max(10, 0.2 * exact)

    def test_trend_regression_r2_bounded(self, spark):
        for r in Q7.q_trend_regression(spark, SF).collect():
            assert 0 <= r["r2_e6"] <= 1_000_000

    def test_interpolate_counts_observed_days(self, spark):
        """n_observed across days equals the distinct (user, day) pairs
        with 'view' events; interpolated days only fill interior gaps."""
        rows = Q7.q_interpolate_linear(spark, SF).collect()
        e = spark.read.parquet(f"{SF}/events.parquet")
        n_obs = (e.filter(F.col("event_type") == "view")
                 .select("user_id", F.to_date("ts")).distinct().count())
        assert sum(r["n_observed"] for r in rows) == n_obs

    def test_bpe_merge_removes_top_pair(self, spark):
        """Applying the round-1 winning merge must eliminate that pair
        from the round-2 counts (replace is exhaustive)."""
        rows = Q7.q_bpe_pair_stats(spark, SF).collect()
        it1 = [r for r in rows if r["iter"] == 1]
        it2 = [r for r in rows if r["iter"] == 2]
        assert len(it1) == Q7._BPE_TOPK and len(it2) == Q7._BPE_TOPK
        top1 = max(it1, key=lambda r: (r["n"], ))["pair"]
        assert top1 not in {r["pair"] for r in it2}

    def test_record_linkage_scores_sorted_and_agree(self, spark):
        rows = Q7.q_record_linkage(spark, SF).collect()
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        # a top pair agrees on at least one field, score > 0
        assert all(r["score"] > 0 for r in rows)
        assert all(r["id_a"] < r["id_b"] for r in rows)

    def test_clustering_coeff_pct_bounded(self, spark):
        rows = Q7.q_graph_clustering_coeff(spark, SF).collect()
        assert rows and all(0 <= r["pct"] <= 100 for r in rows)


def test_rl_refine_contract():
    """Pin the corpus-adaptive blocking staircase: level 0 at every
    checked SF (so the static DuckDB oracle stays valid), level 1 at
    the benched sf0.1 part count, level 2 on the 10x probe corpus,
    levels 3/4 (FULL noun / adj tokens) at the same x8 spacing — the
    r12 100x probe measured the old level-2 cap at 82.4x wall for
    100x parts (4.1e8 candidate pairs; full-noun blocking collapses
    them to 2.1e6, while deeper letter prefixes changed nothing on
    the ~8-word adj vocabulary)."""
    assert Q7._rl_refine(2_000) == 0      # sf0.01 (oracle-checked)
    assert Q7._rl_refine(200) == 0        # sf0.001
    assert Q7._rl_refine(20_000) == 1     # sf0.1 (benched)
    assert Q7._rl_refine(200_000) == 2    # 10x probe
    assert Q7._rl_refine(2_000_000) == 3  # 100x probe corpus
    assert Q7._rl_refine(10**8) == 4      # capped at full-name blocking:
    #   past that, additional blocking PASSES (multi-scheme union,
    #   sorted-neighborhood) are the answer, not more depth


class TestWave2:
    def test_sorted_neighborhood_is_join_free(self, spark):
        """The neighborhood must come from LEAD windows, not a pair
        join — the whole point vs key blocking."""
        p = plan_of(Q7.q_sorted_neighborhood(spark, SF))
        assert "Join" not in p
        assert "Window" in p

    def test_interval_overlap_is_banded_equi_join(self, spark):
        p = plan_of(Q7.q_interval_overlap_join(spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_oov_vocab_broadcasts(self, spark):
        p = plan_of(Q7.q_oov_rate(spark, SF))
        assert "BroadcastHashJoin" in p

    def test_histogram_quantile_brackets_exact(self, spark):
        """Each estimated quantile must sit within one bin width of the
        true discrete percentile (the sketch's error contract)."""
        rows = {r["p"]: r for r in
                Q7.q_histogram_quantile(spark, SF).collect()}
        cents = sorted(
            int(round(r[0] * 100)) for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_totalprice").collect())
        import math
        for p, r in rows.items():
            exact = cents[max(0, math.ceil(p / 100 * len(cents)) - 1)]
            assert r["est_c"] <= exact <= r["est_c"] + r["bin_width_c"]

    def test_label_prop_partition_is_complete(self, spark):
        """Every graph node lands in exactly one community."""
        rows = Q7.q_label_prop_communities(spark, SF).collect()
        n_from_hist = sum(r["community_size"] * r["n_communities"]
                          for r in rows)
        from research_index_backend_spark.plans.queries import (
            q_dedup_lsh_pairs,
        )
        e = q_dedup_lsh_pairs(spark, SF)
        n_nodes = (e.select(F.col("id_a").alias("id"))
                   .unionAll(e.select(F.col("id_b").alias("id")))
                   .distinct().count())
        assert n_from_hist == n_nodes

    def test_interval_overlap_positive_and_bounded(self, spark):
        """Overlap durations are positive and never exceed the burst
        window width (the banded-vs-naive equivalence itself is proven
        by the DuckDB oracle, whose join IS the naive overlap)."""
        # sf0.01: sf0.001's event density never reaches 3 errors per
        # 10-min bucket, so the burst set (and the result) is empty
        rows = Q7.q_interval_overlap_join(
            spark, "/root/testdata/sf0.01").collect()
        assert rows
        for r in rows:
            assert r["n_sessions"] > 0
            assert 0 < r["overlap_us"] <= (r["n_sessions"]
                                           * Q7._IO_BUCKET_US)
