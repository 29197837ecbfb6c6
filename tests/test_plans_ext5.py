"""Plan-shape + semantics tests for catalog extension 5
(plans.queries_ext5). Values are pinned by the DuckDB oracles
(tools/check.py, driver correctness run); these pin the scale
properties and the determinism contracts."""

from __future__ import annotations

import contextlib
import io

from research_index_backend_spark.plans import queries_ext5 as Q5

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_cube_is_one_pass_expand(self, spark):
        """CUBE must compile to a single Expand + aggregate over one
        lineitem scan — not four unioned per-level aggregations."""
        p = plan_of(Q5.q_cube_report(spark, SF))
        assert "Expand" in p
        n_scans = sum("lineitem.parquet" in ln
                      for ln in p.splitlines() if "Location" in ln)
        assert n_scans == 1
        assert "Union" not in p

    def test_ohlc_single_sort(self, spark):
        """Open/close via row_number + partition count must plan ONE
        window sort — a first/last self-join or a second descending
        sort would double the shuffle."""
        p = plan_of(Q5.q_ohlc_downsample(spark, SF))
        assert p.count("Sort ") <= 1
        assert "SortMergeJoin" not in p

    def test_bloom_bits_broadcast(self, spark):
        """The bit table must broadcast — the probe side never
        shuffles against the build side."""
        p = plan_of(Q5.q_bloom_probe(spark, SF))
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p

    def test_zscore_stats_broadcast_no_window(self, spark):
        """Flagging is a map-only pass: the 5-row stats aggregate
        broadcasts back onto events; no window over the fact table."""
        p = plan_of(Q5.q_zscore_outliers(spark, SF))
        assert "BroadcastHashJoin" in p
        assert "Window" not in p


class TestSemantics:
    def test_cube_lattice_levels(self, spark):
        rows = Q5.q_cube_report(spark, SF).collect()
        levels = {(r["g_flag"], r["g_status"]) for r in rows}
        assert levels == {(0, 0), (0, 1), (1, 0), (1, 1)}
        grand = [r for r in rows if r["g_flag"] == 1 and r["g_status"] == 1]
        assert len(grand) == 1
        assert grand[0]["n_rows"] == sum(
            r["n_rows"] for r in rows if (r["g_flag"], r["g_status"]) == (0, 0))

    def test_ohlc_bounds(self, spark):
        rows = Q5.q_ohlc_downsample(spark, SF).collect()
        assert rows
        for r in rows:
            assert r["low_c"] <= r["open_c"] <= r["high_c"]
            assert r["low_c"] <= r["close_c"] <= r["high_c"]
            if r["volume"] == 1:
                assert r["open_c"] == r["close_c"] == r["high_c"] == r["low_c"]

    def test_markov_rows_sum_to_one(self, spark):
        rows = Q5.q_markov_transitions(spark, SF).collect()
        by_from = {}
        for r in rows:
            by_from.setdefault(r["from_type"], []).append(r["p_e6"])
        for ps in by_from.values():
            # floor quantization loses at most 1e-6 per cell
            assert 1_000_000 - len(ps) <= sum(ps) <= 1_000_000

    def test_kmv_estimate_within_bounds(self, spark):
        rows = Q5.q_kmv_distinct(spark, SF).collect()
        for r in rows:
            if r["n_exact"] < Q5._KMV_K:
                assert r["kmv_est"] == r["n_exact"]
            else:
                # KMV relative error ~ 1/sqrt(k-1) ≈ 13%; allow 4 sigma
                assert abs(r["kmv_est"] - r["n_exact"]) < 0.5 * r["n_exact"]

    def test_bloom_never_false_negative(self, spark):
        r = Q5.q_bloom_probe(spark, SF).collect()[0]
        assert r["n_bloom_pass"] >= r["n_true"]
        assert r["n_false_pos"] == r["n_bloom_pass"] - r["n_true"]
        assert r["n_probed"] >= r["n_bloom_pass"]

    def test_kmeans_partitions_all_points(self, spark):
        rows = Q5.q_kmeans_embed(spark, SF).collect()
        assert len(rows) == Q5._KM_K
        assert sum(r["n_points"] for r in rows) == 500
        assert all(r["inertia"] > 0 for r in rows)

    def test_kmeans_iterations_reduce_inertia(self, spark):
        """2 Lloyd rounds must not increase total inertia vs the seed
        assignment (monotone descent is the algorithm's invariant; the
        floor-quantized centroid can lose at most K*dim/4 per round,
        negligible vs the 1e8-scale inertia)."""
        from research_index_backend_spark.plans.queries import _t
        from pyspark.sql import functions as F
        pts = Q5._km_quantize(_t(spark, SF, "embeddings")).localCheckpoint()
        from pyspark.sql import Window
        w = Window.orderBy("vec_id")
        cents = (pts.orderBy("vec_id").limit(Q5._KM_K)
                 .select((F.row_number().over(w) - 1).alias("cid"),
                         F.col("v").alias("cv")))
        seed_inertia = Q5._km_assign(pts, cents) \
            .agg(F.sum("d2")).collect()[0][0]
        final_inertia = sum(
            r["inertia"] for r in Q5.q_kmeans_embed(spark, SF).collect())
        assert final_inertia < seed_inertia

    def test_corr_in_unit_range(self, spark):
        rows = Q5.q_corr_report(spark, SF).collect()
        assert rows
        for r in rows:
            assert -1_000_000 <= r["corr_e6"] <= 1_000_000

    def test_bfs_depths_alternate_bipartite(self, spark):
        """On a bipartite graph seeded at suppliers, even depths are
        supplier nodes and odd depths part nodes; depth 0 rows are
        exactly the seeds."""
        rows = Q5.q_graph_bfs_depth(spark, SF).collect()
        assert rows
        for r in rows:
            side = r["node_id"][0]
            assert side == ("s" if r["depth"] % 2 == 0 else "p")
            assert 0 <= r["depth"] <= Q5._BFS_MAX_DEPTH
        seeds = [r for r in rows if r["depth"] == 0]
        assert all(int(r["node_id"][1:]) % Q5._BFS_SEED_MOD == 0
                   for r in seeds)

    def test_pmi_support_floor(self, spark):
        rows = Q5.q_pmi_cooccur(spark, SF).collect()
        assert 0 < len(rows) <= Q5._PMI_TOPK
        assert all(r["c_xy"] >= Q5._PMI_MIN_COUNT for r in rows)
        scores = [r["pmi_e6"] for r in rows]
        assert scores == sorted(scores, reverse=True)

    def test_gapfill_grid_dense_and_filled(self, spark):
        rows = Q5.q_gapfill_ffill(spark, SF).collect()
        by_type = {}
        for r in rows:
            by_type.setdefault(r["event_type"], []).append(r)
        sizes = {len(v) for v in by_type.values()}
        assert len(sizes) == 1  # every type has the full dense spine
        for v in by_type.values():
            v.sort(key=lambda r: r["hour_ts"])
            seen = None
            for r in v:
                if not r["is_gap"]:
                    seen = r["filled_avg_c"]
                elif seen is not None:
                    assert r["filled_avg_c"] is not None  # locf carried

    def test_table_diff_classes_complete(self, spark):
        rows = {r["diff_class"]: r["n_keys"]
                for r in Q5.q_table_diff(spark, SF).collect()}
        assert set(rows) == {"added", "removed", "changed", "unchanged"}
        assert all(n > 0 for n in rows.values())

    def test_kcore_is_fixpoint_and_min_degree(self, spark):
        """6 peel rounds must reach the fixpoint at test SF (round 7
        changes nothing) and every surviving node has induced degree
        >= k."""
        rows = Q5.q_kcore_decompose(spark, SF).collect()
        assert rows
        assert all(r["core_degree"] >= Q5._KCORE_K for r in rows)
        import research_index_backend_spark.plans.queries_ext5 as mod
        orig = mod._KCORE_ROUNDS
        try:
            mod._KCORE_ROUNDS = orig + 1
            more = Q5.q_kcore_decompose(spark, SF).collect()
        finally:
            mod._KCORE_ROUNDS = orig
        assert sorted((r["node_id"], r["core_degree"]) for r in rows) == \
            sorted((r["node_id"], r["core_degree"]) for r in more)

    def test_cascade_delete_consistent(self, spark):
        rows = {r["table_name"]: r
                for r in Q5.q_cascade_delete_audit(spark, SF).collect()}
        assert set(rows) == {"customer", "orders", "lineitem"}
        for r in rows.values():
            assert r["n_total"] == r["n_deleted"] + r["n_kept"]
            assert r["n_deleted"] > 0

    def test_table_profile_one_scan(self, spark):
        """The 4-column profile must read orders.parquet exactly once —
        per-column aggregate subqueries would multiply the scan."""
        p = plan_of(Q5.q_table_profile(spark, SF))
        n_scans = sum("orders.parquet" in ln
                      for ln in p.splitlines() if "Location" in ln)
        assert n_scans == 1
        rows = {r["column_name"]: r
                for r in Q5.q_table_profile(spark, SF).collect()}
        assert rows["o_orderkey"]["ndv"] > 0
        assert rows["o_orderstatus"]["ndv"] <= 3

    def test_sliding_windows_overlap(self, spark):
        """24h/6h windows: every user-event lands in exactly 4 windows,
        so the max window count >= any single tumbling-day count."""
        rows = Q5.q_sliding_distinct_users(spark, SF).collect()
        assert rows
        assert all(r["n_users"] > 0 for r in rows)

    def test_inverted_index_postings_sorted_capped(self, spark):
        rows = Q5.q_build_inverted_index(spark, SF).collect()
        assert rows
        for r in rows:
            ids = [int(x) for x in r["postings_head"].split(",")]
            assert ids == sorted(ids)
            assert len(ids) == min(r["df"], Q5._IDX_POSTINGS_CAP)
            assert r["cf"] >= r["df"] >= Q5._IDX_MIN_DF

    def test_exact_percentiles_ordered(self, spark):
        for r in Q5.q_exact_percentile_rank(spark, SF).collect():
            assert r["p50_c"] <= r["p90_c"] <= r["p99_c"]

    def test_skew_report_bounds(self, spark):
        r = Q5.q_skew_report(spark, SF).collect()[0]
        assert 0 <= r["gini_e6"] <= 1_000_000
        assert r["p99_freq"] <= r["max_freq"]
        assert r["top1_share_e6"] >= 1_000_000 // r["n_keys"]

    def test_blocking_finer_scheme_reduces_pairs(self, spark):
        rows = {r["scheme"]: r
                for r in Q5.q_blocking_quality(spark, SF).collect()}
        finer, coarse = rows["nation_segment"], rows["nation"]
        assert finer["n_cand_pairs"] < coarse["n_cand_pairs"]
        assert finer["n_blocks"] > coarse["n_blocks"]
        assert finer["reduction_e6"] > coarse["reduction_e6"]

    def test_keyset_page_is_takeordered_no_global_sort(self, spark):
        """The page fetch must be TakeOrderedAndProject over the
        filtered scan — OFFSET-style global sort is exactly what keyset
        pagination exists to avoid."""
        p = plan_of(Q5.q_keyset_page(spark, SF))
        assert "TakeOrderedAndProject" in p
        rows = Q5.q_keyset_page(spark, SF).collect()
        assert len(rows) == Q5._PAGE_SIZE
        keys = [(-r["price_c"], r["o_orderkey"]) for r in rows]
        assert keys == sorted(keys)

    def test_ppr_mass_concentrates_on_seed_side(self, spark):
        """Restart mass returns to the seeds, so seed suppliers must
        out-rank the average non-seed supplier, and total mass stays
        <= 1 (leaks only via damping, never grows)."""
        rows = Q5.q_graph_ppr(spark, SF).collect()
        seeds = [r["rank_e4"] for r in rows
                 if r["id"].startswith("s")
                 and int(r["id"][1:]) % 10 == 0]
        nonseeds = [r["rank_e4"] for r in rows
                    if r["id"].startswith("s")
                    and int(r["id"][1:]) % 10 != 0]
        assert seeds and nonseeds
        assert (sum(seeds) / len(seeds)) > (sum(nonseeds) / len(nonseeds))
        assert sum(r["rank_e4"] for r in rows) <= 10_000 + len(rows)

    def test_entropy_bounds(self, spark):
        rows = Q5.q_token_entropy(spark, SF).collect()
        assert rows
        for r in rows:
            # 0 <= H <= log2(n_tokens) (+1 count for round-off)
            assert -1 <= r["entropy_e6"]
            import math
            assert r["entropy_e6"] <= round(
                math.log2(r["n_tokens"]) * 1e6) + 1


class TestAdaptiveLshBits:
    def test_sizing_contract(self):
        """Checked-SF corpora (<=2000 vectors) must size to the floor (so
        the static oracles stay valid); larger corpora must grow bits
        logarithmically; monotone in N."""
        from research_index_backend_spark.operators.dedup import (
            adaptive_lsh_bits,
        )
        assert adaptive_lsh_bits(500) == 4
        assert adaptive_lsh_bits(2000) == 4
        assert adaptive_lsh_bits(20000) == 8
        assert adaptive_lsh_bits(200000) == 11
        prev = 0
        for n in (1, 10, 100, 1000, 10**4, 10**5, 10**6, 10**7):
            bits = adaptive_lsh_bits(n)
            assert bits >= prev
            prev = bits
        # average bucket stays within 2x of target once past the floor
        for n in (10**4, 10**5, 10**6):
            bits = adaptive_lsh_bits(n)
            assert n / (2 ** bits) <= 125 * 2
