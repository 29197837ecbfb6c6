"""Plan-shape + semantics tests for catalog extensions 12-16
(plans.queries_ext12 .. ext16). Oracle values are pinned by
tools/check.py / the driver correctness run; these pin the
scale-shape contracts and the cross-engine arithmetic edge cases the
oracle can only prove on the data it happens to see.
"""

from __future__ import annotations

import contextlib
import io
import re
from datetime import datetime

from pyspark.sql import functions as F

from research_index_backend_spark.plans import queries_ext12 as Q12
from research_index_backend_spark.plans import queries_ext13 as Q13
from research_index_backend_spark.plans import queries_ext14 as Q14
from research_index_backend_spark.plans import queries_ext16 as Q16

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_frequent_triples_no_join(self, spark):
        """Triples come from the in-basket combination explode — the
        plan must contain NO join at all (the oracle's 3-way self-join
        is exactly the shape this avoids at scale)."""
        p = plan_of(Q12.q_frequent_triples(spark, SF))
        assert "Join" not in p
        assert "CartesianProduct" not in p

    def test_snapshot_asof_no_window(self, spark):
        """The latest-row-per-user selection must be the combinable
        struct-max aggregate, not a row_number window over the log."""
        p = plan_of(Q12.q_snapshot_asof(spark, SF))
        assert "Window" not in p

    def test_winsorize_windows_are_partitioned(self, spark):
        """The cumulative-count window must be partitioned by type —
        an empty partition spec would sort the value domain through
        one task (the round-7-flagged class)."""
        p = plan_of(Q13.q_winsorize_report(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "event_type" in args

    def test_latency_slo_windows_are_partitioned(self, spark):
        p = plan_of(Q16.q_latency_slo_report(spark, SF))
        for args in re.findall(r"Window.*?\[([^\]]*windowspecdefinition"
                               r"[^\]]*)\]", p):
            assert "event_type" in args and "day" in args

    def test_boolean_retrieval_filter_before_aggregate(self, spark):
        """The isin term filter must prune postings BEFORE the doc
        aggregate — the conjunction never shuffles the full token
        stream."""
        p = plan_of(Q12.q_boolean_retrieval(spark, SF), "simple")
        assert p.index("Filter") > p.index("TakeOrdered") or \
            "Filter" in p  # a Filter node exists under the agg
        assert "BatchEvalPython" not in p

    def test_embedding_outliers_centroids_broadcast(self, spark):
        """The |labels| x dim centroid table must broadcast back onto
        the exploded stream — a shuffle join there doubles the
        corpus-sized exchange for no reason."""
        p = plan_of(Q16.q_embedding_outliers(spark, SF))
        assert "BroadcastHashJoin" in p

    def test_bigram_lm_no_cartesian(self, spark):
        p = plan_of(Q16.q_bigram_lm_score(spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


class TestSemanticEdges:
    def test_theil_sen_floors_negative_slopes(self, spark, tmp_path):
        """The positive-offset identity must produce FLOOR semantics
        for negative slopes on the Spark side (Spark's raw `div`
        truncates toward zero; DuckDB's `//` floors — the offset makes
        both compute floor). Two days, 3 apart, means 10000 -> 9900
        e4: slope = floor(-10000/3) = -3334, NOT trunc(-3334.33) =
        -3333... i.e. the identity, not raw div, decides."""
        rows = [
            (1, datetime(2024, 1, 1, 12), 10, "x", 1.00, "{}"),
            (2, datetime(2024, 1, 4, 12), 10, "x", 0.99, "{}"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
                  " event_type string, value double, props string")
        df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = {r["event_type"]: r["median_slope_e6"]
               for r in Q13.q_theil_sen_trend(spark,
                                              str(tmp_path)).collect()}
        assert out["x"] == -3334

    def test_golden_record_modal_lang_tie_breaks_lexicographic(
            self, spark, tmp_path):
        """A 1-1 language tie inside a cluster must resolve to the
        lexicographically smaller lang (the padded-count ord string
        guarantees count DESC, lang ASC on both engines)."""
        prefix = "t1 t2 t3 t4 t5 t6 t7 t8"
        rows = [
            (7, f"{prefix} xx", "bb", "s1", 20),
            (3, f"{prefix} yy", "aa", "s2", 25),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string,"
                  " source string, n_chars long")
        df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        out = Q12.q_golden_record(spark, str(tmp_path)).collect()
        assert len(out) == 1
        r = out[0]
        assert r["canonical_id"] == 3
        assert r["n_members"] == 2
        assert r["n_sources"] == 2
        assert r["lang_modal"] == "aa"
        assert r["max_chars"] == 25 and r["total_chars"] == 45

    def test_phrase_search_counts_adjacent_occurrences(
            self, spark, tmp_path):
        """Positional semantics: 'hash join hash join' = 2 hits;
        'join hash join' = 1 hit at position 2; 'hash ... join'
        non-adjacent = 0 hits (the doc must be absent)."""
        rows = [
            (1, "hash join hash join", "aa", "s1", 19),
            (2, "join hash join", "aa", "s1", 14),
            (3, "hash table merge join", "aa", "s1", 21),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string,"
                  " source string, n_chars long")
        df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        out = {r["doc_id"]: (r["n_occur"], r["first_pos"])
               for r in Q12.q_phrase_search(spark, str(tmp_path)).collect()}
        assert out[1] == (2, 1)
        assert out[2] == (1, 2)
        assert 3 not in out

    def test_group_kfold_partitions_users(self, spark):
        """Fold shares must sum to ~1e6 and user counts to the
        distinct-user total — the fold map is a partition of users."""
        out = Q12.q_group_kfold(spark, SF).collect()
        total_users = (
            spark.read.parquet(f"{SF}/events.parquet")
            .select("user_id").distinct().count())
        assert sum(r["n_users"] for r in out) == total_users
        share = sum(r["event_share_e6"] for r in out)
        assert 1000000 - len(out) <= share <= 1000000

    def test_sax_alphabet_boundaries(self, spark, tmp_path):
        """Linear ramp 1.00/2.00/3.00: the middle day sits exactly AT
        the mean (dlt = 0 -> 'c', the strict-< c-branch must win) and
        the endpoints sit at |z| = sqrt(3/2) > 0.67 -> 'a' / 'd' — the
        full alphabet from one fixture, pinning the branch order."""
        rows = [
            (i, datetime(2024, 1, 1 + i, 12), 10, "x", 1.0 + i, "{}")
            for i in range(3)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
                  " event_type string, value double, props string")
        df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = Q14.q_sax_symbolic(spark, str(tmp_path)).collect()
        assert out[0]["sax_string"] == "acd"
