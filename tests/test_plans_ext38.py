"""Plan-shape + semantics tests for catalog extension 38 (round 9,
second session, wave 13: broadcast advisor / split leakage / churn
labels).
"""

from __future__ import annotations

import contextlib
import io

from research_index_backend_spark.plans import queries_ext38 as Q38

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_no_udfs_anywhere(self, spark):
        for fn in (Q38.q_broadcast_advisor, Q38.q_split_leakage_audit,
                   Q38.q_churn_feature_labels):
            assert "BatchEvalPython" not in plan_of(fn(spark, SF))


class TestSemantics:
    def test_broadcast_advisor_small_dims_broadcast(self, spark):
        rows = {r["table_name"]: r for r in
                Q38.q_broadcast_advisor(spark, SF).collect()}
        assert rows["region"]["verdict"] == "broadcast"
        assert rows["nation"]["verdict"] == "broadcast"
        for r in rows.values():
            assert r["est_bytes"] > r["n_rows"] * 20

    def test_split_leakage_partition(self, spark):
        import duckdb
        n_users = duckdb.connect().execute(
            f"SELECT count(DISTINCT user_id)"
            f" FROM '{SF}/events.parquet'").fetchone()[0]
        r = Q38.q_split_leakage_audit(spark, SF).collect()[0]
        assert (r["train_only"] + r["test_only"] + r["in_both"]
                == n_users)
        assert 0 <= r["overlap_e6"] <= 1_000_000

    def test_churn_labels_cover_observed_users(self, spark):
        import duckdb
        rows = Q38.q_churn_feature_labels(spark, SF).collect()
        assert {r["churned"] for r in rows} <= {0, 1}
        n_obs_users = duckdb.connect().execute(
            f"""WITH a AS (SELECT max(epoch_ns(ts)) AS amax
                           FROM '{SF}/events.parquet')
                SELECT count(DISTINCT user_id)
                FROM '{SF}/events.parquet', a
                WHERE epoch_ns(ts) < amax - 7 * 86400000000000
            """).fetchone()[0]
        assert sum(r["n_users"] for r in rows) == n_obs_users
        for r in rows:
            assert r["mean_events"] > 0
            assert r["mean_recency_d"] >= 0
