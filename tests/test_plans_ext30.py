"""Plan-shape + semantics tests for catalog extension 30 (round 9,
second session, wave 5: Holt forecast / partition advisor / MMR).
Oracle values are pinned by tools/check.py; these pin scale-shape
contracts and the greedy/recurrence invariants.
"""

from __future__ import annotations

import contextlib
import io

from research_index_backend_spark.plans import queries_ext30 as Q30

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_holt_no_window_no_udf(self, spark):
        """The fold is an in-row aggregate over the collected day
        array — no windowspecdefinition, no Python."""
        p = plan_of(Q30.q_holt_forecast(spark, SF))
        assert "windowspecdefinition" not in p
        assert "BatchEvalPython" not in p

    def test_partition_advisor_single_scan(self, spark):
        """Three candidates stack via ONE in-row explode — exactly
        one Generate, one base-table scan."""
        p = plan_of(Q30.q_partition_advisor(spark, SF), "simple")
        assert p.count("Generate") == 1
        assert p.count("parquet") <= 2  # scan may appear in reused stages

    def test_mmr_no_cartesian_no_udf(self, spark):
        """The greedy fold is a constant-folded in-row aggregate over
        the checkpointed 30-row pool (the TakeOrdered candidate stage
        executes at checkpoint time, so it is not in this explain);
        nothing corpus-scale may cross-product or drop to Python."""
        p = plan_of(Q30.q_mmr_diversify(spark, SF), "simple")
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p


class TestSemantics:
    def test_holt_recurrence_replay(self, spark):
        """Replay the integer recurrence in Python from the day table
        and compare h=0..7 exactly."""
        import duckdb
        rows = duckdb.connect().execute(
            f"""SELECT event_type, epoch_ns(ts) // 86400000000000,
                       CAST(sum(CAST(round(value * 100) AS BIGINT))
                            AS BIGINT)
                FROM '{SF}/events.parquet'
                GROUP BY 1, 2 ORDER BY 1, 2""").fetchall()
        series = {}
        for et, day, y in rows:
            series.setdefault(et, []).append(y)

        def trunc_div(a, b):
            q = abs(a) // abs(b)
            return q if (a >= 0) == (b >= 0) else -q

        expect = {}
        for et, ys in series.items():
            l, b = ys[0] * 1000, 0
            for y in ys[1:]:
                l2 = trunc_div(300 * y * 1000 + 700 * (l + b), 1000)
                b = trunc_div(200 * (l2 - l) + 800 * b, 1000)
                l = l2
            for h in range(8):
                expect[(et, h)] = trunc_div(l + h * b, 1000)
        got = {(r["event_type"], r["h"]): r["forecast_c"]
               for r in Q30.q_holt_forecast(spark, SF).collect()}
        assert got == expect

    def test_partition_advisor_verdicts(self, spark):
        """Priority/status/month have known shapes: priority has 5
        near-uniform values (ok), status has 3 (<4: too few)."""
        rows = {r["cand"]: r for r in
                Q30.q_partition_advisor(spark, SF).collect()}
        assert rows["o_orderpriority"]["ndv"] == 5
        assert rows["o_orderpriority"]["verdict"] == "ok"
        assert rows["o_orderstatus"]["verdict"] in (
            "too_few_partitions", "skewed")
        for r in rows.values():
            assert r["rows_per_part"] * r["ndv"] <= r["n_rows"]
            assert 0 < r["top_share_e6"] <= 1_000_000

    def test_mmr_unique_selections_and_first_is_top(self, spark):
        """All selected docs distinct; step 1 is the relevance top-1
        (no redundancy yet); mmr scores weakly decrease is NOT
        guaranteed by MMR, but all scores stay within the lattice
        bounds [-0.3e6, 0.7e6]."""
        rows = Q30.q_mmr_diversify(spark, SF).collect()
        assert len(rows) == 10
        ids = [r["doc_id"] for r in rows]
        assert len(set(ids)) == 10
        assert rows[0]["mmr_e6"] == 700_000
        for r in rows:
            assert -300_000 <= r["mmr_e6"] <= 700_000

    def test_mmr_greedy_replay(self, spark):
        """Replay the greedy selection in Python from the pool and
        sims built via DuckDB, and compare the full trajectory."""
        import duckdb
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM"
                    f" '{SF}/documents.parquet'")
        pool = con.execute(r"""
            WITH tf AS (
              SELECT doc_id, count(*) AS rel
              FROM (SELECT doc_id, unnest(list_filter(
                      string_split_regex(lower(text), '\s+'),
                      x -> x <> '')) AS term FROM documents)
              WHERE term IN ('spark', 'join', 'stream')
              GROUP BY doc_id)
            SELECT doc_id, row_number() OVER
                     (ORDER BY rel DESC, doc_id) AS rank
            FROM tf ORDER BY rel DESC, doc_id LIMIT 30""").fetchall()
        toks = dict(con.execute(r"""
            SELECT doc_id, list_distinct(list_filter(
              string_split_regex(lower(text), '\s+'), x -> x <> ''))
            FROM documents""").fetchall())
        sims = {}
        for d1, r1 in pool:
            for d2, r2 in pool:
                if r1 < r2:
                    a, b = set(toks[d1]), set(toks[d2])
                    sims[(r1, r2)] = 1000000 * len(a & b) // len(a | b)
        sel, traj = [], []
        for step in range(1, 11):
            best = None
            for d, r in pool:
                if r in sel:
                    continue
                mx = max([sims[(min(r, s), max(r, s))] for s in sel],
                         default=0)
                mmr = (700000 * (30 - r + 1) * 1000000 // 30
                       - 300000 * mx)
                if best is None or (mmr, -r) > best[:2]:
                    best = (mmr, -r, d)
            sel.append(-best[1])
            traj.append((step, best[2], int(best[0] / 1e6)
                         if best[0] >= 0 else -((-best[0]) // 10**6)))
        got = [(r["step"], r["doc_id"], r["mmr_e6"])
               for r in Q30.q_mmr_diversify(spark, SF).collect()]
        assert got == traj
