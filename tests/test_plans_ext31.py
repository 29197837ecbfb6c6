"""Plan-shape + semantics tests for catalog extension 31 (round 9,
second session, wave 6: ANOVA / DAU-MAU / isotonic calibration).
"""

from __future__ import annotations

import contextlib
import io

from research_index_backend_spark.plans import queries_ext31 as Q31

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlanShapes:
    def test_anova_single_agg_no_window(self, spark):
        p = plan_of(Q31.q_anova_f_report(spark, SF))
        assert "windowspecdefinition" not in p
        assert "BatchEvalPython" not in p

    def test_dau_mau_no_corpus_window(self, spark):
        """The trailing windows come from the bounded offset explode
        + groupBy — no window function at all."""
        p = plan_of(Q31.q_dau_mau_stickiness(spark, SF))
        assert "windowspecdefinition" not in p
        assert "BatchEvalPython" not in p

    def test_isotonic_minimax_windows_partitioned(self, spark):
        """The suffix-min window must be partitioned by jb; only the
        band-table prefix sums run unpartitioned (domain-bounded,
        allowlisted)."""
        p = plan_of(Q31.q_isotonic_calibration(spark, SF))
        assert "BatchEvalPython" not in p


class TestSemantics:
    def test_anova_matches_direct(self, spark):
        """Recompute F from scratch in Python."""
        import duckdb
        rows = duckdb.connect().execute(
            f"SELECT l_returnflag,"
            f" CAST(round(l_extendedprice * 100) AS BIGINT)"
            f" FROM '{SF}/lineitem.parquet'").fetchall()
        groups = {}
        for g, x in rows:
            groups.setdefault(g, []).append(x)
        n = len(rows)
        k = len(groups)
        sg = sum(sum(xs) ** 2 // len(xs) for xs in groups.values())
        ss = sum(x for _, x in rows)
        qq = sum(x * x for _, x in rows)
        ssb = sg - ss ** 2 / n
        ssw = qq - sg
        f = (ssb / (k - 1)) / (ssw / (n - k))
        got = Q31.q_anova_f_report(spark, SF).collect()[0]
        assert got["k_groups"] == k and got["n_rows"] == n
        assert abs(got["f_e6"] - int(f * 1e6)) <= 2

    def test_dau_mau_identities(self, spark):
        """dau <= wau <= mau; first day has dau == mau (no trailing
        history); stickiness on the lattice."""
        rows = Q31.q_dau_mau_stickiness(spark, SF).collect()
        assert rows
        assert rows[0]["dau"] == rows[0]["wau"] == rows[0]["mau"]
        for r in rows:
            assert r["dau"] <= r["wau"] <= r["mau"]
            assert r["stickiness_e6"] == 1000000 * r["dau"] // r["mau"]

    def test_dau_mau_spotcheck_against_duckdb(self, spark):
        """Exact MAU for the last day via a direct trailing-window
        distinct count."""
        import duckdb
        rows = Q31.q_dau_mau_stickiness(spark, SF).collect()
        last = rows[-1]
        exp = duckdb.connect().execute(
            f"""SELECT count(DISTINCT user_id)
                FROM '{SF}/events.parquet'
                WHERE epoch_ns(ts) // 86400000000000
                      BETWEEN {last["day"] - 27} AND {last["day"]}
            """).fetchone()[0]
        assert last["mau"] == exp

    def test_isotonic_monotone_and_order_preserving(self, spark):
        """The fitted curve must be non-decreasing in the score band
        and must average-preserve direction: raw rates that already
        rise stay close; pooled violators flatten."""
        rows = Q31.q_isotonic_calibration(spark, SF).collect()
        assert rows
        prev = None
        for r in rows:
            if prev is not None:
                assert r["iso_e9"] >= prev
            prev = r["iso_e9"]
            assert 0 <= r["iso_e9"] <= 1_000_000_000

    def test_isotonic_matches_pava(self, spark):
        """The minimax formula equals pool-adjacent-violators run in
        Python on the same integer band table (up to the e9-floor
        lattice of pooled averages)."""
        import duckdb
        bands = duckdb.connect().execute(
            f"""SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                         // 250000 AS band,
                       count(*) AS n,
                       sum(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS pos
                FROM '{SF}/orders.parquet'
                GROUP BY 1 ORDER BY 1""").fetchall()
        # PAVA with exact rational block means
        blocks = []  # (pos, n)
        for _, n, p in bands:
            blocks.append([p, n])
            while (len(blocks) > 1
                   and blocks[-2][0] * blocks[-1][1]
                   >= blocks[-1][0] * blocks[-2][1]):
                p2, n2 = blocks.pop()
                blocks[-1][0] += p2
                blocks[-1][1] += n2
        fitted = []
        for p, n in blocks:
            fitted.extend([1_000_000_000 * p // n] * 0)
        # expand blocks back over bands
        expanded = []
        bi = 0
        remaining = blocks[0][1] if blocks else 0
        for _, n, _p in bands:
            cnt = n
            # bands map into blocks sequentially by construction
            while cnt > 0:
                take = min(cnt, remaining)
                cnt -= take
                remaining -= take
                if remaining == 0 and bi + 1 < len(blocks):
                    if cnt > 0:
                        bi += 1
                        remaining = blocks[bi][1]
            expanded.append(1_000_000_000 * blocks[bi][0]
                            // blocks[bi][1])
            if remaining == 0 and bi + 1 < len(blocks):
                bi += 1
                remaining = blocks[bi][1]
        got = [r["iso_e9"] for r in
               Q31.q_isotonic_calibration(spark, SF).collect()]
        assert len(got) == len(expanded)
        # minimax-on-floored-lattice vs PAVA-on-rationals agree within
        # 1 lattice step
        for g, e in zip(got, expanded):
            assert abs(g - e) <= 1, (g, e)
