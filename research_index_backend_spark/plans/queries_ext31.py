"""Catalog extension 31 (round 9, second session, wave 6). Classical
tests, product analytics, and monotone calibration:

  anova_f_report         one-way ANOVA F statistic across groups from
                         exact moment aggregates — the parametric
                         sibling of kruskal_wallis
  dau_mau_stickiness     DAU / WAU / MAU distinct-user counts per day
                         with the DAU/MAU stickiness ratio — the
                         product-health dashboard number
  isotonic_calibration   isotonic (monotone) regression of the
                         positive rate over score bands via the
                         minimax formula — the calibration step that
                         fixes a ranking model's probabilities
                         without breaking their order

Reference parity: none in the reference; stats/analytics extension
families (ext10/ext20/ext26/ext27).

Cross-engine determinism (SURVEY 4.4): exact integer / DECIMAL
moments everywhere; ANOVA's F lands as ONE double closed form in the
single output row (corr_report rule); isotonic runs entirely on the
e9 integer lattice (floored band averages), so the minimax is pure
integer min/max aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t

QUERIES_EXT31: dict = {}
ORACLE_EXT31: dict = {}


# ---------------------------------------------------------------------------
# anova_f_report — one-way ANOVA from exact moments
# ---------------------------------------------------------------------------


def q_anova_f_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean extended price differ across return
    flags? F = (SSB / (k-1)) / (SSW / (N-k)) with
    SSB = sum_g n_g*(mean_g - mean)^2 and SSW = sum_g (n_g-1)*var_g —
    both derived from the exact per-group moments (n, sum, sumsq) in
    DECIMAL(38,0), so partial-aggregation order cannot wobble them
    (the corr_report rule); the F ratio is ONE double closed form in
    the single output row. Closed forms on sums (no means subtracted
    per row): SSB = sum_g S_g^2/n_g - S^2/N, SSW = Q - sum_g S_g^2/n_g
    with Q = global sumsq. kruskal_wallis answers the same question
    rank-only; ANOVA is the variance-based sibling.

    Scale shape: ONE map-side-combinable groupBy to k rows, then a
    k-row reduction. Moment bound: sum(x^2) with x in cents holds in
    DECIMAL(38,0) through ~1e16 rows (documented)."""
    l = _t(spark, sf_dir, "lineitem")
    m = (l.select(F.col("l_returnflag").alias("g"),
                  F.expr("CAST(round(l_extendedprice * 100) AS"
                         " DECIMAL(38,0))").alias("x"))
         .groupBy("g").agg(
             F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
             F.sum("x").alias("s"),
             F.sum(F.expr("x * x")).alias("q")))
    agg = m.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        # sum_g S_g^2/n_g on the exact-decimal lattice (integer part
        # is what the double F sees; the % remainder keeps it exact)
        F.sum(F.expr("CAST((s * s - (s * s) % n) / n"
                     " AS DECIMAL(38,0))")).alias("sg"))
    kd = F.col("k").cast("double")
    nd = F.col("nn").cast("double")
    sg = F.col("sg").cast("double")
    ssb = sg - (F.col("ss").cast("double") ** 2) / nd
    ssw = F.col("qq").cast("double") - sg
    f_stat = (ssb / (kd - 1)) / (ssw / (nd - kd))
    return agg.select(
        F.col("nn").cast("bigint").alias("n_rows"),
        F.col("k").cast("bigint").alias("k_groups"),
        F.floor(ssb / nd).cast("bigint").alias("ssb_scaled"),
        F.floor(f_stat * 1e6).cast("bigint").alias("f_e6"))


ORACLE_ANOVA = """
WITH m AS (
  SELECT l_returnflag AS g,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT))
              AS HUGEINT) AS s,
         CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                  * CAST(round(l_extendedprice * 100) AS HUGEINT))
              AS HUGEINT) AS q
  FROM lineitem GROUP BY 1
), agg AS (
  SELECT count(*) AS k, sum(n) AS nn, sum(s) AS ss, sum(q) AS qq,
         sum((s * s) // n) AS sg
  FROM m
)
SELECT CAST(nn AS BIGINT) AS n_rows,
       CAST(k AS BIGINT) AS k_groups,
       CAST(floor((CAST(sg AS DOUBLE)
                   - CAST(ss AS DOUBLE) ^ 2 / CAST(nn AS DOUBLE))
                  / CAST(nn AS DOUBLE)) AS BIGINT) AS ssb_scaled,
       CAST(floor(
         ((CAST(sg AS DOUBLE)
           - CAST(ss AS DOUBLE) ^ 2 / CAST(nn AS DOUBLE))
          / (CAST(k AS DOUBLE) - 1))
         / ((CAST(qq AS DOUBLE) - CAST(sg AS DOUBLE))
            / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
         * 1e6) AS BIGINT) AS f_e6
FROM agg
"""


# ---------------------------------------------------------------------------
# dau_mau_stickiness — rolling distinct-user engagement ratios
# ---------------------------------------------------------------------------

_DM_DAY_NS = 86_400_000_000_000
_DM_WAU_D = 7
_DM_MAU_D = 28


def q_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: DAU, trailing-{_DM_WAU_D}d WAU, trailing-{_DM_MAU_D}d
    MAU (exact distinct users), and stickiness = DAU/MAU on the e6
    lattice — the product-health ratio ("how much of the monthly
    audience shows up daily"). sliding_distinct_users counts one
    window; this emits the calendar-long engagement series.

    Scale shape (r10 rewrite — the r9 plan shuffled the (user, day)
    grid at {_DM_MAU_D}x exploded volume into a (day, user) dedup
    aggregate; 10.8x at the 100x probe): ONE corpus shuffle, the
    per-user groupBy whose partial collect_set dedups map-side. The
    trailing-window credits are then computed IN-ROW per user — for
    the i-th active day, offsets run only to the day before the NEXT
    active day (else that later day is the closer anchor), so each
    (user, window-day) pair is emitted exactly once and already
    carries its true min_off. The exploded credits flow straight
    into the combinable per-day conditional counts: no {_DM_MAU_D}x
    grid ever crosses the wire. A user's in-row state is their
    distinct-day set, bounded by the calendar span, never by event
    volume. Exact, no sketches."""
    e = _t(spark, sf_dir, "events")
    days = (e.groupBy("user_id")
            .agg(F.sort_array(F.collect_set(
                F.expr(f"ts_ns div {_DM_DAY_NS}"))).alias("ds")))
    credits = days.select(F.explode(F.expr(f"""
        flatten(transform(ds, (d, i) ->
          transform(
            sequence(0L, least(CAST({_DM_MAU_D - 1} AS BIGINT),
                               coalesce(try_element_at(ds, i + 2) - d - 1,
                                        CAST({_DM_MAU_D - 1} AS BIGINT)))),
            o -> struct(d + o AS day, o AS off))))
        """)).alias("cr")).select("cr.day", "cr.off")
    agg = (credits.groupBy("day")
           .agg(F.sum(F.when(F.col("off") == 0, 1).otherwise(0))
                .alias("dau"),
                F.sum(F.when(F.col("off") < _DM_WAU_D, 1)
                      .otherwise(0)).alias("wau"),
                F.count(F.lit(1)).alias("mau")))
    # keep only days that actually occur in the stream (the credits
    # manufacture trailing days past the corpus end)
    real = (e.select(F.expr(f"ts_ns div {_DM_DAY_NS}").alias("day"))
            .distinct())
    return (agg.join(real, "day")
            .select(F.col("day").cast("bigint").alias("day"),
                    F.col("dau").cast("bigint").alias("dau"),
                    F.col("wau").cast("bigint").alias("wau"),
                    F.col("mau").cast("bigint").alias("mau"),
                    F.expr("(1000000 * CAST(dau AS DECIMAL(38,0)))"
                           " div mau").cast("bigint")
                    .alias("stickiness_e6"))
            .orderBy("day"))


ORACLE_DAU_MAU = f"""
WITH ud AS (
  SELECT DISTINCT epoch_ns(ts) // {_DM_DAY_NS} AS day, user_id
  FROM events
), spans AS (
  SELECT user_id, day AS d0, day + off AS day, off
  FROM ud, unnest(range(0, {_DM_MAU_D})) AS t(off)
), per_user AS (
  SELECT day, user_id, min(off) AS min_off
  FROM spans GROUP BY 1, 2
), agg AS (
  SELECT day,
         sum(CASE WHEN min_off = 0 THEN 1 ELSE 0 END) AS dau,
         sum(CASE WHEN min_off < {_DM_WAU_D} THEN 1 ELSE 0 END)
           AS wau,
         count(*) AS mau
  FROM per_user GROUP BY 1
)
SELECT CAST(a.day AS BIGINT) AS day,
       CAST(dau AS BIGINT) AS dau,
       CAST(wau AS BIGINT) AS wau,
       CAST(mau AS BIGINT) AS mau,
       CAST((1000000 * CAST(dau AS HUGEINT)) // mau AS BIGINT)
         AS stickiness_e6
FROM agg a SEMI JOIN (SELECT DISTINCT day FROM ud) r
  ON a.day = r.day
ORDER BY a.day
"""


# ---------------------------------------------------------------------------
# isotonic_calibration — minimax monotone regression over score bands
# ---------------------------------------------------------------------------

_IC_BAND_C = 2500_00   # $2500 score bands (~200 bands over the domain)


def q_isotonic_calibration(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Isotonic regression of P(urgent) over o_totalprice score
    bands: the monotone fit iso_i = max_(j<=i) min_(k>=i)
    avg(rate over bands j..k) — the calibration that repairs a
    score's probabilities while PRESERVING its ranking
    (quality_calibration buckets and reads rates; this FITS the
    monotone curve a serving system would apply).

    Everything runs on integer lattices: per-band (pos, n) are exact
    counts; pooled averages land as r_e9(j, k) = (1e9 * pos_jk) div
    n_jk (floored — the lattice IS the statistic, the chi-square
    term_e6 convention); min/max are then pure integer aggregations,
    so both engines agree bit-for-bit.

    Scale shape: the corpus reduces via ONE combinable groupBy onto
    ~200 price-domain-bounded bands; the (j, k) interval grid is
    bands^2 (~40k rows, corpus-independent) built from band prefix
    sums (window over the band table — lint-allowlisted); the two
    minimax reductions are groupBys on that grid. Corpus cost: one
    scan + one tiny shuffle."""
    o = _t(spark, sf_dir, "orders")
    bands = (o.select(
        F.expr(f"CAST(round(o_totalprice * 100) AS BIGINT)"
               f" div {_IC_BAND_C}").alias("band"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        .alias("pos"))
        .groupBy("band").agg(F.count(F.lit(1)).alias("n"),
                             F.sum("pos").alias("pos")))
    w = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, 0)
    pre = bands.select(
        "band", "n", "pos",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cp")).localCheckpoint()
    j = pre.select(F.col("band").alias("jb"),
                   (F.col("cn") - F.col("n")).alias("cnj"),
                   (F.col("cp") - F.col("pos")).alias("cpj"))
    k = pre.select(F.col("band").alias("kb"),
                   F.col("cn").alias("cnk"), F.col("cp").alias("cpk"))
    grid = (j.join(k, F.col("jb") <= F.col("kb"))
            .select("jb", "kb",
                    F.expr("(1000000000 * CAST(cpk - cpj AS"
                           " DECIMAL(38,0))) div (cnk - cnj)")
                    .cast("bigint").alias("r_e9")))
    # t(j, i) = min over k >= i of r(j, k): suffix-min per j
    wmin = (Window.partitionBy("jb").orderBy("kb")
            .rowsBetween(0, Window.unboundedFollowing))
    t = grid.select("jb", F.col("kb").alias("i"),
                    F.min("r_e9").over(wmin).alias("tmin"))
    iso = (t.filter(F.col("jb") <= F.col("i"))
           .groupBy("i").agg(F.max("tmin").alias("iso_e9")))
    raw = pre.select(F.col("band").alias("i"), "n", "pos",
                     F.expr("(1000000000 * CAST(pos AS"
                            " DECIMAL(38,0))) div n")
                     .cast("bigint").alias("raw_e9"))
    return (raw.join(iso, "i")
            .select(F.col("i").cast("bigint").alias("band"),
                    F.col("n").cast("bigint").alias("n_orders"),
                    F.col("pos").cast("bigint").alias("n_pos"),
                    F.col("raw_e9").cast("bigint").alias("raw_e9"),
                    F.col("iso_e9").cast("bigint").alias("iso_e9"))
            .orderBy("band"))


ORACLE_ISOTONIC = f"""
WITH bands AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // {_IC_BAND_C}
           AS band,
         count(*) AS n,
         sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           AS pos
  FROM orders GROUP BY 1
), pre AS (
  SELECT band, n, pos,
         sum(n) OVER (ORDER BY band
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         sum(pos) OVER (ORDER BY band
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
  FROM bands
), grid AS (
  SELECT j.band AS jb, k.band AS kb,
         CAST((1000000000 * CAST(k.cp - (j.cp - j.pos) AS HUGEINT))
              // (k.cn - (j.cn - j.n)) AS BIGINT) AS r_e9
  FROM pre j JOIN pre k ON j.band <= k.band
), t AS (
  SELECT jb, i, min(r_e9) AS tmin FROM (
    SELECT g1.jb, g2.kb AS i, g1.r_e9
    FROM grid g1 JOIN (SELECT DISTINCT kb FROM grid) g2
      ON g1.kb >= g2.kb AND g1.jb <= g2.kb)
  GROUP BY 1, 2
), iso AS (
  SELECT i, max(tmin) AS iso_e9 FROM t WHERE jb <= i GROUP BY i
)
SELECT CAST(p.band AS BIGINT) AS band,
       CAST(p.n AS BIGINT) AS n_orders,
       CAST(p.pos AS BIGINT) AS n_pos,
       CAST((1000000000 * CAST(p.pos AS HUGEINT)) // p.n AS BIGINT)
         AS raw_e9,
       CAST(iso.iso_e9 AS BIGINT) AS iso_e9
FROM pre p JOIN iso ON p.band = iso.i
ORDER BY p.band
"""


QUERIES_EXT31.update({
    "anova_f_report": q_anova_f_report,
    "dau_mau_stickiness": q_dau_mau_stickiness,
    "isotonic_calibration": q_isotonic_calibration,
})
ORACLE_EXT31.update({
    "anova_f_report": ORACLE_ANOVA,
    "dau_mau_stickiness": ORACLE_DAU_MAU,
    "isotonic_calibration": ORACLE_ISOTONIC,
})
