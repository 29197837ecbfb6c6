"""Catalog extension 18 (round 8, late wave 7). Detrended anomaly
ranking and equi-depth binning:

  residual_outliers     top days per event type by |OLS residual| of
                        the daily-mean series — the DETRENDED anomaly
                        view (zscore flags level, seasonal_anomaly
                        flags weekday deviation; this flags deviation
                        from the trend LINE, all integer-exact via the
                        scale-free residual form)
  equidepth_histogram   exact decile boundaries of the value
                        distribution per event type from cumulative
                        counts over the bounded value domain — the
                        equi-DEPTH partner of histogram_quantile's
                        equi-width bins

Reference parity: none in the reference; stats/monitoring families.

Cross-engine determinism (SURVEY 4.4): residuals compare in the
integer form R_i = n*denom*y_i - denom*Sy - b_num*(n*x_i - Sx) —
the OLS residual scaled by the positive constant n*denom, so ranking
by |R_i| needs no division at all and the reported value divides by
the positive n*denom through the floor both engines share (numerator
sign handled by the reported e4 value being a display convenience —
the RANKING is division-free). Decile boundaries are k-th order
statistics via integer cumulative counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t
from .queries_ext14 import _daily, _DAILY_SQL

QUERIES_EXT18: dict = {}
ORACLE_EXT18: dict = {}


# ---------------------------------------------------------------------------
# residual_outliers — top-|residual| days against the per-type OLS trend
# ---------------------------------------------------------------------------

_RO_TOPK = 3  # days reported per type


def q_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detrended outliers: fit the exact-moment OLS line through each
    type's daily means (trend_regression's arithmetic), then rank days
    by |residual| and report the top {_RO_TOPK} per type. The residual
    RANKING is division-free: r_i's sign-preserving integer multiple
    R_i = n*denom*y_i - denom*Sy - b_num*(n*x_i - Sx) (denom =
    n*Sxx - Sx^2 > 0 whenever two distinct days exist) orders exactly
    like r_i, so no rounding enters the comparison; the displayed
    resid_e4 divides R_i by the positive n*denom via each engine's
    positive-operand floor.

    Scale shape: the corpus reduces to the |types| x |days| daily
    lattice; moments are a |types|-row broadcast back; the top-K rank
    window is partitioned by type over the bounded day count. Nothing
    downstream of the first aggregate scales with the corpus.
    """
    daily = _daily(spark, sf_dir)
    base = (daily.groupBy("event_type")
            .agg(F.min("day").alias("d0")))
    xy = (daily.join(F.broadcast(base), "event_type")
          .select("event_type", "day", "m_e4",
                  (F.col("day") - F.col("d0")).alias("x")))
    mom = (xy.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("sx"),
                F.sum("m_e4").alias("sy"),
                F.sum(F.expr("x * x")).alias("sxx"),
                F.sum(F.expr("x * m_e4")).alias("sxy")))
    res = (xy.join(F.broadcast(mom), "event_type")
           .withColumn("denom", F.expr("n * sxx - sx * sx"))
           .withColumn("b_num", F.expr("n * sxy - sx * sy"))
           # decimal(38,0): n*denom*y reaches ~4e24 at a 10-year daily
           # series (day-count-driven, not corpus-driven — but harden
           # anyway; DuckDB twin rides HUGEINT)
           .withColumn("r_scaled", F.expr(
               "CAST(n AS DECIMAL(38,0)) * denom * m_e4"
               " - CAST(denom AS DECIMAL(38,0)) * sy"
               " - CAST(b_num AS DECIMAL(38,0)) * (n * x - sx)"))
           # positive-offset floor (theil_sen's identity): residuals
           # are signed and Spark div truncates where DuckDB // floors
           .withColumn("resid_e4", F.expr(
               "(r_scaled + 1000000000 * greatest(CAST(n AS"
               " DECIMAL(38,0)) * denom, 1))"
               " div greatest(CAST(n AS DECIMAL(38,0)) * denom, 1)"
               " - 1000000000").cast("bigint")))
    w = Window.partitionBy("event_type").orderBy(
        F.abs("r_scaled").desc(), "day")
    return (res.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _RO_TOPK)
            .select("event_type", "day", "m_e4", "resid_e4",
                    F.col("rk").alias("rank"))
            .orderBy("event_type", "rank"))


ORACLE_RESIDUAL_OUTLIERS = f"""
WITH daily AS ({_DAILY_SQL}
), base AS (
  SELECT event_type, min(day) AS d0 FROM daily GROUP BY 1
), xy AS (
  SELECT daily.event_type, day, m_e4, day - d0 AS x
  FROM daily JOIN base USING (event_type)
), mom AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(m_e4) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * m_e4) AS BIGINT) AS sxy
  FROM xy GROUP BY 1
), res AS (
  SELECT xy.event_type, day, m_e4,
         CAST(n AS HUGEINT) * (n * sxx - sx * sx) * m_e4
           - CAST(n * sxx - sx * sx AS HUGEINT) * sy
           - CAST(n * sxy - sx * sy AS HUGEINT) * (n * x - sx)
           AS r_scaled,
         CAST((CAST(n AS HUGEINT) * (n * sxx - sx * sx) * m_e4
               - CAST(n * sxx - sx * sx AS HUGEINT) * sy
               - CAST(n * sxy - sx * sy AS HUGEINT) * (n * x - sx)
               + 1000000000
                 * greatest(CAST(n AS HUGEINT) * (n * sxx - sx * sx), 1))
              // greatest(CAST(n AS HUGEINT) * (n * sxx - sx * sx), 1)
              - 1000000000 AS BIGINT) AS resid_e4
  FROM xy JOIN mom USING (event_type)
)
SELECT event_type, day, m_e4, resid_e4, CAST(rk AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs(r_scaled) DESC, day)
                  AS rk
      FROM res)
WHERE rk <= {_RO_TOPK}
ORDER BY event_type, rank
"""


# ---------------------------------------------------------------------------
# equidepth_histogram — exact decile boundaries per event type
# ---------------------------------------------------------------------------

_ED_BINS = 10


def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram: the exact {_ED_BINS} decile boundaries of
    each type's value distribution — boundary k = the order statistic
    at rank max(1, floor(k*n/{_ED_BINS})), selected through integer
    cumulative counts over the bounded value DOMAIN (the
    winsorize_report machinery, emitted as the full boundary table).
    histogram_quantile bins equi-WIDTH and estimates; this is the
    equi-DEPTH exact partner a query optimizer's column stats store.

    Scale shape: (type, v_e2) counts reduce map-side; the cumulative
    window is partitioned by type over domain-bounded distinct values;
    the boundary selection is one aggregate per (type, decile) via an
    explode of the fixed decile list — output |types| x {_ED_BINS}
    rows, no corpus-scale anything after the first reduce.
    """
    e = (_t(spark, sf_dir, "events")
         .select("event_type",
                 F.expr("CAST(round(value * 100) AS BIGINT)")
                 .alias("v_e2")))
    counts = e.groupBy("event_type", "v_e2").agg(
        F.count(F.lit(1)).alias("c"))
    w = (Window.partitionBy("event_type").orderBy("v_e2")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = Window.partitionBy("event_type")
    cum = (counts.withColumn("cum", F.sum("c").over(w))
           .withColumn("n", F.sum("c").over(wn)))
    deciles = cum.select(
        "event_type", "v_e2", "cum", "n",
        F.explode(F.sequence(F.lit(1), F.lit(_ED_BINS))).alias("decile"))
    return (deciles
            .filter(F.expr(f"cum >= greatest(1, (decile * n)"
                           f" div {_ED_BINS})"))
            .groupBy("event_type", "decile")
            .agg(F.min("v_e2").alias("boundary_e2"),
                 F.max("n").alias("n_events"))
            .orderBy("event_type", "decile"))


ORACLE_EQUIDEPTH = f"""
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_e2
  FROM events
), counts AS (
  SELECT event_type, v_e2, CAST(count(*) AS BIGINT) AS c
  FROM e GROUP BY 1, 2
), cum AS (
  SELECT event_type, v_e2,
         sum(c) OVER (PARTITION BY event_type ORDER BY v_e2
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM counts
), dec AS (
  SELECT cum.*, d.decile
  FROM cum, (SELECT unnest(generate_series(1, {_ED_BINS})) AS decile) d
)
SELECT event_type, CAST(decile AS BIGINT) AS decile,
       CAST(min(v_e2) AS BIGINT) AS boundary_e2,
       CAST(max(n) AS BIGINT) AS n_events
FROM dec
WHERE cum >= greatest(1, (decile * n) // {_ED_BINS})
GROUP BY event_type, decile ORDER BY event_type, decile
"""


QUERIES_EXT18.update({
    "residual_outliers": q_residual_outliers,
    "equidepth_histogram": q_equidepth_histogram,
})
ORACLE_EXT18.update({
    "residual_outliers": ORACLE_RESIDUAL_OUTLIERS,
    "equidepth_histogram": ORACLE_EQUIDEPTH,
})
