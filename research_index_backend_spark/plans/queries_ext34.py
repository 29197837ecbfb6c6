"""Catalog extension 34 (round 9, second session, wave 9). Revenue
analytics, reconciliation, and forecast backtesting:

  cohort_ltv               cumulative value per (first-seen-week
                           cohort, week age) — the LTV curve layered
                           over retention_cohort's distinct-user
                           counts
  invoice_reconciliation   order-header totals vs recomputed
                           lineitem sums — the classic warehouse
                           reconciliation audit, bucketed by
                           mismatch magnitude
  seasonal_naive_backtest  MAE / MAPE of the seasonal-naive
                           forecaster (value = same day last week)
                           per event type — the baseline every real
                           forecaster must beat (holt_forecast
                           produces forecasts; this SCORES one)

Reference parity: none in the reference; analytics extension
families.

Cross-engine determinism (SURVEY 4.4): exact integer cents
throughout; ratios are floored integer divisions of exact sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t

QUERIES_EXT34: dict = {}
ORACLE_EXT34: dict = {}


# ---------------------------------------------------------------------------
# cohort_ltv — cumulative value per cohort x age
# ---------------------------------------------------------------------------

_CL_WEEK_NS = 7 * 86_400_000_000_000


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (cohort week = user's first-seen week, age in weeks):
    active users, period value, and the CUMULATIVE value the cohort
    has generated through that age — the LTV curve a growth model
    fits (retention_cohort counts who comes back; this adds what
    they are worth). cum_value_c is a running sum over the
    CALENDAR-BOUNDED age frame partitioned by cohort.

    Scale shape: per-user first-seen is ONE combinable aggregate
    joined back broadcast (the retention_cohort shape); the (cohort,
    age) grid is weeks x weeks — calendar-bounded."""
    e = _t(spark, sf_dir, "events")
    first = (e.groupBy("user_id")
             .agg(F.min("ts_ns").alias("first_ns"))
             .select("user_id",
                     F.expr(f"first_ns div {_CL_WEEK_NS}")
                     .alias("cohort_wk")))
    x = (e.select("user_id",
                  F.expr(f"ts_ns div {_CL_WEEK_NS}").alias("wk"),
                  F.expr("CAST(round(value * 100) AS BIGINT)")
                  .alias("v_c"))
         .join(F.broadcast(first), "user_id"))
    grid = (x.groupBy("cohort_wk",
                      (F.col("wk") - F.col("cohort_wk")).alias("age"))
            .agg(F.countDistinct("user_id").alias("active_users"),
                 F.sum("v_c").alias("value_c")))
    w = (Window.partitionBy("cohort_wk").orderBy("age")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (grid.select(
        F.col("cohort_wk").cast("bigint").alias("cohort_wk"),
        F.col("age").cast("bigint").alias("age_wk"),
        F.col("active_users").cast("bigint").alias("active_users"),
        F.col("value_c").cast("bigint").alias("value_c"),
        F.sum("value_c").over(w).cast("bigint").alias("cum_value_c"))
        .orderBy("cohort_wk", "age_wk"))


ORACLE_COHORT_LTV = f"""
WITH first AS (
  SELECT user_id, min(epoch_ns(ts)) // {_CL_WEEK_NS} AS cohort_wk
  FROM events GROUP BY 1
), x AS (
  SELECT e.user_id, epoch_ns(e.ts) // {_CL_WEEK_NS} AS wk,
         CAST(round(e.value * 100) AS BIGINT) AS v_c, f.cohort_wk
  FROM events e JOIN first f ON e.user_id = f.user_id
), grid AS (
  SELECT cohort_wk, wk - cohort_wk AS age,
         count(DISTINCT user_id) AS active_users,
         sum(v_c) AS value_c
  FROM x GROUP BY 1, 2
)
SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
       CAST(age AS BIGINT) AS age_wk,
       CAST(active_users AS BIGINT) AS active_users,
       CAST(value_c AS BIGINT) AS value_c,
       CAST(sum(value_c) OVER (PARTITION BY cohort_wk ORDER BY age
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_value_c
FROM grid
ORDER BY cohort_wk, age_wk
"""


# ---------------------------------------------------------------------------
# invoice_reconciliation — header totals vs recomputed detail sums
# ---------------------------------------------------------------------------

_IR_BUCKETS_C = (0, 1, 100, 10000)   # exact, <1c..., <$1, <$100, >=


def q_invoice_reconciliation(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Reconcile order-header o_totalprice against the recomputed
    lineitem sum round(extprice * (1 - disc) * (1 + tax)) per order —
    the warehouse audit that catches partial loads, double-applied
    discounts, and rounding-policy drift. Output one row per
    mismatch-magnitude bucket (|diff| in cents: 0, <100, <10000,
    >= 10000, plus orders with NO lineitems) with counts and total
    absolute drift.

    Scale shape: ONE combinable per-order lineitem aggregate, one
    join to headers on the order key (co-partitioned shuffle), one
    bucket groupBy. All-integer cents; per-line rounding pinned to
    round-half-up on DOUBLE widened terms in both engines."""
    li = (_t(spark, sf_dir, "lineitem")
          .select("l_orderkey",
                  F.expr("CAST(round(l_extendedprice"
                         " * (1 - l_discount) * (1 + l_tax) * 100)"
                         " AS BIGINT)").alias("line_c")))
    per_order = li.groupBy("l_orderkey").agg(
        F.sum("line_c").alias("detail_c"))
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
        .alias("header_c"))
    j = (o.join(per_order,
                F.col("o_orderkey") == F.col("l_orderkey"), "left")
         .select("header_c",
                 F.col("detail_c"),
                 F.when(F.col("detail_c").isNull(), F.lit("no_lines"))
                 .when(F.expr("abs(header_c - detail_c)") == 0,
                       F.lit("exact"))
                 .when(F.expr("abs(header_c - detail_c)") < 100,
                       F.lit("lt_1_dollar"))
                 .when(F.expr("abs(header_c - detail_c)") < 10000,
                       F.lit("lt_100_dollar"))
                 .otherwise(F.lit("ge_100_dollar")).alias("bucket")))
    return (j.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.expr("coalesce(abs(header_c - detail_c), header_c)"))
        .cast("bigint").alias("abs_drift_c"))
        .orderBy("bucket"))


ORACLE_INVOICE = """
WITH li AS (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * (1 - l_discount)
                    * (1 + l_tax) * 100) AS BIGINT) AS line_c
  FROM lineitem
), per_order AS (
  SELECT l_orderkey, sum(line_c) AS detail_c FROM li GROUP BY 1
), j AS (
  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_c,
         p.detail_c,
         CASE
           WHEN p.detail_c IS NULL THEN 'no_lines'
           WHEN abs(CAST(round(o.o_totalprice * 100) AS BIGINT)
                    - p.detail_c) = 0 THEN 'exact'
           WHEN abs(CAST(round(o.o_totalprice * 100) AS BIGINT)
                    - p.detail_c) < 100 THEN 'lt_1_dollar'
           WHEN abs(CAST(round(o.o_totalprice * 100) AS BIGINT)
                    - p.detail_c) < 10000 THEN 'lt_100_dollar'
           ELSE 'ge_100_dollar'
         END AS bucket
  FROM orders o LEFT JOIN per_order p
    ON o.o_orderkey = p.l_orderkey
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(coalesce(abs(header_c - detail_c), header_c))
            AS BIGINT) AS abs_drift_c
FROM j
GROUP BY bucket
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# seasonal_naive_backtest — score the same-day-last-week baseline
# ---------------------------------------------------------------------------

_SN_DAY_NS = 86_400_000_000_000
_SN_LAG_D = 7


def q_seasonal_naive_backtest(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Backtest the seasonal-naive forecaster (prediction for day d =
    actual of day d - {_SN_LAG_D}) on daily value totals per event
    type: n scored days, MAE in cents, and MAPE on the e6 lattice —
    the baseline any model forecast (holt_forecast) must beat before
    it ships.

    Scale shape: ONE combinable (type, day) aggregate; the lag join
    is a self-join of the CALENDAR-BOUNDED daily frame on
    (type, day - {_SN_LAG_D}). Exact integer errors; MAPE sums
    per-day |err| * 1e6 div actual before the final division."""
    e = _t(spark, sf_dir, "events")
    days = (e.select("event_type",
                     F.expr(f"ts_ns div {_SN_DAY_NS}").alias("day"),
                     F.expr("CAST(round(value * 100) AS BIGINT)")
                     .alias("v_c"))
            .groupBy("event_type", "day")
            .agg(F.sum("v_c").alias("y")))
    pred = days.select("event_type",
                       (F.col("day") + _SN_LAG_D).alias("day"),
                       F.col("y").alias("yhat"))
    scored = (days.join(pred, ["event_type", "day"])
              .select("event_type",
                      F.expr("abs(y - yhat)").alias("ae"),
                      F.expr("CASE WHEN y <> 0 THEN"
                             " (1000000 * abs(CAST(y - yhat AS"
                             " DECIMAL(38,0)))) div abs(y) END")
                      .alias("ape_e6")))
    return (scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr("sum(CAST(ae AS DECIMAL(38,0))) div count(1)")
        .cast("bigint").alias("mae_c"),
        F.expr("sum(ape_e6) div count(ape_e6)").cast("bigint")
        .alias("mape_e6"))
        .orderBy("event_type"))


ORACLE_SEASONAL_NAIVE = f"""
WITH days AS (
  SELECT event_type, epoch_ns(ts) // {_SN_DAY_NS} AS day,
         sum(CAST(round(value * 100) AS BIGINT)) AS y
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT a.event_type, abs(a.y - p.y) AS ae,
         CASE WHEN a.y <> 0 THEN
           (1000000 * abs(CAST(a.y - p.y AS HUGEINT))) // abs(a.y)
         END AS ape_e6
  FROM days a JOIN days p
    ON a.event_type = p.event_type
   AND a.day = p.day + {_SN_LAG_D}
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CAST(ae AS HUGEINT)) // count(*) AS BIGINT) AS mae_c,
       CAST(sum(ape_e6) // count(ape_e6) AS BIGINT) AS mape_e6
FROM scored
GROUP BY event_type
ORDER BY event_type
"""


QUERIES_EXT34.update({
    "cohort_ltv": q_cohort_ltv,
    "invoice_reconciliation": q_invoice_reconciliation,
    "seasonal_naive_backtest": q_seasonal_naive_backtest,
})
ORACLE_EXT34.update({
    "cohort_ltv": ORACLE_COHORT_LTV,
    "invoice_reconciliation": ORACLE_INVOICE,
    "seasonal_naive_backtest": ORACLE_SEASONAL_NAIVE,
})
