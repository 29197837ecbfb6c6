"""Catalog extension 37 (round 9, second session, wave 12). Streaming
sessionization twin, uplift evaluation, and interval calibration:

  stream_sessionize_twin   batch twin of streaming/sessionize.py's
                           final per-session counts — official
                           DuckDB row for the stateful gap
                           sessionizer (the stream_drift_twin
                           pattern)
  qini_uplift_report       cumulative uplift (treated minus control
                           response rate) reading down the score
                           bands — the Qini table that evaluates a
                           targeting policy against holdout
  conformal_coverage_audit split-conformal check: exact p10/p90 from
                           the TRAIN half of the timeline, empirical
                           coverage on the TEST half — does the
                           claimed 80% interval actually cover 80%

Reference parity: none in the reference; streaming / eval extension
families.

Cross-engine determinism (SURVEY 4.4): all-integer — session counts
are exact; uplift is cross-multiplied on exact counts; interval
bounds are exact rank selections and coverage an exact share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t

QUERIES_EXT37: dict = {}
ORACLE_EXT37: dict = {}


# ---------------------------------------------------------------------------
# stream_sessionize_twin — official row for the stateful sessionizer
# ---------------------------------------------------------------------------


def q_stream_sessionize_twin(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Batch twin of streaming/sessionize.py's FINAL per-session
    counts over the events table, aggregated per user: session
    count, largest session, total events — the stateful operator is
    pytest-pinned (batch parity + MID-SESSION micro-batch splits,
    tests/test_streaming_sessionize.py); this gives the same
    arithmetic an official DuckDB row. Aggregated per user (not per
    session) to keep the row count stable while still pinning every
    session boundary through max/sum.

    Scale shape: the sessionize windows partition by user_id (the
    sessionize_events shuffle); the per-user rollup is combinable."""
    from ..streaming.sessionize import sessionize_batch
    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts_ns", "event_id")
    s = sessionize_batch(e)
    return (s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.max("n_events").cast("bigint").alias("max_session_events"),
        F.sum("n_events").cast("bigint").alias("n_events"))
        .select(F.col("user_id").cast("bigint").alias("user_id"),
                "n_sessions", "max_session_events", "n_events")
        .orderBy("user_id"))


ORACLE_STREAM_SESSIONIZE = """
WITH e AS (
  SELECT user_id, epoch_ns(ts) AS ts_ns, event_id FROM events
), lagged AS (
  SELECT user_id, ts_ns, event_id,
         CASE WHEN lag(ts_ns) OVER
                (PARTITION BY user_id ORDER BY ts_ns, event_id)
              IS NULL
           OR ts_ns - lag(ts_ns) OVER
                (PARTITION BY user_id ORDER BY ts_ns, event_id)
              > 1800000000000
         THEN 1 ELSE 0 END AS is_new
  FROM e
), sess AS (
  SELECT user_id,
         sum(is_new) OVER (PARTITION BY user_id
           ORDER BY ts_ns, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM lagged
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sess GROUP BY 1, 2
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(n_events) AS BIGINT) AS max_session_events,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# qini_uplift_report — cumulative uplift over score bands
# ---------------------------------------------------------------------------

_QU_BAND_C = 100000_00   # $100k extended-price bands (~6 bands)
_QU_TREAT_DISC = 0.05    # treatment = discount >= 5%
_QU_RESP_QTY = 30        # response = quantity >= 30


def q_qini_uplift_report(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Qini/uplift table on lineitems: treatment = discount >=
    {_QU_TREAT_DISC}, response = quantity >= {_QU_RESP_QTY}, score =
    extended price (descending bands). Reading down from the top
    band: cumulative treated/control counts and responders, and
    uplift_e6 = treated rate minus control rate cross-multiplied
    exact — the holdout readout that tells a targeting policy where
    incremental response actually lives (plain response rates can't:
    high responders may respond WITHOUT the discount).

    Scale shape: ONE combinable (band, treat) aggregate; descending
    prefix sums over the price-domain-bounded band table (the
    lift_gains_report shape; lint-allowlisted)."""
    l = _t(spark, sf_dir, "lineitem")
    g = (l.select(
        F.expr(f"CAST(round(l_extendedprice * 100) AS BIGINT)"
               f" div {_QU_BAND_C}").alias("band"),
        F.when(F.col("l_discount") >= _QU_TREAT_DISC, 1).otherwise(0)
        .alias("t"),
        F.when(F.col("l_quantity") >= _QU_RESP_QTY, 1).otherwise(0)
        .alias("r"))
        .groupBy("band").agg(
            F.sum("t").alias("nt"),
            F.sum(F.expr("CASE WHEN t = 1 THEN r ELSE 0 END"))
            .alias("rt"),
            F.sum(F.expr("1 - t")).alias("nc"),
            F.sum(F.expr("CASE WHEN t = 0 THEN r ELSE 0 END"))
            .alias("rc")))
    wcum = (Window.orderBy(F.desc("band"))
            .rowsBetween(Window.unboundedPreceding, 0))
    c = g.select(
        "band",
        F.sum("nt").over(wcum).alias("cnt"),
        F.sum("rt").over(wcum).alias("crt"),
        F.sum("nc").over(wcum).alias("cnc"),
        F.sum("rc").over(wcum).alias("crc"))
    return (c.select(
        F.col("band").cast("bigint").alias("band"),
        F.col("cnt").cast("bigint").alias("cum_treated"),
        F.col("crt").cast("bigint").alias("cum_treated_resp"),
        F.col("cnc").cast("bigint").alias("cum_control"),
        F.col("crc").cast("bigint").alias("cum_control_resp"),
        F.when((F.col("cnt") > 0) & (F.col("cnc") > 0),
               F.expr("(1000000 * (CAST(crt AS DECIMAL(38,0)) * cnc"
                      " - CAST(crc AS DECIMAL(38,0)) * cnt))"
                      " div (CAST(cnt AS DECIMAL(38,0)) * cnc)"))
        .cast("bigint").alias("uplift_e6"))
        .orderBy(F.desc("band")))


ORACLE_QINI = f"""
WITH g AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
           // {_QU_BAND_C} AS band,
         sum(CASE WHEN l_discount >= {_QU_TREAT_DISC}
             THEN 1 ELSE 0 END) AS nt,
         sum(CASE WHEN l_discount >= {_QU_TREAT_DISC}
              AND l_quantity >= {_QU_RESP_QTY} THEN 1 ELSE 0 END)
           AS rt,
         sum(CASE WHEN l_discount < {_QU_TREAT_DISC}
             THEN 1 ELSE 0 END) AS nc,
         sum(CASE WHEN l_discount < {_QU_TREAT_DISC}
              AND l_quantity >= {_QU_RESP_QTY} THEN 1 ELSE 0 END)
           AS rc
  FROM lineitem GROUP BY 1
), c AS (
  SELECT band,
         sum(nt) OVER w AS cnt, sum(rt) OVER w AS crt,
         sum(nc) OVER w AS cnc, sum(rc) OVER w AS crc
  FROM g
  WINDOW w AS (ORDER BY band DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(cnt AS BIGINT) AS cum_treated,
       CAST(crt AS BIGINT) AS cum_treated_resp,
       CAST(cnc AS BIGINT) AS cum_control,
       CAST(crc AS BIGINT) AS cum_control_resp,
       CAST(CASE WHEN cnt > 0 AND cnc > 0 THEN
         (1000000 * (CAST(crt AS HUGEINT) * cnc
                     - CAST(crc AS HUGEINT) * cnt))
         // (CAST(cnt AS HUGEINT) * cnc) END AS BIGINT) AS uplift_e6
FROM c
ORDER BY band DESC
"""


# ---------------------------------------------------------------------------
# conformal_coverage_audit — split-conformal interval calibration
# ---------------------------------------------------------------------------

_CC_LO_PCT = 10
_CC_HI_PCT = 90


def q_conformal_coverage_audit(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Split-conformal audit per event type: take the EXACT discrete
    p{_CC_LO_PCT}/p{_CC_HI_PCT} of value over the TRAIN half of the
    timeline (ts before the midpoint of the corpus time range), then
    measure how often TEST-half values land inside [p10, p90] —
    claimed coverage 80%, and the audit answers whether the
    distribution held (distribution drift shows up as coverage
    collapse before any KS test fires a page).

    Scale shape: the split anchor is a 1-row (min, max) bounds
    aggregate broadcast onto the scan (snapshot_asof shape); train
    quantiles are the exact_percentile_rank selection (windows
    partitioned by type); the coverage pass is ONE combinable
    aggregate over the test slice with the 5-row bounds table
    broadcast."""
    e = _t(spark, sf_dir, "events").select(
        "event_type", "ts_ns",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v_c"))
    anchor = e.agg(F.min("ts_ns").alias("mn"),
                   F.max("ts_ns").alias("mx"))
    split = (e.join(F.broadcast(anchor))
             .withColumn("is_train",
                         F.expr("ts_ns < mn + (mx - mn) div 2")))
    train = split.filter("is_train")
    w = Window.partitionBy("event_type").orderBy("v_c")
    wall = Window.partitionBy("event_type")
    ranked = train.select(
        "event_type", "v_c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"))
    bounds = ranked.groupBy("event_type").agg(
        F.max("n").alias("n_train"),
        F.max(F.when(F.col("rn") == F.ceil(
            F.col("n") * _CC_LO_PCT / 100), F.col("v_c")))
        .alias("lo_c"),
        F.max(F.when(F.col("rn") == F.ceil(
            F.col("n") * _CC_HI_PCT / 100), F.col("v_c")))
        .alias("hi_c"))
    test = split.filter(~F.col("is_train"))
    return (test.join(F.broadcast(bounds), "event_type")
            .groupBy("event_type").agg(
                F.max("n_train").alias("n_train"),
                F.count(F.lit(1)).alias("n_test"),
                F.max("lo_c").alias("lo_c"),
                F.max("hi_c").alias("hi_c"),
                F.sum(F.when((F.col("v_c") >= F.col("lo_c"))
                             & (F.col("v_c") <= F.col("hi_c")), 1)
                      .otherwise(0)).alias("covered"))
            .select("event_type",
                    F.col("n_train").cast("bigint").alias("n_train"),
                    F.col("n_test").cast("bigint").alias("n_test"),
                    F.col("lo_c").cast("bigint").alias("lo_c"),
                    F.col("hi_c").cast("bigint").alias("hi_c"),
                    F.expr("(1000000 * CAST(covered AS"
                           " DECIMAL(38,0))) div n_test")
                    .cast("bigint").alias("coverage_e6"))
            .orderBy("event_type"))


ORACLE_CONFORMAL = f"""
WITH e AS (
  SELECT event_type, epoch_ns(ts) AS ts_ns,
         CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events
), anchor AS (SELECT min(ts_ns) AS mn, max(ts_ns) AS mx FROM e),
split AS (
  SELECT event_type, v_c,
         ts_ns < (SELECT mn + (mx - mn) // 2 FROM anchor) AS is_train
  FROM e
), ranked AS (
  SELECT event_type, v_c,
         row_number() OVER (PARTITION BY event_type ORDER BY v_c)
           AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM split WHERE is_train
), bounds AS (
  SELECT event_type, max(n) AS n_train,
         max(CASE WHEN rn = ceil(n * {_CC_LO_PCT} / 100)
             THEN v_c END) AS lo_c,
         max(CASE WHEN rn = ceil(n * {_CC_HI_PCT} / 100)
             THEN v_c END) AS hi_c
  FROM ranked GROUP BY event_type
)
SELECT s.event_type,
       CAST(max(b.n_train) AS BIGINT) AS n_train,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(max(b.lo_c) AS BIGINT) AS lo_c,
       CAST(max(b.hi_c) AS BIGINT) AS hi_c,
       CAST((1000000 * CAST(sum(CASE WHEN s.v_c >= b.lo_c
                                  AND s.v_c <= b.hi_c
                                 THEN 1 ELSE 0 END) AS HUGEINT))
            // count(*) AS BIGINT) AS coverage_e6
FROM split s JOIN bounds b ON s.event_type = b.event_type
WHERE NOT s.is_train
GROUP BY s.event_type
ORDER BY s.event_type
"""


QUERIES_EXT37.update({
    "stream_sessionize_twin": q_stream_sessionize_twin,
    "qini_uplift_report": q_qini_uplift_report,
    "conformal_coverage_audit": q_conformal_coverage_audit,
})
ORACLE_EXT37.update({
    "stream_sessionize_twin": ORACLE_STREAM_SESSIONIZE,
    "qini_uplift_report": ORACLE_QINI,
    "conformal_coverage_audit": ORACLE_CONFORMAL,
})
