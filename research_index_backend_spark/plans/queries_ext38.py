"""Catalog extension 38 (round 9, second session, wave 13). Join
planning, split hygiene, and supervised-label building:

  broadcast_advisor     per-table size estimate + broadcast-vs-
                        shuffle verdict at the configured threshold —
                        the join-strategy sanity check an optimizer
                        makes from statistics, surfaced as a query
  split_leakage_audit   entity overlap between the train and test
                        halves of the timeline — the leakage check a
                        user-level model needs BEFORE trusting any
                        temporal split (random row splits leak users
                        wholesale)
  churn_feature_labels  churn-label construction: per-user features
                        from the observation window, label = silent
                        in the holdout window — reported as per-label
                        feature aggregates + class balance

Reference parity: none in the reference; optimizer-advice / ML-prep
extension families.

Cross-engine determinism (SURVEY 4.4): exact integer byte/row
arithmetic; overlap and balance land on the e6 lattice via integer
division of exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t

QUERIES_EXT38: dict = {}
ORACLE_EXT38: dict = {}


# ---------------------------------------------------------------------------
# broadcast_advisor — join-strategy verdict from table statistics
# ---------------------------------------------------------------------------

_BA_THRESHOLD_B = 10 * 1024 * 1024   # Spark's default 10 MiB
_BA_FIXED = {   # fixed-width column bytes per table (int/double/ts)
    "region": 4, "nation": 8, "supplier": 16, "customer": 16,
    "part": 16,
}


def q_broadcast_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate each dimension table's in-memory size (fixed-width
    column bytes + exact summed string bytes + 20 bytes/row row
    overhead) and report whether it fits Spark's 10 MiB
    autoBroadcastJoinThreshold — the advisory an optimizer derives
    from ANALYZE statistics, runnable as a query against the raw
    files. Verdicts: 'broadcast' (fits) or 'shuffle' (exceeds). At
    100 TB the fact tables are never candidates; the interesting
    calls are the mid-size dims (customer/part) that flip with scale
    — exactly what this report tracks across SFs.

    Scale shape: one combinable aggregate per table (count + string-
    length sums), union of five 1-row results."""
    specs = [
        ("region", ["r_name"]),
        ("nation", ["n_name"]),
        ("supplier", ["s_name"]),
        ("customer", ["c_name", "c_mktsegment"]),
        ("part", ["p_name", "p_brand", "p_type"]),
    ]
    out = None
    for tbl, strcols in specs:
        t = _t(spark, sf_dir, tbl)
        strbytes = sum((F.sum(F.length(c)) for c in strcols),
                       F.lit(0))
        agg = t.agg(
            F.lit(tbl).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (strbytes
             + F.count(F.lit(1)) * (_BA_FIXED[tbl] + 20))
            .cast("bigint").alias("est_bytes"))
        out = agg if out is None else out.unionByName(agg)
    return (out.select(
        "table_name", "n_rows", "est_bytes",
        F.when(F.col("est_bytes") <= _BA_THRESHOLD_B, "broadcast")
        .otherwise("shuffle").alias("verdict"))
        .orderBy("table_name"))


def _oracle_broadcast() -> str:
    parts = []
    for tbl, strcols, fixed in (
            ("region", ["r_name"], 4),
            ("nation", ["n_name"], 8),
            ("supplier", ["s_name"], 16),
            ("customer", ["c_name", "c_mktsegment"], 16),
            ("part", ["p_name", "p_brand", "p_type"], 16)):
        sb = " + ".join(f"sum(length({c}))" for c in strcols)
        parts.append(f"""
SELECT '{tbl}' AS table_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST({sb} + count(*) * {fixed + 20} AS BIGINT) AS est_bytes
FROM {tbl}""")
    u = "\nUNION ALL\n".join(parts)
    return f"""
WITH s AS ({u})
SELECT table_name, n_rows, est_bytes,
       CASE WHEN est_bytes <= {_BA_THRESHOLD_B}
            THEN 'broadcast' ELSE 'shuffle' END AS verdict
FROM s
ORDER BY table_name"""


ORACLE_BROADCAST_ADVISOR = _oracle_broadcast()


# ---------------------------------------------------------------------------
# split_leakage_audit — entity overlap across the temporal split
# ---------------------------------------------------------------------------


def q_split_leakage_audit(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Split the events timeline at its midpoint and audit USER
    overlap between the halves: users only-in-train, only-in-test,
    and in BOTH (the leakage set for any user-level model — its
    behavior is memorizable from train), plus overlap_e6 =
    |both| / |test users|. A clean user-level eval needs either
    user-disjoint splits (group_kfold) or this number reported next
    to the metric.

    Scale shape: the split anchor is the 1-row bounds broadcast
    (conformal_coverage_audit shape); per-user presence is ONE
    combinable aggregate (min/max ts vs the split point); the report
    is a 1-row reduction."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts_ns")
    anchor = e.agg(F.min("ts_ns").alias("mn"),
                   F.max("ts_ns").alias("mx"))
    per_user = (e.join(F.broadcast(anchor))
                .groupBy("user_id").agg(
                    F.sum(F.expr("CASE WHEN ts_ns < mn + (mx - mn)"
                                 " div 2 THEN 1 ELSE 0 END"))
                    .alias("n_train"),
                    F.sum(F.expr("CASE WHEN ts_ns >= mn + (mx - mn)"
                                 " div 2 THEN 1 ELSE 0 END"))
                    .alias("n_test")))
    return (per_user.agg(
        F.sum(F.expr("CASE WHEN n_train > 0 AND n_test = 0"
                     " THEN 1 ELSE 0 END")).cast("bigint")
        .alias("train_only"),
        F.sum(F.expr("CASE WHEN n_test > 0 AND n_train = 0"
                     " THEN 1 ELSE 0 END")).cast("bigint")
        .alias("test_only"),
        F.sum(F.expr("CASE WHEN n_train > 0 AND n_test > 0"
                     " THEN 1 ELSE 0 END")).cast("bigint")
        .alias("in_both"))
        .select("train_only", "test_only", "in_both",
                F.expr("(1000000 * CAST(in_both AS DECIMAL(38,0)))"
                       " div (in_both + test_only)").cast("bigint")
                .alias("overlap_e6")))


ORACLE_SPLIT_LEAKAGE = """
WITH e AS (
  SELECT user_id, epoch_ns(ts) AS ts_ns FROM events
), anchor AS (SELECT min(ts_ns) AS mn, max(ts_ns) AS mx FROM e),
per_user AS (
  SELECT user_id,
         sum(CASE WHEN ts_ns <
               (SELECT mn + (mx - mn) // 2 FROM anchor)
             THEN 1 ELSE 0 END) AS n_train,
         sum(CASE WHEN ts_ns >=
               (SELECT mn + (mx - mn) // 2 FROM anchor)
             THEN 1 ELSE 0 END) AS n_test
  FROM e GROUP BY 1
)
SELECT CAST(sum(CASE WHEN n_train > 0 AND n_test = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS train_only,
       CAST(sum(CASE WHEN n_test > 0 AND n_train = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS test_only,
       CAST(sum(CASE WHEN n_train > 0 AND n_test > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS in_both,
       CAST((1000000 * CAST(sum(CASE WHEN n_train > 0 AND n_test > 0
                                THEN 1 ELSE 0 END) AS HUGEINT))
            // (sum(CASE WHEN n_train > 0 AND n_test > 0
                    THEN 1 ELSE 0 END)
                + sum(CASE WHEN n_test > 0 AND n_train = 0
                      THEN 1 ELSE 0 END)) AS BIGINT) AS overlap_e6
FROM per_user
"""


# ---------------------------------------------------------------------------
# churn_feature_labels — observation-window features, holdout label
# ---------------------------------------------------------------------------

_CH_HOLDOUT_D = 7
_CH_DAY_NS = 86_400_000_000_000


def q_churn_feature_labels(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Churn-label construction: the last {_CH_HOLDOUT_D} days of the
    timeline are the HOLDOUT; per user, features come ONLY from the
    observation window before it (event count, value sum, active
    days, days since last activity at the cutoff) and label = 1 when
    the user's holdout DAILY RATE drops below their observation
    daily rate (soft churn, cross-multiplied exact: n_holdout *
    obs_days < n_obs * holdout_days — hard silence never happens on
    this dense synthetic stream, and the decline label exercises
    both classes at every SF). Reported per label:
    user counts and feature means — the class-balance + feature-
    separation readout checked before any model training (and the
    leakage discipline itself: no feature reads past the cutoff).

    Scale shape: 1-row max-ts anchor broadcast (snapshot_asof
    shape); ONE combinable per-user aggregate with conditional
    sums; a 2-row label rollup. Feature means are floored integer
    divisions of exact sums."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts_ns",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v_c"))
    anchor = e.agg(F.max("ts_ns").alias("amax"),
                   F.min("ts_ns").alias("amin"))
    cutoff = f"amax - {_CH_HOLDOUT_D} * {_CH_DAY_NS}"
    per_user = (e.join(F.broadcast(anchor))
                .groupBy("user_id").agg(
                    F.sum(F.expr(f"CASE WHEN ts_ns < {cutoff}"
                                 " THEN 1 ELSE 0 END")).alias("n_obs"),
                    F.sum(F.expr(f"CASE WHEN ts_ns < {cutoff}"
                                 " THEN v_c ELSE 0 END"))
                    .alias("val_obs"),
                    F.expr(f"count(DISTINCT CASE WHEN ts_ns < {cutoff}"
                           f" THEN ts_ns div {_CH_DAY_NS} END)")
                    .alias("active_days"),
                    F.max(F.expr(f"CASE WHEN ts_ns < {cutoff}"
                                 " THEN ts_ns END")).alias("last_obs"),
                    F.max("amax").alias("amax"),
                    F.max("amin").alias("amin"),
                    F.sum(F.expr(f"CASE WHEN ts_ns >= {cutoff}"
                                 " THEN 1 ELSE 0 END"))
                    .alias("n_holdout")))
    feats = (per_user.filter(F.col("n_obs") > 0)
             .select("user_id", "n_obs", "val_obs", "active_days",
                     F.expr(f"(amax - {_CH_HOLDOUT_D} * {_CH_DAY_NS}"
                            f" - last_obs) div {_CH_DAY_NS}")
                     .alias("recency_d"),
                     F.when(
                         F.expr(f"n_holdout * ((amax"
                                f" - {_CH_HOLDOUT_D} * {_CH_DAY_NS}"
                                f" - amin) div {_CH_DAY_NS} + 1)"
                                f" < n_obs * {_CH_HOLDOUT_D}"),
                         1).otherwise(0)
                     .alias("churned")))
    return (feats.groupBy("churned").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.expr("sum(CAST(n_obs AS DECIMAL(38,0))) div count(1)")
        .cast("bigint").alias("mean_events"),
        F.expr("sum(CAST(val_obs AS DECIMAL(38,0))) div count(1)")
        .cast("bigint").alias("mean_value_c"),
        F.expr("sum(CAST(active_days AS DECIMAL(38,0)))"
               " div count(1)").cast("bigint")
        .alias("mean_active_days"),
        F.expr("sum(CAST(recency_d AS DECIMAL(38,0))) div count(1)")
        .cast("bigint").alias("mean_recency_d"))
        .select(F.col("churned").cast("bigint").alias("churned"),
                "n_users", "mean_events", "mean_value_c",
                "mean_active_days", "mean_recency_d")
        .orderBy("churned"))


ORACLE_CHURN = f"""
WITH e AS (
  SELECT user_id, epoch_ns(ts) AS ts_ns,
         CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events
), anchor AS (SELECT max(ts_ns) AS amax, min(ts_ns) AS amin
              FROM e),
per_user AS (
  SELECT user_id,
         sum(CASE WHEN ts_ns < amax - {_CH_HOLDOUT_D}
               * {_CH_DAY_NS} THEN 1 ELSE 0 END) AS n_obs,
         sum(CASE WHEN ts_ns < amax - {_CH_HOLDOUT_D}
               * {_CH_DAY_NS} THEN v_c ELSE 0 END) AS val_obs,
         count(DISTINCT CASE WHEN ts_ns < amax - {_CH_HOLDOUT_D}
               * {_CH_DAY_NS} THEN ts_ns // {_CH_DAY_NS} END)
           AS active_days,
         max(CASE WHEN ts_ns < amax - {_CH_HOLDOUT_D}
               * {_CH_DAY_NS} THEN ts_ns END) AS last_obs,
         max(amax) AS amax, max(amin) AS amin,
         sum(CASE WHEN ts_ns >= amax - {_CH_HOLDOUT_D}
               * {_CH_DAY_NS} THEN 1 ELSE 0 END) AS n_holdout
  FROM e, anchor GROUP BY user_id
), feats AS (
  SELECT user_id, n_obs, val_obs, active_days,
         (amax - {_CH_HOLDOUT_D} * {_CH_DAY_NS} - last_obs)
           // {_CH_DAY_NS} AS recency_d,
         CASE WHEN n_holdout * ((amax - {_CH_HOLDOUT_D}
                * {_CH_DAY_NS} - amin) // {_CH_DAY_NS} + 1)
              < n_obs * {_CH_HOLDOUT_D} THEN 1 ELSE 0 END AS churned
  FROM per_user WHERE n_obs > 0
)
SELECT CAST(churned AS BIGINT) AS churned,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CAST(n_obs AS HUGEINT)) // count(*) AS BIGINT)
         AS mean_events,
       CAST(sum(CAST(val_obs AS HUGEINT)) // count(*) AS BIGINT)
         AS mean_value_c,
       CAST(sum(CAST(active_days AS HUGEINT)) // count(*) AS BIGINT)
         AS mean_active_days,
       CAST(sum(CAST(recency_d AS HUGEINT)) // count(*) AS BIGINT)
         AS mean_recency_d
FROM feats
GROUP BY churned
ORDER BY churned
"""


QUERIES_EXT38.update({
    "broadcast_advisor": q_broadcast_advisor,
    "split_leakage_audit": q_split_leakage_audit,
    "churn_feature_labels": q_churn_feature_labels,
})
ORACLE_EXT38.update({
    "broadcast_advisor": ORACLE_BROADCAST_ADVISOR,
    "split_leakage_audit": ORACLE_SPLIT_LEAKAGE,
    "churn_feature_labels": ORACLE_CHURN,
})
