"""Catalog extension 27 (round 9, second session, wave 2). Rank tests,
model-lift reporting, and survival analysis:

  kruskal_wallis      exact tie-corrected Kruskal-Wallis H across the
                      return-flag groups from the distinct-value grid
                      (the k-group extension of mannwhitney_auc)
  lift_gains_report   cumulative gains / lift table over score bands —
                      the model-evaluation report a ranking model is
                      judged by before deployment
  kaplan_meier        Kaplan-Meier survival estimator over user
                      lifetimes with right-censoring, computed as an
                      exact integer fold over the day-level
                      (deaths, censored) table

Reference parity: none in the reference; the brief's analytics
extension families (stats begun in ext10/ext20/ext26).

Cross-engine determinism (SURVEY 4.4): corpus reductions land in
exact integer / DECIMAL(38,0) lattices; the only doubles are
single-row closed forms over exact moments (corr_report rule); the
KM recurrence floors at e9 per step IDENTICALLY in both engines
(Spark aggregate() fold == DuckDB recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t

QUERIES_EXT27: dict = {}
ORACLE_EXT27: dict = {}


# ---------------------------------------------------------------------------
# kruskal_wallis — k-group rank test from the distinct-value grid
# ---------------------------------------------------------------------------


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: does l_quantity's distribution differ
    across the three return-flag groups? The k-group generalization
    of mannwhitney_auc, exact under ties.

    Rank construction is the spearman_corr grid trick: quantity has a
    FIXED 50-value domain, so the corpus reduces via ONE combinable
    groupBy to the (flag, qty) grid; tie-averaged ranks (doubled to
    stay integral) come from a prefix sum over the 50-row value
    marginal — the only unpartitioned window in the plan runs over
    that domain-bounded frame (corpus-independent; lint-allowlisted).

    The statistic lands on the e6 lattice all-integer:
      S      = sum_g floor(R2_g^2 * 1e6 / (4 * n_g))   [R2 = doubled
               rank sum; the /4 undoes the doubling exactly]
      h_e6   = (12 * S) div (N * (N + 1)) - 3 * (N + 1) * 1e6
    Tie correction (the only doubles, in the single output row):
      h_adj_e6 = floor(h_e6 * (N^3 - N) / (N^3 - N - T)),
      T = sum_v (t_v^3 - t_v).
    The per-group quotient S_g ~ n_g * N^2 / 4 * 1e6 exceeds BIGINT
    from ~60k rows up, and Spark's `div` always lands in BIGINT — so
    the floor divisions ride the EXACT-DECIMAL idiom
    (a - a %% b) / b (the quotient is an integer after the remainder
    subtraction, so the scale-6 decimal rounding cannot distort it;
    DuckDB's // is HUGEINT-exact natively). DECIMAL(38,0) holds S
    through N ~ 3e9 rows per the S ~ N^3/12 * 1e6 bound (documented,
    the corr_report moment class).
    """
    l = _t(spark, sf_dir, "lineitem")
    grid = (l.select(F.col("l_returnflag").alias("flag"),
                     F.round("l_quantity").cast("bigint").alias("q"))
            .groupBy("flag", "q").agg(F.count(F.lit(1)).alias("cnt")))
    grid = grid.localCheckpoint()
    marg = grid.groupBy("q").agg(F.sum("cnt").alias("cq"))
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    ranked = marg.select(
        "q",
        (2 * F.coalesce(F.sum("cq").over(w), F.lit(0))
         + F.col("cq") + 1).alias("ravg2"),
        F.col("cq"))
    per_flag = (grid.join(F.broadcast(ranked.select("q", "ravg2")), "q")
                .groupBy("flag").agg(
                    F.sum("cnt").cast("decimal(38,0)").alias("n_g"),
                    F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * ravg2"))
                    .alias("r2_g")))
    s = per_flag.agg(
        F.count(F.lit(1)).alias("k_groups"),
        F.sum("n_g").alias("n"),
        F.sum(F.expr(
            "CAST((r2_g * r2_g * 1000000 -"
            " (r2_g * r2_g * 1000000) % (4 * n_g)) / (4 * n_g)"
            " AS DECIMAL(38,0))")).alias("s"))
    ties = marg.agg(
        F.sum(F.expr("CAST(cq AS DECIMAL(38,0)) * cq * cq - cq"))
        .alias("t"))
    out = s.join(F.broadcast(ties))
    h_e6 = F.expr(
        "CAST((12 * s - (12 * s) % (n * (n + 1))) / (n * (n + 1))"
        " AS DECIMAL(38,0)) - 3 * (n + 1) * 1000000")
    return out.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("k_groups").cast("bigint").alias("k_groups"),
        h_e6.cast("bigint").alias("h_e6"),
        F.floor(h_e6.cast("double")
                * ((F.expr("n * n * n - n").cast("double"))
                   / (F.expr("n * n * n - n - t").cast("double"))))
        .cast("bigint").alias("h_adj_e6"))


ORACLE_KRUSKAL = """
WITH grid AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_quantity) AS BIGINT) AS q, count(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), marg AS (
  SELECT q, sum(cnt) AS cq FROM grid GROUP BY 1
), ranked AS (
  SELECT q,
         2 * coalesce(sum(cq) OVER (ORDER BY q
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cq + 1 AS ravg2,
         cq
  FROM marg
), per_flag AS (
  SELECT flag, CAST(sum(g.cnt) AS HUGEINT) AS n_g,
         CAST(sum(CAST(g.cnt AS HUGEINT) * r.ravg2) AS HUGEINT) AS r2_g
  FROM grid g JOIN ranked r ON g.q = r.q
  GROUP BY flag
), s AS (
  SELECT count(*) AS k_groups, sum(n_g) AS n,
         sum((r2_g * r2_g * 1000000) // (4 * n_g)) AS s
  FROM per_flag
), ties AS (
  SELECT sum(CAST(cq AS HUGEINT) * cq * cq - cq) AS t FROM marg
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(k_groups AS BIGINT) AS k_groups,
       CAST((12 * s) // (n * (n + 1)) - 3 * (n + 1) * 1000000
            AS BIGINT) AS h_e6,
       CAST(floor(CAST((12 * s) // (n * (n + 1))
                       - 3 * (n + 1) * 1000000 AS DOUBLE)
                  * (CAST(n * n * n - n AS DOUBLE)
                     / CAST(n * n * n - n - t AS DOUBLE)))
            AS BIGINT) AS h_adj_e6
FROM s, ties
"""


# ---------------------------------------------------------------------------
# lift_gains_report — cumulative gains / lift over score bands
# ---------------------------------------------------------------------------

_LG_BAND_C = 1000_00   # score band width: $1000 in cents


def q_lift_gains_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table: score orders by o_totalprice
    (the "model score" stand-in), positives = 1-URGENT priority, and
    read down from the top score band: what share of all positives
    (gain) and what positive-rate multiple vs. baseline (lift) has
    been captured so far — the table that decides "how deep do we
    mail / review / rank".

    Scale shape: the corpus reduces via ONE combinable groupBy onto
    ${_LG_BAND_C // 100}-wide score bands (price-domain-bounded:
    ~500 rows regardless of corpus size); descending prefix sums and
    the grand totals run over THAT band table (the gini_coefficient
    two-level banded decomposition; lint-allowlisted global window
    over a corpus-independent frame). gain/lift land on the e6
    lattice with exact integer div.
    """
    o = _t(spark, sf_dir, "orders")
    bands = (o.select(
        F.expr(f"CAST(round(o_totalprice * 100) AS BIGINT)"
               f" div {_LG_BAND_C}").alias("band"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        .alias("pos"))
        .groupBy("band").agg(F.count(F.lit(1)).alias("n"),
                             F.sum("pos").alias("pos")))
    wcum = (Window.orderBy(F.desc("band"))
            .rowsBetween(Window.unboundedPreceding, 0))
    wall = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    g = bands.select(
        "band", "n", "pos",
        F.sum("n").over(wcum).alias("cum_n"),
        F.sum("pos").over(wcum).alias("cum_pos"),
        F.sum("n").over(wall).alias("tot_n"),
        F.sum("pos").over(wall).alias("tot_pos"))
    return (g.select(
        F.col("band").cast("bigint").alias("band"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("pos").cast("bigint").alias("n_pos"),
        F.col("cum_n").cast("bigint").alias("cum_n"),
        F.col("cum_pos").cast("bigint").alias("cum_pos"),
        F.expr("(1000000 * CAST(cum_pos AS DECIMAL(38,0)))"
               " div tot_pos").cast("bigint").alias("gain_e6"),
        F.expr("(1000000 * CAST(cum_pos AS DECIMAL(38,0)) * tot_n)"
               " div (CAST(cum_n AS DECIMAL(38,0)) * tot_pos)")
        .cast("bigint").alias("lift_e6"))
        .orderBy(F.desc("band")))


ORACLE_LIFT = f"""
WITH bands AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // {_LG_BAND_C}
           AS band,
         count(*) AS n,
         sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           AS pos
  FROM orders GROUP BY 1
), g AS (
  SELECT band, n, pos,
         sum(n) OVER (ORDER BY band DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_n,
         sum(pos) OVER (ORDER BY band DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_pos,
         sum(n) OVER () AS tot_n,
         sum(pos) OVER () AS tot_pos
  FROM bands
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(n AS BIGINT) AS n_orders,
       CAST(pos AS BIGINT) AS n_pos,
       CAST(cum_n AS BIGINT) AS cum_n,
       CAST(cum_pos AS BIGINT) AS cum_pos,
       CAST((1000000 * CAST(cum_pos AS HUGEINT)) // tot_pos
            AS BIGINT) AS gain_e6,
       CAST((1000000 * CAST(cum_pos AS HUGEINT) * tot_n)
            // (CAST(cum_n AS HUGEINT) * tot_pos) AS BIGINT)
         AS lift_e6
FROM g
ORDER BY band DESC
"""


# ---------------------------------------------------------------------------
# kaplan_meier — survival estimator with right-censoring
# ---------------------------------------------------------------------------

_KM_HOUR_NS = 3_600_000_000_000
_KM_CENSOR_HOURS = 96   # users active within 96h of corpus end = censored


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes: lifetime =
    hours between a user's first and last event; users whose last
    event falls within {_KM_CENSOR_HOURS} hours of the corpus end are
    right-CENSORED (still alive — their lifetime is a lower bound,
    they leave the risk set without a death). S(t) multiplies
    (1 - d_t / n_t) over event days — the estimator every retention /
    reliability analysis starts from, and the reason naive "average
    lifetime" is biased under censoring.

    Determinism: S lands on the e9 lattice via a PER-STEP floor
    recurrence surv' = surv * (at_risk - d) div at_risk — a product
    of many rationals overflows any fixed decimal, but the stepwise
    floor is exactly reproducible: Spark folds it with ONE in-row
    aggregate() over the day-level array; the oracle replays it with
    a recursive CTE. No floats anywhere.

    Scale shape: the corpus reduces via per-user first/last (ONE
    combinable groupBy); the hour-level (deaths, censored) table is
    CALENDAR-BOUNDED (|timeline hours| rows regardless of corpus
    size), so collecting it into a single in-plan array row for the
    fold is tiny-by-construction — the same bound class as the
    histogram/band allowlists, with no window at all. The corpus-end
    anchor is a 1-row broadcast (snapshot_asof shape).
    """
    e = _t(spark, sf_dir, "events").select("user_id", "ts_ns")
    anchor = e.agg(F.max("ts_ns").alias("amax"))
    users = (e.groupBy("user_id")
             .agg(F.min("ts_ns").alias("first_ns"),
                  F.max("ts_ns").alias("last_ns"))
             .join(F.broadcast(anchor))
             .select(
                 F.expr(f"(last_ns - first_ns) div {_KM_HOUR_NS}")
                 .alias("t_hour"),
                 F.expr(f"CASE WHEN last_ns <"
                        f" amax - {_KM_CENSOR_HOURS} * {_KM_HOUR_NS}"
                        f" THEN 1 ELSE 0 END").alias("observed")))
    hours = users.groupBy("t_hour").agg(
        F.sum("observed").alias("d"),
        F.sum(1 - F.col("observed")).alias("c"))
    folded = (hours.agg(
        F.array_sort(F.collect_list(F.struct("t_hour", "d", "c")))
        .alias("arr"),
        F.sum(F.col("d") + F.col("c")).alias("n0"))
        .select(F.explode(F.expr("""
            aggregate(
              arr,
              named_struct('surv', CAST(1000000000 AS DECIMAL(38,0)),
                           'at_risk', CAST(n0 AS DECIMAL(38,0)),
                           'out', CAST(array() AS
                             ARRAY<STRUCT<t_hour: BIGINT,
                                          n_at_risk: BIGINT,
                                          d_events: BIGINT,
                                          c_censored: BIGINT,
                                          surv_e9: BIGINT>>)),
              (acc, x) -> named_struct(
                'surv', CAST((acc.surv * (acc.at_risk - x.d))
                          div acc.at_risk AS DECIMAL(38,0)),
                'at_risk', acc.at_risk - x.d - x.c,
                'out', array_append(acc.out, named_struct(
                  't_hour', CAST(x.t_hour AS BIGINT),
                  'n_at_risk', CAST(acc.at_risk AS BIGINT),
                  'd_events', CAST(x.d AS BIGINT),
                  'c_censored', CAST(x.c AS BIGINT),
                  'surv_e9', CAST((acc.surv * (acc.at_risk - x.d))
                                  div acc.at_risk AS BIGINT)))),
              acc -> acc.out)""")).alias("r")))
    return folded.select("r.*").orderBy("t_hour")


ORACLE_KM = f"""
WITH e AS (
  SELECT user_id, epoch_ns(ts) AS ts_ns FROM events
), anchor AS (SELECT max(ts_ns) AS amax FROM e),
users AS (
  SELECT (max(ts_ns) - min(ts_ns)) // {_KM_HOUR_NS} AS t_hour,
         CASE WHEN max(ts_ns) <
           (SELECT amax FROM anchor)
             - {_KM_CENSOR_HOURS} * {_KM_HOUR_NS}
          THEN 1 ELSE 0 END AS observed
  FROM e GROUP BY user_id
), days AS (
  SELECT t_hour, sum(observed) AS d, sum(1 - observed) AS c,
         row_number() OVER (ORDER BY t_hour) AS rn
  FROM users GROUP BY t_hour
), tot AS (SELECT CAST(sum(d + c) AS HUGEINT) AS n0 FROM days),
rec AS (
  WITH RECURSIVE r(rn, t_hour, n_at_risk, d_events, c_censored,
                   surv, next_at_risk) AS (
    SELECT d.rn, d.t_hour, tot.n0, d.d, d.c,
           (CAST(1000000000 AS HUGEINT) * (tot.n0 - d.d)) // tot.n0,
           tot.n0 - d.d - d.c
    FROM days d, tot WHERE d.rn = 1
    UNION ALL
    SELECT d.rn, d.t_hour, r.next_at_risk, d.d, d.c,
           (r.surv * (r.next_at_risk - d.d)) // r.next_at_risk,
           r.next_at_risk - d.d - d.c
    FROM r JOIN days d ON d.rn = r.rn + 1
  )
  SELECT * FROM r
)
SELECT CAST(t_hour AS BIGINT) AS t_hour,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d_events AS BIGINT) AS d_events,
       CAST(c_censored AS BIGINT) AS c_censored,
       CAST(surv AS BIGINT) AS surv_e9
FROM rec
ORDER BY t_hour
"""


QUERIES_EXT27.update({
    "kruskal_wallis": q_kruskal_wallis,
    "lift_gains_report": q_lift_gains_report,
    "kaplan_meier": q_kaplan_meier,
})
ORACLE_EXT27.update({
    "kruskal_wallis": ORACLE_KRUSKAL,
    "lift_gains_report": ORACLE_LIFT,
    "kaplan_meier": ORACLE_KM,
})
