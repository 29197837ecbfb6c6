"""Catalog extension 32 (round 9, second session, wave 7). Metric
deltas, embedding drift, and quantile-forecast evaluation:

  wow_delta_report         week-over-week metric deltas per event
                           type (volume + value, pct change on the
                           e6 lattice) — the first derivative every
                           metrics dashboard shows
  embedding_centroid_drift per-label centroid shift between the
                           first and second half of the vector
                           corpus — the embedding-space drift check
                           run before trusting an ANN index after a
                           re-embed
  pinball_loss_eval        pinball (quantile) loss of fixed p50/p90
                           forecasts against actuals — the proper
                           scoring rule for quantile predictions
                           (MAE can't tell a good p90 from a bad one)

Reference parity: none in the reference; analytics / embedding-ops
extension families.

Cross-engine determinism (SURVEY 4.4): integer lattices end to end —
WoW pct deltas and centroid components are floored integer divisions
of exact sums; pinball loss is exact integer arithmetic on cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t

QUERIES_EXT32: dict = {}
ORACLE_EXT32: dict = {}


# ---------------------------------------------------------------------------
# wow_delta_report — week-over-week metric deltas
# ---------------------------------------------------------------------------

_WOW_WEEK_NS = 7 * 86_400_000_000_000


def q_wow_delta_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, week): event volume and total value, plus the
    week-over-week deltas and pct change (e6 lattice, NULL for the
    first week and when the prior week is zero) — the derivative view
    a metrics dashboard layers over raw counts.

    Scale shape: ONE combinable (type, week) aggregate; the lag runs
    over the CALENDAR-BOUNDED weekly frame partitioned by type. Pct
    deltas are floored integer divisions of exact sums."""
    e = _t(spark, sf_dir, "events")
    wk = (e.select("event_type",
                   F.expr(f"ts_ns div {_WOW_WEEK_NS}").alias("week"),
                   F.expr("CAST(round(value * 100) AS BIGINT)")
                   .alias("v_c"))
          .groupBy("event_type", "week")
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum("v_c").alias("val_c")))
    w = Window.partitionBy("event_type").orderBy("week")
    out = wk.select(
        "event_type", "week", "n", "val_c",
        F.lag("n").over(w).alias("pn"),
        F.lag("val_c").over(w).alias("pv"))
    pct = ("CASE WHEN {p} IS NOT NULL AND {p} <> 0 THEN"
           " (1000000 * (CAST({c} AS DECIMAL(38,0)) - {p})) div {p}"
           " END")
    return (out.select(
        "event_type",
        F.col("week").cast("bigint").alias("week"),
        F.col("n").cast("bigint").alias("n_events"),
        F.col("val_c").cast("bigint").alias("value_c"),
        F.expr(pct.format(c="n", p="pn")).cast("bigint")
        .alias("n_wow_e6"),
        F.expr(pct.format(c="val_c", p="pv")).cast("bigint")
        .alias("value_wow_e6"))
        .orderBy("event_type", "week"))


ORACLE_WOW = f"""
WITH wk AS (
  SELECT event_type, epoch_ns(ts) // {_WOW_WEEK_NS} AS week,
         count(*) AS n,
         sum(CAST(round(value * 100) AS BIGINT)) AS val_c
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT event_type, week, n, val_c,
         lag(n) OVER (PARTITION BY event_type ORDER BY week) AS pn,
         lag(val_c) OVER (PARTITION BY event_type ORDER BY week)
           AS pv
  FROM wk
)
SELECT event_type,
       CAST(week AS BIGINT) AS week,
       CAST(n AS BIGINT) AS n_events,
       CAST(val_c AS BIGINT) AS value_c,
       CAST(CASE WHEN pn IS NOT NULL AND pn <> 0 THEN
         (1000000 * (CAST(n AS HUGEINT) - pn)) // pn END AS BIGINT)
         AS n_wow_e6,
       CAST(CASE WHEN pv IS NOT NULL AND pv <> 0 THEN
         (1000000 * (CAST(val_c AS HUGEINT) - pv)) // pv END
         AS BIGINT) AS value_wow_e6
FROM lagged
ORDER BY event_type, week
"""


# ---------------------------------------------------------------------------
# embedding_centroid_drift — per-label centroid shift, half vs half
# ---------------------------------------------------------------------------


def q_embedding_centroid_drift(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Per label: the squared L2 distance between the centroid of the
    FIRST half of the vectors (by vec_id) and the SECOND half — the
    re-embed / distribution-shift check an ANN-index owner runs
    before trusting recall numbers across a model upgrade. Output
    n_a, n_b and drift2_e12 = sum_d ((1e6*sa_d) div na -
    (1e6*sb_d) div nb)^2 — per-dim centroid components floored to
    the e6 lattice BEFORE the square, so the sum is pure integer.

    Scale shape: the split threshold is a 1-row median-free bound
    (max vec_id div 2 — deterministic, no sort); per-(label, dim)
    sums come from ONE in-row posexplode + combinable aggregate;
    dims are fixed (64), so the final reduction is |labels| x 64.
    Component sums quantize via round(CAST(x AS DOUBLE) * 1e6) —
    the float32 dim must widen BEFORE the multiply in BOTH engines
    (a float32 multiply rounds differently engine-to-engine; caught
    by the oracle on first drive)."""
    emb = _t(spark, sf_dir, "embeddings")
    anchor = emb.agg(F.max("vec_id").alias("mx"))
    base = (emb.join(F.broadcast(anchor))
            .select("label",
                    F.when(F.col("vec_id") <= F.expr("mx div 2"), "a")
                    .otherwise("b").alias("half"),
                    F.posexplode(F.col("embedding"))
                    .alias("dim", "x"))
            .select("label", "half", "dim",
                    F.expr("CAST(round(CAST(x AS DOUBLE) * 1000000)"
                           " AS BIGINT)").alias("x_e6")))
    sums = base.groupBy("label", "half", "dim").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x_e6").alias("s"))
    a = sums.filter(F.col("half") == "a").select(
        "label", "dim", F.col("n").alias("na"), F.col("s").alias("sa"))
    b = sums.filter(F.col("half") == "b").select(
        "label", "dim", F.col("n").alias("nb"), F.col("s").alias("sb"))
    comp = (a.join(b, ["label", "dim"])
            .select("label", "na", "nb",
                    (F.expr("sa div na") - F.expr("sb div nb"))
                    .alias("d_e6")))
    return (comp.groupBy("label").agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        F.sum(F.expr("d_e6 * d_e6")).cast("bigint")
        .alias("drift2_e12"))
        .orderBy("label"))


ORACLE_CENTROID_DRIFT = """
WITH anchor AS (SELECT max(vec_id) AS mx FROM embeddings),
base AS (
  SELECT label,
         CASE WHEN vec_id <= (SELECT mx // 2 FROM anchor)
              THEN 'a' ELSE 'b' END AS half,
         i - 1 AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
              AS BIGINT) AS x_e6
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
), sums AS (
  SELECT label, half, dim, count(*) AS n, sum(x_e6) AS s
  FROM base GROUP BY 1, 2, 3
), comp AS (
  SELECT a.label, a.n AS na, b.n AS nb,
         (a.s // a.n - b.s // b.n) AS d_e6
  FROM sums a JOIN sums b
    ON a.label = b.label AND a.dim = b.dim
   AND a.half = 'a' AND b.half = 'b'
)
SELECT CAST(label AS INT) AS label,
       CAST(max(na) AS BIGINT) AS n_a,
       CAST(max(nb) AS BIGINT) AS n_b,
       CAST(sum(d_e6 * d_e6) AS BIGINT) AS drift2_e12
FROM comp
GROUP BY label
ORDER BY label
"""


# ---------------------------------------------------------------------------
# pinball_loss_eval — proper scoring of quantile forecasts
# ---------------------------------------------------------------------------

_PB_QUANTILES = ((50, 4000_00), (90, 12000_00))   # (q, forecast cents)


def q_pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball loss of fixed quantile forecasts for event value
    (q=0.5 at $4000, q=0.9 at $12000) per event type: loss_q(y, f) =
    q*(y-f) if y >= f else (1-q)*(f-y), averaged — the proper scoring
    rule under which the TRUE q-quantile minimizes expected loss, so
    comparing two forecasts' pinball losses is meaningful where MAE
    is not. Reported as mean loss in cents (exact integer sums,
    floored once at the end) plus the coverage rate (share of
    actuals at or under the forecast — a calibrated q-forecast
    covers ~q).

    Scale shape: a static forecast table (|types| x 2 rows)
    broadcast onto the scan; ONE combinable aggregate. All-integer:
    the q weights are /100 rationals folded into the sum before the
    single division."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("y"))
    qrows = F.array(*[
        F.struct(F.lit(q).alias("q"), F.lit(f).alias("f"))
        for q, f in _PB_QUANTILES])
    x = (e.select("event_type", "y",
                  F.explode(qrows).alias("qf"))
         .select("event_type", "y", "qf.q", "qf.f"))
    per = x.select(
        "event_type", "q",
        F.expr("CASE WHEN y >= f THEN q * (y - f)"
               " ELSE (100 - q) * (f - y) END").alias("l100"),
        F.expr("CASE WHEN y <= f THEN 1 ELSE 0 END").alias("cov"))
    return (per.groupBy("event_type", "q").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(l100 AS DECIMAL(38,0))")).alias("sl"),
        F.sum("cov").alias("sc"))
        .select("event_type",
                F.col("q").cast("bigint").alias("q"),
                F.col("n").cast("bigint").alias("n_events"),
                F.expr("sl div (100 * n)").cast("bigint")
                .alias("mean_loss_c"),
                F.expr("(1000000 * CAST(sc AS DECIMAL(38,0))) div n")
                .cast("bigint").alias("coverage_e6"))
        .orderBy("event_type", "q"))


_PB_VALUES = ", ".join(f"({q}, {f})" for q, f in _PB_QUANTILES)

ORACLE_PINBALL = f"""
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS y
  FROM events
), x AS (
  SELECT event_type, y, q, f
  FROM e, (VALUES {_PB_VALUES}) AS t(q, f)
), per AS (
  SELECT event_type, q,
         CASE WHEN y >= f THEN q * (y - f)
              ELSE (100 - q) * (f - y) END AS l100,
         CASE WHEN y <= f THEN 1 ELSE 0 END AS cov
  FROM x
)
SELECT event_type,
       CAST(q AS BIGINT) AS q,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(CAST(sum(CAST(l100 AS HUGEINT)) AS HUGEINT)
            // (100 * count(*)) AS BIGINT) AS mean_loss_c,
       CAST((1000000 * CAST(sum(cov) AS HUGEINT)) // count(*)
            AS BIGINT) AS coverage_e6
FROM per
GROUP BY 1, 2
ORDER BY event_type, q
"""


QUERIES_EXT32.update({
    "wow_delta_report": q_wow_delta_report,
    "embedding_centroid_drift": q_embedding_centroid_drift,
    "pinball_loss_eval": q_pinball_loss_eval,
})
ORACLE_EXT32.update({
    "wow_delta_report": ORACLE_WOW,
    "embedding_centroid_drift": ORACLE_CENTROID_DRIFT,
    "pinball_loss_eval": ORACLE_PINBALL,
})
