"""Catalog extension 35 (round 9, second session, wave 10). Robust
location statistics at scale:

  histogram_refine_median  EXACT median per group via the two-pass
                           histogram-refine selection — the scale
                           path exact_percentile_rank's docstring
                           promises ("for a single giant group the
                           two-pass histogram-refine selection would
                           replace the full sort"), now implemented
                           and oracle-checked against the plain sort
  trimmed_mean_report      5%-trimmed mean per group from band
                           counts with exact partial-band
                           adjustment — the robust location estimate
                           that DROPS the tails winsorize_report
                           merely clamps

Reference parity: none in the reference; stats extension family.

Cross-engine determinism (SURVEY 4.4): all-integer — the refine
passes select by exact rank arithmetic on band counts; the trimmed
mean is an exact integer division of an exactly-adjusted sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t

QUERIES_EXT35: dict = {}
ORACLE_EXT35: dict = {}


# ---------------------------------------------------------------------------
# histogram_refine_median — two-pass exact median without a full sort
# ---------------------------------------------------------------------------

_HR_BAND_C = 4096   # pass-1 band width (cents)


def q_histogram_refine_median(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """EXACT lower median (rank ceil(n/2) in value order) of event
    value per type, computed WITHOUT sorting the corpus: pass 1
    reduces to per-(type, band) counts ({_HR_BAND_C}-cent bands,
    value-domain-bounded), a prefix sum over the band table finds
    the band containing the median rank; pass 2 sorts ONLY the rows
    inside that one band (corpus/|bands| rows per type) and selects
    the residual rank. This is the selection plan that replaces
    exact_percentile_rank's per-group full sort when one group spans
    the corpus — that docstring names this exact alternative; this
    entry implements it and the oracle pins it to the plain
    sort-based median.

    Scale shape: pass 1 is ONE combinable aggregate; the band prefix
    runs over the domain-bounded band table (partitioned by type);
    pass 2 re-scans with a BROADCAST (type -> target band) filter —
    the second scan touches the full corpus but sorts only the
    in-band slice, turning an O(n log n) per-group sort into
    O(n) + O(n/bands log(n/bands))."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v_c"))
    bands = (e.withColumn("band", F.expr(f"v_c div {_HR_BAND_C}"))
             .groupBy("event_type", "band")
             .agg(F.count(F.lit(1)).alias("cnt")))
    wcum = (Window.partitionBy("event_type").orderBy("band")
            .rowsBetween(Window.unboundedPreceding, -1))
    wall = Window.partitionBy("event_type")
    pre = bands.select(
        "event_type", "band", "cnt",
        F.coalesce(F.sum("cnt").over(wcum), F.lit(0)).alias("before"),
        F.sum("cnt").over(wall).alias("n"))
    target = (pre.withColumn("rank", F.expr("ceil(n / 2)"))
              .filter((F.col("before") < F.col("rank"))
                      & (F.col("before") + F.col("cnt")
                         >= F.col("rank")))
              .select("event_type", "band",
                      (F.col("rank") - F.col("before"))
                      .alias("residual"), "n"))
    inband = (e.withColumn("band", F.expr(f"v_c div {_HR_BAND_C}"))
              .join(F.broadcast(target), ["event_type", "band"]))
    wsel = Window.partitionBy("event_type").orderBy("v_c")
    return (inband.withColumn("rn", F.row_number().over(wsel))
            .filter(F.col("rn") == F.col("residual"))
            .select("event_type",
                    F.col("n").cast("bigint").alias("n_rows"),
                    F.col("v_c").cast("bigint").alias("median_c"))
            .orderBy("event_type"))


ORACLE_HISTOGRAM_MEDIAN = """
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events
), ranked AS (
  SELECT event_type, v_c,
         row_number() OVER (PARTITION BY event_type ORDER BY v_c)
           AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM e
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_rows,
       CAST(max(CASE WHEN rn = ceil(n / 2) THEN v_c END) AS BIGINT)
         AS median_c
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# trimmed_mean_report — 5% two-sided trim from band counts
# ---------------------------------------------------------------------------

_TM_BAND_C = 4096
_TM_TRIM_E6 = 50000   # 5% off each tail


def q_trimmed_mean_report(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """5%-trimmed mean of event value per type: drop the lowest and
    highest floor(0.05 * n) values, average the rest — the robust
    location estimate that DELETES outliers (winsorize_report clamps
    them to the fence, which still moves the mean).

    Exact without sorting raw rows twice: band counts + band value
    SUMS reduce the corpus once; the trim boundary lands inside one
    band per tail, and the partial-band adjustment re-scans only the
    two boundary bands' rows to drop exactly the right values in
    (v_c, order) — rank arithmetic on exact counts. Output also
    carries the untrimmed mean for the robustness delta.

    Scale shape: pass 1 combinable (type, band) count+sum; prefix
    over the domain-bounded band table; pass 2 broadcast-filters the
    two boundary bands per type and ranks only those slices."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v_c"))
    b = (e.withColumn("band", F.expr(f"v_c div {_TM_BAND_C}"))
         .groupBy("event_type", "band")
         .agg(F.count(F.lit(1)).alias("cnt"),
              F.sum("v_c").alias("s")))
    wcum = (Window.partitionBy("event_type").orderBy("band")
            .rowsBetween(Window.unboundedPreceding, -1))
    wall = Window.partitionBy("event_type")
    pre = b.select(
        "event_type", "band", "cnt", "s",
        F.coalesce(F.sum("cnt").over(wcum), F.lit(0)).alias("before"),
        F.sum("cnt").over(wall).alias("n"),
        F.sum("s").over(wall).alias("total_s")).localCheckpoint()
    k = F.expr(f"CAST(n * {_TM_TRIM_E6} AS BIGINT) div 1000000")
    pre2 = pre.withColumn("k", k)
    # bands fully inside a trimmed tail contribute nothing; fully
    # inside the keep zone contribute (cnt, s) whole; boundary bands
    # contribute via the pass-2 in-band rank scan
    lo_excl = F.least(F.greatest(F.col("k") - F.col("before"),
                                 F.lit(0)), F.col("cnt"))
    hi_excl = F.least(F.greatest(
        (F.col("before") + F.col("cnt")) - (F.col("n") - F.col("k")),
        F.lit(0)), F.col("cnt"))
    marked = pre2.select(
        "event_type", "band", "cnt", "s", "before", "n", "total_s",
        "k", lo_excl.alias("lo_excl"), hi_excl.alias("hi_excl"))
    # exact sums of the excluded values: re-scan ONLY bands with a
    # partial exclusion (0 < excl < cnt); full exclusions use s whole
    partial = (marked.filter(
        ((F.col("lo_excl") > 0) & (F.col("lo_excl") < F.col("cnt")))
        | ((F.col("hi_excl") > 0)
           & (F.col("hi_excl") < F.col("cnt"))))
        .select("event_type", "band", "lo_excl", "hi_excl", "cnt"))
    inband = (e.withColumn("band", F.expr(f"v_c div {_TM_BAND_C}"))
              .join(F.broadcast(partial), ["event_type", "band"]))
    wb = Window.partitionBy("event_type", "band").orderBy("v_c")
    padj = (inband.withColumn("rn", F.row_number().over(wb))
            .select("event_type",
                    F.when(F.col("rn") <= F.col("lo_excl"),
                           F.col("v_c")).otherwise(0).alias("lo_v"),
                    F.when(F.col("rn") > F.col("cnt")
                           - F.col("hi_excl"), F.col("v_c"))
                    .otherwise(0).alias("hi_v"))
            .groupBy("event_type")
            .agg(F.sum("lo_v").alias("lo_part"),
                 F.sum("hi_v").alias("hi_part")))
    full = (marked.groupBy("event_type").agg(
        F.max("n").alias("n"), F.max("total_s").alias("total_s"),
        F.max("k").alias("k"),
        F.sum(F.when(F.col("lo_excl") == F.col("cnt"), F.col("s"))
              .otherwise(0)).alias("lo_full"),
        F.sum(F.when(F.col("hi_excl") == F.col("cnt"), F.col("s"))
              .otherwise(0)).alias("hi_full")))
    return (full.join(padj, "event_type", "left")
            .select(
                "event_type",
                F.col("n").cast("bigint").alias("n_rows"),
                F.col("k").cast("bigint").alias("k_trimmed"),
                F.expr("total_s div n").cast("bigint").alias("mean_c"),
                F.expr("(total_s - lo_full - hi_full"
                       " - coalesce(lo_part, 0)"
                       " - coalesce(hi_part, 0)) div (n - 2 * k)")
                .cast("bigint").alias("trimmed_mean_c"))
            .orderBy("event_type"))


ORACLE_TRIMMED_MEAN = f"""
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events
), ranked AS (
  SELECT event_type, v_c,
         row_number() OVER (PARTITION BY event_type ORDER BY v_c)
           AS rn,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(v_c) OVER (PARTITION BY event_type) AS total_s
  FROM e
), k AS (
  SELECT event_type, max(n) AS n, max(total_s) AS total_s,
         CAST(max(n) * {_TM_TRIM_E6} AS BIGINT) // 1000000 AS k
  FROM ranked GROUP BY 1
)
SELECT r.event_type,
       CAST(k.n AS BIGINT) AS n_rows,
       CAST(k.k AS BIGINT) AS k_trimmed,
       CAST(k.total_s // k.n AS BIGINT) AS mean_c,
       CAST(sum(CASE WHEN r.rn > k.k AND r.rn <= k.n - k.k
                THEN r.v_c ELSE 0 END) // (k.n - 2 * k.k) AS BIGINT)
         AS trimmed_mean_c
FROM ranked r JOIN k ON r.event_type = k.event_type
GROUP BY r.event_type, k.n, k.k, k.total_s
ORDER BY r.event_type
"""


QUERIES_EXT35.update({
    "histogram_refine_median": q_histogram_refine_median,
    "trimmed_mean_report": q_trimmed_mean_report,
})
ORACLE_EXT35.update({
    "histogram_refine_median": ORACLE_HISTOGRAM_MEDIAN,
    "trimmed_mean_report": ORACLE_TRIMMED_MEAN,
})
