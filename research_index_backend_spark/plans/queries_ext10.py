"""Catalog extension 10 (round 8, fourth wave). Statistical analysis
operators — the experiment-analysis / data-audit layer a production
corpus pipeline runs next to its ETL:

  ab_test_welch       two-arm experiment readout: per-arm moments and
                      Welch's t-squared on an exact integer lattice
  chi_square_report   chi-square independence contributions for a
                      categorical contingency grid (segment x region)
  gini_coefficient    inequality index over account balances via a
                      BANDED global rank (two-level prefix decomposition
                      — no single-partition window)
  cusum_changepoint   per-series CUSUM changepoint scan via two-level
                      banded prefix sums + argmax

Cross-engine determinism (SURVEY 4.4): every statistic reduces to
integer sums on e2/e4 lattices with SQL `div`; where a classic formula
divides early (means, variances, expected counts), the comparison is
cross-multiplied so both engines evaluate the SAME integer expression.
Decimal(38,0) accumulators keep the sums exact at 100 TB row counts;
the docstrings note where a final *scalar* cross-multiply would
outgrow 38 digits (driver-scale arithmetic on two aggregate rows, not
a distributed concern).

Reference parity: the reference has no statistics surface (pandas
notebooks stop at counts, create_graph.py aggregates only for
dedup/merge); these extend SURVEY §2 A4/A5's aggregate family the way
the build brief's analytics mandate requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t

QUERIES_EXT10: dict = {}
ORACLE_EXT10: dict = {}


# ---------------------------------------------------------------------------
# ab_test_welch — two-arm experiment readout (Welch's t on a lattice)
# ---------------------------------------------------------------------------

_AB_EVENT = "purchase"


def q_ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split into two arms by
    user_id % 2, metric = purchase value on the e4 lattice. Emits the
    per-arm sizes, lattice means, the mean difference, and Welch's
    t-squared as an integer e6 ratio.

    Determinism + scale: the naive cross-multiplied t^2 has an
    n^4-growth numerator that outgrows even 128-bit integers around
    1e5 rows/arm, so each quantity NORMALIZES before squaring — every
    step an integer div both engines floor identically, every
    intermediate bounded by the VALUE domain (not n):
      dm_e4   = (s1_a*n_b - s1_b*n_a) div (n_a*n_b)      (mean diff)
      v_e8    = (n*s2 - s1^2) div (n*(n-1))              (per-arm var)
      se2_e8  = v_a div n_a + v_b div n_b                (Welch SE^2)
      t2_e6   = dm_e4^2 * 1e6 div greatest(se2_e8, 1)
    The only n-growing intermediate is n*s2 (~2.4e37 digits at 1e12
    rows on this lattice — inside decimal(38,0)).

    Scale shape: one map-side-combinable groupBy on the 2-value arm
    key, a 2-row conditional pivot, then pure scalar arithmetic —
    the corpus is read once, shuffled never (2-row agg exchange)."""
    e = (_t(spark, sf_dir, "events")
         .filter(F.col("event_type") == _AB_EVENT)
         .select((F.col("user_id") % 2).alias("arm"),
                 F.round(F.col("value") * 10000).cast("bigint")
                 .cast("decimal(38,0)").alias("v_e4")))
    s = (e.groupBy("arm")
         .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
              F.sum("v_e4").alias("s1"),
              F.sum(F.col("v_e4") * F.col("v_e4")).alias("s2")))
    arm = lambda c, a: F.max(F.when(F.col("arm") == a, F.col(c)))  # noqa: E731
    piv = s.agg(
        arm("n", 0).alias("n_a"), arm("s1", 0).alias("s1_a"),
        arm("s2", 0).alias("s2_a"),
        arm("n", 1).alias("n_b"), arm("s1", 1).alias("s1_b"),
        arm("s2", 1).alias("s2_b"))
    derived = piv.selectExpr(
        "CAST(n_a AS BIGINT) AS n_a", "CAST(n_b AS BIGINT) AS n_b",
        "CAST(s1_a div n_a AS BIGINT) AS mean_a_e4",
        "CAST(s1_b div n_b AS BIGINT) AS mean_b_e4",
        "CAST((s1_a * n_b - s1_b * n_a) div (n_a * n_b) AS BIGINT)"
        " AS dm_e4",
        "CAST((n_a * s2_a - s1_a * s1_a) div (n_a * (n_a - 1)) div n_a"
        " + (n_b * s2_b - s1_b * s1_b) div (n_b * (n_b - 1)) div n_b"
        " AS BIGINT) AS se2_e8")
    return derived.selectExpr(
        "n_a", "n_b", "mean_a_e4", "mean_b_e4", "dm_e4", "se2_e8",
        "CAST(CAST(dm_e4 AS DECIMAL(38,0)) * dm_e4 * 1000000"
        " div greatest(se2_e8, 1) AS BIGINT) AS t2_e6")


ORACLE_AB_WELCH = f"""
WITH e AS (
  SELECT user_id % 2 AS arm,
         CAST(round(value * 10000) AS BIGINT) AS v_e4
  FROM events WHERE event_type = '{_AB_EVENT}'
),
s AS (
  SELECT arm, count(*) AS n, sum(v_e4) AS s1, sum(v_e4 * v_e4) AS s2
  FROM e GROUP BY 1
),
piv AS (
  SELECT max(CASE WHEN arm = 0 THEN n END) AS n_a,
         max(CASE WHEN arm = 0 THEN s1 END) AS s1_a,
         max(CASE WHEN arm = 0 THEN s2 END) AS s2_a,
         max(CASE WHEN arm = 1 THEN n END) AS n_b,
         max(CASE WHEN arm = 1 THEN s1 END) AS s1_b,
         max(CASE WHEN arm = 1 THEN s2 END) AS s2_b
  FROM s
),
d AS (
  SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         CAST(s1_a // n_a AS BIGINT) AS mean_a_e4,
         CAST(s1_b // n_b AS BIGINT) AS mean_b_e4,
         CAST((s1_a * n_b - s1_b * n_a) // (n_a * n_b) AS BIGINT)
           AS dm_e4,
         CAST((n_a * s2_a - s1_a * s1_a) // (n_a * (n_a - 1)) // n_a
              + (n_b * s2_b - s1_b * s1_b) // (n_b * (n_b - 1)) // n_b
              AS BIGINT) AS se2_e8
  FROM piv
)
SELECT n_a, n_b, mean_a_e4, mean_b_e4, dm_e4, se2_e8,
       CAST(dm_e4 * dm_e4 * 1000000 // greatest(se2_e8, 1) AS BIGINT)
         AS t2_e6
FROM d
"""


# ---------------------------------------------------------------------------
# chi_square_report — contingency-grid independence contributions
# ---------------------------------------------------------------------------


def q_chi_square_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit of market segment x region over
    the customer base: per contingency cell, the observed count, the
    independence-expected count on the e6 lattice
    (row_total * col_total * 1e6 div N), and the cell's chi-square
    contribution term_e6 = (obs*1e6 - exp_e6)^2 div (exp_e6 * 1e6) —
    sum term_e6 over the grid for the statistic (24 dof here).

    All-integer: expected counts and terms use SQL div on exact
    counts, never float fractions, so both engines floor identically.
    The decimal(38,0) intermediates hold through ~1e12 customers; the
    grid itself is |segments| x |regions| rows — driver-tiny.

    Scale shape: the only corpus-scale work is ONE map-side-combinable
    groupBy on the (segment, region) pair (nation/region dims
    broadcast onto the scan); marginals and totals derive from that
    25-row grid with broadcast joins — the corpus is read once."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    obs = (_t(spark, sf_dir, "customer")
           .join(F.broadcast(n),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .join(F.broadcast(r),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .groupBy(F.col("c_mktsegment").alias("seg"),
                    F.col("r_name").alias("reg"))
           .agg(F.count(F.lit(1)).alias("obs")))
    rt = obs.groupBy("seg").agg(F.sum("obs").alias("rt"))
    ct = obs.groupBy("reg").agg(F.sum("obs").alias("ct"))
    tot = obs.agg(F.sum("obs").alias("n_total"))
    g = (obs.join(F.broadcast(rt), "seg")
         .join(F.broadcast(ct), "reg")
         .join(F.broadcast(tot))
         .withColumn("expected_e6",
                     F.expr("CAST(rt AS DECIMAL(38,0)) * ct * 1000000"
                            " div n_total").cast("bigint")))
    term = F.expr(
        "(CAST(obs AS DECIMAL(38,0)) * 1000000 - expected_e6)"
        " * (CAST(obs AS DECIMAL(38,0)) * 1000000 - expected_e6)"
        " div (expected_e6 * 1000000)")
    return (g.select("seg", "reg", "obs", "expected_e6",
                     term.cast("bigint").alias("term_e6"))
            .orderBy("seg", "reg"))


ORACLE_CHI_SQUARE = """
WITH obs AS (
  SELECT c_mktsegment AS seg, r_name AS reg, count(*) AS obs
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
),
rt AS (SELECT seg, sum(obs) AS rt FROM obs GROUP BY 1),
ct AS (SELECT reg, sum(obs) AS ct FROM obs GROUP BY 1),
tot AS (SELECT sum(obs) AS n_total FROM obs)
SELECT seg, reg, obs,
       CAST(rt * ct * 1000000 // n_total AS BIGINT) AS expected_e6,
       CAST((obs * 1000000 - rt * ct * 1000000 // n_total)
            * (obs * 1000000 - rt * ct * 1000000 // n_total)
            // ((rt * ct * 1000000 // n_total) * 1000000) AS BIGINT)
         AS term_e6
FROM obs JOIN rt USING (seg) JOIN ct USING (reg) CROSS JOIN tot
ORDER BY seg, reg
"""


# ---------------------------------------------------------------------------
# gini_coefficient — banded global rank, no single-partition window
# ---------------------------------------------------------------------------

_GINI_BAND = 8192  # cents per rank band: band count tracks the balance
#                    DOMAIN (~1e6 cents / 8192 ≈ 123 bands), not the corpus


def q_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini inequality coefficient over positive customer balances via
    the sorted-rank identity  G = (2*S1 - (n+1)*S0) / (n*S0)  with
    S1 = sum(i * x_(i)), S0 = sum(x), i the 1-based global rank in
    (balance, custkey) order.

    The GLOBAL rank never runs as one window: balances band by
    `bal_cents div 8192` (band count follows the balance DOMAIN, not
    the corpus), each band ranks locally in parallel, and a tiny
    ~123-row exclusive band-count prefix broadcasts back — the same
    two-level scan decomposition as watermark_audit / pareto_frontier.
    Tie order within equal balances is (custkey) — any tie order gives
    the same S1 since tied x are equal. Integer end-to-end: gini_e6 =
    (2*S1 - (n+1)*S0) * 1e6 div (n*S0), decimal(38,0) sums (S1*1e6 ~
    5e35 at 1e12 customers — inside 38 digits).

    Scale shape: one shuffle to band partitions, per-band local
    window, 123-row broadcast, then a single 1-row aggregate."""
    c = (_t(spark, sf_dir, "customer")
         .select("c_custkey",
                 F.round(F.col("c_acctbal") * 100).cast("bigint")
                 .alias("bal_cents"))
         .filter(F.col("bal_cents") > 0)
         .withColumn("band", F.expr(f"bal_cents div {_GINI_BAND}")))
    w_local = Window.partitionBy("band").orderBy("bal_cents", "c_custkey")
    ranked = c.withColumn("rn", F.row_number().over(w_local))
    bc = c.groupBy("band").agg(F.count(F.lit(1)).alias("bn"))
    w_band = (Window.orderBy("band")
              .rowsBetween(Window.unboundedPreceding, -1))
    prefix = bc.select(
        "band", F.coalesce(F.sum("bn").over(w_band), F.lit(0))
        .alias("before"))
    i = (F.col("before") + F.col("rn")).cast("decimal(38,0)")
    return (ranked.join(F.broadcast(prefix), "band")
            .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
                 F.sum(F.col("bal_cents").cast("decimal(38,0)"))
                 .alias("s0"),
                 F.sum(i * F.col("bal_cents")).alias("s1"))
            .select(F.col("n").cast("bigint").alias("n_accounts"),
                    F.col("s0").cast("bigint").alias("total_cents"),
                    F.expr("(2 * s1 - (n + 1) * s0) * 1000000"
                           " div (n * s0)").cast("bigint")
                    .alias("gini_e6")))


ORACLE_GINI = """
WITH c AS (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer WHERE round(c_acctbal * 100) > 0
),
ranked AS (
  SELECT bal_cents,
         row_number() OVER (ORDER BY bal_cents, c_custkey) AS i
  FROM c
)
SELECT CAST(count(*) AS BIGINT) AS n_accounts,
       CAST(sum(bal_cents) AS BIGINT) AS total_cents,
       CAST((2 * sum(i * bal_cents) - (count(*) + 1) * sum(bal_cents))
            * 1000000 // (count(*) * sum(bal_cents)) AS BIGINT)
         AS gini_e6
FROM ranked
"""


# ---------------------------------------------------------------------------
# cusum_changepoint — per-series banded CUSUM argmax
# ---------------------------------------------------------------------------

_CUSUM_DAY_NS = 86_400 * 1_000_000_000


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM changepoint scan: the running sum of
    deviations from the series mean peaks (in absolute value) at the
    most likely level-shift point. Division-free via the identity
      cusum_i = n * prefix_sum_i - i * total_sum
    (the mean never materializes), so every engine sees exact
    integers on the e4 value lattice.

    The per-type running (sum, count) never runs as ONE window per
    type: events band by day (`ts_ns div 86400e9`), the per-(type,
    day) local prefix runs in parallel, and the per-type day-level
    exclusive prefix runs over the tiny day table (rows = days x
    types, partitioned by type). Argmax is a max-of-struct with the
    deterministic (|cusum|, ts_ns, event_id) lexicographic tie-break
    both engines replay.

    Scale shape: one shuffle to (type, day) partitions, a day-table
    rollup, a broadcast of per-type totals, then a 5-row argmax
    aggregate."""
    e = (_t(spark, sf_dir, "events")
         .select("event_type", "ts_ns", "event_id",
                 F.round(F.col("value") * 10000).cast("bigint")
                 .cast("decimal(38,0)").alias("v_e4"))
         .withColumn("day", F.expr(f"ts_ns div {_CUSUM_DAY_NS}")))
    w_local = (Window.partitionBy("event_type", "day")
               .orderBy("ts_ns", "event_id")
               .rowsBetween(Window.unboundedPreceding, 0))
    local = (e.withColumn("ls", F.sum("v_e4").over(w_local))
             .withColumn("lc", F.count(F.lit(1)).over(w_local)))
    daily = (e.groupBy("event_type", "day")
             .agg(F.sum("v_e4").alias("ds"),
                  F.count(F.lit(1)).alias("dc")))
    w_day = (Window.partitionBy("event_type").orderBy("day")
             .rowsBetween(Window.unboundedPreceding, -1))
    dprefix = daily.select(
        "event_type", "day",
        F.coalesce(F.sum("ds").over(w_day),
                   F.lit(0).cast("decimal(38,0)")).alias("dps"),
        F.coalesce(F.sum("dc").over(w_day), F.lit(0)).alias("dpc"))
    tot = (e.groupBy(F.col("event_type").alias("t_type"))
           .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n_t"),
                F.sum("v_e4").alias("s_t")))
    cusum = (F.col("n_t") * (F.col("dps") + F.col("ls"))
             - (F.col("dpc") + F.col("lc")) * F.col("s_t"))
    return (local.join(F.broadcast(dprefix), ["event_type", "day"])
            .join(F.broadcast(tot),
                  F.col("event_type") == F.col("t_type"))
            .withColumn("a", F.abs(cusum))
            .groupBy("event_type")
            .agg(F.max(F.struct(F.col("a"), F.col("ts_ns"),
                                F.col("event_id"))).alias("m"))
            .select("event_type",
                    F.col("m.ts_ns").alias("cp_ts_ns"),
                    F.col("m.a").cast("bigint").alias("max_abs_cusum"))
            .orderBy("event_type"))


ORACLE_CUSUM = """
WITH e AS (
  SELECT event_type, epoch_ns(ts) AS ts_ns, event_id,
         CAST(round(value * 10000) AS BIGINT) AS v_e4
  FROM events
),
t AS (SELECT event_type, count(*) AS n_t, sum(v_e4) AS s_t
      FROM e GROUP BY 1),
c AS (
  SELECT e.event_type, ts_ns, event_id,
         abs(n_t * sum(v_e4) OVER w - row_number() OVER w * s_t) AS a
  FROM e JOIN t USING (event_type)
  WINDOW w AS (PARTITION BY e.event_type ORDER BY ts_ns, event_id
               ROWS UNBOUNDED PRECEDING)
)
SELECT event_type, ts_ns AS cp_ts_ns, CAST(a AS BIGINT) AS max_abs_cusum
FROM c
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY a DESC, ts_ns DESC,
                                    event_id DESC) = 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# acf_report — per-series autocorrelation at small lags
# ---------------------------------------------------------------------------

_ACF_DAY_NS = 86_400 * 1_000_000_000
_ACF_LAGS = (1, 2, 3)


def q_acf_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type autocorrelation at lags 1-3 over the
    (ts, event_id)-ordered value series:
      acf_k = sum(dev_i * dev_{i+k}) / sum(dev_i^2),  dev = v - mean.
    The mean is the FLOORED lattice mean (sum div n) so deviations are
    exact integers both engines share; products stay bounded by the
    value domain (dev^2 <= ~2.4e13 on the e4 lattice), with
    decimal(38,0) accumulators for the corpus-scale sums.

    Global sequence numbers never come from one window: events band by
    day, rank locally within (type, day) in parallel, and the tiny
    per-type day-count exclusive prefix broadcasts back (the
    gini/watermark banded-rank decomposition). Lag pairing is then an
    EQUI-join on (type, seq + k) = (type, seq) — hash-partitioned,
    no range or theta join.

    Scale shape: one shuffle to (type, day) for local ranks, a
    day-table rollup, one hash join on (type, seq) fanned 3x by the
    lag dim, and a (type, lag) rollup. ~5 types x 3 lags output.
    The sequenced deviation frame is checkpointed ONCE (DISK_ONLY,
    3 narrow columns): the denominator and both lag-join sides each
    re-ran the rank window + both broadcast joins in the first cut —
    9 events scans and 3 window shuffles per run."""
    from pyspark import StorageLevel
    e = (_t(spark, sf_dir, "events")
         .select("event_type", "ts_ns", "event_id",
                 F.round(F.col("value") * 10000).cast("bigint")
                 .alias("v_e4"))
         .withColumn("day", F.expr(f"ts_ns div {_ACF_DAY_NS}")))
    t = (e.groupBy(F.col("event_type").alias("t_type"))
         .agg(F.expr("sum(v_e4) div count(1)").alias("m_e4")))
    w_local = Window.partitionBy("event_type", "day").orderBy(
        "ts_ns", "event_id")
    daily = (e.groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).alias("dc")))
    w_day = (Window.partitionBy("event_type").orderBy("day")
             .rowsBetween(Window.unboundedPreceding, -1))
    dprefix = daily.select(
        "event_type", "day",
        F.coalesce(F.sum("dc").over(w_day), F.lit(0)).alias("before"))
    s = (e.withColumn("rn", F.row_number().over(w_local))
         .join(F.broadcast(dprefix), ["event_type", "day"])
         .join(F.broadcast(t), F.col("event_type") == F.col("t_type"))
         .select("event_type",
                 (F.col("before") + F.col("rn")).alias("seq"),
                 (F.col("v_e4") - F.col("m_e4")).alias("dev"))
         .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY))
    den = (s.groupBy(F.col("event_type").alias("d_type"))
           .agg(F.sum(F.col("dev").cast("decimal(38,0)") * F.col("dev"))
                .alias("den")))
    a = (s.select(F.col("event_type").alias("a_type"),
                  F.col("seq").alias("a_seq"), F.col("dev").alias("a_dev"))
         .withColumn("lag", F.explode(F.array(
             *[F.lit(k) for k in _ACF_LAGS]))))
    b = s.select(F.col("event_type").alias("b_type"),
                 F.col("seq").alias("b_seq"), F.col("dev").alias("b_dev"))
    return (a.join(b, (F.col("a_type") == F.col("b_type"))
                   & (F.col("a_seq") + F.col("lag") == F.col("b_seq")))
            .groupBy(F.col("a_type").alias("event_type"), "lag")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum(F.col("a_dev").cast("decimal(38,0)")
                       * F.col("b_dev")).alias("num"))
            .join(F.broadcast(den),
                  F.col("event_type") == F.col("d_type"))
            .select("event_type", "lag", "n_pairs",
                    F.expr("num * 1000000 div den").cast("bigint")
                    .alias("acf_e6"))
            .orderBy("event_type", "lag"))


ORACLE_ACF = f"""
WITH e AS (
  SELECT event_type, epoch_ns(ts) AS ts_ns, event_id,
         CAST(round(value * 10000) AS BIGINT) AS v
  FROM events
),
t AS (SELECT event_type, sum(v) // count(*) AS m FROM e GROUP BY 1),
s AS (SELECT e.event_type, v - m AS dev,
             row_number() OVER (PARTITION BY e.event_type
                                ORDER BY ts_ns, event_id) AS seq
      FROM e JOIN t USING (event_type)),
l AS (SELECT lag FROM (VALUES {", ".join(f"({k})" for k in _ACF_LAGS)})
      AS lv(lag)),
den AS (SELECT event_type, sum(dev * dev) AS den FROM s GROUP BY 1)
SELECT a.event_type, lag, count(*) AS n_pairs,
       CAST(sum(a.dev * b.dev) * 1000000 // max(den) AS BIGINT)
         AS acf_e6
FROM s a CROSS JOIN l
JOIN s b ON b.event_type = a.event_type AND b.seq = a.seq + lag
JOIN den ON den.event_type = a.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# grid_dbscan_core — grid-bucketed density core points (never all-pairs)
# ---------------------------------------------------------------------------

_DB_EPS_E6 = 20_000   # eps = 0.02 in embedding units, e6 lattice
_DB_MINPTS = 4        # neighbors within eps (self included) to be core


def q_grid_dbscan_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN core-point census over the first two embedding
    dimensions: a point is CORE if >= minPts points (itself included)
    lie within eps. Reported per label: point count and core count.

    The eps-neighborhood search is a GRID-BUCKETED equi-join, the
    scale-safe alternative to the quadratic distance self-join: cells
    of side eps index every point; each probe point fans out to its
    3x3 neighbor cells (a 9-row explode, constant), the join is a
    plain hash join on the cell key, and the exact squared-distance
    predicate filters after the match. Cost is sum over cells of
    9 * |cell|^2 — bounded by local density, never |corpus|^2.

    Determinism: coordinates quantize to the e6 integer lattice before
    any comparison (float32 -> double widening is exact and identical
    in both engines), distances compare as exact integers, and the
    truncating `div` grid (cell 0 spans (-eps, eps) — twice as wide,
    consistently in both engines) only AFFECTS candidate generation,
    never the exact distance test."""
    p = (_t(spark, sf_dir, "embeddings")
         .select("vec_id", "label",
                 F.round(F.element_at("embedding", 1).cast("double")
                         * 1000000).cast("bigint").alias("x"),
                 F.round(F.element_at("embedding", 2).cast("double")
                         * 1000000).cast("bigint").alias("y")))
    g = (p.withColumn("cx", F.expr(f"x div {_DB_EPS_E6}"))
         .withColumn("cy", F.expr(f"y div {_DB_EPS_E6}")))
    off = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    a = (g.select(F.col("vec_id").alias("a_id"),
                  F.col("label").alias("a_label"),
                  F.col("x").alias("ax"), F.col("y").alias("ay"),
                  "cx", "cy")
         .withColumn("dx", F.explode(off))
         .withColumn("dy", F.explode(off))
         .select("a_id", "a_label", "ax", "ay",
                 (F.col("cx") + F.col("dx")).alias("ncx"),
                 (F.col("cy") + F.col("dy")).alias("ncy")))
    b = g.select(F.col("cx").alias("bcx"), F.col("cy").alias("bcy"),
                 F.col("x").alias("bx"), F.col("y").alias("by"))
    dist2 = ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
             + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
    nb = (a.join(b, (F.col("ncx") == F.col("bcx"))
                 & (F.col("ncy") == F.col("bcy"))
                 & (dist2 <= F.lit(_DB_EPS_E6).cast("bigint")
                    * _DB_EPS_E6))
          .groupBy("a_id", "a_label")
          .agg(F.count(F.lit(1)).alias("n_nb")))
    return (nb.groupBy(F.col("a_label").alias("label"))
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.sum(F.when(F.col("n_nb") >= _DB_MINPTS, 1)
                       .otherwise(0)).alias("n_core"))
            .orderBy("label"))


ORACLE_DBSCAN = f"""
WITH p AS (
  SELECT vec_id, label,
         CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS x,
         CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT)
           AS y
  FROM embeddings
),
g AS (SELECT *, x // {_DB_EPS_E6} AS cx, y // {_DB_EPS_E6} AS cy FROM p),
nb AS (
  SELECT a.vec_id, a.label, count(*) AS n_nb
  FROM g a JOIN g b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       <= CAST({_DB_EPS_E6} AS BIGINT) * {_DB_EPS_E6}
  GROUP BY 1, 2
)
SELECT label, count(*) AS n_points,
       CAST(sum(CASE WHEN n_nb >= {_DB_MINPTS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_core
FROM nb GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# benford_report — first-significant-digit data-quality audit
# ---------------------------------------------------------------------------

# log10(1 + 1/d) on the e6 lattice — fixed constants, no runtime libm
_BENFORD_E6 = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
               6: 66947, 7: 57992, 8: 51153, 9: 45757}


def q_benford_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    fraud/data-quality screen: observed share of each leading digit vs
    the Benford expectation, with the signed deviation. (Uniformly
    generated synthetic prices do NOT follow Benford — the audit's
    point is to QUANTIFY that mismatch deterministically.)

    The leading digit comes from the cents integer's decimal string
    (no log10 at runtime — the Benford expectations are baked e6
    constants), shares are integer div on the e6 lattice.

    Scale shape: one map-side-combinable groupBy on the 9-value digit
    key, a 1-row total broadcast back, and a 9-row constant dim join —
    the corpus is read once."""
    o = (_t(spark, sf_dir, "orders")
         .select(F.round(F.col("o_totalprice") * 100).cast("bigint")
                 .alias("cents"))
         .filter(F.col("cents") > 0))
    d = (o.select(F.substring(F.col("cents").cast("string"), 1, 1)
                  .cast("bigint").alias("digit"))
         .groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs")))
    tot = d.agg(F.sum("n_obs").alias("n_total"))
    exp = spark.range(1).selectExpr(
        "stack(9, " + ", ".join(
            f"CAST({k} AS BIGINT), CAST({v} AS BIGINT)"
            for k, v in _BENFORD_E6.items())
        + ") AS (e_digit, benford_e6)")
    return (d.crossJoin(F.broadcast(tot))
            .join(F.broadcast(exp), F.col("digit") == F.col("e_digit"))
            .select("digit", "n_obs",
                    F.expr("CAST(CAST(n_obs AS DECIMAL(38,0)) * 1000000"
                           " div n_total AS BIGINT)")
                    .alias("share_e6"), "benford_e6",
                    F.expr("CAST(CAST(n_obs AS DECIMAL(38,0)) * 1000000"
                           " div n_total AS BIGINT) - benford_e6")
                    .alias("dev_e6"))
            .orderBy("digit"))


ORACLE_BENFORD = f"""
WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE round(o_totalprice * 100) > 0
),
d AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         count(*) AS n_obs
  FROM o GROUP BY 1
),
tot AS (SELECT sum(n_obs) AS n_total FROM d),
exp AS (SELECT * FROM (VALUES {", ".join(f"({k}, {v})"
                               for k, v in _BENFORD_E6.items())})
        AS t(e_digit, benford_e6))
SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
       CAST(n_obs * 1000000 // n_total AS BIGINT) AS share_e6,
       CAST(benford_e6 AS BIGINT) AS benford_e6,
       CAST(n_obs * 1000000 // n_total - benford_e6 AS BIGINT)
         AS dev_e6
FROM d CROSS JOIN tot JOIN exp ON digit = e_digit
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# ohlc_bars — time-bucket downsampling with first/last semantics
# ---------------------------------------------------------------------------

_OHLC_HOUR_NS = 3_600 * 1_000_000_000


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event type, hour) OHLC downsampling bars — the time-series
    resample every metrics store runs: open = first value, close =
    last value in (ts, event_id) arrival order, high/low = extremes,
    n = volume. First/last are deterministic MIN/MAX-OF-STRUCT picks
    on the unique (ts_ns, event_id) order — never a nondeterministic
    first()/last() aggregate, which under parallel partial aggregation
    returns whichever partition merges first.

    Scale shape: one map-side-combinable groupBy on the (type, hour)
    key — struct min/max combine associatively, so the corpus is read
    once and only |types x hours| rows shuffle."""
    e = (_t(spark, sf_dir, "events")
         .select("event_type", "ts_ns", "event_id",
                 F.round(F.col("value") * 10000).cast("bigint")
                 .alias("v_e4"))
         .withColumn("hour", F.expr(f"ts_ns div {_OHLC_HOUR_NS}")))
    return (e.groupBy("event_type", "hour")
            .agg(F.min(F.struct("ts_ns", "event_id", "v_e4")).alias("o"),
                 F.max(F.struct("ts_ns", "event_id", "v_e4")).alias("c"),
                 F.max("v_e4").alias("high_e4"),
                 F.min("v_e4").alias("low_e4"),
                 F.count(F.lit(1)).alias("n"))
            .select("event_type", "hour",
                    F.col("o.v_e4").alias("open_e4"),
                    "high_e4", "low_e4",
                    F.col("c.v_e4").alias("close_e4"), "n")
            .orderBy("event_type", "hour"))


ORACLE_OHLC = f"""
WITH e AS (
  SELECT event_type, epoch_ns(ts) AS ts_ns, event_id,
         CAST(round(value * 10000) AS BIGINT) AS v_e4
  FROM events
)
SELECT event_type, ts_ns // {_OHLC_HOUR_NS} AS hour,
       first(v_e4 ORDER BY ts_ns, event_id) AS open_e4,
       max(v_e4) AS high_e4, min(v_e4) AS low_e4,
       last(v_e4 ORDER BY ts_ns, event_id) AS close_e4,
       count(*) AS n
FROM e GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# t_closeness — EMD of per-class vs global sensitive distribution
# ---------------------------------------------------------------------------

_TC_BAND_DIV = 2000  # same sensitive banding as l_diversity (ext8)


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third privacy lens after k_anonymity
    and l_diversity: a class can be k-anonymous AND l-diverse yet
    still leak if its sensitive-value DISTRIBUTION differs sharply
    from the global one. Per QI class (mktsegment, coarse region —
    the l_diversity classes), the 1-D Earth Mover's Distance between
    the class's and the global account-balance-band distribution:
    EMD = sum_b |cum_class_share - cum_global_share| / (B - 1) on the
    e6 lattice.

    The cumulative walk runs on a DENSE class x band grid (classes
    cross-joined with the tiny ~6-row global band dim, zero-filled) so
    bands a class lacks still advance the global cumulative; the
    prefix windows partition by class over <=B rows each.

    Scale shape: corpus collapses to |classes x bands| in ONE
    map-side-combinable aggregate; everything after runs on that tiny
    grid (broadcast joins, per-class windows)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        (F.col("c_nationkey") % 10).alias("region_ish"),
        F.floor(F.col("c_acctbal") / _TC_BAND_DIV).cast("bigint")
        .alias("sv"))
    cell = (c.groupBy("c_mktsegment", "region_ish", "sv")
            .agg(F.count(F.lit(1)).alias("cnt")))
    gband = (cell.groupBy("sv").agg(F.sum("cnt").alias("gcnt")))
    gtot = gband.agg(F.sum("gcnt").alias("gn"))
    cls = (cell.groupBy("c_mktsegment", "region_ish")
           .agg(F.sum("cnt").alias("cn")))
    dense = (cls.crossJoin(F.broadcast(gband))
             .join(cell, ["c_mktsegment", "region_ish", "sv"], "left")
             .crossJoin(F.broadcast(gtot))
             .select("c_mktsegment", "region_ish", "sv", "cn",
                     F.coalesce("cnt", F.lit(0)).alias("cnt"),
                     "gcnt", "gn"))
    w = (Window.partitionBy("c_mktsegment", "region_ish").orderBy("sv")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = dense.select(
        "c_mktsegment", "region_ish", "cn",
        (F.sum(F.expr("CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000"
                      " div cn AS BIGINT)")).over(w)
         - F.sum(F.expr("CAST(CAST(gcnt AS DECIMAL(38,0)) * 1000000"
                        " div gn AS BIGINT)")).over(w)).alias("d"))
    return (cum.groupBy("c_mktsegment", "region_ish")
            .agg(F.max("cn").alias("n_rows"),
                 F.count(F.lit(1)).alias("n_bands"),
                 F.sum(F.abs(F.col("d"))).alias("sum_abs"))
            .select("c_mktsegment", "region_ish", "n_rows",
                    F.expr("sum_abs div (n_bands - 1)").cast("bigint")
                    .alias("t_e6"))
            .orderBy("c_mktsegment", "region_ish"))


ORACLE_T_CLOSENESS = f"""
WITH c AS (
  SELECT c_mktsegment, c_nationkey % 10 AS region_ish,
         CAST(floor(c_acctbal / {_TC_BAND_DIV}) AS BIGINT) AS sv
  FROM customer
),
cell AS (SELECT c_mktsegment, region_ish, sv, count(*) AS cnt
         FROM c GROUP BY 1, 2, 3),
gband AS (SELECT sv, sum(cnt) AS gcnt FROM cell GROUP BY 1),
gtot AS (SELECT sum(gcnt) AS gn FROM gband),
cls AS (SELECT c_mktsegment, region_ish, sum(cnt) AS cn
        FROM cell GROUP BY 1, 2),
dense AS (
  SELECT cls.c_mktsegment, cls.region_ish, gband.sv, cn,
         coalesce(cnt, 0) AS cnt, gcnt, gn
  FROM cls CROSS JOIN gband
  LEFT JOIN cell ON cell.c_mktsegment = cls.c_mktsegment
                AND cell.region_ish = cls.region_ish
                AND cell.sv = gband.sv
  CROSS JOIN gtot
),
cum AS (
  SELECT c_mktsegment, region_ish, cn,
         sum(cnt * 1000000 // cn) OVER w
           - sum(gcnt * 1000000 // gn) OVER w AS d
  FROM dense
  WINDOW w AS (PARTITION BY c_mktsegment, region_ish ORDER BY sv
               ROWS UNBOUNDED PRECEDING)
)
SELECT c_mktsegment, region_ish, CAST(max(cn) AS BIGINT) AS n_rows,
       CAST(sum(abs(d)) // (count(*) - 1) AS BIGINT) AS t_e6
FROM cum GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# association_rules — market-basket support / confidence / lift
# ---------------------------------------------------------------------------

_AR_MIN_CNT = 2


def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: for part
    pairs co-occurring in >= 2 orders, support, confidence(a->b) and
    lift on the e6 integer lattice — the FP-growth-lite first pass
    every recommender ETL starts with.

    Pair generation is the PER-BASKET self-join, NOT an all-pairs
    product: baskets join on orderkey (one shuffle), and the
    a.part < b.part orientation halves the in-basket product. With
    basket sizes bounded (TPC-H ~7 lines), pair volume is
    O(baskets * size^2) — linear in the corpus. Item counts join back
    by partkey as hash joins; the 1-row basket total broadcasts.

    Determinism: counts are exact; support_e6 = cnt * 1e6 div n,
    confidence_e6 = cnt * 1e6 div cnt_a, lift_e6 = cnt * n * 1e6 div
    (cnt_a * cnt_b), all truncating div both engines share.

    The basket edge set is checkpointed ONCE (DISK_ONLY, |E|-scale
    idiom): the order total, item counts, and both pair-join sides
    each re-ran the lineitem-distinct subtree in the first cut — 5
    fact scans and 4 distinct shuffles per run."""
    from pyspark import StorageLevel
    b = (_t(spark, sf_dir, "lineitem")
         .select("l_orderkey", "l_partkey").distinct()
         .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY))
    n = b.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = (b.groupBy(F.col("l_partkey").alias("ipart"))
            .agg(F.count(F.lit(1)).alias("icnt")))
    a_side = b.select(F.col("l_orderkey").alias("ok"),
                      F.col("l_partkey").alias("pa"))
    c_side = b.select(F.col("l_orderkey").alias("ok2"),
                      F.col("l_partkey").alias("pb"))
    pair = (a_side.join(c_side, (F.col("ok") == F.col("ok2"))
                        & (F.col("pa") < F.col("pb")))
            .groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= _AR_MIN_CNT))
    return (pair.join(item.withColumnRenamed("ipart", "pa")
                      .withColumnRenamed("icnt", "cnt_a"), "pa")
            .join(item.withColumnRenamed("ipart", "pb")
                  .withColumnRenamed("icnt", "cnt_b"), "pb")
            .crossJoin(F.broadcast(n))
            .select("pa", "pb", "cnt", "cnt_a", "cnt_b",
                    F.expr("CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000"
                           " div n_orders AS BIGINT)")
                    .alias("support_e6"),
                    F.expr("CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000"
                           " div cnt_a AS BIGINT)")
                    .alias("confidence_e6"),
                    F.expr("CAST(cnt AS DECIMAL(38,0)) * n_orders"
                           " * 1000000 div (CAST(cnt_a AS DECIMAL(38,0))"
                           " * cnt_b)").cast("bigint").alias("lift_e6"))
            .orderBy(F.col("cnt").desc(), "pa", "pb"))


ORACLE_ASSOC_RULES = f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
item AS (SELECT l_partkey, count(*) AS icnt FROM b GROUP BY 1),
pair AS (
  SELECT a.l_partkey AS pa, c.l_partkey AS pb, count(*) AS cnt
  FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                   AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {_AR_MIN_CNT}
)
SELECT pa, pb, cnt,
       ia.icnt AS cnt_a, ib.icnt AS cnt_b,
       CAST(cnt * 1000000 // n_orders AS BIGINT) AS support_e6,
       CAST(cnt * 1000000 // ia.icnt AS BIGINT) AS confidence_e6,
       CAST(cnt * n_orders * 1000000 // (ia.icnt * ib.icnt) AS BIGINT)
         AS lift_e6
FROM pair
JOIN item ia ON ia.l_partkey = pa
JOIN item ib ON ib.l_partkey = pb
CROSS JOIN n
ORDER BY cnt DESC, pa, pb
"""


# ---------------------------------------------------------------------------
# hierarchy_rollup — recursive-closure subtree aggregation, closed form
# ---------------------------------------------------------------------------

_HR_MAX_DEPTH = 19  # bigint keys have <= 19 decimal digits -> chain <= 19


def q_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtree rollup — the WITH RECURSIVE workload class
    (org charts, category trees, bill-of-materials) on the synthetic
    decimal tree parent(k) = k div 10 rooted at 0: per node, the
    subtree size and subtree balance (descendants including self).

    Spark has no recursive CTE; the scale answer is the CLOSED-FORM
    ancestor closure: a bigint key has <= 19 decimal digits, so its
    ancestor chain is the fixed 19-term div-10 power sequence — a
    constant-width array_distinct + explode (fan-out <= 19, zero
    iterations, zero self-joins), then one groupBy on the ancestor.
    The DuckDB oracle runs the textbook WITH RECURSIVE closure, so the
    hash match PROVES the closed form equals the recursive semantics.

    Scale shape: map-side explode (bounded x19), one combinable
    aggregate — no iteration state, no driver loop; contrast with
    graph_bfs_depth, which handles ARBITRARY graphs and pays rounds."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint")
        .alias("bal_cents"))
    chain = F.array_distinct(F.array(
        *[F.expr(f"c_custkey div {10 ** i}")
          for i in range(_HR_MAX_DEPTH)]))
    return (c.select("bal_cents", F.explode(chain).alias("anc"))
            .groupBy(F.col("anc").alias("node"))
            .agg(F.count(F.lit(1)).alias("subtree_n"),
                 F.sum("bal_cents").alias("subtree_bal_cents"))
            .orderBy("node"))


ORACLE_HIERARCHY = """
WITH RECURSIVE closure(node, anc) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION ALL
  SELECT node, anc // 10 FROM closure WHERE anc > 0
)
SELECT anc AS node, count(*) AS subtree_n,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS subtree_bal_cents
FROM closure JOIN customer ON node = c_custkey
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# decayed_popularity — integer half-life decay top-k
# ---------------------------------------------------------------------------

_DP_REF_DATE = "2002-01-01"   # just past the generator's max orderdate
_DP_HALFLIFE_DAYS = 30
_DP_TOPK = 20


def q_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed part popularity — the trending-items ranking: each
    order line contributes weight 2^(-age/halflife), halving every 30
    days, and the top 20 parts by decayed score win.

    No float exp/pow: the half-life decay is an INTEGER RIGHT SHIFT on
    the e6 lattice — w_e6 = 1e6 div (1 << min(age div 30, 30)) — which
    both engines compute bit-identically; periods beyond ~20 underflow
    to 0 exactly (a >600-day-old order contributes nothing, by
    design). The shift clamp at 30 prevents 1<<p overflow while
    changing nothing (weight already 0).

    Scale shape: orders x lineitem is the one big orderkey shuffle
    (both fact-sized — no broadcast pretense); the per-part rollup is
    map-side combinable; the final top-k is TakeOrderedAndProject
    (per-partition heap + K-row driver merge, never a global sort)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(f"least(datediff('{_DP_REF_DATE}', o_orderdate)"
               f" div {_DP_HALFLIFE_DAYS}, 30)").alias("periods"))
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .select("l_partkey",
                    F.expr("1000000 div shiftleft(1L, CAST(periods"
                           " AS INT))").alias("w_e6"))
            .groupBy("l_partkey")
            .agg(F.sum("w_e6").alias("pop_e6"),
                 F.count(F.lit(1)).alias("n_lines"))
            .filter(F.col("pop_e6") > 0)
            .orderBy(F.col("pop_e6").desc(), "l_partkey")
            .limit(_DP_TOPK))


ORACLE_DECAYED_POP = f"""
WITH o AS (
  SELECT o_orderkey,
         least(date_diff('day', o_orderdate,
                         TIMESTAMP '{_DP_REF_DATE} 00:00:00')
               // {_DP_HALFLIFE_DAYS}, 30) AS periods
  FROM orders
),
w AS (
  SELECT l_partkey, 1000000 // (1 << periods) AS w_e6
  FROM lineitem JOIN o ON l_orderkey = o_orderkey
)
SELECT l_partkey, CAST(sum(w_e6) AS BIGINT) AS pop_e6,
       count(*) AS n_lines
FROM w GROUP BY 1 HAVING sum(w_e6) > 0
ORDER BY pop_e6 DESC, l_partkey LIMIT {_DP_TOPK}
"""


# ---------------------------------------------------------------------------
# attribution_report — last-touch conversion attribution
# ---------------------------------------------------------------------------

_ATTR_WINDOW_NS = 7 * 86_400 * 1_000_000_000  # 7-day lookback


def q_attribution_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution — the marketing-analytics
    join: each purchase credits the LAST non-purchase touch by the
    same user within a 7-day lookback; purchases with no qualifying
    touch land in the 'none' bucket. Per channel: conversions and
    attributed value.

    This is the union-and-carry as-of shape (operators/asof.py,
    pit_join), not a range self-join: touches and purchases interleave
    in ONE per-user ordered pass, carrying the last touch forward with
    last_value(... IGNORE NULLS) over the deterministic total order
    (ts_ns, kind, event_id) — kind orders a same-instant touch BEFORE
    the purchase it should credit, and ties never depend on partition
    layout. The 7-day age test happens at the purchase row.

    Scale shape: one shuffle to user partitions (users scale out, no
    global window), then a map-side-combinable channel rollup."""
    e = (_t(spark, sf_dir, "events")
         .select("user_id", "ts_ns", "event_id", "event_type",
                 F.round(F.col("value") * 10000).cast("bigint")
                 .alias("v_e4"),
                 F.when(F.col("event_type") == "purchase", 1)
                 .otherwise(0).alias("kind")))
    w = (Window.partitionBy("user_id")
         .orderBy("ts_ns", "kind", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    m = (e.withColumn(
            "t_ts", F.last(F.when(F.col("kind") == 0, F.col("ts_ns")),
                           ignorenulls=True).over(w))
         .withColumn(
            "t_type", F.last(F.when(F.col("kind") == 0,
                                    F.col("event_type")),
                             ignorenulls=True).over(w)))
    channel = F.when(
        F.col("t_ts").isNull()
        | (F.col("ts_ns") - F.col("t_ts") > _ATTR_WINDOW_NS),
        F.lit("none")).otherwise(F.col("t_type"))
    return (m.filter(F.col("kind") == 1)
            .groupBy(channel.alias("channel"))
            .agg(F.count(F.lit(1)).alias("n_purchases"),
                 F.sum("v_e4").alias("value_e4"))
            .orderBy("channel"))


ORACLE_ATTRIBUTION = f"""
WITH e AS (
  SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, event_type,
         CAST(round(value * 10000) AS BIGINT) AS v_e4,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS kind
  FROM events
),
m AS (
  SELECT user_id, ts_ns, event_id, event_type, v_e4, kind,
         last_value(CASE WHEN kind = 0 THEN ts_ns END IGNORE NULLS)
           OVER w AS t_ts,
         last_value(CASE WHEN kind = 0 THEN event_type END IGNORE NULLS)
           OVER w AS t_type
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, kind, event_id
               ROWS UNBOUNDED PRECEDING)
)
SELECT CASE WHEN t_ts IS NULL OR ts_ns - t_ts > {_ATTR_WINDOW_NS}
            THEN 'none' ELSE t_type END AS channel,
       count(*) AS n_purchases, CAST(sum(v_e4) AS BIGINT) AS value_e4
FROM m WHERE kind = 1
GROUP BY 1 ORDER BY 1
"""


QUERIES_EXT10.update({
    "association_rules": q_association_rules,
    "hierarchy_rollup": q_hierarchy_rollup,
    "decayed_popularity": q_decayed_popularity,
    "attribution_report": q_attribution_report,
    "ab_test_welch": q_ab_test_welch,
    "acf_report": q_acf_report,
    "ohlc_bars": q_ohlc_bars,
    "t_closeness": q_t_closeness,
    "grid_dbscan_core": q_grid_dbscan_core,
    "benford_report": q_benford_report,
    "chi_square_report": q_chi_square_report,
    "gini_coefficient": q_gini_coefficient,
    "cusum_changepoint": q_cusum_changepoint,
})
ORACLE_EXT10.update({
    "association_rules": ORACLE_ASSOC_RULES,
    "hierarchy_rollup": ORACLE_HIERARCHY,
    "decayed_popularity": ORACLE_DECAYED_POP,
    "attribution_report": ORACLE_ATTRIBUTION,
    "ab_test_welch": ORACLE_AB_WELCH,
    "acf_report": ORACLE_ACF,
    "ohlc_bars": ORACLE_OHLC,
    "t_closeness": ORACLE_T_CLOSENESS,
    "grid_dbscan_core": ORACLE_DBSCAN,
    "benford_report": ORACLE_BENFORD,
    "chi_square_report": ORACLE_CHI_SQUARE,
    "gini_coefficient": ORACLE_GINI,
    "cusum_changepoint": ORACLE_CUSUM,
})
