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


QUERIES_EXT10.update({
    "ab_test_welch": q_ab_test_welch,
    "chi_square_report": q_chi_square_report,
    "gini_coefficient": q_gini_coefficient,
    "cusum_changepoint": q_cusum_changepoint,
})
ORACLE_EXT10.update({
    "ab_test_welch": ORACLE_AB_WELCH,
    "chi_square_report": ORACLE_CHI_SQUARE,
    "gini_coefficient": ORACLE_GINI,
    "cusum_changepoint": ORACLE_CUSUM,
})
