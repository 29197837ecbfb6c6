"""Catalog extension 9 (round 8, third wave). Completes the TPC-H
suite: with Q1/3/4/5/6/7/8/10/13/14/15/17/18/19/22 already in the
catalog, this file adds the remaining seven — Q2/Q9/Q11/Q12/Q16/Q20/Q21
— adapted where this schema lacks the classic columns (no partsupp
table, no l_commitdate/l_receiptdate/l_shipmode/p_container/comments;
the adaptations keep each query's *defining plan shape*: Q2's
correlated min, Q9's multi-dim profit rollup, Q11's scalar-subquery
HAVING, Q12's CASE-pivot, Q16's distinct-count + NOT IN, Q20's nested
aggregate semi-join, Q21's EXISTS/NOT-EXISTS double correlation).

Adaptation map (documented per query):
  Q2   partsupp min-supplycost  -> lineitem min unit price per part
  Q9   ps_supplycost            -> 60% of p_retailprice per unit
  Q11  partsupp stock value     -> per-part revenue, self-scaling
                                   threshold (1.25x the mean share)
  Q12  shipmode + receipt lag   -> ship-delay bands x order priority
  Q16  partsupp supplier counts -> lineitem-observed suppliers
  Q20  availqty > 50% shipped   -> supplier ships >50% of a part's qty
  Q21  receipt > commit date    -> ship > order date + 60 days

Cross-engine determinism follows the SURVEY 4.4 discipline: exact
cents/e4 integer lattices, SQL `div` (never float division), decimal
(38,0) accumulators for 100 TB-safe sums, day-granularity date math.

Reference parity: the reference (create_graph.py, queries/) has no
warehouse-analytics surface; the TPC-H suite is the build brief's
query-completeness yardstick, expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t
from .queries_ext8 import _rev_e4, _REV_E4_SQL

QUERIES_EXT9: dict = {}
ORACLE_EXT9: dict = {}


# ---------------------------------------------------------------------------
# tpch_q12 — ship-delay bands x order priority (CASE-pivot)
# ---------------------------------------------------------------------------

_Q12_YEAR = 1997
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-priority pivot (adapted: no l_shipmode /
    l_commitdate / l_receiptdate here, so the mode dimension becomes
    the ship-delay band — days between order and ship date, 30-day
    buckets clamped to [-2, 2]; this generator ships some lines before
    the order date, hence the negative bands): per band, how many
    high-priority vs low-priority lineitems shipped in one year.

    Scale shape: one shuffle (lineitem x orders on orderkey, both
    year-pruned on the lineitem side), then a 5-row CASE-pivot rollup
    with map-side partials. Day arithmetic only — no timestamp
    subtraction floats."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.year("l_shipdate") == _Q12_YEAR)
          .select("l_orderkey", "l_shipdate"))
    band = F.greatest(
        F.least(F.expr("datediff(l_shipdate, o_orderdate) div 30"),
                F.lit(2)), F.lit(-2))
    is_high = F.col("o_orderpriority").isin(*_Q12_HIGH)
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(band.alias("delay_band"))
            .agg(F.sum(F.when(is_high, 1).otherwise(0))
                 .alias("high_line_count"),
                 F.sum(F.when(is_high, 0).otherwise(1))
                 .alias("low_line_count"))
            .orderBy("delay_band"))


ORACLE_TPCH_Q12 = f"""
SELECT greatest(least(date_diff('day', o_orderdate, l_shipdate) // 30,
                      2), -2) AS delay_band,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE year(l_shipdate) = {_Q12_YEAR}
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# tpch_q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------

_Q9_TOKEN = "red"


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit (adapted: no partsupp, so supply
    cost is modeled as 60% of p_retailprice per unit — the fixed-margin
    surrogate): for parts whose name contains a token, profit =
    revenue - cost, rolled up by supplier nation and order year.

    Exact-integer lattice: profit_e5 = rev_e4 * 10
    - 6 * retail_cents * qty_e2 (0.6 * X_dollars in e5 units IS
    6 * X_e4 — no float division anywhere). Decimal(38,0) accumulator
    so the sum cannot overflow at 100 TB row counts.

    Scale shape: the name-filtered part dim and the 25-row nation dim
    broadcast onto lineitem; supplier (small) broadcasts too; the only
    big shuffle is lineitem x orders on orderkey, then a
    nation x year rollup with map-side partials."""
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_name").contains(_Q9_TOKEN))
         .select("p_partkey",
                 F.round(F.col("p_retailprice") * 100).cast("bigint")
                 .alias("retail_cents")))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("bigint").alias("o_year"))
    li = _t(spark, sf_dir, "lineitem")
    qty_e2 = F.round(F.col("l_quantity") * 100).cast("bigint")
    profit_e5 = (_rev_e4() * 10
                 - F.lit(6) * F.col("retail_cents").cast("decimal(38,0)")
                 * qty_e2)
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("n_name", "o_year")
            .agg(F.sum(profit_e5).cast("bigint").alias("profit_e5"))
            .orderBy("n_name", "o_year"))


ORACLE_TPCH_Q9 = f"""
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({_REV_E4_SQL} * 10
                - 6 * CAST(round(p_retailprice * 100) AS BIGINT)
                    * CAST(round(l_quantity * 100) AS BIGINT))
            AS BIGINT) AS profit_e5
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{_Q9_TOKEN}%'
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# tpch_q11 — important parts (scalar-subquery HAVING)
# ---------------------------------------------------------------------------


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock (adapted: no partsupp, so a part's
    "value" is its total lineitem revenue; the original's SF-scaled
    0.0001 fraction becomes a SELF-SCALING threshold — keep parts
    whose value exceeds 1.25x the mean per-part share, i.e.
    value * n_parts * 4 > total * 5 — so the query returns a stable
    slice at every SF instead of emptying out as the part count
    grows).

    Scale shape: one groupBy on partkey (map-side partials), a 1-row
    total/count aggregate broadcast back (the scalar subquery), and an
    integer cross-multiplied HAVING — no float fraction, no second
    shuffle. Decimal(38,0) revenue accumulator."""
    li = _t(spark, sf_dir, "lineitem")
    v = (li.groupBy("l_partkey")
         .agg(F.sum(_rev_e4()).cast("decimal(38,0)").alias("value_e4")))
    tot = v.agg(F.sum("value_e4").cast("decimal(38,0)").alias("total_e4"),
                F.count(F.lit(1)).alias("n_parts"))
    return (v.crossJoin(F.broadcast(tot))
            .filter(F.col("value_e4") * F.col("n_parts") * 4
                    > F.col("total_e4") * 5)
            .select(F.col("l_partkey").alias("p_partkey"),
                    F.col("value_e4").cast("bigint").alias("value_e4"))
            .orderBy(F.col("value_e4").desc(), "p_partkey"))


ORACLE_TPCH_Q11 = f"""
WITH v AS (
  SELECT l_partkey, sum({_REV_E4_SQL}) AS value_e4
  FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(value_e4) AS total_e4, count(*) AS n_parts FROM v)
SELECT l_partkey AS p_partkey, CAST(value_e4 AS BIGINT) AS value_e4
FROM v CROSS JOIN tot
WHERE value_e4 * n_parts * 4 > total_e4 * 5
ORDER BY value_e4 DESC, p_partkey
"""


# ---------------------------------------------------------------------------
# tpch_q21 — suppliers who kept orders waiting (EXISTS / NOT EXISTS)
# ---------------------------------------------------------------------------

_Q21_REGION = "EUROPE"
_Q21_LATE_DAYS = 60


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting (adapted: "late" =
    shipped more than 60 days after the order date — no commit/receipt
    dates here; supplier scope widened from one nation to one region
    so the 100-supplier generator keeps ~20 in scope): for finished
    (status F) multi-supplier orders, count per supplier the orders
    where THAT supplier was late and NO OTHER supplier was.

    The EXISTS / NOT-EXISTS pair decorrelates into one grouped pass:
    per (order, supplier) a late flag, per order the supplier count
    and late-supplier count; "exists another supplier" is n_supp > 1,
    "not exists another late supplier" is n_late = 1 given this one
    was late. Both engines compute the same aggregates — the oracle
    keeps the textbook correlated form to prove the rewrite.

    Scale shape: one shuffle (lineitem x status-pruned orders on
    orderkey), the per-order rollup stays on the same orderkey
    partitioning (no second exchange), the region-filtered supplier
    dim broadcasts, and the final count groups on ~|suppliers| rows."""
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate")
        + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAYS"), 1).otherwise(0)
    per_os = (li.join(o, li.l_orderkey == o.o_orderkey)
              .groupBy("l_orderkey", "l_suppkey")
              .agg(F.max(late).alias("late")))
    per_o = (per_os.groupBy("l_orderkey")
             .agg(F.count(F.lit(1)).alias("n_supp"),
                  F.sum("late").alias("n_late")))
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q21_REGION)
    n = _t(spark, sf_dir, "nation")
    s = (_t(spark, sf_dir, "supplier")
         .join(F.broadcast(n.join(F.broadcast(r),
                                  n.n_regionkey == r.r_regionkey)),
               F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "s_name"))
    return (per_os.filter(F.col("late") == 1)
            .join(per_o, "l_orderkey")
            .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name"))


ORACLE_TPCH_Q21 = f"""
WITH l1 AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate
                       + INTERVAL {_Q21_LATE_DAYS} DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
)
SELECT s_name, count(*) AS numwait
FROM l1
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{_Q21_REGION}' AND late = 1
  AND EXISTS (SELECT 1 FROM l1 o
              WHERE o.l_orderkey = l1.l_orderkey
                AND o.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l1 o
                  WHERE o.l_orderkey = l1.l_orderkey
                    AND o.l_suppkey <> l1.l_suppkey AND o.late = 1)
GROUP BY 1 ORDER BY numwait DESC, s_name
"""


# ---------------------------------------------------------------------------
# tpch_q2 — min-cost supplier per part (correlated min)
# ---------------------------------------------------------------------------

_Q2_REGION = "EUROPE"
_Q2_MAX_SIZE = 10
_Q2_TYPE = "LARGE"


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier (adapted: no partsupp, so the
    "catalog price" a supplier offers for a part is the observed
    lineitem unit price — extendedprice/quantity — and the part filter
    becomes size <= 10 of one type): for each qualifying part, the
    region's suppliers achieving the MINIMUM unit price.

    The correlated scalar subquery (min over the same region-filtered
    offers, per part) decorrelates into a grouped min joined back on
    (part, unit price) — ties keep every minimal supplier, exactly
    like the original. Unit price on an exact integer lattice:
    unit_e6 = price_cents * 1_000_000 div qty_e2 (SQL integer div —
    both engines floor identically; never float division).

    Scale shape: region chain broadcasts onto lineitem; the offers
    frame shuffles once on partkey for the min and reuses that
    partitioning for the join-back; the part dim broadcasts at the
    end so pruning happens before the distinct."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q2_REGION)
    n = _t(spark, sf_dir, "nation")
    s = (_t(spark, sf_dir, "supplier")
         .join(F.broadcast(n.join(F.broadcast(r),
                                  n.n_regionkey == r.r_regionkey)),
               F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "s_name", "n_name"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT) * 1000000"
               " div CAST(round(l_quantity * 100) AS BIGINT)")
        .alias("unit_e6"))
    elig = li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    pmin = (elig.groupBy(F.col("l_partkey").alias("pm_partkey"))
            .agg(F.min("unit_e6").alias("min_unit_e6")))
    p = (_t(spark, sf_dir, "part")
         .filter((F.col("p_size") <= _Q2_MAX_SIZE)
                 & (F.col("p_type") == _Q2_TYPE))
         .select("p_partkey", "p_brand"))
    return (elig.join(pmin, (F.col("l_partkey") == F.col("pm_partkey"))
                      & (F.col("unit_e6") == F.col("min_unit_e6")))
            .join(F.broadcast(p), elig.l_partkey == p.p_partkey)
            .select("p_partkey", "p_brand", "s_name", "n_name",
                    "min_unit_e6")
            .distinct()
            .orderBy("p_partkey", "s_name"))


ORACLE_TPCH_Q2 = f"""
WITH elig AS (
  SELECT l_partkey, l_suppkey, s_name, n_name,
         CAST(round(l_extendedprice * 100) AS BIGINT) * 1000000
           // CAST(round(l_quantity * 100) AS BIGINT) AS unit_e6
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = '{_Q2_REGION}'
),
pmin AS (SELECT l_partkey, min(unit_e6) AS min_unit_e6
         FROM elig GROUP BY 1)
SELECT DISTINCT p_partkey, p_brand, s_name, n_name, min_unit_e6
FROM elig e
JOIN pmin m ON e.l_partkey = m.l_partkey AND e.unit_e6 = m.min_unit_e6
JOIN part   ON e.l_partkey = p_partkey
WHERE p_size <= {_Q2_MAX_SIZE} AND p_type = '{_Q2_TYPE}'
ORDER BY p_partkey, s_name
"""


# ---------------------------------------------------------------------------
# tpch_q16 — supplier counts per part attribute (distinct + NOT IN)
# ---------------------------------------------------------------------------

_Q16_EXCL_BRAND = "Brand#5"
_Q16_EXCL_TYPE = "PROMO"
_Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)
_Q16_COMPLAINT_PAT = "%9"         # s_name LIKE -> "customer complaints"


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship (adapted: the
    part-supplier relation is the one OBSERVED in lineitem — no
    partsupp — and the comment-matched complaint suppliers become a
    name-pattern slice): distinct suppliers able to supply each
    (brand, type, size) combination, excluding one brand, one type,
    a size whitelist, and complaint suppliers via NOT IN.

    Scale shape: the filtered part dim broadcasts onto lineitem (the
    attribute filter prunes before the big scan's shuffle); the
    complaint list is a LEFT ANTI broadcast hash join (the NOT IN,
    null-safe by construction since keys are non-null); the
    count(DISTINCT) shuffles once on the 3-attribute group key with
    partial distinct upstream."""
    p = (_t(spark, sf_dir, "part")
         .filter((F.col("p_brand") != _Q16_EXCL_BRAND)
                 & (F.col("p_type") != _Q16_EXCL_TYPE)
                 & F.col("p_size").isin(*_Q16_SIZES))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    compl = (_t(spark, sf_dir, "supplier")
             .filter(F.col("s_name").like(_Q16_COMPLAINT_PAT))
             .select("s_suppkey"))
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(compl),
                  li.l_suppkey == compl.s_suppkey, "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(),
                     "p_brand", "p_type", "p_size"))


ORACLE_TPCH_Q16 = f"""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{_Q16_EXCL_BRAND}'
  AND p_type <> '{_Q16_EXCL_TYPE}'
  AND p_size IN {_Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_name LIKE '{_Q16_COMPLAINT_PAT}')
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# tpch_q20 — dominant suppliers of a part family (nested aggregate)
# ---------------------------------------------------------------------------

_Q20_TOKEN = "blue"
_Q20_YEAR = 1997
_Q20_REGION = "ASIA"


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion (adapted: no partsupp
    availqty, so "holds excess stock of a part" becomes "shipped MORE
    THAN HALF of that part's total quantity this year" — the same
    shape: a per-(supplier, part) aggregate compared against 50% of a
    per-part aggregate, then a semi-join onto the supplier dim): for
    one region's suppliers and one part-name family, count each
    supplier's dominant parts.

    Scale shape: the name-filtered part dim broadcasts into the
    year-pruned lineitem scan; the (supp, part) rollup shuffles once
    on (suppkey, partkey); the per-part total derives from THAT rollup
    (second agg on partkey — strictly smaller input, no rescan); the
    dominance test is an integer cross-multiply (qty * 2 > total, e2
    lattice); the region supplier dim broadcasts at the end."""
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_name").contains(_Q20_TOKEN))
         .select("p_partkey"))
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.year("l_shipdate") == _Q20_YEAR)
          .select("l_suppkey", "l_partkey",
                  F.round(F.col("l_quantity") * 100).cast("bigint")
                  .alias("qty_e2")))
    sp = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
          .groupBy("l_suppkey", "l_partkey")
          .agg(F.sum("qty_e2").alias("qty_e2")))
    pt = sp.groupBy("l_partkey").agg(F.sum("qty_e2").alias("tot_e2"))
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q20_REGION)
    n = _t(spark, sf_dir, "nation")
    s = (_t(spark, sf_dir, "supplier")
         .join(F.broadcast(n.join(F.broadcast(r),
                                  n.n_regionkey == r.r_regionkey)),
               F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "s_name"))
    return (sp.join(pt, "l_partkey")
            .filter(F.col("qty_e2") * 2 > F.col("tot_e2"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("n_dominant"))
            .orderBy("s_name"))


ORACLE_TPCH_Q20 = f"""
WITH sp AS (
  SELECT l_suppkey, l_partkey,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_e2
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%{_Q20_TOKEN}%' AND year(l_shipdate) = {_Q20_YEAR}
  GROUP BY 1, 2
),
pt AS (SELECT l_partkey, sum(qty_e2) AS tot_e2 FROM sp GROUP BY 1)
SELECT s_name, count(*) AS n_dominant
FROM sp
JOIN pt USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{_Q20_REGION}' AND qty_e2 * 2 > tot_e2
GROUP BY 1 ORDER BY 1
"""


QUERIES_EXT9.update({
    "tpch_q2": q_tpch_q2,
    "tpch_q9": q_tpch_q9,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q16": q_tpch_q16,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
})
ORACLE_EXT9.update({
    "tpch_q2": ORACLE_TPCH_Q2,
    "tpch_q9": ORACLE_TPCH_Q9,
    "tpch_q11": ORACLE_TPCH_Q11,
    "tpch_q12": ORACLE_TPCH_Q12,
    "tpch_q16": ORACLE_TPCH_Q16,
    "tpch_q20": ORACLE_TPCH_Q20,
    "tpch_q21": ORACLE_TPCH_Q21,
})
