"""Catalog extension 40 (round 9, second session, wave 15). Effect
sizes — the numbers that belong NEXT to every test statistic the
catalog already computes:

  cohens_d_report    Cohen's d (pooled-SD standardized mean
                     difference) between discounted and undiscounted
                     lineitems — ab_test_welch says WHETHER the means
                     differ; d says by HOW MUCH in units a reader can
                     calibrate on
  odds_ratio_report  exact odds ratio for the 2x2 (discounted x
                     big-quantity) table — the effect-size companion
                     to chi_square_report / cramers_v_report

Reference parity: none in the reference; stats extension family.

Cross-engine determinism (SURVEY 4.4): exact DECIMAL moments; d is
ONE double closed form in the single output row (corr_report rule);
the odds ratio is a cross-multiplied integer lattice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t

QUERIES_EXT40: dict = {}
ORACLE_EXT40: dict = {}

_CD_TREAT_DISC = 0.05


def q_cohens_d_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d for quantity between discounted (>= {_CD_TREAT_DISC})
    and undiscounted lineitems: d = (mean1 - mean0) / s_pooled with
    s_pooled^2 = ((n1-1)s1^2 + (n0-1)s0^2) / (n1+n0-2). Group moments
    (n, sum, sumsq) accumulate in DECIMAL(38,0) — exact under any
    partial-aggregation order — and d is ONE double closed form in
    the single output row, floored to e6. |d| ~ 0.2/0.5/0.8 reads
    small/medium/large — the report a test statistic can't give.

    Scale shape: ONE map-side-combinable conditional aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    m = l.agg(*[
        agg for grp, cond in (
            ("1", f"l_discount >= {_CD_TREAT_DISC}"),
            ("0", f"l_discount < {_CD_TREAT_DISC}"))
        for agg in (
            F.sum(F.expr(f"CASE WHEN {cond} THEN 1 ELSE 0 END"))
            .cast("decimal(38,0)").alias(f"n{grp}"),
            F.sum(F.expr(f"CASE WHEN {cond} THEN"
                         " CAST(round(l_quantity) AS DECIMAL(38,0))"
                         " ELSE 0 END")).alias(f"s{grp}"),
            F.sum(F.expr(f"CASE WHEN {cond} THEN"
                         " CAST(round(l_quantity) AS DECIMAL(38,0))"
                         " * round(l_quantity) ELSE 0 END"))
            .alias(f"q{grp}"))])
    n1, s1, q1 = (F.col(c).cast("double") for c in ("n1", "s1", "q1"))
    n0, s0, q0 = (F.col(c).cast("double") for c in ("n0", "s0", "q0"))
    var1 = (q1 - s1 * s1 / n1) / (n1 - 1)
    var0 = (q0 - s0 * s0 / n0) / (n0 - 1)
    sp = F.sqrt(((n1 - 1) * var1 + (n0 - 1) * var0) / (n1 + n0 - 2))
    return m.select(
        F.col("n1").cast("bigint").alias("n_treated"),
        F.col("n0").cast("bigint").alias("n_control"),
        F.floor((s1 / n1 - s0 / n0) / sp * 1e6).cast("bigint")
        .alias("d_e6"))


ORACLE_COHENS_D = f"""
WITH m AS (
  SELECT
    CAST(sum(CASE WHEN l_discount >= {_CD_TREAT_DISC}
             THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
    CAST(sum(CASE WHEN l_discount >= {_CD_TREAT_DISC}
             THEN CAST(round(l_quantity) AS HUGEINT) ELSE 0 END)
         AS HUGEINT) AS s1,
    CAST(sum(CASE WHEN l_discount >= {_CD_TREAT_DISC}
             THEN CAST(round(l_quantity) AS HUGEINT)
                  * CAST(round(l_quantity) AS HUGEINT)
             ELSE 0 END) AS HUGEINT) AS q1,
    CAST(sum(CASE WHEN l_discount < {_CD_TREAT_DISC}
             THEN 1 ELSE 0 END) AS HUGEINT) AS n0,
    CAST(sum(CASE WHEN l_discount < {_CD_TREAT_DISC}
             THEN CAST(round(l_quantity) AS HUGEINT) ELSE 0 END)
         AS HUGEINT) AS s0,
    CAST(sum(CASE WHEN l_discount < {_CD_TREAT_DISC}
             THEN CAST(round(l_quantity) AS HUGEINT)
                  * CAST(round(l_quantity) AS HUGEINT)
             ELSE 0 END) AS HUGEINT) AS q0
  FROM lineitem
)
SELECT CAST(n1 AS BIGINT) AS n_treated,
       CAST(n0 AS BIGINT) AS n_control,
       CAST(floor(
         (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
         / sqrt(((CAST(n1 AS DOUBLE) - 1)
                 * ((CAST(q1 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) ^ 2 / CAST(n1 AS DOUBLE))
                    / (CAST(n1 AS DOUBLE) - 1))
                 + (CAST(n0 AS DOUBLE) - 1)
                 * ((CAST(q0 AS DOUBLE)
                     - CAST(s0 AS DOUBLE) ^ 2 / CAST(n0 AS DOUBLE))
                    / (CAST(n0 AS DOUBLE) - 1)))
                / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE) - 2))
         * 1e6) AS BIGINT) AS d_e6
FROM m
"""


_OR_RESP_QTY = 30


def q_odds_ratio_report(spark: SparkSession,
                        sf_dir: str) -> DataFrame:
    """Exact odds ratio for the 2x2 table (discounted >=
    {_CD_TREAT_DISC}) x (quantity >= {_OR_RESP_QTY}): OR_e6 =
    (a * d * 1e6) div (b * c) on exact cell counts — the effect size
    chi_square_report's p-value hides, and the one that survives
    unbalanced margins (plain rate differences don't). Cells
    reported so a reader can recompute anything.

    Scale shape: ONE combinable conditional aggregate; the 2x2 never
    leaves the single reduce row."""
    l = _t(spark, sf_dir, "lineitem")
    t = f"l_discount >= {_CD_TREAT_DISC}"
    r = f"l_quantity >= {_OR_RESP_QTY}"
    m = l.agg(
        F.sum(F.expr(f"CASE WHEN {t} AND {r} THEN 1 ELSE 0 END"))
        .alias("a"),
        F.sum(F.expr(f"CASE WHEN {t} AND NOT ({r}) THEN 1 ELSE 0"
                     " END")).alias("b"),
        F.sum(F.expr(f"CASE WHEN NOT ({t}) AND {r} THEN 1 ELSE 0"
                     " END")).alias("c"),
        F.sum(F.expr(f"CASE WHEN NOT ({t}) AND NOT ({r}) THEN 1"
                     " ELSE 0 END")).alias("d"))
    return m.select(
        F.col("a").cast("bigint").alias("a_treat_resp"),
        F.col("b").cast("bigint").alias("b_treat_noresp"),
        F.col("c").cast("bigint").alias("c_ctrl_resp"),
        F.col("d").cast("bigint").alias("d_ctrl_noresp"),
        F.expr("(CAST(a AS DECIMAL(38,0)) * d * 1000000)"
               " div (CAST(b AS DECIMAL(38,0)) * c)").cast("bigint")
        .alias("odds_ratio_e6"))


ORACLE_ODDS_RATIO = f"""
WITH m AS (
  SELECT
    sum(CASE WHEN l_discount >= {_CD_TREAT_DISC}
         AND l_quantity >= {_OR_RESP_QTY} THEN 1 ELSE 0 END) AS a,
    sum(CASE WHEN l_discount >= {_CD_TREAT_DISC}
         AND l_quantity < {_OR_RESP_QTY} THEN 1 ELSE 0 END) AS b,
    sum(CASE WHEN l_discount < {_CD_TREAT_DISC}
         AND l_quantity >= {_OR_RESP_QTY} THEN 1 ELSE 0 END) AS c,
    sum(CASE WHEN l_discount < {_CD_TREAT_DISC}
         AND l_quantity < {_OR_RESP_QTY} THEN 1 ELSE 0 END) AS d
  FROM lineitem
)
SELECT CAST(a AS BIGINT) AS a_treat_resp,
       CAST(b AS BIGINT) AS b_treat_noresp,
       CAST(c AS BIGINT) AS c_ctrl_resp,
       CAST(d AS BIGINT) AS d_ctrl_noresp,
       CAST((CAST(a AS HUGEINT) * d * 1000000)
            // (CAST(b AS HUGEINT) * c) AS BIGINT) AS odds_ratio_e6
FROM m
"""


QUERIES_EXT40.update({
    "cohens_d_report": q_cohens_d_report,
    "odds_ratio_report": q_odds_ratio_report,
})
ORACLE_EXT40.update({
    "cohens_d_report": ORACLE_COHENS_D,
    "odds_ratio_report": ORACLE_ODDS_RATIO,
})
