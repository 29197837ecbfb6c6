"""Catalog extension 21 (round 9, wave 2). Retrieval-quality and
nonparametric-statistics reports:

  ndcg_eval               nDCG@10 of the sign-LSH ANN ranking against
                          the exact brute-force ranking — the GRADED
                          retrieval-quality partner of
                          ann_recall_report (recall counts hits; nDCG
                          weighs WHERE they landed), exact on a
                          precomputed integer discount table
  mannwhitney_auc         exact Mann-Whitney U / AUC of each event
                          type's value distribution vs the rest — the
                          rank-based effect-size partner of
                          ks_test_drift (KS asks "did it drift"; AUC
                          asks "which way and how much"), midrank-exact
                          through doubled integer ranks
  interarrival_burstiness per-type burstiness of user event streams:
                          Fano factor and CV^2 of inter-arrival gaps —
                          the traffic-shape diagnostic for rate
                          limiting and anomaly triage, integer-exact
                          via the (n*Q - S^2) variance numerator

Reference parity: none in the reference; LLM-pipeline evaluation /
monitoring extension families.

Cross-engine determinism (SURVEY 4.4): the nDCG discount table is
floor(1e6/log2(i+1)) precomputed ONCE in Python and embedded as
literals in both engines (no runtime log anywhere); both rankings are
total orders (round(sim, 9) + id tie-break, the ann catalog rule).
Mann-Whitney midranks double to integers (2*midrank = 2*cum_before +
tie_count + 1) on the shared CDF lattice; all products ride
decimal(38,0)/HUGEINT. Burstiness moments use the integer variance
numerator n*Q - S^2 in SECONDS (n*Q ~ 1e36 at 1e12 gaps — inside 38
digits; milliseconds would overflow) and divide once through each
engine's positive-operand floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t
from .queries_ext20 import _cdf_lattice

QUERIES_EXT21: dict = {}
ORACLE_EXT21: dict = {}


# ---------------------------------------------------------------------------
# ndcg_eval — graded ranking quality of the LSH index vs brute force
# ---------------------------------------------------------------------------

_NDCG_K = 10
# floor(1e6 / log2(i+1)) for positions i = 1..10 — computed once,
# embedded identically in both engines (no runtime log).
_NDCG_W = (1000000, 630929, 500000, 430676, 386852,
           356207, 333333, 315464, 301029, 289064)
# ideal DCG: the truth list's graded rels (11-i) in their own order.
_NDCG_IDCG = sum((11 - i) * _NDCG_W[i - 1] for i in range(1, 11))
_NDCG_NQ = 5   # queries: vec_id < 5 (the ann catalog batch)


def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{_NDCG_K} of the 4-bit sign-LSH ranking against exact
    brute-force cosine: relevance of a retrieved neighbor is its
    graded truth score (11 - exact_rank, 0 if outside the exact
    top-{_NDCG_K}), discounted by the embedded integer table
    W[i] = floor(1e6/log2(i+1)). ndcg_e6 = (1e6 * DCG) div IDCG with
    IDCG = {_NDCG_IDCG} (the ideal ordering of the truth grades —
    constant because the truth list is always {_NDCG_K} deep).
    ann_recall_report counts hits; this weighs their positions — the
    two numbers every approximate index publishes together.

    Scale shape: both arms are the existing catalog operators
    (brute_force_topk's broadcast-query product — the exact baseline
    is |Q| x corpus BY DESIGN, paid once per index build on a sampled
    query set; lsh_topk's bucket equi-join); the join and aggregate
    run on 2 x |Q| x k rows. Discounts via element_at on a 10-literal
    array — no log, no float anywhere.
    """
    from ..operators.ann import brute_force_topk, lsh_topk
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NDCG_NQ)
    truth = brute_force_topk(emb, queries, k=_NDCG_K).select(
        "query_id", "neighbor_id",
        (F.lit(_NDCG_K + 1) - F.col("rnk")).alias("rel"))
    cand = lsh_topk(emb, queries, k=_NDCG_K, n_bits=4).select(
        "query_id", "neighbor_id", F.col("rnk").alias("pos"))
    w_arr = F.array(*[F.lit(w) for w in _NDCG_W])
    scored = (cand.join(truth, ["query_id", "neighbor_id"], "left")
              .select("query_id", "pos",
                      F.coalesce("rel", F.lit(0)).alias("rel"))
              .withColumn("w", F.element_at(w_arr, F.col("pos"))))
    return (scored.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_ret"),
                 F.sum(F.expr("CASE WHEN rel > 0 THEN 1 ELSE 0 END"))
                 .alias("n_hits"),
                 F.sum(F.col("rel") * F.col("w")).alias("dcg"))
            .select("query_id",
                    F.col("n_ret").cast("bigint").alias("n_ret"),
                    F.col("n_hits").cast("bigint").alias("n_hits"),
                    F.col("dcg").cast("bigint").alias("dcg"))
            .withColumn("ndcg_e6",
                        F.expr(f"(1000000 * dcg) div {_NDCG_IDCG}")
                        .cast("bigint"))
            .orderBy("query_id"))


def _ndcg_discount_case(col: str) -> str:
    return ("CASE " + " ".join(
        f"WHEN {col} = {i} THEN {w}"
        for i, w in enumerate(_NDCG_W, start=1)) + " ELSE 0 END")


ORACLE_NDCG = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < {_NDCG_NQ}
),
truth AS (
  SELECT query_id, neighbor_id,
         {_NDCG_K + 1} - rnk AS rel
  FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(e.embedding, q.qv), 9)
               DESC, e.vec_id) AS rnk
    FROM embeddings e, q WHERE e.vec_id <> q.query_id)
  WHERE rnk <= {_NDCG_K}
),
bucketed AS (
  SELECT vec_id, embedding,
         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
  FROM embeddings
),
qb AS (
  SELECT vec_id AS query_id, embedding AS qv, bucket FROM bucketed
  WHERE vec_id < {_NDCG_NQ}
),
cand AS (
  SELECT query_id, neighbor_id, pos FROM (
    SELECT qb.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY qb.query_id
             ORDER BY round(list_cosine_similarity(e.embedding, qb.qv), 9)
               DESC, e.vec_id) AS pos
    FROM bucketed e JOIN qb ON e.bucket = qb.bucket
    WHERE e.vec_id <> qb.query_id)
  WHERE pos <= {_NDCG_K}
),
scored AS (
  SELECT c.query_id, coalesce(t.rel, 0) AS rel,
         {_ndcg_discount_case('c.pos')} AS w
  FROM cand c LEFT JOIN truth t
    ON c.query_id = t.query_id AND c.neighbor_id = t.neighbor_id
)
SELECT query_id,
       CAST(count(*) AS BIGINT) AS n_ret,
       CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(sum(rel * w) AS BIGINT) AS dcg,
       CAST((1000000 * sum(rel * w)) // {_NDCG_IDCG} AS BIGINT) AS ndcg_e6
FROM scored
GROUP BY query_id
ORDER BY query_id
"""


# ---------------------------------------------------------------------------
# mannwhitney_auc — exact rank-sum effect size, each type vs the rest
# ---------------------------------------------------------------------------

def q_mannwhitney_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U and its AUC normalization for each event
    type's value distribution against the rest: rank all N values
    jointly (midranks for ties), R1 = rank sum of the type's values,
    U1 = R1 - n1(n1+1)/2, AUC = U1/(n1*n2) = P(type value > rest
    value) + P(=)/2. Midranks double to integers on the shared CDF
    lattice: 2*midrank(v) = 2*cum_before(v) + ties(v) + 1 =
    2*g(v) - tv(v) + 1, so 2*R1 = sum_v c(t,v) * (2g - tv + 1) is
    exact; auc_e6 = (1e6 * (2R1 - nt(nt+1))) div (2*nt*(nn-nt)) and
    rank_biserial_e6 = 2*auc_e6 - 1e6 (post-division subtraction —
    no negative floor anywhere). ks_test_drift flags the drift; this
    reports its direction and magnitude.

    Scale shape: identical to ks_test_drift — the corpus reduces
    map-side to (type, cents) counts over the bounded value domain;
    everything downstream is lattice-bounded; decimal(38,0) holds
    c * (2g - tv + 1) ~ 1e30 at 1e12 events.
    """
    x = _cdf_lattice(spark, sf_dir)
    r2 = (x.groupBy("event_type")
          .agg(F.first("nt").alias("nt"), F.first("nn").alias("nn"),
               F.sum(F.expr("CAST(c AS DECIMAL(38,0))"
                            " * (2 * g - tv + 1)")).alias("r1x2")))
    return (r2.select(
        "event_type",
        F.col("nt").cast("bigint").alias("n_type"),
        (F.col("nn") - F.col("nt")).cast("bigint").alias("n_rest"),
        F.expr("(1000000 * (r1x2 - CAST(nt AS DECIMAL(38,0))"
               " * (nt + 1))) div (2 * CAST(nt AS DECIMAL(38,0))"
               " * (nn - nt))").cast("bigint").alias("auc_e6"))
        .withColumn("rank_biserial_e6",
                    (F.lit(2) * F.col("auc_e6") - F.lit(1000000))
                    .cast("bigint"))
        .orderBy("event_type"))


ORACLE_MANNWHITNEY = """
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
cnt AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
  FROM e GROUP BY 1, 2
),
lattice AS (
  SELECT t.event_type, vv.v
  FROM (SELECT DISTINCT event_type FROM cnt) t,
       (SELECT DISTINCT v FROM cnt) vv
),
filled AS (
  SELECT l.event_type, l.v, coalesce(c.c, 0) AS c
  FROM lattice l LEFT JOIN cnt c
    ON l.event_type = c.event_type AND l.v = c.v
),
cum AS (
  SELECT event_type, v, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS ft
  FROM filled
),
gt AS (SELECT v, sum(ft) AS g, sum(c) AS tv FROM cum GROUP BY v),
per_n AS (SELECT event_type, sum(c) AS nt FROM cnt GROUP BY 1),
tot AS (SELECT sum(nt) AS nn FROM per_n),
r2 AS (
  SELECT c.event_type,
         CAST(p.nt AS HUGEINT) AS nt, CAST(t.nn AS HUGEINT) AS nn,
         sum(CAST(c.c AS HUGEINT) * (2 * g.g - g.tv + 1)) AS r1x2
  FROM cum c JOIN gt g USING (v)
  JOIN per_n p ON c.event_type = p.event_type, tot t
  GROUP BY 1, 2, 3
),
base AS (
  SELECT event_type,
         CAST(nt AS BIGINT) AS n_type,
         CAST(nn - nt AS BIGINT) AS n_rest,
         CAST((1000000 * (r1x2 - nt * (nt + 1)))
              // (2 * nt * (nn - nt)) AS BIGINT) AS auc_e6
  FROM r2
)
SELECT event_type, n_type, n_rest, auc_e6,
       CAST(2 * auc_e6 - 1000000 AS BIGINT) AS rank_biserial_e6
FROM base
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# interarrival_burstiness — Fano factor / CV^2 of per-user event gaps
# ---------------------------------------------------------------------------

def q_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-shape diagnostic: per event type, the Fano factor
    (variance-to-mean ratio) and squared coefficient of variation of
    the per-user inter-arrival gaps in SECONDS — Poisson traffic sits
    at CV^2 ~ 1, bursty retry storms and bot bursts sit far above.
    Integer-exact: with S = sum(gap), Q = sum(gap^2), n gaps,
    fano_e3 = (1000 * (n*Q - S^2)) div (n*S) and cv2_e6 =
    (1e6 * (n*Q - S^2)) div (S^2) — the population-variance numerator
    n*Q - S^2 never divides until the single reported floor. Seconds,
    not milliseconds: n*Q stays ~1e36 at 1e12 gaps (38-digit bound;
    ms^2 would overflow).

    Scale shape: gaps come from one lag window partitioned by
    (event_type, user_id) ordered by (ts_ns, event_id) — the
    sessionize shuffle; the rest is one combinable aggregate per type.
    Types with S = 0 (all gaps zero) are filtered — division guard,
    documented.
    """
    e = _t(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts_ns", "event_id",
        F.expr("ts_ns div 1000000000").alias("ts_s"))
    w = (Window.partitionBy("event_type", "user_id")
         .orderBy("ts_ns", "event_id"))
    gaps = (e.withColumn("gap", F.col("ts_s") - F.lag("ts_s").over(w))
            .filter(F.col("gap").isNotNull()))
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("gap").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("gap").cast("decimal(38,0)") * F.col("gap"))
        .alias("q"))
    return (agg.filter(F.col("s") > 0)
            .select("event_type",
                    F.col("n").cast("bigint").alias("n_gaps"),
                    F.expr("s div n").cast("bigint").alias("mean_gap_s"),
                    F.expr("(1000 * (n * q - s * s)) div (n * s)")
                    .cast("bigint").alias("fano_e3"),
                    F.expr("(1000000 * (n * q - s * s)) div (s * s)")
                    .cast("bigint").alias("cv2_e6"))
            .orderBy("event_type"))


ORACLE_BURSTINESS = """
WITH e AS (
  SELECT event_type, user_id, epoch_ns(ts) AS ts_ns, event_id,
         epoch_ns(ts) // 1000000000 AS ts_s
  FROM events
),
gaps AS (
  SELECT event_type,
         ts_s - lag(ts_s) OVER (PARTITION BY event_type, user_id
                                ORDER BY ts_ns, event_id) AS gap
  FROM e
),
agg AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(gap) AS HUGEINT) AS s,
         CAST(sum(gap * gap) AS HUGEINT) AS q
  FROM gaps WHERE gap IS NOT NULL
  GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_gaps,
       CAST(s // n AS BIGINT) AS mean_gap_s,
       CAST((1000 * (n * q - s * s)) // (n * s) AS BIGINT) AS fano_e3,
       CAST((1000000 * (n * q - s * s)) // (s * s) AS BIGINT) AS cv2_e6
FROM agg
WHERE s > 0
ORDER BY event_type
"""


QUERIES_EXT21.update({
    "ndcg_eval": q_ndcg_eval,
    "mannwhitney_auc": q_mannwhitney_auc,
    "interarrival_burstiness": q_interarrival_burstiness,
})
ORACLE_EXT21.update({
    "ndcg_eval": ORACLE_NDCG,
    "mannwhitney_auc": ORACLE_MANNWHITNEY,
    "interarrival_burstiness": ORACLE_BURSTINESS,
})
