"""Catalog extension 33 (round 9, second session, wave 8). Retrieval
and embedding evaluation + privacy design:

  mrr_eval                    mean-reciprocal-rank of same-label
                              retrieval over a query batch — the
                              "how soon does the first relevant hit
                              appear" metric ndcg_eval's graded gain
                              hides
  knn_label_eval              leave-one-out kNN classification
                              accuracy per label over the LSH bucket
                              graph — the embedding-quality probe
                              that needs no model at all
  kanon_generalization_ladder minimal quasi-identifier
                              generalization level reaching k >= 10
                              anonymity — the privacy-vs-utility
                              ladder k_anonymity only spot-checks

Reference parity: none in the reference; eval/privacy extension
families (ann_recall_report, ndcg_eval, k_anonymity).

Cross-engine determinism (SURVEY 4.4): rankings quantize
round(sim, 9) with id tie-breaks (the ann catalog rule); votes and
ladder stats are exact integers; the majority vote breaks ties to
the smallest label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t

QUERIES_EXT33: dict = {}
ORACLE_EXT33: dict = {}


# ---------------------------------------------------------------------------
# mrr_eval — mean reciprocal rank of same-label retrieval
# ---------------------------------------------------------------------------

_MRR_NQ = 10
_MRR_K = 10


def q_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the FIRST same-label neighbor in the
    brute-force cosine top-{_MRR_K} for each of {_MRR_NQ} query
    vectors (vec_id < {_MRR_NQ}), plus the batch MRR row
    (label = -1): rr_e6 = 1e6 div first_rel_rank, 0 when no relevant
    hit lands in the window. ndcg_eval grades the whole list; MRR
    answers the latency question — how deep must a user read.

    Scale shape: the exact ranking is the ann_recall_report contract
    (query batch x corpus broadcast product BY DESIGN — the eval
    runs on a fixed query batch); the rank scan is a {_MRR_K}-row
    window per query over the post-top-k table."""
    from ..operators.ann import brute_force_topk
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _MRR_NQ)
    top = (brute_force_topk(emb, queries, k=_MRR_K)
           .select("query_id", "neighbor_id", "rnk"))
    lab = emb.select(F.col("vec_id").alias("neighbor_id"),
                     F.col("label").alias("n_label"))
    qlab = emb.select(F.col("vec_id").alias("query_id"),
                      F.col("label").alias("q_label"))
    hits = (top.join(F.broadcast(lab), "neighbor_id")
            .join(F.broadcast(qlab), "query_id")
            .groupBy("query_id")
            .agg(F.min(F.when(F.col("n_label") == F.col("q_label"),
                              F.col("rnk"))).alias("first_rel")))
    per_q = hits.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.coalesce(F.col("first_rel"), F.lit(0)).cast("bigint")
        .alias("first_rel_rank"),
        F.coalesce(F.expr("1000000 div first_rel"), F.lit(0))
        .cast("bigint").alias("rr_e6"))
    mrr = per_q.agg(
        F.lit(-1).cast("bigint").alias("query_id"),
        F.lit(0).cast("bigint").alias("first_rel_rank"),
        F.expr("sum(rr_e6) div count(1)").cast("bigint")
        .alias("rr_e6"))
    return per_q.unionByName(mrr).orderBy("query_id")


ORACLE_MRR = f"""
WITH ranked AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         e.label AS n_label, q.label AS q_label,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round(list_cosine_similarity(
             e.embedding, q.embedding), 9) DESC, e.vec_id) AS rnk
  FROM embeddings e,
       (SELECT * FROM embeddings WHERE vec_id < {_MRR_NQ}) q
  WHERE e.vec_id <> q.vec_id
), top AS (SELECT * FROM ranked WHERE rnk <= {_MRR_K}),
hits AS (
  SELECT query_id,
         min(CASE WHEN n_label = q_label THEN rnk END) AS first_rel
  FROM top GROUP BY query_id
), per_q AS (
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(coalesce(first_rel, 0) AS BIGINT) AS first_rel_rank,
         CAST(coalesce(1000000 // first_rel, 0) AS BIGINT) AS rr_e6
  FROM hits
)
SELECT query_id, first_rel_rank, rr_e6 FROM per_q
UNION ALL
SELECT -1, 0, CAST(sum(rr_e6) // count(*) AS BIGINT) FROM per_q
ORDER BY query_id
"""


# ---------------------------------------------------------------------------
# knn_label_eval — leave-one-out kNN accuracy over LSH buckets
# ---------------------------------------------------------------------------

_KL_K = 5
_KL_BITS = 4


def q_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out kNN classification: every vector is classified
    by the majority label of its top-{_KL_K} cosine neighbors inside
    its sign-LSH bucket (ties to the smallest label), then scored
    against its own label — per-label n, correct, and accuracy_e6.
    The zero-model probe of embedding quality: if LOO-kNN can't
    recover labels, no downstream classifier will.

    Scale shape: all-pairs kNN rides lsh_topk with the corpus as the
    query set (broadcast_queries=False — the mutual_knn_pairs rule)
    at adaptive_lsh_bits granularity (fixed bits go quadratic-in-
    bucket; the checked SFs size to the {_KL_BITS}-bit floor so the
    oracle's hardcoded bucket stays valid); the vote is a k-row-per-
    vector aggregate."""
    from ..operators.ann import lsh_topk
    from ..operators.dedup import adaptive_lsh_bits
    from ..sources.stats import table_rowcount_or_count
    emb = _t(spark, sf_dir, "embeddings")
    n_rows = table_rowcount_or_count(sf_dir, "embeddings", emb, "vec_id")
    bits = adaptive_lsh_bits(n_rows,
                             target_bucket=125, floor_bits=_KL_BITS)
    ranks = (lsh_topk(emb, emb, k=_KL_K, n_bits=bits,
                      broadcast_queries=False)
             .select("query_id", "neighbor_id"))
    lab = emb.select(F.col("vec_id").alias("neighbor_id"),
                     F.col("label").alias("n_label"))
    votes = (ranks.join(F.broadcast(lab), "neighbor_id")
             .groupBy("query_id", "n_label")
             .agg(F.count(F.lit(1)).alias("v")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("v"), F.asc("n_label"))
    pred = (votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("query_id", F.col("n_label").alias("pred")))
    truth = emb.select(F.col("vec_id").alias("query_id"), "label")
    return (truth.join(pred, "query_id", "left")
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("pred") == F.col("label"), 1)
                       .otherwise(0)).alias("correct"))
            .select(F.col("label").cast("int").alias("label"),
                    F.col("n").cast("bigint").alias("n"),
                    F.col("correct").cast("bigint").alias("correct"),
                    F.expr("(1000000 * CAST(correct AS"
                           " DECIMAL(38,0))) div n").cast("bigint")
                    .alias("accuracy_e6"))
            .orderBy("label"))


ORACLE_KNN_LABEL = f"""
WITH bucketed AS (
  SELECT vec_id, embedding, label,
         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
  FROM embeddings
), ranks AS (
  SELECT query_id, neighbor_id, n_label FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           e.label AS n_label,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(
               e.embedding, q.embedding), 9) DESC, e.vec_id) AS rnk
    FROM bucketed e JOIN bucketed q ON e.bucket = q.bucket
    WHERE e.vec_id <> q.vec_id)
  WHERE rnk <= {_KL_K}
), votes AS (
  SELECT query_id, n_label, count(*) AS v
  FROM ranks GROUP BY 1, 2
), pred AS (
  SELECT query_id, n_label AS pred FROM (
    SELECT query_id, n_label,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY v DESC, n_label ASC) AS rk
    FROM votes) WHERE rk = 1
)
SELECT CAST(e.label AS INT) AS label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END)
            AS BIGINT) AS correct,
       CAST((1000000 * CAST(sum(CASE WHEN p.pred = e.label
                                 THEN 1 ELSE 0 END) AS HUGEINT))
            // count(*) AS BIGINT) AS accuracy_e6
FROM embeddings e LEFT JOIN pred p ON e.vec_id = p.query_id
GROUP BY e.label
ORDER BY label
"""


# ---------------------------------------------------------------------------
# kanon_generalization_ladder — minimal level reaching k-anonymity
# ---------------------------------------------------------------------------

_KG_LEVELS = 8
_KG_BASE_C = 100_00   # level-0 balance band: $100
_KG_TARGET_K = 10


def q_kanon_generalization_ladder(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Generalization ladder for the (nation, segment, balance-band)
    quasi-identifier over customers: at level L the balance band
    doubles to ${_KG_BASE_C // 100} * 2^L; per level report the
    equivalence-class count, the minimum class size (the k in
    k-anonymity), the share of customers in classes below
    k = {_KG_TARGET_K} ppm, and whether the level meets the target —
    the privacy-vs-utility curve an anonymization design reads
    (k_anonymity audits ONE scheme; this finds the cheapest safe
    one).

    Scale shape: the {_KG_LEVELS} levels stack through ONE in-row
    explode (the gini_gain single-scan shape), then one combinable
    (level, class) count and a per-level reduction. All-integer."""
    c = _t(spark, sf_dir, "customer")
    lv = F.array(*[F.lit(i) for i in range(_KG_LEVELS)])
    stacked = (c.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("bal"),
        F.explode(lv).alias("level"))
        .select("level", "nat", "seg",
                F.expr(f"bal div ({_KG_BASE_C} *"
                       f" CAST(pow(2, level) AS BIGINT))")
                .alias("band")))
    classes = stacked.groupBy("level", "nat", "seg", "band").agg(
        F.count(F.lit(1)).alias("cnt"))
    per_level = classes.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("cnt").alias("n_rows"),
        F.min("cnt").alias("k_min"),
        F.sum(F.when(F.col("cnt") < _KG_TARGET_K, F.col("cnt"))
              .otherwise(0)).alias("exposed"))
    return (per_level.select(
        F.col("level").cast("bigint").alias("level"),
        (F.lit(_KG_BASE_C // 100)
         * F.expr("CAST(pow(2, level) AS BIGINT)")).cast("bigint")
        .alias("band_dollars"),
        F.col("n_classes").cast("bigint").alias("n_classes"),
        F.col("k_min").cast("bigint").alias("k_min"),
        F.expr("(1000000 * CAST(exposed AS DECIMAL(38,0)))"
               " div n_rows").cast("bigint").alias("exposed_e6"),
        (F.col("k_min") >= _KG_TARGET_K).alias("meets_k"))
        .orderBy("level"))


ORACLE_KANON_LADDER = f"""
WITH stacked AS (
  SELECT level, c_nationkey AS nat, c_mktsegment AS seg,
         CAST(round(c_acctbal * 100) AS BIGINT)
           // ({_KG_BASE_C} * CAST(pow(2, level) AS BIGINT)) AS band
  FROM customer, unnest(range(0, {_KG_LEVELS})) AS t(level)
), classes AS (
  SELECT level, nat, seg, band, count(*) AS cnt
  FROM stacked GROUP BY 1, 2, 3, 4
), per_level AS (
  SELECT level, count(*) AS n_classes, sum(cnt) AS n_rows,
         min(cnt) AS k_min,
         sum(CASE WHEN cnt < {_KG_TARGET_K} THEN cnt ELSE 0 END)
           AS exposed
  FROM classes GROUP BY 1
)
SELECT CAST(level AS BIGINT) AS level,
       CAST({_KG_BASE_C // 100} * CAST(pow(2, level) AS BIGINT)
            AS BIGINT) AS band_dollars,
       CAST(n_classes AS BIGINT) AS n_classes,
       CAST(k_min AS BIGINT) AS k_min,
       CAST((1000000 * CAST(exposed AS HUGEINT)) // n_rows
            AS BIGINT) AS exposed_e6,
       k_min >= {_KG_TARGET_K} AS meets_k
FROM per_level
ORDER BY level
"""


QUERIES_EXT33.update({
    "mrr_eval": q_mrr_eval,
    "knn_label_eval": q_knn_label_eval,
    "kanon_generalization_ladder": q_kanon_generalization_ladder,
})
ORACLE_EXT33.update({
    "mrr_eval": ORACLE_MRR,
    "knn_label_eval": ORACLE_KNN_LABEL,
    "kanon_generalization_ladder": ORACLE_KANON_LADDER,
})
