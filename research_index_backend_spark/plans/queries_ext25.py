"""Catalog extension 25 (round 9, wave 7). Embedding-ops reports:

  matryoshka_recall_report  retrieval quality of PREFIX-TRUNCATED
                            embeddings (8/16/32/64 dims) against the
                            full-dim ranking — the Matryoshka (MRL)
                            dimension-budget report a vector-store
                            owner reads before cutting storage 8x
  mutual_knn_pairs          reciprocal nearest neighbors over the
                            sign-LSH candidate graph: pairs where EACH
                            is in the other's top-k — the
                            high-precision pair miner used for
                            translation/duplicate distillation

Reference parity: none in the reference; the brief's
similarity-search / embedding extension families.

Cross-engine determinism (SURVEY 4.4): all rankings quantize
round(sim, 9) with id tie-breaks (the ann catalog rule); recalls are
(1e4 * hits) div k integers; the mutual join is a pure equi-join of
two deterministic rank tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t

QUERIES_EXT25: dict = {}
ORACLE_EXT25: dict = {}


# ---------------------------------------------------------------------------
# matryoshka_recall_report — dimension-truncation quality ladder
# ---------------------------------------------------------------------------

_MR_DIMS = (8, 16, 32, 64)
_MR_K = 5
_MR_NQ = 5


def q_matryoshka_recall_report(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Matryoshka dimension budget: for each prefix length d in
    {_MR_DIMS}, rank the corpus by cosine over the FIRST d dimensions
    (queries = vec_id < {_MR_NQ}) and report recall@{_MR_K} against
    the full-dimension ranking — the measurement behind "can we store
    8x less vector?" (MRL-trained embeddings keep recall high at small
    prefixes; untrained ones collapse, and THIS report is how you find
    out). recall_e4 = (1e4 * hits) div k per (dim, query).

    Scale shape (r14 single-product rewrite): ONE corpus scan and ONE
    query-batch x corpus broadcast product computes all {_MR_DIMS}
    prefix cosines per pair (the product is BY DESIGN — the eval runs
    on a sampled query batch, the ann_recall_report rule; the per-rung
    slice + HOF-fold expressions are byte-identical to the old
    per-rung brute_force_topk scoring, so sims are bit-identical),
    stack() pivots to (dim, sim) rows, and one salted two-stage top-k
    partitioned by (dim, query_id) ranks every rung in one pass.
    TRUTH IS THE d=64 RUNG: slice(e,1,64) == e on 64-dim vectors and
    the ordering criteria are identical, so the full-dimension rung's
    top-{_MR_K} equals the old separate truth pass row-for-row. The
    old shape paid 5 corpus scans, 5 products and 5 top-ks for the
    same answer (plans/r14/matryoshka_recall_report_*.txt: Scan 10->2,
    BroadcastNestedLoopJoin 5->1; A/B ratio 0.45 sf0.1 / 0.78 100x,
    parity exact at both).
    """
    from ..operators.ann import _dot, _norm
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < _MR_NQ)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_vec")))
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("c_vec"))
    pairs = (c.crossJoin(F.broadcast(q))
             .filter(F.col("neighbor_id") != F.col("query_id")))
    sims = []
    for d in _MR_DIMS:
        a = F.slice(F.col("q_vec"), 1, d)
        b = F.slice(F.col("c_vec"), 1, d)
        sims.append((_dot(a, b) / (_norm(a) * _norm(b))).alias(f"sim{d}"))
    scored = pairs.select("query_id", "neighbor_id", *sims)
    stack_args = ", ".join(f"CAST({d} AS BIGINT), sim{d}" for d in _MR_DIMS)
    stacked = scored.selectExpr(
        "query_id", "neighbor_id",
        f"stack({len(_MR_DIMS)}, {stack_args}) AS (dim, sim)")
    order = [F.round("sim", 9).desc(), F.col("neighbor_id")]
    salted = stacked.withColumn(
        "__salt", F.pmod(F.hash("neighbor_id"), F.lit(32)))
    w1 = Window.partitionBy("dim", "query_id", "__salt").orderBy(*order)
    survivors = (salted.withColumn("__r", F.row_number().over(w1))
                 .filter(F.col("__r") <= _MR_K))
    w2 = Window.partitionBy("dim", "query_id").orderBy(*order)
    # checkpoint: <= len(_MR_DIMS)*_MR_NQ*_MR_K rows (~100), consumed
    # twice (truth arm + candidate arm) — inside the timed build
    ranked = (survivors.withColumn("rnk", F.row_number().over(w2))
              .filter(F.col("rnk") <= _MR_K)
              .select("dim", "query_id", "neighbor_id")
              .localCheckpoint())
    truth = (ranked.filter(F.col("dim") == max(_MR_DIMS))
             .select("query_id", "neighbor_id"))
    hits = (ranked.join(truth, ["query_id", "neighbor_id"], "semi")
            .groupBy("dim", "query_id")
            .agg(F.count(F.lit(1)).alias("hits"))
            .select("dim", "query_id",
                    F.col("hits").cast("bigint").alias("hits")))
    return (hits.withColumn(
        "recall_e4", F.expr(f"(10000 * hits) div {_MR_K}").cast("bigint"))
        .orderBy("dim", "query_id"))


def _mr_rank_sql(d: int, name: str) -> str:
    vec = f"embedding[1:{d}]" if d < 64 else "embedding"
    return f"""{name} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(
               e.{vec}, q.qv{d}), 9) DESC, e.vec_id) AS rnk
    FROM embeddings e,
         (SELECT vec_id AS query_id, {vec} AS qv{d} FROM embeddings
          WHERE vec_id < {_MR_NQ}) q
    WHERE e.vec_id <> q.query_id)
  WHERE rnk <= {_MR_K}
)"""


def _mr_oracle() -> str:
    ctes = [_mr_rank_sql(64, "truth")]
    unions = []
    for d in _MR_DIMS:
        ctes.append(_mr_rank_sql(d, f"cand{d}"))
        unions.append(f"""
SELECT CAST({d} AS BIGINT) AS dim, c.query_id,
       CAST(count(*) AS BIGINT) AS hits
FROM cand{d} c SEMI JOIN truth t
  ON c.query_id = t.query_id AND c.neighbor_id = t.neighbor_id
GROUP BY c.query_id""")
    u = "\nUNION ALL\n".join(unions)
    return (f"WITH " + ",\n".join(ctes) + f""",
hits AS ({u})
SELECT dim, query_id, hits,
       CAST((10000 * hits) // {_MR_K} AS BIGINT) AS recall_e4
FROM hits
ORDER BY dim, query_id""")


ORACLE_MATRYOSHKA = _mr_oracle()


# ---------------------------------------------------------------------------
# mutual_knn_pairs — reciprocal nearest neighbors over the LSH graph
# ---------------------------------------------------------------------------

_MK_K = 5
_MK_BITS = 4


def q_mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal nearest neighbors: pairs (a, b) where b is in a's
    top-{_MK_K} AND a is in b's top-{_MK_K}, candidates restricted to
    the same sign-LSH bucket — the high-precision pair miner behind
    bitext/duplicate distillation (mutual agreement kills the
    hubness asymmetry a one-sided kNN list suffers). Output one row
    per unordered pair with both ranks.

    Scale shape: the all-pairs kNN rides lsh_topk with the CORPUS as
    the query set — a SHUFFLE bucket equi-join (broadcast_queries=False;
    broadcasting a corpus-sized query side is the plan a cluster dies
    on), with CORPUS-SIZED bucket granularity via adaptive_lsh_bits
    (fixed {_MK_BITS} bits went quadratic-in-bucket at the 100x probe —
    the r7 embedding-family lesson, re-learned and re-applied; the
    checked SFs size to the floor so the oracle's hardcoded 4-bit
    bucket stays valid). Mutuality is an equi-join of the rank table
    with its (b, a)-flipped self — rank tables are k rows per vector,
    so the join is corpus*k, not corpus^2.
    """
    from ..operators.ann import lsh_topk
    from ..operators.dedup import adaptive_lsh_bits
    from ..sources.stats import table_rowcount_or_count
    emb = _t(spark, sf_dir, "embeddings")
    n_rows = table_rowcount_or_count(sf_dir, "embeddings", emb, "vec_id")
    bits = adaptive_lsh_bits(n_rows,
                             target_bucket=125, floor_bits=_MK_BITS)
    ranks = (lsh_topk(emb, emb, k=_MK_K, n_bits=bits,
                      broadcast_queries=False)
             .select(F.col("query_id").alias("a"),
                     F.col("neighbor_id").alias("b"),
                     F.col("rnk").alias("rnk_ab"))
             .localCheckpoint())
    flipped = ranks.select(F.col("b").alias("a"), F.col("a").alias("b"),
                           F.col("rnk_ab").alias("rnk_ba"))
    return (ranks.join(flipped, ["a", "b"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b",
                    F.col("rnk_ab").cast("bigint").alias("rnk_ab"),
                    F.col("rnk_ba").cast("bigint").alias("rnk_ba"))
            .orderBy("a", "b"))


ORACLE_MUTUAL_KNN = f"""
WITH bucketed AS (
  SELECT vec_id, embedding,
         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
  FROM embeddings
),
ranks AS (
  SELECT a, b, rnk_ab FROM (
    SELECT q.vec_id AS a, e.vec_id AS b,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(
               e.embedding, q.embedding), 9) DESC, e.vec_id) AS rnk_ab
    FROM bucketed e JOIN bucketed q ON e.bucket = q.bucket
    WHERE e.vec_id <> q.vec_id)
  WHERE rnk_ab <= {_MK_K}
)
SELECT r.a, r.b,
       CAST(r.rnk_ab AS BIGINT) AS rnk_ab,
       CAST(f.rnk_ab AS BIGINT) AS rnk_ba
FROM ranks r JOIN ranks f ON r.a = f.b AND r.b = f.a
WHERE r.a < r.b
ORDER BY r.a, r.b
"""


QUERIES_EXT25.update({
    "matryoshka_recall_report": q_matryoshka_recall_report,
    "mutual_knn_pairs": q_mutual_knn_pairs,
})
ORACLE_EXT25.update({
    "matryoshka_recall_report": ORACLE_MATRYOSHKA,
    "mutual_knn_pairs": ORACLE_MUTUAL_KNN,
})


# ---------------------------------------------------------------------------
# slo_burn_rate — multi-window error-budget burn (SRE fast/slow alert)
# ---------------------------------------------------------------------------

_SLO_BUDGET_E6 = 250000   # error budget: 25% of events may be errors
_SLO_WINDOWS_H = (24, 168)   # fast / slow trailing windows (hours)


def q_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window error-budget burn rate (the SRE workbook alert
    shape): over the trailing {_SLO_WINDOWS_H} hours (anchored at the
    stream's max timestamp), the error ratio vs the
    {_SLO_BUDGET_E6}-ppm budget — burn_e4 = (1e4 * errors * 1e6) div
    (n * budget), >1e4 means the window is burning budget faster than
    allowed; alerting requires BOTH windows hot (fast = responsive,
    slow = de-flapped). Cross-multiplied exact; the window pair rides
    one in-row explode so the corpus scans once. latency_slo_report
    tracks per-day p99s; this is the error-budget twin.

    Scale shape: one 1-row max-ts aggregate broadcast onto the scan
    (the snapshot_asof shape, BNLJ-allowlisted), one combinable
    aggregate per window.
    """
    e = _t(spark, sf_dir, "events").select("event_type", "ts_ns")
    anchor = e.agg(F.max("ts_ns").alias("amax"))
    wins = F.array(*[F.lit(h) for h in _SLO_WINDOWS_H])
    x = (e.crossJoin(F.broadcast(anchor))
         .select("event_type", "ts_ns", "amax",
                 F.explode(wins).alias("win_h"))
         .filter(F.expr("ts_ns > amax - CAST(win_h AS BIGINT)"
                        " * 3600000000000")))
    agg = x.groupBy("win_h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"))
        .alias("errors"))
    return (agg.select(
        F.col("win_h").cast("bigint").alias("window_h"),
        F.col("n").cast("bigint").alias("n_events"),
        F.col("errors").cast("bigint").alias("n_errors"),
        F.expr("(1000000 * CAST(errors AS DECIMAL(38,0))) div n")
        .cast("bigint").alias("err_ppm"),
        F.expr(f"(10000 * CAST(errors AS DECIMAL(38,0)) * 1000000)"
               f" div (CAST(n AS DECIMAL(38,0)) * {_SLO_BUDGET_E6})")
        .cast("bigint").alias("burn_e4"))
        .orderBy("window_h"))


ORACLE_SLO_BURN = f"""
WITH e AS (SELECT event_type, epoch_ns(ts) AS ts_ns FROM events),
anchor AS (SELECT max(ts_ns) AS amax FROM e),
x AS (
  SELECT event_type, win_h
  FROM e, anchor,
       (SELECT unnest([{", ".join(str(h) for h in _SLO_WINDOWS_H)}])
        AS win_h) w
  WHERE ts_ns > amax - CAST(win_h AS BIGINT) * 3600000000000
),
agg AS (
  SELECT win_h, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS HUGEINT) AS errors
  FROM x GROUP BY 1
)
SELECT CAST(win_h AS BIGINT) AS window_h,
       CAST(n AS BIGINT) AS n_events,
       CAST(errors AS BIGINT) AS n_errors,
       CAST((1000000 * errors) // n AS BIGINT) AS err_ppm,
       CAST((10000 * errors * 1000000)
            // (n * {_SLO_BUDGET_E6}) AS BIGINT) AS burn_e4
FROM agg
ORDER BY window_h
"""


QUERIES_EXT25.update({"slo_burn_rate": q_slo_burn_rate})
ORACLE_EXT25.update({"slo_burn_rate": ORACLE_SLO_BURN})
