"""Catalog extension 26 (round 9, second session, wave 1). Corpus
quality gates + nonparametric dependence — the pre-training curation
rules the big public pipelines actually run, and the rank statistics
a feature auditor reaches for when Pearson assumptions fail:

  gopher_quality_flags   Gopher-style document quality rules (word
                         count / mean word length / duplicate-word
                         fraction / stopword coverage) aggregated per
                         (source, lang) — the repetition-and-length
                         gate of Rae et al.'s curation appendix
  c4_line_filter         C4-style line-level cleaning: split docs
                         into lines, drop bad lines, reassemble the
                         ordered survivor text with a verifiable md5
  spearman_corr          exact tie-averaged Spearman rank correlation
                         per group, computed from the JOINT
                         DISTINCT-VALUE grid (never a row-level sort)
  kendall_tau_grouped    Kendall tau-b from within-order concordant /
                         discordant pair counts, bucketed by group
                         size — bounded pair enumeration, never n^2
  cramers_v_report       Cramér's V effect size on the brand x
                         size-band contingency grid (chi-square is
                         the test; V is the magnitude you act on)

Reference parity: none in the reference (its analytics stop at
count/dup reports, src/research_index_backend/create_graph.py); these
are the brief's training-data-pipeline text-analysis extension plus
the stats family begun in queries_ext10/ext20.

Cross-engine determinism (SURVEY 4.4): every corpus-scale reduction
lands in exact integer / DECIMAL(38,0) lattices; doubles appear only
in a FINAL closed-form expression over exact moments (the corr_report
rule); reassembled text compares by md5 of the identical string both
engines build (single-space joins, ordered aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t

QUERIES_EXT26: dict = {}
ORACLE_EXT26: dict = {}


# ---------------------------------------------------------------------------
# gopher_quality_flags — Gopher-rule curation gate, per (source, lang)
# ---------------------------------------------------------------------------

_GQ_MIN_WORDS = 30
_GQ_MAX_WORDS = 500
_GQ_MIN_WLEN = 3      # mean word length lower bound
_GQ_MAX_WLEN = 10     # mean word length upper bound
_GQ_DUP_MAX_E6 = 900000   # duplicate-word fraction ceiling (ppm)
_GQ_STOPWORDS = ("the", "a", "data", "value")
_GQ_MIN_STOPS = 2     # distinct stopwords required


def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules (Rae et al. 2021 appendix A1,
    thresholds adapted to the synthetic corpus), aggregated per
    (source, lang): how many docs fail each rule, and how many pass
    all four.

      R1 words      word count in [{_GQ_MIN_WORDS}, {_GQ_MAX_WORDS}]
      R2 wordlen    mean word length in [{_GQ_MIN_WLEN}, {_GQ_MAX_WLEN}]
                    (cross-multiplied: min*n <= letters <= max*n —
                    no float division anywhere)
      R3 dupfrac    (n_words - n_distinct) ppm of n_words
                    <= {_GQ_DUP_MAX_E6}
      R4 stopwords  >= {_GQ_MIN_STOPS} distinct words from
                    {_GQ_STOPWORDS}

    Scale shape: one projection computes every per-doc metric as pure
    column expressions over split(text) — size / array_distinct /
    array_intersect all JVM-side, no explode, no UDF — then ONE
    map-side-combinable groupBy on (source, lang). Letters count is
    length(replace(text,' ','')) — exact regardless of spacing. The
    output is |sources| x |langs| rows; the corpus is read once.
    """
    d = _t(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(s) for s in _GQ_STOPWORDS])
    words = F.split(F.col("text"), " ")
    m = d.select(
        "source", "lang",
        F.size(words).alias("nw"),
        F.length(F.regexp_replace("text", " ", "")).alias("letters"),
        F.size(F.array_distinct(words)).alias("nd"),
        F.size(F.array_intersect(F.array_distinct(words), stop_arr))
        .alias("stops"))
    f_words = (F.col("nw") < _GQ_MIN_WORDS) | (F.col("nw") > _GQ_MAX_WORDS)
    f_wlen = ((F.col("letters") < _GQ_MIN_WLEN * F.col("nw"))
              | (F.col("letters") > _GQ_MAX_WLEN * F.col("nw")))
    f_dup = (F.expr("(1000000 * CAST(nw - nd AS DECIMAL(38,0))) div nw")
             > _GQ_DUP_MAX_E6)
    f_stop = F.col("stops") < _GQ_MIN_STOPS
    flags = m.select(
        "source", "lang",
        f_words.cast("int").alias("fw"),
        f_wlen.cast("int").alias("fl"),
        f_dup.cast("int").alias("fd"),
        f_stop.cast("int").alias("fs"))
    return (flags.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("fw").cast("bigint").alias("fail_words"),
        F.sum("fl").cast("bigint").alias("fail_wordlen"),
        F.sum("fd").cast("bigint").alias("fail_dupfrac"),
        F.sum("fs").cast("bigint").alias("fail_stopwords"),
        F.sum(F.when(F.col("fw") + F.col("fl") + F.col("fd")
                     + F.col("fs") == 0, 1).otherwise(0))
        .cast("bigint").alias("n_pass"))
        .orderBy("source", "lang"))


ORACLE_GOPHER = f"""
WITH m AS (
  SELECT source, lang,
         len(string_split(text, ' ')) AS nw,
         length(replace(text, ' ', '')) AS letters,
         len(list_distinct(string_split(text, ' '))) AS nd,
         len(list_intersect(list_distinct(string_split(text, ' ')),
             [{", ".join(repr(s) for s in _GQ_STOPWORDS)}])) AS stops
  FROM documents
), flags AS (
  SELECT source, lang,
         CASE WHEN nw < {_GQ_MIN_WORDS} OR nw > {_GQ_MAX_WORDS}
              THEN 1 ELSE 0 END AS fw,
         CASE WHEN letters < {_GQ_MIN_WLEN} * nw
               OR letters > {_GQ_MAX_WLEN} * nw THEN 1 ELSE 0 END AS fl,
         CASE WHEN (1000000 * CAST(nw - nd AS HUGEINT)) // nw
              > {_GQ_DUP_MAX_E6} THEN 1 ELSE 0 END AS fd,
         CASE WHEN stops < {_GQ_MIN_STOPS} THEN 1 ELSE 0 END AS fs
  FROM m
)
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(fw) AS BIGINT) AS fail_words,
       CAST(sum(fl) AS BIGINT) AS fail_wordlen,
       CAST(sum(fd) AS BIGINT) AS fail_dupfrac,
       CAST(sum(fs) AS BIGINT) AS fail_stopwords,
       CAST(sum(CASE WHEN fw + fl + fd + fs = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pass
FROM flags
GROUP BY source, lang
ORDER BY source, lang
"""


# ---------------------------------------------------------------------------
# c4_line_filter — line-level cleaning with ordered reassembly
# ---------------------------------------------------------------------------

_C4_LINE_WORDS = 10    # words per synthetic line
_C4_MIN_WORDS = 5      # C4: drop lines with < 5 words
_C4_BAD_TOKEN = "slow"  # stand-in for C4's bad-line markers


def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): split
    each document into lines, DROP lines that are too short
    (< {_C4_MIN_WORDS} words) or contain a blocklisted token
    ('{_C4_BAD_TOKEN}' stands in for C4's javascript/lorem/brace
    markers — the synthetic corpus has no punctuation, so lines are
    consecutive {_C4_LINE_WORDS}-word windows), then REASSEMBLE the
    survivors in original order. Per doc: line counts before/after,
    surviving char count, and md5 of the rebuilt text — the signature
    makes the reassembly byte-verifiable across engines.

    Scale shape: the line split is an in-row transform(sequence) —
    no shuffle — and posexplode gives (pos, line) rows that filter
    cheaply; reassembly is ONE groupBy(doc_id) with an order-pinned
    concat (sort_array over (pos, line) structs — deterministic
    without a window). Docs whose every line is dropped still emit a
    row (left join from the doc spine, chars_after = 0, md5 of '').
    At 100 TB this is explode -> filter -> re-agg with combinable
    partials; line order never needs a sort wider than one doc.
    """
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(words) / F.lit(_C4_LINE_WORDS)).cast("int")
    lines = d.select(
        "doc_id",
        F.posexplode(F.expr(
            f"transform(sequence(0, int(ceil(size(split(text, ' '))"
            f" / {_C4_LINE_WORDS})) - 1),"
            f" i -> array_join(slice(split(text, ' '),"
            f" i * {_C4_LINE_WORDS} + 1, {_C4_LINE_WORDS}), ' '))"))
        .alias("pos", "line"))
    kept = lines.filter(
        (F.size(F.split(F.col("line"), " ")) >= _C4_MIN_WORDS)
        & ~F.array_contains(F.split(F.col("line"), " "), _C4_BAD_TOKEN))
    agg = (kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept"),
        F.array_join(
            F.expr("transform(sort_array(collect_list("
                   "struct(pos, line))), s -> s.line)"), " ")
        .alias("rebuilt")))
    spine = d.select("doc_id", n_lines.alias("n_lines"))
    return (spine.join(agg, "doc_id", "left")
            .select(
                "doc_id",
                F.col("n_lines").cast("bigint").alias("n_lines"),
                F.coalesce(F.col("kept"), F.lit(0)).cast("bigint")
                .alias("kept_lines"),
                F.length(F.coalesce(F.col("rebuilt"), F.lit("")))
                .cast("bigint").alias("chars_after"),
                F.md5(F.coalesce(F.col("rebuilt"), F.lit("")))
                .alias("sig"))
            .orderBy("doc_id"))


ORACLE_C4 = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), lines AS (
  SELECT doc_id, i AS pos,
         array_to_string(
           words[i * {_C4_LINE_WORDS} + 1 : (i + 1) * {_C4_LINE_WORDS}],
           ' ') AS line
  FROM d, unnest(range(CAST(ceil(len(words) / {_C4_LINE_WORDS}.0)
                       AS BIGINT))) AS t(i)
), kept AS (
  SELECT doc_id, pos, line FROM lines
  WHERE len(string_split(line, ' ')) >= {_C4_MIN_WORDS}
    AND NOT list_contains(string_split(line, ' '), '{_C4_BAD_TOKEN}')
), agg AS (
  SELECT doc_id, count(*) AS kept,
         string_agg(line, ' ' ORDER BY pos) AS rebuilt
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(ceil(len(d.words) / {_C4_LINE_WORDS}.0) AS BIGINT)
         AS n_lines,
       CAST(coalesce(a.kept, 0) AS BIGINT) AS kept_lines,
       CAST(length(coalesce(a.rebuilt, '')) AS BIGINT) AS chars_after,
       md5(coalesce(a.rebuilt, '')) AS sig
FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# spearman_corr — tie-averaged Spearman from the joint distinct grid
# ---------------------------------------------------------------------------


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-averaged Spearman rank correlation between quantity
    and discount per return flag — the monotone-dependence check that
    survives the outliers Pearson (corr_report) is wrecked by.

    The trick that makes it scale: ranks are never assigned per ROW.
    Both variables are low-cardinality (qty 1..50, discount 0..10
    cents), so the corpus reduces to ONE combinable groupBy onto the
    joint (flag, x, y) grid (<= 550 cells per flag); tie-averaged
    ranks come from prefix sums over the per-variable marginals
    (windows over <= 50-row frames — tiny-by-construction), doubled
    to stay integral (avg rank = cum_before + (cnt+1)/2, so
    2*rank = 2*cum_before + cnt + 1). Pearson-on-ranks moments then
    accumulate in DECIMAL(38,0) over the grid (the factor 2 cancels
    in rho) and ONE closed-form double yields rho_e6 — the
    corr_report determinism rule. Moment bound: sxy <= 4n^3 holds in
    DECIMAL(38,0) to n ~ 1e11 rows per flag; past that the moments
    need a 256-bit lattice (documented, same bound class as
    corr_report).
    """
    l = _t(spark, sf_dir, "lineitem")
    joint = (l.select(
        F.col("l_returnflag").alias("flag"),
        F.round("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("y"))
        .groupBy("flag", "x", "y").agg(F.count(F.lit(1)).alias("cnt")))
    joint = joint.localCheckpoint()

    def marginal(col: str, rank_name: str) -> DataFrame:
        marg = joint.groupBy("flag", col).agg(F.sum("cnt").alias("mc"))
        w = (Window.partitionBy("flag").orderBy(col)
             .rowsBetween(Window.unboundedPreceding, -1))
        return marg.select(
            "flag", col,
            (2 * F.coalesce(F.sum("mc").over(w), F.lit(0))
             + F.col("mc") + 1).alias(rank_name))

    rx = marginal("x", "rx2")
    ry = marginal("y", "ry2")
    g = (joint.join(F.broadcast(rx), ["flag", "x"])
         .join(F.broadcast(ry), ["flag", "y"]))
    m = g.groupBy("flag").agg(
        F.sum("cnt").cast("decimal(38,0)").alias("n"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * rx2")).alias("sx"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * ry2")).alias("sy"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * rx2 * rx2"))
        .alias("sxx"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * ry2 * ry2"))
        .alias("syy"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * rx2 * ry2"))
        .alias("sxy"))
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    rho = ((nd * sxy - sx * sy)
           / F.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)))
    return (m.select(
        "flag",
        F.col("n").cast("bigint").alias("n_rows"),
        F.floor(rho * 1e6).cast("bigint").alias("rho_e6"))
        .orderBy("flag"))


ORACLE_SPEARMAN = """
WITH joint AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_discount * 100) AS BIGINT) AS y,
         count(*) AS cnt
  FROM lineitem GROUP BY 1, 2, 3
), mx AS (
  SELECT flag, x,
         2 * coalesce(sum(mc) OVER (PARTITION BY flag ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + mc + 1 AS rx2
  FROM (SELECT flag, x, sum(cnt) AS mc FROM joint GROUP BY 1, 2)
), my AS (
  SELECT flag, y,
         2 * coalesce(sum(mc) OVER (PARTITION BY flag ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + mc + 1 AS ry2
  FROM (SELECT flag, y, sum(cnt) AS mc FROM joint GROUP BY 1, 2)
), m AS (
  SELECT j.flag,
         CAST(sum(j.cnt) AS HUGEINT) AS n,
         CAST(sum(CAST(j.cnt AS HUGEINT) * rx2) AS HUGEINT) AS sx,
         CAST(sum(CAST(j.cnt AS HUGEINT) * ry2) AS HUGEINT) AS sy,
         CAST(sum(CAST(j.cnt AS HUGEINT) * rx2 * rx2) AS HUGEINT)
           AS sxx,
         CAST(sum(CAST(j.cnt AS HUGEINT) * ry2 * ry2) AS HUGEINT)
           AS syy,
         CAST(sum(CAST(j.cnt AS HUGEINT) * rx2 * ry2) AS HUGEINT)
           AS sxy
  FROM joint j
  JOIN mx ON j.flag = mx.flag AND j.x = mx.x
  JOIN my ON j.flag = my.flag AND j.y = my.y
  GROUP BY j.flag
)
SELECT flag, CAST(n AS BIGINT) AS n_rows,
       CAST(floor(
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         * 1e6) AS BIGINT) AS rho_e6
FROM m
ORDER BY flag
"""


# ---------------------------------------------------------------------------
# kendall_tau_grouped — tau-b from bounded within-order pair counts
# ---------------------------------------------------------------------------


def q_kendall_tau_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between quantity and price from concordant /
    discordant pairs WITHIN each order, bucketed by order size — "do
    bigger line items cost more, and does the effect strengthen with
    order size?". tau-b's n^2 pair enumeration is intractable
    corpus-wide; within natural groups of <= 7 lineitems it is <= 21
    pairs per order — total pairs linear in the corpus.

    Per pair (i < j by a per-order row_number — linenumbers DUPLICATE
    in this corpus, so a raw linenumber < would silently drop pairs;
    row_number over (linenumber, x, y) is a total order whose residual
    ties are between IDENTICAL rows, where either assignment yields
    the same pair statistics): concordant if sign(dx) * sign(dy) > 0,
    discordant if < 0, tied-in-x / tied-in-y otherwise. Buckets sum
    the integer counts; tau_b = (C - D) / sqrt((n0 - n1) * (n0 - n2))
    as ONE double over exact sums (n1/n2 = pairs tied in x / y, both
    counting double-ties, the standard tau-b marginals).

    Scale shape: the pair enumeration is a SELF-EQUI-JOIN on
    l_orderkey (shuffle-co-located, group-bounded fanout) — never a
    cross product; everything after is one combinable groupBy on the
    <= 7-row bucket key. Degenerate buckets (all pairs tied in a
    variable) emit NULL tau — both engines agree.

    The bucket key n_items is recovered ALGEBRAICALLY from the pair
    count — n0 = n(n-1)/2 inverts to n = (1 + sqrt(1 + 8*n0)) / 2,
    exact in IEEE because 1 + 8*n(n-1)/2 = (2n-1)^2 is ALWAYS a
    perfect square (the small magnitudes here keep every step well
    inside double precision) — instead of joining a separate per-order
    size aggregate (a third pass over the windowed frame plus a join;
    1-item orders produce no pairs and were inner-joined away in that
    form too, so the result set is identical). The inversion is only
    valid because `pairs` below enumerates EXACTLY all rn-ordered
    pairs of each order with no filter — see the invariant note there.
    r13 interleaved A/B: 0.93x sf0.1, 0.76x at 100x.
    """
    raw = (_t(spark, sf_dir, "lineitem")
           .select("l_orderkey", "l_linenumber",
                   F.round("l_quantity").cast("bigint").alias("x"),
                   F.round(F.col("l_extendedprice") * 100).cast("bigint")
                   .alias("y")))
    w = (Window.partitionBy("l_orderkey")
         .orderBy("l_linenumber", "x", "y"))
    l = raw.select("l_orderkey", "x", "y",
                   F.row_number().over(w).alias("rn"))
    a = l.alias("a")
    b = l.alias("b")
    # INVARIANT: this join must emit exactly ALL rn-ordered pairs of
    # each order — n0 == n(n-1)/2 per order is what makes the algebraic
    # n_items recovery above exact. Any future filter on the pair set
    # (or dedup upstream of it) would silently corrupt the bucket key.
    pairs = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.rn") < F.col("b.rn")))
             .select(F.col("a.l_orderkey").alias("l_orderkey"),
                     F.signum(F.col("b.x") - F.col("a.x")).alias("sx"),
                     F.signum(F.col("b.y") - F.col("a.y")).alias("sy")))
    pc = pairs.select(
        "l_orderkey",
        F.when(F.col("sx") * F.col("sy") > 0, 1).otherwise(0).alias("c"),
        F.when(F.col("sx") * F.col("sy") < 0, 1).otherwise(0).alias("d"),
        F.when(F.col("sx") == 0, 1).otherwise(0).alias("tx"),
        F.when(F.col("sy") == 0, 1).otherwise(0).alias("ty"))
    per_order = pc.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("c").alias("c"), F.sum("d").alias("d"),
        F.sum("tx").alias("tx"), F.sum("ty").alias("ty"))
    n_items = ((F.lit(1) + F.sqrt((F.lit(1) + 8 * F.col("n0"))
                                  .cast("double"))) / 2).cast("bigint")
    g = (per_order.withColumn("n_items", n_items)
         .groupBy("n_items").agg(
             F.count(F.lit(1)).alias("n_orders"),
             F.sum("n0").alias("n0"),
             F.sum("c").alias("conc"), F.sum("d").alias("disc"),
             F.sum("tx").alias("n1"), F.sum("ty").alias("n2")))
    num = (F.col("conc") - F.col("disc")).cast("double")
    den = F.sqrt((F.col("n0") - F.col("n1")).cast("double")
                 * (F.col("n0") - F.col("n2")).cast("double"))
    return (g.select(
        F.col("n_items").cast("bigint").alias("n_items"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("n0").cast("bigint").alias("n_pairs"),
        F.col("conc").cast("bigint").alias("conc"),
        F.col("disc").cast("bigint").alias("disc"),
        F.when(den > 0, F.floor(num / den * 1e6)).cast("bigint")
        .alias("taub_e6"))
        .orderBy("n_items"))


ORACLE_KENDALL = """
WITH l AS (
  SELECT l_orderkey,
         CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
         row_number() OVER (PARTITION BY l_orderkey
             ORDER BY l_linenumber,
                      CAST(round(l_quantity) AS BIGINT),
                      CAST(round(l_extendedprice * 100) AS BIGINT))
           AS rn
  FROM lineitem
), sz AS (
  SELECT l_orderkey, count(*) AS n_items FROM l GROUP BY 1
), pairs AS (
  SELECT a.l_orderkey,
         sign(b.x - a.x) AS sx, sign(b.y - a.y) AS sy
  FROM l a JOIN l b
    ON a.l_orderkey = b.l_orderkey
   AND a.rn < b.rn
), per_order AS (
  SELECT l_orderkey, count(*) AS n0,
         sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS c,
         sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS d,
         sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS tx,
         sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS ty
  FROM pairs GROUP BY 1
), g AS (
  SELECT sz.n_items, count(*) AS n_orders,
         CAST(sum(p.n0) AS HUGEINT) AS n0,
         CAST(sum(p.c) AS HUGEINT) AS conc,
         CAST(sum(p.d) AS HUGEINT) AS disc,
         CAST(sum(p.tx) AS HUGEINT) AS n1,
         CAST(sum(p.ty) AS HUGEINT) AS n2
  FROM per_order p JOIN sz ON p.l_orderkey = sz.l_orderkey
  GROUP BY 1
)
SELECT CAST(n_items AS BIGINT) AS n_items,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(n0 AS BIGINT) AS n_pairs,
       CAST(conc AS BIGINT) AS conc,
       CAST(disc AS BIGINT) AS disc,
       CASE WHEN (n0 - n1) * (n0 - n2) > 0 THEN
         CAST(floor(CAST(conc - disc AS DOUBLE)
              / sqrt(CAST(n0 - n1 AS DOUBLE)
                     * CAST(n0 - n2 AS DOUBLE)) * 1e6) AS BIGINT)
       END AS taub_e6
FROM g
ORDER BY n_items
"""


# ---------------------------------------------------------------------------
# cramers_v_report — effect size over the brand x size-band grid
# ---------------------------------------------------------------------------

_CV_BAND = 10   # p_size band width


def q_cramers_v_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for brand x size-band association over
    the part catalog — chi_square_report answers "is segment x region
    independent?"; this answers the question that matters for a
    feature audit: HOW strong is the association (V in [0,1], with
    V^2 = chi^2 / (n * min(r-1, c-1)) reported exactly on the e6
    lattice so no sqrt enters the comparison).

    All-integer on exact counts (the chi_square_report lattice):
    expected_e6 = row_total * col_total * 1e6 div n; cell term_e6 =
    (obs*1e6 - expected_e6)^2 div (expected_e6 * 1e6); chi2_e6 = sum;
    v2_e6 = chi2_e6 div (n * min(r-1, c-1)). One combinable groupBy
    over the corpus onto a |brands| x |bands| grid; marginals and the
    final scalar derive from that driver-tiny grid via broadcasts.
    """
    p = _t(spark, sf_dir, "part")
    obs = (p.select(F.col("p_brand").alias("brand"),
                    F.expr(f"p_size div {_CV_BAND}").alias("band"))
           .groupBy("brand", "band")
           .agg(F.count(F.lit(1)).alias("obs")))
    rt = obs.groupBy("brand").agg(F.sum("obs").alias("rt"))
    ct = obs.groupBy("band").agg(F.sum("obs").alias("ct"))
    tot = obs.agg(F.sum("obs").alias("n_total"),
                  F.countDistinct("brand").alias("r"),
                  F.countDistinct("band").alias("c"))
    g = (obs.join(F.broadcast(rt), "brand")
         .join(F.broadcast(ct), "band")
         .join(F.broadcast(tot))
         .withColumn("expected_e6",
                     F.expr("CAST(rt AS DECIMAL(38,0)) * ct * 1000000"
                            " div n_total")))
    term = F.expr(
        "(CAST(obs AS DECIMAL(38,0)) * 1000000 - expected_e6)"
        " * (CAST(obs AS DECIMAL(38,0)) * 1000000 - expected_e6)"
        " div (expected_e6 * 1000000)")
    return (g.select(F.col("n_total"), F.col("r"), F.col("c"),
                     term.alias("term_e6"))
            .groupBy("n_total", "r", "c")
            .agg(F.sum("term_e6").alias("chi2_e6"))
            .select(
                F.col("n_total").cast("bigint").alias("n_parts"),
                F.expr("(r - 1) * (c - 1)").cast("bigint").alias("dof"),
                F.col("chi2_e6").cast("bigint").alias("chi2_e6"),
                F.expr("chi2_e6 div (n_total *"
                       " least(r - 1, c - 1))").cast("bigint")
                .alias("v2_e6")))


ORACLE_CRAMERS = f"""
WITH obs AS (
  SELECT p_brand AS brand, p_size // {_CV_BAND} AS band,
         count(*) AS obs
  FROM part GROUP BY 1, 2
), rt AS (SELECT brand, sum(obs) AS rt FROM obs GROUP BY 1),
ct AS (SELECT band, sum(obs) AS ct FROM obs GROUP BY 1),
tot AS (SELECT sum(obs) AS n_total,
               count(DISTINCT brand) AS r,
               count(DISTINCT band) AS c FROM obs),
g AS (
  SELECT o.obs, tot.n_total, tot.r, tot.c,
         (CAST(rt.rt AS HUGEINT) * ct.ct * 1000000) // tot.n_total
           AS expected_e6
  FROM obs o JOIN rt ON o.brand = rt.brand
  JOIN ct ON o.band = ct.band
  CROSS JOIN tot
), s AS (
  SELECT n_total, r, c,
         sum((CAST(obs AS HUGEINT) * 1000000 - expected_e6)
             * (CAST(obs AS HUGEINT) * 1000000 - expected_e6)
             // (expected_e6 * 1000000)) AS chi2_e6
  FROM g GROUP BY 1, 2, 3
)
SELECT CAST(n_total AS BIGINT) AS n_parts,
       CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       CAST(chi2_e6 AS BIGINT) AS chi2_e6,
       CAST(chi2_e6 // (n_total * least(r - 1, c - 1)) AS BIGINT)
         AS v2_e6
FROM s
"""


QUERIES_EXT26.update({
    "gopher_quality_flags": q_gopher_quality_flags,
    "c4_line_filter": q_c4_line_filter,
    "spearman_corr": q_spearman_corr,
    "kendall_tau_grouped": q_kendall_tau_grouped,
    "cramers_v_report": q_cramers_v_report,
})
ORACLE_EXT26.update({
    "gopher_quality_flags": ORACLE_GOPHER,
    "c4_line_filter": ORACLE_C4,
    "spearman_corr": ORACLE_SPEARMAN,
    "kendall_tau_grouped": ORACLE_KENDALL,
    "cramers_v_report": ORACLE_CRAMERS,
})
