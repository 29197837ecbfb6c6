"""Streaming incremental dedup: probe arriving documents against a
STATIC LSH band-table index — the streaming twin of
plans.queries_ext8.q_incremental_dedup (same signature family, same
band format, same signature-space Jaccard verdict).

The whole probe is STATELESS per micro-batch: the MinHash signature is
computed with pure column expressions (array_min over transform — no
explode + groupBy, so no streaming aggregation / watermark is needed),
bands explode to (band, bucket) rows, and the index joins in as a
static broadcast (the enrich_stream shape). Output is candidate-level
(doc_id, index_id, band, est_e6, is_dup) rows in append mode — a pair
sharing both bands emits twice, and per-doc aggregation (max estimate,
final verdict) belongs to the consumer / foreachBatch sink, exactly
like the batch pipeline's per_doc step. This keeps the stream free of
state stores entirely.

Index-build note: the hot-bucket cap here is applied when the INDEX is
built (cap over index bucket population). The batch bootstrap caps
over the whole corpus — a stream cannot cap against documents it has
not seen yet, so the streaming gate is the index-side cap by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import tokens_col

INDEX_PROBE_DUP_E6 = 500_000


def streaming_signature(text_col: str = "text", k: int = 4) -> list:
    """MinHash signature as pure column expressions (no shuffle):
    mh_i = min over tokens of md5(i || ':' || token) — identical values
    to operators.dedup.minhash_signatures (min over a distinct token
    set equals min over the multiset), but legal in a streaming SELECT."""
    toks = tokens_col(text_col)

    def hasher(i: int):
        # MUST stay a 1-arg lambda: a 2-arg lambda would make transform
        # bind the second parameter to the ARRAY INDEX (the (x, i)
        # overload), silently replacing the hash-family index
        return lambda t: F.md5(F.concat(F.lit(f"{i}:"), t))

    return [
        F.array_min(F.transform(toks, hasher(i))).alias(f"mh{i}")
        for i in range(k)
    ]


def index_probe_stream(docs: DataFrame, index_bands: DataFrame,
                       index_sigs: DataFrame, k: int = 4,
                       bands: int = 2) -> DataFrame:
    """Probe a (streaming) docs frame (doc_id, text) against a static
    dedup index: `index_bands` = (id, band, bucket) rows (persisted
    lsh_band_table output, hot-bucket-capped at build time),
    `index_sigs` = (id, mh0..mh{k-1}).

    Returns append-mode candidate rows (doc_id, index_id, band,
    est_e6, is_dup)."""
    from ..operators.dedup import lsh_band_table
    sig = docs.select(F.col("doc_id").alias("id"),
                      *streaming_signature("text", k))
    # the probe side builds its buckets through the SAME helper that
    # defines the index format (keep= carries the mh components along
    # for the signature-space verify — no stream-stream self-join)
    banded = lsh_band_table(
        sig, k, bands, keep=tuple(f"mh{i}" for i in range(k))) \
        .withColumnRenamed("id", "doc_id")
    idx = index_bands.select(F.col("id").alias("index_id"), "band",
                             "bucket")
    isig = index_sigs.select(F.col("id").alias("index_id"),
                             *[F.col(f"mh{i}").alias(f"i{i}")
                               for i in range(k)])
    est = sum((F.col(f"mh{i}") == F.col(f"i{i}")).cast("int")
              for i in range(k)) * F.lit(1_000_000 // k)
    return (banded.join(F.broadcast(idx), ["band", "bucket"])
            .join(F.broadcast(isig), "index_id")
            .select("doc_id", "index_id", "band",
                    est.alias("est_e6"),
                    (est >= INDEX_PROBE_DUP_E6).alias("is_dup")))
