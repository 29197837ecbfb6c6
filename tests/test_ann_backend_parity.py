"""Parity pin for lsh_topk's scoring-backend auto-selection.

lsh_topk auto-switches candidate scoring from the JVM whole-stage-
codegen cosine fold to the Arrow/numpy backend at >= 8 sized bits
(operators/ann.py) — past the measured ~1e5-candidate crossover where
the Python-worker floor amortizes (SURVEY 4.4; r10 100x probe: 29.4s
JVM vs 18.4s numpy warm). The switch is only sound if the two backends
produce IDENTICAL rank tables: float fold ORDER differs (sequential
JVM fold vs numpy pairwise summation), and _salted_topk's quantized
ordering — round(sim, 9) desc, neighbor_id — is what absorbs that
last-ulp divergence.

This test pins the contract the auto-switch relies on, at a size that
actually exercises the numpy path semantics (both backends forced
explicitly, so the pin holds regardless of where the auto threshold
moves): same vectors, both backends, exceptAll-empty in both
directions, and the self-kNN shared-bucket path (queries IS corpus)
agrees with the two-distinct-frames path.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from research_index_backend_spark.operators.ann import lsh_topk

_N = 600       # enough for multi-row buckets at 4 bits, fast in CI
_DIM = 8


def _vectors(spark):
    # Deterministic pseudo-random unit-ish vectors: sin of a lattice —
    # no RNG, so the pin is byte-stable across runs and engines.
    rows = [
        (i, [math.sin(0.1 * i * (j + 1) + 0.7 * j) for j in range(_DIM)])
        for i in range(_N)
    ]
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])
    return spark.createDataFrame(rows, schema).repartition(4)


def test_numpy_and_jvm_backends_rank_identically(spark):
    emb = _vectors(spark).localCheckpoint()
    jvm = lsh_topk(emb, emb, k=5, n_bits=4,
                   broadcast_queries=False, use_numpy=False)
    np_ = lsh_topk(emb, emb, k=5, n_bits=4,
                   broadcast_queries=False, use_numpy=True)
    cols = ["query_id", "neighbor_id", "rnk"]
    a, b = jvm.select(*cols), np_.select(*cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_self_knn_shared_bucket_path_matches_two_frame_path(spark):
    emb = _vectors(spark).localCheckpoint()
    # identical frame CONTENT via a second lineage: the `queries is
    # corpus` identity check must not fire, forcing the two-sided plan
    emb2 = emb.select("vec_id", "embedding")
    shared = lsh_topk(emb, emb, k=5, n_bits=4, broadcast_queries=False)
    two = lsh_topk(emb, emb2, k=5, n_bits=4, broadcast_queries=False)
    cols = ["query_id", "neighbor_id", "rnk"]
    a, b = shared.select(*cols), two.select(*cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_auto_threshold_boundary():
    # the auto rule itself: JVM below 8 sized bits, numpy at >= 8 —
    # guard against silent threshold drift flipping checked-SF plans
    import inspect

    from research_index_backend_spark.operators import ann

    src = inspect.getsource(ann.lsh_topk)
    assert "n_bits >= 8" in src
