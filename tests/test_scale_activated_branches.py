"""Hash-verification of the scale-activated branches no official
oracle sees (r12 VERDICT next-round item 1).

Two plan families carry corpus-adaptive branches that only activate at
probe scale, where the driver checks wall-time, not hashes:

- record_linkage's blocking ladder levels 3/4 (plans/queries_ext7.py:
  _rl_refine — full noun/adj token block keys past 960k/7.68M rows);
- adaptive_lsh_bits past the 4-bit floor (operators/dedup.py — 8 bits
  from ~16k vectors, 11 from ~200k).

These tests close the blind spot with BOTH proofs the verdict asked
for, using the refine seams (module constants / the sizing function)
to force activation at sf0.01 where exact comparison is feasible:

1. PARAMETRIC ORACLE: force the branch on and hash-compare the full
   output against a DuckDB oracle carrying the same refinement — an
   end-to-end value check of the activated code path itself.
2. PLANTED-DUP INVARIANCE: on a corpus where the true duplicates agree
   on every compared field (the population these operators exist to
   find), the activated branch must change CANDIDATES (strictly fewer
   pairs enter scoring) but not ANSWERS (identical clerical queue /
   identical near-dup pair set).

Empirical note pinned here for honesty: on the raw TPC-H part corpus
at sf0.01 the level-4 top-20 is NOT identical to level 0 (only 5 of 20
top pairs are full-agreement at that density) — blocked linkage trades
exactly that recall, which is why checked SFs stay at level 0 and why
the invariance claim is stated — and verified — over planted full-
agreement duplicates, not arbitrary pairs.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from research_index_backend_spark.operators import dedup as D
from research_index_backend_spark.plans import queries as Q
from research_index_backend_spark.plans import queries_ext7 as Q7

SF = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="testdata not present")


def _duck(sql: str, views: dict[str, str]):
    import duckdb
    con = duckdb.connect()
    for name, path in views.items():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con.execute(sql).fetchall()


# ---------------------------------------------------------------------------
# record_linkage blocking ladder levels 3/4
# ---------------------------------------------------------------------------

_RL_L4_ANCHOR = "AND a.p_partkey < b.p_partkey"


def _rl_oracle_level4() -> str:
    """ORACLE_RECORD_LINKAGE with the level-3/4 block keys folded into
    the join: full noun + adj equality (the letter-prefix levels 1/2
    are implied by the full tokens)."""
    assert _RL_L4_ANCHOR in Q7.ORACLE_RECORD_LINKAGE, \
        "oracle join anchor moved; update the level-4 rewrite"
    return Q7.ORACLE_RECORD_LINKAGE.replace(
        _RL_L4_ANCHOR,
        "AND a.noun = b.noun AND a.adj = b.adj " + _RL_L4_ANCHOR)


class TestRecordLinkageLadder:
    def test_forced_level4_matches_parametric_oracle(
            self, spark, monkeypatch):
        """Activate ladder level 4 at sf0.01 via the refine seam and
        hash-compare the whole top-20 against a DuckDB oracle carrying
        the same block keys — the first value-level check the level-3/4
        join branch has ever had."""
        monkeypatch.setattr(Q7, "_RL_REFINE_AT", (0, 0, 0, 0))
        got = [tuple(r) for r in Q7.q_record_linkage(spark, SF).collect()]
        exp = _duck(_rl_oracle_level4(),
                    {"part": os.path.join(SF, "part.parquet")})
        exp = [tuple(int(v) for v in row) for row in exp]
        assert got == exp
        assert len(got) == Q7._RL_TOPK

    def _planted_corpus(self, tmp_path, n_base=4000, n_dups=25):
        """Synthetic part table: diverse base population + planted
        exact-duplicate pairs that agree on every compared field
        (adj, noun, size, price band) inside their (brand, type)
        block. Deterministic (seeded) so the test is stable."""
        rng = np.random.default_rng(42)
        adjs = ["shiny", "dull", "warm", "cold", "soft",
                "hard", "light", "dark"]
        nouns = [f"noun{i:02d}" for i in range(40)]
        brand = [f"Brand#{i % 10}" for i in range(n_base)]
        ptype = [f"TYPE {rng.integers(0, 20)}" for _ in range(n_base)]
        name = [f"{rng.choice(adjs)} {rng.choice(nouns)} widget"
                for _ in range(n_base)]
        size = rng.integers(1, 51, n_base).tolist()
        price = (900 + rng.integers(0, 110000, n_base) / 100.0).tolist()
        key = list(range(1, n_base + 1))
        dup_src = rng.choice(n_base, n_dups, replace=False)
        for j, i in enumerate(dup_src):
            key.append(n_base + 1 + j)
            brand.append(brand[i])
            ptype.append(ptype[i])
            name.append(name[i])
            size.append(size[i])
            price.append(price[i])
        import pyarrow as pa
        import pyarrow.parquet as pq
        pq.write_table(pa.table({
            "p_partkey": pa.array(key, pa.int64()),
            "p_brand": brand, "p_type": ptype, "p_name": name,
            "p_size": pa.array(size, pa.int32()),
            "p_retailprice": pa.array(price, pa.float64()),
        }), tmp_path / "part.parquet")
        return str(tmp_path)

    def test_ladder_changes_candidates_not_answers_on_planted_dups(
            self, spark, tmp_path, monkeypatch):
        """On the planted-dup corpus the full ladder must shrink the
        candidate set strictly while returning the identical clerical
        queue: every top-20 pair is full-agreement, so no blocked
        level can evict it."""
        sf = self._planted_corpus(tmp_path)
        # n=4025 < 15k: the unpatched plan runs at level 0
        assert Q7._rl_refine(4025) == 0
        lvl0 = [tuple(r) for r in Q7.q_record_linkage(spark, sf).collect()]
        monkeypatch.setattr(Q7, "_RL_REFINE_AT", (0, 0, 0, 0))
        lvl4 = [tuple(r) for r in Q7.q_record_linkage(spark, sf).collect()]
        assert lvl0 == lvl4, \
            "ladder changed the clerical queue on full-agreement dups"
        # the invariance must not be vacuous: the queue is the planted
        # full-agreement population at the maximum possible score
        assert len(lvl0) == Q7._RL_TOPK
        assert all(r[2] == r[3] == r[4] == r[5] == 1 for r in lvl0), \
            "top-20 must be full-agreement pairs on this corpus"
        assert len({r[6] for r in lvl0}) == 1  # one (max) score value
        # and the ladder really did cut candidates (strictly)
        part = str(tmp_path / "part.parquet")
        n0, n4 = (_duck(f"""
            WITH p AS (SELECT p_partkey, p_brand, p_type,
                              string_split(p_name, ' ')[1] AS adj,
                              string_split(p_name, ' ')[2] AS noun
                       FROM part)
            SELECT count(*) FROM p a JOIN p b
              ON a.p_brand = b.p_brand AND a.p_type = b.p_type
             {extra} AND a.p_partkey < b.p_partkey
            """.format(extra=extra), {"part": part})[0][0]
            for extra in ("", "AND a.adj = b.adj AND a.noun = b.noun"))
        assert n4 < n0, (n0, n4)
        # every planted dup pair survives level-4 blocking
        assert n4 >= 25


# ---------------------------------------------------------------------------
# adaptive_lsh_bits activation (operators/dedup.py)
# ---------------------------------------------------------------------------

_LSH_4BIT_ANCHOR = """(CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)"""


def _lsh_oracle(n_bits: int) -> str:
    """ORACLE_DEDUP_EMBEDDING generalized to n_bits sign planes."""
    assert _LSH_4BIT_ANCHOR in Q.ORACLE_DEDUP_EMBEDDING, \
        "oracle bucket expression moved; update the n-bit rewrite"
    expr = "\n       + ".join(
        f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {2 ** i} ELSE 0 END)"
        for i in range(n_bits))
    return Q.ORACLE_DEDUP_EMBEDDING.replace(_LSH_4BIT_ANCHOR, expr)


class TestAdaptiveLshBits:
    def test_forced_8bit_matches_parametric_oracle(
            self, spark, monkeypatch):
        """Force the sizing function to the first activated value
        (8 bits — what a ~16k-32k-vector corpus gets) and hash-compare
        dedup_embedding's full pair set against the 8-plane DuckDB
        oracle on the same data."""
        monkeypatch.setattr(D, "adaptive_lsh_bits",
                            lambda n_rows, **kw: 8)
        got = sorted(tuple(r) for r in
                     Q.q_dedup_embedding(spark, SF).collect())
        exp = sorted((int(a), int(b), int(s)) for a, b, s in
                     _duck(_lsh_oracle(8),
                           {"embeddings":
                            os.path.join(SF, "embeddings.parquet")}))
        assert got == exp
        # not vacuous: 8-bit bucketing still yields candidate pairs here
        assert got, "8-bit run found no pairs — corpus too sparse to test"

    def test_bits_change_candidates_not_answers_on_planted_dups(
            self, spark):
        """Planted near-dup pairs constructed to share sign buckets at
        ANY plane count (equal first 8 coordinates, noise beyond):
        raising bits from 4 to 8 must strictly shrink the candidate
        set while the emitted near-dup pair set is identical."""
        rng = np.random.default_rng(7)
        n, dim, n_dups = 600, 64, 12
        vecs = rng.standard_normal((n, dim))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        rows = [(i, [float(v) for v in vecs[i]]) for i in range(n)]
        dup_src = rng.choice(n, n_dups, replace=False)
        for j, i in enumerate(dup_src):
            d = vecs[i].copy()
            d[8:] += rng.standard_normal(dim - 8) * 1e-3  # cosine ~0.999,
            # first 8 coords untouched -> same bucket at 4 AND 8 bits
            rows.append((n + j, [float(v) for v in d]))
        corpus = spark.createDataFrame(
            rows, "vec_id: bigint, embedding: array<float>")
        out = {}
        for bits in (4, 8):
            out[bits] = sorted(
                (r["id_a"], r["id_b"]) for r in
                D.embedding_near_dup_pairs(
                    corpus, threshold_e6=900_000, n_bits=bits,
                    max_bucket_size=100, max_bucket_denom=4).collect())
        assert out[4] == out[8], \
            "bit count changed the near-dup answer on planted dups"
        planted = sorted((int(min(i, n + j)), int(max(i, n + j)))
                         for j, i in enumerate(dup_src))
        assert out[4] == planted
        # candidates strictly shrink: same sign-bucket math in numpy
        arr = np.array([v for _, v in rows], dtype=np.float32)

        def n_candidates(bits: int) -> int:
            signs = (arr[:, :bits] >= 0).astype(np.int64)
            buckets = signs @ (2 ** np.arange(bits))
            _, counts = np.unique(buckets, return_counts=True)
            return int((counts * (counts - 1) // 2).sum())

        assert n_candidates(8) < n_candidates(4)
