"""Stats sidecar (sources/stats.py): footer counts + the single
fallback path.

The sidecar replaces plan-build ``df.count()`` jobs with parquet-footer
row counts (round-9/10 VERDICT items); round-10 item 5 asked for ONE
shared fallback helper so a deployment without footer access (object
store) pays at most one count job per table per session. These tests
pin both halves: footer == Spark count on real testdata, and the
fallback counts once, caches, and logs.
"""

from __future__ import annotations

import logging
import os

import pytest

from research_index_backend_spark.sources import stats

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present")


def test_footer_rowcount_matches_spark(spark):
    df = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    assert stats.table_rowcount(SF_DIR, "nation") == df.count()


def test_footer_rowcount_memoized():
    a = stats.table_rowcount(SF_DIR, "region")
    # second call must hit the (path, mtime, size) cache
    path = os.path.join(SF_DIR, "region.parquet")
    st = os.stat(path)
    assert (path, st.st_mtime, st.st_size) in stats._CACHE
    assert stats.table_rowcount(SF_DIR, "region") == a


def test_rowcount_missing_path_raises_oserror():
    with pytest.raises(OSError):
        stats.table_rowcount(SF_DIR, "no_such_table")


def test_footer_rowcount_directory_of_parts(tmp_path):
    # multi-part layout (what a real Spark write produces): footer
    # counts must sum across part files and skip _SUCCESS/dot markers
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path / "t.parquet"
    d.mkdir()
    pq.write_table(pa.table({"a": list(range(7))}), d / "part-0.parquet")
    pq.write_table(pa.table({"a": list(range(5))}), d / "part-1.parquet")
    (d / "_SUCCESS").write_text("")
    (d / ".part-0.parquet.crc").write_text("x")
    assert stats.table_rowcount(str(tmp_path), "t") == 12


def test_footer_rowcount_empty_directory_raises(tmp_path):
    (tmp_path / "t.parquet").mkdir()
    with pytest.raises(OSError):
        stats.table_rowcount(str(tmp_path), "t")


class _CountingFrame:
    """Fake DataFrame: records how many count() jobs the fallback ran."""

    def __init__(self, n):
        self.n = n
        self.jobs = 0

    def select(self, _col):
        return self

    def count(self):
        self.jobs += 1
        return self.n


def test_fallback_counts_once_per_table_and_logs(caplog):
    stats._FALLBACK_CACHE.clear()
    df = _CountingFrame(42)
    with caplog.at_level(logging.WARNING,
                         logger="research_index_backend_spark.sources.stats"):
        n1 = stats.table_rowcount_or_count("/nonexistent/sf", "t", df, "k")
        n2 = stats.table_rowcount_or_count("/nonexistent/sf", "t", df, "k")
    assert (n1, n2) == (42, 42)
    assert df.jobs == 1, "fallback must cache per (sf_dir, table)"
    assert any("stats sidecar unavailable" in r.message for r in caplog.records)
    # a different table is a separate cache entry
    df2 = _CountingFrame(7)
    assert stats.table_rowcount_or_count("/nonexistent/sf", "u", df2, "k") == 7
    assert df2.jobs == 1
    stats._FALLBACK_CACHE.clear()


def test_fallback_prefers_sidecar_when_available():
    df = _CountingFrame(999)
    n = stats.table_rowcount_or_count(SF_DIR, "region", df, "k")
    assert df.jobs == 0, "footer path must not run a Spark job"
    assert n == stats.table_rowcount(SF_DIR, "region")


def test_fallback_key_normalized_across_spellings():
    # r12 ADVICE item 1: sizing caller and invalidation hook may spell
    # the same sf_dir differently (trailing slash, relative segments);
    # the cache key must normalize so invalidate can never miss.
    stats._FALLBACK_CACHE.clear()
    df = _CountingFrame(11)
    assert stats.table_rowcount_or_count(
        "/nonexistent/sf", "t", df, "k") == 11
    # trailing slash + redundant segment hit the SAME entry
    assert stats.table_rowcount_or_count(
        "/nonexistent/sf/", "t", df, "k") == 11
    assert stats.table_rowcount_or_count(
        "/nonexistent/./sf", "t", df, "k") == 11
    assert df.jobs == 1, "all spellings must share one cache entry"
    # invalidation under a different spelling drops the sizing entry
    stats.invalidate_rowcount("/nonexistent/sf/", "t")
    df.n = 33
    assert stats.table_rowcount_or_count(
        "/nonexistent/sf", "t", df, "k") == 33
    assert df.jobs == 2
    stats._FALLBACK_CACHE.clear()


def test_invalidate_rowcount_forces_recount():
    # r11 ADVICE item 4: the fallback cache has no mtime keying, so the
    # atomic-swap upsert path must be able to drop one table's entry.
    stats._FALLBACK_CACHE.clear()
    df = _CountingFrame(10)
    assert stats.table_rowcount_or_count("/nonexistent/sf", "t", df, "k") == 10
    stats.invalidate_rowcount("/nonexistent/sf", "t")
    df.n = 25  # table rewritten
    assert stats.table_rowcount_or_count("/nonexistent/sf", "t", df, "k") == 25
    assert df.jobs == 2, "invalidate must force exactly one re-count"
    # invalidating an absent entry is a no-op
    stats.invalidate_rowcount("/nonexistent/sf", "never-counted")
    stats._FALLBACK_CACHE.clear()
