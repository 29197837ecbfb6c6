"""CDC changelog sink: version-aware MERGE with retained tombstones
(operators/cdc.py) + the foreachBatch streaming loop (streaming/cdc.py).

The invariant under test is REPLAY SAFETY: at-least-once redelivery of
any historical changelog slice — including a PARTIAL slice older than a
delete — must never resurrect deleted keys or regress rows, because
application compares stored version columns and deletes persist as
versioned tombstones. Naive upsert-by-key sinks fail exactly this.
"""

from __future__ import annotations

from research_index_backend_spark.operators.cdc import (
    cdc_merge,
    cdc_reduce,
    cdc_state,
)

COLS = ["k", "op", "ts", "seq", "val"]


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _live(stored):
    return {r["k"]: r["val"] for r in cdc_state(stored).collect()}


class TestCdcMerge:
    def test_bootstrap_from_empty(self, spark):
        b = _df(spark, [("a", "upsert", 1, 1, 10),
                        ("a", "upsert", 2, 1, 11),   # later ts wins
                        ("b", "upsert", 1, 1, 20),
                        ("c", "upsert", 1, 1, 30),
                        ("c", "delete", 2, 1, 0)])   # trailing delete
        stored = cdc_merge(None, b, ["k"], ["ts", "seq"])
        assert _live(stored) == {"a": 11, "b": 20}
        # the delete is RETAINED as a versioned tombstone, not dropped
        tomb = [r for r in stored.collect() if r["__cdc_deleted"]]
        assert [(r["k"], r["ts"]) for r in tomb] == [("c", 2)]

    def test_incremental_apply_and_tombstone(self, spark):
        state = cdc_merge(None, _df(spark, [
            ("a", "upsert", 1, 1, 10), ("b", "upsert", 1, 1, 20)]),
            ["k"], ["ts", "seq"])
        b2 = _df(spark, [("a", "upsert", 3, 1, 99),
                         ("b", "delete", 3, 1, 0),
                         ("d", "upsert", 3, 1, 40)])
        assert _live(cdc_merge(state, b2, ["k"], ["ts", "seq"])) == \
            {"a": 99, "d": 40}

    def test_partial_replay_never_resurrects(self, spark):
        """The headline invariant: replay ONLY the old slice against the
        advanced state — the tombstone's newer version must beat the
        replayed upsert, and newer rows must not regress."""
        b1 = _df(spark, [("a", "upsert", 1, 1, 10),
                         ("b", "upsert", 1, 1, 20)])
        b2 = _df(spark, [("a", "upsert", 3, 1, 99),
                         ("b", "delete", 3, 1, 0)])
        state = cdc_merge(cdc_merge(None, b1, ["k"], ["ts", "seq"]),
                          b2, ["k"], ["ts", "seq"])
        replayed = cdc_merge(state, b1, ["k"], ["ts", "seq"])
        assert _live(replayed) == {"a": 99}  # b stays dead, a stays 99

    def test_newer_upsert_revives_tombstoned_key(self, spark):
        """A genuinely NEW upsert (version past the delete) must bring
        the key back — tombstones block history, not the future."""
        state = cdc_merge(None, _df(spark, [
            ("b", "upsert", 1, 1, 20), ("b", "delete", 3, 1, 0)]),
            ["k"], ["ts", "seq"])
        revived = cdc_merge(state, _df(spark, [
            ("b", "upsert", 5, 1, 21)]), ["k"], ["ts", "seq"])
        assert _live(revived) == {"b": 21}

    def test_equal_version_redelivery_idempotent(self, spark):
        """>= on the version struct: exact redelivery of the LATEST op
        per key rewrites the same row."""
        b = _df(spark, [("a", "upsert", 5, 2, 77)])
        state = cdc_merge(None, b, ["k"], ["ts", "seq"])
        again = cdc_merge(state, b, ["k"], ["ts", "seq"])
        assert _live(again) == {"a": 77}
        assert again.count() == 1

    def test_reduce_last_op_per_key(self, spark):
        b = _df(spark, [("a", "upsert", 1, 1, 1),
                        ("a", "delete", 1, 2, 0),
                        ("a", "upsert", 2, 1, 3)])
        rows = cdc_reduce(b, ["k"], ["ts", "seq"]).collect()
        assert len(rows) == 1
        assert rows[0]["val"] == 3 and rows[0]["op"] == "upsert"


class TestForeachBatchCdc:
    def test_microbatch_changelog_stream(self, spark, tmp_path):
        """Two micro-batches through the real streaming loop, then a
        full at-least-once replay with a fresh checkpoint: live state
        identical both times."""
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from research_index_backend_spark.streaming.cdc import (
            foreach_batch_cdc,
        )

        schema = StructType([
            StructField("k", StringType()),
            StructField("op", StringType()),
            StructField("ts", LongType()),
            StructField("seq", LongType()),
            StructField("val", LongType()),
        ])
        src = tmp_path / "src"
        src.mkdir()
        _df(spark, [("a", "upsert", 1, 1, 10), ("b", "upsert", 1, 1, 20),
                    ("c", "upsert", 1, 1, 30)]) \
            .coalesce(1).write.parquet(str(src / "b1"))
        _df(spark, [("b", "delete", 2, 1, 0), ("a", "upsert", 2, 1, 11),
                    ("d", "upsert", 2, 1, 40), ("d", "delete", 2, 2, 0)]) \
            .coalesce(1).write.parquet(str(src / "b2"))

        target = str(tmp_path / "state")
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(str(src / "*")))
        q = foreach_batch_cdc(stream, target, ["k"], ["ts", "seq"],
                              str(tmp_path / "ck1"))
        q.awaitTermination(120)
        assert _live(spark.read.parquet(target)) == {"a": 11, "c": 30}

        stream2 = (spark.readStream.schema(schema)
                   .option("maxFilesPerTrigger", "1").parquet(str(src / "*")))
        q2 = foreach_batch_cdc(stream2, target, ["k"], ["ts", "seq"],
                               str(tmp_path / "ck2"))
        q2.awaitTermination(120)
        assert _live(spark.read.parquet(target)) == {"a": 11, "c": 30}


class TestCdcCompact:
    def test_gc_drops_only_prehorizon_tombstones(self, spark, tmp_path):
        from research_index_backend_spark.operators.cdc import (
            cdc_apply_parquet,
            cdc_compact,
        )
        target = str(tmp_path / "state")
        cdc_apply_parquet(spark, _df(spark, [
            ("a", "upsert", 1, 1, 10),      # old live row
            ("b", "delete", 2, 1, 0),       # pre-horizon tombstone
            ("c", "delete", 9, 1, 0),       # post-horizon tombstone
            ("d", "upsert", 9, 1, 40)]),    # fresh live row
            target, ["k"], ["ts", "seq"])
        cdc_compact(spark, target, ["ts", "seq"], horizon=(5, 0),
                    n_files=1)
        stored = spark.read.parquet(target)
        # b's marker is unreplayable history -> gone; c's still guards
        assert {r["k"] for r in stored.collect()} == {"a", "c", "d"}
        assert _live(stored) == {"a": 10, "d": 40}
        # live rows survive regardless of age (a is older than horizon)
        import glob
        assert len(glob.glob(target + "/part-*")) == 1
