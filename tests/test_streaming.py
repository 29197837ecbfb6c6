"""Structured Streaming twins: one availableNow micro-batch pass must
reproduce the batch window semantics, and the foreachBatch upsert loop
must MERGE idempotently."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from research_index_backend_spark.streaming.windows import (
    foreach_batch_upsert,
    ohlc_bars_stream,
    read_events_stream,
    read_priced_events_stream,
    sessionized_stream,
    tumbling_counts_stream,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """A small deterministic events slice written as a file-stream source."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, i % 3, "click" if i % 2 == 0 else "view",
         base + dt.timedelta(minutes=7 * i), "{}")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "props"])
    path = str(tmp_path_factory.mktemp("events-src"))
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _run_to_memory(stream_df, name, mode="complete"):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


class TestWindows:
    def test_tumbling_matches_batch(self, spark, events_dir):
        stream = read_events_stream(spark, events_dir)
        _run_to_memory(tumbling_counts_stream(stream), "tumbling")
        got = {(r["window_start"], r["event_type"]): r["n_events"]
               for r in spark.sql("SELECT * FROM tumbling").collect()}
        batch = (
            spark.read.parquet(events_dir)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("s"), "event_type", "n")
        )
        expected = {(r["s"], r["event_type"]): r["n"] for r in batch.collect()}
        assert got == expected

    def test_ohlc_stream_matches_batch_positional(self, spark,
                                                  tmp_path_factory):
        """The streaming min_by/max_by OHLC must equal the batch query's
        row_number-positional open/close on the same ticks — including a
        same-timestamp tie broken by event_id, and bars split across
        micro-batches (maxFilesPerTrigger=1 with two source files forces
        state merge across batches)."""
        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [(i, i % 3, "click" if i % 2 == 0 else "view",
                 base + dt.timedelta(minutes=11 * (i // 2)), "{}",
                 float(100 + ((i * 37) % 50)) / 2)
                for i in range(40)]  # pairs share a timestamp -> id ties
        df = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts", "props",
                   "value"])
        path = str(tmp_path_factory.mktemp("ticks-src"))
        df.filter("event_id < 20").coalesce(1).write.parquet(
            path, mode="append")
        df.filter("event_id >= 20").coalesce(1).write.parquet(
            path, mode="append")

        stream = read_priced_events_stream(spark, path)
        _run_to_memory(ohlc_bars_stream(stream), "ohlc")
        got = {(r["bar_start"], r["event_type"]):
               (r["open_c"], r["high_c"], r["low_c"], r["close_c"],
                r["volume"])
               for r in spark.sql("SELECT * FROM ohlc").collect()}

        from pyspark.sql import Window
        w = Window.partitionBy("event_type", "bar_start") \
                  .orderBy("ts", "event_id")
        wall = Window.partitionBy("event_type", "bar_start")
        batch = (
            spark.read.parquet(path)
            .select("event_type",
                    F.date_trunc("hour", "ts").alias("bar_start"), "ts",
                    "event_id",
                    F.round(F.col("value") * 100).cast("bigint")
                    .alias("value_c"))
            .select("event_type", "bar_start", "value_c",
                    F.row_number().over(w).alias("rn"),
                    F.count(F.lit(1)).over(wall).alias("n"))
            .groupBy("event_type", "bar_start")
            .agg(F.max(F.when(F.col("rn") == 1, F.col("value_c")))
                 .alias("open_c"),
                 F.max("value_c").alias("high_c"),
                 F.min("value_c").alias("low_c"),
                 F.max(F.when(F.col("rn") == F.col("n"),
                              F.col("value_c"))).alias("close_c"),
                 F.count(F.lit(1)).alias("volume")))
        expected = {(r["bar_start"], r["event_type"]):
                    (r["open_c"], r["high_c"], r["low_c"], r["close_c"],
                     r["volume"])
                    for r in batch.collect()}
        assert got == expected

    def test_sessionize_stream(self, spark, events_dir):
        stream = read_events_stream(spark, events_dir)
        _run_to_memory(sessionized_stream(stream, gap="30 minutes"),
                       "sessions")
        rows = spark.sql("SELECT * FROM sessions").collect()
        # events are 7 min apart per user (21 min per-user gap < 30) -> one
        # session per user covering all its events
        per_user = {r["user_id"]: r["n_events"] for r in rows}
        assert len(rows) == 3
        assert sum(per_user.values()) == 40


class TestForeachBatchUpsert:
    def test_microbatch_merge_idempotent(self, spark, events_dir, tmp_path):
        target = str(tmp_path / "events_tbl")
        ckpt1 = str(tmp_path / "ck1")
        stream = read_events_stream(spark, events_dir)
        q = foreach_batch_upsert(stream, target, ["event_id"], ckpt1)
        q.awaitTermination(120)
        assert spark.read.parquet(target).count() == 40
        # replay the same source with a FRESH checkpoint: at-least-once
        # delivery — the keyed MERGE keeps the table exactly deduped
        ckpt2 = str(tmp_path / "ck2")
        q2 = foreach_batch_upsert(
            read_events_stream(spark, events_dir), target,
            ["event_id"], ckpt2)
        q2.awaitTermination(120)
        assert spark.read.parquet(target).count() == 40


class TestStatefulDedup:
    def test_cross_batch_first_arrival_wins(self, spark, tmp_path):
        """applyInPandasWithState keyed dedup: an event_id replayed in a
        LATER micro-batch must not re-emit (state persists across
        batches); intra-batch repeats keep-first."""
        from research_index_backend_spark.streaming.stateful import (
            stateful_dedup_stream,
        )

        src = tmp_path / "src"
        src.mkdir()
        rows1 = [(1, 100, "click"), (1, 101, "view"), (2, 200, "click"),
                 (1, 100, "dup-in-batch")]
        rows2 = [(1, 100, "replay"), (1, 102, "view"), (2, 200, "replay")]
        cols = ["user_id", "event_id", "event_type"]
        spark.createDataFrame(rows1, cols).coalesce(1) \
            .write.parquet(str(src / "b1"))
        spark.createDataFrame(rows2, cols).coalesce(1) \
            .write.parquet(str(src / "b2"))

        schema = ("user_id long, event_id long, event_type string")
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(src / "*")))
        q = (stateful_dedup_stream(stream)
             .writeStream.format("memory").queryName("dedup_out")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(r["user_id"], r["event_id"]): r["event_type"]
               for r in spark.sql("SELECT * FROM dedup_out").collect()}
        assert set(got) == {(1, 100), (1, 101), (1, 102), (2, 200)}
        # first arrival won: the 'replay'/'dup-in-batch' copies lost
        assert got[(1, 100)] == "click"
        assert got[(2, 200)] == "click"


class TestWatermarkLateData:
    def test_late_event_beyond_watermark_is_dropped(self, spark, tmp_path):
        """SS late-data semantics: after the watermark passes a window, a
        late event for it is dropped — state stays bounded. File 1 pushes
        the watermark to ~9h; file 2 replays an event at 2h (far beyond
        the 1h watermark) which must not re-open its window."""
        import datetime as dt

        import time

        src = tmp_path / "src"
        src.mkdir()
        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        cols = ["event_id", "user_id", "event_type", "ts", "props"]
        # four ordered micro-batches (file mtimes order the file source):
        # b1 the on-time events; b2 advances event time past their window;
        # b3 lets the watermark update propagate (the input-side late
        # filter uses the watermark computed one batch behind) and evicts
        # the window state; b4 replays a late event AFTER eviction.
        early = [(i, 1, "click", base + dt.timedelta(hours=2, minutes=i), "{}")
                 for i in range(3)]
        spark.createDataFrame(early, cols).coalesce(1) \
            .write.parquet(str(src / "b1"))
        time.sleep(1.1)
        spark.createDataFrame(
            [(99, 1, "click", base + dt.timedelta(hours=10), "{}")],
            cols).coalesce(1).write.parquet(str(src / "b2"))
        time.sleep(1.1)
        spark.createDataFrame(
            [(98, 1, "click", base + dt.timedelta(hours=10, minutes=30),
              "{}")], cols).coalesce(1).write.parquet(str(src / "b3"))
        time.sleep(1.1)
        spark.createDataFrame(
            [(100, 1, "click", base + dt.timedelta(hours=2, minutes=30),
              "{}")], cols).coalesce(1).write.parquet(str(src / "b4"))

        stream = read_events_stream(spark, str(src / "*"))
        out = tumbling_counts_stream(stream, width="1 hour", watermark="1 hour")
        q = (out.writeStream.format("memory").queryName("late_out")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = [(r["window_start"], r["n_events"])
                for r in spark.sql("SELECT * FROM late_out").collect()]
        two_h = base + dt.timedelta(hours=2)
        # exactly ONE emission of the 02:00 window, with only the on-time
        # events — the late replay was dropped (no duplicate window row,
        # no count bump, state stayed evicted)
        assert rows.count((two_h, 3)) == 1
        assert all(n == 3 for (w, n) in rows if w == two_h)


class TestStreamingFunnel:
    def test_funnel_stream_matches_batch(self, spark, tmp_path):
        """The stateful streaming funnel must equal the batch funnel query
        when events arrive in ts order across micro-batches (the
        documented parity contract)."""
        from research_index_backend_spark.plans.queries_ext2 import (
            q_event_funnel,
        )
        from research_index_backend_spark.streaming.stateful import (
            streaming_funnel,
        )

        sf = "/root/testdata/sf0.001"
        batch = {(r["user_id"], r["t_signup"], r["t_view"], r["t_purchase"])
                 for r in q_event_funnel(spark, sf).collect()}
        assert batch  # the fixture data must actually complete funnels

        # replay the same events in ts order, split into 3 micro-batches
        from research_index_backend_spark.plans.queries import _t
        ev = (_t(spark, sf, "events")
              .withColumn(
                  "ts_us", F.expr("ts_ns div 1000"))
              .select("user_id", "event_type", "ts_us")
              .orderBy("ts_us").coalesce(1).collect())
        src = tmp_path / "src"
        src.mkdir()
        n = len(ev)
        for i in range(3):
            chunk = ev[i * n // 3:(i + 1) * n // 3]
            spark.createDataFrame(chunk).coalesce(1) \
                .write.parquet(str(src / f"b{i}"))

        stream = (spark.readStream
                  .schema("user_id long, event_type string, ts_us long")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(src / "*")))
        q = (streaming_funnel(stream)
             .writeStream.format("memory").queryName("funnel_out")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = {(r["user_id"], r["t_signup"], r["t_view"], r["t_purchase"])
               for r in spark.sql("SELECT * FROM funnel_out").collect()}
        assert got == batch

    def test_funnel_emits_once_across_batches(self, spark, tmp_path):
        """A user completing in batch 1 must not re-emit when more of
        their events arrive in batch 2."""
        from research_index_backend_spark.streaming.stateful import (
            streaming_funnel,
        )
        cols = ["user_id", "event_type", "ts_us"]
        b1 = [(1, "signup", 10), (1, "view", 20), (1, "purchase", 30)]
        b2 = [(1, "view", 40), (1, "purchase", 50), (2, "signup", 60)]
        src = tmp_path / "src"
        src.mkdir()
        for i, rows in enumerate((b1, b2)):
            spark.createDataFrame(rows, cols).coalesce(1) \
                .write.parquet(str(src / f"b{i}"))
        stream = (spark.readStream
                  .schema("user_id long, event_type string, ts_us long")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(src / "*")))
        q = (streaming_funnel(stream)
             .writeStream.format("memory").queryName("funnel_once")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM funnel_once").collect()
        assert [(r["user_id"], r["t_signup"], r["t_view"], r["t_purchase"])
                for r in rows] == [(1, 10, 20, 30)]


class TestStreamStreamJoin:
    def test_interval_join_matches_batch(self, spark, tmp_path):
        """Stream-stream interval join (view -> purchase attribution)
        must equal the equivalent batch join when events arrive in ts
        order within the watermark."""
        from research_index_backend_spark.plans.queries import _t
        from research_index_backend_spark.streaming.joins import (
            views_to_purchases_stream,
        )

        sf = "/root/testdata/sf0.001"
        ev = (_t(spark, sf, "events")
              .select("event_id", "user_id", "event_type", "ts"))

        # batch twin: plain interval join
        v = ev.filter(F.col("event_type") == "view") \
            .select(F.col("event_id").alias("view_id"),
                    "user_id", F.col("ts").alias("v_ts"))
        p = ev.filter(F.col("event_type") == "purchase") \
            .select(F.col("event_id").alias("purchase_id"),
                    F.col("user_id").alias("p_user"),
                    F.col("ts").alias("p_ts"))
        batch = {(r["user_id"], r["view_id"], r["purchase_id"])
                 for r in v.join(
                     p, (F.col("user_id") == F.col("p_user"))
                     & (F.col("p_ts") >= F.col("v_ts"))
                     & (F.col("p_ts") <= F.col("v_ts")
                        + F.expr("interval 1 hour"))).collect()}
        assert batch  # fixture must produce matches

        rows = ev.orderBy("ts").collect()
        src = tmp_path / "src"
        src.mkdir()
        n = len(rows)
        for i in range(3):
            chunk = rows[i * n // 3:(i + 1) * n // 3]
            spark.createDataFrame(
                chunk, ev.schema).coalesce(1) \
                .write.parquet(str(src / f"b{i}"))
        stream = (spark.readStream.schema(ev.schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(src / "*")))
        q = (views_to_purchases_stream(stream)
             .writeStream.format("memory").queryName("ssj_out")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = {(r["user_id"], r["view_id"], r["purchase_id"])
               for r in spark.sql("SELECT * FROM ssj_out").collect()}
        assert got == batch


class TestStreamStaticJoin:
    def test_enrich_matches_batch_and_keeps_unmatched(self, spark, tmp_path):
        """Stream-static enrichment must equal the batch join and keep
        events whose key is absent from the dim (left semantics)."""
        from research_index_backend_spark.plans.queries import _t
        from research_index_backend_spark.streaming.joins import enrich_stream

        sf = "/root/testdata/sf0.001"
        ev = (_t(spark, sf, "events")
              .select("event_id", "user_id", "event_type", "ts"))
        # dim covers only even user ids -> odd ids must survive with null
        dim = (ev.select("user_id").distinct()
               .filter(F.col("user_id") % 2 == 0)
               .withColumn("segment",
                           F.concat(F.lit("seg"),
                                    (F.col("user_id") % 3).cast("string"))))
        batch = {(r["event_id"], r["segment"])
                 for r in ev.join(dim, "user_id", "left").collect()}
        assert any(s is None for _, s in batch)      # unmatched kept
        assert any(s is not None for _, s in batch)  # matched enriched

        src = tmp_path / "src"
        src.mkdir()
        rows = ev.orderBy("ts").collect()
        n = len(rows)
        for i in range(3):
            spark.createDataFrame(rows[i * n // 3:(i + 1) * n // 3],
                                  ev.schema).coalesce(1) \
                .write.parquet(str(src / f"b{i}"))
        stream = (spark.readStream.schema(ev.schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(src / "*")))
        q = (enrich_stream(stream, dim, "user_id")
             .writeStream.format("memory").queryName("enrich_out")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = {(r["event_id"], r["segment"])
               for r in spark.sql("SELECT * FROM enrich_out").collect()}
        assert got == batch


class TestKmvSketchStream:
    def test_final_estimate_matches_batch_kmv(self, spark, tmp_path):
        """The stream's final per-key estimate (after all micro-batches;
        maxFilesPerTrigger=1 over two files forces cross-batch k-min
        merging) must equal the batch KMV computed over the same rows
        with the same hash space and estimator."""
        import datetime as dt

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from research_index_backend_spark.streaming.stateful import (
            KMV_STREAM_K,
            kmv_distinct_stream,
        )

        base = dt.datetime(2024, 1, 1)
        rows = [(i, (i * 7919) % 400, "click" if i % 2 == 0 else "view",
                 base + dt.timedelta(seconds=i), "{}")
                for i in range(600)]
        df = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts", "props"])
        src = str(tmp_path / "kmv-src")
        df.filter("event_id < 300").coalesce(1).write.parquet(
            src, mode="append")
        df.filter("event_id >= 300").coalesce(1).write.parquet(
            src, mode="append")

        from research_index_backend_spark.streaming.windows import (
            read_events_stream,
        )
        stream = read_events_stream(spark, src)
        q = (kmv_distinct_stream(stream).writeStream.format("memory")
             .queryName("kmv_stream").outputMode("update")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got_pdf = spark.sql("SELECT * FROM kmv_stream").toPandas()
        final = got_pdf.groupby("event_type").last()

        h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                               1, 8), 16, 10).cast("bigint")
        w = Window.partitionBy("event_type").orderBy("h")
        batch = (spark.read.parquet(src)
                 .select("event_type", "user_id").distinct()
                 .select("event_type", h.alias("h"))
                 .select("event_type", "h",
                         F.row_number().over(w).alias("rn"))
                 .groupBy("event_type")
                 .agg(F.count(F.lit(1)).alias("n_distinct"),
                      F.max(F.when(F.col("rn") == KMV_STREAM_K,
                                   F.col("h"))).alias("h_k")))
        for r in batch.collect():
            exp = (r["n_distinct"] if r["h_k"] is None
                   else int((KMV_STREAM_K - 1) * float(1 << 32)
                            // r["h_k"]))
            assert int(final.loc[r["event_type"], "kmv_est"]) == exp


class TestTransitionsStream:
    def test_summed_deltas_match_batch_lead(self, spark, tmp_path):
        """Summing the stream's per-batch transition deltas must equal
        the batch LEAD-window transition matrix — including transitions
        whose two events arrive in DIFFERENT micro-batches (the keyed
        last-type state carries the boundary)."""
        import datetime as dt

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from research_index_backend_spark.streaming.stateful import (
            transitions_stream,
        )

        base = dt.datetime(2024, 1, 1)
        types = ["click", "view", "purchase"]
        rows = [(i, i % 5, types[(i * 7) % 3],
                 base + dt.timedelta(seconds=i), "{}")
                for i in range(200)]
        df = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts", "props"])
        src = str(tmp_path / "trans-src")
        df.filter("event_id < 100").coalesce(1).write.parquet(
            src, mode="append")
        df.filter("event_id >= 100").coalesce(1).write.parquet(
            src, mode="append")

        from research_index_backend_spark.streaming.windows import (
            read_events_stream,
        )
        q = (transitions_stream(read_events_stream(spark, src))
             .writeStream.format("memory").queryName("trans_stream")
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(r["from_type"], r["next_type"]): r["n"]
               for r in spark.sql(
                   "SELECT from_type, next_type, sum(n) AS n "
                   "FROM trans_stream GROUP BY 1, 2").collect()}

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        batch = (spark.read.parquet(src)
                 .withColumn("next_type", F.lead("event_type").over(w))
                 .filter(F.col("next_type").isNotNull())
                 .groupBy(F.col("event_type").alias("from_type"),
                          "next_type")
                 .agg(F.count(F.lit(1)).alias("n")))
        expected = {(r["from_type"], r["next_type"]): r["n"]
                    for r in batch.collect()}
        assert got == expected


class TestIndexProbeStream:
    def test_stream_probe_matches_batch_candidates(self, spark, tmp_path):
        """The streaming index probe (stateless stream-static joins)
        must surface exactly the batch pipeline's candidate pairs and
        verdicts when the index carries the same band table + cap."""
        from research_index_backend_spark.operators.dedup import (
            lsh_band_table,
            minhash_signatures,
        )
        from research_index_backend_spark.plans.queries import (
            _t,
            LSH_BUCKET_CAP,
        )
        from research_index_backend_spark.streaming.dedup import (
            index_probe_stream,
        )

        sf = "/root/testdata/sf0.001"
        d = _t(spark, sf, "documents").select("doc_id", "text")
        idx_docs = d.filter(F.col("doc_id") % 10 != 7)
        new_docs = d.filter(F.col("doc_id") % 10 == 7)

        sig = minhash_signatures(idx_docs, "text", "doc_id", k=4) \
            .localCheckpoint()
        bt = lsh_band_table(sig, k=4, bands=2)
        ok = (bt.groupBy("band", "bucket")
              .agg(F.count(F.lit(1)).alias("n"))
              .filter(F.col("n") <= LSH_BUCKET_CAP)
              .select("band", "bucket"))
        index_bands = bt.join(ok, ["band", "bucket"], "left_semi") \
            .localCheckpoint()

        # batch expectation: same probe, batch engine
        batch = {(r["doc_id"], r["index_id"], r["band"], r["est_e6"])
                 for r in index_probe_stream(
                     new_docs, index_bands, sig).collect()}
        assert batch  # non-vacuous: sf0.001 has cross-split near-dups

        src = tmp_path / "docs-src"
        src.mkdir()
        rows = new_docs.collect()
        n = len(rows)
        for i in range(3):
            spark.createDataFrame(rows[i * n // 3:(i + 1) * n // 3],
                                  new_docs.schema).coalesce(1) \
                .write.parquet(str(src / f"b{i}"))
        stream = (spark.readStream.schema(new_docs.schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(src / "*")))
        q = (index_probe_stream(stream, index_bands, sig)
             .writeStream.format("memory").queryName("probe_out")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = {(r["doc_id"], r["index_id"], r["band"], r["est_e6"])
               for r in spark.sql("SELECT * FROM probe_out").collect()}
        assert got == batch


class TestHeavyHittersStream:
    def _run(self, spark, src, name):
        from research_index_backend_spark.streaming.stateful import (
            heavy_hitters_stream,
        )
        from research_index_backend_spark.streaming.windows import (
            read_events_stream,
        )
        q = (heavy_hitters_stream(read_events_stream(spark, src))
             .writeStream.format("memory").queryName(name)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
        pdf = spark.sql(f"SELECT * FROM {name}").toPandas()
        # the update-mode memory sink appends every emission; the final
        # counter table per key is its max-seq emission (earlier ones
        # may contain items since evicted)
        last_seq = pdf.groupby("event_type")["seq"].max()
        final = {}
        for _, r in pdf.iterrows():
            if r["seq"] == last_seq[r["event_type"]]:
                final[(r["event_type"], int(r["item"]))] = (
                    int(r["est_count"]), int(r["max_err"]))
        return final

    def test_batch_split_invariance_and_bounds(self, spark, tmp_path):
        """Space-saving is sequential: any micro-batch partition of the
        same event-time-ordered stream must land the identical final
        counter table, and every estimate must bound its true count
        (true in [est - err, est])."""
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        # skewed stream: user (i % 60)**2 % 97 gives a few heavy users
        rows = [(i, ((i % 60) ** 2) % 97 % 12,
                 "click" if i % 2 == 0 else "view",
                 base + dt.timedelta(seconds=i), "{}")
                for i in range(800)]
        df = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts", "props"])

        src1 = str(tmp_path / "hh-one")
        df.coalesce(1).write.parquet(src1)
        src3 = str(tmp_path / "hh-three")
        for lo, hi in ((0, 250), (250, 600), (600, 800)):
            df.filter(f"event_id >= {lo} AND event_id < {hi}") \
                .coalesce(1).write.parquet(src3, mode="append")

        one = self._run(spark, src1, "hh_one")
        three = self._run(spark, src3, "hh_three")
        assert one == three  # batch-split invariance

        # error bounds vs true counts
        true = {(r["event_type"], int(r["user_id"])): r["n"]
                for r in spark.read.parquet(src1)
                .groupBy("event_type", "user_id").count()
                .withColumnRenamed("count", "n").collect()}
        for k, (est, err) in one.items():
            t = true.get(k, 0)
            assert est - err <= t <= est, (k, est, err, t)


def test_longrun_harness_rejects_bad_op_selection(spark, monkeypatch):
    # r11 ADVICE item 3: a misspelled RIB_LONGRUN_OPS used to produce an
    # empty query dict and exit immediately with an empty "clean" report.
    import os as _os
    # monkeypatch-scoped path insert (r12 ADVICE item 3): the old bare
    # sys.path.insert leaked past this test and let tools/*.py shadow
    # same-named imports for the rest of the session.
    monkeypatch.syspath_prepend(_os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "tools"))
    import pytest as _pytest
    from stream_longrun import build_queries
    with _pytest.raises(SystemExit, match="unknown RIB_LONGRUN_OPS"):
        build_queries(spark, {"bogus_op"})
    with _pytest.raises(SystemExit, match="selected nothing"):
        build_queries(spark, set())
    # a valid selection builds exactly the asked-for streams
    qs = build_queries(spark, {"interval_join", "topk"})
    assert set(qs) == {"interval_join", "topk"}
    assert all(df.isStreaming for df in qs.values())
