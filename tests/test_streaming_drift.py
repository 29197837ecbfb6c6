"""Batch parity + split invariance for the streaming drift monitor
(streaming/drift.py): the FINAL cumulative emission must be identical
(a) to the batch-engine twin computed with plain DataFrame ops and
(b) under any micro-batch partition of the same stream.
"""

from __future__ import annotations

import datetime as dt

from research_index_backend_spark.streaming.drift import (
    drift_monitor_batch,
    drift_monitor_stream,
)

COLS = ["event_id", "event_type", "v_e2", "ts"]


def _rows():
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(900):
        etype = "click" if i % 2 == 0 else "view"
        # head of the stream sits low; post-reference values drift UP
        # for click (shifted regime) and stay put for view
        if etype == "click" and i > 500:
            v = 30000 + (i * 37) % 15000
        else:
            v = (i * 53) % 12000
        rows.append((i, etype, v, base + dt.timedelta(seconds=i)))
    return rows


def _final(spark, src, name):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )
    schema = StructType([
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("v_e2", LongType()),
        StructField("ts", TimestampType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (drift_monitor_stream(stream)
         .writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    pdf = spark.sql(f"SELECT * FROM {name}").toPandas()
    last = pdf.groupby("event_type")["seq"].max()
    return {r["event_type"]: (int(r["n_ref"]), int(r["n_cur"]),
                              int(r["tv_e6"]))
            for _, r in pdf.iterrows()
            if r["seq"] == last[r["event_type"]]}


class TestDriftMonitor:
    def test_parity_and_split_invariance(self, spark, tmp_path):
        df = spark.createDataFrame(_rows(), COLS)

        src1 = str(tmp_path / "one")
        df.coalesce(1).write.parquet(src1)
        src4 = str(tmp_path / "four")
        for lo, hi in ((0, 150), (150, 500), (500, 700), (700, 900)):
            df.filter(f"event_id >= {lo} AND event_id < {hi}") \
                .coalesce(1).write.parquet(src4, mode="append")

        one = _final(spark, src1, "drift_one")
        four = _final(spark, src4, "drift_four")
        assert one == four, "final drift must be micro-batch-split invariant"

        batch = {r["event_type"]: (r["n_ref"], r["n_cur"], r["tv_e6"])
                 for r in drift_monitor_batch(
                     spark.read.parquet(src1)).collect()}
        assert one == batch, "streaming final must equal the batch twin"

        # the drifted key must actually score high and the stable key low
        assert one["click"][2] > 400000
        assert one["view"][2] <= 200000

    def test_reference_shorter_than_ref_n(self, spark, tmp_path):
        """A key with fewer than REF_N values never completes its
        reference: n_cur stays 0 and tv 0 — no division blow-up."""
        rows = [(i, "rare", (i * 7) % 500,
                 dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i))
                for i in range(50)]
        df = spark.createDataFrame(rows, COLS)
        src = str(tmp_path / "rare")
        df.coalesce(1).write.parquet(src)
        out = _final(spark, src, "drift_rare")
        assert out["rare"] == (50, 0, 0)
