"""Batch parity + split invariance for the streaming exact top-K
monitor (streaming/topk.py): the FINAL cumulative emission must equal
(a) the batch-engine twin and (b) itself under any micro-batch
partition of the same stream.
"""

from __future__ import annotations

from research_index_backend_spark.streaming.topk import (
    TOPK_K,
    topk_monitor_batch,
    topk_monitor_stream,
)

COLS = ["event_id", "event_type", "v_e2"]


def _rows():
    rows = []
    for i in range(1200):
        etype = "click" if i % 3 else "view"
        # click mass concentrates in two bands; view is near-uniform
        if etype == "click":
            v = (8000 if i % 5 else 90000) + (i * 13) % 3000
        else:
            v = (i * 97) % 60000
        rows.append((i, etype, v))
    return rows


def _final(spark, src, name):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )
    schema = StructType([
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("v_e2", LongType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (topk_monitor_stream(stream)
         .writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    pdf = spark.sql(f"SELECT * FROM {name}").toPandas()
    last = pdf.groupby("event_type")["seq"].max()
    return {(r["event_type"], int(r["rank"])):
            (int(r["bin"]), int(r["cnt"]), int(r["n_total"]))
            for _, r in pdf.iterrows()
            if r["seq"] == last[r["event_type"]]}


class TestTopkMonitor:
    def test_parity_and_split_invariance(self, spark, tmp_path):
        df = spark.createDataFrame(_rows(), COLS)

        src1 = str(tmp_path / "one")
        df.coalesce(1).write.parquet(src1)
        src4 = str(tmp_path / "four")
        for lo, hi in ((0, 100), (100, 640), (640, 650), (650, 1200)):
            df.filter(f"event_id >= {lo} AND event_id < {hi}") \
                .coalesce(1).write.parquet(src4, mode="append")

        one = _final(spark, src1, "topk_one")
        four = _final(spark, src4, "topk_four")
        assert one == four, "final top-k must be micro-batch-split invariant"

        batch = {(r["event_type"], int(r["rank"])):
                 (int(r["bin"]), int(r["cnt"]), int(r["n_total"]))
                 for r in topk_monitor_batch(
                     spark.read.parquet(src1)).collect()}
        assert one == batch, "streaming final must equal the batch twin"

        # structural checks: K rows per key, rank-1 dominates, totals
        for et in ("click", "view"):
            ranks = [r for (t, r) in one if t == et]
            assert sorted(ranks) == list(range(1, TOPK_K + 1))
            assert one[(et, 1)][1] >= one[(et, TOPK_K)][1]
        # click's engineered heavy band (values 8000..11000 cents,
        # bins 1-2) must win over the sparse 90000s band
        assert one[("click", 1)][0] in (1, 2)
