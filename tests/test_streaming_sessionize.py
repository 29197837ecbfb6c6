"""Batch parity + split invariance for the streaming gap
sessionizer (streaming/sessionize.py): the LAST emission per
(user, session) must equal the batch twin and be identical under any
micro-batch partition of the in-order stream — including a split
landing MID-SESSION (the state-carry case that matters).
"""

from __future__ import annotations

from research_index_backend_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

COLS = ["event_id", "user_id", "ts_ns"]
MIN_NS = 60 * 10**9


def _rows():
    rows = []
    eid = 0
    for u in range(6):
        t = 10**15 + u * 17 * MIN_NS
        # three sessions per user: bursts separated by > 30 min
        for burst, n in ((0, 4), (1, 7), (2, 2)):
            t += 45 * MIN_NS  # gap opens a new session
            for i in range(n):
                rows.append((eid, u, t))
                eid += 1
                t += (3 + (eid % 5)) * MIN_NS  # intra-session gaps < 30m
    return rows


def _final(spark, src, name):
    from pyspark.sql.types import LongType, StructField, StructType
    schema = StructType([
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts_ns", LongType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (sessionize_stream(stream)
         .writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    pdf = spark.sql(f"SELECT * FROM {name}").toPandas()
    out = {}
    for _, r in pdf.iterrows():
        k = (int(r["user_id"]), int(r["session_id"]))
        if k not in out or r["seq"] >= out[k][0]:
            out[k] = (int(r["seq"]), int(r["n_events"]))
    return {k: v[1] for k, v in out.items()}


class TestStreamSessionize:
    def test_parity_and_split_invariance(self, spark, tmp_path):
        df = spark.createDataFrame(_rows(), COLS)

        src1 = str(tmp_path / "one")
        df.coalesce(1).write.parquet(src1)
        # split files cut MID-SESSION (event_id boundaries inside
        # bursts) — state must carry the open session across batches
        src4 = str(tmp_path / "four")
        for lo, hi in ((0, 10), (10, 30), (30, 31), (31, 100)):
            df.filter(f"event_id >= {lo} AND event_id < {hi}") \
                .coalesce(1).write.parquet(src4, mode="append")

        one = _final(spark, src1, "sess_one")
        four = _final(spark, src4, "sess_four")
        assert one == four, "must be micro-batch-split invariant"

        batch = {(int(r["user_id"]), int(r["session_id"])):
                 int(r["n_events"])
                 for r in sessionize_batch(
                     spark.read.parquet(src1)).collect()}
        assert one == batch, "streaming final must equal the batch twin"

        # engineered shape: 3 sessions per user with sizes 4, 7, 2
        for u in range(6):
            assert one[(u, 1)] == 4
            assert one[(u, 2)] == 7
            assert one[(u, 3)] == 2
