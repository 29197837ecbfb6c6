"""Watermark-bounded streaming dedup (dropDuplicatesWithinWatermark):
one availableNow pass over a duplicated source must match batch
dropDuplicates on the key columns."""

from __future__ import annotations

import datetime as dt

import pytest

from research_index_backend_spark.streaming.stateful import (
    watermark_dedup_stream,
)
from research_index_backend_spark.streaming.windows import read_events_stream


@pytest.fixture(scope="module")
def dup_events_dir(spark, tmp_path_factory):
    """Events where every (user_id, event_id) appears 1-3 times within a
    few minutes — the retried-producer duplicate shape."""
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    for i in range(30):
        n_copies = (i % 3) + 1
        for c in range(n_copies):
            rows.append((i, i % 5, "click",
                         base + dt.timedelta(minutes=i, seconds=20 * c),
                         "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "props"])
    path = str(tmp_path_factory.mktemp("dup-events-src"))
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_watermark_dedup_matches_batch(spark, dup_events_dir):
    stream = read_events_stream(spark, dup_events_dir)
    out = watermark_dedup_stream(stream, watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("wm_dedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, event_id FROM wm_dedup").collect()
    keys = [(r["user_id"], r["event_id"]) for r in got]
    assert len(keys) == len(set(keys)) == 30  # one row per distinct key
    expected = {(i % 5, i) for i in range(30)}
    assert set(keys) == expected
