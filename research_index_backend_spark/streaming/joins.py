"""Stream-stream joins: the remaining Structured Streaming capability the
windows/stateful modules don't cover.

An inner join between two UNBOUNDED streams is only executable when the
engine can bound its state: each side buffers rows in the state store
until the other side's watermark proves no future match can arrive. That
requires BOTH a watermark on each input and a time-range predicate tying
the two event times together — exactly the two things
`interval_join_stream` insists on. Without the range bound, state grows
with the stream forever; Spark would accept the query and die slowly at
scale.

State size intuition at 100 TB/day: each side holds ~(watermark delay +
join interval) worth of rows per user partition — tune the delay to the
real out-of-orderness, not to "1 day to be safe", because the delay IS
the state budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(left: DataFrame, right: DataFrame,
                         key: str = "user_id",
                         ts_col: str = "ts",
                         interval: str = "1 hour",
                         watermark_delay: str = "1 day") -> DataFrame:
    """Inner interval join: for each left row, right rows with the same
    key whose event time falls in [left.ts, left.ts + interval].

    Both sides are watermarked (state cleanup) and the join carries the
    event-time range predicate (state bounding). Equality on the key
    hash-partitions both streams the same way, so the join is per-key
    local after one shuffle each — the same plan shape as a batch
    sort-merge join plus the state store.

    Output: every left column prefixed l_, every right column prefixed
    r_ (both sides share the key/ts names, so prefixing is the caller's
    sanity).
    """
    lw = left.withWatermark(ts_col, watermark_delay)
    rw = right.withWatermark(ts_col, watermark_delay)
    lp = lw.select([F.col(c).alias(f"l_{c}") for c in lw.columns])
    rp = rw.select([F.col(c).alias(f"r_{c}") for c in rw.columns])
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{ts_col}") >= F.col(f"l_{ts_col}"))
        & (F.col(f"r_{ts_col}")
           <= F.col(f"l_{ts_col}") + F.expr(f"interval {interval}"))
    )
    return lp.join(rp, cond)


def views_to_purchases_stream(events: DataFrame,
                              interval: str = "1 hour") -> DataFrame:
    """The concrete attribution join: each view matched to the same
    user's purchases within the next `interval`. Expects the events
    schema (event_id, user_id, event_type, ts)."""
    views = events.filter(F.col("event_type") == "view") \
        .select("event_id", "user_id", "ts")
    purchases = events.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    j = interval_join_stream(views, purchases, interval=interval)
    return j.select(
        F.col("l_user_id").alias("user_id"),
        F.col("l_event_id").alias("view_id"),
        F.col("r_event_id").alias("purchase_id"),
    )


def enrich_stream(stream: DataFrame, dim: DataFrame, key: str,
                  how: str = "left") -> DataFrame:
    """Stream-STATIC enrichment join: every micro-batch joins against the
    static dimension (user profile, country table) — the third join
    shape next to stream-stream (above) and batch-batch.

    Unlike stream-stream, no watermark and no state store: the static
    side is re-resolved per micro-batch, so the join is stateless. The
    dim is broadcast-hinted — a streaming enrichment dim must fit the
    executors by design; if it doesn't, the scale move is bucketing the
    dim on the key (operators/bucketing.py) so each micro-batch
    co-locates instead of shuffling the stream. Left join keeps events
    whose key is missing from the dim (nulls, not drops) — attribution
    must never lose events to a stale dimension.
    """
    return stream.join(F.broadcast(dim), key, how)
