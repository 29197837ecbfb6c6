"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming machinery at all (SURVEY §2.9); the built-in
windows in streaming/windows.py cover tumbling/sliding/session. This module
demonstrates the remaining Structured Streaming capability a training-data
pipeline needs: ARBITRARY keyed state the built-ins can't express —
here a per-key running seen-set used for cross-micro-batch deduplication
(emit a row only the FIRST time its id arrives, no matter which batch it
lands in), the streaming twin of the keyed upsert's anti-join.

Scale notes:
- State is per-key (hash-partitioned by the grouping key) and lives in the
  state store; memory is bounded by (#keys in state) not stream length —
  set a state timeout for unbounded key domains (GroupStateTimeout), here
  ProcessingTimeTimeout is left NoTimeout because the dedup domain == node
  key domain, which the batch engine already holds as a table.
- For very large seen-sets per key, swap the in-state python set for a
  Bloom filter (bounded bytes, one-sided error = rare duplicate emitted —
  downstream keyed upsert absorbs it). Noted, not needed at test scale.
- applyInPandasWithState feeds each key's rows as Arrow batches (U1 "no
  row-wise python" applies to the per-batch loop, which is vectorized
  pandas filtering).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("event_type", StringType()),
])

# state = the sorted tuple of already-seen event ids per user
DEDUP_STATE_SCHEMA = StructType([
    StructField("seen", StringType()),   # comma-joined ids (Arrow-stable)
])


def _dedup_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    seen: set[int] = set()
    if state.exists:
        (packed,) = state.get
        if packed:
            seen = {int(x) for x in packed.split(",")}
    out: list[pd.DataFrame] = []
    for pdf in pdfs:
        # vectorized: drop already-seen and intra-batch repeats (keep first)
        pdf = pdf[~pdf["event_id"].isin(list(seen))]
        pdf = pdf.drop_duplicates(subset=["event_id"], keep="first")
        seen.update(int(x) for x in pdf["event_id"])
        out.append(pdf[["user_id", "event_id", "event_type"]])
    state.update((",".join(str(x) for x in sorted(seen)),))
    for pdf in out:
        if len(pdf):
            yield pdf


def stateful_dedup_stream(events: DataFrame) -> DataFrame:
    """First-arrival-wins dedup on event_id within each user_id, across
    micro-batches — state the built-in dropDuplicates cannot scope per-key
    with custom packing. Returns the deduped event rows."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def watermark_dedup_stream(events: DataFrame,
                           key_cols: tuple[str, ...] = ("user_id",
                                                        "event_id"),
                           ts_col: str = "ts",
                           watermark: str = "1 hour") -> DataFrame:
    """Native bounded-state streaming dedup: dropDuplicatesWithinWatermark.

    The applyInPandasWithState dedup above keeps state FOREVER (exact,
    unbounded keys); this is the built-in complement for the common case
    where duplicates only ever arrive within a bounded lateness window
    (at-least-once sources, retried producers): state is evicted once an
    event's timestamp falls behind the watermark, so state size is
    bounded by (keys per watermark window), not stream lifetime — the
    right default for a 100 TB/day ingest where exact forever-dedup
    belongs to the batch keyed upsert downstream.
    """
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(list(key_cols)))


# ---------------------------------------------------------------------------
# Streaming funnel: per-key ordered-step state machine
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("signup", "view", "purchase")

FUNNEL_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("t_signup", LongType()),
    StructField("t_view", LongType()),
    StructField("t_purchase", LongType()),
])

# per-step earliest micro-ts + emitted flag (0/1)
FUNNEL_STATE_SCHEMA = StructType([
    StructField("t_signup", LongType()),
    StructField("t_view", LongType()),
    StructField("t_purchase", LongType()),
    StructField("emitted", LongType()),
])


def _funnel_fn(key: tuple, pdfs: "Iterator[pd.DataFrame]",
               state: GroupState) -> "Iterator[pd.DataFrame]":
    """Advance the per-user funnel state with each micro-batch; emit the
    completion row the FIRST time signup < view < purchase holds.

    Parity contract with the batch funnel (plans.queries_ext2
    q_event_funnel): per-step UNCONDITIONAL mins, strict-order check on
    top. Under event-time-ordered arrival (per key) the completion
    predicate is monotone — a min, once set, can only be matched by
    later-or-equal timestamps — so emit-once streaming output equals the
    batch result. Out-of-order arrival would need watermark-delayed
    finalization instead of emit-on-first-truth; that variant belongs in
    a window-closed foreachBatch, noted here deliberately.
    """
    mins: list[Any] = [None, None, None, 0]
    if state.exists:
        mins = list(state.get)
    for pdf in pdfs:
        for i, step in enumerate(FUNNEL_STEPS):
            vals = pdf.loc[pdf["event_type"] == step, "ts_us"]
            if len(vals):
                m = int(vals.min())
                mins[i] = m if mins[i] is None else min(mins[i], m)
    done = (mins[0] is not None and mins[1] is not None
            and mins[2] is not None and mins[0] < mins[1] < mins[2])
    if done and not mins[3]:
        mins[3] = 1
        state.update(tuple(mins))
        yield pd.DataFrame([{
            "user_id": key[0], "t_signup": mins[0],
            "t_view": mins[1], "t_purchase": mins[2]}])
    else:
        state.update(tuple(mins))
        return


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch event_funnel query: emits
    (user_id, t_signup, t_view, t_purchase) once per user, the first
    micro-batch in which the ordered completion holds. Expects columns
    user_id, event_type, ts_us (micros)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming KMV distinct sketch — bounded-state rolling uniques
# ---------------------------------------------------------------------------

KMV_STREAM_K = 64
_KMV_SPACE = float(1 << 32)

KMV_OUTPUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("n_kept", LongType()),
    StructField("kmv_est", LongType()),
])

# state = comma-joined ascending k-min hashes (Arrow-stable packing, same
# discipline as the dedup seen-set)
KMV_STATE_SCHEMA = StructType([
    StructField("mins", StringType()),
])


def _kmv_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    mins: set[int] = set()
    if state.exists:
        (packed,) = state.get
        if packed:
            mins = {int(x) for x in packed.split(",")}
    for pdf in pdfs:
        mins.update(int(x) for x in pdf["h"].unique())
        if len(mins) > KMV_STREAM_K:
            mins = set(sorted(mins)[:KMV_STREAM_K])
    ordered = sorted(mins)
    state.update((",".join(str(x) for x in ordered),))
    if len(ordered) < KMV_STREAM_K:
        est = len(ordered)
    else:
        est = int((KMV_STREAM_K - 1) * _KMV_SPACE // ordered[-1])
    yield pd.DataFrame({"event_type": [key[0]],
                        "n_kept": [len(ordered)],
                        "kmv_est": [est]})


def kmv_distinct_stream(events: DataFrame) -> DataFrame:
    """Streaming KMV distinct-user sketch per event_type — the
    bounded-state rolling-uniques counter (the streaming twin of the
    batch kmv_distinct catalog query, same md5 hash space and same
    (k-1)*2^32/h_k estimator).

    The hash is computed JVM-side BEFORE the stateful op (F.conv over
    md5 — the Python side never hashes, it only maintains the k-min
    set), so per-key state is <= k int64s regardless of stream length:
    this is exactly why sketches exist in streaming — exact distinct
    state grows with cardinality, KMV state is constant. Emits the
    updated estimate per key each micro-batch (update mode).

    Expects columns event_type, user_id.
    """
    from pyspark.sql import functions as F

    with_hash = events.withColumn(
        "h", F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                                1, 8), 16, 10).cast("bigint"))
    return (
        with_hash.groupBy("event_type")
        .applyInPandasWithState(
            _kmv_fn,
            outputStructType=KMV_OUTPUT_SCHEMA,
            stateStructType=KMV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming event-transition counter — windowless LEAD via keyed state
# ---------------------------------------------------------------------------

TRANSITIONS_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("from_type", StringType()),
    StructField("next_type", StringType()),
    StructField("n", LongType()),
])

# state = the user's last-seen event type (the LEAD/LAG boundary carried
# across micro-batches)
TRANSITIONS_STATE_SCHEMA = StructType([
    StructField("last_type", StringType()),
])


def _transitions_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    last = None
    if state.exists:
        (last,) = state.get
    counts: dict[tuple[str, str], int] = {}
    # concat-then-sort: multi-chunk groups must process in ONE event-time
    # order (same fix as the heavy-hitters op)
    chunks = list(pdfs)
    allpdf = (pd.concat(chunks, ignore_index=True) if chunks
              else pd.DataFrame())
    if len(allpdf):
        allpdf = allpdf.sort_values(["ts", "event_id"])
        for t in allpdf["event_type"]:
            if last is not None:
                k = (last, t)
                counts[k] = counts.get(k, 0) + 1
            last = t
    state.update((last,))
    if counts:
        yield pd.DataFrame(
            {"user_id": [key[0]] * len(counts),
             "from_type": [k[0] for k in counts],
             "next_type": [k[1] for k in counts],
             "n": list(counts.values())})


def transitions_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch markov_transitions LEAD: per-user
    (from, next) transition counts maintained incrementally — the
    batch query's window LAG/LEAD is unavailable under incremental
    arrival, so the cross-batch boundary (the user's LAST event of the
    previous micro-batch) is carried as keyed state; everything else is
    a per-batch ordered scan of that user's rows.

    State is ONE string per user regardless of stream length — the
    whole point of converting a sort-based batch op to a stateful
    streaming op. Emits per-batch transition count DELTAS (update
    mode); the downstream aggregate sums them into the matrix, which
    is how count deltas compose with ivm_update-style view
    maintenance. Expects columns user_id, event_id, event_type, ts.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _transitions_fn,
            outputStructType=TRANSITIONS_OUTPUT_SCHEMA,
            stateStructType=TRANSITIONS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming space-saving heavy hitters — bounded-counter top-k
# ---------------------------------------------------------------------------

HH_CAPACITY = 8   # monitored counters per key (Metwally et al. capacity m)

HH_OUTPUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("item", LongType()),
    StructField("est_count", LongType()),
    StructField("max_err", LongType()),
    # per-key emission sequence: consumers of an append-style sink keep
    # only each key's max-seq rows (earlier emissions may contain items
    # since evicted)
    StructField("seq", LongType()),
])

# state = emission counter + packed "item:count:err" triples
# (Arrow-stable packing, same discipline as the KMV min-set)
HH_STATE_SCHEMA = StructType([
    StructField("seq", LongType()),
    StructField("counters", StringType()),
])


def _hh_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
    counters: dict[int, list[int]] = {}
    seq = 0
    if state.exists:
        (seq, packed) = state.get
        if packed:
            for part in packed.split(","):
                i, c, e = part.split(":")
                counters[int(i)] = [int(c), int(e)]
    # a group's micro-batch rows may arrive as MULTIPLE Arrow chunks in
    # shuffle order — sorting per chunk would interleave out of event-time
    # order and break the batch-split determinism invariant; concat the
    # whole group's batch, sort ONCE
    chunks = list(pdfs)
    allpdf = (pd.concat(chunks, ignore_index=True) if chunks
              else pd.DataFrame())
    if len(allpdf):
        allpdf = allpdf.sort_values(["ts", "event_id"])
        for item in allpdf["user_id"].astype(int):
            if item in counters:
                counters[item][0] += 1
            elif len(counters) < HH_CAPACITY:
                counters[item] = [1, 0]
            else:
                # evict the minimum counter; ties break on LARGEST item
                # id so the rule is total and engine-independent
                victim = min(counters, key=lambda i: (counters[i][0], -i))
                c = counters.pop(victim)[0]
                counters[item] = [c + 1, c]
    packed = ",".join(f"{i}:{c}:{e}"
                      for i, (c, e) in sorted(counters.items()))
    seq += 1
    state.update((seq, packed))
    items = sorted(counters.items(),
                   key=lambda kv: (-kv[1][0], kv[0]))
    yield pd.DataFrame({
        "event_type": [key[0]] * len(items),
        "item": [i for i, _ in items],
        "est_count": [c for _, (c, _) in items],
        "max_err": [e for _, (_, e) in items],
        "seq": [seq] * len(items)})


def heavy_hitters_stream(events: DataFrame) -> DataFrame:
    """Streaming space-saving top-k (Metwally et al.): per event_type,
    the HH_CAPACITY most frequent user_ids with overestimate bounds —
    bounded state per key (m counters) no matter how many distinct
    users flow past, which is the whole point: exact per-item counts
    grow state with cardinality, space-saving caps it and reports
    est_count with max_err such that true_count is in
    [est_count - max_err, est_count].

    Sequential-by-construction: counters update in the stream's
    (ts, event_id) total order inside each micro-batch, and the
    counter table carries across batches in the state store — so ANY
    partition of the stream into micro-batches yields the identical
    final counter table (the batch-parity test pins this). Emits the
    current table per key each micro-batch (update mode).

    Expects columns event_type, user_id, ts, event_id.
    """
    return (
        events.groupBy("event_type")
        .applyInPandasWithState(
            _hh_fn,
            outputStructType=HH_OUTPUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
