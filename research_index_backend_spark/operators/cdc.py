"""CDC changelog application: version-aware MERGE with retained
tombstones.

The batch core of a Debezium/binlog->lake sink. q_cdc_apply
(plans/queries_ext5.py) materializes a snapshot from a complete
changelog in one query; this operator applies an INCREMENTAL slice of
changelog against an existing Parquet target — the per-micro-batch step
the streaming sink (streaming.cdc.foreach_batch_cdc) runs.

Semantics (the part naive sinks get wrong):
- every applied row carries its changelog version (the order columns,
  e.g. ts + seq), and an incoming operation only wins against a stored
  row when its version is >= the stored one;
- deletes are RETAINED as tombstone rows (__cdc_deleted = true) holding
  the delete's version, so a replayed OLDER upsert of a deleted key
  loses the version comparison and the key stays dead.
Together: application is IDEMPOTENT under at-least-once delivery and
safe under PARTIAL replay of any historical slice — a sink that upserts
blindly (or drops deletes without a marker) resurrects deleted keys.
`cdc_state` is the read view (tombstones filtered). Tombstone GC —
dropping markers older than the source's replay horizon — is a
maintenance compaction, deliberately separate from the apply path.

Scale shape: the batch first collapses to last-op-per-key (a window
over BATCH rows only — micro-batch sized, not table sized), then ONE
key-shuffle full-outer join against the target decides winners; the
swap write inherits upsert_parquet's crash-safe rename protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .upsert import swap_write

DELETE_OP = "delete"
TOMBSTONE_COL = "__cdc_deleted"


def cdc_reduce(batch: DataFrame, keys: list[str],
               order_cols: list[str]) -> DataFrame:
    """Collapse a changelog slice to the LAST operation per key.
    order_cols must be a total order within a key (e.g. ts, seq) —
    the within-batch twin of q_cdc_apply's whole-log window, but over
    micro-batch rows only."""
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_cols])
    return (batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def cdc_merge(existing: DataFrame | None, batch: DataFrame,
              keys: list[str], order_cols: list[str],
              op_col: str = "op") -> DataFrame:
    """Version-aware MERGE of a changelog slice into the stored state
    (tombstones included on both sides).

    Returns the new stored table: data columns + TOMBSTONE_COL, op
    column removed. An incoming op wins only when the key is absent or
    its version struct >= the stored row's; a winning delete writes a
    tombstone carrying the delete's version, a winning upsert replaces
    the row (and revives a tombstoned key, since the newer version
    wins); a losing op — replayed history — leaves the stored row
    untouched.
    """
    last = cdc_reduce(batch, keys, order_cols)
    ver = F.struct(*[F.col(c) for c in order_cols])
    data_cols = [c for c in last.columns if c not in (*keys, op_col)]
    # coalesce: a NULL op (malformed upstream record) must read as
    # upsert, never as a NULL flag — a NULL __cdc_deleted would make the
    # row invisible to cdc_state AND silently GC-able by cdc_compact
    is_delete = F.coalesce(F.col(op_col) == DELETE_OP, F.lit(False))
    inc = last.select(
        *keys, ver.alias("__v_in"),
        F.struct(*data_cols,
                 is_delete.alias(TOMBSTONE_COL))
        .alias("__row_in"))
    if existing is None:
        return inc.select(*keys, "__row_in.*")
    ex = existing.select(
        *keys, ver.alias("__v_ex"),
        F.struct(*[c for c in existing.columns if c not in keys])
        .alias("__row_ex"))
    j = ex.join(inc, on=keys, how="full_outer")
    inc_wins = F.col("__v_in").isNotNull() & (
        F.col("__v_ex").isNull() | (F.col("__v_in") >= F.col("__v_ex")))
    winner = F.when(inc_wins, F.col("__row_in")).otherwise(F.col("__row_ex"))
    return j.select(*keys, winner.alias("__row")).select(*keys, "__row.*")


def cdc_state(stored: DataFrame) -> DataFrame:
    """The live-rows view of a stored CDC table: tombstones filtered,
    marker dropped."""
    return stored.filter(~F.col(TOMBSTONE_COL)).drop(TOMBSTONE_COL)


def cdc_apply_parquet(spark, batch: DataFrame, path: str,
                      keys: list[str], order_cols: list[str],
                      op_col: str = "op") -> None:
    """Apply one changelog slice to a Parquet target via the shared
    crash-safe swap protocol (operators.upsert.swap_write)."""
    swap_write(spark, path,
               lambda existing: cdc_merge(existing, batch, keys,
                                          order_cols, op_col))


def cdc_compact(spark, path: str, order_cols: list[str],
                horizon: tuple, n_files: int | None = None) -> None:
    """Tombstone GC + file compaction for a stored CDC table.

    Drops tombstones whose version struct is strictly below `horizon`
    (the oldest version the source can still replay — e.g. the
    retention boundary of the upstream log): replays older than the
    horizon can no longer arrive, so those markers no longer guard
    anything. Live rows are NEVER dropped regardless of age. n_files
    coalesces the rewrite (micro-batch appends fragment the target).
    Same crash-safe swap protocol as apply (swap_write).
    """

    def build(stored: DataFrame | None) -> DataFrame:
        if stored is None:
            raise ValueError(f"cdc_compact: no CDC table at {path}")
        ver = F.struct(*[F.col(c) for c in order_cols])
        # struct comparison requires matching field names AND types —
        # cast each horizon literal to its stored column's type
        types = {f.name: f.dataType for f in stored.schema.fields}
        hor = F.struct(*[F.lit(v).cast(types[c]).alias(c)
                         for c, v in zip(order_cols, horizon)])
        keep = stored.filter(~F.col(TOMBSTONE_COL) | (ver >= hor))
        return keep.coalesce(n_files) if n_files else keep

    swap_write(spark, path, build)
