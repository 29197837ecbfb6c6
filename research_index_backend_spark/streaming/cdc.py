"""Streaming CDC sink: a changelog stream applied to a Parquet target
via foreachBatch — the Debezium->lake shape.

Each micro-batch runs operators.cdc.cdc_apply_parquet: last-op-per-key
reduction over BATCH rows, then a version-aware MERGE (>= on the order
columns) so at-least-once redelivery and out-of-order replays never
resurrect deleted keys or regress rows — state lives in the target
table itself (the stored version columns), so the sink needs no state
store and survives checkpoint loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.cdc import cdc_apply_parquet


def foreach_batch_cdc(stream: DataFrame, target_path: str,
                      keys: list[str], order_cols: list[str],
                      checkpoint: str, op_col: str = "op"):
    """Start the changelog-apply loop. Returns the StreamingQuery;
    callers own awaitTermination/stop."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cdc_apply_parquet(batch_df.sparkSession, batch_df, target_path,
                          keys, order_cols, op_col=op_col)

    return (
        stream.writeStream
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
