"""As-of join: for each left row, the latest right row with ts <= left.ts
per key — the timeseries point-in-time lookup Spark has no built-in for
(the task-brief example of an operator to compose from primitives).

Plan shape — union + sorted carry-forward, NOT a join:
a naive implementation joins on key with r.ts <= l.ts and takes max —
quadratic in per-key density (every left row meets every earlier right
row). Instead both sides are unioned with a side tag, sorted per key by
(ts, side), and the right value is carried forward with
last(ignorenulls) over an unbounded-preceding window: ONE shuffle on the
key, linear work, and the window never materializes more than a
partition. Right rows sort before left rows at equal ts, so the match is
inclusive (ts_r <= ts_l), matching DuckDB's ASOF JOIN semantics.

Determinism: callers must make the right side unique per (key, ts)
(pre-aggregate, e.g. max of the value) — with duplicates the carried
value would depend on sort ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              value_cols: list[str]) -> DataFrame:
    """Left as-of join. Returns left's columns + value_cols filled from
    the latest right row with right[ts] <= left[ts] (null when none).

    left / right must both carry `on` and `ts`; right additionally the
    value_cols, unique per (on, ts).
    """
    lcols = [c for c in left.columns if c not in (on, ts)]
    l_tag = left.select(
        on, ts, F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols])
    r_tag = right.select(
        on, ts, F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols])
    w = (Window.partitionBy(on).orderBy(ts, "__side")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = l_tag.unionByName(r_tag).select(
        "*", *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
               for c in value_cols])
    return (carried.filter(F.col("__side") == 1)
            .select(on, ts, *lcols,
                    *[F.col(f"__c_{c}").alias(c) for c in value_cols]))


def asof_join_forward(left: DataFrame, right: DataFrame, on: str, ts: str,
                      value_cols: list[str],
                      tolerance: int | float | None = None) -> DataFrame:
    """Forward as-of join: for each left row, the EARLIEST right row with
    right[ts] >= left[ts] (and right[ts] - left[ts] <= tolerance when
    given, in the ts column's own units) — the "next event after"
    lookup (click -> first purchase within the hour).

    Same union + sorted-carry plan as asof_join, mirrored by REVERSING
    the sort: per key order by (ts DESC, side DESC) — right rows first
    at equal ts for the inclusive match — and carry the right values
    with last(ignorenulls) over the RUNNING (unbounded-preceding) frame,
    which Spark evaluates with a sliding accumulator. The naive mirror
    (first over rowsBetween(0, unboundedFollowing)) re-aggregates the
    whole suffix per row (SURVEY 4.4, measured 5x on pareto_frontier).
    One shuffle, linear per key; the tolerance is a post-carry filter on
    the carried match ts, so it never changes the plan shape. Right side
    must be unique per (on, ts) for determinism, as in asof_join.
    """
    lcols = [c for c in left.columns if c not in (on, ts)]
    l_tag = left.select(
        on, ts, F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
        F.lit(None).cast(left.schema[ts].dataType).alias("__r_ts"))
    r_tag = right.select(
        on, ts, F.lit(2).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(ts).alias("__r_ts"))
    w = (Window.partitionBy(on)
         .orderBy(F.col(ts).desc(), F.col("__side").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
          for c in value_cols],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__c_ts"))
    in_tol = (F.lit(True) if tolerance is None
              else (F.col("__c_ts") - F.col(ts)) <= F.lit(tolerance))
    return (carried.filter(F.col("__side") == 1)
            .select(on, ts, *lcols,
                    *[F.when(in_tol, F.col(f"__c_{c}")).alias(c)
                      for c in value_cols]))
