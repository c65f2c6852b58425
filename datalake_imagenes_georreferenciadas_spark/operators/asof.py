"""As-of and range (interval) joins (SURVEY §2.3 EXT row).

Neither exists in the reference — its only temporal logic is `FECHA`
bookkeeping (mysql_process.py:31,48) — but both are core engine surface
for event/time-series workloads and are called out in the inventory as
the semi/anti/range/as-of extension row.

Scale notes:

- **as-of** is implemented as the union + partitioned ``last(ignorenulls)``
  window — the classic merge shape: ONE shuffle on the key, no range
  explosion, no per-row probe. A join-then-argmax formulation shuffles the
  same data AND materializes every candidate pair; this never does.
- **range join** keeps the equality key in the join condition so Catalyst
  plans a hash join with the range as a residual filter — not a
  BroadcastNestedLoop. Skewed keys fall to AQE skew handling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    right_value_cols: Sequence[str] | None = None,
    matched_ts_col: str = "asof_ts",
) -> DataFrame:
    """For each left row, the right row with the greatest ``ts`` ≤ left's.

    Right should be unique per (keys, ts) — pre-aggregate if not, or the
    winner among equal timestamps is the union order (nondeterministic).
    Output: all left columns + ``right_value_cols`` + ``matched_ts_col``
    (null when no prior right row exists — left-join semantics).
    """
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (*keys, ts_col)]

    left_payload = [c for c in left.columns if c not in (*keys, ts_col)]
    lt = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__r_ts"),
    )
    rt = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.col(ts_col).alias("__r_ts"),
    )
    u = lt.unionByName(rt)
    # right rows (__is_left=0) sort before left at equal ts → "<=" semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *keys,
        ts_col,
        "__is_left",
        *left_payload,
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(c)
            for c in right_value_cols
        ],
        F.last(F.col("__r_ts"), ignorenulls=True).over(w).alias(matched_ts_col),
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: Column,
    right_ts: Column,
    lower: Column,
    upper: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-key join with a time-range residual: ``right_ts ∈ [left_ts +
    lower, left_ts + upper]``. The equality on ``keys`` keeps this a hash
    join (shuffle-partitionable); the range is a post-join filter."""
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    cond = cond & (right_ts >= left_ts + lower) & (right_ts <= left_ts + upper)
    return left.join(right, cond, how)
