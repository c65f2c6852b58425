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

    The matched right row is carried as ONE struct through a single
    ``last(ignorenulls)`` — per-column fills would decouple fields when
    a right row carries a NULL payload value (the r16 null-fuzz find:
    the fill skips the null and splices an OLDER row's value next to
    the newer row's timestamp).
    """
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (*keys, ts_col)]

    left_payload = [c for c in left.columns if c not in (*keys, ts_col)]
    r_struct = F.struct(
        F.col(ts_col).alias("__ts"),
        *[F.col(c).alias(c) for c in right_value_cols],
    )
    null_r = F.lit(None).cast(
        "struct<__ts:"
        + right.schema[ts_col].dataType.simpleString()
        + ","
        + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_value_cols
        )
        + ">"
    )
    lt = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_payload],
        null_r.alias("__r"),
    )
    rt = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        r_struct.alias("__r"),
    )
    u = lt.unionByName(rt)
    # right rows (__is_left=0) sort before left at equal ts → "<=" semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last(F.col("__r"), ignorenulls=True).over(w)
    filled = u.select(
        *keys,
        ts_col,
        "__is_left",
        *left_payload,
        *[matched[c].alias(c) for c in right_value_cols],
        matched["__ts"].alias(matched_ts_col),
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


def resample_interpolate(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tiebreak_col: str = "event_id",
    step_seconds: int = 3600,
    max_steps_per_key: int = 1_000_000,
) -> DataFrame:
    """Time-series resample with LINEAR INTERPOLATION: for every
    ``step_seconds`` grid point inside each key's [min ts, max ts], the
    value interpolated between the latest event at-or-before and the
    earliest event strictly after the grid point (last grid point may
    have no successor → carries the previous value).

    The hypertable-rollup / sensor-resample shape, built as the same
    union-merge as :func:`asof_join` run in BOTH directions: events and
    grid rows union into one timeline per key, a forward window fills
    (prev_x, prev_v), a backward window fills (next_x, next_v) — ONE
    shuffle on the key, no per-grid-point probe, no range explosion.
    Events sort before their exact grid point (``is_grid`` in the order)
    so an event exactly on the grid wins as "prev" and interpolation
    degenerates to its value.

    Timestamps are floored to epoch seconds on entry (cross-engine:
    Spark ``unix_timestamp`` floors, the oracle uses
    ``floor(epoch(...))``); ties within a second resolve by
    ``tiebreak_col``.

    ``max_steps_per_key`` is the outlier fail-safe: a single corrupt
    timestamp (epoch 0, year 2199, ...) would otherwise silently inflate
    one key's grid to hundreds of millions of rows — at cluster scale an
    OOM, found by the r15 extreme-timestamp fuzz as a multi-minute local
    hang. The guard lives INSIDE the grid expression (a raise_error
    branch on the consumed sequence — unprunable, zero cost per healthy
    key) and fails fast with the offending key's span instead of
    materializing it. The cap is INCLUSIVE of its own value: a key
    spanning exactly ``max_steps_per_key`` grid steps already raises
    (a ``>=`` trigger — the r16 tightening). 1M hourly steps ≈ 114
    years — far beyond any
    legitimate sensor span; pass a larger value deliberately if needed.
    The cap is approximate to within one step: for pre-1970 (negative
    epoch) bounds Spark's truncate-toward-zero ``div`` undercounts the
    floor-difference step count by up to one — acceptable slack on a
    fail-safe whose purpose is catching million-fold blow-ups.
    """
    k = F.col(key_col)
    e = events.select(
        k.alias("__k"),
        F.unix_timestamp(F.col(ts_col)).alias("__x"),
        F.col(val_col).cast("double").alias("__v"),
        F.col(tiebreak_col).cast("long").alias("__tb"),
    )
    bounds = e.groupBy("__k").agg(F.min("__x").alias("__lo"), F.max("__x").alias("__hi"))
    n_steps = f"(__hi div {step_seconds}) - (__lo div {step_seconds})"
    grid = bounds.select(
        "__k",
        F.explode(
            F.expr(
                f"CASE WHEN {n_steps} >= {max_steps_per_key} THEN "
                f"raise_error(concat('resample_interpolate: key ', cast(__k as string), "
                f"' spans ', cast({n_steps} as string), ' grid steps >= max_steps_per_key="
                f"{max_steps_per_key} — corrupt outlier timestamp?')) "
                f"ELSE sequence((__lo + {step_seconds - 1}) div {step_seconds},"
                f" __hi div {step_seconds}) END"
            )
        ).alias("__g"),
    ).select("__k", (F.col("__g") * step_seconds).alias("__x"))
    pt = F.struct(F.col("__x").alias("x"), F.col("__v").alias("v"))
    ev_rows = e.select("__k", "__x", F.lit(0).alias("__is_grid"), pt.alias("__pt"), "__tb")
    null_pt = F.lit(None).cast("struct<x:bigint,v:double>")
    grid_rows = grid.select(
        "__k",
        "__x",
        F.lit(1).alias("__is_grid"),
        null_pt.alias("__pt"),
        F.lit(None).cast("long").alias("__tb"),
    )
    order = [F.col("__x"), F.col("__is_grid"), F.col("__tb")]
    w_fwd = (
        Window.partitionBy("__k").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bwd = (
        Window.partitionBy("__k").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = (
        ev_rows.unionByName(grid_rows)
        .withColumn("__prev", F.last("__pt", ignorenulls=True).over(w_fwd))
        .withColumn("__next", F.first("__pt", ignorenulls=True).over(w_bwd))
    )
    px, pv = F.col("__prev.x"), F.col("__prev.v")
    nx, nv = F.col("__next.x"), F.col("__next.v")
    interp = F.when(nx.isNull(), pv).otherwise(
        pv + (nv - pv) * (F.col("__x") - px) / (nx - px)
    )
    # explicit HALF-UP rounding: interpolation lands on exact .xxxx5
    # halves (rational grid fractions), where Spark's round() goes up but
    # DuckDB's goes half-to-even — floor(x*1e4 + 0.5) is identical in both
    rounded = F.floor(interp * 10000 + F.lit(0.5)) / 10000.0
    return filled.filter(F.col("__is_grid") == 1).select(
        F.col("__k").alias(key_col),
        F.col("__x").alias("grid_epoch"),
        rounded.alias(val_col),
    )
