"""Sessionization and event-window operators over the ``events`` table
(SURVEY §2.9 EXT). Batch twins of the streaming windows in
``streaming.windows`` — same semantics, oracle-checkable.

Session windows in batch are the classic gaps-and-islands plan: lag(ts)
per user → gap > threshold starts a new island → running count names the
session. One shuffle (partition by user), all window state bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign a session id per (user, gap>threshold island).

    Ordering contract (r16): callers exclude NULL event times (a row
    without a timestamp can't sessionize); the event_id tie-break keeps
    Spark's default ASC NULLS FIRST, written explicitly here and
    mirrored as ``NULLS FIRST`` in every oracle so neither engine's
    default decides frame membership on dirty data."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc_nulls_first(), F.col("event_id").asc_nulls_first()
    )
    gap_s = gap_minutes * 60.0
    prev = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev.isNull()
        | ((F.col(ts_col).cast("double") - prev.cast("double")) > gap_s),
        1,
    ).otherwise(0)
    return events.withColumn("__new", new_sess).withColumn(
        "session_seq", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new")


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session aggregates (count, span, value sum) — the batch twin of
    ``session_window(ts, gap)``."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def tumbling_window_agg(
    events: DataFrame, ts_col: str = "ts", minutes: int = 10
) -> DataFrame:
    """Tumbling-window counts/sums; batch twin of ``F.window`` so the
    oracle can use ``time_bucket``. Exposes window_start (not the struct)
    for cross-engine schema parity."""
    return (
        events.groupBy(F.window(ts_col, f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
