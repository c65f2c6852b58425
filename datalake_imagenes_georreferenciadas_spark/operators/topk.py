"""Top-k-per-group and argmin operators (SURVEY §2.5/§2.6, A2, J3–J5).

The reference's 3-tier nearest-neighbor search (script_geo.py:92-140) is a
manual running-argmin; its Spark shape is a ranking window (or ``min_by``
when only the winner is needed — one shuffle on the group key, map-side
partial aggregation, no driver-side loop).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the top-k rows per group under a deterministic ordering.

    Callers must make ``order_cols`` a total order (append a unique
    tie-break key) or ranks are nondeterministic across runs — the float
    tie-breaking hazard SURVEY §7 calls out.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def argmin_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    score: Column,
    payload: Sequence[str],
) -> DataFrame:
    """A2: ``min_by``-style argmin — the winner's payload per group.

    Implemented as ``min(struct(score, tiebreak..., payload...))`` so ties
    resolve deterministically by the payload ordering, unlike a bare
    ``min_by`` (and unlike the reference's float-equality compares,
    script_geo.py:96,102,124,138 — SURVEY §2.11 bug 6).
    """
    packed = F.struct(score.alias("__score"), *[F.col(c) for c in payload])
    out = df.groupBy(*group_cols).agg(F.min(packed).alias("__w"))
    return out.select(*group_cols, *[F.col(f"__w.{c}").alias(c) for c in payload])
