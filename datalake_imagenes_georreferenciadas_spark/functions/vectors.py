"""Vector similarity over ``array<float>`` embedding columns (SURVEY F17).

The reference's nearest-vertex search (script_geo.py:92-140) is a 2-D
special case of k-NN; the north star generalizes it to embedding
similarity. All kernels here are higher-order-function column expressions
(``zip_with``/``aggregate``) — JVM-side, sequential left-to-right folds,
so the arithmetic is reproducible and matches an oracle that accumulates
in the same order. Casts to double FIRST so both engines do f64 math on
the same f32 inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    """Squared L2 norm, same fold order as :func:`dot`."""
    return F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity ``dot / (sqrt(n2a) * sqrt(n2b))``."""
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))


def euclidean2(a: Column, b: Column) -> Column:
    """Squared euclidean distance (argmin-safe; skip the sqrt, as the
    reference's distance compare only needs ordering — script_geo.py:118-124)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# ---- DuckDB oracle twins (accumulate via list folds in the same order) ----


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(generate_series(1, len({a})), "
        f"i -> ({a})[i]::DOUBLE * ({b})[i]::DOUBLE), 'sum')"
    )


def norm2_sql(a: str) -> str:
    return f"list_aggregate(list_transform({a}, x -> x::DOUBLE * x::DOUBLE), 'sum')"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / (sqrt({norm2_sql(a)}) * sqrt({norm2_sql(b)})))"


def euclidean2_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`euclidean2` (same sequential fold order)."""
    return (
        f"list_aggregate(list_transform(generate_series(1, len({a})), "
        f"i -> (({a})[i]::DOUBLE - ({b})[i]::DOUBLE) * (({a})[i]::DOUBLE - ({b})[i]::DOUBLE)), 'sum')"
    )
