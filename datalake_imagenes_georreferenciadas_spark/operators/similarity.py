"""Similarity search over embedding columns (SURVEY F17, north star).

Two tiers, as the scale plan demands:

- **Brute-force top-k** (the correctness baseline): broadcast the query
  vectors, score every row with a codegen'd higher-order-function cosine,
  take top-k with a ranking window. At 100 TB this is a full scan but a
  perfectly parallel one — no shuffle until the final per-query top-k,
  which AQE keeps tiny because the window input is pre-filtered per query.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  (seeded, deterministic, cross-engine reproducible) bucket vectors so a
  query only scans its bucket (+ optional neighboring probes). The bucket
  join is an equi-join on the signature — shuffle-partitionable, index-free.

An IVF variant would swap the hyperplane bucket for a coarse-centroid
assignment (k-means via pyspark.ml) — same join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from .topk import topk_per_group

#: deterministic pseudo-random hyperplane components derived from the
#: cross-engine hash so Spark and DuckDB agree (see hashing.hash64 docs).
_HPLANE_SCALE = 2**59  # hash64 range is [0, 2^60); center at 2^59


def _hyperplane_component(plane: Column, dim: Column) -> Column:
    """Deterministic pseudo-random value in [-1,1) for (plane, dim)."""
    h = F.conv(
        F.substring(F.md5(F.concat(plane.cast("string"), F.lit("#"), dim.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (h - F.lit(_HPLANE_SCALE)).cast("double") / F.lit(float(_HPLANE_SCALE))


def hyperplane_signature(vec: Column, num_planes: int = 8) -> Column:
    """Sign pattern of the vector against ``num_planes`` seeded hyperplanes,
    packed into a BIGINT bucket id.

    The plane loop is unrolled in Python (num_planes is a plan-time
    constant), so each plane's bit weight is a literal — one flat codegen'd
    expression per row, no UDF."""
    def plane_term(p: int):
        # closure factory: PySpark infers lambda arity by signature, so the
        # plane index must be captured, not passed as a defaulted arg
        return lambda x, i: x.cast("double") * _hyperplane_component(F.lit(p), i)

    bucket = F.lit(0).cast("bigint")
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1), plane_term(p)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket


def hyperplane_signature_sql(vec_expr: str, num_planes: int = 8) -> str:
    """DuckDB twin of :func:`hyperplane_signature`."""
    comp = (
        "((('0x' || substring(md5(p::VARCHAR || '#' || (i-1)::VARCHAR), 1, 15))::BIGINT"
        f" - {_HPLANE_SCALE})::DOUBLE / {float(_HPLANE_SCALE)})"
    )
    proj = (
        f"list_aggregate(list_transform(generate_series(1, len({vec_expr})), "
        f"i -> ({vec_expr})[i]::DOUBLE * {comp}), 'sum')"
    )
    return (
        f"list_sum([CASE WHEN {proj} >= 0 THEN (1::BIGINT << p) ELSE 0 END "
        f"FOR p IN generate_series(0, {num_planes - 1})])::BIGINT"
    )


def brute_force_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 10,
    data_id: str = "vec_id",
    query_id: str = "q_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × scan data → window top-k.

    Deterministic ordering: (-cosine, data id) — the float-tie hazard is
    resolved by the unique id, so results hash-match the oracle.
    """
    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qv"))
    scored = data.join(F.broadcast(q)).select(
        query_id,
        F.col(data_id),
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos"),
    )
    return topk_per_group(
        scored, [query_id], [F.col("cos").desc(), F.col(data_id)], k, rank_col="rank"
    ).select(query_id, data_id, "cos", "rank")


def lsh_ann_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    data_id: str = "vec_id",
    query_id: str = "q_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: equi-join on hyperplane bucket, then exact cosine
    + window inside the bucket. Recall trades off with ``num_planes``; at
    scale add multi-probe (flip one bit) unions."""
    d = data.withColumn("__bucket", hyperplane_signature(F.col(vec_col), num_planes))
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("__qv"),
        hyperplane_signature(F.col(vec_col), num_planes).alias("__bucket"),
    )
    scored = d.join(F.broadcast(q), "__bucket").select(
        query_id,
        F.col(data_id),
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos"),
    )
    return topk_per_group(
        scored, [query_id], [F.col("cos").desc(), F.col(data_id)], k, rank_col="rank"
    ).select(query_id, data_id, "cos", "rank")
