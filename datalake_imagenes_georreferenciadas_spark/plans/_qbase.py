"""The operator-coverage query registry (SURVEY §2 → driver contract).

Every implemented operator lands here as a named (spark_fn, oracle_sql)
pair; ``__spark_entry__.py`` re-exports them. Conventions:

- each spark fn takes ``(spark, sf_dir)`` and returns a DataFrame;
- every computed column is aliased identically in Spark and SQL (the
  driver's value-hash sorts columns by name);
- double aggregates go through ``decimal(18,4)`` partial sums (order-
  independent, so Spark's partition-parallel sum and DuckDB's sequential
  sum agree bit-exactly) and come back as doubles;
- unit-scale floats (cosines, scores) are rounded to 6 decimals on both
  sides, money-scale to 2;
- timestamps leave the plan as epoch BIGINTs where a window start is part
  of the result (cross-engine timestamp hashing is not worth the risk).
"""

from __future__ import annotations

import glob as glob_mod
import hashlib
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import geo as GEO
from ..functions import hashing as H
from ..functions import text as TX
from ..functions import vectors as V
from ..functions.geo import affine_extent, point_in_ring
from ..functions.strings import composite_key, parse_model_filename, path_parts
from ..operators import dedup as D
from ..operators import similarity as SIM
from ..operators.sessionize import sessionize
from ..operators.spatial import classify_points, contains_join, contains_join_grid, nearest_vertex_join
from ..operators.topk import argmin_per_group, topk_per_group
from ..tables import spread, table
from . import geo_fixture as GF
from .flagship import FLAGSHIP_ORACLE_SQL, catalog_filtered_join

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _scaled_stream_partitions(
    spark: SparkSession, n_bytes: int, per_partition: int = 64 << 20
) -> int:
    """Shuffle/state-store partition count for a one-shot availableNow
    streaming replay, derived from the staged input size instead of the
    session constant (r19; guide §2.2 "fewer, larger partitions" + the
    §2 directive to make partitioning scale-adaptive). Streaming
    aggregations get NO AQE coalescing, so every micro-batch commits one
    state-store instance per shuffle partition — at the bench's few-MB
    fixtures a fixed 32 means 32 near-empty state commits per batch
    (measured: streaming_stream_join 5.9 s → 2.2 s, append_windows
    7.5 s → 3.5 s at the derived value, results hash-identical). One
    partition per ~64 MB of input, floored at 4 for pipeline overlap,
    capped at 4× the session parallelism (past that, per-task state is
    bounded by input splitting anyway) — on a 100 TB replay the derived
    value grows to the cap, scaling with the cluster."""
    import math

    cores = spark.sparkContext.defaultParallelism
    return max(4, min(4 * cores, math.ceil(max(n_bytes, 1) / per_partition)))


class _stream_shuffle:
    """Context manager: set ``spark.sql.shuffle.partitions`` to the
    input-derived streaming value for the duration of one streaming
    query run, then restore the session value (the surrounding batch
    queries keep their own setting). ``paths`` are the staged stream
    source dirs/files; symlinks are followed (the fixtures symlink the
    parquet inputs)."""

    def __init__(self, spark: SparkSession, *paths: str):
        self.spark = spark
        n = 0
        for p in paths:
            if os.path.isfile(p):
                n += os.path.getsize(p)
                continue
            for root, _dirs, files in os.walk(p, followlinks=True):
                for f in files:
                    fp = os.path.join(root, f)
                    try:
                        n += os.path.getsize(fp)
                    except OSError:
                        pass
        self.n_bytes = n

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(_scaled_stream_partitions(self.spark, self.n_bytes)),
        )
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)
        return False


def _norm_event_ts(df: DataFrame) -> DataFrame:
    """Normalize a raw ``events`` read's ``ts`` to session-zone TIMESTAMP —
    same contract as tables.table: INT64 nanos (legacy generator) become a
    µs timestamp via integer division; TIMESTAMP_NTZ (µs generator) is cast
    into the UTC-pinned session zone. Streaming reads go through this too,
    since their explicit file schema mirrors whatever the generator wrote."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _dsum(col: F.Column) -> F.Column:
    """Order-independent double sum: decimal partials, double result."""
    return F.sum(col.cast("decimal(18,4)")).cast("double")


def _dsum_sql(expr: str) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE)"


