"""Testdata table loading.

The driver provides TPC-H-ish parquet tables (see /root/repo/TESTDATA.md):
``region nation customer supplier part orders lineitem events documents
embeddings`` at ``/root/testdata/sf{0.001,0.01,0.1}``. Loading via
``spark.read.parquet`` keeps Catalyst's parquet pushdown (filters, column
pruning, partition pruning) intact — the scans in ``.explain`` should show
``PushedFilters`` and a pruned ``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame (lazy parquet scan).

    ``events.ts`` is normalized to a session-zone (UTC) TIMESTAMP whatever
    the generator wrote:

    - TIMESTAMP(NANOS): the vectorized reader rejects it; read nanos as
      long (legacy conf, runtime-settable) and convert with integer
      division (`div`, not float `/` — ns epochs exceed 2^53 so a double
      round-trip loses bits). DuckDB truncates ns→µs the same way.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
      TIMESTAMP_NTZ, which refuses numeric casts downstream; cast to the
      session-zone type (session tz is pinned UTC, so the instant is
      unchanged and matches DuckDB's naive read).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def spread(df: DataFrame, *keys: str) -> DataFrame:
    """Rebalance a scan whose file layout under-parallelizes a heavy
    downstream kernel (e.g. a single-row-group parquet file scans as ONE
    task, serializing regex/shingle/hash work that is embarrassingly
    parallel). No-op when the scan already fans out to the session's
    parallelism — so at cluster scale, where sources arrive as many
    splits, no extra shuffle is paid. The explicit partition count keeps
    AQE from coalescing the small exchange back to one partition."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *keys) if keys else df.repartition(n)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every testdata table; returns name → DataFrame."""
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for the SQL surface."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
