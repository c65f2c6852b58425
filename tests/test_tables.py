"""tables.py — ts-encoding normalization and scan rebalancing (the
round-4 schema-drift and single-split fixes)."""

from __future__ import annotations

import datetime
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from datalake_imagenes_georreferenciadas_spark.tables import spread, table


def _write_events(path, ts_array):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": ts_array,
                "user_id": pa.array([10, 20], pa.int64()),
            }
        ),
        path,
    )


def test_events_ts_normalized_from_us_ntz(spark):
    """µs timestamps (isAdjustedToUTC=false → TIMESTAMP_NTZ in Spark 4)
    must read back as session-zone TIMESTAMP with identical instants."""
    d = tempfile.mkdtemp()
    t0 = datetime.datetime(2024, 1, 1, 12, 30, 45)
    _write_events(
        os.path.join(d, "events.parquet"),
        pa.array([t0, t0 + datetime.timedelta(seconds=90)], pa.timestamp("us")),
    )
    df = table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert got[0] == t0 and (got[1] - got[0]).total_seconds() == 90
    # numeric casts must be legal (the operation TIMESTAMP_NTZ refuses)
    assert df.select(F.col("ts").cast("double")).count() == 2


def test_events_ts_normalized_from_int64_nanos(spark):
    """The legacy INT64-nanos encoding still converts via integer div."""
    d = tempfile.mkdtemp()
    base_ns = 1704112245_000_000_000  # 2024-01-01T12:30:45Z
    _write_events(
        os.path.join(d, "events.parquet"),
        pa.array([base_ns, base_ns + 90 * 10**9], pa.int64()),
    )
    df = table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert (got[1] - got[0]).total_seconds() == 90
    assert got[0] == datetime.datetime(2024, 1, 1, 12, 30, 45)


def test_spread_rebalances_single_split_and_preserves_rows(spark):
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(100), pa.int64())}),
        os.path.join(d, "docs.parquet"),
    )
    df = spark.read.parquet(os.path.join(d, "docs.parquet"))
    assert df.rdd.getNumPartitions() == 1
    out = spread(df, "doc_id")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(100))


def test_spread_noop_when_already_parallel(spark):
    df = spark.range(1000).repartition(spark.sparkContext.defaultParallelism)
    out = spread(df)
    assert out is df  # no extra exchange inserted
