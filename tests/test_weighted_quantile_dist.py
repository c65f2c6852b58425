"""a22_weighted_quantile_dist: the distributed exact twin must return
bit-identically the global-window exact query's rows (SCALING.md §a22
scale path; the dist plan replaces a22's fact-level ordered window with
a bounded bucket decomposition), including under weight skew and
bucket-boundary thresholds the sf tables never hit.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datalake_imagenes_georreferenciadas_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_dist_matches_exact_sf0001(spark):
    exact = _rows(QUERIES["a22_weighted_quantile"](spark, SF))
    dist = _rows(QUERIES["a22_weighted_quantile_dist"](spark, SF))
    assert dist == exact
    assert len(dist) == 2  # one row per registered quantile


def test_dist_plan_shape(spark):
    df = QUERIES["a22_weighted_quantile_dist"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly a22's scan budget: two passes over lineitem, no more
    assert plan.count("FileScan") == 2
    # the ONE SinglePartition is the bounded bucket window (post-agg);
    # a22's fact-level ordered window has no counterpart here
    assert plan.count("SinglePartition") == 1
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # positive-weight domain contract pushed into both scans
    assert plan.count("GreaterThan(l_quantity,0.0)") == 2


def test_dist_synthetic_boundary_cases(spark):
    """Thresholds landing exactly ON a bucket boundary and weights
    spanning buckets: the crossing-bucket predicate (cum_before < q·tw
    ≤ cum_through) must pick the same min-v as the global cumsum."""
    import pyspark.sql.functions as F

    # values straddle the floor(v/1000) boundary at 1000.0; weights make
    # q=0.5 fall exactly on the cumulative boundary between buckets
    rows = [
        # (orderkey, linenumber, quantity, extendedprice)
        (1, 1, 10.0, 999.99),
        (1, 2, 10.0, 1000.00),
        (2, 1, 10.0, 1000.01),
        (2, 2, 10.0, 2500.00),
    ]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber int, l_quantity double, l_extendedprice double"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/lineitem.parquet")
        exact = _rows(QUERIES["a22_weighted_quantile"](spark, d))
        dist = _rows(QUERIES["a22_weighted_quantile_dist"](spark, d))
    assert dist == exact
    # q=0.5: threshold 20 of 40 total weight — cum reaches exactly 20 at
    # v=1000.00, the first value of bucket 1 (boundary row)
    assert exact[0] == (0.5, 1000.00)
