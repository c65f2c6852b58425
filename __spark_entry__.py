"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``datalake_imagenes_georreferenciadas_spark``; this module
only adapts it to the driver's entry-point shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datalake_imagenes_georreferenciadas_spark.plans.flagship import catalog_filtered_join
from datalake_imagenes_georreferenciadas_spark.plans.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §2 J1 — the reference's catalog-filtered
    3-way join, mysql_process.py:67-74) on /root/testdata/sf0.001."""
    return catalog_filtered_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query."""
    return all_oracles()
