"""Flagship query — the reference's catalog-filtered retrieval join (J1).

The only genuine relational query in the reference is a 3-way inner
equi-join with conjunctive filters and a narrow projection
(`/root/reference/mysql_process.py:67-74`):

    SELECT C.ID, C.RUTA_RESULTADO
    FROM PROC_EJECUCION P
    JOIN DETALLE_EJECUCION D ON P.ID_EJECUCION = D.ID_EJECUCION
    JOIN CATALOG C          ON D.ID_IMAGEN_FUENTE = C.ID
    WHERE C.ID_TIPO_IMG IN (...) AND P.ID_PROCESO = ... AND C.INDICE = '...'

Retargeted at the driver's star schema: ``orders`` plays the catalog fact,
``customer`` the junction, ``nation`` the run dimension. Spark-first
execution notes:

- Declared as a DataFrame plan → Catalyst pushes all three predicates into
  the parquet scans (``PushedFilters``) and prunes columns (``ReadSchema``).
- ``nation`` (25 rows at every SF) is hint-broadcast; ``customer``
  scales linearly with SF, so it is UNHINTED — Catalyst's size stats
  compile it to BroadcastHashJoin while it fits the threshold (true at
  every test SF → zero shuffles, the fact table streams through
  map-side joins) and fall back to a shuffle join at scales where a
  15-billion-row junction can no longer ship to every executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table


def catalog_filtered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer ⋈ nation, P5-style filters, 2-column projection."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")

    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .filter(
            F.col("o_orderstatus").isin("O", "F")
            & (F.col("n_name") == "NATION_7")
            & (F.col("c_mktsegment") == "BUILDING")
        )
        .select(F.col("o_orderkey").alias("id"), F.col("o_totalprice").alias("ruta_resultado"))
    )


FLAGSHIP_ORACLE_SQL = """
SELECT o.o_orderkey AS id, o.o_totalprice AS ruta_resultado
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus IN ('O', 'F')
  AND n.n_name = 'NATION_7'
  AND c.c_mktsegment = 'BUILDING'
"""
