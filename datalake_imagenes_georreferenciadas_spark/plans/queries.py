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


# ======================================================================
# J1 — flagship + join variants (SURVEY §2.3)
# ======================================================================

register("catalog_filtered_join", FLAGSHIP_ORACLE_SQL)(catalog_filtered_join)


@register(
    "j1_semi_join",
    """
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def j1_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi = EXISTS (SURVEY §2.3 EXT; incremental-ingest shape)."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "j1_anti_join",
    """
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j1_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti = NOT EXISTS — the 'new files only' ingest guard."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "p7_left_join_null_guard",
    """
    SELECT l.l_orderkey, l.l_linenumber,
           coalesce(p.p_brand, 'IMAGEN NO CLASIFICABLE') AS brand
    FROM lineitem l
    LEFT JOIN (SELECT * FROM part WHERE p_size >= 40) p
      ON l.l_partkey = p.p_partkey
    """,
)
def p7_left_join_null_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: the unclassifiable branch as left-join + coalesce (§2.11 bug 2
    intent — script_geo.py:198-202)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    # part is linear-in-SF — unhinted; size stats broadcast while it fits
    return li.join(part, li.l_partkey == part.p_partkey, "left").select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.col("p_brand"), F.lit("IMAGEN NO CLASIFICABLE")).alias("brand"),
    )


# ======================================================================
# P — projections / filters (SURVEY §2.2)
# ======================================================================


@register(
    "p1_projection_filter",
    "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 2",
)
def p1_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: property projection (script_geo.py:75) — pruned scan + filter."""
    return (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 2)
        .select("n_nationkey", "n_name")
    )


@register(
    "p2_filename_parse",
    """
    WITH named AS (
      SELECT doc_id,
             source || '_' || lang || '_E' || (doc_id % 5)::VARCHAR
                    || '_A' || (doc_id % 3)::VARCHAR || '_grilla.tif' AS name
      FROM documents
    ), stems AS (
      SELECT doc_id,
             string_split(regexp_replace(regexp_replace(name, '\\.[^.]*$', ''),
                                         '(_grilla|_etiquetas|_rodal)$', ''), '_') AS parts
      FROM named
    )
    SELECT doc_id, parts[1] AS codigo, parts[2] AS seccion,
           parts[3] AS especie, parts[4] AS apl
    FROM stems
    """,
)
def p2_filename_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: CODIGO_SECCION_ESPECIE_APL[_suffix].ext codec
    (download_list_images.py:92-99)."""
    docs = table(spark, sf_dir, "documents")
    named = docs.withColumn(
        "name",
        F.concat(
            F.col("source"),
            F.lit("_"),
            F.col("lang"),
            F.lit("_E"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("_A"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("_grilla.tif"),
        ),
    )
    parsed = named.withColumn("p", parse_model_filename(F.col("name")))
    return parsed.select(
        "doc_id",
        F.col("p.codigo").alias("codigo"),
        F.col("p.seccion").alias("seccion"),
        F.col("p.especie").alias("especie"),
        F.col("p.apl").alias("apl"),
    )


@register(
    "p3_composite_key",
    """
    SELECT c_custkey,
           concat_ws('_', c_custkey::VARCHAR, c_mktsegment, c_nationkey::VARCHAR) AS indice
    FROM customer
    """,
)
def p3_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: INDICE composite business key (script_geo.py:197)."""
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        composite_key("c_custkey", "c_mktsegment", "c_nationkey").alias("indice"),
    )


@register(
    "p4_path_parse",
    """
    WITH paths AS (
      SELECT doc_id, 'lake/' || source || '/' || doc_id::VARCHAR || '.txt' AS path
      FROM documents
    ), parts AS (SELECT doc_id, string_split(path, '/') AS p FROM paths)
    SELECT doc_id, p[-1] AS filename, p[-2] AS parent, p[1] AS root FROM parts
    """,
)
def p4_path_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: RUTA_RESULTADO path part recovery (download_list_images.py:59-64)."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "path",
        F.concat(F.lit("lake/"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string"), F.lit(".txt")),
    )
    parsed = docs.withColumn("pp", path_parts(F.col("path")))
    return parsed.select(
        "doc_id",
        F.col("pp.filename").alias("filename"),
        F.col("pp.parent").alias("parent"),
        F.col("pp.root").alias("root"),
    )


@register(
    "p5_filter_in_conj",
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_returnflag IN ('A', 'N') AND l_quantity >= 30
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def p5_filter_in_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: IN + conjunctive predicate (mysql_process.py:72-74); all three
    predicates push into the parquet scan."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_returnflag").isin("A", "N")
            & (F.col("l_quantity") >= 30)
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "p6_type_dispatch",
    """
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN 'BR'
                WHEN event_type = 'purchase' THEN 'TIF' ELSE 'OTRO' END AS clase,
           CASE WHEN event_type = 'error' THEN 0
                WHEN event_type = 'purchase' THEN 3 ELSE 10 END AS tipo_img
    FROM events
    """,
)
def p6_type_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: BR/TIF dispatch as expressions, not exceptions
    (script_geo.py:167-175)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", "BR")
        .when(F.col("event_type") == "purchase", "TIF")
        .otherwise("OTRO")
        .alias("clase"),
        F.when(F.col("event_type") == "error", 0)
        .when(F.col("event_type") == "purchase", 3)
        .otherwise(10)
        .alias("tipo_img"),
    )


# ======================================================================
# A — aggregations (SURVEY §2.4)
# ======================================================================


@register("a1_max_id", "SELECT max(o_orderkey) AS last_id FROM orders")
def a1_max_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the AUTO_INCREMENT peek as a one-row aggregate
    (mysql_process.py:13-25)."""
    return table(spark, sf_dir, "orders").agg(F.max("o_orderkey").alias("last_id"))


@register(
    "a2_argmin_per_group",
    """
    SELECT c_nationkey, c_custkey AS min_cust, round(c_acctbal, 2) AS min_acctbal
    FROM customer
    QUALIFY row_number() OVER (PARTITION BY c_nationkey
             ORDER BY c_acctbal NULLS FIRST, c_custkey NULLS FIRST) = 1
    """,
)
def a2_argmin_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: min_by argmin with deterministic ties (the reference's running
    compare, script_geo.py:117-125)."""
    cust = table(spark, sf_dir, "customer")
    win = argmin_per_group(
        cust,
        ["c_nationkey"],
        F.struct(F.col("c_acctbal"), F.col("c_custkey")),
        ["c_custkey", "c_acctbal"],
    )
    return win.select(
        "c_nationkey",
        F.col("c_custkey").alias("min_cust"),
        F.round("c_acctbal", 2).alias("min_acctbal"),
    )


@register(
    "a3_first_seen_dedup",
    "SELECT lang, min(doc_id) AS first_doc, count(*) AS n FROM documents GROUP BY lang",
)
def a3_first_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: ordered-distinct intent (script_geo.py:71-77): deterministic
    first representative per key."""
    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.min("doc_id").alias("first_doc"), F.count("*").alias("n"))
    )


@register(
    "a4_group_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity')} AS sum_qty,
           {_dsum_sql('l_extendedprice')} AS sum_base_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a4_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: TPC-H-Q1-shaped grouped aggregate — partial (map-side) aggs, one
    shuffle on the group keys; decimal partials for cross-engine exactness."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity")).alias("sum_qty"),
        _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
        F.count("*").alias("count_order"),
    )


@register(
    "a4_rollup",
    f"""
    SELECT l_returnflag, l_linestatus, count(*) AS n, {_dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a4_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: rollup (subtotals + grand total)."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), _dsum(F.col("l_quantity")).alias("sum_qty"))
    )


@register(
    "a4_cube",
    f"""
    SELECT l_returnflag, l_linestatus, count(*) AS n, {_dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a4_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: cube (all grouping-set combinations)."""
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), _dsum(F.col("l_quantity")).alias("sum_qty"))
    )


@register(
    "a4_count_distinct",
    """
    SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a4_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: exact distinct counts (approx_count_distinct is the 100 TB
    variant — same plan shape, sketch aggregation)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
    )


# ======================================================================
# W / S — windows, sorts, top-k (SURVEY §2.5/§2.6)
# ======================================================================


@register(
    "w1_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the J3 top-1-per-group plan generalized."""
    orders = table(spark, sf_dir, "orders")
    top = topk_per_group(
        orders, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
    )
    return top.select(
        "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn"
    )


@register(
    "w2_running_sum",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                                  ROWS UNBOUNDED PRECEDING), 2) AS running
    FROM events
    """,
)
def w2_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate window (frame-ordered fold — same order both
    engines)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("running")
    )


@register(
    "w3_lag_lead",
    """
    SELECT event_id, user_id,
           round(value - coalesce(lag(value) OVER
                 (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST), 0.0), 2) AS delta,
           coalesce(lead(event_id) OVER
                 (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST), -1) AS next_event
    FROM events
    """,
)
def w3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead windows (session ordering surface, SURVEY §2.5)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 2).alias(
            "delta"
        ),
        F.coalesce(F.lead("event_id").over(w), F.lit(-1)).alias("next_event"),
    )


@register(
    "s1_sort_limit",
    """
    SELECT event_id, user_id, event_type FROM events
    ORDER BY ts NULLS FIRST, event_id NULLS FIRST LIMIT 100
    """,
)
def s1_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (TakeOrderedAndProject — no full sort at scale)."""
    return (
        table(spark, sf_dir, "events")
        .orderBy("ts", "event_id")
        .limit(100)
        .select("event_id", "user_id", "event_type")
    )


# ======================================================================
# SET — set operations (SURVEY §2.7)
# ======================================================================


@register(
    "set_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION SELECT s_nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


@register(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@register(
    "set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT SELECT s_nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.subtract(supp)  # EXCEPT DISTINCT (set semantics, like SQL EXCEPT)


# ======================================================================
# F — scalar functions (SURVEY §2.8)
# ======================================================================


@register(
    "f_string_scalars",
    """
    SELECT doc_id, md5(text) AS digest, length(text) AS n_chars2,
           substring(lower(text), 1, 12) AS prefix,
           len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS n_tokens
    FROM documents
    """,
)
def f_string_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F5/F6: split/substr/md5/cast scalar pack
    (download_list_images.py:45,92-99)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("digest"),
        F.length("text").alias("n_chars2"),
        F.substring(F.lower(F.col("text")), 1, 12).alias("prefix"),
        TX.token_count(F.col("text")).alias("n_tokens"),
    )


@register(
    "f_date_parts",
    """
    SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders GROUP BY year(o_orderdate), month(o_orderdate)
    """,
)
def f_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: timestamp handling as typed dates, never strings (§1.4 FECHA)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(F.count("*").alias("n"), _dsum(F.col("o_totalprice")).alias("total"))
    )


@register(
    "f14_json_extract",
    """
    SELECT event_id,
           json_extract_string(CASE WHEN json_valid(props) THEN props END,
                               '$.k')::BIGINT AS k
    FROM events
    """,
)
def f14_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: JSON parse of the props side-channel (script_geo.py:194 shape)."""
    return table(spark, sf_dir, "events").select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


@register(
    "f15_array_ops",
    """
    SELECT vec_id, len(embedding) AS n_dims,
           round(embedding[1]::DOUBLE, 6) AS first_val,
           round(list_aggregate(list_transform(list_slice(embedding, 1, 8),
                                x -> x::DOUBLE), 'sum'), 6) AS sum_first8
    FROM embeddings
    """,
)
def f15_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: array ops over nested data (the reference's coordinate nesting,
    script_geo.py:50-57)."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(
                F.slice(F.col("embedding"), 1, 8),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            ),
            6,
        ).alias("sum_first8"),
    )


# ======================================================================
# F17 / ANN — vector similarity (SURVEY F17, north star)
# ======================================================================

_COSINE_ALL_SQL = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, round({V.cosine_sql('e.embedding', 'q.qe')}, 6) AS cos
FROM embeddings e, q
"""


@register("f17_cosine_all", _COSINE_ALL_SQL)
def f17_cosine_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of every vector against query vec 0 — the brute-force scan
    kernel (higher-order fns, codegen'd, no UDF)."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    return emb.crossJoin(F.broadcast(q)).select(
        "vec_id", F.round(V.cosine(F.col("embedding"), F.col("qe")), 6).alias("cos")
    )


_COSINE_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.q_id, e.vec_id, round({V.cosine_sql('e.embedding', 'q.qe')}, 6) AS cos
  FROM embeddings e, q)
SELECT q_id, vec_id, cos, rank FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 10
"""


@register("f17_cosine_topk", _COSINE_TOPK_SQL)
def f17_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k similarity search (3 queries, k=10)."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return SIM.brute_force_topk(emb, queries, k=10)


_ANN_BUCKETS_SQL = f"""
SELECT vec_id, {SIM.hyperplane_signature_sql('embedding', 6)} AS bucket
FROM embeddings WHERE embedding IS NOT NULL
"""


@register("ann_hyperplane_buckets", _ANN_BUCKETS_SQL)
def ann_hyperplane_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH random-hyperplane bucket assignment (the ANN scale path's
    partitioning key). Null vectors are excluded from the index — the
    similarity-search contract (DuckDB's list_inner_product also
    refuses them outright)."""
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    return emb.select(
        "vec_id", SIM.hyperplane_signature(F.col("embedding"), 6).alias("bucket")
    )


_ANN_TOPK_SQL = f"""
WITH b AS (SELECT vec_id, {SIM.hyperplane_signature_sql('embedding', 6)} AS bucket, embedding
           FROM embeddings WHERE embedding IS NOT NULL),
q AS (SELECT vec_id AS q_id, bucket, embedding AS qe FROM b WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.q_id, e.vec_id, round({V.cosine_sql('e.embedding', 'q.qe')}, 6) AS cos
  FROM b e JOIN q ON e.bucket = q.bucket)
SELECT q_id, vec_id, cos, rank FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 5
"""


@register("ann_lsh_topk", _ANN_TOPK_SQL)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN top-k: equi-join on hyperplane bucket then exact cosine
    — the O(n²)→equi-join rewrite that scales. Null vectors excluded
    per the similarity-search contract."""
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return SIM.lsh_ann_topk(emb, queries, k=5, num_planes=6)


# SQ8 scalar quantization: shared formula text so Spark and DuckDB run
# BIT-IDENTICAL double arithmetic (same ops, same order). {v}/{mn}/{mx}
# are the raw element and the per-dimension min/max; codes clamp to 255
# and reconstruct at bin centers.
_SQ8_DEQUANT_FMT = (
    "CASE WHEN {mx} = {mn} THEN {mn} "
    "ELSE {mn} + (least(floor(({v} - {mn}) * 256 / ({mx} - {mn})), 255) + 0.5) "
    "* ({mx} - {mn}) / 256 END"
)

_SQ8_CTE = f"""
WITH dims AS (
  SELECT i AS pos, min(embedding[i+1]::DOUBLE) AS mn, max(embedding[i+1]::DOUBLE) AS mx
  FROM embeddings, UNNEST(range(len(embedding))) t(i)
  GROUP BY i),
stats AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM dims),
dq AS (
  SELECT e.vec_id,
         list_transform(range(len(e.embedding)), i ->
           {_SQ8_DEQUANT_FMT.format(v='e.embedding[i+1]::DOUBLE', mn='mns[i+1]', mx='mxs[i+1]')}
         ) AS sq
  FROM embeddings e, stats),
q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.q_id, d.vec_id, round({V.cosine_sql('d.sq', 'q.qe')}, 6) AS cos_q
  FROM dq d, q)"""

_ANN_SQ8_SQL = (
    _SQ8_CTE
    + """
SELECT q_id, vec_id, cos_q, rank FROM (
  SELECT q_id, vec_id, cos_q,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_q DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 5
"""
)


@register("ann_sq8_topk", _ANN_SQ8_SQL)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-aware ANN: 8-bit SCALAR-QUANTIZED vector search.
    Per-dimension min/max train a uniform 256-level codebook; the corpus
    scan scores raw queries against the DEQUANTIZED codes (asymmetric
    distance, the standard SQ8 search) and takes top-5 per query. At
    fleet scale the uint8 codes cut vector-scan bytes 4× vs float32 —
    the memory/IO lever that makes brute-force rerank affordable inside
    IVF/LSH cells — while this plan keeps the whole thing oracle-exact:
    codebook training is integer-free double math with a shared formula
    string, so Spark and DuckDB produce bit-identical codes.

    Scale shape: codebook = one posexplode groupBy(pos) over dims (64
    rows) collected into ONE broadcast row; scoring = broadcast
    queries × corpus scan (no shuffle of the corpus); top-k = one
    window partitioned by query id."""
    emb = table(spark, sf_dir, "embeddings")
    dims = emb.select(F.posexplode("embedding").alias("pos", "v")).select(
        "pos", F.col("v").cast("double").alias("v")
    )
    stats = (
        dims.groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .agg(
            F.expr("transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn)").alias("mns"),
            F.expr("transform(array_sort(collect_list(struct(pos, mx))), s -> s.mx)").alias("mxs"),
        )
    )
    dq = (
        emb.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            F.expr(
                "transform(sequence(0, size(embedding) - 1), i -> "
                + _SQ8_DEQUANT_FMT.format(
                    v="CAST(embedding[i] AS DOUBLE)", mn="mns[i]", mx="mxs[i]"
                )
                + ")"
            ).alias("sq"),
        )
    )
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    scored = dq.crossJoin(F.broadcast(queries)).select(
        "q_id",
        "vec_id",
        F.round(V.cosine(F.col("sq"), F.col("qe")), 6).alias("cos_q"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_q").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "vec_id", "cos_q", "rank")
    )


# ---- PQ (product quantization): M=8 subspaces × K=16 codewords ------
# Codebook = the subvectors of the first 16 vectors (deterministic
# data-sampled codebook — k-means would refine it but breaks
# cross-engine exactness; the SEARCH mechanics are identical either
# way). Indexing: Spark uses element_at (1-based; its [] is 0-based),
# DuckDB uses list_extract (1-based; its element_at is MAP-only).

@register(
    "multimodal_audio_features",
    """
    WITH fr AS (
      SELECT doc_id,
             CASE WHEN length(text) = 0 THEN ['']
                  ELSE [substring(text, s, 1000)
                        FOR s IN range(1, length(text) + 1, 1000)]
             END AS chunks
      FROM documents),
    rms AS (
      SELECT doc_id,
             [('0x' || substring(md5(c), 1, 8))::BIGINT % 1000000
              FOR c IN chunks] AS vals
      FROM fr)
    SELECT doc_id,
           CAST(len(vals) AS INT) AS n_frames,
           list_extract(vals, 1) AS first_rms,
           CAST(list_sum(vals) AS BIGINT) AS total_rms
    FROM rms
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction (sources/binary.py audio_features) — the
    third modality kernel beside image resize and video frame-sampling:
    the payload is windowed into fixed 1000-char frames, each frame
    reduced to a scalar energy, aggregated per document inside one Arrow
    mapInPandas pass. The per-frame DSP body is the documented digest
    stub (librosa/soundfile absent from the container); the windowing,
    batch iteration and typed aggregation — the Spark-side contract — is
    real and value-checked against the digest-twin oracle."""
    from ..sources.binary import audio_features

    return audio_features(table(spark, sf_dir, "documents"))


_PQ_M, _PQ_K, _PQ_D = 8, 16, 8


def _pq_l2_spark(a: str, b: str) -> str:
    """Spark-SQL squared-L2 text, same sequential fold as V.euclidean2."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + x)"
    )


def _pq_sub(arr: str, m: str) -> str:  # m is 0-based in both engines
    return f"slice({arr}, {m} * {_PQ_D} + 1, {_PQ_D})"


_PQ_CODES_SPARK = (
    f"transform(sequence(0, {_PQ_M - 1}), m -> array_position("
    + f"transform(element_at(cbs, m + 1), c -> {_pq_l2_spark(_pq_sub('emb', 'm'), 'c')}), "
    + "array_min(transform(element_at(cbs, m + 1), c -> "
    + _pq_l2_spark(_pq_sub("emb", "m"), "c")
    + "))))"
)

_PQ_ADC_SPARK = (
    f"aggregate(sequence(0, {_PQ_M - 1}), CAST(0 AS BIGINT), (acc, m) -> "
    "acc + CAST(floor("
    + _pq_l2_spark(
        _pq_sub("qe", "m"),
        "element_at(element_at(cbs, m + 1), CAST(element_at(codes, m + 1) AS INT))",
    )
    + " * 1e9 + 0.5) AS BIGINT))"
)


def _pq_sub_duck(arr: str, m: str) -> str:
    return f"({arr})[({m}) * {_PQ_D} + 1 : ({m}) * {_PQ_D} + {_PQ_D}]"


_PQ_DUCK_CODES = (
    "[ list_position("
    + f"[ {V.euclidean2_sql(_pq_sub_duck('embedding', 'm'), 'list_extract(list_extract(cbs, m + 1), k + 1)')} FOR k IN range({_PQ_K}) ], "
    + f"list_min([ {V.euclidean2_sql(_pq_sub_duck('embedding', 'm'), 'list_extract(list_extract(cbs, m + 1), k + 1)')} FOR k IN range({_PQ_K}) ])"
    + f") FOR m IN range({_PQ_M}) ]"
)

_PQ_DUCK_ADC = (
    "list_sum([ CAST(floor("
    + V.euclidean2_sql(
        _pq_sub_duck("qe", "m"),
        "list_extract(list_extract(cbs, m + 1), CAST(list_extract(codes, m + 1) AS INT))",
    )
    + " * 1e9 + 0.5) AS BIGINT) FOR m IN range("
    + str(_PQ_M)
    + ") ])"
)

_PQ_TOPK_SQL = f"""
WITH cb AS (
  SELECT [ [ {_pq_sub_duck('e', 'm')} FOR e IN cvs ] FOR m IN range({_PQ_M}) ] AS cbs
  FROM (SELECT list(CAST(embedding AS DOUBLE[]) ORDER BY vec_id) AS cvs
        FROM embeddings WHERE vec_id < {_PQ_K} AND embedding IS NOT NULL)),
enc AS (
  SELECT vec_id, {_PQ_DUCK_CODES} AS codes
  FROM embeddings, cb
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id IN (0, 1, 2) AND embedding IS NOT NULL),
scored AS (
  SELECT q.q_id, enc.vec_id,
         CAST({_PQ_DUCK_ADC} AS BIGINT) AS adc_nano
  FROM enc, q, cb)
SELECT q_id, vec_id, adc_nano, rank FROM (
  SELECT q_id, vec_id, adc_nano,
         row_number() OVER (PARTITION BY q_id
           ORDER BY adc_nano, vec_id) AS rank
  FROM scored) WHERE rank <= 5
"""


@register("ann_pq_topk", _PQ_TOPK_SQL)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT-quantized ANN (the vector completion of ann_sq8_topk's
    scalar axis): 64 dims split into M=8 subspaces, each encoded as the
    nearest of K=16 codewords, so a vector stores as 8 small codes —
    32× smaller than float32 — and search runs by Asymmetric Distance
    Computation: per query, L2 to each codeword once, then every
    database vector scores as a sum of 8 table lookups. ADC partials
    are floored to nano-units and summed as BIGINT (order-independent,
    hash-exact cross-engine).

    Scale shape: the codebook collapses to ONE broadcast row (nested
    array, 8×16×8 doubles); encoding and scoring are corpus scans with
    broadcast joins only — no shuffle of the vector table; top-k is one
    window. The codebook here is deterministically data-sampled (first
    K vectors) to stay oracle-exact; swapping in k-means centroids
    changes only the cb row, not the plan. Search corpus = non-null id
    AND non-null vector (the r15 ANN convention, extended to PQ in
    r16 — IsNotNull pushed into the scan on both engines)."""
    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isNotNull() & F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    cb = (
        emb.filter(F.col("vec_id") < _PQ_K)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(vec_id, "
                "CAST(embedding AS ARRAY<DOUBLE>) AS e))), s -> s.e)"
            ).alias("cvs")
        )
        .select(
            F.expr(
                f"transform(sequence(0, {_PQ_M - 1}), m -> "
                f"transform(cvs, e -> {_pq_sub('e', 'm')}))"
            ).alias("cbs")
        )
    )
    enc = (
        emb.crossJoin(F.broadcast(cb))
        .select(
            "vec_id",
            F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("emb"),
            F.col("cbs"),
        )
        .select("vec_id", F.expr(_PQ_CODES_SPARK).alias("codes"), "cbs")
    )
    queries_df = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("q_id"),
        F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("qe"),
    )
    scored = enc.crossJoin(F.broadcast(queries_df)).select(
        "q_id", "vec_id", F.expr(_PQ_ADC_SPARK).alias("adc_nano")
    )
    w = Window.partitionBy("q_id").orderBy("adc_nano", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "vec_id", "adc_nano", "rank")
    )


_PQ_RECALL_SQL = (
    _PQ_TOPK_SQL.replace(
        """SELECT q_id, vec_id, adc_nano, rank FROM (
  SELECT q_id, vec_id, adc_nano,
         row_number() OVER (PARTITION BY q_id
           ORDER BY adc_nano, vec_id) AS rank
  FROM scored) WHERE rank <= 5""",
        f""", pq AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id
             ORDER BY adc_nano, vec_id) AS rank
    FROM scored) WHERE rank <= 5),
exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY round({V.cosine_sql('CAST(e.embedding AS DOUBLE[])', 'q.qe')}, 6) DESC,
                      e.vec_id) AS rank
    FROM embeddings e, q
    WHERE e.vec_id IS NOT NULL AND e.embedding IS NOT NULL) WHERE rank <= 5)
SELECT exact.q_id,
       count(pq.vec_id) AS n_hit,
       floor(count(pq.vec_id) / 5.0 * 1e6 + 0.5) / 1e6 AS recall_at_5
FROM exact LEFT JOIN pq USING (q_id, vec_id)
GROUP BY exact.q_id""",
    ).replace("WITH cb AS (", "WITH cb AS (", 1)
)


@register("ann_pq_recall", _PQ_RECALL_SQL)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the product-quantized ADC ranking against exact
    cosine ground truth — the index-quality measurement that decides
    whether 8-code vectors are safe to serve (completing the eval trio:
    ann_recall_eval for LSH, ann_sq8_recall for scalar quantization,
    this for PQ). Note ADC ranks by L2 while ground truth ranks by
    cosine — recall here also absorbs that metric gap, as it does in a
    real deployment. Search-corpus null contract as ann_pq_topk."""
    pq = ann_pq_topk(spark, sf_dir).select("q_id", "vec_id")
    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isNotNull() & F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    queries_df = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = SIM.brute_force_topk(emb, queries_df, k=5).select("q_id", "vec_id")
    n_hit = (
        exact.join(pq, ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        exact.select("q_id")
        .distinct()
        .join(n_hit, "q_id", "left")
        .select("q_id", F.coalesce("n_hit", F.lit(0)).alias("n_hit"))
        .select(
            "q_id",
            "n_hit",
            (F.floor(F.col("n_hit") / 5.0 * 1e6 + F.lit(0.5)) / 1e6).alias(
                "recall_at_5"
            ),
        )
    )


_SQ8_RECALL_SQL = (
    _SQ8_CTE
    + f""",
sq8 AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id ORDER BY cos_q DESC, vec_id) AS rank
    FROM scored) WHERE rank <= 5),
exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY round({V.cosine_sql('e.embedding', 'q.qe')}, 6) DESC,
                      e.vec_id) AS rank
    FROM embeddings e, q) WHERE rank <= 5)
SELECT exact.q_id,
       count(sq8.vec_id) AS n_hit,
       floor(count(sq8.vec_id) / 5.0 * 1e6 + 0.5) / 1e6 AS recall_at_5
FROM exact LEFT JOIN sq8 USING (q_id, vec_id)
GROUP BY exact.q_id
"""
)


@register("ann_sq8_recall", _SQ8_RECALL_SQL)
def ann_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-quality evaluation: recall@5 of the SQ8 quantized
    search against exact brute-force ground truth, per query — the
    measurement that decides whether 8-bit codes are safe to serve (or
    whether to rerank with raw vectors). Same eval loop as
    ann_recall_eval, applied to the compression axis instead of the
    bucketing axis: 'measure, don't guess' for index quality."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    sq8 = ann_sq8_topk(spark, sf_dir).select("q_id", "vec_id")
    exact = SIM.brute_force_topk(emb, queries, k=5).select("q_id", "vec_id")
    hit = exact.join(sq8, ["q_id", "vec_id"], "left_semi")
    n_hit = hit.groupBy("q_id").agg(F.count("*").alias("n_hit"))
    return (
        exact.select("q_id")
        .distinct()
        .join(n_hit, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (F.floor(F.coalesce("n_hit", F.lit(0)) / 5.0 * 1e6 + F.lit(0.5)) / 1e6).alias(
                "recall_at_5"
            ),
        )
    )


# ======================================================================
# DEDUP — exact + near (SURVEY A3/A5, north star)
# ======================================================================


@register(
    "dedup_exact",
    """
    SELECT min(doc_id) AS doc_id, sha256(text) AS digest, count(*) AS n_copies
    FROM documents GROUP BY sha256(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest, deterministic representative."""
    return D.exact_dedup(table(spark, sf_dir, "documents"))


def _minhash_cte(num_hashes: int = 16, bands: int = 4, k: int = 3) -> str:
    """Shared CTE prefix mirroring the explode+groupBy MinHash plan —
    tokenize/shingle once, ONE md5 per shingle, per-seed affine-derived
    mins (same coefficients as operators.dedup)."""
    rpb = num_hashes // bands
    coeffs = D._minhash_coeffs(num_hashes)
    mins = ", ".join(
        f"min(({a} * lo + {b} * hi + {c}) % {D._MINHASH_MOD}) AS h{s}"
        for s, (a, b, c) in enumerate(coeffs)
    )
    arr = "[" + ", ".join(f"h{s}" for s in range(num_hashes)) + "]"
    band_list = "[" + ", ".join(
        f"md5('{b}|' || array_to_string("
        f"list_transform(sig[{b * rpb + 1}:{(b + 1) * rpb}], v -> v::VARCHAR), ','))"
        for b in range(bands)
    ) + "]"
    return f"""
WITH base AS (
  SELECT doc_id, {H.shingles_sql('text', k)} AS shingles FROM documents),
ex AS (SELECT doc_id, unnest(shingles) AS sh FROM base),
hsh AS (
  SELECT doc_id,
         ('0x' || substring(md5('0:' || sh), 1, {H.HASH_HEX_CHARS}))::BIGINT % 1073741824 AS lo,
         ('0x' || substring(md5('0:' || sh), 1, {H.HASH_HEX_CHARS}))::BIGINT >> 30 AS hi
  FROM ex),
mh AS (SELECT doc_id, {mins} FROM hsh GROUP BY doc_id),
sigt AS (SELECT doc_id, {arr} AS sig FROM mh),
bandt AS (SELECT doc_id, {band_list} AS bands FROM sigt)
"""


_MINHASH_BANDS_SQL = _minhash_cte() + "SELECT doc_id, unnest(bands) AS band FROM bandt"


@register("dedup_minhash_bands", _MINHASH_BANDS_SQL)
def dedup_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature → LSH band keys, exploded (the near-dup join key)."""
    docs = D.with_minhash(
        table(spark, sf_dir, "documents"), "text", 3, 16, 4, keep_shingles=False
    )
    return docs.select("doc_id", F.explode("__bands").alias("band"))


def _near_pairs_cte(threshold: float = 0.1, new_from: int | None = None) -> str:
    """CTE prefix ending in ``pairs`` = verified MinHash-LSH near-dup
    pairs above ``threshold`` (shared by the pairs query and the
    connected-components oracle). ``new_from`` mirrors the incremental
    probe-side split of ``minhash_lsh_pairs``."""
    probe = f" AND b.doc_id >= {new_from}" if new_from is not None else ""
    return _minhash_cte() + f""",
expl AS (SELECT doc_id, unnest(bands) AS band FROM bandt),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM expl a JOIN expl b ON a.band = b.band AND a.doc_id < b.doc_id{probe}),
verified AS (
  SELECT c.a_id, c.b_id,
         round(len(list_filter(list_distinct(sa.shingles), s -> list_contains(sb.shingles, s)))::DOUBLE
               / greatest(len(list_distinct(sa.shingles)) + len(list_distinct(sb.shingles))
                          - len(list_filter(list_distinct(sa.shingles), s -> list_contains(sb.shingles, s))), 1)::DOUBLE, 6) AS jaccard
  FROM cand c
  JOIN base sa ON sa.doc_id = c.a_id
  JOIN base sb ON sb.doc_id = c.b_id),
pairs AS (SELECT a_id, b_id, jaccard FROM verified WHERE jaccard >= {threshold})"""


_NEAR_PAIRS_SQL = _near_pairs_cte() + "\nSELECT a_id, b_id, jaccard FROM pairs"


@register("dedup_near_pairs", _NEAR_PAIRS_SQL)
def dedup_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs + exact-Jaccard verification."""
    return D.minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        k=3,
        num_hashes=16,
        bands=4,
        jaccard_threshold=0.1,
    )


# connected components over the near-dup graph: min reachable id per doc,
# expressed for the oracle as a recursive closure (UNION dedups, so the
# recursion terminates); docs not in any pair stay their own component
_COMPONENTS_SQL = (
    _near_pairs_cte()
    + """,
edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
reach AS (
  SELECT doc_id AS id, doc_id AS r FROM documents WHERE doc_id IS NOT NULL
  UNION
  SELECT e.dst AS id, r.r FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
"""
).replace("WITH base AS", "WITH RECURSIVE base AS", 1)


@register("dedup_components", _COMPONENTS_SQL)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components over the verified
    MinHash-LSH pair graph by iterative min-label propagation (each round
    a distributed join+groupBy; converges in graph-diameter rounds). The
    oracle computes the same min-reachable-id via a recursive CTE."""
    return D.dedup_components(
        table(spark, sf_dir, "documents"),
        k=3,
        num_hashes=16,
        bands=4,
        jaccard_threshold=0.1,
    )


def _simhash_sql(num_bits: int = 32) -> str:
    sums = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(num_bits)
    )
    terms = " + ".join(f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(num_bits))
    return f"""
WITH ex AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS t
  FROM documents),
h AS (SELECT doc_id, ('0x' || substring(md5('0:' || t), 1, {H.HASH_HEX_CHARS}))::BIGINT AS h FROM ex),
v AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id),
f AS (SELECT doc_id, ({terms})::BIGINT AS fp FROM v)
SELECT d.doc_id, coalesce(f.fp, 0)::BIGINT AS fp
FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id
"""


@register("simhash_fingerprints", _simhash_sql(32))
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash 32-bit fingerprints (near-dup family #3) — explode+groupBy
    bit-vote plan (see operators.dedup.simhash_table)."""
    return D.simhash_table(table(spark, sf_dir, "documents"), num_bits=32)


# ======================================================================
# TEXT — analysis functions (SURVEY F16, north star)
# ======================================================================

_TEXT_STATS_SQL = f"""
SELECT doc_id,
       len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS n_tokens,
       {TX.quality_score_sql('text')} AS quality,
       {TX.lang_guess_sql('text')} AS lang_guess,
       {TX.fingerprint_sql('text', 3)} AS fp
FROM documents
"""


@register("text_stats", _TEXT_STATS_SQL)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring + language-ID + fingerprint.
    The four kernels are embarrassingly parallel; ``spread`` rebalances a
    single-split scan so they don't serialize into one task."""
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.quality_score(F.col("text")).alias("quality"),
        TX.lang_guess(F.col("text")).alias("lang_guess"),
        TX.fingerprint(F.col("text"), 3).alias("fp"),
    )


@register(
    "text_lang_agg",
    """
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CAST(n_chars AS DECIMAL(18,4))) AS DOUBLE) AS total_chars,
           round(avg(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''))), 2) AS avg_tokens
    FROM documents GROUP BY lang
    """,
)
def text_lang_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            _dsum(F.col("n_chars")).alias("total_chars"),
            F.round(F.avg(TX.token_count(F.col("text"))), 2).alias("avg_tokens"),
        )
    )


@register(
    "text_bpe_tokens",
    """
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS n_bpe
    FROM documents
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pretokenizer token counts."""
    return table(spark, sf_dir, "documents").select(
        "doc_id", F.size(TX.word_tokens_bpe_ish(F.col("text"))).alias("n_bpe")
    )


# ======================================================================
# GEO — J2/J3 spatial joins + F8 affine (SURVEY M3) on the shared fixture
# ======================================================================

_GEO_CONTAINS_SQL = f"""
WITH pts AS (SELECT * FROM {GF.points_values_sql()}),
e AS (SELECT * FROM {GF.edges_values_sql()}),
cr AS (
  SELECT p.img_id, e.id_predio, e.nombre,
         {GF.crossings_sql()} AS crossings
  FROM pts p CROSS JOIN e
  WHERE p.lon IS NOT NULL AND p.lat IS NOT NULL
  GROUP BY p.img_id, e.id_predio, e.nombre)
SELECT img_id, id_predio, nombre FROM cr WHERE crossings % 2 = 1
"""


# road fixture: 4 probe segments (id, ax, ay, bx, by) — R1 crosses the
# triangle + pentagon, R2 the square, R3 the annulus shell AND its hole,
# R4 nothing (the zero row the left join must keep)
_ROADS = (
    (1, -1.0, 0.9, 14.0, 0.9),
    (2, 4.0, 4.2, 7.0, 7.2),
    (3, 12.2, 5.5, 12.8, 8.0),
    (4, -1.5, -1.5, -0.5, -0.5),
)


def _ccw_sql(ax, ay, bx, by, cx, cy):
    return f"(({bx} - {ax}) * ({cy} - {ay}) - ({by} - {ay}) * ({cx} - {ax}))"


_GEO_CROSSINGS_SQL = f"""
WITH e AS (SELECT * FROM {{edges}}),
r AS (SELECT * FROM (VALUES {', '.join(f'({i}, {ax}::DOUBLE, {ay}::DOUBLE, {bx}::DOUBLE, {by}::DOUBLE)' for i, ax, ay, bx, by in _ROADS)})
      AS r(road_id, ax, ay, bx, by)),
hits AS (
  SELECT r.road_id, e.id_predio
  FROM r JOIN e
    ON {_ccw_sql('r.ax','r.ay','r.bx','r.by','e.x1','e.y1')}
       * {_ccw_sql('r.ax','r.ay','r.bx','r.by','e.x2','e.y2')} < 0
   AND {_ccw_sql('e.x1','e.y1','e.x2','e.y2','r.ax','r.ay')}
       * {_ccw_sql('e.x1','e.y1','e.x2','e.y2','r.bx','r.by')} < 0)
SELECT r.road_id, count(h.id_predio) AS n_crossings,
       count(DISTINCT h.id_predio) AS n_parcels
FROM r LEFT JOIN hits h USING (road_id)
GROUP BY r.road_id
"""


@register(
    "geo_edge_crossings",
    _GEO_CROSSINGS_SQL.format(edges=GF.edges_values_sql()),
)
def geo_edge_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-segment intersection (route × parcel-boundary overlay):
    for each probe road, how many boundary edges it properly crosses
    and how many distinct parcels those belong to — the computational-
    geometry kernel under route planning and parcel-impact analysis.
    Proper crossing is the standard double-orientation test (both
    endpoint pairs strictly straddle the other segment:
    ccw(A,B,C)·ccw(A,B,D) < 0 twice) — pure sign arithmetic on cross
    products, identical operand order both engines, no trigonometry and
    no epsilon. Holes count: R3 crosses the annulus shell twice AND its
    interior ring twice. The left join keeps the zero-crossing road.
    Scale: roads broadcast against the edge table (edges are the big
    side at fleet scale); a bbox/grid prefilter (geo_contains_grid's
    cell trick) would bound candidates before the exact test."""
    polys = GF.spark_polys(spark)
    rings = polys.select("id_predio", F.explode("rings").alias("ring"))
    edges = rings.select(
        "id_predio",
        F.explode(
            F.expr(
                "transform(ring, (p, i) -> struct("
                "p.x AS x1, p.y AS y1, "
                "element_at(ring, (i + 1) % size(ring) + 1).x AS x2, "
                "element_at(ring, (i + 1) % size(ring) + 1).y AS y2))"
            )
        ).alias("e"),
    ).select("id_predio", "e.*")
    roads = spark.createDataFrame(
        list(_ROADS), "road_id long, ax double, ay double, bx double, by double"
    )

    def ccw(ax, ay, bx, by, cx, cy):
        return (F.col(bx) - F.col(ax)) * (F.col(cy) - F.col(ay)) - (
            F.col(by) - F.col(ay)
        ) * (F.col(cx) - F.col(ax))

    cond = (
        ccw("ax", "ay", "bx", "by", "x1", "y1")
        * ccw("ax", "ay", "bx", "by", "x2", "y2")
        < 0
    ) & (
        ccw("x1", "y1", "x2", "y2", "ax", "ay")
        * ccw("x1", "y1", "x2", "y2", "bx", "by")
        < 0
    )
    hits = F.broadcast(roads).join(edges, cond).select("road_id", "id_predio")
    return (
        roads.join(hits, "road_id", "left")
        .groupBy("road_id")
        .agg(
            F.count("id_predio").alias("n_crossings"),
            F.countDistinct("id_predio").alias("n_parcels"),
        )
    )


_GEO_AREAL_SQL = f"""
WITH v AS (SELECT * FROM {GF.vertices_values_sql()}),
b AS (SELECT id_predio, min(x) AS x1, min(y) AS y1, max(x) AS x2, max(y) AS y2
      FROM v GROUP BY id_predio),
gx AS (SELECT unnest(range(0, 14)) AS cx),
gy AS (SELECT unnest(range(-1, 10)) AS cy),
o AS (
  SELECT cx, cy, id_predio,
         greatest(0.0, least(x2, cx + 1) - greatest(x1, cx))
           * greatest(0.0, least(y2, cy + 1) - greatest(y1, cy))
           / ((x2 - x1) * (y2 - y1)) AS frac
  FROM b, gx, gy)
SELECT cx, cy, count(*) AS n_parcels,
       CAST(sum(CAST(floor(frac * 1e9 + 0.5) AS BIGINT)) AS BIGINT)
         AS density_nano
FROM o WHERE frac > 0 GROUP BY cx, cy
"""


@register("geo_areal_weighted", _GEO_AREAL_SQL)
def geo_areal_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Areal interpolation (bbox tier): distribute each parcel onto a
    regular analysis grid weighted by the FRACTION of the parcel's
    bounding box falling in each cell — the downscaling step that turns
    irregular cadastral units into raster-aligned statistics (population
    /land-use gridding). Interval-overlap arithmetic is closed-form
    (`greatest/least` clamps per axis), identical operand order both
    engines; per-pair weights are fixed-pointed to nano units BEFORE the
    aggregate so the cell sum is integer-exact regardless of addend
    order. Scale shape: bboxes are O(#parcels) — broadcast against the
    (tiny, generated) grid; at fleet scale the join becomes an equi-join
    on overlapping cell-id ranges (each bbox expands to its covered cell
    ids — bounded by bbox size), never a cartesian against the full
    grid."""
    verts = (
        GF.spark_polys(spark)
        .select("id_predio", F.explode("rings").alias("ring"))
        .select("id_predio", F.explode("ring").alias("pt"))
        .select("id_predio", F.col("pt.x").alias("x"), F.col("pt.y").alias("y"))
    )
    bbox = verts.groupBy("id_predio").agg(
        F.min("x").alias("x1"),
        F.min("y").alias("y1"),
        F.max("x").alias("x2"),
        F.max("y").alias("y2"),
    )
    gx = spark.range(0, 14).select(F.col("id").alias("cx"))
    gy = spark.range(-1, 10).select(F.col("id").alias("cy"))
    cells = gx.crossJoin(gy)
    wx = F.greatest(
        F.lit(0.0), F.least(F.col("x2"), F.col("cx") + 1) - F.greatest(F.col("x1"), F.col("cx"))
    )
    wy = F.greatest(
        F.lit(0.0), F.least(F.col("y2"), F.col("cy") + 1) - F.greatest(F.col("y1"), F.col("cy"))
    )
    frac = wx * wy / ((F.col("x2") - F.col("x1")) * (F.col("y2") - F.col("y1")))
    o = bbox.crossJoin(F.broadcast(cells)).select(
        "cx", "cy", frac.alias("frac")
    )
    return (
        o.filter(F.col("frac") > 0)
        .groupBy("cx", "cy")
        .agg(
            F.count("*").alias("n_parcels"),
            F.sum(F.floor(F.col("frac") * 1e9 + F.lit(0.5)).cast("long")).alias(
                "density_nano"
            ),
        )
    )


@register("geo_contains", _GEO_CONTAINS_SQL)
def geo_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: point-in-polygon broadcast join, even-odd ray-cast over all
    rings — holes and MultiPolygon parts honored (script_geo.py:84; the
    oracle mirrors the exact float expression, geo_fixture.crossings_sql)."""
    pts = GF.spark_points(spark).filter(
        F.col("lon").isNotNull() & F.col("lat").isNotNull()
    )
    polys = GF.spark_polys(spark)
    return contains_join(pts, polys, how="inner").select("img_id", "id_predio", "nombre")


@register("geo_contains_grid", _GEO_CONTAINS_SQL)
def geo_contains_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 scale path (§4.3): grid-cell equi-join prefilter + exact ray-cast
    — must produce exactly the broadcast join's result."""
    pts = GF.spark_points(spark).filter(
        F.col("lon").isNotNull() & F.col("lat").isNotNull()
    )
    polys = GF.spark_polys(spark)
    return contains_join_grid(pts, polys, eps=0.5).select("img_id", "id_predio", "nombre")


_GEO_KNN_SQL = f"""
WITH pts AS (SELECT * FROM {GF.points_values_sql()}),
v AS (SELECT * FROM {GF.vertices_values_sql()}),
d AS (
  SELECT p.img_id, v.id_predio, v.nombre, v.x AS vx, v.y AS vy,
         (p.lon - v.x) * (p.lon - v.x) + (p.lat - v.y) * (p.lat - v.y) AS dist2
  FROM pts p CROSS JOIN v
  WHERE p.lon IS NOT NULL AND p.lat IS NOT NULL)
SELECT img_id, id_predio, nombre, vx, vy FROM (
  SELECT *, row_number() OVER (PARTITION BY img_id
                               ORDER BY dist2, id_predio, nombre, vx, vy) AS rn
  FROM d) WHERE rn = 1
"""


@register("geo_knn", _GEO_KNN_SQL)
def geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3-J5: nearest-vertex KNN with deterministic argmin (the reference's
    3-tier nearest search collapsed into one plan, script_geo.py:92-140)."""
    pts = GF.spark_points(spark).filter(
        F.col("lon").isNotNull() & F.col("lat").isNotNull()
    )
    polys = GF.spark_polys(spark)
    return nearest_vertex_join(pts, polys)


_KNN_CELL = 4.0

_GEO_KNN_GRID_SQL = f"""
WITH pts AS (SELECT * FROM {GF.points_values_sql()}),
v AS (SELECT *, floor(x / {_KNN_CELL})::BIGINT AS cx,
               floor(y / {_KNN_CELL})::BIGINT AS cy
      FROM {GF.vertices_values_sql()}),
probe AS (
  SELECT p.img_id, p.lon, p.lat,
         floor(p.lon / {_KNN_CELL})::BIGINT + dx.d AS cx,
         floor(p.lat / {_KNN_CELL})::BIGINT + dy.d AS cy
  FROM pts p,
       (SELECT unnest([-1, 0, 1]) AS d) dx,
       (SELECT unnest([-1, 0, 1]) AS d) dy
  WHERE p.lon IS NOT NULL AND p.lat IS NOT NULL),
cand AS (
  SELECT pr.img_id, v.id_predio, v.nombre, v.x AS vx, v.y AS vy,
         (pr.lon - v.x) * (pr.lon - v.x) + (pr.lat - v.y) * (pr.lat - v.y)
           AS dist2
  FROM probe pr JOIN v ON pr.cx = v.cx AND pr.cy = v.cy),
grid_nn AS (
  SELECT img_id, id_predio, nombre, vx, vy FROM (
    SELECT *, row_number() OVER (PARTITION BY img_id
                                 ORDER BY dist2, id_predio, nombre, vx, vy) AS rn
    FROM cand) WHERE rn = 1),
brute AS ({_GEO_KNN_SQL})
SELECT g.img_id, g.id_predio, g.nombre, g.vx, g.vy,
       (g.id_predio = b.id_predio AND g.vx = b.vx AND g.vy = b.vy)
         AS matches_brute
FROM grid_nn g JOIN brute b USING (img_id)
"""


@register("geo_knn_grid", _GEO_KNN_GRID_SQL)
def geo_knn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3-J5 SCALE path: grid-bucketed nearest-vertex search — each
    located point probes its 3×3 neighborhood of 4-unit cells
    and the argmin runs over those candidates only, turning the
    all-pairs cross join (`geo_knn`) into a shuffle-partitionable
    equi-join on the cell key, the same §4.3 rewrite
    `geo_contains_grid` applies to containment. Probe expansion is a
    fixed 9 rows per point (data-independent). The output carries its
    own exactness proof: `matches_brute` compares the grid answer to
    the full brute-force argmin in-engine (true whenever the true NN
    lies within one cell ring — guaranteed here by the fixture's
    geometry; at fleet scale the standard escalation re-probes wider
    rings for the rare unmatched point)."""
    pts = GF.spark_points(spark).filter(
        F.col("lon").isNotNull() & F.col("lat").isNotNull()
    )
    polys = GF.spark_polys(spark)
    verts = (
        polys.select("id_predio", "nombre", F.explode("rings").alias("ring"))
        .select("id_predio", "nombre", F.explode("ring").alias("pt"))
        .select(
            "id_predio",
            "nombre",
            F.col("pt.x").alias("x"),
            F.col("pt.y").alias("y"),
        )
        .withColumn("cx", F.floor(F.col("x") / _KNN_CELL))
        .withColumn("cy", F.floor(F.col("y") / _KNN_CELL))
    )
    d = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    probe = (
        pts.select("img_id", "lon", "lat", d.alias("dx"))
        .select("img_id", "lon", "lat", "dx", d.alias("dy"))
        .select(
            "img_id",
            "lon",
            "lat",
            (F.floor(F.col("lon") / _KNN_CELL) + F.col("dx")).alias("cx"),
            (F.floor(F.col("lat") / _KNN_CELL) + F.col("dy")).alias("cy"),
        )
    )
    dist2 = (F.col("lon") - F.col("x")) * (F.col("lon") - F.col("x")) + (
        F.col("lat") - F.col("y")
    ) * (F.col("lat") - F.col("y"))
    cand = probe.join(F.broadcast(verts), ["cx", "cy"]).select(
        "img_id", "id_predio", "nombre",
        F.col("x").alias("vx"), F.col("y").alias("vy"),
        dist2.alias("dist2"),
    )
    w = Window.partitionBy("img_id").orderBy(
        "dist2", "id_predio", "nombre", "vx", "vy"
    )
    grid_nn = (
        cand.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn", "dist2")
    )
    brute = nearest_vertex_join(pts, polys).select(
        "img_id",
        F.col("id_predio").alias("b_predio"),
        F.col("vx").alias("b_vx"),
        F.col("vy").alias("b_vy"),
    )
    # brute is one row per image — corpus-sized, so the self-proving
    # equi-join carries no broadcast hint (AQE decides)
    return grid_nn.join(brute, "img_id").select(
        "img_id",
        "id_predio",
        "nombre",
        "vx",
        "vy",
        (
            (F.col("id_predio") == F.col("b_predio"))
            & (F.col("vx") == F.col("b_vx"))
            & (F.col("vy") == F.col("b_vy"))
        ).alias("matches_brute"),
    )


_GEO_CLASSIFY_SQL = f"""
WITH pts AS (SELECT * FROM {GF.points_values_sql()}),
e AS (SELECT * FROM {GF.edges_values_sql()}),
v AS (SELECT * FROM {GF.vertices_values_sql()}),
cr AS (
  SELECT p.img_id, e.id_predio, e.nombre,
         {GF.crossings_sql()} AS crossings
  FROM pts p CROSS JOIN e
  WHERE p.lon IS NOT NULL AND p.lat IS NOT NULL
  GROUP BY p.img_id, e.id_predio, e.nombre),
inside AS (
  SELECT img_id, id_predio, nombre FROM (
    SELECT img_id, id_predio, nombre,
           row_number() OVER (PARTITION BY img_id ORDER BY id_predio, nombre) AS rn
    FROM cr WHERE crossings % 2 = 1) WHERE rn = 1),
near AS (
  SELECT img_id, id_predio, nombre FROM (
    SELECT d.img_id, d.id_predio, d.nombre,
           row_number() OVER (PARTITION BY d.img_id
                              ORDER BY d.dist2, d.id_predio, d.nombre, d.vx, d.vy) AS rn
    FROM (
      SELECT p.img_id, v.id_predio, v.nombre, v.x AS vx, v.y AS vy,
             (p.lon - v.x) * (p.lon - v.x) + (p.lat - v.y) * (p.lat - v.y) AS dist2
      FROM pts p CROSS JOIN v
      WHERE p.lon IS NOT NULL AND p.lat IS NOT NULL
        AND p.img_id NOT IN (SELECT img_id FROM inside)) d) WHERE rn = 1)
SELECT img_id, id_predio, nombre, 'contains' AS method FROM inside
UNION ALL SELECT img_id, id_predio, nombre, 'nearest' AS method FROM near
UNION ALL SELECT img_id, NULL AS id_predio, NULL AS nombre,
                 'IMAGEN NO CLASIFICABLE' AS method
FROM pts WHERE lon IS NULL OR lat IS NULL
"""


@register("geo_classify", _GEO_CLASSIFY_SQL)
def geo_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3A classifier: containment first, NN fallback, unclassifiable →
    nulls (§2.11 intent semantics)."""
    return classify_points(GF.spark_points(spark), GF.spark_polys(spark))


_GEO_AFFINE_SQL = f"""
WITH rast AS (SELECT * FROM {GF.rasters_values_sql()}),
c AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS c(corner)),
px AS (
  SELECT img_id, corner,
         CASE WHEN corner IN (2, 3) THEN cols ELSE 0 END::DOUBLE AS px,
         CASE WHEN corner IN (1, 2) THEN rows ELSE 0 END::DOUBLE AS py,
         gt0, gt1, gt2, gt3, gt4, gt5
  FROM rast CROSS JOIN c)
SELECT img_id, corner,
       round(gt0 + px * gt1 + py * gt2, 6) AS x,
       round(gt3 + px * gt4 + py * gt5, 6) AS y
FROM px
"""


@register("geo_affine_extent", _GEO_AFFINE_SQL)
def geo_affine_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: geotransform → 4-corner extent, pure column arithmetic
    (GetExtent, script_geo.py:19-30)."""
    rast = GF.spark_rasters(spark)
    ext = rast.withColumn("ext", affine_extent(F.col("gt"), F.col("cols"), F.col("rows")))
    return ext.select(
        "img_id", F.posexplode("ext").alias("corner", "pt")
    ).select(
        "img_id",
        "corner",
        F.round(F.col("pt.x"), 6).alias("x"),
        F.round(F.col("pt.y"), 6).alias("y"),
    )


# ======================================================================
# SESSION / WINDOWED EVENTS (SURVEY §2.9 EXT)
# ======================================================================


@register(
    "session_stats",
    """
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS prev
      FROM events WHERE ts IS NOT NULL),
    m AS (SELECT *, CASE WHEN prev IS NULL OR (epoch(ts) - epoch(prev)) > 1800.0
                         THEN 1 ELSE 0 END AS new_sess FROM o),
    s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM m)
    SELECT user_id, session_seq, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM s GROUP BY user_id, session_seq
    """,
)
def session_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gaps-and-islands) + per-session aggregates.

    Oracle note: DuckDB's windowed ``sum(INTEGER)`` yields HUGEINT
    (int128), which an Arrow/pandas fetch widens to float64 — hashing
    ``3.0`` against Spark's ``3``. The oracle CASTs the running sum to
    BIGINT so both engines emit int64 (CORRECTNESS_r01 red cell).
    """
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    s = sessionize(ev, gap_minutes=30.0)
    return s.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"), _dsum(F.col("value")).alias("sum_value")
    )


_TUMBLING_SQL = """
SELECT (epoch(time_bucket(INTERVAL '10 minutes', ts)))::BIGINT AS window_start_epoch,
       event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
"""


@register("tumbling_window_agg", _TUMBLING_SQL)
def tumbling_window_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate (batch twin of the streaming query).

    Null-event-time contract (r16): rows with a NULL ts can't bucket —
    Spark's window generator silently drops them; the filter makes that
    explicit on both sides and pushes IsNotNull(ts) into the scan."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), _dsum(F.col("value")).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_SLIDING_SQL = """
SELECT (epoch(time_bucket(INTERVAL '5 minutes', ts)
        - (k * INTERVAL '5 minutes')))::BIGINT AS window_start_epoch,
       event_type, count(*) AS n
FROM events CROSS JOIN (VALUES (0), (1)) AS ks(k)
WHERE ts IS NOT NULL
GROUP BY 1, 2
"""


@register(
    "sliding_window_agg",
    _SLIDING_SQL,
)
def sliding_window_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min window, 5 min slide) — each event lands in 2
    overlapping windows. Null event time excluded (r16 contract)."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n",
        )
    )


@register("streaming_tumbling", _TUMBLING_SQL)
def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME tumbling aggregate executed as a Structured Streaming query
    (file source, availableNow trigger, complete-mode memory sink) — proves
    batch/stream semantic parity, checked against the same oracle."""
    import uuid

    # raw file schema has ts as INT64 nanos (see tables.table); stream-read
    # it as long, then convert exactly as the batch path does. The file
    # stream source wants a directory, so symlink the single file into one.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(src, os.path.join(stream_dir, "events.parquet"))
    stream = spark.readStream.format("parquet").schema(raw_schema).load(stream_dir)
    stream = _norm_event_ts(stream).filter(F.col("ts").isNotNull())
    agg = (
        stream.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), _dsum(F.col("value")).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# ======================================================================
# CATALOG — the reference's data model end-to-end (SURVEY M2)
# ======================================================================

_CATALOG_ROUNDTRIP_SQL = """
WITH rows0 AS (
  SELECT 'C' || (doc_id % 10)::VARCHAR AS codigo,
         lang AS seccion, source AS especie, 'A' AS apl,
         concat_ws('_', 'C' || (doc_id % 10)::VARCHAR, lang, 'X', 'A') AS indice,
         'lake/BR/C' || (doc_id % 10)::VARCHAR || '/' || doc_id::VARCHAR || '.jpg' AS ruta_resultado
  FROM documents),
ids AS (
  SELECT *, row_number() OVER (ORDER BY indice, ruta_resultado) AS id FROM rows0)
SELECT id, ruta_resultado FROM ids WHERE indice = 'C3_es_X_A'
"""


@register("catalog_roundtrip", _CATALOG_ROUNDTRIP_SQL)
def catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 end-to-end: documents → catalog insert (+run +lineage) → the
    reference's flagship filtered retrieval (mysql_process.py:67-74) on the
    real domain tables. Deterministic ids via row_number over the business
    key, so the whole pipeline is oracle-reproducible."""
    from ..catalog.store import CatalogStore

    docs = table(spark, sf_dir, "documents")
    codigo = F.concat(F.lit("C"), (F.col("doc_id") % 10).cast("string"))
    rows = docs.select(
        F.concat_ws("_", codigo, F.col("lang"), F.lit("X"), F.lit("A")).alias("indice"),
        codigo.alias("codigo"),
        F.upper(F.col("source")).alias("nombre_predio"),
        F.col("lang").alias("seccion"),
        F.col("source").alias("especie"),
        F.lit("A").alias("apl"),
        F.when(F.col("doc_id") % 2 == 0, 0).otherwise(3).cast("int").alias("id_tipo_img"),
        F.lit(0).cast("int").alias("id_proceso"),
        F.concat(
            F.lit("lake/BR/"), codigo, F.lit("/"), F.col("doc_id").cast("string"), F.lit(".jpg")
        ).alias("ruta_resultado"),
        F.current_timestamp().alias("fecha"),
    )
    store = CatalogStore(spark, tempfile.mkdtemp(prefix="catalog_rt_"))
    run_id = store.start_run(0)
    store.insert_catalog(rows, run_id)
    return store.filtered_paths(0, [0, 3], "C3_es_X_A")


# ======================================================================
# MULTIMODAL — binaryFile scan + Arrow-batched decode (SURVEY S1/S7/S8)
# ======================================================================

_MULTIMODAL_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'BR' ELSE 'TIF' END AS clase,
       CASE WHEN doc_id % 2 = 0 THEN
         round(-35.0 + 2.0 * (('0x' || substring(md5(text), 1, 8))::BIGINT / 4294967296.0), 6)
       END AS lat,
       CASE WHEN doc_id % 2 = 0 THEN
         round(-72.0 + 2.0 * (('0x' || substring(md5(text), 9, 8))::BIGINT / 4294967296.0), 6)
       END AS lon,
       CASE WHEN doc_id % 2 = 1 THEN
         round(200000.0 + 1000 * (('0x' || substring(md5(text), 1, 8))::BIGINT / 4294967296.0), 4)
       END AS gt0,
       CASE WHEN doc_id % 2 = 1 THEN
         1000 + floor((('0x' || substring(md5(text), 17, 8))::BIGINT / 4294967296.0) * 1000)::INT
       END AS cols,
       CASE WHEN doc_id % 2 = 1 THEN
         1000 + floor((('0x' || substring(md5(text), 25, 8))::BIGINT / 4294967296.0) * 1000)::INT
       END AS rows
FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
"""


@register("multimodal_meta", _MULTIMODAL_SQL)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing end-to-end: write blobs → binaryFile scan
    → Arrow-batched mapInPandas metadata extraction (EXIF/raster decode is
    the documented deterministic stub) → typed metadata columns.

    The oracle reproduces the stub's digest arithmetic in SQL, so schema,
    batching, and dispatch are all value-checked."""
    from ..sources.binary import extract_image_meta, read_binary_dir

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    dest = tempfile.mkdtemp(prefix="multimodal_")

    def write_files(rows):
        for r in rows:
            # the filename IS the address (id + payload both required);
            # null-keyed or null-payload rows never reach the bucket
            if r["text"] is None or r["doc_id"] is None:
                continue
            ext = "jpg" if r["doc_id"] % 2 == 0 else "tif"
            with open(os.path.join(dest, f"{r['doc_id']}.{ext}"), "wb") as f:
                f.write(r["text"].encode("utf-8"))

    docs.foreachPartition(write_files)
    binary = read_binary_dir(spark, dest)
    meta = extract_image_meta(binary)
    return meta.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.(jpg|tif)$", 1).cast("long").alias("doc_id"),
        "clase",
        F.round(F.col("lat"), 6).alias("lat"),
        F.round(F.col("lon"), 6).alias("lon"),
        F.round(F.element_at(F.col("gt"), 1), 4).alias("gt0"),
        F.col("cols"),
        F.col("rows"),
    )


_EXIF_GPS_SQL = """
SELECT i AS img_id,
       round(-((17 + i % 17) + ((i * 7) % 60) / 60.0
               + (((i * 131) % 6000) / 100.0) / 3600.0), 6) AS lat,
       round(-((60 + i % 12) + ((i * 11) % 60) / 60.0
               + (((i * 173) % 6000) / 100.0) / 3600.0), 6) AS lon
FROM generate_series(0, 59) t(i)
"""


@register("s7_exif_gps_scan", _EXIF_GPS_SQL)
def s7_exif_gps_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 executed for REAL, no PIL required: the fixture writes 60
    spec-shaped JPEGs whose APP1 segment carries an actual EXIF TIFF
    stream (GPS sub-IFD, DMS RATIONAL triples, S/W hemisphere refs —
    functions/tiff.py), binaryFile-scanned and parsed back byte-level by
    the pure-stdlib EXIF walker inside the Arrow mapInPandas kernel
    (sources/binary.py:_decode_image middle tier; the reference's
    gpsphoto.getGPSData, script_geo.py:170-171). The oracle recomputes
    the same deg + min/60 + sec/3600 closed form from the generating
    integers, so the byte roundtrip is value-checked end to end —
    unlike `multimodal_meta`, whose blobs are text and exercise the
    digest-stub tier."""
    from ..sources.binary import extract_image_meta, read_binary_dir
    from ..functions import tiff as _tiff

    dest = tempfile.mkdtemp(prefix="exif_fix_")

    def write_files(rows):
        for r in rows:
            i = r["id"]
            blob = _tiff.write_jpeg_exif_gps(
                (17 + i % 17, (i * 7) % 60, (i * 131) % 6000, 100),
                (60 + i % 12, (i * 11) % 60, (i * 173) % 6000, 100),
                south=True,
                west=True,
            )
            with open(os.path.join(dest, f"{i}.jpg"), "wb") as f:
                f.write(blob)

    spark.range(60).foreachPartition(write_files)
    meta = extract_image_meta(read_binary_dir(spark, dest))
    return meta.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.jpg$", 1)
        .cast("long")
        .alias("img_id"),
        F.round(F.col("lat"), 6).alias("lat"),
        F.round(F.col("lon"), 6).alias("lon"),
    )


_GEOTIFF_META_SQL = """
SELECT i AS img_id,
       512 + i % 256 AS cols, 256 + i % 128 AS rows,
       200000.0::DOUBLE + i * 250.25::DOUBLE AS x0,
       0.25::DOUBLE + (i % 8) / 16.0 AS px,
       6000000.0::DOUBLE - i * 125.5::DOUBLE AS y0,
       -(0.25::DOUBLE + (i % 4) / 8.0) AS neg_py
FROM generate_series(0, 47) t(i)
"""


@register("s8_geotiff_meta_scan", _GEOTIFF_META_SQL)
def s8_geotiff_meta_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 executed for REAL, no GDAL required: 48 minimal GeoTIFFs
    (ModelPixelScale + ModelTiepoint DOUBLE tags, sorted IFD —
    functions/tiff.py) are written, binaryFile-scanned, and parsed back
    by the pure-stdlib TIFF walker (the reference's GetGeoTransform,
    script_geo.py:176-179) into the affine geotransform + dimensions.
    All fixture values are dyadic rationals, so engine and oracle agree
    bit-exactly with no rounding at all."""
    from ..sources.binary import extract_image_meta, read_binary_dir
    from ..functions import tiff as _tiff

    dest = tempfile.mkdtemp(prefix="geotiff_fix_")

    def write_files(rows):
        for r in rows:
            i = r["id"]
            blob = _tiff.write_geotiff(
                512 + i % 256,
                256 + i % 128,
                200000.0 + i * 250.25,
                6000000.0 - i * 125.5,
                0.25 + (i % 8) / 16.0,
                0.25 + (i % 4) / 8.0,
            )
            with open(os.path.join(dest, f"{i}.tif"), "wb") as f:
                f.write(blob)

    spark.range(48).foreachPartition(write_files)
    meta = extract_image_meta(read_binary_dir(spark, dest))
    return meta.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.tif$", 1)
        .cast("long")
        .alias("img_id"),
        F.col("cols").cast("long").alias("cols"),
        F.col("rows").cast("long").alias("rows"),
        F.element_at("gt", 1).alias("x0"),
        F.element_at("gt", 2).alias("px"),
        F.element_at("gt", 4).alias("y0"),
        F.element_at("gt", 6).alias("neg_py"),
    )


# ======================================================================
# EXT — as-of / range joins, rank windows, grouping sets (SURVEY §2.3/§2.5)
# ======================================================================


@register(
    "graph_item_similarity",
    """
    WITH bp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    deg AS (SELECT pk, count(*) AS n FROM bp GROUP BY pk),
    co AS (
      SELECT a.pk AS p1, b.pk AS p2, count(*) AS co
      FROM bp a JOIN bp b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk),
    j AS (
      SELECT p1, p2, co, d1.n AS n1, d2.n AS n2,
             floor(co * 1e6 / (d1.n + d2.n - co) + 0.5)::BIGINT AS jacc_micro
      FROM co JOIN deg d1 ON d1.pk = p1 JOIN deg d2 ON d2.pk = p2)
    SELECT p1, p2, co, n1, n2, jacc_micro FROM (
      SELECT *, row_number() OVER (ORDER BY jacc_micro DESC, p1, p2) AS rn
      FROM j) WHERE rn <= 20
    """,
)
def graph_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering similarity (the recommender
    primitive): parts are similar when the same orders contain both —
    neighbor-set Jaccard |A∩B| / |A∪B| over the order-part bipartite
    graph. Candidates come from the SHARED-ORDER self-join (equi on
    order key — fan-out bounded by basket size, ~4-7 parts per TPC-H
    order, never all item pairs), degrees from one distinct-count pass,
    and the score as fixed-point micro-units so ranking is
    integer-exact. This composes with graph_copurchase (raw pair
    counts) the way BM25 composes with raw term counts — normalization
    turns counts into a comparable score. Scale: at a 10^9-order
    fleet the basket-size bound keeps the pair stream ~|orders|·k²,
    shuffle-partitioned on the order key; hub ITEMS never explode
    because pairs are generated per order, not per item."""
    bp = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    deg = bp.groupBy("pk").agg(F.count("*").alias("n"))
    a = bp.select("ok", F.col("pk").alias("p1"))
    b = bp.select("ok", F.col("pk").alias("p2"))
    co = (
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("co"))
    )
    j = (
        co.join(deg.select(F.col("pk").alias("p1"), F.col("n").alias("n1")), "p1")
        .join(deg.select(F.col("pk").alias("p2"), F.col("n").alias("n2")), "p2")
        .select(
            "p1",
            "p2",
            "co",
            "n1",
            "n2",
            F.floor(
                F.col("co") * 1e6 / (F.col("n1") + F.col("n2") - F.col("co"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("jacc_micro"),
        )
    )
    w = Window.orderBy(F.col("jacc_micro").desc(), "p1", "p2")
    return (
        j.select("p1", "p2", "co", "n1", "n2", "jacc_micro", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )


_TILE_WORLD = 1 << 23  # 8,388,608 m square world → zoom-z tile = WORLD/2^z
_TILE_ZOOMS = (0, 1, 2, 3)


@register(
    "geo_tile_pyramid",
    f"""
    WITH r AS (SELECT * FROM {GF.rasters_values_sql()}),
    c AS (
      SELECT img_id,
             least(gt0, gt0 + gt1*cols, gt0 + gt2*rows, gt0 + gt1*cols + gt2*rows) AS x0,
             greatest(gt0, gt0 + gt1*cols, gt0 + gt2*rows, gt0 + gt1*cols + gt2*rows) AS x1,
             least(gt3, gt3 + gt4*cols, gt3 + gt5*rows, gt3 + gt4*cols + gt5*rows) AS y0,
             greatest(gt3, gt3 + gt4*cols, gt3 + gt5*rows, gt3 + gt4*cols + gt5*rows) AS y1
      FROM r),
    z AS (SELECT unnest([{', '.join(str(z) for z in _TILE_ZOOMS)}]) AS zoom)
    SELECT img_id, zoom,
           floor(x0 / ({_TILE_WORLD} / (1 << zoom)))::BIGINT AS tx_min,
           floor(y0 / ({_TILE_WORLD} / (1 << zoom)))::BIGINT AS ty_min,
           (floor(x1 / ({_TILE_WORLD} / (1 << zoom)))::BIGINT
              - floor(x0 / ({_TILE_WORLD} / (1 << zoom)))::BIGINT + 1)
           * (floor(y1 / ({_TILE_WORLD} / (1 << zoom)))::BIGINT
              - floor(y0 / ({_TILE_WORLD} / (1 << zoom)))::BIGINT + 1)
             AS n_tiles
    FROM c, z
    """,
)
def geo_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-pyramid planning for raster serving (the XYZ/slippy-map
    layout, zooms 0-3 over a fixed 2^23 m world): each raster's affine
    geotransform (script_geo.py:177 parity — the same gt[6] the
    reference reads from GDAL) yields its exact corner extent
    (including skew terms), and per zoom the covered tile-id rectangle
    (tx, ty ranges + count) — the partition layout a 100 TB imagery
    lake serves and compacts by. All integer/closed-form double
    arithmetic, identical operand order both engines; the zoom axis is
    a generated 4-row explode, so the plan is map-only over the raster
    catalog."""
    r = GF.spark_rasters(spark)
    g = [F.col("gt").getItem(i) for i in range(6)]
    xs = [
        g[0],
        g[0] + g[1] * F.col("cols"),
        g[0] + g[2] * F.col("rows"),
        g[0] + g[1] * F.col("cols") + g[2] * F.col("rows"),
    ]
    ys = [
        g[3],
        g[3] + g[4] * F.col("cols"),
        g[3] + g[5] * F.col("rows"),
        g[3] + g[4] * F.col("cols") + g[5] * F.col("rows"),
    ]
    c = r.select(
        "img_id",
        F.least(*xs).alias("x0"),
        F.greatest(*xs).alias("x1"),
        F.least(*ys).alias("y0"),
        F.greatest(*ys).alias("y1"),
    )
    z = c.select(
        "*", F.explode(F.array(*[F.lit(z) for z in _TILE_ZOOMS])).alias("zoom")
    )
    # powers of two are exact doubles, so WORLD / 2^z matches the
    # oracle's integer-shift division bit-for-bit
    size = F.lit(float(_TILE_WORLD)) / F.pow(F.lit(2.0), F.col("zoom"))
    tx0 = F.floor(F.col("x0") / size).cast("long")
    tx1 = F.floor(F.col("x1") / size).cast("long")
    ty0 = F.floor(F.col("y0") / size).cast("long")
    ty1 = F.floor(F.col("y1") / size).cast("long")
    return z.select(
        "img_id",
        "zoom",
        tx0.alias("tx_min"),
        ty0.alias("ty_min"),
        ((tx1 - tx0 + 1) * (ty1 - ty0 + 1)).alias("n_tiles"),
    )


_RB_WINDOW_S = 300  # ±5-minute proximity window = the bucket width


@register(
    "j_range_bucketed",
    f"""
    WITH e AS (SELECT event_id, floor(epoch(CAST(ts AS TIMESTAMP)))::BIGINT AS t
               FROM events WHERE event_type = 'error' AND user_id < 200),
    s AS (SELECT floor(epoch(CAST(ts AS TIMESTAMP)))::BIGINT AS t
          FROM events WHERE event_type = 'signup')
    SELECT e.event_id, count(s.t) AS n_nearby
    FROM e LEFT JOIN s ON abs(s.t - e.t) <= {_RB_WINDOW_S}
    GROUP BY e.event_id
    """,
)
def j_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless range join via interval bucketing — the rewrite that
    scales a pure-proximity join (no equi key: every error vs every
    signup within ±5 min, ACROSS users). Naive is |E|·|S| cross; the
    engine buckets time into window-width cells, expands the probe side
    into its cell ±1 (3 rows each — bounded, data-independent), and
    equi-joins on the cell with the true |Δt| ≤ w residual. Each
    qualifying pair meets in exactly ONE cell (the build row's own), so
    no dedup pass is needed. This is the temporal twin of the spatial
    grid trick (`geo_contains_grid`) — shuffle-partitionable where the
    oracle's inequality join is not. The left join keeps zero-match
    errors in the output."""
    ev = table(spark, sf_dir, "events")
    t_sec = F.unix_timestamp("ts")
    err = ev.filter(
        (F.col("event_type") == "error") & (F.col("user_id") < 200)
    ).select(
        "event_id",
        t_sec.alias("t"),
        F.floor(t_sec / _RB_WINDOW_S).alias("cell"),
    )
    sig = ev.filter(F.col("event_type") == "signup").select(
        t_sec.alias("s_t"),
        F.floor(t_sec / _RB_WINDOW_S).alias("s_cell"),
    )
    sig_exp = sig.select(
        "s_t",
        F.explode(
            F.array(
                F.col("s_cell") - 1, F.col("s_cell"), F.col("s_cell") + 1
            )
        ).alias("cell"),
    )
    joined = err.join(
        sig_exp,
        (err.cell == sig_exp.cell)
        & (F.abs(F.col("s_t") - F.col("t")) <= _RB_WINDOW_S),
        "left",
    )
    return joined.groupBy("event_id").agg(
        F.count("s_t").alias("n_nearby")
    )


@register(
    "j_range_join",
    """
    SELECT e.event_id, count(p.event_id) AS n_purchases
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = e.user_id
     AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL '30 minutes'
    GROUP BY e.event_id
    """,
)
def j_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: purchases within 30min after each error,
    per user. Equi-key keeps it a hash join; range is a residual filter."""
    from ..operators.asof import range_join

    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), F.col("user_id"), F.col("ts").alias("e_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id"), F.col("ts").alias("p_ts")
    )
    joined = range_join(
        errors,
        purchases,
        ["user_id"],
        F.col("e_ts"),
        F.col("p_ts"),
        F.expr("INTERVAL 0 MINUTES"),
        F.expr("INTERVAL 30 MINUTES"),
        how="left",
    )
    return joined.groupBy(F.col("e_id").alias("event_id")).agg(
        F.count("p_id").alias("n_purchases")
    )


@register(
    "j_asof_join",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    s AS (SELECT user_id, ts, max(event_id) AS signup_id
          FROM events WHERE event_type = 'signup'
            AND user_id IS NOT NULL AND ts IS NOT NULL
          GROUP BY user_id, ts)
    -- strict inequality semantics: a NULL-ts probe matches NOTHING
    -- (DuckDB's sort-based ASOF would quirk-match it to the latest
    -- entry; the explicit split pins the engine-neutral contract)
    SELECT p.event_id, p.user_id, s.signup_id,
           floor(epoch(s.ts))::BIGINT AS asof_epoch
    FROM (SELECT * FROM p WHERE ts IS NOT NULL) p
    ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    UNION ALL
    SELECT event_id, user_id, NULL::BIGINT, NULL::BIGINT
    FROM p WHERE ts IS NULL
    """,
)
def j_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior signup
    (union + last(ignorenulls) window — one shuffle, no pair explosion).

    r16 null contract: the RIGHT (dimension) side requires key + time —
    a null-keyed or null-ts signup can match nothing in SQL ASOF
    semantics, but the union-merge would group null keys together;
    filtering the signup side keeps left rows intact and both engines
    agree (null-ts/key purchases simply match nothing)."""
    from ..operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = (
        ev.filter(
            (F.col("event_type") == "signup")
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_id"))
    )
    out = asof_join(purchases, signups, ["user_id"], "ts", ["signup_id"])
    return out.select(
        "event_id",
        "user_id",
        "signup_id",
        F.unix_timestamp("asof_ts").alias("asof_epoch"),
    )


@register(
    "w4_rank_funcs",
    """
    SELECT o_custkey, o_orderkey,
           rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey NULLS FIRST)
    """,
)
def w4_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile ranking windows (SURVEY §2.5 surface)."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "a4_grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus, count(*) AS n, {_dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def a4_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube)."""
    import uuid

    view = f"__gs_lineitem_{uuid.uuid4().hex[:8]}"
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               {_dsum_sql('l_quantity')} AS sum_qty
        FROM {view}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "a5_approx_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS n_orders_exact,
           true AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a5_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct — the 100 TB cardinality path (HLL sketch,
    map-side mergeable). The sketch estimate itself is engine-specific,
    so the oracle checks the exact count plus a tolerance BOOLEAN: the
    engine asserts |approx - exact| <= 10%·exact (5× the configured
    rsd=0.02 — a sketch that far off is broken, not unlucky) and the
    oracle expects `true`. The approximation is thereby externally
    checked without demanding bit-identical HLL registers (same pattern
    as a5_kmv_distinct).

    Plan shape (r10 rewrite): mixing a DISTINCT aggregate with the HLL
    in ONE agg triggers Spark's two-phase distinct rewrite, which
    materializes a partial_approx_count_distinct buffer (~410 longs at
    rsd=0.02) PER (flag, orderkey) PAIR and shuffles all of them —
    hundreds of MB at sf0.1, ruinous at corpus scale. HLL registers are
    max-merged over hashed VALUES, so the sketch over the distinct
    pairs is bit-identical to the sketch over the raw rows: aggregate
    to distinct pairs first (keys-only shuffle, map-side partial), then
    compute BOTH the exact count and the sketch from the pairs (3.6 s
    -> sub-second warm at sf0.1, same output)."""
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_orderkey")
        .distinct()
    )
    return (
        pairs.groupBy("l_returnflag")
        # count(col) not count(*): NULL keys are not a cardinality —
        # matches COUNT(DISTINCT ...) and the HLL, which both skip
        # nulls (r16 null contract)
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("n_orders_approx"),
            F.count("l_orderkey").alias("n_orders_exact"),
        )
        .select(
            "l_returnflag",
            "n_orders_exact",
            (
                F.abs(F.col("n_orders_approx") - F.col("n_orders_exact"))
                <= 0.1 * F.col("n_orders_exact")
            ).alias("within_tol"),
        )
    )


# ======================================================================
# EXT — dedup families #4/#5: exact n-gram Jaccard, embedding cosine
# ======================================================================

@register(
    "text_tfidf_topk",
    """
    WITH tok AS (
      SELECT doc_id, lower(t.token) AS token
      FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
      WHERE t.token <> ''),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok),
    scored AS (
      SELECT tf.doc_id, tf.token,
             (tf.tf * n.n_docs * 1000000 // df.df)::BIGINT AS score_micro
      FROM tf JOIN df USING (token), n)
    SELECT doc_id, token, score_micro, rank FROM (
      SELECT doc_id, token, score_micro,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_micro DESC, token) AS rank
      FROM scored) WHERE rank <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction (top-3 terms): term
    frequency × inverse document frequency, the classic relevance
    weight (Spärck Jones 1972). The IDF is kept as the exact integer
    rational tf·N·10⁶ ÷ df (floor division) instead of the usual
    log(N/df) — the RANKING is identical for top-k-per-doc and the
    score stays bit-exact cross-engine with no libm log in sight (the
    same discipline as text_bigram_fluency). Plan: one explode, two
    count aggregates at different keys, a token-keyed join back
    (AQE-decided, unhinted — the text_rarity_score rationale), a
    one-row N broadcast, and a per-doc ranking window."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .select("doc_id", F.lower("token").alias("token"))
        .filter(F.col("token") != "")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            # integral `div`, not floor(double /): a double quotient one
            # ulp under an integer can round up and break the floor
            F.expr("(tf * n_docs * 1000000L) div df")
            .cast("long")
            .alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), "token"
    )
    return (
        scored.select(
            "doc_id", "token", "score_micro", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= 3)
    )


_NGRAM_MAX_DF = 100
_NGRAM_JACCARD_SQL = f"""
WITH base AS (SELECT doc_id, {H.shingles_sql('text', 3)} AS shingles FROM documents),
ex0 AS (SELECT DISTINCT doc_id, sh FROM (SELECT doc_id, unnest(shingles) AS sh FROM base)),
hot AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) > {_NGRAM_MAX_DF}),
ex AS (SELECT * FROM ex0 WHERE sh NOT IN (SELECT sh FROM hot)),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT a_id, b_id, round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE round(i::DOUBLE / (sa.n + sb.n - i), 6) >= 0.1
"""


@register("dedup_ngram_jaccard", _NGRAM_JACCARD_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard join (inverted-index equi-join, count-based —
    no arrays cross the shuffle), with the hot-shingle document-frequency
    cap active (VERDICT r1 #5) and mirrored in the oracle."""
    return D.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"),
        k=3,
        jaccard_threshold=0.1,
        max_doc_freq=_NGRAM_MAX_DF,
    )


_CONTAINMENT_THR = 0.8
_CONTAINMENT_SQL = f"""
WITH base AS (SELECT doc_id, {H.shingles_sql('text', 3)} AS shingles FROM documents),
ex0 AS (SELECT DISTINCT doc_id, sh FROM (SELECT doc_id, unnest(shingles) AS sh FROM base)),
hot AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) > {_NGRAM_MAX_DF}),
ex AS (SELECT * FROM ex0 WHERE sh NOT IN (SELECT sh FROM hot)),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT a_id, b_id,
       round(i::DOUBLE / sa.n, 6) AS cont_a,
       round(i::DOUBLE / sb.n, 6) AS cont_b
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE round(i::DOUBLE / sa.n, 6) >= {_CONTAINMENT_THR}
   OR round(i::DOUBLE / sb.n, 6) >= {_CONTAINMENT_THR}
"""


@register("dedup_containment", _CONTAINMENT_SQL)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup (operators/dedup.py
    containment_pairs): c(A→B) = |A∩B|/|A| catches documents SUBSUMED by
    larger ones — quotes, truncated mirrors, boilerplate-wrapped reposts
    — which symmetric Jaccard scores near zero. Same inverted-index
    aggregative plan and hot-shingle DF cap as dedup_ngram_jaccard; both
    directions from one intersection count."""
    return D.containment_pairs(
        table(spark, sf_dir, "documents"),
        k=3,
        threshold=_CONTAINMENT_THR,
        max_doc_freq=_NGRAM_MAX_DF,
    )


_COS_BANDS, _COS_PLANES = 4, 5
_COS_BAND_COLS = ",\n         ".join(
    SIM.hyperplane_signature_sql(
        "embedding", _COS_PLANES, plane_offset=b * _COS_PLANES
    )
    + f" AS bucket{b}"
    for b in range(_COS_BANDS)
)
# One equi-join PER BAND unioned + DISTINCT, exactly the engine's
# band-bucket join + dropDuplicates-before-verify. (An earlier OR-of-
# band-equalities single join forced DuckDB into a nested-loop that
# re-evaluated the un-materialized hyperplane signatures per pair —
# ~14 s at sf0.01; the materialized equi-join form is ~10× cheaper and
# is also the only shape that stays hash-joinable at scale.)
_COS_BAND_UNION = "\n    UNION ALL\n".join(
    f"    SELECT a.vec_id AS a_id, b2.vec_id AS b_id\n"
    f"    FROM b a JOIN b b2\n"
    f"      ON a.bucket{k} = b2.bucket{k} AND a.vec_id < b2.vec_id"
    for k in range(_COS_BANDS)
)
_COSINE_CAND_CTE = f"""
WITH b AS MATERIALIZED (
  SELECT vec_id, embedding,
         {_COS_BAND_COLS}
  FROM embeddings WHERE embedding IS NOT NULL),
cand AS MATERIALIZED (
  SELECT DISTINCT a_id, b_id FROM (
{_COS_BAND_UNION}
  )),
ver AS (
  SELECT c.a_id, c.b_id,
         round({V.cosine_sql('va.embedding', 'vb.embedding')}, 6) AS cos
  FROM cand c
  JOIN b va ON va.vec_id = c.a_id
  JOIN b vb ON vb.vec_id = c.b_id)
"""
_COSINE_PAIRS_SQL = (
    _COSINE_CAND_CTE + "SELECT a_id, b_id, cos FROM ver WHERE cos >= 0.25"
)


@register("dedup_cosine_pairs", _COSINE_PAIRS_SQL)
def dedup_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: banded OR-of-ANDs hyperplane LSH
    candidates (bounded per-band buckets), exact cosine verify (dedup
    family #5, VERDICT r1 #4)."""
    return SIM.cosine_near_pairs(
        table(spark, sf_dir, "embeddings"),
        threshold=0.25,
        num_bands=_COS_BANDS,
        planes_per_band=_COS_PLANES,
    )


def _min_label_components_cte(n_rounds: int = 12) -> str:
    """Bounded-round min-label contraction over an ``edges`` (src, dst)
    symmetric CTE — the oracle twin of ``D.components_from_edges``'s
    distributed min-label loop, replacing the earlier recursive-CTE
    transitive closure whose ``reach`` set is O(ΣC²) rows (one row per
    reachable pair; ~210 s at sf0.001 before materialization hints, and
    still quadratic in cluster size after them — ADVICE r07 medium).

    Each round: (a) every edge-incident node takes the min label over
    its closed neighborhood (one O(E) join + groupBy, exactly the Spark
    round shape), then (b) path compression — relabel through the label
    table itself (comp := comp[comp], pointer jumping). Compression
    makes convergence O(log diameter), so 12 unrolled rounds cover any
    component the Spark side's 20 plain rounds can resolve, at O(rounds
    × E) total cost. Invariant both steps preserve: comp(x) is the id
    of some node reachable from x, monotonically non-increasing — the
    fixpoint is the component minimum.

    The bound is ENFORCED, not assumed (ADVICE r08): a companion
    ``nonconv`` CTE runs one more un-compressed min-label step over
    ``lab{n}`` and counts labels that would still shrink; the final
    projection raises via ``error()`` (CASE short-circuits, so the
    branch costs nothing when converged) instead of silently emitting
    unconverged labels as a confusing engine-vs-oracle hash mismatch.
    One extra O(E) join, total cost still O(rounds × E)."""
    parts = ["lab0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS comp FROM edges)"]
    for i in range(1, n_rounds + 1):
        parts.append(
            f"""step{i} AS MATERIALIZED (
  SELECT id, min(comp) AS comp FROM (
    SELECT id, comp FROM lab{i - 1}
    UNION ALL
    SELECT e.dst AS id, l.comp FROM lab{i - 1} l JOIN edges e ON e.src = l.id
  ) GROUP BY id),
lab{i} AS MATERIALIZED (
  SELECT s.id, l.comp FROM step{i} s JOIN step{i} l ON l.id = s.comp)"""
        )
    parts.append(
        f"""nonconv AS (
  SELECT count(*) AS n FROM (
    SELECT id, min(comp) AS comp FROM (
      SELECT id, comp FROM lab{n_rounds}
      UNION ALL
      SELECT e.dst AS id, l.comp FROM lab{n_rounds} l JOIN edges e ON e.src = l.id
    ) GROUP BY id
  ) chk JOIN lab{n_rounds} cur ON cur.id = chk.id AND cur.comp <> chk.comp)"""
    )
    parts.append(
        f"""comp AS (
  SELECT id,
         CASE WHEN (SELECT n FROM nonconv) > 0
              THEN CAST(error('min-label contraction not converged in {n_rounds} rounds — raise n_rounds') AS BIGINT)
              ELSE comp END AS component
  FROM lab{n_rounds})"""
    )
    return ",\n".join(parts)


# Components run over edge-incident nodes only — singletons (the vast
# majority) never enter the label loop and get their self-label from
# the final left join.
_SEMANTIC_COMPONENTS_SQL = (
    _COSINE_CAND_CTE
    + """, pairs AS MATERIALIZED (SELECT a_id, b_id FROM ver WHERE cos >= 0.25),
edges AS MATERIALIZED (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs),
"""
    + _min_label_components_cte()
    + """
SELECT emb.vec_id,
       CAST(coalesce(comp.component, emb.vec_id) AS BIGINT) AS component
FROM embeddings emb LEFT JOIN comp ON comp.id = emb.vec_id"""
)


@register("dedup_semantic_components", _SEMANTIC_COMPONENTS_SQL)
def dedup_semantic_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style SEMANTIC dedup clusters: embedding-cosine near-dup
    pairs (banded hyperplane LSH candidates + exact cosine verify, same
    kernel as dedup_cosine_pairs) fed into connected components — every
    vector gets a canonical cluster id (min vec_id reachable), isolated
    vectors label themselves. The keep-one-per-semantic-cluster decision
    for an embedding-deduped corpus, end to end in one plan.

    Scale shape: candidate generation is the banded bucket equi-join
    (never all-pairs), components run on the verified pair graph only
    (edge-incident nodes, ≪ corpus), and the final label assignment is
    one left join back to the vector table. The oracle replays the same
    closure as a recursive CTE."""
    pairs = SIM.cosine_near_pairs(
        table(spark, sf_dir, "embeddings"),
        threshold=0.25,
        num_bands=_COS_BANDS,
        planes_per_band=_COS_PLANES,
    )
    edges = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    labels = D.components_from_edges(edges)
    vecs = table(spark, sf_dir, "embeddings").select("vec_id")
    return vecs.join(labels, vecs.vec_id == labels.id, "left").select(
        "vec_id",
        F.coalesce("component", F.col("vec_id").cast("long")).alias("component"),
    )


# ======================================================================
# EXT — sinks: CSV roundtrip (S11), content-addressed key (S12)
# ======================================================================


@register(
    "s11_csv_roundtrip",
    f"""
    SELECT event_type, count(*) AS n, {_dsum_sql('value')} AS sum_value
    FROM events GROUP BY event_type
    """,
)
def s11_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: CSV sink + re-scan roundtrip (script_geo.py:158-160 done right:
    header AND rows). The aggregate over the re-read copy must equal the
    oracle's aggregate over the original — proving the codec loses nothing."""
    dest = os.path.join(tempfile.mkdtemp(prefix="csv_sink_"), "events_csv")
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    ev.write.mode("overwrite").option("header", True).csv(dest)
    back = (
        spark.read.option("header", True)
        .schema("event_id long, event_type string, value double")
        .csv(dest)
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), _dsum(F.col("value")).alias("sum_value")
    )


@register(
    "s12_content_key",
    "SELECT doc_id, md5(text) AS content_key FROM documents",
)
def s12_content_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 fixed: TRUE content-addressed object key md5(content) — the
    reference hashed os.urandom instead (§2.11 bug 5)."""
    from ..sources.binary import content_key

    docs = table(spark, sf_dir, "documents").withColumn(
        "content", F.col("text").cast("binary")
    )
    return content_key(docs).select("doc_id", "content_key")


# ======================================================================
# EXT — streaming session windows (SURVEY §2.9)
# ======================================================================

_STREAM_SESSION_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS prev
  FROM events WHERE ts IS NOT NULL),
m AS (SELECT *, CASE WHEN prev IS NULL OR (epoch(ts) - epoch(prev)) >= 1800.0
                     THEN 1 ELSE 0 END AS new_sess FROM o),
s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                                    ROWS UNBOUNDED PRECEDING) AS seq FROM m)
SELECT user_id, floor(epoch(min(ts)))::BIGINT AS session_start_epoch,
       count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, seq
"""


@register("streaming_session", _STREAM_SESSION_SQL)
def streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, 30min) as a Structured Streaming query
    (availableNow, update mode, memory sink) — checked against the batch
    gaps-and-islands oracle: stream/batch session parity."""
    import uuid

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream_dir = tempfile.mkdtemp(prefix="events_sess_")
    os.symlink(src, os.path.join(stream_dir, "events.parquet"))
    stream = spark.readStream.format("parquet").schema(raw_schema).load(stream_dir)
    stream = _norm_event_ts(stream).filter(F.col("ts").isNotNull())
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"), _dsum(F.col("value")).alias("sum_value"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_epoch"),
            "n",
            "sum_value",
        )
    )
    name = f"stream_session_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# ======================================================================
# EXT — F9/F10/F11 reprojection pipeline on the raster fixture
# ======================================================================

_REPROJECT_SQL = f"""
WITH rast AS (SELECT * FROM {GF.rasters_values_sql()}),
ext AS (
  SELECT img_id,
         gt0 + 0 * gt1 + 0 * gt2 AS x0, gt3 + 0 * gt4 + 0 * gt5 AS y0,
         gt0 + 0 * gt1 + rows * gt2 AS x1, gt3 + 0 * gt4 + rows * gt5 AS y1,
         gt0 + cols * gt1 + rows * gt2 AS x2, gt3 + cols * gt4 + rows * gt5 AS y2,
         gt0 + cols * gt1 + 0 * gt2 AS x3, gt3 + cols * gt4 + 0 * gt5 AS y3
  FROM rast),
cen AS (SELECT img_id, (x0 + x1 + x2 + x3) / 4.0 AS cx, (y0 + y1 + y2 + y3) / 4.0 AS cy FROM ext)
SELECT img_id,
       round((18 * 6 - 183) + (cx - 500000.0) / (0.9996 * 6378137.0) * (180.0 / 3.141592653589793), 6) AS lon,
       round((cy - 10000000.0) / (0.9996 * 6378137.0) * (180.0 / 3.141592653589793), 6) AS lat
FROM cen
"""


@register("geo_reproject_centroid", _REPROJECT_SQL)
def geo_reproject_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8+F10+F11+F9 composed: geotransform → extent → centroid →
    UTM→WGS84 reprojection (the reference's raster branch,
    script_geo.py:175-189, as one column pipeline)."""
    from ..functions.geo import extent_centroid, reproject_utm_to_wgs84_approx

    rast = GF.spark_rasters(spark)
    ext = rast.withColumn("ext", affine_extent(F.col("gt"), F.col("cols"), F.col("rows")))
    cen = ext.withColumn("c", extent_centroid(F.col("ext")))
    rep = cen.withColumn(
        "ll", reproject_utm_to_wgs84_approx(F.col("c.x"), F.col("c.y"), zone=18, south=True)
    )
    return rep.select(
        "img_id",
        F.round(F.col("ll.lon"), 6).alias("lon"),
        F.round(F.col("ll.lat"), 6).alias("lat"),
    )


_UTM_FWD_SQL = (
    "SELECT pt_id, round(easting, 4) AS easting,"
    " round(northing, 4) AS northing, in_zone FROM ("
    + GEO.utm_forward_sql(
        "SELECT i AS pt_id, -44.0 + (i // 10) * 2.6 AS lat,"
        " -73.5 + (i % 10) * 0.9 AS lon,"
        " (-72.0 <= -73.5 + (i % 10) * 0.9"
        "  AND -73.5 + (i % 10) * 0.9 < -66.0) AS in_zone"
        " FROM generate_series(0, 99) t(i)",
        "lat",
        "lon",
        zone=19,
        south=True,
    )
    + ")"
)


@register("geo_utm_forward_grid", _UTM_FWD_SQL)
def geo_utm_forward_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 write-back direction: WGS84 → UTM 19S via the full forward
    Transverse Mercator series (functions/geo.py utm_forward_steps;
    pytest pins the published CN Tower easting/northing within its meter
    rounding and round-trips against the inverse to ~1e-9°). Same
    shared-SQL-text contract as geo_utm_inverse_grid; the in_zone flag
    marks points inside the zone's longitude band, where the series is
    mm-exact. Pure codegen arithmetic, zero exchanges, no UDF."""
    pts = spark.range(100).select(
        F.col("id").alias("pt_id"),
        (-44.0 + (F.col("id") / 10).cast("long") * 2.6).alias("lat"),
        (-73.5 + (F.col("id") % 10) * 0.9).alias("lon"),
    ).withColumn(
        "in_zone", (F.col("lon") >= -72.0) & (F.col("lon") < -66.0)
    )
    out = GEO.reproject_wgs84_to_utm_exact(pts, "lat", "lon", zone=19, south=True)
    return out.select(
        "pt_id",
        F.round("easting", 4).alias("easting"),
        F.round("northing", 4).alias("northing"),
        "in_zone",
    )


_UTM_INV_SQL = (
    "SELECT pt_id, round(lat, 6) AS lat, round(lon, 6) AS lon FROM ("
    + GEO.utm_inverse_sql(
        "SELECT i AS pt_id, 200000.0 + i * 6100.0 AS x,"
        " 5600000.0 + i * 7300.0 AS y FROM generate_series(0, 99) t(i)",
        "x",
        "y",
        zone=19,
        south=True,
    )
    + ")"
)


@register("geo_utm_inverse_grid", _UTM_INV_SQL)
def geo_utm_inverse_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 with the EXACT inverse Transverse Mercator — no pyproj, no
    approximation: the full Snyder USGS series (functions/geo.py:
    utm_inverse_steps, mm-accurate; pytest checks published ground truth
    + a forward round trip) over a 100-point UTM 19S grid spanning the
    zone. The series is generated once as SQL text and evaluated by both
    engines, so this externally checks the reprojection the reference
    does through pyproj (convertirCoordenadas, script_geo.py:33-61).
    Pure column arithmetic — whole-stage codegen, no UDF, broadcast-free."""
    pts = (
        spark.range(100)
        .select(
            F.col("id").alias("pt_id"),
            (200000.0 + F.col("id") * 6100.0).alias("x"),
            (5600000.0 + F.col("id") * 7300.0).alias("y"),
        )
    )
    out = GEO.reproject_utm_to_wgs84_exact(pts, "x", "y", zone=19, south=True)
    return out.select(
        "pt_id",
        F.round("lat", 6).alias("lat"),
        F.round("lon", 6).alias("lon"),
    )


# ======================================================================
# EXT — IVF ANN, skew-mitigation plans, partitioned publish, multimodal
# ======================================================================

_IVF_D2 = V.euclidean2_sql("e.embedding", "c.centroid")
_IVF_TOPK_SQL = f"""
WITH c AS (SELECT vec_id AS centroid_id, embedding AS centroid FROM embeddings WHERE vec_id < 8),
d0 AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         row_number() OVER (PARTITION BY e.vec_id ORDER BY {_IVF_D2}, c.centroid_id) AS rn
  FROM embeddings e CROSS JOIN c),
assign AS (SELECT vec_id, embedding, centroid_id FROM d0 WHERE rn = 1),
probes AS (
  SELECT e.vec_id AS q_id, e.embedding AS qe, c.centroid_id,
         row_number() OVER (PARTITION BY e.vec_id ORDER BY {_IVF_D2}, c.centroid_id) AS rn
  FROM embeddings e CROSS JOIN c
  WHERE e.vec_id IN (10, 11, 12)),
scored AS (
  SELECT p.q_id, a.vec_id, round({V.cosine_sql('a.embedding', 'p.qe')}, 6) AS cos
  FROM assign a JOIN (SELECT * FROM probes WHERE rn <= 2) p ON a.centroid_id = p.centroid_id)
SELECT q_id, vec_id, cos, rank FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 5
"""


@register("ann_ivf_topk", _IVF_TOPK_SQL)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: coarse-quantize to fixed centroids (vec_id < 8 as the
    codebook — production swaps in pyspark.ml KMeans centers, same plan),
    probe the 2 nearest cells per query, exact cosine + window top-k."""
    emb = table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    queries = emb.filter(F.col("vec_id").isin(10, 11, 12)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return SIM.ivf_topk(emb, queries, centroids, k=5, nprobe=2)


@register(
    "skew_salted_agg",
    f"""
    SELECT l_returnflag, {_dsum_sql('l_quantity')} AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (§4.2 skew path) — result identical to
    the plain groupBy, so the plain SQL is the oracle. Decimal partials
    keep the double sum order-independent across salt groupings."""
    from ..operators.skew import salted_sum_count

    li = table(spark, sf_dir, "lineitem")
    out = salted_sum_count(
        li, ["l_returnflag"], F.col("l_quantity").cast("decimal(18,4)"), n_salts=8,
        sum_alias="__dsum", count_alias="n",
    )
    return out.select(
        "l_returnflag", F.col("__dsum").cast("double").alias("sum_qty"), "n"
    )


@register(
    "skew_salted_join",
    f"""
    SELECT p.p_brand, count(*) AS n, {_dsum_sql('l.l_extendedprice')} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate join (§4.2): hot fact keys spread over 8 salt
    partitions; small side replicated per salt. Same rows as the plain
    equi-join → plain-join oracle."""
    from ..operators.skew import salted_broadcast_replicate_join

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_broadcast_replicate_join(li, part, "l_partkey", n_salts=8)
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n"), _dsum(F.col("l_extendedprice")).alias("revenue")
    )


@register(
    "s16_partitioned_publish",
    f"""
    SELECT source, count(*) AS n, {_dsum_sql('n_chars')} AS total_chars
    FROM documents WHERE lang = 'es' GROUP BY source
    """,
)
def s16_partitioned_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S16/model-publish layout: partitioned write (partitionBy lang — the
    reference's <codigo>/<indice>/<fecha> object layout as table
    partitions), then a partition-PRUNED read back (only lang=es files are
    scanned; .explain shows PartitionFilters). Aggregate must equal the
    oracle's direct filter — proving the codec + pruning lose nothing."""
    dest = os.path.join(tempfile.mkdtemp(prefix="publish_"), "docs_by_lang")
    # path safety: a partition value becomes a DIRECTORY NAME — a dirty
    # multi-KB category blows up the writer (Mkdirs ENAMETOOLONG), so
    # unpublishable categories go to the bad-records channel. Value-
    # neutral here: the read-back filters lang = 'es'.
    docs = table(spark, sf_dir, "documents").filter(
        F.col("lang").isNull() | (F.length("lang") <= 255)
    )
    docs.write.mode("overwrite").partitionBy("lang").parquet(dest)
    # Explicit schema on the read-back: a republish of an empty batch
    # writes zero data files and schema inference has nothing to read —
    # the published contract, not the file listing, defines the schema.
    back = spark.read.schema(docs.schema).parquet(dest).filter(
        F.col("lang") == "es"
    )
    return back.groupBy("source").agg(
        F.count("*").alias("n"), _dsum(F.col("n_chars")).alias("total_chars")
    )


_FRAMES_SQL = """
SELECT doc_id, (i * 10) AS frame_idx,
       md5(md5(text) || ':' || (i * 10)::VARCHAR) AS frame_key
FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS i)
"""


@register("multimodal_frames", _FRAMES_SQL)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling kernel contract: one binary row → N frame rows via
    Arrow-batched mapInPandas (decode stubbed on a digest chain the oracle
    reproduces — schema, batching, and row expansion are all real)."""
    from ..sources.binary import sample_frames

    docs = table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("path"),
        F.col("text").cast("binary").alias("content"),
    )
    frames = sample_frames(docs, every_n=10, max_frames=5)
    return frames.select(
        F.col("path").cast("long").alias("doc_id"), "frame_idx", "frame_key"
    )


_RESIZE_SQL = """
SELECT doc_id, 32 AS width, 32 AS height,
       length(thumb_hex) // 2 AS thumb_len,
       md5(thumb_hex) AS thumb_md5
FROM (
  SELECT doc_id,
         substring(repeat(md5(text), 32*32//16 + 1), 1, 2*32*32) AS thumb_hex
  FROM documents)
"""


@register("multimodal_resize", _RESIZE_SQL)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize kernel contract (SURVEY §2.10 multimodal family):
    binary column → Arrow-batched mapInPandas thumbnail kernel
    (sources/binary.py resize_images — REAL ``PIL.resize`` when the
    wheel exists, deterministic digest-slice stub in this container) →
    per-image (width, height, byte length, content digest). The oracle
    replays the stub's digest chain in hex-string space (byte slicing
    aligns to hex pairs), so schema, batch plumbing, and binary-out
    length semantics are externally checked end to end, like
    multimodal_frames."""
    from ..sources.binary import resize_images

    docs = table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("path"),
        F.col("text").cast("binary").alias("content"),
    )
    thumbs = resize_images(docs, width=32, height=32)
    return thumbs.select(
        F.col("path").cast("long").alias("doc_id"),
        "width",
        "height",
        F.length("thumb").alias("thumb_len"),
        F.md5(F.lower(F.hex("thumb"))).alias("thumb_md5"),
    )


# ======================================================================
# EXT — pivot/unpivot, subqueries, percentiles, edit distance
# ======================================================================


@register(
    "a4_pivot_dynamic",
    """
    SELECT source,
           count(*) FILTER (WHERE lang = 'de') AS n_de,
           count(*) FILTER (WHERE lang = 'en') AS n_en,
           count(*) FILTER (WHERE lang = 'es') AS n_es,
           count(*) FILTER (WHERE lang = 'fr') AS n_fr,
           count(*) FILTER (WHERE lang = 'zh') AS n_zh
    FROM documents GROUP BY source
    """,
)
def a4_pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC pivot: the value list is DISCOVERED at runtime (distinct
    langs, sorted for a stable column order) instead of hard-coded —
    the report-building pattern where the category set is data-driven.
    The discovery is a one-column distinct collected to the driver:
    bounded by the domain's cardinality (languages, statuses — tens,
    not millions; the same one-small-collect posture as the catalog's
    max-id lookup), and the pivot itself stays a single map-side-
    combined aggregate. The oracle pins the expected discovered set, so
    the external check also verifies the discovery found exactly the
    corpus's languages."""
    docs = table(spark, sf_dir, "documents").select("source", "lang")
    # a NULL category is not a pivot column (same convention as SQL
    # PIVOT ... IN lists, which enumerate only real values), and a
    # discovered category becomes a COLUMN NAME — the same
    # identifier-safety contract as partition-directory values (r16):
    # only identifier-safe categories ([A-Za-z0-9_-]{1,64}) mint schema
    # columns; dirty ones keep their rows but get no column (the
    # downstream consumers of a pivoted report — files, BI — can't
    # address a 10k-char or control-character column anyway)
    import re as _re

    _safe = _re.compile(r"^[A-Za-z0-9_-]{1,64}$")
    langs = sorted(
        r["lang"]
        for r in docs.select("lang").distinct().collect()
        if r["lang"] is not None and _safe.match(r["lang"])
    )
    out = docs.groupBy("source").pivot("lang", langs).count().na.fill(0)
    return out.select(
        "source", *[F.col(lg).alias(f"n_{lg}") for lg in langs]
    )


@register(
    "j_late_arriving_dim",
    """
    WITH dim0 AS (SELECT * FROM customer WHERE c_custkey % 10 <> 7),
    missing AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE NOT EXISTS (SELECT 1 FROM dim0 d WHERE d.c_custkey = o_custkey)),
    seg AS (
      -- LEFT join + __UNKNOWN__: a fact whose key has NO dim row at all
      -- (even late) keeps its inferred placeholder — facts are never
      -- dropped. Null-keyed facts can reference nothing: excluded.
      SELECT CASE WHEN c.c_custkey IS NULL THEN '__UNKNOWN__'
                  ELSE c.c_mktsegment END AS segment,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_custkey IS NOT NULL
      GROUP BY 1)
    SELECT segment, n_orders, revenue FROM seg
    UNION ALL
    SELECT '__reconciled_inferred',
           (SELECT count(*) FROM missing),
           0.0
    ORDER BY segment
    """,
)
def j_late_arriving_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension (inferred members): facts reference
    customer keys the dimension does not have yet (every 10th key is
    withheld to simulate late dim data). The warehouse discipline, run
    END TO END: (1) the anti-join discovers orphan keys and INSERTS
    placeholder members flagged inferred — facts are never dropped or
    stalled; (2) facts join the augmented dimension losslessly; (3) the
    late dim rows arrive and a MERGE overwrites exactly the inferred
    placeholders with real attributes. The output is the post-
    reconciliation revenue by segment — value-identical to a join
    against the complete dimension (the oracle's formulation) — plus a
    ledger row counting the placeholders that were reconciled. Scale:
    the orphan-key set is the anti-join's output (small by definition);
    placeholders broadcast back into the MERGE."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    dim0 = cust.filter(F.col("c_custkey") % 10 != 7).withColumn(
        "inferred", F.lit(False)
    )
    missing = (
        orders.select("o_custkey")
        .distinct()
        .join(dim0, orders.o_custkey == dim0.c_custkey, "left_anti")
    )
    inferred = missing.select(
        F.col("o_custkey").alias("c_custkey"),
        F.lit("__UNKNOWN__").alias("c_mktsegment"),
        F.lit(True).alias("inferred"),
    )
    dim1 = dim0.unionByName(inferred)
    n_inferred = inferred.count()
    # the late data arrives: MERGE — real attributes overwrite exactly
    # the inferred placeholders, everything else is untouched
    # reconciliation is keyed on the late ROW arriving, not on its
    # attribute being non-null: a late row carrying a NULL attribute
    # still reconciles (to NULL) — r16 null contract, mirrored by the
    # oracle's complete-dimension join
    late = cust.withColumnRenamed("c_mktsegment", "late_seg").withColumn(
        "__late_has", F.lit(True)
    )
    dim2 = (
        dim1.join(
            F.broadcast(late.select("c_custkey", "late_seg", "__late_has")),
            "c_custkey",
            "left",
        )
        .select(
            "c_custkey",
            F.when(F.col("inferred") & F.col("__late_has").isNotNull(), F.col("late_seg"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            (F.col("inferred") & F.col("__late_has").isNull()).alias("inferred"),
        )
    )
    seg = (
        orders.join(dim2, orders.o_custkey == dim2.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )
    ledger = seg.sparkSession.createDataFrame(
        [("__reconciled_inferred", n_inferred, 0.0)],
        "segment string, n_orders long, revenue double",
    )
    return seg.unionByName(ledger).orderBy("segment")


@register(
    "a4_pivot",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS st_o,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS st_f,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS st_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def a4_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order counts per priority × status. Explicit
    value list → no extra distinct-values job, fixed output schema."""
    out = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0)
    )
    return out.select(
        "o_orderpriority",
        F.col("O").alias("st_o"),
        F.col("F").alias("st_f"),
        F.col("P").alias("st_p"),
    )


@register(
    "a4_unpivot",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, round(l_quantity, 2) AS val
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', round(l_discount, 2) FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', round(l_tax, 2) FROM lineitem WHERE l_orderkey < 100
    """,
)
def a4_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long, melt) via the native unpivot operator."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    out = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    name_map = {"l_quantity": "quantity", "l_discount": "discount", "l_tax": "tax"}
    mapped = out.replace(name_map, subset=["metric"])
    return mapped.select(
        "l_orderkey", "l_linenumber", "metric", F.round("val", 2).alias("val")
    )


@register(
    "sub_scalar",
    """
    SELECT o_orderkey,
           round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6) AS price_ratio
    FROM orders WHERE o_totalprice > 400000
    """,
)
def sub_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (Catalyst turns it into a broadcast one-row join)."""
    import uuid

    view = f"__sq_orders_{uuid.uuid4().hex[:8]}"
    table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o_orderkey,
               round(o_totalprice / (SELECT avg(o_totalprice) FROM {view}), 6) AS price_ratio
        FROM {view} WHERE o_totalprice > 400000
        """
    )


@register(
    "sub_in",
    """
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    """,
)
def sub_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (planned as a left-semi join)."""
    import uuid

    sfx = uuid.uuid4().hex[:8]
    table(spark, sf_dir, "orders").createOrReplaceTempView(f"__sq2_orders_{sfx}")
    table(spark, sf_dir, "customer").createOrReplaceTempView(f"__sq2_customer_{sfx}")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey FROM __sq2_orders_{sfx}
        WHERE o_custkey IN (SELECT c_custkey FROM __sq2_customer_{sfx} WHERE c_acctbal > 9000)
        """
    )


@register(
    "a4_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 4) AS q25,
           round(quantile_cont(l_quantity, 0.5), 4) AS median,
           round(quantile_cont(l_quantity, 0.75), 4) AS q75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a4_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines: linear interpolation;
    the 100 TB variant is approx_percentile — same plan, sketch agg)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q25"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 4).alias("q75"),
    )


@register(
    "text_edit_distance",
    """
    WITH a AS (
      SELECT doc_id,
             regexp_replace(source, '[^\\x20-\\x7E]', '', 'g') AS src_a,
             regexp_replace(lang,   '[^\\x20-\\x7E]', '', 'g') AS lang_a,
             regexp_replace(text,   '[^\\x20-\\x7E]', '', 'g') AS text_a
      FROM documents)
    SELECT doc_id, levenshtein(substring(src_a, 1, 8), substring(lang_a, 1, 8)) AS src_lang_dist,
           levenshtein(lower(substring(text_a, 1, 12)), 'lorem ipsum!') AS lorem_dist
    FROM a
    """,
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance (fuzzy matching surface for text dedup).

    Printable-ASCII-projection contract (r17): distances are computed
    over the printable-ASCII projection of the text — codepoints
    outside [0x20, 0x7E] are stripped on BOTH engines before slicing
    and comparing. On that projection bytes == codepoints == graphemes,
    so Spark's codepoint-level levenshtein and DuckDB's byte-level one
    agree exactly (the extreme axis's multibyte payloads made them
    count different units; previously allowlisted). Java regex sees an
    astral codepoint as two surrogate units and RE2 as one codepoint,
    but both STRIP the whole character, so the projection itself is
    engine-identical."""
    d = table(spark, sf_dir, "documents")
    ascii_only = lambda c: F.regexp_replace(c, r"[^\x20-\x7E]", "")
    return d.select(
        "doc_id",
        F.levenshtein(
            F.substring(ascii_only(F.col("source")), 1, 8),
            F.substring(ascii_only(F.col("lang")), 1, 8),
        ).alias("src_lang_dist"),
        F.levenshtein(
            F.lower(F.substring(ascii_only(F.col("text")), 1, 12)),
            F.lit("lorem ipsum!"),
        ).alias("lorem_dist"),
    )


@register(
    "w5_range_frame",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT
                                  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 2) AS rolling_10m,
           first_value(event_id) OVER w AS first_ev,
           last_value(event_id) OVER w AS last_ev,
           coalesce(nth_value(event_id, 2) OVER w, -1) AS second_ev
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def w5_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed on event-time seconds (true time-windowed running
    sum — rows at the same second aggregate together) + first/last/nth
    positional window functions. A RANGE frame is event-time arithmetic,
    so null ts is excluded on both sides (r16 contract)."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .withColumn("__sec", F.unix_timestamp("ts"))
    )
    w_range = (
        Window.partitionBy("user_id").orderBy("__sec").rangeBetween(-600, 0)
    )
    w_rows = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w_range), 2).alias("rolling_10m"),
        F.first("event_id").over(w_rows).alias("first_ev"),
        F.last("event_id").over(w_rows).alias("last_ev"),
        F.coalesce(F.nth_value("event_id", 2).over(w_rows), F.lit(-1)).alias(
            "second_ev"
        ),
    )


# ======================================================================
# EXT — multi-join analytics (join-reordering surface), pandas_udf path,
# map columns
# ======================================================================


@register(
    "tpch_q3_shape",
    f"""
    SELECT l.l_orderkey,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           floor(epoch(o.o_orderdate))::BIGINT AS orderdate_epoch,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join with selective filters on every side,
    grouped revenue, top-10. Catalyst pushes all three predicates into
    the scans and broadcasts the filtered customer side."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer scales linearly with SF — no hint; Catalyst's size
        # stats broadcast it while it fits and fall back above that
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("orderdate_epoch"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_shape",
    f"""
    SELECT n.n_name,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join (region→nation→customer→orders→
    lineitem). Three dimension broadcasts chain into the fact scan; the
    only shuffle is the final group-by."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # linear-in-SF: stats decide
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


@register("f17_cosine_pandas", _COSINE_ALL_SQL)
def f17_cosine_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME cosine scan as f17_cosine_all, but through an Arrow-
    vectorized pandas_udf (numpy batch kernel) instead of higher-order
    column functions — the documented slow-path escape hatch, checked
    against the identical oracle to prove the two paths agree."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos_batch(a, b):
        # `from __future__ import annotations` stringifies type hints,
        # which pandas_udf can't resolve → use the explicit-returnType form
        out = []
        for x, y in zip(a, b):
            if x is None or y is None:  # NULL vector → NULL cosine
                out.append(None)
                continue
            xv = np.asarray(x, dtype=np.float64)
            yv = np.asarray(y, dtype=np.float64)
            out.append(
                float(np.dot(xv, yv) / (np.sqrt(np.dot(xv, xv)) * np.sqrt(np.dot(yv, yv))))
            )
        # nullable Float64: a plain float64 Series renders None as NaN,
        # which Arrow keeps as NaN instead of SQL NULL
        return pd.Series(out, dtype="Float64")

    cos_pd = pandas_udf(_cos_batch, "double")

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    return emb.crossJoin(F.broadcast(q)).select(
        "vec_id", F.round(cos_pd(F.col("embedding"), F.col("qe")), 6).alias("cos")
    )


@register(
    "f15_map_ops",
    """
    SELECT doc_id,
           map_extract(m, 'lang')[1] AS lang_v,
           len(map_keys(m)) AS n_keys
    FROM (SELECT doc_id, MAP {'lang': lang, 'source': source} AS m FROM documents)
    """,
)
def f15_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (§1.4: properties pass-through as maps): build,
    access by key, enumerate keys."""
    docs = table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return docs.select(
        "doc_id",
        m.getItem("lang").alias("lang_v"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


# ======================================================================
# GEO at volume — the classifier over 20k generated points (bench-scale
# spatial join, still fully oracle-checked)
# ======================================================================

_BULK_N = 20000
_BULK_PTS_SQL = f"""
SELECT i AS img_id,
       ((i * 73) % 997) / 997.0 * 16.0 - 2.0 AS lon,
       ((i * 131) % 983) / 983.0 * 14.0 - 2.0 AS lat
FROM generate_series(0, {_BULK_N - 1}) AS g(i)
"""

_GEO_BULK_SQL = f"""
WITH pts AS ({_BULK_PTS_SQL}),
e AS (SELECT * FROM {GF.edges_values_sql()}),
v AS (SELECT * FROM {GF.vertices_values_sql()}),
cr AS (
  SELECT p.img_id, e.id_predio, e.nombre,
         {GF.crossings_sql()} AS crossings
  FROM pts p CROSS JOIN e
  GROUP BY p.img_id, e.id_predio, e.nombre),
vd AS (
  SELECT p.img_id, v.id_predio, v.nombre,
         min((p.lon - v.x) * (p.lon - v.x) + (p.lat - v.y) * (p.lat - v.y)) AS d2
  FROM pts p CROSS JOIN v
  GROUP BY p.img_id, v.id_predio, v.nombre),
scored AS (
  SELECT cr.img_id, cr.id_predio, cr.nombre,
         CASE WHEN cr.crossings % 2 = 1 THEN 0 ELSE 1 END AS r,
         CASE WHEN cr.crossings % 2 = 1 THEN 0.0 ELSE vd.d2 END AS d
  FROM cr JOIN vd ON cr.img_id = vd.img_id
       AND cr.id_predio = vd.id_predio AND cr.nombre = vd.nombre),
win AS (
  SELECT img_id, id_predio, nombre, r,
         row_number() OVER (PARTITION BY img_id ORDER BY r, d, id_predio, nombre) AS rn
  FROM scored)
SELECT img_id, id_predio, nombre,
       CASE WHEN r = 0 THEN 'contains' ELSE 'nearest' END AS method
FROM win WHERE rn = 1
"""


@register("geo_classify_bulk", _GEO_BULK_SQL)
def geo_classify_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The single-pass classifier over 20k generated points — the spatial
    join at bench volume (20k × 5 parcels scored in one broadcast pass),
    still value-checked against the oracle.

    The oracle is the same even-odd ray-cast as the engine (identical
    float expression, see geo_fixture.crossings_sql), so holes, the
    MultiPolygon, and concave rings all agree; the generated rational-grid
    points never land exactly on an edge.
    """
    pts = spark.range(_BULK_N).select(
        F.col("id").alias("img_id"),
        (((F.col("id") * 73) % 997) / 997.0 * 16.0 - 2.0).alias("lon"),
        (((F.col("id") * 131) % 983) / 983.0 * 14.0 - 2.0).alias("lat"),
    )
    return classify_points(pts, GF.spark_polys(spark)).select(
        "img_id", "id_predio", "nombre", "method"
    )


# ======================================================================
# S6 — JSON feature scan (script_geo.py:193-194)
# ======================================================================

_S6_SQL = f"""
SELECT pp.id_predio, pp.nombre, pp.codigo, pp.seccion, pp.rodal, pp.tipouso, pp.apl,
       (SELECT count(*) FROM {GF.vertices_values_sql()}
        WHERE v.id_predio = pp.id_predio) AS n_vertices
FROM {GF.polys_props_values_sql()}
"""


@register("s6_features_json", _S6_SQL)
def s6_features_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: per-parcel polygon JSON files → explicit-schema json scan
    (no inference pass) → properties + ring cardinality. The fixture
    polygons round-trip through real JSON files on disk."""
    import json

    from ..sources.files import read_features_json

    d = tempfile.mkdtemp(prefix="features_json_")
    for p in GF.POLYS:
        rec = {k: v for k, v in p.items() if k != "rings"}
        rec["rings"] = [
            [{"x": x, "y": y} for x, y in ring] for ring in p["rings"]
        ]
        with open(os.path.join(d, f"{p['id_predio']}.json"), "w") as f:
            f.write(json.dumps(rec))
    feats = read_features_json(spark, d)
    return feats.select(
        "id_predio",
        "nombre",
        "codigo",
        "seccion",
        "rodal",
        "tipouso",
        "apl",
        F.size(F.flatten("rings")).alias("n_vertices"),
    )


# ======================================================================
# F — scalar surface pack 2: date arithmetic, strings, arrays, conditionals
# ======================================================================


@register(
    "f_date_arith",
    """
    SELECT o_orderkey,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
           floor(epoch(CAST(o_orderdate AS DATE) + INTERVAL '3 months'))::BIGINT AS plus3m_epoch,
           floor(epoch(date_trunc('month', o_orderdate)))::BIGINT AS month_start_epoch,
           dayofweek(o_orderdate) AS dow
    FROM orders WHERE o_orderkey < 200
    """,
)
def f_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: datediff, add_months, date_trunc, day-of-week.
    (DuckDB dayofweek is 0=Sunday; Spark dayofweek is 1=Sunday → align.)

    Date-projection contract (r17): month arithmetic operates on the
    DATE projection of the input — Spark's add_months drops any
    time-of-day by definition, so the oracle casts to DATE before
    adding the interval (DuckDB's TIMESTAMP + INTERVAL would carry a
    non-midnight time component into the epoch; found by the extreme
    axis's 03:04:05 outlier instants, previously allowlisted)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
        F.unix_timestamp(F.add_months("o_orderdate", 3).cast("timestamp")).alias(
            "plus3m_epoch"
        ),
        F.unix_timestamp(F.date_trunc("month", "o_orderdate")).alias("month_start_epoch"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
    )


@register(
    "f_string_pack2",
    """
    SELECT doc_id,
           upper(substring(source, 1, 4)) AS up4,
           lpad(lang, 5, '*') AS padded,
           reverse(lang) AS rev,
           repeat(lang, 2) AS doubled,
           replace(source, 'src', 'S-') AS translated,
           strpos(text, 'a') AS first_a
    FROM documents
    """,
)
def f_string_pack2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface pack 2: case, pad, reverse, repeat, replace, locate."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("source", 1, 4)).alias("up4"),
        F.lpad("lang", 5, "*").alias("padded"),
        F.reverse("lang").alias("rev"),
        F.repeat("lang", 2).alias("doubled"),
        F.replace(F.col("source"), F.lit("src"), F.lit("S-")).alias("translated"),
        F.locate("a", F.col("text")).alias("first_a"),
    )


@register(
    "f_array_pack2",
    """
    SELECT vec_id,
           round(list_sort(list_transform(embedding[1:6], x -> round(x::DOUBLE, 4)))[1], 4) AS min_of_first6,
           len(list_distinct(list_transform(embedding[1:8], x -> round(x::DOUBLE, 1)))) AS distinct_rounded,
           list_position(list_transform(embedding[1:6], x -> round(x::DOUBLE, 4)),
                         round(embedding[3]::DOUBLE, 4)) AS pos_of_third,
           CASE WHEN embedding IS NULL THEN NULL
                ELSE len(flatten([embedding[1:3], embedding[4:6]])) END AS flat_len
    FROM embeddings
    """,
)
def f_array_pack2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface pack 2: sort, distinct, position, flatten."""
    e = table(spark, sf_dir, "embeddings")
    first6 = F.transform(F.slice("embedding", 1, 6), lambda x: F.round(x.cast("double"), 4))
    return e.select(
        "vec_id",
        F.round(F.element_at(F.array_sort(first6), 1), 4).alias("min_of_first6"),
        F.size(
            F.array_distinct(
                F.transform(F.slice("embedding", 1, 8), lambda x: F.round(x.cast("double"), 1))
            )
        ).alias("distinct_rounded"),
        F.array_position(first6, F.round(F.element_at("embedding", 3).cast("double"), 4)).alias(
            "pos_of_third"
        ),
        F.size(F.flatten(F.array(F.slice("embedding", 1, 3), F.slice("embedding", 4, 3)))).alias(
            "flat_len"
        ),
    )


@register(
    "f_conditionals",
    """
    SELECT event_id,
           nullif(event_type, 'error') AS non_error,
           coalesce(nullif(event_type, 'error'), 'ERR!') AS labeled,
           greatest(value, 50.0) AS at_least_50,
           least(value, 50.0) AS at_most_50,
           CASE WHEN value IS NULL THEN 'null' ELSE 'set' END AS nvl2ish
    FROM events
    """,
)
def f_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar surface: nullif, coalesce chains, greatest/least."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("error")).alias("non_error"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("ERR!")).alias(
            "labeled"
        ),
        F.greatest("value", F.lit(50.0)).alias("at_least_50"),
        F.least("value", F.lit(50.0)).alias("at_most_50"),
        F.when(F.col("value").isNull(), "null").otherwise("set").alias("nvl2ish"),
    )


@register(
    "w6_distribution_funcs",
    """
    SELECT c_custkey, c_nationkey,
           floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pr,
           floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal NULLS FIRST, c_custkey NULLS FIRST)
    """,
)
def w6_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank, cume_dist. Explicit
    half-up rounding on both sides — (rank-1)/(n-1) lands on exact
    decimal halves (e.g. 41/640 = .0640625), where Spark's HALF_UP
    round() and DuckDB's half-even diverge."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    half_up = lambda col: F.floor(col * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return c.select(
        "c_custkey",
        "c_nationkey",
        half_up(F.percent_rank().over(w)).alias("pr"),
        half_up(F.cume_dist().over(w)).alias("cd"),
    )


@register(
    "j1_correlated_exists",
    """
    SELECT c.c_custkey, c.c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > c.c_acctbal * 50)
    """,
)
def j1_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a cross-table predicate (decorrelated by
    Catalyst into a left-semi join with a non-equi condition)."""
    import uuid

    sfx = uuid.uuid4().hex[:8]
    table(spark, sf_dir, "customer").createOrReplaceTempView(f"__ce_c_{sfx}")
    table(spark, sf_dir, "orders").createOrReplaceTempView(f"__ce_o_{sfx}")
    return spark.sql(
        f"""
        SELECT c.c_custkey, c.c_acctbal FROM __ce_c_{sfx} c
        WHERE EXISTS (SELECT 1 FROM __ce_o_{sfx} o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > c.c_acctbal * 50)
        """
    )


@register(
    "f15_lateral_explode",
    """
    SELECT vec_id, pos, round(val, 4) AS val FROM (
      SELECT vec_id, unnest(list_transform(embedding[1:4], x -> round(x::DOUBLE, 4))) AS val,
             generate_subscripts(embedding[1:4], 1) AS pos
      FROM embeddings WHERE vec_id < 20)
    """,
)
def f15_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW posexplode via SQL — the generator/UDTF surface."""
    import uuid

    view = f"__lv_emb_{uuid.uuid4().hex[:8]}"
    table(spark, sf_dir, "embeddings").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT vec_id, pos + 1 AS pos, round(val, 4) AS val
        FROM {view}
        LATERAL VIEW posexplode(slice(transform(embedding, x -> round(cast(x AS double), 4)), 1, 4)) t AS pos, val
        WHERE vec_id < 20
        """
    )


# ======================================================================
# S2 — archive extraction end-to-end (zip + tar.gz + skipped channel)
# ======================================================================

_ARCHIVE_SQL = """
SELECT 'zip' AS kind, doc_id, strlen(text)::BIGINT AS size
FROM documents WHERE doc_id % 10 = 0 AND text IS NOT NULL
UNION ALL
SELECT 'tar' AS kind, doc_id, strlen(text)::BIGINT AS size
FROM documents WHERE doc_id % 10 = 1 AND text IS NOT NULL
UNION ALL
SELECT 'skipped' AS kind, NULL::BIGINT AS doc_id, NULL::BIGINT AS size
"""


@register("s2_archive_extract", _ARCHIVE_SQL)
def s2_archive_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 end-to-end (download_list_images.py:27-30 parity): a landing
    bucket holding a zip (docs with doc_id%10=0), a tar.gz (%10=1), and a
    garbage blob → binaryFile scan → extract_archives mapInPandas →
    one row per member + ONE skipped_reason row for the garbage. The
    archive fixture is built driver-side (it IS the landing bucket, not
    the engine path); member sizes equal the docs' utf-8 byte lengths,
    which the oracle reproduces via strlen."""
    import io
    import tarfile
    import zipfile

    from ..sources.binary import extract_archives, read_binary_dir

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    sub = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id") % 10 < 2).collect()
        if r["text"] is not None  # null payloads never reach the bucket
    }
    d = tempfile.mkdtemp(prefix="s2_archives_")
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        for i in sorted(k for k in sub if k % 10 == 0):
            zf.writestr(f"doc_{i}.txt", sub[i].encode("utf-8"))
    with open(os.path.join(d, "batch.zip"), "wb") as f:
        f.write(zbuf.getvalue())
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
        for i in sorted(k for k in sub if k % 10 == 1):
            data = sub[i].encode("utf-8")
            info = tarfile.TarInfo(f"doc_{i}.txt")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    with open(os.path.join(d, "batch.tar.gz"), "wb") as f:
        f.write(tbuf.getvalue())
    with open(os.path.join(d, "corrupt.rar"), "wb") as f:
        f.write(b"Rar!\x1a\x07\x00 not really")

    out = extract_archives(read_binary_dir(spark, d))
    return out.select(
        F.when(F.col("skipped_reason").isNotNull(), "skipped")
        .when(F.col("archive").endswith(".zip"), "zip")
        .otherwise("tar")
        .alias("kind"),
        F.regexp_extract("member", r"doc_(\d+)\.txt", 1).cast("long").alias("doc_id"),
        F.col("size"),
    )


_SEVENZIP_SQL = """
SELECT 'member' AS kind, doc_id, strlen(text)::BIGINT AS size
FROM documents WHERE doc_id % 10 = 2 AND text IS NOT NULL
UNION ALL
SELECT 'skipped' AS kind, NULL::BIGINT AS doc_id, NULL::BIGINT AS size
"""


@register("s2_7z_extract", _SEVENZIP_SQL)
def s2_7z_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2, 7z tier (download_list_images.py:27-30 parity — patoolib's
    external-tool coverage of .7z, re-done in-engine): a landing bucket
    holding a SOLID LZMA2 .7z (docs with doc_id%10=2 concatenated into
    one compressed stream, split back by the substream-size table —
    sources/sevenzip.py, pure stdlib) and a truncated 7z whose
    start-header CRC cannot verify → binaryFile scan →
    extract_archives mapInPandas → one row per member + ONE
    skipped_reason row. Member sizes equal the docs' utf-8 byte
    lengths, which the oracle reproduces via strlen."""
    from ..sources.binary import extract_archives, read_binary_dir
    from ..sources.sevenzip import write_7z

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    sub = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id") % 10 == 2).collect()
        if r["text"] is not None  # null payloads never reach the bucket
    }
    d = tempfile.mkdtemp(prefix="s2_sevenzip_")
    members = [
        (f"doc_{i}.txt", sub[i].encode("utf-8")) for i in sorted(sub)
    ]
    arc = write_7z(members, codec="lzma2")
    with open(os.path.join(d, "batch.7z"), "wb") as f:
        f.write(arc)
    with open(os.path.join(d, "torn.7z"), "wb") as f:
        f.write(arc[:20])  # truncated mid start-header
    out = extract_archives(read_binary_dir(spark, d))
    return out.select(
        F.when(F.col("skipped_reason").isNotNull(), "skipped")
        .otherwise("member")
        .alias("kind"),
        F.regexp_extract("member", r"doc_(\d+)\.txt", 1).cast("long").alias("doc_id"),
        F.col("size"),
    )


# ======================================================================
# F16 — the training-corpus quality pre-filter pipeline
# ======================================================================


@register(
    "text_quality_filter",
    f"""
    SELECT doc_id, {TX.quality_score_sql('text')} AS score,
           {TX.lang_guess_sql('text')} AS lang_guess
    FROM documents
    WHERE {TX.quality_score_sql('text')} >= 0.5
      AND {TX.lang_guess_sql('text')} <> 'unknown'
    """,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical LLM-corpus pre-filter: quality score + language ID,
    keep docs above threshold with a confident language — pure column
    expressions, no shuffle, trivially parallel at 100 TB."""
    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        TX.quality_score(F.col("text")).alias("score"),
        TX.lang_guess(F.col("text")).alias("lang_guess"),
    )
    return scored.filter((F.col("score") >= 0.5) & (F.col("lang_guess") != "unknown"))


# ======================================================================
# F16 — winnowing fingerprints (rolling-hash document sketch)
# ======================================================================

_WINNOW_K, _WINNOW_W = 3, 4

_WINNOW_SQL = f"""
WITH hs AS (
  SELECT doc_id,
         [{H.hash64_sql('sh', 0)} FOR sh IN {H.shingles_sql('text', _WINNOW_K)}] AS hs
  FROM documents)
SELECT doc_id, fp FROM (
  SELECT doc_id,
         unnest(list_distinct([list_min(list_slice(hs, i, i + {_WINNOW_W - 1}))
                               FOR i IN generate_series(1, len(hs) - {_WINNOW_W} + 1)])) AS fp
  FROM hs WHERE len(hs) >= {_WINNOW_W})
"""


@register("text_winnowing_fp", _WINNOW_SQL)
def text_winnowing_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al. MOSS): min shingle-hash
    per sliding window of {w}, deduped — the rolling-hash document sketch
    guaranteeing a shared fingerprint for any match ≥ w+k-1 tokens.

    Plan shape: the raw docs rebalance through one small exchange (text
    payload, only when the scan under-parallelizes), so the
    tokenize→shingle→hash kernel runs at full parallelism; the hash
    array stays a single-reference projection (CollapseProject keeps the
    boundary for non-trivial multi-referenced aliases, so the window
    mins do NOT re-evaluate the subtree per position); the window sweep
    is O(T·w) array arithmetic, JVM-side, shuffle-free.
    """
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    hs = docs.select(
        "doc_id",
        F.transform(
            H.shingles(F.col("text"), _WINNOW_K),
            lambda sh: H.hash64(sh, seed=0),
        ).alias("__hs"),
    )
    w = _WINNOW_W
    return hs.filter(F.size("__hs") >= w).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("__hs") - w + 1),
                    lambda i: F.array_min(F.slice(F.col("__hs"), i, w)),
                )
            )
        ).alias("fp"),
    )


# ======================================================================
# §2.9 EXT — custom stateful streaming operator (applyInPandasWithState)
# ======================================================================


@register(
    "streaming_stateful_totals",
    """
    SELECT event_type, count(*) AS n, true AS matches_batch
    FROM events GROUP BY event_type
    """,
)
def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-state streaming: per-event-type running totals held in
    GroupState (streaming.stateful.running_totals). One availableNow
    micro-batch over the events file → one updated row per key. The
    exact per-key COUNT is oracle-checked directly, and the custom-state
    SUM is asserted in-engine against the batch groupBy twin (same
    input, tolerance 1e-3 for float accumulation order) and exported as
    the `matches_batch` boolean the oracle expects to be uniformly true
    — the exactly-once accumulation claim is thereby externally checked,
    not just pytest-verified (test_streaming.py covers multi-batch)."""
    import uuid

    from ..streaming.stateful import running_totals

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream_dir = tempfile.mkdtemp(prefix="events_stateful_")
    os.symlink(src, os.path.join(stream_dir, "events.parquet"))
    stream = spark.readStream.format("parquet").schema(raw_schema).load(stream_dir)
    totals = running_totals(stream.select("event_type", "value"))
    name = f"stateful_totals_{uuid.uuid4().hex[:8]}"
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batch = (
        spark.read.parquet(src)
        .groupBy("event_type")
        .agg(F.count("*").alias("b_n"), F.sum("value").alias("b_sum"))
    )
    # null-SAFE join key (r16): a null event_type is a legitimate group
    # in BOTH the state op and the batch twin; a plain equi-join would
    # split it into two unmatched rows (null never equals null).
    state = spark.table(name)
    return (
        state.join(
            F.broadcast(batch),
            state["event_type"].eqNullSafe(batch["event_type"]),
            "full_outer",
        )
        .select(
            F.coalesce(state["event_type"], batch["event_type"]).alias("event_type"),
            F.col("n"),
            (
                (F.col("n") == F.col("b_n"))
                & (F.abs(F.col("sum_value") - F.col("b_sum")) < 1e-3)
            ).alias("matches_batch"),
        )
    )


# ======================================================================
# EXT — bucketed co-located join (the 100 TB shuffle-elimination path)
# ======================================================================

_BUCKETED_LAYOUTS: dict[str, str] = {}


@register(
    "j_bucketed_join",
    f"""
    SELECT o.o_orderpriority, count(*) AS n,
           {_dsum_sql('l.l_extendedprice')} AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def j_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big join WITHOUT a join-side shuffle: both fact tables written
    ``bucketBy(8, orderkey).sortBy(orderkey)``, then SortMergeJoined on
    the bucket column — bucket-aligned scans feed the join directly (the
    formatted plan shows SelectedBucketsCount and no Exchange before the
    join; only the final groupBy shuffles). At 100 TB this is THE
    standing join layout: pay the bucketed write once, every subsequent
    orderkey join is exchange-free. The merge hint pins SMJ so the demo
    doesn't degrade to broadcast at toy scale.
    """
    # The bucketed layout is a STANDING table: write once per corpus
    # snapshot, reuse for every subsequent join (that's the whole point
    # of bucketing). Memoize per sf_dir within the session.
    sfx = _BUCKETED_LAYOUTS.get(sf_dir)
    if sfx is None or not spark.catalog.tableExists(f"__bkt_orders_{sfx}"):
        import uuid

        sfx = uuid.uuid4().hex[:8]
        base = tempfile.mkdtemp(prefix="bucketed_")
        for name, src_cols in (
            ("orders", ["o_orderkey", "o_orderpriority"]),
            ("lineitem", ["l_orderkey", "l_extendedprice"]),
        ):
            key = src_cols[0]
            (
                table(spark, sf_dir, name)
                .select(*src_cols)
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", os.path.join(base, name))
                .saveAsTable(f"__bkt_{name}_{sfx}")
            )
        _BUCKETED_LAYOUTS[sf_dir] = sfx
    o = spark.table(f"__bkt_orders_{sfx}")
    li = spark.table(f"__bkt_lineitem_{sfx}")
    joined = o.hint("merge").join(li, li.l_orderkey == o.o_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), _dsum(F.col("l_extendedprice")).alias("revenue")
    )


# ======================================================================
# EXT — forward-fill (gap-fill) window: last_value IGNORE NULLS
# ======================================================================


@register(
    "w7_gap_fill",
    """
    SELECT event_id, user_id,
           floor(epoch(ts))::BIGINT AS ts_epoch,
           round(last_value(CASE WHEN event_type = 'click' THEN NULL ELSE value END
                            IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS filled_value
    FROM events WHERE user_id < 50
    """,
)
def w7_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill over event gaps: clicks carry no value (masked null),
    each row takes the most recent non-null value in its user timeline —
    ``last(col, ignorenulls=True)`` over an unbounded-preceding row
    frame. The sensor/telemetry gap-fill shape; one hash exchange on
    user_id."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    masked = F.when(F.col("event_type") == "click", F.lit(None)).otherwise(
        F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.round(F.last(masked, ignorenulls=True).over(w), 4).alias("filled_value"),
    )


# ======================================================================
# S15/M2 — snapshot time-travel diff (the MERGE made driver-checkable)
# ======================================================================

_SNAPSHOT_DIFF_SQL = """
WITH rows0 AS (
  SELECT 'C' || (doc_id % 10)::VARCHAR AS codigo,
         concat_ws('_', 'C' || (doc_id % 10)::VARCHAR, lang, 'X', 'A') AS indice,
         'lake/BR/C' || (doc_id % 10)::VARCHAR || '/' || doc_id::VARCHAR || '.jpg' AS ruta_resultado,
         CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 3 END AS tipo0
  FROM documents),
ids AS (
  SELECT *, row_number() OVER (ORDER BY indice, ruta_resultado) AS id FROM rows0)
SELECT id, tipo0 AS tipo_old, 10 AS tipo_new FROM ids WHERE id % 7 = 0
"""


@register("catalog_snapshot_diff", _SNAPSHOT_DIFF_SQL)
def catalog_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15 end-to-end through the versioned store: insert a snapshot,
    MERGE-update every 7th id (copy-on-write → new snapshot + pointer
    flip), then DIFF the two time-travel reads — an anti-equi join on
    (id, id_tipo_img) between ``catalog(version=0)`` and
    ``catalog(version=1)`` reporting exactly the changed rows. The
    oracle reproduces the deterministic id allocation and the %7 update
    set in closed form."""
    from ..catalog.store import CatalogStore

    docigo = F.concat(F.lit("C"), (F.col("doc_id") % 10).cast("string"))
    rows = table(spark, sf_dir, "documents").select(
        F.concat_ws("_", docigo, F.col("lang"), F.lit("X"), F.lit("A")).alias("indice"),
        docigo.alias("codigo"),
        F.lit("P").alias("nombre_predio"),
        F.lit("S").alias("seccion"),
        F.lit("E").alias("especie"),
        F.lit("A").alias("apl"),
        F.when(F.col("doc_id") % 2 == 0, 0).otherwise(3).cast("int").alias("id_tipo_img"),
        F.lit(0).cast("int").alias("id_proceso"),
        F.concat(
            F.lit("lake/BR/"), docigo, F.lit("/"), F.col("doc_id").cast("string"), F.lit(".jpg")
        ).alias("ruta_resultado"),
        F.current_timestamp().alias("fecha"),
    )
    store = CatalogStore(spark, tempfile.mkdtemp(prefix="catalog_diff_"))
    run_id = store.start_run(0)
    inserted = store.insert_catalog(rows, run_id)
    update_ids = [
        r["id"] for r in inserted.filter(F.col("id") % 7 == 0).select("id").collect()
    ]
    store.update_processed_img(10, update_ids)
    v0 = store.catalog(version=0).select("id", F.col("id_tipo_img").alias("tipo_old"))
    v1 = store.catalog(version=1).select("id", F.col("id_tipo_img").alias("tipo_new"))
    return v0.join(v1, "id").filter(F.col("tipo_old") != F.col("tipo_new"))


@register(
    "catalog_wap_publish",
    """
    -- the oracle DERIVES each batch's audit verdict from the data
    -- (key non-null + uniqueness + non-empty), mirroring the engine's
    -- staged audit — on dirty feeds the clean batch can legitimately
    -- fail and quarantine (r16)
    SELECT 'clean' AS batch, n_rows, audit_passed,
           audit_passed AS published FROM (
      SELECT count(*) AS n_rows,
             (count(*) > 0
              AND count(*) FILTER (WHERE o_orderkey IS NULL) = 0
              AND count(DISTINCT o_orderkey) = count(*)) AS audit_passed
      FROM orders WHERE o_orderstatus = 'F')
    UNION ALL
    SELECT 'dirty',
           (SELECT count(*) * 2 FROM orders WHERE o_custkey < 5),
           false, false
    ORDER BY batch
    """,
)
def catalog_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish — the lakehouse publish discipline: every
    batch lands in STAGING, a data-quality audit runs against the
    staged files (key non-null + key uniqueness here; dq_constraints is
    the general gate), and only a passing batch is atomically promoted
    to the published location — a failing batch is quarantined, and the
    published table never serves a row that skipped its audit. Two
    batches exercise both paths: the clean 'F'-status slice publishes;
    a deliberately doubled slice (duplicate keys) fails the uniqueness
    audit and lands in quarantine. The final output re-derives each
    batch's verdict FROM THE DIRECTORIES (published vs quarantine
    re-read), not from in-memory state — the audit trail a catalog
    would record. Promotion is a directory rename: same atomic-pointer
    posture as the catalog store's snapshot flip."""
    base = tempfile.mkdtemp(prefix="wap_")
    orders = table(spark, sf_dir, "orders")
    batches = {
        "clean": orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        "dirty": orders.filter(F.col("o_custkey") < 5)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .unionAll(
            orders.filter(F.col("o_custkey") < 5).select(
                "o_orderkey", "o_custkey", "o_totalprice"
            )
        ),
    }
    for name, df in batches.items():
        staging = os.path.join(base, "staging", name)
        df.write.parquet(staging)
        staged = spark.read.parquet(staging)
        n = staged.count()
        n_keys = staged.select("o_orderkey").distinct().count()
        n_null = staged.filter(F.col("o_orderkey").isNull()).count()
        audit_ok = n > 0 and n_null == 0 and n_keys == n
        dest = "published" if audit_ok else "quarantine"
        os.makedirs(os.path.join(base, dest), exist_ok=True)
        os.rename(staging, os.path.join(base, dest, name))

    def _dir_rows(kind: str):
        root = os.path.join(base, kind)
        out = []
        for name in sorted(os.listdir(root)) if os.path.isdir(root) else []:
            n = spark.read.parquet(os.path.join(root, name)).count()
            out.append((name, n, kind == "published"))
        return out

    rows = [
        (name, n, True if published else False, published)
        for name, n, published in _dir_rows("published")
    ] + [
        (name, n, False, False) for name, n, _ in _dir_rows("quarantine")
    ]
    return spark.createDataFrame(
        rows, "batch string, n_rows long, audit_passed boolean, published boolean"
    ).orderBy("batch")


# ======================================================================
# F16 — corpus-wide n-gram statistics (the classic big-data shuffle)
# ======================================================================


@register(
    "text_top_bigrams",
    f"""
    SELECT bigram, n FROM (
      SELECT bigram, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, bigram) AS rn
      FROM (SELECT unnest({H.shingles_sql('text', 2)}) AS bigram FROM documents)
      GROUP BY bigram)
    WHERE rn <= 20
    """,
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams: explode → map-side-combined count →
    TakeOrdered top-k (deterministic tiebreak on the bigram). The
    canonical one-shuffle-plus-limit corpus statistic; at 100 TB the
    partial aggregation keeps the shuffle linear in DISTINCT bigrams,
    not corpus size."""
    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(H.shingles(F.col("text"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
    )
    return (
        counts.orderBy(F.col("n").desc(), "bigram").limit(20).select("bigram", "n")
    )


# ======================================================================
# EXT — correlated scalar subquery (decorrelated agg-join)
# ======================================================================


@register(
    "sub_correlated_scalar",
    """
    SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS price
    FROM orders o
    WHERE o.o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
    """,
)
def sub_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR subquery — Catalyst decorrelates the per-row
    avg into one grouped aggregate + an equi-join (the rewrite you'd
    hand-write at scale: no per-row re-scan)."""
    import uuid

    view = f"__cs_orders_{uuid.uuid4().hex[:8]}"
    table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS price
        FROM {view} o
        WHERE o.o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM {view} o2
                                    WHERE o2.o_custkey = o.o_custkey)
        """
    )


# ======================================================================
# §2.9 EXT — watermarked stream-stream interval join
# ======================================================================


@register(
    "streaming_stream_join",
    """
    SELECT p.event_id AS p_id, v.event_id AS view_id, p.user_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts >= p.ts - INTERVAL '30 minutes' AND v.ts <= p.ts
    """,
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks: purchases matched to the
    views that preceded them within 30 minutes per user. Both sides carry
    watermarks and the join condition bounds event time, so the state
    store can evict expired rows — the unbounded-state hazard of naive
    stream joins, solved the Structured Streaming way. availableNow over
    one batch ⇒ the result equals the batch interval join the oracle
    runs."""
    import uuid

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream_dir = tempfile.mkdtemp(prefix="events_ssj_")
    os.symlink(src, os.path.join(stream_dir, "events.parquet"))

    def side(event_type: str, id_alias: str, ts_alias: str):
        s = spark.readStream.format("parquet").schema(raw_schema).load(stream_dir)
        s = _norm_event_ts(s)
        return (
            s.filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(id_alias),
                F.col("user_id").alias(f"{id_alias}_user"),
                F.col("ts").alias(ts_alias),
            )
            .withWatermark(ts_alias, "1 hour")
        )

    purchases = side("purchase", "p_id", "p_ts")
    views = side("view", "view_id", "v_ts")
    joined = purchases.join(
        views,
        F.expr(
            "view_id_user = p_id_user AND "
            "v_ts >= p_ts - INTERVAL 30 MINUTES AND v_ts <= p_ts"
        ),
        "inner",
    ).select("p_id", "view_id", F.col("p_id_user").alias("user_id"))
    name = f"stream_join_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# ======================================================================
# EXT — z-order keys, histograms, deterministic sampling
# ======================================================================

from ..functions.geo import morton_key, morton_key_sql  # noqa: E402

_ZQX = "cast(floor((lon + 2.0) / 16.0 * 65536) AS BIGINT)"
_ZQY = "cast(floor((lat + 2.0) / 16.0 * 65536) AS BIGINT)"


@register(
    "geo_zorder_key",
    f"""
    WITH pts AS ({_BULK_PTS_SQL})
    SELECT img_id, {morton_key_sql(_ZQX, _ZQY)} AS zkey FROM pts
    """,
)
def geo_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over the 20k bulk points — the
    space-filling-curve layout op: ``repartitionByRange(zkey)`` +
    sortWithinPartitions before the write co-locates spatial tiles per
    file so min/max stats turn bbox scans into file skips (Delta
    OPTIMIZE ZORDER semantics from plain columns). The key itself is
    pure bit algebra, identical in both engines."""
    pts = spark.range(_BULK_N).select(
        F.col("id").alias("img_id"),
        ((F.col("id") * 73 % 997) / 997.0 * 16.0 - 2.0).alias("lon"),
        ((F.col("id") * 131 % 983) / 983.0 * 14.0 - 2.0).alias("lat"),
    )
    qx = F.floor((F.col("lon") + 2.0) / 16.0 * 65536).cast("bigint")
    qy = F.floor((F.col("lat") + 2.0) / 16.0 * 65536).cast("bigint")
    return pts.select("img_id", morton_key(qx, qy).alias("zkey"))


@register(
    "a4_histogram",
    f"""
    SELECT cast(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           count(*) AS n, {_dsum_sql('o_totalprice')} AS total
    FROM orders GROUP BY 1
    """,
)
def a4_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: floor-bucket + grouped count/sum — one
    map-side-combined shuffle over ~dozens of buckets regardless of
    table size."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bucket")
        )
        .agg(F.count("*").alias("n"), _dsum(F.col("o_totalprice")).alias("total"))
    )


@register(
    "p8_hash_sample",
    f"""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders WHERE {H.hash64_sql('o_orderkey::VARCHAR')} % 20 = 0
    """,
)
def p8_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% sample via the cross-engine hash family —
    reproducible across runs/engines and stable under repartitioning,
    unlike TABLESAMPLE; the standard trick for consistent dev subsets
    and A/B splits of a 100 TB corpus."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        H.hash64(F.col("o_orderkey").cast("string")) % 20 == 0
    ).select("o_orderkey", F.round("o_totalprice", 2).alias("price"))


# ======================================================================
# §2.10 EXT — per-group model fit (JVM regr_slope) + learned IVF codebook
# ======================================================================


@register(
    "g1_trend_fit",
    """
    WITH e AS (
      SELECT user_id, value,
             (floor(epoch(ts))::BIGINT
              - min(floor(epoch(ts))::BIGINT) OVER (PARTITION BY user_id)) / 3600.0 AS xh
      FROM events)
    -- "+ 0.0" canonicalizes IEEE -0.0 to 0.0: a tiny negative slope
    -- rounding to zero must hash identically on both engines (r16)
    SELECT user_id, count(*) AS n, round(regr_slope(value, xh), 4) + 0.0 AS slope
    FROM e GROUP BY user_id
    """,
)
def g1_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trend slope: least squares of value over hours-since-
    first-event, entirely JVM-side via the built-in ``regr_slope``
    aggregate (Spark >= 3.4) over a window-shifted x — the same closed
    form cov(x,y)/var(x) the DuckDB oracle computes, so values
    hash-match at 4 decimals.

    This was a grouped ``applyInPandas`` kernel through r08; the first
    full-registry sf0.1 timing showed the per-group Arrow overhead
    (~3.6 s warm for ~40k one-row-out groups) dwarfing the actual
    arithmetic. A closed-form fit never needs Python: one
    hashpartitioning(user_id) exchange feeds both the min() window and
    the final aggregate (no second shuffle), and whole-stage codegen
    covers the rest — 3.6 s -> ~0.4 s warm, and at 100 TB the
    difference is a cluster-sized Python worker pool doing nothing.
    Grouped-map kernels remain for fits with no closed form
    (operators/tdigest.py, the a19/streaming t-digest path)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_timestamp("ts")).cast("long").alias("epoch"), "value"
    )
    w = Window.partitionBy("user_id")
    xh = (F.col("epoch") - F.min("epoch").over(w)) / F.lit(3600.0)
    return (
        ev.withColumn("xh", xh)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            # + 0.0 canonicalizes IEEE -0.0 (see oracle note)
            (F.round(F.regr_slope("value", "xh"), 4) + F.lit(0.0)).alias("slope"),
        )
    )


@register(
    "ann_ivf_kmeans",
    """
    SELECT vec_id AS q_id, 10 AS n_results, true AS recall_ok
    FROM embeddings WHERE vec_id < 3 AND embedding IS NOT NULL
    """,
)
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a REAL learned codebook: pyspark.ml KMeans (seeded)
    fits coarse centroids over the embeddings, then the same
    centroid-equi-join probe plan as `ann_ivf_topk` runs against them.

    The codebook itself has no cross-engine twin (k-means centers are
    float-order dependent), so the oracle checks the index's CONTRACT
    instead of its internals: per query, the probe must return a full
    k=10 results and recall@10 against the in-engine exact top-10
    (brute_force_topk — itself oracle-checked via f17_cosine_topk) must
    clear 0.5. Measured recall at nprobe=4 is 0.7-1.0 across
    sf0.001/0.01/0.1, so the boolean has ≥0.2 absolute margin over
    codebook jitter; a degenerate codebook or broken probe join drives
    it false and red-rows the round (same pattern as a5_approx_distinct
    and ann_recall_eval)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # undecodable (NULL) vectors can't train or probe the index —
    # array_to_vector NPEs on them inside the KMeans fit
    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    feat = emb.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    # KMeans.fit crashes on a zero-row training set ("Nothing has been
    # added to this summarizer"); an empty corpus has no codebook and no
    # queries — return the empty contract frame. The existence probe is
    # a single limit-1 scan, negligible next to the fit it guards.
    if feat.isEmpty():
        return emb.select(
            F.col("vec_id").alias("q_id"),
            F.lit(0).cast("int").alias("n_results"),
            F.lit(False).alias("recall_ok"),
        ).filter(F.lit(False))
    model = KMeans(k=8, seed=42, maxIter=5).fit(feat)
    centroids = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(model.clusterCenters())],
        "centroid_id int, centroid array<double>",
    )
    queries_df = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    ivf = SIM.ivf_topk(emb, queries_df, centroids, k=10, nprobe=4).select(
        "q_id", "vec_id"
    )
    exact = SIM.brute_force_topk(emb, queries_df, k=10).select("q_id", "vec_id")
    n_hit = (
        exact.join(ivf, ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count("*").alias("n_hit"))
    )
    n_res = ivf.groupBy("q_id").agg(F.count("*").alias("n_results"))
    return (
        queries_df.select("q_id")
        .join(n_res, "q_id", "left")
        .join(n_hit, "q_id", "left")
        .select(
            F.col("q_id"),
            F.coalesce("n_results", F.lit(0)).cast("int").alias("n_results"),
            (F.coalesce("n_hit", F.lit(0)) >= 5).alias("recall_ok"),
        )
    )


# ======================================================================
# EXT — lake maintenance: compaction, schema-evolution reads
# ======================================================================


@register(
    "s17_compaction",
    f"""
    SELECT lang, count(*) AS n, {_dsum_sql('n_chars')} AS total_chars
    FROM documents GROUP BY lang
    """,
)
def s17_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the lake-maintenance op every streaming
    ingest needs: a fragmented write (64 shards) is compacted to 4 files
    via ``repartition`` and re-read; the aggregate must equal the
    oracle's direct scan, proving compaction loses nothing. At 100 TB
    the same plan runs per partition-dir with checkpointed progress."""
    frag_dir = os.path.join(tempfile.mkdtemp(prefix="compact_"), "frag")
    compact_dir = os.path.join(os.path.dirname(frag_dir), "compact")
    docs = table(spark, sf_dir, "documents")
    docs.repartition(64).write.mode("overwrite").parquet(frag_dir)
    frag = spark.read.parquet(frag_dir)
    frag.repartition(4).write.mode("overwrite").parquet(compact_dir)
    n_files = len(
        [f for f in os.listdir(compact_dir) if f.endswith(".parquet")]
    )
    assert n_files <= 4, f"compaction produced {n_files} files"
    return (
        spark.read.parquet(compact_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"), _dsum(F.col("n_chars")).alias("total_chars"))
    )


@register(
    "s18_schema_evolution",
    """
    SELECT doc_id, lang, NULL::DOUBLE AS score FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, lang, round(n_chars / 1000.0, 4) AS score
    FROM documents WHERE doc_id % 2 = 1
    """,
)
def s18_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: an old partition written WITHOUT the
    ``score`` column and a new partition WITH it, merged by
    ``mergeSchema`` — old rows surface score=NULL, exactly the
    additive-column contract a long-lived lake table relies on."""
    base = tempfile.mkdtemp(prefix="schema_evo_")
    docs = table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "v1"))
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", F.round(F.col("n_chars") / 1000.0, 4).alias("score")
    ).write.mode("overwrite").parquet(os.path.join(base, "v2"))
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(base, "v1"), os.path.join(base, "v2"))
        .select("doc_id", "lang", "score")
    )


# ======================================================================
# EXT — time-series resample + linear interpolation (hypertable rollup)
# ======================================================================


@register(
    "ts_resample_interp",
    """
    WITH e AS (
      SELECT user_id, floor(epoch(ts))::BIGINT AS x, value::DOUBLE AS v, event_id AS tb
      FROM events
      WHERE user_id < 50 AND ts IS NOT NULL AND value IS NOT NULL),
    b AS (SELECT user_id, min(x) AS lo, max(x) AS hi FROM e GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series((lo + 3599) // 3600, hi // 3600)) * 3600 AS x
      FROM b),
    u AS (
      SELECT user_id, x, 0 AS is_grid, x AS px, v AS pv, tb FROM e
      UNION ALL
      SELECT user_id, x, 1, NULL, NULL, NULL FROM grid),
    f AS (
      SELECT user_id, x, is_grid,
             last_value(px IGNORE NULLS) OVER w AS prev_x,
             last_value(pv IGNORE NULLS) OVER w AS prev_v,
             first_value(px IGNORE NULLS) OVER w2 AS next_x,
             first_value(pv IGNORE NULLS) OVER w2 AS next_v
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY x, is_grid, tb NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w2 AS (PARTITION BY user_id ORDER BY x, is_grid, tb NULLS FIRST
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, x AS grid_epoch,
           floor((CASE WHEN next_x IS NULL THEN prev_v
                  ELSE prev_v + (next_v - prev_v) * (x - prev_x) / (next_x - prev_x)
                  END) * 10000 + 0.5) / 10000.0 AS value
    FROM f WHERE is_grid = 1
    """,
)
def ts_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of each user's event-value series with linear
    interpolation between surrounding events (operators.asof.
    resample_interpolate): the hypertable-rollup/sensor shape as ONE
    union-merge timeline per key — forward window fills prev, backward
    window fills next, no per-grid-point probe. Oracle mirrors the exact
    window ordering and float expression."""
    from ..operators.asof import resample_interpolate

    # r16 contract: a sensor reading without a timestamp or a value
    # can't anchor interpolation — excluded on both sides.
    ev = table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 50)
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    return resample_interpolate(ev, step_seconds=3600)


# ======================================================================
# §2.9/F-geo/S6 — streaming sliding twin, shoelace areas, corrupt JSON
# ======================================================================


@register("streaming_sliding", _SLIDING_SQL)
def streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sliding-window aggregate executed as a Structured Streaming
    query (file source, availableNow, complete-mode memory sink) —
    batch/stream parity against the same oracle as
    ``sliding_window_agg``."""
    import uuid

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream_dir = tempfile.mkdtemp(prefix="events_sliding_")
    os.symlink(src, os.path.join(stream_dir, "events.parquet"))
    stream = spark.readStream.format("parquet").schema(raw_schema).load(stream_dir)
    stream = _norm_event_ts(stream).filter(F.col("ts").isNotNull())
    agg = (
        stream.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n",
        )
    )
    name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "geo_ring_areas",
    f"""
    SELECT id_predio, ring_idx,
           round(abs(sum(x1 * y2 - x2 * y1)) / 2, 6) AS area
    FROM {GF.ring_edges_values_sql()}
    GROUP BY id_predio, ring_idx
    """,
)
def geo_ring_areas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shoelace area per polygon RING (shells and holes alike,
    orientation-free via abs): one higher-order aggregate over the edge
    walk — pure column arithmetic, no UDF, trivially parallel. Ring-level
    rather than role-inferred so MultiPolygon parts and holes each report
    their own area (net parcel area = shells − holes once roles are
    assigned upstream)."""
    polys = GF.spark_polys(spark)
    ring = F.col("__r")
    n = F.size(ring)
    shoelace = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0.0),
        lambda acc, i: acc
        + (
            F.element_at(ring, i)["x"] * F.element_at(ring, (i % n) + 1)["y"]
            - F.element_at(ring, (i % n) + 1)["x"] * F.element_at(ring, i)["y"]
        ),
    )
    return polys.select(
        "id_predio", F.posexplode("rings").alias("ring_idx", "__r")
    ).select(
        "id_predio", "ring_idx", F.round(F.abs(shoelace) / 2, 6).alias("area")
    )


# One embedded-Derby database per (session, sf_dir): the JDBC load is a
# STANDING source — pay the single-connection write once, every
# subsequent read is the partitioned parallel scan (mirrors
# _BUCKETED_LAYOUTS).
_DERBY_DBS: dict[str, str] = {}


@register(
    "s9_jdbc_roundtrip",
    f"""
    SELECT c_nationkey, count(*) AS n, {_dsum_sql('c_acctbal')} AS total_bal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    GROUP BY c_nationkey
    """,
)
def s9_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 executed for real — no external DB required: the customer
    table is loaded into an EMBEDDED Apache Derby database (the JDBC
    engine Spark already ships for its metastore), then read back
    through ``spark.read.format("jdbc")`` as a PARTITIONED parallel scan
    (4 range partitions on c_custkey — each executor opens its own
    connection, the 100 TB-era ingest shape for relational sources,
    vs the reference's single cursor in mysql_process.py:13-25) with the
    segment predicate and column pruning PUSHED into the external
    engine's SQL ("External engine query" in the formatted plan). String
    columns are pinned to VARCHAR at create time — Derby maps Spark
    strings to CLOB by default, and CLOB predicates don't push."""
    import uuid

    db = _DERBY_DBS.get(sf_dir)
    if db is None:
        db = os.path.join(
            tempfile.mkdtemp(prefix="derby_"), f"db_{uuid.uuid4().hex[:8]}"
        )
        # Spark's Derby dialect maps StringType→CLOB and binds NULL
        # strings with setNull(CLOB), which Derby rejects into the pinned
        # VARCHAR column (ERROR 22005). Rows with a null segment go to
        # the bad-records channel instead of the relational stage —
        # value-identical here since the read-back filters segment =
        # 'BUILDING', which a NULL can never match.
        # the length cap matches the staged table's declared VARCHAR(64)
        # (widened from 10 in r16 — TPC-H segments are <=10 chars, but a
        # dirty wide feed should stage losslessly, not drop rows): a
        # still-over-width segment is a bad-records row, not a Derby
        # truncation abort (value-neutral: the read-back filters
        # segment = 'BUILDING', which both guards can never exclude)
        cust = (
            table(spark, sf_dir, "customer")
            .filter(
                F.col("c_mktsegment").isNotNull()
                & (F.length("c_mktsegment") <= 64)
            )
            .select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
        )
        (
            cust.write.format("jdbc")
            .option("url", f"jdbc:derby:{db};create=true")
            .option("dbtable", "CUSTOMER")
            .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
            .option("createTableColumnTypes", "c_mktsegment VARCHAR(64)")
            .save()
        )
        _DERBY_DBS[sf_dir] = db
    hi = (
        table(spark, sf_dir, "customer")
        .agg(F.max("c_custkey"))
        .collect()[0][0]
    )
    # max() is NULL on an empty source; keep the range-read bounds legal
    # (lowerBound < upperBound) so the parallel scan of an empty table is
    # an empty result, not a TypeError.
    hi = int(hi) if hi is not None else 1
    back = (
        spark.read.format("jdbc")
        .option("url", f"jdbc:derby:{db}")
        .option("dbtable", "CUSTOMER")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .option("partitionColumn", "c_custkey")
        .option("lowerBound", "1")
        .option("upperBound", str(hi + 1))
        .option("numPartitions", "4")
        .load()
    )
    return (
        back.filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"), _dsum(F.col("c_acctbal")).alias("total_bal"))
    )


@register(
    "s6_features_corrupt",
    "SELECT 5::BIGINT AS n_valid, 1::BIGINT AS n_corrupt",
)
def s6_features_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode JSON scan with a corrupt-record channel: five
    valid feature files plus one malformed blob read in one pass; bad
    rows land in _corrupt_record instead of failing the scan (cache
    before filtering on the corrupt column — Spark requires the
    materialization). The production posture for a landing bucket where
    one bad file must not kill the ingest."""
    import json

    d = tempfile.mkdtemp(prefix="features_corrupt_")
    for p in GF.POLYS:
        rec = {k: v for k, v in p.items() if k != "rings"}
        rec["rings"] = [[{"x": x, "y": y} for x, y in ring] for ring in p["rings"]]
        with open(os.path.join(d, f"{p['id_predio']}.json"), "w") as f:
            f.write(json.dumps(rec))
    with open(os.path.join(d, "zz_broken.json"), "w") as f:
        f.write('{"id_predio": "BAD", "rings": [[{"x": 1')

    from pyspark.sql import types as T

    from ..sources.files import FEATURE_SCHEMA

    # fresh StructType — StructType.add mutates in place, don't touch the
    # shared FEATURE_SCHEMA
    schema = T.StructType(
        list(FEATURE_SCHEMA.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    feats = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(d)
        .cache()
    )
    return feats.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_valid"),
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1)).alias("n_corrupt"),
    )


# ======================================================================
# §2.10 EXT — Python UDTF (table function), array set ops, grouping_id
# ======================================================================


@register(
    "f18_python_udtf",
    """
    SELECT doc_id, seg_idx, seg
    FROM (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' the '), 1) - 1 AS seg_idx,
             unnest(string_split(text, ' the ')) AS seg
      FROM documents WHERE doc_id < 30)
    WHERE seg <> ''
    """,
)
def f18_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one input row → N output
    rows from arbitrary Python, here segmenting text on a delimiter
    token. The UDTF surface matters where the expansion logic is real
    Python (parsers, tokenizers); this query's segmentation is
    deliberately SQL-expressible so the oracle can value-check the
    row-expansion contract itself."""
    import uuid

    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="seg_idx int, seg string")
    class SplitSegments:
        def eval(self, doc_id: int, text: str):
            if text is None:  # NULL payload expands to zero rows
                return
            for i, seg in enumerate(text.split(" the ")):
                if seg != "":
                    yield i, seg

    name = f"split_segments_{uuid.uuid4().hex[:8]}"
    spark.udtf.register(name, SplitSegments)
    view = f"__udtf_docs_{uuid.uuid4().hex[:8]}"
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30).createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.doc_id, s.seg_idx, s.seg
        FROM {view} d, LATERAL {name}(d.doc_id, d.text) s
        """
    )


@register(
    "f15_array_setops",
    f"""
    WITH s AS (
      SELECT doc_id, text,
             list_distinct({H.shingles_sql('text', 3)}) AS a,
             list_distinct({H.shingles_sql('lower(text)', 4)}) AS b
      FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           -- null-in-null-out keyed on the SOURCE column (Spark's
           -- array-op convention; DuckDB comprehensions over a NULL
           -- split yield [] rather than NULL, so a/b never read NULL)
           CASE WHEN text IS NULL THEN NULL
                ELSE len(list_intersect(a, b))::INT END AS n_inter,
           CASE WHEN text IS NULL THEN NULL
                ELSE len(list_distinct(list_concat(a, b)))::INT END AS n_union,
           CASE WHEN text IS NULL THEN NULL
                ELSE (len(a) - len(list_intersect(a, b)))::INT END AS n_only_a
    FROM s
    """,
)
def f15_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (F15 pack 3): intersect/union/except
    cardinalities between two shingle sets per row — pure higher-order
    column functions, no explode, no shuffle."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    a = F.array_distinct(H.shingles(F.col("text"), 3))
    b = F.array_distinct(H.shingles(F.lower(F.col("text")), 4))
    withab = docs.select("doc_id", a.alias("a"), b.alias("b"))
    return withab.select(
        "doc_id",
        F.size(F.array_intersect("a", "b")).alias("n_inter"),
        F.size(F.array_union("a", "b")).alias("n_union"),
        F.size(F.array_except("a", "b")).alias("n_only_a"),
    )


@register(
    "a4_grouping_id",
    """
    SELECT l_returnflag, l_linestatus,
           (CASE WHEN grouping(l_returnflag) = 1 THEN 2 ELSE 0 END
            + CASE WHEN grouping(l_linestatus) = 1 THEN 1 ELSE 0 END)::BIGINT AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a4_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id: the aggregation-level marker that lets a
    consumer distinguish subtotal rows from real NULL groups — the
    detail a naive rollup reader gets wrong."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().alias("gid"), F.count("*").alias("n"))
        .select("l_returnflag", "l_linestatus", "gid", "n")
    )


_RECURSIVE_YM_SQL = """
WITH RECURSIVE ym(n, mx) AS (
  SELECT MIN(year(o_orderdate) * 12 + month(o_orderdate)),
         MAX(year(o_orderdate) * 12 + month(o_orderdate))
  FROM orders
  UNION ALL
  SELECT n + 1, mx FROM ym WHERE n < mx
)
SELECT n AS ym, count(o_orderkey) AS n_orders
FROM ym LEFT JOIN orders ON year(o_orderdate) * 12 + month(o_orderdate) = n
GROUP BY n
"""


@register("sql_recursive_cte", _RECURSIVE_YM_SQL)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): generate the contiguous
    month series between the first and last order date — carrying the
    bound through the recursion, no subquery in the recursive member —
    then LEFT JOIN so empty months still appear (the gap-filled calendar
    a naive GROUP BY month silently drops)."""
    import uuid

    view = f"__rc_orders_{uuid.uuid4().hex[:8]}"
    table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        _RECURSIVE_YM_SQL.replace("FROM orders", f"FROM {view}").replace(
            "JOIN orders", f"JOIN {view}"
        )
    )


@register(
    "a6_collect_sorted",
    """
    SELECT o_orderpriority,
           array_to_string((list(o_orderkey ORDER BY o_orderkey))[1:5], ',')
             AS first_keys,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def a6_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered-array aggregate: sort_array(collect_list)
    sliced — collect_list alone is partition-order nondeterministic, the
    sort restores a stable contract. (At 100 TB collect the TOP-k per
    group via a ranking window instead of sorting whole groups; the
    slice here keeps the output bounded either way.) The array is
    serialized through concat_ws because the external driver
    canonicalizes results via pandas, which cannot sort/hash list cells
    — output columns must stay atomic (see tests/test_output_schemas.py)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.concat_ws(
                ",",
                F.slice(F.sort_array(F.collect_list("o_orderkey")), 1, 5).cast(
                    "array<string>"
                ),
            ).alias("first_keys"),
            F.count("*").alias("n"),
        )
    )


# ======================================================================
# A7 / F15 — deterministic moments, map transforms
# ======================================================================


@register(
    "a7_moments",
    """
    WITH s AS (
      SELECT lang, count(*) AS n,
             sum(n_chars) AS s1, sum(n_chars * n_chars) AS s2,
             sum(n_chars * n_chars * n_chars) AS s3
      FROM documents GROUP BY lang)
    SELECT lang, n,
           round(s1 / n, 6) AS mean,
           round(s2 / n - (s1 / n) * (s1 / n), 6) AS var_pop,
           -- skewness is UNDEFINED at zero variance (a singleton or
           -- constant group): NULL, not a divide-by-zero (r16)
           CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0 THEN
           round((s3 / n - 3 * (s1 / n) * (s2 / n - (s1 / n) * (s1 / n))
                  - (s1 / n) * (s1 / n) * (s1 / n))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) END AS skew
    FROM s
    """,
)
def a7_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments (mean/variance/skewness) per group computed
    from EXACT integer power sums — the order-independent formulation
    that makes distributed float moments deterministic: the shuffle
    carries bigint partials (map-side combined), the float arithmetic
    happens once per group from identical inputs in both engines.
    (Built-in var_pop/skewness stream floats partition-order-dependently
    and won't hash-match.)"""
    docs = table(spark, sf_dir, "documents")
    nc = F.col("n_chars").cast("long")
    s = docs.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum(nc).alias("s1"),
        F.sum(nc * nc).alias("s2"),
        F.sum(nc * nc * nc).alias("s3"),
    )
    n, s1, s2, s3 = F.col("n"), F.col("s1"), F.col("s2"), F.col("s3")
    mean = s1 / n
    var = s2 / n - mean * mean
    # zero variance (singleton/constant group) leaves skewness
    # undefined — NULL, not an ANSI divide-by-zero (r16 mega-fuzz find)
    skew = F.when(
        var > 0,
        (s3 / n - 3 * mean * var - mean * mean * mean) / F.pow(var, 1.5),
    )
    return s.select(
        "lang",
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(var, 6).alias("var_pop"),
        F.round(skew, 6).alias("skew"),
    )


@register(
    "f15_map_transform",
    """
    SELECT doc_id,
           'lang=' || upper(lang) AS lang_kv,
           1 AS n_filtered,
           3 AS n_concat
    FROM documents WHERE doc_id < 200
    """,
)
def f15_map_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map transform surface: transform_values, map_filter, map_concat —
    the property-bag manipulation ops (§1.4 maps). The oracle computes
    the equivalent scalars directly; the Spark plan routes them through
    the real map higher-order functions."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    mt = F.transform_values(m, lambda k, v: F.concat(k, F.lit("="), F.upper(v)))
    mf = F.map_filter(m, lambda k, v: k == "lang")
    mc = F.map_concat(m, F.create_map(F.lit("extra"), F.col("lang")))
    return docs.select(
        "doc_id",
        mt.getItem("lang").alias("lang_kv"),
        F.size(mf).alias("n_filtered"),
        F.size(mc).alias("n_concat"),
    )


# ======================================================================
# NORTH STAR — the full training-corpus preparation pipeline, end to end
# ======================================================================

# quality filter → exact dedup → near-dup components → canonical keep →
# per-lang stats. The oracle composes the SAME CTE pieces the individual
# queries verify, re-rooted onto the filtered/deduped subset.
_PIPELINE_SQL = (
    f"""
WITH q AS (
  SELECT doc_id, lang, text FROM documents
  WHERE {TX.quality_score_sql('text')} >= 0.4),
exact AS (
  SELECT min(doc_id) AS doc_id FROM q GROUP BY sha256(text)),
kept AS (
  SELECT q.* FROM q JOIN exact USING (doc_id)),
"""
    + _near_pairs_cte(0.2).replace("WITH base AS", "base AS").replace(
        "FROM documents", "FROM kept"
    )
    + """,
edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
reach AS (
  SELECT doc_id AS id, doc_id AS r FROM kept
  UNION
  SELECT e.dst AS id, r.r FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
canon AS (
  SELECT k.doc_id, k.lang FROM kept k JOIN comp c USING (doc_id)
  WHERE c.doc_id = c.component)
SELECT lang, count(*) AS n_kept FROM canon GROUP BY lang
"""
)
# WITH RECURSIVE must prefix the whole CTE chain (DuckDB allows it even
# when only `reach` recurses); the near-pairs CTE is re-rooted onto the
# filtered/deduped subset via the replaces above.
_PIPELINE_SQL = _PIPELINE_SQL.replace("WITH q AS", "WITH RECURSIVE q AS", 1)


@register("pipeline_corpus_prep", _PIPELINE_SQL)
def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole LLM-training-corpus preparation flow as ONE composed
    plan: quality pre-filter (pure columns) → exact dedup (digest
    groupBy, min-id representative) → near-dup connected components over
    the survivors (MinHash-LSH pairs + union-find) → keep only each
    cluster's canonical doc → per-language corpus stats. Every stage is
    individually oracle-verified elsewhere; this entry verifies their
    COMPOSITION — filters push into the scan, dedup shuffles on
    digests, the component join broadcasts, and the whole thing remains
    one lazy DataFrame until the final aggregate."""
    docs = table(spark, sf_dir, "documents")
    q = docs.filter(TX.quality_score(F.col("text")) >= 0.4).select(
        "doc_id", "lang", "text"
    )
    exact = D.exact_dedup(q).select("doc_id")
    # Stage boundary: the survivor set feeds THREE consumers (pair
    # generation inside dedup_components, the component join, and the
    # canonical filter). localCheckpoint materializes it once instead of
    # re-running the quality filter + digest dedup per consumer — the
    # same staging a production pipeline does between phases (~30%
    # faster at sf0.1).
    kept = q.join(exact, "doc_id").localCheckpoint(eager=True)
    comp = D.dedup_components(
        kept, k=3, num_hashes=16, bands=4, jaccard_threshold=0.2
    )
    canon = kept.join(comp, "doc_id").filter(
        F.col("doc_id") == F.col("component")
    )
    return canon.groupBy("lang").agg(F.count("*").alias("n_kept"))


# ======================================================================
# Training-data pipeline ops, round 2: packing, mixture, contamination,
# repetition, bloom-prefiltered join
# ======================================================================

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"


@register(
    "pack_sequences",
    f"""
    WITH base AS (
      SELECT doc_id, lang, len({_TOKS_SQL}) AS n_tok,
             {H.hash64_sql('doc_id::VARCHAR', 41)} AS ord_key
      FROM documents),
    packed AS (
      SELECT lang, n_tok,
             CAST(floor(coalesce(sum(n_tok) OVER (
               PARTITION BY lang ORDER BY ord_key NULLS FIRST, doc_id NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0)
               AS BIGINT) AS bin_id
      FROM base)
    SELECT lang, bin_id, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY lang, bin_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents in a deterministic
    shuffled order and chunk the token stream into fixed context windows
    (2048 tokens) — each doc lands in the bin where its first token
    falls. The pack order is a seeded md5 shuffle (reproducible across
    engines and runs); packing is PER LANGUAGE SHARD, so the window is
    partitioned — no global sort, no single-partition exchange, and at
    100 TB each shard packs independently (the real-world layout: one
    packing stream per data shard/domain)."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        TX.token_count(F.col("text")).alias("n_tok"),
        H.hash64(F.col("doc_id"), seed=41).alias("ord_key"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("ord_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = base.select(
        "lang",
        "n_tok",
        F.floor(
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / F.lit(2048.0)
        ).alias("bin_id"),
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("bin_tokens")
    )


@register(
    "corpus_mixture",
    """
    WITH agg AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
    SELECT lang, n_docs,
      floor((n_docs::DOUBLE / (sum(n_docs) OVER ())) * 1e6 + 0.5) / 1e6 AS share,
      floor((0.2 / (n_docs::DOUBLE / (sum(n_docs) OVER ()))) * 1e6 + 0.5) / 1e6
        AS repeat_factor
    FROM agg
    """,
)
def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-language corpus share and the
    repeat (epoch) factor needed to hit a uniform 20% target mixture —
    the bookkeeping behind up/down-sampling domains for a training run.
    The global window runs over the POST-aggregate (one row per
    language), so the single-partition stage touches ~#domains rows, not
    the corpus; rounding is explicit half-up on both engines."""
    docs = table(spark, sf_dir, "documents")
    agg = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tot = F.sum("n_docs").over(Window.partitionBy())
    share_raw = F.col("n_docs") / tot
    half_up = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return agg.select(
        "lang",
        "n_docs",
        half_up(share_raw).alias("share"),
        half_up(F.lit(0.2) / share_raw).alias("repeat_factor"),
    )


@register(
    "contamination_ngrams",
    f"""
    WITH ev AS (
      SELECT DISTINCT unnest({H.shingles_sql('text', 2)}) AS sh
      FROM documents WHERE doc_id % 97 = 0),
    tr AS (
      SELECT DISTINCT doc_id, unnest({H.shingles_sql('text', 2)}) AS sh
      FROM documents WHERE doc_id % 97 <> 0),
    tot AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id),
    hit AS (SELECT t.doc_id, count(*) AS n_overlap
            FROM tr t JOIN ev USING (sh) GROUP BY t.doc_id)
    SELECT d.doc_id, coalesce(tot.n_shingles, 0) AS n_shingles,
           coalesce(hit.n_overlap, 0) AS n_overlap
    FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
    LEFT JOIN tot USING (doc_id) LEFT JOIN hit USING (doc_id)
    """,
)
def contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: per training document, how many of
    its distinct word bigrams also appear in a held-out eval set (here a
    deterministic 1/97 slice of the corpus). The eval shingle set is
    tiny relative to the corpus, so it BROADCASTS — the training side is
    scanned once, exploded, and semi-matched with no shuffle of the big
    side by shingle; at 100 TB this is the standard inverted-index
    decontamination pass (eval n-grams as the build side)."""
    docs = table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    ev = (
        docs.filter(is_eval)
        .select(F.explode(H.shingles(F.col("text"), 2)).alias("sh"))
        .distinct()
    )
    tr = (
        spread(docs, "doc_id")  # shingle kernel parallel even off 1 split
        .filter(~is_eval)
        .select("doc_id", F.explode(H.shingles(F.col("text"), 2)).alias("sh"))
        .distinct()
    )
    tot = tr.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hit = (
        tr.join(F.broadcast(ev), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    base = docs.filter(~is_eval).select("doc_id")
    return (
        base.join(tot, "doc_id", "left")
        .join(hit, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
        )
    )


@register(
    "text_repetition",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
    SELECT doc_id, len(toks) AS n_tok,
           len(list_distinct(toks)) AS n_uniq,
           floor((1.0 - len(list_distinct(toks))::DOUBLE / greatest(len(toks), 1))
                 * 1e6 + 0.5) / 1e6 AS rep_ratio
    FROM base
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition score (Gopher-style quality signal):
    fraction of tokens that are repeats of an earlier token in the same
    doc. Pure per-row column expressions — embarrassingly parallel, no
    shuffle; rounding is explicit half-up so Spark (HALF_UP) and DuckDB
    (half-even on doubles) cannot disagree on knife-edge ratios."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", H.tokens(F.col("text")).alias("toks"))
    n_tok = F.size("toks")
    n_uniq = F.size(F.array_distinct("toks"))
    ratio = 1.0 - n_uniq / F.greatest(n_tok, F.lit(1))
    return base.select(
        "doc_id",
        n_tok.alias("n_tok"),
        n_uniq.alias("n_uniq"),
        (F.floor(ratio * 1e6 + F.lit(0.5)) / 1e6).alias("rep_ratio"),
    )


_BLOOM_M = 8192  # bits in the two-hash bloom prefilter


@register(
    "j_bloom_prefilter",
    """
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9900)
    GROUP BY o.o_orderpriority
    """,
)
def j_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join: the small build side (high-balance
    customers) is condensed into a two-hash bloom bit set (≤2·|build|
    distinct ints, kilobytes) that is BROADCAST and applied to the fact
    scan as two semi-joins BEFORE the exact key match — the hand-rolled
    twin of Spark's row-level runtime filtering. Output is exactly the
    semi-join (the bloom layers only prune, false positives are removed
    by the final exact semi-join), so the oracle is a plain EXISTS. At
    100 TB the bloom prefilter drops ~(1 - |build|/m)^2 of fact rows
    before any shuffle or probe of the real key set."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .select("c_custkey")
    )
    orders = table(spark, sf_dir, "orders")
    bits = cust.select(
        F.explode(
            F.array(
                H.hash64(F.col("c_custkey"), seed=1) % _BLOOM_M,
                H.hash64(F.col("c_custkey"), seed=2) % _BLOOM_M,
            )
        ).alias("bit")
    ).distinct()
    pref = orders
    for s in (1, 2):
        b = bits.withColumnRenamed("bit", f"bit{s}")
        pref = pref.join(
            F.broadcast(b),
            (H.hash64(F.col("o_custkey"), seed=s) % _BLOOM_M) == F.col(f"bit{s}"),
            "left_semi",
        )
    # cust is linear-in-SF — unhinted; stats broadcast it while small
    exact = pref.join(
        cust, pref.o_custkey == cust.c_custkey, "left_semi"
    )
    return exact.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@register(
    "incremental_agg_merge",
    """
    SELECT year(o_orderdate)*100 + month(o_orderdate) AS month_key,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the historical partition
    ("state": orders before 1997) and the fresh partition ("delta") are
    aggregated SEPARATELY into algebraic partial states (count, decimal
    sum) and then MERGED by re-aggregating the states — never rescanning
    history. The oracle is the full direct aggregate, proving state-merge
    ≡ recompute. At 100 TB this is the nightly-refresh pattern: the
    state table is O(groups), the delta scan is O(new data), and decimal
    partials make the merge order-independent bit-for-bit.

    Null-partition-key contract (r16): a row with NULL o_orderdate
    belongs to neither the state nor the delta partition — the split
    predicates exclude it on the Spark side, and the oracle carries the
    same explicit IS NOT NULL."""
    orders = table(spark, sf_dir, "orders")
    month_key = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias(
        "month_key"
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(month_key).agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s"),
        )

    state = partial(orders.filter(F.col("o_orderdate") < "1997-01-01"))
    delta = partial(orders.filter(F.col("o_orderdate") >= "1997-01-01"))
    return (
        state.unionByName(delta)
        .groupBy("month_key")
        .agg(
            F.sum("cnt").alias("n_orders"),
            F.sum("s").cast("double").alias("total_price"),
        )
    )


@register(
    "training_order",
    f"""
    SELECT doc_id,
           {H.hash64_sql('doc_id::VARCHAR', 99)} % 32 AS shard,
           row_number() OVER (
             PARTITION BY {H.hash64_sql('doc_id::VARCHAR', 99)} % 32
             ORDER BY {H.hash64_sql('doc_id::VARCHAR', 100)}, doc_id) AS position
    FROM documents
    """,
)
def training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every doc gets a
    reproducible (shard, position) — shard from one seeded md5, position
    from a row_number ordered by a second independent hash WITHIN the
    shard. No global sort: the window is partitioned 32 ways, so at
    100 TB each shard orders independently (and maps 1:1 onto output
    files via repartitionByRange/partitionBy on shard)."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        (H.hash64(F.col("doc_id"), seed=99) % 32).alias("shard"),
        H.hash64(F.col("doc_id"), seed=100).alias("__ord"),
    )
    w = Window.partitionBy("shard").orderBy("__ord", "doc_id")
    return base.select(
        "doc_id", "shard", F.row_number().over(w).alias("position")
    )


def _trade_edges_sql() -> str:
    """Nation-to-nation trade edges (customer nation → supplier nation,
    weighted by lineitem count) + per-source totals, as SQL CTE bodies."""
    return """
    e AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2),
    ow AS (SELECT src, sum(w) AS out_w FROM e GROUP BY src),
    ew AS (SELECT e.src, e.dst, e.w, ow.out_w FROM e JOIN ow USING (src))
    """


def _pagerank_iter_sql(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
      SELECT n.id,
             CAST(6000000000 + (85 * coalesce(f.infl, 0)) // 100 AS BIGINT) AS r
      FROM (SELECT id FROM r0) n
      LEFT JOIN (
        SELECT ew.dst AS id, sum((p.r * ew.w) // ew.out_w) AS infl
        FROM {prev} p JOIN ew ON ew.src = p.id GROUP BY ew.dst) f
      USING (id))
    """


@register(
    "graph_pagerank",
    "WITH "
    + _trade_edges_sql()
    + ", r0 AS (SELECT n_nationkey AS id, CAST(40000000000 AS BIGINT) AS r FROM nation),"
    + _pagerank_iter_sql("r0", "r1")
    + ","
    + _pagerank_iter_sql("r1", "r2")
    + ","
    + _pagerank_iter_sql("r2", "r3")
    + """
    SELECT n.n_name, r3.r AS rank_e12
    FROM r3 JOIN nation n ON n.n_nationkey = r3.id
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 unrolled iterations, damping 0.85) over the
    nation trade graph: customer-nation → supplier-nation edges weighted
    by lineitem count. Ranks are held in FIXED-POINT BIGINT (units of
    1e-12) with floor integer division — every arithmetic step is exact
    and order-independent, so Spark's partition-parallel sums and the
    DuckDB oracle agree bit-for-bit (no float-summation drift, the thing
    that normally makes iterative numeric algorithms un-verifiable
    cross-engine). The per-iteration plan is: tiny rank table (|V| rows)
    broadcast-joined to the edge list, one groupBy(dst) — at 100 TB the
    edge AGGREGATION dominates and shuffles once; iterations touch only
    the aggregated |V|² graph."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation")

    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)  # linear-in-SF
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)  # linear-in-SF
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    ow = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    ew = e.join(F.broadcast(ow), "src")

    nodes = nation.select(F.col("n_nationkey").alias("id"))
    ranks = nodes.select("id", F.lit(40000000000).alias("r"))
    for _ in range(3):
        infl = (
            F.broadcast(ranks.withColumnRenamed("id", "src"))
            .join(ew, "src")
            .select(F.col("dst").alias("id"), F.expr("(r * w) div out_w").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("infl"))
        )
        ranks = nodes.join(F.broadcast(infl), "id", "left").select(
            "id",
            (
                F.lit(6000000000)
                + F.expr("(85 * coalesce(infl, 0)) div 100")
            ).alias("r"),
        )
    return ranks.join(F.broadcast(nation), ranks.id == nation.n_nationkey).select(
        "n_name", F.col("r").alias("rank_e12")
    )


_CMS_W, _CMS_D = 256, 3  # count-min sketch width (columns) and depth (hash rows)


def _cms_hash_sql(expr: str) -> str:
    return f"(('0x' || substring(md5(s::VARCHAR || ':' || {expr}), 1, {H.HASH_HEX_CHARS}))::BIGINT % {_CMS_W})"


@register(
    "cms_heavy_hitters",
    f"""
    WITH tok AS (SELECT unnest({_TOKS_SQL}) AS tok FROM documents),
    cells AS (SELECT tok, s, {_cms_hash_sql('tok')} AS col
              FROM tok CROSS JOIN generate_series(0, {_CMS_D - 1}) t(s)),
    sketch AS (SELECT s, col, count(*) AS cnt FROM cells GROUP BY s, col),
    q AS (SELECT DISTINCT tok, s, col FROM cells),
    est AS (SELECT q.tok, min(sk.cnt) AS cms_est
            FROM q JOIN sketch sk ON sk.s = q.s AND sk.col = q.col
            GROUP BY q.tok),
    exact AS (SELECT tok, count(*) AS exact_n FROM tok GROUP BY tok)
    SELECT e.tok, e.exact_n, est.cms_est FROM exact e JOIN est USING (tok)
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the corpus token stream ({_CMS_D} hash rows ×
    {_CMS_W} columns), queried for every vocabulary token next to its
    exact count (est ≥ exact always; equal when no bucket collision).
    The sketch is an ALGEBRAIC aggregate — O(d·w) cells regardless of
    corpus size, built with map-side partial counts and mergeable across
    partitions/days — the scale story for streaming heavy-hitters where
    exact per-token counts would need a corpus-wide shuffle. The seeded
    md5 hash family makes the sketch bit-identical in both engines."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(H.tokens(F.col("text"))).alias("tok"))
    cells = tok.select(
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        (H.hash64(F.col("tok"), seed=s) % _CMS_W).alias("col"),
                    )
                    for s in range(_CMS_D)
                ]
            )
        ).alias("sc"),
    ).select("tok", F.col("sc.s").alias("s"), F.col("sc.col").alias("col"))
    sketch = cells.groupBy("s", "col").agg(F.count("*").alias("cnt"))
    q = cells.distinct()
    est = (
        q.join(sketch, ["s", "col"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("cms_est"))
    )
    exact = tok.groupBy("tok").agg(F.count("*").alias("exact_n"))
    return exact.join(est, "tok").select("tok", "exact_n", "cms_est")


@register(
    "dq_constraints",
    """
    SELECT 'orders_totalprice_positive' AS rule,
           count(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice <= 0)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_orderkey_unique',
           count(*) - count(DISTINCT o_orderkey) FROM orders
    UNION ALL
    SELECT 'orders_custkey_fk',
           count(*) FILTER (WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    FROM orders o
    UNION ALL
    SELECT 'lineitem_quantity_le_45',
           count(*) FILTER (WHERE l_quantity > 45) FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_in_0_1',
           count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) FROM lineitem
    """,
)
def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint audit (Deequ-style ingest validation): one
    violation count per declared rule — null/range checks as conditional
    aggregates (ONE scan per table, map-side combined), uniqueness as
    count minus count-distinct, referential integrity as an anti-join
    count with the dimension side broadcast. At 100 TB the whole audit
    is two fact scans + one broadcast — this is the pre-publish gate a
    lake pipeline runs on every batch."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cust = table(spark, sf_dir, "customer").select("c_custkey")

    def one(rule: str, agg: F.Column, df: DataFrame) -> DataFrame:
        return df.agg(agg.alias("n_violations")).select(
            F.lit(rule).alias("rule"), "n_violations"
        )

    bad_price = F.count_if(
        F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
    )
    dup_keys = F.count("*") - F.countDistinct("o_orderkey")
    orphans = one(
        "orders_custkey_fk",
        F.count("*"),
        orders.join(
            cust, orders.o_custkey == cust.c_custkey, "left_anti"  # linear-in-SF: unhinted
        ),
    )
    return (
        one("orders_totalprice_positive", bad_price, orders)
        .unionByName(one("orders_orderkey_unique", dup_keys, orders))
        .unionByName(orphans)
        .unionByName(one("lineitem_quantity_le_45", F.count_if(F.col("l_quantity") > 45), li))
        .unionByName(
            one(
                "lineitem_discount_in_0_1",
                F.count_if((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
                li,
            )
        )
    )


@register(
    "stratified_sample",
    f"""
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
               ORDER BY {H.hash64_sql('doc_id::VARCHAR', 7)} NULLS FIRST,
                        doc_id NULLS FIRST) AS rn
      FROM documents)
    WHERE rn <= 10
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size stratified sample: exactly k=10 docs per language,
    chosen by a seeded md5 order — deterministic and reproducible across
    runs/engines (unlike TABLESAMPLE), the eval-holdout / inspection
    sampling primitive. Partitioned window (one shuffle by stratum); at
    100 TB a two-phase refinement (per-partition top-k then global top-k
    per stratum, i.e. the topk_per_group shape) bounds state."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        H.hash64(F.col("doc_id"), seed=7), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
        .select("lang", "doc_id")
    )


@register(
    "streaming_dedup",
    """
    SELECT event_type, count(*) AS n FROM events
    WHERE event_id IS NOT NULL AND ts IS NOT NULL
    GROUP BY event_type
    """,
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingest under at-least-once delivery: the SAME events
    file is fed to the stream TWICE (two symlinks — a replayed upstream),
    and dropDuplicatesWithinWatermark(event_id) reduces it to the exact
    event set (oracle = plain per-type counts of the un-duplicated
    table). The watermark bounds dedup state: at 100 TB/day the state
    store holds only ids within the lateness horizon, not the full
    history — the scalable form of the reference's unguarded
    double-insert (SURVEY §2.9)."""
    import uuid

    from ..streaming.windows import dedup_within_watermark

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream_dir = tempfile.mkdtemp(prefix="events_dup_stream_")
    os.symlink(src, os.path.join(stream_dir, "a.parquet"))
    os.symlink(src, os.path.join(stream_dir, "b.parquet"))
    # r16 contract: exactly-once identity dedup needs BOTH an identity
    # (a NULL event_id would collapse every null-id row into one state
    # entry) and an event time (the watermark can't admit a null ts) —
    # rows lacking either are bad-records, excluded on both sides.
    stream = spark.readStream.format("parquet").schema(raw_schema).load(stream_dir)
    stream = (
        _norm_event_ts(stream)
        .filter(F.col("event_id").isNotNull() & F.col("ts").isNotNull())
    )
    deduped = dedup_within_watermark(stream, watermark_minutes=60).select(
        "event_id", "event_type"
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "j1_full_outer",
    """
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           c.c_custkey IS NOT NULL AS in_customers,
           coalesce(o.n_orders, 0) AS n_orders
    FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0) c
    FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
                     FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    """,
)
def j1_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — the reconciliation shape (catalog entries vs
    observed files: rows only-left are unreferenced, only-right are
    untracked). Shuffle join on the key; both sides keep their unmatched
    rows, so neither side can broadcast — the one join type where SMJ on
    co-partitioned inputs IS the 100 TB plan."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey", "c_name")
    )
    oagg = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    j = cust.join(oagg, cust.c_custkey == oagg.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_custkey").isNotNull().alias("in_customers"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


@register(
    "s19_orc_roundtrip",
    """
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
    """,
)
def s19_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan round-trip: the filtered orders partition is
    written as ORC (columnar, predicate-pushdown-capable like parquet)
    and read back for the aggregate; the oracle runs on the original
    table, proving the format round-trip is lossless. Exercises the
    second columnar format a lake engine must speak."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    out = os.path.join(tempfile.mkdtemp(prefix="orc_rt_"), "orders_f")
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        _dsum(F.col("o_totalprice")).alias("total"),
    )


@register(
    "a8_corr",
    f"""
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n,
             {_dsum_sql('l_quantity')} AS sx,
             {_dsum_sql('l_extendedprice')} AS sy,
             {_dsum_sql('l_quantity * l_quantity')} AS sxx,
             {_dsum_sql('l_extendedprice * l_extendedprice')} AS syy,
             {_dsum_sql('l_quantity * l_extendedprice')} AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           floor(((n * sxy - sx * sy) /
                  (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
                 * 1e6 + 0.5) / 1e6 AS corr_qty_price
    FROM s
    """,
)
def a8_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group — computed from DECIMAL power sums
    (one scan, map-side partials) instead of the built-in corr(), whose
    streaming (Welford) update order differs between engines and isn't
    bit-reproducible. Power sums are order-independent and exact; the
    final scalar formula is identical IEEE math on both sides. The
    2-pass-free single-scan shape is the 100 TB statistics pattern."""
    li = table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        _dsum(x).alias("sx"),
        _dsum(y).alias("sy"),
        _dsum(x * x).alias("sxx"),
        _dsum(y * y).alias("syy"),
        _dsum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n * F.col("sxy") - sx * sy
    den = F.sqrt(n * F.col("sxx") - sx * sx) * F.sqrt(n * F.col("syy") - sy * sy)
    return s.select(
        "l_returnflag",
        (F.floor((num / den) * 1e6 + F.lit(0.5)) / 1e6).alias("corr_qty_price"),
    )


@register(
    "set_intersect_all",
    """
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): each priority appears
    min(count_F, count_O) times — bag semantics the DISTINCT-based set
    ops can't express. Spark plans this as a counted hash aggregate +
    generate, one shuffle on the value."""
    orders = table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return f.intersectAll(o)


@register(
    "set_except_all",
    """
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): count_F - count_O surviving
    copies per value — the bag complement of `set_except`."""
    orders = table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return f.exceptAll(o)


@register(
    "a9_mode",
    """
    SELECT c_mktsegment, modal_priority, n FROM (
      SELECT c.c_mktsegment, o.o_orderpriority AS modal_priority,
             count(*) AS n,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY count(*) DESC, o.o_orderpriority)
               AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, o.o_orderpriority)
    WHERE rn = 1
    """,
)
def a9_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: the most frequent order priority per market
    segment, ties broken by value order — built as count + row_number
    (the built-in mode()'s tie behavior is engine-specific, so the
    explicit argmax shape is the reproducible form). Two shuffles:
    grouped count, then a window over the (few) per-segment rows."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    counts = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)  # linear-in-SF
        .groupBy("c_mktsegment", F.col("o_orderpriority").alias("modal_priority"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), "modal_priority"
    )
    return (
        counts.select("c_mktsegment", "modal_priority", "n", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("c_mktsegment", "modal_priority", "n")
    )


@register(
    "funnel_conversion",
    """
    WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                FROM events),
    v AS (SELECT user_id, min(ts) AS tv FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS tc
          FROM ev e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS tp
          FROM ev e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER their first
    view, then purchased AFTER that first qualifying click. Each stage
    is a grouped min-timestamp + a semi-structured join back to the
    event stream — no window over the global timeline, so each stage is
    one shuffle by user_id and the stage tables shrink monotonically.
    The oracle µs-truncates timestamps so both engines compare the same
    time domain (the events file is nanosecond-precision parquet)."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_view_click_purchase")))
    )


@register(
    "cohort_retention",
    """
    WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP)::DATE AS d FROM events),
    first AS (SELECT user_id, min(d) AS d0 FROM ev GROUP BY user_id)
    SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
           date_diff('day', f.d0, e.d) AS day_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM ev e JOIN first f USING (user_id)
    GROUP BY f.d0, day_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    distinct on each day-offset they return. Two shuffles (first-touch
    agg by user, then the cohort×offset count-distinct); the first-touch
    table is user-granular and joins back user-partitioned — at scale
    this is the shape that avoids any global timeline window."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "d0").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "streaming_topk",
    """
    WITH agg AS (
      SELECT (epoch(time_bucket(INTERVAL '60 minutes', ts)))::BIGINT
               AS window_start_epoch,
             event_type, count(*) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
    SELECT window_start_epoch, event_type, n FROM (
      SELECT *, row_number() OVER (
               PARTITION BY window_start_epoch
               ORDER BY n DESC, event_type NULLS FIRST) AS rn
      FROM agg)
    WHERE rn <= 2
    """,
)
def streaming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending top-k over a stream: hourly tumbling counts per event
    type maintained by a Structured Streaming query (complete-mode
    memory sink), then the top-2 types per hour ranked from the
    streaming state — the live-dashboard "what's trending now" shape.
    The streaming side holds only (window × type) state; the rank runs
    over that tiny aggregate, never the event stream."""
    import uuid

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream_dir = tempfile.mkdtemp(prefix="events_topk_stream_")
    os.symlink(src, os.path.join(stream_dir, "events.parquet"))
    stream = spark.readStream.format("parquet").schema(raw_schema).load(stream_dir)
    stream = _norm_event_ts(stream).filter(F.col("ts").isNotNull())
    agg = (
        stream.groupBy(F.window("ts", "60 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n",
        )
    )
    name = f"stream_topk_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    w = Window.partitionBy("window_start_epoch").orderBy(
        F.col("n").desc(), F.col("event_type").asc_nulls_first()
    )
    return (
        spark.table(name)
        .select("window_start_epoch", "event_type", "n", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 2)
        .select("window_start_epoch", "event_type", "n")
    )


@register(
    "geo_bbox_agg",
    f"""
    SELECT id_predio,
           min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax
    FROM {GF.vertices_values_sql()}
    GROUP BY id_predio
    """,
)
def geo_bbox_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-parcel bounding box: flatten every ring of every (multi)
    polygon and min/max the coordinates — the spatial-index build step
    (bboxes feed the grid prefilter and file-skipping zone maps). Pure
    explode + grouped min/max, map-side combinable."""
    polys = GF.spark_polys(spark)
    pts = polys.select(
        "id_predio", F.explode(F.flatten("rings")).alias("p")
    )
    return pts.groupBy("id_predio").agg(
        F.min("p.x").alias("xmin"),
        F.max("p.x").alias("xmax"),
        F.min("p.y").alias("ymin"),
        F.max("p.y").alias("ymax"),
    )


@register(
    "emb_centroid",
    """
    WITH q AS (
      SELECT label,
             unnest(generate_series(0, len(embedding) - 1)) AS pos,
             CAST(floor(unnest(embedding)::DOUBLE * 1e6 + 0.5) AS BIGINT)
               AS qv
      FROM embeddings)
    SELECT label, pos,
           floor((sum(qv)::DOUBLE / (count(*) * 1e6)) * 1e6 + 0.5) / 1e6
             AS centroid
    FROM q GROUP BY label, pos
    """,
)
def emb_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid under int quantization: each float
    component is quantized to a 1e-6-grid BIGINT (the int8-quantization
    pattern, coarser grid), summed EXACTLY, and averaged — integer sums
    make the reduction order-independent, so the distributed average is
    bit-reproducible (the raw-float sum would depend on partition
    order). This is the k-means update step / class-prototype
    computation for the IVF codebook, one shuffle on (label, pos)."""
    emb = table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        "pos",
        F.floor(F.col("v").cast("double") * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("qv"),
    )
    return comp.groupBy("label", "pos").agg(
        (
            F.floor(
                (F.sum("qv").cast("double") / (F.count("*") * 1e6)) * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("centroid")
    )


@register(
    "ts_mom_growth",
    """
    WITH m AS (
      SELECT year(o_orderdate)*100 + month(o_orderdate) AS month_key,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1)
    SELECT month_key, rev,
           floor(((rev - lag(rev) OVER (ORDER BY month_key))
                  / lag(rev) OVER (ORDER BY month_key)) * 1e6 + 0.5) / 1e6
             AS mom_growth
    FROM m
    """,
)
def ts_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: decimal-sum monthly revenue,
    then lag + relative delta. The unpartitioned window runs over the
    POST-aggregate (~#months rows), not the fact table — the correct
    altitude for period-over-period at any scale. Null order dates
    have no period — excluded both sides (r16 contract)."""
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    m = orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("month_key")
    ).agg(_dsum(F.col("o_totalprice")).alias("rev"))
    w = Window.orderBy("month_key")
    prev = F.lag("rev").over(w)
    return m.select(
        "month_key",
        "rev",
        (F.floor(((F.col("rev") - prev) / prev) * 1e6 + F.lit(0.5)) / 1e6).alias(
            "mom_growth"
        ),
    )


@register(
    "ts_rolling_distinct",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP)::DATE AS d FROM events),
    days AS (SELECT DISTINCT d FROM ud),
    contrib AS (
      SELECT ud.user_id, days.d
      FROM ud JOIN days ON days.d >= ud.d
                       AND days.d < ud.d + INTERVAL 7 DAY)
    SELECT strftime(d, '%Y-%m-%d') AS day, count(DISTINCT user_id) AS wau7
    FROM contrib GROUP BY d
    """,
)
def ts_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day (rolling WAU) — windowed
    COUNT DISTINCT, which window frames cannot express in either engine.
    Spark-first decomposition: dedup to (user, active-day), EXPLODE each
    activity into the ≤7 future days it contributes to (sequence +
    explode, a bounded ×7 fan-out — NOT a range self-join), then one
    count-distinct per day. At 100 TB the fan-out is linear in activity
    and shuffles once by day; the active-day dedup collapses the event
    stream first."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    ud = ev.distinct()
    days = ev.select("d").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("day"),
    ).join(F.broadcast(days), F.col("day") == days.d, "left_semi")
    return (
        contrib.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau7"))
    )


@register(
    "a10_mad",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           round(med.m, 6) AS median_value,
           round(quantile_cont(abs(e.value - med.m), 0.5), 6) AS mad
    FROM events e JOIN med USING (event_type)
    GROUP BY e.event_type, med.m
    """,
)
def a10_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    statistic: exact interpolated median, broadcast back, second exact
    median of the absolute deviations. Two passes by design (MAD is not
    an algebraic aggregate); Spark `percentile` and DuckDB
    `quantile_cont` interpolate identically."""
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("m")
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "m")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("m")), F.lit(0.5)).alias(
                "mad_raw"
            )
        )
        .select(
            "event_type",
            F.round("m", 6).alias("median_value"),
            F.round("mad_raw", 6).alias("mad"),
        )
    )


@register(
    "ts_streaks",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP)::DATE AS d FROM events),
    isl AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS island
      FROM ud),
    runs AS (
      SELECT user_id, count(*) AS len FROM isl GROUP BY user_id, island)
    SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY user_id
    """,
)
def ts_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — gaps-and-islands:
    date minus per-user row_number is constant within a consecutive run,
    so the island id is a pure expression and the whole computation is
    one user-partitioned window + two grouped aggs (no self-join, no
    iteration). Engagement/retention staple."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    ud = ev.distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = ud.select(
        "user_id",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("island"),
    )
    runs = isl.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    return runs.groupBy("user_id").agg(F.max("len").alias("longest_streak"))


@register(
    "s20_jsonl_roundtrip",
    """
    SELECT c_mktsegment, count(*) AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment
    """,
)
def s20_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + scan round-trip: the filtered customer slice is
    written as newline-delimited JSON (the interchange format for
    event feeds and labeling tools) and read back WITH AN EXPLICIT
    SCHEMA — never schema inference, which at 100 TB means a second full
    scan before the real one. Oracle runs on the original table: the
    text round-trip is lossless for the projected columns."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    out = os.path.join(tempfile.mkdtemp(prefix="jsonl_rt_"), "customers")
    cust.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "c_custkey bigint, c_mktsegment string, c_acctbal double"
    ).json(out)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        _dsum(F.col("c_acctbal")).alias("total_bal"),
    )


@register(
    "s25_xml_roundtrip",
    """
    SELECT s_nationkey, count(*) AS n,
           CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal,
           min(s_name) AS first_name
    FROM supplier WHERE s_acctbal >= 0 GROUP BY s_nationkey
    """,
)
def s25_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + scan round-trip (Spark 4 built-in XML source — the
    interchange format for cadastral/government feeds like the
    reference's SECCION/COMUNA parcel metadata, §1.2): the filtered
    supplier slice is written as <supplier> row elements and read back
    WITH AN EXPLICIT SCHEMA and rowTag — never schema inference (a
    second full scan at 100 TB). Oracle runs on the original table: the
    XML round-trip is lossless for the projected columns. Scale shape:
    XML parsing is per-row/per-split work in the executors; the
    aggregate after read-back is an ordinary one-exchange groupBy."""
    sup = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") >= 0)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    )
    out = os.path.join(tempfile.mkdtemp(prefix="xml_rt_"), "suppliers")
    sup.write.mode("overwrite").option("rowTag", "supplier").format("xml").save(out)
    back = (
        spark.read.schema(
            "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double"
        )
        .option("rowTag", "supplier")
        .format("xml")
        .load(out)
    )
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        _dsum(F.col("s_acctbal")).alias("total_bal"),
        F.min("s_name").alias("first_name"),
    )


@register(
    "s21_targeted_delete",
    """
    -- null-keyed rows SURVIVE a targeted delete (they can't be on a
    -- deletion list — anti-join semantics, mirrored explicitly)
    SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
    FROM events WHERE user_id IS NULL OR user_id % 13 <> 0
    GROUP BY event_type
    """,
)
def s21_targeted_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten delete: a deletion list (users with
    user_id % 13 = 0 here; in production the DSAR table) is anti-joined
    against the fact table and the survivors are REWRITTEN to storage —
    the copy-on-write DELETE a plain-parquet lake performs, same shape
    as the catalog's versioned-snapshot MERGE. The re-read aggregate
    matches the oracle's filtered view, proving the rewrite dropped
    exactly the targeted rows. At 100 TB the anti-join build side is the
    (tiny, broadcast) deletion list, and partition pruning limits the
    rewrite to affected files."""
    ev = table(spark, sf_dir, "events")
    dels = ev.select("user_id").distinct().filter(F.col("user_id") % 13 == 0)
    survivors = ev.join(F.broadcast(dels), "user_id", "left_anti")
    out = os.path.join(tempfile.mkdtemp(prefix="gdpr_del_"), "events_v2")
    survivors.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "scd2_build",
    """
    SELECT o_custkey AS custkey, o_orderstatus AS status,
           floor(epoch(o_orderdate))::BIGINT AS valid_from,
           floor(epoch(lead(o_orderdate) OVER
             (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey NULLS FIRST)))::BIGINT
             AS valid_to
    FROM orders WHERE o_custkey < 100 AND o_orderdate IS NOT NULL
    """,
)
def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: turn a change log into
    effective-dated rows — valid_from = the change timestamp, valid_to =
    the NEXT change per key (null = current). One partitioned window
    (lead), the standard warehouse dimension-history constructor; the
    result feeds the as-of/range joins (`j_asof_join`, `j_range_join`)
    for temporal lookups. A change record without a timestamp can't be
    effective-dated (NULL valid_to means CURRENT — a null change date
    would corrupt that sentinel) — excluded both sides (r16)."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_custkey") < 100) & F.col("o_orderdate").isNotNull()
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.unix_timestamp("o_orderdate").alias("valid_from"),
        F.unix_timestamp(F.lead("o_orderdate").over(w)).alias("valid_to"),
    )


@register(
    "j_scd2_asof",
    """
    WITH dim AS (
      SELECT o_custkey AS custkey, o_orderstatus AS status,
             floor(epoch(o_orderdate))::BIGINT AS valid_from,
             floor(epoch(lead(o_orderdate) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)))::BIGINT
               AS valid_to
      FROM orders WHERE o_custkey < 100),
    fact AS (
      SELECT l_orderkey, o_custkey AS custkey,
             floor(epoch(l_shipdate))::BIGINT AS ship_ts,
             l_quantity
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_custkey < 100 AND l_linenumber = 1)
    SELECT f.custkey, d.status,
           count(*) AS n,
           CAST(sum(CAST(f.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
    FROM fact f JOIN dim d
      ON f.custkey = d.custkey
     AND f.ship_ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ship_ts < d.valid_to)
    GROUP BY f.custkey, d.status
    """,
)
def j_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup — the query every SCD2 dimension
    exists FOR: each fact row joins the dimension VERSION that was
    valid at the fact's event time (equi on the key + the
    half-open [valid_from, valid_to) interval predicate; NULL
    valid_to = current version). Consumes the exact effective-dating
    shape `scd2_build` constructs. Scale shape: an equi-join on the
    dimension key with the interval check as a residual filter — the
    per-key version count is small (it is a HISTORY, not a fact), so
    the join never amplifies; here the dimension side is
    broadcast-sized and Catalyst picks BroadcastHashJoin with the
    range residual attached."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dim = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.unix_timestamp("o_orderdate").alias("valid_from"),
        F.unix_timestamp(F.lead("o_orderdate").over(w)).alias("valid_to"),
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    fact = li.join(
        orders.select(
            F.col("o_orderkey"), F.col("o_custkey").alias("custkey")
        ),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "custkey",
        F.unix_timestamp("l_shipdate").alias("ship_ts"),
        "l_quantity",
    )
    joined = fact.join(
        dim,
        (fact.custkey == dim.custkey)
        & (F.col("ship_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ship_ts") < F.col("valid_to"))),
    )
    return joined.groupBy(fact.custkey.alias("custkey"), "status").agg(
        F.count("*").alias("n"),
        _dsum(F.col("l_quantity")).alias("qty"),
    )


@register(
    "a23_bitmap_distinct",
    """
    WITH m AS (
      SELECT o_orderpriority, o_custkey // 32 AS chunk,
             bit_or(1::BIGINT << CAST(o_custkey % 32 AS INT)) AS mask
      FROM orders GROUP BY o_orderpriority, o_custkey // 32),
    b AS (
      SELECT o_orderpriority, count(*) AS n_chunks,
             CAST(sum(CAST(bit_count(mask) AS BIGINT)) AS BIGINT) AS n_distinct
      FROM m GROUP BY o_orderpriority),
    e AS (
      SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact
      FROM orders GROUP BY o_orderpriority)
    SELECT b.o_orderpriority, b.n_chunks, b.n_distinct,
           b.n_distinct = e.n_exact AS matches_exact
    FROM b JOIN e USING (o_orderpriority)
    """,
)
def a23_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index distinct counting for DENSE integer keys: ids chunk
    into 32-bit words (chunk = id/32, bit = id%32 — 32 not 64 because a
    63-bit shift overflows DuckDB's checked BIGINT arithmetic while
    Spark wraps; 32 keeps both engines in-range), a bit_or aggregate
    folds each chunk's membership into one BIGINT, and popcounts sum to
    the EXACT distinct count — the roaring-bitmap trick without the
    library. Why it matters at 100 TB: the bitmap partial state is
    O(id-range/32) BITS per group instead of a hash set of raw keys —
    map-side combine ships words, not values, and merging shards is
    bit_or (associative, commutative, constant-size). The query emits
    its own exactness proof next to the construction: n_distinct must
    equal count(DISTINCT) — both engines compute both paths."""
    o = table(spark, sf_dir, "orders").select("o_orderpriority", "o_custkey")
    m = (
        o.select(
            "o_orderpriority",
            F.floor(F.col("o_custkey") / 32).alias("chunk"),
            # pyspark's F.shiftleft only takes a literal shift amount;
            # the SQL form accepts a column
            F.expr("shiftleft(1L, cast(o_custkey % 32 as int))").alias("bit"),
        )
        .groupBy("o_orderpriority", "chunk")
        .agg(F.bit_or("bit").alias("mask"))
    )
    b = m.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.bit_count("mask").cast("long")).alias("n_distinct"),
    )
    e = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    return b.join(e, "o_orderpriority").select(
        "o_orderpriority",
        "n_chunks",
        "n_distinct",
        (F.col("n_distinct") == F.col("n_exact")).alias("matches_exact"),
    )


@register(
    "ml_target_encoding",
    """
    WITH f AS (
      SELECT event_type, event_id % 5 AS fold,
             count(*) AS cnt,
             sum(CAST(round(value, 4) AS DECIMAL(18,4))) AS s
      FROM events GROUP BY event_type, event_id % 5),
    t AS (
      SELECT event_type, sum(cnt) AS tot_cnt, sum(s) AS tot_s
      FROM f GROUP BY event_type)
    SELECT f.event_type, f.fold, f.cnt AS n_rows,
           floor(CAST(t.tot_s - f.s AS DOUBLE)
                 / nullif(t.tot_cnt - f.cnt, 0) * 1e6 + 0.5) / 1e6
             AS oof_encoding
    FROM f JOIN t USING (event_type)
    """,
)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding — the leakage-safe categorical
    featurizer: a category's encoding for fold k is the target mean
    computed from every OTHER fold (total − fold partials), so no row's
    own target leaks into its feature. Two aggregates at different
    altitudes (category×fold partials, then category totals re-derived
    FROM THE PARTIALS — the incremental_agg_merge discipline; the
    lazy plan re-expands the partial subtree on both join inputs, so at
    fleet scale localCheckpoint the 25-row partials first) and a
    broadcast join back; DECIMAL partials make the
    subtraction exact, one double division at the end, fixed-point
    rounded. At 100 TB this is one shuffle on (category, fold) plus an
    O(#categories) broadcast."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("event_id") % 5).alias("fold"),
        F.round("value", 4).alias("value"),
    )
    f = ev.groupBy("event_type", "fold").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
    )
    t = f.groupBy("event_type").agg(
        F.sum("cnt").alias("tot_cnt"),
        F.sum("s").cast("decimal(18,4)").alias("tot_s"),
    )
    joined = f.join(F.broadcast(t), "event_type")
    enc = (
        F.floor(
            (F.col("tot_s") - F.col("s")).cast("double")
            / F.nullif(F.col("tot_cnt") - F.col("cnt"), F.lit(0))
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return joined.select(
        "event_type",
        "fold",
        F.col("cnt").alias("n_rows"),
        enc.alias("oof_encoding"),
    )


# weighted-quantile targets as exact rationals (q, numerator, denominator)
_WQ_QS = ((0.5, 1, 2), (0.9, 9, 10))


@register(
    "a22_weighted_quantile",
    f"""
    WITH s AS (
      SELECT l_extendedprice AS v,
             sum(CAST(l_quantity AS DECIMAL(18,4))) OVER
               (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS cw,
             sum(CAST(l_quantity AS DECIMAL(18,4))) OVER () AS tw
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
    qs AS (SELECT * FROM (VALUES {', '.join(f'({q}::DOUBLE, {n}, {d})' for q, n, d in _WQ_QS)}) AS t(q, num, den))
    SELECT q, min(v) AS wq
    FROM s, qs
    WHERE cw * den >= num * tw
    GROUP BY q ORDER BY q
    """,
)
def a22_weighted_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-aware quantile (lower weighted quantile): the smallest
    value whose CUMULATIVE weight reaches q of the total — price
    percentiles where each row counts `l_quantity` times, the form
    inventory/risk queries need and plain `percentile` cannot express.
    One ordered cumulative-weight window + a one-row total broadcast.
    Exactness discipline: weights accumulate as DECIMAL (associative —
    a double cumsum could disagree between engines at the threshold
    row because window sums are not required to fold sequentially) and
    the q·total threshold is an integer rational (cw·den ≥ num·tw), so
    the crossing row is bit-determined. At 100 TB the global-ordered
    window is the cost — the scale path distributes it as a
    per-partition pre-aggregation over value buckets (a17's histogram
    shape) or a weighted t-digest (a19); this query pins the EXACT
    semantics those approximations are graded against. A weighted
    observation needs BOTH value and weight — null rows excluded on
    both sides (r16; a null value would otherwise sort engine-
    dependently and shift every crossing row)."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull() & F.col("l_quantity").isNotNull()
    )
    w_cum = Window.orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)
    s = li.select(
        F.col("l_extendedprice").alias("v"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .over(w_cum)
        .alias("cw"),
    ).crossJoin(
        F.broadcast(
            li.agg(
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("tw")
            )
        )
    )
    qs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(q).alias("q"),
                    F.lit(n).alias("num"),
                    F.lit(d).alias("den"),
                )
                for q, n, d in _WQ_QS
            ]
        )
    ).alias("t")
    return (
        s.select("v", "cw", "tw", qs)
        .select("v", "cw", "tw", "t.q", "t.num", "t.den")
        .filter(F.col("cw") * F.col("den") >= F.col("num") * F.col("tw"))
        .groupBy("q")
        .agg(F.min("v").alias("wq"))
        .orderBy("q")
    )


@register(
    "j1_null_safe_join",
    """
    WITH a AS (SELECT nullif(c_nationkey % 5, 0) AS k, count(*) AS n_cust
               FROM customer GROUP BY 1),
    b AS (SELECT nullif(s_nationkey % 5, 0) AS k, count(*) AS n_supp
          FROM supplier GROUP BY 1)
    SELECT a.k, a.n_cust, b.n_supp
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def j1_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): null keys
    MATCH each other instead of vanishing — the semantics for joining on
    optional attributes (unknown region, missing device id) without an
    explicit coalesce-sentinel rewrite. Still hash-partitionable: null
    is one more key value, so the plan is a plain shuffled/broadcast
    hash join, not a theta join."""
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    a = cust.groupBy(
        F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("k")
    ).agg(F.count("*").alias("n_cust"))
    b = supp.groupBy(
        F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("kb")
    ).agg(F.count("*").alias("n_supp"))
    return a.join(F.broadcast(b), a.k.eqNullSafe(b.kb)).select(
        "k", "n_cust", "n_supp"
    )


def _range_digest_sql(src: str) -> str:
    # value is quantized to a 1e-6-grid BIGINT before hashing: double→
    # string formatting is not cross-engine stable, integers are. XOR is
    # the order-independent, overflow-free set digest.
    qv = "CAST(floor(value * 1e6 + 0.5) AS BIGINT)"
    return f"""
      SELECT user_id // 100 AS rng,
             bit_xor({H.hash64_sql(f"event_id::VARCHAR || '|' || {qv}::VARCHAR", 5)})
               AS digest
      FROM {src} GROUP BY 1"""


@register(
    "table_checksum_diff",
    f"""
    WITH v2 AS (
      SELECT event_id, user_id,
             CASE WHEN user_id % 97 = 0 THEN value + 1.0 ELSE value END AS value
      FROM events),
    d1 AS ({_range_digest_sql('events')}),
    d2 AS ({_range_digest_sql('v2')})
    SELECT d1.rng, count(*) OVER () AS n_dirty_ranges
    FROM d1 JOIN d2 USING (rng)
    WHERE d1.digest <> d2.digest
    """,
)
def table_checksum_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style table reconciliation: both table versions are reduced
    to per-range digests (sum of seeded md5 row hashes — integer sums,
    so order- and partition-independent), and only ranges whose digests
    differ are reported. At 100 TB this finds the changed key ranges
    with two scans and a join of ~#ranges rows — no row-level compare
    until you descend into a dirty range. The mutated 'v2' here bumps
    value for user_id % 97 = 0, so exactly the ranges containing such
    users report dirty."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    v2 = ev.withColumn(
        "value",
        F.when(F.col("user_id") % 97 == 0, F.col("value") + 1.0).otherwise(
            F.col("value")
        ),
    )

    def digest(df: DataFrame) -> DataFrame:
        qv = F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("bigint")
        row_h = H.hash64(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit("|"),
                qv.cast("string"),
            ),
            seed=5,
        )
        return df.groupBy(F.expr("user_id div 100").alias("rng")).agg(
            F.bit_xor(row_h).alias("digest")
        )

    d1, d2 = digest(ev), digest(v2)
    dirty = (
        d1.join(d2.withColumnRenamed("digest", "digest2"), "rng")
        .filter(F.col("digest") != F.col("digest2"))
        .select("rng")
    )
    return dirty.select(
        "rng", F.count("*").over(Window.partitionBy()).alias("n_dirty_ranges")
    )


@register(
    "theta_avoid_prefix",
    """
    WITH deciles AS (
      SELECT DISTINCT CAST(floor(o_totalprice / 50000) AS BIGINT) AS band
      FROM orders WHERE o_totalprice IS NOT NULL)
    SELECT d.band,
           (SELECT count(*) FROM orders o
            WHERE o.o_totalprice < d.band * 50000) AS n_cheaper
    FROM deciles d
    """,
)
def theta_avoid_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality-join avoidance: "orders cheaper than each band
    threshold" is a theta join (O(bands × rows)) written naively — the
    oracle runs exactly that correlated form. The Spark plan instead
    aggregates once per band and takes a RUNNING SUM over the ~#bands
    ordered rows: same result, one scan + one tiny window. The standard
    rewrite that turns a 100 TB×k theta join into a prefix sum.
    A row without a price has no band (r16: NULL o_totalprice would
    otherwise sort first and leak its count into every prefix)."""
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    bands = orders.select(
        F.floor(F.col("o_totalprice") / 50000).alias("band")
    )
    per_band = bands.groupBy("band").agg(F.count("*").alias("n"))
    w = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    return per_band.select(
        "band",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("n_cheaper"),
    )


@register(
    "g2_cogroup_merge",
    """
    SELECT c.c_custkey, c.c_acctbal,
           CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(o.total, 0.0) AS DOUBLE) AS total_spend
    FROM customer c
    LEFT JOIN (SELECT o_custkey, count(*) AS n,
                      CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                        AS total
               FROM orders GROUP BY o_custkey) o
      ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey < 200
    """,
)
def g2_cogroup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped Arrow kernel (`groupBy().cogroup().applyInPandas`): both
    tables are hash-partitioned by key and each key's two pandas frames
    arrive together — the escape hatch for per-entity merge logic SQL
    can't express (custom matching, model scoring over an entity's full
    history). The kernel here computes a per-customer order rollup so a
    plain SQL twin can verify the plumbing: batch shapes, empty-side
    behavior (customers with no orders), and exact decimal totals
    (summed via integer cents in pandas to stay order-independent).

    Scale note: the entity predicate is applied to BOTH cogroup sides.
    Catalyst derives this transitivity for joins, but a cogroup kernel
    is opaque — an unfiltered right side hash-partitions the FULL fact
    table and invokes the Python kernel once per fact-side key (~100k
    interpreter round-trips at sf0.1, measured 17.9 s vs 1.1 s with
    the pushed filter; at 100 TB it is the difference between a bounded
    per-entity merge and cogrouping the whole corpus). When the entity
    set is a table rather than a literal predicate, the same move is a
    LEFT SEMI join prefilter on the fact side before the cogroup."""
    import pandas as pd

    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 200)
        .select("c_custkey", "c_acctbal")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select("o_custkey", "o_totalprice")
    )

    def merge(c: pd.DataFrame, o: pd.DataFrame) -> pd.DataFrame:
        if c.empty:  # orders for a customer outside the filtered slice
            return pd.DataFrame(
                columns=["c_custkey", "c_acctbal", "n_orders", "total_spend"]
            )
        # dropna: SQL SUM skips NULLs; NaN would throw on the int cast
        cents = (o["o_totalprice"].dropna() * 10000).round().astype("int64")
        return pd.DataFrame(
            {
                "c_custkey": c["c_custkey"].iloc[:1],
                "c_acctbal": c["c_acctbal"].iloc[:1],
                "n_orders": [len(o)],
                "total_spend": [cents.sum() / 10000.0],
            }
        )

    return (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(
            merge,
            "c_custkey bigint, c_acctbal double, n_orders bigint, total_spend double",
        )
    )


@register(
    "streaming_cdc_apply",
    """
    WITH log AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN event_id % 10 = 0 THEN 'D'
                  WHEN event_id % 10 < 5 THEN 'U' ELSE 'I' END AS op,
             round(value, 6) AS value
      FROM events),
    latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM log) WHERE rn = 1)
    SELECT user_id, event_id AS last_event_id, op AS last_op,
           value AS last_value
    FROM latest WHERE op <> 'D'
    """,
)
def streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC APPLY: an insert/update/delete change log (ops
    derived deterministically from event ids) streams in micro-batches
    into a keyed state table via foreachBatch MERGE. The merge is
    VERSION-ORDERED, not arrival-ordered: state and batch rows compete
    on (ts, event_id) and the newest wins, deletes included — so the
    result is independent of how the log is sharded into batches (the
    property a real CDC consumer needs, since file arrival order is
    not guaranteed) and replays are idempotent twice over (batch-id
    guard + the merge itself is idempotent). A key whose LATEST change
    is a delete is absent from the final read — tombstones survive
    compaction until they win or lose, they are never dropped early.
    Complements cdc_upsert_compact (the batch read-side compaction of
    the same log shape)."""
    import uuid

    base = tempfile.mkdtemp(prefix="scdc_")
    stream_dir = os.path.join(base, "in")
    state_dir = os.path.join(base, "state")
    log = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_id") % 10 == 0, "D")
        .when(F.col("event_id") % 10 < 5, "U")
        .otherwise("I")
        .alias("op"),
        F.round("value", 6).alias("value"),
    )
    log.repartition(4).write.parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema

    applied: set[int] = set()
    w_latest = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def merge(batch_df, batch_id: int) -> None:
        if batch_id in applied:
            return
        applied.add(batch_id)
        batch_latest = (
            batch_df.withColumn("rn", F.row_number().over(w_latest))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        cur_dir = os.path.join(state_dir, "cur")
        ss = batch_df.sparkSession
        if os.path.isdir(cur_dir):
            merged = (
                ss.read.parquet(cur_dir)
                .unionByName(batch_latest)
                .withColumn("rn", F.row_number().over(w_latest))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
        else:
            merged = batch_latest
        nxt = os.path.join(state_dir, f"v_{uuid.uuid4().hex[:8]}")
        merged.write.parquet(nxt)
        tmp = cur_dir + ".tmp"
        if os.path.islink(tmp):
            os.unlink(tmp)
        os.symlink(nxt, tmp)
        os.replace(tmp, cur_dir)

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(os.path.join(state_dir, "cur"))
        .filter(F.col("op") != "D")
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("op").alias("last_op"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "cdc_upsert_compact",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           round(value, 6) AS last_value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id
        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def cdc_upsert_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert-log compaction: keep the LATEST record per key (ts then
    event_id as the deterministic version tiebreak) — how a CDC/upsert
    stream collapses to current-state, and the read-side 'merge-on-read'
    a lakehouse performs. One partitioned window; at scale this is the
    compaction job that bounds read amplification."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.round("value", 6).alias("last_value"),
        )
    )


@register(
    "seq_transitions",
    """
    WITH s AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events),
    pairs AS (
      SELECT event_type AS src,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS dst
      FROM s)
    SELECT src, dst, count(*) AS n
    FROM pairs WHERE dst IS NOT NULL
    GROUP BY src, dst
    """,
)
def seq_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition matrix (behavioral Markov chain): consecutive
    event-type pairs within each user timeline via lead(), counted
    corpus-wide — the page-path / next-action analysis. One partitioned
    window + one grouped count; the µs-truncated oracle keeps both
    engines ordering the same timeline."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    return (
        pairs.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )


@register(
    "a11_winsorized_mean",
    """
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           CAST(sum(CAST(least(greatest(e.value, q.lo), q.hi)
                         AS DECIMAL(18,4))) AS DOUBLE)
             / count(*) AS wmean_raw_div,
           count(*) AS n
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type
    """,
)
def a11_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group — outlier-robust averaging: exact p05/
    p95 computed first, broadcast back, values CLAMPED to the band, then
    a decimal-partial mean. Two passes like MAD; the clamp is pure
    column min/max so the second pass stays one scan."""
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    clamped = ev.join(F.broadcast(q), "event_type").select(
        "event_type",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("cv"),
    )
    return clamped.groupBy("event_type").agg(
        (_dsum(F.col("cv")) / F.count("*")).alias("wmean_raw_div"),
        F.count("*").alias("n"),
    )


@register(
    "a12_gini",
    """
    WITH pos AS (
      SELECT c_mktsegment, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS r
      FROM customer WHERE c_acctbal > 0),
    s AS (
      SELECT c_mktsegment, count(*) AS n,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sw,
             CAST(sum(CAST(r * c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS srw
      FROM pos GROUP BY c_mktsegment)
    SELECT c_mktsegment,
           floor((2.0 * srw / (n * sw) - (n + 1.0) / n) * 1e6 + 0.5) / 1e6
             AS gini
    FROM s
    """,
)
def a12_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient per segment (how unevenly balances
    are distributed) from the rank-weighted sum identity — one
    partitioned sort-rank window plus decimal power sums; ties
    contribute a rank-block sum that is order-invariant, so the
    statistic is exactly reproducible. No logs, no trig — the
    inequality measure that stays cross-engine exact."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    pos = cust.select(
        "c_mktsegment", "c_acctbal", F.row_number().over(w).alias("r")
    )
    s = pos.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
        .cast("double")
        .alias("sw"),
        F.sum((F.col("r") * F.col("c_acctbal")).cast("decimal(28,4)"))
        .cast("double")
        .alias("srw"),
    )
    n, sw, srw = F.col("n"), F.col("sw"), F.col("srw")
    gini = 2.0 * srw / (n * sw) - (n + 1.0) / n
    return s.select(
        "c_mktsegment",
        (F.floor(gini * 1e6 + F.lit(0.5)) / 1e6).alias("gini"),
    )


@register(
    "f15_explode_outer",
    f"""
    WITH base AS (
      SELECT doc_id, {H.shingles_sql('text', 12)} AS sh FROM documents
      WHERE doc_id < 40)
    SELECT b.doc_id, u.s AS shingle
    FROM base b LEFT JOIN (
      SELECT doc_id, unnest(sh) AS s FROM base) u USING (doc_id)
    """,
)
def f15_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving fan-out (`explode_outer`): documents too short to
    produce any 12-token shingle keep ONE row with a null shingle
    instead of vanishing — the generator variant that doesn't silently
    drop entities, required when the exploded side feeds a per-entity
    aggregate that must cover every input row (DuckDB twin: LEFT JOIN
    against the unnest)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    base = docs.select("doc_id", H.shingles(F.col("text"), 12).alias("sh"))
    return base.select(
        "doc_id", F.explode_outer("sh").alias("shingle")
    )


@register(
    "ts_missing_days",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP)::DATE AS d FROM events),
    span AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM ud GROUP BY user_id),
    cal AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
      FROM span)
    SELECT c.user_id,
           count(*) AS n_span_days,
           count(*) FILTER (WHERE ud.d IS NULL) AS n_missing
    FROM cal c LEFT JOIN ud ON ud.user_id = c.user_id AND ud.d = c.d
    GROUP BY c.user_id
    """,
)
def ts_missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: per user, generate the full day span
    between first and last activity (sequence + explode — the calendar
    is derived per key, never a global dimension scan) and anti-match
    observed days to count coverage gaps — the dual of forward-fill
    (`w7_gap_fill`) and the prerequisite for any per-day model feature.
    Fan-out is bounded by the span, and the join is co-partitioned on
    user_id."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    ud = ev.distinct()
    span = ud.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    # outlier fail-safe (same posture as operators/asof.py
    # resample_interpolate): one corrupt date inflates a key's calendar
    # unboundedly; fail fast past ~274 years instead of materializing it
    cal = span.select(
        "user_id",
        F.explode(
            F.expr(
                "CASE WHEN datediff(d1, d0) > 100000 THEN "
                "raise_error(concat('ts_missing_days: user ', cast(user_id as string), "
                "' spans ', cast(datediff(d1, d0) as string), "
                "' days > 100000 — corrupt outlier date?')) "
                "ELSE sequence(d0, d1) END"
            )
        ).alias("d"),
    )
    j = cal.join(
        ud.withColumnRenamed("d", "seen"),
        (cal.user_id == ud.user_id) & (cal.d == F.col("seen")),
        "left",
    ).select(cal.user_id.alias("user_id"), "d", "seen")
    return j.groupBy("user_id").agg(
        F.count("*").alias("n_span_days"),
        F.count_if(F.col("seen").isNull()).alias("n_missing"),
    )


@register(
    "a13_equifreq_bins",
    """
    WITH b AS (
      SELECT ["""
    + ", ".join(f"quantile_cont(o_totalprice, 0.{x})" for x in range(1, 10))
    + """] AS bounds
      FROM orders)
    SELECT len(list_filter(b.bounds, v -> v <= o.o_totalprice)) AS bin,
           count(*) AS n,
           round(min(o.o_totalprice), 2) AS lo,
           round(max(o.o_totalprice), 2) AS hi
    FROM orders o, b
    GROUP BY bin
    """,
)
def a13_equifreq_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization WITHOUT a global sort: the naive
    ntile(10) needs a single-partition window over the fact table; the
    scale plan computes the 9 exact decile BOUNDARIES in one aggregate,
    broadcasts the tiny array, and assigns bins by counting boundaries
    ≤ value (a higher-order filter, pure map work). Per-bin stats
    verify the assignment. This is the feature-binning step of every
    tabular ML pipeline, in its 100 TB shape.

    The nine boundaries come from ONE array-percentile aggregate, not
    nine scalar ones: each scalar ``percentile`` call carries its own
    full collect-and-sort buffer, so the naive spelling buffers the
    fact column 9× (measured 3.3 s vs 1.0 s at sf0.1; at 100 TB the
    difference is 9× the aggregate-state memory per task)."""
    orders = table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.percentile(
            "o_totalprice",
            F.array(*[F.lit(x / 10.0) for x in range(1, 10)]),
        ).alias("bounds")
    )
    binned = orders.join(F.broadcast(bounds)).select(
        F.size(
            F.filter(F.col("bounds"), lambda v: v <= F.col("o_totalprice"))
        ).alias("bin"),
        "o_totalprice",
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@register(
    "ts_twap",
    """
    WITH s AS (
      SELECT user_id, value, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE user_id < 100),
    seg AS (
      SELECT user_id, value,
             date_diff('second', ts,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST))
               AS dur_s
      FROM s)
    SELECT user_id,
           CAST(sum(CAST(value * dur_s AS DECIMAL(28,4))) AS DOUBLE)
             / CAST(sum(dur_s) AS DOUBLE) AS twap_raw_div,
           CAST(sum(dur_s) AS BIGINT) AS total_s
    FROM seg WHERE dur_s IS NOT NULL AND dur_s > 0
    GROUP BY user_id
    """,
)
def ts_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation is weighted by how
    long it was the current value (lead-timestamp delta), the
    sensor/pricing average that a plain mean gets wrong under irregular
    sampling. Integer second durations × decimal partial sums keep the
    weighted reduction order-independent; one partitioned window + one
    grouped agg."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        "value",
        (
            F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")
        ).alias("dur_s"),
    )
    seg = seg.filter(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
    return seg.groupBy("user_id").agg(
        (
            F.sum((F.col("value") * F.col("dur_s")).cast("decimal(28,4)"))
            .cast("double")
            / F.sum("dur_s").cast("double")
        ).alias("twap_raw_div"),
        F.sum("dur_s").alias("total_s"),
    )


@register(
    "ts_interval_coverage",
    """
    WITH iv AS (
      SELECT user_id,
             floor(epoch(CAST(ts AS TIMESTAMP)))::BIGINT AS s,
             floor(epoch(CAST(ts AS TIMESTAMP)))::BIGINT + 300 AS e
      FROM events WHERE user_id < 100 AND ts IS NOT NULL),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -9223372036854775808)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv),
    isl AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM marked),
    runs AS (
      SELECT user_id, island, min(s) AS lo, max(e) AS hi
      FROM isl GROUP BY user_id, island)
    SELECT user_id, CAST(sum(hi - lo) AS BIGINT) AS covered_s,
           count(*) AS n_islands
    FROM runs GROUP BY user_id
    """,
)
def ts_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union length per user (sweep line): each event opens a
    5-minute activity interval; overlaps must not double-count. A new
    island starts when an interval's start exceeds the running max end
    of everything before it; islands reduce to [min start, max end] and
    their lengths sum. All integer-second arithmetic over partitioned
    windows — the active-time / uptime metric without a self-join.
    Null ts opens no interval — excluded both sides (r16 contract)."""
    ev = table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 100) & F.col("ts").isNotNull()
    )
    iv = ev.select(
        "user_id",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + 300).alias("e"),
    )
    wp = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(wp.rowsBetween(Window.unboundedPreceding, -1))
    marked = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("s") > F.coalesce(prev_max_e, F.lit(-(2**63))), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    isl = marked.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island")
        .over(wp.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("lo"), F.max("e").alias("hi")
    )
    return runs.groupBy("user_id").agg(
        F.sum(F.col("hi") - F.col("lo")).alias("covered_s"),
        F.count("*").alias("n_islands"),
    )


@register(
    "p9_weighted_sample",
    f"""
    WITH w AS (
      SELECT doc_id, lang, n_chars,
             {H.hash64_sql('doc_id::VARCHAR', 11)} % 1000000 AS u
      FROM documents)
    SELECT lang, count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS sampled_chars
    FROM w
    WHERE u < n_chars * 400
    GROUP BY lang
    """,
)
def p9_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling with inclusion probability ∝ document length:
    a seeded md5 uniform in [0, 1e6) is compared against the scaled
    weight, so longer documents are proportionally more likely to be
    kept — the curriculum/mixture sampling primitive, deterministic and
    reproducible (re-runs select the SAME sample; integer comparison, no
    float RNG). Pure scan+filter, no shuffle before the final stats."""
    docs = table(spark, sf_dir, "documents")
    u = H.hash64(F.col("doc_id"), seed=11) % 1000000
    return (
        docs.filter(u < F.col("n_chars") * 400)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
    )


@register(
    "a14_minmax_scale",
    """
    WITH st AS (
      SELECT event_type, min(value) AS lo, max(value) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           floor(CASE WHEN st.hi = st.lo THEN 0.0
                      ELSE (e.value - st.lo) / (st.hi - st.lo) END
                 * 1e6 + 0.5) / 1e6 AS scaled
    FROM events e JOIN st USING (event_type)
    WHERE e.user_id < 50
    """,
)
def a14_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max feature scaling: group extrema in one aggregate,
    broadcast back, normalize as pure map work (degenerate groups pin to
    0). The fit/transform split of a feature scaler in its distributed
    form — the fitted stats are O(groups), the transform never
    shuffles. Explicit half-up rounding (division ratios hit exact
    halves at scale)."""
    ev = table(spark, sf_dir, "events")
    st = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    scaled = F.when(F.col("hi") == F.col("lo"), F.lit(0.0)).otherwise(
        (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    )
    return (
        ev.filter(F.col("user_id") < 50)
        .join(F.broadcast(st), "event_type")
        .select(
            "event_id",
            "event_type",
            (F.floor(scaled * 1e6 + F.lit(0.5)) / 1e6).alias("scaled"),
        )
    )


@register(
    "p10_train_val_test",
    f"""
    WITH s AS (
      SELECT lang,
             {H.hash64_sql('doc_id::VARCHAR', 13)} % 1000000 AS u
      FROM documents)
    SELECT lang,
           CASE WHEN u < 800000 THEN 'train'
                WHEN u < 900000 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n
    FROM s GROUP BY 1, 2
    """,
)
def p10_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: one seeded md5
    uniform per doc mapped to hash ranges — membership is a pure
    function of doc_id, so the split is stable across runs, machines,
    and engines (no RNG state, no global sort), and a doc can never leak
    between splits when the corpus is re-processed. Scan + map + one
    grouped count."""
    docs = table(spark, sf_dir, "documents")
    u = H.hash64(F.col("doc_id"), seed=13) % 1000000
    split = (
        F.when(u < 800000, "train").when(u < 900000, "val").otherwise("test")
    )
    return docs.groupBy("lang", split.alias("split")).agg(
        F.count("*").alias("n")
    )


@register(
    "p11_dense_ids",
    f"""
    WITH s AS (
      SELECT doc_id, {H.hash64_sql('doc_id::VARCHAR', 17)} % 32 AS shard,
             {H.hash64_sql('doc_id::VARCHAR', 18)} AS ord
      FROM documents),
    sized AS (SELECT shard, count(*) AS n FROM s GROUP BY shard),
    offs AS (
      SELECT shard,
             coalesce(sum(n) OVER (ORDER BY shard NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM sized),
    ranked AS (
      SELECT doc_id, shard,
             row_number() OVER (PARTITION BY shard
               ORDER BY ord NULLS FIRST, doc_id NULLS FIRST) - 1
               AS r
      FROM s)
    SELECT ranked.doc_id,
           CAST(offs.off + ranked.r AS BIGINT) AS dense_id
    FROM ranked JOIN offs USING (shard)
    """,
)
def p11_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense contiguous 0..N-1 id assignment WITHOUT a global sort — the
    declarative zipWithIndex: rows hash into 32 shards, shard SIZES (a
    tiny aggregate) get running-sum offsets, and each row's id is its
    shard offset plus its within-shard rank. The only unpartitioned
    window runs over 32 rows; the catalog's id allocator
    (catalog/store.py) uses the same pattern imperatively. Deterministic
    because shard and order come from seeded md5, not partition
    placement."""
    docs = table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        (H.hash64(F.col("doc_id"), seed=17) % 32).alias("shard"),
        H.hash64(F.col("doc_id"), seed=18).alias("ord"),
    )
    sized = s.groupBy("shard").agg(F.count("*").alias("n"))
    w_off = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offs = sized.select(
        "shard", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("off")
    )
    w_rank = Window.partitionBy("shard").orderBy("ord", "doc_id")
    ranked = s.select(
        "doc_id", "shard", (F.row_number().over(w_rank) - 1).alias("r")
    )
    return ranked.join(F.broadcast(offs), "shard").select(
        "doc_id", (F.col("off") + F.col("r")).cast("bigint").alias("dense_id")
    )


# ======================================================================
# NORTH STAR — the reference's own workflow end to end (SURVEY M1-M3)
# ======================================================================

_GEO_PIPELINE_SQL = f"""
WITH pts AS (
  SELECT doc_id AS img_id,
         (round(-72.0 + 2.0 * (('0x' || substring(md5(text), 9, 8))::BIGINT
                / 4294967296.0), 6) + 72.0) * 7.0 AS lon,
         (round(-35.0 + 2.0 * (('0x' || substring(md5(text), 1, 8))::BIGINT
                / 4294967296.0), 6) + 35.0) * 7.0 AS lat
  FROM documents
  -- mirrors the landing-zone bad-records filter: filename needs the id,
  -- payload needs the text (r15 convention, made explicit here in r16)
  WHERE doc_id % 2 = 0 AND doc_id IS NOT NULL AND text IS NOT NULL),
e AS (SELECT * FROM {{edges}}),
v AS (SELECT * FROM {{vertices}}),
cr AS (
  SELECT p.img_id, e.id_predio, e.nombre,
         {{crossings}} AS crossings
  FROM pts p CROSS JOIN e
  GROUP BY p.img_id, e.id_predio, e.nombre),
inside AS (
  SELECT img_id, id_predio, nombre FROM (
    SELECT img_id, id_predio, nombre,
           row_number() OVER (PARTITION BY img_id ORDER BY id_predio, nombre) AS rn
    FROM cr WHERE crossings % 2 = 1) WHERE rn = 1),
near AS (
  SELECT img_id, id_predio, nombre FROM (
    SELECT d.img_id, d.id_predio, d.nombre,
           row_number() OVER (PARTITION BY d.img_id
                              ORDER BY d.dist2, d.id_predio, d.nombre, d.vx, d.vy) AS rn
    FROM (
      SELECT p.img_id, v.id_predio, v.nombre, v.x AS vx, v.y AS vy,
             (p.lon - v.x) * (p.lon - v.x) + (p.lat - v.y) * (p.lat - v.y) AS dist2
      FROM pts p CROSS JOIN v
      WHERE p.img_id NOT IN (SELECT img_id FROM inside)) d) WHERE rn = 1),
classified AS (
  SELECT id_predio, nombre, 'contains' AS method FROM inside
  UNION ALL SELECT id_predio, nombre, 'nearest' FROM near)
SELECT id_predio, nombre, method, count(*) AS n_images
FROM classified GROUP BY id_predio, nombre, method
"""


@register("pipeline_geo_ingest", None)
def pipeline_geo_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's OWN job as one composed plan (download_list_images
    → script_geo main): write image blobs → binaryFile scan → Arrow
    mapInPandas EXIF extraction (digest stub) → affine rescale of the
    GPS fix into the cadastral plane → containment-first /
    nearest-fallback classification against the multi-ring parcels →
    per-parcel image counts, ready for the catalog insert. Every stage
    is individually oracle-verified (multimodal_meta, geo_classify);
    this entry verifies the COMPOSITION: the mapInPandas kernel feeds
    the broadcast spatial join without materializing, and the whole
    flow is one lazy DataFrame."""
    from ..sources.binary import extract_image_meta, read_binary_dir

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    # Stage once per source SNAPSHOT: landing-zone writes are a one-time
    # ingest cost in the real pipeline, so repeated plan builds (bench
    # cold+warm, oracle re-runs) reuse the already-staged blobs instead
    # of re-writing 2×N files per call. The cache key includes a content
    # fingerprint of documents.parquet (size + mtime of every member
    # file), so a regenerated table at the same path gets a fresh
    # staging dir instead of silently serving stale blobs.
    src = os.path.join(sf_dir, "documents.parquet")
    fp_parts = []
    for p in sorted([src] + glob_mod.glob(os.path.join(src, "**"), recursive=True)):
        try:
            st = os.stat(p)
            fp_parts.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            continue
    dest = os.path.join(
        tempfile.gettempdir(),
        "geo_ingest_"
        + hashlib.md5((sf_dir + "|" + "|".join(fp_parts)).encode()).hexdigest()[:16],
    )
    marker = dest + ".staged"  # sibling, so the binaryFile scan never sees it
    if not os.path.exists(marker):
        os.makedirs(dest, exist_ok=True)

        def write_files(rows):
            for r in rows:
                # filename IS the address: id + payload both required
                if r["text"] is None or r["doc_id"] is None:
                    continue
                ext = "jpg" if r["doc_id"] % 2 == 0 else "tif"
                with open(os.path.join(dest, f"{r['doc_id']}.{ext}"), "wb") as f:
                    f.write(r["text"].encode("utf-8"))

        docs.foreachPartition(write_files)
        # atomic marker: a concurrent run either sees the complete marker
        # or none — never a half-written one
        tmp = marker + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            f.write("ok")
        os.replace(tmp, marker)
    # binaryFile sizes partitions by openCostInBytes (4 MB/file default), so
    # thousands of small blobs explode into near-empty partitions that each
    # pay an Arrow python-worker round trip; coalesce (no shuffle) back to
    # core parallelism before the decode kernel.
    blobs = read_binary_dir(spark, dest).coalesce(
        spark.sparkContext.defaultParallelism
    )
    meta = extract_image_meta(blobs)
    pts = meta.filter(F.col("clase") == "BR").select(
        F.regexp_extract(F.col("path"), r"(\d+)\.jpg$", 1)
        .cast("long")
        .alias("img_id"),
        ((F.round(F.col("lon"), 6) + 72.0) * 7.0).alias("lon"),
        ((F.round(F.col("lat"), 6) + 35.0) * 7.0).alias("lat"),
    )
    classified = classify_points(pts, GF.spark_polys(spark))
    return classified.groupBy("id_predio", "nombre", "method").agg(
        F.count("*").alias("n_images")
    )


ORACLES["pipeline_geo_ingest"] = _GEO_PIPELINE_SQL.format(
    edges=GF.edges_values_sql(),
    vertices=GF.vertices_values_sql(),
    crossings=GF.crossings_sql(),
)


@register(
    "w8_leave_one_out",
    """
    WITH m AS (
      SELECT o_orderkey,
             year(o_orderdate)*100 + month(o_orderdate) AS month_key,
             o_totalprice,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS s,
             count(*) OVER w AS n
      FROM orders WHERE o_custkey < 200
      WINDOW w AS (PARTITION BY year(o_orderdate)*100 + month(o_orderdate)))
    SELECT o_orderkey, month_key,
           CASE WHEN n > 1
                THEN floor((o_totalprice - (s - o_totalprice) / (n - 1))
                           * 1e2 + 0.5) / 1e2 END AS delta_vs_peers
    FROM m
    """,
)
def w8_leave_one_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out peer comparison: each order against the average of
    the OTHER orders in its month — SQL's EXCLUDE CURRENT ROW frame,
    which Spark lacks, emulated algebraically as (S - x)/(n - 1) from
    plain partition aggregates (decimal window sums keep S exact). The
    anomaly-scoring shape: one window, no self-join, single-row
    months yield null."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    month_key = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias(
        "month_key"
    )
    m = orders.select("o_orderkey", month_key, "o_totalprice")
    w = Window.partitionBy("month_key")
    s = F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double")
    n = F.count("*").over(w)
    loo = (F.col("o_totalprice") - (s - F.col("o_totalprice")) / (n - 1))
    return m.select(
        "o_orderkey",
        "month_key",
        F.when(n > 1, F.floor(loo * 1e2 + F.lit(0.5)) / 1e2).alias(
            "delta_vs_peers"
        ),
    )


_PII_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


@register(
    "text_pii_scrub",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 10 = 0
                          THEN ' contact: user' || doc_id || '@example.com'
                          ELSE '' END AS t
      FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(t, '{_PII_RE}')) AS n_redacted,
           length(regexp_replace(t, '{_PII_RE}', '[EMAIL]', 'g')) AS scrubbed_len
    FROM aug
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (the corpus text is synthetic/digit-free, so a
    deterministic email is injected into every 10th doc to give the
    scrubber real work): regex match-count plus the scrubbed length
    after placeholder substitution — pure column regexes that run in
    both engines' RE dialects (no lookaround/backrefs), embarrassingly
    parallel at any scale. Production swaps in the full PII pattern
    battery; the plan shape is identical."""
    docs = table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(""),
    )
    aug = docs.select("doc_id", t.alias("t"))
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_PII_RE), 0)).alias(
            "n_redacted"
        ),
        F.length(F.regexp_replace("t", _PII_RE, "[EMAIL]")).alias(
            "scrubbed_len"
        ),
    )


@register(
    "w9_trailing_array",
    """
    SELECT event_id, user_id,
           coalesce(array_to_string(
             [CAST(round(x * 1e6) AS BIGINT) FOR x IN
              list(value) FILTER (value IS NOT NULL) OVER (
                PARTITION BY user_id
                ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST,
                         event_id NULLS FIRST
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)], ','), '')
             AS last3
    FROM events WHERE user_id < 50
    """,
)
def w9_trailing_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window ARRAY materialization: each event carries the
    ordered array of its last ≤3 values — the feature-vector shape
    sequence models consume (sliding context windows), built by
    collect_list over a bounded row frame (state is O(frame), not
    O(history)). The array is serialized as comma-joined micro-unit
    integers: the driver canonicalizes via pandas (list cells are
    unhashable), and double→string formatting differs between engines,
    so round(x*1e6)→bigint→string is the stable cross-engine encoding
    (identical IEEE double in, identical integer out).

    Array-aggregation null contract (r16): NULL values are EXCLUDED
    from collected arrays — Spark's collect_list semantics, mirrored
    explicitly in the oracle with FILTER (value IS NOT NULL).
    All-NULL-frame contract (r17): when every value in the frame is
    NULL, both engines serialize the EMPTY STRING. Spark's
    collect_list returns [] there and concat_ws('') of an empty array
    is ''; DuckDB diverges TWICE on that shape — the bare filtered
    list() window yields NULL over an empty frame, and even
    array_to_string([], ',') returns NULL (unlike concat_ws) — so the
    oracle pins coalesce(array_to_string(...), '') at the string
    level, which closes both."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.concat_ws(
            ",",
            F.transform(
                F.collect_list("value").over(w),
                lambda x: F.round(x * 1e6).cast("long").cast("string"),
            ),
        ).alias("last3"),
    )


_PYDS_FIXTURE: dict[str, str] = {}


@register(
    "s1_python_datasource",
    """
    WITH jp AS (
      SELECT i,
             round(-((17 + i % 17) + ((i * 7) % 60) / 60.0
                     + (((i * 131) % 6000) / 100.0) / 3600.0), 6) AS lat
      FROM generate_series(0, 39) t(i)),
    tf AS (
      SELECT i, 512 + i % 256 AS cols,
             200000.0::DOUBLE + i * 250.25::DOUBLE AS x0
      FROM generate_series(0, 39) t(i))
    SELECT 'BR' AS kind, count(*) AS n,
           CAST(sum(floor(lat * 1e6 + 0.5)) AS BIGINT) AS checksum
    FROM jp
    UNION ALL
    SELECT 'TIF' AS kind, count(*) AS n,
           CAST(sum(cols) + sum(CAST(floor(x0 * 4.0 + 0.5) AS BIGINT))
                AS BIGINT) AS checksum
    FROM tf
    """,
)
def s1_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4): the ``exifscan`` format
    (sources/pyds.py) reads an image directory as a TYPED table — the
    file list is split into planner partitions, each executor split
    decodes JPEG-EXIF / GeoTIFF metadata INSIDE the scan with the
    pure-stdlib codec and emits rows, not blobs. The fixture mixes 40
    real-EXIF JPEGs and 40 GeoTIFFs (same generating integers as
    s7/s8); per-kind fixed-point checksums over the decoded coordinates
    prove the whole source — partition planning, executor-side read,
    typed schema — end to end against a closed-form oracle."""
    from ..functions import tiff as _tiff
    from ..sources.pyds import register_exifscan

    dest = _PYDS_FIXTURE.get(sf_dir)
    if dest is None:
        dest = tempfile.mkdtemp(prefix="pyds_fix_")
        for i in range(40):
            with open(os.path.join(dest, f"{i}.jpg"), "wb") as f:
                f.write(
                    _tiff.write_jpeg_exif_gps(
                        (17 + i % 17, (i * 7) % 60, (i * 131) % 6000, 100),
                        (60 + i % 12, (i * 11) % 60, (i * 173) % 6000, 100),
                        south=True,
                        west=True,
                    )
                )
            with open(os.path.join(dest, f"{i}.tif"), "wb") as f:
                f.write(
                    _tiff.write_geotiff(
                        512 + i % 256,
                        256 + i % 128,
                        200000.0 + i * 250.25,
                        6000000.0 - i * 125.5,
                        0.25 + (i % 8) / 16.0,
                        0.25 + (i % 4) / 8.0,
                    )
                )
        _PYDS_FIXTURE[sf_dir] = dest
    register_exifscan(spark)
    scan = spark.read.format("exifscan").option("numPartitions", "8").load(dest)
    return (
        scan.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.col("kind") == "BR",
                    F.floor(F.round(F.col("lat"), 6) * 1e6 + 0.5).cast("long"),
                ).otherwise(
                    F.col("cols").cast("long")
                    + F.floor(F.col("x0") * 4.0 + 0.5).cast("long")
                )
            ).alias("checksum"),
        )
    )


# One partitioned fact layout + month-dim parquet per (session, sf_dir)
# — a standing lake layout, like _BUCKETED_LAYOUTS and _DERBY_DBS.
_DPP_LAYOUTS: dict[str, str] = {}


@register(
    "j_dynamic_partition_pruning",
    f"""
    WITH li AS (
      SELECT strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m') AS ship_month,
             l_extendedprice
      FROM lineitem)
    SELECT ship_month, count(*) AS n,
           {_dsum_sql('l_extendedprice')} AS revenue
    FROM li
    WHERE ship_month IN ('1995-10', '1995-11', '1995-12')
    GROUP BY ship_month
    """,
)
def j_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning — THE mechanism that makes
    dim-filtered fact scans cheap on a partitioned 100 TB lake: the
    fact (lineitem, hive-partitioned by ship month, ~80 partitions) is
    joined to a month dimension filtered on an attribute
    (quarter = '1995-Q4') that only the DIM carries, so static pruning
    cannot apply; at runtime Spark turns the dim's surviving keys into a
    partition filter on the fact scan (`dynamicpruningexpression` in
    the formatted plan, asserted by tools/explain_audit.py) and reads 3
    of ~80 partitions instead of all of them. Layout written once per
    session (standing-table posture, like the bucketed join)."""
    import uuid

    base = _DPP_LAYOUTS.get(sf_dir)
    if base is None:
        base = os.path.join(tempfile.mkdtemp(prefix="dpp_"), uuid.uuid4().hex[:8])
        li = table(spark, sf_dir, "lineitem").select(
            "l_extendedprice",
            F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        )
        li.write.partitionBy("ship_month").parquet(os.path.join(base, "fact"))
        dim = (
            table(spark, sf_dir, "lineitem")
            .select(
                F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
                F.concat(
                    F.year("l_shipdate").cast("string"),
                    F.lit("-Q"),
                    F.quarter("l_shipdate").cast("string"),
                ).alias("quarter"),
            )
            .distinct()
        )
        dim.write.parquet(os.path.join(base, "dim"))
        _DPP_LAYOUTS[sf_dir] = base
    # Explicit schemas: a zero-row source writes no data files, and the
    # layout's schema is a contract, not something to re-infer per read.
    fact = spark.read.schema("l_extendedprice double, ship_month string").parquet(
        os.path.join(base, "fact")
    )
    dim = (
        spark.read.schema("ship_month string, quarter string")
        .parquet(os.path.join(base, "dim"))
        .filter(F.col("quarter") == "1995-Q4")
    )
    return (
        fact.join(dim.select("ship_month"), "ship_month")
        .groupBy("ship_month")
        .agg(
            F.count("*").alias("n"),
            _dsum(F.col("l_extendedprice")).alias("revenue"),
        )
    )


@register(
    "streaming_foreachbatch_merge",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(round(value, 4) AS DECIMAL(18,4))) AS DOUBLE)
             AS total
    FROM events GROUP BY event_type
    """,
)
def streaming_foreachbatch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production streaming-sink pattern: ``foreachBatch`` MERGE.
    The event file is staged as 4 shards read one-per-micro-batch
    (maxFilesPerTrigger=1), and each batch UPSERTS its per-type partial
    aggregate into a copy-on-write state table keyed by the batch id —
    a replayed batch is SKIPPED (the exactly-once discipline every
    Delta/Iceberg streaming MERGE uses, here over plain parquet).
    Partials are DECIMAL so cross-batch accumulation is exact and
    order-independent; the final state must equal the one-shot batch
    aggregate the oracle computes. Four micro-batches exercise the
    read-merge-write loop for real, not a single-batch degenerate."""
    import uuid

    base = tempfile.mkdtemp(prefix="febm_")
    stream_dir = os.path.join(base, "in")
    state_dir = os.path.join(base, "state")
    ev = table(spark, sf_dir, "events").select("event_type", F.round("value", 4).alias("value"))
    ev.repartition(4).write.parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema

    applied: set[int] = set()

    def merge(batch_df, batch_id: int) -> None:
        if batch_id in applied:  # replay guard: batch already merged
            return
        applied.add(batch_id)
        part = batch_df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("total"),
        )
        cur_dir = os.path.join(state_dir, "cur")
        if os.path.isdir(cur_dir):
            cur = batch_df.sparkSession.read.parquet(cur_dir)
            merged = (
                cur.select("event_type", "n", "total")
                .unionByName(part)
                .groupBy("event_type")
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("total").cast("decimal(18,4)").alias("total"),
                )
            )
        else:
            merged = part
        nxt = os.path.join(state_dir, f"v_{uuid.uuid4().hex[:8]}")
        merged.write.parquet(nxt)
        # atomic-ish pointer flip: re-link 'cur' to the new version
        tmp_link = cur_dir + ".tmp"
        if os.path.islink(tmp_link):
            os.unlink(tmp_link)
        os.symlink(nxt, tmp_link)
        os.replace(tmp_link, cur_dir)

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(os.path.join(state_dir, "cur"))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("total").cast("double").alias("total"),
        )
    )


@register(
    "f14_variant_extract",
    f"""
    WITH e AS (
      SELECT event_type, value,
             CASE WHEN json_valid(props) THEN props END AS props
      FROM events)
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
           count(*) FILTER (WHERE props->>'nope' IS NULL) AS n_missing,
           {_dsum_sql("round(value * 2, 6)")} AS sum_doubled
    FROM e GROUP BY event_type
    """,
)
def f14_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT columns (Spark 4): ``parse_json`` turns
    the raw ``props`` JSON into the binary VARIANT encoding — schema-free
    like a string, but field access is O(path) on the encoded tree
    instead of a re-parse per extraction, the storage answer for
    heterogeneous event payloads at 100 TB. Exercised end to end:
    typed path extraction (``variant_get`` '$.k' as int), graceful
    missing-path handling (``try_variant_get`` → NULL, never an error),
    and a NESTED array path ('$.vs[1]') through a JSON→VARIANT roundtrip
    of a constructed document — the oracle recomputes every extraction
    relationally. try_parse_json (not parse_json): a malformed payload
    in a heterogeneous event stream parses to NULL instead of failing
    the scan — the oracle mirrors with a json_valid guard."""
    ev = table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    nested = F.parse_json(
        F.to_json(
            F.struct(
                F.col("user_id").alias("uid"),
                F.array(F.col("value"), F.col("value") * 2).alias("vs"),
            )
        )
    )
    return (
        ev.select(
            "event_type",
            F.variant_get(v, "$.k", "int").alias("k"),
            F.try_variant_get(v, "$.nope", "string").alias("missing"),
            F.round(F.variant_get(nested, "$.vs[1]", "double"), 6).alias(
                "doubled"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("missing").isNull(), 1)).alias("n_missing"),
            _dsum(F.col("doubled")).alias("sum_doubled"),
        )
    )


@register(
    "ts_ewma",
    """
    WITH w AS (
      SELECT event_id, user_id,
             list(value) FILTER (value IS NOT NULL) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
      FROM events WHERE user_id < 50)
    SELECT event_id, user_id,
           CASE WHEN len(vals) = 0 THEN NULL ELSE
           CAST(floor(
             CAST(list_sum(list_transform(vals,
               (x, i) -> CAST(floor(x * pow(0.9, len(vals) - i) * 1e6 + 0.5)
                              AS BIGINT))) AS DOUBLE) * 1000.0
             / list_sum(list_transform(vals,
               (x, i) -> CAST(floor(pow(0.9, len(vals) - i) * 1e6 + 0.5)
                              AS BIGINT)))
             + 0.5) AS BIGINT) END AS ewma_milli
    FROM w
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (pandas
    ``ewm(alpha=0.1, adjust=True)`` semantics, truncated to the last 20
    rows — weights beyond 20 lags are < 0.9^20 ≈ 12% and the truncation
    makes state O(frame), the streaming-compatible form). Arithmetic is
    fixed-point: each weighted term and each weight is floored to
    integer micro-units and summed as BIGINT (order-independent), with
    one final IEEE division — no float-sum association drift between
    engines. The trailing frame + zip_with shape is the w9 pattern;
    at 100 TB the window partitions by entity like any running agg."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    vals = F.collect_list("value").over(w)
    exps = F.sequence(F.size("vals") - 1, F.lit(0), F.lit(-1))
    num = F.aggregate(
        F.zip_with(
            F.col("vals"),
            exps,
            lambda x, k: F.floor(x * F.pow(F.lit(0.9), k) * 1e6 + 0.5).cast(
                "long"
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(
            exps,
            lambda k: F.floor(F.pow(F.lit(0.9), k) * 1e6 + 0.5).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        ev.select("event_id", "user_id", vals.alias("vals"))
        .select(
            "event_id",
            "user_id",
            # empty frame (every value in the trailing window NULL) has
            # no average — NULL out instead of an ANSI 0/0 (r16)
            F.when(
                F.size("vals") > 0,
                F.floor(num.cast("double") * 1000.0 / den + 0.5).cast("long"),
            ).alias("ewma_milli"),
        )
    )


@register(
    "dq_k_anonymity",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS n
      FROM customer GROUP BY 1, 2)
    SELECT count(*) AS n_groups,
           count(*) FILTER (WHERE n < 5) AS n_risky_groups,
           CAST(coalesce(sum(n) FILTER (WHERE n < 5), 0) AS BIGINT)
             AS n_risky_rows,
           CAST(min(n) AS BIGINT) AS min_group_size
    FROM g
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation,
    segment): groups smaller than k=5 re-identify their members, so the
    release gate needs the risky-group and affected-row counts plus the
    worst group size. One grouped count + one tiny aggregate — the
    privacy twin of `dq_constraints`, and the pre-check before
    generalization/suppression."""
    cust = table(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n")
    )
    risky = F.col("n") < 5
    return g.agg(
        F.count("*").alias("n_groups"),
        F.count_if(risky).alias("n_risky_groups"),
        F.coalesce(F.sum(F.when(risky, F.col("n"))), F.lit(0)).alias(
            "n_risky_rows"
        ),
        F.min("n").alias("min_group_size"),
    )


@register(
    "ml_negative_pairs",
    f"""
    WITH n AS (SELECT count(*) AS n FROM documents),
    anchors AS (SELECT doc_id, lang FROM documents WHERE doc_id % 7 = 0),
    negs AS (
      SELECT a.doc_id, j,
             (a.doc_id + 1 +
              ({H.hash64_sql("a.doc_id::VARCHAR || ':' || j::VARCHAR", 23)}
               % (n.n - 1))) % n.n AS neg_id
      FROM anchors a CROSS JOIN n
      CROSS JOIN (SELECT unnest([1, 2, 3]) AS j))
    SELECT negs.doc_id, negs.j, negs.neg_id, d.lang AS neg_lang
    FROM negs JOIN documents d ON d.doc_id = negs.neg_id
    """,
)
def ml_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive negative sampling: each anchor document draws 3
    deterministic negatives via seeded-hash modular offsets in
    [1, N-1] — never itself, reproducible across runs/engines (no RNG),
    uniform over the corpus. The join back to the corpus attaches the
    negative's features (here its language) — at scale that join
    shuffles on doc_id like any fact join, and the offset trick needs
    only the corpus COUNT broadcast, not an id table."""
    docs = table(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n"))
    anchors = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    js = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j")
    negs = (
        anchors.crossJoin(F.broadcast(n))
        .select("doc_id", "n", js)
        .select(
            "doc_id",
            "j",
            (
                (
                    F.col("doc_id")
                    + 1
                    + H.hash64(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit(":"),
                            F.col("j").cast("string"),
                        ),
                        seed=23,
                    )
                    % (F.col("n") - 1)
                )
                % F.col("n")
            ).alias("neg_id"),
        )
    )
    d = docs.select(F.col("doc_id").alias("neg_id"), F.col("lang").alias("neg_lang"))
    return negs.join(d, "neg_id").select("doc_id", "j", "neg_id", "neg_lang")


@register(
    "ts_hypertable_rollup",
    """
    WITH ev AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    b AS (
      SELECT floor(epoch(date_trunc('day', ts)))::BIGINT AS day_epoch,
             floor(epoch(date_trunc('hour', ts)))::BIGINT AS hour_epoch,
             value
      FROM ev)
    SELECT CASE WHEN grouping(hour_epoch) = 1 THEN 'day' ELSE 'hour' END
             AS granularity,
           day_epoch,
           CASE WHEN grouping(hour_epoch) = 1 THEN NULL ELSE hour_epoch END
             AS hour_epoch,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM b
    GROUP BY GROUPING SETS ((day_epoch), (day_epoch, hour_epoch))
    """,
)
def ts_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hour AND day continuous
    aggregates materialized in ONE pass via GROUPING SETS (no
    re-reading the raw hypertable per granularity; map-side partials
    feed both set levels). The labels disambiguate levels; at 100 TB
    coarser granularities come almost free once the finest is paid for,
    and each level is independently mergeable for incremental refresh
    (the `incremental_agg_merge` pattern)."""
    import uuid

    ev = table(spark, sf_dir, "events").select(
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_epoch"),
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
        "value",
    )
    name = f"__htr_{uuid.uuid4().hex[:8]}"
    ev.createOrReplaceTempView(name)
    return spark.sql(
        f"""
        SELECT CASE WHEN grouping(hour_epoch) = 1 THEN 'day' ELSE 'hour' END
                 AS granularity,
               day_epoch,
               CASE WHEN grouping(hour_epoch) = 1 THEN NULL ELSE hour_epoch END
                 AS hour_epoch,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM {name}
        GROUP BY GROUPING SETS ((day_epoch), (day_epoch, hour_epoch))
        """
    )


@register(
    "a5_kmv_distinct",
    f"""
    WITH h AS (
      SELECT DISTINCT {H.hash64_sql('tok', 29)} AS hv
      FROM (SELECT unnest({_TOKS_SQL}) AS tok FROM documents)),
    mins AS (SELECT hv FROM h ORDER BY hv LIMIT 16),
    kth AS (SELECT max(hv) AS hk, count(*) AS k FROM mins)
    SELECT k, hk,
           CAST(floor((k - 1) * 1152921504606846976.0 / hk) AS BIGINT)
             AS kmv_estimate,
           (SELECT count(*) FROM h) AS exact_distinct
    FROM kth
    """,
)
def a5_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch: keep the k=16
    smallest 60-bit hashes of the value set; the k-th smallest estimates
    cardinality as (k-1)·2^60 / h_k. Unlike HLL (engine-specific,
    rows-only `a5_approx_distinct`), the md5 hash family makes this
    sketch BIT-IDENTICAL cross-engine — the estimate itself is
    oracle-verified next to the exact count. Mergeable at scale: union
    the per-partition min-k sets and re-take k smallest (a
    TakeOrdered, no full shuffle of the distinct set)."""
    docs = table(spark, sf_dir, "documents")
    h = (
        docs.select(F.explode(H.tokens(F.col("text"))).alias("tok"))
        .select(H.hash64(F.col("tok"), seed=29).alias("hv"))
        .distinct()
    )
    mins = h.orderBy("hv").limit(16)
    kth = mins.agg(F.max("hv").alias("hk"), F.count("*").alias("k"))
    exact = h.agg(F.count("*").alias("exact_distinct"))
    return kth.crossJoin(F.broadcast(exact)).select(
        "k",
        "hk",
        F.floor((F.col("k") - 1) * 1152921504606846976.0 / F.col("hk"))
        .cast("bigint")
        .alias("kmv_estimate"),
        "exact_distinct",
    )


@register(
    "graph_copurchase",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
)
def graph_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase graph (bipartite projection of the order→part graph):
    part pairs that share an order, counted across orders — the
    market-basket / related-items edge list. The self-join is keyed on
    l_orderkey, so pair fan-out is bounded by (items per order choose
    2), NOT corpus size — the same bounded-blowup argument as the LSH
    band join; the canonical a<b ordering halves the pairs and makes
    edges unique."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@register(
    "s22_orphan_files",
    """
    SELECT count(*) FILTER (WHERE doc_id % 5 = 0) AS n_orphans,
           count(*) FILTER (WHERE doc_id % 5 <> 0) AS n_tracked
    FROM documents WHERE doc_id < 200 AND text IS NOT NULL
    """,
)
def s22_orphan_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake janitor: files present in storage but absent from the
    catalog (orphans from failed writes / manual drops). Storage is
    listed with the binaryFile source, the catalog side is the tracked
    subset (here every doc_id % 5 != 0), and a broadcast ANTI-join
    splits orphans from tracked — the reconciliation sweep that
    precedes a vacuum. At 100 TB the listing is the expensive side;
    the catalog path column broadcasts."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    dest = tempfile.mkdtemp(prefix="orphan_scan_")

    def write_files(rows):
        for r in rows:
            if r["text"] is None:  # null payloads never reach the bucket
                continue
            with open(os.path.join(dest, f"{r['doc_id']}.bin"), "wb") as f:
                f.write(r["text"].encode("utf-8"))

    docs.foreachPartition(write_files)
    from ..sources.binary import read_binary_dir

    listed = read_binary_dir(spark, dest).select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id")
    )
    catalog = docs.filter(F.col("doc_id") % 5 != 0).select("doc_id")
    # both sides are corpus-sized id lists — unhinted; at 100 TB the
    # orphan sweep is a shuffled anti/semi join on doc_id
    orphans = listed.join(catalog, "doc_id", "left_anti")
    tracked = listed.join(catalog, "doc_id", "left_semi")
    return orphans.agg(F.count("*").alias("n_orphans")).crossJoin(
        tracked.agg(F.count("*").alias("n_tracked"))
    )


_MULTIPROBE_SQL = f"""
WITH b AS (SELECT vec_id, {SIM.hyperplane_signature_sql('embedding', 6)} AS bucket,
                  embedding FROM embeddings WHERE embedding IS NOT NULL),
q AS (SELECT vec_id AS q_id, bucket, embedding AS qe FROM b WHERE vec_id IN (0, 1, 2)),
probes AS (
  SELECT q_id, qe,
         unnest([bucket, {", ".join(f"xor(bucket, {1 << p})" for p in range(6))}])
           AS bucket
  FROM q),
scored AS (
  SELECT p.q_id, e.vec_id, round({V.cosine_sql('e.embedding', 'p.qe')}, 6) AS cos
  FROM b e JOIN probes p ON e.bucket = p.bucket)
SELECT q_id, vec_id, cos, rank FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 5
"""


@register("ann_multiprobe_topk", _MULTIPROBE_SQL)
def ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: besides its own hyperplane bucket, each query
    probes the 6 one-bit-flip NEIGHBOR buckets — the standard recall
    fix for points near a hyperplane, trading a bounded ×(planes+1)
    candidate fan-out for far better recall than a single probe, with
    no extra tables or index passes (probing is pure key arithmetic on
    the query side; the data side is still one bucket per vector).
    Null vectors excluded per the similarity-search contract."""
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    b = emb.select(
        "vec_id",
        SIM.hyperplane_signature(F.col("embedding"), 6).alias("bucket"),
        "embedding",
    )
    q = b.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("q_id"),
        "bucket",
        F.col("embedding").alias("qe"),
    )
    probes = q.select(
        "q_id",
        "qe",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << p))
                    for p in range(6)
                ],
            )
        ).alias("bucket"),
    )
    scored = b.join(F.broadcast(probes), "bucket").select(
        "q_id",
        "vec_id",
        F.round(V.cosine(F.col("embedding"), F.col("qe")), 6).alias("cos"),
    )
    return topk_per_group(
        scored, ["q_id"], [F.col("cos").desc(), F.col("vec_id")], 5, rank_col="rank"
    ).select("q_id", "vec_id", "cos", "rank")


_MATRYOSHKA_SQL = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
           WHERE vec_id IN (0, 1, 2)),
pre AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY round({V.cosine_sql('e.embedding[1:16]', 'q.qe[1:16]')}, 6) DESC,
                      e.vec_id) AS rank
    FROM embeddings e, q) WHERE rank <= 10),
exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY round({V.cosine_sql('e.embedding', 'q.qe')}, 6) DESC,
                      e.vec_id) AS rank
    FROM embeddings e, q) WHERE rank <= 10)
SELECT exact.q_id,
       count(pre.vec_id) AS n_hit,
       floor(count(pre.vec_id) / 10.0 * 1e6 + 0.5) / 1e6 AS recall_at_10
FROM exact LEFT JOIN pre USING (q_id, vec_id)
GROUP BY exact.q_id
"""


@register("ann_matryoshka_recall", _MATRYOSHKA_SQL)
def ann_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka/MRL-style truncated-embedding evaluation: recall@10 of
    ranking by only the FIRST 16 of 64 dimensions against the full-dim
    exact top-10 — the measurement behind serving truncated embedding
    prefixes (4× less scan + memory per query, the dimensionality twin
    of ann_sq8_recall's compression axis). Both rankings are
    deterministic window top-ks; the prefix is a zero-copy array slice,
    no re-embedding pass."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries_df = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    pre16 = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    q16 = queries_df.select("q_id", F.slice("embedding", 1, 16).alias("embedding"))
    pre = SIM.brute_force_topk(pre16, q16, k=10).select("q_id", "vec_id")
    exact = SIM.brute_force_topk(emb, queries_df, k=10).select("q_id", "vec_id")
    n_hit = (
        exact.join(pre, ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        exact.select("q_id")
        .distinct()
        .join(n_hit, "q_id", "left")
        .select("q_id", F.coalesce("n_hit", F.lit(0)).alias("n_hit"))
        .select(
            "q_id",
            "n_hit",
            (F.floor(F.col("n_hit") / 10.0 * 1e6 + F.lit(0.5)) / 1e6).alias(
                "recall_at_10"
            ),
        )
    )


_RECALL_SQL = f"""
WITH b AS (SELECT vec_id, {SIM.hyperplane_signature_sql('embedding', 6)} AS bucket,
                  embedding FROM embeddings WHERE embedding IS NOT NULL),
q AS (SELECT vec_id AS q_id, bucket, embedding AS qe FROM b WHERE vec_id IN (0, 1, 2)),
ann AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY round({V.cosine_sql('e.embedding', 'q.qe')}, 6) DESC,
                      e.vec_id) AS rank
    FROM b e JOIN q ON e.bucket = q.bucket) WHERE rank <= 5),
exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY round({V.cosine_sql('e.embedding', 'q.qe')}, 6) DESC,
                      e.vec_id) AS rank
    FROM b e, q) WHERE rank <= 5)
SELECT exact.q_id,
       count(ann.vec_id) AS n_hit,
       floor(count(ann.vec_id) / 5.0 * 1e6 + 0.5) / 1e6 AS recall_at_5
FROM exact LEFT JOIN ann USING (q_id, vec_id)
GROUP BY exact.q_id
"""


@register("ann_recall_eval", _RECALL_SQL)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation IN the engine: single-probe LSH top-5
    joined against the exact brute-force top-5 ground truth → recall@5
    per query. The standard index-tuning loop (raise planes/probes
    until recall clears the bar) as one query — at scale ground truth
    runs on a sampled query set while the index serves the rest.
    Null vectors excluded per the similarity-search contract."""
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    ann = SIM.lsh_ann_topk(emb, queries, k=5, num_planes=6).select(
        "q_id", "vec_id"
    )
    exact = SIM.brute_force_topk(emb, queries, k=5).select("q_id", "vec_id")
    hit = exact.join(ann, ["q_id", "vec_id"], "left_semi")
    n_hit = hit.groupBy("q_id").agg(F.count("*").alias("n_hit"))
    base = exact.select("q_id").distinct()
    return (
        base.join(n_hit, "q_id", "left")
        .select("q_id", F.coalesce("n_hit", F.lit(0)).alias("n_hit"))
        .select(
            "q_id",
            "n_hit",
            (F.floor(F.col("n_hit") / 5.0 * 1e6 + F.lit(0.5)) / 1e6).alias(
                "recall_at_5"
            ),
        )
    )


@register(
    "dedup_simhash_pairs",
    f"""
    WITH fa AS ({_simhash_sql(32)}), fb AS ({_simhash_sql(32)})
    SELECT fa.doc_id AS a_id, fb.doc_id AS b_id,
           bit_count(xor(fa.fp, fb.fp)) AS hamming
    FROM fa JOIN fb ON fa.doc_id < fb.doc_id
    WHERE bit_count(xor(fa.fp, fb.fp)) <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS with hamming-band blocking: the 32-bit
    fingerprint splits into 4 bytes; by pigeonhole, any pair within
    hamming distance 3 shares at least one whole byte, so the band
    equi-join provably finds EVERY qualifying pair (the oracle checks
    against the brute-force all-pairs definition) while candidates stay
    bucket-bounded — the simhash completion of the MinHash band-join
    story, no cross join anywhere.

    Registered at the 32-bit / 8-bit-band setting its DuckDB oracle
    evaluates exactly; ``operators.dedup.simhash_pairs`` exposes
    ``band_bits`` as the corpus-size dial (SCALING.md measures the
    widened 60/15 setting at k=8 data — the band-widening scale path)."""
    return D.simhash_pairs(
        table(spark, sf_dir, "documents"),
        num_bits=32,
        band_bits=8,
        max_hamming=3,
    )


@register(
    "ts_rank_shift",
    """
    WITH halves AS (
      SELECT event_type,
             CASE WHEN day(CAST(ts AS TIMESTAMP)) <= 15 THEN 'h1' ELSE 'h2' END
               AS half,
             count(*) AS n
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT event_type, half, n,
             row_number() OVER (PARTITION BY half ORDER BY n DESC, event_type)
               AS r
      FROM halves)
    SELECT a.event_type, a.r AS rank_h1, b.r AS rank_h2,
           a.r - b.r AS rank_gain
    FROM ranked a JOIN ranked b USING (event_type)
    WHERE a.half = 'h1' AND b.half = 'h2'
    """,
)
def ts_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-shift trending report: event types ranked by volume in the
    first vs second half of the month, with the rank delta (positive =
    climbing). Ranks run over the tiny post-aggregate; the period
    comparison is a self-join on the ranked table — the "movers and
    shakers" report shape."""
    ev = table(spark, sf_dir, "events")
    halves = ev.groupBy(
        "event_type",
        F.when(F.dayofmonth("ts") <= 15, "h1").otherwise("h2").alias("half"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("half").orderBy(F.col("n").desc(), "event_type")
    ranked = halves.select("event_type", "half", F.row_number().over(w).alias("r"))
    a = ranked.filter(F.col("half") == "h1").select(
        "event_type", F.col("r").alias("rank_h1")
    )
    b = ranked.filter(F.col("half") == "h2").select(
        "event_type", F.col("r").alias("rank_h2")
    )
    return a.join(b, "event_type").select(
        "event_type",
        "rank_h1",
        "rank_h2",
        (F.col("rank_h1") - F.col("rank_h2")).alias("rank_gain"),
    )


@register(
    "a15_abc_classify",
    """
    WITH p AS (
      SELECT l.l_partkey, pt.p_brand,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS rev
      FROM lineitem l JOIN part pt ON l.l_partkey = pt.p_partkey
      GROUP BY 1, 2),
    c AS (
      SELECT p_brand, l_partkey, rev,
             CAST(sum(CAST(rev AS DECIMAL(18,4))) OVER (
               PARTITION BY p_brand ORDER BY rev DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS cum,
             CAST(sum(CAST(rev AS DECIMAL(18,4))) OVER (PARTITION BY p_brand)
               AS DOUBLE) AS tot
      FROM p)
    SELECT p_brand,
           CASE WHEN cum / tot <= 0.8 THEN 'A'
                WHEN cum / tot <= 0.95 THEN 'B' ELSE 'C' END AS abc,
           count(*) AS n_parts,
           CAST(sum(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS class_rev
    FROM c GROUP BY 1, 2
    """,
)
def a15_abc_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: parts bucketed by cumulative revenue
    share within their brand (A = first 80%, B = to 95%, C = tail). The
    running share is a BRAND-partitioned window over the part-level
    aggregate — post-agg altitude, decimal window sums for exact
    cumulative totals, the inventory-analysis staple."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    p = (
        li.join(part, li.l_partkey == part.p_partkey)  # linear-in-SF: stats decide
        .groupBy("l_partkey", "p_brand")
        .agg(_dsum(F.col("l_extendedprice")).alias("rev"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("rev").desc(), "l_partkey")
    cum = (
        F.sum(F.col("rev").cast("decimal(18,4)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
    )
    tot = (
        F.sum(F.col("rev").cast("decimal(18,4)"))
        .over(Window.partitionBy("p_brand"))
        .cast("double")
    )
    c = p.select(
        "p_brand",
        "rev",
        F.when(cum / tot <= 0.8, "A")
        .when(cum / tot <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return c.groupBy("p_brand", "abc").agg(
        F.count("*").alias("n_parts"),
        _dsum(F.col("rev")).alias("class_rev"),
    )


@register(
    "a16_share_of_parent",
    """
    WITH n AS (
      SELECT r.r_name, na.n_name,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation na ON c.c_nationkey = na.n_nationkey
      JOIN region r ON na.n_regionkey = r.r_regionkey
      GROUP BY 1, 2),
    rt AS (SELECT r_name, CAST(sum(CAST(rev AS DECIMAL(18,4))) AS DOUBLE)
                    AS region_rev
           FROM n GROUP BY r_name)
    SELECT n.r_name, n.n_name, n.rev,
           floor(n.rev / rt.region_rev * 1e6 + 0.5) / 1e6 AS share_of_region
    FROM n JOIN rt USING (r_name)
    """,
)
def a16_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent in the region→nation hierarchy: nation revenue as
    a fraction of its region's — child aggregate once, parent totals
    re-aggregated FROM THE CHILD level (never rescanning facts) and
    broadcast back. The drill-down percent-of-total OLAP staple with
    decimal-exact totals at both levels."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    n = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)  # linear-in-SF
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(_dsum(F.col("o_totalprice")).alias("rev"))
    )
    rt = n.groupBy("r_name").agg(
        F.sum(F.col("rev").cast("decimal(18,4)")).cast("double").alias("region_rev")
    )
    return n.join(F.broadcast(rt), "r_name").select(
        "r_name",
        "n_name",
        "rev",
        (
            F.floor(F.col("rev") / F.col("region_rev") * 1e6 + F.lit(0.5)) / 1e6
        ).alias("share_of_region"),
    )


@register(
    "seq_first_last_flow",
    """
    WITH s AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
    fl AS (
      SELECT user_id,
             min({'ts': ts, 'event_id': event_id, 'event_type': event_type})
               AS first_r,
             max({'ts': ts, 'event_id': event_id, 'event_type': event_type})
               AS last_r
      FROM s GROUP BY user_id)
    SELECT first_r.event_type AS first_type,
           last_r.event_type AS last_type,
           count(*) AS n_users
    FROM fl GROUP BY 1, 2
    """,
)
def seq_first_last_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry→exit flow (Sankey endpoints): each user's FIRST and LAST
    event types via min/max over a (ts, event_id, payload) struct — the
    deterministic argmin/argmax idiom (ties broken by event_id inside
    the struct ordering, no window needed), then flow-pair counts. One
    grouped agg + one tiny count. Endpoint selection orders by
    (ts, event_id) — rows missing either have no position in the
    journey and are excluded on both sides (r16 contract; engine
    struct-comparison null conventions differ)."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_id").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    r = F.struct("ts", "event_id", "event_type")
    fl = ev.groupBy("user_id").agg(
        F.min(r).alias("first_r"), F.max(r).alias("last_r")
    )
    return fl.groupBy(
        F.col("first_r.event_type").alias("first_type"),
        F.col("last_r.event_type").alias("last_type"),
    ).agg(F.count("*").alias("n_users"))


@register(
    "p12_per_source_cap",
    f"""
    WITH r AS (
      SELECT source, lang,
             row_number() OVER (PARTITION BY source
               ORDER BY {H.hash64_sql('doc_id::VARCHAR', 31)}, doc_id) AS rn
      FROM documents)
    SELECT source,
           count(*) FILTER (WHERE rn <= 15) AS n_kept,
           count(*) FILTER (WHERE rn > 15) AS n_capped
    FROM r GROUP BY source
    """,
)
def p12_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (anti-domination): at most K=15 docs per
    source survive, chosen by seeded-hash order so the kept subset is
    reproducible — the guard against one crawl domain flooding the
    training mix. One source-partitioned window; at 100 TB the
    two-phase per-partition pre-cap (keep K per partition, then K of
    those) bounds window state."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        H.hash64(F.col("doc_id"), seed=31), "doc_id"
    )
    r = docs.select("source", F.row_number().over(w).alias("rn"))
    return r.groupBy("source").agg(
        F.count_if(F.col("rn") <= 15).alias("n_kept"),
        F.count_if(F.col("rn") > 15).alias("n_capped"),
    )


@register(
    "a17_hist_median",
    """
    WITH h AS (
      SELECT CAST(floor(o_totalprice / 20000) AS BIGINT) AS b, count(*) AS n
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
    c AS (
      SELECT b, n,
             sum(n) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS below,
             sum(n) OVER () AS total
      FROM h),
    med AS (
      SELECT b, n, coalesce(below, 0) AS below, total FROM c
      WHERE coalesce(below, 0) < (total + 1) / 2.0
        AND (total + 1) / 2.0 <= coalesce(below, 0) + n)
    SELECT floor((b * 20000
                  + ((total + 1) / 2.0 - below) / n * 20000) * 1e4 + 0.5) / 1e4
             AS hist_median_est,
           round((SELECT quantile_cont(o_totalprice, 0.5) FROM orders
                  WHERE o_totalprice IS NOT NULL), 4)
             AS exact_median
    FROM med
    """,
)
def a17_hist_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based median ESTIMATE with its accuracy on display: the
    fixed-width histogram (one mergeable grouped count — the streaming-
    friendly path) locates the median bucket and interpolates within
    it; the exact interpolated median sits beside it in the same row.
    Like the KMV sketch, every arithmetic step is deterministic, so the
    oracle verifies the approximation itself — at 100 TB the histogram
    needs one map-side-combined pass while exact quantiles need a
    sort/percentile machinery. Median over NON-NULL values — a null
    price has no bucket (r16 contract)."""
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    h = orders.groupBy(
        F.floor(F.col("o_totalprice") / 20000).cast("bigint").alias("b")
    ).agg(F.count("*").alias("n"))
    wo = Window.orderBy("b")
    c = h.select(
        "b",
        "n",
        F.coalesce(
            F.sum("n").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("below"),
        F.sum("n").over(Window.partitionBy()).alias("total"),
    )
    half = (F.col("total") + 1) / 2.0
    med = c.filter((F.col("below") < half) & (half <= F.col("below") + F.col("n")))
    est = (
        F.col("b") * 20000
        + (half - F.col("below")) / F.col("n") * 20000
    )
    exact = orders.agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("exact_median")
    )
    return med.select(
        (F.floor(est * 1e4 + F.lit(0.5)) / 1e4).alias("hist_median_est")
    ).crossJoin(F.broadcast(exact))


@register(
    "a18_outlier_zscore",
    """
    WITH st AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
             CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS ss
      FROM events GROUP BY event_type),
    m AS (
      SELECT event_type, s / n AS mu,
             sqrt(greatest(ss / n - (s / n) * (s / n), 0.0)) AS sigma
      FROM st)
    SELECT e.event_type,
           count(*) FILTER (WHERE abs(e.value - m.mu) > 3 * m.sigma)
             AS n_outliers,
           count(*) AS n
    FROM events e JOIN m USING (event_type)
    GROUP BY e.event_type
    """,
)
def a18_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier counting per group: mean and stddev from DECIMAL
    power sums (one scan, order-independent — the same reason as
    `a8_corr`), broadcast back, deviations counted in a second map-only
    pass. sqrt and IEEE ±*/ are deterministic cross-engine, unlike
    built-in stddev's streaming update order."""
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    v = F.col("value")
    st = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        _dsum(v).alias("s"),
        F.sum((v * v).cast("decimal(28,4)")).cast("double").alias("ss"),
    )
    mu = F.col("s") / F.col("n")
    sigma = F.sqrt(F.greatest(F.col("ss") / F.col("n") - mu * mu, F.lit(0.0)))
    m = st.select("event_type", mu.alias("mu"), sigma.alias("sigma"))
    return (
        ev.join(F.broadcast(m), "event_type")
        .groupBy("event_type")
        .agg(
            F.count_if(
                F.abs(v - F.col("mu")) > 3 * F.col("sigma")
            ).alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


_TDIGEST_QS = [0.25, 0.5, 0.75, 0.95]

_TDIGEST_SQL = f"""
WITH e AS (
  SELECT quantile_cont(value, {_TDIGEST_QS}) AS arr, count(*) AS n
  FROM events WHERE value IS NOT NULL)
SELECT ({_TDIGEST_QS}::DOUBLE[])[i] AS q,
       n AS n_total,
       round(arr[i], 4) AS exact_q,
       true AS within_tol
FROM e, UNNEST(generate_series(1, {len(_TDIGEST_QS)})) AS t(i)
ORDER BY q
"""


def _tdigest_rank_check(ev: DataFrame, approx: DataFrame) -> DataFrame:
    """Shared external-check tail for the t-digest queries: join the
    (q, approx) digest estimates back to the data — exact percentile
    value-compared, the estimate graded as a midrank-tolerance boolean
    (see a19_tdigest_quantile docstring for the bound)."""
    q_arr = F.array(*[F.lit(x) for x in _TDIGEST_QS])
    stats = (
        ev.agg(
            F.count("*").alias("n_total"),
            F.percentile("value", q_arr).alias("ex"),
        )
        .select("n_total", F.posexplode("ex").alias("pos", "exact_q"))
        .select(
            F.element_at(q_arr, F.col("pos") + 1).alias("q"),
            "n_total",
            F.round("exact_q", 4).alias("exact_q"),
        )
    )
    rank = (
        ev.crossJoin(F.broadcast(approx))
        .groupBy("q")
        .agg(
            (
                (
                    F.count_if(F.col("value") < F.col("approx"))
                    + F.count_if(F.col("value") <= F.col("approx"))
                )
                / (2.0 * F.count("*"))
            ).alias("midrank")
        )
    )
    return (
        stats.join(F.broadcast(rank), "q")
        .select(
            "q",
            "n_total",
            "exact_q",
            (F.abs(F.col("midrank") - F.col("q")) <= 0.02).alias("within_tol"),
        )
        .orderBy("q")
    )


@register("a19_tdigest_quantile", _TDIGEST_SQL)
def a19_tdigest_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom mergeable quantile sketch: a two-stage t-digest
    (operators/tdigest.py — per-Arrow-batch digests via mapInPandas,
    tiny centroid rows merged in one final task) estimating 4 quantiles
    of events.value in ONE scan + one O(δ·batches) reduction — the
    100 TB percentile path where exact `percentile` would global-sort.

    External check (same discipline as a5_approx_distinct /
    ann_recall_eval): the sketch estimate is batch-boundary-sensitive,
    so what leaves the engine is the EXACT interpolated percentile
    (value-compared against DuckDB quantile_cont) plus a boolean
    asserting the t-digest's published rank-error bound: the midrank of
    the estimate must sit within ±0.02 of the target quantile (δ=200
    bounds rank error at ≈4·q(1−q)/δ ≤ 0.005 — 4× margin). Midrank
    (count(<) + count(≤))/2 keeps the check stable across the 2-decimal
    tie mass in events.value. A broken digest reports false and
    red-rows the round.

    r16 contract: quantiles are over NON-NULL values — a null value has
    no rank, and leaving it in the midrank denominator silently shifts
    the rank check by the null rate (the null-shifted-bucket-stat fuzz
    mechanism). Both sides filter value IS NOT NULL."""
    from ..operators import tdigest as TD

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("value")
    )
    return _tdigest_rank_check(ev, TD.quantiles(ev, "value", _TDIGEST_QS))


@register("streaming_tdigest", _TDIGEST_SQL)
def streaming_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quantile monitoring: the t-digest's MERGEABILITY is
    what makes it a streaming sketch — each micro-batch compresses to
    ≤δ centroid rows written once under its batch id (idempotent on
    replay: an existing batch directory is never rewritten — the same
    exactly-once discipline as streaming_foreachbatch_merge), and the
    monitor's estimate is the merge of ALL batches' centroids, which by
    associativity equals a single digest over the full stream. State
    grows O(δ) per batch and never touches raw history — the shape of
    a production latency/price quantile dashboard fed by a stream.

    The stream is the events file staged as 4 shards read
    one-per-micro-batch (availableNow); the external check is the same
    exact-percentile + midrank-tolerance contract as
    a19_tdigest_quantile, so the streamed-and-merged digest is graded
    against the full batch table."""
    from ..operators import tdigest as TD

    base = tempfile.mkdtemp(prefix="stdg_")
    stream_dir = os.path.join(base, "in")
    cent_dir = os.path.join(base, "centroids")
    # non-null contract shared with a19_tdigest_quantile (r16)
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("value")
    )
    ev.repartition(4).write.parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema

    applied: set[int] = set()

    def add_digest(batch_df, batch_id: int) -> None:
        if batch_id in applied:
            return
        applied.add(batch_id)
        out = os.path.join(cent_dir, f"batch_{batch_id}")
        if os.path.isdir(out):  # replayed after restart: already merged
            return
        TD.sketch(batch_df, "value").write.parquet(out)

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(add_digest)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cent = (
        spark.read.option("recursiveFileLookup", "true")
        .schema("mean double, weight double")
        .parquet(cent_dir)
    )
    approx = TD.quantiles_from_centroids(cent, _TDIGEST_QS)
    return _tdigest_rank_check(ev, approx)


@register(
    "dq_shard_balance",
    f"""
    WITH s AS (
      SELECT {H.hash64_sql('doc_id::VARCHAR', 99)} % 32 AS shard, count(*) AS n
      FROM documents GROUP BY 1)
    SELECT count(*) AS n_shards,
           CAST(min(n) AS BIGINT) AS min_rows,
           CAST(max(n) AS BIGINT) AS max_rows,
           floor(max(n) / (sum(n) / count(*)) * 1e4 + 0.5) / 1e4
             AS skew_factor
    FROM s
    """,
)
def dq_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance diagnostic for the hash partitioning the engine's
    training-order/packing ops rely on: rows per shard, extremes, and
    the skew factor (max/mean — 1.0 is perfect). The ops report that
    decides whether a salting or re-sharding pass is needed BEFORE a
    skewed key ruins a 1000-executor stage; cost is one grouped count."""
    docs = table(spark, sf_dir, "documents")
    s = docs.groupBy(
        (H.hash64(F.col("doc_id"), seed=99) % 32).alias("shard")
    ).agg(F.count("*").alias("n"))
    skew = F.col("max_rows") / (F.col("total") / F.col("n_shards"))
    return (
        s.agg(
            F.count("*").alias("n_shards"),
            F.min("n").alias("min_rows"),
            F.max("n").alias("max_rows"),
            F.sum("n").alias("total"),
        )
        .select(
            "n_shards",
            "min_rows",
            "max_rows",
            (F.floor(skew * 1e4 + F.lit(0.5)) / 1e4).alias("skew_factor"),
        )
    )


@register(
    "dedup_cluster_sizes",
    "WITH comp AS ("
    + _COMPONENTS_SQL
    + """)
    SELECT cluster_size, count(*) AS n_clusters FROM (
      SELECT component, count(*) AS cluster_size
      FROM comp GROUP BY component)
    GROUP BY cluster_size
    """,
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution: how many singleton / pair /
    larger duplicate groups the corpus contains — the dedup IMPACT
    report (docs removed = Σ(size-1)·clusters) that decides whether
    near-dedup is worth its cost on a new corpus; two tiny aggregates
    over the component assignment."""
    comp = D.dedup_components(
        table(spark, sf_dir, "documents"),
        k=3,
        num_hashes=16,
        bands=4,
        jaccard_threshold=0.1,
    )
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(F.count("*").alias("n_clusters"))


@register(
    "j_lateral_topn",
    """
    SELECT r.r_name, t.n_name, t.n_customers
    FROM region r, LATERAL (
      SELECT n.n_name, count(*) AS n_customers
      FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      WHERE n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name
      ORDER BY n_customers DESC, n.n_name
      LIMIT 2) t
    """,
)
def j_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 nations by customer count FOR
    EACH region, written as the SQL-standard lateral join — Catalyst
    decorrelates it into the join+window plan rather than re-executing
    the subquery per outer row (the per-row loop a naive engine would
    run). Same semantics as `w1_topk_per_group`, exercised through the
    LATERAL SQL path."""
    import uuid

    sfx = uuid.uuid4().hex[:8]
    for t in ("region", "nation", "customer"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"__lat_{t}_{sfx}")
    return spark.sql(
        f"""
        SELECT r.r_name, t.n_name, t.n_customers
        FROM __lat_region_{sfx} r, LATERAL (
          SELECT n.n_name, count(*) AS n_customers
          FROM __lat_nation_{sfx} n
          JOIN __lat_customer_{sfx} c ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY n_customers DESC, n.n_name
          LIMIT 2) t
        """
    )


@register(
    "f_binary_codecs",
    """
    SELECT doc_id,
           upper(md5(text)) AS content_hex,
           to_base64(unhex(md5(text))) AS content_b64,
           octet_length(unhex(md5(text))) AS n_bytes
    FROM documents WHERE doc_id < 50
    """,
)
def f_binary_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec surface: hex ⇄ bytes ⇄ base64 round-trips over the
    content digest — the encodings object keys, manifests, and wire
    formats speak. Pure column functions with identical RFC semantics
    in both engines."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    b = F.unhex(F.md5("text"))
    return docs.select(
        "doc_id",
        F.upper(F.md5("text")).alias("content_hex"),
        F.base64(b).alias("content_b64"),
        F.length(b).alias("n_bytes"),
    )


@register(
    "s23_analyze_stats",
    """
    SELECT 'orders' AS tbl, count(*) AS n_rows,
           count(DISTINCT o_custkey) AS n_distinct_key,
           floor(count(*) FILTER (WHERE o_totalprice IS NULL)::DOUBLE
                 / count(*) * 1e6 + 0.5) / 1e6 AS null_frac
    FROM orders
    UNION ALL
    SELECT 'lineitem', count(*), count(DISTINCT l_orderkey),
           floor(count(*) FILTER (WHERE l_quantity IS NULL)::DOUBLE
                 / count(*) * 1e6 + 0.5) / 1e6
    FROM lineitem
    UNION ALL
    SELECT 'customer', count(*), count(DISTINCT c_nationkey),
           floor(count(*) FILTER (WHERE c_acctbal IS NULL)::DOUBLE
                 / count(*) * 1e6 + 0.5) / 1e6
    FROM customer
    UNION ALL
    SELECT 'documents', count(*), count(DISTINCT lang),
           floor(count(*) FILTER (WHERE text IS NULL)::DOUBLE
                 / count(*) * 1e6 + 0.5) / 1e6
    FROM documents
    """,
)
def s23_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style statistics collection: per-table row counts, key
    cardinalities, and null fractions in one union of single-scan
    aggregates — the stats a cost-based optimizer (and a data-quality
    dashboard) feeds on; each branch is map-side combinable and the
    union is plan-parallel."""

    def one(tbl: str, key: str, nullable: str) -> DataFrame:
        df = table(spark, sf_dir, tbl)
        # try_divide: an empty table has a well-defined stats row (n=0,
        # null_frac NULL), not an ANSI divide-by-zero.
        nf = F.try_divide(
            F.count_if(F.col(nullable).isNull()).cast("double"), F.count("*")
        )
        return df.agg(
            F.count("*").alias("n_rows"),
            F.countDistinct(key).alias("n_distinct_key"),
            (F.floor(nf * 1e6 + F.lit(0.5)) / 1e6).alias("null_frac"),
        ).select(F.lit(tbl).alias("tbl"), "n_rows", "n_distinct_key", "null_frac")

    return (
        one("orders", "o_custkey", "o_totalprice")
        .unionByName(one("lineitem", "l_orderkey", "l_quantity"))
        .unionByName(one("customer", "c_nationkey", "c_acctbal"))
        .unionByName(one("documents", "lang", "text"))
    )


@register(
    "f14_json_hetero",
    """
    WITH j AS (
      SELECT doc_id,
             CASE doc_id % 3
               WHEN 0 THEN '{"kind":"a","len":' || n_chars || '}'
               WHEN 1 THEN '{"kind":"b","lang":"' || lang || '"}'
               ELSE '{"kind":"c"}'
             END AS payload
      FROM documents WHERE doc_id < 300)
    SELECT json_extract_string(payload, '$.kind') AS kind,
           count(*) AS n,
           CAST(coalesce(sum(CAST(json_extract_string(payload, '$.len')
                                  AS BIGINT)), 0) AS BIGINT) AS total_len,
           count(json_extract_string(payload, '$.lang')) AS n_with_lang
    FROM j GROUP BY 1
    """,
)
def f14_json_hetero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous JSON payloads (the landing-zone reality: one column,
    several shapes): extract shared and shape-specific fields with
    null-safe defaults, aggregate per shape — get_json_object returns
    null for absent paths rather than erroring, so one pass handles
    every variant without pre-splitting the stream."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    payload = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('{"kind":"a","len":'),
                F.col("n_chars").cast("string"),
                F.lit("}"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit('{"kind":"b","lang":"'), F.col("lang"), F.lit('"}')),
        )
        .otherwise('{"kind":"c"}')
    )
    j = docs.select("doc_id", payload.alias("payload"))
    kind = F.get_json_object("payload", "$.kind")
    jlen = F.get_json_object("payload", "$.len").cast("bigint")
    jlang = F.get_json_object("payload", "$.lang")
    return j.groupBy(kind.alias("kind")).agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(jlen), F.lit(0)).alias("total_len"),
        F.count(jlang).alias("n_with_lang"),
    )


@register(
    "seq_since_marker",
    """
    WITH s AS (
      SELECT user_id, event_id, event_type,
             CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE user_id < 60),
    seg AS (
      SELECT user_id, event_id, event_type,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_purchases,
             row_number() OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
               AS rn
      FROM s),
    marked AS (
      SELECT user_id, event_id, event_type, n_purchases, rn,
             max(CASE WHEN event_type = 'purchase' THEN rn END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_purchase_rn
      FROM seg)
    SELECT user_id, event_id,
           CAST(rn - coalesce(last_purchase_rn, 0) AS BIGINT)
             AS events_since_purchase
    FROM marked WHERE event_type <> 'purchase'
    """,
)
def seq_since_marker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resettable running counter: for every event, how many events since
    the user's most recent purchase (0-start users count from their
    first event). The reset is the running MAX of the marker's row
    number — no island self-join, one partitioned window pass; the
    recency feature ("actions since last conversion") every behavioral
    model wants."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cur = w.rowsBetween(Window.unboundedPreceding, 0)
    seg = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
    )
    wr = Window.partitionBy("user_id").orderBy("rn").rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = seg.select(
        "user_id",
        "event_id",
        "event_type",
        "rn",
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        )
        .over(wr)
        .alias("last_purchase_rn"),
    )
    return marked.filter(F.col("event_type") != "purchase").select(
        "user_id",
        "event_id",
        (F.col("rn") - F.coalesce("last_purchase_rn", F.lit(0)))
        .cast("bigint")
        .alias("events_since_purchase"),
    )


_NEAREST_EDGE_SQL = f"""
WITH pts AS (SELECT * FROM {GF.points_values_sql()}),
e AS (SELECT * FROM {GF.edges_values_sql()}),
d AS (
  SELECT p.img_id, e.id_predio, e.nombre,
         CASE WHEN (e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1) = 0 THEN
           (p.lon-e.x1)*(p.lon-e.x1) + (p.lat-e.y1)*(p.lat-e.y1)
         ELSE
           (p.lon - (e.x1 + least(greatest(
              ((p.lon-e.x1)*(e.x2-e.x1) + (p.lat-e.y1)*(e.y2-e.y1))
              / ((e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1)), 0.0), 1.0)
              * (e.x2-e.x1)))
           * (p.lon - (e.x1 + least(greatest(
              ((p.lon-e.x1)*(e.x2-e.x1) + (p.lat-e.y1)*(e.y2-e.y1))
              / ((e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1)), 0.0), 1.0)
              * (e.x2-e.x1)))
           + (p.lat - (e.y1 + least(greatest(
              ((p.lon-e.x1)*(e.x2-e.x1) + (p.lat-e.y1)*(e.y2-e.y1))
              / ((e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1)), 0.0), 1.0)
              * (e.y2-e.y1)))
           * (p.lat - (e.y1 + least(greatest(
              ((p.lon-e.x1)*(e.x2-e.x1) + (p.lat-e.y1)*(e.y2-e.y1))
              / ((e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1)), 0.0), 1.0)
              * (e.y2-e.y1)))
         END AS d2
  FROM pts p CROSS JOIN e
  WHERE p.lon IS NOT NULL AND p.lat IS NOT NULL)
SELECT img_id, id_predio, nombre FROM (
  SELECT img_id, id_predio, nombre,
         row_number() OVER (PARTITION BY img_id
                            ORDER BY d2, id_predio, nombre) AS rn
  FROM d) WHERE rn = 1
"""


@register("geo_nearest_edge", _NEAREST_EDGE_SQL)
def geo_nearest_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-EDGE parcel matching: point-to-segment squared distance
    with the projection parameter clamped to [0,1] — strictly more
    faithful than the reference's nearest-VERTEX fallback (a point
    beside a long boundary edge matches that parcel even when another
    parcel's corner is closer). Pure IEEE +*/ comparisons (no sqrt
    needed for the argmin), broadcast polygon edges, deterministic
    tiebreak — the J3 upgrade path."""
    pts = GF.spark_points(spark).filter(
        F.col("lon").isNotNull() & F.col("lat").isNotNull()
    )
    polys = GF.spark_polys(spark)
    edges = polys.select(
        "id_predio",
        "nombre",
        F.explode("rings").alias("ring"),
    ).select(
        "id_predio",
        "nombre",
        F.explode(
            F.expr(
                "transform(sequence(0, size(ring) - 1), i -> "
                "struct(ring[i].x AS x1, ring[i].y AS y1, "
                "ring[(i + 1) % size(ring)].x AS x2, "
                "ring[(i + 1) % size(ring)].y AS y2))"
            )
        ).alias("e"),
    ).select("id_predio", "nombre", "e.x1", "e.y1", "e.x2", "e.y2")
    p, a_x, a_y = F.col("lon"), F.col("x1"), F.col("y1")
    dx, dy = F.col("x2") - a_x, F.col("y2") - a_y
    len2 = dx * dx + dy * dy
    t = F.least(
        F.greatest(
            ((p - a_x) * dx + (F.col("lat") - a_y) * dy) / len2, F.lit(0.0)
        ),
        F.lit(1.0),
    )
    px = p - (a_x + t * dx)
    py = F.col("lat") - (a_y + t * dy)
    d2 = F.when(len2 == 0, (p - a_x) * (p - a_x) + (F.col("lat") - a_y) * (F.col("lat") - a_y)).otherwise(
        px * px + py * py
    )
    scored = pts.crossJoin(F.broadcast(edges)).select(
        "img_id", "id_predio", "nombre", d2.alias("d2")
    )
    w = Window.partitionBy("img_id").orderBy("d2", "id_predio", "nombre")
    return (
        scored.select("img_id", "id_predio", "nombre", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("img_id", "id_predio", "nombre")
    )


@register(
    "s24_blob_chunking",
    """
    WITH h AS (
      SELECT doc_id, hex(encode(text)) AS hx
      FROM documents WHERE doc_id < 100),
    c AS (
      SELECT doc_id, hx,
             unnest(generate_series(0,
               CAST(ceil(length(hx) / 128.0) AS BIGINT) - 1)) AS chunk_idx
      FROM h)
    SELECT doc_id, chunk_idx,
           md5(substring(hx, CAST(chunk_idx * 128 + 1 AS INTEGER), 128))
             AS chunk_md5
    FROM c
    """,
)
def s24_blob_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size content chunking for a content-addressed store: each
    blob splits into 64-byte chunks, each chunk keyed by its digest —
    identical chunks dedupe across blobs and rsync-style delta sync
    ships only changed chunks. sequence+explode fan-out is linear in
    content size; chunk hashing is pure map work (production adds
    content-defined boundaries — the winnowing rolling hash already in
    `text_winnowing_fp` — same plan shape).

    Byte-boundary contract (r17): chunk boundaries are defined on
    CONTENT BYTES, not characters — the text is carried through a hex
    transport encoding (2 hex chars per UTF-8 byte, bit-identical
    uppercase on both engines), chunks are 128-hex-char slices = 64
    content bytes, and the chunk key is the md5 of the hex slice. A
    blob store chunks bytes; the previous character-based slicing split
    multibyte payloads at different offsets per engine (Spark
    codepoints vs DuckDB graphemes/bytes; previously allowlisted).
    Zero-length blobs produce zero chunks (explicit n>=1 guard — Spark
    would otherwise infer a NEGATIVE sequence step for sequence(0,-1)
    where DuckDB's generate_series returns empty)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    h = docs.select(
        "doc_id", F.hex(F.encode(F.col("text"), "UTF-8")).alias("hx")
    )
    n_chunks = F.ceil(F.length("hx") / 128.0).cast("bigint")
    c = h.select(
        "doc_id",
        "hx",
        F.explode(
            F.when(n_chunks >= 1, F.sequence(F.lit(0), n_chunks - 1))
        ).alias("chunk_idx"),
    )
    return c.select(
        "doc_id",
        "chunk_idx",
        F.md5(
            F.col("hx").substr(
                (F.col("chunk_idx") * 128 + 1).cast("int"), F.lit(128)
            )
        ).alias("chunk_md5"),
    )


@register(
    "a20_growth_curve",
    """
    WITH fs AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)::DATE) AS first_day
      FROM events GROUP BY user_id),
    daily AS (
      SELECT first_day AS day, count(*) AS new_users FROM fs GROUP BY 1)
    SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM daily
    """,
)
def a20_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-distinct growth curve: running COUNT DISTINCT over
    time, which no window frame computes directly — rewritten as
    first-seen attribution (min date per user, one shuffle) + daily new
    counts + a running sum over the ~#days post-aggregate. The
    user-growth chart every dashboard opens with, in its scale-correct
    decomposition."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    fs = ev.groupBy("user_id").agg(F.min("d").alias("first_day"))
    daily = fs.groupBy("first_day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


@register(
    "sub_all_rewrite",
    """
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
    FROM customer c
    WHERE c.c_acctbal > ALL (SELECT s.s_acctbal FROM supplier s
                             WHERE s.s_nationkey = c.c_nationkey)
    """,
)
def sub_all_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified ALL comparison (x > ALL correlated subquery) — syntax
    Spark SQL does not accept — rewritten as the aggregate it means:
    greater than the per-nation MAX (vacuously true for nations with no
    suppliers, per SQL ALL-over-empty semantics, hence the left join +
    null-true coalesce). The oracle runs the genuine > ALL form,
    proving the rewrite's edge cases match.

    Full ALL null semantics (r16): a NULL in the subquery set makes
    `> ALL` UNKNOWN (row filtered) even when the value beats every
    non-null element — so the rewrite carries a null-presence count,
    not just the max (which silently skips nulls)."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    supp = table(spark, sf_dir, "supplier")
    mx = supp.groupBy(F.col("s_nationkey").alias("c_nationkey")).agg(
        F.max("s_acctbal").alias("max_s"),
        F.count("*").alias("__n_all"),
        F.count("s_acctbal").alias("__n_nonnull"),
    )
    return (
        cust.join(F.broadcast(mx), "c_nationkey", "left")
        .filter(
            F.col("__n_all").isNull()  # no suppliers: vacuously true
            | (
                (F.col("__n_all") == F.col("__n_nonnull"))
                & (F.col("c_acctbal") > F.col("max_s"))
            )
        )
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )


@register(
    "w10_moving_median",
    """
    SELECT event_id, user_id,
           round(quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
    FROM events WHERE user_id < 40
    """,
)
def w10_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median over a trailing 5-row frame — robust signal
    smoothing that a moving AVERAGE can't give (one spike drags a mean,
    not a median). Exact interpolated percentile as a window aggregate,
    frame-bounded state; Spark `percentile` and DuckDB `quantile_cont`
    interpolate identically."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 6).alias("med5"),
    )


@register(
    "a21_cohort_ltv",
    """
    WITH ev AS (
      SELECT user_id, value, CAST(ts AS TIMESTAMP)::DATE AS d FROM events),
    first AS (SELECT user_id, min(d) AS d0 FROM ev GROUP BY user_id),
    daily AS (
      SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
             date_diff('day', f.d0, e.d) AS day_offset,
             CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS rev
      FROM ev e JOIN first f USING (user_id)
      GROUP BY 1, 2)
    SELECT cohort_day, day_offset, rev,
           CAST(sum(CAST(rev AS DECIMAL(18,4))) OVER (
             PARTITION BY cohort_day ORDER BY day_offset NULLS FIRST
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS cumulative_rev
    FROM daily
    """,
)
def a21_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: revenue per (cohort, day-offset)
    with the running cumulative per cohort — the LTV chart behind
    payback-period decisions. Same first-touch decomposition as
    `cohort_retention`, plus a cohort-partitioned running decimal sum
    over the ~#offsets post-aggregate."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "value", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    daily = (
        ev.join(first, "user_id")
        .groupBy(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "d0").alias("day_offset"),
        )
        .agg(_dsum(F.col("value")).alias("rev"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "cohort_day",
        "day_offset",
        "rev",
        F.sum(F.col("rev").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("cumulative_rev"),
    )


@register(
    "geo_grid_density",
    f"""
    WITH pts AS ({_BULK_PTS_SQL}),
    cells AS (
      SELECT CAST(floor(lon) AS BIGINT) AS cx,
             CAST(floor(lat) AS BIGINT) AS cy, count(*) AS n
      FROM pts GROUP BY 1, 2)
    SELECT cx, cy, n FROM (
      SELECT cx, cy, n,
             row_number() OVER (ORDER BY n DESC, cx, cy) AS rn
      FROM cells) WHERE rn <= 10
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density heatmap: the 20k bulk points bucketed into unit
    grid cells, top-10 densest cells — the hotspot/coverage report and
    the stats that size the grid-join prefilter (`geo_contains_grid`
    cell width) and choose salting for skewed tiles. One grouped count
    + a TakeOrdered over the tiny cell table."""
    pts = spark.range(_BULK_N).select(
        ((F.col("id") * 73 % 997) / 997.0 * 16.0 - 2.0).alias("lon"),
        ((F.col("id") * 131 % 983) / 983.0 * 14.0 - 2.0).alias("lat"),
    )
    cells = pts.groupBy(
        F.floor("lon").cast("bigint").alias("cx"),
        F.floor("lat").cast("bigint").alias("cy"),
    ).agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), "cx", "cy")
    return (
        cells.select("cx", "cy", "n", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
        .select("cx", "cy", "n")
    )


@register(
    "emb_quantile_clip",
    """
    WITH comp AS (
      SELECT unnest(generate_series(0, len(embedding) - 1)) AS pos,
             unnest(embedding)::DOUBLE AS v
      FROM embeddings),
    q AS (
      SELECT pos, quantile_cont(v, 0.01) AS lo, quantile_cont(v, 0.99) AS hi
      FROM comp GROUP BY pos)
    SELECT c.pos,
           count(*) FILTER (WHERE c.v < q.lo) AS n_clip_lo,
           count(*) FILTER (WHERE c.v > q.hi) AS n_clip_hi,
           count(*) AS n
    FROM comp c JOIN q USING (pos)
    GROUP BY c.pos
    """,
)
def emb_quantile_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding outlier audit: exact p01/p99 per
    coordinate, then counts of components outside the band — the
    preprocessing stats behind quantile clipping / int8 calibration of
    an embedding table. Posexplode + per-position percentile (64
    groups), broadcast back, one counting pass."""
    emb = table(spark, sf_dir, "embeddings")
    comp = emb.select(F.posexplode("embedding").alias("pos", "v")).select(
        "pos", F.col("v").cast("double").alias("v")
    )
    q = comp.groupBy("pos").agg(
        F.percentile("v", F.lit(0.01)).alias("lo"),
        F.percentile("v", F.lit(0.99)).alias("hi"),
    )
    return (
        comp.join(F.broadcast(q), "pos")
        .groupBy("pos")
        .agg(
            F.count_if(F.col("v") < F.col("lo")).alias("n_clip_lo"),
            F.count_if(F.col("v") > F.col("hi")).alias("n_clip_hi"),
            F.count("*").alias("n"),
        )
    )


@register(
    "ts_anomaly_vs_baseline",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS TIMESTAMP)::DATE AS d, count(*) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    base AS (
      SELECT event_type, d, n,
             quantile_cont(n, 0.5) OVER (
               PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS baseline
      FROM daily)
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
           floor(n / baseline * 1e4 + 0.5) / 1e4 AS ratio,
           n > 1.5 * baseline AS is_spike
    FROM base WHERE baseline IS NOT NULL
    """,
)
def ts_anomaly_vs_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly monitor: each day's event count against the MEDIAN
    of its trailing week (robust to one bad day in the baseline,
    unlike a mean), with the spike flag the alerting rule fires on.
    Daily aggregate first, so the percentile window runs over ~#days
    rows per type — the ops-monitoring staple at post-agg altitude.
    Null ts has no day — excluded both sides (r16 contract)."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-7, -1)
    )
    base = daily.select(
        "event_type",
        "d",
        "n",
        F.percentile("n", F.lit(0.5)).over(w).alias("baseline"),
    )
    return base.filter(F.col("baseline").isNotNull()).select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n",
        (
            F.floor(F.col("n") / F.col("baseline") * 1e4 + F.lit(0.5)) / 1e4
        ).alias("ratio"),
        (F.col("n") > 1.5 * F.col("baseline")).alias("is_spike"),
    )


_DEDUP_REPORT_SQL = (
    _near_pairs_cte(0.1)
    + """,
exd AS (
  SELECT count(*) AS n_docs,
         count(*) - count(DISTINCT sha256(text)) AS n_exact_dupes
  FROM documents),
npx AS (SELECT count(*) AS n_near_pairs FROM pairs)
SELECT exd.n_docs, exd.n_exact_dupes, npx.n_near_pairs,
       floor(exd.n_exact_dupes::DOUBLE / exd.n_docs * 1e6 + 0.5) / 1e6
         AS exact_dup_rate
FROM exd, npx
"""
).replace("WITH base AS", "WITH RECURSIVE base AS", 1)


@register("corpus_dedup_report", _DEDUP_REPORT_SQL)
def corpus_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DASHBOARD row: corpus size, exact-duplicate count and
    rate (digest groups), and verified near-duplicate pair count — the
    one-line health summary a corpus pipeline publishes after every
    snapshot, composed from the same machinery the per-family queries
    verify. All three inputs are tiny aggregates over already-verified
    plans."""
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    exact = docs.agg(
        (F.count("*") - F.countDistinct(F.sha2("text", 256))).alias(
            "n_exact_dupes"
        )
    )
    pairs = D.minhash_lsh_pairs(
        docs, k=3, num_hashes=16, bands=4, jaccard_threshold=0.1
    )
    np_ = pairs.agg(F.count("*").alias("n_near_pairs"))
    return (
        exact.crossJoin(np_)
        .select(
            F.lit(n_docs).alias("n_docs"),
            "n_exact_dupes",
            "n_near_pairs",
            (
                F.floor(
                    # try_divide: an empty corpus publishes a NULL rate
                    # instead of failing the whole dashboard row.
                    F.try_divide(
                        F.col("n_exact_dupes").cast("double"), F.lit(n_docs)
                    )
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("exact_dup_rate"),
        )
    )


@register(
    "a6_string_agg",
    """
    SELECT lang,
           string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS doc_list,
           count(*) AS n
    FROM documents WHERE doc_id < 60 GROUP BY lang
    """,
)
def a6_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): per-group
    comma-joined id lists — the manifest/report formatting aggregate.
    Built as sort_array(collect_list(...)) + concat_ws so the
    concatenation order is DETERMINISTIC regardless of partition
    arrival order (raw listagg without ORDER BY is nondeterministic on
    any parallel engine)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    return docs.groupBy("lang").agg(
        F.concat_ws(
            ",",
            F.sort_array(F.collect_list(F.col("doc_id"))).cast(
                "array<string>"
            ),
        ).alias("doc_list"),
        F.count("*").alias("n"),
    )


@register(
    "p13_path_rollup",
    """
    WITH f AS (
      SELECT source || '/' || lang AS dir2, source AS dir1, n_chars
      FROM documents),
    pre AS (
      SELECT dir1 AS prefix, n_chars FROM f
      UNION ALL
      SELECT dir2, n_chars FROM f)
    SELECT prefix, count(*) AS n_files,
           CAST(sum(n_chars) AS BIGINT) AS total_bytes
    FROM pre GROUP BY prefix
    """,
)
def p13_path_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-size rollup (du -s over the lake): every object charges
    each of its path prefixes, so one exploded pass yields file counts
    and byte totals at every directory level — the storage-accounting
    report behind quota and retention decisions. Fan-out is path depth
    (bounded), one grouped sum. Path composition is null-PROPAGATING
    (SQL || semantics, the r15 f20 convention): a null path segment
    yields a NULL prefix (grouped as its own bad-path bucket), not a
    silently shortened directory."""
    docs = table(spark, sf_dir, "documents")
    f = docs.select(
        F.col("source").alias("dir1"),
        F.concat("source", F.lit("/"), "lang").alias("dir2"),
        "n_chars",
    )
    pre = f.select(
        F.explode(F.array("dir1", "dir2")).alias("prefix"), "n_chars"
    )
    return pre.groupBy("prefix").agg(
        F.count("*").alias("n_files"),
        F.sum("n_chars").alias("total_bytes"),
    )


_INCR_SPLIT = 400

_INCR_PAIRS_SQL = (
    _near_pairs_cte(0.1, _INCR_SPLIT) + "\nSELECT a_id, b_id, jaccard FROM pairs"
)


@register("dedup_incremental_pairs", _INCR_PAIRS_SQL)
def dedup_incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time near-dup gate: a new batch (doc_id ≥ split) probed
    against the already-deduped corpus via MinHash-LSH — corpus-internal
    pairs are never generated, only new×corpus and new×new. The probe-side
    predicate pushes below the band join, so the corpus side is a full
    index while the probe side is just the delta — hash-the-delta /
    probe-the-index, the shape an incremental 100 TB ingest needs."""
    return D.minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        k=3,
        num_hashes=16,
        bands=4,
        jaccard_threshold=0.1,
        new_from=_INCR_SPLIT,
    )


_ANN_FILTERED_SQL = f"""
WITH cand AS (SELECT vec_id, embedding FROM embeddings WHERE label = 3),
q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.q_id, e.vec_id, round({V.cosine_sql('e.embedding', 'q.qe')}, 6) AS cos
  FROM cand e, q)
SELECT q_id, vec_id, cos, rank FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 5
"""


@register("ann_filtered_topk", _ANN_FILTERED_SQL)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search (PRE-filter semantics): the label
    predicate prunes the candidate scan BEFORE any vector math — top-k is
    then exact over survivors. Pre-filter beats post-filter whenever the
    predicate is selective: post-filtering an ANN result can return < k
    rows, while the pushed predicate here reaches the parquet scan
    (PushedFilters) and the per-vector cosine runs only on the filtered
    partition stream."""
    emb = table(spark, sf_dir, "embeddings")
    cand = emb.filter(F.col("label") == 3)
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return SIM.brute_force_topk(cand, queries, k=5)


_VOCAB_OOV_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({_TOKS_SQL}) AS t FROM documents),
vocab AS (
  SELECT t FROM (
    SELECT t, count(*) AS c,
           row_number() OVER (ORDER BY count(*) DESC, t) AS rn
    FROM tok GROUP BY t) WHERE rn <= 100),
flagged AS (
  SELECT doc_id, lang,
         CASE WHEN t IN (SELECT t FROM vocab) THEN 0 ELSE 1 END AS oov
  FROM tok)
SELECT lang, count(DISTINCT doc_id) AS n_docs,
       count(*) AS total_tokens,
       CAST(sum(oov) AS BIGINT) AS oov_tokens,
       round(sum(oov)::DOUBLE / count(*), 6) AS oov_rate
FROM flagged GROUP BY lang
"""


@register("vocab_oov_rate", _VOCAB_OOV_SQL)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-health report: corpus-wide top-100 vocabulary (ties
    broken lexically for determinism), then per-language out-of-vocabulary
    token rate. Plan: one token explode feeds BOTH the vocab aggregate
    (tiny, broadcast back) and the per-language flag/aggregate — the OOV
    flag is a broadcast left-semi-style join, no shuffle of the token
    stream beyond its own groupBys; rates are one division per language
    over exact integer sums (order-independent, cross-engine stable)."""
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    tok = docs.select("doc_id", "lang", F.explode(H.tokens(F.col("text"))).alias("t"))
    vocab = (
        tok.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("t"))
        .limit(100)  # TakeOrderedAndProject: per-partition top-k, no global sort
        .select("t")
    )
    flagged = tok.join(
        F.broadcast(vocab.withColumn("__in", F.lit(1))), "t", "left"
    ).select(
        "doc_id",
        "lang",
        F.when(F.col("__in").isNotNull(), F.lit(0)).otherwise(F.lit(1)).alias("oov"),
    )
    return flagged.groupBy("lang").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("total_tokens"),
        F.sum("oov").cast("bigint").alias("oov_tokens"),
        F.round(F.sum("oov") / F.count("*"), 6).alias("oov_rate"),
    )


_HYBRID_TERMS = ("spark", "merge", "table")
_HYBRID_TERMS_SQL = "('" + "', '".join(_HYBRID_TERMS) + "')"

_HYBRID_FUSED_SQL = f"""
WITH lex AS (
  SELECT doc_id, count(DISTINCT t) AS n_hit
  FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS t FROM documents)
  WHERE t IN {_HYBRID_TERMS_SQL} GROUP BY doc_id),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
vec AS (
  SELECT e.vec_id AS doc_id, round({V.cosine_sql('e.embedding', 'q.qe')}, 6) AS cos
  FROM embeddings e, q),
fused AS (
  SELECT v.doc_id,
         coalesce(l.n_hit, 0) AS n_hit, v.cos,
         round(0.3 * coalesce(l.n_hit, 0) / {len(_HYBRID_TERMS)}.0 + 0.7 * v.cos, 6) AS score
  FROM vec v LEFT JOIN lex l ON v.doc_id = l.doc_id)
SELECT doc_id, n_hit, cos, score, rank FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM fused)
WHERE rank <= 10
"""


@register("hybrid_fused_topk", _HYBRID_FUSED_SQL)
def hybrid_fused_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, weighted-fusion flavor: a lexical signal (count of
    distinct query terms present) and a vector signal (cosine vs the query
    embedding) combined as 0.3·lex_norm + 0.7·cos, global top-10. The
    lexical side filters the token explode to the (tiny, literal) term set
    BEFORE any aggregation — the inverted-index probe — and joins onto the
    vector scores at #candidates altitude; the final top-k is
    TakeOrderedAndProject, never a global sort."""
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    lex = (
        docs.select("doc_id", F.explode(H.tokens(F.col("text"))).alias("t"))
        .filter(F.col("t").isin(*_HYBRID_TERMS))
        .groupBy("doc_id")
        .agg(F.count_distinct("t").alias("n_hit"))
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    vec = emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(V.cosine(F.col("embedding"), F.col("qe")), 6).alias("cos"),
    )
    fused = (
        vec.join(lex, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            "cos",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) * (0.3 / len(_HYBRID_TERMS))
                + 0.7 * F.col("cos"),
                6,
            ).alias("score"),
        )
    )
    return (
        fused.orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
        .select(
            "doc_id",
            "n_hit",
            "cos",
            "score",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
            .alias("rank"),
        )
    )


_HYBRID_RRF_SQL = f"""
WITH lex AS (
  SELECT doc_id, count(*) AS n_hit
  FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS t FROM documents)
  WHERE t IN {_HYBRID_TERMS_SQL} GROUP BY doc_id),
lex_rank AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_hit DESC, doc_id) AS r
  FROM lex),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
vec_rank AS (
  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r FROM (
    SELECT e.vec_id AS doc_id, round({V.cosine_sql('e.embedding', 'q.qe')}, 6) AS cos
    FROM embeddings e, q)),
rrf AS (
  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         round(coalesce(1.0 / (60 + l.r), 0) + coalesce(1.0 / (60 + v.r), 0), 9) AS rrf_score
  FROM (SELECT * FROM lex_rank WHERE r <= 100) l
  FULL OUTER JOIN (SELECT * FROM vec_rank WHERE r <= 100) v ON l.doc_id = v.doc_id)
SELECT doc_id, rrf_score, rank FROM (
  SELECT doc_id, rrf_score,
         row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank FROM rrf)
WHERE rank <= 10
"""


@register("hybrid_rrf_topk", _HYBRID_RRF_SQL)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, reciprocal-rank-fusion flavor: top-100 lexical and
    top-100 vector result lists fused by Σ 1/(60+rank) — score-scale-free,
    the standard RAG ensemble. Each list's global ranking runs over an
    ALREADY-REDUCED candidate set (term-filtered hits / per-query top-100),
    so the unpartitioned windows rank hundreds of rows, not the corpus; at
    fleet scale the per-query lists arrive pre-truncated from the ANN
    path (ann_lsh_topk) and fusion stays O(lists × k)."""
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    lex = (
        docs.select("doc_id", F.explode(H.tokens(F.col("text"))).alias("t"))
        .filter(F.col("t").isin(*_HYBRID_TERMS))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    lex_rank = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("n_hit").desc(), F.col("doc_id")))
        .alias("r"),
    ).filter(F.col("r") <= 100)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    vec = emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(V.cosine(F.col("embedding"), F.col("qe")), 6).alias("cos"),
    )
    vec_rank = vec.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("cos").desc(), F.col("doc_id")))
        .alias("r"),
    ).filter(F.col("r") <= 100)
    l = lex_rank.select(F.col("doc_id").alias("l_id"), F.col("r").alias("lr"))
    v = vec_rank.select(F.col("doc_id").alias("v_id"), F.col("r").alias("vr"))
    rrf = l.join(v, l.l_id == v.v_id, "full_outer").select(
        F.coalesce(F.col("l_id"), F.col("v_id")).alias("doc_id"),
        F.round(
            F.coalesce(1.0 / (60 + F.col("lr")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("vr")), F.lit(0.0)),
            9,
        ).alias("rrf_score"),
    )
    return (
        rrf.orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(10)
        .select(
            "doc_id",
            "rrf_score",
            F.row_number()
            .over(Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id")))
            .alias("rank"),
        )
    )


_TRIANGLES_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v          -- a<b<c chains
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
nodes AS (
  SELECT a AS part FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT part, count(*) AS n_triangles FROM nodes GROUP BY part
"""


@register("graph_triangles", _TRIANGLES_SQL)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the co-purchase graph — the classic
    distributed graph kernel (clustering-coefficient numerator, community
    density signal).

    Scale shape: edges are oriented by (degree, id) — each triangle then
    has exactly ONE node with two out-edges, so wedge generation (the
    self-join on the out-endpoint) counts every triangle once, and
    orientation bounds out-degree by O(sqrt(E)) so the wedge fan-out
    never explodes on hub nodes (the standard degree-ordering trick;
    id-only orientation leaves hubs with huge out-degree). Wedges probe
    the canonical edge set with one more equi-join. The oracle counts
    the same triangles via the naive a<b<c chain join — orientation
    changes the plan's skew profile, never the triangle set."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a_ = li.alias("a")
    b_ = li.alias("b")
    edges = (
        a_.join(
            b_,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # orient each edge from the (degree, id)-smaller endpoint
    ranked = edges.join(du, "u").join(dv, "v").select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("src"), F.col("v").alias("dst")),
        )
        .otherwise(F.struct(F.col("v").alias("src"), F.col("u").alias("dst")))
        .alias("e")
    ).select(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
    w1 = ranked.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    w2 = ranked.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    wedges = w1.join(w2, "x").filter(F.col("y") < F.col("z"))
    closure = edges.select(
        F.col("u").alias("cy"), F.col("v").alias("cz")
    )
    tri = wedges.join(
        closure,
        (F.least(F.col("y"), F.col("z")) == F.col("cy"))
        & (F.greatest(F.col("y"), F.col("z")) == F.col("cz")),
    ).select("x", "y", "z")
    nodes = tri.select(F.explode(F.array("x", "y", "z")).alias("part"))
    return nodes.groupBy("part").agg(F.count("*").alias("n_triangles"))


_IVL_OVERLAP_SQL = """
WITH a AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS a_start,
         CAST(o_orderdate AS DATE) + 7 AS a_end
  FROM orders WHERE o_custkey < 200),
b AS (
  SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS b_start,
         CAST(l_shipdate AS DATE) + 2 AS b_end
  FROM lineitem WHERE l_suppkey < 20)
SELECT a.o_orderkey, count(*) AS n_overlapping
FROM a JOIN b ON a.a_start < b.b_end AND b.b_start < a.a_end
GROUP BY a.o_orderkey
"""


@register("j_interval_overlap", _IVL_OVERLAP_SQL)
def j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join — the temporal analogue of the spatial grid
    join: each interval explodes to the WEEK buckets it covers, the two
    sides equi-join on the bucket (shuffle-partitionable, never a
    cartesian inequality join), and the exact overlap predicate verifies.
    Each qualifying pair is emitted EXACTLY once — not via distinct
    (which would collapse genuinely duplicate fact rows and lose
    multiplicity) but structurally: the pair is kept only in the FIRST
    bucket both intervals cover, ``wk == max(floor(a_start/7),
    floor(b_start/7))`` (the later start day lies in both intervals, and
    floor is monotone, so that bucket is always shared). Bucket fan-out
    is ceil(span/bucket)+1 <= 3 here — bounded, unlike the O(n*m) plan
    the naive theta join degrades to. The oracle runs the naive
    inequality join on the same filtered sides."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    a = orders.filter(F.col("o_custkey") < 200).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("a_start"),
        F.date_add(F.to_date("o_orderdate"), 7).alias("a_end"),
    )
    b = li.filter(F.col("l_suppkey") < 20).select(
        "l_orderkey",
        "l_linenumber",
        F.to_date("l_shipdate").alias("b_start"),
        F.date_add(F.to_date("l_shipdate"), 2).alias("b_end"),
    )

    def week_buckets(start, end):
        # weeks covered by [start, end): epoch-day div 7 over the span
        s = F.floor(F.unix_date(start) / 7)
        e = F.floor(F.unix_date(end) / 7)
        return F.sequence(s, e)

    ax = a.withColumn(
        "wk0", F.floor(F.unix_date(F.col("a_start")) / 7)
    ).withColumn("wk", F.explode(week_buckets(F.col("a_start"), F.col("a_end"))))
    bx = b.withColumn(
        "wk0", F.floor(F.unix_date(F.col("b_start")) / 7)
    ).withColumn("wk", F.explode(week_buckets(F.col("b_start"), F.col("b_end"))))
    pairs = (
        ax.join(bx.withColumnRenamed("wk0", "bwk0"), "wk")
        .filter(
            (F.col("a_start") < F.col("b_end"))
            & (F.col("b_start") < F.col("a_end"))
            & (F.col("wk") == F.greatest(F.col("wk0"), F.col("bwk0")))
        )
        .select("o_orderkey")
    )
    return pairs.groupBy("o_orderkey").agg(F.count("*").alias("n_overlapping"))


_EPS_CLUSTER = 0.1

# deterministic point cloud in the [0,14]² cadastral plane, md5-derived
# from the doc id (identical IEEE doubles in both engines: integer hash
# → exact division/multiply, no transcendentals)
_EPS_PTS_SQL = f"""
  SELECT doc_id AS id,
         ('0x' || substring(md5('px:' || doc_id), 1, 8))::BIGINT / 4294967296.0 * 14 AS x,
         ('0x' || substring(md5('py:' || doc_id), 1, 8))::BIGINT / 4294967296.0 * 14 AS y
  FROM documents WHERE doc_id IS NOT NULL"""

_EPS_CLUSTER_SQL = f"""
WITH RECURSIVE pts AS ({_EPS_PTS_SQL}),
pairs AS (
  SELECT a.id AS a_id, b.id AS b_id
  FROM pts a JOIN pts b
    ON a.id < b.id
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       <= {_EPS_CLUSTER} * {_EPS_CLUSTER}),
edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
reach AS (
  SELECT id, id AS r FROM pts
  UNION
  SELECT e.dst AS id, r.r FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id
"""


@register("geo_cluster_eps", _EPS_CLUSTER_SQL)
def geo_cluster_eps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-based spatial clustering (eps-connectivity / single-linkage
    DBSCAN core): points within eps of each other share a cluster,
    clusters are connected components of the eps-neighbor graph.

    Scale shape: NEVER all-pairs — each point lands in a grid cell of
    side eps; one side explodes to its 3×3 cell neighborhood and
    equi-joins the other side's home cell, so candidate pairs are
    shuffle-partitionable by cell and each qualifying pair is found
    exactly once (the home cell of b is unique). Components run on the
    shared hybrid engine (operators.dedup.components_from_edges:
    driver union-find below threshold, iterative min-label propagation
    above). The oracle computes the identical clustering via O(n²)
    distance join + recursive closure — affordable at oracle scale,
    which is exactly why the grid plan exists for the engine.
    Null doc_id has no point identity — excluded both sides (r16)."""
    docs = table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    eps = _EPS_CLUSTER
    h8 = lambda tag: (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(tag + ":"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
        * 14
    )
    pts = docs.select(
        F.col("doc_id").alias("id"),
        h8("px").alias("x"),
        h8("py").alias("y"),
    ).withColumn("cx", F.floor(F.col("x") / eps)).withColumn(
        "cy", F.floor(F.col("y") / eps)
    )
    probe = pts.select(
        F.col("id").alias("a_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.explode(
            F.array(*[F.struct(
                (F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy")
            ) for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
        ).alias("cell"),
    ).select("a_id", "ax", "ay", F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"))
    home = pts.select(
        F.col("id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        "cx",
        "cy",
    )
    pairs = (
        probe.join(home, ["cx", "cy"])
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (
                (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
                <= F.lit(eps * eps)
            )
        )
        .select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    )
    labels = D.components_from_edges(pairs)
    return pts.select("id").join(labels, "id", "left").select(
        F.col("id").alias("doc_id"),
        F.coalesce("component", F.col("id").cast("long")).alias("cluster"),
    )


_BM25_K1, _BM25_B = 1.2, 0.75

_BM25_SQL = f"""
WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM d),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, t, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM d)
  WHERE t IN {_HYBRID_TERMS_SQL} GROUP BY doc_id, t),
df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
scored AS (
  SELECT tf.doc_id,
         sum(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
             * tf.tf * ({_BM25_K1} + 1)
             / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl))
         ) AS score
  FROM tf JOIN df USING (t) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id)
SELECT doc_id, round(score, 6) AS bm25, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scored)
WHERE rank <= 10
"""


@register("bm25_topk", _BM25_SQL)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical ranking for the query terms — the standard sparse
    retriever (k1=1.2, b=0.75, the +1 idf variant that stays positive).
    Plan shape: the token explode filters to the (literal, tiny) term set
    immediately — the inverted-index probe — so tf/df aggregates run over
    hits only; doc lengths come from a separate no-explode projection;
    the corpus stats (N, avgdl) are a one-row aggregate broadcast into
    the scoring join; final top-10 is TakeOrdered. Nothing in the plan
    scales with corpus size except the initial scan."""
    docs = table(spark, sf_dir, "documents")
    d = spread(docs, "doc_id").select("doc_id", H.tokens(F.col("text")).alias("toks"))
    dl = d.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        d.select("doc_id", F.explode("toks").alias("t"))
        .filter(F.col("t").isin(*_HYBRID_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("t").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
                * F.col("tf") * (_BM25_K1 + 1)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score")
        )
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
        .select(
            "doc_id",
            "bm25",
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id")))
            .alias("rank"),
        )
    )


_HYBRID_RERANK_SQL = f"""
WITH cand10 AS ({_HYBRID_RRF_SQL}),
scored AS (
  SELECT c.doc_id, c.rrf_score, c.rank,
         (('0x' || substring(md5('ce:' || d.text), 1, 15))::BIGINT % 1000000) AS ce_score
  FROM cand10 c JOIN documents d USING (doc_id))
SELECT doc_id, rrf_score, ce_score, ce_rank FROM (
  SELECT doc_id, rrf_score, ce_score,
         row_number() OVER (ORDER BY ce_score DESC, doc_id) AS ce_rank
  FROM scored)
WHERE ce_rank <= 5
"""


@register("hybrid_rerank_topk", _HYBRID_RERANK_SQL)
def hybrid_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full two-stage retrieval: RRF-fused top-10 candidates → Arrow
    mapInPandas cross-encoder rerank → top-5. The rerank kernel is the
    model call site (see operators.similarity.rerank_crossencoder):
    candidates broadcast onto the doc store, texts batch through the
    Pandas kernel, integer digest scores keep it oracle-exact. At fleet
    scale the expensive model pass touches only k rows per query — the
    first stage already reduced the corpus."""
    docs = table(spark, sf_dir, "documents")
    cands = hybrid_rrf_topk(spark, sf_dir)
    reranked = SIM.rerank_crossencoder(cands, docs, query_tag="ce")
    return (
        reranked.orderBy(F.col("ce_score").desc(), "doc_id")
        .limit(5)
        .select(
            "doc_id",
            "rrf_score",
            "ce_score",
            F.row_number()
            .over(Window.orderBy(F.col("ce_score").desc(), F.col("doc_id")))
            .alias("ce_rank"),
        )
    )


_MAXSIM_NSUB = 4
_MAXSIM_SUBLEN = 16  # 64-dim embeddings → 4 contiguous 16-dim sub-vectors
_MAXSIM_Q_IDS = (0, 1, 2)

_MAXSIM_SQL = f"""
WITH s AS (
  SELECT vec_id,
         {', '.join(f'embedding[{i * _MAXSIM_SUBLEN + 1}:{(i + 1) * _MAXSIM_SUBLEN}] AS s{i}' for i in range(_MAXSIM_NSUB))}
  FROM embeddings),
q AS (
  SELECT vec_id AS q_id, {', '.join(f's{i} AS q{i}' for i in range(_MAXSIM_NSUB))}
  FROM s WHERE vec_id IN {_MAXSIM_Q_IDS}),
scored AS (
  SELECT q.q_id, d.vec_id,
         round({' + '.join('greatest(' + ', '.join(V.dot_sql(f'q.q{i}', f'd.s{j}') for j in range(_MAXSIM_NSUB)) + ')' for i in range(_MAXSIM_NSUB))}, 6) AS maxsim
  FROM s d, q WHERE d.vec_id <> q.q_id)
SELECT q_id, vec_id, maxsim, rank FROM (
  SELECT q_id, vec_id, maxsim,
         row_number() OVER (PARTITION BY q_id ORDER BY maxsim DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 5
"""


@register("hybrid_maxsim_topk", _MAXSIM_SQL)
def hybrid_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval (ColBERT-style MaxSim, Khattab &
    Zaharia SIGIR'20 — public method): query and document are BAGS of
    sub-vectors (here: 4 contiguous 16-dim slices of the 64-dim
    embedding, standing in for per-token vectors); the score is
    Σ_query-subvec max_doc-subvec ⟨q_i, d_j⟩ — finer-grained than one
    pooled dot product, cheaper than a cross-encoder. Everything is
    JVM-side column math: slice → 16 sequential-fold dot products →
    greatest per query slice → sum, then a per-query top-5 ranking
    window over ≤|queries|·|docs| scored rows.

    Scale shape: the MaxSim operator itself is embarrassingly parallel
    (map-only after the broadcast of the 3-row query side); at fleet
    scale it consumes an ANN candidate join (as hybrid_rerank_topk
    consumes hybrid_rrf_topk) instead of the full table — the fixture
    scores the whole table so the oracle is exact over all pairs."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sub = emb.select(
        "vec_id",
        *[
            F.slice("embedding", i * _MAXSIM_SUBLEN + 1, _MAXSIM_SUBLEN).alias(f"s{i}")
            for i in range(_MAXSIM_NSUB)
        ],
    )
    q = sub.filter(F.col("vec_id").isin(*_MAXSIM_Q_IDS)).select(
        F.col("vec_id").alias("q_id"),
        *[F.col(f"s{i}").alias(f"q{i}") for i in range(_MAXSIM_NSUB)],
    )
    pairs = sub.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("q_id"))
    maxsim = sum(
        [
            F.greatest(
                *[V.dot(F.col(f"q{i}"), F.col(f"s{j}")) for j in range(_MAXSIM_NSUB)]
            )
            for i in range(_MAXSIM_NSUB)
        ],
        F.lit(0.0),
    )
    scored = pairs.select(
        "q_id", "vec_id", F.round(maxsim, 6).alias("maxsim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("maxsim").desc(), "vec_id")
    return scored.select(
        "q_id", "vec_id", "maxsim", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= 5)


@register(
    "dedup_corpus_chunks",
    """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
      WHERE doc_id IS NOT NULL
    ),
    chunks AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(words[(i*4+1):(i*4+4)], ' ') AS chunk
      FROM w, UNNEST(range(CAST(ceil(len(words)/4.0) AS BIGINT))) AS t(i)
    ),
    hot AS (
      SELECT md5(chunk) AS ck FROM chunks
      GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
    ),
    kept AS (
      SELECT c.doc_id, c.pos, c.chunk FROM chunks c
      WHERE md5(c.chunk) NOT IN (SELECT ck FROM hot)
    ),
    totals AS (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id),
    cleaned AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(chunk, ' ' ORDER BY pos) AS clean_str
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_chunks,
           COALESCE(c.n_kept, 0) AS n_kept,
           md5(COALESCE(c.clean_str, '')) AS clean_md5
    FROM totals t LEFT JOIN cleaned c ON t.doc_id = c.doc_id
    """,
)
def dedup_corpus_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicate-PASSAGE removal (CCNet/Dolma-style
    boilerplate stripping): split every document into fixed-width
    4-token chunks (the stand-in for newline/paragraph splitting — the
    synthetic corpus has no newlines; the plan shape is identical for
    real paragraph-delimited text), count each chunk's DOCUMENT
    frequency corpus-wide, drop chunks appearing in ≥2 documents, and
    reassemble the cleaned text in original order. Returns per-doc
    (n_chunks, n_kept, md5 of the cleaned text) so the whole removal +
    reconstruction is hash-checkable cross-engine.

    Scale shape: one explode → one groupBy on md5(chunk) (bounded key
    width regardless of passage length) → ONE equi-join back carrying a
    hot flag → ONE per-doc aggregate computing totals, kept counts, and
    the ordered reassembly together (``collect_list`` skips the nulls
    the CASE leaves on hot chunks, so no second pass over the corpus).
    No all-pairs comparison anywhere; the hot-chunk table is left
    unhinted — AQE broadcasts it when boilerplate is rare (the normal
    case) and falls back to a shuffled equi-join when it is not. Unlike
    the pair-reporting dedup family (dedup_near_pairs etc.), this op's
    output IS the cleaned corpus. Reference has no text ops at all
    (script_geo.py is image/geo only) — this extends SURVEY §2's
    LLM-pipeline mandate. A chunk needs a document identity — null
    doc_id rows are excluded on both sides (r16 contract; the engines'
    null-group-vs-null-join conventions otherwise diverge)."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", "text")
    )
    chunks = (
        docs.withColumn("words", F.split("text", " "))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, int(ceil(size(words)/4.0)) - 1),"
                    " i -> array_join(slice(words, i*4 + 1, 4), ' '))"
                )
            ).alias("pos", "chunk"),
        )
        .withColumn("pos", F.col("pos").cast("long"))
        .withColumn("ck", F.md5("chunk"))
    )
    hot = (
        chunks.groupBy("ck")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("ck", F.lit(1).alias("__hot"))
    )
    return (
        chunks.join(hot, "ck", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count(F.when(F.col("__hot").isNull(), 1)).alias("n_kept"),
            F.md5(
                F.array_join(
                    F.expr(
                        "transform(array_sort(collect_list("
                        "CASE WHEN __hot IS NULL THEN struct(pos, chunk) END"
                        ")), s -> s.chunk)"
                    ),
                    " ",
                )
            ).alias("clean_md5"),
        )
    )


@register(
    "text_rarity_score",
    """
    WITH tok AS (
      SELECT doc_id, t.token FROM documents,
             UNNEST(string_split(text, ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token)
    SELECT tok.doc_id,
           count(*) AS n_tokens,
           floor(CAST(sum(c) AS DOUBLE) * 1e6 / count(*) + 0.5) / 1e6
             AS mean_token_freq
    FROM tok JOIN cnt USING (token)
    GROUP BY tok.doc_id
    """,
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-frequency quality score: each document's mean corpus-wide
    token frequency — the integer-exact core of a unigram language-model
    filter (low mean frequency = rare/noisy vocabulary, high = common
    boilerplate). Deliberately avoids log-space so the score stays
    bit-identical cross-engine: sums of BIGINT counts divided once at
    the end, fixed-point-rounded to 6 decimals.

    Scale shape: one explode, one token-count groupBy (map-side
    combined), one join back, one per-doc aggregate. The count-table
    join is deliberately UNHINTED: a ~10^7-row natural-language vocab
    usually fits a broadcast, but a forced hint would OOM the driver on
    a pathological vocabulary (URLs/ids exploded into tokens) — AQE
    picks broadcast when the runtime size allows and falls back to a
    shuffle join when it doesn't (same rationale as
    dedup_corpus_chunks)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    cnt = tok.groupBy("token").agg(F.count("*").alias("c"))
    return (
        tok.join(cnt, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.floor(F.sum("c").cast("double") * 1e6 / F.count("*") + 0.5)
                / 1e6
            ).alias("mean_token_freq"),
        )
    )


@register(
    "graph_bfs_distance",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
    edges AS (SELECT pa AS src, pb AS dst FROM pairs
              UNION ALL SELECT pb, pa FROM pairs),
    f0 AS (SELECT min(src) AS id FROM edges),
    f1 AS (
      SELECT DISTINCT e.dst AS id FROM edges e JOIN f0 ON e.src = f0.id
      WHERE e.dst NOT IN (SELECT id FROM f0)),
    f2 AS (
      SELECT DISTINCT e.dst AS id FROM edges e JOIN f1 ON e.src = f1.id
      WHERE e.dst NOT IN (SELECT id FROM f0 UNION ALL SELECT id FROM f1)),
    f3 AS (
      SELECT DISTINCT e.dst AS id FROM edges e JOIN f2 ON e.src = f2.id
      WHERE e.dst NOT IN (SELECT id FROM f0 UNION ALL SELECT id FROM f1
                          UNION ALL SELECT id FROM f2)),
    cand AS (
      SELECT id, 0 AS d FROM f0 UNION ALL SELECT id, 1 FROM f1
      UNION ALL SELECT id, 2 FROM f2 UNION ALL SELECT id, 3 FROM f3)
    SELECT id AS part_id, min(d) AS dist FROM cand GROUP BY id
    """,
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS shortest-path distances (3 unrolled rounds) from
    the smallest part id over the co-purchase graph (parts sharing ≥2
    orders — graph_copurchase's edge set, symmetrized). Each round is
    one frontier-edge equi-join + an anti-join PRUNE against the visited
    set, so the frontier never re-expands settled nodes — the
    Pregel-style BFS kernel (same per-round shape as the distributed
    components path in operators/dedup.py), with the hop bound making
    the plan a fixed-depth DAG both engines replay exactly. No driver
    collect: the source node is a one-row aggregate broadcast."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    b = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        li.join(b, (li.l_orderkey == b.o) & (li.l_partkey < b.pb))
        .groupBy(F.col("l_partkey").alias("pa"), "pb")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )
    # materialize the edge list ONCE — without this every unrolled round
    # re-plans the distinct+self-join+groupBy subtree and the DAG grows
    # exponentially (~300 exchanges); with it each round is one
    # edge-frontier join + one anti-join prune, same per-round shape as
    # components_from_edges (operators/dedup.py:397+)
    edges = (
        pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .union(pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        .localCheckpoint(eager=True)
    )
    f0 = edges.agg(F.min("src").alias("id")).localCheckpoint(eager=True)
    visited = f0
    frontier = f0
    cand = [f0.select("id", F.lit(0).alias("d"))]
    for hop in (1, 2, 3):
        frontier = (
            edges.join(F.broadcast(frontier), edges.src == F.col("id"))
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        cand.append(frontier.select("id", F.lit(hop).alias("d")))
        visited = visited.union(frontier.select("id")).localCheckpoint(eager=True)
    out = cand[0]
    for c in cand[1:]:
        out = out.union(c)
    return out.groupBy(F.col("id").alias("part_id")).agg(
        F.min("d").alias("dist")
    )


@register(
    "text_bigram_fluency",
    """
    WITH base AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
      FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(l[1:len(l) - 1]) AS w1,
             unnest(l[2:len(l)]) AS w2
      FROM base WHERE len(l) >= 2),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    scored AS (
      SELECT bg.doc_id,
             CAST(floor(c2.c2 * 1000000.0 / c1.c1 + 0.5) AS BIGINT) AS micro
      FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
    SELECT doc_id, count(*) AS n_bigrams,
           CAST(floor(CAST(sum(micro) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
             AS mean_micro_prob
    FROM scored GROUP BY doc_id
    """,
)
def text_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model fluency score — the perplexity-proxy
    quality filter of a pretraining pipeline (KenLM-style gating,
    integer-exact instead of log-space): each document's mean corpus
    transition probability P(w2|w1) = c(w1,w2)/c(w1·), in fixed-point
    micro-units so engines agree bit-for-bit (single IEEE division +
    floor; no ln, whose last-ulp differences across libms can flip a
    rounded digit). Low score = improbable token sequences (noise,
    boilerplate mashups); high = predictable text.

    Scale shape: bigrams come from one arrays_zip over the token array —
    no window, no self-join; the two count tables are map-side-combined
    groupBys; the joins back are equi-joins AQE can broadcast (vocab ≪
    corpus). One corpus pass end to end."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    arr = F.filter(F.split("text", " "), lambda x: x != "")
    bg = (
        docs.select("doc_id", arr.alias("l"))
        .filter(F.size("l") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("l", 1, F.size("l") - 1).alias("w1"),
                    F.slice("l", 2, F.size("l") - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .select(
            "doc_id",
            F.floor(F.col("c2") * 1000000.0 / F.col("c1") + 0.5)
            .cast("long")
            .alias("micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.floor(F.sum("micro").cast("double") / F.count("*") + 0.5)
        .cast("long")
        .alias("mean_micro_prob"),
    )


def bucket_stitched_gaps(
    ids: DataFrame, key: str = "k", bucket_bits: int = 13
) -> DataFrame:
    """Distributed gaps-and-islands over an id column WITHOUT a global
    sort. A naive ``lead() OVER (ORDER BY k)`` needs a SinglePartition
    sort of the whole fact table — a 100 TB scale-killer. Instead:
    partition ids into 2^bucket_bits-wide buckets, run the same lead()
    per bucket (hash-partitioned window), and resolve each bucket's
    LAST row against a bucket-level summary — one row per non-empty
    bucket, 2^bucket_bits× smaller than the fact — whose own lead()
    window provides the NEXT non-empty bucket's min id (empty buckets
    in between fall out naturally: they have no summary row, so the
    lead skips them). The summary join stays unhinted (corpus-derived,
    ~N/2^bucket_bits rows; AQE broadcasts it while it fits). Output is
    identical to the global window: every consecutive-id pair spans
    either one bucket or a bucket boundary, and the boundary case is
    exactly the stitched coalesce. Returns (gap_start, gap_end,
    gap_len), unordered."""
    o = ids.select(
        F.col(key).alias("k"),
        F.shiftright(F.col(key), bucket_bits).alias("b"),
    )
    wb = Window.partitionBy("b").orderBy("k")
    per_bucket = o.withColumn("nxt_in_bucket", F.lead("k").over(wb))
    wnext = Window.orderBy("b")
    bnext = (
        o.groupBy("b")
        .agg(F.min("k").alias("bucket_min"))
        .withColumn("next_bucket_min", F.lead("bucket_min").over(wnext))
        .select("b", "next_bucket_min")
    )
    return (
        per_bucket.join(bnext, "b", "left")
        .withColumn("nxt", F.coalesce("nxt_in_bucket", "next_bucket_min"))
        .filter(F.col("nxt") - F.col("k") > 1)
        .select(
            (F.col("k") + 1).alias("gap_start"),
            (F.col("nxt") - 1).alias("gap_end"),
            (F.col("nxt") - F.col("k") - 1).alias("gap_len"),
        )
    )


@register(
    "w11_id_gaps",
    """
    WITH o AS (
      SELECT o_orderkey AS k,
             lead(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt
      FROM orders WHERE o_orderkey % 97 <> 0)
    SELECT k + 1 AS gap_start, nxt - 1 AS gap_end,
           nxt - k - 1 AS gap_len
    FROM o WHERE nxt - k > 1
    ORDER BY gap_start LIMIT 100
    """,
)
def w11_id_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over the order-id sequence: each missing id
    range as (gap_start, gap_end, gap_len) — the classic sequence-audit
    shape (detecting dropped ingest batches, id-allocator holes).
    The synthetic order ids are DENSE at every SF, which would make the
    gap channel trivially empty; a deterministic drop of every 97th id
    simulates the dropped-batch condition the audit exists for, so the
    driver compare exercises real gap rows (including ones adjacent to
    bucket boundaries) rather than two empty outputs.

    Scale posture: ``bucket_stitched_gaps`` — per-bucket lead() windows
    hash-partitioned on the id bucket plus a 8192×-reduced bucket
    summary for the boundary stitch; no SinglePartition touch of the
    fact (r09, replacing the global-ORDER-BY window; boundary and
    empty-bucket semantics pinned by tests/test_analytics_ops.py)."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 != 0)
        .select("o_orderkey")
    )
    return (
        bucket_stitched_gaps(o, key="o_orderkey", bucket_bits=13)
        .orderBy("gap_start")
        .limit(100)
    )


@register(
    "w12_reset_running_sum",
    """
    WITH b AS (
      SELECT event_id, user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER w <= INTERVAL '30 minutes'
                  THEN 0 ELSE 1 END AS boundary
      FROM events WHERE user_id < 40
      WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
    s AS (
      SELECT event_id, user_id, ts, value,
             CAST(sum(boundary) OVER (PARTITION BY user_id
                                      ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                                      ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_seq
      FROM b)
    SELECT event_id, user_id, session_seq,
           round(sum(value) OVER (PARTITION BY user_id, session_seq
                                  ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                                  ROWS UNBOUNDED PRECEDING), 2) AS running
    FROM s
    """,
)
def w12_reset_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-RESET running total (the islands composition): a
    per-user cumulative value that restarts whenever the gap to the
    previous event exceeds 30 minutes — per-session running spend, the
    window shape plain ``ROWS UNBOUNDED PRECEDING`` cannot express
    alone. Three stacked windows, all on the SAME (user_id) hash
    partitioning: lag → boundary flag → running count of boundaries
    (the session sequence) → running sum partitioned by (user,
    session). One exchange total — Catalyst reuses the partitioning
    across all three Window operators, so at 100 TB this costs exactly
    what w2_running_sum costs. Running folds are frame-ordered in both
    engines, so the double sums match bit-for-bit (w2 discipline)."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    ) <= 1800
    b = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(gap_ok, F.lit(0)).otherwise(F.lit(1)).alias("boundary"),
    )
    s = b.withColumn(
        "session_seq",
        F.sum("boundary").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w2 = (
        Window.partitionBy("user_id", "session_seq")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return s.select(
        "event_id",
        "user_id",
        "session_seq",
        F.round(F.sum("value").over(w2), 2).alias("running"),
    )


_FEATHASH_DIM = 1024


@register(
    "ml_feature_hashing",
    f"""
    WITH tok AS (
      SELECT doc_id, lower(t.token) AS token
      FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
      WHERE t.token <> ''),
    feat AS (
      SELECT DISTINCT doc_id,
             {H.hash64_sql('token', 7)} % {_FEATHASH_DIM} AS idx
      FROM tok)
    SELECT doc_id,
           count(*) AS n_features,
           bit_xor({H.hash64_sql('idx::VARCHAR', 8)}) AS feat_checksum
    FROM feat GROUP BY doc_id
    """,
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick feature extraction (Weinberger et al. ICML'09 —
    public method): tokens hash into a fixed {_FEATHASH_DIM}-dim index
    space, so the feature map needs NO vocabulary build, no global
    dictionary shuffle, and new tokens never change the schema — the
    property that makes it the default featurizer for streaming /
    incremental training at corpus scale. Plan: explode → seeded-md5
    index (cross-engine-identical bits) → distinct per (doc, index) →
    per-doc count + order-independent bit_xor checksum of the active
    indices (set equality without emitting {_FEATHASH_DIM} columns).
    One explode and two hash exchanges on doc_id; no vocabulary join at
    all — compare text_rarity_score, which must join a count table."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .select("doc_id", F.lower("token").alias("token"))
        .filter(F.col("token") != "")
    )
    feat = tok.select(
        "doc_id", (H.hash64(F.col("token"), 7) % _FEATHASH_DIM).alias("idx")
    ).distinct()
    return feat.groupBy("doc_id").agg(
        F.count("*").alias("n_features"),
        F.bit_xor(H.hash64(F.col("idx"), 8)).alias("feat_checksum"),
    )


@register(
    "dq_distribution_drift",
    """
    WITH c AS (
      SELECT least(floor(value / 50)::BIGINT, 9) AS bucket,
             count(*) FILTER (WHERE event_id % 2 = 0) AS n_ref,
             count(*) FILTER (WHERE event_id % 2 <> 0) AS n_cur
      FROM events GROUP BY 1),
    tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM c),
    j AS (SELECT c.*, tot.t_ref, tot.t_cur FROM c, tot WHERE c.n_ref > 0)
    SELECT bucket, n_ref, n_cur,
           floor(
             (CAST(n_cur AS DOUBLE) / t_cur - CAST(n_ref AS DOUBLE) / t_ref)
             * (CAST(n_cur AS DOUBLE) / t_cur - CAST(n_ref AS DOUBLE) / t_ref)
             / (CAST(n_ref AS DOUBLE) / t_ref) * 1e9 + 0.5)::BIGINT
             AS drift_nano
    FROM j ORDER BY bucket
    """,
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: the per-bucket chi-square-style
    contribution ((p_cur − p_ref)² / p_ref) between a reference slice
    and a current slice of the value distribution — the data-quality
    gate that catches upstream shifts BEFORE a model trains on them
    (the integer-exact stand-in for PSI, which needs libm ln; the
    ranking of drifting buckets is the actionable output and is
    identical). BOTH period histograms come out of ONE conditional
    aggregate over one scan (count_if per period — no self-join, no
    per-period subtree re-expansion), totals are re-derived from the
    ~10-bucket aggregate and broadcast back as one row, and the double
    drift expression is fixed-pointed to nano units at the end. A
    bucket absent from the current period scores with n_cur = 0 —
    disappearance IS drift. At 100 TB: one map-side-combined aggregate,
    then post-agg altitude only."""
    ev = table(spark, sf_dir, "events").select(
        (F.col("event_id") % 2 == 0).alias("is_ref"),
        F.least(F.floor(F.col("value") / 50), F.lit(9)).alias("bucket"),
    )
    c = ev.groupBy("bucket").agg(
        F.count_if("is_ref").alias("n_ref"),
        F.count_if(~F.col("is_ref")).alias("n_cur"),
    )
    tot = c.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    j = c.filter(F.col("n_ref") > 0).crossJoin(F.broadcast(tot))
    p_ref = F.col("n_ref").cast("double") / F.col("t_ref")
    p_cur = F.col("n_cur").cast("double") / F.col("t_cur")
    return j.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.floor((p_cur - p_ref) * (p_cur - p_ref) / p_ref * 1e9 + F.lit(0.5))
        .cast("long")
        .alias("drift_nano"),
    ).orderBy("bucket")


@register(
    "dq_referential_integrity",
    """
    SELECT 'lineitem->orders' AS fk, count(*) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders->customer', count(*)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer->nation', count(*)
    FROM customer c WHERE NOT EXISTS
      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the fact chain: orphan
    foreign keys counted by LEFT-ANTI joins (lineitem→orders,
    orders→customer, customer→nation) — the pre-publish gate a lake
    without enforced constraints needs after every load. Anti joins
    broadcast the key side where small; a healthy load reports zeros,
    and any non-zero row pinpoints which edge broke."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey")

    def orphans(fact, dim, cond, label):
        return fact.join(dim, cond, "left_anti").agg(
            F.lit(label).alias("fk"), F.count("*").alias("n_orphans")
        )

    return (
        orphans(li, o, li.l_orderkey == o.o_orderkey, "lineitem->orders")
        .unionByName(
            orphans(o, c, o.o_custkey == c.c_custkey, "orders->customer")
        )
        .unionByName(
            orphans(
                c, F.broadcast(n), c.c_nationkey == n.n_nationkey, "customer->nation"
            )
        )
    )


# ======================================================================
# Round 7 — time-series bars, Benford audit, DSIR selection, chi² tokens
# ======================================================================


@register(
    "ts_ohlc_resample",
    """
    SELECT event_type,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600 AS BIGINT)
             AS bucket_s,
           first(value ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS close,
           count(*) AS n_obs
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL
    GROUP BY 1, 2
    """,
)
def ts_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling: per event_type and hour, the opening value
    (first by event time, event_id tiebreak), high, low, close, and
    observation count — the canonical downsampling of an irregular tick
    stream into fixed bars (script_geo.py's FECHA stamping generalized
    to interval analytics). min_by/max_by over a (ts, event_id) struct
    makes open/close deterministic under duplicate timestamps; the raw
    doubles pass through un-arithmetic'd so both engines hash identical
    bits. One map-side-combinable aggregate, no window, no shuffle
    beyond the groupBy — at 100 TB the bar table is
    |types|·|hours| rows, orders of magnitude smaller than the input.
    A tick without a time or a value is no observation — excluded on
    both sides (r16 contract; also dodges the engines' divergent
    min_by/first null-value conventions)."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    return ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
        .cast("bigint")
        .alias("bucket_s"),
    ).agg(
        F.expr("min_by(value, struct(ts, event_id))").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.expr("max_by(value, struct(ts, event_id))").alias("close"),
        F.count("*").alias("n_obs"),
    )


_BENFORD_P = [
    0.301029995663981,
    0.176091259055681,
    0.124938736608300,
    0.096910013008056,
    0.079181246047625,
    0.066946789630613,
    0.057991946977687,
    0.051152522447381,
    0.045757490560675,
]

_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d + 1} THEN {p!r}" for d, p in enumerate(_BENFORD_P)
) + " END"


@register(
    "dq_benford",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders WHERE o_totalprice > 0),
    c AS (SELECT digit, count(*) AS n FROM digits GROUP BY digit),
    t AS (SELECT sum(n) AS total FROM c)
    SELECT digit, n,
           CAST(floor((CAST(n AS DOUBLE) / total - ({_BENFORD_CASE}))
                      * (CAST(n AS DOUBLE) / total - ({_BENFORD_CASE}))
                      / ({_BENFORD_CASE}) * 1e9 + 0.5) AS BIGINT)
             AS chi2_nano
    FROM c CROSS JOIN t
    ORDER BY digit
    """,
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order amounts: observed leading-digit
    frequencies vs the Benford expectation, per-digit chi² contribution
    in nano fixed point — the classic fabricated-data / unit-mixup
    detector for financial columns. The leading digit is taken through
    integer cents → string head (no log10, no libm); the expected
    probabilities are shared 15-digit literals; the only double math is
    the final fixed-pointed ratio. One conditional aggregate over one
    scan, a 9-row result re-joined to its own one-row total — at 100 TB
    this is a single map-side-combined pass."""
    benford = F.array(*[F.lit(p) for p in _BENFORD_P])
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    c = digits.groupBy("digit").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    p = F.element_at(benford, F.col("digit"))
    frac = F.col("n").cast("double") / F.col("total")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.floor((frac - p) * (frac - p) / p * 1e9 + F.lit(0.5))
            .cast("long")
            .alias("chi2_nano"),
        )
        .orderBy("digit")
    )


_DSIR_BUCKETS = 512
_DSIR_SEED = 7
_DSIR_TARGET = ("src1", "src2", "src3")
_DSIR_TARGET_SQL = "('src1', 'src2', 'src3')"


@register(
    "pipeline_dsir_weights",
    f"""
    WITH d AS (
      SELECT doc_id, source IN {_DSIR_TARGET_SQL} AS is_target,
             {H.shingles_sql('text', 2)} AS bgs
      FROM documents WHERE doc_id IS NOT NULL),
    xb AS (
      SELECT doc_id, is_target,
             ({H.hash64_sql('bg', _DSIR_SEED)}) % {_DSIR_BUCKETS} AS bucket
      FROM (SELECT doc_id, is_target, unnest(bgs) AS bg FROM d)),
    bs AS (
      SELECT bucket, count(*) FILTER (WHERE is_target) AS t_b,
             count(*) AS r_b
      FROM xb GROUP BY bucket),
    tot AS (SELECT sum(t_b) AS t_tot, sum(r_b) AS r_tot FROM bs),
    lam AS (
      SELECT bucket,
             CAST(floor((ln((t_b + 0.5) / (t_tot + {_DSIR_BUCKETS / 2.0}))
                         - ln((r_b + 0.5) / (r_tot + {_DSIR_BUCKETS / 2.0})))
                        * 1e6 + 0.5) AS BIGINT) AS lam_micro
      FROM bs CROSS JOIN tot),
    dc AS (SELECT doc_id, bucket, count(*) AS cnt
           FROM xb GROUP BY doc_id, bucket),
    w AS (SELECT doc_id, CAST(sum(cnt * lam_micro) AS BIGINT) AS weight_micro
          FROM dc JOIN lam USING (bucket) GROUP BY doc_id)
    SELECT doc_id, weight_micro, rank FROM (
      SELECT doc_id, weight_micro,
             row_number() OVER (ORDER BY weight_micro DESC, doc_id) AS rank
      FROM w)
    WHERE rank <= 20
    """,
)
def pipeline_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): score
    every raw document by the hashed-bigram importance ratio between a
    target distribution (here the docs from sources src1–3) and the raw
    corpus, then keep the top-weighted docs — the published
    importance-resampling recipe for matching a pretraining corpus to a
    target domain without a model in the loop. Bigram features hash into
    512 fixed buckets (cross-engine md5 family), per-bucket smoothed
    log-ratios λ_b are fixed-pointed to micro units at the bucket level
    (512 rows — the only libm ln in the plan), and each doc's weight is
    the exact integer Σ count·λ over its buckets. At 100 TB: one explode
    pass, two map-side-combinable aggregates, a 512-row broadcast — the
    corpus never shuffles by anything wider than (doc_id, bucket).
    Selection weights attach to a document IDENTITY — null doc_id rows
    excluded both sides (r16)."""
    docs = table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    d = spread(docs, "doc_id").select(
        "doc_id",
        F.col("source").isin(*_DSIR_TARGET).alias("is_target"),
        H.shingles(F.col("text"), 2).alias("bgs"),
    )
    xb = d.select(
        "doc_id", "is_target", F.explode("bgs").alias("bg")
    ).select(
        "doc_id",
        "is_target",
        (H.hash64(F.col("bg"), _DSIR_SEED) % _DSIR_BUCKETS).alias("bucket"),
    )
    # ONE explode pass: per-(doc, bucket) counts first; the per-bucket
    # target/raw totals then aggregate from this (vocabulary-sized)
    # table instead of re-expanding the corpus explode a second time
    dc_full = xb.groupBy("doc_id", "bucket").agg(
        F.count("*").alias("cnt"), F.first("is_target").alias("is_target")
    )
    bs = dc_full.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), F.col("cnt")).otherwise(0)).alias(
            "t_b"
        ),
        F.sum("cnt").alias("r_b"),
    )
    tot = bs.agg(F.sum("t_b").alias("t_tot"), F.sum("r_b").alias("r_tot"))
    half_b = _DSIR_BUCKETS / 2.0
    lam = bs.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.floor(
            (
                F.log((F.col("t_b") + 0.5) / (F.col("t_tot") + half_b))
                - F.log((F.col("r_b") + 0.5) / (F.col("r_tot") + half_b))
            )
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lam_micro"),
    )
    dc = dc_full.select("doc_id", "bucket", "cnt")
    w = (
        dc.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("lam_micro")).alias("weight_micro"))
    )
    return (
        w.orderBy(F.col("weight_micro").desc(), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            "weight_micro",
            F.row_number()
            .over(Window.orderBy(F.col("weight_micro").desc(), "doc_id"))
            .alias("rank"),
        )
    )


_CHI2_POS = ("src1", "src3", "src5", "src7", "src9")
_CHI2_POS_SQL = "('src1', 'src3', 'src5', 'src7', 'src9')"


@register(
    "ml_chi2_tokens",
    f"""
    WITH lab AS (
      SELECT doc_id, source IN {_CHI2_POS_SQL} AS is_pos,
             list_distinct(list_filter(
               string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS toks
      FROM documents),
    tot AS (
      SELECT count(*) FILTER (WHERE is_pos) AS p_tot,
             count(*) FILTER (WHERE NOT is_pos) AS n_tot
      FROM lab),
    tc AS (
      SELECT t, count(*) FILTER (WHERE is_pos) AS a,
             count(*) FILTER (WHERE NOT is_pos) AS b
      FROM (SELECT doc_id, is_pos, unnest(toks) AS t FROM lab)
      GROUP BY t),
    sc AS (
      SELECT t, a, b,
             CAST(floor(
               CAST(p_tot + n_tot AS DOUBLE)
               * (a * (n_tot - b) - b * (p_tot - a))
               * (a * (n_tot - b) - b * (p_tot - a))
               / ((a + b) * (p_tot + n_tot - a - b)
                  * p_tot * n_tot)
               * 1e6 + 0.5) AS BIGINT) AS chi2_micro
      FROM tc CROSS JOIN tot
      WHERE a + b >= 10 AND a + b <= p_tot + n_tot - 10)
    SELECT t AS token, a AS pos_docs, b AS neg_docs, chi2_micro, rank FROM (
      SELECT *, row_number() OVER (ORDER BY chi2_micro DESC, t) AS rank
      FROM sc)
    WHERE rank <= 15
    """,
)
def ml_chi2_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² feature selection: rank vocabulary tokens by their chi-square
    association with a binary document label (source ∈ odd-numbered
    sources) from the 2×2 presence/label contingency table — the
    classic pre-training feature screen (and leakage detector: a
    too-predictive token is a label proxy). Counts stay exact integers
    end-to-end; the χ² ratio is the only double op and is fixed-pointed
    to micro units. Plan: distinct-token explode → one conditional
    aggregate per token; the 2-number doc-label total is a one-row
    broadcast; df-bounds prune the long tail before ranking. At 100 TB
    the token table is vocabulary-sized, not corpus-sized."""
    docs = table(spark, sf_dir, "documents")
    lab = spread(docs, "doc_id").select(
        "doc_id",
        F.col("source").isin(*_CHI2_POS).alias("is_pos"),
        F.array_distinct(H.tokens(F.col("text"))).alias("toks"),
    )
    tot = lab.agg(
        F.count_if("is_pos").alias("p_tot"),
        F.count_if(~F.col("is_pos")).alias("n_tot"),
    )
    tc = (
        lab.select("is_pos", F.explode("toks").alias("t"))
        .groupBy("t")
        .agg(
            F.count_if("is_pos").alias("a"),
            F.count_if(~F.col("is_pos")).alias("b"),
        )
    )
    n_all = F.col("p_tot") + F.col("n_tot")
    det = F.col("a") * (F.col("n_tot") - F.col("b")) - F.col("b") * (
        F.col("p_tot") - F.col("a")
    )
    sc = (
        tc.crossJoin(F.broadcast(tot))
        .filter(
            ((F.col("a") + F.col("b")) >= 10)
            & ((F.col("a") + F.col("b")) <= n_all - 10)
        )
        .select(
            "t",
            "a",
            "b",
            F.floor(
                n_all.cast("double")
                * det
                * det
                / (
                    (F.col("a") + F.col("b"))
                    * (n_all - F.col("a") - F.col("b"))
                    * F.col("p_tot")
                    * F.col("n_tot")
                )
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("chi2_micro"),
        )
    )
    return (
        sc.orderBy(F.col("chi2_micro").desc(), "t")
        .limit(15)
        .select(
            F.col("t").alias("token"),
            F.col("a").alias("pos_docs"),
            F.col("b").alias("neg_docs"),
            "chi2_micro",
            F.row_number()
            .over(Window.orderBy(F.col("chi2_micro").desc(), "t"))
            .alias("rank"),
        )
    )


@register(
    "streaming_static_join",
    f"""
    SELECT c.c_mktsegment, count(*) AS n, {_dsum_sql('e.value')} AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream (file source, availableNow)
    enriches against a BATCH dimension table inside the streaming query —
    the Structured Streaming surface for slowly-changing lookups, where
    the static side is re-planned per micro-batch (so a dimension update
    lands without restarting the stream). The dimension is broadcast
    (1.5k rows), the post-join aggregate runs in complete mode, and the
    decimal partial sums keep the double total order-independent across
    micro-batch boundaries. Oracle: the same join as one batch SQL. At
    100 TB of stream the static side is still dimension-sized — the
    join never shuffles the stream."""
    import uuid

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream_dir = tempfile.mkdtemp(prefix="events_dimjoin_")
    os.symlink(src, os.path.join(stream_dir, "events.parquet"))
    stream = spark.readStream.format("parquet").schema(raw_schema).load(stream_dir)
    stream = _norm_event_ts(stream)
    dim = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # the static dim is customer — linear-in-SF, so unhinted: per-batch
    # planning broadcasts it while small and shuffles the batch when not
    joined = stream.join(
        dim, stream.user_id == dim.c_custkey, "inner"
    )
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), _dsum(F.col("value")).alias("sum_value")
    )
    name = f"stream_dimjoin_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


_CUSUM_SLACK_C = 500  # 5.00 drift allowance per observation, in cents
_CUSUM_THR_C = 20000  # alert when cumulative excess passes 200.00


@register(
    "ts_cusum_alerts",
    f"""
    WITH s AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE user_id < 100),
    u AS (SELECT user_id, count(*) AS n, sum(cents) AS total
          FROM s GROUP BY user_id),
    d AS (
      SELECT s.user_id, s.event_id, s.ts,
             s.cents * u.n - u.total - {_CUSUM_SLACK_C} * u.n AS dev,
             u.n
      FROM s JOIN u USING (user_id)),
    p AS (
      SELECT user_id, event_id, ts, n,
             sum(dev) OVER w AS prefix
      FROM d
      WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    p2 AS (
      SELECT user_id, event_id, ts, n, prefix,
             min(prefix) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin
      FROM p),
    cu AS (
      SELECT user_id, event_id, ts, n,
             prefix - least(CAST(0 AS BIGINT), runmin) AS cusum
      FROM p2)
    SELECT user_id,
           count(*) FILTER (WHERE cusum > {_CUSUM_THR_C} * n) AS n_alerts,
           CAST(floor(epoch(min(ts) FILTER (WHERE cusum > {_CUSUM_THR_C} * n)))
                AS BIGINT) AS first_alert_epoch,
           CAST(max(cusum // n) AS BIGINT) AS peak_cusum_cents
    FROM cu
    GROUP BY user_id
    HAVING count(*) FILTER (WHERE cusum > {_CUSUM_THR_C} * n) > 0
    """,
)
def ts_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint alerts: the one-sided cumulative-sum control
    chart S_i = max(0, S_{{i-1}} + (x_i − mean − slack)) per user stream,
    alerting when the statistic crosses a threshold — upward
    level-shift detection for metrics pipelines. The recursion solves in
    closed form as prefix − min(0, running-min(prefix)), so it is TWO
    stacked window functions, not an iterative loop; everything is
    integer cents scaled by the per-user count n (mean stays an exact
    rational), so both engines agree bit-for-bit with zero float math.
    At 100 TB: one join against a per-key aggregate, one partitioned
    window — no driver loop, no state store."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    s = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    u = s.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("cents").alias("total")
    )
    d = s.join(u, "user_id").select(
        "user_id",
        "event_id",
        "ts",
        "n",
        (
            F.col("cents") * F.col("n")
            - F.col("total")
            - _CUSUM_SLACK_C * F.col("n")
        ).alias("dev"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = d.select(
        "user_id",
        "event_id",
        "ts",
        "n",
        F.sum("dev").over(w).alias("prefix"),
    ).withColumn("runmin", F.min("prefix").over(w))
    cu = p.select(
        "user_id",
        "ts",
        "n",
        (
            F.col("prefix")
            - F.least(F.lit(0).cast("bigint"), F.col("runmin"))
        ).alias("cusum"),
    )
    alert = F.col("cusum") > _CUSUM_THR_C * F.col("n")
    out = cu.groupBy("user_id").agg(
        F.count_if(alert).alias("n_alerts"),
        F.floor(F.unix_timestamp(F.min(F.when(alert, F.col("ts")))))
        .cast("bigint")
        .alias("first_alert_epoch"),
        F.max(F.floor(F.col("cusum") / F.col("n")))
        .cast("bigint")
        .alias("peak_cusum_cents"),
    )
    return out.filter(F.col("n_alerts") > 0)


@register(
    "text_entropy_quality",
    """
    WITH d AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
      FROM documents),
    tc AS (
      SELECT doc_id, t, count(*) AS c
      FROM (SELECT doc_id, unnest(toks) AS t FROM d)
      GROUP BY doc_id, t),
    terms AS (
      SELECT doc_id,
             CAST(sum(CAST(floor(c * log2(c) * 1e6 + 0.5) AS BIGINT))
                  AS BIGINT) AS sum_terms,
             CAST(sum(c) AS BIGINT) AS n_tokens
      FROM tc GROUP BY doc_id),
    ent AS (
      -- floor division via DOUBLE: DuckDB's integer // truncates toward
      -- zero, Spark's floor() floors — they differ when the rounding
      -- residue makes the numerator slightly negative (all-same-token doc)
      SELECT doc_id, n_tokens,
             CAST(floor(CAST(n_tokens * CAST(floor(log2(n_tokens) * 1e6 + 0.5)
                                             AS BIGINT)
                             - sum_terms AS DOUBLE) / n_tokens) AS BIGINT)
               AS ent_micro
      FROM terms WHERE n_tokens > 0)
    SELECT doc_id, n_tokens, ent_micro, rank FROM (
      SELECT doc_id, n_tokens, ent_micro,
             row_number() OVER (ORDER BY ent_micro, doc_id) AS rank
      FROM ent)
    WHERE rank <= 15
    """,
)
def text_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-entropy quality gate: per-document Shannon entropy of the
    unigram distribution, H = log2(L) − (Σ c·log2 c)/L — the standard
    low-diversity filter (boilerplate, keyword stuffing, stuck
    generators score near 0 bits; natural text 5+). Each c·log2(c) term
    is fixed-pointed to micro units BEFORE the per-doc sum, so the
    reduction is pure BIGINT and order-independent; the only libm calls
    take small-integer inputs both engines evaluate identically. Output:
    the 15 most repetitive docs. At 100 TB this is explode → two
    map-side-combinable aggregates, vocabulary-bounded per doc."""
    docs = table(spark, sf_dir, "documents")
    d = spread(docs, "doc_id").select(
        "doc_id", H.tokens(F.col("text")).alias("toks")
    )
    tc = (
        d.select("doc_id", F.explode("toks").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("c"))
    )
    terms = tc.groupBy("doc_id").agg(
        F.sum(
            F.floor(F.col("c") * F.log2("c") * 1e6 + F.lit(0.5)).cast("bigint")
        ).alias("sum_terms"),
        F.sum("c").alias("n_tokens"),
    )
    ent = terms.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        F.floor(
            (
                F.col("n_tokens")
                * F.floor(F.log2("n_tokens") * 1e6 + F.lit(0.5)).cast("bigint")
                - F.col("sum_terms")
            )
            / F.col("n_tokens")
        )
        .cast("bigint")
        .alias("ent_micro"),
    )
    return (
        ent.orderBy("ent_micro", "doc_id")
        .limit(15)
        .select(
            "doc_id",
            "n_tokens",
            "ent_micro",
            F.row_number()
            .over(Window.orderBy("ent_micro", "doc_id"))
            .alias("rank"),
        )
    )


_IVFPQ_NCELLS = 8
_IVFPQ_DIM = _PQ_M * _PQ_D  # 64


def _res_duck(ve: str, cent: str) -> str:
    return (
        f"list_transform(range(1, {_IVFPQ_DIM + 1}), "
        f"i -> ({ve})[i] - ({cent})[i])"
    )


_IVFPQ_TOPK_SQL = f"""
WITH c AS (
  SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS centroid
  FROM embeddings
  WHERE vec_id < {_IVFPQ_NCELLS} AND embedding IS NOT NULL),
a0 AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ve,
         c.centroid_id, c.centroid,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY {V.euclidean2_sql('CAST(e.embedding AS DOUBLE[])', 'c.centroid')},
                    c.centroid_id) AS rn
  FROM embeddings e CROSS JOIN c
  WHERE e.vec_id IS NOT NULL AND e.embedding IS NOT NULL),
assign AS (
  SELECT vec_id, centroid_id, {_res_duck('ve', 'centroid')} AS residual
  FROM a0 WHERE rn = 1),
pcb AS (
  SELECT [ [ {_pq_sub_duck('r', 'm')} FOR r IN cvs ] FOR m IN range({_PQ_M}) ] AS cbs
  FROM (SELECT list(residual ORDER BY vec_id) AS cvs
        FROM assign WHERE vec_id >= {_IVFPQ_NCELLS} AND vec_id < {_IVFPQ_NCELLS + _PQ_K})),
enc AS (
  SELECT vec_id, centroid_id, {_PQ_DUCK_CODES} AS codes
  FROM (SELECT vec_id, centroid_id, residual AS embedding FROM assign), pcb),
probes AS (
  SELECT vec_id AS q_id, centroid_id, {_res_duck('ve', 'centroid')} AS qe
  FROM a0 WHERE vec_id IN (10, 11, 12) AND rn <= 2),
scored AS (
  SELECT p.q_id, enc.vec_id, CAST({_PQ_DUCK_ADC} AS BIGINT) AS adc_nano
  FROM enc JOIN probes p USING (centroid_id) CROSS JOIN pcb)
SELECT q_id, vec_id, adc_nano, rank FROM (
  SELECT q_id, vec_id, adc_nano,
         row_number() OVER (PARTITION BY q_id
           ORDER BY adc_nano, vec_id) AS rank
  FROM scored) WHERE rank <= 5
"""


@register("ann_ivfpq_topk", _IVFPQ_TOPK_SQL)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production ANN index layout (FAISS IndexIVFPQ):
    coarse-quantize every vector to its nearest of 8 cells, PRODUCT-
    quantize the RESIDUAL (vector − cell centroid) to 8 one-byte codes,
    and serve queries by probing the 2 nearest cells with Asymmetric
    Distance Computation against the per-cell posting lists. Combines
    ann_ivf_topk's cell equi-join (the shuffle-partitionable probe) with
    ann_pq_topk's 32×-compressed scoring: at 100 TB the vector table
    stores as (cell, 8 codes), the probe is an equi-join on cell — never
    a corpus scan — and both codebooks broadcast as one row each. ADC
    partials floor to nano units and sum as BIGINT (hash-exact). The
    codebooks are deterministically data-sampled (first 8 raw vectors /
    next 16 residuals) so the oracle is exact; k-means training swaps in
    without changing the plan. Search-corpus null contract (r16):
    non-null id AND vector on both engines."""
    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isNotNull() & F.col("embedding").isNotNull())
        .select("vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("ve"))
    )
    cents = (
        emb.filter(F.col("vec_id") < _IVFPQ_NCELLS)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(vec_id, ve AS e))), "
                "s -> s.e)"
            ).alias("cents")
        )
    )
    a0 = (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "ve",
            F.posexplode("cents").alias("pos", "centroid"),
        )
        .select(
            "vec_id",
            "ve",
            (F.col("pos") + 1).alias("centroid_id"),
            "centroid",
            V.euclidean2(F.col("ve"), F.col("centroid")).alias("__d2"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("__d2", "centroid_id")
            ),
        )
    )
    assign = a0.filter(F.col("rn") == 1).select(
        "vec_id",
        "centroid_id",
        F.expr("zip_with(ve, centroid, (x, y) -> x - y)").alias("residual"),
    )
    pcb = (
        assign.filter(
            (F.col("vec_id") >= _IVFPQ_NCELLS)
            & (F.col("vec_id") < _IVFPQ_NCELLS + _PQ_K)
        )
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(vec_id, "
                "residual AS e))), s -> s.e)"
            ).alias("cvs")
        )
        .select(
            F.expr(
                f"transform(sequence(0, {_PQ_M - 1}), m -> "
                f"transform(cvs, e -> {_pq_sub('e', 'm')}))"
            ).alias("cbs")
        )
    )
    enc = (
        assign.crossJoin(F.broadcast(pcb))
        .select(
            "vec_id",
            "centroid_id",
            F.col("residual").alias("emb"),
            "cbs",
        )
        .select(
            "vec_id", "centroid_id", F.expr(_PQ_CODES_SPARK).alias("codes"), "cbs"
        )
    )
    probes = a0.filter(
        F.col("vec_id").isin(10, 11, 12) & (F.col("rn") <= 2)
    ).select(
        F.col("vec_id").alias("q_id"),
        "centroid_id",
        F.expr("zip_with(ve, centroid, (x, y) -> x - y)").alias("qe"),
    )
    scored = enc.join(probes, "centroid_id").select(
        "q_id", "vec_id", F.expr(_PQ_ADC_SPARK).alias("adc_nano")
    )
    w = Window.partitionBy("q_id").orderBy("adc_nano", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "vec_id", "adc_nano", "rank")
    )


@register(
    "ml_auc_exact",
    """
    WITH o AS (
      SELECT o_totalprice AS score, o_orderstatus = 'F' AS is_pos
      FROM orders WHERE o_totalprice IS NOT NULL),
    sc AS (
      SELECT score, count(*) FILTER (WHERE is_pos) AS pos_s,
             count(*) FILTER (WHERE NOT is_pos) AS neg_s
      FROM o GROUP BY score),
    cum AS (
      SELECT score, pos_s, neg_s,
             sum(neg_s) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumneg
      FROM sc),
    agg AS (
      SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
             CAST(sum(neg_s) AS BIGINT) AS n_neg,
             CAST(sum(pos_s * (2 * (cumneg - neg_s) + neg_s)) AS BIGINT)
               AS two_u
      FROM cum)
    SELECT n_pos, n_neg,
           CAST(two_u * 1000000 // (2 * n_pos * n_neg) AS BIGINT) AS auc_micro
    FROM agg
    """,
)
def ml_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC by the Mann-Whitney rank-sum identity, tie-correct:
    AUC = U/(P·N) with U = Σ_pos avg-rank − P(P+1)/2 — the standard
    offline evaluation of a scoring model (here: does order value
    predict fulfilment status). Reduced FIRST to the distinct-score
    contingency table (pos/neg counts per score), so the only ordered
    window runs over |distinct scores| aggregated rows, not the raw
    events — Σ_s pos_s·(2·neg_below + neg_s) counts discordant pairs
    exactly with ties at half weight, all in BIGINT; the single
    division is integer micro fixed point. At 100 TB: one map-side-
    combinable aggregate, then a window over the (much smaller) score
    table — never a global sort of the fact table. A score-less row
    can't be ranked — excluded both sides (r16); a null LABEL counts as
    neither positive nor negative on either engine."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select(
            F.col("o_totalprice").alias("score"),
            (F.col("o_orderstatus") == "F").alias("is_pos"),
        )
    )
    sc = o.groupBy("score").agg(
        F.count_if("is_pos").alias("pos_s"),
        F.count_if(~F.col("is_pos")).alias("neg_s"),
    )
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = sc.withColumn("cumneg", F.sum("neg_s").over(w))
    agg = cum.agg(
        F.sum("pos_s").alias("n_pos"),
        F.sum("neg_s").alias("n_neg"),
        F.sum(
            F.col("pos_s")
            * (2 * (F.col("cumneg") - F.col("neg_s")) + F.col("neg_s"))
        ).alias("two_u"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.floor(
            F.col("two_u") * 1000000 / (2 * F.col("n_pos") * F.col("n_neg"))
        )
        .cast("bigint")
        .alias("auc_micro"),
    )


@register(
    "ml_calibration_bins",
    f"""
    WITH p AS (
      SELECT ({H.hash64_sql('o_orderkey', 3)}) % 1000000 AS pred_micro,
             o_orderstatus = 'F' AS is_pos
      FROM orders),
    b AS (
      SELECT pred_micro // 100000 AS bin, count(*) AS n,
             count(*) FILTER (WHERE is_pos) AS pos,
             CAST(sum(pred_micro) AS BIGINT) AS sum_pred
      FROM p GROUP BY bin)
    SELECT bin, n,
           CAST(sum_pred // n AS BIGINT) AS mean_pred_micro,
           CAST(pos * 1000000 // n AS BIGINT) AS frac_pos_micro,
           CAST(abs(sum_pred // n - pos * 1000000 // n) AS BIGINT)
             AS gap_micro
    FROM b ORDER BY bin
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability bins: decile-bucket a model score
    against the observed positive rate and report the per-bin gap — the
    ECE (expected calibration error) building block every model-serving
    pipeline monitors. The 'model' is a deterministic hash-derived
    pseudo-score in [0,1) (micro units) so the oracle is exact; swapping
    in a real prediction column changes nothing structural. Pure
    integer arithmetic end-to-end — bin means and rates are floor-div
    micro rationals. One map-side-combinable aggregate → 10 rows."""
    o = table(spark, sf_dir, "orders")
    p = o.select(
        (H.hash64(F.col("o_orderkey"), 3) % 1000000).alias("pred_micro"),
        (F.col("o_orderstatus") == "F").alias("is_pos"),
    )
    b = p.groupBy(
        F.floor(F.col("pred_micro") / 100000).cast("bigint").alias("bin")
    ).agg(
        F.count("*").alias("n"),
        F.count_if("is_pos").alias("pos"),
        F.sum("pred_micro").alias("sum_pred"),
    )
    mean_pred = F.floor(F.col("sum_pred") / F.col("n")).cast("bigint")
    frac_pos = F.floor(F.col("pos") * 1000000 / F.col("n")).cast("bigint")
    return b.select(
        "bin",
        "n",
        mean_pred.alias("mean_pred_micro"),
        frac_pos.alias("frac_pos_micro"),
        F.abs(mean_pred - frac_pos).alias("gap_micro"),
    ).orderBy("bin")


_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_N = 20000


@register(
    "geo_geohash_cells",
    f"""
    WITH pts AS (
      SELECT (i * 73 % 997) / 997.0 * 16.0 - 2.0 AS lon,
             (i * 131 % 983) / 983.0 * 14.0 - 2.0 AS lat
      FROM (SELECT unnest(generate_series(0, {_GH_N - 1})) AS i)),
    q AS (
      SELECT CAST(floor((lon + 180.0) / 360.0 * 32768.0) AS BIGINT) AS lon_q,
             CAST(floor((lat + 90.0) / 180.0 * 32768.0) AS BIGINT) AS lat_q
      FROM pts),
    code AS (
      SELECT list_sum(list_transform(range(0, 15), i ->
               (((lon_q >> (14 - i)) & 1) << (29 - 2 * i))
               + (((lat_q >> (14 - i)) & 1) << (28 - 2 * i)))) AS c30
      FROM q),
    gh AS (
      SELECT list_aggregate(list_transform(range(0, 6), j ->
               substring('{_GH_ALPHABET}',
                         CAST(((c30 >> (25 - 5 * j)) & 31) AS INT) + 1, 1)),
             'string_agg', '') AS geohash
      FROM code),
    cells AS (SELECT geohash, count(*) AS n FROM gh GROUP BY geohash)
    SELECT geohash, n, rank FROM (
      SELECT geohash, n,
             row_number() OVER (ORDER BY n DESC, geohash) AS rank
      FROM cells)
    WHERE rank <= 15
    """,
)
def geo_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash spatial indexing: encode each point as a 6-character
    base-32 geohash (the interleaved-bit cell key used for spatial
    partitioning, prefix-range queries and neighbor lookups in every
    geo datalake — the string sibling of geo_zorder_key) and report the
    densest cells. The encode is pure integer bit math — quantize
    lon/lat to 15 bits each, interleave with one fold, emit chars by
    5-bit slices — identical cross-engine, no libm, no UDF. At 100 TB
    the encode is a map-only projection and the density report one
    map-side-combinable aggregate; prefix truncation gives every
    coarser zoom level for free."""
    pts = spark.range(_GH_N).select(
        ((F.col("id") * 73 % 997) / 997.0 * 16.0 - 2.0).alias("lon"),
        ((F.col("id") * 131 % 983) / 983.0 * 14.0 - 2.0).alias("lat"),
    )
    q = pts.select(
        F.floor((F.col("lon") + 180.0) / 360.0 * 32768.0)
        .cast("bigint")
        .alias("lon_q"),
        F.floor((F.col("lat") + 90.0) / 180.0 * 32768.0)
        .cast("bigint")
        .alias("lat_q"),
    )
    code = q.select(
        F.expr(
            "aggregate(sequence(0, 14), CAST(0 AS BIGINT), (acc, i) -> acc"
            " + shiftleft(shiftright(lon_q, 14 - i) & 1, 29 - 2 * i)"
            " + shiftleft(shiftright(lat_q, 14 - i) & 1, 28 - 2 * i))"
        ).alias("c30")
    )
    gh = code.select(
        F.expr(
            "concat_ws('', transform(sequence(0, 5), j -> "
            f"substring('{_GH_ALPHABET}', "
            "CAST((shiftright(c30, 25 - 5 * j) & 31) AS INT) + 1, 1)))"
        ).alias("geohash")
    )
    cells = gh.groupBy("geohash").agg(F.count("*").alias("n"))
    return (
        cells.orderBy(F.col("n").desc(), "geohash")
        .limit(15)
        .select(
            "geohash",
            "n",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "geohash"))
            .alias("rank"),
        )
    )


_MH_ACC_SQL = (
    _minhash_cte()
    + """,
expl AS (SELECT doc_id, unnest(bands) AS band FROM bandt),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM expl a JOIN expl b ON a.band = b.band AND a.doc_id < b.doc_id),
est AS (
  SELECT c.a_id, c.b_id,
         CAST(len(list_filter(range(0, 16),
                i -> sa.sig[i + 1] = sb.sig[i + 1])) * 62500 AS BIGINT)
           AS est_micro
  FROM cand c
  JOIN sigt sa ON sa.doc_id = c.a_id
  JOIN sigt sb ON sb.doc_id = c.b_id),
ex2 AS (
  SELECT c.a_id, c.b_id,
         CAST(len(list_filter(list_distinct(sa.shingles),
                              s -> list_contains(sb.shingles, s)))
              AS BIGINT) AS inter,
         CAST(len(list_distinct(sa.shingles)) AS BIGINT) AS na,
         CAST(len(list_distinct(sb.shingles)) AS BIGINT) AS nb
  FROM cand c
  JOIN base sa ON sa.doc_id = c.a_id
  JOIN base sb ON sb.doc_id = c.b_id)
SELECT e.a_id, e.b_id, e.est_micro,
       CAST(x.inter * 1000000 // greatest(x.na + x.nb - x.inter, 1)
            AS BIGINT) AS exact_micro,
       CAST(abs(e.est_micro
                - x.inter * 1000000 // greatest(x.na + x.nb - x.inter, 1))
            AS BIGINT) AS err_micro
FROM est e JOIN ex2 x ON e.a_id = x.a_id AND e.b_id = x.b_id
"""
)


@register("dedup_minhash_accuracy", _MH_ACC_SQL)
def dedup_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy evaluation for the MinHash-LSH dedup path: for
    every LSH candidate pair, the Jaccard ESTIMATE from 16-hash
    signature agreement (matches/16) next to the EXACT shingle-set
    Jaccard and the absolute error — the eval that justifies a
    signature width before a fleet-scale dedup run (the dedup twin of
    ann_*_recall). Candidates come from the production band equi-join
    (never all-pairs); the estimate is a zip-compare of two 16-int
    arrays; exact Jaccard uses the same integer intersect/union counts
    as the verify stage, floor-divided to micro units so both engines
    hash identically."""
    docs = table(spark, sf_dir, "documents")
    # three consumers (band explode + both verify sides) — checkpoint
    # the signature index once, as a production index store would
    s = D.with_minhash(docs, "text", 3, 16, 4, keep_shingles=True).localCheckpoint()
    b = s.select("doc_id", F.explode("__bands").alias("band"))
    cand = (
        b.select(F.col("doc_id").alias("a_id"), "band")
        .join(b.select(F.col("doc_id").alias("b_id"), "band"), "band")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    side = s.select(
        "doc_id",
        F.col("__sig").alias("sig"),
        F.array_distinct("__shingles").alias("sh"),
    )
    pa = side.select(
        F.col("doc_id").alias("a_id"),
        F.col("sig").alias("sig_a"),
        F.col("sh").alias("sh_a"),
    )
    pb = side.select(
        F.col("doc_id").alias("b_id"),
        F.col("sig").alias("sig_b"),
        F.col("sh").alias("sh_b"),
    )
    # cand is the LSH candidate-pair set — corpus-derived and unbounded,
    # so no broadcast hint (AQE converts at runtime iff it fits)
    j = cand.join(pa, "a_id").join(pb, "b_id")
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda v: v,
            )
        ).cast("bigint")
        * 62500
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    na = F.size("sh_a").cast("bigint")
    nb = F.size("sh_b").cast("bigint")
    exact = F.floor(
        inter * 1000000 / F.greatest(na + nb - inter, F.lit(1).cast("bigint"))
    ).cast("bigint")
    return j.select(
        "a_id",
        "b_id",
        est.alias("est_micro"),
        exact.alias("exact_micro"),
        F.abs(est - exact).alias("err_micro"),
    )


_NPROBE_MAX = 4


_NPROBE_CURVE_SQL = f"""
WITH c AS (
  SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS centroid
  FROM embeddings
  WHERE vec_id < {_IVFPQ_NCELLS} AND embedding IS NOT NULL),
a0 AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ve, c.centroid_id,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY {V.euclidean2_sql('CAST(e.embedding AS DOUBLE[])', 'c.centroid')},
                    c.centroid_id) AS rn
  FROM embeddings e CROSS JOIN c
  WHERE e.vec_id IS NOT NULL AND e.embedding IS NOT NULL),
assign AS (SELECT vec_id, centroid_id FROM a0 WHERE rn = 1),
probes AS (
  SELECT vec_id AS q_id, centroid_id, rn AS prn
  FROM a0 WHERE vec_id IN (10, 11, 12) AND rn <= {_NPROBE_MAX}),
q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings
      WHERE vec_id IN (10, 11, 12) AND embedding IS NOT NULL),
exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY round({V.cosine_sql('CAST(e.embedding AS DOUBLE[])', 'q.qe')}, 6) DESC,
                      e.vec_id) AS rank
    FROM embeddings e, q
    WHERE e.vec_id IS NOT NULL AND e.embedding IS NOT NULL)
  WHERE rank <= 10),
m AS (
  SELECT x.q_id, x.vec_id, p.prn
  FROM exact x
  JOIN assign a ON a.vec_id = x.vec_id
  LEFT JOIN probes p ON p.q_id = x.q_id AND p.centroid_id = a.centroid_id)
SELECT m.q_id, g.p AS nprobe,
       count(*) FILTER (WHERE m.prn IS NOT NULL AND m.prn <= g.p) AS n_hit,
       CAST(count(*) FILTER (WHERE m.prn IS NOT NULL AND m.prn <= g.p)
            * 100000 AS BIGINT) AS recall_micro
FROM m CROSS JOIN (SELECT unnest(range(1, {_NPROBE_MAX + 1})) AS p) g
GROUP BY m.q_id, g.p
"""


@register("ann_nprobe_curve", _NPROBE_CURVE_SQL)
def ann_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF tuning curve: recall@10 as a function of nprobe (1–4) in ONE
    plan — the measurement that picks the probe budget before a fleet
    rollout (recall@10 of probing p cells = fraction of the exact
    top-10 whose assigned cell ranks ≤ p among the query's nearest
    centroids; exact in-cell scoring means no further loss). The cell
    assignment and probe ranking reuse the IVF machinery; the sweep is
    an explode over p, not four plans. At 100 TB ground truth comes
    from a held-out sample; the curve table is |queries|×|p| rows.
    Search-corpus null contract (r16): non-null id + vector."""
    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isNotNull() & F.col("embedding").isNotNull())
        .select("vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("ve"))
    )
    c = emb.filter(F.col("vec_id") < _IVFPQ_NCELLS).select(
        F.col("vec_id").alias("centroid_id"), F.col("ve").alias("centroid")
    )
    a0 = (
        emb.crossJoin(F.broadcast(c))
        .select(
            "vec_id",
            "ve",
            "centroid_id",
            V.euclidean2(F.col("ve"), F.col("centroid")).alias("__d2"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("__d2", "centroid_id")
            ),
        )
    )
    assign = a0.filter(F.col("rn") == 1).select("vec_id", "centroid_id")
    probes = a0.filter(
        F.col("vec_id").isin(10, 11, 12) & (F.col("rn") <= _NPROBE_MAX)
    ).select(
        F.col("vec_id").alias("q_id"),
        "centroid_id",
        F.col("rn").alias("prn"),
    )
    q = emb.filter(F.col("vec_id").isin(10, 11, 12)).select(
        F.col("vec_id").alias("q_id"), F.col("ve").alias("qe")
    )
    exact = (
        emb.crossJoin(F.broadcast(q))
        .select(
            "q_id",
            "vec_id",
            F.round(V.cosine(F.col("ve"), F.col("qe")), 6).alias("cos"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.col("cos").desc(), "vec_id"
                )
            ),
        )
        .filter(F.col("rank") <= 10)
        .select("q_id", "vec_id")
    )
    m = F.broadcast(exact).join(assign, "vec_id").join(
        F.broadcast(probes), ["q_id", "centroid_id"], "left"
    )
    g = spark.range(1, _NPROBE_MAX + 1).select(F.col("id").alias("p"))
    hit = F.col("prn").isNotNull() & (F.col("prn") <= F.col("p"))
    return (
        m.crossJoin(F.broadcast(g))
        .groupBy("q_id", F.col("p").alias("nprobe"))
        .agg(
            F.count_if(hit).alias("n_hit"),
            (F.count_if(hit) * 100000).cast("bigint").alias("recall_micro"),
        )
    )


@register(
    "emb_dim_stats",
    """
    WITH comp AS (
      SELECT unnest(generate_series(0, len(embedding) - 1)) AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
               AS q
      FROM embeddings),
    s AS (
      SELECT pos, count(*) AS n,
             CAST(sum(q) AS BIGINT) AS s1,
             CAST(sum(q * q) AS BIGINT) AS s2
      FROM comp GROUP BY pos)
    SELECT pos, n,
           CAST(floor(CAST(s1 AS DOUBLE) / n) AS BIGINT) AS mean_micro,
           round((CAST(s2 AS DOUBLE) / n
                  - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 / 1e12, 6) AS var_unit
    FROM s
    """,
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (mean + variance) — the
    whitening/pruning screen run before quantization or dimensionality
    cuts (a near-zero-variance dimension carries no information and
    wastes index bytes; ann_matryoshka_recall measures the serving side
    of the same decision). Components quantize to integer micro units
    FIRST, so the distributed power sums are exact BIGINTs (the
    a7_moments discipline applied along the vector axis); the variance
    double is derived once per dimension from identical integers. At
    100 TB: explode to (pos, q) → one map-side-combinable aggregate,
    64 output rows."""
    emb = table(spark, sf_dir, "embeddings")
    comp = emb.select(
        F.posexplode(F.expr("CAST(embedding AS ARRAY<DOUBLE>)")).alias(
            "pos", "v"
        )
    ).select(
        "pos", F.floor(F.col("v") * 1e6).cast("bigint").alias("q")
    )
    s = comp.groupBy("pos").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    return s.select(
        "pos",
        "n",
        F.floor(s1 / n).cast("bigint").alias("mean_micro"),
        F.round(
            (
                s2.cast("double") / n
                - (s1.cast("double") / n) * (s1.cast("double") / n)
            )
            / 1e12,
            6,
        ).alias("var_unit"),
    )


_FRESH_SLA_S = 86400


@register(
    "dq_freshness_sla",
    f"""
    WITH per AS (
      SELECT event_type,
             CAST(floor(epoch(max(CAST(ts AS TIMESTAMP)))) AS BIGINT)
               AS last_epoch,
             count(*) AS n
      FROM events GROUP BY event_type),
    g AS (SELECT max(last_epoch) AS global_last FROM per)
    SELECT event_type, n, last_epoch,
           global_last - last_epoch AS lag_s,
           global_last - last_epoch > {_FRESH_SLA_S} AS sla_breach
    FROM per CROSS JOIN g
    ORDER BY event_type
    """,
)
def dq_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness SLA monitor: per feed (event_type), the latest event
    time, its lag behind the freshest feed, and a breach flag when the
    lag passes the SLA window — the first data-quality page an
    ingestion on-call looks at (a silently stalled upstream shows up
    here before any value-level check fires). Lag stays integer epoch
    seconds; the global watermark is a one-row broadcast. One
    map-side-combinable aggregate at any scale."""
    ev = table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.floor(F.unix_timestamp(F.max("ts")))
        .cast("bigint")
        .alias("last_epoch"),
        F.count("*").alias("n"),
    )
    g = per.agg(F.max("last_epoch").alias("global_last"))
    lag = F.col("global_last") - F.col("last_epoch")
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "n",
            "last_epoch",
            lag.alias("lag_s"),
            (lag > _FRESH_SLA_S).alias("sla_breach"),
        )
        .orderBy("event_type")
    )


_PHRASE = ("value", "table")


@register(
    "text_phrase_search",
    f"""
    WITH d AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
      FROM documents),
    post AS (
      SELECT doc_id, unnest(toks) AS tok,
             unnest(range(1, len(toks) + 1)) AS pos
      FROM d),
    hits AS (
      SELECT a.doc_id, count(*) AS n_occurrences
      FROM post a JOIN post b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      WHERE a.tok = '{_PHRASE[0]}' AND b.tok = '{_PHRASE[1]}'
      GROUP BY a.doc_id)
    SELECT doc_id, n_occurrences FROM hits
    """,
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index phrase search: find documents containing the
    exact phrase 'value table' by joining the two terms' postings lists on
    adjacent positions — the retrieval surface BM25's bag-of-words
    ranking cannot express (phrase and proximity queries need token
    POSITIONS in the index). The posting explode filters to the two
    query terms immediately, so the position join touches only their
    postings — inverted-index probe shape, never a corpus scan. At
    100 TB the postings join is an equi-join on (doc_id, pos),
    shuffle-partitionable by doc."""
    docs = table(spark, sf_dir, "documents")
    d = spread(docs, "doc_id").select(
        "doc_id", H.tokens(F.col("text")).alias("toks")
    )
    post = d.select(
        "doc_id", F.posexplode("toks").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    a = post.filter(F.col("tok") == _PHRASE[0]).select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    b = post.filter(F.col("tok") == _PHRASE[1]).select(
        "doc_id", F.col("pos").alias("pos_b")
    )
    return (
        a.join(b, "doc_id")
        .filter(F.col("pos_b") == F.col("pos_a") + 1)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_occurrences"))
    )


_MODULARITY_SQL = (
    _near_pairs_cte()
    + """,
src AS (SELECT doc_id, source FROM documents),
lab AS (
  SELECT p.a_id, p.b_id, sa.source AS src_a, sb.source AS src_b
  FROM pairs p
  JOIN src sa ON sa.doc_id = p.a_id
  JOIN src sb ON sb.doc_id = p.b_id),
m AS (SELECT count(*) AS m FROM lab),
ec AS (
  SELECT src_a AS source, count(*) AS intra_edges
  FROM lab WHERE src_a = src_b GROUP BY src_a),
dc AS (
  SELECT source, count(*) AS degree_sum FROM (
    SELECT src_a AS source FROM lab
    UNION ALL SELECT src_b FROM lab) GROUP BY source)
SELECT dc.source,
       CAST(coalesce(ec.intra_edges, 0) AS BIGINT) AS intra_edges,
       CAST(dc.degree_sum AS BIGINT) AS degree_sum,
       CAST(floor(CAST(4 * m.m * coalesce(ec.intra_edges, 0)
                       - dc.degree_sum * dc.degree_sum AS DOUBLE)
                  * 1e6 / (4 * m.m * m.m)) AS BIGINT) AS contrib_micro
FROM dc LEFT JOIN ec USING (source) CROSS JOIN m
"""
)


@register("graph_modularity", _MODULARITY_SQL)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of a labeling over the near-dup graph: score
    how strongly MinHash-LSH duplicate pairs concentrate WITHIN document
    sources (Q = Σ_c e_c/m − (d_c/2m)² — per-source contributions here;
    a high sum means dup clusters are source-internal, so per-source
    dedup sharding is safe; a low one means cross-source dedup is
    required). The edge list is the production band-join pair output —
    never all-pairs; modularity itself needs only two grouped counts
    over the (tiny) edge set and one broadcast edge total; the single
    division is floored micro fixed point from exact integers."""
    docs = table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, k=3, num_hashes=16, bands=4,
                                jaccard_threshold=0.1).select("a_id", "b_id")
    src = docs.select("doc_id", "source")
    lab = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("a_id"), F.col("source").alias("src_a")
            ),
            "a_id",
        )
        .join(
            src.select(
                F.col("doc_id").alias("b_id"), F.col("source").alias("src_b")
            ),
            "b_id",
        )
        # the labeled edge list is tiny but its upstream is the whole
        # MinHash band-join machinery — checkpoint so the three
        # consumers (m, ec, dc) don't each recompute it
        .localCheckpoint()
    )
    m = lab.agg(F.count("*").alias("m"))
    ec = (
        lab.filter(F.col("src_a") == F.col("src_b"))
        .groupBy(F.col("src_a").alias("source"))
        .agg(F.count("*").alias("intra_edges"))
    )
    dc = (
        lab.select(F.col("src_a").alias("source"))
        .unionAll(lab.select(F.col("src_b").alias("source")))
        .groupBy("source")
        .agg(F.count("*").alias("degree_sum"))
    )
    j = dc.join(ec, "source", "left").crossJoin(F.broadcast(m))
    e_c = F.coalesce(F.col("intra_edges"), F.lit(0)).cast("bigint")
    d_c = F.col("degree_sum").cast("bigint")
    return j.select(
        "source",
        e_c.alias("intra_edges"),
        d_c.alias("degree_sum"),
        F.floor(
            (4 * F.col("m") * e_c - d_c * d_c).cast("double")
            * 1e6
            / (4 * F.col("m") * F.col("m"))
        )
        .cast("bigint")
        .alias("contrib_micro"),
    )


import math as _math

_NDCG_W = [int(_math.floor(1e9 / _math.log2(r + 1))) for r in range(1, 11)]
_NDCG_W_SQL = "[" + ", ".join(str(w) for w in _NDCG_W) + "]"


_NDCG_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe, label AS q_lab
  FROM embeddings WHERE vec_id IN (10, 11, 12)),
cand AS (
  SELECT q.q_id,
         e.vec_id,
         round({V.cosine_sql('CAST(e.embedding AS DOUBLE[])', 'q.qe')}, 6)
           AS cos,
         CASE WHEN e.label = q.q_lab THEN 3
              WHEN abs(e.label - q.q_lab) = 1 THEN 1 ELSE 0 END AS gain
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.q_id),
ranked AS (
  SELECT q_id, gain,
         row_number() OVER (PARTITION BY q_id
           ORDER BY cos DESC, vec_id) AS rank
  FROM cand),
ideal AS (
  SELECT q_id, gain,
         row_number() OVER (PARTITION BY q_id
           ORDER BY gain DESC, vec_id) AS rank
  FROM cand),
dcg AS (
  SELECT q_id,
         CAST(sum(CAST(gain AS BIGINT) * ({_NDCG_W_SQL})[rank]) AS BIGINT)
           AS dcg_nano
  FROM ranked WHERE rank <= 10 GROUP BY q_id),
idcg AS (
  SELECT q_id,
         CAST(sum(CAST(gain AS BIGINT) * ({_NDCG_W_SQL})[rank]) AS BIGINT)
           AS idcg_nano
  FROM ideal WHERE rank <= 10 GROUP BY q_id)
SELECT dcg.q_id, dcg.dcg_nano, idcg.idcg_nano,
       CAST(floor(CAST(dcg.dcg_nano AS DOUBLE) * 1e6
                  / greatest(idcg.idcg_nano, 1)) AS BIGINT) AS ndcg_micro
FROM dcg JOIN idcg USING (q_id)
"""


@register("ml_ndcg_at10", _NDCG_SQL)
def ml_ndcg_at10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 ranking evaluation: score the cosine retrieval ranking
    against graded label relevance (same label = gain 3, adjacent = 1)
    with the standard log-position discount, normalized by the ideal
    ordering — the metric that grades ANN/hybrid rankers beyond binary
    recall (completing the eval suite: recall for coverage, AUC for
    classification, NDCG for ranking quality). Discount weights are
    precomputed integer nano literals (⌊1e9/log2(r+1)⌋), so DCG and
    IDCG are exact BIGINT sums and the single normalization is floored
    micro fixed point. At scale ground truth runs on a labeled sample;
    both rankings are windows over the per-query candidate set."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(10, 11, 12)).select(
        F.col("vec_id").alias("q_id"),
        F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("qe"),
        F.col("label").alias("q_lab"),
    )
    cand = (
        emb.select(
            "vec_id",
            F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("ve"),
            "label",
        )
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(V.cosine(F.col("ve"), F.col("qe")), 6).alias("cos"),
            F.when(F.col("label") == F.col("q_lab"), 3)
            .when(F.abs(F.col("label") - F.col("q_lab")) == 1, 1)
            .otherwise(0)
            .alias("gain"),
        )
    )
    weights = F.array(*[F.lit(w) for w in _NDCG_W])
    ranked = cand.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
        ),
    ).filter(F.col("rank") <= 10)
    ideal = cand.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("q_id").orderBy(F.col("gain").desc(), "vec_id")
        ),
    ).filter(F.col("rank") <= 10)
    w_at = F.element_at(weights, F.col("rank")).cast("bigint")
    dcg = ranked.groupBy("q_id").agg(
        F.sum(F.col("gain") * w_at).alias("dcg_nano")
    )
    idcg = ideal.groupBy("q_id").agg(
        F.sum(F.col("gain") * w_at).alias("idcg_nano")
    )
    return dcg.join(F.broadcast(idcg), "q_id").select(
        "q_id",
        "dcg_nano",
        "idcg_nano",
        F.floor(
            F.col("dcg_nano").cast("double")
            * 1e6
            / F.greatest(F.col("idcg_nano"), F.lit(1).cast("bigint"))
        )
        .cast("bigint")
        .alias("ndcg_micro"),
    )


@register(
    "ivm_join_delta",
    f"""
    SELECT c.c_mktsegment, count(*) AS n,
           {_dsum_sql('o.o_totalprice')} AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey IS NOT NULL
    GROUP BY c.c_mktsegment
    """,
)
def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a join-aggregate: with base and
    delta partitions on BOTH join sides, the maintained view updates as
    V ⊎ Δ(A⋈B) where Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — the classic IVM
    delta rule, so the base⋈base join (the 100 TB part) is NEVER
    re-executed on refresh; only delta-sided joins run. All four
    grouped partials merge by re-aggregation (counts add; decimal
    partial sums add exactly — the same mergeability that powers
    incremental_agg_merge). The oracle recomputes the view from
    scratch; equality proves the delta rule lost nothing.
    The base/delta split is keyed on o_orderkey — a null key belongs to
    neither partition, so it is excluded on both sides (r16)."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isNotNull())
        .select(
            "o_orderkey", "o_custkey", "o_totalprice",
            (F.col("o_orderkey") % 7 == 0).alias("o_delta"),
        )
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment",
        (F.col("c_custkey") % 5 == 0).alias("c_delta"),
    )

    def part(df, flag, is_delta):
        return df.filter(F.col(flag) == is_delta)

    def grouped(orders_df, cust_df):
        return (
            orders_df.join(
                cust_df, orders_df.o_custkey == cust_df.c_custkey
            )
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias(
                    "rev_partial"
                ),
            )
        )

    v_base = grouped(part(o, "o_delta", False), part(c, "c_delta", False))
    d1 = grouped(part(o, "o_delta", True), part(c, "c_delta", False))
    d2 = grouped(part(o, "o_delta", False), part(c, "c_delta", True))
    d3 = grouped(part(o, "o_delta", True), part(c, "c_delta", True))
    merged = (
        v_base.unionByName(d1).unionByName(d2).unionByName(d3)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n").alias("n"),
            F.sum("rev_partial").cast("double").alias("revenue"),
        )
    )
    return merged


@register(
    "s26_dynamic_overwrite",
    f"""
    -- nullif: the Hive partition layout stores '' as
    -- __HIVE_DEFAULT_PARTITION__, so an empty-string category reads
    -- back as NULL — the published contract, mirrored here
    SELECT nullif(o_orderpriority, '') AS o_orderpriority, count(*) AS n,
           {_dsum_sql(
               "o_totalprice + CASE WHEN o_orderpriority = '1-URGENT' "
               "THEN 100.0 ELSE 0.0 END"
           )} AS total
    FROM orders
    WHERE o_orderpriority IS NULL OR length(o_orderpriority) <= 255
    GROUP BY nullif(o_orderpriority, '')
    """,
)
def s26_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite: INSERT OVERWRITE replaces ONLY the
    partitions present in the incoming batch (here: a corrected
    1-URGENT feed re-publishes with +100 per order), leaving all other
    partitions' files untouched — the idempotent partition-level
    restatement every partitioned lake needs (static overwrite mode
    would have deleted the other four priorities). The read-back
    aggregate must equal the oracle's expected post-restatement state.
    At 100 TB only the restated partition is rewritten; the others are
    never opened."""
    dest = os.path.join(tempfile.mkdtemp(prefix="dynover_"), "orders_by_prio")
    # path safety (same posture as s16): a partition value is a
    # directory name; dirty multi-KB priorities go to the bad-records
    # channel, mirrored in the oracle's length guard
    orders = (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderpriority").isNull()
            | (F.length("o_orderpriority") <= 255)
        )
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )
    orders.write.partitionBy("o_orderpriority").parquet(dest)
    upd = orders.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "o_totalprice", F.col("o_totalprice") + 100.0
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        upd.write.mode("overwrite").partitionBy("o_orderpriority").parquet(
            dest
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # Explicit schema: restating an empty feed writes zero data files
    # and the read-back must still bind to the table's contract schema.
    back = spark.read.schema(orders.schema).parquet(dest)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), _dsum(F.col("o_totalprice")).alias("total")
    )


@register(
    "j_asof_nearest",
    """
    WITH c AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'purchase' AND user_id < 40
        AND ts IS NOT NULL AND event_id IS NOT NULL),
    e AS (
      SELECT event_id AS err_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'error' AND user_id < 40
        AND ts IS NOT NULL AND event_id IS NOT NULL),
    ranked AS (
      -- floor to whole epoch seconds BEFORE the diff (Spark's
      -- unix_timestamp truncates; DuckDB's epoch keeps fractions)
      SELECT c.event_id, c.user_id, e.err_id,
             abs(CAST(floor(epoch(c.ts)) AS BIGINT)
                 - CAST(floor(epoch(e.ts)) AS BIGINT)) AS dt_s,
             row_number() OVER (PARTITION BY c.event_id
               ORDER BY abs(CAST(floor(epoch(c.ts)) AS BIGINT)
                            - CAST(floor(epoch(e.ts)) AS BIGINT)),
                        CASE WHEN e.ts <= c.ts THEN 0 ELSE 1 END,
                        e.err_id) AS rn
      FROM c JOIN e USING (user_id))
    SELECT event_id, user_id, err_id, dt_s
    FROM ranked WHERE rn = 1
    """,
)
def j_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-as-of join, BOTH directions: each purchase pairs with the
    temporally closest error event of the same user (ties: prefer the
    earlier-or-equal side, then id) — the diagnosis join ('what went
    wrong nearest this outcome') that backward-only as-of
    (j_asof_join) cannot express. Plan: per-user equi-join bounds the
    candidate fan-out to the user's own events, then one argmin window
    per left row — at 100 TB the same plan holds with a time-bucket
    prefilter (j_range_bucketed) stacked under the equi-join to cap
    per-user fan-out; the window key is the left row, so no global
    sort. Nearest-in-time needs a timestamp and an identity on both
    sides — null ts/event_id rows excluded (r16 contract)."""
    ev = table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 40)
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    c = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("c_ts")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts").alias("e_ts"),
    )
    j = c.join(e, "user_id")
    dt = F.abs(
        F.unix_timestamp("c_ts") - F.unix_timestamp("e_ts")
    ).cast("bigint")
    w = Window.partitionBy("event_id").orderBy(
        dt,
        F.when(F.col("e_ts") <= F.col("c_ts"), 0).otherwise(1),
        "err_id",
    )
    return (
        j.withColumn("dt_s", dt)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "err_id", "dt_s")
    )


@register(
    "ml_prf1_eval",
    f"""
    WITH p AS (
      SELECT ({H.hash64_sql('o_orderkey', 11)}) % 1000 < 450 AS pred,
             o_orderstatus = 'F' AS label
      FROM orders),
    cm AS (
      SELECT count(*) FILTER (WHERE pred AND label) AS tp,
             count(*) FILTER (WHERE pred AND NOT label) AS fp,
             count(*) FILTER (WHERE NOT pred AND label) AS fn,
             count(*) FILTER (WHERE NOT pred AND NOT label) AS tn
      FROM p)
    SELECT tp, fp, fn, tn,
           CAST(floor(tp * 1000000.0 / greatest(tp + fp, 1)) AS BIGINT)
             AS precision_micro,
           CAST(floor(tp * 1000000.0 / greatest(tp + fn, 1)) AS BIGINT)
             AS recall_micro,
           CAST(floor(2 * tp * 1000000.0 / greatest(2 * tp + fp + fn, 1))
                AS BIGINT) AS f1_micro
    FROM cm
    """,
)
def ml_prf1_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1 — the classification-eval
    companion to ml_auc_exact (threshold-free) and ml_calibration_bins
    (probability quality): one conditional aggregate produces the four
    cells, and the three ratios are exact integer rationals in micro
    units (F1 = 2tp/(2tp+fp+fn) — no float, no harmonic-mean
    intermediate). The 'model' is the same deterministic hash
    pseudo-score family as the calibration query. One map-side-
    combinable pass at any scale; one output row."""
    o = table(spark, sf_dir, "orders")
    p = o.select(
        (H.hash64(F.col("o_orderkey"), 11) % 1000 < 450).alias("pred"),
        (F.col("o_orderstatus") == "F").alias("label"),
    )
    cm = p.agg(
        F.count_if(F.col("pred") & F.col("label")).alias("tp"),
        F.count_if(F.col("pred") & ~F.col("label")).alias("fp"),
        F.count_if(~F.col("pred") & F.col("label")).alias("fn"),
        F.count_if(~F.col("pred") & ~F.col("label")).alias("tn"),
    )
    one = F.lit(1).cast("bigint")
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.floor(
            F.col("tp") * 1000000 / F.greatest(F.col("tp") + F.col("fp"), one)
        )
        .cast("bigint")
        .alias("precision_micro"),
        F.floor(
            F.col("tp") * 1000000 / F.greatest(F.col("tp") + F.col("fn"), one)
        )
        .cast("bigint")
        .alias("recall_micro"),
        F.floor(
            2 * F.col("tp") * 1000000
            / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), one)
        )
        .cast("bigint")
        .alias("f1_micro"),
    )


@register(
    "corpus_mixture_temperature",
    """
    WITH agg AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    s AS (
      SELECT source, n_docs,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000) AS BIGINT)
               AS w_milli
      FROM agg),
    t AS (SELECT CAST(sum(w_milli) AS BIGINT) AS w_tot FROM s)
    SELECT source, n_docs, w_milli,
           CAST(floor(w_milli * 1000000.0 / w_tot) AS BIGINT) AS share_micro
    FROM s CROSS JOIN t
    ORDER BY source
    """,
)
def corpus_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain mixture (the multilingual/multi-source
    sampling rule, α = 0.5): each source's sampling share is
    n^α / Σ n^α, flattening the head and boosting the tail relative to
    proportional sampling (α=1, corpus_mixture's regime) without going
    fully uniform (α=0) — the published recipe from multilingual BERT/
    XLM-R onward. √n is floored to milli units BEFORE normalization so
    the share division is an exact integer rational. One aggregate per
    source + a one-row broadcast total at any scale."""
    docs = table(spark, sf_dir, "documents")
    agg = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    s = agg.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000)
        .cast("bigint")
        .alias("w_milli"),
    )
    t = s.agg(F.sum("w_milli").alias("w_tot"))
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            "w_milli",
            F.floor(F.col("w_milli") * 1000000 / F.col("w_tot"))
            .cast("bigint")
            .alias("share_micro"),
        )
        .orderBy("source")
    )


@register(
    "catalog_snapshot_expire",
    """
    WITH v AS (SELECT unnest(generate_series(0, 3)) AS version),
    n AS (SELECT count(*) AS n_rows FROM documents)
    SELECT v.version, n.n_rows,
           v.version >= 2 AS kept,
           v.version >= 2 AS readable_after
    FROM v CROSS JOIN n
    ORDER BY v.version
    """,
)
def catalog_snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot expiry (VACUUM retention): the versioned catalog
    accumulates copy-on-write snapshots on every MERGE; expiry keeps the
    last K (here 2) and deletes older snapshot directories — bounding
    time-travel storage exactly like Delta VACUUM / Iceberg
    expire_snapshots. Builds a real store, advances it through three
    MERGE updates (4 snapshots), reads every snapshot's row count
    BEFORE expiry, expires with keep_last=2, and reports which versions
    remain readable — the oracle predicts the full lifecycle in closed
    form. Update sets are disjoint id slices, so each snapshot has
    identical cardinality (copy-on-write replaces rows)."""
    import shutil

    from ..catalog.store import CatalogStore

    docigo = F.concat(F.lit("C"), (F.col("doc_id") % 10).cast("string"))
    rows = table(spark, sf_dir, "documents").select(
        F.concat_ws("_", docigo, F.col("lang"), F.lit("X"), F.lit("A")).alias(
            "indice"
        ),
        docigo.alias("codigo"),
        F.lit("P").alias("nombre_predio"),
        F.lit("S").alias("seccion"),
        F.lit("E").alias("especie"),
        F.lit("A").alias("apl"),
        F.lit(0).cast("int").alias("id_tipo_img"),
        F.lit(0).cast("int").alias("id_proceso"),
        F.concat(
            F.lit("lake/BR/"),
            docigo,
            F.lit("/"),
            F.col("doc_id").cast("string"),
            F.lit(".jpg"),
        ).alias("ruta_resultado"),
        F.current_timestamp().alias("fecha"),
    )
    store = CatalogStore(spark, tempfile.mkdtemp(prefix="catalog_expire_"))
    run_id = store.start_run(0)
    inserted = store.insert_catalog(rows, run_id)
    for mod in (3, 4, 5):
        ids = [
            r["id"]
            for r in inserted.filter(F.col("id") % 10 == mod)
            .select("id")
            .collect()
        ]
        store.update_processed_img(10, ids)
    versions = store.catalog_versions()
    n_rows = {v: store.catalog(version=v).count() for v in versions}
    keep_last = 2
    # An empty-source lifecycle can produce fewer than keep_last
    # snapshots (disjoint update slices are empty, so no MERGE lands);
    # expiry of a short history keeps everything rather than indexing
    # past the front of the list.
    vs = sorted(versions)
    cutoff = vs[-keep_last] if len(vs) >= keep_last else (vs[0] if vs else 0)
    for v in versions:
        if v < cutoff:
            shutil.rmtree(store._catalog_dir(v))
    out = [
        (
            v,
            n_rows[v],
            v >= cutoff,
            os.path.isdir(store._catalog_dir(v)),
        )
        for v in sorted(versions)
    ]
    return spark.createDataFrame(
        out, "version int, n_rows bigint, kept boolean, readable_after boolean"
    )


@register(
    "f19_url_parse",
    r"""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang
               || '&v=' || CAST(doc_id % 5 AS VARCHAR) AS url
      FROM documents WHERE doc_id % 37 = 0)
    SELECT doc_id,
           regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'lang=([^&]*)', 1) AS lang_param,
           CAST(regexp_extract(url, 'v=([0-9]+)', 1) AS BIGINT) AS v_param
    FROM u
    """,
)
def f19_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — host/path/query-parameter extraction with one
    shared regex family (the log-analytics / web-corpus canonicalization
    primitive; the reference parses object paths the same way at
    download_list_images.py:44-55). Spark's parse_url is JVM-only and
    DuckDB has none, so BOTH engines run the identical anchored
    regexes — no dialect drift, pure codegen'd projection, no shuffle
    at all."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 37 == 0)
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            F.col("lang"),
            F.lit("&v="),
            (F.col("doc_id") % 5).cast("string"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
        F.regexp_extract("url", r"^https?://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract("url", r"lang=([^&]*)", 1).alias("lang_param"),
        F.regexp_extract("url", r"v=([0-9]+)", 1)
        .cast("bigint")
        .alias("v_param"),
    )


_CIDRS = (("10.0.0.0", 8), ("172.16.0.0", 12), ("192.168.0.0", 16))


def _ip_int(dotted: str) -> int:
    a, b, c, d = (int(x) for x in dotted.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


@register(
    "f20_ip_cidr",
    f"""
    WITH ips AS (
      SELECT ({H.hash64_sql('event_id', 13)}) % 4294967296 AS ip
      FROM events),
    tagged AS (
      SELECT ip,
             CASE
               WHEN ip >> 24 = {_ip_int(_CIDRS[0][0]) >> 24}
                 THEN '10.0.0.0/8'
               WHEN ip >> 20 = {_ip_int(_CIDRS[1][0]) >> 20}
                 THEN '172.16.0.0/12'
               WHEN ip >> 16 = {_ip_int(_CIDRS[2][0]) >> 16}
                 THEN '192.168.0.0/16'
               ELSE 'public'
             END AS subnet,
             ((ip >> 24) & 255) || '.' || ((ip >> 16) & 255) || '.'
               || ((ip >> 8) & 255) || '.' || (ip & 255) AS dotted
      FROM ips),
    rt AS (
      SELECT subnet,
             CAST(string_split(dotted, '.')[1] AS BIGINT) * 16777216
             + CAST(string_split(dotted, '.')[2] AS BIGINT) * 65536
             + CAST(string_split(dotted, '.')[3] AS BIGINT) * 256
             + CAST(string_split(dotted, '.')[4] AS BIGINT) AS back,
             ip
      FROM tagged)
    SELECT subnet, count(*) AS n,
           count(*) FILTER (WHERE back = ip) AS n_roundtrip_ok
    FROM rt GROUP BY subnet ORDER BY subnet
    """,
)
def f20_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP/CIDR analytics: classify addresses into RFC-1918 subnets by
    prefix shift-compare (membership in a /n block is one right-shift
    equality — no string matching), render dotted-quad, and prove the
    parse/format round trip en masse — the security/access-log
    enrichment layer a datalake ingesting service logs needs. Addresses
    derive deterministically from the event stream via the cross-engine
    hash family. Pure integer bit math; one aggregate; map-side
    combined."""
    ev = table(spark, sf_dir, "events")
    ip = (H.hash64(F.col("event_id"), 13) % 4294967296).alias("ip")
    ips = ev.select(ip)
    subnet = (
        F.when(
            F.shiftright(F.col("ip"), 32 - _CIDRS[0][1])
            == _ip_int(_CIDRS[0][0]) >> (32 - _CIDRS[0][1]),
            "10.0.0.0/8",
        )
        .when(
            F.shiftright(F.col("ip"), 32 - _CIDRS[1][1])
            == _ip_int(_CIDRS[1][0]) >> (32 - _CIDRS[1][1]),
            "172.16.0.0/12",
        )
        .when(
            F.shiftright(F.col("ip"), 32 - _CIDRS[2][1])
            == _ip_int(_CIDRS[2][0]) >> (32 - _CIDRS[2][1]),
            "192.168.0.0/16",
        )
        .otherwise("public")
    )
    octet = lambda s: (F.shiftright(F.col("ip"), s) % 256).cast("string")  # noqa: E731
    tagged = ips.select(
        "ip",
        subnet.alias("subnet"),
        # concat (not concat_ws): concat_ws SKIPS nulls and renders a
        # NULL ip as '' whose octet cast then throws under ANSI; concat
        # propagates NULL like the SQL || operator
        F.concat(
            octet(24),
            F.lit("."),
            octet(16),
            F.lit("."),
            octet(8),
            F.lit("."),
            (F.col("ip") % 256).cast("string"),
        ).alias("dotted"),
    )
    parts = F.split(F.col("dotted"), r"\.")
    back = (
        F.element_at(parts, 1).cast("bigint") * 16777216
        + F.element_at(parts, 2).cast("bigint") * 65536
        + F.element_at(parts, 3).cast("bigint") * 256
        + F.element_at(parts, 4).cast("bigint")
    )
    return (
        tagged.withColumn("back", back)
        .groupBy("subnet")
        .agg(
            F.count("*").alias("n"),
            F.count_if(F.col("back") == F.col("ip")).alias("n_roundtrip_ok"),
        )
        .orderBy("subnet")
    )


_DEGREE_DIST_SQL = (
    _near_pairs_cte()
    + """,
deg AS (
  SELECT id, count(*) AS degree FROM (
    SELECT a_id AS id FROM pairs UNION ALL SELECT b_id FROM pairs)
  GROUP BY id)
SELECT CAST(floor(log2(degree)) AS BIGINT) AS degree_bin,
       count(*) AS n_nodes,
       CAST(min(degree) AS BIGINT) AS min_degree,
       CAST(max(degree) AS BIGINT) AS max_degree
FROM deg GROUP BY degree_bin ORDER BY degree_bin
"""
)


@register("graph_degree_distribution", _DEGREE_DIST_SQL)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-binned degree distribution of the near-dup graph — the
    skew diagnostic read BEFORE running components/pagerank at fleet
    scale (a heavy-tailed bin histogram says 'salt the hubs or cap
    per-template fan-out'; dedup_cluster_sizes reports the aftermath,
    this predicts it from the edge list alone). Two grouped counts over
    the band-join pair output; log2 runs on small exact integers only."""
    docs = table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, k=3, num_hashes=16, bands=4, jaccard_threshold=0.1
    ).select("a_id", "b_id").localCheckpoint()
    deg = (
        pairs.select(F.col("a_id").alias("id"))
        .unionAll(pairs.select(F.col("b_id").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    return (
        deg.groupBy(
            F.floor(F.log2("degree")).cast("bigint").alias("degree_bin")
        )
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("degree").cast("bigint").alias("min_degree"),
            F.max("degree").cast("bigint").alias("max_degree"),
        )
        .orderBy("degree_bin")
    )


_AHASH_BLOCKS = 64
_AHASH_MAX_HAMMING = 6


def _ahash_duck() -> str:
    block = (
        "('0x' || substring(md5(substring(t, "
        f"1 + CAST(floor(b * L / {_AHASH_BLOCKS}.0) AS INT), "
        f"CAST(greatest(floor(L / {_AHASH_BLOCKS}.0), 1) AS INT)"
        ")), 1, 2))::BIGINT"
    )
    return f"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         substring(text, 1, 9) || 'ZZZ' || substring(text, 13)
  FROM documents WHERE doc_id % 50 = 0 AND length(text) >= 12),
px AS (
  SELECT doc_id,
         [ {block} FOR b IN range({_AHASH_BLOCKS}) ] AS p
  FROM (SELECT doc_id, text AS t, greatest(length(text), 1) AS L
        FROM src)),
h AS (
  SELECT doc_id,
         list_sum([ CASE WHEN p[b + 1] * {_AHASH_BLOCKS} > list_sum(p)
                         THEN 1 << b ELSE 0 END
                    FOR b IN range({_AHASH_BLOCKS - 1}) ]) AS ahash
  FROM px),
bands AS (
  SELECT doc_id, ahash, b AS band_idx, (ahash >> (b * 9)) & 511 AS band_val
  FROM h, (SELECT unnest(range(7)) AS b)),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id),
ham AS (
  SELECT c.a_id, c.b_id,
         bit_count(xor(ha.ahash, hb.ahash)) AS hamming
  FROM cand c
  JOIN h ha ON ha.doc_id = c.a_id
  JOIN h hb ON hb.doc_id = c.b_id)
SELECT a_id, b_id, CAST(hamming AS BIGINT) AS hamming
FROM ham WHERE hamming <= {_AHASH_MAX_HAMMING}
"""


def _ahash_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ahash) for the perturbed-augmented document corpus —
    the shared index behind both aHash pair queries. localCheckpoint:
    the per-doc hash table is consumed multiple times (band explode +
    both verify sides); without the barrier, projection collapse
    inlines the 64-md5 block array into the per-bit lambda — O(blocks²)
    md5 per row per consumer (measured 48 s vs 4 s here). Materializing
    the (tiny) index is also what production does."""
    base = table(spark, sf_dir, "documents").select("doc_id", "text")
    variants = (
        base.filter((F.col("doc_id") % 50 == 0) & (F.length("text") >= 12))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(
                F.substring("text", 1, 9),
                F.lit("ZZZ"),
                F.expr("substring(text, 13)"),
            ).alias("text"),
        )
    )
    docs = base.unionByName(variants).select(
        "doc_id",
        F.col("text").alias("t"),
        F.greatest(F.length("text"), F.lit(1)).alias("L"),
    )
    block = (
        f"transform(sequence(0, {_AHASH_BLOCKS - 1}), b -> "
        "CAST(conv(substring(md5(substring(t, "
        f"1 + CAST(floor(b * L / {_AHASH_BLOCKS}.0) AS INT), "
        f"CAST(greatest(floor(L / {_AHASH_BLOCKS}.0), 1) AS INT)"
        ")), 1, 2), 16, 10) AS BIGINT))"
    )
    px = docs.select("doc_id", F.expr(block).alias("p")).localCheckpoint()
    return px.select(
        "doc_id",
        F.expr("aggregate(p, CAST(0 AS BIGINT), (a, x) -> a + x)").alias(
            "psum"
        ),
        "p",
    ).select(
        "doc_id",
        F.expr(
            f"aggregate(sequence(0, {_AHASH_BLOCKS - 2}), CAST(0 AS BIGINT), "
            f"(acc, b) -> acc + CASE WHEN element_at(p, b + 1) * {_AHASH_BLOCKS} "
            "> psum THEN shiftleft(CAST(1 AS BIGINT), b) "
            "ELSE CAST(0 AS BIGINT) END)"
        ).alias("ahash"),
    )


@register("multimodal_ahash_pairs", _ahash_duck())
def multimodal_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash near-dup pairs for binary assets: the
    payload is tiled into 64 length-proportional blocks (the 8×8 resize
    analogue), each block reduced to one 8-bit intensity (digest stub —
    PIL absent from the container; with it, the block reduction becomes
    a real luma downsample and NOTHING else changes), bits set by
    compare-to-mean (the aHash construction), and near-duplicates found
    by 9-bit pigeonhole band join + exact Hamming verify — image dedup
    joining the text (simhash) and embedding (cosine) families. 7 bands
    over 63 bits GUARANTEE recall at Hamming ≤ 6 (pigeonhole: some band
    is untouched); candidates are an equi-join, never all-pairs. The
    corpus is augmented with deterministic same-length perturbed copies
    (every 50th doc, 3 chars overwritten) so the pair channel is
    exercised end-to-end. Codegen'd column math throughout — one md5
    per block, integer bit ops, no Python.

    Banding vs scale: 9-bit bands collide ~N²/512 candidate pairs per
    band on random hashes, so the candidate set GROWS QUADRATICALLY
    with corpus size. The candidate join is therefore left unhinted —
    AQE broadcasts it only when it actually fits (a forced broadcast
    here OOMs the driver on a pathological corpus). At 100 TB, keep
    the pigeonhole guarantee but shrink collisions: wider bands with
    multi-probe (e.g. 4×16-bit bands probed at Hamming ≤ 1 per band
    guarantee overall Hamming ≤ 7), or a two-level (band, prefix)
    scheme — ``multimodal_ahash_pairs_wide`` is the registered
    wide-band variant and the PRODUCTION DEFAULT.

    Crossover (when to switch): narrow pays ~7·N²/2/2⁹ random band
    collisions for a cheap ×7 index explode; wide pays a fixed ×66
    index explode (3 bands × 22 Hamming≤1 probes) for only
    ~22·N²/2/2²¹ collisions — ~186× fewer. Both collision terms are
    quadratic, so the decision is narrow's extra collisions vs wide's
    extra ~59·N index rows: (7/2⁹ − 22/2²¹)·N²/2 > 59·N at
    N ≳ 9·10³ distinct hashes. I.e. narrow wins only on toy corpora
    (< ~10⁴ assets, where everything fits anyway); at any production
    corpus size — let alone 100 TB — use the wide variant."""
    h = _ahash_table(spark, sf_dir)
    bands = h.select(
        "doc_id",
        "ahash",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("band_idx"),
    ).select(
        "doc_id",
        "ahash",
        "band_idx",
        F.expr("shiftright(ahash, band_idx * 9) % 512").alias("band_val"),
    )
    cand = (
        bands.select(
            F.col("doc_id").alias("a_id"), "band_idx", "band_val"
        )
        .join(
            bands.select(
                F.col("doc_id").alias("b_id"), "band_idx", "band_val"
            ),
            ["band_idx", "band_val"],
        )
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    ha = h.select(F.col("doc_id").alias("a_id"), F.col("ahash").alias("h_a"))
    hb = h.select(F.col("doc_id").alias("b_id"), F.col("ahash").alias("h_b"))
    # cand is corpus-derived (quadratic-in-N band collisions) — no
    # broadcast hint; AQE converts to broadcast at runtime iff it fits
    return (
        cand
        .join(ha, "a_id")
        .join(hb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= _AHASH_MAX_HAMMING)
    )


_AHASH_WIDE_BITS = 21  # 3 bands × 21 bits cover the 63-bit hash
_AHASH_WIDE_BANDS = 3
_AHASH_WIDE_MAX_HAMMING = 5  # 3 bands × (1 probe flip + 1) - 1


def _ahash_wide_duck() -> str:
    block = (
        "('0x' || substring(md5(substring(t, "
        f"1 + CAST(floor(b * L / {_AHASH_BLOCKS}.0) AS INT), "
        f"CAST(greatest(floor(L / {_AHASH_BLOCKS}.0), 1) AS INT)"
        ")), 1, 2))::BIGINT"
    )
    w, nb = _AHASH_WIDE_BITS, _AHASH_WIDE_BANDS
    return f"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         substring(text, 1, 9) || 'ZZZ' || substring(text, 13)
  FROM documents WHERE doc_id % 50 = 0 AND length(text) >= 12),
px AS (
  SELECT doc_id,
         [ {block} FOR b IN range({_AHASH_BLOCKS}) ] AS p
  FROM (SELECT doc_id, text AS t, greatest(length(text), 1) AS L
        FROM src)),
h AS (
  SELECT doc_id,
         list_sum([ CASE WHEN p[b + 1] * {_AHASH_BLOCKS} > list_sum(p)
                         THEN 1 << b ELSE 0 END
                    FOR b IN range({_AHASH_BLOCKS - 1}) ]) AS ahash
  FROM px),
idx AS (
  SELECT doc_id, b AS band_idx,
         (ahash >> (b * {w})) & {(1 << w) - 1} AS band_val
  FROM h, (SELECT unnest(range({nb})) AS b)),
probe AS (
  SELECT doc_id, band_idx,
         CASE WHEN j < 0 THEN band_val ELSE xor(band_val, 1 << j) END
           AS probe_val
  FROM idx, (SELECT unnest(range(-1, {w})) AS j)),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM probe a JOIN idx b
    ON a.band_idx = b.band_idx AND a.probe_val = b.band_val
   AND a.doc_id < b.doc_id),
ham AS (
  SELECT c.a_id, c.b_id,
         bit_count(xor(ha.ahash, hb.ahash)) AS hamming
  FROM cand c
  JOIN h ha ON ha.doc_id = c.a_id
  JOIN h hb ON hb.doc_id = c.b_id)
SELECT a_id, b_id, CAST(hamming AS BIGINT) AS hamming
FROM ham WHERE hamming <= {_AHASH_WIDE_MAX_HAMMING}
"""


@register("multimodal_ahash_pairs_wide", _ahash_wide_duck())
def multimodal_ahash_pairs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-posture aHash near-dup join: WIDE bands + multi-probe,
    trading a slightly tighter guarantee for ~200× fewer band
    collisions. 3 bands of 21 bits tile the 63-bit hash; the probe side
    emits each band value plus its 21 single-bit flips (22 keys/band),
    so a pair is found iff some band differs in ≤ 1 bit — by pigeonhole
    every pair with total Hamming ≤ 5 is guaranteed (6+ could spread 2
    flips into every band). Expected random collisions fall from
    ~N²/2⁹ per band (the 9-bit scheme in ``multimodal_ahash_pairs``) to
    ~22·N²/2²¹ — the candidate set stays join-shaped at corpus sizes
    where narrow bands go quadratic. Probe fan-out is a fixed ×66
    explode of the TINY hash index, never of payloads; the verify join
    is unhinted (AQE broadcasts iff it fits)."""
    h = _ahash_table(spark, sf_dir)
    w, nb = _AHASH_WIDE_BITS, _AHASH_WIDE_BANDS
    idx = h.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("band_idx"),
        "ahash",
    ).select(
        "doc_id",
        "band_idx",
        F.expr(f"shiftright(ahash, band_idx * {w}) % {1 << w}").alias(
            "band_val"
        ),
    )
    probe = idx.select(
        F.col("doc_id").alias("a_id"),
        "band_idx",
        F.explode(
            F.expr(
                f"array_union(array(band_val), transform(sequence(0, {w - 1}), "
                "j -> CAST(band_val ^ shiftleft(1, j) AS BIGINT)))"
            )
        ).alias("probe_val"),
    )
    cand = (
        probe.join(
            idx.select(
                F.col("doc_id").alias("b_id"),
                "band_idx",
                F.col("band_val").alias("probe_val"),
            ),
            ["band_idx", "probe_val"],
        )
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    ha = h.select(F.col("doc_id").alias("a_id"), F.col("ahash").alias("h_a"))
    hb = h.select(F.col("doc_id").alias("b_id"), F.col("ahash").alias("h_b"))
    return (
        cand.join(ha, "a_id")
        .join(hb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= _AHASH_WIDE_MAX_HAMMING)
    )


def _soundex_sql(name_expr: str) -> str:
    """American-Soundex-style code as ONE shared SQL expression evaluated
    identically by Spark and DuckDB (neither dialect's builtin is used:
    DuckDB has none, and sharing the text guarantees bit-equality).
    H/W adjacency is simplified to vowel treatment — a deterministic,
    documented variant; blocking only needs both engines to agree."""
    letters = f"regexp_replace(upper({name_expr}), '[^A-Z]', '')"
    coded = letters
    mapping = {
        "1": "BFPV",
        "2": "CGJKQSXZ",
        "3": "DT",
        "4": "L",
        "5": "MN",
        "6": "R",
        "0": "AEIOUYHW",
    }
    for digit, chars in mapping.items():
        for ch in chars:
            coded = f"replace({coded}, '{ch}', '{digit}')"
    for _ in range(4):  # collapse runs up to length 16
        for d in "123456":
            coded = f"replace({coded}, '{d}{d}', '{d}')"
    coded = f"replace({coded}, '0', '')"
    return (
        f"(substring({letters}, 1, 1) || "
        f"rpad(substring({coded}, 2, 3), 3, '0'))"
    )


_ER_SDX = _soundex_sql("nm")


@register(
    "er_fuzzy_match",
    f"""
    WITH clean AS (
      SELECT p_partkey AS id, p_name AS nm, 'master' AS side FROM part),
    dirty AS (
      SELECT p_partkey + 1000000 AS id,
             substring(p_name, 1, 3) || 'a' || substring(p_name, 4) AS nm,
             'feed' AS side
      FROM part WHERE p_partkey % 20 = 0),
    allr AS (SELECT * FROM clean UNION ALL SELECT * FROM dirty),
    keyed AS (SELECT id, nm, side, {_ER_SDX} AS sdx FROM allr),
    cand AS (
      SELECT m.id AS master_id, f.id AS feed_id, m.nm AS master_nm,
             f.nm AS feed_nm
      FROM keyed m JOIN keyed f
        ON m.sdx = f.sdx AND m.side = 'master' AND f.side = 'feed'),
    verified AS (
      SELECT master_id, feed_id,
             CAST(levenshtein(master_nm, feed_nm) AS BIGINT) AS lev
      FROM cand)
    SELECT master_id, feed_id, lev
    FROM verified WHERE lev <= 2
    """,
)
def er_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / record linkage: match a dirty feed (part
    names with a deterministic typo — a vowel inserted at position 4)
    back to the master by BLOCKING on a phonetic soundex key and
    verifying candidates with bounded Levenshtein — the MDM dedup
    pattern that never compares all pairs: the quadratic step runs only
    within phonetic blocks (an equi-join on the code), and the O(n·m)
    edit-distance DP touches candidates alone. The soundex is one
    shared SQL expression both engines evaluate identically (a vowel
    inserted between different-code letters preserves the key, so this
    perturbation family blocks correctly; same-code neighbors would
    need a second blocking pass, as production linkage runs do). At
    100 TB: blocking key = shuffle key; hot blocks salt like any
    skewed join."""
    part = table(spark, sf_dir, "part")
    clean = part.select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("nm"),
        F.lit("master").alias("side"),
    )
    dirty = part.filter(F.col("p_partkey") % 20 == 0).select(
        (F.col("p_partkey") + 1000000).alias("id"),
        F.concat(
            F.substring("p_name", 1, 3),
            F.lit("a"),
            F.expr("substring(p_name, 4)"),
        ).alias("nm"),
        F.lit("feed").alias("side"),
    )
    keyed = clean.unionByName(dirty).withColumn("sdx", F.expr(_ER_SDX))
    m = keyed.filter(F.col("side") == "master").select(
        F.col("id").alias("master_id"),
        F.col("nm").alias("master_nm"),
        "sdx",
    )
    f_ = keyed.filter(F.col("side") == "feed").select(
        F.col("id").alias("feed_id"), F.col("nm").alias("feed_nm"), "sdx"
    )
    return (
        m.join(F.broadcast(f_), "sdx")
        .select(
            "master_id",
            "feed_id",
            F.levenshtein("master_nm", "feed_nm").cast("bigint").alias("lev"),
        )
        .filter(F.col("lev") <= 2)
    )


@register(
    "a24_seq_motifs",
    """
    WITH s AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE user_id < 100),
    tri AS (
      SELECT user_id,
             event_type || '>' ||
             lead(event_type, 1) OVER w || '>' ||
             lead(event_type, 2) OVER w AS motif
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST))
    SELECT motif, n, rank FROM (
      SELECT motif, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, motif) AS rank
      FROM tri WHERE motif IS NOT NULL
      GROUP BY motif)
    WHERE rank <= 10
    """,
)
def a24_seq_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent behavioral 3-motifs: the top event-type trigrams across
    user streams (two stacked leads over ONE per-user window — the
    sequence-mining upgrade of seq_transitions' bigrams; the journeys
    that dominate tell you what to optimize or what a bot loop looks
    like). The window shuffles once by user; the motif count is
    map-side-combinable; top-10 is TakeOrdered. NULL-tailed partials
    (streams shorter than 3) drop before counting."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # null-PROPAGATING concat (SQL || semantics): a trigram with any
    # null element — stream tail OR null event_type — is no motif.
    # concat_ws would silently splice "a>b" out of (a, NULL, b) (r16).
    tri = ev.select(
        F.concat(
            "event_type",
            F.lit(">"),
            F.lead("event_type", 1).over(w),
            F.lit(">"),
            F.lead("event_type", 2).over(w),
        ).alias("motif"),
    ).filter(F.col("motif").isNotNull())
    counts = tri.groupBy("motif").agg(F.count("*").alias("n"))
    return (
        counts.orderBy(F.col("n").desc(), "motif")
        .limit(10)
        .select(
            "motif",
            "n",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "motif"))
            .alias("rank"),
        )
    )


_TRACK_N = 200
_TRACK_STEP = 10


@register(
    "geo_track_resample",
    f"""
    WITH pts AS (
      SELECT i // {_TRACK_N} AS track_id,
             (i % {_TRACK_N}) * 7 + (i % {_TRACK_N}) * 13 % 5 AS t,
             (i % {_TRACK_N}) * 31 % 1000 AS x,
             (i % {_TRACK_N}) * 57 % 1000 AS y
      FROM (SELECT unnest(generate_series(0, {5 * _TRACK_N - 1})) AS i)),
    seg AS (
      SELECT track_id, t AS t0, x AS x0, y AS y0,
             lead(t) OVER w AS t1, lead(x) OVER w AS x1,
             lead(y) OVER w AS y1
      FROM pts WINDOW w AS (PARTITION BY track_id ORDER BY t)),
    tgt AS (
      SELECT track_id, g.k * {_TRACK_STEP} AS tt
      FROM (SELECT DISTINCT track_id FROM pts),
           (SELECT unnest(generate_series(0, {_TRACK_N * 7 // _TRACK_STEP}))
              AS k) g),
    j AS (
      SELECT s.track_id, g.tt,
             CAST(floor((CAST(s.x0 AS DOUBLE) * (s.t1 - s.t0)
                         + (s.x1 - s.x0) * (g.tt - s.t0))
                        * 1e6 / (s.t1 - s.t0)) AS BIGINT) AS x_micro,
             CAST(floor((CAST(s.y0 AS DOUBLE) * (s.t1 - s.t0)
                         + (s.y1 - s.y0) * (g.tt - s.t0))
                        * 1e6 / (s.t1 - s.t0)) AS BIGINT) AS y_micro
      FROM seg s JOIN tgt g
        ON g.track_id = s.track_id AND g.tt >= s.t0 AND g.tt < s.t1
      WHERE s.t1 IS NOT NULL AND s.t1 > s.t0)
    SELECT track_id, tt, x_micro, y_micro FROM j
    """,
)
def geo_track_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory resampling: linearly interpolate each GPS track onto a
    fixed time grid (the normalization every fleet/mobility pipeline
    runs before map-matching or stay-point detection — irregular pings
    become comparable fixed-step positions). Segments come from one
    lead window per track; each grid instant joins its bracketing
    segment and interpolates with exact integer-rational arithmetic,
    floored to micro units. The bracketing join is per-track with a
    bounded time predicate — at 100 TB it stacks on the
    j_range_bucketed time-cell rewrite so the planner gets an
    equi-join, and the grid side is generated, never stored."""
    pts = spark.range(5 * _TRACK_N).select(
        (F.col("id") / _TRACK_N).cast("bigint").alias("track_id"),
        (
            (F.col("id") % _TRACK_N) * 7 + ((F.col("id") % _TRACK_N) * 13) % 5
        ).alias("t"),
        ((F.col("id") % _TRACK_N) * 31 % 1000).alias("x"),
        ((F.col("id") % _TRACK_N) * 57 % 1000).alias("y"),
    )
    w = Window.partitionBy("track_id").orderBy("t")
    seg = pts.select(
        "track_id",
        F.col("t").alias("t0"),
        F.col("x").alias("x0"),
        F.col("y").alias("y0"),
        F.lead("t").over(w).alias("t1"),
        F.lead("x").over(w).alias("x1"),
        F.lead("y").over(w).alias("y1"),
    ).filter(F.col("t1").isNotNull() & (F.col("t1") > F.col("t0")))
    tgt = (
        pts.select("track_id")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(_TRACK_N * 7 // _TRACK_STEP + 1).select(
                    (F.col("id") * _TRACK_STEP).alias("tt")
                )
            )
        )
    )
    j = seg.join(
        F.broadcast(tgt),
        (F.col("tt") >= F.col("t0"))
        & (F.col("tt") < F.col("t1"))
        & (seg.track_id == tgt.track_id),
    )

    def interp(c0, c1):
        return (
            F.floor(
                (
                    F.col(c0).cast("double") * (F.col("t1") - F.col("t0"))
                    + (F.col(c1) - F.col(c0)) * (F.col("tt") - F.col("t0"))
                )
                * 1e6
                / (F.col("t1") - F.col("t0"))
            )
            .cast("bigint")
        )

    return j.select(
        seg.track_id.alias("track_id"),
        "tt",
        interp("x0", "x1").alias("x_micro"),
        interp("y0", "y1").alias("y_micro"),
    )


_DOC_CONTRACT = [
    ("doc_id", "bigint"),
    ("text", "string"),
    ("lang", "string"),
    ("source", "string"),
    ("n_chars", "bigint"),
    ("embedding_dim", "int"),  # deliberately absent: contract violation
]

_CONTRACT_SQL = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col_name, '{t}' AS expected_type, "
    + (
        f"'{t}' AS actual_type, true AS ok"
        if c != "embedding_dim"
        else "'<missing>' AS actual_type, false AS ok"
    )
    for c, t in _DOC_CONTRACT
)


@register("dq_schema_contract", _CONTRACT_SQL + "\nORDER BY col_name")
def dq_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-contract gate: assert a dataset's ACTUAL parquet schema
    against the declared contract column-by-column (name + Spark type),
    reporting per-column verdicts — the producer/consumer handshake
    that catches upstream type drift (int→bigint widenings, dropped
    columns) BEFORE a 100 TB backfill bakes it in. One deliberately
    missing contract column ('embedding_dim') exercises the violation
    path; the oracle pins the expected verdict table. Schema comes from
    file-footer metadata only — zero data rows are read."""
    actual = {
        f.name: f.dataType.simpleString()
        for f in spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).schema.fields
    }
    rows = [
        (
            c,
            t,
            actual.get(c, "<missing>"),
            actual.get(c) == t,
        )
        for c, t in _DOC_CONTRACT
    ]
    return spark.createDataFrame(
        rows,
        "col_name string, expected_type string, actual_type string, ok boolean",
    ).orderBy("col_name")


@register(
    "j_shuffle_hash_hint",
    f"""
    SELECT p.p_brand, count(*) AS n, {_dsum_sql('l.l_extendedprice')} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def j_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHUFFLE_HASH-hinted fact join: when the build side fits one
    partition's memory but not a broadcast, a shuffled hash join beats
    sort-merge by skipping BOTH sort passes entirely — the right
    physical strategy for medium-dimension × huge-fact at 100 TB where
    broadcast is too big and SMJ pays two O(n log n) sorts plus spill.
    The hint pins the strategy (audited: ShuffledHashJoin, no Sort
    above the scans); results are identical to the plain join, so the
    plain SQL is the oracle. Decimal partials keep the revenue sum
    order-independent across the hash partitioning."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    part = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = li.join(part.hint("SHUFFLE_HASH"), "l_partkey")
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        _dsum(F.col("l_extendedprice")).alias("revenue"),
    )


_KNN_HELDOUT = (400, 450)
_KNN_K = 5


_KNN_SQL = f"""
WITH tr AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve, label
  FROM embeddings
  WHERE (vec_id < {_KNN_HELDOUT[0]} OR vec_id >= {_KNN_HELDOUT[1]})
    AND embedding IS NOT NULL),
q AS (
  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe,
         label AS true_label
  FROM embeddings
  WHERE vec_id >= {_KNN_HELDOUT[0]} AND vec_id < {_KNN_HELDOUT[1]}
    AND embedding IS NOT NULL),
nn AS (
  SELECT q_id, true_label, label AS n_label FROM (
    SELECT q.q_id, q.true_label, tr.label,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY round({V.cosine_sql('tr.ve', 'q.qe')}, 6) DESC,
                      tr.vec_id) AS rank
    FROM tr CROSS JOIN q) WHERE rank <= {_KNN_K}),
votes AS (
  SELECT q_id, true_label, n_label, count(*) AS votes
  FROM nn GROUP BY q_id, true_label, n_label),
pred AS (
  SELECT q_id, true_label, n_label AS pred_label FROM (
    SELECT q_id, true_label, n_label, votes,
           row_number() OVER (PARTITION BY q_id
             ORDER BY votes DESC, n_label NULLS FIRST) AS r
    FROM votes) WHERE r = 1)
SELECT true_label, count(*) AS n,
       count(*) FILTER (WHERE pred_label = true_label) AS n_correct,
       CAST(floor(count(*) FILTER (WHERE pred_label = true_label)
                  * 1000000.0 / count(*)) AS BIGINT) AS acc_micro
FROM pred GROUP BY true_label
"""


@register("ml_knn_classifier", _KNN_SQL)
def ml_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification accuracy on the embedding table: hold out a
    50-vector slice, predict each held-out label by majority vote of
    its 5 nearest training neighbors (cosine; ties → more votes, then
    smaller label), and report per-class accuracy — the standard
    embedding-quality probe (a space where k-NN can't classify won't
    retrieve either; complements recall/NDCG which grade ranking, not
    label structure). Queries broadcast over the training scan; one
    ranking window + one vote argmax window per query; accuracies are
    floored micro rationals. Search-corpus null contract (r16):
    non-null id + vector; a null LABEL may still vote (and a null
    prediction is simply never correct) — identical on both engines."""
    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isNotNull() & F.col("embedding").isNotNull())
        .select(
            "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("ve"), "label"
        )
    )
    lo, hi = _KNN_HELDOUT
    tr = emb.filter((F.col("vec_id") < lo) | (F.col("vec_id") >= hi))
    q = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).select(
        F.col("vec_id").alias("q_id"),
        F.col("ve").alias("qe"),
        F.col("label").alias("true_label"),
    )
    nn = (
        tr.crossJoin(F.broadcast(q))
        .select(
            "q_id",
            "true_label",
            F.col("label").alias("n_label"),
            "vec_id",
            F.round(V.cosine(F.col("ve"), F.col("qe")), 6).alias("cos"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.col("cos").desc(), "vec_id"
                )
            ),
        )
        .filter(F.col("rank") <= _KNN_K)
    )
    votes = nn.groupBy("q_id", "true_label", "n_label").agg(
        F.count("*").alias("votes")
    )
    pred = (
        votes.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.col("votes").desc(), "n_label"
                )
            ),
        )
        .filter(F.col("r") == 1)
        .select("q_id", "true_label", F.col("n_label").alias("pred_label"))
    )
    correct = F.col("pred_label") == F.col("true_label")
    return pred.groupBy("true_label").agg(
        F.count("*").alias("n"),
        F.count_if(correct).alias("n_correct"),
        F.floor(F.count_if(correct) * 1000000.0 / F.count("*"))
        .cast("bigint")
        .alias("acc_micro"),
    )


@register(
    "dq_quarantine_reasons",
    """
    WITH feed AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      UNION ALL
      SELECT o_orderkey + 10000000, -o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_orderkey + 20000000, o_totalprice, 'X'
      FROM orders WHERE o_orderkey % 89 = 0),
    checked AS (
      SELECT o_orderkey,
             list_filter([
               CASE WHEN o_totalprice <= 0 THEN 'nonpositive_price' END,
               CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                    THEN 'invalid_status' END,
               CASE WHEN o_orderkey >= 10000000 THEN 'synthetic_id_range' END
             ], r -> r IS NOT NULL) AS reasons
      FROM feed),
    bad AS (
      SELECT o_orderkey, unnest(reasons) AS reason
      FROM checked WHERE len(reasons) > 0)
    SELECT reason, count(*) AS n,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM bad GROUP BY reason ORDER BY reason
    """,
)
def dq_quarantine_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quarantine with reason codes: every incoming row is
    checked against the full rule set at once (an ARRAY of fired rules,
    not first-failure — triage needs to know ALL reasons), violating
    rows explode into a (row, reason) quarantine feed, and the report
    aggregates per reason with key ranges for debugging — the row
    detail layer under dq_constraints' table-level gate and
    catalog_wap_publish's batch gate. Dirty rows are seeded
    deterministically (negated prices, invalid status). One pass, one
    explode, one aggregate at any scale."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    feed = (
        o.unionByName(
            o.filter(F.col("o_orderkey") % 97 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                (-F.col("o_totalprice")).alias("o_totalprice"),
                "o_orderstatus",
            )
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 89 == 0).select(
                (F.col("o_orderkey") + 20000000).alias("o_orderkey"),
                "o_totalprice",
                F.lit("X").alias("o_orderstatus"),
            )
        )
    )
    reasons = F.filter(
        F.array(
            F.when(F.col("o_totalprice") <= 0, "nonpositive_price"),
            F.when(
                ~F.col("o_orderstatus").isin("F", "O", "P"), "invalid_status"
            ),
            F.when(F.col("o_orderkey") >= 10000000, "synthetic_id_range"),
        ),
        lambda r: r.isNotNull(),
    )
    checked = feed.select("o_orderkey", reasons.alias("reasons"))
    bad = checked.filter(F.size("reasons") > 0).select(
        "o_orderkey", F.explode("reasons").alias("reason")
    )
    return (
        bad.groupBy("reason")
        .agg(
            F.count("*").alias("n"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("reason")
    )


_SPAN_LEN = 3
_SPAN_SEED = 17


@register(
    "pipeline_span_corruption",
    f"""
    WITH d AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
      FROM documents),
    pos AS (
      SELECT doc_id, unnest(range(1, len(toks) + 1)) AS p
      FROM d),
    starts AS (
      SELECT doc_id, p AS s FROM pos
      WHERE ({H.hash64_sql("doc_id::VARCHAR || ':' || p::VARCHAR", _SPAN_SEED)}) % 7 = 0),
    masked AS (
      SELECT DISTINCT pos.doc_id, pos.p
      FROM pos JOIN starts
        ON starts.doc_id = pos.doc_id
       AND pos.p >= starts.s AND pos.p < starts.s + {_SPAN_LEN}),
    agg AS (
      SELECT d.doc_id, len(d.toks) AS n_tokens,
             coalesce(st.n_spans, 0) AS n_spans,
             coalesce(mk.n_masked, 0) AS n_masked
      FROM d
      LEFT JOIN (SELECT doc_id, count(*) AS n_spans
                 FROM starts GROUP BY doc_id) st USING (doc_id)
      LEFT JOIN (SELECT doc_id, count(*) AS n_masked
                 FROM masked GROUP BY doc_id) mk USING (doc_id))
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_spans AS BIGINT) AS n_spans,
           CAST(n_masked AS BIGINT) AS n_masked,
           CAST(floor(n_masked * 1000000.0 / greatest(n_tokens, 1))
                AS BIGINT) AS corruption_micro
    FROM agg WHERE doc_id % 11 = 0
    """,
)
def pipeline_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption mask planning (the T5/UL2 denoising objective):
    deterministic hash-seeded span starts (rate 1/7), fixed span length
    3, overlapping spans merged by position-distinct — reporting per
    document the span count, masked-token count and corruption rate
    the batch builder needs BEFORE materializing targets (~15% here ≈
    T5's default). Mask positions derive from the cross-engine hash
    family, so the whole plan — position explode, start filter,
    coverage join, distinct — is exactly reproducible; at 100 TB the
    coverage join is per-doc position-bounded, never cross-doc."""
    docs = table(spark, sf_dir, "documents")
    d = spread(docs, "doc_id").select(
        "doc_id", H.tokens(F.col("text")).alias("toks")
    )
    pos = d.select(
        "doc_id", F.posexplode("toks").alias("p0", "__t")
    ).select("doc_id", (F.col("p0") + 1).alias("p"))
    starts = pos.filter(
        H.hash64(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("p").cast("string"),
            ),
            _SPAN_SEED,
        )
        % 7
        == 0
    ).select("doc_id", F.col("p").alias("s"))
    masked = (
        pos.join(starts, "doc_id")
        .filter(
            (F.col("p") >= F.col("s"))
            & (F.col("p") < F.col("s") + _SPAN_LEN)
        )
        .select("doc_id", "p")
        .distinct()
    )
    st = starts.groupBy("doc_id").agg(F.count("*").alias("n_spans"))
    mk = masked.groupBy("doc_id").agg(F.count("*").alias("n_masked"))
    agg = (
        d.select("doc_id", F.size("toks").cast("bigint").alias("n_tokens"))
        .join(st, "doc_id", "left")
        .join(mk, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("n_masked", F.lit(0)).cast("bigint").alias("n_masked"),
        )
    )
    return agg.filter(F.col("doc_id") % 11 == 0).select(
        "doc_id",
        "n_tokens",
        "n_spans",
        "n_masked",
        F.floor(
            F.col("n_masked") * 1000000.0 / F.greatest(F.col("n_tokens"), F.lit(1))
        )
        .cast("bigint")
        .alias("corruption_micro"),
    )
@register(
    "pipeline_padding_waste",
    """
    WITH d AS (
      SELECT doc_id, len(list_filter(
               string_split_regex(lower(text), '\\s+'), t -> t <> ''))
               AS n_tok
      FROM documents),
    b AS (
      SELECT doc_id, n_tok,
             CAST(power(2, ceil(log2(greatest(n_tok, 1)))) AS BIGINT)
               AS bucket_len
      FROM d)
    SELECT bucket_len, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS real_tokens,
           CAST(count(*) * bucket_len - sum(n_tok) AS BIGINT) AS pad_tokens,
           CAST(floor((count(*) * bucket_len - sum(n_tok)) * 1000000.0
                      / (count(*) * bucket_len)) AS BIGINT) AS waste_micro
    FROM b GROUP BY bucket_len ORDER BY bucket_len
    """,
)
def pipeline_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste report for length-bucketed batching: docs bucket to
    the next power-of-two sequence length and each bucket reports how
    many pad tokens a rectangular batch would burn — the measurement
    that decides between plain padding, length-grouped batching, and
    sequence packing (pack_sequences is the fix; this quantifies the
    problem it fixes). log2/ceil run on small exact integers; waste
    ratios are floored micro rationals. One aggregate, map-side
    combined."""
    docs = table(spark, sf_dir, "documents")
    d = spread(docs, "doc_id").select(
        "doc_id", F.size(H.tokens(F.col("text"))).alias("n_tok")
    )
    b = d.select(
        "n_tok",
        F.pow(2.0, F.ceil(F.log2(F.greatest(F.col("n_tok"), F.lit(1)))))
        .cast("bigint")
        .alias("bucket_len"),
    )
    g = b.groupBy("bucket_len").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("real_tokens")
    )
    pad = F.col("n_docs") * F.col("bucket_len") - F.col("real_tokens")
    return g.select(
        "bucket_len",
        "n_docs",
        "real_tokens",
        pad.alias("pad_tokens"),
        F.floor(pad * 1000000.0 / (F.col("n_docs") * F.col("bucket_len")))
        .cast("bigint")
        .alias("waste_micro"),
    ).orderBy("bucket_len")


@register(
    "ts_business_days",
    """
    WITH ship AS (
      SELECT l_orderkey, min(CAST(l_shipdate AS TIMESTAMP)) AS first_ship
      FROM lineitem GROUP BY l_orderkey),
    lag AS (
      SELECT o.o_orderpriority,
             CAST(floor(epoch(CAST(o.o_orderdate AS TIMESTAMP)) / 86400)
                  AS BIGINT) AS d0,
             CAST(floor(epoch(s.first_ship) / 86400) AS BIGINT) AS d1
      FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey),
    biz AS (
      SELECT o_orderpriority,
             (5 * ((d1 + 4) // 7) + least((d1 + 4) % 7, 5))
             - (5 * ((d0 + 4) // 7) + least((d0 + 4) % 7, 5)) AS bdays
      FROM lag WHERE d1 >= d0)
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(bdays) AS BIGINT) AS total_bdays,
           CAST(floor(sum(bdays) * 1000000.0 / count(*)) AS BIGINT)
             AS avg_bdays_micro
    FROM biz GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def ts_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day SLA latency: weekdays between order placement and
    first shipment, per priority — the calendar-aware lag every ops
    dashboard needs (7 calendar days spanning a weekend is 5 business
    days). Weekday counting is a pure integer closed form on epoch day
    numbers (validated against a date-walk oracle: g(d) = 5·⌊(d+4)/7⌋ +
    min((d+4) mod 7, 5) counts weekdays below d; the difference counts
    (d0, d1]) — no dayofweek() builtin, whose week-start convention
    differs between engines. One join + one aggregate; at 100 TB the
    per-order min-shipdate is map-side combined before the join."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    ship = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship")
    )
    lag = orders.join(
        ship, orders.o_orderkey == ship.l_orderkey
    ).select(
        "o_orderpriority",
        F.floor(F.unix_timestamp("o_orderdate") / 86400)
        .cast("bigint")
        .alias("d0"),
        F.floor(F.unix_timestamp("first_ship") / 86400)
        .cast("bigint")
        .alias("d1"),
    )

    def wk(d):
        m = F.col(d) + 4
        return 5 * F.floor(m / 7).cast("bigint") + F.least(
            m % 7, F.lit(5).cast("bigint")
        )

    biz = lag.filter(F.col("d1") >= F.col("d0")).select(
        "o_orderpriority", (wk("d1") - wk("d0")).alias("bdays")
    )
    return (
        biz.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("bdays").alias("total_bdays"),
        )
        .select(
            "o_orderpriority",
            "n",
            "total_bdays",
            F.floor(F.col("total_bdays") * 1000000.0 / F.col("n"))
            .cast("bigint")
            .alias("avg_bdays_micro"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "ab_test_zscore",
    f"""
    WITH assign AS (
      SELECT ({H.hash64_sql('o_orderkey', 21)}) % 2 = 0 AS variant_a,
             o_orderstatus = 'F' AS converted
      FROM orders),
    g AS (
      SELECT count(*) FILTER (WHERE variant_a) AS n_a,
             count(*) FILTER (WHERE variant_a AND converted) AS c_a,
             count(*) FILTER (WHERE NOT variant_a) AS n_b,
             count(*) FILTER (WHERE NOT variant_a AND converted) AS c_b
      FROM assign)
    SELECT n_a, c_a, n_b, c_b,
           round((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
                 / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
    FROM g
    """,
)
def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: deterministic
    hash-bucketed assignment (the same salted-split discipline as
    p10_train_val_test), pooled-variance z-score for the conversion
    delta — the experimentation readout layered on the engine's eval
    suite. One conditional aggregate produces the four counts; the only
    float math is the final z from identical exact integers in both
    engines, rounded to 6 decimals. A |z| < 1.96 here is the expected
    null result: the hash split is independent of order status by
    construction."""
    o = table(spark, sf_dir, "orders")
    a = o.select(
        (H.hash64(F.col("o_orderkey"), 21) % 2 == 0).alias("variant_a"),
        (F.col("o_orderstatus") == "F").alias("converted"),
    )
    g = a.agg(
        F.count_if("variant_a").alias("n_a"),
        F.count_if(F.col("variant_a") & F.col("converted")).alias("c_a"),
        F.count_if(~F.col("variant_a")).alias("n_b"),
        F.count_if(~F.col("variant_a") & F.col("converted")).alias("c_b"),
    )
    # try_divide throughout: a zero-row (or one-sided) experiment reads
    # out as NULL z, not an ANSI divide-by-zero; identical to `/` on any
    # populated split.
    p_a = F.try_divide(F.col("c_a").cast("double"), F.col("n_a"))
    p_b = F.try_divide(F.col("c_b").cast("double"), F.col("n_b"))
    p_pool = F.try_divide(
        (F.col("c_a") + F.col("c_b")).cast("double"),
        F.col("n_a") + F.col("n_b"),
    )
    z = F.try_divide(
        p_a - p_b,
        F.sqrt(
            p_pool
            * (1 - p_pool)
            * (
                F.try_divide(F.lit(1.0), F.col("n_a"))
                + F.try_divide(F.lit(1.0), F.col("n_b"))
            )
        ),
    )
    return g.select(
        "n_a", "c_a", "n_b", "c_b", F.round(z, 6).alias("z_score")
    )


@register(
    "geo_snap_simplify",
    f"""
    SELECT id_predio, ring_idx,
           count(*) AS n_edges,
           count(*) FILTER (WHERE floor(x1 * 4) = floor(x2 * 4)
                              AND floor(y1 * 4) = floor(y2 * 4))
             AS n_collapsed,
           CAST(floor(count(*) FILTER (WHERE floor(x1 * 4) = floor(x2 * 4)
                                         AND floor(y1 * 4) = floor(y2 * 4))
                      * 1000000.0 / count(*)) AS BIGINT) AS collapse_micro
    FROM {GF.ring_edges_values_sql()}
    GROUP BY id_predio, ring_idx
    """,
)
def geo_snap_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snap-to-grid simplification planning: quantize every ring vertex
    to a quarter-unit grid and count edges that collapse (both endpoints
    in one cell) — the vertex-budget estimate run before rendering or
    coarse-zoom tiling (geo_tile_pyramid picks the zoom; this says how
    much geometry each zoom can drop). The edge walk is the same
    higher-order traversal as geo_ring_areas — pure column math, one
    aggregate, no UDF, no join."""
    polys = GF.spark_polys(spark)
    ring = F.col("__r")
    n = F.size(ring)
    snapped_same = lambda i: (  # noqa: E731
        (
            F.floor(F.element_at(ring, i)["x"] * 4)
            == F.floor(F.element_at(ring, (i % n) + 1)["x"] * 4)
        )
        & (
            F.floor(F.element_at(ring, i)["y"] * 4)
            == F.floor(F.element_at(ring, (i % n) + 1)["y"] * 4)
        )
    )
    collapsed = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc + F.when(snapped_same(i), 1).otherwise(0),
    )
    out = polys.select(
        "id_predio", F.posexplode("rings").alias("ring_idx", "__r")
    ).select(
        "id_predio",
        "ring_idx",
        n.cast("bigint").alias("n_edges"),
        collapsed.alias("n_collapsed"),
    )
    return out.select(
        "id_predio",
        "ring_idx",
        "n_edges",
        "n_collapsed",
        F.floor(F.col("n_collapsed") * 1000000.0 / F.col("n_edges"))
        .cast("bigint")
        .alias("collapse_micro"),
    )


@register(
    "j_mark_join_flags",
    """
    WITH f AS (
      SELECT o_custkey,
             bool_or(o_orderpriority = '1-URGENT') AS has_urgent,
             bool_or(o_orderstatus = 'O') AS has_open,
             count(*) FILTER (WHERE o_totalprice > 300000) AS n_big
      FROM orders GROUP BY o_custkey)
    SELECT coalesce(f.has_urgent, false) AS has_urgent,
           coalesce(f.has_open, false) AS has_open,
           count(*) AS n_customers,
           CAST(sum(coalesce(f.n_big, 0)) AS BIGINT) AS total_big_orders
    FROM customer c LEFT JOIN f ON f.o_custkey = c.c_custkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def j_mark_join_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mark-join rewrite: three correlated EXISTS predicates computed as
    ONE grouped pass over the fact table (bool_or flags + a conditional
    count), then a single left join back to the dimension — the
    optimizer transformation that turns N existence subqueries into one
    scan (a naive plan runs three semi-joins over the same 100 TB
    fact). Customers with no orders land in the (false, false) segment
    via coalesce — the LEFT join preserves them where a semi-join chain
    would not. One fact aggregate + one broadcast-joinable flag table."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey")
    f = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderpriority") == "1-URGENT").alias("has_urgent"),
        F.max(F.col("o_orderstatus") == "O").alias("has_open"),
        F.count_if(F.col("o_totalprice") > 300000).alias("n_big"),
    )
    # f is a per-customer aggregate — linear-in-SF, unhinted (AQE decides)
    j = c.join(f, c.c_custkey == f.o_custkey, "left")
    return (
        j.groupBy(
            F.coalesce("has_urgent", F.lit(False)).alias("has_urgent"),
            F.coalesce("has_open", F.lit(False)).alias("has_open"),
        )
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.coalesce("n_big", F.lit(0))).alias("total_big_orders"),
        )
        .orderBy("has_urgent", "has_open")
    )


@register(
    "emb_outlier_zscore",
    """
    WITH comp AS (
      SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
               AS q
      FROM embeddings),
    s AS (
      SELECT pos, count(*) AS n, CAST(sum(q) AS BIGINT) AS s1,
             CAST(sum(q * q) AS BIGINT) AS s2
      FROM comp GROUP BY pos),
    z AS (
      SELECT c.vec_id,
             CAST(floor(CAST((c.q * s.n - s.s1) AS DOUBLE)
                        * (c.q * s.n - s.s1)
                        / greatest(CAST(s.n AS DOUBLE)
                                   * (s.n * s.s2 - s.s1 * s.s1), 1)
                        * 1e9 + 0.5) AS BIGINT) AS z2_nano
      FROM comp c JOIN s USING (pos)),
    v AS (SELECT vec_id, CAST(sum(z2_nano) AS BIGINT) AS maha_nano
          FROM z GROUP BY vec_id)
    SELECT vec_id, maha_nano, rank FROM (
      SELECT vec_id, maha_nano,
             row_number() OVER (ORDER BY maha_nano DESC, vec_id) AS rank
      FROM v)
    WHERE rank <= 10
    """,
)
def emb_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier detection by diagonal Mahalanobis distance:
    per-dimension standardized deviations squared and summed — the
    cheap anomaly screen that catches corrupted vectors (wrong scale,
    truncated writes, NaN-zeroed dims) before they poison an ANN index
    or a semantic-dedup pass. Components quantize to integer micro
    units (emb_dim_stats discipline), z² terms are exact-integer
    numerators over exact-integer variances fixed-pointed to nano, and
    the per-vector sum is pure BIGINT. Stats are 64 rows broadcast back
    onto the component stream; top-10 is TakeOrdered."""
    emb = table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id",
        F.posexplode(F.expr("CAST(embedding AS ARRAY<DOUBLE>)")).alias(
            "pos", "v"
        ),
    ).select(
        "vec_id", "pos", F.floor(F.col("v") * 1e6).cast("bigint").alias("q")
    )
    s = comp.groupBy("pos").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    num = F.col("q") * F.col("n") - F.col("s1")
    den = F.greatest(
        F.col("n").cast("double")
        * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")),
        F.lit(1.0),
    )
    z = comp.join(F.broadcast(s), "pos").select(
        "vec_id",
        F.floor(num.cast("double") * num / den * 1e9 + F.lit(0.5))
        .cast("bigint")
        .alias("z2_nano"),
    )
    v = z.groupBy("vec_id").agg(F.sum("z2_nano").alias("maha_nano"))
    return (
        v.orderBy(F.col("maha_nano").desc(), "vec_id")
        .limit(10)
        .select(
            "vec_id",
            "maha_nano",
            F.row_number()
            .over(Window.orderBy(F.col("maha_nano").desc(), "vec_id"))
            .alias("rank"),
        )
    )


@register(
    "ml_lift_table",
    f"""
    WITH p AS (
      SELECT ({H.hash64_sql('o_orderkey', 31)}) % 1000000 AS score,
             o_orderstatus = 'F' AS is_pos
      FROM orders WHERE o_orderkey IS NOT NULL),
    b AS (
      SELECT 9 - score // 100000 AS decile, count(*) AS n,
             count(*) FILTER (WHERE is_pos) AS pos
      FROM p GROUP BY decile),
    t AS (SELECT sum(n) AS n_tot, sum(pos) AS pos_tot FROM b),
    c AS (
      SELECT decile, n, pos,
             sum(pos) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
             sum(n) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
      FROM b)
    SELECT c.decile, c.n, c.pos,
           CAST(floor(c.cum_pos * 1000000.0 / t.pos_tot) AS BIGINT)
             AS capture_micro,
           CAST(floor(c.cum_pos * t.n_tot * 1000000.0
                      / (c.cum_n * t.pos_tot)) AS BIGINT) AS lift_micro
    FROM c CROSS JOIN t ORDER BY c.decile
    """,
)
def ml_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table: rank the population by model score, split into
    deciles (0 = highest-scored), and report cumulative capture rate
    and lift vs the base rate — the targeting readout (with AUC, PR/F1,
    calibration and NDCG this completes the eval suite; lift is what a
    campaign owner actually reads). Deciles come from integer score
    buckets so there is no global sort of raw rows; the cumulative
    window runs over 10 aggregated rows; capture and lift are floored
    micro rationals from exact integers. Near-1.0 lifts everywhere are
    the expected null: the hash score is independent of the label.
    Unscoreable rows (null key → null hash) excluded both sides (r16)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey").isNotNull())
    p = o.select(
        (H.hash64(F.col("o_orderkey"), 31) % 1000000).alias("score"),
        (F.col("o_orderstatus") == "F").alias("is_pos"),
    )
    b = p.groupBy(
        (9 - F.floor(F.col("score") / 100000)).cast("bigint").alias("decile")
    ).agg(F.count("*").alias("n"), F.count_if("is_pos").alias("pos"))
    t = b.agg(F.sum("n").alias("n_tot"), F.sum("pos").alias("pos_tot"))
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = b.withColumn("cum_pos", F.sum("pos").over(w)).withColumn(
        "cum_n", F.sum("n").over(w)
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n",
            "pos",
            F.floor(F.col("cum_pos") * 1000000.0 / F.col("pos_tot"))
            .cast("bigint")
            .alias("capture_micro"),
            F.floor(
                F.col("cum_pos")
                * F.col("n_tot")
                * 1000000.0
                / (F.col("cum_n") * F.col("pos_tot"))
            )
            .cast("bigint")
            .alias("lift_micro"),
        )
        .orderBy("decile")
    )


_RAKE_STOP = ("a", "the", "to", "of", "and", "in", "is", "on")
_RAKE_STOP_SQL = "('" + "', '".join(_RAKE_STOP) + "')"


@register(
    "text_keyphrase_rake",
    f"""
    WITH d AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
      FROM documents),
    pos AS (
      SELECT doc_id, unnest(toks) AS tok,
             unnest(range(1, len(toks) + 1)) AS p
      FROM d),
    cw AS (
      SELECT doc_id, tok, p,
             p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
      FROM pos WHERE tok NOT IN {_RAKE_STOP_SQL}),
    phr AS (
      SELECT doc_id, grp,
             string_agg(tok, ' ' ORDER BY p) AS phrase,
             count(*) AS plen
      FROM cw GROUP BY doc_id, grp),
    wstat AS (
      SELECT tok, count(*) AS freq,
             CAST(sum(plen) AS BIGINT) AS degree
      FROM cw JOIN phr USING (doc_id, grp)
      GROUP BY tok),
    wscore AS (
      SELECT tok, CAST(floor(degree * 1000000.0 / freq) AS BIGINT)
               AS wscore_micro
      FROM wstat),
    pscore AS (
      SELECT p.phrase, CAST(sum(w.wscore_micro) AS BIGINT) AS score_micro
      FROM cw c
      JOIN phr p USING (doc_id, grp)
      JOIN wscore w ON w.tok = c.tok
      GROUP BY p.doc_id, p.grp, p.phrase),
    best AS (
      SELECT phrase, CAST(max(score_micro) AS BIGINT) AS score_micro,
             count(*) AS n_occurrences
      FROM pscore GROUP BY phrase)
    SELECT phrase, score_micro, n_occurrences, rank FROM (
      SELECT phrase, score_micro, n_occurrences,
             row_number() OVER (ORDER BY score_micro DESC, phrase) AS rank
      FROM best)
    WHERE rank <= 15
    """,
)
def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs (the islands trick — position
    minus dense rank — finds runs without iteration), each word scores
    degree/frequency (degree = Σ lengths of phrases containing it), and
    a phrase scores the sum of its word scores — the unsupervised
    keyphrase baseline that beats TF-IDF on multi-word terms
    (text_tfidf_topk is the unigram sibling). Word scores are floored
    micro rationals, phrase sums exact BIGINT. Per-doc islands window,
    three vocabulary-sized aggregates, one broadcast word-score join —
    nothing scales beyond (doc, position)."""
    docs = table(spark, sf_dir, "documents")
    d = spread(docs, "doc_id").select(
        "doc_id", H.tokens(F.col("text")).alias("toks")
    )
    pos = d.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select("doc_id", "tok", (F.col("p0") + 1).alias("p"))
    w_doc = Window.partitionBy("doc_id").orderBy("p")
    cw = pos.filter(~F.col("tok").isin(*_RAKE_STOP)).withColumn(
        "grp", F.col("p") - F.row_number().over(w_doc)
    )
    phr = cw.groupBy("doc_id", "grp").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("p"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.count("*").alias("plen"),
    )
    wstat = (
        cw.join(phr, ["doc_id", "grp"])
        .groupBy("tok")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("degree"))
    )
    wscore = wstat.select(
        "tok",
        F.floor(F.col("degree") * 1000000.0 / F.col("freq"))
        .cast("bigint")
        .alias("wscore_micro"),
    )
    pscore = (
        cw.join(phr, ["doc_id", "grp"])
        .join(F.broadcast(wscore), "tok")
        .groupBy("doc_id", "grp", "phrase")
        .agg(F.sum("wscore_micro").alias("score_micro"))
    )
    best = pscore.groupBy("phrase").agg(
        F.max("score_micro").alias("score_micro"),
        F.count("*").alias("n_occurrences"),
    )
    return (
        best.orderBy(F.col("score_micro").desc(), "phrase")
        .limit(15)
        .select(
            "phrase",
            "score_micro",
            "n_occurrences",
            F.row_number()
            .over(Window.orderBy(F.col("score_micro").desc(), "phrase"))
            .alias("rank"),
        )
    )


@register("graph_incremental_components", _COMPONENTS_SQL)
def graph_incremental_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL connected components by graph contraction: components
    over the old edge set are computed once (the expensive pass), and a
    new edge batch refreshes labels by mapping its endpoints through
    the OLD labels and running components on the CONTRACTED graph —
    whose size is O(new edges + touched clusters), not O(all edges).
    Because labels are min-ids, contraction composes exactly: the
    refreshed label is the global min id, bit-identical to a full
    recompute (the oracle IS the full-graph recursive closure — the
    same one dedup_components answers — so equality proves the
    incremental refresh lost nothing). This is IVM for graphs: at
    100 TB the nightly dedup-cluster refresh touches only the delta's
    neighborhood; the historical edge set is never re-joined.
    Null doc_id excluded — the components null-identity contract
    (operators/dedup.py dedup_components, r16)."""
    from ..operators.dedup import components_from_edges

    docs = table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    pairs = D.minhash_lsh_pairs(
        docs, k=3, num_hashes=16, bands=4, jaccard_threshold=0.1
    ).select("a_id", "b_id").localCheckpoint()
    split = 400
    old_e = pairs.filter(
        (F.col("a_id") < split) & (F.col("b_id") < split)
    ).select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    new_e = pairs.filter(
        (F.col("a_id") >= split) | (F.col("b_id") >= split)
    ).select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    old_lab = components_from_edges(old_e)

    def relabel(e, col):
        lab = old_lab.select(
            F.col("id").alias(col), F.col("component").alias(f"__{col}_lab")
        )
        # lab is O(old edge-incident nodes) — unbounded in corpus size,
        # so no broadcast hint (the delta-only posture of this query
        # must not require shipping the full historical label map to
        # every executor); AQE broadcasts at runtime iff it fits
        return e.join(lab, col, "left").withColumn(
            col, F.coalesce(f"__{col}_lab", F.col(col))
        ).drop(f"__{col}_lab")

    edges2 = relabel(relabel(new_e, "src"), "dst")
    comp2 = components_from_edges(edges2)
    all_ids = docs.select(F.col("doc_id").alias("id"))
    with_old = all_ids.join(old_lab, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("label0")
    )
    # comp2 is O(delta batch + its touched clusters) — bounded by the
    # incremental batch size BY DESIGN (the whole point of IVM refresh),
    # unlike the full old-label map above; broadcasting it is the
    # correct scale shape
    final = with_old.join(
        F.broadcast(
            comp2.select(
                F.col("id").alias("label0"),
                F.col("component").alias("label1"),
            )
        ),
        "label0",
        "left",
    ).select(
        F.col("id").alias("doc_id"),
        F.coalesce("label1", "label0").cast("long").alias("component"),
    )
    return final


_AUTOCORR_SQL = """
WITH s AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x,
         CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events WHERE event_id IS NOT NULL),
p AS (
  SELECT event_type, x,
         lead(x) OVER (PARTITION BY event_type ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS y
  FROM s),
m AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM p WHERE y IS NOT NULL GROUP BY event_type)
SELECT event_type, n,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS autocorr_lag1
FROM m ORDER BY event_type
"""


@register("ts_autocorrelation", _AUTOCORR_SQL)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per stream: Pearson correlation between
    consecutive observations — the seriality diagnostic that separates
    white noise from trending/mean-reverting feeds (and calibrates how
    much ts_ewma smoothing is defensible). Values fix to integer cents,
    the five power sums are exact BIGINTs shuffled as map-side partials
    (the a8_corr discipline applied along the time axis via one lead
    window), and the single float expression runs once per group on
    identical integers in both engines. Consecutive-pair formation
    needs a TOTAL order — rows with a null event_id (the unique
    tie-break) are excluded on both sides (r16: two null-id rows at
    the same ts pair nondeterministically in BOTH engines)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id").isNotNull())
    s = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("x"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    p = s.select(
        "event_type", "x", F.lead("x").over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    m = p.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return m.select(
        "event_type", "n", F.round(num / den, 6).alias("autocorr_lag1")
    ).orderBy("event_type")


_ATTR_WINDOW_S = 7 * 86400


@register(
    "attribution_last_touch",
    f"""
    WITH conv AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase'),
    touch AS (
      SELECT event_id AS t_id, user_id, event_type AS channel,
             CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type IN ('click', 'view')),
    ranked AS (
      SELECT c.event_id, c.value, t.channel,
             row_number() OVER (PARTITION BY c.event_id
               ORDER BY t.ts DESC, t.t_id DESC) AS rn
      FROM conv c JOIN touch t
        ON t.user_id = c.user_id
       AND t.ts <= c.ts
       AND t.ts >= c.ts - INTERVAL {_ATTR_WINDOW_S} SECOND),
    attr AS (SELECT event_id, value, channel FROM ranked WHERE rn = 1)
    SELECT channel, count(*) AS n_conversions,
           {_dsum_sql('value')} AS attributed_value
    FROM attr GROUP BY channel ORDER BY channel
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credits the most recent
    click/view by the same user inside a 7-day lookback — the
    single-touch model every marketing warehouse starts from (the
    backward as-of join wearing its business hat; multi-touch models
    change only the window aggregation). Per-user equi-join bounds
    fan-out, one argmax window per conversion, decimal partials for the
    credited revenue. At 100 TB the j_range_bucketed time-cell rewrite
    stacks under the lookback predicate."""
    ev = table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("c_ts"), "value"
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("ts").alias("t_ts"),
    )
    j = conv.join(
        touch,
        (conv.user_id == touch.user_id)
        & (F.col("t_ts") <= F.col("c_ts"))
        & (
            F.col("t_ts")
            >= F.col("c_ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_S} SECOND")
        ),
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("t_ts").desc(), F.col("t_id").desc()
    )
    attr = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "value", "channel")
    )
    return (
        attr.groupBy("channel")
        .agg(
            F.count("*").alias("n_conversions"),
            _dsum(F.col("value")).alias("attributed_value"),
        )
        .orderBy("channel")
    )


@register(
    "s27_csv_badrecords",
    """
    WITH rows0 AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus,
             o_orderkey % 53 = 0 AS is_bad
      FROM orders WHERE o_orderkey < 3000)
    SELECT count(*) FILTER (WHERE NOT is_bad) AS n_good,
           count(*) FILTER (WHERE is_bad) AS n_bad,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                FILTER (WHERE NOT is_bad) AS DOUBLE) AS good_total
    FROM rows0
    """,
)
def s27_csv_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV corrupt-record channel (the CSV twin of s6_features_corrupt):
    a feed where every 53rd line is malformed (wrong arity / non-numeric
    price) is read in PERMISSIVE mode with an explicit schema and a
    _corrupt_record column — bad lines land in the quarantine channel
    with their raw text preserved instead of failing the job or
    silently nulling (the ingest posture the reference's CSV loader
    lacks, mysql_process.py:94-100). The oracle predicts the good/bad
    split and the parsed aggregate in closed form."""
    import csv

    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 3000)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .collect()
    )
    d = tempfile.mkdtemp(prefix="csv_bad_")
    path = os.path.join(d, "feed.csv")
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        for r in o:
            if r["o_orderkey"] % 53 == 0:
                fh.write(f"{r['o_orderkey']},not_a_price\n")
            else:
                w.writerow(
                    [r["o_orderkey"], r["o_totalprice"], r["o_orderstatus"]]
                )
    schema = (
        "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING, "
        "_corrupt_record STRING"
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    df = df.cache()  # one pass feeds both channels (SPARK-21610 posture)
    bad = F.col("_corrupt_record").isNotNull()
    return df.agg(
        F.count_if(~bad).alias("n_good"),
        F.count_if(bad).alias("n_bad"),
        F.sum(
            F.when(~bad, F.col("o_totalprice").cast("decimal(18,4)"))
        )
        .cast("double")
        .alias("good_total"),
    )


def _mmr_sql() -> str:
    cos = V.cosine_sql("a.v", "b.v")
    head = f"""
WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM d),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, t, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM d)
  WHERE t IN {_HYBRID_TERMS_SQL} GROUP BY doc_id, t),
df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
scored AS (
  SELECT tf.doc_id,
         sum(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
             * tf.tf * ({_BM25_K1} + 1)
             / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl))
         ) AS score
  FROM tf JOIN df USING (t) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id),
cand AS MATERIALIZED (
  SELECT doc_id,
         CAST(floor(round(score, 6) * 1e6 + 0.5) AS BIGINT) AS rel_micro
  FROM (SELECT doc_id, score,
               row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
                 AS rnk
        FROM scored)
  WHERE rnk <= 8),
emb8 AS MATERIALIZED (
  SELECT c.doc_id, c.rel_micro, CAST(e.embedding AS DOUBLE[]) AS v
  FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id),
sim AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b,
         CAST(floor(round({cos}, 6) * 1e6 + 0.5) AS BIGINT) AS s
  FROM emb8 a JOIN emb8 b ON a.doc_id <> b.doc_id),
p1 AS MATERIALIZED (
  SELECT doc_id, rel_micro, CAST(7 * rel_micro AS BIGINT) AS score_micro,
         1 AS rank
  FROM emb8 ORDER BY rel_micro DESC, doc_id LIMIT 1),
sel1 AS MATERIALIZED (SELECT doc_id FROM p1)"""
    steps = []
    for k in range(2, 6):
        prev_sel = f"sel{k - 1}"
        steps.append(f""",
c{k} AS MATERIALIZED (
  SELECT e.doc_id, e.rel_micro, max(s.s) AS ms
  FROM emb8 e JOIN sim s ON s.a = e.doc_id
  WHERE s.b IN (SELECT doc_id FROM {prev_sel})
    AND e.doc_id NOT IN (SELECT doc_id FROM {prev_sel})
  GROUP BY e.doc_id, e.rel_micro),
p{k} AS (
  SELECT doc_id, rel_micro,
         CAST(7 * rel_micro - 3 * ms AS BIGINT) AS score_micro, {k} AS rank
  FROM c{k} ORDER BY 7 * rel_micro - 3 * ms DESC, doc_id LIMIT 1),
sel{k} AS MATERIALIZED (SELECT doc_id FROM {prev_sel} UNION ALL SELECT doc_id FROM p{k})""")
    tail = "\n" + "\nUNION ALL\n".join(
        f"SELECT rank, doc_id, rel_micro, score_micro FROM p{k}"
        for k in range(1, 6)
    )
    return head + "".join(steps) + tail


@register("hybrid_mmr_topk", _mmr_sql())
def hybrid_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified re-ranking (Carbonell & Goldstein 1998): greedily
    pick 5 of the top-8 BM25 candidates maximizing λ·relevance −
    (1−λ)·max-similarity-to-selected (λ=0.7, embedding cosine as the
    redundancy signal) — the serving-layer answer to near-duplicate
    result lists that pure relevance ranking (bm25_topk) and fusion
    (hybrid_rrf_topk) both exhibit. The greedy recursion unrolls into 5
    plan steps over an 8-row candidate set — each an anti-join +
    max-sim aggregate + argmin-window — so nothing iterative touches
    the executors; λ-weights are exact integer tenths (7·rel − 3·sim in
    micro units). At 100 TB only candidate generation scales; MMR
    always runs on k² similarities."""
    emb = table(spark, sf_dir, "embeddings")
    cand = (
        bm25_topk(spark, sf_dir)
        .filter(F.col("rank") <= 8)
        .select(
            "doc_id",
            F.floor(F.col("bm25") * 1e6 + F.lit(0.5))
            .cast("bigint")
            .alias("rel_micro"),
        )
    )
    emb8 = cand.join(
        emb.select(
            F.col("vec_id").alias("doc_id"),
            F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("v"),
        ),
        "doc_id",
    ).localCheckpoint()
    ea = emb8.select(
        F.col("doc_id").alias("a"),
        F.col("v").alias("va"),
    )
    eb = emb8.select(F.col("doc_id").alias("b"), F.col("v").alias("vb"))
    sim = (
        ea.join(eb, F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.floor(
                F.round(V.cosine(F.col("va"), F.col("vb")), 6) * 1e6
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("s"),
        )
        .localCheckpoint()
    )
    selected = (
        emb8.orderBy(F.col("rel_micro").desc(), "doc_id")
        .limit(1)
        .select(
            F.lit(1).alias("rank"),
            "doc_id",
            "rel_micro",
            (7 * F.col("rel_micro")).cast("bigint").alias("score_micro"),
        )
    )
    for k in range(2, 6):
        sel_ids = selected.select("doc_id")
        rem = emb8.join(sel_ids, "doc_id", "left_anti")
        ms = (
            rem.join(sim, rem.doc_id == sim.a)
            .join(
                F.broadcast(sel_ids.select(F.col("doc_id").alias("b"))), "b"
            )
            .groupBy(rem.doc_id, "rel_micro")
            .agg(F.max("s").alias("ms"))
        )
        pick = (
            ms.select(
                F.lit(k).alias("rank"),
                "doc_id",
                "rel_micro",
                (7 * F.col("rel_micro") - 3 * F.col("ms"))
                .cast("bigint")
                .alias("score_micro"),
            )
            .orderBy(F.col("score_micro").desc(), "doc_id")
            .limit(1)
        )
        # checkpoint per pick: step k's plan otherwise embeds steps
        # 1..k-1 and re-executes the whole prefix at every level
        selected = selected.unionByName(pick).localCheckpoint()
    return selected


@register(
    "ts_local_peaks",
    """
    WITH s AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x,
             CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE event_id IS NOT NULL),
    n AS (
      SELECT event_type, x,
             lag(x) OVER w AS xp, lead(x) OVER w AS xn
      FROM s
      WINDOW w AS (PARTITION BY event_type ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
    pk AS (
      SELECT event_type, x - greatest(xp, xn) AS prom
      FROM n WHERE xp IS NOT NULL AND xn IS NOT NULL
        AND x > xp AND x > xn)
    SELECT event_type,
           count(*) AS n_peaks,
           count(*) FILTER (WHERE prom >= 200) AS n_prominent,
           CAST(max(prom) AS BIGINT) AS max_prominence_cents
    FROM pk GROUP BY event_type ORDER BY event_type
    """,
)
def ts_local_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak detection with a prominence floor: a sample is a peak
    when it exceeds both neighbors, and 'prominent' when it clears them
    by ≥ 2.00 — the spike census behind alert tuning (ts_cusum_alerts
    finds sustained shifts; this counts instantaneous spikes, and the
    prominence floor is what separates signal from jitter). One
    lag+lead window per stream over integer cents, then a conditional
    aggregate — no joins, map-side combined. Neighbor comparison needs
    a TOTAL order — null event_id rows excluded both sides (r16, same
    rule as ts_autocorrelation)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id").isNotNull())
    s = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("x"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    n = s.select(
        "event_type",
        "x",
        F.lag("x").over(w).alias("xp"),
        F.lead("x").over(w).alias("xn"),
    )
    pk = n.filter(
        F.col("xp").isNotNull()
        & F.col("xn").isNotNull()
        & (F.col("x") > F.col("xp"))
        & (F.col("x") > F.col("xn"))
    ).select(
        "event_type",
        (F.col("x") - F.greatest("xp", "xn")).alias("prom"),
    )
    return (
        pk.groupBy("event_type")
        .agg(
            F.count("*").alias("n_peaks"),
            F.count_if(F.col("prom") >= 200).alias("n_prominent"),
            F.max("prom").alias("max_prominence_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "a25_skyline_2d",
    """
    WITH o AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP)) / 86400)
                  AS BIGINT) AS day_n
      FROM orders WHERE o_custkey < 300
        AND o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL),
    per_price AS (
      SELECT price_c, CAST(max(day_n) AS BIGINT) AS best_day
      FROM o GROUP BY price_c),
    run AS (
      SELECT price_c, best_day,
             max(best_day) OVER (ORDER BY price_c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_best
      FROM per_price),
    sky_prices AS (
      SELECT price_c, best_day FROM run
      WHERE prev_best IS NULL OR best_day > prev_best)
    SELECT o.o_orderkey, o.price_c, o.day_n
    FROM o JOIN sky_prices s
      ON o.price_c = s.price_c AND o.day_n = s.best_day
    """,
)
def a25_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) operator: the orders not dominated in
    (minimize price, maximize recency) — the multi-criteria shortlist
    query (BNL/D&C in the OLAP literature) that no single ORDER BY can
    answer. 2-D skylines reduce to ONE ordered window: group to
    distinct prices (map-side), take the running max of best-date over
    strictly cheaper prices, and a price level survives iff it beats
    that prefix max — O(n log n) total, no pairwise domination join
    (the naive skyline is quadratic). Ties on both axes all survive,
    matching the standard weak-domination definition. Exact integer
    cents/day numbers end-to-end. A skyline point needs BOTH axes —
    rows missing either are excluded on both sides (r16)."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_custkey") < 300)
        & F.col("o_totalprice").isNotNull()
        & F.col("o_orderdate").isNotNull()
    ).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("price_c"),
        F.floor(F.unix_timestamp("o_orderdate") / 86400)
        .cast("bigint")
        .alias("day_n"),
    )
    per_price = o.groupBy("price_c").agg(F.max("day_n").alias("best_day"))
    w = Window.orderBy("price_c").rowsBetween(
        Window.unboundedPreceding, -1
    )
    run = per_price.withColumn("prev_best", F.max("best_day").over(w))
    sky = run.filter(
        F.col("prev_best").isNull() | (F.col("best_day") > F.col("prev_best"))
    ).select(
        F.col("price_c").alias("sky_price"), F.col("best_day")
    )
    return o.join(
        F.broadcast(sky),
        (o.price_c == sky.sky_price) & (o.day_n == sky.best_day),
    ).select("o_orderkey", "price_c", "day_n")


_QT_THRESHOLD = 300
_QT_N = 20000


@register(
    "geo_quadtree_cells",
    f"""
    WITH pts AS (
      SELECT (i * 73 % 997) / 997.0 * 16.0 - 2.0 AS lon,
             (i * 131 % 983) / 983.0 * 14.0 - 2.0 AS lat
      FROM (SELECT unnest(generate_series(0, {_QT_N - 1})) AS i)),
    q AS (
      SELECT CAST(floor((lon + 2.0) / 16.0 * 8) AS BIGINT) AS cx3,
             CAST(floor((lat + 2.0) / 16.0 * 8) AS BIGINT) AS cy3
      FROM pts),
    l3 AS (SELECT cx3, cy3, count(*) AS n3 FROM q GROUP BY cx3, cy3),
    l2 AS (SELECT cx3 // 2 AS cx2, cy3 // 2 AS cy2,
                  CAST(sum(n3) AS BIGINT) AS n2
           FROM l3 GROUP BY cx2, cy2),
    l1 AS (SELECT cx2 // 2 AS cx1, cy2 // 2 AS cy1,
                  CAST(sum(n2) AS BIGINT) AS n1
           FROM l2 GROUP BY cx1, cy1),
    pick AS (
      SELECT l3.cx3, l3.cy3, l3.n3, l2.n2, l1.n1,
             CASE WHEN l1.n1 <= {_QT_THRESHOLD} THEN 1
                  WHEN l2.n2 <= {_QT_THRESHOLD} THEN 2
                  ELSE 3 END AS level
      FROM l3
      JOIN l2 ON l2.cx2 = l3.cx3 // 2 AND l2.cy2 = l3.cy3 // 2
      JOIN l1 ON l1.cx1 = l3.cx3 // 4 AND l1.cy1 = l3.cy3 // 4)
    SELECT level,
           CASE level WHEN 1 THEN cx3 // 4 WHEN 2 THEN cx3 // 2
                      ELSE cx3 END AS cell_x,
           CASE level WHEN 1 THEN cy3 // 4 WHEN 2 THEN cy3 // 2
                      ELSE cy3 END AS cell_y,
           CAST(sum(n3) AS BIGINT) AS n_points
    FROM pick GROUP BY level, cell_x, cell_y
    """,
)
def geo_quadtree_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quadtree tiling: each region is served at the COARSEST
    level whose cell stays under the occupancy threshold, and dense
    regions subdivide (3 unrolled levels over an 8×8 finest grid) —
    the density-adaptive partitioning that fixes what geo_grid_density
    diagnoses and geo_contains_grid's fixed cells suffer: uniform grids
    over skewed data give hot cells (salting territory) AND empty ones.
    Counts aggregate bottom-up (each level from the one below, never a
    rescan); level choice is a broadcast join of three cell-count
    tables; everything is integer cell arithmetic."""
    pts = spark.range(_QT_N).select(
        ((F.col("id") * 73 % 997) / 997.0 * 16.0 - 2.0).alias("lon"),
        ((F.col("id") * 131 % 983) / 983.0 * 14.0 - 2.0).alias("lat"),
    )
    q = pts.select(
        F.floor((F.col("lon") + 2.0) / 16.0 * 8).cast("bigint").alias("cx3"),
        F.floor((F.col("lat") + 2.0) / 16.0 * 8).cast("bigint").alias("cy3"),
    )
    l3 = q.groupBy("cx3", "cy3").agg(F.count("*").alias("n3"))
    l2 = l3.groupBy(
        F.floor(F.col("cx3") / 2).cast("bigint").alias("cx2"),
        F.floor(F.col("cy3") / 2).cast("bigint").alias("cy2"),
    ).agg(F.sum("n3").alias("n2"))
    l1 = l2.groupBy(
        F.floor(F.col("cx2") / 2).cast("bigint").alias("cx1"),
        F.floor(F.col("cy2") / 2).cast("bigint").alias("cy1"),
    ).agg(F.sum("n2").alias("n1"))
    pick = (
        l3.join(
            F.broadcast(l2),
            (F.floor(F.col("cx3") / 2) == F.col("cx2"))
            & (F.floor(F.col("cy3") / 2) == F.col("cy2")),
        )
        .join(
            F.broadcast(l1),
            (F.floor(F.col("cx3") / 4) == F.col("cx1"))
            & (F.floor(F.col("cy3") / 4) == F.col("cy1")),
        )
        .select(
            "cx3",
            "cy3",
            "n3",
            F.when(F.col("n1") <= _QT_THRESHOLD, 1)
            .when(F.col("n2") <= _QT_THRESHOLD, 2)
            .otherwise(3)
            .alias("level"),
        )
    )
    cell = lambda c: (  # noqa: E731
        F.when(F.col("level") == 1, F.floor(F.col(c) / 4))
        .when(F.col("level") == 2, F.floor(F.col(c) / 2))
        .otherwise(F.col(c))
        .cast("bigint")
    )
    return pick.groupBy(
        "level", cell("cx3").alias("cell_x"), cell("cy3").alias("cell_y")
    ).agg(F.sum("n3").alias("n_points"))


@register(
    "ts_wma",
    """
    WITH s AS (
      SELECT user_id, CAST(round(value * 100) AS BIGINT) AS x,
             CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE user_id < 20),
    l AS (
      SELECT user_id, ts, event_id, x,
             lag(x, 1) OVER w AS x1, lag(x, 2) OVER w AS x2,
             lag(x, 3) OVER w AS x3
      FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST))
    SELECT user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           x,
           CAST((4 * x + 3 * x1 + 2 * x2 + 1 * x3) // 10 AS BIGINT)
             AS wma_cents
    FROM l WHERE x3 IS NOT NULL
    """,
)
def ts_wma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-weighted moving average (WMA-4): the newest of 4 samples
    weighs 4/10, the oldest 1/10 — the finite-window, integer-exact
    smoother between the plain moving average and ts_ewma's infinite
    tail (weights sum to 10, so the division is exact integer division
    of a non-negative sum — zero float anywhere). One lag window per
    key; rows without a full 4-sample history are excluded rather than
    silently under-weighted."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    s = ev.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("x"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l = s.select(
        "user_id",
        "ts",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 2).over(w).alias("x2"),
        F.lag("x", 3).over(w).alias("x3"),
    ).filter(F.col("x3").isNotNull())
    return l.select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("epoch_s"),
        "x",
        F.floor(
            (4 * F.col("x") + 3 * F.col("x1") + 2 * F.col("x2") + F.col("x3"))
            / 10
        )
        .cast("bigint")
        .alias("wma_cents"),
    )


@register(
    "multimodal_scene_cuts",
    """
    WITH fr AS (
      SELECT doc_id, (i * 10) AS frame_idx,
             ('0x' || substring(
                md5(md5(text) || ':' || (i * 10)::VARCHAR), 1, 2))::BIGINT
               AS intensity
      FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS i)),
    d AS (
      SELECT doc_id, frame_idx, intensity,
             lag(intensity) OVER (PARTITION BY doc_id ORDER BY frame_idx)
               AS prev
      FROM fr)
    SELECT doc_id,
           count(*) FILTER (WHERE prev IS NOT NULL
                              AND abs(intensity - prev) > 64) AS n_cuts,
           CAST(max(abs(intensity - prev)) AS BIGINT) AS max_delta
    FROM d GROUP BY doc_id HAVING count(*) FILTER (WHERE prev IS NOT NULL
                              AND abs(intensity - prev) > 64) > 0
    """,
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over sampled video frames: consecutive frame
    intensities (digest stub — a real decoder swaps in per-frame luma
    histograms, nothing else changes) compared per document, a cut
    declared when the jump clears a threshold — the shot-boundary pass
    that picks keyframes for captioning/embedding instead of wasting
    compute on every frame. Frames come from the one-to-many Arrow
    mapInPandas kernel (multimodal_frames' contract); the boundary
    logic is one lag window per asset + a conditional aggregate. At
    100 TB each asset's frames stay in one partition group — the
    window never crosses assets."""
    from ..sources.binary import sample_frames

    docs = table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("path"),
        F.col("text").cast("binary").alias("content"),
    )
    frames = sample_frames(docs, every_n=10, max_frames=5)
    fr = frames.select(
        F.col("path").cast("long").alias("doc_id"),
        "frame_idx",
        F.conv(F.substring("frame_key", 1, 2), 16, 10)
        .cast("bigint")
        .alias("intensity"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    d = fr.withColumn("prev", F.lag("intensity").over(w))
    cut = F.col("prev").isNotNull() & (
        F.abs(F.col("intensity") - F.col("prev")) > 64
    )
    return (
        d.groupBy("doc_id")
        .agg(
            F.count_if(cut).alias("n_cuts"),
            F.max(F.abs(F.col("intensity") - F.col("prev"))).alias(
                "max_delta"
            ),
        )
        .filter(F.col("n_cuts") > 0)
    )


@register(
    "graph_assoc_rules",
    """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM li),
    item AS (SELECT l_partkey, count(*) AS n_item FROM li GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_both
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY part_a, part_b
      HAVING count(*) >= 3)
    SELECT p.part_a, p.part_b, p.n_both,
           CAST(floor(p.n_both * 1000000.0 / ia.n_item) AS BIGINT)
             AS confidence_micro,
           CAST(floor(p.n_both * t.n * 1000000.0
                      / (ia.n_item * ib.n_item)) AS BIGINT) AS lift_micro
    FROM pairs p
    JOIN item ia ON ia.l_partkey = p.part_a
    JOIN item ib ON ib.l_partkey = p.part_b
    CROSS JOIN n_orders t
    """,
)
def graph_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the co-purchase graph: support, confidence
    (P(b|a)) and lift (observed/expected co-occurrence) for item pairs
    sharing ≥3 baskets — the Apriori readout that turns
    graph_copurchase's raw edges into ranked recommendations (lift > 1
    is the signal; confidence alone favors popular items). Pair
    generation rides the basket-bounded self-join; item supports are a
    broadcast-sized table joined twice; the basket total is a one-row
    broadcast. Metrics are floored micro rationals from exact counts."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.agg(F.countDistinct("l_orderkey").alias("n"))
    item = li.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.floor(F.col("n_both") * 1000000.0 / F.col("n_a"))
            .cast("bigint")
            .alias("confidence_micro"),
            F.floor(
                F.col("n_both")
                * F.col("n")
                * 1000000.0
                / (F.col("n_a") * F.col("n_b"))
            )
            .cast("bigint")
            .alias("lift_micro"),
        )
    )


@register(
    "ts_spc_limits",
    """
    WITH s AS (
      SELECT event_type,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
               AS hr,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events),
    sub AS (
      SELECT event_type, hr, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(max(x) - min(x) AS BIGINT) AS r
      FROM s GROUP BY event_type, hr
      HAVING count(*) >= 4),
    g AS (
      SELECT event_type, count(*) AS n_subgroups,
             CAST(sum(sx) AS BIGINT) AS sxx,
             CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(r) AS BIGINT) AS sr
      FROM sub GROUP BY event_type)
    SELECT event_type, n_subgroups,
           CAST(sxx // nn AS BIGINT) AS xbar_cents,
           CAST(sr // n_subgroups AS BIGINT) AS rbar_cents,
           CAST(sxx // nn + 577 * (sr // n_subgroups) // 1000 AS BIGINT)
             AS ucl_cents,
           CAST(sxx // nn - 577 * (sr // n_subgroups) // 1000 AS BIGINT)
             AS lcl_cents
    FROM g ORDER BY event_type
    """,
)
def ts_spc_limits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical process control (X̄-R chart) limits: hourly subgroups
    per stream, center line = grand mean, control limits = X̄ ± A₂·R̄
    with the n=4 Shewhart constant A₂ ≈ 0.577 as an exact integer
    ratio (577/1000) — the manufacturing-grade alerting bands that
    complement ts_cusum_alerts (CUSUM catches slow drifts; Shewhart
    limits catch single excursions). All arithmetic is integer cents
    with floor division on non-negative sums; two map-side-combinable
    aggregates, no window, no join."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("hr"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("x"),
    )
    sub = (
        s.groupBy("event_type", "hr")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            (F.max("x") - F.min("x")).alias("r"),
        )
        .filter(F.col("n") >= 4)
    )
    g = sub.groupBy("event_type").agg(
        F.count("*").alias("n_subgroups"),
        F.sum("sx").alias("sxx"),
        F.sum("n").alias("nn"),
        F.sum("r").alias("sr"),
    )
    xbar = F.floor(F.col("sxx") / F.col("nn")).cast("bigint")
    rbar = F.floor(F.col("sr") / F.col("n_subgroups")).cast("bigint")
    band = F.floor(577 * rbar / 1000).cast("bigint")
    return g.select(
        "event_type",
        "n_subgroups",
        xbar.alias("xbar_cents"),
        rbar.alias("rbar_cents"),
        (xbar + band).alias("ucl_cents"),
        (xbar - band).alias("lcl_cents"),
    ).orderBy("event_type")


@register(
    "streaming_append_windows",
    f"""
    WITH m AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mt FROM events),
    w AS (
      SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600 AS BIGINT)
               AS window_start_epoch,
             event_type, count(*) AS n, {_dsum_sql('value')} AS sum_value
      FROM events GROUP BY 1, 2)
    SELECT w.window_start_epoch, w.event_type, w.n, w.sum_value
    FROM w CROSS JOIN m
    WHERE to_timestamp(w.window_start_epoch + 3600)
          <= m.mt - INTERVAL 30 MINUTE
    """,
)
def streaming_append_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode windowed aggregation — the production streaming-agg
    semantics the complete-mode twins (streaming_tumbling/sliding) do
    not exercise: each hourly window emits EXACTLY ONCE, only after the
    30-minute watermark passes its end, and late rows beyond the
    watermark are dropped rather than restating published results (the
    contract downstream consumers of an append sink rely on). The file
    source is split into 4 time-ordered files with maxFilesPerTrigger=1
    so the watermark actually advances across micro-batches; the final
    availableNow flush emits every closed window. The oracle is the
    batch aggregate restricted to windows closed by the terminal
    watermark (max event time − 30 min) — open windows are withheld on
    BOTH sides."""
    import glob as _g
    import shutil
    import uuid

    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    split_dir = tempfile.mkdtemp(prefix="append_split_")
    src_dir = tempfile.mkdtemp(prefix="append_src_")
    part = ev.withColumn(
        "part", F.ntile(4).over(Window.orderBy("ts", "event_id"))
    )
    for p in range(1, 5):
        part.filter(F.col("part") == p).drop("part").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(split_dir, f"f{p}"))
        src = _g.glob(os.path.join(split_dir, f"f{p}", "*.parquet"))[0]
        shutil.copy(src, os.path.join(src_dir, f"{p:02d}.parquet"))
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), _dsum(F.col("value")).alias("sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_epoch"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    name = f"append_windows_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "ts_seasonal_adjust",
    """
    WITH s AS (
      SELECT event_type,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
               AS day_n,
             CAST(round(value * 100) AS BIGINT) AS x,
             event_id
      FROM events),
    dow AS (SELECT event_type, (day_n + 4) % 7 AS dw, x, event_id FROM s),
    base AS (
      SELECT event_type, dw, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx
      FROM dow GROUP BY event_type, dw),
    resid AS (
      SELECT d.event_type, d.event_id,
             d.x * b.n - b.sx AS r_scaled, b.n
      FROM dow d JOIN base b ON b.event_type = d.event_type AND b.dw = d.dw)
    SELECT event_type,
           count(*) FILTER (WHERE abs(r_scaled) > 20000 * n) AS n_outliers,
           CAST(max(abs(r_scaled) // n) AS BIGINT) AS max_resid_cents
    FROM resid GROUP BY event_type ORDER BY event_type
    """,
)
def ts_seasonal_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal adjustment by day-of-week profile: residual = value −
    same-weekday mean (the simplest STL step — weekly seasonality is
    the dominant cycle in ops metrics, and an 'anomaly' that is just
    'it's Saturday' is the classic false page). Weekday comes from the
    epoch-day closed form (ts_business_days' convention), means stay
    exact rationals by scaling residuals with the group count, and the
    outlier census (|residual| > 200.00) is pure integer compare. One
    profile aggregate broadcast back onto the stream, one final
    aggregate."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day_n"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("x"),
        "event_id",
    ).select(
        "event_type",
        ((F.col("day_n") + 4) % 7).alias("dw"),
        "x",
        "event_id",
    )
    base = s.groupBy("event_type", "dw").agg(
        F.count("*").alias("n"), F.sum("x").alias("sx")
    )
    resid = s.join(F.broadcast(base), ["event_type", "dw"]).select(
        "event_type",
        (F.col("x") * F.col("n") - F.col("sx")).alias("r_scaled"),
        "n",
    )
    return (
        resid.groupBy("event_type")
        .agg(
            F.count_if(F.abs(F.col("r_scaled")) > 20000 * F.col("n")).alias(
                "n_outliers"
            ),
            F.max(
                F.floor(F.abs(F.col("r_scaled")) / F.col("n"))
            )
            .cast("bigint")
            .alias("max_resid_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "s28_column_rename_evolution",
    f"""
    SELECT o_orderstatus AS status, count(*) AS n,
           {_dsum_sql('o_totalprice')} AS total
    FROM orders WHERE o_orderkey IS NOT NULL GROUP BY o_orderstatus
    """,
)
def s28_column_rename_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-rename schema evolution: half the table's files carry the
    old column name (``price``), half the new (``amount``) — plain
    parquet has no column-mapping metadata (the Delta/Iceberg feature),
    so the engine-side fix is an explicit mapping read: scan each
    vintage with its own schema, normalize names, union — never
    mergeSchema (which would produce two half-null columns, silently).
    The read-back aggregate must equal the original table's — proving
    no rows or values were lost across the rename boundary. At 100 TB
    the two vintage scans are partition-pruned by their directories.
    The vintage split is keyed on o_orderkey — a null key belongs to
    neither vintage, excluded both sides (r16, the ivm split rule)."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isNotNull())
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    root = tempfile.mkdtemp(prefix="rename_evo_")
    old_dir = os.path.join(root, "v_old")
    new_dir = os.path.join(root, "v_new")
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").alias("price"),
    ).write.parquet(old_dir)
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").alias("amount"),
    ).write.parquet(new_dir)
    old = spark.read.parquet(old_dir).select(
        "o_orderkey", "o_orderstatus", F.col("price").alias("o_totalprice")
    )
    new = spark.read.parquet(new_dir).select(
        "o_orderkey", "o_orderstatus", F.col("amount").alias("o_totalprice")
    )
    both = old.unionByName(new)
    return both.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n"), _dsum(F.col("o_totalprice")).alias("total")
    )


_CELL_BAL_SQL = f"""
WITH c AS (
  SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS centroid
  FROM embeddings WHERE vec_id < {_IVFPQ_NCELLS}),
a0 AS (
  SELECT e.vec_id, c.centroid_id,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY {V.euclidean2_sql('CAST(e.embedding AS DOUBLE[])', 'c.centroid')},
                    c.centroid_id) AS rn
  FROM embeddings e CROSS JOIN c),
sizes AS (
  SELECT centroid_id, count(*) AS n
  FROM a0 WHERE rn = 1 GROUP BY centroid_id),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot, count(*) AS n_cells
        FROM sizes)
SELECT s.centroid_id, s.n,
       CAST(floor(s.n * t.n_cells * 1000000.0 / t.n_tot) AS BIGINT)
         AS load_ratio_micro,
       s.n * t.n_cells > 2 * t.n_tot AS is_hot
FROM sizes s CROSS JOIN tot t
ORDER BY s.centroid_id
"""


@register("ann_cell_balance", _CELL_BAL_SQL)
def ann_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-balance report: posting-list sizes per coarse cell, the
    load ratio vs a perfectly uniform split, and a hot-cell flag at 2×
    — the skew diagnostic for the ANN probe join (a hot cell is a hot
    shuffle key: the fix is salting the cell or re-training the coarse
    codebook, and this report is what triggers either). One assignment
    pass (the same argmin the index build runs), one aggregate, a
    one-row total broadcast."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("ve")
    )
    c = emb.filter(F.col("vec_id") < _IVFPQ_NCELLS).select(
        F.col("vec_id").alias("centroid_id"), F.col("ve").alias("centroid")
    )
    a0 = (
        emb.crossJoin(F.broadcast(c))
        .select(
            "vec_id",
            "centroid_id",
            V.euclidean2(F.col("ve"), F.col("centroid")).alias("__d2"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("__d2", "centroid_id")
            ),
        )
    )
    sizes = (
        a0.filter(F.col("rn") == 1)
        .groupBy("centroid_id")
        .agg(F.count("*").alias("n"))
    )
    tot = sizes.agg(
        F.sum("n").alias("n_tot"), F.count("*").alias("n_cells")
    )
    return (
        sizes.crossJoin(F.broadcast(tot))
        .select(
            "centroid_id",
            "n",
            F.floor(
                F.col("n") * F.col("n_cells") * 1000000.0 / F.col("n_tot")
            )
            .cast("bigint")
            .alias("load_ratio_micro"),
            (F.col("n") * F.col("n_cells") > 2 * F.col("n_tot")).alias(
                "is_hot"
            ),
        )
        .orderBy("centroid_id")
    )


@register(
    "ts_naive_forecast_mae",
    """
    WITH d AS (
      SELECT event_type,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
               AS day_n,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_c
      FROM events GROUP BY event_type, day_n),
    j AS (
      SELECT cur.event_type, cur.day_n,
             cur.total_c AS actual_c, prev.total_c AS forecast_c
      FROM d cur JOIN d prev
        ON prev.event_type = cur.event_type
       AND prev.day_n = cur.day_n - 7)
    SELECT event_type, count(*) AS n_days,
           CAST(sum(abs(actual_c - forecast_c)) AS BIGINT)
             AS total_abs_err_c,
           CAST(floor(sum(abs(actual_c - forecast_c)) * 1.0 / count(*))
                AS BIGINT) AS mae_cents
    FROM j GROUP BY event_type ORDER BY event_type
    """,
)
def ts_naive_forecast_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast baseline: predict each day's total as the
    same weekday one week earlier and score MAE — the benchmark every
    real forecasting model must beat before it ships (if your model
    can't beat 'same as last Tuesday', it isn't a model; pairs with
    ts_seasonal_adjust, which removes exactly the signal this forecast
    exploits). Daily totals are one map-side-combined aggregate; the
    t−7 join is a self equi-join on the shifted day number — no window,
    no cross. All integer cents."""
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day_n"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "total_c"
        )
    )
    cur = d.select("event_type", "day_n", F.col("total_c").alias("actual_c"))
    prev = d.select(
        "event_type",
        (F.col("day_n") + 7).alias("day_n"),
        F.col("total_c").alias("forecast_c"),
    )
    j = cur.join(prev, ["event_type", "day_n"])
    err = F.abs(F.col("actual_c") - F.col("forecast_c"))
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(err).alias("total_abs_err_c"),
        )
        .select(
            "event_type",
            "n_days",
            "total_abs_err_c",
            F.floor(F.col("total_abs_err_c") * 1.0 / F.col("n_days"))
            .cast("bigint")
            .alias("mae_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "seq_regex_funnel",
    """
    WITH s AS (
      SELECT user_id, substring(event_type, 1, 1) AS c,
             CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE user_id < 100),
    seq AS (
      SELECT user_id, string_agg(c, '' ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS journey
      FROM s GROUP BY user_id)
    SELECT count(*) AS n_users,
           count(*) FILTER (WHERE regexp_matches(journey, 'v[^p]*c[^p]*p'))
             AS n_funnel,
           count(*) FILTER (WHERE regexp_matches(journey, 'ee'))
             AS n_double_error,
           count(*) FILTER (WHERE regexp_matches(journey, '^s'))
             AS n_signup_first
    FROM seq
    """,
)
def seq_regex_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex pattern matching over event journeys — the MATCH_RECOGNIZE
    stand-in: each user's ordered event-type initials collapse into one
    journey string, and funnel questions become regexes (view → click →
    purchase with no intervening purchase; an error immediately
    retried; signup as first action) — strictly more expressive than
    funnel_conversion's fixed stages (backtracking, negations, and
    anchors come free). The per-user collapse is one ordered aggregate;
    journeys are short strings, so the regex pass is map-only; both
    engines run the identical pattern."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    s = ev.select(
        "user_id",
        F.substring("event_type", 1, 1).alias("c"),
        "ts",
        "event_id",
    )
    seq = s.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("ts"), F.col("event_id"), F.col("c"))
                    )
                ),
                lambda r: r["c"],
            ),
            "",
        ).alias("journey")
    )
    return seq.agg(
        F.count("*").alias("n_users"),
        F.count_if(F.col("journey").rlike("v[^p]*c[^p]*p")).alias("n_funnel"),
        F.count_if(F.col("journey").rlike("ee")).alias("n_double_error"),
        F.count_if(F.col("journey").rlike("^s")).alias("n_signup_first"),
    )


@register(
    "pipeline_dataset_card",
    """
    WITH d AS (
      SELECT source,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                 t -> t <> '')) AS n_tok,
             n_chars,
             md5(text) AS h
      FROM documents),
    g AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             count(DISTINCT h) AS n_unique,
             CAST(min(n_tok) AS BIGINT) AS min_tokens,
             CAST(max(n_tok) AS BIGINT) AS max_tokens
      FROM d GROUP BY source)
    SELECT source, n_docs, total_tokens, total_chars,
           min_tokens, max_tokens,
           CAST(n_docs - n_unique AS BIGINT) AS n_exact_dups,
           CAST(floor(total_tokens * 1.0 / n_docs) AS BIGINT)
             AS mean_tokens,
           CAST(floor((n_docs - n_unique) * 1000000.0 / n_docs) AS BIGINT)
             AS dup_rate_micro
    FROM g ORDER BY source
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card, one pass: per source — document and token volumes,
    length extremes, exact-duplicate counts and rate — the stat sheet
    published alongside a training corpus (Datasheets for Datasets /
    model-card practice) and the round-trip sanity check before and
    after every pipeline stage. ONE scan computes everything: token
    counts and content hashes are row-local projections; the aggregate
    is map-side combined (count-distinct via the hash, not the text).
    Derived ratios are floored integer rationals."""
    docs = table(spark, sf_dir, "documents")
    d = spread(docs, "doc_id").select(
        "source",
        F.size(H.tokens(F.col("text"))).alias("n_tok"),
        "n_chars",
        F.md5("text").alias("h"),
    )
    g = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("h").alias("n_unique"),
        F.min("n_tok").cast("bigint").alias("min_tokens"),
        F.max("n_tok").cast("bigint").alias("max_tokens"),
    )
    return g.select(
        "source",
        "n_docs",
        "total_tokens",
        "total_chars",
        "min_tokens",
        "max_tokens",
        (F.col("n_docs") - F.col("n_unique")).alias("n_exact_dups"),
        F.floor(F.col("total_tokens") * 1.0 / F.col("n_docs"))
        .cast("bigint")
        .alias("mean_tokens"),
        F.floor(
            (F.col("n_docs") - F.col("n_unique")) * 1000000.0 / F.col("n_docs")
        )
        .cast("bigint")
        .alias("dup_rate_micro"),
    ).orderBy("source")


@register(
    "dq_duplicate_payments",
    """
    WITH p AS (
      SELECT event_id, user_id,
             CAST(floor(value) AS BIGINT) AS amount_d,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t_s
      FROM events WHERE event_type = 'purchase'),
    pairs AS (
      SELECT a.user_id, a.amount_d,
             a.event_id AS a_id, b.event_id AS b_id,
             b.t_s - a.t_s AS dt_s
      FROM p a JOIN p b
        ON b.user_id = a.user_id AND b.amount_d = a.amount_d
       AND a.event_id < b.event_id
       AND abs(b.t_s - a.t_s) <= 86400)
    SELECT user_id, amount_d, a_id, b_id, dt_s FROM pairs
    """,
)
def dq_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-charge detection: purchase pairs by the same user for
    the same whole-dollar amount within 24 hours — the double-submit /
    retry-storm audit every payments lake runs nightly (exact dedup
    misses these: the rows differ in id and timestamp; near-dedup text
    tricks don't apply to amounts; the dollar bucket absorbs cent-level
    fee jitter). The self-join is keyed on (user, amount bucket), so
    fan-out is bounded by per-user same-amount multiplicity — never a
    time-range scan; at 100 TB the j_range_bucketed day-cell rewrite
    stacks under the |Δt| residual. Integer dollars and epoch seconds
    end-to-end."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    p = ev.select(
        "event_id",
        "user_id",
        F.floor(F.col("value")).cast("bigint").alias("amount_d"),
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("t_s"),
    )
    a = p.select(
        "user_id",
        "amount_d",
        F.col("event_id").alias("a_id"),
        F.col("t_s").alias("ta"),
    )
    b = p.select(
        "user_id",
        "amount_d",
        F.col("event_id").alias("b_id"),
        F.col("t_s").alias("tb"),
    )
    return (
        a.join(b, ["user_id", "amount_d"])
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("tb") - F.col("ta")) <= 86400)
        )
        .select(
            "user_id",
            "amount_d",
            "a_id",
            "b_id",
            (F.col("tb") - F.col("ta")).alias("dt_s"),
        )
    )


@register(
    "emb_centroid_drift",
    """
    WITH comp AS (
      SELECT label, vec_id % 2 AS half,
             unnest(generate_series(0, len(embedding) - 1)) AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
               AS q
      FROM embeddings),
    s AS (
      SELECT label, half, pos, count(*) AS n,
             CAST(sum(q) AS BIGINT) AS sq
      FROM comp GROUP BY label, half, pos),
    j AS (
      SELECT a.label, a.pos,
             a.n AS n0, b.n AS n1,
             CAST(floor(
               (CAST(a.sq * b.n - b.sq * a.n AS DOUBLE) / (a.n * b.n))
               * (CAST(a.sq * b.n - b.sq * a.n AS DOUBLE) / (a.n * b.n))
               / 1e12 * 1e9 + 0.5) AS BIGINT) AS term_nano
      FROM s a JOIN s b
        ON a.label = b.label AND a.pos = b.pos
       AND a.half = 0 AND b.half = 1)
    SELECT label, CAST(min(n0) AS BIGINT) AS n_half0,
           CAST(min(n1) AS BIGINT) AS n_half1,
           CAST(sum(term_nano) AS BIGINT) AS drift_nano
    FROM j GROUP BY label ORDER BY label
    """,
)
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-centroid drift: per label, the squared L2 distance
    between the class centroid computed on two dataset halves — the
    drift monitor for VECTOR columns (dq_distribution_drift watches
    scalars; a re-embedded or silently re-normalized upstream model
    shows up here first, before ANN recall degrades). Components
    quantize to integer micro units; per-dimension mean differences are
    exact rationals (s₀n₁ − s₁n₀ over n₀n₁) fixed-pointed to nano
    BEFORE the cross-dimension sum, so the reduction is pure BIGINT.
    One explode + one aggregate + a self-join on (label, pos) — 64
    rows per label per half."""
    emb = table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.expr("CAST(embedding AS ARRAY<DOUBLE>)")).alias(
            "pos", "v"
        ),
    ).select(
        "label",
        "half",
        "pos",
        F.floor(F.col("v") * 1e6).cast("bigint").alias("q"),
    )
    s = comp.groupBy("label", "half", "pos").agg(
        F.count("*").alias("n"), F.sum("q").alias("sq")
    )
    a = s.filter(F.col("half") == 0).select(
        "label", "pos", F.col("n").alias("n0"), F.col("sq").alias("s0")
    )
    b = s.filter(F.col("half") == 1).select(
        "label", "pos", F.col("n").alias("n1"), F.col("sq").alias("s1")
    )
    num = F.col("s0") * F.col("n1") - F.col("s1") * F.col("n0")
    ratio = num.cast("double") / (F.col("n0") * F.col("n1"))
    j = a.join(b, ["label", "pos"]).select(
        "label",
        "n0",
        "n1",
        F.floor(ratio * ratio / 1e12 * 1e9 + F.lit(0.5))
        .cast("bigint")
        .alias("term_nano"),
    )
    return (
        j.groupBy("label")
        .agg(
            F.min("n0").alias("n_half0"),
            F.min("n1").alias("n_half1"),
            F.sum("term_nano").alias("drift_nano"),
        )
        .orderBy("label")
    )


@register(
    "ts_bollinger_breaches",
    """
    WITH s AS (
      SELECT user_id, CAST(round(value * 100) AS BIGINT) AS x,
             CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE user_id < 50),
    w AS (
      SELECT user_id, x,
             count(*) OVER win AS n,
             CAST(sum(x) OVER win AS BIGINT) AS sx,
             CAST(sum(x * x) OVER win AS BIGINT) AS sxx
      FROM s
      WINDOW win AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
    b AS (
      -- breach iff n(x·n − sx)² > 4·n(n·sxx − sx²): the |x−μ| > 2σ
      -- test cleared of divisions — pure integer compare
      SELECT user_id,
             (x * n - sx) * (x * n - sx) * n
               > 4 * (n * sxx - sx * sx) * n AS breach
      FROM w WHERE n = 20)
    SELECT user_id, count(*) AS n_windows,
           count(*) FILTER (WHERE breach) AS n_breaches
    FROM b GROUP BY user_id
    HAVING count(*) FILTER (WHERE breach) > 0
    ORDER BY user_id
    """,
)
def ts_bollinger_breaches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breaches: samples outside mean ± 2σ of their own
    trailing 20-observation window — the volatility-normalized spike
    detector (a fixed threshold pages on volatile streams and sleeps on
    quiet ones; bands adapt). The breach test is cleared of every
    division and square root: |x−μ| > 2σ rearranges to
    n(xn−sx)² > 4n(n·sxx−sx²) over exact BIGINT window power sums — a
    pure integer comparison, bit-identical cross-engine. One windowed
    pass, one aggregate."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    s = ev.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("x"),
        "ts",
        "event_id",
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    w = s.select(
        "user_id",
        "x",
        F.count("*").over(win).alias("n"),
        F.sum("x").over(win).alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(win).alias("sxx"),
    ).filter(F.col("n") == 20)
    dev = F.col("x") * F.col("n") - F.col("sx")
    var_n2 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    b = w.select(
        "user_id",
        (dev * dev * F.col("n") > 4 * var_n2 * F.col("n")).alias("breach"),
    )
    return (
        b.groupBy("user_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.count_if("breach").alias("n_breaches"),
        )
        .filter(F.col("n_breaches") > 0)
        .orderBy("user_id")
    )


@register(
    "ts_max_drawdown",
    """
    WITH s AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CAST(round(value * 100) AS BIGINT) - 25000 AS pnl
      FROM events WHERE user_id < 50),
    c AS (
      SELECT user_id, ts, event_id,
             CAST(sum(pnl) OVER w AS BIGINT) AS equity
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    d AS (
      SELECT user_id, equity,
             CAST(max(equity) OVER w AS BIGINT) AS peak
      FROM c
      WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT user_id,
           CAST(max(peak - equity) AS BIGINT) AS max_drawdown_cents,
           CAST(max(peak) AS BIGINT) AS peak_equity_cents
    FROM d GROUP BY user_id ORDER BY user_id
    """,
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per stream: the deepest peak-to-trough fall of
    the cumulative P&L curve — the risk statistic (and its cousin, the
    high-water mark) that summarizes 'how bad did it get' where
    variance can't. Two stacked running windows (cumulative sum, then
    running max) and one aggregate — the same closed-form discipline as
    ts_cusum_alerts (drawdown IS the CUSUM mirror: running-max minus
    current), all integer cents with a constant drift offset so
    equities actually go down as well as up."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.round(F.col("value") * 100, 0).cast("bigint") - 25000).alias(
            "pnl"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = s.select(
        "user_id", "ts", "event_id", F.sum("pnl").over(w).alias("equity")
    )
    d = c.select(
        "user_id", "equity", F.max("equity").over(w).alias("peak")
    )
    return (
        d.groupBy("user_id")
        .agg(
            F.max(F.col("peak") - F.col("equity")).alias(
                "max_drawdown_cents"
            ),
            F.max("peak").alias("peak_equity_cents"),
        )
        .orderBy("user_id")
    )


@register(
    "corpus_token_apportion",
    """
    WITH d AS (
      SELECT source,
             CAST(sum(len(list_filter(
               string_split_regex(lower(text), '\\s+'), t -> t <> '')))
               AS BIGINT) AS n_tok
      FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total FROM d),
    q AS (
      SELECT source, n_tok,
             (n_tok * 1000000) // t.total AS base_alloc,
             (n_tok * 1000000) % t.total AS remainder
      FROM d CROSS JOIN t),
    r AS (
      SELECT source, n_tok, base_alloc, remainder,
             row_number() OVER (ORDER BY remainder DESC, source) AS frac_rank
      FROM q),
    gap AS (
      SELECT CAST(1000000 - sum(base_alloc) AS BIGINT) AS n_extra FROM r)
    SELECT r.source, r.n_tok,
           CAST(r.base_alloc
                + CASE WHEN r.frac_rank <= g.n_extra THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens
    FROM r CROSS JOIN gap g
    ORDER BY r.source
    """,
)
def corpus_token_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget apportionment by largest remainder (Hamilton's
    method): divide a 1M-token training budget across sources exactly
    proportionally to their corpus sizes — floors first, then the
    leftover tokens go to the largest fractional remainders, so the
    allocations are integers that sum EXACTLY to the budget (naive
    rounding over- or under-shoots; at fleet scale that error is whole
    shards). Everything is integer division/modulo on exact token
    counts; the remainder ranking is a window over #sources rows; the
    leftover count is re-derived from the allocation table itself (one
    row, broadcast)."""
    docs = table(spark, sf_dir, "documents")
    budget = 1000000
    # the per-source token table is #sources rows but its upstream is
    # the corpus token count — checkpoint so the four consumers
    # (total, quotas, remainder ranking, gap) scan the corpus ONCE
    d = (
        spread(docs, "doc_id")
        .select("source", F.size(H.tokens(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tok"))
        .localCheckpoint()
    )
    t = d.agg(F.sum("n_tok").alias("total"))
    q = d.crossJoin(F.broadcast(t)).select(
        "source",
        "n_tok",
        F.floor(F.col("n_tok") * budget / F.col("total"))
        .cast("bigint")
        .alias("base_alloc"),
        ((F.col("n_tok") * budget) % F.col("total")).alias("remainder"),
    )
    r = q.withColumn(
        "frac_rank",
        F.row_number().over(
            Window.orderBy(F.col("remainder").desc(), "source")
        ),
    ).localCheckpoint()
    gap = r.agg((budget - F.sum("base_alloc")).alias("n_extra"))
    return (
        r.crossJoin(F.broadcast(gap))
        .select(
            "source",
            "n_tok",
            (
                F.col("base_alloc")
                + F.when(F.col("frac_rank") <= F.col("n_extra"), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("alloc_tokens"),
        )
        .orderBy("source")
    )


_LUHN_SQL_DIGITS = (
    "list_transform(range(1, len(pan) + 1), "
    "i -> CAST(substring(pan, len(pan) - i + 1, 1) AS BIGINT))"
)


@register(
    "f21_luhn_check",
    f"""
    WITH c AS (
      SELECT event_id,
             lpad(CAST(({H.hash64_sql('event_id', 23)}) % 100000000 AS VARCHAR),
                  8, '0') || lpad(CAST(({H.hash64_sql('event_id', 29)})
                  % 10000000 AS VARCHAR), 7, '0') AS body
      FROM events WHERE event_id % 101 = 0),
    w AS (
      -- body digit at right-position i sits at PAN right-position i+1,
      -- so ODD body positions are the doubled ones
      SELECT event_id, body,
             CAST(list_sum(list_transform(range(1, 16),
               i -> CASE WHEN i % 2 = 1 THEN
                      CASE WHEN 2 * CAST(substring(body, 16 - i, 1) AS BIGINT) > 9
                           THEN 2 * CAST(substring(body, 16 - i, 1) AS BIGINT) - 9
                           ELSE 2 * CAST(substring(body, 16 - i, 1) AS BIGINT) END
                    ELSE CAST(substring(body, 16 - i, 1) AS BIGINT) END))
               AS BIGINT) AS s
      FROM c),
    pan AS (
      SELECT event_id, body || CAST((10 - s % 10) % 10 AS VARCHAR) AS pan
      FROM w),
    v AS (
      SELECT event_id, pan,
             CAST(list_sum(list_transform(range(1, 17),
               i -> CASE WHEN i % 2 = 0 THEN
                      CASE WHEN 2 * CAST(substring(pan, 17 - i, 1) AS BIGINT) > 9
                           THEN 2 * CAST(substring(pan, 17 - i, 1) AS BIGINT) - 9
                           ELSE 2 * CAST(substring(pan, 17 - i, 1) AS BIGINT) END
                    ELSE CAST(substring(pan, 17 - i, 1) AS BIGINT) END))
               AS BIGINT) % 10 = 0 AS luhn_ok
      FROM pan)
    SELECT count(*) AS n, count(*) FILTER (WHERE luhn_ok) AS n_valid,
           count(*) FILTER (WHERE NOT luhn_ok) AS n_invalid
    FROM v
    """,
)
def f21_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checksum (mod-10) generation + validation en masse: build
    16-digit card-like numbers from the hash family (15-digit body, the
    16th digit computed so Luhn holds), then validate the full PAN —
    the detector that turns text_pii_scrub's regex hits into CONFIRMED
    card numbers (a 16-digit string that fails Luhn is a false
    positive; this is the standard second-stage PII filter). The
    double-every-second-digit fold is a higher-order transform over
    digit positions — pure integer column math, no UDF; validation of
    our own generated checks must return 100% valid, which the oracle
    asserts from the same construction."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 101 == 0)
    body = F.concat(
        F.lpad(
            (H.hash64(F.col("event_id"), 23) % 100000000).cast("string"),
            8,
            "0",
        ),
        F.lpad(
            (H.hash64(F.col("event_id"), 29) % 10000000).cast("string"),
            7,
            "0",
        ),
    )
    c = ev.select("event_id", body.alias("body"))

    def luhn_sum(col: str, length: int, double_parity: int) -> str:
        return (
            f"aggregate(sequence(1, {length}), CAST(0 AS BIGINT), (acc, i) -> "
            f"acc + CASE WHEN i % 2 = {double_parity} THEN "
            f"CASE WHEN 2 * CAST(substring({col}, {length + 1} - i, 1) AS BIGINT) > 9 "
            f"THEN 2 * CAST(substring({col}, {length + 1} - i, 1) AS BIGINT) - 9 "
            f"ELSE 2 * CAST(substring({col}, {length + 1} - i, 1) AS BIGINT) END "
            f"ELSE CAST(substring({col}, {length + 1} - i, 1) AS BIGINT) END)"
        )

    # body right-position i lands at PAN right-position i+1 → odd body
    # positions double; in the final PAN the even positions double
    w = c.select(
        "event_id", "body", F.expr(luhn_sum("body", 15, 1)).alias("s")
    )
    pan = w.select(
        "event_id",
        F.concat(
            F.col("body"), ((10 - F.col("s") % 10) % 10).cast("string")
        ).alias("pan"),
    )
    v = pan.select(
        "event_id",
        (F.expr(luhn_sum("pan", 16, 0)) % 10 == 0).alias("luhn_ok"),
    )
    return v.agg(
        F.count("*").alias("n"),
        F.count_if("luhn_ok").alias("n_valid"),
        F.count_if(~F.col("luhn_ok")).alias("n_invalid"),
    )


# The external verify driver samples the FIRST 50 entries of ``queries()``
# each round. Rotation is SELF-MAINTAINING: any query that already has a
# fully-green row (rows+schema+hash) in some CORRECTNESS_r{N}.json — or a
# rows-only-by-design row (``err == 'no_oracle'``, which can never become
# fully green) — yields its slot to not-yet-verified (or previously red)
# names, so every round's 50-query window adds fresh externally-verified
# coverage. Unverified names are ordered priority-first (the LLM-pipeline
# composites + streaming exactly-once family — the headline claims);
# already-checked names follow, rotated by parsed-round count so
# once-green queries cycle back through the window for external
# RE-checks once the backlog clears (a later regression in a verified
# query is then re-caught externally, not only by the local oracle run).
# All queries stay locally checked via tools/verify_oracle.py regardless.

_PRIORITY_PREFIXES = (
    "pipeline_",
    "bm25_",
    "hybrid_",
    "graph_",
    "dedup_",
    "streaming_",
)


def _driver_check_state(repo: str | None = None) -> tuple:
    """(retired, n_rounds, last_round): names the front-50 window should
    skip — fully green in some round, or externally checked with ``err
    == 'no_oracle'`` (rows-only by design; they would otherwise pin 2
    of the 50 slots every round) — the count of parsed round files, and
    the STALENESS key: ``last_round[name]`` is the ROUND NUMBER parsed
    from the latest ``CORRECTNESS_r(\\d+).json`` filename whose row for
    ``name`` was fully green (or, for permanently rows-only names, the
    latest round with any row). Keying on the parsed round — not the
    file count (pre-r13 behavior) — means a missing round file (r06's
    is absent today) or a back-added one shifts nothing: round 12 is
    round 12 regardless of how many files survive on disk (r12 VERDICT
    wrong-item 3). A rows-only name that has since GAINED an oracle_sql
    entry is un-retired so the driver re-checks it at full strength
    (round-6: a5_approx_distinct and streaming_stateful_totals were
    converted to oracle-checkable form). ``repo`` overrides the
    CORRECTNESS_r*.json directory (tests)."""
    import glob
    import json
    import re

    if repo is None:
        repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    green_ever = set()
    rows_only = set()
    last_green: dict[str, int] = {}
    last_seen: dict[str, int] = {}
    n_rounds = 0
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            # a malformed (list/scalar) round file must not break
            # all_queries() for every caller — skip it
            continue
        n_rounds += 1
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            last_seen[name] = max(last_seen.get(name, 0), rnd)
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            if green:
                green_ever.add(name)
                last_green[name] = max(last_green.get(name, 0), rnd)
            elif row.get("err") == "no_oracle":
                rows_only.add(name)
    retired = green_ever | {n for n in rows_only if n not in ORACLES}
    last_round = {
        n: last_green.get(n, last_seen.get(n, 0)) for n in retired
    }
    return retired, n_rounds, last_round


# Names pinned to the very front of the driver window this round:
# judge-directed fixes whose green row is the round's done-criterion
# (r08 used this for the w12 HUGEINT-oracle fix; both names went green
# and the pin self-expired).  A pin overrides retired status: r09
# rewrote these three plans (g1 → regr_slope, g2 → cogroup prefilter,
# a13 → array-percentile buffer) but their green rows predate the
# rewrites (g1's is r04-era), so r10 pins them front for external
# confirmation of the NEW implementations (r09 ADVICE #3).  Drop the
# pins once CORRECTNESS_r10 shows them green.
# (name, pinned_at) — pinned_at is the ROUND NUMBER of the name's
# NEWEST PRE-REWRITE green row (e.g. the four below were rewritten in
# r09/r10 while their newest greens were r08-era, hence pinned_at=8 —
# NOT the round the pin was installed in), matching
# _driver_check_state's staleness key (parsed from the
# CORRECTNESS_r(\d+).json filename, NOT the file count — r06's file is
# missing, so count and number diverge). A pin exists because the
# name's green row predates a rewrite and must be RE-EARNED; it
# SELF-EXPIRES once the name earns a fully-green row in a round
# STRICTLY LATER than pinned_at (last_round[n] > pinned_at), so no
# builder has to remember to empty this tuple next round. Setting
# pinned_at to the CURRENT round number would keep the pin alive one
# extra round — always use the stale green's round.
_FRONT_NAMES: tuple = (
    ("g1_trend_fit", 8),
    ("g2_cogroup_merge", 8),
    ("a13_equifreq_bins", 8),
    # r10 rewrite: distinct pairs first, HLL over pairs (bit-identical,
    # kills the per-pair sketch-buffer shuffle) — green must be re-earned
    ("a5_approx_distinct", 8),
)


def _rotated(reg: dict, repo: str | None = None) -> dict:
    retired, n_rounds, last_round = _driver_check_state(repo)
    # Active pins come first REGARDLESS of retired status — filtering
    # pins through `fresh` (as pre-r10 code did) would silently drop
    # the most important names. An expired pin (green row newer than
    # the pin) falls through to the normal staleness cycle.
    front = [
        n
        for n, pinned_at in _FRONT_NAMES
        if n in reg and last_round.get(n, 0) <= pinned_at
    ]
    front_set = set(front)
    fresh = [n for n in reg if n not in retired and n not in front_set]
    pri = front + [n for n in fresh if n.startswith(_PRIORITY_PREFIXES)]
    pri_set = set(pri)
    rest = [n for n in fresh if n not in pri_set]
    # STALENESS-FIRST re-check cycle (r08 VERDICT #3): once the fresh
    # backlog no longer fills the driver's 50-slot window, the
    # remaining slots re-check the names whose latest fully-green
    # driver row is OLDEST — early-round greens were checked on code
    # that has since been heavily refactored, so they are the highest
    # regression risk. Re-checked names get a new green row and move
    # to the back automatically, so the cycle sweeps the whole
    # registry every ~⌈N/50⌉ rounds with no stride bookkeeping.
    reg_pos = {n: i for i, n in enumerate(reg)}
    tail = sorted(
        (n for n in reg if n in retired and n not in front_set),
        key=lambda n: (last_round.get(n, 0), reg_pos[n]),
    )
    return {n: reg[n] for n in pri + rest + tail}


def all_queries() -> dict[str, QueryFn]:
    return _rotated(dict(QUERIES))


def all_oracles() -> dict[str, str]:
    return _rotated(dict(ORACLES))
