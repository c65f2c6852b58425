"""Registry segment 14 (round 17 additions — append-only registrations).

- a22's 100 TB twin: distributed exact weighted quantile (bucket
  decomposition, no fact-level global window)
"""

from ._qbase import (
    DataFrame,
    F,
    SparkSession,
    Window,
    register,
    table,
)
from .q05_training import _WQ_QS


@register(
    "a22_weighted_quantile_dist",
    f"""
    WITH s AS (
      SELECT l_extendedprice AS v,
             sum(CAST(l_quantity AS DECIMAL(18,4))) OVER
               (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS cw,
             sum(CAST(l_quantity AS DECIMAL(18,4))) OVER () AS tw
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        AND l_quantity > 0),
    qs AS (SELECT * FROM (VALUES {', '.join(f'({q}::DOUBLE, {n}, {d})' for q, n, d in _WQ_QS)}) AS t(q, num, den))
    SELECT q, min(v) AS wq
    FROM s, qs
    WHERE cw * den >= num * tw
    GROUP BY q ORDER BY q
    """,
)
def a22_weighted_quantile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a22's 100 TB twin: the SAME exact lower weighted quantile with
    NO fact-level global window — the scale path a22's docstring
    promises, built and value-checked against the unchanged exact
    oracle. Two distributed passes:

    1. per-VALUE weight sums (hash shuffle on v — the answer of a
       lower weighted quantile is determined at value granularity, so
       row-level tie-break order is irrelevant by construction), then
       per-BUCKET sums over b = floor(v/1000) (monotone, so bucket
       order == value order). The only ordered window runs over the
       BUCKET table — bounded by the price domain (~100 rows, constant
       in n; it sits above two HashAggregates, so the sweep's
       fact-altitude walk never reaches a scan), and the grand total
       rides the same bounded pass as an unbounded-frame window sum,
       so lineitem is scanned exactly twice, like a22.
    2. the one crossing bucket per q (cum_before < q·tw ≤ cum_through,
       unique because weights are positive) is broadcast back onto the
       per-value table; a window PARTITIONED by q over that single
       bucket's values resolves the exact crossing value.

    Arithmetic is a22's bit-exact discipline unchanged: DECIMAL(18,4)
    partial sums (associative), integer-rational thresholds
    (cw·den ≥ num·tw). Domain contract (both engines): weights must be
    POSITIVE — bucket decomposition needs a monotone cumulative, and a
    weighted quantile with negative weights is undefined anyway; TPC-H
    quantities are ≥1, so on clean data this returns bit-identically
    a22's rows (pinned by tests/test_weighted_quantile_dist.py)."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
        & (F.col("l_quantity") > 0)
    )
    pv = (
        li.groupBy(F.col("l_extendedprice").alias("v"))
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .alias("w")
        )
        .withColumn("b", F.floor(F.col("v") / F.lit(1000.0)))
    )
    pb = pv.groupBy("b").agg(F.sum("w").cast("decimal(18,4)").alias("bw"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    # the grand total rides the SAME bounded bucket pass as the running
    # sum (unbounded frame over ~100 bucket rows) — lineitem is scanned
    # exactly twice, like a22, not once per derived branch
    wt = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pbc = pb.select(
        "b",
        F.sum("bw").over(wb).alias("cum_b"),
        (F.sum("bw").over(wb) - F.col("bw")).alias("cum_before"),
        F.sum("bw").over(wt).cast("decimal(28,4)").alias("tw"),
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
    crossing = (
        pbc.select("b", "cum_b", "cum_before", "tw", qs)
        .select("b", "cum_b", "cum_before", "tw", "t.q", "t.num", "t.den")
        .filter(
            (F.col("cum_b") * F.col("den") >= F.col("num") * F.col("tw"))
            & (F.col("cum_before") * F.col("den") < F.col("num") * F.col("tw"))
        )
        .select("b", "q", "num", "den", "cum_before", "tw")
    )
    wv = (
        Window.partitionBy("q")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        pv.join(F.broadcast(crossing), "b")
        .select(
            "q",
            "v",
            (F.col("cum_before") + F.sum("w").over(wv)).alias("cw"),
            "num",
            "den",
            "tw",
        )
        .filter(F.col("cw") * F.col("den") >= F.col("num") * F.col("tw"))
        .groupBy("q")
        .agg(F.min("v").alias("wq"))
        .orderBy("q")
    )
