"""Spatial join operators (SURVEY J2–J5, §4.3) — the reference's heart.

The reference classifies each image centroid against cadastral parcels:
containment first (``Polygon.contains``, script_geo.py:84), then a
nearest-vertex fallback across three tiers (script_geo.py:92-140). Note
SURVEY §2.11 bug 1: the reference *accidentally discards* its containment
result; we implement the intent (containment, then NN fallback).

Plan shapes, scale-first:

- **contains_join (v1)**: broadcast the polygon dimension (parcels are
  MBs, images are the 100 TB side) → BroadcastNestedLoopJoin with a
  codegen'd ray-casting predicate. No shuffle of the fact side at all.
- **contains_join_grid (v2, the §4.3 scale path)**: explode each polygon
  to the grid cells its bbox overlaps, give each point its cell, and
  **equi-join on cell** before the exact ray-cast. Catalyst shuffle-
  partitions the equi-join; skewed cells are handled by AQE skew-join.
- **nearest_vertex_join (J3)**: explode polygons to vertices (a one-time
  dimension prep, exactly like the reference's ``allcoor`` index,
  script_geo.py:146-154), broadcast, then argmin per point via
  ``min(struct(dist, tiebreak...))`` — deterministic ties by parcel id,
  fixing §2.11 bug 6 (float-equality matching).
- **classify_points (3A pipeline)**: containment left-join + NN fallback +
  ``coalesce`` → the unclassifiable branch yields nulls and the P7 label,
  implementing §2.11 bug 2's intent.

Polygon encoding: ``rings array<array<struct<x:double,y:double>>>`` —
every ring of the (Multi)Polygon, exterior shells and interior holes
alike, as plain Spark types (WKT would round-trip through a parser for no
benefit here). Containment is the even-odd ray-cast over all rings
(functions.geo.point_in_rings), so holes subtract and MultiPolygon parts
add without the operator caring which ring is which — matching shapely's
semantics in the reference (script_geo.py:50-57,84).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import dist2, grid_cell, point_in_rings
from .topk import argmin_per_group


def contains_join(
    points: DataFrame,
    polys: DataFrame,
    point_id: str = "img_id",
    x_col: str = "lon",
    y_col: str = "lat",
    ring_col: str = "rings",
    how: str = "left",
) -> DataFrame:
    """J2: point-in-polygon join, broadcast-nested-loop with a ray-cast
    predicate over all rings (holes honored). Use when the polygon side
    fits in memory (the reference's own assumption — it holds all parcels
    in a driver list)."""
    pred = point_in_rings(points[x_col], points[y_col], polys[ring_col])
    return points.join(F.broadcast(polys), pred, how)


def contains_join_grid(
    points: DataFrame,
    polys: DataFrame,
    eps: float = 0.5,
    point_id: str = "img_id",
    x_col: str = "lon",
    y_col: str = "lat",
    ring_col: str = "rings",
) -> DataFrame:
    """J2 at scale (§4.3): grid-cell equi-join prefilter, then exact test.

    Each polygon is exploded to every ε-cell its bounding box overlaps
    (dimension-side blowup is bounded and tiny); each point maps to exactly
    one cell. The join becomes ``point.cell = poly.cell`` — an equi-join
    Catalyst can hash-partition — and the ray-cast runs only on survivors.
    The bbox spans ALL rings (for valid geometry the shells' bbox — holes
    lie inside shells; MultiPolygon parts each contribute).
    """
    cells = polys.withColumn(
        "__flat", F.flatten(F.col(ring_col))
    ).withColumn(
        "__cells",
        F.expr(
            f"""
            flatten(transform(
              sequence(cast(floor(array_min(transform(__flat, p -> p.x)) / {eps}) as bigint),
                       cast(floor(array_max(transform(__flat, p -> p.x)) / {eps}) as bigint)),
              cx -> transform(
                sequence(cast(floor(array_min(transform(__flat, p -> p.y)) / {eps}) as bigint),
                         cast(floor(array_max(transform(__flat, p -> p.y)) / {eps}) as bigint)),
                cy -> struct(cx as cx, cy as cy))))
            """
        ),
    ).withColumn("__cell", F.explode("__cells")).drop("__cells", "__flat")
    pts = points.withColumn("__cell", grid_cell(F.col(x_col), F.col(y_col), eps))
    joined = pts.join(cells, "__cell")
    return joined.filter(point_in_rings(F.col(x_col), F.col(y_col), F.col(ring_col))).drop(
        "__cell"
    )


def explode_vertices(
    polys: DataFrame, ring_col: str = "rings", keep: tuple[str, ...] = ("id_predio", "nombre")
) -> DataFrame:
    """Dimension prep for J3: one row per polygon vertex across every ring
    — shells and holes, like the reference's ``allcoor`` vertex→parcel
    index built from the full nested coordinate walk
    (script_geo.py:50-57,146-154)."""
    return polys.select(
        *keep, F.explode(F.flatten(F.col(ring_col))).alias("__v")
    ).select(*keep, F.col("__v.x").alias("vx"), F.col("__v.y").alias("vy"))


def nearest_vertex_join(
    points: DataFrame,
    polys: DataFrame,
    point_id: str = "img_id",
    x_col: str = "lon",
    y_col: str = "lat",
    ring_col: str = "rings",
    keep: tuple[str, ...] = ("id_predio", "nombre"),
) -> DataFrame:
    """J3–J5: nearest polygon vertex per point, deterministic argmin.

    Broadcast the (small) vertex dimension against the point fact table,
    compute squared distance, and ``min(struct(dist, keep...))`` per point
    — one partial-aggregated shuffle on point id, no window state. Ties
    break on the ``keep`` columns' ordering (documented, deterministic).
    """
    verts = explode_vertices(polys, ring_col, keep)
    crossed = points.select(point_id, x_col, y_col).join(F.broadcast(verts))
    scored = crossed.withColumn(
        "dist2", dist2(F.col(x_col), F.col(y_col), F.col("vx"), F.col("vy"))
    )
    return argmin_per_group(scored, [point_id], F.col("dist2"), [*keep, "vx", "vy"])


def classify_points(
    points: DataFrame,
    polys: DataFrame,
    point_id: str = "img_id",
    x_col: str = "lon",
    y_col: str = "lat",
    ring_col: str = "rings",
    keep: tuple[str, ...] = ("id_predio", "nombre"),
    unclassifiable_label: str = "IMAGEN NO CLASIFICABLE",
) -> DataFrame:
    """The 3A classifier: containment first, nearest-vertex fallback, P7
    null-guard label for points with no coordinates (§2.11 intent).

    Output: point columns + ``keep`` columns + ``method`` ∈
    {'contains','nearest', unclassifiable_label}.
    """
    has_xy = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    located = points.filter(has_xy)
    unlocated = points.filter(~has_xy)

    # Single-pass plan: ONE broadcast join scoring every (point, polygon)
    # with BOTH the containment flag and the min vertex distance, then ONE
    # argmin whose sort key ranks containment above proximity:
    #   (0, 0.0, keep...)  for containing polygons  → min keep wins (the
    #                        deterministic overlap tie-break)
    #   (1, d2,  keep...)  otherwise                → nearest vertex wins
    # Same winners as the contains-then-fallback cascade (the vx/vy
    # tie-break of the vertex formulation only ordered rows WITHIN a
    # polygon and never changed which polygon won), but 2 stages instead
    # of 6 — at 100 TB the fact side is scanned ONCE.
    px, py = F.col(x_col), F.col(y_col)
    rings = F.col(ring_col)
    scored = located.join(F.broadcast(polys.select(*keep, ring_col))).select(
        point_id,
        *keep,
        point_in_rings(px, py, rings).alias("__in"),
        F.array_min(
            F.transform(F.flatten(rings), lambda p: dist2(px, py, p["x"], p["y"]))
        ).alias("__vd2"),
    )
    rank = F.struct(
        F.when(F.col("__in"), 0).otherwise(1).alias("r"),
        F.when(F.col("__in"), F.lit(0.0)).otherwise(F.col("__vd2")).alias("d"),
        *[F.col(c) for c in keep],
        F.col("__in"),
    )
    win = scored.groupBy(point_id).agg(F.min(rank).alias("__w"))
    located_out = win.select(
        point_id,
        *[F.col(f"__w.{c}").alias(c) for c in keep],
        F.when(F.col("__w.__in"), F.lit("contains")).otherwise(F.lit("nearest")).alias("method"),
    )

    # Null literals must carry each keep column's REAL dtype — a hardcoded
    # string cast would silently widen non-string keeps in the unionByName
    # (or error under ANSI).
    keep_types = {f.name: f.dataType for f in polys.schema.fields}
    unc = unlocated.select(
        point_id,
        *[F.lit(None).cast(keep_types[c]).alias(c) for c in keep],
        F.lit(unclassifiable_label).alias("method"),
    )
    return located_out.unionByName(unc)
