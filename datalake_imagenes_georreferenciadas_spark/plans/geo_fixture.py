"""Hand-made geo fixture (FIXTURES.md §B) shared by the Spark plans and the
DuckDB oracle as inline VALUES — tiny convex polygons so containment has a
DuckDB-expressible twin (same-sign cross-product test), per SURVEY §5.2.

Mirrors the reference's data model: image centroids (some unlocatable →
the P7 unclassifiable branch) vs parcel polygons with CODIGO/SECCION/...
properties (script_geo.py:75,85-86).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (img_id, lon, lat) — inside P1, inside P2, inside P3, outside-all ×3, null ×2
POINTS: list[tuple[int, float | None, float | None]] = [
    (1, 1.0, 1.0),      # inside P1 (triangle)
    (2, 1.5, 0.6),      # inside P1
    (3, 5.5, 5.5),      # inside P2 (square)
    (4, 5.2, 5.9),      # inside P2
    (5, 10.3, 0.8),     # inside P3 (pentagon)
    (6, 3.0, 3.1),      # outside all → NN fallback
    (7, 8.0, 8.5),      # outside all → NN fallback
    (8, -2.0, -2.0),    # outside all → NN fallback
    (9, None, None),    # unlocatable → IMAGEN NO CLASIFICABLE
    (10, None, 4.0),    # half-null → unclassifiable
]

# id_predio, nombre, codigo, seccion, rodal, tipouso, apl, ring (closed not required)
POLYS: list[dict] = [
    {
        "id_predio": "P1",
        "nombre": "FUNDO_UNO",
        "codigo": "C01",
        "seccion": "S1",
        "rodal": "R1",
        "tipouso": "BOSQUE",
        "apl": "A",
        "ring": [(0.0, 0.0), (3.0, 0.0), (1.0, 2.5)],
    },
    {
        "id_predio": "P2",
        "nombre": "FUNDO_DOS",
        "codigo": "C02",
        "seccion": "S2",
        "rodal": "R2",
        "tipouso": "PRADERA",
        "apl": "B",
        "ring": [(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 6.0)],
    },
    {
        "id_predio": "P3",
        "nombre": "FUNDO_TRES",
        "codigo": "C03",
        "seccion": "S3",
        "rodal": "R3",
        "tipouso": "BOSQUE",
        "apl": "A",
        "ring": [(9.5, 0.0), (10.5, -0.3), (11.2, 0.5), (10.4, 1.4), (9.7, 1.1)],
    },
]


def spark_points(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(POINTS, "img_id long, lon double, lat double")


def spark_polys(spark: SparkSession) -> DataFrame:
    rows = [
        (
            p["id_predio"],
            p["nombre"],
            p["codigo"],
            p["seccion"],
            p["rodal"],
            p["tipouso"],
            p["apl"],
            [{"x": x, "y": y} for x, y in p["ring"]],
        )
        for p in POLYS
    ]
    return spark.createDataFrame(
        rows,
        "id_predio string, nombre string, codigo string, seccion string, rodal string, "
        "tipouso string, apl string, ring array<struct<x double, y double>>",
    )


def _fmt(v: float | None) -> str:
    return "NULL" if v is None else repr(float(v))


def points_values_sql() -> str:
    """``(VALUES ...) AS pts(img_id, lon, lat)`` body."""
    rows = ", ".join(
        f"({i}, {_fmt(x)}::DOUBLE, {_fmt(y)}::DOUBLE)" for i, x, y in POINTS
    )
    return f"(VALUES {rows}) AS pts(img_id, lon, lat)"


def vertices_values_sql() -> str:
    """``(VALUES ...) AS v(id_predio, nombre, seq, x, y)`` body."""
    rows = []
    for p in POLYS:
        for seq, (x, y) in enumerate(p["ring"], 1):
            rows.append(
                f"('{p['id_predio']}', '{p['nombre']}', {seq}, {x!r}::DOUBLE, {y!r}::DOUBLE)"
            )
    return f"(VALUES {', '.join(rows)}) AS v(id_predio, nombre, seq, x, y)"


def edges_values_sql() -> str:
    """``(VALUES ...) AS e(id_predio, nombre, x1, y1, x2, y2)`` — closed
    edge walk, same wraparound as functions.geo.point_in_ring."""
    rows = []
    for p in POLYS:
        ring = p["ring"]
        n = len(ring)
        for i in range(n):
            (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
            rows.append(
                f"('{p['id_predio']}', '{p['nombre']}', {x1!r}::DOUBLE, {y1!r}::DOUBLE, {x2!r}::DOUBLE, {y2!r}::DOUBLE)"
            )
    return f"(VALUES {', '.join(rows)}) AS e(id_predio, nombre, x1, y1, x2, y2)"


def polys_props_values_sql() -> str:
    """``(VALUES ...) AS pp(id_predio, nombre, codigo, seccion, rodal, tipouso, apl)``."""
    rows = ", ".join(
        f"('{p['id_predio']}', '{p['nombre']}', '{p['codigo']}', '{p['seccion']}', "
        f"'{p['rodal']}', '{p['tipouso']}', '{p['apl']}')"
        for p in POLYS
    )
    return (
        f"(VALUES {rows}) AS pp(id_predio, nombre, codigo, seccion, rodal, tipouso, apl)"
    )


#: geotransform fixture for F8 — (img_id, gt[6], cols, rows)
RASTERS: list[tuple[int, list[float], int, int]] = [
    (1, [200000.0, 0.5, 0.0, 6000000.0, 0.0, -0.5], 1000, 800),
    (2, [350000.0, 2.0, 0.1, 5500000.0, -0.1, -2.0], 512, 512),
    (3, [100.0, 1.0, 0.0, 100.0, 0.0, -1.0], 10, 10),
]


def rasters_values_sql() -> str:
    rows = ", ".join(
        f"({i}, {gt[0]!r}, {gt[1]!r}, {gt[2]!r}, {gt[3]!r}, {gt[4]!r}, {gt[5]!r}, {c}, {r})"
        for i, gt, c, r in RASTERS
    )
    return f"(VALUES {rows}) AS rast(img_id, gt0, gt1, gt2, gt3, gt4, gt5, cols, rows)"


def spark_rasters(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        RASTERS, "img_id long, gt array<double>, cols int, rows int"
    )
