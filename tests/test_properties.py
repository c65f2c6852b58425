"""Property-based tests (SURVEY §5.2-4, hypothesis): containment vs a
pure-Python reference, dedup idempotence, KNN invariants, reprojection
round-trips."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from datalake_imagenes_georreferenciadas_spark import compat

# ---- pure-Python ray casting (reference implementation for the property) --


def _py_point_in_ring(px: float, py: float, ring: list[tuple[float, float]]) -> bool:
    n = len(ring)
    crossings = 0
    for i in range(n):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % n]
        if (ay > py) != (by > py):
            x_at = (bx - ax) * (py - ay) / (by - ay) + ax
            if px < x_at:
                crossings += 1
    return crossings % 2 == 1


# a convex polygon generator: sorted angles around a center
@st.composite
def convex_rings(draw):
    """Non-degenerate convex polygons: angular gaps ≥ 0.15 rad, so the
    centroid is well inside (slivers make 'inside' boundary-ambiguous)."""
    k = draw(st.integers(min_value=3, max_value=8))
    gaps = draw(
        st.lists(st.floats(0.15, 1.5, allow_nan=False), min_size=k, max_size=k)
    )
    total = sum(gaps)
    start = draw(st.floats(0, 2 * math.pi))
    # normalize: every gap = 0.15 + share of the remaining circle, so the
    # k gaps sum to exactly 2π and each is ≥ 0.15
    spare = 2 * math.pi - 0.15 * k
    norm = [0.15 + g / total * spare for g in gaps]
    angles, acc = [], start
    for g in norm[:k]:
        angles.append(acc)
        acc += g
    r = draw(st.floats(0.5, 5.0))
    return [(r * math.cos(a), r * math.sin(a)) for a in angles]


POINTS = st.tuples(
    st.floats(-6, 6, allow_nan=False, allow_infinity=False),
    st.floats(-6, 6, allow_nan=False, allow_infinity=False),
)


class TestContainmentProperty:
    """The Spark column kernel and the pure-Python walk must agree; we
    validate the SHARED algorithm here (the Spark kernel is checked
    against the DuckDB oracle in geo_contains), plus geometric anchors."""

    @given(ring=convex_rings())
    @settings(max_examples=50, deadline=None)
    def test_centroid_of_convex_ring_is_inside(self, ring):
        cx = sum(x for x, _ in ring) / len(ring)
        cy = sum(y for _, y in ring) / len(ring)
        assert _py_point_in_ring(cx, cy, ring)

    @given(ring=convex_rings(), pt=POINTS)
    @settings(max_examples=100, deadline=None)
    def test_far_points_are_outside(self, ring, pt):
        px, py = pt[0] + 100.0, pt[1] + 100.0  # beyond any generated radius
        assert not _py_point_in_ring(px, py, ring)


class TestReprojectionProperties:
    @given(
        x=st.floats(100000, 900000, allow_nan=False),
        y=st.floats(8500000, 10500000, allow_nan=False),
    )
    @settings(max_examples=100, deadline=None)
    def test_reproject_monotone(self, x, y):
        """Equal-area-ish approximation must be strictly monotone in both
        axes (order-preserving: a point east of another stays east)."""
        [(lon1, lat1)] = compat.reproject_coords([(x, y)])
        [(lon2, lat2)] = compat.reproject_coords([(x + 1000.0, y + 1000.0)])
        assert lon2 > lon1
        assert lat2 > lat1

    @given(coords=st.lists(st.tuples(st.floats(1e5, 9e5), st.floats(8.5e6, 1.05e7)), max_size=5))
    @settings(max_examples=50, deadline=None)
    def test_reproject_length_preserved(self, coords):
        assert len(compat.reproject_coords(coords)) == len(coords)


class TestDedupProperties:
    @given(
        texts=st.lists(
            st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=10
        )
    )
    @settings(max_examples=50, deadline=None)
    def test_unique_places_idempotent(self, texts):
        feats = [
            {"properties": {"CODIGO": t, "SECCION": 1, "RODAL": 1, "TIPOUSO": "X", "APL": "A"}}
            for t in texts
        ]
        once = compat.unique_places(feats)
        again = compat.unique_places(
            [
                {"properties": {"CODIGO": k.split("_")[0], "SECCION": 1, "RODAL": 1, "TIPOUSO": "X", "APL": "A"}}
                for k in once
            ]
        )
        # dedup(dedup(x)) == dedup(x) modulo the key round-trip
        assert len(again) <= len(once)
        assert len(set(once)) == len(once)  # no duplicates survive

    @given(st.lists(st.integers(0, 5), min_size=1, max_size=20))
    @settings(max_examples=50, deadline=None)
    def test_get_extent_corner_count(self, _):
        ext = compat.get_extent([0.0, 1.0, 0.0, 0.0, 0.0, -1.0], 7, 9)
        assert len(ext) == 4
        xs = [p[0] for p in ext]
        ys = [p[1] for p in ext]
        assert min(xs) == 0.0 and max(xs) == 7.0
        assert min(ys) == -9.0 and max(ys) == 0.0


def _py_point_in_rings(px, py, rings):
    crossings = 0
    for ring in rings:
        n = len(ring)
        for i in range(n):
            ax, ay = ring[i]
            bx, by = ring[(i + 1) % n]
            if (ay > py) != (by > py):
                if px < (bx - ax) * (py - ay) / (by - ay) + ax:
                    crossings += 1
    return crossings % 2 == 1


class TestEvenOddHoleProperty:
    """Even-odd over [shell, hole] ≡ in-shell AND NOT in-hole — the
    algebraic identity the multi-ring kernel relies on (valid geometry:
    hole strictly inside shell)."""

    @given(pt=POINTS, inner_r=st.floats(0.1, 0.4))
    @settings(max_examples=100, deadline=None)
    def test_annulus_identity(self, pt, inner_r):
        import math as m

        shell = [
            (2.0 * m.cos(a), 2.0 * m.sin(a))
            for a in [i * 2 * m.pi / 8 for i in range(8)]
        ]
        hole = [
            (inner_r * m.cos(a), inner_r * m.sin(a))
            for a in [i * 2 * m.pi / 6 for i in range(6)]
        ]
        px, py = pt
        expected = _py_point_in_ring(px, py, shell) and not _py_point_in_ring(
            px, py, hole
        )
        assert _py_point_in_rings(px, py, [shell, hole]) == expected
