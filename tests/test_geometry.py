"""Unit tests for the pure-numpy geometry kernel.

Mirrors the reference's data-model suites (STObjectTest.scala — parity
noted per test) plus hypothesis property tests pitting the vectorized
point-in-polygon kernel against a slow scalar reference.
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from stark_spark.core import geometry as G


def test_wkt_roundtrip_point():
    g = G.from_wkt("POINT (1.5 -2.25)")
    assert g.kind == "POINT"
    assert G.from_wkt(G.to_wkt(g)) == g


def test_wkt_roundtrip_polygon_with_hole():
    wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
    g = G.from_wkt(wkt)
    assert g.kind == "POLYGON" and len(g.coords) == 2
    assert G.from_wkb(G.to_wkb(g)) == g


def test_wkt_multipolygon():
    wkt = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))"
    g = G.from_wkt(wkt)
    assert g.kind == "MULTIPOLYGON" and len(g.coords) == 2
    assert G.from_wkb(G.to_wkb(g)).kind == "MULTIPOLYGON"


def test_wkb_point_vectorized_decode():
    pts = [G.point(i, -i) for i in range(100)]
    xs, ys = G.decode_points([G.to_wkb(p) for p in pts])
    assert np.allclose(xs, np.arange(100))
    assert np.allclose(ys, -np.arange(100))


def test_box_is_rectangle():
    assert G.box(0, 0, 5, 5).is_rectangle()
    tri = G.from_wkt("POLYGON ((0 0, 5 0, 5 5, 0 0))")
    assert not tri.is_rectangle()


# --- predicates: parity with STObjectTest.scala expectations -----------------

def test_point_in_polygon_basic():
    poly = G.box(0, 0, 10, 10)
    # interior / boundary / exterior
    assert G.covers(poly, G.point(5, 5))
    assert G.covers(poly, G.point(0, 5))      # boundary covered
    assert not G.contains(poly, G.point(0, 5))  # but not contained (OGC)
    assert G.contains(poly, G.point(5, 5))
    assert not G.covers(poly, G.point(-1, 5))


def test_polygon_hole_semantics():
    g = G.from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    assert not G.covers(g, G.point(3, 3))    # inside the hole
    assert G.covers(g, G.point(2, 3))        # on hole boundary = covered
    assert G.covers(g, G.point(5, 5))


def test_polygon_polygon_predicates():
    a = G.box(0, 0, 10, 10)
    b = G.box(2, 2, 4, 4)
    c = G.box(8, 8, 12, 12)
    d = G.box(20, 20, 30, 30)
    assert G.contains(a, b) and G.covers(a, b)
    assert G.intersects(a, c) and not G.contains(a, c)
    assert not G.intersects(a, d)
    # shared-edge box: covered but not contained? OGC: contains holds if an
    # interior point is shared — a box on the edge sharing interior → contains.
    e = G.box(0, 0, 5, 5)
    assert G.covers(a, e) and G.contains(a, e)


def test_linestring_predicates():
    ls = G.from_wkt("LINESTRING (0 0, 10 10)")
    poly = G.box(0, 0, 10, 10)
    assert G.intersects(ls, poly)
    assert G.covers(poly, ls)
    crossing = G.from_wkt("LINESTRING (-5 5, 15 5)")
    assert G.intersects(crossing, poly)
    assert not G.covers(poly, crossing)


def test_distance():
    assert G.distance(G.point(0, 0), G.point(3, 4)) == pytest.approx(5.0)
    poly = G.box(0, 0, 10, 10)
    assert G.distance(poly, G.point(5, 5)) == 0.0
    assert G.distance(poly, G.point(13, 10)) == pytest.approx(3.0)
    ls = G.from_wkt("LINESTRING (0 0, 10 0)")
    assert G.distance(ls, G.point(5, 2)) == pytest.approx(2.0)


def test_points_dist_vectorized_matches_scalar():
    poly = G.from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    xs = np.array([2.0, 5.0, -3.0])
    ys = np.array([2.0, 0.0, 0.0])
    d = G.points_dist_to_geom(xs, ys, poly)
    assert d[0] == 0.0 and d[1] == pytest.approx(1.0) and d[2] == pytest.approx(3.0)


# --- hypothesis: vectorized PIP vs slow winding reference --------------------

def _slow_pip(px, py, ring) -> bool:
    """Even-odd scalar ray cast (textbook)."""
    inside = False
    for i in range(len(ring) - 1):
        ax, ay = ring[i]
        bx, by = ring[i + 1]
        if (ay > py) != (by > py):
            xint = ax + (py - ay) * (bx - ax) / (by - ay)
            if px < xint:
                inside = not inside
    return inside


@settings(max_examples=200, deadline=None)
@given(
    px=st.floats(-15, 15), py=st.floats(-15, 15),
    cx=st.floats(-5, 5), cy=st.floats(-5, 5),
    r=st.floats(1, 8), n=st.integers(3, 12),
)
def test_pip_property(px, py, cx, cy, r, n):
    ang = np.linspace(0, 2 * math.pi, n, endpoint=False)
    ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    ring = np.vstack([ring, ring[0]])
    poly = G.Geometry("POLYGON", [ring])
    got = G.points_in_polygon(np.array([px]), np.array([py]), poly)[0]
    want = _slow_pip(px, py, ring)
    # boundary-epsilon cases may differ legitimately; skip points very close
    # to the ring
    d = G.points_dist_to_geom(np.array([px]), np.array([py]),
                              G.Geometry("LINESTRING", ring))[0]
    if d > 1e-6:
        assert bool(got) == bool(want)


@settings(max_examples=100, deadline=None)
@given(
    xmin=st.floats(-10, 0), ymin=st.floats(-10, 0),
    w=st.floats(0.5, 10), h=st.floats(0.5, 10),
    px=st.floats(-12, 12), py=st.floats(-12, 12),
)
def test_box_cover_matches_arithmetic(xmin, ymin, w, h, px, py):
    b = G.box(xmin, ymin, xmin + w, ymin + h)
    want = (xmin <= px <= xmin + w) and (ymin <= py <= ymin + h)
    assert G.covers(b, G.point(px, py)) == want


def test_hausdorff_to(spark):
    """Directed Hausdorff (Distance.scala:139-167): max over row
    vertices of min distance to the query."""
    from stark_spark.functions.constructors import st_frame
    from stark_spark.functions.distance import hausdorff_to
    rows = [
        (1, "POINT (3 4)"),                        # plain distance: 5
        (2, "LINESTRING (3 4, 6 8)"),              # farthest vertex: 10
        (3, "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))"),  # farthest corner (2,1)
    ]
    df = st_frame(spark.createDataFrame(rows, "id int, wkt string"), wkt="wkt")
    got = {r.id: r.d for r in
           df.select("id", hausdorff_to("POINT (0 0)").alias("d")).collect()}
    assert abs(got[1] - 5.0) < 1e-12
    assert abs(got[2] - 10.0) < 1e-12
    assert abs(got[3] - (5 ** 0.5)) < 1e-12


# --- Z coordinates (STObject.scala:95-100, 247-248) --------------------------

def test_z_point_roundtrip():
    g = G.from_wkt("POINT Z (1.5 -2.25 7.125)")
    assert g.z == 7.125
    assert g.zrange == (7.125, 7.125)
    assert g.bbox == (1.5, -2.25, 1.5, -2.25)      # bbox stays planar
    assert G.to_wkt(g) == "POINT Z (1.5 -2.25 7.125)"
    back = G.from_wkb(G.to_wkb(g))
    assert back.z == 7.125 and back == g
    # bare 3-coord form (JTS writes without the Z marker)
    assert G.from_wkt("POINT (1.5 -2.25 7.125)").z == 7.125


def test_z_linestring_polygon_roundtrip():
    ls = G.from_wkt("LINESTRING Z (0 0 1, 2 0 3, 2 2 -1)")
    assert ls.zrange == (-1.0, 3.0)
    assert G.from_wkb(G.to_wkb(ls)) == ls
    pg = G.from_wkt("POLYGON Z ((0 0 5, 4 0 6, 4 4 7, 0 0 5))")
    assert pg.zrange == (5.0, 7.0)
    back = G.from_wkb(G.to_wkb(pg))
    assert back.zrange == (5.0, 7.0)
    # planar predicates ignore z (reference: JTS is 2-D for ops)
    assert G.intersects(pg, G.point(1.0, 0.5))
    assert G.from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))").zrange is None


def test_z_2d_geoms_unaffected():
    g2 = G.from_wkt("POINT (1 2)")
    assert g2.z is None and g2.zrange is None
    assert len(G.to_wkb(g2)) == 21


@given(st.floats(-1e6, 1e6), st.floats(-1e6, 1e6),
       st.floats(-1e6, 1e6))
@settings(max_examples=50, deadline=None)
def test_z_point_wkb_property(x, y, z):
    g = G.point(x, y, z)
    back = G.from_wkb(G.to_wkb(g))
    assert back.coords[0] == x and back.coords[1] == y and back.z == z
    assert back.zrange == (z, z)


# --- convex_ring (native half-plane compile eligibility) ---------------------

@given(st.integers(5, 12), st.floats(1.0, 100.0), st.integers(0, 10**6))
@settings(max_examples=40, deadline=None)
def test_convex_ring_detects_convex(n, radius, seed):
    """Random convex polygons (points on a circle, sorted by angle) are
    detected; the returned ring is CCW and PIP agrees with membership."""
    rng = np.random.RandomState(seed)
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    if np.min(np.diff(angles)) < 1e-3:
        return
    xs = 50 + radius * np.cos(angles)
    ys = 50 + radius * np.sin(angles)
    wkt = "POLYGON ((" + ", ".join(
        f"{x:.9f} {y:.9f}" for x, y in zip(xs, ys))
    wkt += f", {xs[0]:.9f} {ys[0]:.9f}))"
    g = G.from_wkt(wkt)
    ring = g.convex_ring()
    assert ring is not None
    # CCW: positive shoelace area
    a, b = ring[:-1], ring[1:]
    assert np.sum(a[:, 0] * b[:, 1] - b[:, 0] * a[:, 1]) > 0
    # centroid is inside per the half-plane test
    cx, cy = xs.mean(), ys.mean()
    cross = ((b[:, 0] - a[:, 0]) * (cy - a[:, 1]) -
             (b[:, 1] - a[:, 1]) * (cx - a[:, 0]))
    assert (cross >= 0).all()


def test_convex_ring_rejects_concave_and_holes():
    concave = G.from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 5 2, 0 10, 0 0))")
    assert concave.convex_ring() is None
    holed = G.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                       "(2 2, 4 2, 4 4, 2 4, 2 2))")
    assert holed.convex_ring() is None
    # clockwise input ring gets reoriented, still detected
    cw = G.from_wkt("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))")
    assert cw.convex_ring() is not None
