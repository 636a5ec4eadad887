"""Property-based tests (Hypothesis) — SURVEY §5's addition over the
reference's example-based suite.

Covered algebra: the §1.2 both-or-neither ST conjunction (encoded once
in `core/temporal.py`, verified here against a direct python oracle of
`STObject.scala:15-22` + `Interval.scala:32-44`), WKT/WKB codec
roundtrips, and point-in-polygon vs the covers/contains kernels.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from stark_spark.core import geometry as G

INF = 2 ** 62


# ------------------------------------------------------- §1.2 algebra

def _py_intersects(ls, le, rs, re):
    le = INF if le is None else le
    re = INF if re is None else re
    return ls <= re and rs <= le


def _py_contains(ls, le, rs, re):
    le = INF if le is None else le
    return re is not None and ls <= rs and re <= le


def _py_rule(spatial_ok, pred, ls, le, rs, re):
    """STObject.scala:15-22: spatial AND (both undefined OR both
    defined AND temporal)."""
    if ls is None and rs is None:
        return spatial_ok
    if ls is None or rs is None:
        return False
    t = {"intersects": _py_intersects,
         "contains": _py_contains,
         "containedby": lambda a, b, c, d: _py_contains(c, d, a, b),
         "covers": _py_contains,
         "coveredby": lambda a, b, c, d: _py_contains(c, d, a, b)}[pred]
    return spatial_ok and t(ls, le, rs, re)


_time = st.one_of(st.none(), st.integers(0, 1000))


@st.composite
def _interval(draw):
    s = draw(_time)
    if s is None:
        return (None, None)
    e = draw(st.one_of(st.none(), st.integers(s, 1200)))
    return (s, e)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(_interval(), _interval(), st.booleans()),
                min_size=1, max_size=60),
       st.sampled_from(["intersects", "contains", "containedby",
                        "covers", "coveredby"]))
def test_st_conjunction_matches_python_rule(spark, cases, pred):
    from pyspark.sql import functions as F
    from stark_spark.core.temporal import st_conjunction

    rows = [(i, ls, le, rs, re, sp)
            for i, ((ls, le), (rs, re), sp) in enumerate(cases)]
    df = spark.createDataFrame(
        rows, "i int, ls long, le long, rs long, re long, sp boolean")
    got = {r.i: r.v for r in df.select("i", st_conjunction(
        F.col("sp"), pred, F.col("ls"), F.col("le"),
        F.col("rs"), F.col("re")).alias("v")).collect()}
    for i, ls, le, rs, re, sp in rows:
        assert got[i] == _py_rule(sp, pred, ls, le, rs, re), \
            (i, ls, le, rs, re, sp, pred)


# --------------------------------------------------------- codec props

_coord = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(_coord, _coord)
def test_point_wkb_roundtrip(x, y):
    g = G.point(x, y)
    g2 = G.from_wkb(G.to_wkb(g))
    assert g2.kind == "POINT"
    assert g2.coords[0] == x and g2.coords[1] == y


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_coord, _coord), min_size=3, max_size=12))
def test_polygon_wkt_wkb_roundtrip(pts):
    wkt = ("POLYGON ((" +
           ", ".join(f"{x!r} {y!r}" for x, y in pts + pts[:1]) + "))")
    g = G.from_wkt(wkt)
    g2 = G.from_wkb(G.to_wkb(g))
    assert g2.kind == "POLYGON"
    assert np.allclose(g2.coords[0], g.coords[0], rtol=0, atol=0)


@settings(max_examples=100, deadline=None)
@given(_coord, _coord,
       st.floats(1e-3, 100, allow_nan=False),
       st.floats(1e-3, 100, allow_nan=False),
       _coord, _coord)
def test_rect_pip_matches_covers(x0, y0, w, h, px, py):
    rect = G.box(x0, y0, x0 + w, y0 + h)
    pt = G.point(px, py)
    pip = bool(G.points_in_polygon(np.array([px]), np.array([py]),
                                   rect, boundary=True)[0])
    assert pip == G.covers(rect, pt)
    pip_strict = bool(G.points_in_polygon(np.array([px]), np.array([py]),
                                          rect, boundary=False)[0])
    assert pip_strict == G.contains(rect, pt)

# ------------------------------------------------- JPEG codec properties

from hypothesis import given, settings
from hypothesis import strategies as hst


@settings(max_examples=20, deadline=None)
@given(hst.integers(9, 40), hst.integers(9, 40), hst.integers(0, 2 ** 31 - 1))
def test_jpeg_roundtrip_bounded_error(h, w, seed):
    """Any smooth-ish gray image round-trips through the in-repo
    baseline JPEG encoder+decoder with bounded error; dims (incl.
    non-multiples of 8) are preserved exactly."""
    import numpy as np

    from stark_spark.functions.visualize import _jpeg_decode, _jpeg_encode
    rng = np.random.RandomState(seed)
    # low-frequency content: random corners, bilinear interior
    corners = rng.randint(0, 256, (2, 2)).astype(np.float64)
    yy = np.linspace(0, 1, h)[:, None]
    xx = np.linspace(0, 1, w)[None, :]
    img = ((1 - yy) * ((1 - xx) * corners[0, 0] + xx * corners[0, 1]) +
           yy * ((1 - xx) * corners[1, 0] + xx * corners[1, 1]))
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    dec = _jpeg_decode(_jpeg_encode(img))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    # quantization error bound for the Annex-K table on smooth content
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12
