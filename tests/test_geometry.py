"""WKB + PIP kernel tests (analytic polygons: convex, concave, holes)."""

import numpy as np

from gjspark.functions import geometry as G

SHELL = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
HOLE = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
CONCAVE = np.array([[0, 0], [10, 0], [10, 10], [5, 5], [0, 10], [0, 0]], float)


def test_wkb_roundtrip():
    wkb = G.polygon_wkb([SHELL, HOLE])
    t, rings = G.parse_wkb(wkb)
    assert t == "Polygon"
    assert len(rings) == 2
    assert (rings[0] == SHELL).all() and (rings[1] == HOLE).all()

    mp = G.multipolygon_wkb([[SHELL], [CONCAVE + 20]])
    t2, polys = G.parse_wkb(mp)
    assert t2 == "MultiPolygon" and len(polys) == 2

    pt = G.point_wkb(1.5, -2.5)
    t3, xy = G.parse_wkb(pt)
    assert t3 == "Point" and xy == (1.5, -2.5)


def test_pip_square_with_hole():
    ps = G.PolygonSet(["sq"], [G.polygon_wkb([SHELL, HOLE])])
    px = np.array([5.0, 2.0, 11.0, 5.0, -1.0])
    py = np.array([5.0, 2.0, 5.0, 9.0, 5.0])
    m = ps.contains(px, py)[0]
    assert m.tolist() == [False, True, False, True, False]


def test_pip_concave():
    ps = G.PolygonSet(["cc"], [G.polygon_wkb([CONCAVE])])
    px = np.array([5.0, 0.5, 9.5, 5.0])
    py = np.array([2.0, 9.0, 9.0, 8.0])
    m = ps.contains(px, py)[0]
    # (5,8) is inside the notch -> outside the polygon
    assert m.tolist() == [True, True, True, False]


def test_pip_multipolygon_and_pairs():
    ps = G.PolygonSet(
        ["a", "b"],
        [G.polygon_wkb([SHELL]), G.multipolygon_wkb([[SHELL + 20], [CONCAVE + 50]])],
    )
    px = np.array([5.0, 25.0, 52.0, 200.0])
    py = np.array([5.0, 25.0, 51.0, 200.0])
    pt, po = ps.match_points(px, py)
    pairs = set(zip(pt.tolist(), po.tolist()))
    assert pairs == {(0, 0), (1, 1), (2, 1)}


def test_haversine():
    d = G.haversine_m(52.52, 13.405, 48.8566, 2.3522)
    assert abs(d / 1000 - 878) < 2
    assert G.haversine_m(10.0, 20.0, 10.0, 20.0) == 0.0
