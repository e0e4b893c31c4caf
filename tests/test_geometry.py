"""Geometry unit tests: WKB roundtrip + ray-cast vs an independent
scalar oracle + the SQL generator (duckdb)."""

import duckdb
import numpy as np

from rsgislib_spark.data import fixtures
from rsgislib_spark.geometry import predicates, wkb

rng = np.random.default_rng(7)


def scalar_pip(x, y, rings):
    """Independent scalar even-odd implementation (different control
    flow than the vectorized one)."""
    inside = False
    for ring in rings:
        n = len(ring)
        for i in range(n - 1):
            x1, y1 = ring[i]
            x2, y2 = ring[i + 1]
            if (y1 > y) != (y2 > y):
                xint = (x2 - x1) * (y - y1) / (y2 - y1) + x1
                if x < xint:
                    inside = not inside
    return inside


def test_wkb_point_roundtrip():
    b = wkb.point_to_wkb(12.5, -33.25)
    assert wkb.wkb_to_point(b) == (12.5, -33.25)


def test_wkb_polygon_roundtrip():
    rings = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]),
             np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]])]
    back = wkb.wkb_to_rings(wkb.polygon_to_wkb(rings))
    assert len(back) == 2
    assert np.allclose(back[0], rings[0]) and np.allclose(back[1], rings[1])


def test_wkb_multipolygon_roundtrip():
    polys = [[np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])],
             [np.array([[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]])]]
    back = wkb.wkb_to_rings(wkb.multipolygon_to_wkb(polys))
    assert len(back) == 2


def test_point_in_rings_matches_scalar_oracle():
    for poly in fixtures.POLYGONS:
        rings = fixtures.poly_rings(poly)
        bb = predicates.ring_bbox(rings)
        px = rng.uniform(bb[0] - 5, bb[2] + 5, 300)
        py = rng.uniform(bb[1] - 5, bb[3] + 5, 300)
        got = predicates.point_in_rings(px, py, rings)
        want = np.array([scalar_pip(x, y, rings) for x, y in zip(px, py)])
        assert np.array_equal(got, want), poly["name"]


def test_raycast_sql_matches_numpy():
    con = duckdb.connect()
    for poly in fixtures.POLYGONS[:6]:
        rings = fixtures.poly_rings(poly)
        bb = predicates.ring_bbox(rings)
        px = rng.uniform(bb[0] - 2, bb[2] + 2, 100)
        py = rng.uniform(bb[1] - 2, bb[3] + 2, 100)
        con.execute("CREATE OR REPLACE TABLE t AS SELECT * FROM (VALUES "
                    + ",".join(f"({x!r}, {y!r})" for x, y in zip(px.tolist(), py.tolist()))
                    + ") v(x, y)")
        got = np.array([r[0] for r in con.execute(
            f"SELECT {predicates.raycast_sql('x', 'y', rings)} FROM t").fetchall()])
        want = predicates.point_in_rings(px, py, rings)
        assert np.array_equal(got, want), poly["name"]


def test_hole_excluded():
    atoll = next(p for p in fixtures.POLYGONS if p["name"] == "atoll")
    rings = fixtures.poly_rings(atoll)
    # center of the hole is outside; shell ring area inside
    assert not predicates.point_in_rings(np.array([140.0]), np.array([-30.0]), rings)[0]
    assert predicates.point_in_rings(np.array([125.0]), np.array([-40.0]), rings)[0]


def test_antimeridian_unwrap_containment():
    dateline = next(p for p in fixtures.POLYGONS if p["name"] == "dateline")
    rings = fixtures.poly_rings(dateline)  # unwrapped: 170..185
    assert fixtures.poly_is_unwrapped(dateline)
    px = np.array([179.0, -179.0, -170.0, 160.0])
    px_adj = np.where(px < 0, px + 360.0, px)
    py = np.array([0.0, 0.0, 0.0, 0.0])
    got = predicates.point_in_rings(px_adj, py, rings)
    assert got.tolist() == [True, True, False, False]


def test_area_and_length():
    sq = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])]
    assert predicates.shoelace_area(sq) == 16.0
    assert predicates.ring_length(sq) == 16.0
    cx, cy = predicates.centroid(sq)
    assert (cx, cy) == (2.0, 2.0)


def test_haversine_known_value():
    # 1 degree of longitude at the equator ~ 111.19 km
    d = predicates.haversine_m(0.0, 0.0, 1.0, 0.0)
    assert abs(d - 111195) < 100
