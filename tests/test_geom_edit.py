"""Geometry edits: simplify (Douglas-Peucker), buffer (Minkowski
k-gon disk via scanline union), explode, drop_holes, dissolve."""

import numpy as np
import pytest

from rsgislib_spark.geometry import edit, wkb
from rsgislib_spark.geometry.overlay import polygons_area


def closed(pts):
    a = np.asarray(pts, float)
    return np.vstack([a, a[:1]])


# ------------------------------------------------------------ simplify

def test_dp_removes_collinear_keeps_corners():
    # staircase-free square with redundant midpoints on each edge
    ring = closed([[0, 0], [5, 0], [10, 0], [10, 5], [10, 10],
                   [5, 10], [0, 10], [0, 5]])
    s = edit.simplify_ring(ring, tol=0.5)
    assert {tuple(p) for p in s[:-1]} == {(0, 0), (10, 0), (10, 10), (0, 10)}


def test_dp_respects_tolerance():
    # a bump of height 2 survives tol=1, dies at tol=3
    ring = closed([[0, 0], [5, 2], [10, 0], [10, 10], [0, 10]])
    keep = edit.simplify_ring(ring, tol=1.0)
    assert any((p == [5, 2]).all() for p in keep)
    drop = edit.simplify_ring(ring, tol=3.0)
    assert not any((p == [5, 2]).all() for p in drop)


def test_dp_max_deviation_bound():
    rng = np.random.default_rng(7)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 60))
    rad = 10.0 + rng.uniform(-0.5, 0.5, 60)
    ring = closed(np.column_stack([rad * np.cos(ang), rad * np.sin(ang)]))
    tol = 1.0
    s = edit.simplify_ring(ring, tol)
    # every original vertex is within tol of the simplified boundary
    sv = s[:-1]
    for p in ring[:-1]:
        d = np.inf
        for i in range(len(sv)):
            a, b = sv[i], sv[(i + 1) % len(sv)]
            ab = b - a
            L2 = ab @ ab
            t = 0.0 if L2 == 0 else np.clip((p - a) @ ab / L2, 0, 1)
            d = min(d, np.hypot(*(p - (a + t * ab))))
        assert d <= tol + 1e-9


# -------------------------------------------------------------- buffer

def test_buffer_square_area_bounds():
    sq = [closed([[0, 0], [10, 0], [10, 10], [0, 10]])]
    r, k = 2.0, 32
    pieces, area = edit.buffer_polygon(sq, r, k=k)
    # Minkowski: area = A + perim*r + (disk area); k-gon disk is
    # inscribed in the true disk
    kgon_disk = 0.5 * k * r * r * np.sin(2 * np.pi / k)
    lo = 100 + 40 * r + kgon_disk - 1e-9
    hi = 100 + 40 * r + np.pi * r * r + 1e-9
    assert lo <= area <= hi
    assert sum(abs(edit.boolean.ring_signed_area(p)) for p in pieces) == \
        pytest.approx(area, abs=1e-9)


def test_buffer_contains_original():
    tri = [closed([[0, 0], [8, 0], [4, 6]])]
    _, area = edit.buffer_polygon(tri, 1.0, k=16)
    assert area > polygons_area([tri])


# ------------------------------------------------- spark-side operators

def _wkb_layer(spark, rows):
    return spark.createDataFrame(rows, "gid BIGINT, geometry BINARY")


def test_explode_and_drop_holes(spark):
    from rsgislib_spark.operators import vector_geom

    donut = wkb.polygon_to_wkb([
        closed([[0, 0], [10, 0], [10, 10], [0, 10]]),
        closed([[4, 4], [6, 4], [6, 6], [4, 6]]),
    ])
    multi = wkb.multipolygon_to_wkb([
        [closed([[0, 0], [1, 0], [1, 1], [0, 1]])],
        [closed([[5, 5], [7, 5], [7, 7], [5, 7]])],
    ])
    df = _wkb_layer(spark, [(1, donut), (2, multi)])
    parts = vector_geom.explode_multipolygon(df).collect()
    by_gid = {}
    for r in parts:
        by_gid.setdefault(r.gid, []).append(r.part_id)
    assert sorted(by_gid[1]) == [0] and sorted(by_gid[2]) == [0, 1]

    fixed = {r.gid: bytes(r.geometry)
             for r in vector_geom.drop_holes(df).collect()}
    assert polygons_area(wkb.wkb_to_polygons(fixed[1])) == 100.0  # hole gone


def test_spark_simplify_and_buffer(spark):
    from rsgislib_spark.operators import vector_geom

    noisy = wkb.polygon_to_wkb([closed(
        [[0, 0], [5, 0.1], [10, 0], [10, 10], [5, 9.9], [0, 10]])])
    df = _wkb_layer(spark, [(1, noisy)])
    simp = vector_geom.simplify(df, tol=0.5).collect()[0]
    assert len(wkb.wkb_to_rings(bytes(simp.geometry))[0]) == 5  # square+close

    buf = vector_geom.buffer_polygons(df, dist=1.0).collect()[0]
    assert buf.buf_area > 100.0


def test_spark_dissolve_overlap_counted_once(spark):
    from rsgislib_spark.operators import vector_geom

    r1 = wkb.polygon_to_wkb([closed([[0, 0], [10, 0], [10, 10], [0, 10]])])
    r2 = wkb.polygon_to_wkb([closed([[5, 0], [15, 0], [15, 10], [5, 10]])])
    r3 = wkb.polygon_to_wkb([closed([[20, 20], [22, 20], [22, 22], [20, 22]])])
    df = spark.createDataFrame(
        [(7, r1), (7, r2), (9, r3)], "grp BIGINT, geometry BINARY")
    got = {r.grp: r.area
           for r in vector_geom.dissolve(df, by="grp").collect()}
    assert got == {7: 150.0, 9: 4.0}


def test_alpha_shape_core_properties():
    from rsgislib_spark.geometry.delaunay import alpha_shape as ash

    g = np.array([[x, y] for x in range(5) for y in range(5)], float)
    assert ash(g, 0)[1] == 16.0            # convex hull of the grid
    assert ash(g, 1 / 0.8)[1] == 16.0      # unit triangles all kept
    # two distant clusters: tight alpha keeps only intra-cluster area
    c1 = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], float)
    both = np.vstack([c1, c1 + 100.0])
    assert ash(both, 1 / 0.8)[1] == 2.0
    assert ash(both, 0)[1] > 100.0         # hull spans the gap


def test_alpha_shape_spark_groups(spark):
    from rsgislib_spark.operators import vector_geom

    rows = []
    for gid, off in [(1, 0.0), (2, 50.0)]:
        for x in range(4):
            for y in range(4):
                rows.append((gid, off + x, off + y))
    df = spark.createDataFrame(rows, "gid BIGINT, lon DOUBLE, lat DOUBLE")
    out = {r.gid: r.area for r in
           vector_geom.alpha_shape(df, by="gid", alpha=1 / 0.8).collect()}
    assert out == {1: 9.0, 2: 9.0}  # 3x3 unit squares each
