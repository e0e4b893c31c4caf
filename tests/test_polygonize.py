"""polygonise_raster_to_vec_lyr: boundary tracer + Spark operator."""

import numpy as np
import pytest

from rsgislib_spark.geometry import wkb
from rsgislib_spark.operators.polygonize import (
    _shoelace_signed, polygonize, trace_pixel_boundary,
)


def test_tracer_donut_has_hole_ring():
    xs, ys = zip(*[(x, y) for y in range(3) for x in range(3)
                   if (x, y) != (1, 1)])
    rings = trace_pixel_boundary(np.array(xs), np.array(ys))
    areas = sorted(_shoelace_signed(r) for r in rings)
    assert len(rings) == 2
    assert areas == [-9.0, 1.0]  # outer negative, hole positive


def test_tracer_pinch_stays_simple():
    # L-shaped 4-connected clump with a pinch vertex: one simple ring
    rings = trace_pixel_boundary(np.array([0, 0, 1]), np.array([0, 1, 1]))
    assert len(rings) == 1
    ring = rings[0][:-1]
    assert len(np.unique(ring, axis=0)) == len(ring)  # no repeated vertex


def _grid_from_mat(spark, V):
    rows = [(int(x), int(y), 1, float(V[y, x]))
            for y in range(V.shape[0]) for x in range(V.shape[1])]
    return spark.createDataFrame(
        rows, "x BIGINT, y BIGINT, band INT, value DOUBLE")


def test_polygonize_area_equals_pixel_count(spark):
    rng = np.random.default_rng(3)
    V = rng.integers(0, 3, size=(40, 40)).astype(float)
    grid = _grid_from_mat(spark, V)
    out = polygonize(grid, tile=16).collect()
    # per-component area == component pixel count; totals match
    assert sum(r.area for r in out) == 1600.0
    # every geometry decodes and its shoelace matches the area column
    for r in out[:50]:
        rings = wkb.wkb_to_rings(bytes(r.geometry))
        a = abs(_shoelace_signed(rings[0])) - sum(
            abs(_shoelace_signed(h)) for h in rings[1:])
        assert a == pytest.approx(r.area)


def test_polygonize_tiling_invariance(spark):
    rng = np.random.default_rng(9)
    V = rng.integers(0, 2, size=(30, 30)).astype(float)
    grid = _grid_from_mat(spark, V)
    a = {(r.clump_id): (r.value, r.area, r.n_rings)
         for r in polygonize(grid, tile=8).collect()}
    b = {(r.clump_id): (r.value, r.area, r.n_rings)
         for r in polygonize(grid, tile=64).collect()}
    assert a == b


def test_polygonize_hole_in_component(spark):
    # 5x5 block of value 1 with a center pixel of value 0
    V = np.zeros((7, 7))
    V[1:6, 1:6] = 1.0
    V[3, 3] = 0.0
    grid = _grid_from_mat(spark, V)
    rows = polygonize(grid, tile=4).collect()
    ring_poly = [r for r in rows if r.value == 1.0][0]
    assert ring_poly.n_rings == 2 and ring_poly.area == 24.0
    zero_areas = sorted(r.area for r in rows if r.value == 0.0)
    assert zero_areas == [1.0, 24.0]  # enclosed pixel + background


def test_image_footprint_holes(spark):
    from rsgislib_spark.operators.polygonize import image_footprint

    # 8x8 valid raster with a 2x2 no-data block inside
    rows = []
    for y in range(8):
        for x in range(8):
            v = -99.0 if (3 <= x <= 4 and 3 <= y <= 4) else float(x)
            rows.append((x, y, 1, v))
    grid = spark.createDataFrame(
        rows, "x BIGINT, y BIGINT, band INT, value DOUBLE")
    out = image_footprint(grid, no_data=-99.0).collect()
    assert len(out) == 1
    fp = out[0]
    assert fp.area == 60.0 and fp.n_rings == 2  # 64 - 4, hole ring
