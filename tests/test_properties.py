"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5: the reference has none). Pure-python/numpy
properties: no SparkSession, so these run in milliseconds."""

import numpy as np
from hypothesis import given, settings, strategies as st

from rsgislib_spark.cells import quadcell, s2cell
from rsgislib_spark.functions import crs
from rsgislib_spark.geometry import clip, predicates

lon_st = st.floats(min_value=-180.0, max_value=179.999999,
                   allow_nan=False, allow_infinity=False)
lat_st = st.floats(min_value=-90.0, max_value=89.999999,
                   allow_nan=False, allow_infinity=False)
res_st = st.integers(min_value=0, max_value=15)


@settings(max_examples=200, deadline=None)
@given(lon_st, lat_st, res_st)
def test_cell_contains_its_point(lon, lat, res):
    """Containment up to one rounding ulp at cell boundaries: a point
    within float-epsilon of an edge may land in either neighbour, but
    every implementation (SQL/Column/numpy) lands it in the SAME one
    (asserted exactly in test_cells.test_cell_sql_matches_numpy)."""
    cell = quadcell.cell_np(np.array([lon]), np.array([lat]), res)
    x0, y0, x1, y1 = quadcell.cell_bounds_np(cell)
    assert x0[0] - 1e-9 <= lon < x1[0] + 1e-9
    assert y0[0] - 1e-9 <= lat < y1[0] + 1e-9


@settings(max_examples=200, deadline=None)
@given(lon_st, lat_st, st.integers(1, 15), st.integers(0, 14))
def test_parent_is_ancestor(lon, lat, child_res, parent_res):
    if parent_res >= child_res:
        parent_res = child_res - 1
    child = quadcell.cell_np(np.array([lon]), np.array([lat]), child_res)
    assert quadcell.parent_np(child, parent_res)[0] == \
        quadcell.cell_np(np.array([lon]), np.array([lat]), parent_res)[0]


@settings(max_examples=100, deadline=None)
@given(lon_st, lat_st, st.integers(2, 12), st.integers(1, 3))
def test_kring_symmetric(lon, lat, res, k):
    """b in kring(a, k) <=> a in kring(b, k)."""
    a = quadcell.cell_np(np.array([lon]), np.array([lat]), res)
    ring = quadcell.kring_np(a, k)[0]
    ring = ring[ring >= 0]
    for b in ring[:5]:
        back = quadcell.kring_np(np.array([b]), k)[0]
        assert a[0] in back


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(lon_st, lat_st), min_size=2, max_size=6),
       st.integers(3, 9))
def test_cover_bbox_contains_member_cells(pts, res):
    arr = np.array(pts)
    cover = set(quadcell.cover_bbox(arr[:, 0].min(), arr[:, 1].min(),
                                    arr[:, 0].max(), arr[:, 1].max(),
                                    res).tolist())
    cells = quadcell.cell_np(arr[:, 0], arr[:, 1], res)
    assert set(cells.tolist()) <= cover


@settings(max_examples=150, deadline=None)
@given(lon_st, lat_st)
def test_s2_parent_consistency(lon, lat):
    c12 = s2cell.cell_np(np.array([lon]), np.array([lat]), 12)
    c5 = s2cell.cell_np(np.array([lon]), np.array([lat]), 5)
    assert s2cell.parent_np(c12, 12, 5)[0] == c5[0]


@settings(max_examples=100, deadline=None)
@given(lon_st, st.floats(min_value=-84.9, max_value=84.9, allow_nan=False))
def test_mercator_roundtrip_prop(lon, lat):
    x, y = crs.mercator_np(np.array([lon]), np.array([lat]))
    lon2, lat2 = crs.inv_mercator_np(x, y)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.floats(-50, 50, allow_nan=False),
                          st.floats(-50, 50, allow_nan=False)),
                min_size=3, max_size=8),
       st.floats(-40, 0, allow_nan=False), st.floats(-40, 0, allow_nan=False),
       st.floats(1, 40, allow_nan=False), st.floats(1, 40, allow_nan=False))
def test_clip_never_grows_area(poly, xmin, ymin, w, h):
    # angle-sort around the centroid -> star-shaped, hence simple
    # (Sutherland-Hodgman is defined for simple polygons)
    pts = np.array(poly)
    c = pts.mean(axis=0)
    order = np.argsort(np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0]))
    pts = pts[order]
    ring = np.vstack([pts, pts[:1]])
    full = predicates.shoelace_area([ring])
    clipped = clip.clip_rings_to_bbox([ring], xmin, ymin, xmin + w, ymin + h)
    part = sum(predicates.shoelace_area([c]) for c in clipped)
    assert part <= full + 1e-6
    for c in clipped:
        assert c[:, 0].min() >= xmin - 1e-9 and c[:, 0].max() <= xmin + w + 1e-9
        assert c[:, 1].min() >= ymin - 1e-9 and c[:, 1].max() <= ymin + h + 1e-9


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.floats(-10, 10, allow_nan=False),
                          st.floats(-10, 10, allow_nan=False)),
                min_size=3, max_size=10),
       st.floats(-12, 12, allow_nan=False), st.floats(-12, 12, allow_nan=False))
def test_raycast_agrees_with_winding(poly, px, py):
    """Even-odd ray cast vs an independent winding-number test (they
    agree for points not on the boundary of simple polygons; we allow
    self-intersecting inputs to disagree only where winding > 1).
    Degenerate slivers and on-boundary points are excluded — both
    algorithms are only defined off the boundary."""
    from hypothesis import assume

    ring = np.array(poly + [poly[0]], dtype=np.float64)
    assume(predicates.shoelace_area([ring]) > 1e-6)
    # distance from point to each edge must be meaningful
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        ex, ey = x2 - x1, y2 - y1
        L2 = ex * ex + ey * ey
        t = 0.0 if L2 == 0 else max(0.0, min(1.0, ((px - x1) * ex + (py - y1) * ey) / L2))
        d2 = (px - (x1 + t * ex)) ** 2 + (py - (y1 + t * ey)) ** 2
        assume(d2 > 1e-12)
    got = predicates.point_in_rings(np.array([px]), np.array([py]), [ring])[0]
    # winding number
    wn = 0
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        if y1 <= py:
            if y2 > py and (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) > 0:
                wn += 1
        elif y2 <= py and (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) < 0:
            wn -= 1
    if abs(wn) <= 1:
        assert got == (wn != 0)
