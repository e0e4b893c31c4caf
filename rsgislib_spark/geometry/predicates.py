"""Vectorized geometry predicates & measures (pure numpy) + the SQL
generator for the ray-cast test.

The exact point-in-polygon refinement after the coarse cell join is
the engine's core custom logic (SURVEY.md §4: the reference's
filter-refine pattern, e.g. does_vmsk_img_intersect bbox gate at
python/rsgislib/vectorutils/__init__.py:2197-2246, then exact GEOS).
We use the classic even-odd ray cast (public algorithm, PNPOLY): a
point is inside iff a ray to +inf in x crosses the boundary an odd
number of times. Holes need no special casing — crossing a hole edge
flips parity back out.

CRITICAL INVARIANT: ``_CROSS_SQL`` and ``point_in_rings`` implement
the *identical* IEEE-754 expression, so a Spark pandas-UDF refine and
a DuckDB CASE-WHEN oracle agree bit-for-bit:

    crosses(edge (x1,y1)-(x2,y2), point (x,y)) =
        ((y1 > y) != (y2 > y)) AND (x < (x2-x1) * (y-y1) / (y2-y1) + x1)
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371008.8  # IUGG mean radius (public constant)


# ---------------------------------------------------------------- ray cast

EDGE_CHUNK = 512  # bounds the points x edges broadcast to ~32 MB/batch


def point_in_rings(px: np.ndarray, py: np.ndarray, rings: list) -> np.ndarray:
    """Even-odd point-in-polygon for arrays of points vs one polygon.

    rings: list of (k,2) float64 arrays (shell + holes, closed).
    Returns bool array. Boundary semantics follow the half-open rule
    of the crossing formula (matches the SQL oracle exactly).

    Edges are processed in EDGE_CHUNK blocks so a 100k-vertex coastline
    polygon never materializes a points x edges matrix beyond ~32 MB —
    memory-bounded regardless of Arrow batch size or polygon
    complexity (the 100 TB posture).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    crossings = np.zeros(px.shape, dtype=np.int64)
    pyb = py[:, None]
    pxb = px[:, None]
    for ring in rings:
        for s in range(0, len(ring) - 1, EDGE_CHUNK):
            e = min(s + EDGE_CHUNK, len(ring) - 1)
            x1, y1 = ring[s:e, 0], ring[s:e, 1]
            x2, y2 = ring[s + 1:e + 1, 0], ring[s + 1:e + 1, 1]
            cond = (y1 > pyb) != (y2 > pyb)
            # over: a near-horizontal edge's intercept can overflow to
            # +/-inf; pxb < inf is the correct limit (crossing counted)
            with np.errstate(divide="ignore", invalid="ignore",
                             over="ignore"):
                xs = (x2 - x1) * (pyb - y1) / (y2 - y1) + x1
            crossings += np.sum(cond & (pxb < xs), axis=1)
    return (crossings % 2) == 1


def raycast_sql(x: str, y: str, rings: list) -> str:
    """DuckDB/Spark-SQL boolean expression: point ({x},{y}) inside the
    literal polygon ``rings`` under the identical crossing formula.

    Emits value-exact simplifications of the canonical per-edge term —
    essential for the codegen refine path, where expression size is a
    real performance cliff (HotSpot refuses to JIT methods past
    ~8 KB bytecode, so a bloated join condition runs INTERPRETED):

    - horizontal edges (y1 == y2): ``(y1 > y) <> (y2 > y)`` is
      identically false — the edge contributes 0 crossings; omitted.
    - vertical edges (x1 == x2): the intercept
      ``0.0*(y-y1)/(y2-y1) + x1`` IEEE-evaluates to exactly ``x1``
      for every finite y (±0.0 + x1 == x1 up to the sign of zero,
      which ``<`` cannot observe; non-finite y fails the crossing
      test first under short-circuit AND) — emitted as ``x < x1``.
    - dx, dy are folded in Python (the same IEEE subtraction both
      engines would constant-fold).

    All three leave every crossing decision bit-identical to
    ``point_in_rings`` and to the long form, so oracles generated
    from this function stay exact across engines.
    """
    terms = []
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        edges = [(x1, y1, x2, y2) for (x1, y1), (x2, y2)
                 in zip(ring[:-1].tolist(), ring[1:].tolist())
                 if y1 != y2]  # horizontal edges never cross the ray
        # axis-aligned rectangle ring: exactly two vertical edges over
        # the same (unordered) y-span. Their crossing terms are both
        # gated by lat ∈ [ymin, ymax) and differ only in ``x < xi``,
        # so the pair sums to 1 (odd) iff xlo <= x < xhi — ONE range
        # term replaces two crossing terms, value-exact (pure literal
        # comparisons, no arithmetic). Holes compose through parity
        # as before.
        if (len(edges) == 2
                and edges[0][0] == edges[0][2] and edges[1][0] == edges[1][2]
                and {edges[0][1], edges[0][3]} == {edges[1][1], edges[1][3]}):
            ylo, yhi = sorted((edges[0][1], edges[0][3]))
            xlo, xhi = sorted((edges[0][0], edges[1][0]))
            terms.append(
                f"(CASE WHEN ({y} >= CAST({ylo!r} AS DOUBLE)"
                f" AND {y} < CAST({yhi!r} AS DOUBLE)"
                f" AND {x} >= CAST({xlo!r} AS DOUBLE)"
                f" AND {x} < CAST({xhi!r} AS DOUBLE))"
                f" THEN 1 ELSE 0 END)"
            )
            continue
        for x1, y1, x2, y2 in edges:
            # literals CAST AS DOUBLE: DuckDB types bare decimals as
            # DECIMAL and would evaluate literal-literal subexpressions
            # in exact decimal arithmetic, diverging from Spark doubles
            cx1, cy1 = f"CAST({x1!r} AS DOUBLE)", f"CAST({y1!r} AS DOUBLE)"
            cy2 = f"CAST({y2!r} AS DOUBLE)"
            if x1 == x2:
                xs = cx1
            else:
                dx, dy = x2 - x1, y2 - y1
                xs = (f"CAST({dx!r} AS DOUBLE) * ({y} - {cy1})"
                      f" / CAST({dy!r} AS DOUBLE) + {cx1}")
            terms.append(
                f"(CASE WHEN (({cy1} > {y}) <> ({cy2} > {y}))"
                f" AND ({x} < {xs}) THEN 1 ELSE 0 END)"
            )
    if not terms:  # degenerate all-horizontal ring set: nothing inside
        return "(1 = 0)"
    return "((" + " + ".join(terms) + ") % 2 = 1)"


# ---------------------------------------------------------------- measures

def ring_bbox(rings: list) -> tuple:
    xs = np.concatenate([r[:, 0] for r in rings])
    ys = np.concatenate([r[:, 1] for r in rings])
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def shoelace_area(rings: list) -> float:
    """Planar polygon area (shell positive, holes subtract when wound
    oppositely; we take |area| per ring with shell-first convention:
    shell - holes). Reference analog: calc_vec_area
    (python/rsgislib/vectorattrs/__init__.py:1873, geopandas .area)."""
    total = 0.0
    for i, ring in enumerate(rings):
        x, y = ring[:, 0], ring[:, 1]
        a = 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
        total += a if i == 0 else -a
    return total


def ring_length(rings: list) -> float:
    """Planar perimeter. Reference analog: calc_vec_length
    (vectorattrs/__init__.py:1906)."""
    total = 0.0
    for ring in rings:
        d = np.diff(ring, axis=0)
        total += float(np.sum(np.hypot(d[:, 0], d[:, 1])))
    return total


def centroid(rings: list) -> tuple:
    """Area-weighted polygon centroid (shell ring only — matches the
    common 'representative point for low-res lookup' use in
    calc_zonal_poly_pts_band_stats, zonalstats/__init__.py:570)."""
    ring = rings[0]
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    cross = x * y2 - x2 * y
    a = np.sum(cross) / 2.0
    if abs(a) < 1e-300:
        return float(np.mean(x)), float(np.mean(y))
    cx = np.sum((x + x2) * cross) / (6.0 * a)
    cy = np.sum((y + y2) * cross) / (6.0 * a)
    return float(cx), float(cy)


# Shared Spark-SQL / DuckDB haversine template — one expression tree
# on both engines (transcendentals still differ by ulps between JVM
# and libm, so gated outputs using it must ROUND or only compare
# counts/ranks; see MEMORY oracle-bit-exactness).
HAVERSINE_SQL = (
    "2 * CAST(6371008.8 AS DOUBLE) * ASIN(SQRT("
    "POWER(SIN(RADIANS({lat2} - {lat1}) / 2), 2)"
    " + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))"
    " * POWER(SIN(RADIANS({lon2} - {lon1}) / 2), 2)))")

#: meters per degree of latitude on the IUGG sphere (R * pi / 180)
M_PER_DEG = 6371008.8 * np.pi / 180.0


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters (vectorized)."""
    lon1, lat1 = np.radians(lon1), np.radians(lat1)
    lon2, lat2 = np.radians(lon2), np.radians(lat2)
    dlon, dlat = lon2 - lon1, lat2 - lat1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def unwrap_antimeridian(rings: list) -> list:
    """Shift negative longitudes +360 for polygons spanning >180 deg,
    mirroring the reference's wide-polygon unwrap
    (geopd_check_polys_wgs84_bounds_geometry,
    python/rsgislib/vectorutils/__init__.py:2973-3091: polygons wider
    than ~350 deg get coordinates unwrapped past +/-180)."""
    out = []
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if ring[:, 0].max() - ring[:, 0].min() > 180.0:
            ring = ring.copy()
            ring[:, 0] = np.where(ring[:, 0] < 0.0, ring[:, 0] + 360.0, ring[:, 0])
        out.append(ring)
    return out
