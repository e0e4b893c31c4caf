"""S2-style cube-face quadtree cell index.

Public S2 design (Google S2 geometry, published): project the sphere
onto 6 cube faces, apply a quadratic reprojection for near-uniform
cell area, then quadtree-subdivide each face. We keep that structure
(face + quadratic ST + 2^r x 2^r face grid) but pack ids as
``face * 2^60 + si * 2^30 + ti`` (Morton/Hilbert ordering is not
needed: Spark partitions by hash of the id, not by id range).

Like quadcell, the formula exists as one SQL template shared by the
Spark engine (``F.expr``) and the DuckDB oracle, plus a numpy mirror.
Trig (cos/sin) may differ by 1 ulp between JVM and libm; that only
matters for points within 1 ulp of a cell boundary — measure-zero for
our workloads (documented divergence).

INTEROP NOTE: ids are S2-*style*, not wire-compatible with the real
S2 library (no Hilbert curve, different bit packing); likewise
quadcell ids are not H3 ids (square lon/lat cells, not hexagons on an
icosahedron). Everything inside this engine — joins, k-rings,
rollups, tile names — is closed over these ids, but exporting them to
external H3/S2 tooling requires mapping through lon/lat (cell_center
→ external library's cell_at). This is deliberate: the container is
dependency-free and SURVEY.md scopes "H3/S2-style" indexes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

FACE_SHIFT = 1152921504606846976  # 2^60
SI_SHIFT = 1073741824  # 2^30
MAX_RES = 30

_X = "(COS(RADIANS({lat})) * COS(RADIANS({lon})))"
_Y = "(COS(RADIANS({lat})) * SIN(RADIANS({lon})))"
_Z = "(SIN(RADIANS({lat})))"

# conditions reused for face / u / v (SQL has no local bindings in a
# scalar expression, so the tree is inlined; the oracle doesn't care)
_CF0 = "ABS({x}) >= ABS({y}) AND ABS({x}) >= ABS({z})"  # x dominant
_CF1 = "ABS({y}) >= ABS({z})"  # else y dominant, else z

_FACE = (
    "(CASE WHEN {cf0} THEN (CASE WHEN {x} >= 0.0 THEN 0 ELSE 3 END)"
    " WHEN {cf1} THEN (CASE WHEN {y} >= 0.0 THEN 1 ELSE 4 END)"
    " ELSE (CASE WHEN {z} >= 0.0 THEN 2 ELSE 5 END) END)"
)
_U = (
    "(CASE WHEN {cf0} THEN ({y} / {x})"
    " WHEN {cf1} THEN ((0.0 - {x}) / {y})"
    " ELSE ((0.0 - {x}) / {z}) END)"
)
_V = (
    "(CASE WHEN {cf0} THEN ({z} / {x})"
    " WHEN {cf1} THEN ({z} / {y})"
    " ELSE ((0.0 - {y}) / {z}) END)"
)
# S2's published quadratic ST transform. All literals CAST AS DOUBLE
# (DuckDB would otherwise type them DECIMAL — see quadcell notes).
_ST = (
    "(CASE WHEN {uv} >= CAST(0 AS DOUBLE)"
    " THEN CAST(0.5 AS DOUBLE) * SQRT(CAST(1 AS DOUBLE) + CAST(3 AS DOUBLE) * {uv})"
    " ELSE CAST(1 AS DOUBLE) - CAST(0.5 AS DOUBLE)"
    " * SQRT(CAST(1 AS DOUBLE) - CAST(3 AS DOUBLE) * {uv}) END)"
)
_IDX = ("LEAST(GREATEST(CAST(FLOOR({st} * CAST({n!r} AS DOUBLE)) AS BIGINT),"
        " 0), {nm1})")


def cell_sql(lon: str, lat: str, res: int) -> str:
    """Shared Spark-SQL/DuckDB expression for the S2-style cell id."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be 0..{MAX_RES}, got {res}")
    x = _X.format(lon=lon, lat=lat)
    y = _Y.format(lon=lon, lat=lat)
    z = _Z.format(lon=lon, lat=lat)
    cf0 = _CF0.format(x=x, y=y, z=z)
    cf1 = _CF1.format(x=x, y=y, z=z)
    face = _FACE.format(cf0=cf0, cf1=cf1, x=x, y=y, z=z)
    u = _U.format(cf0=cf0, cf1=cf1, x=x, y=y, z=z)
    v = _V.format(cf0=cf0, cf1=cf1, x=x, y=y, z=z)
    n, nm1 = float(1 << res), (1 << res) - 1
    si = _IDX.format(st=_ST.format(uv=u), n=n, nm1=nm1)
    ti = _IDX.format(st=_ST.format(uv=v), n=n, nm1=nm1)
    return (
        f"(CAST({face} AS BIGINT) * 1152921504606846976"
        f" + {si} * 1073741824 + {ti})"
    )


import functools


@functools.lru_cache(maxsize=64)
def cell_col(lon: str, lat: str, res: int) -> Column:
    """Cached — the S2 template is a large tree; parse it once per
    (lon, lat, res) per process."""
    return F.expr(cell_sql(lon, lat, res))


def cell_np(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Numpy mirror of cell_sql (same op order)."""
    rlon, rlat = np.radians(lon), np.radians(lat)
    x = np.cos(rlat) * np.cos(rlon)
    y = np.cos(rlat) * np.sin(rlon)
    z = np.sin(rlat)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    cf0 = (ax >= ay) & (ax >= az)
    cf1 = ~cf0 & (ay >= az)
    cf2 = ~cf0 & ~cf1
    face = np.where(cf0, np.where(x >= 0, 0, 3),
                    np.where(cf1, np.where(y >= 0, 1, 4),
                             np.where(z >= 0, 2, 5))).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.where(cf0, y / np.where(cf0, x, 1.0),
                     np.where(cf1, (0.0 - x) / np.where(cf1, y, 1.0),
                              (0.0 - x) / np.where(cf2, z, 1.0)))
        v = np.where(cf0, z / np.where(cf0, x, 1.0),
                     np.where(cf1, z / np.where(cf1, y, 1.0),
                              (0.0 - y) / np.where(cf2, z, 1.0)))

    def st(uv):
        with np.errstate(invalid="ignore"):
            return np.where(uv >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * uv),
                            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * uv))

    n = float(1 << res)
    nm1 = (1 << res) - 1
    si = np.clip(np.floor(st(u) * n).astype(np.int64), 0, nm1)
    ti = np.clip(np.floor(st(v) * n).astype(np.int64), 0, nm1)
    return face * FACE_SHIFT + si * SI_SHIFT + ti


def parent_np(cell: np.ndarray, child_res: int, parent_res: int) -> np.ndarray:
    shift = child_res - parent_res
    face = cell // FACE_SHIFT
    si = (cell % FACE_SHIFT) // SI_SHIFT
    ti = cell % SI_SHIFT
    return face * FACE_SHIFT + (si >> shift) * SI_SHIFT + (ti >> shift)
