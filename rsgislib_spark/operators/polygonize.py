"""Raster → vector polygonization.

Reference: ``polygonise_raster_to_vec_lyr``
(python/rsgislib/vectorutils/createvectors.py:25-122 —
gdal.Polygonize: one polygon per connected equal-value region, holes
as interior rings).

Spark plan:
1. distributed connected components (operators/clump.py — tiled
   union-find with border merge, deterministic labels), so the
   cross-tile dissolve problem is already solved BEFORE any geometry
   is built;
2. one groupBy(clump_id): each group is exactly the pixel set of one
   output polygon; a numpy boundary tracer turns it into rings.

Boundary tracing (public marching-boundary technique): every pixel
edge adjacent to a different/no clump becomes a DIRECTED segment with
the interior on its left; following segments (most-clockwise outgoing
edge at pinch vertices) yields simple rings — the outer ring and any
holes (opposite orientation). Work is linear in boundary length and
distributed per clump; a continent-sized clump is the same skew the
reference's gdal.Polygonize pays per feature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..geometry import wkb
from .clump import clump

# directions: 0=E,1=S,2=W,3=N (screen coords, y down); edge direction
# chosen so the clump interior is on the LEFT of travel
_DVEC = {0: (1, 0), 1: (0, 1), 2: (-1, 0), 3: (0, -1)}


def _compress_ring(arr: np.ndarray) -> np.ndarray:
    """Remove collinear midpoints of axis-aligned unit runs; input and
    output are closed rings."""
    pts = arr[:-1] if len(arr) > 1 and np.array_equal(arr[0], arr[-1]) else arr
    prev = pts - np.roll(pts, 1, axis=0)
    nxt = np.roll(pts, -1, axis=0) - pts
    keep = ~((prev[:, 0] == nxt[:, 0]) & (prev[:, 1] == nxt[:, 1]))
    out = pts[keep]
    return np.vstack([out, out[:1]])


def polygonize(grid: DataFrame, tile: int = 64,
               no_data: float | None = None) -> DataFrame:
    """(x, y, value) → one row per connected region:
    (clump_id, value, area, n_rings, geometry WKB polygon w/ holes)."""
    labelled = clump(grid, tile=tile, no_data=no_data)

    def _poly(key, pdf):
        xs = pdf["x"].to_numpy(dtype=np.int64)
        ys = pdf["y"].to_numpy(dtype=np.int64)
        value = float(pdf["value"].iloc[0])
        rings = trace_pixel_boundary(xs, ys)
        # signed shoelace in screen coords (y down): outer rings trace
        # NEGATIVE with our interior-left orientation, holes positive;
        # polygon area = -(sum) = pixel count exactly
        areas = [_shoelace_signed(r) for r in rings]
        order = np.argsort([-abs(a) for a in areas], kind="stable")
        rings = [_compress_ring(rings[i]) for i in order]
        area = -float(sum(areas))
        return pd.DataFrame(
            [(int(key[0]), value, area, len(rings),
              wkb.polygon_to_wkb(rings))],
            columns=["clump_id", "value", "area", "n_rings", "geometry"])

    return labelled.groupBy("clump_id").applyInPandas(
        _poly, schema=("clump_id BIGINT, value DOUBLE, area DOUBLE, "
                       "n_rings INT, geometry BINARY"))


def image_footprint(grid: DataFrame, band: int = 1,
                    no_data: float | None = None,
                    tile: int = 64) -> DataFrame:
    """extract_image_footprint (vectorutils/createvectors.py — valid-
    data extent polygon): polygonize the VALID-pixel mask (all valid
    pixels collapsed to one value), yielding one polygon per connected
    valid region with holes where no-data blocks sit inside."""
    px = grid.where(F.col("band") == band)
    if no_data is not None:
        px = px.where(F.col("value") != no_data)
    mask = px.select("x", "y", F.lit(1.0).alias("value"))
    return polygonize(mask, tile=tile).drop("value")


def _shoelace_signed(arr: np.ndarray) -> float:
    x, y = arr[:, 0], arr[:, 1]
    # screen coords (y down): clockwise-on-screen = positive here
    return 0.5 * float(np.sum(np.roll(x, -1) * y - x * np.roll(y, -1)))


def trace_pixel_boundary(xs: np.ndarray, ys: np.ndarray) -> list:
    """Directed boundary walk of the unit-square union of the pixel
    set; returns closed rings in GLOBAL grid coordinates."""
    x0, y0 = int(xs.min()), int(ys.min())
    W = int(xs.max()) - x0 + 1
    H = int(ys.max()) - y0 + 1
    M = np.zeros((H + 2, W + 2), dtype=bool)
    M[ys - y0 + 1, xs - x0 + 1] = True
    inside = M[1:-1, 1:-1]

    segs = []
    e = inside & ~M[:-2, 1:-1]      # top edge -> travel E
    r, c = np.nonzero(e)
    segs.append(np.column_stack([c, r, np.zeros(len(r), np.int64)]))
    e = inside & ~M[1:-1, 2:]       # right edge -> travel S
    r, c = np.nonzero(e)
    segs.append(np.column_stack([c + 1, r, np.ones(len(r), np.int64)]))
    e = inside & ~M[2:, 1:-1]       # bottom edge -> travel W
    r, c = np.nonzero(e)
    segs.append(np.column_stack([c + 1, r + 1, np.full(len(r), 2, np.int64)]))
    e = inside & ~M[1:-1, :-2]      # left edge -> travel N
    r, c = np.nonzero(e)
    segs.append(np.column_stack([c, r + 1, np.full(len(r), 3, np.int64)]))
    E = np.vstack(segs)

    out: dict = {}
    for sx, sy, d in E:
        out.setdefault((int(sx), int(sy)), []).append(int(d))
    for v in out:
        out[v].sort()

    rings = []
    for start in sorted(out):
        while out.get(start):
            d = out[start].pop(0)
            if not out[start]:
                del out[start]
            ring = [start]
            v = start
            while True:
                dx, dy = _DVEC[d]
                v = (v[0] + dx, v[1] + dy)
                if v == start:
                    break
                ring.append(v)
                dirs = out[v]
                for cand in ((d + 1) % 4, d, (d - 1) % 4):
                    if cand in dirs:
                        dirs.remove(cand)
                        d = cand
                        break
                else:
                    raise AssertionError("broken boundary walk")
                if not dirs:
                    del out[v]
            arr = np.array(ring, dtype=np.float64)
            arr[:, 0] += x0
            arr[:, 1] += y0
            rings.append(np.vstack([arr, arr[:1]]))
    return rings
