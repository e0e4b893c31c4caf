"""Hexagonal grid index — the true-hex answer to
``create_hex_grid_bbox/polys`` (reference:
python/rsgislib/vectorutils/createvectors.py:1237,1346, matplotlib
hexbin) and the H3-hexagon role of the north star.

Flat-top hexagons of size ``s`` (center-to-vertex) on the lon/lat
plane. Assignment = axial fractional coordinates + standard cube
rounding (public redblobgames formulation):

    qf = (2/3) * x / s
    rf = (-1/3 * x + sqrt(3)/3 * y) / s
    round to the nearest hex center in cube space (q + r + s_ = 0),
    fixing the axis with the largest rounding error.

Everything is a shared SQL template (Spark ``F.expr`` and the DuckDB
oracle evaluate the IDENTICAL expression tree, so even rounding-tie
pixels land in the same cell on both engines), with a numpy mirror.
FLOOR(v + 0.5) is used instead of ROUND — engines disagree on
round-half semantics, floor does not.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

SQRT3_OVER_3 = 0.5773502691896258  # sqrt(3)/3, repr-exact double

# offset packs axial (q, r) — both bounded by ~|180/s| — into one id
PACK = 1 << 21
HALF = 1 << 20


def _d(v) -> str:
    return f"CAST({v!r} AS DOUBLE)"


def _round_sql(v: str) -> str:
    """Half-up rounding with identical semantics on both engines."""
    return f"FLOOR({v} + {_d(0.5)})"


def hex_qr_sql(lon: str, lat: str, size: float) -> tuple:
    """(q, r) axial hex coordinates as one shared SQL pair."""
    qf = f"({_d(2.0 / 3.0)} * {lon} / {_d(size)})"
    rf = (f"((-{_d(1.0 / 3.0)} * {lon} + {_d(SQRT3_OVER_3)} * {lat})"
          f" / {_d(size)})")
    sf = f"(-{qf} - {rf})"
    rq, rr, rs = _round_sql(qf), _round_sql(rf), _round_sql(sf)
    dq = f"ABS({rq} - {qf})"
    dr = f"ABS({rr} - {rf})"
    ds = f"ABS({rs} - {sf})"
    # fix the axis with the largest rounding error so q + r + s = 0
    q = (f"(CASE WHEN {dq} > {dr} AND {dq} > {ds}"
         f" THEN -({rr}) - ({rs}) ELSE {rq} END)")
    r = (f"(CASE WHEN NOT ({dq} > {dr} AND {dq} > {ds})"
         f" AND {dr} > {ds} THEN -({rq}) - ({rs}) ELSE {rr} END)")
    return f"CAST({q} AS BIGINT)", f"CAST({r} AS BIGINT)"


def hex_cell_sql(lon: str, lat: str, size: float) -> str:
    """Packed BIGINT hex cell id (q, r offset-packed)."""
    q, r = hex_qr_sql(lon, lat, size)
    return f"(({q} + {HALF}) * {PACK} + ({r} + {HALF}))"


def hex_cell_col(lon: str, lat: str, size: float) -> Column:
    return F.expr(hex_cell_sql(lon, lat, size))


def hex_center_np(q: np.ndarray, r: np.ndarray, size: float) -> tuple:
    """Axial (q, r) → center (x, y). Flat-top spacing."""
    x = size * 1.5 * q
    y = size * np.sqrt(3.0) * (r + q / 2.0)
    return x, y


def hex_qr_np(x: np.ndarray, y: np.ndarray, size: float) -> tuple:
    """numpy mirror of hex_qr_sql (identical floor-half-up rounding)."""
    qf = (2.0 / 3.0) * x / size
    rf = (-(1.0 / 3.0) * x + SQRT3_OVER_3 * y) / size
    sf = -qf - rf

    def rnd(v):
        return np.floor(v + 0.5)

    rq, rr, rs = rnd(qf), rnd(rf), rnd(sf)
    dq, dr, ds = np.abs(rq - qf), np.abs(rr - rf), np.abs(rs - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -rr - rs, rq)
    r = np.where(fix_r, -rq - rs, rr)
    return q.astype(np.int64), r.astype(np.int64)


def hex_grid_cells(xmin: float, ymin: float, xmax: float, ymax: float,
                   size: float) -> np.ndarray:
    """All packed cell ids whose centers fall inside the bbox — the
    create_hex_grid_bbox generator (grid as ids, not materialized
    polygons; centers via hex_center_np on demand)."""
    qs = np.arange(np.floor(xmin / (1.5 * size)) - 1,
                   np.ceil(xmax / (1.5 * size)) + 2, dtype=np.int64)
    out = []
    for q in qs:
        cx = size * 1.5 * q
        if not (xmin <= cx <= xmax):
            continue
        rlo = int(np.floor(ymin / (size * np.sqrt(3.0)) - q / 2.0)) - 1
        rhi = int(np.ceil(ymax / (size * np.sqrt(3.0)) - q / 2.0)) + 1
        for r in range(rlo, rhi + 1):
            cy = size * np.sqrt(3.0) * (r + q / 2.0)
            if ymin <= cy <= ymax:
                out.append((int(q) + HALF) * PACK + (r + HALF))
    return np.array(sorted(out), dtype=np.int64)
