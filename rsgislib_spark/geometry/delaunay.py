"""Delaunay triangulation (Bowyer–Watson, public textbook algorithm)
and alpha shapes.

Covers ``create_alpha_shape`` (reference:
python/rsgislib/vectorgeoms/__init__.py:1587 — alphashape package /
scipy Delaunay under the hood; neither is in the sandbox). The alpha
shape is the union of Delaunay triangles whose circumradius is below
1/alpha — realized here by feeding the kept triangles through the
repo's own scanline boolean union (geometry/overlay.py), which also
yields the exact area and the boundary pieces.

Intended use is per-group (a point cluster per feature), so the
incremental O(n^2)-ish construction is executor-local work inside an
applyInPandas — the same shape as the reference running alphashape
per feature.
"""

from __future__ import annotations

import numpy as np

from . import overlay as boolean


def _circumcircle(a, b, c):
    """(center, radius^2) of the triangle abc; degenerate → inf."""
    ax, ay = a
    bx, by = b
    cx, cy = c
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return (0.0, 0.0), np.inf
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
          + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
          + (cx * cx + cy * cy) * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return (ux, uy), r2


def delaunay(points: np.ndarray) -> list:
    """Bowyer–Watson incremental triangulation. Returns triangles as
    index triples into ``points`` (deduplicated input assumed).
    Deterministic: points are inserted in lexicographic order."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return []
    order = np.lexsort((pts[:, 1], pts[:, 0]))

    # super-triangle enclosing everything
    cx, cy = pts.mean(axis=0)
    span = 4.0 * max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]), 1.0)
    sup = np.array([[cx - 20 * span, cy - span],
                    [cx + 20 * span, cy - span],
                    [cx, cy + 20 * span]])
    allp = np.vstack([pts, sup])
    s0, s1, s2 = n, n + 1, n + 2

    # triangle store: (i, j, k) -> (center, r2)
    tris = {}

    def add(i, j, k):
        c, r2 = _circumcircle(allp[i], allp[j], allp[k])
        tris[(i, j, k)] = (c, r2)

    add(s0, s1, s2)
    for p in order:
        px, py = allp[p]
        bad = []
        for t, (c, r2) in tris.items():
            if (px - c[0]) ** 2 + (py - c[1]) ** 2 <= r2 * (1 + 1e-12):
                bad.append(t)
        # boundary of the cavity: edges of bad triangles not shared
        edge_count = {}
        for (i, j, k) in bad:
            for e in ((i, j), (j, k), (k, i)):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        for t in bad:
            del tris[t]
        for (i, j), cnt in edge_count.items():
            if cnt == 1:
                add(i, j, p)
    # drop triangles touching the super-triangle
    return [t for t in tris if s0 not in t and s1 not in t and s2 not in t]


def alpha_shape(points: np.ndarray, alpha: float):
    """Alpha shape: union of Delaunay triangles with circumradius
    <= 1/alpha (alpha <= 0 keeps everything = convex hull region).

    Returns (pieces, area) — the scanline-union trapezoid partition
    (geometry/overlay.py representation)."""
    pts = np.asarray(points, dtype=np.float64)
    pts = np.unique(pts, axis=0)
    tri_idx = delaunay(pts)
    if not tri_idx:
        return [], 0.0
    max_r2 = np.inf if alpha <= 0 else (1.0 / alpha) ** 2
    polys = []
    for (i, j, k) in tri_idx:
        _, r2 = _circumcircle(pts[i], pts[j], pts[k])
        if r2 <= max_r2:
            tri = np.array([pts[i], pts[j], pts[k], pts[i]])
            polys.append([tri])
    if not polys:
        return [], 0.0
    return boolean.boolean_pieces(polys, [], "union")
