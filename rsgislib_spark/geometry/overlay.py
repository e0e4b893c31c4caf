"""General polygon×polygon boolean overlay — scanline trapezoid
decomposition (public textbook technique: Bentley–Ottmann slab sweep /
Vatti-style classification, simplified to per-slab midpoint parity).

Re-expresses the geometric core of ``vec_lyr_intersection_gp`` /
``_difference_gp`` / ``_sym_difference_gp`` / ``_identity_gp`` /
``_union_gp`` (reference: python/rsgislib/vectorgeoms/__init__.py:
1292,1344,1396,1450,1505 — geopandas/GEOS overlays) without GEOS:

1. collect the edges of both operands (skip horizontal edges — they
   lie on slab boundaries and never cross a slab interior);
2. split the y-axis into slabs at every vertex y AND every proper
   pairwise edge-crossing y — inside a slab, active edges are straight,
   non-crossing, and span the full slab;
3. per slab, order active edges by x at the slab midline and walk
   left→right maintaining EVEN-ODD parity PER POLYGON (orientation
   independent, holes for free); a layer covers a gap iff ANY of its
   polygons has odd parity — so overlapping same-layer polygons union
   correctly (the multi-clipper difference case);
4. every gap satisfying the boolean predicate emits one trapezoid.

The pieces partition the result region exactly; their summed area is
the overlay area. For axis-aligned integer inputs every trapezoid
corner and area term is integer-exact in IEEE doubles — the property
the bit-exact correctness gates rely on.

Ops: intersection, difference, union, sym_difference.
"""

from __future__ import annotations

import numpy as np

OPS = ("intersection", "difference", "union", "sym_difference")


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area (CCW positive); accepts open or closed."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def polygons_area(polys: list) -> float:
    """Even-odd area of a list of polygons (each a list of rings,
    shell first): |shell| - |holes| per polygon, assuming disjoint
    polygons. For overlapping polygons use boolean_pieces(op='union')."""
    total = 0.0
    for rings in polys:
        total += abs(ring_signed_area(rings[0]))
        for hole in rings[1:]:
            total -= abs(ring_signed_area(hole))
    return total


def _edges(polys: list, layer: int, pid0: int):
    """Edge arrays for a list of polygons. Returns (x1,y1,x2,y2,pid)
    with horizontal edges dropped; pid is unique per polygon so parity
    is tracked per polygon (even-odd within, OR across)."""
    segs, pids = [], []
    pid = pid0
    for rings in polys:
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) and np.array_equal(r[0], r[-1]):
                r = r[:-1]
            if len(r) < 3:
                continue
            nxt = np.roll(r, -1, axis=0)
            seg = np.column_stack([r, nxt])
            keep = seg[:, 1] != seg[:, 3]  # drop horizontal
            segs.append(seg[keep])
            pids.append(np.full(keep.sum(), pid, dtype=np.int64))
        pid += 1
    if not segs:
        return np.empty((0, 4)), np.empty(0, dtype=np.int64), pid
    return np.vstack(segs), np.concatenate(pids), pid


def _crossing_ys(E: np.ndarray, pid: np.ndarray,
                 chunk: int = 512) -> np.ndarray:
    """y-coordinates of proper interior crossings between edges of
    DIFFERENT polygons (same-polygon edges of a simple ring never
    properly cross; endpoint touches are covered by vertex ys).

    Pairwise test is O(n^2) work but evaluated in row CHUNKS so peak
    memory is O(chunk * n), not O(n^2) — a dissolve group with
    thousands of edges must not OOM the Python worker."""
    n = len(E)
    if n < 2:
        return np.empty(0)
    x1, y1, x2, y2 = E[:, 0], E[:, 1], E[:, 2], E[:, 3]
    dx, dy = x2 - x1, y2 - y1
    out = []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        # pairwise (i in chunk, j): p1_i + t*d_i == p1_j + s*d_j
        denom = dx[lo:hi, None] * dy[None, :] - dy[lo:hi, None] * dx[None, :]
        ex = x1[None, :] - x1[lo:hi, None]
        ey = y1[None, :] - y1[lo:hi, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (ex * dy[None, :] - ey * dx[None, :]) / denom
            s = (ex * dy[lo:hi, None] - ey * dx[lo:hi, None]) / denom
        ok = (
            (denom != 0)
            & (t > 0.0) & (t < 1.0) & (s > 0.0) & (s < 1.0)
            & (pid[lo:hi, None] != pid[None, :])
        )
        ii = np.nonzero(ok)
        if len(ii[0]):
            out.append(y1[lo + ii[0]] + t[ii] * dy[lo + ii[0]])
    return np.concatenate(out) if out else np.empty(0)


def boolean_pieces(polys_a: list, polys_b: list, op: str):
    """Boolean overlay of two polygon SETS (each: list of polygons,
    each polygon a list of rings, shell first).

    Returns (pieces, area): pieces is a list of closed trapezoid rings
    (CCW) partitioning the result region; area is their exact sum.
    """
    if op not in OPS:
        raise ValueError(f"op must be one of {OPS}")
    EA, pidA, nxt = _edges(polys_a, 0, 0)
    EB, pidB, _ = _edges(polys_b, 1, nxt)
    E = np.vstack([EA, EB])
    pid = np.concatenate([pidA, pidB])
    is_a = np.concatenate([np.ones(len(EA), bool), np.zeros(len(EB), bool)])
    if len(E) == 0:
        return [], 0.0

    ys = np.concatenate([E[:, 1], E[:, 3], _crossing_ys(E, pid)])
    ys = np.unique(ys)

    # per-polygon parity needs a dense polygon index
    upids, pidx = np.unique(pid, return_inverse=True)
    npoly = len(upids)
    a_polys = np.zeros(npoly, dtype=bool)
    np.logical_or.at(a_polys, pidx, is_a)

    x1, y1, x2, y2 = E[:, 0], E[:, 1], E[:, 2], E[:, 3]
    ylo_e = np.minimum(y1, y2)
    yhi_e = np.maximum(y1, y2)
    inv_dy = 1.0 / (y2 - y1)

    pieces, total = [], 0.0
    for si in range(len(ys) - 1):
        lo, hi = ys[si], ys[si + 1]
        if hi <= lo:
            continue
        ym = 0.5 * (lo + hi)
        act = (ylo_e < ym) & (yhi_e > ym)
        if not act.any():
            continue
        ai = np.nonzero(act)[0]
        t_m = (ym - y1[ai]) * inv_dy[ai]
        xm = x1[ai] + t_m * (x2[ai] - x1[ai])
        order = np.argsort(xm, kind="stable")
        ai = ai[order]
        # exact corner x at slab bounds (vertical edges stay exact:
        # x2-x1 == 0 ⇒ xlo == x1 bit-for-bit)
        t_lo = (lo - y1[ai]) * inv_dy[ai]
        t_hi = (hi - y1[ai]) * inv_dy[ai]
        xlo = x1[ai] + t_lo * (x2[ai] - x1[ai])
        xhi = x1[ai] + t_hi * (x2[ai] - x1[ai])
        # parity per polygon after each edge
        onehot = np.zeros((len(ai), npoly), dtype=np.int64)
        onehot[np.arange(len(ai)), pidx[ai]] = 1
        par = np.cumsum(onehot, axis=0) & 1
        in_a = (par[:, a_polys] == 1).any(axis=1)
        in_b = (par[:, ~a_polys] == 1).any(axis=1)
        if op == "intersection":
            pred = in_a & in_b
        elif op == "difference":
            pred = in_a & ~in_b
        elif op == "union":
            pred = in_a | in_b
        else:
            pred = in_a ^ in_b
        for g in np.nonzero(pred[:-1])[0]:
            xl0, xl1 = xlo[g], xlo[g + 1]
            xh0, xh1 = xhi[g], xhi[g + 1]
            if xl1 == xl0 and xh1 == xh0:
                continue
            # 0.5*dy*(w_lo + w_hi): every factor integer-exact for
            # integer axis-aligned inputs
            area = 0.5 * (hi - lo) * ((xl1 - xl0) + (xh1 - xh0))
            total += area
            pieces.append(np.array([
                [xl0, lo], [xl1, lo], [xh1, hi], [xh0, hi], [xl0, lo],
            ]))
    return pieces, total


def boolean_area(polys_a: list, polys_b: list, op: str) -> float:
    return boolean_pieces(polys_a, polys_b, op)[1]
