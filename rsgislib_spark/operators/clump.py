"""Distributed connected-component labelling (clump).

Reference: ``clump`` (python/src/segmentation.cpp:685 — connected
components of an int raster) and its tiled recipe
(segmentation/tiledclump.py:133-231 perform_clumping_multi_process:
clump each tile in a Pool, then merge labels across tile borders;
merge_segmentation_tiles / merge_clump_images,
python/src/segmentation.cpp:735-757).

Spark plan — the reference's recipe, executor edition:

1. per-tile CC: repartition pixels into T x T tiles, label each tile
   independently in an Arrow batch (two-pass union-find, numpy).
   Local labels are GLOBALLY unique and deterministic: the min pixel
   id (y * 2^32 + x) of the component's members in that tile.
2. border equivalences: pixels adjacent across a tile edge with equal
   value emit (label_a, label_b) edges — a self-join of the border
   strip on shifted coordinates.
3. label-graph union-find on the collected edges (edges scale with
   tile perimeter, ~sqrt of pixel count; the reference merges borders
   single-threaded too). For perimeter sets beyond driver memory the
   same closure can run as iterative min-label join rounds.
4. broadcast the root map back onto the pixels.

clump_id is the min pixel id of the whole component — deterministic
across tilings (asserted in tests: tiled == untiled).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

COORD = 1 << 32  # pixel id = y * COORD + x


def _tile_cc(pdf: pd.DataFrame, no_data: float | None) -> pd.DataFrame:
    """Fully vectorized per-tile CC: build the equal-value 4-adjacency
    edge lists once, then Shiloach–Vishkin-style label convergence —
    per round, every node takes the min label over its neighbours
    (np.minimum.at scatter) followed by full pointer jumping
    (L = L[L] to a fixed point). Labels only decrease and stay inside
    the component, so the fixed point is the component's min flat
    index — O(log d) rounds of pure numpy, no per-pixel Python."""
    xs = pdf["x"].to_numpy(dtype=np.int64)
    ys = pdf["y"].to_numpy(dtype=np.int64)
    vs = pdf["value"].to_numpy(dtype=np.float64)
    x0, y0 = xs.min(), ys.min()
    W, H = int(xs.max() - x0 + 1), int(ys.max() - y0 + 1)
    V = np.full((H, W), np.nan)
    V[ys - y0, xs - x0] = vs
    valid = ~np.isnan(V)
    if no_data is not None:
        valid &= V != no_data

    idx = np.arange(H * W, dtype=np.int64).reshape(H, W)
    eq_h = valid[:, 1:] & valid[:, :-1] & (V[:, 1:] == V[:, :-1])
    eq_v = valid[1:, :] & valid[:-1, :] & (V[1:, :] == V[:-1, :])
    ei = np.concatenate([idx[:, 1:][eq_h], idx[1:, :][eq_v]])
    ej = np.concatenate([idx[:, :-1][eq_h], idx[:-1, :][eq_v]])

    L = np.arange(H * W, dtype=np.int64)
    while True:
        M = L.copy()
        if len(ei):
            np.minimum.at(M, ei, L[ej])
            np.minimum.at(M, ej, L[ei])
        while True:  # pointer jumping to full compression
            MM = M[M]
            if np.array_equal(MM, M):
                break
            M = MM
        if np.array_equal(M, L):
            break
        L = M

    # component min flat index ↔ min global pixel id (both row-major):
    # clump_id = gid of the root = (root//W + y0) * COORD + root%W + x0
    flat = (ys - y0) * W + (xs - x0)
    roots = L[flat]
    lab = (roots // W + y0) * COORD + (roots % W + x0)
    mask = valid[ys - y0, xs - x0]
    out = pdf.copy()
    out["clump_id"] = np.where(mask, lab, -1)
    return out[out["clump_id"] >= 0]


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, a):
        self.p.setdefault(a, a)
        while self.p[a] != a:
            self.p[a] = self.p[self.p[a]]
            a = self.p[a]
        return a

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _closure_from_rows(spark, edges) -> DataFrame | None:
    """Label-graph closure on the driver (edges scale with tile
    perimeter ≈ sqrt(pixels) — tiny relative to the raster)."""
    uf = _UF()
    for e in edges:
        uf.union(e.la, e.lb)
    remap = [(k, uf.find(k)) for k in list(uf.p)]
    remap = [(k, r) for k, r in remap if k != r]
    if not remap:
        return None
    return F.broadcast(spark.createDataFrame(
        remap, "clump_id BIGINT, root BIGINT"))


def _closure_distributed(edges_df: DataFrame, max_iters: int = 64):
    """Fully distributed closure for perimeter sets beyond driver
    memory: iterative neighbour-min label propagation + pointer
    jumping (the Spark twin of _tile_cc's SV loop). Converges in
    O(log diameter) joins; each round persists and unpersists its
    predecessor (no lineage growth)."""
    both = edges_df.union(
        edges_df.selectExpr("lb AS la", "la AS lb")).persist()
    lab = (both.selectExpr("la AS node").distinct()
           .withColumn("root", F.col("node")).persist())
    for _ in range(max_iters):
        nbr_min = (
            both.join(lab.selectExpr("node AS lb", "root AS rb"), "lb")
            .groupBy("la").agg(F.min("rb").alias("cand"))
        )
        stepped = (
            lab.join(nbr_min.withColumnRenamed("la", "node"), "node", "left")
            .withColumn("root", F.least("root", F.coalesce("cand", "root")))
            .select("node", "root")
        )
        # pointer jump: root <- root[root]
        jumped = (
            stepped.join(
                stepped.selectExpr("node AS root", "root AS rr"), "root")
            .selectExpr("node", "rr AS root")
        ).persist()
        changed = (
            jumped.join(lab.withColumnRenamed("root", "old"), "node")
            .where(F.col("root") != F.col("old")).limit(1).count()
        )
        lab.unpersist()
        lab = jumped
        if changed == 0:
            break
    both.unpersist()
    out = lab.where(F.col("node") != F.col("root")) \
             .selectExpr("node AS clump_id", "root")
    return out


def clump(grid: DataFrame, tile: int = 64,
          no_data: float | None = None,
          merge: str = "auto",
          driver_edge_limit: int = 2_000_000) -> DataFrame:
    """(x, y, value) -> (x, y, value, clump_id): 4-connected equal-
    value components; no_data pixels are dropped (reference clump
    skips the no-data value).

    merge: 'driver' = collect the border equivalence edges and close
    them with a union-find (perimeter-scale — the default fit);
    'distributed' = iterative min-label join closure that never
    touches the driver; 'auto' picks by edge count vs
    driver_edge_limit."""
    spark = grid.sparkSession
    px = grid.select("x", "y", "value")

    tiled = px.withColumn("_tx", (F.col("x") / tile).cast("long")) \
              .withColumn("_ty", (F.col("y") / tile).cast("long"))

    nd = no_data

    def _cc(key, pdf):
        return _tile_cc(pdf, nd)

    labelled = tiled.groupBy("_tx", "_ty").applyInPandas(
        _cc, schema="x BIGINT, y BIGINT, value DOUBLE, _tx BIGINT, "
                    "_ty BIGINT, clump_id BIGINT").drop("_tx", "_ty")
    labelled = labelled.persist()

    # border equivalence edges: adjacent pixels straddling a tile
    # edge, as TWO equi-joins on shifted coordinates (an OR'd join
    # condition would degrade to a nested-loop join)
    right = (F.col("x") % tile == tile - 1)
    bottom = (F.col("y") % tile == tile - 1)
    shifted = (
        labelled.where(right)
        .selectExpr("x + 1 AS jx", "y AS jy", "value AS va",
                    "clump_id AS la")
        .unionByName(
            labelled.where(bottom)
            .selectExpr("x AS jx", "y + 1 AS jy", "value AS va",
                        "clump_id AS la"))
    )
    probe = labelled.selectExpr("x AS jx", "y AS jy", "value AS vb",
                                "clump_id AS lb")
    edges_df = (
        shifted.join(probe, ["jx", "jy"])
        .where((F.col("va") == F.col("vb")) & (F.col("la") != F.col("lb")))
        .select("la", "lb").distinct()
    )

    if merge == "auto":
        # one job decides AND (in the common case) delivers the edge
        # rows — never compute the edge join twice
        rows = edges_df.limit(driver_edge_limit).collect()
        if len(rows) < driver_edge_limit:
            map_df = _closure_from_rows(spark, rows)
        else:
            map_df = _closure_distributed(edges_df)
    elif merge == "driver":
        map_df = _closure_from_rows(spark, edges_df.collect())
    elif merge == "distributed":
        map_df = _closure_distributed(edges_df)
    else:
        raise ValueError("merge must be auto/driver/distributed")

    if map_df is not None:
        out = (
            labelled.join(map_df, "clump_id", "left")
            .withColumn("clump_id", F.coalesce("root", "clump_id"))
            .drop("root")
        )
    else:
        out = labelled
    return out.select("x", "y", "value", "clump_id")


def union_of_clumps(a: DataFrame, b: DataFrame) -> DataFrame:
    """union_of_clumps (python/src/segmentation.cpp:723): combine two
    clump labelings preserving ALL boundaries — the label pair
    (clump_a, clump_b) becomes the new clump id (dense ids over the
    pair via the two-pass histogram rank — no single-partition
    Exchange, SURVEY §2.7)."""
    from .vector_ops import dense_ids

    pair = (
        a.selectExpr("x", "y", "clump_id AS ca")
        .join(b.selectExpr("x", "y", "clump_id AS cb"), ["x", "y"])
    )
    ids = dense_ids(pair, ["ca", "cb"], "clump_id")
    return pair.join(F.broadcast(ids), ["ca", "cb"]).select("x", "y", "clump_id")


def relabel_dense(clumped: DataFrame) -> DataFrame:
    """Optional 1..N renumbering (the reference's clump ids are dense
    RAT row indices) over the stable min-pixel ids — two-pass
    histogram rank, no global Window."""
    from .vector_ops import dense_ids

    ids = dense_ids(clumped, ["clump_id"], "clump_seq")
    return clumped.join(F.broadcast(ids), "clump_id").drop("clump_id") \
                  .withColumnRenamed("clump_seq", "clump_id")
