"""Attribute-space kNN — apply_rat_knn semantics
(python/src/rastergis.cpp:2096-2127): k-nearest training rows in
numeric-attribute space (k=12 default), distance metric in
{euclidean, manhattan, chebyshev, minkowski, mahalanobis}, summarise
in {mode, mean, median, min, max, stddev}, optional distance
threshold.

Plan: training rows broadcast (the RAT is small relative to apply
rows — exactly the reference's in-memory RAT assumption), apply rows
stream through one Arrow-batched mapInPandas that computes the
distance matrix per batch and summarises the k nearest. Mahalanobis
precomputes the inverse covariance on the driver from the training
set (numpy, public formula).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

METRICS = {"euclidean", "manhattan", "chebyshev", "minkowski", "mahalanobis"}
SUMMARIES = {"mode", "mean", "median", "min", "max", "stddev"}


def _summarise(vals: np.ndarray, how: str) -> float:
    if how == "mode":
        u, c = np.unique(vals, return_counts=True)
        return float(u[c == c.max()].min())  # smallest tie, scipy-mstats rule
    return float({
        "mean": np.mean, "median": np.median, "min": np.min,
        "max": np.max, "stddev": np.std,
    }[how](vals))


def apply_knn(apply_df: DataFrame, train_df: DataFrame, feat_cols: list,
              target_col: str, k: int = 12, metric: str = "euclidean",
              summarise: str = "mean", p: float = 3.0,
              max_dist: float | None = None,
              out_col: str = "knn_pred") -> DataFrame:
    """Adds ``out_col`` = summary of the k nearest training targets.

    Rows with no neighbour within max_dist get NaN (the reference
    leaves the RAT column at its init value, rastergis.cpp threshold
    semantics)."""
    if metric not in METRICS:
        raise ValueError(f"metric must be one of {sorted(METRICS)}")
    if summarise not in SUMMARIES:
        raise ValueError(f"summarise must be one of {sorted(SUMMARIES)}")

    rows = train_df.select(*feat_cols, target_col).collect()
    X = np.array([[r[c] for c in feat_cols] for r in rows], dtype=np.float64)
    yv = np.array([r[target_col] for r in rows], dtype=np.float64)
    vi = None
    if metric == "mahalanobis":
        cov = np.cov(X, rowvar=False)
        vi = np.linalg.inv(np.atleast_2d(cov))
    kk, mm, pp, cap, how = int(k), metric, float(p), max_dist, summarise

    def _apply(batches):
        for pdf in batches:
            Q = pdf[feat_cols].to_numpy(dtype=np.float64)
            d = Q[:, None, :] - X[None, :, :]
            if mm == "euclidean":
                D = np.sqrt(np.sum(d * d, axis=2))
            elif mm == "manhattan":
                D = np.sum(np.abs(d), axis=2)
            elif mm == "chebyshev":
                D = np.max(np.abs(d), axis=2)
            elif mm == "minkowski":
                D = np.sum(np.abs(d) ** pp, axis=2) ** (1.0 / pp)
            else:  # mahalanobis
                D = np.sqrt(np.einsum("qnd,de,qne->qn", d, vi, d))
            out = np.empty(len(Q))
            for i in range(len(Q)):
                di = D[i]
                idx = np.argsort(di, kind="stable")[:kk]
                if cap is not None:
                    idx = idx[di[idx] <= cap]
                out[i] = _summarise(yv[idx], how) if len(idx) else np.nan
            res = pdf.copy()
            res[out_col] = out
            yield res

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in apply_df.schema.fields)
    return apply_df.mapInPandas(_apply, schema=schema + f", {out_col} DOUBLE")
