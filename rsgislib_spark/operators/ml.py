"""Matrix-decomposition / clustering wrappers — the imagecalc ML ops
(pca python/src/imagecalc.cpp:2005, get_pca_eigen_vector
imagecalc/__init__.py:628, kmeans_clustering imagecalc.cpp:1889,
isodata_clustering :1916) re-expressed on Spark ML (the distributed
twin of the reference's single-node Shark/OpenCV kernels).

The reference trains on a random pixel sample and applies per pixel;
we do the same: deterministic hash sample for training, transform for
application.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import PCA, VectorAssembler
from pyspark.sql import DataFrame, functions as F


def _assemble(df: DataFrame, feat_cols: list) -> DataFrame:
    return VectorAssembler(inputCols=feat_cols, outputCol="_fv").transform(df)


def kmeans_cluster(df: DataFrame, feat_cols: list, k: int = 8,
                   seed: int = 42, sample_pct: int | None = None,
                   key_col: str | None = None,
                   out_col: str = "cluster") -> DataFrame:
    """kmeans_clustering semantics: fit on a (deterministic) sample,
    assign every row. Returns df + cluster id column."""
    av = _assemble(df, feat_cols)
    train = av
    if sample_pct is not None and key_col is not None:
        train = av.where((F.col(key_col) * 2654435761) % 100 < sample_pct)
    model = KMeans(k=k, seed=seed, featuresCol="_fv",
                   predictionCol=out_col).fit(train)
    return model.transform(av).drop("_fv")


def pca_project(df: DataFrame, feat_cols: list, n_components: int = 2,
                out_col: str = "pca") -> DataFrame:
    """pca / get_pca_eigen_vector semantics: project rows onto the
    top-n principal components (vector column out)."""
    av = _assemble(df, feat_cols)
    model = PCA(k=n_components, inputCol="_fv", outputCol=out_col).fit(av)
    return model.transform(av).drop("_fv"), model.pc.toArray()
