"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, the correctness oracle
for the approximate paths. Scale paths: (a) LSH bucketing via
random-hyperplane signatures (public: Charikar 2002), (b) IVF-style
coarse quantization: assign vectors to the nearest of k centroids and
probe only matching (or adjacent) cells — the standard
inverted-file ANN layout re-expressed as a Spark equi-join.

All dot products run JVM-side via F.aggregate/zip_with on DOUBLE
(cast from float once) — no UDF in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_unit_vec(df: DataFrame, vec_col: str = "embedding",
                  out_col: str = "unit") -> DataFrame:
    """L2-normalize once (double precision) so cosine == dot."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(out_col, F.transform(v, lambda x: x / _norm(v)))


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                q_id: str = "vec_id", c_id: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force top-k: broadcast the (smaller) query side,
    score every corpus vector, rank per query. Output (q, c, score,
    rank). Self-matches (same id) excluded."""
    from pyspark.sql import Window

    q = queries.select(F.col(q_id).alias("q"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(c_id).alias("c"), F.col(vec_col).alias("cv"))
    qd = F.transform("qv", lambda x: x.cast("double"))
    cd = F.transform("cv", lambda x: x.cast("double"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("q") != F.col("c"))
        .withColumn("score", _dot(qd, cd) / (_norm(qd) * _norm(cd)))
    )
    w = Window.partitionBy("q").orderBy(F.desc("score"), F.asc("c"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", "c", F.round("score", 6).alias("score"), "rank")
    )


def cosine_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding near-dup
    detection (brute force; LSH variant below for scale).

    Norms are computed ONCE PER VECTOR before the pair join (same
    IEEE value as a per-pair norm — the per-vector sum is the same
    expression either way), so the O(n^2) stage does only the dot."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("_id"), v.alias("_v"),
                     _norm(v).alias("_n"))
    a = base.selectExpr("_id AS a", "_v AS av", "_n AS na")
    b = base.selectExpr("_id AS b", "_v AS bv", "_n AS nb")
    return (
        a.crossJoin(b).where(F.col("a") < F.col("b"))
        .withColumn("score", _dot(F.col("av"), F.col("bv"))
                    / (F.col("na") * F.col("nb")))
        .where(F.col("score") >= threshold)
        .select("a", "b", F.round("score", 6).alias("score"))
    )


def hyperplanes(n_bits: int = 16, dim: int = 64, seed: int = 42):
    """The deterministic seeded gaussian hyperplane matrix (n_bits x
    dim). Exposed so an external oracle (DuckDB) can embed the SAME
    planes as SQL literals — repr(float) round-trips exactly, and the
    sign decision is then bit-identical across engines when the dot is
    evaluated in the same left-fold order."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def hyperplane_signature(df: DataFrame, n_bits: int = 16, dim: int = 64,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH signature: bit i = sign(v . r_i).
    Hyperplanes are a deterministic seeded gaussian (driver numpy,
    broadcast as literals — a few KB)."""
    planes = hyperplanes(n_bits, dim, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = None
    for i in range(n_bits):
        r = F.array(*[F.lit(float(c)) for c in planes[i]])
        bit = F.when(_dot(v, r) >= 0.0, F.lit(1 << i)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return df.select(F.col(id_col).alias("vec_id"), bits.alias("sig"))


def lsh_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                      n_bits: int = 16, bands: int = 4, dim: int = 64,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      seed: int = 42) -> DataFrame:
    """ANN near-dup: bucket by signature bands (equi-join, no cross
    join), verify candidates with exact cosine. Precision 1 vs the
    brute-force oracle; recall follows the hyperplane collision
    curve."""
    rows = n_bits // bands
    sig = hyperplane_signature(df, n_bits, dim, id_col, vec_col, seed)
    mask = (1 << rows) - 1
    band_cols = [
        F.struct(F.lit(bi).alias("band"),
                 F.shiftright("sig", bi * rows).bitwiseAND(F.lit(mask)).alias("bh"))
        for bi in range(bands)
    ]
    buckets = sig.select("vec_id", F.explode(F.array(*band_cols)).alias("bk"))
    l = buckets.select(F.col("vec_id").alias("a"), "bk")
    r = buckets.select(F.col("vec_id").alias("b"), "bk")
    cand = l.join(r, "bk").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    vecs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    out = (
        cand.join(vecs.selectExpr("_id AS a", "_v AS av"), "a")
        .join(vecs.selectExpr("_id AS b", "_v AS bv"), "b")
    )
    ad = F.transform("av", lambda x: x.cast("double"))
    bd = F.transform("bv", lambda x: x.cast("double"))
    return (
        out.withColumn("score", _dot(ad, bd) / (_norm(ad) * _norm(bd)))
        .where(F.col("score") >= threshold)
        .select("a", "b", F.round("score", 6).alias("score"))
    )


def _seed_centroids(n_centroids: int, dim: int, seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_centroids, dim))
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def ivf_train_centroids(corpus: DataFrame, n_centroids: int | None = None,
                        dim: int = 64, n_iters: int = 5,
                        vec_col: str = "embedding", seed: int = 7):
    """Spherical k-means refinement of the IVF centroids (the
    standard IVF training step): assign corpus vectors to their
    nearest centroid (codegen argmax — the same expression the
    quantizer uses), average per cell via posexplode + groupBy
    (distributed; only the k x dim means reach the driver), then
    renormalize. Empty cells keep their previous centroid.
    n_centroids=None: sqrt(|corpus|) via auto_n_centroids."""
    import numpy as np

    if n_centroids is None:
        n_centroids = auto_n_centroids(corpus.count())
    cents = _seed_centroids(n_centroids, dim, seed)
    for _ in range(n_iters):
        assigned = ivf_assign(corpus, n_centroids, dim, vec_col=vec_col,
                              centroids=cents)
        # PACKED per-cell means: one row per cell carrying the whole
        # mean vector (dim avg aggregates, all map-side combinable) —
        # the driver pull is O(k) rows, not the O(k*dim) that
        # posexplode+groupBy(cell,pos) produced (~33M rows at the
        # auto clamp k=65536, dim=512)
        means = (
            assigned.groupBy("ivf_cell")
            .agg(F.array(*[
                F.avg(F.col(vec_col)[i].cast("double"))
                for i in range(dim)]).alias("m"))
            .collect()
        )
        new = cents.copy()
        acc = np.zeros((n_centroids, dim))
        seen = np.zeros(n_centroids, dtype=bool)
        for r in means:
            acc[r["ivf_cell"]] = r["m"]
            seen[r["ivf_cell"]] = True
        norms = np.linalg.norm(acc, axis=1, keepdims=True)
        ok = seen & (norms[:, 0] > 0)
        new[ok] = acc[ok] / norms[ok]
        if np.allclose(new, cents):
            break
        cents = new
    return cents


def ivf_assign(df: DataFrame, n_centroids: int = 16, dim: int = 64,
               id_col: str = "vec_id", vec_col: str = "embedding",
               seed: int = 7, centroids=None) -> DataFrame:
    """IVF coarse quantizer: nearest of n centroids (argmax dot on
    unit vectors). The centroid id is the partition key for
    probe-side pruning — the Spark realization of an inverted file:
    search joins on ivf_cell instead of scanning the corpus.
    centroids: (n, dim) array — pass ivf_train_centroids output for
    k-means-refined cells; None = deterministic seeded random (keeps
    the gate fixture reproducible)."""
    import numpy as np

    cents = (np.asarray(centroids, dtype=np.float64) if centroids is not None
             else _seed_centroids(n_centroids, dim, seed))
    n_centroids = len(cents)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # argmax via an array of scores — a when/otherwise chain would
    # duplicate the running best per level (exponential plan tree)
    scores = F.array(*[
        _dot(v, F.array(*[F.lit(float(x)) for x in cents[i]]))
        for i in range(n_centroids)
    ])
    best = F.array_position(scores, F.array_max(scores)) - 1  # first max wins
    return df.withColumn("ivf_cell", best.cast("int"))


def ivf_probe_cells(df: DataFrame, n_probe: int, n_centroids: int = 16,
                    dim: int = 64, vec_col: str = "embedding",
                    seed: int = 7, centroids=None) -> DataFrame:
    """Top-``n_probe`` nearest centroids per vector (multi-probe IVF —
    the standard recall lever). Adds exploded ``ivf_cell``."""
    import numpy as np

    cents = (np.asarray(centroids, dtype=np.float64) if centroids is not None
             else _seed_centroids(n_centroids, dim, seed))
    n_centroids = len(cents)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = F.array(*[
        F.struct(
            (-_dot(v, F.array(*[F.lit(float(x)) for x in cents[i]]))).alias("neg"),
            F.lit(i).alias("cell"))
        for i in range(n_centroids)
    ])
    top = F.slice(F.array_sort(scored), 1, n_probe)
    return df.withColumn(
        "ivf_cell", F.explode(F.transform(top, lambda s: s["cell"])))


def auto_n_centroids(n_vectors: int, lo: int = 16, hi: int = 65536) -> int:
    """sqrt(N) centroid count (the standard IVF sizing: balances the
    quantize cost k*N against the probe cost n_probe*N/k — both
    O(N*sqrt(N)) at k=sqrt(N)), clamped and rounded to a power of two.
    At corpus scale this is the skew bound too: a 10^12-vector corpus
    gets ~10^6 cells, so the cell equi-join has 10^6 keys (~10^6 rows
    per reducer), not 16 keys absorbing 1/16 of the corpus each."""
    import math

    k = int(math.sqrt(max(1, n_vectors)))
    k = 1 << max(0, (k - 1).bit_length())  # next power of two
    return max(lo, min(hi, k))


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
             n_centroids: int | None = None, dim: int = 64,
             q_id: str = "vec_id", c_id: str = "vec_id",
             vec_col: str = "embedding", n_probe: int = 4,
             centroids=None) -> DataFrame:
    """ANN top-k probing the query's ``n_probe`` nearest IVF cells
    (recall < 1 by design, measured against cosine_topk in tests).
    Corpus vectors live in exactly one cell; only the small query
    side fans out n_probe-fold.

    n_centroids=None (default) sizes the codebook at sqrt(|corpus|)
    via auto_n_centroids — one count() job; a FIXED small default
    (the old 16) would leave ~|corpus|/16 vectors per join key at
    scale, the classic hot-reducer."""
    from pyspark.sql import Window

    if centroids is not None:
        n_centroids = len(centroids)
    elif n_centroids is None:
        n_centroids = auto_n_centroids(corpus.count())
    q = ivf_probe_cells(queries, n_probe, n_centroids, dim, vec_col,
                        centroids=centroids).select(
        F.col(q_id).alias("q"), F.col(vec_col).alias("qv"), "ivf_cell")
    c = ivf_assign(corpus, n_centroids, dim, c_id, vec_col,
                   centroids=centroids).select(
        F.col(c_id).alias("c"), F.col(vec_col).alias("cv"), "ivf_cell")
    qd = F.transform("qv", lambda x: x.cast("double"))
    cd = F.transform("cv", lambda x: x.cast("double"))
    scored = (
        q.join(c, "ivf_cell")
        .where(F.col("q") != F.col("c"))
        .withColumn("score", _dot(qd, cd) / (_norm(qd) * _norm(cd)))
    )
    w = Window.partitionBy("q").orderBy(F.desc("score"), F.asc("c"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", "c", F.round("score", 6).alias("score"), "rank")
    )
