"""Pairwise band/image statistics — calc_img_correlation
(imagecalc/__init__.py:2011), calc_img_mutual_info (:2113),
calc_img_earth_move_dist (:2230).

All three are aggregations over the joined pixel pair table
(band A value, band B value per pixel) — pure groupBy/window SQL, no
UDFs. Formulas written explicitly (not engine built-ins) so the
DuckDB oracle evaluates the identical expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pair_table(grid: DataFrame, band_a: int, band_b: int) -> DataFrame:
    a = grid.where(F.col("band") == band_a).select("x", "y", F.col("value").alias("va"))
    b = grid.where(F.col("band") == band_b).select("x", "y", F.col("value").alias("vb"))
    return a.join(b, ["x", "y"])


def correlation(pairs: DataFrame, a: str = "va", b: str = "vb") -> DataFrame:
    """Pearson r via explicit moment sums (exact on integer-valued
    doubles — bit-reproducible, unlike engine-native corr())."""
    n = F.count("*").cast("double")
    sa, sb = F.sum(a), F.sum(b)
    saa = F.sum(F.col(a) * F.col(a))
    sbb = F.sum(F.col(b) * F.col(b))
    sab = F.sum(F.col(a) * F.col(b))
    r = (n * sab - sa * sb) / (
        F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb))
    return pairs.agg(r.alias("corr"))


def mutual_information(pairs: DataFrame, n_bins: int, lo: float, hi: float,
                       a: str = "va", b: str = "vb",
                       round_to: int = 6) -> DataFrame:
    """MI over an n_bins x n_bins joint histogram (nats). Rounded:
    LN differs by ulps across engines."""
    width = (hi - lo) / n_bins

    def bucket(c):
        return F.least(
            F.greatest(F.floor((F.col(c) - lo) / width).cast("long"), F.lit(0)),
            F.lit(n_bins - 1))

    bb = pairs.select(bucket(a).alias("ba"), bucket(b).alias("bb"))
    n_total = bb.count()
    joint = bb.groupBy("ba", "bb").agg(F.count("*").alias("nab"))
    ma = bb.groupBy("ba").agg(F.count("*").alias("na"))
    mb = bb.groupBy("bb").agg(F.count("*").alias("nb"))
    j = joint.join(ma, "ba").join(mb, "bb")
    term = (F.col("nab") / n_total) * F.log(
        (F.col("nab").cast("double") * n_total)
        / (F.col("na").cast("double") * F.col("nb").cast("double")))
    return j.agg(F.round(F.sum(term), round_to).alias("mi"))


def emd_1d(pairs: DataFrame, n_bins: int, lo: float, hi: float,
           a: str = "va", b: str = "vb", round_to: int = 6) -> DataFrame:
    """1-D earth mover's distance between the two value histograms:
    sum |CDF_a - CDF_b| * binwidth (public closed form)."""
    width = (hi - lo) / n_bins

    def hist(c, name):
        return (
            pairs.select(
                F.least(
                    F.greatest(F.floor((F.col(c) - lo) / width).cast("long"),
                               F.lit(0)),
                    F.lit(n_bins - 1)).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias(name))
        )

    n_total = pairs.count()
    h = hist(a, "na").join(hist(b, "nb"), "bucket", "full").fillna(0)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cdf = h.select(
        "bucket",
        (F.sum("na").over(w) / n_total).alias("ca"),
        (F.sum("nb").over(w) / n_total).alias("cb"),
    )
    return cdf.agg(
        F.round(F.sum(F.abs(F.col("ca") - F.col("cb")) * width), round_to)
        .alias("emd"))
