"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one operator from SURVEY.md §2 re-expressed
Spark-first; ``oracle_sql()`` carries the equivalent DuckDB SQL. The
engine and the oracle share expression *templates*
(rsgislib_spark.cells.quadcell.cell_sql, geometry.predicates.raycast_sql,
data.derived fragments), so floating-point results are bit-identical —
see the module docstrings for the reproducibility contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rsgislib_spark.cells import quadcell, s2cell
from rsgislib_spark.data import derived, fixtures
from rsgislib_spark.functions import text as T
from rsgislib_spark.operators import knn as knn_ops
from rsgislib_spark.operators import spatial_join as sj
from rsgislib_spark.operators import zonal as zonal_ops

# ---------------------------------------------------------------------------
# shared building blocks
# ---------------------------------------------------------------------------

PTS_SQL = derived.points_select_sql("orders", "o_orderkey")  # DuckDB CTE body
POLY_IDS = [p["poly_id"] for p in fixtures.POLYGONS]


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derived.points_df(spark, sf_dir)


def _poly_index() -> sj.PolygonIndex:
    return sj.PolygonIndex.from_fixture(fixtures.POLYGONS)


def _inner_join_oracle_body(select_cols: str) -> str:
    """UNION ALL of per-polygon ray-cast filters over a ``pts`` CTE —
    the textbook nested-loop spatial join as the oracle."""
    parts = []
    for p in fixtures.POLYGONS:
        cond = fixtures.poly_inside_sql(p, "lon", "lat")
        parts.append(
            f"SELECT {select_cols}, CAST({p['poly_id']} AS BIGINT) AS poly_id "
            f"FROM pts WHERE {cond}"
        )
    return " UNION ALL ".join(parts)


def _inner_join_oracle_sql(select_cols: str) -> str:
    return f"WITH pts AS ({PTS_SQL}) " + _inner_join_oracle_body(select_cols)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star core: every page/point → hierarchical cell ids at
    res 5..9 (quadtree, H3 role) + S2-style cell (res 10).
    Reference analog: create_wgs84_vector_grid tile naming
    (createvectors.py:981) + create_tiles (imageutils.cpp:2061)."""
    exprs = [f"{quadcell.cell_sql('lon', 'lat', r)} AS cell_r{r}" for r in range(5, 10)]
    exprs.append(f"{s2cell.cell_sql('lon', 'lat', 10)} AS s2_cell")
    return _points(spark, sf_dir).selectExpr("pt_id", *exprs)


def q_tile_assign_sql() -> str:
    exprs = [f"{quadcell.cell_sql('lon', 'lat', r)} AS cell_r{r}" for r in range(5, 10)]
    exprs.append(f"{s2cell.cell_sql('lon', 'lat', 10)} AS s2_cell")
    return f"WITH pts AS ({PTS_SQL}) SELECT pt_id, " + ", ".join(exprs) + " FROM pts"


def q_cell_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-cell rollup: res-9 counts aggregated to res 5 —
    get_img_sum_stats_in_pxl semantics (imagecalc.cpp:2384): stats of
    fine cells within each coarse cell."""
    return (
        _points(spark, sf_dir)
        .selectExpr(f"{quadcell.cell_sql('lon', 'lat', 5)} AS cell_r5", "meas")
        .groupBy("cell_r5")
        .agg(F.count("*").alias("n_pts"), F.sum("meas").alias("sum_meas"))
    )


def q_cell_rollup_sql() -> str:
    c5 = quadcell.cell_sql("lon", "lat", 5)
    return (
        f"WITH pts AS ({PTS_SQL}) SELECT {c5} AS cell_r5, COUNT(*) AS n_pts, "
        f"SUM(meas) AS sum_meas FROM pts GROUP BY 1"
    )


def q_spatial_join_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """perform_spatial_join(join_how='inner', join_op='within')
    (vectorattrs/__init__.py:1229): cell-prefix hash join + ray-cast
    refine. THE flagship operator."""
    pts = _points(spark, sf_dir)
    return sj.spatial_join(pts, _poly_index(), how="inner").select("pt_id", "poly_id")


def q_spatial_join_within_sql() -> str:
    return _inner_join_oracle_sql("pt_id")


def q_count_pt_intersects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_pt_intersects (vectorattrs/__init__.py:1022): polygons ⟕
    point counts; empty polygons get NULL (pandas-merge semantics)."""
    return sj.count_points_per_polygon(_points(spark, sf_dir), _poly_index())


def q_count_pt_intersects_sql() -> str:
    vals = ", ".join(f"({i})" for i in POLY_IDS)
    return (
        f"WITH pts AS ({PTS_SQL}), matched AS ({_inner_join_oracle_body('pt_id')})"
        f", counts AS (SELECT poly_id, COUNT(*) AS n_points FROM matched GROUP BY 1) "
        f"SELECT CAST(v.poly_id AS BIGINT) AS poly_id, counts.n_points AS n_points "
        f"FROM (VALUES {vals}) v(poly_id) LEFT JOIN counts ON v.poly_id = counts.poly_id"
    )


def q_annotate_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """annotate_vec_selection (vectorattrs/__init__.py:1158): boolean
    intersects-any flag per point."""
    pts = _points(spark, sf_dir)
    return sj.annotate_selection(pts, _poly_index()).select("pt_id", "sel")


def q_annotate_selection_sql() -> str:
    conds = " OR ".join(
        fixtures.poly_inside_sql(p, "lon", "lat") for p in fixtures.POLYGONS
    )
    return f"WITH pts AS ({PTS_SQL}) SELECT pt_id, ({conds}) AS sel FROM pts"


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """calc_zonal_band_stats (zonalstats/__init__.py:166): per-polygon
    min/max/mean/stddev_pop/sum/count/exact-median/smallest-mode over
    the joined point measure, with out_no_data sentinels for empty
    zones (:475-497)."""
    pts = _points(spark, sf_dir)
    joined = sj.spatial_join(pts, _poly_index(), how="inner")
    zones = spark.createDataFrame([(i,) for i in POLY_IDS], "poly_id BIGINT")
    out = zonal_ops.zonal_stats(joined, zone_col="poly_id", value_col="meas",
                                zones=zones, out_no_data_val=-9999.0)
    return out.select(
        "poly_id",
        F.col("min").alias("v_min"), F.col("max").alias("v_max"),
        F.col("mean").alias("v_mean"), F.col("stddev").alias("v_stddev"),
        F.col("sum").alias("v_sum"), F.col("count").alias("v_cnt"),
        F.col("median").alias("v_median"), F.col("mode").alias("v_mode"),
    )


def q_zonal_stats_sql() -> str:
    body = _inner_join_oracle_body("pt_id, meas")
    vals = ", ".join(f"({i})" for i in POLY_IDS)
    return f"""
WITH pts AS ({PTS_SQL}),
joined AS ({body}),
agg AS (
  SELECT poly_id,
         MIN(meas) AS v_min, MAX(meas) AS v_max,
         SUM(meas) / COUNT(meas) AS v_mean,
         SQRT(SUM(meas * meas) / COUNT(meas)
              - (SUM(meas) / COUNT(meas)) * (SUM(meas) / COUNT(meas))) AS v_stddev,
         SUM(meas) AS v_sum, CAST(COUNT(meas) AS DOUBLE) AS v_cnt,
         CAST(MEDIAN(meas) AS DOUBLE) AS v_median
  FROM joined GROUP BY poly_id),
modes AS (
  SELECT poly_id, meas AS v_mode FROM (
    SELECT poly_id, meas,
           ROW_NUMBER() OVER (PARTITION BY poly_id
                              ORDER BY COUNT(*) DESC, meas ASC) AS rn
    FROM joined GROUP BY poly_id, meas) t
  WHERE rn = 1)
SELECT CAST(v.poly_id AS BIGINT) AS poly_id,
       COALESCE(v_min, -9999.0) AS v_min, COALESCE(v_max, -9999.0) AS v_max,
       COALESCE(v_mean, -9999.0) AS v_mean, COALESCE(v_stddev, -9999.0) AS v_stddev,
       COALESCE(v_sum, -9999.0) AS v_sum, COALESCE(v_cnt, -9999.0) AS v_cnt,
       COALESCE(v_median, -9999.0) AS v_median, COALESCE(v_mode, -9999.0) AS v_mode
FROM (VALUES {vals}) v(poly_id)
LEFT JOIN agg ON v.poly_id = agg.poly_id
LEFT JOIN modes ON v.poly_id = modes.poly_id
"""


def q_knn_nearest_site(spark: SparkSession, sf_dir: str) -> DataFrame:
    """match_closest_vec_pts k=1 (vectorutils/__init__.py:3482):
    nearest of 64 sites per point; deterministic lowest-id tie-break
    (documented divergence: the reference raises on ties)."""
    pts = _points(spark, sf_dir)
    out = knn_ops.knn_broadcast(pts, derived.sites_df(spark), k=1)
    return out.select("pt_id", "nn_site_id", "nn_dist_sq")


def q_knn_nearest_site_sql() -> str:
    return f"""
WITH pts AS ({PTS_SQL}), sites AS ({derived.SITES_SQL_DUCKDB}),
ranked AS (
  SELECT pts.pt_id, sites.site_id,
         (pts.lon - sites.site_lon) * (pts.lon - sites.site_lon)
         + (pts.lat - sites.site_lat) * (pts.lat - sites.site_lat) AS d2,
         ROW_NUMBER() OVER (PARTITION BY pts.pt_id
                            ORDER BY (pts.lon - sites.site_lon) * (pts.lon - sites.site_lon)
                                     + (pts.lat - sites.site_lat) * (pts.lat - sites.site_lat) ASC,
                                     sites.site_id ASC) AS rn
  FROM pts CROSS JOIN sites)
SELECT pt_id, site_id AS nn_site_id, d2 AS nn_dist_sq FROM ranked WHERE rn = 1
"""


def q_radius_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """calc_npts_in_radius (vectorattrs/__init__.py:1104): per point,
    # of other points within 2.0 degrees — k-ring self-join."""
    pts = derived.points_df(spark, sf_dir, table="supplier", key="s_suppkey")
    return knn_ops.radius_count(pts, radius_deg=2.0).select("pt_id", "n_in_radius")


def q_radius_count_sql() -> str:
    pts_sql = derived.points_select_sql("supplier", "s_suppkey")
    return f"""
WITH pts AS ({pts_sql}),
pairs AS (
  SELECT a.pt_id, COUNT(*) AS n
  FROM pts a JOIN pts b
    ON a.pt_id <> b.pt_id
   AND (a.lon - b.lon) * (a.lon - b.lon)
       + (a.lat - b.lat) * (a.lat - b.lat) <= 4.0
  GROUP BY a.pt_id)
SELECT pts.pt_id, COALESCE(pairs.n, 0) AS n_in_radius
FROM pts LEFT JOIN pairs ON pts.pt_id = pairs.pt_id
"""


# ------------------------------------------------------------------ text ops

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring + language-ID over documents
    (training-data pipeline ops; all codegen, no UDF)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.selectExpr(
        "doc_id",
        T.token_count_sql("text") + " AS n_tokens",
        "ROUND(" + T.quality_score_sql("text") + ", 6) AS quality",
        T.lang_id_sql("text") + " AS lang_pred",
    )


def q_text_stats_sql() -> str:
    return (
        "SELECT doc_id, "
        + T.token_count_sql("text") + " AS n_tokens, "
        + "ROUND(" + T.quality_score_sql("text") + ", 6) AS quality, "
        + T.lang_id_sql("text") + " AS lang_pred FROM documents"
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash groupBy (hash-groupBy dedup from
    the task brief; rm_attrib_duplicates analog,
    vectorutils/__init__.py:3666): keep lowest doc_id per md5(text)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(F.col("doc_id"), F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def q_dedup_exact_sql() -> str:
    return (
        "SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies "
        "FROM documents GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, tuple] = {
    "tile_assign": (q_tile_assign, q_tile_assign_sql),
    "cell_rollup": (q_cell_rollup, q_cell_rollup_sql),
    "spatial_join_within": (q_spatial_join_within, q_spatial_join_within_sql),
    "count_pt_intersects": (q_count_pt_intersects, q_count_pt_intersects_sql),
    "annotate_selection": (q_annotate_selection, q_annotate_selection_sql),
    "zonal_stats": (q_zonal_stats, q_zonal_stats_sql),
    "knn_nearest_site": (q_knn_nearest_site, q_knn_nearest_site_sql),
    "radius_count": (q_radius_count, q_radius_count_sql),
    "text_stats": (q_text_stats, q_text_stats_sql),
    "dedup_exact": (q_dedup_exact, q_dedup_exact_sql),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial join (within) at sf0.001."""
    return q_spatial_join_within(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql() for name, (_fn, sql) in _REGISTRY.items() if sql is not None}
