"""rsgislib_spark — a PySpark-native spatial-join + tiling engine.

Re-expresses the query semantics of RSGISLib (reference:
/root/reference, a C++/GDAL remote-sensing library) as idiomatic
PySpark over web-scale tables of Common-Crawl-style pages:

- hierarchical cell index (H3-role quadtree + S2-role cube-face
  quadtree) — ``rsgislib_spark.cells``
- spatial join = cell-prefix hash join + exact ray-cast refine —
  ``rsgislib_spark.operators.spatial_join`` (reference:
  python/rsgislib/vectorattrs/__init__.py:1229 perform_spatial_join)
- zonal statistics — ``rsgislib_spark.operators.zonal`` (reference:
  python/rsgislib/zonalstats/__init__.py:166 calc_zonal_band_stats)
- kNN / radius joins — ``rsgislib_spark.operators.knn`` (reference:
  python/rsgislib/vectorutils/__init__.py:3482 match_closest_vec_pts)
- raster<->vector — ``rsgislib_spark.operators.raster`` (reference:
  python/rsgislib/vectorutils/createrasters.py:14 rasterise_vec_lyr)
- tiling / partitioning — ``rsgislib_spark.operators.tiling``
  (reference: python/src/imageutils.cpp:2061 create_tiles)
- training-data pipeline ops (dedup, similarity, text analysis) —
  ``rsgislib_spark.operators.{dedup,similarity}``,
  ``rsgislib_spark.functions.text``

Design stance (SURVEY.md §7): DataFrame transformations + native
Column expressions on the hot path; vectorized pandas/Arrow UDFs only
where built-ins cannot express the semantics (ray-cast refine,
per-tile rasterization, focal stencils); no per-row Python, no RDDs.
"""

__version__ = "0.1.0"
