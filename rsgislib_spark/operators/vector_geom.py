"""Geometry-column operators: measures and bbox columns from WKB.

Reference: pop_bbox_cols / add_geom_bbox_cols
(vectorattrs/__init__.py:278,403), calc_vec_area (:1873),
calc_vec_length (:1906), calc_poly_centroids
(vectorgeoms/__init__.py:1221). All as ONE Arrow-batched pandas UDF
pass over the WKB column — geometry decode happens once per row, all
measures come out together (vs the reference's one-loop-per-measure).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..geometry import predicates, wkb


def point_dist_angle(df: DataFrame, lon: str, lat: str,
                     ref_lon: float, ref_lat: float) -> DataFrame:
    """calc_vec_pt_dist_angle (vectorattrs/__init__.py:1939): planar
    distance + bearing (degrees, clockwise from north) from a
    reference point — pure codegen columns."""
    dx = F.col(lon) - F.lit(ref_lon)
    dy = F.col(lat) - F.lit(ref_lat)
    return df.withColumn(
        "dist", F.sqrt(dx * dx + dy * dy)
    ).withColumn(
        "angle", (F.degrees(F.atan2(dx, dy)) + 360.0) % 360.0
    )


def add_geom_stats(df: DataFrame, geom_col: str = "geometry") -> DataFrame:
    """Adds xmin/ymin/xmax/ymax, area, perimeter, centroid_x/y."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.schema.fields)
    out_schema += (", xmin DOUBLE, ymin DOUBLE, xmax DOUBLE, ymax DOUBLE"
                   ", area DOUBLE, perimeter DOUBLE"
                   ", centroid_x DOUBLE, centroid_y DOUBLE")

    def _stats(batches):
        for pdf in batches:
            n = len(pdf)
            cols = {k: np.empty(n) for k in
                    ("xmin", "ymin", "xmax", "ymax", "area", "perimeter",
                     "centroid_x", "centroid_y")}
            for i, blob in enumerate(pdf[geom_col]):
                rings = wkb.wkb_to_rings(bytes(blob))
                bb = predicates.ring_bbox(rings)
                cols["xmin"][i], cols["ymin"][i] = bb[0], bb[1]
                cols["xmax"][i], cols["ymax"][i] = bb[2], bb[3]
                cols["area"][i] = predicates.shoelace_area(rings)
                cols["perimeter"][i] = predicates.ring_length(rings)
                cx, cy = predicates.centroid(rings)
                cols["centroid_x"][i], cols["centroid_y"][i] = cx, cy
            out = pdf.copy()
            for k, v in cols.items():
                out[k] = v
            yield out

    return df.mapInPandas(_stats, schema=out_schema)
