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


def explode_multipolygon(df: DataFrame, geom_col: str = "geometry",
                         part_col: str = "part_id") -> DataFrame:
    """explode_vec_lyr / multi->single (vectorgeoms/__init__.py:1831):
    one output row per polygon part of a MultiPolygon, part_id 0..n-1.
    Pure mapInPandas — no shuffle."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.schema.fields)
    out_schema += f", {part_col} INT"
    cols = df.columns

    def _explode(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                polys = wkb.wkb_to_polygons(bytes(row[geom_col]))
                for i, rings in enumerate(polys):
                    r = row.copy()
                    r[geom_col] = wkb.polygon_to_wkb(rings)
                    rows.append(list(r[cols]) + [i])
            yield pd.DataFrame(rows, columns=cols + [part_col])

    return df.mapInPandas(_explode, schema=out_schema)


def drop_holes(df: DataFrame, geom_col: str = "geometry",
               area_thres: float | None = None) -> DataFrame:
    """remove_polygon_holes (vectorgeoms/__init__.py:2041): strip
    interior rings (optionally only holes below area_thres)."""
    def _fix(batches):
        for pdf in batches:
            out = pdf.copy()
            fixed = []
            for blob in pdf[geom_col]:
                polys = wkb.wkb_to_polygons(bytes(blob))
                new = []
                for rings in polys:
                    if area_thres is None:
                        new.append(rings[:1])
                    else:
                        keep = [rings[0]] + [
                            h for h in rings[1:]
                            if abs(predicates.shoelace_area([h])) >= area_thres
                        ]
                        new.append(keep)
                fixed.append(wkb.multipolygon_to_wkb(new) if len(new) > 1
                             else wkb.polygon_to_wkb(new[0]))
            out[geom_col] = fixed
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    return df.mapInPandas(_fix, schema=schema)


def simplify(df: DataFrame, tol: float,
             geom_col: str = "geometry") -> DataFrame:
    """vec_lyr_simplify (vectorgeoms/__init__.py:1953): Douglas-Peucker
    per ring (geometry/edit.py); empty-collapsed geometries dropped."""
    from ..geometry import edit

    def _simp(batches):
        for pdf in batches:
            keep_rows, fixed = [], []
            for idx, blob in enumerate(pdf[geom_col]):
                polys = wkb.wkb_to_polygons(bytes(blob))
                new = [edit.simplify_polygon(rings, tol) for rings in polys]
                new = [p for p in new if p]
                if not new:
                    continue
                keep_rows.append(idx)
                fixed.append(wkb.multipolygon_to_wkb(new) if len(new) > 1
                             else wkb.polygon_to_wkb(new[0]))
            out = pdf.iloc[keep_rows].copy()
            out[geom_col] = fixed
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    return df.mapInPandas(_simp, schema=schema)


def buffer_polygons(df: DataFrame, dist: float, k: int = 16,
                    geom_col: str = "geometry") -> DataFrame:
    """buffer_vec_geoms (vectorgeoms/__init__.py:3276): positive
    Minkowski-disk buffer per row (geometry/edit.buffer_polygon);
    adds buf_area and replaces the geometry with the piece partition."""
    from ..geometry import edit

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.schema.fields)
    out_schema += ", buf_area DOUBLE"

    def _buf(batches):
        for pdf in batches:
            out = pdf.copy()
            geoms, areas = [], []
            for blob in pdf[geom_col]:
                rings = wkb.wkb_to_rings(bytes(blob))
                pieces, area = edit.buffer_polygon(rings, dist, k)
                geoms.append(wkb.multipolygon_to_wkb([[p] for p in pieces]))
                areas.append(area)
            out[geom_col] = geoms
            out["buf_area"] = areas
            yield out

    return df.mapInPandas(_buf, schema=out_schema)


def dissolve(df: DataFrame, by: str, geom_col: str = "geometry") -> DataFrame:
    """dissolve_vector (vectorgeoms/__init__.py:3585, geopandas
    dissolve): per attribute value, the geometric UNION of the group's
    polygons (scanline boolean union — overlaps counted once).
    Output: (by, area, n_pieces, geometry as piece MultiPolygon WKB).
    One groupBy shuffle; each group unions locally in numpy."""
    from ..geometry import overlay as boolean

    def _diss(key, pdf):
        polys = [wkb.wkb_to_rings(bytes(b)) for b in pdf[geom_col]]
        pieces, area = boolean.boolean_pieces(polys, [], "union")
        return pd.DataFrame(
            [(key[0], area, len(pieces),
              wkb.multipolygon_to_wkb([[p] for p in pieces]) if pieces
              else None)],
            columns=[by, "area", "n_pieces", "geometry"])

    by_type = dict(zip(df.columns,
                       [f.dataType.simpleString() for f in df.schema.fields]))
    return df.select(by, geom_col).groupBy(by).applyInPandas(
        _diss,
        schema=(f"{by} {by_type[by]}, area DOUBLE, n_pieces INT, "
                "geometry BINARY"))


def alpha_shape(df: DataFrame, by: str, alpha: float,
                lon: str = "lon", lat: str = "lat") -> DataFrame:
    """create_alpha_shape (vectorgeoms/__init__.py:1587): per group,
    the alpha shape of its points — Bowyer-Watson Delaunay + circum-
    radius filter + scanline union (geometry/delaunay.py; no
    scipy/alphashape in the sandbox). alpha <= 0 gives the convex
    hull region. One groupBy; each group triangulates locally, the
    same per-feature shape as the reference."""
    from ..geometry import delaunay as dl

    def _shape(key, pdf):
        pts = np.column_stack([pdf[lon].to_numpy(dtype=np.float64),
                               pdf[lat].to_numpy(dtype=np.float64)])
        pieces, area = dl.alpha_shape(pts, alpha)
        return pd.DataFrame(
            [(key[0], float(area), len(pieces),
              wkb.multipolygon_to_wkb([[p] for p in pieces]) if pieces
              else None)],
            columns=[by, "area", "n_pieces", "geometry"])

    by_type = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return df.select(by, lon, lat).groupBy(by).applyInPandas(
        _shape, schema=(f"{by} {by_type[by]}, area DOUBLE, "
                        "n_pieces INT, geometry BINARY"))
