"""Expression library — the muparser analog.

The reference evaluates user expression strings per pixel through
muparser (band_math, python/src/imagecalc.cpp:1799; engine
src/img/RSGISBandMath.cpp:55 — full arithmetic, comparisons and the
?: ternary) and per vector row (vector_maths,
python/src/vectorutils.cpp:215). Spark SQL is a superset: we map the
expression language instead of porting the evaluator, and every
expression runs inside whole-stage codegen.

Also carries the band-index expression library
(imagecalc/calcindices.py:41-1215 — 25+ named index wrappers, each
one muparser expression, e.g. NDVI at :80:
"(nir+red)!=0?(nir-red)/(nir+red):-999").
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

_TERNARY = re.compile(r"([^?]+)\?([^:]+):(.+)")


def muparser_to_sql(expr: str) -> str:
    """Translate the muparser dialect to Spark SQL / ANSI SQL.

    Differences handled: the `cond ? a : b` ternary → CASE WHEN;
    `&&`/`||` → AND/OR; `!=` passes through. Nesting of ternaries is
    right-associative like muparser's.
    """
    expr = expr.strip()
    m = _TERNARY.match(expr)
    if m:
        cond, a, b = m.group(1), m.group(2), muparser_to_sql(m.group(3))
        return f"CASE WHEN {cond.strip()} THEN {a.strip()} ELSE {b} END"
    return expr.replace("&&", " AND ").replace("||", " OR ")


def band_math(df: DataFrame, out_col: str, expr: str) -> DataFrame:
    """band_math semantics (imagecalc.cpp:1799): named columns are the
    band variables; the expression becomes one codegen'd column."""
    return df.withColumn(out_col, F.expr(muparser_to_sql(expr)))


def ndvi(nir: str, red: str, no_data: float = -999.0) -> Column:
    """calcindices.py:80 semantics, guarded like the reference."""
    return F.expr(
        f"CASE WHEN ({nir} + {red}) != 0 THEN ({nir} - {red}) / ({nir} + {red}) "
        f"ELSE {no_data!r} END"
    )


def rescale(col: str, in_min: float, in_max: float, out_min: float,
            out_max: float) -> Column:
    """rescale_img_pxl_vals (imagecalc/__init__.py:859)."""
    return (
        (F.col(col) - in_min) / (in_max - in_min) * (out_max - out_min) + out_min
    )


def range_lut_case_sql(col: str, lut: list, default: str = "NULL") -> str:
    """add_numeric_col_range_lut (vectorattrs/__init__.py:1687): LUT
    of [lower, upper) ranges → value, compiled to one CASE WHEN chain
    (shared Spark/DuckDB SQL)."""
    whens = " ".join(
        f"WHEN {col} >= {lo!r} AND {col} < {hi!r} THEN {val!r}"
        for lo, hi, val in lut
    )
    return f"(CASE {whens} ELSE {default} END)"
