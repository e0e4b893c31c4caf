"""Real-H3 interop (probe-gated).

The engine's native cell index (cells/quadcell.py) fills H3's ROLE —
hierarchical, partitionable, arithmetic-only — but its ids are NOT H3
ids: a pipeline exporting ``cell`` columns to external H3 tooling
(h3-pandas, BigQuery jslibs, DuckDB h3 extension) would mis-join.
Where genuine H3 ids are required, this module assigns them with the
real ``h3`` library through an Arrow-batched pandas UDF — probed at
call time (same pattern as sources.catalog.iceberg_available and
operators.multimodal.decoders_available), so a cluster that has
``pip install h3`` gets true interop with no code change, and this
dependency-free container still imports cleanly.

Scale shape: identical to quadcell assignment — a stateless per-row
kernel, no shuffle; the UDF is the slow path (Python workers), so use
it only when external-id fidelity matters more than the pure-codegen
quadcell path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def h3_available() -> bool:
    """True iff the real ``h3`` python library is importable."""
    try:
        import h3  # noqa: F401

        return True
    except ImportError:
        return False


def assign_h3(df: DataFrame, lon: str = "lon", lat: str = "lat",
              res: int = 7, out_col: str = "h3_cell") -> DataFrame:
    """Add a REAL H3 cell id column (uint64 as BIGINT) at ``res``.

    Raises with guidance when the h3 library is absent — callers that
    only need a partition key should use quadcell.cell_col (JVM-side,
    no Python workers) instead.
    """
    if not h3_available():
        raise NotImplementedError(
            "real H3 ids need the 'h3' python library (pip install h3) — "
            "not in this container; for a partition/join key use "
            "cells.quadcell.cell_col (codegen, no UDF), which fills the "
            "same role with engine-local ids")

    import pandas as pd

    @F.pandas_udf("long")
    def _h3(lon_s: pd.Series, lat_s: pd.Series) -> pd.Series:
        import h3

        # int ids (not hex strings): joinable/partitionable as int64;
        # latlng_to_cell is the h3 v4 API
        return pd.Series(
            [int(h3.str_to_int(h3.latlng_to_cell(la, lo, res)))
             if lo == lo and la == la else None
             for lo, la in zip(lon_s, lat_s)],
            dtype="Int64")

    return df.withColumn(out_col, _h3(F.col(lon), F.col(lat)))
