"""Deterministic point derivation from the driver's TPC-H-ish tables.

The correctness gate compares a Spark query against DuckDB SQL over
the same parquet. Spatial operators need points; rather than shipping
a side-channel file, we derive (lon, lat) from integer keys with pure
int64 arithmetic — a Lehmer-style mixing (public PRNG constants 48271
/ 16807, Park-Miller) followed by one exactly-rounded division. The
identical SQL fragment is evaluated by both engines, so coordinates
are bit-identical. This plays the role of the reference's
deterministic geoparse (our pages generator does the same with URL
tokens — see pages.py).

meas is an integer-valued DOUBLE: sums/sums-of-squares of integers
are exact in IEEE doubles (< 2^53), which keeps aggregate queries
bit-reproducible across engines regardless of summation order.
"""

from __future__ import annotations

POINT_COLS = ["pt_id", "lon", "lat", "meas"]

# shared Spark-SQL / DuckDB projection over a key column.
# NOTE all literals are CAST(... AS DOUBLE): DuckDB types bare decimal
# literals as DECIMAL and would do exact decimal arithmetic, silently
# diverging from Spark's doubles. Large odd multipliers (Knuth's
# 2654435761 / 2246822519) wrap the globe many times per key for
# near-uniform dispersion even over small sequential key ranges.
LON_SQL = ("CAST(({key} * 2654435761) % 360000000 AS DOUBLE)"
           " / CAST(1000000 AS DOUBLE) - CAST(180 AS DOUBLE)")
LAT_SQL = ("CAST(({key} * 2246822519) % 180000000 AS DOUBLE)"
           " / CAST(1000000 AS DOUBLE) - CAST(90 AS DOUBLE)")
MEAS_SQL = "CAST({key} % 97 AS DOUBLE)"


def point_projection(key: str) -> dict:
    """Column-name → SQL-expression map for a derived point table."""
    return {
        "pt_id": key,
        "lon": LON_SQL.format(key=key),
        "lat": LAT_SQL.format(key=key),
        "meas": MEAS_SQL.format(key=key),
    }


def points_select_sql(table: str, key: str) -> str:
    """``SELECT pt_id, lon, lat, meas FROM table`` in shared SQL."""
    proj = point_projection(key)
    cols = ", ".join(f"{proj[c]} AS {c}" for c in POINT_COLS)
    return f"SELECT {cols} FROM {table}"


def points_df(spark, sf_dir: str, table: str = "orders", key: str = "o_orderkey"):
    """Spark DataFrame of derived points (selectExpr of the shared
    fragments — identical expression tree to the DuckDB oracle)."""
    proj = point_projection(key)
    return (
        spark.read.parquet(f"{sf_dir}/{table}.parquet")
        .selectExpr(*[f"{proj[c]} AS {c}" for c in POINT_COLS])
    )


# Small site table for kNN / radius queries: 64 deterministic sites
# from a range — mirrors the reference's small point layers
# (python_tests/data/zonalstats/..._pt_samples.geojson, 6 features).
N_SITES = 64
SITE_LON_SQL = ("CAST(({sid} * 7919 + 13) % 360000 AS DOUBLE)"
                " / CAST(1000 AS DOUBLE) - CAST(180 AS DOUBLE)")
SITE_LAT_SQL = ("CAST(({sid} * 104729 + 7) % 180000 AS DOUBLE)"
                " / CAST(1000 AS DOUBLE) - CAST(90 AS DOUBLE)")

SITES_SQL_DUCKDB = (
    "SELECT CAST(i AS BIGINT) AS site_id, "
    + SITE_LON_SQL.format(sid="i") + " AS site_lon, "
    + SITE_LAT_SQL.format(sid="i") + " AS site_lat "
    + f"FROM generate_series(0, {N_SITES - 1}) t(i)"
)


def sites_df(spark):
    return spark.range(N_SITES).selectExpr(
        "CAST(id AS BIGINT) AS site_id",
        SITE_LON_SQL.format(sid="id") + " AS site_lon",
        SITE_LAT_SQL.format(sid="id") + " AS site_lat",
    )
