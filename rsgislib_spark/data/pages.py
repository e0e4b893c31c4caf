"""Synthetic Common-Crawl-style pages table (BASELINE.json input_hint:
url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Generated entirely as Column expressions over ``spark.range(n)`` — no
driver-side data, no Python in the loop — so the same generator scales
from the 10^4-row pytest fixture to multi-million-row bench tables
(and would scale to 10^12 on a cluster: it is a pure map over a range,
embarrassingly parallel, ~n/partitions rows per task).

Determinism: every column is a closed-form function of the row id
(Lehmer-mix arithmetic, fixed epoch), so fixtures regenerate
bit-identically (FIXTURES.md: seed is structural, not an RNG stream).

Skew by construction: 40% of pages land in 3 "city" gazetteer entries
(hot H3 cells) — exercising the salted-repartition path the north
star requires for dense cells.

Invariant: ``text`` is byte-identical to the text wrapped in ``html``
(extract_text() recovers it exactly) — the per-row invariant from
BASELINE.json input_hint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_PLACES = 50
N_CITIES = 3  # gazetteer entries 0..2 are hot (skew)
LANGS = ["en", "de", "fr", "es", "pt"]
TLDS = ["com", "org", "net", "io", "info"]

PLACE_LON_SQL = "(({j} * 48271 + 11) % 360000) / 1000.0 - 180.0"
PLACE_LAT_SQL = "(({j} * 16807 + 23) % 180000) / 1000.0 - 90.0"


def gazetteer_rows() -> list:
    """(name, lon, lat) for the rule-based geoparse lookup."""
    rows = []
    for j in range(N_PLACES):
        lon = ((j * 48271 + 11) % 360000) / 1000.0 - 180.0
        lat = ((j * 16807 + 23) % 180000) / 1000.0 - 90.0
        rows.append((f"loc{j}", lon, lat))
    return rows


def gazetteer_df(spark) -> DataFrame:
    return spark.range(N_PLACES).selectExpr(
        "concat('loc', CAST(id AS STRING)) AS place",
        PLACE_LON_SQL.format(j="id") + " AS place_lon",
        PLACE_LAT_SQL.format(j="id") + " AS place_lat",
    )


def _wrap_lon(c: Column) -> Column:
    """Wrap to [-180, 180) handling negatives."""
    return ((c + F.lit(180.0)) % 360.0 + 360.0) % 360.0 - 180.0


def pages_df(spark, n: int, partitions: int | None = None) -> DataFrame:
    """The synthetic pages table, n rows."""
    rng = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    i = F.col("id")

    # skewed place assignment: 40% of rows in N_CITIES hot places
    place_j = F.when(i % 10 < 4, (i % N_CITIES).cast("long")).otherwise(
        (i * 2654435761) % N_PLACES
    )
    place = F.concat(F.lit("loc"), place_j.cast("string"))
    place_lon = F.expr(PLACE_LON_SQL.format(j="pj"))
    place_lat = F.expr(PLACE_LAT_SQL.format(j="pj"))

    # +/- 2 degree jitter around the place center, wrapped/clamped
    dlon = ((i * 69621 + 3) % 4001) / 1000.0 - 2.0
    dlat = ((i * 40692 + 5) % 4001) / 1000.0 - 2.0

    df = (
        rng.withColumn("pj", place_j)
        .withColumn("place", place)
        .withColumn("lon_true", _wrap_lon(place_lon + dlon))
        .withColumn(
            "lat_true",
            F.least(F.lit(89.999), F.greatest(F.lit(-89.999), place_lat + dlat)),
        )
    )

    # text embeds the place name and (for 4 of 5 rows) an explicit geo
    # token; rows with id%5=4 only carry the place name, exercising the
    # gazetteer fallback of the geoparse (rule-based, reproducible)
    geo_tok = F.when(
        F.col("id") % 5 != 4,
        F.concat(
            F.lit(" geo:"),
            F.format_string("%.4f", F.col("lon_true")),
            F.lit(","),
            F.format_string("%.4f", F.col("lat_true")),
        ),
    ).otherwise(F.lit(""))

    text = F.concat(
        F.lit("Page "), F.col("id").cast("string"),
        F.lit(" near "), F.col("place"),
        geo_tok,
        F.lit(" lorem ipsum crawl corpus sample."),
    )

    df = df.select(
        F.concat(
            F.lit("https://host"), (i % 97).cast("string"),
            F.lit(".example."),
            F.element_at(F.array(*[F.lit(t) for t in TLDS]), (i % 5 + 1).cast("int")),
            F.lit("/"), F.col("place"), F.lit("/"), i.cast("string"),
        ).alias("url"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=(i * 37).cast("double"))).alias("warc_ts"),
        F.concat(
            F.lit("<html><body>").cast("binary"),
            F.encode(text, "UTF-8"),
            F.lit("</body></html>").cast("binary"),
        ).alias("html"),
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(lg) for lg in LANGS]), (i % 5 + 1).cast("int")
        ).alias("lang"),
        F.col("lon_true"), F.col("lat_true"),  # goldens for tests; engine never reads them
    )
    return df


def extract_text(html: Column) -> Column:
    """Recover the text payload from html, byte-identical (the
    input_hint invariant). <html><body> is 12 bytes, </body></html>
    is 14."""
    return F.decode(
        F.expr("substring(html, 13, length(html) - 26)")
        if isinstance(html, str) else
        html.substr(F.lit(13), F.length(html) - 26),
        "UTF-8",
    )
