"""Pages generator + geoparse tests (the input_hint invariants)."""

from pyspark.sql import functions as F

from rsgislib_spark.data import pages
from rsgislib_spark.functions.geoparse import geoparse

N = 2000


def test_schema(spark):
    df = pages.pages_df(spark, 10)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert got["url"] == "string"
    assert got["warc_ts"] == "timestamp"
    assert got["html"] == "binary"
    assert got["text"] == "string"
    assert got["lang"] == "string"


def test_extract_text_byte_identical(spark):
    """BASELINE.json input_hint: byte-identical extracted text per url."""
    df = pages.pages_df(spark, N)
    bad = df.where(
        F.encode(pages.extract_text(F.col("html")), "UTF-8") != F.encode("text", "UTF-8")
    ).count()
    assert bad == 0


def test_deterministic_regeneration(spark):
    a = pages.pages_df(spark, 500).orderBy("url").collect()
    b = pages.pages_df(spark, 500).orderBy("url").collect()
    assert a == b


def test_geoparse_geo_token_exact(spark):
    df = geoparse(pages.pages_df(spark, N))
    # rows with a geo token parse to within the 1e-4 print precision
    toks = df.where(F.col("text").contains("geo:"))
    bad = toks.where(
        (F.abs(F.col("lon") - F.col("lon_true")) > 1e-4)
        | (F.abs(F.col("lat") - F.col("lat_true")) > 1e-4)
    ).count()
    assert bad == 0


def test_geoparse_gazetteer_fallback(spark):
    df = geoparse(pages.pages_df(spark, N))
    no_tok = df.where(~F.col("text").contains("geo:"))
    assert no_tok.count() == N // 5
    # fallback coords = place center: within the +/-2 degree jitter
    bad = no_tok.where(
        (F.abs(F.col("lat") - F.col("lat_true")) > 2.001)
    ).count()
    assert bad == 0
    assert no_tok.where(F.col("lon").isNull()).count() == 0


def test_skew_by_construction(spark):
    """40% of pages in 3 hot places — the salting test bed. Measured
    at cell res 5 (~11 degree cells ≫ the ±2 degree jitter)."""
    from rsgislib_spark.cells import quadcell

    df = geoparse(pages.pages_df(spark, N)).selectExpr(
        quadcell.cell_sql("lon", "lat", 5) + " AS cell"
    )
    top = (
        df.groupBy("cell").count()
        .orderBy(F.desc("count")).limit(6).agg(F.sum("count")).collect()[0][0]
    )
    assert top > N * 0.3
