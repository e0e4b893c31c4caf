"""Structured Streaming ingest: same transformations, event-time
windows + watermark, availableNow batch-parity check."""

import pytest
from pyspark.sql import functions as F

from rsgislib_spark.cells import quadcell
from rsgislib_spark.data import pages
from rsgislib_spark.functions.geoparse import geoparse
from rsgislib_spark.streaming import ingest


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "counts_out")
    ckpt = str(tmp_path / "ckpt")

    n = 3000
    pages.pages_df(spark, n).drop("lon_true", "lat_true").write.parquet(src)

    stream = ingest.stream_pages(spark, src)
    assert stream.isStreaming
    counts = ingest.windowed_tile_counts(stream, res=5, window="1 hour",
                                         watermark="30 minutes")
    ingest.run_available_now(counts, out, ckpt)

    got = spark.read.parquet(out)
    # batch twin of the same aggregation (append mode withholds
    # windows newer than the final watermark, so compare only closed
    # windows)
    batch = (
        geoparse(spark.read.parquet(src)).where("lon IS NOT NULL")
        .withColumn("cell", quadcell.cell_col("lon", "lat", 5))
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "cell")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "cell", "n_pages")
    )
    gkeys = {(r.window_start, r.cell): r.n_pages for r in got.collect()}
    bkeys = {(r.window_start, r.cell): r.n_pages for r in batch.collect()}
    assert len(gkeys) > 0
    for k, v in gkeys.items():
        assert bkeys[k] == v  # every emitted window matches batch exactly
    # emitted coverage = all but the last (open) window
    missing = set(bkeys) - set(gkeys)
    if missing:
        last_start = max(ws for ws, _ in bkeys)
        assert all(ws == last_start for ws, _ in missing)


def test_stream_resumes_from_checkpoint(spark, tmp_path):
    src = str(tmp_path / "pages_in2")
    out = str(tmp_path / "counts_out2")
    ckpt = str(tmp_path / "ckpt2")

    pages.pages_df(spark, 1000).drop("lon_true", "lat_true").write.parquet(src)
    counts = ingest.windowed_tile_counts(
        ingest.stream_pages(spark, src), res=5, window="1 hour")
    ingest.run_available_now(counts, out, ckpt)
    n1 = spark.read.parquet(out).count()

    # re-run with no new data: checkpoint prevents reprocessing
    counts2 = ingest.windowed_tile_counts(
        ingest.stream_pages(spark, src), res=5, window="1 hour")
    ingest.run_available_now(counts2, out, ckpt)
    assert spark.read.parquet(out).count() == n1
