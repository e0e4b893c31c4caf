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


def test_stateful_first_seen_dedup_across_batches(spark, tmp_path):
    """State must persist ACROSS micro-batch runs via the checkpoint:
    a URL recrawled in a later batch is dropped."""
    import datetime as dt

    from rsgislib_spark.streaming import ingest, stateful

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def rows(batch):
        return spark.createDataFrame(
            batch, "url STRING, warc_ts TIMESTAMP, html BINARY, "
                   "text STRING, lang STRING")

    rows([
        ("http://a/1", t0, None, "first crawl a", "en"),
        ("http://a/1", t0 + dt.timedelta(minutes=5), None, "dup in batch", "en"),
        ("http://b/2", t0, None, "first crawl b", "en"),
    ]).write.mode("append").parquet(src)

    stream = ingest.stream_pages(spark, src)
    deduped = stateful.first_seen_dedup(stream)
    ingest.run_available_now(deduped, out, ckpt)

    got1 = {r.url: r.text for r in spark.read.parquet(out).collect()}
    assert got1 == {"http://a/1": "first crawl a",
                    "http://b/2": "first crawl b"}

    # second batch: one recrawl (must be dropped) + one new url
    rows([
        ("http://a/1", t0 + dt.timedelta(hours=1), None, "recrawl a", "en"),
        ("http://c/3", t0 + dt.timedelta(hours=1), None, "first crawl c", "en"),
    ]).write.mode("append").parquet(src)

    deduped2 = stateful.first_seen_dedup(ingest.stream_pages(spark, src))
    ingest.run_available_now(deduped2, out, ckpt)

    got2 = {r.url: r.text for r in spark.read.parquet(out).collect()}
    assert got2 == {"http://a/1": "first crawl a",
                    "http://b/2": "first crawl b",
                    "http://c/3": "first crawl c"}


def test_stream_spatial_join_matches_batch(spark, tmp_path):
    """The streaming spatial join (geoparse → cells → broadcast join
    → codegen refine, append mode, no watermark) emits exactly the
    batch join's (url, poly_id) pairs."""
    from rsgislib_spark.data import fixtures
    from rsgislib_spark.operators import spatial_join as sj

    src = str(tmp_path / "pages_sj_in")
    out = str(tmp_path / "pairs_out")
    ckpt = str(tmp_path / "sj_ckpt")

    pages.pages_df(spark, 3000).drop("lon_true", "lat_true").write.parquet(src)
    idx = sj.PolygonIndex.from_fixture(fixtures.POLYGONS)

    joined = ingest.stream_spatial_join(ingest.stream_pages(spark, src), idx)
    assert joined.isStreaming
    ingest.run_available_now(joined.select("url", "poly_id"), out, ckpt)

    got = {(r.url, r.poly_id) for r in spark.read.parquet(out).collect()}
    batch_pts = geoparse(spark.read.parquet(src)).where("lon IS NOT NULL")
    want = {(r.url, r.poly_id)
            for r in sj.spatial_join(batch_pts, idx, how="inner")
            .select("url", "poly_id").collect()}
    assert got == want and len(want) > 0


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Batch-equivalence: sessions closed by the stream (across TWO
    micro-batch runs, state persisted via the checkpoint) must equal
    the batch window-plan sessionization of the same events, value
    for value (session_seq, n_events, dur_us)."""
    import datetime as dt

    from pyspark.sql import Window, functions as F

    from rsgislib_spark.streaming import stateful

    src = str(tmp_path / "ev_in")
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ck")
    t0 = dt.datetime(2026, 1, 1, 8, 0, 0)

    def mins(m):
        return t0 + dt.timedelta(minutes=m)

    def rows(batch):
        return spark.createDataFrame(
            batch, "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT")

    # user 1: two sessions in batch A (gap 45 > 30 min), one spanning
    # the A/B boundary; user 2: one session entirely in batch A
    batch_a = [(1, mins(0), 1), (2, mins(10), 1),    # u1 s1
               (3, mins(55), 1), (4, mins(60), 1),   # u1 s2...
               (10, mins(0), 2), (11, mins(20), 2)]  # u2 s1
    batch_b = [(5, mins(70), 1),                     # ...u1 s2 cont.
               (6, mins(120), 1)]                    # u1 s3
    # sentinels: one far-future event per user flushes the open session
    flush = [(98, mins(10000), 1), (99, mins(10000), 2)]

    real = rows(batch_a + batch_b)

    rows(batch_a).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT").parquet(src)
    q = (stateful.sessionize_stream(stream)
         .writeStream.outputMode("append").format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    rows(batch_b + flush).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT").parquet(src)
    q2 = (stateful.sessionize_stream(stream2)
          .writeStream.outputMode("append").format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination()

    got = {(r.user_id, r.session_seq): (r.n_events, r.dur_us)
           for r in spark.read.parquet(out).collect()}

    # batch oracle: the q_sessionize window plan on the real events
    us = F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = us - F.lag(us).over(w)
    sess = real.withColumn(
        "session_seq",
        F.sum(F.when(gap.isNull() | (gap > 1_800_000_000), 1)
              .otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    want = {(r.user_id, r.session_seq): (r.n_events, r.dur_us)
            for r in sess.groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"),
                 (F.max(us) - F.min(us)).alias("dur_us")).collect()}

    assert got == want
    assert (1, 2) in got and got[(1, 2)][0] == 3  # the A/B-spanning session
