"""Multimodal plumbing: schemas, Arrow batch shapes, determinism."""

import pytest
from pyspark.sql import functions as F

from rsgislib_spark.operators import multimodal


@pytest.fixture(scope="module")
def blobs(spark):
    return spark.createDataFrame(
        [(i, bytearray(f"media-payload-{i % 3}".encode())) for i in range(30)],
        "media_id BIGINT, blob BINARY")


def test_media_meta(spark, blobs):
    out = multimodal.media_meta(blobs, kind="image").collect()
    assert len(out) == 30
    by_sha = {}
    for r in out:
        assert r.n_bytes == len(f"media-payload-{r.media_id % 3}")
        by_sha.setdefault(r.sha1, set()).add(r.media_id % 3)
    # identical payloads share digests (3 distinct payloads)
    assert len(by_sha) == 3


def test_decode_features_deterministic(spark, blobs):
    a = {r.media_id: r.features
         for r in multimodal.decode_features(blobs).collect()}
    b = {r.media_id: r.features
         for r in multimodal.decode_features(blobs).collect()}
    assert a == b
    # feature vector: 3 means + 3 stds + 64 gray pixels
    assert all(len(v) == 70 for v in a.values())
    # same payload -> same features
    assert a[0] == a[3] and a[1] == a[4]


def test_decode_real_raises(spark, blobs):
    with pytest.raises(NotImplementedError):
        multimodal.decode_features(blobs, use_stub=False)


def test_frame_sample_plan(spark):
    vids = spark.createDataFrame(
        [(1, 100), (2, 31)], "media_id BIGINT, n_frames INT")
    out = multimodal.frame_sample_plan(vids, every_k=30).collect()
    got = {(r.media_id, r.frame_idx) for r in out}
    assert got == {(1, 0), (1, 30), (1, 60), (1, 90), (2, 0), (2, 30)}
