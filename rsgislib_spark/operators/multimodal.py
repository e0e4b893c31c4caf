"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata
struct — the pattern the task brief prescribes. The decode kernels
(libjpeg/ffmpeg-class work) are NOT in this container, so the decode
step is stubbed behind ``decode_stub`` (deterministic fake) /
``NotImplementedError`` — but the Spark-side plumbing is real:
schemas, Arrow batch shapes, mapInPandas signatures, partition
behaviour are all exercised by tests.

RSGISLib analogs: its rasters ARE decoded images; get_img_size /
band metadata (imageutils), image stretching and resampling
(imageutils/__init__.py resample/stretch families) map to the
resize/feature steps here.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "media_id BIGINT, kind STRING, n_bytes BIGINT, sha1 STRING, "
    "width INT, height INT, n_frames INT, sample_rate INT"
)

def decoders_available() -> bool:
    """True iff a real image decoder (PIL) is importable — probed at
    call time, same pattern as sources.catalog.iceberg_available, so
    a cluster WITH the library gets real decode with no code change.
    (This container has no PIL/ffmpeg; the stub path runs here.)"""
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


def media_meta(df: DataFrame, id_col: str = "media_id",
               blob_col: str = "blob", kind: str = "image") -> DataFrame:
    """Cheap JVM-side metadata: size + digest (no decode). At 100 TB
    this runs at scan speed and is the dedup/lineage key for blobs."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.length(blob_col).alias("n_bytes"),
        F.sha1(blob_col).alias("sha1"),
    )


def _fake_decode(blob: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: 8x8x3 uint8 array
    derived from the blob digest. Replaces libjpeg in tests; the
    REAL decoder drops into decode_batch below unchanged."""
    h = hashlib.sha256(blob).digest()
    rng = np.frombuffer((h * 6)[:192], dtype=np.uint8)
    return rng.reshape(8, 8, 3)


def _real_decode(blob: bytes) -> np.ndarray:
    """PIL decode → 8x8x3 uint8 (RGB, thumbnail-resized to the same
    shape the stub produces, so the feature schema is identical)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(blob)).convert("RGB").resize((8, 8))
    return np.asarray(img, dtype=np.uint8)


def decode_features(df: DataFrame, id_col: str = "media_id",
                    blob_col: str = "blob",
                    use_stub: bool | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of
    blobs in, fixed-width feature vectors out) — the real pipeline
    shape: one python worker per partition, batch-vectorized, no
    per-row round trips.

    Features: mean/std per channel + 8x8 gray thumbnail (the classic
    embedding-ish shape). use_stub=None (default) probes for a real
    decoder (decoders_available) and falls back to the deterministic
    stub; True forces the stub; False requires the real decoder and
    raises where none is installed (this container).

    The probe runs on the DRIVER but decoding runs in executor python
    workers; on a heterogeneous cluster (PIL on the driver image only)
    each worker re-checks and raises a targeted error naming the
    mismatch instead of an opaque ImportError mid-task. The converse
    (executors have PIL, driver doesn't) selects the stub — pass
    use_stub=False to force the real path in that setup.
    """
    if use_stub is None:
        use_stub = not decoders_available()
    if not use_stub and not decoders_available():
        raise NotImplementedError(
            "real image decoding needs PIL/ffmpeg — not in this container; "
            "use use_stub=True (deterministic fake) for plumbing tests")

    def _decode(batches):
        if use_stub:
            decode = _fake_decode
        else:
            if not decoders_available():
                raise ImportError(
                    "the driver probe found PIL but this EXECUTOR's python "
                    "has none (heterogeneous images) — install PIL on the "
                    "executor image or pass use_stub=True")
            decode = _real_decode
        for pdf in batches:
            ids, feats = [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                arr = decode(bytes(blob))
                gray = arr.mean(axis=2)
                vec = np.concatenate([
                    arr.reshape(-1, 3).mean(axis=0),
                    arr.reshape(-1, 3).std(axis=0),
                    gray.ravel() / 255.0,
                ])
                ids.append(mid)
                feats.append([float(x) for x in vec])
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return df.mapInPandas(
        _decode, schema="media_id BIGINT, features ARRAY<DOUBLE>")


def frame_sample_plan(df: DataFrame, id_col: str = "media_id",
                      n_frames_col: str = "n_frames",
                      every_k: int = 30) -> DataFrame:
    """Video frame-sampling PLAN: explode (media_id, frame_idx) rows
    for every k-th frame — pure JVM; the decode of each sampled frame
    is the stubbed step. This is the partition-explosion pattern for
    video corpora (one row per sampled frame, repartitionable)."""
    idx = F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_k))
    return df.select(F.col(id_col).alias("media_id"),
                     F.explode(idx).alias("frame_idx"))
