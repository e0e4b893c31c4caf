"""split-window thresholds (otsu/isodata/yen) + window correlation."""

import numpy as np
import pytest

from rsgislib_spark.operators import imagestats


def _bimodal(rng, n=2000, m1=10.0, m2=60.0):
    return np.concatenate([rng.normal(m1, 2.0, n), rng.normal(m2, 2.0, n)])


def test_threshold_methods_separate_bimodal_modes():
    rng = np.random.default_rng(11)
    vals = _bimodal(rng)
    for name, fn in imagestats.THRES_METHODS.items():
        t = fn(vals)
        # the inter-class criterion is flat across the empty valley, so
        # any gap threshold is valid — assert it separates the modes
        assert 12.0 < t < 58.0, (name, t)
        # threshold actually separates the classes almost perfectly
        assert (vals[: 2000] < t).mean() > 0.99, name
        assert (vals[2000:] > t).mean() > 0.99, name


def test_isodata_is_intermeans_fixed_point():
    rng = np.random.default_rng(5)
    vals = _bimodal(rng)
    t = imagestats._isodata_threshold(vals)
    lo, hi = vals[vals <= t], vals[vals > t]
    assert t == pytest.approx(0.5 * (lo.mean() + hi.mean()), abs=1e-6)


def test_split_window_thresholds_spark(spark):
    # two windows: left half bimodal around (10, 60), right half
    # around (100, 160); per-window otsu must fall between ITS modes
    rng = np.random.default_rng(3)
    rows = []
    for i in range(4000):
        x = int(rng.integers(0, 64))
        lo, hi = (10.0, 60.0)
        v = rng.normal(lo if i % 2 else hi, 2.0)
        rows.append((x, int(rng.integers(0, 64)), 1, float(v)))
    for i in range(4000):
        x = int(rng.integers(64, 128))
        v = rng.normal(100.0 if i % 2 else 160.0, 2.0)
        rows.append((x, int(rng.integers(0, 64)), 1, float(v)))
    grid = spark.createDataFrame(
        rows, "x BIGINT, y BIGINT, band INT, value DOUBLE")
    out = {(r.wx, r.wy): r.threshold
           for r in imagestats.split_window_thresholds(
               grid, win=64, method="otsu").collect()}
    assert 13.0 < out[(0, 0)] < 57.0
    assert 104.0 < out[(1, 0)] < 156.0


def test_split_window_min_n_vals_drops_sparse_windows(spark):
    rows = [(0, 0, 1, 1.0)] * 10 + [(70, 0, 1, float(v % 50))
                                    for v in range(500)]
    grid = spark.createDataFrame(
        rows, "x BIGINT, y BIGINT, band INT, value DOUBLE")
    out = imagestats.split_window_thresholds(
        grid, win=64, method="otsu", min_n_vals=100).collect()
    assert {(r.wx, r.wy) for r in out} == {(1, 0)}
