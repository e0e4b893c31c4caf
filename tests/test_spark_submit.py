"""End-to-end spark-submit --py-files run (the north rule's exact
deployment mode): package zipped, shipped, job executed in a fresh
driver, resumable on re-run."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path):
    pkg_zip = shutil.make_archive(str(tmp_path / "rsgislib_spark"), "zip",
                                  REPO, "rsgislib_spark")
    out = str(tmp_path / "tiles")
    spark_submit = os.path.join(
        os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    cmd = [
        spark_submit, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", pkg_zip,
        os.path.join(REPO, "tools", "submit_job.py"),
        "--pages", "20000", "--out", out,
    ]
    env = {**os.environ, "PYTHONPATH": ""}  # prove --py-files does the work
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                        cwd=str(tmp_path), env=env)
    lines = [ln for ln in r1.stdout.splitlines() if ln.startswith("{")]
    assert lines, r1.stderr[-2000:]
    s1 = json.loads(lines[-1])
    assert s1["pages"] == 20000
    assert s1["geolocated"] == 20000
    assert s1["tiles_written"] > 0 and s1["tiles_skipped"] == 0

    # second run: resume skips every committed tile
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                        cwd=str(tmp_path), env=env)
    s2 = json.loads([ln for ln in r2.stdout.splitlines()
                     if ln.startswith("{")][-1])
    assert s2["tiles_written"] == 0
    assert s2["tiles_skipped"] == s1["tiles_written"]
