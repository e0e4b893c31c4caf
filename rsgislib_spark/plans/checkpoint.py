"""Per-partition checkpoint manifests: lineage + row counts +
skip-if-committed resume.

The reference's restartability is implicit in its file-per-tile
layout: create_tiles_multi_core writes independent tile files
(imageutils/__init__.py:2813) and calc_dist_to_img_vals_tiled globs
already-finished tiles before dispatching work
(imagecalc/__init__.py:380-396 — the glob-and-skip is the resume).
We make that explicit: every stage writes a manifest row per tile
(cell id, row count, input lineage fingerprint, wall time); a re-run
prunes tiles whose manifest entry matches, overwrites the rest via
dynamic partition overwrite (idempotent).

Manifests are plain JSON-lines next to the output (an Iceberg
deployment would put this in snapshot metadata; the JSONL keeps the
sandbox dependency-free while exercising identical logic).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F

MANIFEST_NAME = "_rsgis_manifest.jsonl"


def lineage_fingerprint(df: DataFrame, extra: str = "") -> str:
    """Fingerprint of the logical plan + engine version + caller tag —
    if the plan changes, every tile recomputes; if only data volume
    changes, per-tile row counts catch it."""
    import hashlib

    from .. import __version__

    plan = df._jdf.queryExecution().logical().toString()
    return hashlib.sha256(
        (plan + __version__ + extra).encode()
    ).hexdigest()[:16]


def read_manifest(path: str) -> dict:
    """tile_key -> manifest entry."""
    mf = os.path.join(path, MANIFEST_NAME)
    out = {}
    if os.path.exists(mf):
        with open(mf) as f:
            for line in f:
                e = json.loads(line)
                out[e["tile"]] = e
    return out


def committed_tiles(path: str, fingerprint: str) -> set:
    """Tiles already written under the SAME lineage fingerprint."""
    return {
        t for t, e in read_manifest(path).items()
        if e.get("lineage") == fingerprint
    }


def checkpointed_write(df: DataFrame, path: str, cell_col: str,
                       extra_lineage: str = "",
                       prune_stale: bool = False) -> dict:
    """Resumable cell-partitioned write.

    1. compute the lineage fingerprint of ``df``;
    2. skip tiles already committed under that fingerprint
       (anti-join — pruning happens BEFORE compute, like the
       reference's glob-and-skip);
    3. write the remaining tiles with dynamic partition overwrite
       (idempotent on retry);
    4. append per-tile manifest rows (tile, rows, lineage, ts).

    prune_stale=True additionally deletes on-disk partitions that the
    MANIFEST records under a different lineage and this plan no longer
    produces (full-output-replacement semantics — reads never mix
    stale tiles after a plan change). It is opt-in, and deletion is
    keyed on the manifest: partitions this writer never recorded
    (foreign data, tile subsets from append-style runs without a
    manifest row) are NEVER touched, so a benign lineage change cannot
    destroy data the manifest doesn't own.

    Returns {written: n_tiles, skipped: n_tiles, pruned: n, rows: n}.
    """
    fp = lineage_fingerprint(df, extra_lineage)
    manifest = read_manifest(path)
    done = {t for t, e in manifest.items() if e.get("lineage") == fp}
    todo = df
    if done:
        spark = df.sparkSession
        done_df = spark.createDataFrame(
            [(int(t),) for t in done], f"{cell_col} BIGINT")
        todo = df.join(F.broadcast(done_df), cell_col, "left_anti")

    # persist todo so the manifest counts and the write are ONE
    # materialization — a non-deterministic input can't make them
    # disagree (the counts ARE the written rows)
    todo = todo.persist()
    try:
        counts = {
            r[0]: r[1]
            for r in todo.groupBy(cell_col).agg(F.count("*").alias("n"))
            .collect()
        }
        if counts:
            (
                todo.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(cell_col)
                .parquet(path)
            )
    finally:
        todo.unpersist()

    # this plan's full tile set; optionally prune MANIFEST-KNOWN tiles
    # a superseded lineage left behind (never unrecorded partitions —
    # the manifest is the ownership boundary)
    produced = {int(t) for t in done} | {int(t) for t in counts}
    stale = {
        int(t) for t, e in manifest.items()
        if e.get("lineage") != fp and int(t) not in produced
    }
    pruned = 0
    pruned_tiles: set = set()
    if prune_stale and stale and os.path.isdir(path):
        import shutil

        for tile in stale:
            part = os.path.join(path, f"{cell_col}={tile}")
            if os.path.isdir(part):
                shutil.rmtree(part)
            pruned_tiles.add(tile)
            pruned += 1

    # rewrite the manifest atomically: fresh entries for this run's
    # tiles, prior entries kept for every tile not pruned (append-run
    # subsets under other lineages stay recorded AND on disk)
    ts = time.time()
    os.makedirs(path, exist_ok=True)
    entries = {
        int(t): e for t, e in manifest.items()
        if int(t) not in pruned_tiles
    }
    for tile, n in counts.items():
        entries[int(tile)] = {"tile": int(tile), "rows": int(n),
                              "lineage": fp, "ts": ts}
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        for tile in sorted(entries):
            f.write(json.dumps(entries[tile]) + "\n")
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))

    return {
        "written": len(counts),
        "skipped": len(done),
        "pruned": pruned,
        "rows": int(sum(counts.values())),
        "lineage": fp,
    }
