"""Skew-resilience evidence for the flagship pipeline (r4 verdict
ask #7).

The flagship JOIN itself (scan -> codegen cells -> broadcast cover
join -> codegen ray-cast refine) is map-only — a hot city cell adds
zero skew because matched rows stay spread across input partitions.
Skew bites at the stage AFTER the join: the tile write-back, which
hash-repartitions on the cell key so each tile lands in one task
(the Iceberg identity-partition layout of the north star). With one
city cell holding ~30% of all rows, the unsalted exchange puts ~30%
of the table in ONE task — adding executors then cannot shrink the
straggler, which is exactly what the N->4N rule punishes.

Four arms, identical job otherwise, at 2 and 8 executor JVMs
(local-cluster, addPyFile — the spark-submit --py-files path):

  unsalted       repartition(cell)        — the straggler baseline
  salted         repartition_by_cell(cell, hot=<precomputed list>) —
                 salt splits hot cells across 16 buckets; the hot
                 list is what a catalog stat / previous manifest
                 provides at scale
  salted_inline  same, but hot cells detected inline — pays a full
                 re-execution of the upstream pipeline per run (the
                 honest cost of not knowing the skew ahead of time)
  rebalance      REBALANCE(cell) hint     — AQE's built-in skew
                 splitting for this case (legal here because a
                 partitionBy(cell) write MAY split one cell across
                 files; AQE does NOT split a plain repartition(col))

Writes BENCH/skew_bench.md and prints one JSON line.
Usage: python tools/skew_bench.py [n_rows]   (default 16M; run alone)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ~30% of rows in ONE res-7 cell around (-60,-5), inside the
# 'amazonia' fixture polygon so the hot rows SURVIVE the join; the
# rest spread over the world (a share lands in other polygons).
GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from rsgislib_spark.session import get_spark

spark = get_spark("gen-skew", master="local[32]",
                  **{{"spark.driver.memory": "24g"}})
spark.sparkContext.setLogLevel("ERROR")
(spark.range({n_rows}).selectExpr(
    "id AS pt_id",
    "CASE WHEN id % 10 < 3 THEN -60.0 + (id % 997) * 0.00001 "
    " ELSE -180.0 + ((id * 2654435761) % 360000) * 0.001 END AS lon",
    "CASE WHEN id % 10 < 3 THEN -5.0 + (id % 991) * 0.00001 "
    " ELSE -60.0 + ((id * 40503) % 130000) * 0.001 END AS lat",
    "md5(CAST(id AS STRING)) AS payload")
 .repartition(256)
 .write.mode("overwrite").parquet({path!r}))
"""

JOB = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from rsgislib_spark.session import get_spark
from rsgislib_spark.cells import quadcell
from rsgislib_spark.data import fixtures
from rsgislib_spark.operators import spatial_join as sj, tiling

NEXEC = {nexec}
ARM = {arm!r}
spark = get_spark("skew", master=f"local-cluster[{{NEXEC}},4,8192]",
                  **{{"spark.sql.shuffle.partitions": str(NEXEC * 16),
                      "spark.driver.memory": "4g",
                      "spark.executor.memory": "7g"}})
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.addPyFile({pkg_zip!r})

pts = spark.read.parquet({path!r}).selectExpr(
    "*", quadcell.cell_sql("lon", "lat", 7) + " AS cell_r7")
idx = sj.PolygonIndex.from_fixture(fixtures.POLYGONS)
joined = sj.spatial_join(pts, idx, how="inner")

if ARM == "unsalted":
    out = joined.repartition("cell_r7")
elif ARM == "salted":
    # hot list precomputed OUTSIDE the timed region (at scale this is
    # a catalog stat / previous run's manifest — inline detection
    # re-executes the whole upstream pipeline per run, see
    # 'salted_inline'); localCheckpoint materializes it once
    hot = tiling.hot_cells(joined, "cell_r7",
                           {n_rows} // (NEXEC * 16)).localCheckpoint()
    out = tiling.repartition_by_cell(joined, "cell_r7", hot=hot)
elif ARM == "salted_inline":
    # threshold: anything over ~2 balanced partitions' worth is hot
    out = tiling.repartition_by_cell(
        joined, "cell_r7", threshold_rows={n_rows} // (NEXEC * 16))
elif ARM == "rebalance":
    out = joined.hint("rebalance", "cell_r7")
else:
    raise SystemExit(f"bad arm {{ARM}}")

def once():
    # REAL sink work (parquet encode+compress) — with a noop sink the
    # post-exchange cost is so small the straggler signal drowns in
    # this VM's window noise; the write-back's per-row encode cost is
    # what the hot task actually pays at scale
    t0 = time.time()
    out.write.mode("overwrite").parquet("/tmp/skew_sink.parquet")
    return time.time() - t0

once()  # warm (JIT, codegen, shuffle-file page cache)
dt = min(once(), once())
print(json.dumps({{"arm": ARM, "executors": NEXEC, "cores": NEXEC * 4,
                   "sec": round(dt, 2),
                   "rows_per_sec": round({n_rows} / dt, 1)}}))
"""


def run(nexec: int, arm: str, n_rows: int, path: str, pkg_zip: str) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_HOME", os.path.dirname(
        subprocess.run([sys.executable, "-c",
                        "import pyspark; print(pyspark.__file__)"],
                       capture_output=True, text=True).stdout.strip()))
    code = JOB.format(repo=REPO, nexec=nexec, arm=arm, n_rows=n_rows,
                      path=path, pkg_zip=pkg_zip)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1500, cwd=REPO, env=env)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-3000:])
        raise RuntimeError(f"skew job failed: {arm} at {nexec} executors")
    return json.loads(lines[-1])


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    path = os.environ.get("SKEW_PAGES_PATH", "/tmp/skew_points.parquet")
    pkg_zip = shutil.make_archive("/tmp/rsgislib_spark", "zip", REPO,
                                  "rsgislib_spark")
    marker = path + f".n{n_rows}.ok"
    if not os.path.exists(marker):
        gen = subprocess.run(
            [sys.executable, "-c",
             GEN.format(repo=REPO, n_rows=n_rows, path=path)],
            capture_output=True, text=True, timeout=1200, cwd=REPO)
        if gen.returncode != 0:
            sys.stderr.write(gen.stderr[-2000:])
            sys.exit(1)
        open(marker, "w").write("ok")

    arms = ("unsalted", "salted", "salted_inline", "rebalance")
    # two interleaved repetitions, 2-exec and 8-exec adjacent per arm:
    # this VM's bursts last minutes and poison whole JVM runs, so each
    # cell keeps its best-of-2 ACROSS repetitions (each JVM run is
    # itself warm + best-of-2 inside)
    res: dict = {}
    for rep in range(2):
        for arm in arms:
            for nexec in (2, 8):
                r = run(nexec, arm, n_rows, path, pkg_zip)
                print(json.dumps(r), file=sys.stderr)
                prev = res.get((arm, nexec))
                if prev is None or r["sec"] < prev["sec"]:
                    res[(arm, nexec)] = r
    eff = {arm: round((res[(arm, 8)]["rows_per_sec"]
                       / res[(arm, 2)]["rows_per_sec"]) / 4.0, 3)
           for arm in arms}

    ts = time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())
    lines = [
        "# Skew-resilience bench — hot city cell vs the tile write-back "
        "exchange",
        "",
        f"{n_rows:,} points, ~30% in ONE res-7 cell (inside 'amazonia'),"
        f" run {ts}.",
        "Job: scan -> codegen cell assign -> flagship spatial join "
        "(broadcast + codegen refine, map-only, skew-immune) -> "
        "cell-keyed exchange -> parquet sink (the tile write-back). "
        "local-cluster[2] vs [8], addPyFile; best-of-2 interleaved "
        "repetitions per cell.",
        "",
        "| arm | 8-core sec | 32-core sec | 8-core rows/s | 32-core "
        "rows/s | N->4N raw eff |",
        "|---|---|---|---|---|---|",
    ]
    for arm in arms:
        a, b = res[(arm, 2)], res[(arm, 8)]
        lines.append(
            f"| {arm} | {a['sec']} | {b['sec']} | {a['rows_per_sec']:,} "
            f"| {b['rows_per_sec']:,} | **{eff[arm]}** |")
    lines += [
        "",
        "Reading: the unsalted arm's 32-core time is floored by the one "
        "task holding the hot cell (~30% of input rows, a larger share "
        "of joined rows), so its N->4N efficiency collapses. "
        "salt_hot_cells splits the hot cell across 16 salted buckets; "
        "'salted' uses a PRECOMPUTED hot list (what a catalog stat or "
        "the previous run's manifest provides at scale), "
        "'salted_inline' detects hot cells inline — which re-executes "
        "the whole upstream pipeline for the detection pass and is the "
        "honest cost of not knowing the skew ahead of time. The "
        "REBALANCE hint is AQE's built-in skew splitting, legal for "
        "this shape because a partitionBy(cell) write may split one "
        "cell across files (a plain repartition(col) is NOT skew-split "
        "by AQE); it needs no prior knowledge and no extra pass, so it "
        "is the default recommendation for the write-back stage — the "
        "salt remains for exact-key joins and strict one-task-per-tile "
        "kernels (see salt_hot_cells docstring).",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "skew_bench.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"n_rows": n_rows, "efficiency": eff,
                      "runs": {f"{a}_{n}": r for (a, n), r in res.items()}}))


if __name__ == "__main__":
    main()
