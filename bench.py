"""Benchmark runner (driver contract).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Headline: the north-star pipeline — generate Common-Crawl-style pages,
geoparse, assign H3-role+S2-role cells, spatial-join against the
polygon layer, count matches — measured in pages/sec.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_PAGES (default 1_000_000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_headline(spark, n_pages: int) -> dict:
    from rsgislib_spark.cells import quadcell, s2cell
    from rsgislib_spark.data import fixtures, pages
    from rsgislib_spark.functions.geoparse import geoparse
    from rsgislib_spark.operators import spatial_join as sj

    t0 = time.time()
    pg = pages.pages_df(spark, n_pages).drop("lon_true", "lat_true")
    pts = geoparse(pg)
    pts = pts.selectExpr(
        "*",
        quadcell.cell_sql("lon", "lat", 9) + " AS cell_r9",
        s2cell.cell_sql("lon", "lat", 10) + " AS s2_cell",
    )
    idx = sj.PolygonIndex.from_fixture(fixtures.POLYGONS)
    joined = sj.spatial_join(pts.where("lon IS NOT NULL"), idx, how="inner")
    n_matched = joined.count()
    dt = time.time() - t0
    return {
        "headline_sec": dt,
        "pages": n_pages,
        "pages_per_sec": n_pages / dt,
        "matched": n_matched,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_pages = int(os.environ.get("BENCH_PAGES", "1000000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from rsgislib_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    # Headline FIRST, before the 70-query sweep: iterative operators
    # localCheckpoint/persist blocks that ContextCleaner frees lazily,
    # and after ~70 queries the JVM carries GC/storage pressure that
    # taxes whatever runs last (observed: the same headline 1.4s in a
    # fresh JVM, 4-9s at the tail of the sweep). The headline measures
    # the pipeline, not the sweep's residue. Median of 3 timed runs
    # after one warm pass damps this host's bursty CPU steal; the warm
    # must use the SAME page count — the Range literal is baked into
    # the generated code, so a different warm size leaves a fresh
    # Janino compile of the refine CASE inside the timed region.
    run_headline(spark, n_pages)  # warm
    heads = sorted((run_headline(spark, n_pages) for _ in range(3)),
                   key=lambda h: h["headline_sec"])
    head = heads[1]

    # steady-state timing: run each query once to warm (JIT, codegen
    # compile, python-worker spawn), time the second run — this VM has
    # bursty host CPU steal, and cold runs vary 2-10x
    # Between queries, drop py4j proxies and nudge both GCs: iterative
    # operators (kNN rings, clump, attr_knn) localCheckpoint/persist
    # intermediates whose JVM blocks are only freed by ContextCleaner
    # once the driver references die. Without this, blocks pile up
    # across the 70-query sequence and late queries pay GC/storage
    # pressure the early ones didn't (observed: a 0.4s tail query
    # measuring 6s after 50 predecessors). The gc runs OUTSIDE the
    # timed region.
    import gc

    def drop_residue() -> None:
        # Iterative operators (knn_kring, clump, attr_knn) leave
        # localCheckpoint blocks pinned in the block manager — the
        # ContextCleaner only frees them when the py4j proxies die,
        # and even then lazily. Unpersist them eagerly (non-blocking)
        # so query N+1 isn't taxed by query N's storage.
        jsc = spark.sparkContext._jsc
        for rdd in jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    qtimes: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        drop_residue()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        qtimes[name] = round(time.time() - t0, 3)
        drop_residue()

    out = {
        "metric": "pages_geoparse_cellassign_spatialjoin_throughput",
        "value": round(head["headline_sec"], 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pages": head["pages"],
        "pages_per_sec": round(head["pages_per_sec"], 1),
        "matched_pairs": head["matched"],
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }

    # attach the latest two-cluster-size scaling evidence (written by
    # tools/scaling_bench.py into BENCH/BASELINE.md) so every round's
    # BENCH_r{N}.json carries it
    baseline = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH", "BASELINE.md")
    if os.path.exists(baseline):
        import re

        txt = open(baseline).read()
        sc = {}
        # primary (first) run row: | run | 8 exec (32 cores) | sec |
        # pages/sec | **raw** | ceiling | eng/ceiling |
        row = re.search(
            r"8 exec(?:utors)? \(32 cores\)\s*\|\s*([0-9.]+)\s*\|"
            r"\s*([0-9,.]+)\s*\|\s*\*\*([0-9.]+)\*\*\s*\|"
            r"\s*([0-9.]+)\s*\|\s*([0-9.]+)", txt)
        if row:
            sc["pages_per_sec_32c"] = float(row.group(2).replace(",", ""))
            sc["raw"] = float(row.group(3))
            sc["ceiling"] = float(row.group(4))
            sc["vs_ceiling"] = float(row.group(5))
        r8 = re.search(
            r"2 exec(?:utors)? \(8 cores\)\s*\|\s*([0-9.]+)\s*\|"
            r"\s*([0-9,.]+)", txt)
        if r8:
            sc["pages_per_sec_8c"] = float(r8.group(2).replace(",", ""))
        # fallback: the scaling_bench tool's auto-generated single-run
        # format keeps raw/ceiling in bullets, not table columns
        if "raw" not in sc:
            m = re.search(r"Raw scaling efficiency[^:]*: ([0-9.]+)", txt)
            if m:
                sc["raw"] = float(m.group(1))
            m = re.search(
                r"measured the same way at 8→32 procs\):\s*\*\*([0-9.]+)\*\*",
                txt)
            if m:
                sc["ceiling"] = float(m.group(1))
            m = re.search(r"hardware ceiling:\s*\n?\s*([0-9.]+)", txt)
            if m:
                sc["vs_ceiling"] = float(m.group(1))
            m = re.search(r"8 executors \(32 cores\)\s*\|\s*[0-9.]+\s*\|"
                          r"\s*([0-9,.]+)", txt)
            if m:
                sc["pages_per_sec_32c"] = float(m.group(1).replace(",", ""))
        # ALL raw efficiencies, passes AND misses — from the
        # authoritative per-run log (BENCH/runs.jsonl). The previous
        # regex on BASELINE.md matched only **bolded** table values,
        # and only passing runs are bolded there, so the key silently
        # dropped the sub-0.8 runs.
        runs_log = os.path.join(os.path.dirname(baseline), "runs.jsonl")
        raws = []
        if os.path.exists(runs_log):
            for line in open(runs_log):
                line = line.strip()
                if not line:
                    continue
                try:
                    raws.append(float(
                        json.loads(line)["raw_scaling_efficiency"]))
                except (ValueError, KeyError):
                    pass
        if not raws:
            # fallback: BASELINE.md table rows, bold (pass) or plain
            # (miss) — the raw-eff column is the one between the two
            # pages/sec columns and the ceiling column
            raws = [float(v) for v in re.findall(
                r"\|\s*\*{0,2}(0\.[0-9]+)\*{0,2}\s*\|\s*0\.[0-9]+\s*\|",
                txt)]
        if raws:
            sc["raw_all_runs"] = raws
        elif "raw" in sc:
            sc["raw_all_runs"] = [sc["raw"]]
        out["scaling_2x4_executors"] = sc
    print(json.dumps(out))


if __name__ == "__main__":
    main()
