"""Extra benchmarks for optimization work (bench.py is frozen for
measurement; this file holds the guide-§1.4 noop-sink isolation runs
and plan capture cited in OPTIMIZATION_r06.md).

Usage:
  python bench_extra.py [sf_dir] [query ...]        # time queries
  python bench_extra.py --plans OUTDIR SUFFIX [sf_dir] [query ...]
                                                    # write explain files

Timing methodology mirrors bench.py exactly: one warm run (JIT,
codegen, python-worker spawn), one timed run against the noop sink,
residue dropped between queries (localCheckpoint blocks etc.).
Prints one JSON line {"sf_dir":..., "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def drop_residue(spark) -> None:
    import gc

    jsc = spark.sparkContext._jsc
    for rdd in jsc.getPersistentRDDs().values():
        rdd.unpersist(False)
    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def main() -> None:
    args = sys.argv[1:]
    plans_dir = suffix = None
    if args and args[0] == "--plans":
        plans_dir, suffix = args[1], args[2]
        args = args[3:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:]

    from rsgislib_spark.session import get_spark

    spark = get_spark("bench_extra")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if names:
        qs = {n: qs[n] for n in names}

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
        for name, fn in qs.items():
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"),
                      "w") as fh:
                fh.write(plan)
            print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
        return

    qtimes: dict[str, float] = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        drop_residue(spark)
        spark.sparkContext.setJobDescription(f"timed:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        qtimes[name] = round(time.time() - t0, 3)
        drop_residue(spark)
        print(f"{name}: {qtimes[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": qtimes}))


if __name__ == "__main__":
    main()
