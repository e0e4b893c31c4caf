"""SparkSession factory with the engine's scale-oriented defaults.

Single place where the 100 TB posture is configured: AQE (runtime
re-planning + skew-join splitting for dense city cells), Arrow for
every pandas-UDF boundary, and shuffle-partition defaults sized for
the sandbox (local[32]) but overridable for a real cluster via
normal spark-submit --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
}


def get_spark(app: str = "rsgislib_spark", master: str | None = None,
              **conf) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app).master(master or f"local[{cpus}]")
    merged = {**DEFAULTS, **conf}
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
