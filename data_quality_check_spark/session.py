"""SparkSession builder with the engine's standard configuration.

Arrow on (all UDFs are Arrow-batched), AQE on (runtime coalesce +
skew-join splitting complements the explicit salting), small Arrow
batches on byte-carrying stages (worker RSS discipline — SURVEY.md §4
'vectorized execution').
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

REPO_ROOT = os.path.dirname(os.path.abspath(__file__ + "/.."))


def _local_dir() -> str:
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-local"
        try:
            os.makedirs(d, exist_ok=True)
            return d
        except OSError:
            pass
    return "/tmp"


def get_spark(master: str | None = None,
              shuffle_partitions: int = 32,
              arrow_batch: int = 2048,
              app_name: str = "data-quality-check-spark",
              extra_conf: dict | None = None) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.adaptive.enabled", "true")
        # sandbox fixtures are a handful of medium parquet files; a
        # small split size keeps the pre-shuffle (UDF) stage at full
        # parallelism.  On a real cluster with thousands of files the
        # 128m default is right — override via extra_conf there.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # post-UDF rows are skinny (~300B): the 64m advisory target
        # would coalesce the window/agg stages to 1-2 partitions and
        # serialize them; 4m keeps those stages parallel
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # shuffle/spill on the RAM disk: the sandbox's rotational /tmp
        # throttles the 4N-core level; on a real cluster point this at
        # executor-local NVMe instead
        .config("spark.local.dir", _local_dir())
        .config("spark.ui.enabled", "false")
        # ship the package to python workers without a separate zip in
        # local mode; on a real cluster use spark-submit --py-files
        .config("spark.executorEnv.PYTHONPATH", REPO_ROOT)
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
