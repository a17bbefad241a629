"""SparkSession factory tuned for this engine.

Local-mode testing runs a single JVM; on a real cluster the same
configs apply per-executor.  AQE stays on so skewed posting-merge
shuffles get re-planned at runtime; explicit salting of head terms is
still done in the build (see ``index/build.py``) because AQE alone
cannot split a single hot *group* within one ``groupBy`` key.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "searchlite_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cores in ("*",) else int(cores)
        shuffle_partitions = max(int(n), 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # byte-targeted post-shuffle partitioning (guide §2.2): respect
        # advisoryPartitionSizeInBytes instead of padding the partition
        # count up to defaultParallelism.  Scale-adaptive by
        # construction — a kilobyte-sized shuffle (one query's matched
        # set) coalesces to 1 task instead of 32 scheduling slots, a
        # 100 TB shuffle still gets ~64 MB reducers from the same rule.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    # shuffle/spill scratch on tmpfs when available — the sandbox disk
    # is shared with external load and seek-storms under concurrency
    if os.path.isdir("/dev/shm"):
        builder = builder.config("spark.local.dir", "/dev/shm/spark_local")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
