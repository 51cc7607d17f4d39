"""SparkSession factory tuned for the dedup workload.

Local testing runs on local[N]; the same settings map onto multi-executor
clusters (spark-submit --py-files) — AQE, Arrow, and shuffle-partition sizing
are the knobs that matter at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dedup-domains-spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    parallelism: local core count (defaults to $SPARK_GRAFT_CPUS or 32).
    master: override, e.g. "local-cluster[8,4,4096]" — separate executor
    JVMs, the faithful in-sandbox stand-in for a multi-executor cluster
    (single-JVM local[N] saturates around 8 threads on shared hosts).
    """
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(parallelism, 8)

    # ship this package to executor python workers (the spark-submit
    # --py-files analog; required for local-cluster / real clusters where
    # executors are separate JVMs that don't inherit the driver's sys.path)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exec_pythonpath = os.environ.get("PYTHONPATH", "")
    exec_pythonpath = (
        f"{pkg_root}:{exec_pythonpath}" if exec_pythonpath else pkg_root
    )

    # shuffle/broadcast spill dir on tmpfs: the sandbox's virtio disk caps
    # shuffle transport at a few MB/s and is the dominant noise source; on a
    # real cluster this is NVMe-backed local storage (or remote shuffle svc)
    local_dir = os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-tmp")
    try:
        os.makedirs(local_dir, exist_ok=True)
    except OSError:
        local_dir = None

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{parallelism}]")
        .config("spark.executorEnv.PYTHONPATH", exec_pythonpath)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(parallelism))
        # AQE: runtime coalescing + skew-join splitting — the first line of
        # defense against Zipf-skewed band buckets at scale.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for all pandas UDF traffic (signatures, containment verify).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Keep broadcast autodetection on; dims like the FULL-key set are
        # explicitly hinted where we know better than the stats.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # broadcast builds queue behind running shuffle stages on a busy
        # cluster; the 300 s default killed an otherwise-healthy 3.84M-row
        # run mid-pipeline (BroadcastExchange timeout while stage 103's
        # shuffle held all cores). An hour matches the long-job posture a
        # 10^12-file run needs — a genuinely stuck broadcast still fails,
        # just not by racing a healthy stage.
        .config("spark.sql.broadcastTimeout", "3600")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
