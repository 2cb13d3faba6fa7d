"""SparkSession factory tuned for the inverted-index workload.

Defaults chosen for the sandbox (local[N], single JVM) but every knob is the
one you would set on a real 1000-executor cluster:

- AQE on (runtime coalescing + skew-join splitting — high-DF terms are skewed
  by construction, cf. SURVEY.md §7.3).
- shuffle partitions sized to cores in local mode; on a cluster you would set
  this to ~2-3× total cores or rely on AQE coalescing.
- Arrow enabled for all pandas-UDF exchange paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nixiesearch-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    serving: bool = False,
) -> SparkSession:
    """``serving=True`` tunes for query latency instead of build
    throughput: AQE off (each adaptive stage materialization costs a
    scheduling round-trip that dominates small interactive queries — the
    engine's query plans set explicit partitioning where it matters), and
    fewer shuffle partitions for the tiny per-query aggregations."""
    # make the package importable in executor python workers regardless of
    # the driver's cwd (spark-submit --py-files handles this on a cluster)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = pkg_root + (os.pathsep + pp if pp else "")
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores // 2, 8) if serving else max(cores, 8)
    # never override a master provided by spark-submit / cluster launcher —
    # forcing local[N] there would silently run the "cluster" job on one box
    from pyspark import SparkConf

    preset_master = SparkConf().get("spark.master", None)
    builder = SparkSession.builder.appName(app_name)
    if preset_master is None:
        builder = builder.master(f"local[{cores}]")
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "false" if serving else "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dio.netty.tryReflectionSetAccessible=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
