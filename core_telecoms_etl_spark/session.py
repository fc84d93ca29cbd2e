"""SparkSession construction tuned for both local testing and cluster scale.

Settings rationale (100 TB design stance):
- AQE on: runtime coalescing, skew-join splitting, and dynamic join-strategy
  switching are the first line of defense at scale.
- shuffle partitions sized to cores locally; on a real cluster this is
  superseded by AQE's coalescing from a larger initial number.
- UTC session timezone so timestamp semantics match the DuckDB oracle and
  are portable across clusters.
- Arrow enabled for any pandas exchange (toPandas / pandas UDFs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "core-telecoms-etl-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied.

    On a cluster the master/memory settings come from spark-submit; the
    builder only sets master when none is configured (local dev/test).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.caseSensitive", "false")
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_MASTER") and "spark.master" not in os.environ:
        # local mode = driver-only JVM; give it real memory (the container
        # has 128 GiB). On a cluster these come from spark-submit instead.
        builder = builder.master(f"local[{cpus}]").config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g")
        ).config(
            # Splits are sized by bytes, so the 128 MB default hands a
            # 1–20 MB local test file to ONE core and every scan-rooted
            # stage runs serial (measured 2× on funnel's event scan).
            # Right-size for megabyte-scale local data; cluster submits
            # set 128–256 MB per SCALING.md "Config deltas".
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "1m"),
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
