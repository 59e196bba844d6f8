"""SparkSession factory with scale-oriented defaults.

Design notes (100 TB discipline):
- UTC session timezone pinned — timestamp semantics must not depend on
  the driver host's zone (and must match the ANSI-SQL oracle).
- AQE on: runtime partition coalescing + skew-join splitting replaces
  hand-tuned shuffle partition counts when stats are off.
- Arrow enabled for the few Pandas-UDF paths (vectorized transfer).
- `spark.sql.shuffle.partitions` defaults to the local core count for
  tests; on a real cluster this is overridden (or left to AQE's
  coalescing from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "open-crime-etl-pipeline-spark"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's defaults.

    Local test runs use ``local[N]``; on a cluster the caller passes the
    real master or relies on spark-submit. All settings are plain public
    Spark configuration.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # parquet TIMESTAMP(NANOS) (events.ts) is unreadable natively —
        # read as long nanos, readers convert to TimestampType (µs)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
