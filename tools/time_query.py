#!/usr/bin/env python3
"""Time one or more registered queries at a given SF dir (in-session
perf iteration harness; the official numbers come from bench.py).

Usage: python tools/time_query.py near_dedup_representatives [more...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_WARM=1  run each query twice, report the 2nd run
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or ["near_dedup_representatives"]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("time-query")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from open_crime_etl_pipeline_spark.queries import all_specs

    specs = all_specs()
    specs["global_max_watermark"].fn(spark, sf_dir).count()  # session warm
    runs = 2 if os.environ.get("SPARK_GRAFT_WARM") else 1
    for name in names:
        for i in range(runs):
            t0 = time.perf_counter()
            n = specs[name].fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            print(f"{name} run{i}: {dt:.3f}s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
