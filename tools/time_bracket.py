#!/usr/bin/env python3
"""Canary-bracketed multi-rep query timing (r13 iteration harness;
official numbers stay in bench.py).

This sandbox's host oscillates between fast and ~2-3x-slow
single-core phases (serial canary 0.63s <-> 1.5s within minutes,
par canary ~flat — consistent with hypervisor throttling). Single
timings are therefore meaningless; this tool interleaves a fixed
1e7-iteration canary with each rep and reports every (canary, sec)
pair plus the min — the min across reps on mixed host phases is the
closest available estimate of the clean-host cost.

Usage: python tools/time_bracket.py [-r REPS] q1 [q2 ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canary() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    names = args or ["pq_adc_topk"]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("time-bracket")
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
    results: dict[str, list[tuple[float, float]]] = {n: [] for n in names}
    for rep in range(reps):
        for name in names:
            c = canary()
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            results[name].append((c, dt))
            spark.sparkContext._jvm.System.gc()
    for name in names:
        pairs = results[name]
        best = min(dt for _, dt in pairs)
        print(
            f"{name}: min {best:.3f}s  "
            + "  ".join(f"[{c:.2f}c {dt:.3f}s]" for c, dt in pairs),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
