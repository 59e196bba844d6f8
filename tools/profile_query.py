#!/usr/bin/env python3
"""Per-stage profile of one registered query (optimization-round
iteration harness; official numbers stay in bench.py).

Runs the query twice (warm session, like bench.py's slot conditions),
then dumps the SECOND run's jobs/stages from the UI REST API sorted by
duration, so the expensive stage — shuffle, scan, Python worker — is
visible without guessing.

Usage: python tools/profile_query.py <query> [more...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("profile-query")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4077")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from open_crime_etl_pipeline_spark.queries import all_specs

    specs = all_specs()
    specs["global_max_watermark"].fn(spark, sf_dir).count()  # session warm

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4077/api/v1/applications/{app_id}"

    def stages_snapshot():
        with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
            return {s["stageId"]: s for s in json.load(r)}

    for name in names:
        fn = specs[name].fn
        # warm run (codegen/cache), untimed
        fn(spark, sf_dir).count()
        spark.sparkContext._jvm.System.gc()
        before = stages_snapshot()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.3)
        after = stages_snapshot()
        new = [s for sid, s in after.items() if sid not in before]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n=== {name}: wall {wall:.3f}s, {len(new)} stages ===")
        total_run = sum(s.get("executorRunTime") or 0 for s in new)
        hdr = (
            "stage  runtime(s) cpu(s)  tasks  input       shufR       "
            "shufW       name"
        )
        print(hdr)
        for s in new[:18]:
            print(
                f"{s['stageId']:>5}  {(s.get('executorRunTime') or 0)/1e3:>9.2f} "
                f"{(s.get('executorCpuTime') or 0)/1e9:>6.2f} "
                f"{s.get('numCompleteTasks', 0):>6} "
                f"{(s.get('inputBytes') or 0)/1e6:>8.1f}MB "
                f"{(s.get('shuffleReadBytes') or 0)/1e6:>8.1f}MB "
                f"{(s.get('shuffleWriteBytes') or 0)/1e6:>8.1f}MB  "
                f"{(s.get('name') or '')[:60]}"
            )
        print(f"total executorRunTime {total_run/1e3:.2f}s across "
              f"{len(new)} stages (wall {wall:.3f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
