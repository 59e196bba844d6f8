#!/usr/bin/env python3
"""Interleaved A/B: pq_adc_topk + ivfpq_residual_adc_topk with the
r12-wave-5 two-aggregate codebook trainer (dsub fast path) vs the
legacy long-form trainer (assign -> re-join -> posexplode -> two
groupBys). 5 reps each, alternating, one session."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-pq-codebook")
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

    import open_crime_etl_pipeline_spark.operators.similarity as S
    from open_crime_etl_pipeline_spark.queries import all_specs

    specs = all_specs()
    fast_train = S.pq_train_codebook

    def legacy_train(subs, init, rounds=1, id_col="vec_id", dsub=None):
        return fast_train(subs, init, rounds=rounds, id_col=id_col, dsub=None)

    def run(name):
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).count()
        return round(time.perf_counter() - t0, 3)

    # warm both shapes
    for v in (legacy_train, fast_train):
        S.pq_train_codebook = v
        run("pq_adc_topk"); run("ivfpq_residual_adc_topk")
    out = {("pq", "fast"): [], ("pq", "legacy"): [],
           ("ivfpq", "fast"): [], ("ivfpq", "legacy"): []}
    for _ in range(5):
        for label, v in (("fast", fast_train), ("legacy", legacy_train)):
            S.pq_train_codebook = v
            spark.sparkContext._jvm.System.gc()
            out[("pq", label)].append(run("pq_adc_topk"))
            spark.sparkContext._jvm.System.gc()
            out[("ivfpq", label)].append(run("ivfpq_residual_adc_topk"))
    S.pq_train_codebook = fast_train
    for k, v in out.items():
        print(k, v, "median", statistics.median(v))
    spark.stop()


if __name__ == "__main__":
    main()
