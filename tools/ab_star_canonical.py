#!/usr/bin/env python3
"""Interleaved A/B: near_dedup_star_components new (assume_canonical +
window sizes) vs old (re-canonicalize + groupBy/join sizes). 5 reps,
alternating, one session."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def old_fn(spark, sf_dir):
    from pyspark.sql import functions as F

    import open_crime_etl_pipeline_spark.operators.dedup as D
    import open_crime_etl_pipeline_spark.operators.graph as G
    from open_crime_etl_pipeline_spark.queries.llm.dedup import _corpus_near

    corpus = _corpus_near(spark, sf_dir)
    pairs = D.minhash_near_dup_pairs(
        corpus, "doc_id", "text",
        num_hashes=32, bands=16, threshold=0.7, verify_exact=True,
    )
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    labels, _rounds = G.connected_components_star(edges)
    sizes = labels.groupBy("label").agg(F.count("*").alias("n_members"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"), F.col("label").alias("rep_id"), "n_members"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-star-canonical")
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

    new_fn = all_specs()["near_dedup_star_components"].fn
    # sanity: identical result sets
    a = sorted(map(tuple, new_fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, old_fn(spark, sf_dir).collect()))
    assert a == b, "result mismatch"
    print("results identical:", len(a), "rows")
    times = {"new": [], "old": []}
    for _ in range(5):
        for label, fn in (("new", new_fn), ("old", old_fn)):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times[label].append(round(time.perf_counter() - t0, 3))
    for k, v in times.items():
        print(k, v, "median", statistics.median(v))
    spark.stop()


if __name__ == "__main__":
    main()
