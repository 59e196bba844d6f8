#!/usr/bin/env python3
"""Interleaved A/B: winnowing_similarity_pairs with vs without the
wave-3 pin of the fingerprint table (suspected bench regression
1.36 -> 2.5s). Times the full query via count(), 5 reps each,
alternating, one session."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, sf_dir, pinned: bool):
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.checkpointing import pin
    from open_crime_etl_pipeline_spark.operators.winnow import (
        winnowing_fingerprints as _wf,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).filter(
        F.col("doc_id") % 25 == 0
    )
    fp = _wf(docs, "doc_id", "text", k=12, w=8)
    if pinned:
        fp = pin(fp)
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "fp")
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "fp")
    cand = a.join(b, "fp").filter(F.col("doc_a") < F.col("doc_b"))
    texts = docs.select("doc_id", "text")
    verified = (
        cand.join(
            texts.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta")),
            "doc_a",
        )
        .join(
            texts.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb")),
            "doc_b",
        )
        .filter(F.expr("substring(ta, pos_a, 12)") == F.expr("substring(tb, pos_b, 12)"))
        .select("doc_a", "doc_b", "fp")
        .distinct()
    )
    shared = verified.groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_shared"))
    per_doc = (
        fp.select("doc_id", "fp").distinct().groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    )
    return (
        shared.join(
            per_doc.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_fp_a")),
            "doc_a",
        )
        .join(
            per_doc.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_fp_b")),
            "doc_b",
        )
        .select(
            "doc_a", "doc_b", "n_shared", "n_fp_a", "n_fp_b",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_fp_a") + F.col("n_fp_b") - F.col("n_shared")).cast("double"),
                6,
            ).alias("fp_jaccard"),
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-winnow-pin")
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
    # warm both shapes once
    build(spark, sf_dir, True).count()
    build(spark, sf_dir, False).count()
    times = {"pinned": [], "plain": []}
    for _ in range(5):
        for label, flag in (("pinned", True), ("plain", False)):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            build(spark, sf_dir, flag).count()
            times[label].append(round(time.perf_counter() - t0, 3))
    for k, v in times.items():
        print(k, v, "median", statistics.median(v))
    spark.stop()


if __name__ == "__main__":
    main()
