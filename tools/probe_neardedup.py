#!/usr/bin/env python3
"""Stage-level probe of near_dedup_representatives repeat-run behavior."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from open_crime_etl_pipeline_spark.operators import dedup as D
    from open_crime_etl_pipeline_spark.queries.llm import _corpus_near

    if os.environ.get("SPARK_GRAFT_TOYWARM"):
        import tempfile

        t0 = time.perf_counter()
        toy = spark.range(256).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit("w"), ((F.col("id") * (i + 3)) % 41).cast("string"))
                    for i in range(12)
                ],
            ).alias("text"),
        )
        tmp = tempfile.mkdtemp(prefix="bench_warm_")
        toy.write.mode("overwrite").parquet(tmp)
        docs = spark.read.parquet(tmp).select("doc_id", "text")
        copies = docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.regexp_replace("text", "^[a-z]+", "zzz").alias("text"),
        )
        corpus = docs.unionByName(copies)
        D.near_dedup(
            corpus, "doc_id", "text",
            num_hashes=32, bands=16, threshold=0.7, small_graph=True,
        ).count()
        print(f"toywarm: {time.perf_counter()-t0:.2f}s", flush=True)

    for run in range(3):
        corpus = _corpus_near(spark, sf_dir)
        t0 = time.perf_counter()
        pairs = D.minhash_near_dup_pairs(
            corpus, "doc_id", "text",
            num_hashes=32, bands=16, threshold=0.7, verify_exact=True,
        ).localCheckpoint()
        n_pairs = pairs.count()
        t1 = time.perf_counter()
        rep = D.cluster_representatives(pairs, small_graph=True)
        n_rep = rep.count()
        t2 = time.perf_counter()
        losers = rep.filter(F.col("member_id") != F.col("rep_id")).select(
            F.col("member_id").alias("doc_id")
        )
        n = corpus.join(losers, on="doc_id", how="left_anti").count()
        t3 = time.perf_counter()
        print(
            f"run{run}: pairs={n_pairs} ({t1-t0:.2f}s) cluster={n_rep} "
            f"({t2-t1:.2f}s) anti={n} ({t3-t2:.2f}s) total={t3-t0:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
