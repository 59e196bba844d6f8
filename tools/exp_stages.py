#!/usr/bin/env python3
"""Stage decomposition of the near-dedup pairs pipeline at sf0.1."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("exp-stages")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from open_crime_etl_pipeline_spark.operators.dedup import (
        _minhash_sig_from_hashes,
        _verify_pairs,
        hashed_shingles,
        lsh_candidate_pairs,
    )
    from open_crime_etl_pipeline_spark.queries.llm import _corpus_near

    for run in range(3):
        corpus = _corpus_near(spark, sf_dir).repartition(32)
        t0 = time.perf_counter()
        per_doc = corpus.select(
            F.col("doc_id"), hashed_shingles("text", 3).alias("hh")
        ).select(
            "doc_id", "hh", _minhash_sig_from_hashes(F.col("hh"), 32).alias("signature")
        ).persist()
        per_doc.count()
        t1 = time.perf_counter()
        cands = lsh_candidate_pairs(
            per_doc.select("doc_id", "signature"), "doc_id", 16,
            num_hashes=32, with_signatures=False,
        ).persist()
        nc = cands.count()
        t2 = time.perf_counter()
        pairs = _verify_pairs(cands, per_doc.select("doc_id", "hh"), "doc_id", 0.7)
        np_ = pairs.count()
        t3 = time.perf_counter()
        print(
            f"run{run}: perdoc={t1-t0:.2f}s lsh={t2-t1:.2f}s ({nc} cands) "
            f"verify={t3-t2:.2f}s ({np_} pairs) total={t3-t0:.2f}s",
            flush=True,
        )
        per_doc.unpersist()
        cands.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
