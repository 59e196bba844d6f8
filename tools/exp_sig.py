#!/usr/bin/env python3
"""A/B: fused HOF-fold minhash signatures vs explode+groupBy-min."""
from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.operators.dedup import (
    _MIX_SEED,
    _P31,
    _minhash_sig_from_hashes,
    hashed_shingles,
)

NUM_HASHES = 32


def sig_explode(per_doc, id_col="doc_id"):
    rnd = random.Random(_MIX_SEED)
    coeffs = [(rnd.randrange(1, _P31), rnd.randrange(_P31)) for _ in range(NUM_HASHES)]
    ex = per_doc.select(F.col(id_col), F.explode("hh").alias("h")).select(
        id_col, F.pmod(F.col("h"), F.lit(_P31)).alias("h")
    )
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_P31))).alias(f"s{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return ex.groupBy(id_col).agg(*aggs).select(
        id_col, F.array(*[f"s{i}" for i in range(NUM_HASHES)]).alias("signature")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("exp-sig")
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
    from open_crime_etl_pipeline_spark.queries.llm import _corpus_near

    corpus = _corpus_near(spark, sf_dir).repartition(32)
    per_doc = corpus.select(F.col("doc_id"), hashed_shingles("text", 3).alias("hh")).persist()
    per_doc.count()  # warm: shingle+hash cost excluded from both arms
    for run in range(3):
        t0 = time.perf_counter()
        a = per_doc.select(
            "doc_id", _minhash_sig_from_hashes(F.col("hh"), NUM_HASHES).alias("signature")
        ).agg(F.sum(F.element_at("signature", 1))).first()[0]
        t1 = time.perf_counter()
        b = sig_explode(per_doc).agg(F.sum(F.element_at("signature", 1))).first()[0]
        t2 = time.perf_counter()
        print(
            f"run{run}: fused={t1-t0:.2f}s explode={t2-t1:.2f}s match={a == b}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
