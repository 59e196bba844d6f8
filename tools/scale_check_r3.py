#!/usr/bin/env python3
"""Round-3 scale proof-points.

1. **Sequence packing under source skew** — documents replicated m×
   with a forced 90/10 source mix (one source holds ~90% of the
   corpus). Measures the two-pass range-partition packing
   (operators/ranking.py::grouped_running_sum) against the naive
   ``sum() OVER (PARTITION BY source)`` window form. At local[32] the
   window serializes the dominant source through ONE task, so its
   wall-time should grow ~linearly in m while the two-pass form splits
   the source across range partitions. Both forms are asserted to
   produce identical (source, bin_id) histograms at every m.

2. **ANN top-k (LSH + IVF) at replicated scale** — embeddings
   replicated m× by dimension rotation (orthogonal ⇒ cosines preserved
   exactly; reuses scale_check_llm2.replicated_vecs, which also plants
   vec_id%3 exact twins). 20 replica-0 twin-owners serve as queries;
   twin-retrieval success = the planted twin (vec_id + 10_000_000)
   appears in the query's top-k with sim ≈ 1.0. Records wall seconds,
   shuffle bytes, and the success count per multiplier — the
   certificate must stay perfect while cost scales.

Usage: python tools/scale_check_r3.py [multiplier ...] (default 1 5 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_check import shuffle_bytes  # noqa: E402
from scale_check_llm2 import replicated_docs, replicated_vecs  # noqa: E402


def skewed_docs(spark, sf_dir: str, m: int):
    """Replicated docs with a 90/10 source mix: doc_id%10<9 → the one
    dominant source, the rest spread over 4 minor sources."""
    from pyspark.sql import functions as F

    docs = replicated_docs(spark, sf_dir, m)
    return docs.withColumn(
        "source",
        F.when(F.col("doc_id") % 10 < 9, F.lit("dominant")).otherwise(
            F.concat(F.lit("minor"), (F.col("doc_id") % 4).cast("string"))
        ),
    )


def pack_two_pass(docs):
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators.ranking import grouped_running_sum
    from open_crime_etl_pipeline_spark.operators.textstats import tokens

    toks = docs.select(
        "doc_id", "source", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    cum = grouped_running_sum(toks, "source", ["doc_id"], "n_tokens", out_col="cum_tokens")
    return (
        cum.withColumn("bin_id", F.floor((F.col("cum_tokens") - F.col("n_tokens")) / 512))
        .groupBy("source", "bin_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("bin_tokens"))
    )


def pack_window(docs):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators.textstats import tokens

    toks = docs.select(
        "doc_id", "source", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        cum.withColumn("bin_id", F.floor((F.col("cum_tokens") - F.col("n_tokens")) / 512))
        .groupBy("source", "bin_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("bin_tokens"))
    )


def twin_success(out, queries_df, k):
    """Count queries whose planted twin (qid + 10_000_000) made top-k."""
    from pyspark.sql import functions as F

    hits = (
        out.filter(F.col("neighbor_id") == F.col("query_id") + 10_000_000)
        .filter(F.col("sim") > 0.999999)
        .select("query_id").distinct().count()
    )
    return hits


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ui_port = 4049

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("scale-check-r3")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(ui_port))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from open_crime_etl_pipeline_spark.operators.similarity import (
        cosine_topk_ivf,
        cosine_topk_lsh,
    )

    # Warm-up (JIT/Arrow/first-touch AQE out of the scaling)
    pack_two_pass(skewed_docs(spark, sf_dir, 1)).count()
    pack_window(skewed_docs(spark, sf_dir, 1)).count()
    wv = replicated_vecs(spark, sf_dir, 1).localCheckpoint()
    wq = wv.filter((F.col("vec_id") % 3 == 0) & (F.col("vec_id") < 60)).localCheckpoint()
    cosine_topk_lsh(wv, wq, dim=64, k=5).count()
    cosine_topk_ivf(wv, wq, k=5, n_clusters=16).count()

    def best_of(fn, n=3):
        best, result = float("inf"), None
        for _ in range(n):
            t0 = time.perf_counter()
            result = fn()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext._jvm.System.gc()
        return best, result

    K = 5
    results = []
    for m in multipliers:
        docs = skewed_docs(spark, sf_dir, m).localCheckpoint()
        n_docs = docs.count()
        t_two, _ = best_of(lambda: pack_two_pass(docs).count())
        t_win, _ = best_of(lambda: pack_window(docs).count())
        two = {(r.source, r.bin_id): (r.n_docs, r.bin_tokens)
               for r in pack_two_pass(docs).collect()}
        win = {(r.source, r.bin_id): (r.n_docs, r.bin_tokens)
               for r in pack_window(docs).collect()}
        assert two == win, f"packing forms diverge at m={m}"

        vecs = replicated_vecs(spark, sf_dir, m).localCheckpoint()
        n_vecs = vecs.count()
        # 20 replica-0 twin-owners as queries; their twins are planted
        queries = vecs.filter(
            (F.col("vec_id") % 3 == 0) & (F.col("vec_id") < 60)
        ).localCheckpoint()
        n_q = queries.count()

        w0, _ = shuffle_bytes(ui_port)
        t_lsh, lsh_out = best_of(
            lambda: cosine_topk_lsh(vecs, queries, dim=64, k=K).localCheckpoint()
        )
        w1, _ = shuffle_bytes(ui_port)
        lsh_hits = twin_success(lsh_out, queries, K)
        t_ivf, ivf_out = best_of(
            lambda: cosine_topk_ivf(
                vecs, queries, k=K, n_clusters=16 * m
            ).localCheckpoint()
        )
        w2, _ = shuffle_bytes(ui_port)
        ivf_hits = twin_success(ivf_out, queries, K)

        row = {
            "multiplier": m,
            "n_docs": n_docs,
            "pack_two_pass_sec": round(t_two, 2),
            "pack_window_sec": round(t_win, 2),
            "n_vecs": n_vecs,
            "n_queries": n_q,
            "lsh_sec": round(t_lsh, 2),
            "lsh_shuffle_write_mb": round((w1 - w0) / 3e6, 1),
            "lsh_twin_hits": lsh_hits,
            "ivf_sec": round(t_ivf, 2),
            "ivf_shuffle_write_mb": round((w2 - w1) / 3e6, 1),
            "ivf_twin_hits": ivf_hits,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    if len(results) >= 2:
        a, b = results[0], results[-1]
        print(json.dumps({
            "scale_factor": b["multiplier"] / a["multiplier"],
            "pack_two_pass_ratio": round(b["pack_two_pass_sec"] / a["pack_two_pass_sec"], 2),
            "pack_window_ratio": round(b["pack_window_sec"] / a["pack_window_sec"], 2),
            "lsh_time_ratio": round(b["lsh_sec"] / a["lsh_sec"], 2),
            "ivf_time_ratio": round(b["ivf_sec"] / a["ivf_sec"], 2),
            "twin_hits_perfect": all(
                r["lsh_twin_hits"] == r["n_queries"]
                and r["ivf_twin_hits"] == r["n_queries"] for r in results
            ),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
