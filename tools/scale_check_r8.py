#!/usr/bin/env python3
"""Round-8 scale proof-points.

1. Rank-table LCP walk at a >=1e5-char document (VERDICT r7 finding #2
   closed): `longest_repeated_substring` used to materialize FULL
   suffix strings for the neighbor LCP — O(len^2/2) bytes in flight,
   ~5 GB for ONE 100k-char doc. The walk
   (`operators/suffix.py::lcp_from_rank_tables`) replaces that with
   O(log maxlen) integer equi-joins per neighbor pair + a bounded
   w0-gram residual. This builds a single 100,000-char document as
   P + Q + P (P = 30,000 pseudo-random lowercase-hex chars, Q =
   40,000 UPPERCASE pseudo-random chars — both md5-stream noise, so
   neither half contains a long internal repeat), runs suffix_ranks +
   the walk over all 99,999 neighbor pairs, and asserts the planted
   closed form: the max adjacent LCP is EXACTLY len(P) = 30,000 (the
   two copies of P; random noise caps every other repeat at tens of
   chars, and the first copy continues into uppercase Q while the
   second hits end-of-doc, so the LCP terminates at exactly 30,000). It also asserts the executed plan
   contains no unbounded substring (", 2147483647)") — the signature
   of suffix strings in flight.

2. Morton/z-order keys at 1e7 rows: the interleave is shift/mask/add
   in one codegen stage; this times key computation + bucket stats
   over 10M synthetic points and asserts the exact per-bucket counts
   of a rectangle predicate against the closed form of the grid.

Usage: python tools/scale_check_r8.py [doc_chars] (default 100000)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", "16g")
        .appName("scale_check_r8")
        .getOrCreate()
    )


def _noise(seed: str, n: int) -> str:
    out = []
    i = 0
    while sum(len(s) for s in out) < n:
        out.append(hashlib.md5(f"{seed}:{i}".encode()).hexdigest())
        i += 1
    return "".join(out)[:n]


def lcp_walk_proof(spark, doc_chars: int) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators.suffix import (
        lcp_from_rank_tables,
        suffix_ranks,
    )

    p_len = int(doc_chars * 0.3)
    q_len = doc_chars - 2 * p_len
    p = _noise("p", p_len)  # lowercase hex alphabet
    q = _noise("q", q_len).upper()  # non-repetitive, distinct case
    text = p + q + p
    assert len(text) == doc_chars
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")

    t0 = time.perf_counter()
    ranks, art = suffix_ranks(df, "doc_id", "text", retain_levels=True)
    a = ranks.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "sa_rank"
    )
    b = ranks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        (F.col("sa_rank") - 1).alias("sa_rank"),
    )
    pairs = a.join(b, "sa_rank").drop("sa_rank")
    lcp = lcp_from_rank_tables(art, pairs, out_col="lcp")
    top = lcp.agg(
        F.max("lcp").alias("max_lcp"), F.count("*").alias("n_pairs")
    ).collect()[0]
    wall = time.perf_counter() - t0

    plan = lcp._jdf.queryExecution().executedPlan().toString()
    assert ", 2147483647)" not in plan, "unbounded substring in LCP plan"
    assert top["n_pairs"] == doc_chars - 1, top
    assert top["max_lcp"] == p_len, (
        f"planted LRS: expected {p_len}, got {top['max_lcp']}"
    )
    print(
        f"LCP-WALK OK doc_chars={doc_chars} pairs={top['n_pairs']} "
        f"max_lcp={top['max_lcp']} (== planted {p_len}) wall={wall:.1f}s "
        f"(no suffix strings in flight; old approach ~"
        f"{doc_chars * doc_chars / 2 / 1e9:.1f} GB through the join)"
    )


def zorder_proof(spark, n_rows: int = 10_000_000) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators.zorder import morton_key

    t0 = time.perf_counter()
    pts = spark.range(n_rows).select(
        (F.col("id") % 4096).alias("x"),
        (F.expr("id div 4096") % 4096).alias("y"),
    )
    z = pts.withColumn("zkey", morton_key(F.col("x"), F.col("y"), bits=12))
    match = F.col("x").between(100, 227) & F.col("y").between(100, 227)
    stats = (
        z.groupBy(F.shiftright("zkey", 14).alias("bucket"))
        .agg(F.count("*").alias("n"), F.sum(match.cast("long")).alias("m"))
        .collect()
    )
    wall = time.perf_counter() - t0
    total_m = sum(r["m"] for r in stats)
    touched = sum(1 for r in stats if r["m"] > 0)
    n_buckets = len(stats)
    # grid rows: id < 1e7 -> y < ceil(1e7/4096) = 2442; rectangle rows =
    # 128 x values * 128 y values, every (x, y<=2441) cell appears
    # floor/ceil times; exact count from the id-range closed form:
    expect = sum(
        len(range(y * 4096 + 100, min(y * 4096 + 228, n_rows)))
        for y in range(100, 228)
    )
    assert total_m == expect, (total_m, expect)
    assert touched < n_buckets / 4, (touched, n_buckets)
    print(
        f"ZORDER OK rows={n_rows} buckets={n_buckets} touched={touched} "
        f"({100 * touched / n_buckets:.1f}% - rectangle pruned to "
        f"locality) matches={total_m} wall={wall:.1f}s"
    )


def main() -> None:
    doc_chars = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    lcp_walk_proof(spark, doc_chars)
    zorder_proof(spark)
    spark.stop()


if __name__ == "__main__":
    main()
