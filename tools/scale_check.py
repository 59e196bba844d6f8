#!/usr/bin/env python3
"""100× proof-point harness: run exact dedup + near dedup on the sf0.1
corpus and on a deterministic ~10× replica of it (≈ sf1, ~100k docs
after the query's planted-copy doubling), and report wall time, shuffle
bytes, and candidate-pair counts — the measurement behind PERF.md's
linear-in-candidates scaling claim.

Corpus construction: replica r Caesar-shifts every letter by r, so
within-replica near-dup structure is preserved exactly (both members of
a planted pair shift together) while NO shingle matches across
replicas — dup clusters scale linearly, candidate pairs scale linearly,
and a super-linear blowup in the LSH join would be visible immediately.

Usage: python tools/scale_check.py [multiplier ...]   (default: 1 10)
"""

from __future__ import annotations

import json
import os
import string
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHA = string.ascii_lowercase + string.ascii_uppercase


def replicated_corpus(spark, sf_dir: str, m: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    near = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 5_000_000).alias("doc_id"),
            F.regexp_replace("text", "^[a-z]+", "zzz").alias("text"),
        )
    )
    parts = []
    for r in range(m):
        if r == 0:
            shifted = ALPHA  # base replica is the corpus itself
        else:
            # per-replica seeded permutation of the LOWERCASE alphabet,
            # mirrored onto uppercase: the old Caesar shift wrapped at
            # r % 26, so replicas >= 26 REUSED a shift and cross-matched
            # (a 50x run planted 137x pairs — tool artifact, not engine
            # behavior); distinct random permutations keep the
            # no-cross-match property at any multiplier. Mirroring
            # (not shuffling all 52 letters independently) keeps the
            # permutation COMMUTING with lowercase normalization, so
            # exact_dedup's case-insensitive dup classes replicate
            # exactly too.
            import random

            lo = list(string.ascii_lowercase)
            random.Random(r).shuffle(lo)
            shifted = "".join(lo) + "".join(c.upper() for c in lo)
        parts.append(
            near.select(
                (F.col("doc_id") + r * 20_000_000).alias("doc_id"),
                F.translate("text", ALPHA, shifted).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def shuffle_bytes(ui_port: int) -> tuple[int, int]:
    """(write, read) bytes summed over all completed stages so far."""
    base = f"http://localhost:{ui_port}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as res:
        app_id = json.loads(res.read())[0]["id"]
    with urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=10) as res:
        stages = json.loads(res.read())
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 10]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ui_port = 4049

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("scale-check")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(ui_port))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from open_crime_etl_pipeline_spark.operators.dedup import (
        exact_dedup,
        minhash_near_dup_pairs,
        near_dedup,
    )

    # Warm-up: full near-dedup once at m=1 so JIT/codegen cost doesn't
    # pollute the m-scaling comparison.
    warm = replicated_corpus(spark, sf_dir, 1)
    near_dedup(warm, "doc_id", "text", num_hashes=32, bands=16,
               threshold=0.7, small_graph=True).count()
    exact_dedup(warm, "doc_id", "text").count()

    results = []
    for m in multipliers:
        corpus = replicated_corpus(spark, sf_dir, m).localCheckpoint()
        n_docs = corpus.count()

        w0, r0 = shuffle_bytes(ui_port)
        t0 = time.perf_counter()
        kept_exact = exact_dedup(corpus, "doc_id", "text").count()
        t_exact = time.perf_counter() - t0
        w1, r1 = shuffle_bytes(ui_port)

        t0 = time.perf_counter()
        n_pairs = minhash_near_dup_pairs(
            corpus, "doc_id", "text", num_hashes=32, bands=16,
            threshold=0.7, verify_exact=True,
        ).count()
        t_pairs = time.perf_counter() - t0

        w2, r2 = shuffle_bytes(ui_port)
        t0 = time.perf_counter()
        kept_near = near_dedup(
            corpus, "doc_id", "text", num_hashes=32, bands=16,
            threshold=0.7, small_graph=True,
        ).count()
        t_near = time.perf_counter() - t0
        w3, r3 = shuffle_bytes(ui_port)

        row = {
            "multiplier": m, "n_docs": n_docs,
            "exact_dedup_sec": round(t_exact, 2), "exact_kept": kept_exact,
            "exact_shuffle_write_mb": round((w1 - w0) / 1e6, 1),
            "verified_pairs": n_pairs,
            "pairs_sec": round(t_pairs, 2),
            "near_dedup_sec": round(t_near, 2), "near_kept": kept_near,
            "near_shuffle_write_mb": round((w3 - w2) / 1e6, 1),
            "near_shuffle_read_mb": round((r3 - r2) / 1e6, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    if len(results) >= 2:
        a, b = results[0], results[-1]
        k = b["multiplier"] / a["multiplier"]
        print(json.dumps({
            "scale_factor": k,
            "docs_ratio": round(b["n_docs"] / a["n_docs"], 2),
            "pairs_ratio": round(b["verified_pairs"] / max(a["verified_pairs"], 1), 2),
            "near_time_ratio": round(b["near_dedup_sec"] / a["near_dedup_sec"], 2),
            "near_shuffle_ratio": round(
                b["near_shuffle_write_mb"] / max(a["near_shuffle_write_mb"], 0.1), 2
            ),
            "exact_time_ratio": round(b["exact_dedup_sec"] / a["exact_dedup_sec"], 2),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
