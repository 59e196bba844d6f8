#!/usr/bin/env python3
"""Scale proof-point for the round-2 curation operators:
``duplicate_ngram_fraction`` (inverted-index dup signal) and
``semdedup`` (cluster + per-cluster gram-matrix prune).

Corpora scale by deterministic replication that preserves per-replica
structure while preventing cross-replica matches:

- documents: replica r Caesar-shifts every letter by r (same trick as
  tools/scale_check.py) — no shingle matches across replicas, so every
  doc's (n_shingles, dup_frac) is IDENTICAL in every replica and output
  rows scale exactly linearly.
- embeddings: replica r cyclically rotates the 64 dimensions by 7r —
  an orthogonal transform, so within-replica cosines (including the
  planted vec_id%3 twins at cosine 1.0) are preserved exactly; cross-
  replica cosines stay far below the 0.9 threshold. n_clusters scales
  with m (the paper's k ∝ N), keeping expected cluster size — and so
  per-task gram-matrix work — constant.

Usage: python tools/scale_check_llm2.py [multiplier ...] (default 1 5 10)
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_check import shuffle_bytes  # noqa: E402

ALPHA = string.ascii_lowercase + string.ascii_uppercase


def replicated_docs(spark, sf_dir: str, m: int):
    """Plain documents (no planted copies), Caesar-shift replicas."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    parts = []
    for r in range(m):
        lo = string.ascii_lowercase
        up = string.ascii_uppercase
        dg = string.digits
        # Rotate letters AND digits: a shingle made only of digit/punct
        # tokens would otherwise be byte-identical across replicas,
        # creating cross-replica matches that break the per-replica
        # independence the linearity claim rests on.
        shifted = (
            lo[r % 26:] + lo[: r % 26]
            + up[r % 26:] + up[: r % 26]
            + dg[r % 10:] + dg[: r % 10]
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + r * 20_000_000).alias("doc_id"),
                F.translate("text", ALPHA + dg, shifted).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicated_vecs(spark, sf_dir: str, m: int):
    """Embeddings + planted vec_id%3 twins, dimension-rotated replicas."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    corpus = emb.unionByName(
        emb.filter(F.col("vec_id") % 3 == 0).select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
        )
    )
    parts = []
    for r in range(m):
        rot = (7 * r) % 64
        rotated = F.concat(
            F.slice("embedding", rot + 1, 64 - rot), F.slice("embedding", 1, rot)
        )
        parts.append(
            corpus.select(
                (F.col("vec_id") + r * 40_000_000).alias("vec_id"),
                rotated.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    if max(multipliers) > 25:
        # Caesar shifts wrap at 26: replica 26 would equal replica 0,
        # creating cross-replica matches that invalidate the linearity claim
        sys.exit("multipliers above 25 break the no-cross-replica-match invariant")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ui_port = 4048

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("scale-check-llm2")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(ui_port))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from open_crime_etl_pipeline_spark.operators.dedup import duplicate_ngram_fraction
    from open_crime_etl_pipeline_spark.operators.similarity import semdedup

    # Warm-up at m=1 so JIT/Arrow-worker startup stays out of the scaling.
    duplicate_ngram_fraction(replicated_docs(spark, sf_dir, 1), "doc_id", "text").count()
    semdedup(replicated_vecs(spark, sf_dir, 1), "vec_id", "embedding",
             n_clusters=16).count()

    results = []
    for m in multipliers:
        # Each op runs 3x per m; best-of-3 is reported. Run 0 pays
        # first-touch AQE/codegen for the new input shape, and the host
        # VM shows multi-second jitter spikes — min is the noise-robust
        # statistic for a deterministic workload.
        def best_of(fn, n=3):
            best, result = float("inf"), None
            for _ in range(n):
                t0 = time.perf_counter()
                result = fn()
                best = min(best, time.perf_counter() - t0)
                spark.sparkContext._jvm.System.gc()
            return best, result

        docs = replicated_docs(spark, sf_dir, m).localCheckpoint()
        n_docs = docs.count()
        w0, _ = shuffle_bytes(ui_port)
        t_dng, n_rows = best_of(
            lambda: duplicate_ngram_fraction(docs, "doc_id", "text").count()
        )
        w1, _ = shuffle_bytes(ui_port)

        vecs = replicated_vecs(spark, sf_dir, m).localCheckpoint()
        n_vecs = vecs.count()
        w2, _ = shuffle_bytes(ui_port)
        t_sdd, kept = best_of(
            lambda: semdedup(vecs, "vec_id", "embedding", n_clusters=16 * m).count()
        )
        w3, _ = shuffle_bytes(ui_port)

        row = {
            "multiplier": m,
            "n_docs": n_docs,
            "dupngram_sec": round(t_dng, 2),
            "dupngram_rows": n_rows,
            "dupngram_shuffle_write_mb": round((w1 - w0) / 3e6, 1),
            "n_vecs": n_vecs,
            "semdedup_sec": round(t_sdd, 2),
            "semdedup_kept": kept,
            "semdedup_shuffle_write_mb": round((w3 - w2) / 3e6, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    if len(results) >= 2:
        a, b = results[0], results[-1]
        print(json.dumps({
            "scale_factor": b["multiplier"] / a["multiplier"],
            "dupngram_time_ratio": round(b["dupngram_sec"] / a["dupngram_sec"], 2),
            "dupngram_shuffle_ratio": round(
                b["dupngram_shuffle_write_mb"] / max(a["dupngram_shuffle_write_mb"], 0.1), 2
            ),
            "semdedup_time_ratio": round(b["semdedup_sec"] / a["semdedup_sec"], 2),
            "semdedup_kept_ratio": round(b["semdedup_kept"] / a["semdedup_kept"], 2),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
