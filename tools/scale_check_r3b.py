#!/usr/bin/env python3
"""Round-3b scale proof-points: the new operator families.

1. **Gram covariance** (operators/linalg.py) at m× vectors — the claim
   is that shuffle bytes are INDEPENDENT of N (d²·partitions partial
   rows, nothing row-proportional ever shuffles), so wall grows only
   with the scan+matmul and shuffle stays flat. Measured wall + shuffle
   per multiplier, covariance entries asserted identical per replica
   set (replicas are dimension-rotations, so cov is a permuted matrix;
   we assert the trace — rotation-invariant — matches m-independently).

2. **Triangle counting** at m× disjoint graph copies (node ids offset
   per replica, so no cross-replica edges) — triangles must be exactly
   m× the base count (counted once each), wall ~linear, and the
   degree-ordered wedge join's shuffle ~linear (no super-linear wedge
   blow-up).

3. **Iterative PageRank** on synthetic graphs of V = 20k·m vertices /
   5V edges, 10 rounds — per-round rank shuffle is O(V), so wall should
   grow sub-linearly-to-linearly in V with the fixed per-round overhead
   amortized; rank mass must sum to ~1 at every size (the recurrence's
   invariant under no-dangling-redistribution is Σrank ≤ 1, equality
   when no dangling nodes — our synthetic graph gives every vertex an
   out-edge, so Σ = 1).

4. **Codec signal features** (aHash clusters, audio energy/ZCR, scene
   cuts) at m× documents — pure mapInPandas scan-side pipelines; wall
   ~linear, shuffle bounded by the tiny feature rows.

Usage: python tools/scale_check_r3b.py [multiplier ...] (default 1 5 10)
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


def disjoint_edge_replicas(spark, sf_dir: str, m: int):
    """m disjoint copies of the part co-purchase adjacency graph."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"),
        F.col("l_linenumber").alias("ln"),
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"),
        (F.col("l_linenumber") - 1).alias("ln"),
    )
    base = a.join(b, ["ok", "ln"]).filter(F.col("a") != F.col("b")).select("a", "b")
    parts = [
        base.select(
            (F.col("a") + r * 50_000_000).alias("a"),
            (F.col("b") + r * 50_000_000).alias("b"),
        )
        for r in range(m)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def synthetic_pr_graph(spark, n_vertices: int):
    """Every vertex gets 5 deterministic out-edges (no dangling)."""
    from pyspark.sql import functions as F

    e = spark.range(n_vertices * 5)
    return e.select(
        (F.col("id") % n_vertices).alias("src"),
        ((F.col("id") * 7 + F.col("id") % 13 + 3) % n_vertices).alias("dst"),
        (1.0 + (F.col("id") % 5).cast("double")).alias("weight"),
    )


def main() -> None:
    multipliers = [int(x) for x in sys.argv[1:]] or [1, 5, 10]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ui_port = 4051

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("scale-check-r3b")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(ui_port))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from open_crime_etl_pipeline_spark.operators import multimodal as M
    from open_crime_etl_pipeline_spark.operators.graph import (
        pagerank,
        triangle_count,
    )
    from open_crime_etl_pipeline_spark.operators.linalg import covariance_pairs

    # Warm-up: compile every kernel/codegen family once, small inputs.
    wv = replicated_vecs(spark, sf_dir, 1).localCheckpoint()
    covariance_pairs(wv.limit(500), "embedding", d=64).count()
    triangle_count(disjoint_edge_replicas(spark, sf_dir, 1).limit(5000)).count()
    pagerank(synthetic_pr_graph(spark, 2000), iters=10).count()
    wd = replicated_docs(spark, sf_dir, 1).select("doc_id").limit(500)
    M.raster_ahash(M.synthesize_raster_media(wd)).count()
    M.audio_signal_features(M.synthesize_wav_media(wd)).count()
    M.scene_change_stats(M.synthesize_y4m_media(wd, scene_cut=True)).count()

    def best_of(fn, n=2):
        best, result = float("inf"), None
        for _ in range(n):
            t0 = time.perf_counter()
            result = fn()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext._jvm.System.gc()
        return best, result

    base_triangles = None
    results = []
    for m in multipliers:
        row: dict = {"multiplier": m}

        # 1. covariance gram
        vecs = replicated_vecs(spark, sf_dir, m).localCheckpoint()
        row["n_vecs"] = vecs.count()
        w0, _ = shuffle_bytes(ui_port)
        t_cov, _ = best_of(
            lambda: covariance_pairs(vecs, "embedding", d=64).count()
        )
        w1, _ = shuffle_bytes(ui_port)
        trace = (
            covariance_pairs(vecs, "embedding", d=64)
            .filter(F.col("i") == F.col("j"))
            .agg(F.sum("cov").alias("t"))
            .collect()[0]["t"]
        )
        row.update(
            cov_sec=round(t_cov, 2),
            cov_shuffle_write_mb=round((w1 - w0) / 2e6, 2),
            cov_trace=round(trace, 8),
        )

        # 2. triangle count on disjoint replicas
        edges = disjoint_edge_replicas(spark, sf_dir, m).localCheckpoint()
        row["n_edge_rows"] = edges.count()
        w0, _ = shuffle_bytes(ui_port)
        t_tri, tri = best_of(lambda: triangle_count(edges).collect())
        w1, _ = shuffle_bytes(ui_port)
        n_tri = tri[0]["n_triangles"]
        if m == multipliers[0]:
            base_triangles = n_tri / m
        assert n_tri == base_triangles * m, (n_tri, base_triangles, m)
        row.update(
            tri_sec=round(t_tri, 2),
            tri_shuffle_write_mb=round((w1 - w0) / 2e6, 1),
            n_triangles=n_tri,
        )

        # 3. pagerank on a 20k·m-vertex synthetic graph
        nv = 20_000 * m
        g = synthetic_pr_graph(spark, nv).localCheckpoint()
        w0, _ = shuffle_bytes(ui_port)
        t_pr, pr_sum = best_of(
            lambda: pagerank(g, iters=10)
            .agg(F.sum("rank").alias("s")).collect()[0]["s"]
        )
        w1, _ = shuffle_bytes(ui_port)
        assert abs(pr_sum - 1.0) < 1e-6, pr_sum
        row.update(
            pr_vertices=nv,
            pr_sec=round(t_pr, 2),
            pr_shuffle_write_mb=round((w1 - w0) / 2e6, 1),
        )

        # 4. codec signal features
        docs = replicated_docs(spark, sf_dir, m).select("doc_id").localCheckpoint()
        row["n_docs"] = docs.count()
        t_ah, _ = best_of(
            lambda: M.raster_ahash(M.synthesize_raster_media(docs)).count()
        )
        t_au, _ = best_of(
            lambda: M.audio_signal_features(M.synthesize_wav_media(docs)).count()
        )
        t_sc, _ = best_of(
            lambda: M.scene_change_stats(
                M.synthesize_y4m_media(docs, scene_cut=True)
            ).count()
        )
        row.update(
            ahash_sec=round(t_ah, 2),
            audio_sec=round(t_au, 2),
            scene_sec=round(t_sc, 2),
        )

        results.append(row)
        print(json.dumps(row), flush=True)

    if len(results) >= 2:
        a, b = results[0], results[-1]
        ratio = b["multiplier"] / a["multiplier"]

        def r(k):
            return round(b[k] / a[k], 2) if a[k] else None

        print(json.dumps({
            "scale_factor": ratio,
            "cov_time_ratio": r("cov_sec"),
            "cov_shuffle_ratio": r("cov_shuffle_write_mb"),
            "tri_time_ratio": r("tri_sec"),
            "tri_shuffle_ratio": r("tri_shuffle_write_mb"),
            "pr_time_ratio": r("pr_sec"),
            "ahash_time_ratio": r("ahash_sec"),
            "audio_time_ratio": r("audio_sec"),
            "scene_time_ratio": r("scene_sec"),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
