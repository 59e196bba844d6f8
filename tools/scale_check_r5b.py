#!/usr/bin/env python3
"""Round-5b scale proof-points for the session's new operators.

1. **PCA projection at m× embedding replicas** (vec_id offset,
   vectors unchanged). Replicating every row m× leaves the column
   means unchanged and scales the centered scatter by exactly m, so
   the covariance matrix becomes a positive SCALAR multiple of the
   base — and power iteration normalizes per step, so the trained
   component (and therefore every per-row projection) is invariant in
   exact arithmetic. Exact-truth invariants:
   - every replica row's 6dp projection equals its base row's
     (boundary flips from last-ulp drift allowed at <=0.1%);
   - the gram-partials shuffle stays ~FLAT as rows grow 10× (the
     shuffle carries O(partitions · d²) rows, never O(N) — the whole
     point of the one-pass Gram design).

2. **Star-clustered near-dedup on an adversarial duplicate CHAIN.**
   Sliding-window corpus over a non-repeating token stream
   (window=100 tokens, stride=10): consecutive windows share 90
   tokens → shingle Jaccard 88/108 ≈ 0.815 >= 0.7; windows two apart
   share 80 → 78/118 ≈ 0.661 < 0.7. The verified pair graph is
   therefore EXACTLY the path {(i, i+1)} — a duplicate cluster with
   diameter = corpus size, the worst case that motivated
   connected_components_star (min-propagation would need O(L)
   synchronous rounds; the guarded union-find would collect the whole
   corpus as one cluster's edges). Exact-truth invariants:
   - the verified pair set equals the closed-form path edge set;
   - star contraction yields ONE component, rep 0, size L+1;
   - rounds grow ~log2(L): asserted <= 14 at L=512 (vs 512+1
     min-propagation rounds).
   This is the INTEGRATION proof for near_dedup_star_components: the
   adversarial-diameter guarantee holds from raw text in, not just on
   synthetic edge lists (scale_check_r5 part cc).

Usage: python tools/scale_check_r5b.py [part ...]  parts: pca stardedup
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_check import shuffle_bytes  # noqa: E402

_OFF = 10_000_000
_UI_PORT = 4056


def _spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("scale-check-r5b")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(_UI_PORT))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def part_pca(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.queries.llm import pca_projection_over

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding", "label"
    )
    base = {}
    for m in (1, 5, 10):
        parts = [
            emb.withColumn("vec_id", F.col("vec_id") + r * _OFF) for r in range(m)
        ]
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionByName(p)
        s0, t0 = shuffle_bytes(_UI_PORT)[0], time.time()
        rows = pca_projection_over(rep).collect()
        wall, shuf = time.time() - t0, shuffle_bytes(_UI_PORT)[0] - s0
        got = {r["vec_id"]: r["pc1"] for r in rows}
        if m == 1:
            base = dict(got)
        assert len(got) == m * len(base), (m, len(got), len(base))
        n_flip = 0
        for vid, p in got.items():
            b = base[vid % _OFF]
            assert abs(p - b) <= 1.01e-6, (vid, p, b)
            n_flip += int(p != b)
        assert n_flip <= max(1, len(got) // 1000), f"boundary flips: {n_flip}"
        print(
            f"  pca m={m:2d}: rows={len(got):6d} wall={wall:5.1f}s "
            f"shuffle={shuf / 1e6:7.1f}MB flips={n_flip}",
            flush=True,
        )


def _chain_corpus(spark, n_docs: int, window: int = 100, stride: int = 10):
    """Sliding-window documents over a globally unique token stream."""
    toks = [f"w{i:06d}" for i in range(n_docs * stride + window)]
    rows = [
        (i, " ".join(toks[i * stride : i * stride + window]))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def part_stardedup(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators import dedup as D
    from open_crime_etl_pipeline_spark.operators import graph as G

    for n_docs, max_rounds in ((129, 12), (513, 14)):
        diameter = n_docs - 1
        corpus = _chain_corpus(spark, n_docs).localCheckpoint()
        s0, t0 = shuffle_bytes(_UI_PORT)[0], time.time()
        pairs = D.minhash_near_dup_pairs(
            corpus, "doc_id", "text",
            num_hashes=32, bands=16, threshold=0.7, verify_exact=True,
        )
        got_pairs = {
            (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
            for r in pairs.collect()
        }
        want = {(i, i + 1) for i in range(diameter)}
        assert got_pairs == want, (
            f"pair graph != path: extra={sorted(got_pairs - want)[:5]} "
            f"missing={sorted(want - got_pairs)[:5]}"
        )
        edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        labels, rounds = G.connected_components_star(edges)
        lab = labels.collect()
        wall, shuf = time.time() - t0, shuffle_bytes(_UI_PORT)[0] - s0
        assert {r["node"] for r in lab} == set(range(n_docs))
        assert all(r["label"] == 0 for r in lab), "single component, rep 0"
        assert rounds <= max_rounds, (rounds, max_rounds)
        print(
            f"  stardedup L={diameter:4d}: pairs={len(got_pairs):4d} "
            f"rounds={rounds:2d} (min-prop would need {diameter + 1}) "
            f"wall={wall:5.1f}s shuffle={shuf / 1e6:7.1f}MB",
            flush=True,
        )


def main() -> None:
    parts = sys.argv[1:] or ["pca", "stardedup"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    for p in parts:
        print(f"=== {p} ===", flush=True)
        {"pca": part_pca, "stardedup": part_stardedup}[p](spark, sf_dir)
    print("scale_check_r5b: all invariants held")


if __name__ == "__main__":
    main()
