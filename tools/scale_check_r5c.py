#!/usr/bin/env python3
"""Round-5c scale proof-point: product quantization at m× replicas.

Replicating EVERY embedding row m× (vec_id offset, vectors unchanged)
leaves the PQ pipeline's model state invariant in exact arithmetic:
the init codebook and the query set draw only base ids (< 16 / < 5),
every Lloyd cluster gets each member m times so the 6dp means are
unchanged, and therefore every replica row encodes to its base row's
codes. The replicated corpus's ADC top-5 per query is then a pure
MERGE of the base run: each base neighbor j != q appears at ids
{j, j+OFF, ..., j+(m-1)·OFF} with the base ADC distance, and the
query's own replicas appear with q's self-quantization error (the
base row itself stays excluded). The tool computes that expectation
exactly from a base-corpus full-ADC pass (k = corpus size,
exclude_self=False) and asserts the replicated engine run reproduces
it row for row — ids exact, distances to 5e-5 (a 6dp Lloyd-mean
boundary flip moves an ADC term by ~1e-6; a tiny global mismatch
budget absorbs measure-zero flips).

Scale claims measured alongside:
  - wall/shuffle grow ~LINEARLY in m: training+encode shuffle is
    O(N·m_sub) best-code rows — the broadcast-codebook struct-min
    argmin never shuffles the O(N·m_sub·k) candidate product;
  - the ADC search side scans CODES and broadcasts the O(|Q|·m·k)
    lookup table — nothing query-dependent shuffles the corpus.

Usage: python tools/scale_check_r5c.py [part ...]  parts: pq ivfpq
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_check import shuffle_bytes  # noqa: E402

_OFF = 10_000_000
_UI_PORT = 4057


def _spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("scale-check-r5c")
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


def part_pq(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators import similarity as S
    from open_crime_etl_pipeline_spark.queries.llm import (
        _PQ_DSUB,
        _PQ_K0,
        _PQ_M,
        pq_adc_over,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )

    # Base-corpus FULL ADC table (every neighbor incl. self) — the
    # closed-form generator for every replicated expectation below.
    subs = S.pq_subvectors(emb, "vec_id", "embedding", m=_PQ_M, dsub=_PQ_DSUB)
    init = subs.filter(F.col("vec_id") < _PQ_K0).select(
        "s", F.col("vec_id").alias("cid"), F.col("sub").alias("cvec")
    )
    cb = S.pq_train_codebook(subs, init, rounds=1).localCheckpoint()
    codes = S.pq_assign(subs, cb).select("vec_id", "s", "cid")
    qsubs = subs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "s", "sub"
    )
    n_base = emb.count()
    full = S.pq_adc_topk(codes, cb, qsubs, m=_PQ_M, k=n_base, exclude_self=False)
    base_adc = {}  # query_id -> {neighbor_id: adc}
    for r in full.collect():
        base_adc.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["adc_dist2"]
    assert all(len(v) == n_base for v in base_adc.values())

    for m in (1, 5, 10):
        parts = [
            emb.withColumn("vec_id", F.col("vec_id") + r * _OFF) for r in range(m)
        ]
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionByName(p)
        s0, t0 = shuffle_bytes(_UI_PORT)[0], time.time()
        got = pq_adc_over(rep).collect()
        wall, shuf = time.time() - t0, shuffle_bytes(_UI_PORT)[0] - s0
        assert len(got) == 25, len(got)

        mismatch = 0
        for q in range(5):
            cand = []
            for j, d in base_adc[q].items():
                first = 1 if j == q else 0  # base self stays excluded
                cand.extend((d, j + r * _OFF) for r in range(first, m))
            expect = sorted(cand)[:5]
            rows = sorted(
                (r for r in got if r["query_id"] == q), key=lambda r: r["rank"]
            )
            for (ed, ei), r in zip(expect, rows):
                if ei != r["neighbor_id"] or abs(ed - r["adc_dist2"]) > 5e-5:
                    mismatch += 1
        assert mismatch <= 1, f"m={m}: {mismatch}/25 rows off the exact merge"
        print(
            f"  pq m={m:2d}: rows={n_base * m:6d} wall={wall:5.1f}s "
            f"shuffle={shuf / 1e6:7.1f}MB mismatch={mismatch}/25",
            flush=True,
        )


def part_ivfpq(spark, sf_dir: str) -> None:
    """Same replication-merge device for the two-level IVF-PQ index.

    Replication leaves BOTH codebook levels invariant (coarse Lloyd
    means and residual Lloyd means each see every member m times), so
    replica cells/codes equal their base row's and the probe set per
    query is unchanged. The base-corpus generator here is the probed-
    cell-restricted FULL ADC table (k=corpus, exclude_self=False):
    the replicated engine run's top-5 must equal its exact merge
    (neighbor images at +r*OFF; the query's own replicas appear at
    q's self-quantization error — they live in q's own probed cell)."""
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.queries.llm import ivfpq_adc_over

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    n_base = emb.count()
    base_adc = {}  # query_id -> {neighbor_id: adc} over probed-cell members ONLY
    for r in ivfpq_adc_over(emb, k=10 ** 9, exclude_self=False).collect():
        base_adc.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["adc_dist2"]
    n_cand = sum(len(v) for v in base_adc.values())
    # nprobe=2 of kc=8: candidates must be a strict minority of 5*N
    assert n_cand < 5 * n_base * 0.6, f"no pruning: {n_cand}/{5 * n_base}"

    for m in (1, 5, 10):
        parts = [
            emb.withColumn("vec_id", F.col("vec_id") + r * _OFF) for r in range(m)
        ]
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionByName(p)
        s0, t0 = shuffle_bytes(_UI_PORT)[0], time.time()
        got = ivfpq_adc_over(rep).collect()
        wall, shuf = time.time() - t0, shuffle_bytes(_UI_PORT)[0] - s0
        assert len(got) == 25, len(got)
        mismatch = 0
        for q in range(5):
            cand = []
            for j, d in base_adc[q].items():
                first = 1 if j == q else 0
                cand.extend((d, j + r * _OFF) for r in range(first, m))
            expect = sorted(cand)[:5]
            rows = sorted(
                (r for r in got if r["query_id"] == q), key=lambda r: r["rank"]
            )
            for (ed, ei), r in zip(expect, rows):
                if ei != r["neighbor_id"] or abs(ed - r["adc_dist2"]) > 5e-5:
                    mismatch += 1
        assert mismatch <= 1, f"m={m}: {mismatch}/25 rows off the exact merge"
        print(
            f"  ivfpq m={m:2d}: rows={n_base * m:6d} cand={n_cand:6d}/{5 * n_base} "
            f"wall={wall:5.1f}s shuffle={shuf / 1e6:7.1f}MB mismatch={mismatch}/25",
            flush=True,
        )


def main() -> None:
    parts = sys.argv[1:] or ["pq", "ivfpq"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    for p in parts:
        print(f"=== {p} ===", flush=True)
        {"pq": part_pq, "ivfpq": part_ivfpq}[p](spark, sf_dir)
    print("scale_check_r5c: all invariants held")


if __name__ == "__main__":
    main()
