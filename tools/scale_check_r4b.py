#!/usr/bin/env python3
"""Round-4 wave-5 scale proof-points.

1. **CDC chunk dedup** (cdc_chunk_dedup_stats' shape) at m× doc
   replicas (doc_id offset, text unchanged). Exact-truth invariants:
   per-source n_chunks must be EXACTLY m× the base (boundaries are
   content-defined, so replicas chunk identically) and
   n_distinct_chunks must EQUAL the base (replica chunks are
   byte-identical). Wall and shuffle should grow ~linearly in m —
   the chunk groupBy shuffles m× postings against a constant distinct
   set; anything super-linear means the boundary scan or the dedup
   join degenerated.

2. **SymSpell deletion-neighborhood linkage**
   (blocked_fuzzy_join_symspell's shape) at m× customer replicas with
   a per-replica name suffix (names must stay distinct across
   replicas or cross-replica collisions would quadratically inflate
   the candidate set — the suffix keeps every true pair
   within-replica). Exact-truth invariant: the match-pair count must
   be EXACTLY m× the base count. The variant equi-join's candidate
   blocks stay O(1)-sized, so wall/shuffle must stay ~linear.

Usage: python tools/scale_check_r4b.py [multiplier ...] (default 1 5 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_check import shuffle_bytes  # noqa: E402

_OFF = 10_000_000
_CUST_OFF = 9_000_000


def replicated_docs(spark, sf_dir: str, m: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "source", "text"
    )
    parts = [docs.withColumn("doc_id", F.col("doc_id") + r * _OFF) for r in range(m)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cdc_shape(docs):
    """cdc_chunk_dedup_stats' pipeline over an arbitrary (doc_id,
    source, text) frame — delegates to the shared operator so the tool
    measures exactly what the registered query runs."""
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators.dedup import cdc_chunks

    chunks = cdc_chunks(docs)
    cdf = chunks.groupBy("chunk").agg(F.count_distinct("doc_id").alias("df"))
    return chunks.join(cdf, "chunk").groupBy("source").agg(
        F.count("*").alias("n_chunks"),
        F.count_distinct("chunk").alias("n_distinct_chunks"),
    )


def replicated_customers(spark, sf_dir: str, m: int):
    """m copies of customer with per-replica name suffix '-r' so names
    stay globally distinct (true pairs remain within-replica)."""
    from pyspark.sql import functions as F

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    # Offset must be ≡ 0 (mod 9): the mutation position is id % 9, so a
    # non-multiple offset would mutate each replica at shifted positions
    # and the per-replica pair count would not replicate exactly.
    parts = [
        cust.select(
            (F.col("id") + r * _CUST_OFF).alias("id"),
            F.concat(F.col("name"), F.lit(f"-{r}")).alias("name"),
        )
        for r in range(m)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def symspell_shape(cust):
    """blocked_fuzzy_join_symspell's pipeline over an arbitrary
    (id, name) frame. Mutation position depends on id % 9 exactly as
    the registered query does (digit positions 10..18)."""
    from pyspark.sql import functions as F

    k = (F.col("id") % 9).cast("int")
    dirty = cust.select(
        (F.col("id") + 1_000_000_000).alias("id"),
        F.concat(
            F.substr(F.col("name"), F.lit(1), F.lit(9) + k),
            F.lit("x"),
            F.substr(F.col("name"), F.lit(11) + k),
        ).alias("name"),
    )
    corpus = cust.withColumn("side", F.lit("base")).unionByName(
        dirty.withColumn("side", F.lit("dirty"))
    )
    variants = corpus.select(
        "id", "side", "name",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("name")),
                lambda i: F.concat(
                    F.substr(F.col("name"), F.lit(1), i - 1),
                    F.substr(F.col("name"), i + 1),
                ),
            )
        ).alias("var"),
    )
    d = variants.filter(F.col("side") == "dirty").select(
        F.col("id").alias("dirty_id"), F.col("name").alias("d_name"), "var"
    )
    b = variants.filter(F.col("side") == "base").select(
        F.col("id").alias("match_custkey"), F.col("name").alias("b_name"), "var"
    )
    cand = d.join(b, "var").select(
        "dirty_id", "d_name", "match_custkey", "b_name"
    ).distinct()
    return cand.filter(F.levenshtein("d_name", "b_name") <= 1).select(
        "dirty_id", "match_custkey"
    )


def main() -> None:
    multipliers = [int(x) for x in sys.argv[1:]] or [1, 5, 10]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ui_port = 4054

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("scale-check-r4b")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(ui_port))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: compile both plan families once on small inputs.
    cdc_shape(replicated_docs(spark, sf_dir, 1).limit(500)).count()
    symspell_shape(replicated_customers(spark, sf_dir, 1).limit(2_000)).count()

    def best_of(fn, n=2):
        best, result = float("inf"), None
        for _ in range(n):
            t0 = time.perf_counter()
            result = fn()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext._jvm.System.gc()
        return best, result

    base_cdc = None  # {source: (n_chunks, n_distinct)} at m=1
    base_sym = None  # pair count at m=1
    print("m | cdc s | cdc shfl MB | sym s | sym shfl MB | pairs")
    for m in multipliers:
        docs = replicated_docs(spark, sf_dir, m)
        w0, r0 = shuffle_bytes(ui_port)
        cdc_s, rows = best_of(lambda: cdc_shape(docs).collect())
        w1, r1 = shuffle_bytes(ui_port)
        got = {r["source"]: (r["n_chunks"], r["n_distinct_chunks"]) for r in rows}
        if base_cdc is None:
            base_cdc = got
        for src, (nb, nd) in base_cdc.items():
            assert got[src][0] == m * nb, (m, src, got[src], nb)
            assert got[src][1] == nd, (m, src, got[src], nd)
        cdc_mb = (w1 - w0) / (1 << 20) / 2  # best-of-2 ran the job twice

        cust = replicated_customers(spark, sf_dir, m)
        w2, r2 = shuffle_bytes(ui_port)
        sym_s, pairs = best_of(lambda: symspell_shape(cust).count())
        w3, r3 = shuffle_bytes(ui_port)
        if base_sym is None:
            base_sym = pairs
        assert pairs == m * base_sym, (m, pairs, base_sym)
        sym_mb = (w3 - w2) / (1 << 20) / 2

        print(
            f"{m} | {cdc_s:.2f} | {cdc_mb:.1f} | {sym_s:.2f} | {sym_mb:.1f} | {pairs}",
            flush=True,
        )
    print("all exact-truth invariants held")


if __name__ == "__main__":
    main()
