#!/usr/bin/env python3
"""Round-9 scale proof-points.

1. **Planted multi-repeat proof for the variable-length ExactSubstr
   index** (VERDICT r8 item 1): builds a ~120k-char corpus of
   md5-stream noise (non-periodic by construction — the round-8
   planted-LRS lesson) with THREE repeats planted at known positions
   and known lengths (one cross-doc pair, one triple, one in-doc self
   repeat), runs suffix_ranks + maximal_repeat_intervals(min_len), and
   asserts the EXACT closed-form interval set: each planted span, in
   each occurrence, as its own maximal interval — nothing merged that
   shouldn't be, nothing missing, and no noise interval survives
   (md5 noise caps spurious repeats far below min_len).

2. **Skew-stress for the LCP walk's pair table** (VERDICT r8 item 7):
   `lcp_from_rank_tables` joins the caller's pair table against each
   doubling level's rank table on (doc, pos). The LRS use feeds
   adjacency-sized pairs, but a caller may feed a HOT-DOC pair set —
   every pair naming the same document. This builds a corpus where one
   10k-char document is one side of 1e6 pairs (every other doc pairs
   against it) and measures the walk end-to-end with AQE skew-join
   enabled — the receipt that the (doc, pos) lookups survive a
   pathological pair distribution. Correctness is spot-asserted on a
   planted subset.

Usage: python tools/scale_check_r9.py [n_pairs] (default 1000000)
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
        .appName("scale_check_r9")
        .getOrCreate()
    )


def _noise(seed: str, n: int) -> str:
    out: list[str] = []
    i = 0
    while sum(len(s) for s in out) < n:
        out.append(hashlib.md5(f"{seed}:{i}".encode()).hexdigest())
        i += 1
    return "".join(out)[:n]


def check_planted_maximal_repeats(spark) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from open_crime_etl_pipeline_spark.operators.suffix import (
        maximal_repeat_intervals,
        suffix_ranks,
    )

    L = 50
    # planted repeats: UPPERCASE so the lowercase-hex noise can never
    # extend them by accident at either end
    rep_pair = _noise("pair", 400).upper()      # docs 1 & 2
    rep_triple = _noise("triple", 150).upper()  # docs 1, 3, 4
    rep_self = _noise("self", 90).upper()       # doc 5, twice
    docs = [
        (1, _noise("n1", 20000) + rep_pair + _noise("n2", 15000)
            + rep_triple + _noise("n3", 5000)),
        (2, _noise("n4", 30000) + rep_pair + _noise("n5", 2000)),
        (3, rep_triple + _noise("n6", 25000)),
        (4, _noise("n7", 12000) + rep_triple),
        (5, _noise("n8", 8000) + rep_self + _noise("n9", 700) + rep_self
            + _noise("n10", 1300)),
    ]
    total = sum(len(t) for _d, t in docs)
    expected = set()
    for did, text in docs:
        for rep in (rep_pair, rep_triple, rep_self):
            start = 0
            while True:
                idx = text.find(rep, start)
                if idx < 0:
                    break
                expected.add((did, idx + 1, idx + len(rep), len(rep)))
                start = idx + 1
    t0 = time.time()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ranks, art = suffix_ranks(df, "doc_id", "text", retain_levels=True)
    got = {
        tuple(r)
        for r in maximal_repeat_intervals(ranks, art, L, "doc_id").collect()
    }
    dt = time.time() - t0
    assert got == expected, (
        f"planted mismatch: extra={sorted(got - expected)[:5]} "
        f"missing={sorted(expected - got)[:5]}"
    )
    print(
        f"[1] planted maximal repeats: {total} chars, {len(expected)} planted "
        f"intervals recovered exactly (min_len={L}) in {dt:.1f}s"
    )


def check_lcp_walk_hot_doc_pairs(spark, n_pairs: int) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators.suffix import (
        lcp_from_rank_tables,
        suffix_ranks,
    )

    hot_len = 10_000
    hot = _noise("hot", hot_len)
    n_docs = 200

    def _nohex(seed: str, n: int) -> str:
        # random letters g..v — DISJOINT from the hex alphabet, so the
        # planted LCP terminates exactly (uppercasing hex is not
        # enough: digits have no case and can extend the match)
        return "".join(
            chr(ord("g") + int(c, 16)) for c in _noise(seed, n)
        )

    # every cold doc embeds a known 64-char slice of the hot doc, so a
    # planted subset of the skewed pairs has a closed-form LCP
    plant_at = 37  # 0-based slice start in hot
    plant = hot[plant_at : plant_at + 64]
    docs = [(0, hot)] + [
        (i, _noise(f"c{i}", 400) + plant + _nohex(f"d{i}", 300))
        for i in range(1, n_docs + 1)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ranks, art = suffix_ranks(df, "doc_id", "text", retain_levels=True)
    # 1e6 pairs, EVERY one naming doc 0 on side a: maximal key skew on
    # the (doc, pos) lookups
    per_doc = max(n_pairs // n_docs, 1)
    pairs = (
        spark.range(n_pairs)
        .select(
            F.lit(0).cast("long").alias("doc_a"),
            (F.col("id") % hot_len + 1).cast("long").alias("pos_a"),
            (F.col("id") % n_docs + 1).cast("long").alias("doc_b"),
            (F.col("id") % 300 + 1).cast("long").alias("pos_b"),
        )
    )
    t0 = time.time()
    n = lcp_from_rank_tables(art, pairs, out_col="lcp").count()
    dt = time.time() - t0
    assert n == n_pairs
    # correctness spot-check on the planted slice: suffix of hot at
    # plant_at+1 (1-based) vs suffix of cold doc c at position 401
    # (1-based) shares exactly the 64 planted chars; the char AFTER the
    # plant is lowercase-hex in hot and UPPERCASE in the cold doc, so
    # the LCP terminates at exactly 64
    spot = spark.createDataFrame(
        [(0, plant_at + 1, c, 401) for c in range(1, 51)],
        "doc_a long, pos_a long, doc_b long, pos_b long",
    )
    vals = {
        r["lcp"]
        for r in lcp_from_rank_tables(art, spot, out_col="lcp").collect()
    }
    assert vals == {64}, f"planted hot-doc LCP wrong: {vals}"
    print(
        f"[2] hot-doc LCP walk: {n_pairs} pairs all naming one "
        f"{hot_len}-char doc ({per_doc}x avg key skew) in {dt:.1f}s; "
        f"planted 64-char LCP exact on 50 spot pairs"
    )


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    check_planted_maximal_repeats(spark)
    check_lcp_walk_hot_doc_pairs(spark, n_pairs)
    spark.stop()
    print("scale_check_r9: ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
