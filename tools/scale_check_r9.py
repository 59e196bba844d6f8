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




def check_manifest_lakehouse_churn(spark) -> None:
    """Round-9 manifest lakehouse under commit churn: 60 commits land
    4 shards each (240 content-addressed shards), a throttled tail
    (max_versions_per_trigger=10) catches up in bounded batches,
    compaction rewrites the live set to 8 shards in one atomic commit,
    and retention (expire + vacuum) collects exactly the originals —
    with wall-clock receipts for the driver-side manifest operations
    (the costs PERF.md's lakehouse notes claim are O(shards))."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

    MS.register(spark)
    path = tempfile.mkdtemp(prefix="scale_r9_manifest_")
    ckpt = tempfile.mkdtemp(prefix="scale_r9_manifest_ck_")
    try:
        n_commits, rows_per, cap = 60, 400, 10

        def land(c):
            (
                spark.range(rows_per)
                .select(
                    (F.col("id") + c * rows_per).alias("id"),
                    F.concat(F.lit(f"c{c}_"), F.col("id").cast("string")).alias("s"),
                )
                .repartition(4)
                .write.format(MS.FORMAT_NAME)
                .option("path", path)
                .mode("append")
                .save()
            )

        t0 = time.time()
        for c in range(n_commits // 2):  # backlog before the tail starts
            land(c)
        t_land = time.time() - t0

        batches: list[int] = []
        seen = [0]

        def fold(df, _bid):
            n = df.count()
            if n:
                batches.append(n)
                seen[0] += n

        t0 = time.time()
        q = (
            spark.readStream.format(MS.FORMAT_NAME)
            .schema("id long, s string")
            .option("path", path)
            .option("max_versions_per_trigger", str(cap))
            .load()
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        for c in range(n_commits // 2, n_commits):  # land WHILE tailing
            land(c)
        deadline = time.time() + 240
        while seen[0] < n_commits * rows_per and time.time() < deadline:
            time.sleep(0.5)
        q.stop()
        t_tail = time.time() - t0
        man = MS.read_manifest_dict(path)
        assert man["commit_seq"] == n_commits
        n_shards_before = len(man["shards"])
        assert seen[0] == n_commits * rows_per, f"tail saw {seen[0]}"
        # the run's first batch (the pre-tail backlog) is uncapped by
        # design; every later batch spans <= cap commits (pytest pins
        # the exact cap semantics; this is the at-scale receipt)
        assert all(n <= cap * rows_per for n in batches[1:]), batches
        assert len(batches) >= 3  # mid-tail landings arrived batched

        t0 = time.time()
        man2 = MS.compact(spark, path, schema="id long, s string",
                          target_shards=8)
        t_compact = time.time() - t0
        assert man2["n_rows"] == n_commits * rows_per
        assert len(man2["shards"]) == 8
        assert all(s["data_change"] is False for s in man2["shards"])

        t0 = time.time()
        expired = MS.expire_history(path, keep_last=1)
        deleted = MS.vacuum_unreferenced(path)
        t_vacuum = time.time() - t0
        assert len(expired) == n_commits  # all but the compact version
        assert len(deleted) == n_shards_before
        back = MS.read_manifest(spark, path, schema="id long, s string")
        assert back.count() == n_commits * rows_per

        print(
            f"[3] manifest lakehouse churn: {n_commits} commits / "
            f"{n_shards_before} shards (half landed live, mid-tail); "
            f"throttled tail drained {seen[0]} rows in {len(batches)} "
            f"batches (cap {cap} commits/batch after the backlog batch) "
            f"in {t_tail:.1f}s; backlog landing {t_land:.1f}s; "
            f"compact -> 8 shards "
            f"in {t_compact:.1f}s; expire+vacuum collected "
            f"{len(deleted)} originals in {t_vacuum:.1f}s"
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    check_planted_maximal_repeats(spark)
    check_lcp_walk_hot_doc_pairs(spark, n_pairs)
    check_manifest_lakehouse_churn(spark)
    spark.stop()
    print("scale_check_r9: ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
