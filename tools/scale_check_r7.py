#!/usr/bin/env python3
"""Round-7 scale proof-points.

1. AUC at ~10^6 DISTINCT scores (VERDICT r6 finding #2 closed):
   `auc_calibration_over` now routes its cumulative pos/neg counts
   through `operators.ranking.global_running_sums` (two-pass range-
   partition prefix sums). The old `Window.orderBy("p")` form put the
   whole distinct-score table through ONE task — invisible at
   sketch-sized score tables, fatal when a continuous-score
   classifier makes the table corpus-sized. This runs the metric
   engine at n = 10^5 and 10^6 fully-distinct scores and asserts the
   closed form: with p_i = (i+1)/(n+1) (all distinct, no ties) and y_i = i % 2
   over n = 2M rows, the pos>neg pair count is M(M+1)/2 of M^2 pairs,
   so ROC-AUC = (M+1)/(2M) exactly — 0.500005 at n=10^5 and 0.5000005
   at n=10^6 before the engine's 6dp rounding.

2. Carry-join regime guard (VERDICT r6 finding #3): the scan
   operators' `entering` side has one row per (series, chunk) — tiny
   in the few-long-series regime, unbounded in the many-series
   regime. The forced F.broadcast hint is gone (the equi-join is
   unhinted; AQE broadcasts only when actually small); this runs
   ewma_affine_scan over 200_000 single-chunk series (the adversarial
   many-series regime, where a forced broadcast would build a
   200k-row driver-side table) and asserts the closed-form fixpoint
   EWMA(const) == const on every series.

Usage: python tools/scale_check_r7.py [auc_n ...]  (default: 1e5 1e6)
"""

from __future__ import annotations

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
        .appName("scale_check_r7")
        .getOrCreate()
    )


def main(auc_ns: list[int]) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.queries.llm.training import (
        auc_calibration_over,
    )

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")

    for n in auc_ns:
        assert n % 2 == 0
        m = n // 2
        scored = spark.range(n).select(
            (F.col("id") % 2).cast("long").alias("y"),
            # all DISTINCT probabilities in (0,1): spacing 1/(n+1) is
            # ~1e-6 at n=1e6, far above double resolution — no collisions
            ((F.col("id") + 1) / F.lit(float(n + 1))).alias("p"),
        )
        t0 = time.time()
        rows = auc_calibration_over(scored).collect()
        wall = time.time() - t0
        expect = round((m + 1) / (2.0 * m), 6)
        got = rows[0]["roc_auc"]
        assert got == expect, (got, expect)
        assert all(r["roc_auc"] == expect for r in rows)
        assert all(0.0 < r["pr_auc"] < 1.0 for r in rows)
        assert sum(r["n_docs"] for r in rows) == n
        print(
            f"auc distinct-scores n={n:>9,}  roc_auc={got} (closed form "
            f"{expect})  wall={wall:6.2f}s"
        )
    print(
        "auc at corpus-sized distinct-score tables: closed form holds, "
        "no single-task window  OK"
    )

    # --- many-series regime for the affine scan (200k series x 8 pts)
    from open_crime_etl_pipeline_spark.operators.scan import ewma_affine_scan

    n_series, pts = 200_000, 8
    df = (
        spark.range(n_series * pts)
        .select(
            (F.col("id") % n_series).cast("long").alias("series"),
            F.floor(F.col("id") / n_series).cast("long").alias("k"),
            F.lit(7.5).alias("x"),
            F.lit(0).alias("ck"),  # every series is one chunk
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    bad = (
        ewma_affine_scan(df, "series", "k", "x", F.col("ck"))
        .filter(F.abs(F.col("ewma") - F.lit(7.5)) > 1e-9)
        .count()
    )
    wall = time.time() - t0
    assert bad == 0, bad
    print(
        f"many-series scan regime: {n_series:,} series x {pts} pts, "
        f"EWMA(const)==const on all rows, wall={wall:6.2f}s  OK"
    )
    spark.stop()




def extra_checks() -> None:
    """Round-7 wave-2 scale proofs (run: python tools/scale_check_r7.py --extra):

    3. Misra-Gries heavy hitters at 1e7 rows / ~1e6 distinct keys: the
       candidate stage must keep <= k*P keys and the final answer must
       equal the closed-form plant (keys 'h0'..'h9' each 1e5 copies on a
       1e7-row stream with ~1e6-key uniform noise; threshold: cnt*k > N with k=110 -> planted 1e5*110 = 1.1e7 > 1e7
       passes; every ~9-copy noise key is far below).
    4. Suffix ranks on ONE 1e5-char document: prefix doubling must stay
       in integer space (never sort suffix strings); closed-form check:
       text = 'ab'*50000 — suffixes alternate 'abab…'/'bab…', so ALL
       'b'-suffixes rank after all 'a'-suffixes, and within each class
       LONGER suffixes sort before shorter ones iff they end in 'ab'
       (periodicity): sa_rank of pos p = descending in p within parity
       class for this text. We assert the full closed form.
    5. Winnowing at ~1e6 grams: density stays within [1/(w+1), 2/(w+1)]
       bounds (+tolerance), fingerprint positions valid.
    """
    import time

    from pyspark.sql import functions as F

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")

    # --- 3: MG heavy hitters at 1e7 rows
    from open_crime_etl_pipeline_spark.operators.frequent import (
        heavy_hitters_exact,
    )

    n_noise, n_plant, k = 9_000_000, 10, 110
    noise = spark.range(n_noise).select(
        F.concat(F.lit("u"), (F.col("id") % 1_000_000).cast("string")).alias("tok")
    )
    plant = spark.range(n_plant * 100_000).select(
        F.concat(F.lit("h"), (F.col("id") % n_plant).cast("string")).alias("tok")
    )
    t0 = time.time()
    got = {
        r["tok"]: r["cnt"]
        for r in heavy_hitters_exact(noise.unionAll(plant), "tok", k).collect()
    }
    wall = time.time() - t0
    n_total = n_noise + n_plant * 100_000
    # planted keys: 100_000 + 9 noise collisions? (noise keys are uN, plants hN — disjoint)
    assert got == {f"h{i}": 100_000 for i in range(n_plant)}, got
    assert all(c * k > n_total for c in got.values())
    print(f"mg heavy hitters 1e7 rows / ~1e6 distinct: 10/10 planted, "
          f"wall={wall:6.2f}s  OK")

    # --- 4: suffix ranks on one 300k-char periodic document
    from open_crime_etl_pipeline_spark.operators.suffix import suffix_ranks

    m = 50_000
    # maximally periodic text: the adversarial case — every round's
    # pair-join key is shared by HALF the suffixes until late rounds
    # (AQE skew-join splits those partitions; without it one task
    # carries the round)
    doc = spark.createDataFrame([(1,)], "doc_id long").select(
        "doc_id", F.expr(f"repeat('ab', {m})").alias("text")
    )
    t0 = time.time()
    ranks = {
        r["pos"]: r["sa_rank"]
        for r in suffix_ranks(doc, "doc_id", "text", w0=8).collect()
    }
    wall = time.time() - t0
    n = 2 * m
    # closed form for 'ab'*m: suffix at odd pos p is 'ab…b' with
    # (n-p+1)/2 'ab' units; longer a-suffix < shorter a-suffix is FALSE:
    # 'ab' < 'abab…' (prefix-of sorts first) so a-suffix rank ascends
    # with SHORTER length first: rank(p_odd) = (p+1)/2 reversed…
    # a-suffixes: 'ab' (pos n-1) < 'abab' (pos n-3) < … so rank 1 goes
    # to pos n-1, rank 2 to pos n-3, …, rank m to pos 1.
    # b-suffixes: 'b' (pos n) < 'bab' (pos n-2) < … rank m+1 -> pos n.
    for p, r in ranks.items():
        if p % 2 == 1:  # a-suffix
            expect = (n - p + 1) // 2
        else:  # b-suffix
            expect = m + (n - p + 2) // 2
        assert r == expect, (p, r, expect)
    print(f"suffix ranks 100k-char periodic doc: closed form holds on all "
          f"{n:,} suffixes, wall={wall:6.2f}s  OK")

    # --- 5: winnowing density at ~1e6 grams
    from open_crime_etl_pipeline_spark.operators.winnow import (
        winnowing_fingerprints,
    )

    k_, w_ = 5, 8
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.concat(F.lit("seed"), F.col("id").cast("string")), 256).alias("h64"),
    ).select(
        "doc_id",
        F.expr("repeat(h64, 16)").alias("text"),  # 1024 pseudo-random chars
    )
    n_grams = 1000 * (1024 - k_ + 1)
    t0 = time.time()
    n_sel = winnowing_fingerprints(docs, "doc_id", "text", k=k_, w=w_).count()
    wall = time.time() - t0
    density = n_sel / n_grams
    lo, hi = 1.0 / (w_ + 1), 2.0 / (w_ + 1)
    assert lo * 0.8 < density < hi * 1.5, density
    print(f"winnowing 1e6 grams: density={density:.4f} in "
          f"[{lo:.3f},{hi:.3f}] band, wall={wall:6.2f}s  OK")
    spark.stop()


if __name__ == "__main__":
    if "--extra" in sys.argv:
        extra_checks()
    else:
        ns = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
        main(ns)
