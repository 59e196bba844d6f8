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


if __name__ == "__main__":
    ns = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    main(ns)
