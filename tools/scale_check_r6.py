#!/usr/bin/env python3
"""Round-6 scale proof-point: the Blelloch affine-scan EWMA
(operators/scan.py::ewma_affine_scan) in the regime the bounded
per-series fold cannot reach — ONE series of >= 10^6 points.

What this measures:

  scan  — ewma_affine_scan over a single synthetic series of N points
          (zero-padded sequence keys, 4096-element chunks), wall clock
          per N. The per-task array bound is the CHUNK, so N only
          moves scan volume: wall should grow ~linearly in N.
  fold  — the queries/timeseries.py shape (collect the whole series
          into ONE task's array, array_append fold) at a ladder of
          small N. Each array_append copies the accumulated array, so
          the fold is O(n^2) inside one task — the ladder exposes the
          quadratic blow-up directly, and the extrapolation to 10^6
          points (~(1e6/ladder_max)^2 x) is the "infeasible" claim:
          at the measured rates it is HOURS in a single thread, while
          the scan finishes in seconds using every core.

Correctness invariant asserted in-tool (not just timed): at the
largest N both variants run (FOLD_MAX), scan and fold agree to 1e-6
on every element — same recurrence, different association order; and
the scan's own 10^6-point run is verified against a closed-form
fixpoint: with constant x = c, s_t == c exactly for all t (EWMA of a
constant is the constant), checked on a second constant-input series.

Usage: python tools/scale_check_r6.py [scan_n ...]  (default: 1e5 1e6)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FOLD_LADDER = [10_000, 20_000, 40_000]
FOLD_MAX = FOLD_LADDER[-1]
CHUNK = 4096


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("scale-check-r6")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _series(spark, n: int, constant: float | None = None):
    from pyspark.sql import functions as F

    x = F.lit(constant) if constant is not None else (F.col("id") % 997).cast(
        "double"
    )
    return (
        spark.range(n)
        .repartition(32)
        .select(
            F.lit("s").alias("series"),
            F.format_string("%010d", F.col("id")).alias("k"),
            x.alias("x"),
            F.format_string("%07d", (F.col("id") / CHUNK).cast("int")).alias("ck"),
        )
    )


def _run_scan(spark, n: int) -> float:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators.scan import ewma_affine_scan

    df = _series(spark, n).localCheckpoint(eager=True)  # exclude gen cost
    t0 = time.time()
    out = ewma_affine_scan(df, "series", "k", "x", F.col("ck"))
    cnt = out.count()
    wall = time.time() - t0
    assert cnt == n, (cnt, n)
    return wall


def _run_fold(spark, n: int) -> float:
    """The bounded-fold shape of queries/timeseries.py, verbatim scale
    structure: ONE collect_list array per series, array_append fold."""
    from pyspark.sql import functions as F

    df = _series(spark, n).localCheckpoint(eager=True)
    t0 = time.time()
    series = df.groupBy("series").agg(
        F.sort_array(F.collect_list(F.struct("k", "x"))).alias("xs")
    )
    path = series.select(
        "series",
        F.expr(
            """
            aggregate(
                xs,
                named_struct(
                    's', CAST(NULL AS DOUBLE),
                    'out', CAST(array() AS ARRAY<STRUCT<k: STRING, e: DOUBLE>>)),
                (acc, p) -> named_struct(
                    's', CASE WHEN acc.s IS NULL THEN p.x
                              ELSE 0.2D * p.x + 0.8D * acc.s END,
                    'out', array_append(acc.out, named_struct(
                        'k', p.k,
                        'e', CASE WHEN acc.s IS NULL THEN p.x
                                  ELSE 0.2D * p.x + 0.8D * acc.s END))),
                acc -> acc.out
            )
            """
        ).alias("path"),
    )
    cnt = path.select(F.explode("path")).count()
    wall = time.time() - t0
    assert cnt == n, (cnt, n)
    return wall


def main(scan_ns: list[int]) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators.scan import ewma_affine_scan

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")

    print(f"== fold ladder (single-task O(n^2) shape), chunk irrelevant ==")
    fold_walls = {}
    for n in FOLD_LADDER:
        fold_walls[n] = _run_fold(spark, n)
        print(f"fold  n={n:>9,}  wall={fold_walls[n]:7.2f}s")
    r1 = fold_walls[FOLD_LADDER[1]] / fold_walls[FOLD_LADDER[0]]
    r2 = fold_walls[FOLD_LADDER[2]] / fold_walls[FOLD_LADDER[1]]
    est_hours = fold_walls[FOLD_MAX] * (1_000_000 / FOLD_MAX) ** 2 / 3600
    print(
        f"fold doubling ratios: {r1:.2f}x, {r2:.2f}x (quadratic => ~4x); "
        f"extrapolated 1e6-point fold ~{est_hours:.1f}h"
    )

    print("== scan (chunked affine prefix, every core) ==")
    scan_walls = {}
    for n in scan_ns:
        scan_walls[n] = _run_scan(spark, n)
        print(f"scan  n={n:>9,}  wall={scan_walls[n]:7.2f}s  chunks={n // CHUNK + 1}")
    # the verdict's done-criterion, asserted not just printed: at the
    # largest scan N (>= 25x the fold ladder's max) the scan must beat
    # the fold's wall at FOLD_MAX — i.e. the fold is slower on 25x
    # LESS data, before its quadratic term even reaches the 1e6 regime
    n_big = max(scan_ns)
    assert n_big >= 25 * FOLD_MAX
    assert scan_walls[n_big] < fold_walls[FOLD_MAX], (
        f"scan at n={n_big:,} ({scan_walls[n_big]:.1f}s) did not beat the "
        f"fold at n={FOLD_MAX:,} ({fold_walls[FOLD_MAX]:.1f}s)"
    )
    print(
        f"fold-infeasible assert: scan({n_big:,}) = {scan_walls[n_big]:.1f}s "
        f"< fold({FOLD_MAX:,}) = {fold_walls[FOLD_MAX]:.1f}s  OK"
    )

    # --- equivalence at FOLD_MAX: same values, different association
    df = _series(spark, FOLD_MAX).localCheckpoint(eager=True)
    scan_out = {
        r.k: r.ewma
        for r in ewma_affine_scan(df, "series", "k", "x", F.col("ck")).collect()
    }
    series = df.groupBy("series").agg(
        F.sort_array(F.collect_list(F.struct("k", "x"))).alias("xs")
    )
    fold_rows = (
        series.select(
            F.explode(
                F.expr(
                    """
            aggregate(
                xs,
                named_struct(
                    's', CAST(NULL AS DOUBLE),
                    'out', CAST(array() AS ARRAY<STRUCT<k: STRING, e: DOUBLE>>)),
                (acc, p) -> named_struct(
                    's', CASE WHEN acc.s IS NULL THEN p.x
                              ELSE 0.2D * p.x + 0.8D * acc.s END,
                    'out', array_append(acc.out, named_struct(
                        'k', p.k,
                        'e', CASE WHEN acc.s IS NULL THEN p.x
                                  ELSE 0.2D * p.x + 0.8D * acc.s END))),
                acc -> acc.out
            )
            """
                )
            ).alias("p")
        )
        .select("p.k", "p.e")
        .collect()
    )
    worst = max(abs(scan_out[r.k] - r.e) for r in fold_rows)
    assert worst <= 1e-6, worst
    print(f"equivalence at n={FOLD_MAX:,}: max |scan - fold| = {worst:.2e}  OK")

    # --- AUC replication invariance: ROC-AUC, PR-AUC, avg-score and
    # positive-rate are functions of per-score CLASS RATIOS, so
    # replicating every scored row m x must leave every ratio metric
    # BIT-IDENTICAL and scale the one count column (n_docs) exactly
    # m x (closed-form invariants), while the distinct-score sketch
    # the metrics derive from stays constant-size. m = 1, 10, 50.
    from pyspark.sql import functions as F2

    from open_crime_etl_pipeline_spark.queries.llm.training import (
        auc_calibration_over,
    )

    def scored(m):
        base = F2.col("id") % 200_000  # true replication: each base row m times
        return (
            spark.range(200_000 * m)
            .select(
                ((base % 7919) % 2).cast("long").alias("y"),
                ((base % 997).cast("double") / 997.0).alias("p"),
            )
        )

    base_rows = None
    for m in (1, 10, 50):
        t0 = time.time()
        rows = sorted(
            tuple(r) for r in auc_calibration_over(scored(m)).collect()
        )
        wall = time.time() - t0
        print(f"auc   m={m:>3}  rows={len(rows)}  wall={wall:6.2f}s")
        if base_rows is None:
            base_rows = rows
        else:
            # ratio metrics (avg_p, frac_pos, roc_auc, pr_auc) must be
            # bit-identical; the one COUNT column scales exactly m x
            assert [r[0] for r in rows] == [r[0] for r in base_rows]
            assert [r[2:] for r in rows] == [r[2:] for r in base_rows], (
                "ratio metrics changed under replication"
            )
            assert [r[1] for r in rows] == [r[1] * m for r in base_rows], (
                "n_docs is not exactly m x base"
            )
    print(
        "auc replication invariance: every ratio metric bit-identical and "
        "n_docs exactly m x base at m=1/10/50  OK"
    )

    # --- closed-form fixpoint at the big N: EWMA(const c) == c
    n_big = max(scan_ns)
    const = _series(spark, n_big, constant=42.0).localCheckpoint(eager=True)
    bad = (
        ewma_affine_scan(const, "series", "k", "x", F.col("ck"))
        .filter(F.abs(F.col("ewma") - F.lit(42.0)) > 1e-9)
        .count()
    )
    assert bad == 0, bad
    print(f"constant-series fixpoint at n={n_big:,}: all values == 42.0  OK")
    spark.stop()


if __name__ == "__main__":
    ns = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    main(ns)
