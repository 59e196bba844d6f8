"""SCD type-2 derivation: version chains, no-op collapse, open/closed
interval bookkeeping, and the single-shuffle plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.operators.scd2 import scd2_apply

T0 = dt.datetime(2025, 1, 1)


def _d(days):
    return T0 + dt.timedelta(days=days)


def _run(spark, snap_rows, upd_rows):
    snap = spark.createDataFrame(snap_rows, "k long, status string, valid_from timestamp")
    upd = spark.createDataFrame(upd_rows, "k long, status string, ts timestamp")
    return scd2_apply(snap, upd, keys=["k"], attrs=["status"], ts_col="ts")


def test_scd2_version_chain_and_noop_collapse(spark):
    out = _run(
        spark,
        [(1, "NEW", _d(0)), (2, "NEW", _d(0))],
        [
            (1, "NEW", _d(5)),    # no-op: same status → must collapse away
            (1, "SHIP", _d(10)),
            (1, "DONE", _d(20)),
            # key 2 receives no effective change
            (2, "NEW", _d(7)),
        ],
    )
    rows = sorted(out.collect(), key=lambda r: (r.k, r.valid_from))
    k1 = [(r.status, r.valid_from, r.valid_to, r.is_current) for r in rows if r.k == 1]
    assert k1 == [
        ("NEW", _d(0), _d(10), False),   # survives the no-op at day 5
        ("SHIP", _d(10), _d(20), False),
        ("DONE", _d(20), None, True),
    ]
    k2 = [(r.status, r.valid_to, r.is_current) for r in rows if r.k == 2]
    assert k2 == [("NEW", None, True)]  # still one open version


def test_scd2_exactly_one_current_version_per_key(spark):
    out = _run(
        spark,
        [(k, "A", _d(0)) for k in range(20)],
        [(k, "B", _d(k + 1)) for k in range(0, 20, 2)]
        + [(k, "C", _d(k + 30)) for k in range(0, 20, 4)],
    )
    per_key = out.groupBy("k").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open"),
        F.count("*").alias("n_versions"),
    )
    assert per_key.filter(F.col("n_open") != 1).count() == 0
    # intervals tile: every closed version's valid_to is the successor's valid_from
    closed = out.filter(~F.col("is_current"))
    assert closed.filter(F.col("valid_to").isNull()).count() == 0


def test_scd2_single_shuffle_plan(spark):
    snap = spark.range(100).select(
        F.col("id").alias("k"), F.lit("A").alias("status"),
        F.lit("2025-01-01").cast("timestamp").alias("valid_from"),
    )
    upd = spark.range(50).select(
        F.col("id").alias("k"), F.lit("B").alias("status"),
        F.lit("2025-02-01").cast("timestamp").alias("ts"),
    )
    df = scd2_apply(snap, upd, keys=["k"], attrs=["status"], ts_col="ts")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both window passes share one hash exchange on the key; version
    # chains of any length never trigger iterative joins
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
