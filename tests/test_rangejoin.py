"""Range-join operator: containment semantics (multi-match, boundary
exclusivity) and the equi-join plan shape that replaces the
BroadcastNestedLoopJoin a bare inequality join plans."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.operators.rangejoin import range_join

T0 = dt.datetime(2024, 1, 1)


def _h(hours):
    return T0 + dt.timedelta(hours=hours)


def test_range_join_containment_and_multimatch(spark):
    pts = spark.createDataFrame(
        [(1, _h(9)), (2, _h(20)), (3, _h(8)), (4, _h(18))],
        "pid int, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [(10, _h(8), _h(18)), (20, _h(0), _h(24)), (30, _h(18), _h(19))],
        "wid int, w_start timestamp, w_end timestamp",
    )
    got = sorted(
        (r.pid, r.wid)
        for r in range_join(
            pts, ivs, ts="ts", start="w_start", end="w_end", granule_seconds=3600
        ).collect()
    )
    assert got == [
        (1, 10), (1, 20),          # point in two overlapping windows
        (2, 20),
        (3, 10), (3, 20),          # start boundary is inclusive
        (4, 20), (4, 30),          # end boundary of wid=10 is exclusive
    ]


def test_range_join_matches_naive_inequality_join(spark):
    pts = spark.range(500).select(
        F.col("id").alias("pid"),
        F.timestamp_seconds(F.col("id") * 137).alias("ts"),
    )
    ivs = spark.range(40).select(
        F.col("id").alias("wid"),
        F.timestamp_seconds(F.col("id") * 1700).alias("w_start"),
        F.timestamp_seconds(F.col("id") * 1700 + 2500).alias("w_end"),
    )
    fast = range_join(pts, ivs, ts="ts", start="w_start", end="w_end",
                      granule_seconds=600)
    naive = pts.join(
        ivs, (F.col("w_start") <= F.col("ts")) & (F.col("ts") < F.col("w_end"))
    )
    key = lambda r: (r.pid, r.wid)
    assert sorted(map(key, fast.collect())) == sorted(map(key, naive.collect()))
    assert fast.count() > 500  # overlapping intervals: real multi-matching


def test_range_join_plans_equi_join_not_nested_loop(spark):
    pts = spark.range(100).select(
        F.col("id").alias("pid"), F.timestamp_seconds(F.col("id") * 60).alias("ts")
    )
    ivs = spark.range(10).select(
        F.col("id").alias("wid"),
        F.timestamp_seconds(F.col("id") * 600).alias("w_start"),
        F.timestamp_seconds(F.col("id") * 600 + 900).alias("w_end"),
    )
    fast_plan = range_join(
        pts, ivs, ts="ts", start="w_start", end="w_end", granule_seconds=300
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in fast_plan  # the whole point of the binning
    assert "HashJoin" in fast_plan  # granule equi-key → hash-joinable
    naive_plan = pts.join(
        ivs, (F.col("w_start") <= F.col("ts")) & (F.col("ts") < F.col("w_end"))
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in naive_plan  # what Spark does without it
