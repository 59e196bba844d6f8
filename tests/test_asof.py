"""As-of join operator semantics (tie handling, NULL extension,
coherent row carry) and its single-shuffle plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.operators.asof import asof_join

T0 = dt.datetime(2025, 3, 1)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_basic_tie_and_null_extension(spark):
    left = spark.createDataFrame(
        [(1, _m(10), "a"), (1, _m(30), "b"), (2, _m(5), "c"), (3, _m(99), "d")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _m(10), 100, 1.0),   # exact tie with left "a": must match
            (1, _m(20), 101, 2.0),
            (1, _m(31), 102, 3.0),   # after left "b": must NOT match
            (2, _m(6), 200, 4.0),    # after left "c": no match → NULLs
        ],
        "k long, ts timestamp, rid int, rv double",
    )
    out = {
        r.tag: (r.rid, r.rv)
        for r in asof_join(left, right, on="k", ts="ts", value_cols=["rid", "rv"]).collect()
    }
    assert out["a"] == (100, 1.0)    # ts == left.ts counts as "at-or-before"
    assert out["b"] == (101, 2.0)    # latest ≤ 30 is the 20-minute row
    assert out["c"] == (None, None)  # right exists but only in the future
    assert out["d"] == (None, None)  # key absent from right entirely


def test_asof_equal_right_timestamps_resolve_to_largest_seq(spark):
    left = spark.createDataFrame([(1, _m(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _m(5), 7, 1.0), (1, _m(5), 9, 2.0), (1, _m(5), 8, 3.0)],
        "k long, ts timestamp, rid int, rv double",
    )
    row = asof_join(left, right, on="k", ts="ts", value_cols=["rid", "rv"]).first()
    assert (row.rid, row.rv) == (9, 2.0)  # deterministic: max seq wins


def test_asof_carries_coherent_row_when_fields_null(spark):
    """A NULL field in the newest right row must stay NULL — not get
    backfilled from an older right row (the bug a per-column
    ignorenulls carry would have)."""
    left = spark.createDataFrame([(1, _m(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _m(1), 100, 1.0), (1, _m(5), 101, None)],
        "k long, ts timestamp, rid int, rv double",
    )
    row = asof_join(left, right, on="k", ts="ts", value_cols=["rid", "rv"]).first()
    assert row.rid == 101 and row.rv is None


def test_asof_plan_has_single_shuffle(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 90).alias("ts"),
        F.col("id").alias("rid"),
    )
    df = asof_join(left, right, on="k", ts="ts", value_cols=["rid"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one hash exchange on the key; crucially NO join node at all —
    # the naive form would be a range-condition join exploding per key
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, _m(10), "a"), (1, _m(30), "b"), (2, _m(50), "c")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _m(10), 100, 1.0),   # exact tie with "a": matches forward too
            (1, _m(25), 101, 2.0),   # before "b": must NOT match it
            (1, _m(40), 102, 3.0),   # earliest ≥ 30 → matches "b"
            (2, _m(45), 200, 4.0),   # before "c" only → no match for "c"
        ],
        "k long, ts timestamp, rid int, rv double",
    )
    out = {
        r.tag: (r.rid, r.rv)
        for r in asof_join(
            left, right, on="k", ts="ts", value_cols=["rid", "rv"],
            direction="forward",
        ).collect()
    }
    assert out["a"] == (100, 1.0)
    assert out["b"] == (102, 3.0)
    assert out["c"] == (None, None)


def test_asof_forward_ties_resolve_to_smallest_seq(spark):
    left = spark.createDataFrame([(1, _m(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _m(20), 9, 1.0), (1, _m(20), 7, 2.0), (1, _m(20), 8, 3.0)],
        "k long, ts timestamp, rid int, rv double",
    )
    row = asof_join(
        left, right, on="k", ts="ts", value_cols=["rid", "rv"],
        direction="forward",
    ).first()
    assert (row.rid, row.rv) == (7, 2.0)  # deterministic: min seq wins


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, _m(10), "a"), (1, _m(120), "b")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _m(5), 100, 1.0)],
        "k long, ts timestamp, rid int, rv double",
    )
    out = {
        r.tag: (r.rid, r.rv)
        for r in asof_join(
            left, right, on="k", ts="ts", value_cols=["rid", "rv"],
            tolerance="INTERVAL 30 MINUTE",
        ).collect()
    }
    assert out["a"] == (100, 1.0)    # 5 min stale: inside tolerance
    assert out["b"] == (None, None)  # 115 min stale: nulled, not carried


def test_asof_tolerance_boundary_inclusive_and_forward(spark):
    left = spark.createDataFrame([(1, _m(10), "a")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _m(40), 100, 1.0)], "k long, ts timestamp, rid int, rv double"
    )
    exact = asof_join(
        left, right, on="k", ts="ts", value_cols=["rid", "rv"],
        direction="forward", tolerance="INTERVAL 30 MINUTE",
    ).first()
    assert exact.rid == 100  # exactly at the bound: inclusive, like merge_asof
    tight = asof_join(
        left, right, on="k", ts="ts", value_cols=["rid", "rv"],
        direction="forward", tolerance="INTERVAL 29 MINUTE",
    ).first()
    assert tight.rid is None


def test_asof_rejects_colliding_and_missing_columns(spark):
    import pytest as _pytest

    left = spark.createDataFrame([(1, _m(0), 5)], "k long, ts timestamp, rid int")
    right = spark.createDataFrame([(1, _m(0), 7, 1.0)], "k long, ts timestamp, rid int, rv double")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", ts="ts", value_cols=["rid"])
    with _pytest.raises(ValueError, match="lacks"):
        asof_join(left.drop("rid"), right, on="k", ts="ts", value_cols=["nope"])
