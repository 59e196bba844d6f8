"""operators/scan.py — segmented affine prefix scan (distributed EWMA).

The property under test everywhere: the chunked scan replays the
sequential recurrence s_1 = x_1, s_t = a*x_t + (1-a)*s_{t-1} for every
element of every series, regardless of how the series is cut into
chunks — chunking is an execution detail, never a semantic one.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.operators.scan import ewma_affine_scan


def _sequential(rows, alpha=0.2):
    exp = {}
    by_series: dict = {}
    for s, o, x in rows:
        by_series.setdefault(s, []).append((o, x))
    for s, items in by_series.items():
        e = None
        for o, x in sorted(items):
            e = x if e is None else alpha * x + (1.0 - alpha) * e
            exp[(s, o)] = e
    return exp


def _check(rows, got, tol=1e-9, alpha=0.2):
    exp = _sequential(rows, alpha)
    assert len(got) == len(rows)
    for r in got:
        key = (r[0], r[1])
        assert abs(r.ewma - exp[key]) <= tol, (key, r.ewma, exp[key])


def test_scan_matches_sequential_across_chunk_boundaries(spark):
    rng = random.Random(7)
    rows = []
    for s in ("a", "b", "c"):
        for m in range(1, 5):
            for d in range(1, 1 + rng.randrange(1, 28)):
                rows.append((s, f"2001-{m:02d}-{d:02d}", float(rng.randrange(1, 50))))
    df = spark.createDataFrame(rows, ["series", "day", "x"])
    got = ewma_affine_scan(df, "series", "day", "x", F.substring("day", 1, 7)).collect()
    _check(rows, got)


def test_scan_chunk_granularity_is_semantically_invisible(spark):
    """Month chunks, year chunks (single chunk), and day chunks (one
    element per chunk) must all give the same answer to ~n*eps."""
    rng = random.Random(13)
    rows = [
        ("s", f"2001-{m:02d}-{d:02d}", float(rng.randrange(1, 30)))
        for m in range(1, 7)
        for d in range(1, 25)
    ]
    df = spark.createDataFrame(rows, ["series", "day", "x"])
    outs = []
    for chunk in (F.substring("day", 1, 7), F.substring("day", 1, 4), F.col("day")):
        got = ewma_affine_scan(df, "series", "day", "x", chunk).collect()
        _check(rows, got, tol=1e-9)
        outs.append({(r.series, r.day): r.ewma for r in got})
    for other in outs[1:]:
        assert all(abs(outs[0][k] - other[k]) <= 1e-9 for k in outs[0])


def test_scan_single_element_series_and_seed(spark):
    """s_1 = x_1 exactly at 6dp (the seed contract); a one-element
    series and a one-element chunk are both fine."""
    rows = [("lone", "2001-01-01", 7.0), ("pair", "2001-01-31", 3.0),
            ("pair", "2001-02-01", 9.0)]
    df = spark.createDataFrame(rows, ["series", "day", "x"])
    got = {
        (r.series, r.day): r.ewma
        for r in ewma_affine_scan(
            df, "series", "day", "x", F.substring("day", 1, 7)
        ).collect()
    }
    assert round(got[("lone", "2001-01-01")], 6) == 7.0
    assert round(got[("pair", "2001-01-31")], 6) == 3.0
    assert abs(got[("pair", "2001-02-01")] - (0.2 * 9.0 + 0.8 * 3.0)) < 1e-12


def test_scan_alpha_parameter(spark):
    rows = [("s", f"2001-01-{d:02d}", float(d * d % 11)) for d in range(1, 20)]
    df = spark.createDataFrame(rows, ["series", "day", "x"])
    got = ewma_affine_scan(
        df, "series", "day", "x", F.substring("day", 1, 7), alpha=0.5
    ).collect()
    _check(rows, got, alpha=0.5)


def test_scan_many_chunks_one_series(spark):
    """A single series cut into 32 chunks across 8 partitions — the
    shape the operator exists for (series > one task)."""
    n = 2048
    df = (
        spark.range(n)
        .repartition(8)
        .select(
            F.lit("s").alias("series"),
            F.format_string("%06d", F.col("id")).alias("k"),
            (F.col("id") % 97).cast("double").alias("x"),
            F.format_string("%02d", (F.col("id") / 64).cast("int")).alias("ck"),
        )
    )
    rows = [("s", f"{i:06d}", float(i % 97)) for i in range(n)]
    got = ewma_affine_scan(df, "series", "k", "x", F.col("ck")).collect()
    _check(rows, got, tol=1e-8)


def test_time_decay_scan_matches_sequential_with_ties(spark):
    """Irregular time-decay EWMA: the chunked scan replays the
    sequential recurrence s_t = a*s + (1-a)*x, a = exp(-dt/tau),
    including EXACT-tie timestamps (dt=0 elements carry zero weight;
    the (t, id) sort pins which element is 'first' deterministically)
    and chunk boundaries (week chunks over random multi-day gaps)."""
    import datetime as dt
    import math
    import random

    from open_crime_etl_pipeline_spark.operators.scan import (
        ewma_time_decay_scan,
    )

    rng = random.Random(5)
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    for u in (1, 2):
        t = base
        for _ in range(200):
            t = t + dt.timedelta(seconds=rng.randrange(0, 90_000))
            rows.append((u, eid, t, float(rng.randrange(0, 500))))
            eid += 1
    rows.append((1, 90_001, rows[5][2], 123.0))  # exact-tie pair,
    rows.append((1, 90_000, rows[5][2], 77.0))   # ids out of insert order
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = {
        r.event_id: r.ewma
        for r in ewma_time_decay_scan(
            df, "user_id", "ts", "value", "event_id",
            F.date_trunc("week", F.col("ts")), 86400.0,
        ).collect()
    }
    exp = {}
    for u in (1, 2):
        evs = sorted([r for r in rows if r[0] == u], key=lambda r: (r[2], r[1]))
        s, pt = None, None
        for _, e, t, x in evs:
            if s is None:
                s = x
            else:
                a = math.exp(-((t - pt).total_seconds()) / 86400.0)
                s = a * s + (1 - a) * x
            pt = t
            exp[e] = s
    assert len(got) == len(rows)
    for e, v in exp.items():
        assert abs(got[e] - v) <= 1e-9 * max(1.0, abs(v)), (e, got[e], v)


def test_time_decay_scan_gap_resets_and_burst_holds(spark):
    """Semantics spot-check: after a gap >> tau the state is ~x_new;
    within a burst << tau the state barely moves."""
    import datetime as dt

    from open_crime_etl_pipeline_spark.operators.scan import (
        ewma_time_decay_scan,
    )

    base = dt.datetime(2024, 6, 1)
    rows = [
        ("u", 1, base, 100.0),
        ("u", 2, base + dt.timedelta(seconds=10), 0.0),   # burst: ~100 still
        ("u", 3, base + dt.timedelta(days=365), 7.0),     # gap: ~7
    ]
    df = spark.createDataFrame(
        rows, "series string, event_id long, ts timestamp, value double"
    )
    got = {
        r.event_id: r.ewma
        for r in ewma_time_decay_scan(
            df, "series", "ts", "value", "event_id",
            F.date_trunc("month", F.col("ts")), 86400.0,
        ).collect()
    }
    assert got[1] == 100.0
    assert 99.9 < got[2] < 100.0   # 10s of decay against tau=1d
    assert abs(got[3] - 7.0) < 1e-6  # a year of decay resets to the new x


def test_scan_numeric_and_timestamp_chunk_keys(spark):
    """The carry fold's array type derives from the ACTUAL chunk-key
    expression, so numeric chunk keys (floor-division granules — the
    docstring's own example) work, not just strings."""
    rows = [("s", f"{i:04d}", float(i % 13)) for i in range(100)]
    df = spark.createDataFrame(rows, ["series", "k", "x"])
    got = ewma_affine_scan(
        df, "series", "k", "x", F.floor(F.col("k").cast("int") / 16)
    ).collect()
    _check(rows, got)
