"""Watermark controller, run ledger, and reconciliation unit tests
(SURVEY §2.8 ST1-ST9)."""

from __future__ import annotations

import datetime as dt

from open_crime_etl_pipeline_spark.incremental import (
    RunLedger,
    decide_mode,
    incremental_window,
    missing_load_dates,
    read_watermark,
    reconcile_replicas,
)
from open_crime_etl_pipeline_spark.incremental.watermark import (
    FULL_LOAD_EPOCH,
    month_windows,
)


def test_watermark_null_on_empty(spark):
    df = spark.createDataFrame([], "ts timestamp")
    assert read_watermark(df, "ts") is None
    assert decide_mode(None) == "FULL"


def test_watermark_reads_max(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2025, 3, 1, 10),), (dt.datetime(2025, 3, 5, 8),)], "ts timestamp"
    )
    wm = read_watermark(df, "ts")
    assert wm == dt.datetime(2025, 3, 5, 8)
    assert decide_mode(wm) == "INCREMENT"


def test_incremental_window_midnight_overlap():
    wm = dt.datetime(2025, 3, 5, 8, 30)
    now = dt.datetime(2025, 3, 10)
    start, end = incremental_window(wm, now)
    assert start == dt.datetime(2025, 3, 5, 0, 0)  # midnight of watermark day (ST4)
    assert end == now


def test_full_window_from_epoch():
    now = dt.datetime(2025, 6, 1)
    start, end = incremental_window(None, now)
    assert start == FULL_LOAD_EPOCH
    assert end == now


def test_month_windows_clamped():
    # month-SIZED windows from the start (reference helper.py:41-65
    # relativedelta semantics), last window clamped to end
    wins = month_windows(dt.datetime(2025, 1, 15), dt.datetime(2025, 3, 10))
    assert wins == [
        (dt.datetime(2025, 1, 15), dt.datetime(2025, 2, 15)),
        (dt.datetime(2025, 2, 15), dt.datetime(2025, 3, 10)),
    ]


def test_month_windows_day_overflow():
    # Jan 31 + 1 month clamps to Feb 28 (relativedelta semantics)
    wins = month_windows(dt.datetime(2025, 1, 31), dt.datetime(2025, 3, 15))
    assert wins[0][1] == dt.datetime(2025, 2, 28)


def test_ledger_lifecycle(spark, tmp_path):
    ledger = RunLedger(spark, str(tmp_path / "logs"))
    d = dt.date(2025, 3, 5)
    run_id = ledger.start_run(d, mode="INCREMENT")
    assert ledger.last_successful_load_date() == d  # RUNNING counts (A2 semantics)
    ledger.finish_run(run_id, d, "SUCCESS")
    rows = ledger.read().collect()
    assert len(rows) == 1
    assert rows[0].status == "SUCCESS"
    assert rows[0].end_time is not None
    assert [r.load_date for r in ledger.successful_load_dates().collect()] == [d]
    # Ledger timestamps are tz-consistent UTC instants: with the session
    # timezone pinned to UTC, the collected (naive, session-tz) values
    # must agree with a tz-aware UTC clock, and end >= start.
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    assert abs((now - rows[0].start_time).total_seconds()) < 300
    assert rows[0].end_time >= rows[0].start_time


def test_reconcile_two_sided(spark):
    a = spark.createDataFrame([("2025-01-01",), ("2025-01-02",)], "load_date string")
    b = spark.createDataFrame([("2025-01-02",), ("2025-01-03",)], "load_date string")
    missed = {(r.load_date, r.missing_from) for r in reconcile_replicas(a, b).collect()}
    assert missed == {("2025-01-03", "a"), ("2025-01-01", "b")}
    only_a = [r.load_date for r in missing_load_dates(a, b).collect()]
    assert only_a == ["2025-01-01"]
