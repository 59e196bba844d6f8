"""High-watermark CDC controller (SURVEY.md §2.8 ST1-ST4).

Reference semantics preserved exactly:
- watermark = MAX(update col) over the target; NULL ⇒ first run
  (ST1, `db_postgres.py:65-71`)
- mode = 'INCREMENT' if watermark else 'FULL' (ST2,
  `crime_etl.py:104-108`)
- FULL window starts at a fixed epoch (ST3, `crime_etl.py:136-138`)
- INCREMENT window starts at *midnight of the watermark's day* — a
  deliberate overlap re-reading the watermark day; duplicates are
  absorbed by the idempotent merge (ST4, `crime_etl.py:195-197`)

The only driver-side action is a 1-row ``collect`` of the MAX — O(1)
data to the driver regardless of table size (the scan itself is a
distributed partial-max).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FULL_LOAD_EPOCH = dt.datetime(2025, 1, 1)  # reference crime_etl.py:136-138

MODE_FULL = "FULL"
MODE_INCREMENT = "INCREMENT"


def read_watermark(target: DataFrame, col: str) -> dt.datetime | None:
    """MAX(col) over the target table; None on empty table (first run)."""
    row = target.agg(F.max(F.col(col)).alias("wm")).first()
    return row["wm"]


def decide_mode(watermark: dt.datetime | None) -> str:
    return MODE_INCREMENT if watermark is not None else MODE_FULL


def incremental_window(
    watermark: dt.datetime | None,
    now: dt.datetime,
    full_epoch: dt.datetime = FULL_LOAD_EPOCH,
) -> tuple[dt.datetime, dt.datetime]:
    """[start, end) ingest window. FULL: from the fixed epoch.
    INCREMENT: from midnight of the watermark day (deliberate overlap,
    ST4 — `datetime.combine(last_source_update, time.min)`)."""
    if watermark is None:
        return full_epoch, now
    start = dt.datetime.combine(watermark.date(), dt.time.min)
    return start, now


def month_windows(
    start: dt.datetime, end: dt.datetime
) -> list[tuple[dt.datetime, dt.datetime]]:
    """Month-sized [start, end) chunks, last clamped to ``end``
    (F4 ≡ generate_date_range, helper.py:41-65) — bounds API pages per
    request in the reference; bounds files per ingest batch here."""
    import calendar

    def add_month(d: dt.datetime) -> dt.datetime:
        year, month = (d.year + 1, 1) if d.month == 12 else (d.year, d.month + 1)
        day = min(d.day, calendar.monthrange(year, month)[1])  # Jan 31 → Feb 28
        return d.replace(year=year, month=month, day=day)

    out = []
    cur = start
    while cur < end:
        nxt = add_month(cur)
        out.append((cur, min(nxt, end)))
        cur = nxt
    return out
