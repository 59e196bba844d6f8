"""Range join: points joined to the intervals containing them.

Spark plans a bare ``start <= ts AND ts < end`` join as
BroadcastNestedLoopJoin (every point × every interval) — quadratic
work that's already painful at thousands of intervals and fatal at
scale. The standard fix (the "bin" optimization in lakehouse SQL
engines) turns the containment predicate into an EQUI-join on a
time granule:

- each interval explodes to the granules it overlaps
  (``sequence(floor(start/g), floor((end-1µs)/g))``);
- each point computes its single granule;
- hash-join on granule, then re-check exact containment.

Each (point, interval) pair meets in exactly one granule — the
point's own — so no dedup pass is needed. Work is
O(points + intervals·span/g) with an ordinary shuffled/broadcast hash
join; pick ``granule_seconds`` near the typical interval length so
most intervals explode to a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    granule_seconds: int = 21600,
    how: str = "inner",
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row with
    ``start <= ts < end`` (end-exclusive). Output columns: all point
    columns plus all interval columns; names must not collide."""
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(
            f"point/interval column names collide: {sorted(clash)} — alias "
            "one side before joining"
        )
    gm = F.lit(int(granule_seconds) * 1_000_000)  # granule in µs
    pts = points.withColumn("__g", F.floor(F.unix_micros(F.col(ts)) / gm))
    ivs = intervals.withColumn(
        "__g",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start)) / gm),
                F.floor((F.unix_micros(F.col(end)) - 1) / gm),
            )
        ),
    )
    return (
        pts.join(ivs, on="__g", how=how)
        .filter((F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end)))
        .drop("__g")
    )
