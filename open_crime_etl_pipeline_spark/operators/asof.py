"""As-of join: for each left row, the latest right row with
``right.ts <= left.ts`` per key — the time-series lookup engines like
kdb/QuestDB/DuckDB ship natively and Spark lacks.

Spark-first plan, NOT the naive inequality join: a range-condition join
explodes to |L|·|R| candidate pairs per key before filtering, which at
100 TB is the difference between a pass and a meltdown. Instead we
union both sides, sort once within each key, and carry the most recent
right row forward with ``last(..., ignorenulls=True)`` over an
unbounded-preceding window:

- exactly ONE shuffle (hashpartitioning on the key), same cost as any
  keyed agg — no cross product ever materializes;
- per-partition sort + linear scan, all whole-stage codegen;
- the right row travels as ONE struct, so the carried columns always
  come from the same right row even when some of its fields are NULL;
- ties (right.ts == left.ts) match, and equal right timestamps resolve
  to the largest ``seq`` value — deterministic without assuming unique
  timestamps.

``direction="forward"`` is the same shape with the window reversed
(first/unbounded-following): the EARLIEST right row at-or-after each
left row.

``tolerance`` (pandas ``merge_asof``'s staleness bound) rides the same
single pass: the matched right row's timestamp travels inside the
payload struct, and a match further than ``tolerance`` from the left
timestamp is nulled out AFTER the window — no extra join, no second
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    seq: str | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, joined to the latest
    ``right`` row with the same ``on`` key and ``right.ts <= left.ts``
    (NULL-extended when no such row exists). ``direction="forward"``
    flips the inequality: the earliest right row with
    ``right.ts >= left.ts``.

    ``value_cols`` are the right-side columns to carry; they must not
    collide with left column names. ``seq`` (optional, defaults to the
    first value column) breaks ties between equal right timestamps:
    largest wins backward, smallest wins forward.

    ``tolerance`` is a SQL interval expression (e.g. ``"INTERVAL 7
    DAY"``): a matched right row further than that from the left
    timestamp is treated as no match (NULL-extended), like pandas
    ``merge_asof(tolerance=...)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if "__rts" in value_cols:
        raise ValueError("'__rts' is reserved inside the as-of payload")
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} collide with left columns — alias "
            "the right side before joining"
        )
    missing = {on, ts, *value_cols} - set(right.columns)
    if missing:
        raise ValueError(f"right side lacks columns {sorted(missing)}")
    seq = seq or value_cols[0]
    # the right timestamp rides inside the payload so the tolerance
    # check always reads the SAME row the carried values came from
    payload = F.struct(F.col(ts).alias("__rts"), *[F.col(c) for c in value_cols])
    rhs = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("__side"),
        F.col(seq).alias("__seq"),
        payload.alias("__payload"),
    )
    payload_type = rhs.schema["__payload"].dataType
    seq_type = rhs.schema["__seq"].dataType
    lhs = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        F.lit(None).cast(seq_type).alias("__seq"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    left_types = dict(left.dtypes)
    for c in left.columns:
        if c not in (on, ts):
            rhs = rhs.withColumn(c, F.lit(None).cast(left_types[c]))
    merged = lhs.unionByName(rhs.select(*lhs.columns))

    # side ordering keeps a right row at ts == left.ts INSIDE the left
    # row's window: right-before-left when looking back, right-after-left
    # when looking forward
    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col("__side").asc(), F.col("__seq").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last(F.col("__payload"), ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col("__side").desc(), F.col("__seq").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first(F.col("__payload"), ignorenulls=True).over(w)
    out = merged.withColumn("__match", carried).filter(F.col("__side") == 1)
    if tolerance is not None:
        # NULL __match compares NULL → when() yields NULL → stays unmatched
        in_bound = (
            F.col("__match.__rts") >= F.col(ts) - F.expr(tolerance)
            if direction == "backward"
            else F.col("__match.__rts") <= F.col(ts) + F.expr(tolerance)
        )
        out = out.withColumn("__match", F.when(in_bound, F.col("__match")))
    return out.select(
        *left.columns,
        *[F.col(f"__match.{c}").alias(c) for c in value_cols],
    )
