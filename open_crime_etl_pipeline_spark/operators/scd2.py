"""Slowly-changing-dimension type 2: attribute history as validity
intervals.

The reference's warehouse MERGE (staged upsert,
airflow/dags/crimeapi/db/postgres/db_postgres.py:169-171) is SCD type
1 — updates overwrite. Type 2 keeps every version: when a tracked
attribute changes, the open row is closed at the change timestamp and
a new open row starts. This module derives the full history in ONE
keyed window pass:

- union the open snapshot (valid_from as its timestamp) with the
  update stream;
- per key, in timestamp order, keep only rows whose tracked attributes
  DIFFER from the previous row (null-safe struct compare — a no-op
  update collapses away);
- each kept row's validity runs to the next kept row's timestamp
  (``lead``), open-ended for the last.

One hash exchange on the key, one sort, two window passes that reuse
the same partitioning — the chain per key can be arbitrarily long
without any iterative joining. Constraint: update timestamps must be
unique per key and ≥ the snapshot's valid_from (late-arriving
rewrites need a re-derivation from the event log, same as any SCD2
backfill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    snapshot: DataFrame,
    updates: DataFrame,
    keys: list[str],
    attrs: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
) -> DataFrame:
    """Derive the SCD2 history for ``snapshot`` (open rows: keys +
    attrs + ``valid_from``) under ``updates`` (keys + attrs +
    ``ts_col``). Returns keys + attrs + valid_from / valid_to /
    is_current; ``valid_to`` is NULL on open rows."""
    a = snapshot.select(*keys, *attrs, F.col(valid_from).alias("__ts"))
    b = updates.select(*keys, *attrs, F.col(ts_col).alias("__ts"))
    merged = a.unionByName(b)

    w = Window.partitionBy(*keys).orderBy("__ts")
    tracked = F.struct(*[F.col(c) for c in attrs])
    # first row per key: lag is NULL, eqNullSafe(NULL)=false → kept
    changed = ~tracked.eqNullSafe(F.lag(tracked).over(w))
    versions = merged.withColumn("__chg", changed).filter(F.col("__chg"))

    w2 = Window.partitionBy(*keys).orderBy("__ts")
    nxt = F.lead("__ts").over(w2)
    return versions.select(
        *keys,
        *attrs,
        F.col("__ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
