"""Cross-replica reconciliation (SURVEY.md §2.8 ST9, §2.3 J3).

Reference: compare SUCCESS `load_date` sets between the two warehouse
ledgers with Python set subtraction (`crime_etl.py:388-396`), re-load
missing dates as RECOVERY runs. Spark-first: the set difference is an
anti join — no driver-side set materialization, so it works when the
ledgers are large (and is broadcast-tiny when they aren't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missing_load_dates(a: DataFrame, b: DataFrame, col: str = "load_date") -> DataFrame:
    """Dates present in ``a`` but absent from ``b`` (a − b)."""
    return (
        a.select(col).distinct()
        .join(b.select(col).distinct(), on=col, how="left_anti")
    )


def reconcile_replicas(
    a: DataFrame, b: DataFrame, col: str = "load_date"
) -> DataFrame:
    """Two-sided reconciliation: rows needing RECOVERY on each side
    (≡ validate_sync branching, crime_etl.py:377-408). Output columns:
    ``load_date``, ``missing_from`` ('a'|'b')."""
    a_missed = missing_load_dates(b, a, col).withColumn("missing_from", F.lit("a"))
    b_missed = missing_load_dates(a, b, col).withColumn("missing_from", F.lit("b"))
    return a_missed.unionByName(b_missed)
