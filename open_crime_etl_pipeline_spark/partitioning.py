"""Compute-stage fan-out guard (optimization round 12).

A Spark scan parallelizes by input split, and a parquet file is only
splittable at row-group boundaries — so a table that arrives as a few
single-row-group files pins every scan-side stage to a handful of
tasks. For I/O-bound projections that is irrelevant, but this engine
runs heavy COMPUTE in scan-side stages (gram explodes + md5/xxhash,
HOF distance folds, Expand-based multi-distinct aggregation): with one
input split the whole stage serializes on one core while the rest of
the cluster idles (guide §2.5 "input skew: one huge unsplittable
file ... repartition immediately after the read").

``fan_out`` is the shared guard several dedup/similarity operators
already carried inline: round-robin repartition UP to the session's
default parallelism, only when the frame is narrower than that. It is
scale-adaptive by construction — at production scale any real table
carries at least cluster-parallelism splits, the predicate is false,
and the guard is a no-op; it never repartitions DOWN, so it cannot
discard existing parallelism. The round-robin exchange moves the raw
input rows once, BEFORE the amplifying compute (cheapest possible
point: pre-explode, pre-Expand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_parts`` (default: the session's
    ``defaultParallelism``) iff it currently has fewer partitions.
    Use ahead of compute-bound scan-side stages; no-op at scale."""
    sc = df.sparkSession.sparkContext
    n = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
