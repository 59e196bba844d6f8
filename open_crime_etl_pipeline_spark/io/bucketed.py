"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of
both sides. Bucketing pays that shuffle ONCE at write time — each table
is hash-clustered into N buckets on the join key — after which every
join (and groupBy) on that key reads co-located buckets and runs with
NO exchange on either side. This is the Spark-native equivalent of the
warehouse-side clustered storage the reference leans on its MERGE
target for (staged upsert into a keyed Postgres/Snowflake table,
db_postgres.py:169-171): the key layout is decided at load time so
incremental work never re-partitions the big side.

Caveats encoded here rather than left to the caller:
- ``bucketBy`` requires ``saveAsTable`` (a catalog entry); plain
  ``parquet(path)`` silently drops bucketing. We write external tables
  (explicit ``path``) so data outlives the catalog.
- Both join sides must agree on bucket count (or be integer multiples,
  with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) for the
  exchange to be elided.
- ``sortBy`` within buckets additionally removes the per-task sort a
  SortMergeJoin would need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: list[str],
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external parquet table hash-bucketed on
    ``keys``. Joins/aggregations keyed on ``keys`` between tables that
    share ``n_buckets`` then plan with zero Exchange nodes."""
    writer = df.write.format("parquet").mode(mode).option("path", path)
    writer = writer.bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys. With
    matching bucket counts the physical plan has no Exchange — each
    task reads bucket i of both sides locally."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
