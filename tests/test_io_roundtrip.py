"""Landing-zone writer/reader round trip (SURVEY §2.1 S3-S6): hive
layout, gzip-JSON, partition pruning reaching the scan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.io.readers import read_crime_pages
from open_crime_etl_pipeline_spark.io.writers import write_partitioned_crime
from open_crime_etl_pipeline_spark.sources import register_socrata_source
from open_crime_etl_pipeline_spark.transform.crime import transform_crime_page


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    register_socrata_source(spark)
    raw = (
        spark.read.format("socrata_crime")
        .option("endpoint", "fake://60").option("pagesize", "25")
        .option("start_date", "2025-01-01T00:00:00.000")
        .option("end_date", "2025-03-01T00:00:00.000")
        .load()
    )
    silver = transform_crime_page(raw)
    path = str(tmp_path_factory.mktemp("zone") / "raw")
    write_partitioned_crime(silver, path, fmt="json", load_date="2025-03-02")
    return path, silver


def test_roundtrip_preserves_rows(spark, landing):
    path, silver = landing
    back = spark.read.json(path)
    assert back.count() == silver.count() == 120
    # hive partition columns discovered
    assert {"year", "month", "load_date"} <= set(back.columns)
    # paths are zero-padded (month=01); discovery infers ints from them
    assert set(r.month for r in back.select("month").distinct().collect()) == {1, 2}


def test_partition_pruning_reaches_scan(spark, landing):
    path, _ = landing
    pruned = spark.read.json(path).filter(F.col("month") == 2)
    # the month predicate must plan as a partition filter (directory
    # pruning), not a data filter — inputFiles() reflects the unpruned
    # index, so assert on the physical plan
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "month" in plan.split("PartitionFilters")[1][:120]
    assert pruned.count() == 60


def test_gzip_compression_applied(spark, landing):
    path, _ = landing
    files = spark.read.json(path).inputFiles()
    assert files and all(f.endswith(".gz") for f in files)


def test_dual_sink_fanout(spark, tmp_path):
    from open_crime_etl_pipeline_spark.io.writers import write_dual

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    a, b = str(tmp_path / "sink_a"), str(tmp_path / "sink_b")
    write_dual(df, a, b)
    ra = sorted((r.id, r.v) for r in spark.read.parquet(a).collect())
    rb = sorted((r.id, r.v) for r in spark.read.parquet(b).collect())
    assert ra == rb and len(ra) == 100


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """A landing zone grows columns over time: old files lack the new
    column, new files carry it. mergeSchema unions the footers at plan
    time and NULL-fills the old files — no rewrite of historical data."""
    base = str(tmp_path / "evolving")
    spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v")) \
        .write.parquet(f"{base}/batch=1")
    spark.range(10, 20).select(
        F.col("id"), (F.col("id") * 2).alias("v"), F.lit("src9").alias("origin")
    ).write.parquet(f"{base}/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "v", "origin", "batch"}
    assert merged.count() == 20
    old = merged.filter(F.col("batch") == 1)
    assert old.filter(F.col("origin").isNull()).count() == 10  # backfilled as NULL
    assert merged.filter(F.col("origin") == "src9").count() == 10

    # default read keeps the historically-declared schema: pinning an
    # explicit schema is what makes old pipelines immune to new columns
    pinned = spark.read.schema("id long, v long").parquet(f"{base}/batch=2")
    assert set(pinned.columns) == {"id", "v"} and pinned.count() == 10


def test_observe_batch_metrics_ride_the_write_pass(spark, tmp_path):
    """Observation metrics must equal the written rows' true stats
    without any second scan (the validate_sync accounting, in-pass)."""
    from open_crime_etl_pipeline_spark.io.metrics import observe_batch

    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.when(F.col("id") % 100 == 0, None).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    inst, obs = observe_batch(df, name="t", key="k")
    inst.write.mode("overwrite").parquet(str(tmp_path / "out"))
    m = obs.get
    assert m["n_rows"] == 1000
    assert m["null_keys"] == 10
    # approx distinct within 5% of the 990 true distinct keys
    assert abs(m["approx_distinct_keys"] - 990) <= 50
