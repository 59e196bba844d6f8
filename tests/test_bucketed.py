"""Bucketed-table co-located join (the write-once-shuffle storage
layout for repeated fact-fact joins at scale)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.io import bucketed_join, write_bucketed
from open_crime_etl_pipeline_spark.io.readers import load_table


@pytest.fixture()
def no_broadcast(spark):
    """Force the shuffled-join path so the exchange-elision assertion
    is meaningful (sf0.001 dims would otherwise broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_elides_exchange(spark, sf_dir, tmp_path, no_broadcast):
    tag = uuid.uuid4().hex[:8]
    lt, rt = f"orders_b_{tag}", f"cust_b_{tag}"
    try:
        write_bucketed(
            load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
            lt, str(tmp_path / lt), keys=["o_custkey"], n_buckets=4,
        )
        write_bucketed(
            load_table(spark, sf_dir, "customer")
            .select(F.col("c_custkey").alias("o_custkey"), "c_name"),
            rt, str(tmp_path / rt), keys=["o_custkey"], n_buckets=4,
        )
        joined = bucketed_join(spark, lt, rt, on=["o_custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan  # real shuffled-join path, not broadcast
        assert "Exchange" not in plan  # both sides read pre-bucketed, co-located

        # same rows as the plain (exchange-paying) join
        expect = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey"),
                "o_custkey",
            )
            .count()
        )
        assert joined.count() == expect and expect > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_bucketed_groupby_elides_exchange(spark, sf_dir, tmp_path):
    """Aggregation keyed on the bucket key also skips its shuffle —
    the bucketing amortizes across every downstream keyed op."""
    tag = uuid.uuid4().hex[:8]
    t = f"orders_g_{tag}"
    try:
        write_bucketed(
            load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
            t, str(tmp_path / t), keys=["o_custkey"], n_buckets=4,
        )
        agg = spark.table(t).groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
