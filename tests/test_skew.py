"""Salted-join / salted-agg skew operators: results must equal the
unsalted equivalents on skewed data (one hot key dominating)."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.operators.skew import salted_count, salted_join


def _skewed(spark):
    # 5000 rows for hot key 1, a few for others
    hot = spark.range(5000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(50).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold)


def test_salted_join_equals_plain_join(spark):
    large = _skewed(spark)
    small = spark.range(60).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = large.join(small, on=["k"]).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw"))
    salted = salted_join(large, small, on=["k"], salt_buckets=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw"))
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_hot_keys_only(spark):
    large = _skewed(spark)
    small = spark.range(60).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    hot = spark.createDataFrame([(1,)], "k long")
    plain = large.join(small, on=["k"], how="left").groupBy("k").count()
    salted = salted_join(large, small, on=["k"], how="left",
                         salt_buckets=8, hot_keys=hot).groupBy("k").count()
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_count_equals_group_count(spark):
    df = _skewed(spark)
    plain = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r.k: r.n for r in salted_count(df, ["k"], salt_buckets=8).collect()}
    assert plain == salted


def test_aqe_splits_skewed_join_partition(spark):
    """The runtime half of the skew story: AQE detects the hot
    partition at the shuffle boundary and splits it across tasks
    (SortMergeJoin(skew=true)) with no code change — salting is only
    needed where AQE can't see (aggregation keys, broadcast-ineligible
    plans). Thresholds are lowered so the tiny test corpus trips the
    same detection a hot key trips at production scale."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(200_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
        cold = spark.range(2_000).select((F.col("id") % 50 + 2).alias("k"), F.col("id").alias("v"))
        left = hot.unionByName(cold)
        right = spark.range(60).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
        joined = left.join(right, on=["k"])
        # execute THIS dataframe (not a derived .count() plan) so its
        # adaptive plan finalizes and records the runtime decision
        assert len(joined.collect()) == 200_000 + 2_000  # every key matches once
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan  # the hot partition was split at runtime
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
