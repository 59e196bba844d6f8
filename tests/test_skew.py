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
