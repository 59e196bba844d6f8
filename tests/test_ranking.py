"""Two-pass global row numbering: equivalence with the single-window
form, contiguity, and the no-single-partition plan shape."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.operators.ranking import global_row_number


def _scored(spark, n=10_000):
    # heavy duplication in the order key → boundary ties are exercised;
    # id is the unique tie-break making the order total
    return spark.range(n).select(
        F.col("id"), (F.col("id") % 97).alias("score")
    )


def test_global_row_number_matches_single_window(spark):
    df = _scored(spark)
    order = [F.col("score").desc(), F.col("id").asc()]
    fast = {
        r.id: r.rn for r in global_row_number(df, order, n_partitions=8).collect()
    }
    slow = {
        r.id: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert fast == slow


def test_global_row_number_contiguous(spark):
    out = global_row_number(_scored(spark, 5000), ["score", "id"], n_partitions=7)
    rns = [r.rn for r in out.select("rn").collect()]
    assert sorted(rns) == list(range(1, 5001))


def test_global_row_number_avoids_single_partition_window(spark):
    df = global_row_number(_scored(spark), ["score", "id"], n_partitions=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the window runs per range-partition; nothing funnels through one task
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan
