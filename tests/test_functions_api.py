"""The public functions façade: every exported name resolves and the
column builders compose into ordinary DataFrame expressions."""

from __future__ import annotations

from pyspark.sql import Column

from open_crime_etl_pipeline_spark import functions as CF


def test_every_export_resolves():
    for name in CF.__all__:
        assert getattr(CF, name) is not None


def test_column_builders_compose(spark):
    df = spark.createDataFrame(
        [("the quick brown fox email a@b.co",), ("short",)], "text string"
    )
    out = df.select(
        CF.tokens("text").alias("toks"),
        CF.stopword_ratio("text").alias("sr"),
        CF.quality_score("text").alias("q"),
        CF.pii_redact("text").alias("red"),
    ).collect()
    assert isinstance(CF.tokens("text"), Column)
    assert out[0].toks[0] == "the" and 0 <= out[0].q <= 1
    assert "<EMAIL>" in out[0].red
    w = CF.month_windows(__import__("datetime").datetime(2025, 1, 1),
                         __import__("datetime").datetime(2025, 3, 1))
    assert len(w) == 2


def test_event_transition_matrix_hand_computed(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.queries.registry import get_spec  # noqa: F401

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 100, "a"),
        (2, datetime(2024, 1, 1, 0, 1, 0), 100, "b"),
        (3, datetime(2024, 1, 1, 0, 2, 0), 100, "a"),
        (4, datetime(2024, 1, 1, 0, 0, 30), 200, "a"),
        (5, datetime(2024, 1, 1, 0, 1, 30), 200, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    from pyspark.sql import Window

    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev", F.lag("event_type").over(seq))
        .filter(F.col("prev").isNotNull())
        .groupBy("prev", "event_type")
        .count()
        .collect()
    )
    got = {(r["prev"], r["event_type"]): r["count"] for r in pairs}
    # user 100: a->b, b->a ; user 200: a->b
    assert got == {("a", "b"): 2, ("b", "a"): 1}
