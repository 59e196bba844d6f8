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
