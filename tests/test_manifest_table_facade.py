"""Round-12 ManifestTable facade: one DeltaTable-shaped handle over
the manifest format's verbs, with the recorded schema and codec
resolved from the log (no repeated ``schema=`` plumbing)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.sources import manifest_sink as MS
from open_crime_etl_pipeline_spark.sources.manifest_table import (
    ManifestTable,
)


@pytest.fixture(scope="module")
def registered(spark):
    MS.register(spark)
    return spark


def _land(spark, path, codec="jsonl", n=40):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
    )
    (
        df.repartition(2).write.format(MS.FORMAT_NAME)
        .option("path", path).option("shard_format", codec)
        .mode("append").save()
    )


@pytest.mark.parametrize("codec", ["jsonl", "parquet"])
def test_facade_full_lifecycle(registered, tmp_path, codec):
    spark, p = registered, str(tmp_path / f"fa_{codec}")
    _land(spark, p, codec)
    t = ManifestTable(spark, p)
    assert t.exists() and t.version() == 1 and t.codec() == codec
    # recorded schema, no schema= anywhere
    assert [f.name for f in t.schema().fields] == ["k", "s"]
    assert t.to_df().count() == 40
    # DML through the facade
    assert t.update("k < 5", {"s": "concat(s, '-u')"}) == 5
    assert t.delete("k >= 35") == 5
    src = spark.createDataFrame([(3, "m"), (100, "new")], "k long, s string")
    assert t.merge(src, ["k"]) == (1, 1)
    final = {r["k"]: r["s"] for r in t.to_df().collect()}
    assert final[3] == "m" and final[100] == "new" and final[4] == "v4-u"
    assert len(final) == 36
    # metadata / history / stats / CDF
    assert t.version() == 4
    assert [h["version"] for h in t.history()] == [1, 2, 3, 4]
    assert t.stats()["n_rows"] == 36
    ch = t.changes(1, with_change_type=True)
    from collections import Counter

    assert Counter(r["_change_type"] for r in ch.collect()) == {
        "update_preimage": 6, "update_postimage": 6,
        "delete": 5, "insert": 1,
    }
    # maintenance
    assert t.optimize_small(min_rows=10_000) > 0
    assert t.to_df().count() == 36
    man = t.optimize(target_shards=1)
    assert man["n_rows"] == 36
    t.expire_history(keep_last=1)
    t.vacuum()
    assert t.to_df().count() == 36
    # codec survived every rewrite
    assert t.codec() == codec


def test_facade_time_travel_and_pruned_read(registered, tmp_path):
    spark, p = registered, str(tmp_path / "fa_tt")
    _land(spark, p)
    t = ManifestTable(spark, p)
    t.delete("k < 10")
    assert t.to_df(version=1).count() == 40
    assert t.to_df().count() == 30
    got = t.to_df(prune={"k": (35, 39)}).filter("k >= 35").count()
    assert got == 5
    # explicit schema override is honored
    t2 = ManifestTable(spark, p, schema="k long")
    assert t2.to_df().columns == ["k"]
