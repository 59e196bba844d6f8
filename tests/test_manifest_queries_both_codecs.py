"""Round-12 codec parametrization of the EXISTING manifest registry
queries: each query is re-run with the format's DEFAULT codec flipped
to parquet (a registered DataSource subclass — the queries themselves
are unchanged and codec-blind), and its result must equal the jsonl
run's. This is the 'existing manifest_* oracle queries green under
BOTH codecs' acceptance from the round-11 verdict, pinned without
doubling the registry."""

from __future__ import annotations

import pytest

from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

SF_DIR = "/root/testdata/sf0.001"

#: registry queries that exercise the manifest format end-to-end
#: (write → DML → read); each lands its own temp table, so flipping
#: the default codec flips the whole pipeline under it
QUERIES = [
    "manifest_sink_roundtrip",
    "manifest_stats_pruned_scan",
    "manifest_bloom_point_lookup",
    "manifest_delete_where",
    "manifest_update_where",
    "manifest_merge_into",
    "manifest_optimize_small_files",
    "manifest_recorded_schema_read",
    "manifest_cdf_change_types",
]


@pytest.fixture(scope="module")
def registry():
    from open_crime_etl_pipeline_spark.queries import all_specs

    return all_specs()


def test_parquet_default_registration_flips_codec(spark, tmp_path):
    """The knob is real: with the parquet-default class registered, an
    optionless write lands parquet shards (so the parametrized runs
    below cannot pass vacuously)."""
    p = str(tmp_path / "flip")
    spark.dataSource.register(MS.ManifestShardParquetDefaultDataSource)
    try:
        spark.range(5).write.format(MS.FORMAT_NAME).option(
            "path", p
        ).mode("append").save()
        man = MS.read_manifest_dict(p)
        assert man["codec"] == "parquet"
        assert all(s["file"].endswith(".parquet") for s in man["shards"])
    finally:
        MS.register(spark)


@pytest.mark.parametrize("name", QUERIES)
def test_query_green_under_both_codecs(spark, registry, name, monkeypatch):
    fn = registry[name].fn
    MS.register(spark)
    base = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    # flip the default codec: MS.register (which every query calls
    # itself) now registers the parquet-default subclass under the
    # SAME format name
    monkeypatch.setattr(
        MS,
        "ManifestShardDataSource",
        MS.ManifestShardParquetDefaultDataSource,
    )
    MS.register(spark)
    try:
        pq = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    finally:
        monkeypatch.undo()
        MS.register(spark)
    assert sorted(map(repr, pq)) == sorted(map(repr, base))
