"""Round-12 parquet shard codec (``shard_format=parquet``): the
manifest format's columnar payload option. Pins the content-address
determinism contract, stats/bloom/null parity with the JSON codec
(pruning and DML scoping must be codec-blind), codec inheritance
through the recorded log, the protocol-3 min_reader guard, the full
DML triad + OPTIMIZE on parquet tables, the DataSource batch/pushdown/
stream surfaces, mixed-codec tables, and schema-evolution reads."""

from __future__ import annotations

import glob
import json
import os

import pytest

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

from tests.test_manifest_sink import _df


@pytest.fixture(scope="module")
def registered(spark):
    MS.register(spark)
    return spark


def _write_pq(df, path, mode="append", **opts):
    w = (
        df.write.format(MS.FORMAT_NAME)
        .option("path", path)
        .option("shard_format", "parquet")
    )
    for k, v in opts.items():
        w = w.option(k, v)
    w.mode(mode).save()


def _typed_df(spark, n=200):
    """Every stats-bearing type plus nulls: the parity fixture."""
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 != 0, F.concat(F.lit("v"), F.col("id")))
        .alias("s"),
        F.to_timestamp(
            F.concat(
                F.lit("2024-03-0"),
                (F.col("id") % 5 + 1).cast("string"),
                F.lit(" 10:00:00"),
            )
        ).alias("ts"),
        F.to_date(F.lit("2024-06-15")).alias("d"),
        (F.col("id") * 1.5).alias("f"),
    )


# -- content addressing / determinism --------------------------------------

def test_parquet_content_addressing_deterministic(registered, tmp_path):
    """Same rows, same partitioning, written twice: byte-identical
    parquet files under the same digest name — the append is a
    manifest no-op (the idempotent-replay contract, codec-agnostic)."""
    spark, p = registered, str(tmp_path / "det")
    df = _typed_df(spark).repartition(3, "k").sortWithinPartitions("k")
    _write_pq(df, p)
    first = {s["file"] for s in MS.read_manifest_dict(p)["shards"]}
    assert all(f.endswith(".parquet") for f in first)
    _write_pq(df, p)
    man = MS.read_manifest_dict(p)
    assert {s["file"] for s in man["shards"]} == first
    assert man["n_rows"] == 200


def test_parquet_roundtrip_matches_json_codec(registered, tmp_path):
    """The SAME rows through both codecs read back identically —
    values, types, and nulls (timestamps included: naive-local ISO in
    JSON vs UTC micros in parquet must decode to the same instants)."""
    spark = registered
    pj, pp = str(tmp_path / "cj"), str(tmp_path / "cp")
    df = _typed_df(spark).repartition(2, "k")
    df.write.format(MS.FORMAT_NAME).option("path", pj).mode("append").save()
    _write_pq(df, pp)
    a = MS.read_manifest(spark, pj).orderBy("k").collect()
    b = MS.read_manifest(spark, pp).orderBy("k").collect()
    assert a == b
    assert MS.table_schema(pj) == MS.table_schema(pp)


def test_parquet_stats_bloom_null_parity(registered, tmp_path):
    """Per-shard stats, bloom bits, and null counts are IDENTICAL
    across codecs for the same rows — shard pruning, table_stats, and
    DML scoping are codec-blind by construction."""
    spark = registered
    pj, pp = str(tmp_path / "sj"), str(tmp_path / "sp")
    df = _typed_df(spark).coalesce(1)
    for path, fmt in ((pj, "jsonl"), (pp, "parquet")):
        (
            df.write.format(MS.FORMAT_NAME)
            .option("path", path)
            .option("shard_format", fmt)
            .option("bloom_columns", "k,s")
            .mode("append")
            .save()
        )
    sj = MS.read_manifest_dict(pj)["shards"][0]
    sp = MS.read_manifest_dict(pp)["shards"][0]
    assert sj["stats"] == sp["stats"]
    assert sj["blooms"] == sp["blooms"]
    assert sj["nulls"] == sp["nulls"]
    assert sj["n_rows"] == sp["n_rows"] == 200


def test_parquet_nan_float_poisons_stats_conservatively(
    registered, tmp_path
):
    spark, p = registered, str(tmp_path / "nan")
    df = spark.range(5).select(
        F.col("id").alias("k"),
        F.when(F.col("id") == 3, float("nan"))
        .otherwise(F.col("id") * 1.0)
        .alias("f"),
    )
    _write_pq(df.coalesce(1), p)
    s = MS.read_manifest_dict(p)["shards"][0]
    assert "f" not in (s.get("stats") or {})  # NaN: no bounds recorded
    assert "k" in s["stats"]
    # conservative: the shard is admitted on f regardless
    assert MS._shard_admits_range(s, "f", 0.0, 1.0)


# -- codec recording / inheritance / protocol ------------------------------

def test_codec_recorded_and_inherited(registered, tmp_path):
    """The log records codec=parquet; a later append WITHOUT the
    option inherits it, and DML rewrites stay parquet."""
    spark, p = registered, str(tmp_path / "inh")
    _write_pq(_df(spark, 50).coalesce(1), p)
    assert MS.read_manifest_dict(p)["codec"] == "parquet"
    # plain append, no shard_format option
    (
        _df(spark, 50, tag="b").coalesce(1)
        .write.format(MS.FORMAT_NAME)
        .option("path", p)
        .mode("append")
        .save()
    )
    man = MS.read_manifest_dict(p)
    assert all(s["file"].endswith(".parquet") for s in man["shards"])
    man2, n = MS.delete_where(spark, p, "id long, s string", "id < 10")
    assert n == 20  # both appends hold id 0..9
    assert all(s["file"].endswith(".parquet") for s in man2["shards"])


def test_parquet_actions_stamp_protocol_3(registered, tmp_path):
    """Actions adding parquet shards carry min_reader=3; JSON-only
    actions stay at 2; checkpoints/hints carry the STATE's floor (an
    overwrite back to JSON drops it to 2)."""
    spark, p = registered, str(tmp_path / "proto")
    _write_pq(_df(spark, 10).coalesce(1), p)
    act = json.load(
        open(os.path.join(p, MS.HISTORY_DIR, MS._history_name(1)))
    )
    assert act["min_reader"] == MS._PARQUET_MIN_READER == 3
    hint = json.load(open(os.path.join(p, MS.MANIFEST)))
    assert hint["min_reader"] == 3
    # overwrite back to JSON: the new state is protocol-2 again
    (
        _df(spark, 10).coalesce(1)
        .write.format(MS.FORMAT_NAME)
        .option("path", p)
        .option("shard_format", "jsonl")
        .mode("overwrite")
        .save()
    )
    hint = json.load(open(os.path.join(p, MS.MANIFEST)))
    assert hint["min_reader"] == MS._BASE_MIN_READER == 2
    assert MS.read_manifest_dict(p)["codec"] == "jsonl"


def test_bad_shard_format_rejected(registered, tmp_path):
    spark, p = registered, str(tmp_path / "bad")
    with pytest.raises(Exception, match="shard_format"):
        (
            _df(spark, 5)
            .write.format(MS.FORMAT_NAME)
            .option("path", p)
            .option("shard_format", "orc")
            .mode("append")
            .save()
        )


# -- DML triad + OPTIMIZE on parquet ---------------------------------------

def test_parquet_dml_triad_and_optimize(registered, tmp_path):
    spark, p = registered, str(tmp_path / "dml")
    sch = "k long, s string, ts timestamp, d date, f double"
    _write_pq(_typed_df(spark).repartition(4, "k"), p)
    # UPDATE
    man, n_upd = MS.update_where(
        spark, p, sch, "k % 10 = 3", {"f": "f + 100.0"}
    )
    assert n_upd == 20
    df = MS.read_manifest(spark, p)
    assert df.filter("k = 13").first()["f"] == pytest.approx(13 * 1.5 + 100)
    # DELETE
    man, n_del = MS.delete_where(spark, p, sch, "k >= 190")
    assert n_del == 10 and man["n_rows"] == 190
    # MERGE
    src = spark.createDataFrame(
        [(0, "NEW", None, None, 0.0), (500, "INS", None, None, 1.0)],
        sch,
    )
    man, n_u, n_i = MS.merge_into(spark, p, sch, src, ["k"])
    assert (n_u, n_i) == (1, 1) and man["n_rows"] == 191
    out = MS.read_manifest(spark, p)
    assert out.filter("k = 0").first()["s"] == "NEW"
    assert out.filter("k = 500").first()["s"] == "INS"
    assert all(s["file"].endswith(".parquet") for s in man["shards"])
    # OPTIMIZE small files: everything here is tiny
    man, n_comp = MS.compact_small(
        spark, p, sch, min_rows=10_000, target_shards=1
    )
    assert n_comp > 0 and man["n_rows"] == 191
    assert all(s["file"].endswith(".parquet") for s in man["shards"])
    assert MS.read_manifest(spark, p).count() == 191


def test_parquet_time_travel_and_cdf(registered, tmp_path):
    spark, p = registered, str(tmp_path / "tt")
    _write_pq(_df(spark, 30).coalesce(1), p)          # v1
    _write_pq(_df(spark, 30, tag="b").coalesce(1), p)  # v2
    assert MS.read_manifest(spark, p, version=1).count() == 30
    # TIMESTAMP AS OF the first commit
    h = MS.describe_history(p)
    assert h[1]["ts"] > h[0]["ts"]  # monotonic clamp holds here too
    assert (
        MS.read_manifest(spark, p, timestamp=h[0]["ts"]).count() == 30
    )
    ch = MS.table_changes(
        spark, p, "id long, s string", 1, with_version=True
    )
    rows = ch.collect()
    assert len(rows) == 30
    assert {r["_commit_version"] for r in rows} == {2}
    assert all(r["s"].startswith("b") for r in rows)


# -- DataSource surfaces ---------------------------------------------------

def test_parquet_datasource_read_and_pushdown(registered, tmp_path):
    spark, p = registered, str(tmp_path / "ds")
    big = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("g")
    )
    _write_pq(big.repartitionByRange(8, "k"), p)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        r = (
            spark.read.format(MS.FORMAT_NAME)
            .option("path", p)
            .option("pushdown", "true")
            .load()
            .filter(F.col("k") == 777)
        )
        assert [x["k"] for x in r.collect()] == [777]
        assert r.rdd.getNumPartitions() == 1  # 1 of 8 shards admitted
    finally:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")
    # plain DataSource read, recorded schema, no .schema() call
    full = (
        spark.read.format(MS.FORMAT_NAME).option("path", p).load()
    )
    assert full.count() == 4000
    assert [f.name for f in full.schema.fields] == ["k", "g"]


def test_parquet_stream_tail_and_stream_write(registered, tmp_path):
    """writeStream with parquet epochs; readStream tails them — the
    closed lakehouse loop on the columnar codec."""
    spark, p = registered, str(tmp_path / "st")
    ck1 = str(tmp_path / "ck_w")
    src = str(tmp_path / "src")
    # batch-land two versions, then tail
    _write_pq(_df(spark, 20).coalesce(1), p)
    _write_pq(_df(spark, 20, tag="b").coalesce(1), p)
    got = []
    q = (
        spark.readStream.format(MS.FORMAT_NAME)
        .option("path", p)
        .schema(MS.table_schema(p))
        .load()
        .writeStream.foreachBatch(lambda df, bid: got.append(df.count()))
        .option("checkpointLocation", str(tmp_path / "ck_r"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(got) == 40
    # streaming WRITE with parquet codec
    os.makedirs(src)
    _df(spark, 15).coalesce(1).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "sout")
    q2 = (
        spark.readStream.schema("id long, s string")
        .parquet(src)
        .writeStream.format(MS.FORMAT_NAME)
        .option("path", out)
        .option("shard_format", "parquet")
        .option("checkpointLocation", ck1)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    man = MS.read_manifest_dict(out)
    assert man["n_rows"] == 15
    assert all(s["file"].endswith(".parquet") for s in man["shards"])
    assert man["codec"] == "parquet"


# -- mixed codec / evolution ----------------------------------------------

def test_mixed_codec_table_reads_union(registered, tmp_path):
    """A JSON table that gains parquet shards (mid-migration) reads as
    one DataFrame; every snapshot/DML path handles the mix."""
    spark, p = registered, str(tmp_path / "mix")
    df = _df(spark, 40)
    df.filter("id < 20").coalesce(1).write.format(MS.FORMAT_NAME).option(
        "path", p
    ).mode("append").save()
    _write_pq(df.filter("id >= 20").coalesce(1), p)
    man = MS.read_manifest_dict(p)
    exts = {s["file"].rsplit(".", 1)[-1] for s in man["shards"]}
    assert exts == {"gz", "parquet"}
    back = MS.read_manifest(spark, p)
    assert back.count() == 40
    assert sorted(r["id"] for r in back.collect()) == list(range(40))
    # DML across the mix
    man2, n = MS.delete_where(spark, p, "id long, s string", "id % 2 = 1")
    assert n == 20 and man2["n_rows"] == 20


def test_parquet_schema_evolution_missing_column_reads_null(
    registered, tmp_path
):
    """A shard written before a column existed reads back with nulls
    for it (the JSON codec's missing-field behavior, kept on the
    DataSource decode path)."""
    spark, p = registered, str(tmp_path / "evo")
    _write_pq(_df(spark, 10).coalesce(1), p)
    evolved = "id long, s string, extra double"
    df = (
        spark.read.format(MS.FORMAT_NAME)
        .option("path", p)
        .schema(evolved)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 10 and all(r["extra"] is None for r in rows)


def test_parquet_compact_zorder(registered, tmp_path):
    """OPTIMIZE ZORDER on a parquet table: rewrite stays parquet and
    stats turn narrow on both listed columns."""
    spark, p = registered, str(tmp_path / "zo")
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    _write_pq(df.repartition(8), p)
    man = MS.compact(
        spark, p, "x long, y long", target_shards=4, zorder_by=["x", "y"]
    )
    assert all(s["file"].endswith(".parquet") for s in man["shards"])
    assert man["n_rows"] == 4096
    # every rewritten shard covers a tile: x-range strictly narrower
    # than the domain on at least... all shards
    for s in man["shards"]:
        lo, hi = s["stats"]["x"]
        assert hi - lo < 63
