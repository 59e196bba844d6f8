"""Content-addressed shard sink (sources/manifest_sink.py): the custom
Python DataSource WRITER — atomic manifest commit, snapshot reads,
content-addressed idempotence, abort safety, vacuum."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.sources import manifest_sink as MS


@pytest.fixture(scope="module")
def registered(spark):
    MS.register(spark)
    return spark


def _df(spark, n=100, tag="a"):
    return spark.range(n).select(
        F.col("id"), F.concat(F.lit(tag), F.col("id").cast("string")).alias("s")
    )


def _write(df, path, mode="overwrite"):
    df.write.format(MS.FORMAT_NAME).option("path", path).mode(mode).save()


def test_write_commit_readback(registered, tmp_path):
    spark, p = registered, str(tmp_path / "t1")
    _write(_df(spark, 100).repartition(4), p)
    man = MS.read_manifest_dict(p)
    assert man is not None and man["n_rows"] == 100
    back = MS.read_manifest(spark, p, schema="id long, s string")
    rows = sorted((r["id"], r["s"]) for r in back.collect())
    assert rows == [(i, f"a{i}") for i in range(100)]


def test_content_addressing_is_deterministic(registered, tmp_path):
    spark, p = registered, str(tmp_path / "t2")
    df = _df(spark, 60).repartition(3, "id")  # deterministic hash partitioning
    _write(df.sortWithinPartitions("id"), p)
    first = {s["file"] for s in MS.read_manifest_dict(p)["shards"]}
    _write(df.sortWithinPartitions("id"), p)  # same data, same partitioning
    second = {s["file"] for s in MS.read_manifest_dict(p)["shards"]}
    assert first == second  # same content -> same shard names
    # and the overwrite produced no garbage to vacuum
    assert MS.vacuum_unreferenced(p) == []


def test_append_of_identical_content_is_idempotent_replay(registered, tmp_path):
    spark, p = registered, str(tmp_path / "t3")
    df = _df(spark, 40).repartition(2, "id").sortWithinPartitions("id")
    _write(df, p, mode="append")
    n1 = MS.read_manifest_dict(p)["n_rows"]
    _write(df, p, mode="append")  # replayed batch: ST7 by construction
    assert MS.read_manifest_dict(p)["n_rows"] == n1 == 40
    # genuinely new content appends
    _write(_df(spark, 10, tag="b").coalesce(1), p, mode="append")
    assert MS.read_manifest_dict(p)["n_rows"] == 50


def test_overwrite_snapshot_isolation_and_vacuum(registered, tmp_path):
    spark, p = registered, str(tmp_path / "t4")
    _write(_df(spark, 30, tag="old").coalesce(1), p)
    old_shards = {s["file"] for s in MS.read_manifest_dict(p)["shards"]}
    _write(_df(spark, 20, tag="new").coalesce(1), p)  # overwrite
    back = MS.read_manifest(spark, p, schema="id long, s string")
    assert back.count() == 20
    assert all(r["s"].startswith("new") for r in back.collect())
    # stale shard file still on disk but invisible to readers
    on_disk = set(os.listdir(os.path.join(p, "shards")))
    assert old_shards <= on_disk
    # retained history (time travel to v1) keeps the old shards alive;
    # expiring the log releases them for collection
    assert MS.vacuum_unreferenced(p) == []
    assert MS.expire_history(p, keep_last=1) == [MS._history_name(1)]
    deleted = MS.vacuum_unreferenced(p)
    assert set(deleted) == old_shards
    assert MS.read_manifest(spark, p, schema="id long, s string").count() == 20


def test_abort_preserves_previous_version(registered, tmp_path):
    spark, p = registered, str(tmp_path / "t5")
    _write(_df(spark, 10).coalesce(1), p)
    man_before = MS.read_manifest_dict(p)
    # drive write()+abort() directly (the engine calls abort on task
    # failure); the manifest must stay at the committed version and the
    # aborted shard must be cleaned up
    w = MS.ManifestShardWriter({"path": p}, _df(spark, 1).schema, overwrite=True)
    msg = w.write(iter([(99, "zz")]))
    assert msg.n_rows == 1
    assert os.path.exists(os.path.join(p, "shards", msg.shard))
    w.abort([msg])
    assert not os.path.exists(os.path.join(p, "shards", msg.shard))
    assert MS.read_manifest_dict(p) == man_before
    # abort never deletes a shard the LIVE manifest references
    live = man_before["shards"][0]
    w.abort([MS.ShardCommit(shard=live["file"], n_rows=live["n_rows"],
                            digest=live["digest"])])
    assert os.path.exists(os.path.join(p, "shards", live["file"]))


def test_gzip_shards_are_byte_identical_across_retries(registered, tmp_path):
    spark, p = registered, str(tmp_path / "t6")
    w = MS.ManifestShardWriter({"path": p}, _df(spark, 1).schema, overwrite=True)
    m1 = w.write(iter([(1, "x"), (2, "y")]))
    with open(os.path.join(p, "shards", m1.shard), "rb") as fh:
        b1 = fh.read()
    m2 = w.write(iter([(1, "x"), (2, "y")]))  # the retry
    with open(os.path.join(p, "shards", m2.shard), "rb") as fh:
        b2 = fh.read()
    assert m1.shard == m2.shard and b1 == b2  # mtime=0 gzip: bit-stable


def test_write_spills_large_partitions_instead_of_buffering(
    registered, tmp_path, monkeypatch
):
    """A partition larger than spill_threshold_bytes must stream
    through a ROLLED-OVER temp file (peak task memory = the threshold,
    never O(partition bytes)) and still produce the exact same
    content-addressed shard name and gzip bytes as the in-memory path
    (round-8 verdict item 4)."""
    import gzip as _gzip
    import hashlib as _hashlib
    import json as _json
    import tempfile as _tempfile

    spark, p = registered, str(tmp_path / "t_spill")
    spools = []
    real = _tempfile.SpooledTemporaryFile

    def tracking_spool(*a, **kw):
        s = real(*a, **kw)
        spools.append(s)
        return s

    monkeypatch.setattr(_tempfile, "SpooledTemporaryFile", tracking_spool)
    rows = [(i, "v" * 200 + str(i)) for i in range(500)]
    w = MS.ManifestShardWriter(
        {"path": p, "spill_threshold_bytes": "256"},
        _df(spark, 1).schema,
        overwrite=True,
    )
    msg = w.write(iter(rows))
    assert len(spools) == 1 and spools[0]._rolled  # it actually spilled
    # same bytes/name the buffered implementation would have produced
    content = b"".join(
        (_json.dumps(dict(zip(("id", "s"), r)), sort_keys=True,
                     default=str, ensure_ascii=False) + "\n").encode()
        for r in rows
    )
    assert msg.digest == _hashlib.md5(content).hexdigest()
    assert msg.shard == f"shard-{msg.digest}.jsonl.gz"
    with open(os.path.join(p, "shards", msg.shard), "rb") as fh:
        b1 = fh.read()
    assert _gzip.decompress(b1) == content
    # replay through the SPILL path is still byte-identical (the
    # idempotence contract; the gzip OS header byte differs from the
    # one-shot gzip.compress API, which is irrelevant — names hash the
    # UNCOMPRESSED bytes and replays share this code path)
    msg2 = w.write(iter(rows))
    with open(os.path.join(p, "shards", msg2.shard), "rb") as fh:
        assert fh.read() == b1 and msg2.shard == msg.shard
    # a small partition stays in memory (no rollover)
    spools.clear()
    small = w.write(iter([(1, "x")]))
    assert len(spools) == 1 and not spools[0]._rolled
    assert small.n_rows == 1


def test_missing_path_option_raises(registered):
    with pytest.raises(Exception, match="path"):
        _df(registered, 1).write.format(MS.FORMAT_NAME).mode(
            "overwrite"
        ).save()


def test_read_manifest_missing_raises(registered, tmp_path):
    with pytest.raises(FileNotFoundError):
        MS.read_manifest(registered, str(tmp_path / "nope"))


def test_streaming_sink_epochs_and_replay(registered, tmp_path):
    """writeStream.format('shard_manifest'): one epoch per micro-batch;
    a full replay with a fresh checkpoint converges to the SAME
    manifest state (content-addressed shards + epoch replacement)."""
    import time as _t

    spark, p = registered, str(tmp_path / "s1")
    src = str(tmp_path / "src")
    os.makedirs(src)
    for f in range(3):
        df = spark.createDataFrame(
            [(f * 100 + i, f"b{f}_{i}") for i in range(20)], "id long, s string"
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/f{f}")
        t = _t.time() + f * 10
        for root, _d, files in os.walk(f"{src}/f{f}"):
            for fn in files:
                os.utime(os.path.join(root, fn), (t, t))

    def run(ckpt):
        q = (
            spark.readStream.schema("id long, s string")
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(f"{src}/f*")
            .writeStream.format(MS.FORMAT_NAME)
            .option("path", p)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run(str(tmp_path / "ck1"))
    man1 = MS.read_manifest_dict(p)
    assert man1["n_rows"] == 60
    assert len(man1["epochs"]) == 3  # one epoch per file-batch
    back = MS.read_manifest(spark, p, schema="id long, s string")
    assert back.count() == 60

    # resume with the SAME checkpoint: nothing new -> manifest unchanged
    run(str(tmp_path / "ck1"))
    assert MS.read_manifest_dict(p) == man1

    # full REPLAY with a fresh checkpoint: same content re-lands as the
    # same shard names; epochs re-recorded; row count stable
    run(str(tmp_path / "ck2"))
    man2 = MS.read_manifest_dict(p)
    assert man2["n_rows"] == 60
    assert {s["file"] for s in man2["shards"]} == {
        s["file"] for s in man1["shards"]
    }


def test_streaming_epoch_replacement_on_batch_replay(registered, tmp_path):
    """A replayed batchId REPLACES its epoch (at-least-once delivery
    cannot double-count), even if the replay produced different
    partitioning; superseded shards become vacuumable garbage."""
    spark, p = registered, str(tmp_path / "s2")
    w = MS.ManifestShardStreamWriter({"path": p}, _df(spark, 1).schema)
    m_a = w.write(iter([(1, "x"), (2, "y")]))
    w.commit([m_a], batchId=0)
    assert MS.read_manifest_dict(p)["n_rows"] == 2
    # replay of batch 0 with different content (non-deterministic batch)
    m_b = w.write(iter([(1, "x"), (2, "y"), (3, "z")]))
    w.commit([m_b], batchId=0)
    man = MS.read_manifest_dict(p)
    assert man["n_rows"] == 3  # replaced, not 5
    assert [s["file"] for s in man["shards"]] == [m_b.shard]
    MS.expire_history(p, keep_last=1)  # release v1 (references m_a)
    assert MS.vacuum_unreferenced(p) == [m_a.shard]


def test_streaming_commit_preserves_batch_written_shards(registered, tmp_path):
    spark, p = registered, str(tmp_path / "s3")
    _write(_df(spark, 10, tag="batch").coalesce(1), p)  # batch write first
    w = MS.ManifestShardStreamWriter({"path": p}, _df(spark, 1).schema)
    m = w.write(iter([(500, "stream0")]))
    w.commit([m], batchId=0)
    man = MS.read_manifest_dict(p)
    assert man["n_rows"] == 11  # batch shards survive streaming commits


def _drain_stream(spark, p, ckpt, schema="id long, s string"):
    """One availableNow run of the manifest STREAM READER into a fresh
    memory sink; returns the rows this run delivered (resuming `ckpt`
    means: only shards added since the last drained commit_seq)."""
    got: list[tuple] = []
    q = (
        spark.readStream.format(MS.FORMAT_NAME)
        .schema(schema)
        .option("path", p)
        .load()
        .writeStream.foreachBatch(
            lambda df, _bid: got.extend(tuple(r) for r in df.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    return sorted(got)


def test_stream_reader_roundtrip_and_exactly_once_tail(registered, tmp_path):
    """The lakehouse loop (round-8 verdict item 5): write-stream ->
    manifest -> read-stream. A replayed epoch re-landing identical
    content keeps its original added_seq, so a tailing reader sees it
    EXACTLY ONCE; later commits are delivered incrementally."""
    spark, p = registered, str(tmp_path / "tail1")
    ckpt = str(tmp_path / "tail1_ck")
    w = MS.ManifestShardStreamWriter({"path": p}, _df(spark, 1).schema)

    # epoch 0 committed, then drained
    m0 = w.write(iter([(1, "x"), (2, "y")]))
    w.commit([m0], batchId=0)
    assert _drain_stream(spark, p, ckpt) == [(1, "x"), (2, "y")]

    # REPLAYED epoch 0, identical content: a full manifest no-op (the
    # epoch ledger already records exactly these shards), so the
    # resumed tail sees NOTHING
    m0r = w.write(iter([(1, "x"), (2, "y")]))
    w.commit([m0r], batchId=0)
    assert MS.read_manifest_dict(p)["commit_seq"] == 1
    assert _drain_stream(spark, p, ckpt) == []

    # a genuinely new epoch is delivered incrementally (only its rows)
    m1 = w.write(iter([(3, "z")]))
    w.commit([m1], batchId=1)
    assert _drain_stream(spark, p, ckpt) == [(3, "z")]

    # a BATCH append lands in the same tail (batch/stream writers share
    # the manifest sequence)
    _write(_df(spark, 2, tag="b").coalesce(1), p, mode="append")
    assert _drain_stream(spark, p, ckpt) == [(0, "b0"), (1, "b1")]

    # idempotent batch replay: content-addressed no-op, tail stays dry
    _write(_df(spark, 2, tag="b").coalesce(1), p, mode="append")
    assert _drain_stream(spark, p, ckpt) == []

    # a FRESH checkpoint replays the table from seq 0: full snapshot
    full = _drain_stream(spark, p, str(tmp_path / "tail1_ck2"))
    assert full == [(0, "b0"), (1, "b1"), (1, "x"), (2, "y"), (3, "z")]


def test_stream_reader_typed_roundtrip(registered, tmp_path):
    """Temporal/decimal/binary/array columns survive the JSON-lines
    shard encoding through the STREAM reader (the sink serializes
    non-JSON scalars canonically; the reader's converters invert it)."""
    import datetime as dt
    from decimal import Decimal

    spark, p = registered, str(tmp_path / "typed")
    schema = (
        "id long, ts timestamp, d date, amt decimal(10,2), "
        "blob binary, xs array<int>"
    )
    rows = [
        (
            1,
            dt.datetime(2026, 8, 16, 12, 30, 45, 123456),
            dt.date(2026, 2, 28),
            Decimal("12345.67"),
            bytes([0, 255, 10, 32]),
            [1, 2, 3],
        ),
        (2, None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, schema)
    _write(df.coalesce(1), p)
    got = _drain_stream(spark, p, str(tmp_path / "typed_ck"), schema=schema)
    assert got == sorted(tuple(r) for r in rows)
    # and the BATCH manifest reader agrees on the same shard bytes
    back = MS.read_manifest(spark, p, schema=schema)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in rows
    )


def test_stream_reader_requires_path_and_explicit_schema(registered, tmp_path):
    with pytest.raises(Exception, match="path"):
        MS.ManifestShardStreamReader(_df(registered, 1).schema, {})
    with pytest.raises(Exception, match="schema"):
        registered.readStream.format(MS.FORMAT_NAME).option(
            "path", str(tmp_path / "nope")
        ).load()


def test_stream_reader_empty_table_delivers_nothing(registered, tmp_path):
    spark = registered
    p = str(tmp_path / "empty_tbl")
    os.makedirs(p)
    assert _drain_stream(spark, p, str(tmp_path / "empty_ck")) == []


def test_batch_append_preserves_streaming_epochs(registered, tmp_path):
    """A batch append between streaming commits must not erase epoch
    attribution — otherwise a later replayed batchId with CHANGED
    content would append instead of replacing its epoch."""
    spark, p = registered, str(tmp_path / "s4")
    w = MS.ManifestShardStreamWriter({"path": p}, _df(spark, 1).schema)
    m0 = w.write(iter([(1, "x")]))
    w.commit([m0], batchId=0)
    _write(_df(spark, 5, tag="mid").coalesce(1), p, mode="append")
    man = MS.read_manifest_dict(p)
    assert man["n_rows"] == 6 and "epochs" in man  # attribution survives
    # replay batch 0 with different content: epoch replaced, not added
    m0b = w.write(iter([(1, "x"), (2, "y")]))
    w.commit([m0b], batchId=0)
    man2 = MS.read_manifest_dict(p)
    assert man2["n_rows"] == 7  # 5 batch + 2 replaced-epoch (not 8)
    assert m0.shard not in {s["file"] for s in man2["shards"]}
