"""Round-11 manifest-format guarantees: truncated string stats
(prefix-bound admission stays conservative and exact-byte-small action
files on text tables), UPDATE WHERE SET (the third DML verb), the
protocol min_reader guard, metadata-only table_stats, filtered stream
tails, the legacy-snapshot replay dedup, independent bloom-geometry
maxes on rewrite, and the merge target-duplicate guard."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

from tests.test_manifest_sink import _df, _write


@pytest.fixture(scope="module")
def registered(spark):
    MS.register(spark)
    return spark


# -- _truncate_string_bounds unit contract --------------------------------

def test_truncate_string_bounds_unit():
    # short values pass through untouched
    assert MS._truncate_string_bounds("abc", "xyz", 32) == (
        "abc", "xyz", False,
    )
    lo, hi, t = MS._truncate_string_bounds("a" * 40, "b" * 40, 8)
    assert t and lo == "a" * 8
    # prefix-successor: strictly above EVERY string with that prefix
    assert hi == "b" * 7 + "c" and hi > "b" * 40
    assert lo <= "a" * 40
    # only one side long
    lo, hi, t = MS._truncate_string_bounds("a", "z" * 40, 4)
    assert (lo, t) == ("a", True) and hi == "zzz{" and hi > "z" * 40
    # no successor exists: unbounded above
    top = chr(0x10FFFF) * 6
    lo, hi, t = MS._truncate_string_bounds("m", top, 4)
    assert t and hi is None
    # an increment landing in the surrogate gap skips to U+E000
    m = "k" + chr(0xD7FF)
    lo, hi, t = MS._truncate_string_bounds("a", m + "tail", 2)
    assert t and hi == "k" + chr(0xE000) and hi > m + "tail"
    # the bound encodes cleanly (it must survive json round-trips)
    assert json.loads(json.dumps(hi)) == hi


def test_truncated_stats_admission_is_conservative(registered, tmp_path):
    """Planted strings either side of the truncation point: range and
    point admission must KEEP every true holder under truncated
    bounds (they may over-admit, never under-admit)."""
    spark, p = registered, str(tmp_path / "tr1")
    vals = [
        "a" * 40,            # truncates the lower bound
        "m" + "q" * 40,      # interior long value
        "z" * 40,            # truncates the upper bound
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, s string")
    (
        df.coalesce(1).write.format(MS.FORMAT_NAME)
        .option("path", p)
        .option("stats_trunc_len", "8")
        .option("bloom_columns", "s")
        .mode("append").save()
    )
    man = MS.read_manifest_dict(p)
    (shard,) = man["shards"]
    assert shard["stats_trunc"] == ["s"]
    smin, smax = shard["stats"]["s"]
    assert len(smin) <= 8 and len(smax) <= 8
    assert smin <= min(vals) and smax > max(vals)
    # every stored value must be admitted by its own shard's stats
    for v in vals:
        assert MS._shard_admits_eq(shard, "s", v)
        assert MS._shard_admits_range(shard, "s", v, v)
    # ...and values outside the REAL range but inside the widened
    # truncated range stay admitted (over-read, harmless) while values
    # beyond the prefix bounds are skipped
    assert not MS._shard_admits_range(shard, "s", "A", "Z")  # below lo
    assert not MS._shard_admits_eq(shard, "s", "zzzzzzzzz")  # bloom says no
    # a None upper bound admits everything above
    shard2 = {
        "n_rows": 1,
        "stats": {"s": ["a", None]},
        "stats_trunc": ["s"],
    }
    assert MS._shard_admits_range(shard2, "s", "zzz", None)
    assert MS._shard_admits_eq(shard2, "s", chr(0x10FFFF) * 5)


def test_truncation_keeps_action_files_small(registered, tmp_path):
    """The round-10 verdict's headline case: a documents-style table
    whose text column holds whole bodies. With the default truncation
    the action file stays O(delta) in BYTES; disabling it embeds the
    bodies."""
    spark = registered
    body = "lorem ipsum " * 2000  # ~24 KB per value
    df = spark.createDataFrame(
        [(i, f"{body}{i:06d}") for i in range(4)], "doc_id long, text string"
    )
    p_on = str(tmp_path / "small")
    p_off = str(tmp_path / "big")
    df.coalesce(1).write.format(MS.FORMAT_NAME).option("path", p_on) \
        .mode("append").save()
    df.coalesce(1).write.format(MS.FORMAT_NAME).option("path", p_off) \
        .option("stats_trunc_len", "0").mode("append").save()
    act_on = os.path.getsize(
        os.path.join(p_on, MS.HISTORY_DIR, MS._history_name(1))
    )
    act_off = os.path.getsize(
        os.path.join(p_off, MS.HISTORY_DIR, MS._history_name(1))
    )
    assert act_on < 2_000, f"truncated action file is {act_on}B"
    assert act_off > 40_000  # untruncated embeds both bodies
    # same rows read back either way
    a = MS.read_manifest(spark, p_on, "doc_id long, text string")
    b = MS.read_manifest(spark, p_off, "doc_id long, text string")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# -- protocol guard --------------------------------------------------------

def test_protocol_min_reader_guard(registered, tmp_path):
    spark, p = registered, str(tmp_path / "proto1")
    _write(_df(spark, 5).coalesce(1), p, mode="append")
    act = os.path.join(p, MS.HISTORY_DIR, MS._history_name(1))
    doc = json.load(open(act))
    # writers stamp the floor the ACTION needs: 2 for JSON-only
    # commits (protocol 3 is reserved for parquet-shard actions)
    assert doc["min_reader"] == MS._BASE_MIN_READER
    doc["min_reader"] = MS._READER_VERSION + 97
    json.dump(doc, open(act, "w"))
    with pytest.raises(MS.ManifestProtocolError, match="protocol"):
        MS.read_manifest_dict(p)
    with pytest.raises(MS.ManifestProtocolError):
        MS.read_manifest_dict(p, version=1)
    # pre-round-11 documents (no field) keep reading: default 0
    doc.pop("min_reader")
    json.dump(doc, open(act, "w"))
    assert MS.read_manifest_dict(p)["n_rows"] == 5


# -- legacy full-snapshot replay dedup (round-10 ADVICE) -------------------

def test_legacy_snapshot_tail_not_redelivered_across_batches(
    registered, tmp_path
):
    """Two legacy full-snapshot log entries both listing the same shard
    WITHOUT added_seq: a tail replaying them across separate batches
    must deliver the shard once (default 1 = the documented
    pre-added_seq rule), not once per window."""
    spark, p = registered, str(tmp_path / "leg1")
    _write(_df(spark, 3).coalesce(1), p, mode="append")
    man = MS.read_manifest_dict(p)
    strip = [
        {k: v for k, v in s.items() if k != "added_seq"}
        for s in man["shards"]
    ]
    hdir = os.path.join(p, MS.HISTORY_DIR)
    for v in (1, 2):
        json.dump(
            {"version": 1, "commit_seq": v, "commit_kind": "append",
             "shards": strip, "n_rows": man["n_rows"]},
            open(os.path.join(hdir, MS._history_name(v)), "w"),
        )
    json.dump({"version": 2, "commit_seq": 2, "checkpoint_seq": 0},
              open(os.path.join(p, MS.MANIFEST), "w"))
    r = MS.ManifestShardStreamReader(None, {"path": p})
    batch1 = [x.shard for x in r.partitions({"seq": 0}, {"seq": 1})
              if x.shard]
    batch2 = [x.shard for x in r.partitions({"seq": 1}, {"seq": 2})
              if x.shard]
    assert len(batch1) == 1          # delivered in the seq-1 window...
    assert batch2 == []              # ...and never again


# -- UPDATE WHERE SET ------------------------------------------------------

def test_update_where_basic_and_cdf(registered, tmp_path):
    spark, p = registered, str(tmp_path / "up1")
    schema = "id long, s string"
    (
        _df(spark, 400).repartitionByRange(4, "id")
        .write.format(MS.FORMAT_NAME).option("path", p)
        .mode("append").save()
    )
    before = {s["file"] for s in MS.read_manifest_dict(p)["shards"]}
    man2, n_up = MS.update_where(
        spark, p, schema,
        F.col("id").between(100, 199),
        {"s": F.concat(F.lit("UPD"), F.col("id").cast("string"))},
        prune={"id": (100, 199)},
    )
    assert n_up == 100
    assert man2["n_rows"] == 400                    # row conservation
    assert man2["commit_kind"] == "update"
    untouched = before & {s["file"] for s in man2["shards"]}
    assert len(untouched) >= len(before) // 2       # scoped rewrite
    back = MS.read_manifest(spark, p, schema)
    got = {r["id"]: r["s"] for r in back.collect()}
    assert len(got) == 400
    for i in range(400):
        assert got[i] == (f"UPD{i}" if 100 <= i <= 199 else f"a{i}")
    # CDF: the update delta is exactly the post-image of updated rows
    delta = sorted(
        tuple(r) for r in MS.table_changes(
            spark, p, schema, man2["commit_seq"] - 1, man2["commit_seq"]
        ).collect()
    )
    assert delta == [(i, f"UPD{i}") for i in range(100, 200)]


def test_update_where_set_sees_pre_update_row(registered, tmp_path):
    """Assignments evaluate against the PRE-update row: swapping two
    columns through each other must not chain."""
    spark, p = registered, str(tmp_path / "up2")
    schema = "a long, b long"
    df = spark.createDataFrame([(1, 10), (2, 20)], schema)
    df.coalesce(1).write.format(MS.FORMAT_NAME).option("path", p) \
        .mode("append").save()
    MS.update_where(
        spark, p, schema, F.lit(True), {"a": F.col("b"), "b": F.col("a")}
    )
    got = sorted(
        tuple(r) for r in MS.read_manifest(spark, p, schema).collect()
    )
    assert got == [(10, 1), (20, 2)]


def test_update_where_null_predicate_rows_survive(registered, tmp_path):
    spark, p = registered, str(tmp_path / "up3")
    schema = "id long, v long"
    df = spark.createDataFrame([(1, None), (2, 5), (3, 50)], schema)
    df.coalesce(1).write.format(MS.FORMAT_NAME).option("path", p) \
        .mode("append").save()
    _man, n_up = MS.update_where(
        spark, p, schema, F.col("v") > 10, {"v": F.lit(0)}
    )
    assert n_up == 1  # NULL > 10 is NULL, not TRUE: row 1 survives
    got = sorted(
        tuple(r) for r in MS.read_manifest(spark, p, schema).collect()
    )
    assert got == [(1, None), (2, 5), (3, 0)]


def test_update_where_noop_guards_and_conflict(registered, tmp_path):
    spark, p = registered, str(tmp_path / "up4")
    schema = "id long, s string"
    # two shards: the racing compact below collapses them into ONE, so
    # the update's snapshot-read shard set is genuinely no longer live
    # (a single-shard table compacted to 1 is content-addressed to the
    # SAME file and would not conflict)
    _write(_df(spark, 20).repartitionByRange(2, "id"), p, mode="append")
    man0 = MS.read_manifest_dict(p)
    # zero matches: publish nothing
    man1, n = MS.update_where(
        spark, p, schema, F.col("id") > 10_000, {"s": F.lit("x")}
    )
    assert n == 0 and man1["commit_seq"] == man0["commit_seq"]
    # bad SET target
    with pytest.raises(ValueError, match="not in schema"):
        MS.update_where(spark, p, schema, F.lit(True), {"nope": F.lit(1)})
    with pytest.raises(ValueError, match="non-empty"):
        MS.update_where(spark, p, schema, F.lit(True), {})
    # write-conflict: a compact between snapshot read and publish
    orig = MS._commit_replace

    def racing(path, **kw):
        MS.compact(spark, path, schema=schema, target_shards=1)
        return orig(path, **kw)

    MS._commit_replace = racing
    try:
        with pytest.raises(ValueError, match="no longer live"):
            MS.update_where(
                spark, p, schema, F.col("id") < 5, {"s": F.lit("x")}
            )
    finally:
        MS._commit_replace = orig


# -- merge target-duplicate guard (round-10 ADVICE) ------------------------

def test_merge_into_refuses_duplicate_key_target(registered, tmp_path):
    spark, p = registered, str(tmp_path / "mdup")
    schema = "id long, s string"
    dup = spark.createDataFrame([(7, "x"), (7, "y"), (8, "z")], schema)
    dup.coalesce(1).write.format(MS.FORMAT_NAME).option("path", p) \
        .mode("append").save()
    src = spark.createDataFrame([(7, "UP")], schema)
    with pytest.raises(ValueError, match="duplicate keys among matched"):
        MS.merge_into(spark, p, schema, src, ["id"])
    # the table is untouched and nothing was published
    assert MS.read_manifest_dict(p)["commit_seq"] == 1
    # a merge NOT touching the duplicated key still works
    man2, n_up, n_ins = MS.merge_into(
        spark, p, schema,
        spark.createDataFrame([(8, "UP8"), (9, "NEW")], schema), ["id"],
    )
    assert (n_up, n_ins) == (1, 1)


# -- metadata-only table stats ---------------------------------------------

def test_table_stats_metadata_only(registered, tmp_path):
    spark, p = registered, str(tmp_path / "ts1")
    body = "x" * 200
    df = spark.createDataFrame(
        [(i, None if i % 5 == 0 else i * 2, body + str(i))
         for i in range(50)],
        "id long, v long, text string",
    )
    df.repartition(4).write.format(MS.FORMAT_NAME).option("path", p) \
        .mode("append").save()
    st = MS.table_stats(p)
    assert st["n_rows"] == 50
    assert st["columns"]["id"] == {"min": 0, "max": 49, "null_count": 0}
    assert st["columns"]["v"]["min"] == 2
    assert st["columns"]["v"]["max"] == 98
    assert st["columns"]["v"]["null_count"] == 10
    # truncated string column: null_count still exact, min/max omitted
    assert "min" not in st["columns"]["text"]
    assert st["columns"]["text"]["null_count"] == 0
    # as-of stats
    MS.delete_where(spark, p, "id long, v long, text string",
                    F.col("id") < 10)
    st2 = MS.table_stats(p)
    assert st2["n_rows"] == 40
    assert MS.table_stats(p, version=1)["n_rows"] == 50


# -- filtered stream tail ---------------------------------------------------

def test_stream_tail_prune_options(registered, tmp_path):
    """A filtered tail over a range-clustered table plans FEWER shard
    partitions per batch; delivered rows (plus the row-level filter)
    are identical to an unfiltered tail."""
    spark, p = registered, str(tmp_path / "sp1")
    (
        _df(spark, 800).repartitionByRange(8, "id")
        .write.format(MS.FORMAT_NAME).option("path", p)
        .mode("append").save()
    )
    man = MS.read_manifest_dict(p)
    full = MS.ManifestShardStreamReader(None, {"path": p})
    pruned = MS.ManifestShardStreamReader(
        None, {"path": p, "prune": json.dumps({"id": [100, 199]})}
    )
    hi = {"seq": man["commit_seq"]}
    n_full = len([x for x in full.partitions({"seq": 0}, hi) if x.shard])
    kept = [x for x in pruned.partitions({"seq": 0}, hi) if x.shard]
    assert n_full == 8
    assert 1 <= len(kept) <= 2  # only the admitting tiles
    # identical results: decode the kept shards, row-filter, compare
    schema = "id long, s string"
    got = sorted(
        tuple(r)
        for r in spark.read.schema(schema).json(
            [os.path.join(p, "shards", x.shard) for x in kept]
        ).filter(F.col("id").between(100, 199)).collect()
    )
    assert got == [(i, f"a{i}") for i in range(100, 200)]
    # prune_eq rides the blooms the same way
    eq = MS.ManifestShardStreamReader(
        None, {"path": p, "prune_eq": json.dumps({"id": 150})}
    )
    kept_eq = [x for x in eq.partitions({"seq": 0}, hi) if x.shard]
    assert len(kept_eq) <= 2


# -- bloom geometry carried independently (round-10 ADVICE) ----------------

def test_bloom_rewrite_geometry_independent_max(registered, tmp_path):
    spark, p = registered, str(tmp_path / "bg1")
    (
        _df(spark, 100).coalesce(1)
        .write.format(MS.FORMAT_NAME).option("path", p)
        .option("bloom_columns", "id")
        .option("bloom_bits", "32768").option("bloom_hashes", "3")
        .mode("append").save()
    )
    (
        spark.createDataFrame([(1000 + i, f"b{i}") for i in range(50)],
                              "id long, s string")
        .coalesce(1)
        .write.format(MS.FORMAT_NAME).option("path", p)
        .option("bloom_columns", "s")
        .option("bloom_bits", "16384").option("bloom_hashes", "11")
        .mode("append").save()
    )
    man2 = MS.compact(spark, p, schema="id long, s string",
                      target_shards=1)
    (shard,) = man2["shards"]
    geo = {c: (b["m"], b["k"]) for c, b in shard["blooms"].items()}
    # PER-COLUMN carry: each column keeps ITS recorded geometry — no
    # global pair that would weaken one of them (round-10 ADVICE,
    # "better" branch)
    assert geo == {"id": (32768, 3), "s": (16384, 11)}
    # and a point probe through the carried filters still admits/skips
    assert MS._shard_admits_eq(shard, "id", 50)
    assert not MS._shard_admits_eq(shard, "id", 777_777)


# -- Arrow write path (round-10 verdict item 2) -----------------------------

def _land(spark, df, path, arrow, **opts):
    w = (
        df.write.format(MS.FORMAT_NAME)
        .option("path", path)
        .option("arrow_write", "true" if arrow else "false")
    )
    for k, v in opts.items():
        w = w.option(k, v)
    w.mode("append").save()
    return MS.read_manifest_dict(path)


def test_arrow_write_byte_identical_to_row_path(registered, tmp_path):
    """THE content-address contract across write engines: the Arrow
    path must produce byte-identical shard FILES (same names, same
    bytes) and identical manifest entries (stats, truncation markers,
    blooms, null counts) as the row path, over every admitted type —
    including tz-aware timestamps (converted with the exact row-path
    call), decimals, binary, arrays, structs, nulls, and long strings
    (truncation applies identically)."""
    import datetime
    import decimal
    import hashlib

    spark = registered
    df = spark.createDataFrame(
        [(i,
          float(i) * 1.5 if i % 7 else None,
          ("s" + "x" * i) if i % 5 else None,
          datetime.date(2024, 1, 1 + i % 28),
          datetime.datetime(2024, 1, 2, 3, 4, 5, 123456 + i),
          datetime.datetime(2024, 1, 2, 3, 4, i % 60),
          decimal.Decimal(f"{i}.25"),
          bytes([i % 256, 1]),
          [i, None, i + 1],
          (i, f"n{i}"),
          i % 3 == 0)
         for i in range(300)],
        "i long, d double, s string, dt date, ts timestamp, "
        "tsn timestamp_ntz, dec decimal(10,2), bin binary, "
        "arr array<int>, st struct<a:long,b:string>, bl boolean",
    )
    pa_dir, pr_dir = str(tmp_path / "aw"), str(tmp_path / "rw")
    man_a = _land(spark, df.repartition(3, "i"), pa_dir, True,
                  bloom_columns="i,s")
    man_r = _land(spark, df.repartition(3, "i"), pr_dir, False,
                  bloom_columns="i,s")
    ea = {s["file"]: s for s in man_a["shards"]}
    er = {s["file"]: s for s in man_r["shards"]}
    assert sorted(ea) == sorted(er)  # same content addresses
    for f in ea:
        da = hashlib.md5(
            open(os.path.join(pa_dir, "shards", f), "rb").read()
        ).hexdigest()
        dr = hashlib.md5(
            open(os.path.join(pr_dir, "shards", f), "rb").read()
        ).hexdigest()
        assert da == dr  # same bytes on disk
        assert ea[f] == er[f]  # same stats/trunc/blooms/nulls/added_seq
    # and the engine actually USED the arrow writer for this schema
    ds = MS.ManifestShardDataSource(options={"path": pa_dir})
    assert isinstance(
        ds.writer(df.schema, False), MS.ManifestArrowShardWriter
    )


def test_arrow_write_fallback_selection(registered, tmp_path):
    """Schemas outside the byte-identity allowlist take the row path:
    maps anywhere, NESTED tz-aware timestamps; arrow_write=false forces
    it."""
    from pyspark.sql.types import (
        ArrayType, LongType, MapType, StringType, StructField, StructType,
        TimestampType,
    )

    ds = MS.ManifestShardDataSource(options={"path": str(tmp_path)})
    ok = StructType([StructField("i", LongType())])
    assert isinstance(ds.writer(ok, False), MS.ManifestArrowShardWriter)
    m = StructType([StructField("m", MapType(StringType(), LongType()))])
    w = ds.writer(m, False)
    assert type(w) is MS.ManifestShardWriter
    nested_ts = StructType(
        [StructField("a", ArrayType(TimestampType()))]
    )
    assert type(ds.writer(nested_ts, False)) is MS.ManifestShardWriter
    top_ts = StructType([StructField("ts", TimestampType())])
    assert isinstance(
        ds.writer(top_ts, False), MS.ManifestArrowShardWriter
    )
    forced = MS.ManifestShardDataSource(
        options={"path": str(tmp_path), "arrow_write": "false"}
    )
    assert type(forced.writer(ok, False)) is MS.ManifestShardWriter
    # streaming twin dispatches the same way
    assert isinstance(
        ds.streamWriter(ok, False), MS.ManifestShardStreamArrowWriter
    )
    assert type(forced.streamWriter(ok, False)) is MS.ManifestShardStreamWriter


def test_struct_columns_roundtrip_as_json_objects(registered, tmp_path):
    """Nested struct values must serialize as JSON OBJECTS on BOTH
    write paths (a Row is a tuple subclass — unnormalized it became a
    JSON array, which every read path decoded as NULL; round-11 fix)."""
    import gzip as _gzip
    import glob
    import json as _json

    spark = registered
    schema = "i long, st struct<a:long,b:string>, arr array<struct<c:long>>"
    df = spark.createDataFrame([(1, (7, "x"), [(9,)])], schema)
    for arrow, sub in ((True, "a"), (False, "r")):
        p = str(tmp_path / sub)
        _land(spark, df.coalesce(1), p, arrow)
        (f,) = glob.glob(p + "/shards/*.gz")
        line = _json.loads(_gzip.open(f, "rt").read())
        assert line["st"] == {"a": 7, "b": "x"}  # object, not array
        assert line["arr"] == [{"c": 9}]
        back = MS.read_manifest(spark, p, schema).collect()
        assert [tuple(r) for r in back][0][1] == (7, "x")
        # the custom DataSource reader decodes it too
        got = (
            spark.read.format(MS.FORMAT_NAME).schema(schema)
            .option("path", p).load().collect()
        )
        assert got[0]["st"]["a"] == 7 and got[0]["arr"][0]["c"] == 9


def test_streaming_sink_uses_arrow_writer(registered, tmp_path):
    """The writeStream epoch path through the Arrow stream writer:
    same manifest semantics, same replay no-op."""
    spark, p = registered, str(tmp_path / "saw")
    w = MS.ManifestShardStreamArrowWriter(
        {"path": p}, _df(spark, 1).schema
    )
    import pyarrow as pa

    batch = pa.record_batch(
        {"id": pa.array([1, 2], pa.int64()),
         "s": pa.array(["x", "y"], pa.string())}
    )
    m0 = w.write(iter([batch]))
    w.commit([m0], batchId=0)
    man = MS.read_manifest_dict(p)
    assert man["n_rows"] == 2 and man["commit_kind"] == "epoch"
    # deterministic replay: manifest no-op
    m0r = w.write(iter([batch]))
    w.commit([m0r], batchId=0)
    assert MS.read_manifest_dict(p)["commit_seq"] == man["commit_seq"]
    rows = sorted(
        tuple(r)
        for r in MS.read_manifest(spark, p, "id long, s string").collect()
    )
    assert rows == [(1, "x"), (2, "y")]


def test_arrow_write_nan_floats_keep_shard_admitted(registered, tmp_path):
    """A float column containing NaN records NO min/max on the Arrow
    path (NaN ordering is engine-specific) — the shard must stay
    admitted on every probe of that column."""
    spark, p = registered, str(tmp_path / "nan1")
    df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, 9.0)], "i long, d double"
    )
    _land(spark, df.coalesce(1), p, True)
    (shard,) = MS.read_manifest_dict(p)["shards"]
    assert "d" not in (shard.get("stats") or {})  # poisoned: no bounds
    assert shard["stats"]["i"] == [1, 3]          # others unaffected
    assert MS._shard_admits_range(shard, "d", 100.0, 200.0)  # conservative


# -- recorded table schema (round 11, Delta metaData shape) -----------------

def test_recorded_schema_typed_reads_without_explicit(registered, tmp_path):
    """The log records the writer's schema: load() without .schema()
    and read_manifest(schema=None) both return EXACT types (no
    inference scan, dates stay dates)."""
    import datetime

    spark, p = registered, str(tmp_path / "rs1")
    df = spark.createDataFrame(
        [(1, "a", datetime.date(2024, 1, 2), 1.5)],
        "id long, s string, dt date, d double",
    )
    df.coalesce(1).write.format(MS.FORMAT_NAME).option("path", p) \
        .mode("append").save()
    sch = MS.table_schema(p)
    assert [f.name for f in sch.fields] == ["id", "s", "dt", "d"]
    assert sch["dt"].dataType.typeName() == "date"
    got = (
        spark.read.format(MS.FORMAT_NAME).option("path", p).load()
    )
    assert got.schema == sch
    assert got.collect()[0]["dt"] == datetime.date(2024, 1, 2)
    back = MS.read_manifest(spark, p)  # schema=None -> recorded
    assert back.schema["dt"].dataType.typeName() == "date"
    # DML verbs default to the recorded schema too
    man2, n = MS.update_where(
        spark, p, None, F.col("id") == 1, {"s": F.lit("upd")}
    )
    assert n == 1
    assert MS.read_manifest(spark, p).collect()[0]["s"] == "upd"


def test_schema_evolution_restamps_latest_wins(registered, tmp_path):
    """An append under a WIDER schema restamps the recorded schema
    (latest wins); earlier versions keep the schema they were written
    under — time travel reads each version typed as it was."""
    spark, p = registered, str(tmp_path / "rs2")
    _write(_df(spark, 3).coalesce(1), p, mode="append")            # v1
    wide = spark.createDataFrame(
        [(100, "w", 7.5)], "id long, s string, score double"
    )
    wide.coalesce(1).write.format(MS.FORMAT_NAME).option("path", p) \
        .mode("append").save()                                      # v2
    assert [f.name for f in MS.table_schema(p).fields] == [
        "id", "s", "score",
    ]
    assert [f.name for f in MS.table_schema(p, version=1).fields] == [
        "id", "s",
    ]
    got = MS.read_manifest(spark, p)  # latest schema governs
    rows = {r["id"]: r for r in got.collect()}
    assert rows[100]["score"] == 7.5
    assert rows[0]["score"] is None  # old shards: missing -> null
    # time travel AS OF v1 uses v1's recorded schema
    v1 = MS.read_manifest(spark, p, version=1)
    assert [f.name for f in v1.schema.fields] == ["id", "s"]
    # the version option on the DataSource resolves the same way
    ds = (
        spark.read.format(MS.FORMAT_NAME)
        .option("path", p).option("version", "1").load()
    )
    assert [f.name for f in ds.schema.fields] == ["id", "s"]


def test_schema_stamp_is_o_delta(registered, tmp_path):
    """Unchanged schemas cost the action log nothing: only the FIRST
    commit (and evolutions/overwrites) carry the schema field."""
    spark, p = registered, str(tmp_path / "rs3")
    _write(_df(spark, 2, tag="a").coalesce(1), p, mode="append")   # v1
    _write(_df(spark, 2, tag="b").coalesce(1), p, mode="append")   # v2
    hdir = os.path.join(p, MS.HISTORY_DIR)
    a1 = json.load(open(os.path.join(hdir, MS._history_name(1))))
    a2 = json.load(open(os.path.join(hdir, MS._history_name(2))))
    assert "schema" in a1 and "schema" not in a2
    # ...but the v2 STATE still carries it forward
    assert MS.table_schema(p, version=2) is not None


def test_streaming_epochs_record_schema(registered, tmp_path):
    spark, p = registered, str(tmp_path / "rs4")
    w = MS.ManifestShardStreamWriter({"path": p}, _df(spark, 1).schema)
    m = w.write(iter([(1, "x")]))
    w.commit([m], batchId=0)
    assert [f.name for f in MS.table_schema(p).fields] == ["id", "s"]
    # table_changes without a schema rides the recorded one
    got = MS.table_changes(spark, p, None, 0).collect()
    assert [tuple(r) for r in got] == [(1, "x")]


def test_legacy_table_without_schema_still_refuses(registered, tmp_path):
    spark, p = registered, str(tmp_path / "rs5")
    _write(_df(spark, 2).coalesce(1), p, mode="append")
    act = os.path.join(p, MS.HISTORY_DIR, MS._history_name(1))
    doc = json.load(open(act))
    doc.pop("schema")
    json.dump(doc, open(act, "w"))
    assert MS.table_schema(p) is None
    with pytest.raises(Exception, match="schema"):
        spark.read.format(MS.FORMAT_NAME).option("path", p).load().collect()
    with pytest.raises(ValueError, match="schema"):
        MS.table_changes(spark, p, None, 0)


# -- small-file OPTIMIZE (round 11) -----------------------------------------

def test_compact_small_bin_packs_only_the_tail(registered, tmp_path):
    """12 tiny epoch-ish shards + 1 well-sized shard: compact_small
    rewrites ONLY the tail (cost scales with the small files, not the
    table), conserves rows, rides data_change=false (a tailing reader
    sees nothing), and leaves the big shard byte-untouched."""
    spark, p = registered, str(tmp_path / "cs1")
    big = _df(spark, 500)
    _write(big.coalesce(1), p, mode="append")
    for i in range(12):
        (
            spark.createDataFrame(
                [(10_000 + i * 10 + j, f"t{i}_{j}") for j in range(5)],
                "id long, s string",
            )
            .coalesce(1)
            .write.format(MS.FORMAT_NAME).option("path", p)
            .mode("append").save()
        )
    man = MS.read_manifest_dict(p)
    assert len(man["shards"]) == 13
    big_file = next(s["file"] for s in man["shards"] if s["n_rows"] == 500)
    man2, n_comp = MS.compact_small(
        spark, p, min_rows=100, target_shards=2
    )
    assert n_comp == 12
    assert man2["n_rows"] == 560                       # row conservation
    assert len(man2["shards"]) == 3                    # big + 2 bins
    files2 = {s["file"] for s in man2["shards"]}
    assert big_file in files2                          # untouched
    # the rewrite is invisible to CDF: empty delta across the commit
    delta = MS.table_changes(
        spark, p, None, man2["commit_seq"] - 1, man2["commit_seq"]
    )
    assert delta.count() == 0
    # all rows intact (recorded schema drives the read)
    assert MS.read_manifest(spark, p).count() == 560


def test_compact_small_noop_and_conflict(registered, tmp_path):
    spark, p = registered, str(tmp_path / "cs2")
    _write(_df(spark, 50).coalesce(1), p, mode="append")
    man0 = MS.read_manifest_dict(p)
    # one qualifying shard: nothing to gain, publish nothing
    man1, n = MS.compact_small(spark, p, min_rows=1000)
    assert n == 0 and man1["commit_seq"] == man0["commit_seq"]
    # no qualifying shards at min_rows=1
    man2, n = MS.compact_small(spark, p, min_rows=1)
    assert n == 0


def test_vacuum_min_age_protects_young_files(registered, tmp_path):
    """An in-flight DML's freshly staged (unpublished) shard looks like
    garbage; the retention window keeps it."""
    spark, p = registered, str(tmp_path / "va1")
    _write(_df(spark, 10).coalesce(1), p, mode="append")
    _write(_df(spark, 10, tag="b").coalesce(1), p, mode="overwrite")
    MS.expire_history(p, keep_last=1)
    # the overwritten v1 shard is unreferenced BUT younger than the
    # retention window: protected
    assert MS.vacuum_unreferenced(p, min_age_seconds=3600) == []
    # age the files artificially and vacuum again: collected
    import time
    old = time.time() - 7200
    for f in os.listdir(os.path.join(p, "shards")):
        os.utime(os.path.join(p, "shards", f), (old, old))
    deleted = MS.vacuum_unreferenced(p, min_age_seconds=3600)
    assert len(deleted) == 1
    # the live table is intact
    assert MS.read_manifest(spark, p).count() == 10


# -- idempotent writer transactions (Delta txn action, round 11) ------------

def test_txn_idempotent_batch_writes(registered, tmp_path):
    """An external batch job replaying with the SAME (app, version)
    publishes nothing — even when the replay's CONTENT differs (the
    case content-addressing cannot catch); a higher version lands;
    apps are independent."""
    spark, p = registered, str(tmp_path / "txn1")

    def land(df, app, ver):
        (
            df.coalesce(1).write.format(MS.FORMAT_NAME)
            .option("path", p)
            .option("txn_app", app).option("txn_version", str(ver))
            .mode("append").save()
        )

    land(_df(spark, 3, tag="a"), "loader", 1)
    man1 = MS.read_manifest_dict(p)
    assert man1["n_rows"] == 3 and man1["txns"] == {"loader": 1}
    # replay v1 with DIFFERENT content (e.g. a recomputed batch with a
    # new timestamp column value): must be a complete no-op
    land(_df(spark, 5, tag="DIFFERENT"), "loader", 1)
    man2 = MS.read_manifest_dict(p)
    assert man2["commit_seq"] == man1["commit_seq"]
    assert man2["n_rows"] == 3
    # an OLDER version replay is a no-op too
    land(_df(spark, 9, tag="older"), "loader", 0)
    assert MS.read_manifest_dict(p)["n_rows"] == 3
    # the next version lands, and another app is independent
    land(_df(spark, 2, tag="b"), "loader", 2)
    land(_df(spark, 1, tag="c"), "other", 1)
    man3 = MS.read_manifest_dict(p)
    assert man3["txns"] == {"loader": 2, "other": 1}
    assert man3["n_rows"] == 3 + 2 + 1
    # half-specified options refuse loudly
    with pytest.raises(Exception, match="txn_app and txn_version"):
        (
            _df(spark, 1).write.format(MS.FORMAT_NAME)
            .option("path", p).option("txn_app", "x")
            .mode("append").save()
        )


def test_txn_survives_checkpoint_and_conflict_rebase(registered, tmp_path):
    """The txn ledger rides the state through checkpoints, and a
    rebase after losing the claim race re-checks it (build_action is
    re-invoked against the winner's state)."""
    spark, p = registered, str(tmp_path / "txn2")
    (
        _df(spark, 2).coalesce(1).write.format(MS.FORMAT_NAME)
        .option("path", p).option("checkpoint_every", "2")
        .option("txn_app", "a").option("txn_version", "7")
        .mode("append").save()
    )
    _write(_df(spark, 2, tag="x").coalesce(1), p, mode="append")  # ckpt at 2
    # reconstruct v2 from its checkpoint: the ledger must be there
    assert MS.read_manifest_dict(p, version=2)["txns"] == {"a": 7}
    # a replay AFTER the checkpoint (resolves via checkpoint) no-ops
    (
        _df(spark, 4, tag="y").coalesce(1).write.format(MS.FORMAT_NAME)
        .option("path", p)
        .option("txn_app", "a").option("txn_version", "7")
        .mode("append").save()
    )
    assert MS.read_manifest_dict(p)["n_rows"] == 4


# -- timestamp time travel (round 11) ---------------------------------------

def test_timestamp_time_travel(registered, tmp_path):
    import time as _time

    spark, p = registered, str(tmp_path / "tsv1")
    _write(_df(spark, 2, tag="a").coalesce(1), p, mode="append")   # v1
    _time.sleep(0.2)
    _write(_df(spark, 3, tag="b").coalesce(1), p, mode="append")   # v2
    _time.sleep(0.2)
    _write(_df(spark, 4, tag="c").coalesce(1), p, mode="overwrite")  # v3
    hist = MS.describe_history(p)
    assert [h["version"] for h in hist] == [1, 2, 3]
    ts = [h["ts"] for h in hist]
    assert ts == sorted(ts) and all(isinstance(t, float) for t in ts)
    # between v1 and v2 -> v1; exactly v2 -> v2; after v3 -> v3
    assert MS.version_at_timestamp(p, (ts[0] + ts[1]) / 2) == 1
    assert MS.version_at_timestamp(p, ts[1]) == 2
    assert MS.version_at_timestamp(p, ts[2] + 100) == 3
    assert MS.version_at_timestamp(p, ts[0] - 100) is None
    got = MS.read_manifest(spark, p, timestamp=(ts[0] + ts[1]) / 2)
    assert sorted(tuple(r) for r in got.collect()) == [
        (0, "a0"), (1, "a1"),
    ]
    with pytest.raises(FileNotFoundError, match="timestamp"):
        MS.read_manifest(spark, p, timestamp=ts[0] - 100)
    with pytest.raises(ValueError, match="exclusive"):
        MS.read_manifest(spark, p, version=1, timestamp=ts[1])


# -- CDF _commit_version column (round 11) ----------------------------------

def test_table_changes_with_commit_version(registered, tmp_path):
    spark, p = registered, str(tmp_path / "cv1")
    schema = "id long, s string"
    _write(_df(spark, 2, tag="a").coalesce(1), p, mode="append")   # v1
    _write(
        spark.createDataFrame([(100, "b")], schema).coalesce(1),
        p, mode="append",
    )                                                               # v2
    MS.compact(spark, p, schema=schema, target_shards=1)            # v3
    src = spark.createDataFrame([(100, "UP"), (7, "NEW")], schema)
    man4, *_ = MS.merge_into(spark, p, schema, src, ["id"])         # v4
    got = sorted(
        tuple(r)
        for r in MS.table_changes(
            spark, p, None, 0, with_version=True
        ).collect()
    )
    assert got == [
        (0, "a0", 1), (1, "a1", 1), (7, "NEW", 4), (100, "UP", 4),
        (100, "b", 2),
    ]
    # compaction contributed no versions; the column is typed long
    df = MS.table_changes(spark, p, None, 2, 3, with_version=True)
    assert df.schema["_commit_version"].dataType.typeName() == "long"
    assert df.count() == 0
    # the version-free path is unchanged
    plain = sorted(
        tuple(r) for r in MS.table_changes(spark, p, None, 0).collect()
    )
    assert plain == [(t[0], t[1]) for t in got]
