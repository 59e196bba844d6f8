"""Structured Streaming surface tests (SURVEY §2.8): file-source
streams, event-time windows + watermark, streaming dedup, stateful
sessionization, foreachBatch MERGE sink with replay idempotence."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.streaming import (
    foreach_batch_upsert,
    session_event_counts,
    sessionize_stateful,
    stream_crime_pages,
    stream_events,
    streaming_dedup,
    windowed_event_counts,
)

BASE = dt.datetime(2025, 3, 1, 0, 0, 0)


def _write_events(spark, path: str, rows):
    df = spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _run_available_now(df, tmpdir: str, name: str):
    """Run a streaming DataFrame to completion into a memory sink."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return df.sparkSession.table(name)


def test_windowed_event_counts_stream(spark, tmp_path):
    src = str(tmp_path / "events")
    rows = [
        (BASE + dt.timedelta(minutes=m), 1, "click") for m in (5, 10, 70, 130)
    ] + [(BASE + dt.timedelta(minutes=15), 2, "view")] + [
        # sentinel far beyond the 2h watermark: append mode only emits
        # windows the watermark has finalized
        (BASE + dt.timedelta(hours=12), 9, "sentinel"),
    ]
    _write_events(spark, src, rows)
    out = _run_available_now(
        windowed_event_counts(stream_events(spark, src), window="1 hour"),
        str(tmp_path), "win_counts",
    ).collect()
    got = {(r.window_start, r.event_type): r.n_events for r in out}
    assert got[(BASE, "click")] == 2
    assert got[(BASE + dt.timedelta(hours=1), "click")] == 1
    assert got[(BASE, "view")] == 1


def test_streaming_dedup_drops_replayed_keys(spark, tmp_path):
    src = str(tmp_path / "events")
    rows = [
        (BASE, 1, "click"),
        (BASE + dt.timedelta(minutes=1), 1, "click"),
        (BASE + dt.timedelta(minutes=2), 2, "view"),
    ]
    # duplicate user_id+event_type arrives twice within the watermark
    _write_events(spark, src, rows)
    deduped = streaming_dedup(
        stream_events(spark, src), keys=["user_id", "event_type"]
    )
    out = _run_available_now(deduped, str(tmp_path), "dedup").collect()
    assert len(out) == 2
    assert {(r.user_id, r.event_type) for r in out} == {(1, "click"), (2, "view")}


def test_session_window_builtin(spark, tmp_path):
    src = str(tmp_path / "events")
    # user 1: two sessions separated by >30min; user 2: one session
    rows = [
        (BASE, 1, "a"),
        (BASE + dt.timedelta(minutes=10), 1, "a"),
        (BASE + dt.timedelta(minutes=90), 1, "a"),
        (BASE + dt.timedelta(minutes=5), 2, "a"),
        (BASE + dt.timedelta(hours=12), 9, "a"),  # watermark sentinel
    ]
    _write_events(spark, src, rows)
    out = _run_available_now(
        session_event_counts(stream_events(spark, src), gap="30 minutes"),
        str(tmp_path), "sessions",
    ).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_sessionize_stateful_emits_closed_sessions(spark, tmp_path):
    src = str(tmp_path / "events")
    rows = [
        (BASE, 1, "a"),
        (BASE + dt.timedelta(minutes=10), 1, "a"),
        (BASE + dt.timedelta(minutes=90), 1, "a"),  # closes session 1
        (BASE + dt.timedelta(hours=12), 9, "a"),    # advances watermark far
    ]
    _write_events(spark, src, rows)
    out = _run_available_now(
        sessionize_stateful(stream_events(spark, src), gap_seconds=1800),
        str(tmp_path), "stateful_sessions",
    ).collect()
    sessions = {(r.user_id, r.session_start, r.session_end): r.n_events for r in out}
    # the first session of user 1 must be emitted closed with 2 events
    key = (1, BASE, BASE + dt.timedelta(minutes=10))
    assert key in sessions and sessions[key] == 2


def test_transform_with_state_probe_is_measured():
    """The protobuf gate is a MEASURED probe, not an assumption: the
    probe's verdict must agree with an independent importlib check, and
    its reason string names what was (or wasn't) found. The twin's
    contract test keys on this probe, so if the container ever gains
    protobuf the equivalence branch activates — without any code
    change and without any environment ever skipping a test."""
    import importlib.util

    from open_crime_etl_pipeline_spark.streaming import (
        transform_with_state_available,
    )

    ok, why = transform_with_state_available()
    try:
        expected = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        expected = False
    assert ok == expected
    assert ("importable" in why) or ("absent" in why)


def test_sessionize_transform_with_state_contract(spark, tmp_path):
    """The transformWithStateInPandas twin's contract, asserted in BOTH
    environments (never skipped): the engine's documented stateful
    surface is the applyInPandasWithState sessionizer; the twin is an
    OPTIONAL alternate API path whose prerequisite (protobuf — its
    python worker speaks protobuf to the JVM state server) is probed at
    call time. Where the prerequisite is absent the twin must fail fast
    with a clear ImportError (never crash the streaming worker); where
    present it must match the old-API sessionizer's closed-session
    semantics — in-batch closes AND timer-driven flushes once the
    watermark passes last + gap."""
    from open_crime_etl_pipeline_spark.streaming import (
        sessionize_transform_with_state,
        transform_with_state_available,
    )

    ok, _why = transform_with_state_available()
    if not ok:
        src = str(tmp_path / "events")
        _write_events(spark, src, [(BASE, 1, "a")])
        with pytest.raises(ImportError, match="protobuf"):
            sessionize_transform_with_state(stream_events(spark, src))
        return

    src = str(tmp_path / "events")
    rows = [
        (BASE, 1, "a"),
        (BASE + dt.timedelta(minutes=10), 1, "a"),
        (BASE + dt.timedelta(minutes=90), 1, "a"),   # closes session 1
        (BASE + dt.timedelta(minutes=5), 2, "a"),    # single-event session
        (BASE + dt.timedelta(hours=12), 9, "a"),     # advances watermark far
    ]
    _write_events(spark, src, rows)
    out = _run_available_now(
        sessionize_transform_with_state(stream_events(spark, src), gap_seconds=1800),
        str(tmp_path), "tws_sessions",
    ).collect()
    got = {(r.user_id, r.session_start, r.session_end): r.n_events for r in out}
    assert got[(1, BASE, BASE + dt.timedelta(minutes=10))] == 2
    # timer-driven flush: user 2's lone session closes when the
    # watermark (driven by the hour-12 sentinel) passes its end + gap
    k2 = (2, BASE + dt.timedelta(minutes=5), BASE + dt.timedelta(minutes=5))
    assert got.get(k2) == 1
    old = _run_available_now(
        sessionize_stateful(stream_events(spark, src), gap_seconds=1800),
        str(tmp_path), "old_sessions",
    ).collect()
    old_got = {(r.user_id, r.session_start, r.session_end): r.n_events for r in old}
    shared = {k for k in got if k in old_got}
    assert all(got[k] == old_got[k] for k in shared) and len(shared) >= 2


def test_foreach_batch_upsert_idempotent_replay(spark, tmp_path):
    pages = str(tmp_path / "landing")
    target = str(tmp_path / "crime_table")
    os.makedirs(pages)

    def page(n, recs):
        with open(os.path.join(pages, f"part-{n:04d}.json"), "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")

    page(0, [
        {"id": "1", "case_number": "A", ":updated_at": "2025-01-01T00:00:00.000"},
        {"id": "2", "case_number": "B", ":updated_at": "2025-01-01T00:00:00.000"},
    ])
    q = foreach_batch_upsert(
        stream_crime_pages(spark, pages),
        target, keys=["id"], order_by=[":updated_at"],
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(120)

    # second page updates id=2 and adds id=3
    page(1, [
        {"id": "2", "case_number": "B2", ":updated_at": "2025-01-02T00:00:00.000"},
        {"id": "3", "case_number": "C", ":updated_at": "2025-01-02T00:00:00.000"},
        {"id": "3", "case_number": "C-old", ":updated_at": "2025-01-01T00:00:00.000"},
    ])
    q = foreach_batch_upsert(
        stream_crime_pages(spark, pages),
        target, keys=["id"], order_by=[":updated_at"],
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(120)

    rows = {r["id"]: r["case_number"] for r in spark.read.parquet(target).collect()}
    assert rows == {"1": "A", "2": "B2", "3": "C"}

    # replay from a fresh checkpoint (simulates reprocessing the zone):
    # merge idempotence keeps the table identical
    q = foreach_batch_upsert(
        stream_crime_pages(spark, pages),
        target, keys=["id"], order_by=[":updated_at"],
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(120)
    rows2 = {r["id"]: r["case_number"] for r in spark.read.parquet(target).collect()}
    assert rows2 == rows


def test_stream_interval_join_matches_batch(spark, tmp_path):
    from open_crime_etl_pipeline_spark.streaming.pipeline import stream_interval_join

    src = str(tmp_path / "events")
    rows = [
        (BASE, 1, "click"),
        (BASE + dt.timedelta(minutes=10), 1, "purchase"),   # within 30m of click
        (BASE + dt.timedelta(minutes=50), 1, "purchase"),   # outside 30m
        (BASE + dt.timedelta(minutes=5), 2, "purchase"),    # different user has no click
    ]
    _write_events(spark, src, rows)
    ev = spark.read.parquet(src)
    sev = spark.readStream.schema(ev.schema).parquet(src)
    clicks = sev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    purch = sev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    joined = stream_interval_join(clicks, purch, on="user_id", upper="30 minutes",
                                  left_prefix="c_", right_prefix="p_")
    out = _run_available_now(joined, str(tmp_path), "ij").collect()
    assert len(out) == 1
    assert out[0].c_user_id == 1 and out[0].p_event_id == 1


def test_drop_duplicates_within_watermark_evicts_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark — the bounded-state dedup for
    unbounded feeds (what streaming_curation_dedup's docstring points
    at): duplicates inside the horizon collapse, and a key re-arriving
    after its state was evicted is emitted again."""
    src = str(tmp_path / "ev")
    os.makedirs(src)

    def write_file(n, rows):
        df = spark.createDataFrame(
            [(i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/f{n}")
        # the file source orders batches by modification time; pin
        # distinct mtimes so f1 < f2 < f3 regardless of write speed
        import time

        t = time.time() + n * 10
        for root, _dirs, files in os.walk(f"{src}/f{n}"):
            for fn in files:
                os.utime(os.path.join(root, fn), (t, t))

    t0 = BASE
    write_file(1, [(t0, 1, "a"), (t0 + dt.timedelta(minutes=5), 1, "a"),
                   (t0, 2, "b")])
    write_file(2, [(t0 + dt.timedelta(hours=3), 3, "c")])  # advances watermark
    # eviction runs against the watermark as of batch START, so the
    # advance from f2 takes effect one batch later — f3 is that batch
    write_file(3, [(t0 + dt.timedelta(hours=3, minutes=10), 4, "d")])
    write_file(4, [(t0 + dt.timedelta(hours=3, minutes=15), 1, "a")])  # key 1 re-arrives

    schema = spark.read.parquet(f"{src}/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(f"{src}/f*")
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["user_id"])
    )
    out = _run_available_now(stream, str(tmp_path), "ddww").collect()
    per_user = sorted((r.user_id, r.ts) for r in out)
    users = [u for u, _ in per_user]
    assert users == [1, 1, 2, 3, 4]  # user 1 twice: horizon-separated arrivals
    # within-horizon duplicate collapsed to the first arrival
    assert (1, t0) in per_user and (1, t0 + dt.timedelta(minutes=5)) not in per_user
    assert (1, t0 + dt.timedelta(hours=3, minutes=15)) in per_user


def test_streaming_curation_matches_batch(spark):
    """The streaming curation pipeline (quality gate → normalize →
    dropDuplicates → sink) must emit exactly the batch-computed curated
    key set — duplicates collapse, sub-quality docs never reach state."""
    from open_crime_etl_pipeline_spark.operators import textstats as TS
    from open_crime_etl_pipeline_spark.queries.streaming import (
        streaming_curation_dedup,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r.content_key, r.norm_len)
        for r in streaming_curation_dedup(spark, sf_dir).collect()
    }
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    batch = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumn("norm", norm)
        .filter(
            (F.length("norm") >= 100)
            & (TS.stopword_ratio(F.col("norm")) >= 0.05)
        )
        .select(F.md5("norm").alias("k"), F.length("norm").alias("n"))
        .distinct()
    )
    expect = {(r.k, r.n) for r in batch.collect()}
    assert got == expect and len(got) > 0


def test_foreach_batch_upsert_versioned_table(spark, tmp_path):
    """Streaming MERGE into the txn-log table: each epoch publishes an
    immutable snapshot, history is time-travelable, and replay commits
    an identical-content version (idempotent merge on lakehouse
    storage)."""
    from open_crime_etl_pipeline_spark.io.table import VersionedParquetTable
    from open_crime_etl_pipeline_spark.streaming.pipeline import (
        foreach_batch_upsert_versioned,
    )

    pages = str(tmp_path / "landing")
    root = str(tmp_path / "crime_versioned")
    os.makedirs(pages)

    def page(n, recs):
        with open(os.path.join(pages, f"part-{n:04d}.json"), "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")

    page(0, [
        {"id": "1", "case_number": "A", ":updated_at": "2025-01-01T00:00:00.000"},
        {"id": "2", "case_number": "B", ":updated_at": "2025-01-01T00:00:00.000"},
    ])
    q = foreach_batch_upsert_versioned(
        stream_crime_pages(spark, pages), root,
        keys=["id"], order_by=[":updated_at"],
        checkpoint_dir=str(tmp_path / "vckpt1"),
    )
    q.awaitTermination(120)

    page(1, [
        {"id": "2", "case_number": "B2", ":updated_at": "2025-01-02T00:00:00.000"},
        {"id": "3", "case_number": "C", ":updated_at": "2025-01-02T00:00:00.000"},
    ])
    q = foreach_batch_upsert_versioned(
        stream_crime_pages(spark, pages), root,
        keys=["id"], order_by=[":updated_at"],
        checkpoint_dir=str(tmp_path / "vckpt1"),
    )
    q.awaitTermination(120)

    table = VersionedParquetTable(spark, root)
    assert table.latest_version() == 2
    now = {r["id"]: r["case_number"] for r in table.read().collect()}
    assert now == {"1": "A", "2": "B2", "3": "C"}
    # time travel: version 1 predates the second epoch
    v1 = {r["id"]: r["case_number"] for r in table.read(version=1).collect()}
    assert v1 == {"1": "A", "2": "B"}

    # full replay from a fresh checkpoint: content is unchanged, only
    # a new version is appended
    q = foreach_batch_upsert_versioned(
        stream_crime_pages(spark, pages), root,
        keys=["id"], order_by=[":updated_at"],
        checkpoint_dir=str(tmp_path / "vckpt2"),
    )
    q.awaitTermination(120)
    assert table.latest_version() == 3
    replay = {r["id"]: r["case_number"] for r in table.read().collect()}
    assert replay == now


def test_windowed_counts_update_mode_emits_revisions(spark, tmp_path):
    """Update output mode: a window revised by a later micro-batch is
    re-emitted with its new count (append mode would hold it until the
    watermark finalizes; complete mode would re-emit everything). The
    sink therefore sees BOTH versions of the revised window."""
    src = str(tmp_path / "ev")
    os.makedirs(src)

    def write_file(n, rows):
        df = spark.createDataFrame(
            [(i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/f{n}")
        import time

        t = time.time() + n * 10
        for root, _d, files in os.walk(f"{src}/f{n}"):
            for fn in files:
                os.utime(os.path.join(root, fn), (t, t))

    write_file(1, [(BASE + dt.timedelta(minutes=5), 1, "click")])
    write_file(2, [(BASE + dt.timedelta(minutes=20), 2, "click")])  # same 1h window

    schema = spark.read.parquet(f"{src}/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(f"{src}/f*")
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("upd_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_upd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = [(r.window_start, r.n_events) for r in spark.table("upd_counts").collect()]
    # batch 1 emits (window, 1); batch 2 revises the SAME window to 2
    assert (BASE, 1) in out and (BASE, 2) in out and len(out) == 2


def test_run_to_table_single_batch_assertion_trips_on_multi_batch(spark, tmp_path):
    """ADVICE r3: the SELECT DISTINCT oracle for
    streaming_dedup_within_watermark is only valid when the whole input
    lands in ONE micro-batch. The assumption is structural now — a
    multi-batch run must fail loudly, not hash-mismatch."""
    from open_crime_etl_pipeline_spark.queries.streaming import _run_to_table

    src = tmp_path / "src"
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    df.limit(1).write.parquet(str(src / "f1.parquet"))
    df.write.parquet(str(src / "f2.parquet"))
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    with pytest.raises(AssertionError, match="ONE input micro-batch"):
        _run_to_table(stream, "multi_batch_guard", expect_single_batch=True)
    # single-batch run passes the same guard
    single = spark.readStream.schema("k long, v string").parquet(str(src) + "/*")
    out = _run_to_table(single, "single_batch_ok", expect_single_batch=True)
    assert out.count() == 3


def test_streaming_mg_state_stays_bounded_under_vocab_churn(spark, tmp_path):
    """streaming_mg_candidates' contract is O(buckets*k) state FOREVER:
    each GroupState holds at most k counters no matter how many
    distinct tokens flow through. Emitted rows per (batch, bucket) ARE
    the post-batch state arrays (fn yields exactly the counts dict it
    stores), so bounding them across a multi-batch run with a fully
    churning vocabulary pins the eviction behavior — and the planted
    overall-heavy token must still be in the final candidate set (MG's
    superset guarantee)."""
    import time

    from open_crime_etl_pipeline_spark.streaming.pipeline import (
        streaming_mg_candidates,
    )

    k, n_buckets, n_files = 8, 2, 4
    src = str(tmp_path / "toks")
    os.makedirs(src)
    for f in range(n_files):
        toks = [f"w{f}_{i}" for i in range(200)]  # fresh vocab per file
        toks += ["HH"] * 50  # the heavy hitter, present in every batch
        df = spark.createDataFrame([(t,) for t in toks], "tok string")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/f{f}")
        t = time.time() + f * 10  # pin batch order by mtime
        for root, _dirs, files in os.walk(f"{src}/f{f}"):
            for fn in files:
                os.utime(os.path.join(root, fn), (t, t))

    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(f"{src}/f*")
    )
    cands = streaming_mg_candidates(stream, k_per_bucket=k, n_buckets=n_buckets)
    seen: list[tuple[int, int, str]] = []  # (batch_id, bucket, tok)

    def capture(df, batch_id):
        for r in df.collect():
            seen.append((int(batch_id), int(r["bucket"]), r["tok"]))

    q = (
        cands.writeStream.foreachBatch(capture)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_mg"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "MG stream did not drain in 180s"

    batches = sorted({b for b, _, _ in seen})
    assert len(batches) == n_files  # one micro-batch per file
    by_batch_bucket: dict = {}
    for b, bk, tok in seen:
        by_batch_bucket.setdefault((b, bk), []).append(tok)
    # THE bound: every batch's every bucket holds <= k counters, even
    # though 800 distinct tokens churned through 2 buckets of k=8
    for (b, bk), toks in by_batch_bucket.items():
        assert len(toks) <= k, f"batch {b} bucket {bk} held {len(toks)} > k={k}"
    # superset guarantee: HH (50 per batch vs singleton noise) survives
    last = batches[-1]
    final_cands = {tok for (b, _bk, tok) in seen if b == last}
    assert "HH" in final_cands
