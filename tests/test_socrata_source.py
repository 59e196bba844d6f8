"""Custom Python DataSource for the paginated REST scan (SURVEY §2.1
S1/S2): month-window partitions, empty-page termination, updated_on
filter pushdown, and the end-to-end ingest slice (source → silver
transform → merge)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.operators.merge import merge_upsert
from open_crime_etl_pipeline_spark.sources import register_socrata_source
from open_crime_etl_pipeline_spark.sources.socrata import month_windows
from open_crime_etl_pipeline_spark.transform.crime import transform_crime_page


@pytest.fixture(scope="module")
def socrata(spark):
    register_socrata_source(spark)
    return spark


def _read(spark, **options):
    reader = spark.read.format("socrata_crime")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def test_month_window_chunking():
    w = month_windows(dt.datetime(2025, 1, 15), dt.datetime(2025, 4, 1))
    assert w == [
        (dt.datetime(2025, 1, 15), dt.datetime(2025, 2, 15)),
        (dt.datetime(2025, 2, 15), dt.datetime(2025, 3, 15)),
        (dt.datetime(2025, 3, 15), dt.datetime(2025, 4, 1)),  # clamped
    ]


def test_fake_scan_counts_and_schema(socrata):
    df = _read(
        socrata, endpoint="fake://130", pagesize="50",
        start_date="2025-01-01T00:00:00.000", end_date="2025-03-01T00:00:00.000",
    )
    # 2 month windows × 130 rows, paged 50/50/30 then empty-page stop
    assert df.count() == 260
    assert df.schema["updated_on"].dataType.typeName() == "string"
    ids = [r.id for r in df.select("id").collect()]
    assert len(set(ids)) == 260


def test_updated_on_pushdown_prunes_windows(socrata):
    full = _read(
        socrata, endpoint="fake://40", pagesize="50",
        start_date="2025-01-01T00:00:00.000", end_date="2025-06-01T00:00:00.000",
    )
    pushed = full.filter(F.col("updated_on") >= "2025-04-01T00:00:00.000")
    expect = sorted(
        r.id for r in full.collect()
        if r.updated_on >= "2025-04-01T00:00:00.000"
    )
    got = sorted(r.id for r in pushed.collect())
    assert got == expect and len(got) > 0


def test_inclusive_upper_bound_keeps_boundary_row(socrata):
    """updated_on <= v / = v must scan past the exclusive window end —
    a row at exactly v is otherwise never generated (and the re-yielded
    filter can't resurrect an unscanned row)."""
    full = _read(
        socrata, endpoint="fake://40", pagesize="50",
        start_date="2025-01-01T00:00:00.000", end_date="2025-03-01T00:00:00.000",
    )
    rows = full.collect()
    boundary = max(r.updated_on for r in rows)
    expect_le = sorted(r.id for r in rows if r.updated_on <= boundary)
    got_le = sorted(
        r.id for r in full.filter(F.col("updated_on") <= boundary).collect()
    )
    assert got_le == expect_le
    expect_eq = sorted(r.id for r in rows if r.updated_on == boundary)
    got_eq = sorted(
        r.id for r in full.filter(F.col("updated_on") == boundary).collect()
    )
    assert got_eq == expect_eq and len(got_eq) > 0


def test_in_contains_notnull_absorbed_pushdown(socrata):
    """IN-list / contains / not-null predicates are absorbed by the
    source (enforced server-side); results must equal Spark-side
    evaluation of the same predicates."""
    full = _read(
        socrata, endpoint="fake://60", pagesize="50",
        start_date="2025-01-01T00:00:00.000", end_date="2025-03-01T00:00:00.000",
    )
    rows = full.collect()
    kinds = sorted({r.primary_type for r in rows if r.primary_type})[:2]
    pushed = full.filter(
        F.col("primary_type").isin(*kinds)
        & F.col("case_number").contains("2025")
        & F.col("location").isNotNull()
    )
    expect = sorted(
        r.id for r in rows
        if r.primary_type in kinds and r.case_number and "2025" in r.case_number
        and r.location is not None
    )
    assert sorted(r.id for r in pushed.collect()) == expect
    # the same query with a satisfiable location predicate
    pushed2 = full.filter(
        F.col("primary_type").isin(*kinds) & F.col("case_number").contains("2025")
    )
    expect2 = sorted(
        r.id for r in rows
        if r.primary_type in kinds and r.case_number and "2025" in r.case_number
    )
    got2 = sorted(r.id for r in pushed2.collect())
    assert got2 == expect2 and len(got2) > 0


def test_soql_fragment_rendering():
    from pyspark.sql.datasource import (
        In, IsNotNull, StringContains, StringEndsWith, StringStartsWith,
    )
    from open_crime_etl_pipeline_spark.sources.socrata import _soql_fragment

    assert _soql_fragment(In(("beat",), ("0111", "O'Hare"))) == \
        "beat in ('0111', 'O''Hare')"
    assert _soql_fragment(StringContains(("block",), "50% OFF")) == \
        "block like '%50% OFF%'"
    assert _soql_fragment(StringStartsWith(("block",), "0000X")) == \
        "block like '0000X%'"
    assert _soql_fragment(StringEndsWith(("iucr",), "7")) == "iucr like '%7'"
    assert _soql_fragment(IsNotNull(("ward",))) == "ward is not null"
    from pyspark.sql.datasource import IsNull, Not

    assert _soql_fragment(IsNull(("location",))) == "location is null"
    assert _soql_fragment(Not(In(("beat",), ("1",)))) == "not (beat in ('1'))"
    from pyspark.sql.datasource import EqualNullSafe, EqualTo

    assert _soql_fragment(EqualTo(("beat",), "0111")) == "beat = '0111'"
    assert _soql_fragment(EqualNullSafe(("beat",), "0111")) == "beat = '0111'"
    assert _soql_fragment(EqualNullSafe(("ward",), None)) == "ward is null"
    # NOT(a <=> v) is TRUE on null rows — must not drop them server-side
    assert _soql_fragment(Not(EqualNullSafe(("beat",), "0111"))) == \
        "(beat is null or beat != '0111')"


def test_equality_absorbed_pushdown(socrata):
    """EqualTo / EqualNullSafe absorb into the scan; null-safe negation
    keeps rows where the column is NULL (location is always NULL in the
    fake data), unlike three-valued NOT(=)."""
    full = _read(
        socrata, endpoint="fake://60", pagesize="50",
        start_date="2025-01-01T00:00:00.000", end_date="2025-02-01T00:00:00.000",
    )
    rows = full.collect()
    kind = rows[0].primary_type
    expect = sorted(r.id for r in rows if r.primary_type == kind)
    got = sorted(
        r.id for r in full.filter(F.col("primary_type") == kind).collect()
    )
    assert got == expect and len(got) > 0
    # null-safe equality against a NULL column is total, not UNKNOWN
    assert full.filter(F.col("location").eqNullSafe(F.lit(None))).count() \
        == len(rows)
    assert full.filter(F.col("location").eqNullSafe("x")).count() == 0
    assert full.filter(~F.col("location").eqNullSafe("x")).count() == len(rows)
    # plain NOT(=) on the same NULL column is UNKNOWN everywhere
    assert full.filter(F.col("location") != "x").count() == 0


def test_startswith_endswith_absorbed_pushdown(socrata):
    full = _read(
        socrata, endpoint="fake://60", pagesize="50",
        start_date="2025-01-01T00:00:00.000", end_date="2025-02-01T00:00:00.000",
    )
    rows = full.collect()
    pushed = full.filter(
        F.col("case_number").startswith("HZ2025") & F.col("iucr").endswith("7")
    )
    expect = sorted(
        r.id for r in rows
        if r.case_number.startswith("HZ2025") and r.iucr.endswith("7")
    )
    got = sorted(r.id for r in pushed.collect())
    assert got == expect and len(got) > 0


def test_not_and_isnull_pushdown_three_valued(socrata):
    """NOT(IN)/NOT(contains) must keep SQL three-valued semantics when
    absorbed: a NULL column is UNKNOWN, not True, under negation."""
    full = _read(
        socrata, endpoint="fake://60", pagesize="50",
        start_date="2025-01-01T00:00:00.000", end_date="2025-02-01T00:00:00.000",
    )
    rows = full.collect()
    pushed = full.filter(
        ~F.col("primary_type").isin("THEFT") & ~F.col("iucr").contains("7")
    )
    expect = sorted(
        r.id for r in rows
        if r.primary_type != "THEFT" and "7" not in r.iucr
    )
    got = sorted(r.id for r in pushed.collect())
    assert got == expect and len(got) > 0
    # location is always NULL in the fake data: NOT(location IN (...))
    # is UNKNOWN for every row and must select nothing, while IS NULL
    # selects everything
    assert full.filter(~F.col("location").isin("x")).count() == 0
    assert full.filter(F.col("location").isNull()).count() == len(rows)


def test_absorbed_filters_leave_no_postscan_filter(socrata):
    """Plan-shape regression: absorbed predicates must disappear into
    the BatchScan — a post-scan Filter node means Spark is re-running
    work the source already did server-side."""
    df = _read(
        socrata, endpoint="fake://30", pagesize="50",
        start_date="2025-01-01T00:00:00.000", end_date="2025-02-01T00:00:00.000",
    ).filter(
        F.col("primary_type").isin("THEFT", "BATTERY")
        & F.col("case_number").startswith("HZ")
        & F.col("block").contains("STATE")
        & F.col("ward").isNotNull()
    )
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan socrata_crime" in plan
    # a Filter NODE renders as "Filter (" / "+- Filter" / "*(n) Filter";
    # the BatchScan's own "RuntimeFilters: []" attribute is not a node
    assert not re.search(r"(?:\*\(\d+\) |\+- |^)Filter ", plan, re.M)


def test_page_cap_limits_rows(socrata):
    df = _read(
        socrata, endpoint="fake://1000", pagesize="100", max_pages="2",
        start_date="2025-01-01T00:00:00.000", end_date="2025-02-01T00:00:00.000",
    )
    assert df.count() == 200  # etl/main.py:57 page-cap semantics


def test_fresh_load_per_query_contract(socrata):
    """Documents the Spark 4.1 python-DS planning caveat: a filterless
    query on a previously filter-planned DataFrame reuses the absorbed
    scan, so the source contract is one .load() per logical query —
    under which every query answers correctly."""
    opts = dict(
        endpoint="fake://25", pagesize="10",
        start_date="2025-01-01T00:00:00.000", end_date="2025-02-01T00:00:00.000",
    )
    assert _read(socrata, **opts).count() == 25
    assert _read(socrata, **opts).filter(F.col("id").isNull()).count() == 0
    assert _read(socrata, **opts).count() == 25  # fresh load: not contaminated


def test_ingest_end_to_end_source_transform_merge(socrata, tmp_path):
    # one .load() per logical query (see module docstring caveat)
    def silver():
        return transform_crime_page(_read(
            socrata, endpoint="fake://25", pagesize="10",
            start_date="2025-01-01T00:00:00.000", end_date="2025-02-01T00:00:00.000",
        ))

    assert silver().filter(F.col("crime_id").isNull()).count() == 0
    assert silver().select("crime_id").distinct().count() == 25

    # incremental batch with one overlap month (ST4 deliberate-overlap)
    batch = transform_crime_page(_read(
        socrata, endpoint="fake://25", pagesize="10",
        start_date="2025-01-01T00:00:00.000", end_date="2025-03-01T00:00:00.000",
    ))
    merged = merge_upsert(silver(), batch, keys=["crime_id"],
                          order_by=["source_updated_on"])
    assert merged.count() == 50  # 25 updates absorbed, 25 inserts
    assert merged.select("crime_id").distinct().count() == 50


def test_flaky_backend_recovers_via_retries(socrata):
    """Transient page failures are retried with backoff (reference runs
    3 retries / 10 s, crime_etl.py:558-561); the recovered scan must be
    byte-identical to the healthy one."""
    healthy = _read(
        socrata, endpoint="fake://120", pagesize="25",
        start_date="2025-01-01T00:00:00.000", end_date="2025-03-01T00:00:00.000",
    ).collect()
    flaky = _read(
        socrata, endpoint="flaky://120:2", pagesize="25", retry_delay="0.01",
        start_date="2025-01-01T00:00:00.000", end_date="2025-03-01T00:00:00.000",
    ).collect()
    assert sorted(map(tuple, flaky)) == sorted(map(tuple, healthy))
    assert len(flaky) == 240


def test_flaky_backend_without_retries_fails(socrata):
    df = _read(
        socrata, endpoint="flaky://120:2", pagesize="25",
        retries="0", retry_delay="0.01",
        start_date="2025-01-01T00:00:00.000", end_date="2025-02-01T00:00:00.000",
    )
    with pytest.raises(Exception, match="injected fault"):
        df.collect()


# ---------------------------------------------------------------------------
# ST5: page-level checkpoint/resume (reference crime_etl.py:131-169,190-228)
# ---------------------------------------------------------------------------

def _fetched_pages(ckpt_root):
    """(window_dir, pagenum) → fetch count, from the _fetchlog audit trail."""
    from collections import Counter
    from pathlib import Path

    counts: Counter = Counter()
    for marker in Path(ckpt_root).glob("window=*/_fetchlog/page-*"):
        pagenum = int(marker.name.split(".")[0].split("-")[1])
        counts[(marker.parent.parent.name, pagenum)] += 1
    return counts


def test_checkpoint_resume_skips_landed_pages(socrata, tmp_path):
    """Kill mid-window, re-run: pages landed before the crash are served
    from the checkpoint, never re-fetched from the API."""
    ckpt = str(tmp_path / "ckpt")
    window = dict(
        pagesize="25", retries="0", checkpoint_dir=ckpt,
        start_date="2025-01-01T00:00:00.000", end_date="2025-02-01T00:00:00.000",
    )
    # First attempt: page 3 hard-fails every retry → the task (and with
    # local maxFailures=1, the job) dies after pages 0-2 have landed.
    with pytest.raises(Exception):
        _read(socrata, endpoint="crash://120:3", **window).count()
    first = _fetched_pages(ckpt)
    assert sum(n for (_, p), n in first.items() if p <= 2) == 3  # 0,1,2 landed

    # Server healed: the re-run resumes from the cursor. 120 rows @ 25
    # per page = pages 0-4 + empty page 5 terminator.
    healthy = _read(socrata, endpoint="fake://120", **window)
    assert healthy.count() == 120
    after = _fetched_pages(ckpt)
    # No landed page was fetched twice; only pages 3,4 and the empty
    # terminator (5) hit the API on the resume run.
    assert all(n == 1 for n in after.values())
    resumed = {p for key, p in after.keys() - first.keys()} | {
        p for (w, p) in after if after[(w, p)] > first.get((w, p), 0)
    }
    assert resumed == {3, 4, 5}

    # Third run: the window is _COMPLETE — replayed fully from the lake,
    # zero API calls.
    again = _read(socrata, endpoint="fake://120", **window)
    assert again.count() == 120
    assert _fetched_pages(ckpt) == after


def test_checkpoint_complete_replay_matches_uncheckpointed(socrata, tmp_path):
    """A checkpoint-replayed scan is row-identical to a direct scan."""
    ckpt = str(tmp_path / "ckpt2")
    window = dict(
        pagesize="50",
        start_date="2025-01-01T00:00:00.000", end_date="2025-03-01T00:00:00.000",
    )
    direct = _read(socrata, endpoint="fake://130", **window).collect()
    landed = _read(
        socrata, endpoint="fake://130", checkpoint_dir=ckpt, **window
    ).collect()
    replayed = _read(
        socrata, endpoint="fake://130", checkpoint_dir=ckpt, **window
    ).collect()
    assert sorted(map(tuple, landed)) == sorted(map(tuple, direct))
    assert sorted(map(tuple, replayed)) == sorted(map(tuple, direct))


def test_checkpoint_fingerprint_isolates_query_shapes(socrata, tmp_path):
    """Different absorbed WHEREs land under different fingerprints — a
    resume never serves pages fetched for a different server-side query."""
    ckpt = str(tmp_path / "ckpt3")
    window = dict(
        pagesize="50", checkpoint_dir=ckpt,
        start_date="2025-01-01T00:00:00.000", end_date="2025-02-01T00:00:00.000",
    )
    full = _read(socrata, endpoint="fake://90", **window)
    assert full.count() == 90
    filtered = _read(socrata, endpoint="fake://90", **window).filter(
        F.col("primary_type").isin("THEFT")
    )
    n_theft = filtered.count()
    assert 0 < n_theft < 90
    from pathlib import Path

    wdirs = {p.name for p in Path(ckpt).glob("window=*")}
    assert len(wdirs) == 2  # one landing per query fingerprint


# --------------------------------------------------------------------------
# Streaming source (SocrataStreamReader): offsets, drain, kill/resume
# --------------------------------------------------------------------------

def _stream(spark, land, **opts):
    reader = (
        spark.readStream.format("socrata_crime")
        .option("endpoint", "fake://120")
        .option("pagesize", "60")
        .option("start_date", "2025-01-01T00:00:00.000")
        .option("end_date", "2025-04-01T00:00:00.000")
        .option("checkpoint_dir", land)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def _fetchlog_counts(land):
    """page-file -> marker count across all windows; any value > 1
    means a page was fetched twice (the ST5 violation)."""
    from collections import Counter
    from pathlib import Path

    c = Counter()
    for m in Path(land).glob("window=*/_fetchlog/*"):
        c[(m.parent.parent.name, m.name.split(".")[0])] += 1
    return c


def test_stream_drains_in_offset_order_exactly_once(socrata, tmp_path):
    """Repeated availableNow runs (each = one read() micro-batch)
    drain the 3-window endpoint into an exactly-once parquet sink:
    360 rows, every id once, one fetch per page (6 data + 3 empty)."""
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    prev = -1
    for _ in range(10):
        q = (
            _stream(socrata, land, pages_per_batch="3")
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n = socrata.read.parquet(sink).count()
        if n == prev:
            break
        prev = n
    df = socrata.read.parquet(sink)
    assert df.count() == 360
    assert df.select("id").distinct().count() == 360
    logs = _fetchlog_counts(land)
    assert len(logs) == 9 and set(logs.values()) == {1}


def test_stream_kill_mid_run_resumes_without_refetch(socrata, tmp_path):
    """Murder the query AFTER batch 1's offset is logged but BEFORE its
    commit (foreachBatch raises on first sight of batch 1), restart on
    the same checkpoint, and drain. Spark replays the in-flight batch
    through readBetweenOffsets — which must serve from the landing
    checkpoint: the fetchlog ends with EXACTLY one marker per page,
    and per-batch-id overwrite sinks make the output exactly-once."""
    import glob
    import os

    from pyspark.sql.streaming import StreamingQueryException

    land = str(tmp_path / "land")
    out_root = str(tmp_path / "batches")
    ckpt = str(tmp_path / "ckpt")
    bomb = tmp_path / "bomb_armed"
    bomb.write_text("armed")

    def sink_batch(df, batch_id):
        # idempotent per-batch sink: replays overwrite, never duplicate
        df.write.mode("overwrite").parquet(f"{out_root}/b{batch_id}")
        if batch_id == 1 and bomb.exists():
            bomb.unlink()
            raise RuntimeError("injected kill after batch-1 write")

    def run_once():
        q = (
            _stream(socrata, land, pages_per_batch="1")
            .writeStream.foreachBatch(sink_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        except StreamingQueryException as e:
            assert "injected kill" in str(e)

    n = 0
    for _ in range(20):  # 9 page batches + 3 cursor-roll batches + replay
        run_once()
        parts = glob.glob(f"{out_root}/b*")
        n = sum(
            socrata.read.parquet(p).count() for p in parts
        ) if parts else 0
        # cursor-roll batches (an empty page advancing the window) and
        # the post-kill replay run both legitimately add 0 rows, so the
        # only safe stop is the known drained total
        if n == 360:
            break
    # one more run so the stream consumes the LAST window's empty-page
    # probe (rows were already complete; the cursor wasn't)
    run_once()
    union = socrata.read.parquet(f"{out_root}/b*")
    assert union.count() == 360
    assert union.select("id").distinct().count() == 360
    assert not bomb.exists(), "the kill never fired"
    logs = _fetchlog_counts(land)
    assert len(logs) == 9, logs
    assert set(logs.values()) == {1}, (
        f"a page was fetched more than once across the kill/resume: "
        f"{ {k: v for k, v in logs.items() if v > 1} }"
    )


def test_landing_checkpoint_on_uri_filesystem(socrata, tmp_path):
    """VERDICT r6 item 5: the ST5 landing checkpoint must not be
    driver-local-FS-only — a `file://` URI routes through
    pyarrow.fs.FileSystem.from_uri (the same dispatch that serves
    s3://, gs://, hdfs://), and the full land/resume/replay contract
    holds: row-identical to a direct scan, one fetch per page."""
    ckpt_local = str(tmp_path / "lake")
    window = dict(
        pagesize="50",
        start_date="2025-01-01T00:00:00.000",
        end_date="2025-02-01T00:00:00.000",
    )
    landed = _read(
        socrata, endpoint="fake://130", checkpoint_dir=f"file://{ckpt_local}",
        **window,
    )
    direct = _read(socrata, endpoint="fake://130", **window)
    assert sorted(landed.collect()) == sorted(direct.collect())
    # pages + _COMPLETE actually landed under the URI's local root
    first = _fetched_pages(ckpt_local)
    assert first and all(n == 1 for n in first.values())
    import os

    wdirs = [d for d in os.listdir(ckpt_local) if d.startswith("window=")]
    assert wdirs and os.path.exists(
        os.path.join(ckpt_local, wdirs[0], "_COMPLETE")
    )
    # replay run: zero new fetches, same rows
    again = _read(
        socrata, endpoint="fake://130", checkpoint_dir=f"file://{ckpt_local}",
        **window,
    )
    assert again.count() == direct.count()
    assert _fetched_pages(ckpt_local) == first


def test_streaming_landing_on_registered_custom_scheme(tmp_path):
    """A custom landing scheme (registered via register_landing_fs,
    tmpdir-backed SubTreeFileSystem standing in for an object store)
    carries the streaming reader's no-refetch guarantee: a second
    reader replaying the same offsets serves every page from the lake
    and never calls the API again."""
    import pyarrow.fs as pafs

    from open_crime_etl_pipeline_spark.schemas import CRIME_RAW_SCHEMA
    from open_crime_etl_pipeline_spark.sources.socrata import (
        SocrataStreamReader,
        register_landing_fs,
    )

    root = tmp_path / "bucket"
    root.mkdir()

    def resolver(uri):
        # faketree://bucket/<path> → <path> inside the tmpdir "bucket"
        path = uri.split("://", 1)[1].split("/", 1)
        sub = path[1] if len(path) > 1 else ""
        return pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem()), sub

    register_landing_fs("faketree", resolver)
    opts = dict(
        endpoint="fake://120", pagesize="25", pages_per_batch="10",
        start_date="2025-01-01T00:00:00.000",
        end_date="2025-02-01T00:00:00.000",
        checkpoint_dir="faketree://bucket/land",
    )
    r1 = SocrataStreamReader(CRIME_RAW_SCHEMA, opts)
    start = r1.initialOffset()
    rows, end = r1.read(start)
    rows = list(rows)
    assert len(rows) == 120
    fetchlog = list((root / "land").glob("window=*/_fetchlog/page-*"))
    n_fetches = len(fetchlog)
    assert n_fetches >= 5  # pages 0-4 + empty terminator markers

    # fresh reader (post-crash restart): replay [start, end) — all from
    # the landing, zero new fetchlog markers
    r2 = SocrataStreamReader(CRIME_RAW_SCHEMA, opts)
    replay = list(r2.readBetweenOffsets(start, end))
    assert sorted(replay) == sorted(rows)
    assert len(list((root / "land").glob("window=*/_fetchlog/page-*"))) == n_fetches
