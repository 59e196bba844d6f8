"""Structured Streaming surface (SURVEY.md §2.8).

The reference is a batch pipeline with hand-built streaming semantics:
high-watermark CDC (ST1-ST4), page/file-level checkpoint-resume
(ST5/ST6), idempotent replay via MERGE (ST7). This module is the
Spark-native restatement: a file-source stream over the landing zone
(checkpointLocation subsumes the processed-file ledger), event-time
windows with watermarks for late data, streaming dedup, a custom
stateful sessionizer (``applyInPandasWithState``), and a
``foreachBatch`` MERGE sink reusing the engine's join-based upsert —
so batch and streaming share one merge implementation.

Scale notes: every stateful op here keys its state by a bounded-width
column (user_id / crime_id / window), state is evicted by watermark or
timeout, and the foreachBatch sink touches only affected partitions —
the properties that keep state size and per-epoch work proportional to
the *change*, not the table, on a 1000-executor cluster.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import CRIME_RAW_SCHEMA, TESTDATA_SCHEMAS
from ..operators.merge import merge_upsert


def stream_crime_pages(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the gzip-JSON landing zone — the
    streaming analog of the reference's download→load loop
    (`crime_etl.py:261-298`): Spark's source checkpoint replaces the
    `download_successful` flag + unlink-after-load bookkeeping (ST6)."""
    reader = spark.readStream.schema(CRIME_RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """Parquet file-source stream over an events directory (testdata
    schema). Event-time column: ``ts``."""
    return spark.readStream.schema(TESTDATA_SCHEMAS["events"]).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling (or sliding) event-time counts with a watermark for late
    data (ST10). Watermark bounds state: windows older than
    max(event time) − delay are finalized and evicted."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon:
    ``withWatermark`` + ``dropDuplicates`` — the streaming form of the
    reference's overlap-window-plus-idempotent-merge (ST4/ST7). State =
    one key per row seen, evicted at the watermark."""
    return df.withWatermark(ts_col, watermark).dropDuplicates(keys)


def session_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Built-in session windows (gap-merged) per user (ST10)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


SESSION_STATE_SCHEMA = "start timestamp, last timestamp, n long"
SESSION_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful sessionizer via ``applyInPandasWithState`` — the
    escape hatch for session logic ``session_window`` can't express
    (e.g. emitting a session only when it *closes*, custom gap rules).

    State per user: (session start, last event ts, count). An event
    within ``gap_seconds`` of the last extends the session; otherwise
    the finished session is emitted and a new one opens. Event-time
    timeout flushes idle sessions when the watermark passes them — this
    is what bounds state on an unbounded stream.

    The closure is self-contained (stdlib + pandas only) so workers
    never import this package.
    """
    gap = gap_seconds

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import datetime as _dt

        import pandas as _pd

        user_id = key[0]
        out: list[tuple[Any, _dt.datetime, _dt.datetime, int]] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                out.append((user_id, start, last, n))
            state.remove()
        else:
            ts_list: list[_dt.datetime] = []
            for pdf in pdfs:
                ts_list.extend(_pd.to_datetime(pdf["ts"]).dt.to_pydatetime())
            ts_list.sort()
            if not ts_list:
                return
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = ts_list[0], ts_list[0], 0
            for ts in ts_list:
                if (ts - last).total_seconds() > gap:
                    out.append((user_id, start, last, n))
                    start, n = ts, 0
                last = ts if ts > last else last
                n += 1
            state.update((start, last, n))
            # flush via event-time timeout once the watermark passes the
            # session's end + gap
            state.setTimeoutTimestamp(int(last.timestamp() * 1000) + gap * 1000)

        if out:  # yielding typed-empty frames trips pandas concat dtype warnings
            yield _pd.DataFrame(
                out, columns=["user_id", "session_start", "session_end", "n_events"]
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def transform_with_state_available() -> tuple[bool, str]:
    """MEASURED environment probe for the transformWithStateInPandas
    prerequisite (its Python worker speaks protobuf to the JVM state
    server). Returns (ok, reason). The engine's documented stateful
    surface is the applyInPandasWithState sessionizer; the twin is an
    optional alternate API path, and its contract test asserts the
    fail-fast gate where protobuf is absent and old/new-API
    equivalence where present — no environment skips anything."""
    import importlib.util

    try:
        if importlib.util.find_spec("google.protobuf") is None:
            return False, "google.protobuf not importable"
    except ModuleNotFoundError:  # parent 'google' namespace absent entirely
        return False, "google namespace package absent"
    return True, "google.protobuf importable"


def sessionize_transform_with_state(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """The sessionizer on ``transformWithStateInPandas`` — Spark 4's
    successor to ``applyInPandasWithState`` (typed named state + explicit
    timers instead of one opaque state tuple + timeoutConf). Same
    semantics as :func:`sessionize_stateful`: emit a session only when it
    closes (gap exceeded in-batch, or an event-time timer fires once the
    watermark passes last + gap).

    Scale: state is one (start, last, n) row per *open* session keyed by
    user_id, evicted on close — identical bound to the old API — and the
    RocksDB state store this API requires keeps large state off-heap and
    incrementally checkpointed, the 1000-executor configuration.

    Sets ``spark.sql.streaming.stateStore.providerClass`` to RocksDB on
    the session (required by transformWithState; applies to newly
    started queries, and fresh checkpoints only).

    Environment gate: the transformWithState Python worker speaks
    protobuf to the JVM state server (``StateMessage_pb2``), so this
    raises ``ImportError`` up front when ``google.protobuf`` is absent
    (as in this test container) instead of crashing the worker at start.
    :func:`sessionize_stateful` is the everywhere-runnable equivalent.
    """
    ok, why = transform_with_state_available()
    if not ok:
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            f"(pyspark.sql.streaming.proto worker protocol): {why}; use "
            "sessionize_stateful (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    gap = gap_seconds
    cols = ["user_id", "session_start", "session_end", "n_events"]

    class Sessionizer(StatefulProcessor):
        # self-contained: stdlib + pandas only, workers never import the
        # engine package
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.session = handle.getValueState(
                "session", "start timestamp, last timestamp, n long"
            )

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            import pandas as _pd

            ts_list = []
            for pdf in rows:
                ts_list.extend(_pd.to_datetime(pdf["ts"]).dt.to_pydatetime())
            ts_list.sort()
            if not ts_list:
                return
            if self.session.exists():
                start, last, n = self.session.get()
            else:
                start, last, n = ts_list[0], ts_list[0], 0
            out = []
            for ts in ts_list:
                if (ts - last).total_seconds() > gap:
                    out.append((key[0], start, last, n))
                    start, n = ts, 0
                last = ts if ts > last else last
                n += 1
            self.session.update((start, last, n))
            # one live timer per key: drop stale ones, arm at last + gap
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            self.handle.registerTimer(int(last.timestamp() * 1000) + gap * 1000)
            if out:
                yield _pd.DataFrame(out, columns=cols)

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ):
            import pandas as _pd

            if self.session.exists():
                start, last, n = self.session.get()
                self.session.clear()
                yield _pd.DataFrame([(key[0], start, last, n)], columns=cols)

        def close(self) -> None:
            pass

    spark = events.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            Sessionizer(),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )


def foreach_batch_upsert(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    order_by: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming MERGE sink: each micro-batch is upserted into a parquet
    target with the engine's join-based merge (J1) — batch and streaming
    share one merge implementation, and per-key last-writer-wins makes
    epoch replay after a failure idempotent (ST7).

    Writes via overwrite-to-tmp + atomic-ish swap is unnecessary here:
    foreachBatch re-runs the whole epoch on failure, and the merge is
    idempotent, so a torn write is repaired by the retry. Returns the
    started StreamingQuery.
    """
    spark = stream.sparkSession

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        if os.path.exists(target_path):
            target = spark.read.parquet(target_path)
            merged = merge_upsert(target, batch, keys=keys, order_by=order_by)
        else:
            from ..operators.merge import dedup_last_writer_wins

            merged = dedup_last_writer_wins(batch, keys, order_by)
        # Two-step write: merged reads from target_path, so a direct
        # overwrite would clobber its own input mid-scan.
        tmp = target_path + f".epoch-{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(target_path)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    writer = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def foreach_batch_upsert_versioned(
    stream: DataFrame,
    table_root: str,
    keys: list[str],
    order_by: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming MERGE into the txn-log versioned table (io/table.py):
    each micro-batch commits a NEW immutable snapshot published by an
    atomic log append — no tmp-dir swap dance, readers never see a torn
    epoch, and every epoch is a time-travelable version. Replay after a
    failure re-merges idempotently (last-writer-wins), so a re-run epoch
    commits a snapshot with identical content (ST5-ST7 + §2.3 J1 on the
    lakehouse storage layer).
    """
    from ..io.table import VersionedParquetTable
    from ..operators.merge import dedup_last_writer_wins

    spark = stream.sparkSession

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        table = VersionedParquetTable(spark, table_root)
        if table.exists():
            merged = merge_upsert(
                table.read(), batch, keys=keys, order_by=order_by
            )
        else:
            merged = dedup_last_writer_wins(batch, keys, order_by)
        table.commit(merged, action=f"stream-epoch-{epoch_id}")

    writer = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (ST10): right-side events within
    ``(left_ts, left_ts + upper]`` of a left event with the same key —
    the click→conversion attribution shape. Both sides carry watermarks
    and the time-range condition bounds join state: rows older than
    watermark − upper are evicted (without the range condition a
    stream-stream join's state grows forever).

    ``how="leftOuter"`` additionally emits null-padded left rows once
    state eviction proves no future match can arrive — i.e. when the
    global watermark (min across both streams) passes
    left_ts + upper.
    """
    l = left.withWatermark(left_ts, watermark).select(
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]
    )
    r = right.withWatermark(right_ts, watermark).select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    lts, rts = F.col(f"{left_prefix}{left_ts}"), F.col(f"{right_prefix}{right_ts}")
    cond = (
        (F.col(f"{left_prefix}{on}") == F.col(f"{right_prefix}{on}"))
        & (rts > lts)
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how)


MG_OUTPUT_SCHEMA = "bucket long, tok string, upper_cnt long"
MG_STATE_SCHEMA = "toks array<string>, cnts array<long>, n_seen long"


def streaming_mg_candidates(
    toks: DataFrame, k_per_bucket: int = 16, n_buckets: int = 8
) -> DataFrame:
    """Bucket-keyed Misra-Gries candidate sketch on a token STREAM —
    the streaming half of operators/frequent.py's candidate/verify
    heavy-hitter plan. Tokens hash into ``n_buckets`` state keys; each
    key holds at most ``k_per_bucket`` MG counters (arrays in
    GroupState), so total state is O(buckets·k) regardless of
    vocabulary size — the property that lets the sketch run forever on
    an unbounded stream. Each micro-batch emits the bucket's CURRENT
    candidate set (upper-bound counts); an exact offline recount of the
    candidate union finishes the job (the stream only prunes, never
    decides — MG's superset guarantee survives batching because the
    batched decrement preserves the MG invariant).

    Input: a streaming DataFrame with one ``tok`` string column.
    """
    k = int(k_per_bucket)

    def fn(key, pdfs, state):
        import pandas as _pd

        bucket = key[0]
        counts: dict = {}
        if state.exists:
            toks_s, cnts_s, n_seen = state.get
            counts = dict(zip(toks_s, cnts_s))
        else:
            n_seen = 0
        for pdf in pdfs:
            s = pdf["tok"].dropna()
            n_seen += len(s)
            vc = s.value_counts()
            for t, c in vc.items():
                counts[t] = counts.get(t, 0) + int(c)
            if len(counts) > k:
                kth = sorted(counts.values(), reverse=True)[k]
                counts = {t: c - kth for t, c in counts.items() if c > kth}
        state.update((list(counts), [int(c) for c in counts.values()], int(n_seen)))
        if counts:
            yield _pd.DataFrame(
                {
                    "bucket": [bucket] * len(counts),
                    "tok": list(counts),
                    "upper_cnt": [int(c) for c in counts.values()],
                }
            )

    from pyspark.sql import functions as F

    bucketed = toks.withColumn(
        "bucket", F.pmod(F.xxhash64("tok"), F.lit(n_buckets)).cast("long")
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
