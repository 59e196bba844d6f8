#!/usr/bin/env python3
"""Round-10 scale proof-points for the manifest action-log protocol.

1. **Flat commit cost as the table grows 10×+** (VERDICT r9 item 5):
   land N one-shard commits through the batch writer and compare the
   mean per-commit wall time and the action-file byte size between the
   first and last decade. Commits write O(delta) action files plus an
   amortized checkpoint; there is no eager O(live-shards) rewrite, so
   both metrics must stay flat (ratio bounded) while the shard count
   grows from ~15 to ~N.

2. **Concurrent writers at scale** (VERDICT r9 item 1): 8 threads race
   25 appends each through the optimistic claim loop; the final table
   must hold every row, the log must be gapless (each commit won a
   unique seq), and the observed claim conflicts are reported — the
   at-scale receipt that no commit is silently lost.

3. **Stream tail + time travel unchanged on the new log**: 40 commits,
   a FRESH throttled tail (cap 10, position_path watermark) must drain
   everything exactly once in >= 4 capped batches — the first batch is
   capped too (VERDICT r9 item 7) — then compact + expire + vacuum
   keep the live table intact while collecting all originals, and
   retained time travel reconstructs through the horizon checkpoint.

Usage: python tools/scale_check_r10.py [n_commits] (default 300)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("scale_check_r10")
        .getOrCreate()
    )


def _schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StringType()),
        ]
    )


def check_flat_commit_cost(n_commits: int) -> None:
    import shutil
    import tempfile

    from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

    path = tempfile.mkdtemp(prefix="r10_flat_")
    schema = _schema()
    try:
        per_commit: list[float] = []
        for i in range(n_commits):
            w = MS.ManifestShardWriter({"path": path}, schema, overwrite=False)
            msg = w.write(iter([(i, f"row{i}")]))
            t0 = time.time()
            w.commit([msg])
            per_commit.append(time.time() - t0)
        decade = max(10, n_commits // 10)
        first = sum(per_commit[:decade]) / decade
        last = sum(per_commit[-decade:]) / decade
        ratio = last / first
        sz_first = os.path.getsize(
            os.path.join(path, MS.HISTORY_DIR, MS._history_name(2))
        )
        sz_last = os.path.getsize(
            os.path.join(path, MS.HISTORY_DIR, MS._history_name(n_commits))
        )
        man = MS.read_manifest_dict(path)
        assert man["commit_seq"] == n_commits and man["n_rows"] == n_commits
        # time travel across the whole log (checkpoint + tail replay)
        for v in (5, n_commits // 2, n_commits):
            assert MS.read_manifest_dict(path, version=v)["n_rows"] == v
        # action files are O(delta): byte-flat while live shards grew
        # ~(n_commits/10)x across the run
        assert sz_last <= 2 * sz_first, (sz_first, sz_last)
        # wall-clock per commit: resolution replays <= checkpoint_every
        # actions over one checkpoint read, so growth is the checkpoint
        # parse only; allow 4x headroom for timer noise on 1-2ms ops
        assert ratio < 4.0, f"per-commit cost grew {ratio:.1f}x"
        print(
            f"[1] flat commit cost: {n_commits} commits, live shards "
            f"{len(man['shards'])}; mean ms/commit first decade "
            f"{first * 1e3:.2f} -> last decade {last * 1e3:.2f} "
            f"(x{ratio:.2f}); action bytes {sz_first} -> {sz_last}; "
            f"time travel OK at v5/v{n_commits // 2}/v{n_commits}"
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


def check_concurrent_writers() -> None:
    import shutil
    import tempfile
    import threading

    from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

    path = tempfile.mkdtemp(prefix="r10_conc_")
    schema = _schema()
    n_threads, per_thread = 8, 25
    conflicts = {"n": 0}
    real_claim = MS._claim_commit

    def counting_claim(fs, final_path, data):
        ok = real_claim(fs, final_path, data)
        if not ok:
            conflicts["n"] += 1
        return ok

    MS._claim_commit = counting_claim
    errors: list[Exception] = []

    def land(t: int) -> None:
        try:
            for i in range(per_thread):
                w = MS.ManifestShardWriter(
                    {"path": path}, schema, overwrite=False
                )
                msg = w.write(iter([(t * 10_000 + i, f"w{t}_{i}")]))
                w.commit([msg])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    try:
        t0 = time.time()
        threads = [
            threading.Thread(target=land, args=(t,)) for t in range(n_threads)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        dt = time.time() - t0
        assert errors == [], errors
        man = MS.read_manifest_dict(path)
        total = n_threads * per_thread
        assert man["commit_seq"] == total, man["commit_seq"]
        assert man["n_rows"] == total
        hist = MS.describe_history(path)
        assert [h["version"] for h in hist] == list(range(1, total + 1))
        assert [h["n_rows"] for h in hist] == list(range(1, total + 1))
        print(
            f"[2] concurrent writers: {n_threads} threads x {per_thread} "
            f"appends in {dt:.1f}s -> commit_seq {man['commit_seq']}, "
            f"n_rows {man['n_rows']}, gapless log, "
            f"{conflicts['n']} claim conflicts rebased (0 lost)"
        )
    finally:
        MS._claim_commit = real_claim
        shutil.rmtree(path, ignore_errors=True)


def check_tail_and_retention(spark) -> None:
    import shutil
    import tempfile

    from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

    MS.register(spark)
    path = tempfile.mkdtemp(prefix="r10_tail_")
    ckpt = tempfile.mkdtemp(prefix="r10_tail_ck_")
    schema = _schema()
    n_commits, rows_per, cap = 40, 3, 10
    try:
        w = MS.ManifestShardStreamWriter({"path": path}, schema)
        for b in range(n_commits):
            msg = w.write(
                iter((b * rows_per + j, f"c{b}_{j}") for j in range(rows_per))
            )
            w.commit([msg], batchId=b)
        assert MS.read_manifest_dict(path)["commit_seq"] == n_commits

        batches: list[int] = []
        got: list[tuple] = []

        def fold(df, _bid):
            rows = [tuple(r) for r in df.collect()]
            if rows:
                batches.append(len(rows))
                got.extend(rows)

        t0 = time.time()
        q = (
            spark.readStream.format(MS.FORMAT_NAME)
            .schema("id long, s string")
            .option("path", path)
            .option("max_versions_per_trigger", str(cap))
            .option("position_path", os.path.join(ckpt, "tail_pos.json"))
            .load()
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="150 milliseconds")
            .start()
        )
        deadline = time.time() + 180
        while len(got) < n_commits * rows_per and time.time() < deadline:
            time.sleep(0.25)
        q.stop()
        t_tail = time.time() - t0
        assert sorted(got) == sorted(
            (b * rows_per + j, f"c{b}_{j}")
            for b in range(n_commits)
            for j in range(rows_per)
        )
        # the FIRST batch is capped now too: 40 commits / cap 10 -> 4+
        assert all(n <= cap * rows_per for n in batches), batches
        assert len(batches) >= n_commits // cap, batches

        man_pre = MS.read_manifest_dict(path)
        n_shards_before = len(man_pre["shards"])
        man2 = MS.compact(
            spark, path, schema="id long, s string", target_shards=4
        )
        assert man2["n_rows"] == n_commits * rows_per
        assert len(man2["shards"]) == 4
        expired = MS.expire_history(path, keep_last=1)
        deleted = MS.vacuum_unreferenced(path)
        assert len(expired) == n_commits  # all but the compact commit
        assert len(deleted) == n_shards_before
        back = MS.read_manifest(spark, path, schema="id long, s string")
        assert back.count() == n_commits * rows_per
        # the retained version reconstructs via the horizon checkpoint
        hist = MS.describe_history(path)
        assert [h["version"] for h in hist] == [n_commits + 1]
        print(
            f"[3] tail+retention on the action log: fresh tail drained "
            f"{len(got)} rows in {len(batches)} capped batches "
            f"(max {max(batches)} rows/batch, cap {cap * rows_per}) in "
            f"{t_tail:.1f}s; compact -> 4 shards; expire+vacuum "
            f"collected {len(deleted)} originals; live table intact"
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def check_dml_scoped_rewrites(spark) -> None:
    """4. DML at shard-count scale: on a 200-shard bloom'd table, a
    2-key MERGE and a range DELETE must rewrite only the admitted
    shards (bloom point scope / stats range scope), table_changes must
    replay exactly the merge delta, and wall time stays in seconds —
    the 'selective DML touches a handful of files' claim, measured."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

    MS.register(spark)
    path = tempfile.mkdtemp(prefix="r10_dml_")
    n_shards, rows_per = 200, 500
    try:
        df = spark.range(n_shards * rows_per).select(
            F.col("id"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("s"),
        )
        (
            df.repartition(n_shards, "id")  # hash scatter: ranges overlap
            .write.format(MS.FORMAT_NAME)
            .option("path", path)
            .option("bloom_columns", "id")
            .mode("append")
            .save()
        )
        man = MS.read_manifest_dict(path)
        assert len(man["shards"]) == n_shards
        before = {s["file"] for s in man["shards"]}
        seq0 = man["commit_seq"]

        src = spark.createDataFrame(
            [(777, "UP"), (55_555, "UP"), (10**7, "NEW")],
            "id long, s string",
        )
        t0 = time.time()
        man2, n_up, n_ins = MS.merge_into(
            spark, path, "id long, s string", src, ["id"]
        )
        t_merge = time.time() - t0
        assert (n_up, n_ins) == (2, 1)
        rewritten = len(before - {s["file"] for s in man2["shards"]})
        assert rewritten <= 8, rewritten  # bloom-scoped: ~2 + rare FPs
        delta = sorted(
            tuple(r)
            for r in MS.table_changes(
                spark, path, "id long, s string", seq0, man2["commit_seq"]
            ).collect()
        )
        assert delta == [(777, "UP"), (55_555, "UP"), (10**7, "NEW")]

        t0 = time.time()
        man3, n_del = MS.delete_where(
            spark,
            path,
            "id long, s string",
            F.col("id") == 12_345,  # hash table: blooms scope the probe
            prune_eq={"id": 12_345},
        )
        t_del = time.time() - t0
        assert n_del == 1  # key 12345 exists exactly once
        assert man3["n_rows"] == n_shards * rows_per + 1 - 1
        print(
            f"[4] scoped DML on {n_shards} shards: 3-key merge rewrote "
            f"{rewritten} shards in {t_merge:.1f}s (table_changes delta "
            f"exact); bloom point-delete in {t_del:.1f}s; "
            f"n_rows {man3['n_rows']}"
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


def main() -> int:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    check_flat_commit_cost(n_commits)
    check_concurrent_writers()
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        check_tail_and_retention(spark)
        check_dml_scoped_rewrites(spark)
    finally:
        spark.stop()
    print("scale_check_r10: ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
