#!/usr/bin/env python3
"""Round-11 scale proof-points for the manifest format.

1. **Action-log bytes stay O(delta) on TEXT tables** (VERDICT r10 item
   1): land a documents-style slice (24 KB bodies) and compare the
   action-file size with truncated string stats (default) vs
   ``stats_trunc_len=0``. The truncated file must be KB-scale and
   body-size-independent; pruning on the clustered key must be
   unchanged.

2. **Arrow write throughput** (VERDICT r10 item 2): 400k rows × 5
   columns landed through the row path vs the Arrow path (same bytes,
   pinned by test); report both rates and the speedup.

3. **MERGE single-read** (VERDICT r10 item 4): a 3-key merge on a
   200-shard bloom-indexed table — the touched-shard read is persisted
   so its four consumers parse the JSON once; report wall time
   (r10 receipt before the cache: 9.4s).

4. **UPDATE WHERE scoped rewrite** (VERDICT r10 item 3): a 100-row
   predicate UPDATE on a range-clustered 64-shard table must rewrite
   only the admitted shards; report touched/total and wall time.

5. **Metadata-only aggregates** (VERDICT r10 item 6): table_stats on
   the 200-shard table answers count/min/max/null_count in
   milliseconds with zero shard reads (no Spark job at all).

6. **Filtered stream tail** (VERDICT r10 item 5): a pruned tail over a
   range-clustered table plans a fraction of the shard partitions.

Usage: python tools/scale_check_r11.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
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
        .appName("scale_check_r11")
        .getOrCreate()
    )


def check_text_table_action_bytes(spark) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

    MS.register(spark)
    body = "lorem ipsum dolor sit amet " * 900  # ~24 KB per row
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(body), F.col("id").cast("string")).alias("text"),
    ).repartitionByRange(8, "doc_id")
    sizes = {}
    for tag, trunc in (("trunc32", "32"), ("full", "0")):
        p = tempfile.mkdtemp(prefix=f"r11_text_{tag}_")
        (
            df.write.format(MS.FORMAT_NAME).option("path", p)
            .option("stats_trunc_len", trunc).mode("append").save()
        )
        sizes[tag] = os.path.getsize(
            os.path.join(p, MS.HISTORY_DIR, MS._history_name(1))
        )
        if tag == "trunc32":
            man = MS.read_manifest_dict(p)
            kept, total = MS.prune_shards(man, {"doc_id": (100, 149)})
            print(
                f"[1] pruning under truncation: {len(kept)}/{total} shards "
                "admitted for a 50-key range"
            )
            ok_prune = len(kept) <= total // 2
        shutil.rmtree(p, ignore_errors=True)
    ratio = sizes["full"] / sizes["trunc32"]
    print(
        f"[1] action-file bytes, 8-shard text commit: truncated "
        f"{sizes['trunc32']}B vs full {sizes['full']}B (x{ratio:.0f} "
        "smaller) -> "
        + ("OK" if sizes["trunc32"] < 10_000 and ratio > 5 and ok_prune
           else "FAIL")
    )


def check_arrow_write_throughput(spark) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

    MS.register(spark)
    n = 400_000
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") * 1.5).alias("d"),
        F.concat(F.lit("user_"), F.col("id").cast("string")).alias("s"),
        F.date_add(
            F.lit("2024-01-01").cast("date"), (F.col("id") % 365).cast("int")
        ).alias("dt"),
        F.timestamp_seconds(F.col("id") % 100000 + 1700000000).alias("ts"),
    ).repartition(8).persist()
    df.count()

    def land(arrow: bool) -> float:
        best = float("inf")
        for _ in range(3):
            p = tempfile.mkdtemp(prefix="r11_wb_")
            t0 = time.time()
            (
                df.write.format(MS.FORMAT_NAME).option("path", p)
                .option("arrow_write", str(arrow).lower())
                .option("bloom_columns", "id").mode("append").save()
            )
            best = min(best, time.time() - t0)
            shutil.rmtree(p, ignore_errors=True)
        return best

    r, a = land(False), land(True)
    df.unpersist()
    print(
        f"[2] write throughput {n} rows x 5 cols (+bloom): row "
        f"{n/r/1000:.0f}k rows/s, arrow {n/a/1000:.0f}k rows/s "
        f"(x{r/a:.2f}) -> " + ("OK" if a <= r * 1.05 else "FAIL")
    )


def _land_200_shard_table(spark):
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

    MS.register(spark)
    p = tempfile.mkdtemp(prefix="r11_merge200_")
    (
        spark.range(200_000)
        .select(F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("s"))
        .repartition(200, "id")
        .write.format(MS.FORMAT_NAME).option("path", p)
        .option("bloom_columns", "id").mode("append").save()
    )
    return p


def check_merge_single_read(spark) -> None:
    from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

    p = _land_200_shard_table(spark)
    before = {s["file"] for s in MS.read_manifest_dict(p)["shards"]}
    src = spark.createDataFrame(
        [(777, "UP"), (55_321, "UP"), (500_000, "NEW")], "id long, s string"
    )
    t0 = time.time()
    man2, n_up, n_ins = MS.merge_into(
        spark, p, "id long, s string", src, ["id"]
    )
    dt = time.time() - t0
    untouched = len(before & {s["file"] for s in man2["shards"]})
    ok = n_up == 2 and n_ins == 1 and untouched >= 195
    print(
        f"[3] 3-key MERGE on 200-shard bloom table: rewrote "
        f"{200 - untouched}/200 shards, ({n_up} upd, {n_ins} ins) in "
        f"{dt:.1f}s (persisted touched-read; r10 pre-cache receipt 9.4s) "
        "-> " + ("OK" if ok else "FAIL")
    )
    # [5] metadata-only aggregates on the same 200-shard table
    t0 = time.time()
    st = MS.table_stats(p)
    ms = (time.time() - t0) * 1000
    ok5 = (
        st["n_rows"] == 200_001
        and st["columns"]["id"]["min"] == 0
        and st["columns"]["id"]["max"] == 500_000
        and st["columns"]["id"]["null_count"] == 0
    )
    print(
        f"[5] table_stats on 200 shards: count/min/max/nulls in "
        f"{ms:.0f}ms, zero shard reads (driver-only log resolve) -> "
        + ("OK" if ok5 else "FAIL")
    )
    shutil.rmtree(p, ignore_errors=True)


def check_update_scoped(spark) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

    MS.register(spark)
    p = tempfile.mkdtemp(prefix="r11_upd_")
    (
        spark.range(64_000)
        .select(F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("s"))
        .repartitionByRange(64, "id")
        .write.format(MS.FORMAT_NAME).option("path", p)
        .mode("append").save()
    )
    before = {s["file"] for s in MS.read_manifest_dict(p)["shards"]}
    t0 = time.time()
    man2, n_up = MS.update_where(
        spark, p, "id long, s string",
        F.col("id").between(10_000, 10_099),
        {"s": F.lit("UPDATED")},
        prune={"id": (10_000, 10_099)},
    )
    dt = time.time() - t0
    untouched = len(before & {s["file"] for s in man2["shards"]})
    ok = n_up == 100 and untouched >= 62 and man2["n_rows"] == 64_000
    print(
        f"[4] UPDATE WHERE on 64-shard range-clustered table: rewrote "
        f"{64 - untouched}/64 shards for a 100-row SET in {dt:.1f}s -> "
        + ("OK" if ok else "FAIL")
    )
    # [6] filtered stream tail on the same clustered table
    full = MS.ManifestShardStreamReader(None, {"path": p})
    pruned = MS.ManifestShardStreamReader(
        None, {"path": p, "prune": json.dumps({"id": [20_000, 20_999]})}
    )
    hi = {"seq": man2["commit_seq"]}
    n_full = len([x for x in full.partitions({"seq": 0}, hi) if x.shard])
    n_pruned = len([x for x in pruned.partitions({"seq": 0}, hi) if x.shard])
    print(
        f"[6] filtered fresh tail: {n_pruned}/{n_full} shard partitions "
        "planned for a 1000-key range -> "
        + ("OK" if n_pruned <= max(2, n_full // 8) else "FAIL")
    )
    shutil.rmtree(p, ignore_errors=True)


def main() -> int:
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    check_text_table_action_bytes(spark)
    check_arrow_write_throughput(spark)
    check_merge_single_read(spark)
    check_update_scoped(spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
