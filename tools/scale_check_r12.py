#!/usr/bin/env python3
"""Round-12 scale proof-points for the manifest format.

1. **Parquet codec write throughput** (VERDICT r11 item 1): 1M rows
   x 5 columns landed through the JSON Arrow path vs the parquet
   codec; report both rates, the speedup, and the on-disk bytes.

2. **Parquet codec scan throughput**: full-row scan and a
   SELECTIVE-COLUMN scan (1 of 5 columns, aggregated) on the same
   table under both codecs. The JSON codec must decode every column
   either way; the parquet codec's selective scan should show the
   column-pruning win — the structural 100-TB argument for the codec.

3. **Selective predicate scan**: a clustered-key range filter on both
   codecs (file-level pruning identical — stats parity — parquet adds
   row-group stats + vectorized decode inside the admitted shards).

4. **DML single-decode on parquet** : a predicate UPDATE on a
   range-clustered parquet table — persist receipt + codec carried.

Usage: python tools/scale_check_r12.py
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
        SparkSession.builder.master("local[8]")
        .appName("scale_check_r12")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _dir_bytes(path: str) -> int:
    total = 0
    for dp, _dn, fns in os.walk(path):
        for fn in fns:
            total += os.path.getsize(os.path.join(dp, fn))
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.sources import manifest_sink as MS

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    MS.register(spark)
    n = 1_000_000
    base = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).alias("g"),
            # a FAT payload column (~200 B): the selective-column scan
            # comparison needs decode cost to dominate scheduling, and
            # the 100-TB case this models is exactly a wide table read
            # for a narrow projection
            F.concat(
                F.lit("payload-"),
                F.col("id"),
                F.lit("-"),
                F.repeat(F.lit("x"), 180),
            ).alias("s"),
            (F.col("id") * 1.5).alias("f"),
            F.to_timestamp(
                F.from_unixtime(F.lit(1_700_000_000) + F.col("id") % 86400)
            ).alias("ts"),
        )
        .repartitionByRange(16, "k")
        .persist()
    )
    base.count()
    out = {}
    paths = {}
    for codec in ("jsonl", "parquet"):
        p = tempfile.mkdtemp(prefix=f"r12_{codec}_")
        paths[codec] = p
        t0 = time.time()
        (
            base.write.format(MS.FORMAT_NAME)
            .option("path", p)
            .option("shard_format", codec)
            .mode("append")
            .save()
        )
        dt = time.time() - t0
        out[f"write_{codec}_sec"] = round(dt, 2)
        out[f"write_{codec}_rows_per_sec"] = int(n / dt)
        out[f"bytes_{codec}"] = _dir_bytes(os.path.join(p, "shards"))
    out["write_speedup_parquet"] = round(
        out["write_jsonl_sec"] / out["write_parquet_sec"], 2
    )

    # 2. scans: full-row (every column decoded and consumed) vs
    # selective-column (sum of one numeric col — parquet reads only
    # that column's pages; JSON must decode the fat payload anyway)
    for codec in ("jsonl", "parquet"):
        df = MS.read_manifest(spark, paths[codec])
        t0 = time.time()
        df.agg(
            F.sum("k"), F.sum("g"), F.sum(F.length("s")), F.sum("f"),
            F.max("ts"),
        ).collect()
        out[f"scan_full_{codec}_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        df2 = MS.read_manifest(spark, paths[codec])
        df2.agg(F.sum("f")).collect()
        out[f"scan_1col_{codec}_sec"] = round(time.time() - t0, 2)
    out["scan_1col_speedup_parquet"] = round(
        out["scan_1col_jsonl_sec"] / out["scan_1col_parquet_sec"], 2
    )

    # 3. clustered range predicate: file pruning parity + decode cost
    for codec in ("jsonl", "parquet"):
        man = MS.read_manifest_dict(paths[codec])
        kept, total = MS.prune_shards(man, prune={"k": (100_000, 101_000)})
        t0 = time.time()
        got = (
            MS.read_manifest(
                spark, paths[codec], prune={"k": (100_000, 101_000)}
            )
            .filter("k between 100000 and 101000")
            .count()
        )
        assert got == 1001
        out[f"pred_{codec}_sec"] = round(time.time() - t0, 2)
        out[f"pred_{codec}_shards"] = f"{len(kept)}/{total}"

    # 4. UPDATE WHERE on the parquet table: scoped rewrite, codec kept
    t0 = time.time()
    man2, n_upd = MS.update_where(
        spark,
        paths["parquet"],
        "k long, g long, s string, f double, ts timestamp",
        "k between 200000 and 200099",
        {"f": "f * 2"},
        prune={"k": (200_000, 200_099)},
    )
    out["update_parquet_sec"] = round(time.time() - t0, 2)
    out["update_parquet_rows"] = n_upd
    out["update_parquet_codec_kept"] = all(
        s["file"].endswith(".parquet") for s in man2["shards"]
    )

    # 5. deletion vectors vs copy-on-write for a NARROW delete: the
    # dv path writes O(matched rows) of positions + one metadata
    # commit; the rewrite path re-encodes the whole admitted shard
    t0 = time.time()
    man2, n_dv = MS.delete_where(
        spark,
        paths["parquet"],
        "k long, g long, s string, f double, ts timestamp",
        "k % 200000 = 11",
        mode="dv",
    )
    out["dv_delete_sec"] = round(time.time() - t0, 2)
    out["dv_delete_rows"] = n_dv
    out["dv_shards_rewritten"] = 0  # by construction; entries unchanged
    t0 = time.time()
    _man3, n_cow = MS.delete_where(
        spark,
        paths["parquet"],
        "k long, g long, s string, f double, ts timestamp",
        "k % 200000 = 13",
    )
    out["cow_delete_sec"] = round(time.time() - t0, 2)
    out["cow_delete_rows"] = n_cow
    out["dv_vs_cow_speedup"] = round(
        out["cow_delete_sec"] / max(out["dv_delete_sec"], 0.01), 2
    )

    print(json.dumps(out, indent=2))
    for p in paths.values():
        shutil.rmtree(p, ignore_errors=True)
    base.unpersist()


if __name__ == "__main__":
    main()
