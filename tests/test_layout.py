"""Range-clustered parquet layout: per-file min/max stats must be
narrow and mostly disjoint (that's what lets a range filter skip whole
files at scale), versus unclustered writes where every file spans the
full key range and stats prune nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.io.layout import file_key_ranges, write_range_clustered
from open_crime_etl_pipeline_spark.io.readers import load_table


def _overlap_fraction(ranges):
    """Fraction of file pairs whose [min, max] ranges overlap."""
    pairs = [
        (a, b)
        for i, a in enumerate(ranges)
        for b in ranges[i + 1:]
    ]
    overlapping = sum(1 for a, b in pairs if a[0] <= b[1] and b[0] <= a[1])
    return overlapping / len(pairs) if pairs else 0.0


def test_range_clustered_files_are_disjoint(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    clustered = str(tmp_path / "clustered")
    write_range_clustered(orders, clustered, keys=["o_orderkey"], n_files=8)
    ranges = file_key_ranges(clustered, "o_orderkey")
    assert len(ranges) >= 2
    # sampled range boundaries are contiguous: at most neighboring
    # files may share a boundary value, so overlap stays near zero
    assert _overlap_fraction(ranges) <= 0.1

    # control: a random shuffle leaves every file spanning ~everything
    unclustered = str(tmp_path / "unclustered")
    orders.repartition(8).write.parquet(unclustered)
    assert _overlap_fraction(file_key_ranges(unclustered, "o_orderkey")) >= 0.9

    # layout changes bytes on disk, never rows
    back = spark.read.parquet(clustered)
    assert back.count() == orders.count()
    assert back.agg(F.sum("o_orderkey")).first()[0] == \
        orders.agg(F.sum("o_orderkey")).first()[0]


def test_file_key_ranges_reads_footers_only(spark, sf_dir, tmp_path):
    path = str(tmp_path / "c2")
    write_range_clustered(
        load_table(spark, sf_dir, "orders").select("o_orderkey"),
        path, keys=["o_orderkey"], n_files=4,
    )
    ranges = file_key_ranges(path, "o_orderkey")
    lo = min(r[0] for r in ranges)
    hi = max(r[1] for r in ranges)
    row = (
        load_table(spark, sf_dir, "orders")
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .first()
    )
    assert (lo, hi) == (row.lo, row.hi)


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    from open_crime_etl_pipeline_spark.io.layout import compact

    src = str(tmp_path / "small_files")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(40).write.parquet(src)
    import os

    n_small = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_small == 40
    total = sum(
        e.stat().st_size for e in os.scandir(src) if e.name.endswith(".parquet")
    )
    dst = str(tmp_path / "compacted")
    n = compact(spark, src, dst, target_file_bytes=total // 3)
    n_out = sum(1 for f in os.listdir(dst) if f.endswith(".parquet"))
    assert n_out == n <= 4  # ~3 target-size files instead of 40 shards
    assert spark.read.parquet(dst).count() == orders.count()


def _skip_fraction(ranges, lo, hi):
    """Fraction of files a [lo, hi] predicate skips on footer stats."""
    return sum(1 for mn, mx in ranges if mx < lo or mn > hi) / len(ranges)


def test_zorder_skips_on_both_columns(spark, tmp_path):
    """A 64x64 uniform grid written as 16 Z-ordered files: each file
    covers a 2D tile, so a narrow predicate on EITHER column skips most
    files — while range clustering on x alone prunes nothing for y."""
    from open_crime_etl_pipeline_spark.io.layout import write_zorder_clustered

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zpath = str(tmp_path / "zorder")
    write_zorder_clustered(grid, zpath, keys=["x", "y"], n_files=16, bits=6)
    zx, zy = file_key_ranges(zpath, "x"), file_key_ranges(zpath, "y")
    assert len(zx) == 16
    # an 8-wide slice (1/8 of either axis) must skip >= half the files
    assert _skip_fraction(zx, 0, 7) >= 0.5
    assert _skip_fraction(zy, 0, 7) >= 0.5

    rpath = str(tmp_path / "range_x")
    write_range_clustered(grid, rpath, keys=["x"], n_files=16)
    rx, ry = file_key_ranges(rpath, "x"), file_key_ranges(rpath, "y")
    assert _skip_fraction(rx, 0, 7) >= 0.5   # leading key prunes
    assert _skip_fraction(ry, 0, 7) == 0.0   # second column prunes nothing

    # layout changes bytes, never rows
    back = spark.read.parquet(zpath)
    assert back.count() == 64 * 64
    assert back.agg(F.sum("x"), F.sum("y")).first() == \
        grid.agg(F.sum("x"), F.sum("y")).first()
