"""Range-clustered parquet layout for data skipping.

At 100 TB, a filter like ``l_shipdate BETWEEN x AND y`` is only cheap
if most files never get read. Parquet stores per-column min/max stats
per file and row group; if the data is range-clustered on the filter
column — ``repartitionByRange`` (global sort boundaries via sampling)
plus ``sortWithinPartitions`` — each file covers a narrow, mostly
disjoint key range and the scan's pushed predicate eliminates whole
files/row-groups from the read. Unclustered data has every file
spanning the full key range, so stats prune nothing and the "pushed"
filter still reads 100% of the bytes.

This is the same storage idea the bucketed layout applies to equi-join
keys (io/bucketed.py), pointed at range predicates instead — the Spark
expression of clustering/Z-ordering in lakehouse engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_range_clustered(
    df: DataFrame,
    path: str,
    keys: list[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-clustered on ``keys``: rows are
    range-partitioned into ``n_files`` contiguous key ranges (sampled
    boundaries) and sorted within each, so per-file min/max stats are
    narrow and filters on ``keys`` skip non-matching files entirely."""
    (
        df.repartitionByRange(n_files, *keys)
        .sortWithinPartitions(*keys)
        .write.mode(mode)
        .parquet(path)
    )


def compact(spark, src: str, dst: str, target_file_bytes: int = 128 << 20) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    Streaming/incremental sinks accrete small files; at scale the
    file-listing and per-file open cost starts to dominate scans. This
    sizes the output from the actual bytes on disk (``ceil(total /
    target)``) and round-robin repartitions to balance file sizes.
    Writes to a NEW directory — atomically swapping a directory is the
    table format's job (the txn-log snapshot publish in
    ``io/table.py``), not a filesystem rename race. Returns the file
    count written."""
    import math
    import os

    total = sum(
        e.stat().st_size
        for e in os.scandir(src)
        if e.is_file() and e.name.endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src).repartition(n).write.mode("error").parquet(dst)
    return n


def file_key_ranges(path: str, key: str) -> list[tuple[object, object]]:
    """Per-file (min, max) of ``key`` from the parquet footers — the
    stats a reader prunes with. Driver-side helper for tests/audits
    (footer reads only; never touches row data)."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        col_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[key]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(col_idx).statistics
            if stats is None or not stats.has_min_max:
                return []  # stats missing: no skipping possible
            mins.append(stats.min)
            maxs.append(stats.max)
        out.append((min(mins), max(maxs)))
    return out


def zorder_key(cols: list, bits: int, mins: list, maxs: list):
    """Morton (Z-order) key interleaving ``bits`` bits from each column.

    Columns are first mapped to integer grid coordinates in
    [0, 2**bits) by linear min/max scaling; ``mins``/``maxs`` are the
    REQUIRED precomputed per-column bounds (a 1-row aggregate — see
    ``write_zorder_clustered``), keeping the expression pure scan-side. Bit interleaving is a static expression tree of
    shifts/masks, fully whole-stage-codegen'd: no UDF, no shuffle of
    its own. Linear scaling assumes roughly uniform columns; for
    heavily skewed keys, rank-normalize first (bucket by quantile
    boundaries from percentile_approx) and feed the bucket ids here.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    # Morton key lives in one signed 64-bit long: bit position i*n+j must
    # stay <= 62, so bits*n <= 63. With the default bits=10 and 7+ columns
    # the shift would overflow into (or past) the sign bit and silently
    # produce a wrong key — auto-reduce bits to fit instead.
    if bits * n > 63:
        bits = 63 // n
        if bits < 1:
            raise ValueError(f"zorder_key: too many columns ({n}) for a 64-bit Morton key")
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        col = F.col(c) if isinstance(c, str) else c
        span = float(hi) - float(lo)
        if span <= 0:
            scaled.append(F.lit(0).cast("long"))
            continue
        g = ((col.cast("double") - float(lo)) / span * ((1 << bits) - 1))
        scaled.append(F.least(F.greatest(g.cast("long"), F.lit(0)),
                              F.lit((1 << bits) - 1)))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s, i).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(bit * F.lit(1 << (i * n + j)))  # bit i of col j -> position i*n + j
    return z


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    keys: list[str],
    n_files: int = 8,
    bits: int = 10,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` parquet Z-order-clustered on ``keys`` — the
    multi-column generalization of ``write_range_clustered``. Range
    clustering makes per-file stats narrow on ONE leading key; Morton
    interleaving makes them narrow on EVERY key simultaneously (each
    file covers a hyper-rectangle tile of the key space), so a filter
    on any single clustered column still skips most files. This is the
    lakehouse OPTIMIZE ZORDER BY, expressed as repartitionByRange +
    sort on the Morton key. The min/max pre-scan is one cheap 1-row
    aggregate over the keys only (column-pruned)."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(k).cast("double").alias(f"mn_{k}") for k in keys],
        *[F.max(k).cast("double").alias(f"mx_{k}") for k in keys],
    ).first()
    mins = [stats[f"mn_{k}"] for k in keys]
    maxs = [stats[f"mx_{k}"] for k in keys]
    z = zorder_key(keys, bits=bits, mins=mins, maxs=maxs)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
