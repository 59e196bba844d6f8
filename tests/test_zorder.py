"""Z-order keys (operators/zorder.py): exact interleave vs a Python
reference, out-of-range guard, and the locality property that makes
the layout prune — a 2-D rectangle touches far fewer zkey-range
buckets than x-major ordering when the predicate is selective on y."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from open_crime_etl_pipeline_spark.operators.zorder import morton_key, morton_sql


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    k = 0
    for i in range(bits):
        k |= ((x >> i) & 1) << (2 * i)
        k |= ((y >> i) & 1) << (2 * i + 1)
    return k


def test_morton_matches_python_reference(spark):
    pts = [(i * 131 % 60000, i * 257 % 60000) for i in range(300)]
    pts += [(0, 0), (65535, 65535), (1, 0), (0, 1), (65535, 0)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["k"]
        for r in df.select(
            "x", "y", morton_key(F.col("x"), F.col("y")).alias("k")
        ).collect()
    }
    assert got == {(x, y): _py_morton(x, y) for x, y in set(pts)}


def test_morton_sql_states_identical_arithmetic():
    import duckdb

    con = duckdb.connect()
    expr = morton_sql("x", "y", bits=16)
    rows = con.execute(
        f"SELECT x, y, {expr} AS k FROM (VALUES (3, 5), (65535, 1), (1024, 4097)) t(x, y)"
    ).fetchall()
    assert all(k == _py_morton(x, y) for x, y, k in rows)


def test_morton_out_of_range_raises(spark):
    df = spark.createDataFrame([(1 << 16, 1)], "x long, y long")
    with pytest.raises(Exception, match="morton_key|USER_RAISED"):
        df.select(morton_key(F.col("x"), F.col("y"), bits=16)).collect()


def test_zorder_locality_beats_x_major_for_y_selective_rectangle(spark):
    # full 128x128 grid; predicate selective on y only (y in [40, 43]).
    # x-major layout (key = x*128 + y) spreads the matches across EVERY
    # x stripe -> every bucket touched; z-order keeps them in the few
    # buckets whose y bits fit -> min-max pruning has something to skip
    grid = spark.range(128 * 128).select(
        (F.col("id") / 128).cast("long").alias("x"),
        (F.col("id") % 128).cast("long").alias("y"),
    )
    match = F.col("y").between(40, 43)
    n_buckets = 64

    def touched(key_col):
        bucketed = grid.select(
            (key_col / F.lit((128 * 128) // n_buckets)).cast("long").alias("b"),
            match.alias("m"),
        )
        rows = bucketed.groupBy("b").agg(F.max("m").alias("t")).collect()
        assert len(rows) == n_buckets  # uniform grid fills every bucket
        return sum(1 for r in rows if r["t"])

    t_x = touched(F.col("x") * 128 + F.col("y"))
    t_z = touched(morton_key(F.col("x"), F.col("y"), bits=7))
    assert t_x == n_buckets  # x-major: no pruning possible
    assert t_z <= n_buckets // 2  # z-order: most buckets skippable
