"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``open_crime_etl_pipeline_spark`` — this file
just adapts the engine's query registry to the driver's contract.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from open_crime_etl_pipeline_spark.queries import all_specs

SMOKE_SF_DIR = "/root/testdata/sf0.001"

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def _ship_package(spark: SparkSession) -> None:
    """Ship the engine package to executors. Pandas-UDF stages pickle
    functions by reference to this package; the grading driver runs from
    an arbitrary cwd, so workers can't import it unless we addPyFile a
    zip of the source. Idempotent per SparkContext."""
    sc = spark.sparkContext
    if getattr(sc, "_ocep_pkg_shipped", False):
        return
    pkg_root = os.path.join(_REPO_DIR, "open_crime_etl_pipeline_spark")
    zpath = os.path.join(
        tempfile.gettempdir(), f"ocep_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_root):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(dirpath, fname)
                    z.write(full, os.path.relpath(full, _REPO_DIR))
    sc.addPyFile(zpath)
    sc._ocep_pkg_shipped = True


def _configure(spark: SparkSession) -> None:
    """Session settings the engine relies on (UTC timestamps; long-nanos
    parquet reads for the events table)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; readers fall back gracefully
    try:
        # results are partition-count-invariant; 200 default partitions
        # just slows sf0.01 runs (and gives streaming ops 200 state
        # stores). AQE coalesces upward cases.
        if int(spark.conf.get("spark.sql.shuffle.partitions")) > 32:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:
        pass
    try:
        _ship_package(spark)
    except Exception:
        pass  # best-effort; only Pandas-UDF queries need it


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    spec = all_specs()["flagship_monthly_revenue"]
    return spec.fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in sorted(all_specs().items()):
        def make(fn):
            def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
                _configure(spark)
                return fn(spark, sf_dir)
            return runner
        out[name] = make(spec.fn)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in sorted(all_specs().items())
        if spec.oracle is not None
    }
