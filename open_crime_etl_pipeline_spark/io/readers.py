"""Source readers — parquet (primary) and gzip-JSON crime pages.

Every read declares its schema (schemas.py) so the scan does zero
inference work; with parquet, Catalyst pushes filters and prunes
columns at the scan (verify via ``.explain``: ``PushedFilters`` /
``ReadSchema``).

Reference parity: the gzip-JSON page scan is the Spark equivalent of
the reference's ``gzip.open`` → ``json.load`` loader
(`airflow/dags/crimeapi/load.py:49-60`); ``spark.read.json`` handles
``.gz`` and hive-partitioned directories (`year=/month=/load_date=`)
transparently, replacing the regex key filter
(`airflow/dags/crimeapi/utils/helper.py:21-39`) with partition pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import CRIME_RAW_SCHEMA, TESTDATA_SCHEMAS


def _ns_long_fields(schema: T.StructType, parquet_path: str) -> set[str]:
    """Names of TimestampType fields stored as TIMESTAMP(NANOS) in the
    parquet footer (Spark reads those as long nanos under
    ``spark.sql.legacy.parquet.nanosAsLong``)."""
    try:
        import pyarrow.parquet as pq

        path = parquet_path
        if os.path.isdir(path):
            inner = [f for f in os.listdir(path) if f.endswith(".parquet")]
            if not inner:
                return set()
            path = os.path.join(path, inner[0])
        arrow_schema = pq.read_schema(path)
    except Exception:
        return set()
    out = set()
    for field in arrow_schema:
        if str(field.type) == "timestamp[ns]":
            out.add(field.name)
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with its declared schema.

    Timestamp columns physically stored as nanosecond parquet are read
    as longs and converted to ``TimestampType`` (µs precision) here, so
    downstream operators always see the declared schema.
    """
    schema = TESTDATA_SCHEMAS[name]
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_fields = _ns_long_fields(schema, path)
    if not ns_fields:
        return spark.read.schema(schema).parquet(path)

    read_schema = T.StructType([
        T.StructField(f.name, T.LongType() if f.name in ns_fields else f.dataType, f.nullable)
        for f in schema.fields
    ])
    df = spark.read.schema(read_schema).parquet(path)
    for col in ns_fields:
        # integer `div`: float division of ~1e18 ns rounds and corrupts µs
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df.select(*[f.name for f in schema.fields])


def load_tables(spark: SparkSession, sf_dir: str, names=None) -> dict[str, DataFrame]:
    names = list(names) if names is not None else list(TESTDATA_SCHEMAS)
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_testdata_views(spark: SparkSession, sf_dir: str, names=None) -> None:
    """Register each testdata table as a temp view for ``spark.sql``."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


CORRUPT_COL = "_corrupt_record"


def read_crime_pages(
    spark: SparkSession, path: str, capture_corrupt: bool = False
) -> DataFrame:
    """Scan a landing zone of gzip-JSON crime pages with the explicit
    raw schema (reference loader: load.py:49-60; layout helper.py:67-86).

    ``path`` may be a flat directory of ``part-*.json.gz`` or the
    hive-partitioned ``raw/year=/month=/load_date=`` tree — partition
    columns are discovered and usable as pruning predicates.

    With ``capture_corrupt=True`` the scan appends a ``_corrupt_record``
    column holding the raw text of any unparseable record instead of
    silently producing an all-null row — quarantine-not-crash semantics
    for a landing zone fed by an external API. Use :func:`split_corrupt`
    to separate the streams.
    """
    if not capture_corrupt:
        return spark.read.schema(CRIME_RAW_SCHEMA).json(path)
    schema = T.StructType(
        list(CRIME_RAW_SCHEMA.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame, corrupt_col: str = CORRUPT_COL):
    """Split a corrupt-capturing scan into (good, quarantine) frames.

    Spark refuses a filter that references only the corrupt column of
    a raw JSON scan (it would force a second parse with different
    semantics — SPARK-21610); the documented contract is to cache the
    parsed frame first, which also means the landing files are read
    once, not twice.
    """
    df = df.cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad
