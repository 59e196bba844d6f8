"""Catalog operations (SURVEY §2.9 D1-D3).

The reference bootstraps by scanning the warehouse catalog and creating
missing tables from DDL templates (`db_postgres.py:93-111`,
`crime_etl.py:53-78`). Without a metastore the engine's catalog is the
session's view registry + the lake directory layout; ``ensure_views``
is the create-if-absent bootstrap and ``spark.catalog`` the scan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..schemas import TESTDATA_SCHEMAS
from .readers import load_table


def list_table_names(spark: SparkSession) -> list[str]:
    """D2 ≡ get_tables: names currently registered in the catalog."""
    return sorted(t.name for t in spark.catalog.listTables())


def ensure_views(spark: SparkSession, sf_dir: str, names=None) -> list[str]:
    """D3 ≡ ensure-tables: register each testdata table as a view only
    if absent (reference: `if table_name not in tables: create`).
    Idempotent. Returns the catalog's table names after bootstrap."""
    wanted = list(names) if names is not None else list(TESTDATA_SCHEMAS)
    existing = {t.name for t in spark.catalog.listTables()}
    for name in wanted:
        if name not in existing:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list_table_names(spark)
