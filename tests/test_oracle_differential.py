"""Oracle-differential tests: every registered query with an oracle is
run on Spark and DuckDB over the same parquet and compared the way the
driver compares (row count, column names, order-insensitive values).
"""

from __future__ import annotations

import pytest

from open_crime_etl_pipeline_spark.queries import all_specs
from open_crime_etl_pipeline_spark.testing import (
    compare_frames,
    duckdb_connection,
)

_SPECS = {n: s for n, s in sorted(all_specs().items()) if s.oracle is not None}


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", list(_SPECS))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = _SPECS[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = oracle_con.execute(spec.oracle).fetchdf()
    result = compare_frames(name, spark_pdf, oracle_pdf)
    assert result.ok, result.detail


def test_all_queries_return_rows_or_valid_empty(spark, sf_dir):
    """Queries WITHOUT oracles still must run and have a stable schema.

    r13: restricted to the no-oracle specs — every oracle-backed query
    is already fully executed (toPandas) and schema-compared by
    test_query_matches_oracle above, so re-running all 269 here was
    pure duplication and the suite's single slowest item (425s of the
    43-minute wall; the round-12 driver run timed out mid-suite).
    Coverage is unchanged: the union of the two tests still executes
    every registered query."""
    for name, spec in sorted(all_specs().items()):
        if spec.oracle is not None:
            continue
        df = spec.fn(spark, sf_dir)
        assert df.columns, f"{name} produced no schema"
        df.limit(1).collect()  # must execute
