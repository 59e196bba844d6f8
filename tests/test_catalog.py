"""Catalog bootstrap (SURVEY §2.9 D1-D3): create-if-absent views,
catalog scan, idempotence."""

from __future__ import annotations

from open_crime_etl_pipeline_spark.io.catalog import ensure_views, list_table_names


def test_ensure_views_bootstrap_and_idempotence(spark, sf_dir):
    names = ["region", "nation", "customer"]
    got = ensure_views(spark, sf_dir, names)
    assert set(names) <= set(got)
    # idempotent: second call changes nothing and doesn't re-create
    again = ensure_views(spark, sf_dir, names)
    assert set(got) == set(again)
    # the views are queryable through SQL (the reference's whole point)
    assert spark.sql("SELECT count(*) n FROM region").first()["n"] == 5


def test_catalog_scan_reflects_drop(spark, sf_dir):
    ensure_views(spark, sf_dir, ["supplier"])
    assert "supplier" in list_table_names(spark)
    spark.catalog.dropTempView("supplier")
    assert "supplier" not in list_table_names(spark)
    # bootstrap restores it
    ensure_views(spark, sf_dir, ["supplier"])
    assert "supplier" in list_table_names(spark)


def test_sql_api_views_do_not_leak_across_sf_dirs(spark):
    """The SQL-API query re-registers its views per call, so invoking
    it at one sf_dir then another returns the second dir's data — a
    create-if-absent view here would silently serve stale data."""
    from open_crime_etl_pipeline_spark.queries.registry import get_spec

    spec = get_spec("sql_api_ansi_parity")
    small = spec.fn(spark, "/root/testdata/sf0.001").collect()
    big = spec.fn(spark, "/root/testdata/sf0.01").collect()
    n_small = sum(r["n_orders"] for r in small)
    n_big = sum(r["n_orders"] for r in big)
    assert n_big > n_small  # stale view would make these equal
