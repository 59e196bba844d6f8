"""In-flight data-quality metrics via ``DataFrame.observe`` — the
dbt-style checks (SURVEY §5 / A5-A6) collected DURING a write instead
of by a second scan.

The reference's only correctness assertions are dbt ``unique`` /
``not_null`` column tests (`schema.yml:5-21`), each of which re-reads
the table it checks. ``observe`` attaches named aggregate metrics to a
plan node: they are computed by the SAME tasks that execute the query
(a CollectMetrics node — zero extra scan, zero extra shuffle) and
surface on the driver after the action finishes. At 100 TB a
quality-gated ingest therefore costs one pass, not two.

``unique`` cannot ride observe (distinct aggregates are disallowed in
CollectMetrics — they would need a shuffle); the uniqueness check
stays a dedicated groupBy query (`dup_key_check`). Null counts, row
counts, and min/max freshness bounds ride along for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame, not_null_cols: list[str], name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count metrics. Returns the
    instrumented frame and the Observation; read ``obs.get`` AFTER an
    action has materialized the frame."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls__{c}")
        for c in not_null_cols
    ]
    return df.observe(obs, *metrics), obs


def assert_not_null(obs: Observation) -> dict:
    """Raise if any observed ``nulls__*`` metric is non-zero; returns
    the metrics dict otherwise. Call after the action."""
    got = obs.get
    bad = {k: v for k, v in got.items() if k.startswith("nulls__") and v}
    if bad:
        raise ValueError(f"not-null violation in observed write: {bad}")
    return got
