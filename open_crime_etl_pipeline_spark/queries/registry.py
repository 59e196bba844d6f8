"""Query registry: name → (spark builder, DuckDB oracle SQL).

Contract (driver, ``__spark_entry__.py``): the Spark result and the
oracle result must agree on row count, schema (column names), and an
order-insensitive value hash at sf=0.01. Columns are compared by
sorted name — every computed column is aliased identically on both
sides. Queries without an SQL-expressible oracle set ``oracle=None``
(driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a query builder under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tuple(tags))
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def get_spec(name: str) -> QuerySpec:
    return _REGISTRY[name]
