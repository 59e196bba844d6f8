"""Named query library — the driver-checked operator inventory.

Each query is registered with a ``QuerySpec``: a PySpark builder
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
ANSI-SQL oracle string DuckDB runs on the same tables. The registry
feeds ``__spark_entry__.queries()`` / ``oracle_sql()`` directly.

Submodules group the inventory (SURVEY.md §2):
    core      — scans, filters, projections, joins, aggregates (§2.1-2.4)
    analytics — window functions, sorts/top-k, cube/rollup (§2.5-2.6)
    scalars   — scalar function suite (§2.7)
    events    — event-time windows + JSON props (§2.8 ST10, F14)
    pipeline  — merge/upsert, dedup, reconciliation as queries (§2.3)
    llm       — dedup / similarity / text analysis / multimodal (§2.11)
    streaming — real readStream runs: finalized windows, stateful sessions (§2.8)
"""

from .registry import QuerySpec, all_specs, get_spec, register  # noqa: F401

# Import for side effect: each submodule registers its queries.
from . import core  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import scalars  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import profiling  # noqa: E402,F401
