"""Z-order (Morton) keys for multi-dimensional data layout.

At 100 TB a table is pruned, not scanned: file/row-group min-max
statistics skip data the predicate can't touch. A layout sorted by ONE
column prunes that column only; interleaving the bits of several
columns into a single Morton key gives a total order in which points
close in EVERY dimension are close in the key, so range-partitioning
or sorting files by the key makes min-max pruning effective for
rectangle predicates on ANY of the interleaved dimensions — the
technique behind lakehouse `OPTIMIZE ZORDER BY` clustering (public:
Morton 1966; Bayer's UB-tree; Delta/Iceberg/Hudi z-ordering docs).

The key is pure integer arithmetic — shift/mask/add per bit — so it
stays inside whole-stage codegen and is bit-identical in any engine;
an oracle can restate it verbatim (:func:`morton_sql`).

Scope: two dimensions, ``bits`` bits each (key < 2^(2·bits) — 16+16
fits comfortably in a long). Inputs must be non-negative and below
2^bits; a guard expression raises at runtime otherwise (overflowing
bits would silently interleave garbage, the winnowing-encoding lesson
from round 8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of non-negative ``x`` and ``y``
    (x in even positions, y in odd) into one long. Raises at runtime
    if a value has bits past the field width (lossy interleave)."""
    lim = 1 << bits
    checked_x = F.when((x >= 0) & (x < lim), x.cast("long")).otherwise(
        F.raise_error(
            F.format_string(
                f"morton_key: x=%s outside [0, {lim}) - widen bits",
                x.cast("string"),
            )
        )
    )
    checked_y = F.when((y >= 0) & (y < lim), y.cast("long")).otherwise(
        F.raise_error(
            F.format_string(
                f"morton_key: y=%s outside [0, {lim}) - widen bits",
                y.cast("string"),
            )
        )
    )
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + (
            F.shiftright(checked_x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
        key = key + (
            F.shiftright(checked_y, i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i + 1))
        )
    return key


def morton_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical interleave as portable SQL (DuckDB `>>`/`&`) so an
    oracle states the same arithmetic."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y_expr}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
