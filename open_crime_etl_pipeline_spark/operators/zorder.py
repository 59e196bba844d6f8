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
an oracle can restate it verbatim (:func:`morton_sql_nd`).

Scope: n dimensions with PER-COLUMN bit budgets summing to <= 63 (the
key must fit a signed long with the sign bit clear). Budgets may be
uneven — give a 24-bit timestamp coordinate and a 4-bit category
coordinate their natural widths instead of wasting key bits. The
interleave is level-major: output bit positions are assigned walking
bit level 0, 1, 2, … and, within a level, columns in argument order,
skipping columns whose budget is exhausted — so the LOW bits of every
column interleave first (the locality property) and wide columns own
the high positions alone. For two equal budgets this reduces to the
classic x-even/y-odd interleave. Inputs must be non-negative and below
2^budget; a guard expression raises at runtime otherwise (overflowing
bits would silently interleave garbage, the winnowing-encoding lesson
from round 8). ``io/layout.py`` wraps this with min/max grid scaling
for DOUBLE columns; this module is the exact-integer core.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _bit_positions(bits: list[int]) -> list[list[int]]:
    """Output key position for bit i of column j, level-major:
    ``positions[j][i]``. Walks levels 0..max(bits)-1 assigning the next
    free key bit to each column still having that level."""
    positions: list[list[int]] = [[] for _ in bits]
    nxt = 0
    for level in range(max(bits)):
        for j, b in enumerate(bits):
            if level < b:
                positions[j].append(nxt)
                nxt += 1
    return positions


def _check_budgets(n_cols: int, bits) -> list[int]:
    budgets = [bits] * n_cols if isinstance(bits, int) else list(bits)
    if len(budgets) != n_cols:
        raise ValueError(
            f"morton_key_nd: {n_cols} columns but {len(budgets)} bit budgets"
        )
    if any(b < 1 for b in budgets):
        raise ValueError(f"morton_key_nd: every bit budget must be >= 1: {budgets}")
    if sum(budgets) > 63:
        raise ValueError(
            f"morton_key_nd: bit budgets sum to {sum(budgets)} > 63 — the key "
            "must fit a signed 64-bit long with the sign bit clear; shrink a "
            "budget or drop a column"
        )
    return budgets


def morton_key_nd(cols: list[Column], bits) -> Column:
    """Interleave the low ``bits[j]`` bits of each non-negative column
    ``cols[j]`` into one long (level-major positions, module doc).
    ``bits`` is one int (uniform) or a per-column list summing to <= 63.
    Raises at plan time on a bad budget and at RUNTIME if any value has
    bits past its field width (lossy interleave)."""
    budgets = _check_budgets(len(cols), bits)
    positions = _bit_positions(budgets)
    key = F.lit(0).cast("long")
    for j, (col, b) in enumerate(zip(cols, budgets)):
        lim = 1 << b
        checked = F.when((col >= 0) & (col < lim), col.cast("long")).otherwise(
            F.raise_error(
                F.format_string(
                    f"morton_key_nd: col{j}=%s outside [0, {lim}) - widen bits",
                    col.cast("string"),
                )
            )
        )
        for i, pos in enumerate(positions[j]):
            key = key + (
                F.shiftright(checked, i).bitwiseAND(F.lit(1)) * F.lit(1 << pos)
            )
    return key


def morton_sql_nd(exprs: list[str], bits) -> str:
    """The identical interleave as portable SQL (DuckDB `>>`/`&`) so an
    oracle states the same arithmetic."""
    budgets = _check_budgets(len(exprs), bits)
    positions = _bit_positions(budgets)
    terms = []
    for j, e in enumerate(exprs):
        for i, pos in enumerate(positions[j]):
            terms.append(f"((({e}) >> {i}) & 1) * {1 << pos}")
    return "(" + " + ".join(terms) + ")"


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """2-D convenience wrapper: the classic x-even/y-odd interleave
    (exactly ``morton_key_nd([x, y], bits)`` — equal budgets make the
    level-major assignment alternate)."""
    return morton_key_nd([x, y], bits)


def morton_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    return morton_sql_nd([x_expr, y_expr], bits)
