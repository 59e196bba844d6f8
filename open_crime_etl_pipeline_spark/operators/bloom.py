"""Broadcast Bloom-filter prefilter for massive semi-joins
(SURVEY.md §2.11 [EXT] — the decontamination scale path).

Why: `contamination_ngram_overlap` broadcasts the benchmark shingle
SET. That works while the bench side fits a broadcast (strings!); at
100 TB an eval suite can hold 10^8+ distinct shingles — tens of GB of
strings, an impossible broadcast, while the corpus side is orders of
magnitude bigger still and must not shuffle. The classic fix is the
one Spark itself applies in runtime row-group filtering (and the
reference's warehouses use for semi-join pushdown): broadcast a Bloom
BIT-SET over the small side (~16 bits/element regardless of string
length), prefilter the big side scan-side, and run the exact join only
on survivors. No false negatives ⇒ the final result is bit-identical
to the exact join; false positives only cost verify work (~0.5% at
16 bits/element, k=3).

Everything here is Catalyst expressions — the build aggregates set-bit
words with `bit_or` (collect is ≤ num_bits/64 longs, never the
elements), and the probe is array indexing + bit tests, fully
codegen'd, zero Python on the data path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# element_at(_POW64, (pos % 64) + 1) == 1 << (pos % 64) — shiftleft
# needs a literal shift amount, so index a literal powers table instead
_POW64 = F.array(
    *[F.lit(1 << b).cast("long") for b in range(63)] + [F.lit(-(2 ** 63)).cast("long")]
)


def _positions(hash_col: Column, num_bits: int, k: int) -> list[Column]:
    """k independent bit positions per element: pmod(xxhash64(h, i), m).
    Seeding via an extra literal column gives k members of the xxhash64
    family — identical expressions on build and probe side by
    construction (both call this helper)."""
    return [
        F.pmod(F.xxhash64(hash_col, F.lit(i)), F.lit(num_bits)) for i in range(k)
    ]


def build_bloom(
    elements: DataFrame, col: str, num_bits: int = 1 << 18, k: int = 3
) -> list[int]:
    """Distributed Bloom build → Python list of num_bits/64 longs.

    The small side computes its k set-bit positions, groups them by
    64-bit word index, and `bit_or`s the word values — the driver
    collects AT MOST num_bits/64 rows (16 KiB of longs per 2^20 bits),
    never the elements themselves. At any scale the collect is bounded
    by the filter size you chose, which is also the broadcast budget."""
    pos = elements.select(
        F.explode(F.array(*_positions(F.xxhash64(F.col(col)), num_bits, k))).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.element_at(_POW64, (F.pmod(F.col("p"), F.lit(64)) + 1).cast("int")).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    bits = [0] * (num_bits // 64)
    for r in words:
        bits[r.w] = r.word
    return bits


def might_contain(bloom_bits: list[int], col: Column, num_bits: int, k: int) -> Column:
    """Pure-Catalyst probe: AND over k (array-index + bit-test) checks
    against the broadcast literal bit array. True for every element
    that was in the build set (no false negatives); true for a tuned-
    small fraction of others."""
    bloom = F.array(*[F.lit(wv).cast("long") for wv in bloom_bits])
    h = F.xxhash64(col)
    checks = []
    for pos in _positions(h, num_bits, k):
        word = F.element_at(bloom, ((pos / 64).cast("long") + 1).cast("int"))
        bit = F.element_at(_POW64, (F.pmod(pos, F.lit(64)) + 1).cast("int"))
        checks.append(word.bitwiseAND(bit) != 0)
    return reduce(lambda a, b: a & b, checks)


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_bits: int = 1 << 18,
    k: int = 3,
) -> DataFrame:
    """Exact semi-join of ``big`` against ``small`` on column ``on``,
    executed as bloom-prefilter → exact join on survivors. Identical
    rows to ``big.join(small.distinct(), on, "left_semi")`` — the bloom
    only reduces how much of ``big`` reaches the join."""
    bits = build_bloom(small.select(on).distinct(), on, num_bits, k)
    pre = big.filter(might_contain(bits, F.col(on), num_bits, k))
    # exact verify on survivors only — a cheap shuffle of (contaminated
    # + false-positive) rows; AQE broadcasts when the small side fits.
    # No broadcast hint: at the scales this operator exists for, the
    # small side may NOT fit a broadcast — only its bloom does.
    return pre.join(small.select(on).distinct(), on, "left_semi")
