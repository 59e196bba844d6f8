"""Distributed suffix ranking by prefix doubling (Manber & Myers 1990,
restated as the iterated sort-join the MapReduce/Spark literature uses
for terabyte-scale suffix arrays).

A suffix array over the corpus is the index behind substring-level
dedup (Lee et al. 2022 ExactSubstr), longest-repeated-substring
mining, and contamination scans. Building one at 100 TB cannot sort
full suffix strings (quadratic bytes in flight); prefix doubling sorts
fixed-size integer tuples log(maxlen) times instead:

1. **seed** — rank every suffix by its first ``w0`` characters: the
   distinct ``w0``-grams are globally ranked (range-partitioned
   two-pass ranking, ``operators/ranking.global_row_number`` — never a
   single-task window) and joined back. Rows in flight: (doc, pos,
   rank) — integers, never suffix strings.
2. **double** — a suffix's order-``2k`` rank is the dense rank of the
   pair (rank_k[pos], rank_k[pos+k]), with rank −1 when pos+k runs off
   the document (shorter suffix sorts first, matching plain string
   comparison). The successor rank arrives by an equi-join on
   (doc, pos+k); the pair table is dense-ranked the same two-pass way.
   Each round is therefore: one equi-join + one distinct + one global
   ranking — all hash/range-partitioned, no driver data.
3. **early exit** — when every suffix holds a distinct rank the order
   is final (random-ish text exits after 2-4 rounds); otherwise the
   doubling runs to k ≥ maxlen and remaining ties are IDENTICAL full
   suffixes, broken deterministically by (doc, pos).

Lineage is cut with :func:`..checkpointing.pin` every round (opt-in
reliable checkpoints for cluster fault tolerance, as everywhere).

Output: (id_col, pos, sa_rank) — sa_rank is the 1-based position of
the suffix in the sorted order of ALL corpus suffixes (ties by full
string equality broken by (doc, pos)), i.e. the inverse suffix array.
``pos`` is 1-based to match SQL ``substr``.

LCP at scale: the longest-repeated-substring query compares adjacent
suffixes' STRINGS directly (one zip_with char scan per neighbor pair)
— fine at slice scale, O(total bytes) in flight. At 100 TB, compute
LCP from the doubling artifacts instead: keep each round's rank table
(doc, pos) → rank_k, and for a neighbor pair walk k from the largest
doubling level down — if rank_k matches, advance both positions by k
and add k to the LCP — O(log maxlen) integer rank lookups per pair
(each an equi-join against the level's table), never suffix bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpointing import pin
from .ranking import global_row_number


def _dense_rank_pairs(pairs: DataFrame, cols: list[str]) -> DataFrame:
    """Dense-rank ``pairs`` (already distinct on ``cols``) by ``cols``
    via the two-pass range-partitioned ranking — row_number over a
    distinct set IS its dense rank."""
    return global_row_number(pairs, cols, out_col="__r")


def suffix_ranks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w0: int = 8,
    max_rounds: int | None = None,
) -> DataFrame:
    """Rank every suffix of every document globally (module docstring).
    Returns (id_col, pos long, sa_rank long).

    ``max_rounds`` defaults to enough doublings to cover the LONGEST
    document (measured with one cheap agg) — a fixed cap would be a
    CORRECTNESS bug: exhausting the loop before k >= maxlen leaves
    non-identical suffixes tied, and the final (doc, pos) tie-break
    would order them arbitrarily. Pass an explicit value only to bound
    work when a downstream consumer tolerates prefix-only ordering."""
    # one row per suffix: (doc, pos, first-w0 characters)
    suf = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.sequence(F.lit(1), F.length(text_col))).alias("pos"),
        F.col(text_col).alias("__t"),
    ).select("__doc", "pos", F.expr(f"substring(__t, pos, {w0})").alias("__g"))
    n_total = suf.count()
    if max_rounds is None:
        import math

        maxlen = int(
            df.agg(F.max(F.length(text_col)).alias("m")).collect()[0]["m"] or 1
        )
        # after r rounds the comparison window is w0 * 2^r; cover maxlen
        max_rounds = max(math.ceil(math.log2(max(maxlen, w0) / w0)) + 1, 1)

    # seed ranks from the w0-gram (dense: rank the DISTINCT grams)
    grams = _dense_rank_pairs(suf.select("__g").distinct(), ["__g"])
    ranks = pin(
        suf.join(grams, "__g").select(
            "__doc", "pos", F.col("__r").cast("long").alias("r")
        )
    )

    k = w0
    prev_distinct = -1
    for _ in range(max_rounds):
        distinct_r = ranks.agg(F.countDistinct("r").alias("d")).collect()[0]["d"]
        if distinct_r == n_total or distinct_r == prev_distinct:
            # all unique -> final; OR the partition refinement reached
            # its fixpoint (a round that splits no class never splits
            # one later: rank_2k classes are built from rank_k classes,
            # so an unchanged partition reproduces itself) — remaining
            # ties are IDENTICAL full suffixes, broken by (doc, pos).
            break
        prev_distinct = distinct_r
        succ = ranks.select(
            "__doc",
            (F.col("pos") - F.lit(k)).alias("pos"),
            F.col("r").alias("r2"),
        )
        paired = (
            ranks.join(succ, ["__doc", "pos"], "left")
            .na.fill({"r2": -1})  # suffix shorter than 2k: sorts first
        )
        pair_ranks = _dense_rank_pairs(
            paired.select("r", "r2").distinct(), ["r", "r2"]
        )
        ranks = pin(
            paired.join(pair_ranks, ["r", "r2"]).select(
                "__doc", "pos", F.col("__r").cast("long").alias("r")
            )
        )
        k *= 2

    # total order: remaining equal ranks are identical full suffixes
    return global_row_number(
        ranks, ["r", "__doc", "pos"], out_col="sa_rank"
    ).select(
        F.col("__doc").alias(id_col),
        F.col("pos").cast("long").alias("pos"),
        F.col("sa_rank"),
    )
