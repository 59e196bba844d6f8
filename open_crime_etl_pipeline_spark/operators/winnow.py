"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD'03 — the MOSS algorithm).

Local fingerprinting with a GUARANTEE: hash every character k-gram,
slide a w-gram window over the hash sequence, and keep each window's
minimum (rightmost on ties — "robust winnowing"). Any substring match
of length ≥ w + k − 1 between two documents is then guaranteed to
share at least one selected fingerprint, while ~2/(w+1) of grams are
kept — the provable middle ground between full k-gram inverted indexes
(ExactSubstr-grade, huge) and one-hash-per-doc digests (exact-dup
only).

Engine-portable construction (no xxhash in the oracle engine):

- gram hash  h = first 8 hex chars of md5(gram) as a 32-bit integer —
  identical in any engine with md5.
- rightmost-min selection WITHOUT an argmax join: encode
  ``key = h·2³¹ + (2³¹−1−pos)``; the plain integer ``min(key)`` then
  yields the smallest hash and, among equal hashes, the LARGEST
  position. Decode h = key div 2³¹, pos = 2³¹−1 − key mod 2³¹ (integer
  div/mod on BOTH engines — never float division, whose 53-bit
  mantissa cannot represent these keys). One aggregate, exact
  arithmetic, bit-identical everywhere. The encoding is total over
  every representable document: h < 2³² and 1 ≤ pos ≤ 2³¹−1 (a Spark
  string holds at most 2³¹−1 chars), so the offset term is always
  non-negative and max key = (2³²−1)·2³¹ + (2³¹−2) = 2⁶³−2 fits a
  signed 64-bit integer. (Round 8: widened from 2¹⁶, which silently
  corrupted selection past 65,535 chars — the offset went negative and
  borrowed from the hash field.)
- windows come from exploding each gram into the ≤ w window-starts
  covering it — w× row amplification (w is small), all map-side, then
  one groupBy (doc, window) min and a distinct. Everything is
  hash-partitioned by doc/window; no global ordering anywhere.

Output: DISTINCT (id_col, pos, fp) — selected gram position (1-based)
and its 32-bit fingerprint. Documents shorter than k+w−1 still emit
(their single partial window's min), matching the reference algorithm
on short inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import fan_out

_ENC = 1 << 31  # position-field width; see module docstring for the bound proof


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, w: int = 8,
    widen: bool = True,
) -> DataFrame:
    """Selected winnowing fingerprints (module docstring). Returns
    distinct (id_col, pos long, fp long).

    ``widen`` guards the fan_out below: the full-corpus caller keeps
    it (r12 wave 1: 5.0 → 1.6s isolated — the gram explode serialized
    on a single parquet split), but thin-slice callers (the pair
    queries' doc_id % 25 corpus) pass False — there the round-robin
    exchange costs more than the parallelism it buys, and it was the
    larger half of the r12 winnowing_similarity_pairs regression
    (round-12 verdict item 2; r13 A/B in OPTIMIZATION_r13.md)."""
    # the gram explode + per-gram md5 is the expensive stage and runs
    # scan-side: don't let a few input files serialize it (guide §2.5)
    if widen:
        df = fan_out(df)
    ng = F.greatest(F.length(text_col) - (k - 1), F.lit(1))  # gram count
    grams = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(1), ng)).alias("pos"),
        # last FULL window start (one partial window iff doc < k+w-1)
        F.greatest(ng - (w - 1), F.lit(1)).alias("last_win"),
        F.col(text_col).alias("__t"),
    ).select(
        id_col,
        "pos",
        "last_win",
        F.conv(F.substring(F.md5(F.expr(f"substring(__t, pos, {k})")), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )
    # encode (h, rightmost pos) for a single-min selection; each gram
    # joins the ≤ w FULL windows covering it
    enc = grams.select(
        id_col,
        (F.col("h") * F.lit(_ENC) + (F.lit(_ENC - 1) - F.col("pos"))).alias("key"),
        F.explode(
            F.sequence(
                F.greatest(F.col("pos") - F.lit(w - 1), F.lit(1)),
                F.least(F.col("pos"), F.col("last_win")),
            )
        ).alias("win"),
    )
    sel = enc.groupBy(id_col, "win").agg(F.min("key").alias("key"))
    return (
        sel.select(
            id_col,
            (F.lit(_ENC - 1) - F.col("key") % F.lit(_ENC)).cast("long").alias("pos"),
            # integer div: float / would round 63-bit keys (53-bit mantissa)
            F.expr(f"key div {_ENC}L").cast("long").alias("fp"),
        )
        .distinct()
    )
