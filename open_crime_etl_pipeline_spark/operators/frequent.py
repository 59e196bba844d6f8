"""Exact heavy hitters without shuffling the distinct-key space.

The plain plan — ``groupBy(key).count().filter(cnt > N/k)`` — shuffles
one row per DISTINCT key. At 100 TB with a high-cardinality key (URLs,
n-grams, user ids) that shuffle IS the job. The classic fix is a
two-phase candidate/verify plan built on the Misra–Gries frequent-items
sketch (Misra & Gries 1982; merge bound per Agarwal et al., "Mergeable
Summaries", PODS'12):

1. **sketch pass** — every partition folds its rows into at most ``k``
   MG counters (Arrow-batched ``mapInPandas``; per-batch counts are
   vectorized ``value_counts`` merges, and whenever the counter table
   exceeds ``k`` entries the (k+1)-th largest count is subtracted from
   all and non-positive entries dropped — the batched form of MG's
   decrement step, same invariant). Any key with partition frequency
   > N_p/(k+1) survives its partition's sketch; a key with GLOBAL
   frequency > N/k must have freq_p > N_p/k ≥ N_p/(k+1) in at least
   one partition (pigeonhole), so the union of per-partition
   candidates provably contains every global heavy hitter. Each
   partition also emits its row count, so N rides the same pass.
2. **verify pass** — exact recount of ONLY the candidates: broadcast
   the ≤ k·P candidate keys, semi-filter the corpus map-side, group by
   key. The shuffle carries candidate rows only — k·P keys, not the
   distinct-key space — and the final ``cnt·k > N`` filter is exact
   integer arithmetic (no FP threshold).

The result is EXACT (keys and counts), certified by the MG superset
guarantee — the sketch only prunes, never decides.

NULL keys are excluded (a null key is not a reportable item; filter
upstream if nulls need counting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpointing import pin


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition MG(k) sketch union: one row per surviving
    candidate key (``n_part`` null) plus one per-partition total row
    (key null, ``n_part`` = partition row count). Candidate set ⊇
    every key with global frequency > N/k."""
    ddl = dict(zip(df.columns, (f.dataType.simpleString() for f in df.schema.fields)))[
        key_col
    ]

    def _mg(iterator):
        import pandas as pd

        counts = None
        n_p = 0
        for pdf in iterator:
            s = pdf[key_col].dropna()
            n_p += len(s)
            vc = s.value_counts()
            counts = vc if counts is None else counts.add(vc, fill_value=0)
            if len(counts) > k:
                kth = counts.nlargest(k + 1).iloc[-1]
                counts = counts[counts > kth] - kth
        keys = [] if counts is None else list(counts.index)
        yield pd.DataFrame(
            {
                key_col: pd.Series(keys + [None], dtype=object),
                "n_part": pd.Series([None] * len(keys) + [n_p], dtype=object),
            }
        )

    return df.select(key_col).mapInPandas(
        _mg, schema=f"`{key_col}` {ddl}, n_part bigint"
    )


def heavy_hitters_exact(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """All keys with frequency strictly > N/k, with EXACT counts —
    candidate/verify plan (module docstring). Returns (key_col, cnt)."""
    sk = pin(misra_gries_candidates(df, key_col, k))  # consumed twice, tiny
    n_total = int(
        sk.agg(F.sum("n_part").alias("n")).collect()[0]["n"] or 0
    )  # bounded driver state: one scalar
    cands = sk.filter(F.col(key_col).isNotNull()).select(key_col).distinct()
    return (
        df.filter(F.col(key_col).isNotNull())
        .join(F.broadcast(cands), key_col)
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
        # exact integer threshold: cnt·k > N, never cnt > N/k in FP
        .filter(F.col("cnt") * F.lit(k) > F.lit(n_total))
    )
