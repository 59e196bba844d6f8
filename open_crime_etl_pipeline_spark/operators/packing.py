"""Sequence packing: assign documents to fixed-token-budget context
windows ("bins") for LLM pretraining batches.

Training pipelines concatenate documents into fixed-length sequences
(e.g. 8192 tokens); the packing decision — which docs share a window —
must be deterministic and distributed. Exact global first-fit is
inherently sequential, so the scalable shape is SHARDED greedy
streaming pack, the standard practice:

1. shard every doc by a deterministic key — ``shard_by="mod"``
   (``id % n_shards``: portable to the SQL oracle, numeric ids only,
   inherits any id-distribution skew) or ``shard_by="hash"``
   (``xxhash64(id) % n_shards``: any id type, uniform shard sizes —
   the production default at scale) — so each shard is small enough
   for one task;
2. within a shard, walk docs in id order and open a new bin whenever
   the current doc would overflow the budget (a doc larger than the
   whole budget gets a bin of its own — never silently truncated);
3. bins are (shard, bin) pairs — globally unique without coordination.

The per-shard walk is a true data dependency (bin of doc i depends on
the packing of docs < i), so it runs as a plain loop inside an
Arrow-batched ``applyInPandas``. That is the right trade: the loop is
O(rows/shard) per task with a few integer ops per row, and shard count
is the parallelism knob — 100 TB at 1e6-doc shards is ~1e5 independent
tasks. (The affine-scan trick in operators/scan.py does NOT apply: the
overflow-reset recurrence is not associative, so there is no
prefix-scan decomposition — see Blelloch 1990 §1.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    n_shards: int = 64,
    shard_by: str = "mod",
) -> DataFrame:
    """Greedy sharded sequence packing. Returns one row per input doc:
    (id_col, shard, bin, fill) where ``fill`` is the bin's running
    token count AFTER placing this doc — the last doc of a bin states
    the bin's final size, making utilization auditable downstream.

    ``shard_by``: "mod" (oracle-portable, numeric ids) or "hash"
    (xxhash64 — any id type, skew-proof; module docstring)."""
    b = int(budget)
    if shard_by not in ("mod", "hash"):
        raise ValueError(f"shard_by must be 'mod' or 'hash', got {shard_by!r}")

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        lens = pdf[len_col].astype("int64").to_numpy()
        bins = [0] * len(lens)
        fills = [0] * len(lens)
        cur_bin, cur_fill = 0, 0
        for i, ln in enumerate(lens):
            if cur_fill > 0 and cur_fill + ln > b:
                cur_bin, cur_fill = cur_bin + 1, 0
            cur_fill += int(ln)
            bins[i], fills[i] = cur_bin, cur_fill
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "shard": pdf["shard"],
                "bin": pd.Series(bins, dtype="int64"),
                "fill": pd.Series(fills, dtype="int64"),
            }
        )

    shard_key = (
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
        if shard_by == "hash"
        else F.col(id_col) % F.lit(n_shards)
    )
    sharded = df.select(
        F.col(id_col),
        F.col(len_col),
        shard_key.cast("long").alias("shard"),
    )
    out_schema = (
        f"`{id_col}` {dict((f.name, f.dataType.simpleString()) for f in sharded.schema.fields)[id_col]}, "
        "shard long, bin long, fill long"
    )
    return sharded.groupBy("shard").applyInPandas(_pack, schema=out_schema)
