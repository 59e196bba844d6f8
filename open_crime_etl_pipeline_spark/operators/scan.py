"""Distributed segmented prefix scan for linear recurrences
(SURVEY.md §2.12 [EXT] time-series — the 100-TB completion of the
per-series fold in ``queries/timeseries.py``).

An EWMA is the linear recurrence s_t = α·x_t + (1-α)·s_{t-1}. Each
step is the affine map f_t(s) = a·s + b_t with a = 1-α, b_t = α·x_t,
and affine maps compose associatively:

    (f ∘ g)(s) = a_f·(a_g·s + b_g) + b_f = (a_f·a_g)·s + (a_f·b_g + b_f)

so the whole path s_1..s_n is a PREFIX SCAN over ∘ (Blelloch 1990,
"Prefix Sums and Their Applications") and can be chunked across tasks:

1. **chunk-local pass** — group rows into (series, chunk) where chunk
   is a coarser key ordered consistently with the element order (e.g.
   calendar month over days). One Catalyst ``aggregate`` HOF folds the
   chunk's sorted elements, emitting per element its local prefix
   (A_i, B_i) = f_i ∘ … ∘ f_first and, as the fold's final state, the
   chunk summary (A_c, B_c). Arrays are bounded by CHUNK size, never
   series size.
2. **carry pass** — per series, fold the (tiny) ordered chunk
   summaries once: S_{c+1} = A_c·S_c + B_c gives the exact recurrence
   state ENTERING each chunk. #chunks = n/chunk_size rows per series
   (two more levels of the same scan if even that outgrows a task;
   one level covers 10¹² elements at 10⁶-element chunks).
3. **apply pass** — join the per-chunk entering state back (broadcast:
   it is #chunks rows) and emit s_i = A_i·S_c + B_i element-wise.

Seeding: the query family seeds at the first observation (s_1 = x_1),
which is exactly the scan with initial state S_0 = x_first, since
s_1 = a·x_1 + α·x_1 = x_1 (one ulp of float drift at most; outputs
round at 6dp with ~1e-12 headroom).

Numerical note: the scan REASSOCIATES the fold's FP operations, so
results match the sequential recurrence to ~n·ε relative error, not
bit-for-bit — the registered query rounds to 6dp against the same
recursive-CTE oracle as the fold variant, with ~10⁶× margin. The
max(0,·)-clamped CUSUM recurrence does NOT compose associatively; no
scan rewrite exists for it (see queries/timeseries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ewma_affine_scan(
    df: DataFrame,
    series_col: str,
    order_col: str,
    x_col: str,
    chunk_col: Column,
    alpha: float = 0.2,
) -> DataFrame:
    """EWMA per series via the chunked affine prefix scan described in
    the module docstring. ``chunk_col`` must be a coarsening of
    ``order_col``'s ordering (same sort order; e.g. month prefix of an
    ISO day string, or ``floor(epoch/granule)``) — elements within a
    chunk are ordered by ``order_col``, chunks by ``chunk_col``.

    Returns (series_col, order_col, x_col, ewma) for every input row,
    where ewma replays s_1 = x_1, s_t = α·x_t + (1-α)·s_{t-1} per
    series across chunk (and therefore task) boundaries.

    Scale shape: two groupBys (rows → chunks, chunks → series) with
    map-side combine, one broadcast-sized join back, zero windows over
    an unpartitioned ordering, zero driver loops; per-task array state
    is bounded by the chunk size at level 1 and the chunk COUNT at
    level 2 — a single series spanning thousands of tasks is fine,
    which the bounded per-series fold in queries/timeseries.py is not.
    """
    a = 1.0 - alpha  # exact: both 0.2 and 0.8 are nearest-double literals
    # order keys ride as strings (ISO days, zero-padded sequence ids —
    # anything whose string sort equals its logical sort)
    elem = F.struct(
        F.col(order_col).cast("string").alias("o"),
        F.col(x_col).cast("double").alias("x"),
    )

    chunked = df.groupBy(
        F.col(series_col).alias("_series"), chunk_col.alias("_chunk")
    ).agg(F.sort_array(F.collect_list(elem)).alias("xs"))

    # --- chunk-local pass: per-element local prefixes + chunk summary
    out_t = "ARRAY<STRUCT<o: STRING, x: DOUBLE, A: DOUBLE, B: DOUBLE>>"
    init = F.struct(
        F.lit(1.0).alias("A"),
        F.lit(0.0).alias("B"),
        F.expr(f"CAST(array() AS {out_t})").alias("out"),
    )

    def step(acc, p):
        nA = F.lit(a) * acc["A"]
        nB = F.lit(a) * acc["B"] + F.lit(alpha) * p["x"]
        return F.struct(
            nA.alias("A"),
            nB.alias("B"),
            F.array_append(
                acc["out"],
                F.struct(
                    p["o"].alias("o"), p["x"].alias("x"),
                    nA.alias("A"), nB.alias("B"),
                ),
            ).alias("out"),
        )

    local = chunked.select(
        "_series",
        "_chunk",
        F.element_at("xs", 1)["x"].alias("first_x"),
        F.aggregate("xs", init, step).alias("agg"),
    ).select(
        "_series", "_chunk", "first_x",
        F.col("agg.A").alias("cA"), F.col("agg.B").alias("cB"),
        F.col("agg.out").alias("prefixes"),
    ).localCheckpoint(eager=True)  # consumed twice (carry + apply)

    # --- carry pass: entering state per chunk = scalar fold over the
    # ordered chunk summaries; initial state = x of the series' first
    # element (seed s_1 = x_1, see module docstring)
    summaries = local.groupBy("_series").agg(
        F.sort_array(
            F.collect_list(F.struct("_chunk", "cA", "cB", "first_x"))
        ).alias("cs")
    )
    enter_t = "ARRAY<STRUCT<c: STRING, S: DOUBLE>>"
    carry_init = F.struct(
        F.element_at("cs", 1)["first_x"].alias("S"),
        F.expr(f"CAST(array() AS {enter_t})").alias("out"),
    )

    def carry_step(acc, c):
        return F.struct(
            (c["cA"] * acc["S"] + c["cB"]).alias("S"),
            F.array_append(
                acc["out"],
                F.struct(c["_chunk"].alias("c"), acc["S"].alias("S")),
            ).alias("out"),
        )

    entering = (
        summaries.select(
            "_series",
            F.explode(
                F.aggregate("cs", carry_init, carry_step, lambda acc: acc["out"])
            ).alias("e"),
        )
        .select("_series", F.col("e.c").alias("_chunk"), F.col("e.S").alias("S"))
    )

    # --- apply pass: s_i = A_i·S_chunk + B_i, element-wise
    return (
        local.join(F.broadcast(entering), ["_series", "_chunk"])
        .select(
            "_series", "S", F.explode("prefixes").alias("p")
        )
        .select(
            F.col("_series").alias(series_col),
            F.col("p.o").alias(order_col),
            F.col("p.x").alias(x_col),
            (F.col("p.A") * F.col("S") + F.col("p.B")).alias("ewma"),
        )
    )
