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
3. **apply pass** — join the per-chunk entering state back on the
   grouped (series, chunk) key and emit s_i = A_i·S_c + B_i
   element-wise. The carry side has ONE row per (series, chunk) —
   tiny in the few-long-series regime, but the SAME cardinality as
   the chunked frame in the many-short-series regime — so the join
   carries no forced broadcast hint: AQE converts it to a broadcast
   join at runtime exactly when the carry side is actually small,
   and a 10⁷-series caller never OOMs the driver on a hint.

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

from ..checkpointing import pin


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
    map-side combine, one (series, chunk) equi-join back — unhinted,
    so AQE broadcasts it in the few-long-series regime and falls back
    to a hash join in the many-series regime where the carry side is
    as large as the data (see module docstring) — zero windows over
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
    ).transform(pin)  # consumed twice (carry + apply)

    entering = _carry_entering(local, chunk_ddl=_chunk_ddl(df, chunk_col))

    # --- apply pass: s_i = A_i·S_chunk + B_i, element-wise
    return (
        local.join(entering, ["_series", "_chunk"])
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


def _chunk_ddl(df: DataFrame, chunk_col: Column) -> str:
    """Spark DDL type of the chunk key, for the carry fold's empty-array
    literal — derived from the actual expression so numeric/timestamp
    chunk keys (``floor(epoch/granule)``, ``date_trunc``) work, not
    just strings."""
    return (
        df.select(chunk_col.alias("c")).schema[0].dataType.simpleString().upper()
    )


def _carry_entering(local: DataFrame, chunk_ddl: str) -> DataFrame:
    """Carry pass shared by the scan operators: given one row per
    (series, chunk) with the chunk's affine summary (cA, cB) and the
    series-seed candidate first_x, fold the ordered chunk summaries
    per series — S_{c+1} = A_c·S_c + B_c, S_0 = first chunk's first_x
    — and return (series, chunk, S) = the exact recurrence state
    ENTERING each chunk. #chunks rows per series; ``chunk_ddl`` names
    the chunk key's Spark DDL type for the fold's array literal."""
    summaries = local.groupBy("_series").agg(
        F.sort_array(
            F.collect_list(F.struct("_chunk", "cA", "cB", "first_x"))
        ).alias("cs")
    )
    enter_t = f"ARRAY<STRUCT<c: {chunk_ddl}, S: DOUBLE>>"
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

    return (
        summaries.select(
            "_series",
            F.explode(
                F.aggregate("cs", carry_init, carry_step, lambda acc: acc["out"])
            ).alias("e"),
        )
        .select("_series", F.col("e.c").alias("_chunk"), F.col("e.S").alias("S"))
    )


def ewma_time_decay_scan(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    x_col: str,
    id_col: str,
    chunk_col: Column,
    tau_seconds: float,
) -> DataFrame:
    """Irregularly-sampled exponential time decay per series — the
    operator the fixed-α fold CANNOT express and the affine scan gets
    for free, because the per-step map is still affine, just with a
    DATA-DEPENDENT coefficient:

        s_1 = x_1
        s_t = a_t·s_{t-1} + (1-a_t)·x_t,   a_t = exp(-Δt/τ),
        Δt  = seconds between observation t-1 and t

    (the standard continuous-time EWMA for event streams: a burst of
    close events barely decays the state; a long gap nearly resets it
    to the new observation).

    The per-element coefficient needs the PREDECESSOR's timestamp,
    which crosses chunk boundaries — solved with one extra tiny pass:
    each chunk's last timestamp shifts forward one chunk (a lag window
    over the #chunks-per-series summary rows, never over elements), so
    the chunk-local fold knows its boundary Δt before it runs. The
    global first element uses Δt = 0 ⇒ a = exp(0) = 1 exactly, making
    the seed s_1 = 1·S₀ + 0·x₁ = S₀ = x₁ EXACT (no ulp drift at the
    seed). Δt is computed as (unix_micros difference)/1e6 — an exact
    long difference, then one double division — so both engines feed
    exp() bit-identical arguments.

    Ties: elements sort by (t_us, id) — with Δt = 0 the decay form
    assigns the tied element zero weight, so WHICH element counts as
    "first" must be deterministic; the id tiebreaker pins it on both
    engines.

    Same scale shape as :func:`ewma_affine_scan`: per-task state
    bounded by chunk size (level 1) and chunk count (level 2); no
    window over element-level data; one unhinted (series, chunk)
    equi-join back (AQE broadcasts it only when the carry side is
    actually small — see module docstring).
    Returns (series_col, id_col, x_col, ewma).
    """
    tau = float(tau_seconds)
    elem = F.struct(
        F.unix_micros(F.col(ts_col)).alias("tu"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(x_col).cast("double").alias("x"),
    )
    chunked = df.groupBy(
        F.col(series_col).alias("_series"), chunk_col.alias("_chunk")
    ).agg(
        F.sort_array(F.collect_list(elem)).alias("xs"),
        F.max(F.unix_micros(F.col(ts_col))).alias("last_t"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_series").orderBy("_chunk")
    chunked = chunked.withColumn("prev_last_t", F.lag("last_t").over(w))

    out_t = (
        "ARRAY<STRUCT<eid: BIGINT, tu: BIGINT, x: DOUBLE, "
        "A: DOUBLE, B: DOUBLE>>"
    )
    init = F.struct(
        F.lit(1.0).alias("A"),
        F.lit(0.0).alias("B"),
        F.coalesce(F.col("prev_last_t"), F.element_at("xs", 1)["tu"]).alias("pt"),
        F.expr(f"CAST(array() AS {out_t})").alias("out"),
    )

    def step(acc, p):
        # association mirrors the oracle: exp(-((Δt_us)/1e6)/τ)
        a = F.exp(
            -(
                (p["tu"] - acc["pt"]).cast("double") / F.lit(1_000_000.0)
            )
            / F.lit(tau)
        )
        nA = a * acc["A"]
        nB = a * acc["B"] + (F.lit(1.0) - a) * p["x"]
        return F.struct(
            nA.alias("A"),
            nB.alias("B"),
            p["tu"].alias("pt"),
            F.array_append(
                acc["out"],
                F.struct(
                    p["eid"].alias("eid"), p["tu"].alias("tu"),
                    p["x"].alias("x"), nA.alias("A"), nB.alias("B"),
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
    ).transform(pin)  # consumed twice (carry + apply)

    entering = _carry_entering(local, chunk_ddl=_chunk_ddl(df, chunk_col))

    return (
        local.join(entering, ["_series", "_chunk"])
        .select("_series", "S", F.explode("prefixes").alias("p"))
        .select(
            F.col("_series").alias(series_col),
            F.col("p.eid").alias(id_col),
            F.col("p.x").alias(x_col),
            (F.col("p.A") * F.col("S") + F.col("p.B")).alias("ewma"),
        )
    )
