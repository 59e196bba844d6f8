"""Distributed dense linear algebra over embedding columns
(SURVEY.md §2.11 [EXT]: similarity / embedding analytics).

The core primitive is the Gram / covariance matrix of an
``array<float>`` column: each partition accumulates its partial
X^T X, column sums, and row count with one numpy matmul
(Arrow-batched mapInPandas — the classic map-side combine for second
moments), then a single shuffle of O(partitions · d²) tiny
(i, j, partials) rows merges them. Nothing proportional to the row
count N ever shuffles or reaches the driver, so the operator's cost
at 100 TB is one scan plus a d²-row reduce — the same shape
``corr``/``covar_samp`` use internally, generalized to all pairs at
once.

Downstream spectral steps (top eigenvector via power iteration) run
on the driver over the d×d result — O(d²) work and memory,
independent of N, which is the correct split at scale: data-sized
work distributed, model-sized work local.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_pairs(
    df: DataFrame, vec_col: str, d: int, shift=None
) -> DataFrame:
    """Upper-triangle second-moment pairs of ``vec_col`` (length-d
    arrays): returns one row per (i, j), i ≤ j, 1-based, with

    - ``s_ij``  = Σ_rows x_i · x_j   (raw Gram entry)
    - ``sum_i`` / ``sum_j`` = column sums
    - ``n_rows`` = row count

    from which callers derive covariance/correlation. Partials are
    computed per Arrow batch with a single numpy matmul and merged by
    one groupBy — d²/2 result rows regardless of N.

    ``shift`` (length-d sequence, optional) subtracts a constant vector
    from every row before accumulating — the "shifted Gram" trick: with
    shift ≈ the column means, downstream covariance derivation has
    bounded cancellation instead of S_ij − n·μ_i·μ_j losing digits as
    N grows. The default (no shift) keeps raw second moments."""
    dd = d
    shift_list = None if shift is None else [float(s) for s in shift]
    if shift_list is not None and len(shift_list) != dd:
        raise ValueError(f"shift has dim {len(shift_list)}, expected {dd}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        a = None if shift_list is None else np.asarray(shift_list)
        G = np.zeros((dd, dd))
        colsum = np.zeros(dd)
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            col = pdf[vec_col]
            if col.isna().any():
                raise ValueError(
                    f"gram_pairs: null embedding in column '{vec_col}' — "
                    "drop or impute null vectors before the Gram pass"
                )
            try:
                X = np.stack(col.to_numpy()).astype(np.float64)
            except ValueError as e:
                raise ValueError(
                    f"gram_pairs: ragged embeddings in column '{vec_col}' "
                    f"(expected uniform dim {dd}): {e}"
                ) from None
            if X.ndim != 2 or X.shape[1] != dd:
                raise ValueError(f"expected dim {dd}, got {X.shape[1:]}")
            if a is not None:
                X = X - a
            G += X.T @ X
            colsum += X.sum(axis=0)
            n += X.shape[0]
        if n == 0:
            return
        iu, ju = np.triu_indices(dd)
        yield pd.DataFrame({
            "i": (iu + 1).astype("int32"),
            "j": (ju + 1).astype("int32"),
            "s_ij": G[iu, ju],
            "sum_i": colsum[iu],
            "sum_j": colsum[ju],
            "n_rows": np.full(len(iu), n, dtype="int64"),
        })

    partials = df.select(vec_col).mapInPandas(
        run,
        "i int, j int, s_ij double, sum_i double, sum_j double, n_rows long",
    )
    return partials.groupBy("i", "j").agg(
        F.sum("s_ij").alias("s_ij"),
        F.sum("sum_i").alias("sum_i"),
        F.sum("sum_j").alias("sum_j"),
        F.sum("n_rows").alias("n_rows"),
    )


def covariance_pairs(df: DataFrame, vec_col: str, d: int) -> DataFrame:
    """Sample covariance for every (i ≤ j) pair:
    cov_ij = (S'_ij − n·m'_i·m'_j) / (n − 1), accumulated over rows
    SHIFTED by an approximate mean vector (shifted-Gram form).

    Why the shift: the raw Gram-minus-means formula loses ~N·eps
    relative precision as N grows (catastrophic cancellation once
    S_ij ≫ cov_ij), which would eventually hash-mismatch a fixed-dp
    oracle pin even with both engines "correct". Shifting by a ≈ μ
    makes S'_ij itself O(n·cov), so the subtraction is benign at any
    N — the standard single-full-pass stabilization. The shift
    estimate is a bounded 1024-row sample chosen by ordering on
    xxhash64 of the vector bytes — a pure function of the DATA, not of
    partitioning or scan order (a bare limit() would pick whichever
    rows the scheduler reached first, re-introducing run-to-run
    last-ulp drift); TakeOrderedAndProject keeps it a per-partition
    top-k heap, no full sort shuffle. Covariance is exactly
    shift-invariant in exact arithmetic, so any estimate is CORRECT —
    a better estimate only tightens rounding; callers at 100 TB who
    want to skip the extra scan can precompute and pass
    :func:`gram_pairs` an explicit shift."""
    head = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("array<double>")))
        .limit(1024)
        .collect()
    )
    shift = None
    if head:
        import numpy as np

        vecs = [r[0] for r in head if r[0] is not None and len(r[0]) == d]
        if vecs:
            shift = np.asarray(vecs, dtype=np.float64).mean(axis=0)
    g = gram_pairs(df, vec_col, d, shift=shift)
    n = F.col("n_rows").cast("double")
    cov = (F.col("s_ij") - (F.col("sum_i") * F.col("sum_j")) / n) / (n - 1)
    # True column mean of dimension i, recovered from the SHIFTED sums:
    # mean_i = shift_i + sum'_i / n. Free to emit (the sums are already
    # in the partial rows), and it saves downstream consumers (PCA
    # projection centering) a second scan of the data.
    if shift is None:
        mean_i = F.col("sum_i") / n
    else:
        mean_i = (
            F.element_at(F.lit([float(s) for s in shift]), F.col("i"))
            + F.col("sum_i") / n
        )
    return g.select("i", "j", cov.alias("cov"), "n_rows", mean_i.alias("mean_i"))


def project_expr(vec_col, mean, component):
    """Scan-side projection of an ``array<float>`` column onto a fixed
    direction after centering: Σ_i (x_i − mean_i)·component_i.

    ``mean`` and ``component`` are length-d Python sequences embedded
    as ARRAY LITERALS in the plan (model state broadcast as constants —
    the scale-right pattern for applying a driver-fitted model): the
    whole expression is Catalyst HOFs (two zip_with + one aggregate
    left-fold), no shuffle, no Python, embarrassingly parallel over the
    scan. The fold adds terms in index order, so the floating-point
    summation order is pinned and identical on every executor."""
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.lit([float(m) for m in mean]),
        lambda x, m: x - m,
    )
    return F.aggregate(
        F.zip_with(centered, F.lit([float(c) for c in component]), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, y: acc + y,
    )


def power_iteration_top_eig(cov_rows: list, d: int, iters: int = 200) -> tuple:
    """Driver-side top eigenpair from collected (i, j, cov) upper-
    triangle rows — O(d²) memory/flops, independent of N by design
    (the distributed phase already reduced the data to d²/2 numbers).
    Deterministic: starts from the all-ones vector. Returns
    (eigenvalue, eigenvector ndarray)."""
    import numpy as np

    C = np.zeros((d, d))
    for r in cov_rows:
        i, j, c = int(r["i"]) - 1, int(r["j"]) - 1, float(r["cov"])
        C[i, j] = c
        C[j, i] = c
    v = np.ones(d) / np.sqrt(d)
    for _ in range(iters):
        w = C @ v
        nw = np.linalg.norm(w)
        if nw == 0.0:
            return 0.0, v
        v = w / nw
    lam = float(v @ (C @ v))
    # sign convention: first nonzero component positive
    nz = np.flatnonzero(np.abs(v) > 1e-12)
    if len(nz) and v[nz[0]] < 0:
        v = -v
    return lam, v


def power_iteration_components(
    cov_rows: list, d: int, n_components: int = 2, iters: int = 200
) -> list:
    """Top-k eigenpairs by power iteration + Hotelling deflation,
    driver-side over the collected d² covariance (O(k·d²) flops,
    independent of N — the distributed Gram phase already reduced the
    data). Deterministic: every component starts from 1/sqrt(d),
    runs a FIXED `iters` matvec+normalize steps (a pure function of
    the matrix — ulp perturbations decay toward the same fixpoint,
    which is what makes the recursive-CTE oracle reproducible), takes
    the Rayleigh eigenvalue BEFORE the sign fix (deflation is
    sign-invariant), then pins the first nonzero component positive.
    Returns [(eigenvalue, eigenvector ndarray), ...]."""
    import numpy as np

    C = np.zeros((d, d))
    for r in cov_rows:
        i, j, c = int(r["i"]) - 1, int(r["j"]) - 1, float(r["cov"])
        C[i, j] = c
        C[j, i] = c
    out = []
    for _ in range(n_components):
        v = np.ones(d) / np.sqrt(d)
        for _ in range(iters):
            w = C @ v
            nw = np.linalg.norm(w)
            if nw == 0.0:
                break
            v = w / nw
        lam = float(v @ (C @ v))
        C = C - lam * np.outer(v, v)
        nz = np.flatnonzero(np.abs(v) > 1e-12)
        if len(nz) and v[nz[0]] < 0:
            v = -v
        out.append((lam, v))
    return out
