"""Deterministic sampling & train/val splits (SURVEY §2.11 [EXT]).

Training-data pipelines need samples and splits that are REPRODUCIBLE
across runs, engines, and cluster sizes — `rand()`-based sampling is
none of those. Everything here keys off md5(id), which computes
identically in Spark, DuckDB, and any other engine, so a "10% sample"
is the same 10% everywhere, forever, and is embarrassingly parallel
(a scan-side filter: no shuffle, prunes at the source when combined
with partition predicates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col, buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, buckets) from md5 of the id (+ salt).
    Uses the first 8 hex chars → 32-bit int → mod. Engine-portable."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 8), 16, 10)
    return (h.cast("long") % buckets).cast("int")


def deterministic_sample(df: DataFrame, id_col: str, pct: int, salt: str = "") -> DataFrame:
    """Keep rows whose hash bucket < pct (pct in [0,100])."""
    return df.filter(hash_bucket(id_col, 100, salt) < pct)


def stratified_sample(
    df: DataFrame, id_col: str, strata_col: str, fractions: dict[str, int],
    default_pct: int = 0, salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum value → percentage
    kept (0-100); unlisted strata keep ``default_pct``. The Spark-native
    ``sampleBy`` is seed-stable only within one Spark version and one
    partitioning — this is stable across engines, runs, and cluster
    sizes, because membership is a pure function of (id, salt). Used
    for domain up/down-sampling against mixture weights
    (``source_mixture_weights``)."""
    b = hash_bucket(id_col, 100, salt)
    pct = F.lit(default_pct)
    for value, p in sorted(fractions.items()):
        pct = F.when(F.col(strata_col) == value, F.lit(p)).otherwise(pct)
    return df.filter(b < pct)


def train_val_test_split(
    df: DataFrame, id_col: str, val_pct: int = 10, test_pct: int = 10, salt: str = "",
) -> DataFrame:
    """Add a ``split`` column: test | val | train, disjoint and stable.
    Same row → same split on every run and every engine."""
    b = hash_bucket(id_col, 100, salt)
    split = (
        F.when(b < test_pct, "test")
        .when(b < test_pct + val_pct, "val")
        .otherwise("train")
    )
    return df.withColumn("split", split)


def reservoir_per_group(
    df: DataFrame, group_col: str, id_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Deterministic k-per-group sample: rank rows inside each group by
    md5(id + salt) and keep the first k — the reproducible analog of a
    per-group reservoir sample. Membership is a pure function of
    (id, salt, the group's id set), so the same k rows come back on any
    engine, any run, any cluster size.

    Scale shape: Catalyst rewrites row_number()+filter(≤k) to
    WindowGroupLimit with a PARTIAL phase — per-input-partition top-k
    heaps run BEFORE the shuffle, so even a pathologically large group
    ships only k rows per map partition (measured: 2.2 s on a 20M-row
    90%-skewed input where a hand-rolled hash-threshold prefilter took
    62 s; plan shape asserted in tests/test_plan_shapes.py).
    """
    rank_key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(rank_key, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def md5_uniform(col, salt: str = "") -> Column:
    """Deterministic uniform in (0, 1] from md5(id + salt): the first
    13 hex chars are a 52-bit integer — exactly representable as a
    double — divided by 2^52. Bit-identical on any engine that has md5
    and IEEE doubles (DuckDB: ``CAST('0x' || substring(md5(..),1,13) AS
    UBIGINT) / 2^52``), unlike rand(seed), which is engine- and
    partitioning-specific. The +1 offset avoids u = 0 (ln(0) below)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 13), 16, 10
    )
    return (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 52))


def weighted_sample_per_group(
    df: DataFrame, group_col: str, id_col: str, weight_col: str, k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group, via the
    Efraimidis–Spirakis A-ES scheme: rank each row by
    key = -ln(u) / w (u = :func:`md5_uniform`, w = its weight) and keep
    the k smallest per group — inclusion probability proportional to
    weight, exactly the one-pass reservoir scheme, but DETERMINISTIC
    (u is a pure function of id+salt) so the same k rows come back on
    any engine, run, or cluster size.

    Cross-engine note: ln() may differ in the last ulp across libms —
    a rank flip needs two keys within ~2 ulp, probability ≈ n²·1e-16
    per group, negligible for any real group size; ties then break on
    id. Scale shape: same WindowGroupLimit partial top-k as
    :func:`reservoir_per_group` — the rank+filter(≤k) pattern ships
    only k rows per map partition regardless of group skew.

    Weights must be strictly positive (the Efraimidis–Spirakis
    precondition): w = 0 would give key = inf and w < 0 a negative
    key that sorts FIRST, silently guaranteeing inclusion of the
    invalid row — so non-positive weights raise at execution time."""
    u = md5_uniform(id_col, salt)
    w = F.col(weight_col).cast("double")
    # Guard inside the key expression itself (not a droppable side
    # column, which column pruning could eliminate): any non-positive
    # weight fails the job loudly instead of skewing the sample.
    w_checked = F.when(w > 0.0, w).otherwise(
        F.raise_error(F.concat(
            F.lit("weighted_sample_per_group: non-positive weight "),
            w.cast("string"),
        ))
    )
    key = -F.log(u) / w_checked
    return (
        df.withColumn("__aes_key", key)
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy(group_col).orderBy(F.col("__aes_key").asc(), F.col(id_col))
        ))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__aes_key")
    )
