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

    Scale shape: one shuffle on the group key, then a per-group sort on
    the 32-hex-char rank key. For pathologically large single groups,
    pre-filter with a hash threshold (keep rows whose bucket is below
    ~k/|group| + slack, then rank the survivors) to cap the sorted set —
    same result, bounded memory.
    """
    rank_key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(rank_key, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def capped_topk_by_hash(
    df: DataFrame, group_col: str, id_col: str, k: int, salt: str = "",
    slack: float = 10.0,
) -> DataFrame:
    """EXACT k-per-group selection by md5-hash order that stays fast
    when one group is enormous (the one-domain-is-30%-of-the-crawl
    case, where a naive per-group window sorts the whole domain in one
    task).

    Two phases:
      1. group sizes n_g (one cheap agg) → per-group keep-fraction
         f_g = min(1, (k + slack·√k + 20) / n_g); prefilter rows to
         u < f_g where u = :func:`md5_uniform`. Survivor counts are
         Binomial(n_g, f_g): P[< k survivors] < e^-40 at any n_g.
      2. rank the survivors per group, keep the k smallest.

    EXACTNESS IS DETERMINISTIC, NOT PROBABILISTIC: the survivors are
    exactly the rows with u below the threshold, so if a group has
    ≥ k survivors, the global k smallest u of that group are ALL
    survivors — identical output to the unfiltered window. Groups that
    (astronomically rarely) end up with < min(k, n_g) survivors are
    re-ranked WITHOUT the prefilter via a targeted fallback, so the
    result is always exact. The window now sorts O(k + slack·√k) rows
    per group instead of n_g."""
    u = md5_uniform(id_col, salt)
    sizes = df.groupBy(group_col).agg(F.count("*").alias("__n_g"))
    keep = F.least(
        F.lit(1.0),
        (F.lit(float(k) + slack * (k ** 0.5) + 20.0)) / F.col("__n_g"),
    )
    with_u = df.join(sizes, group_col).withColumn("__u", u)
    survivors = with_u.filter(F.col("__u") < keep)
    # deterministic certificate: a group is safe iff it kept
    # min(k, n_g) rows — then its true top-k are provably all here
    counts = survivors.groupBy(group_col).agg(F.count("*").alias("__n_s"))
    status = sizes.join(counts, group_col, "left").select(
        group_col,
        (F.coalesce(F.col("__n_s"), F.lit(0))
         >= F.least(F.lit(k), F.col("__n_g"))).alias("__safe"),
    )
    safe = survivors.join(
        status.filter(F.col("__safe")).select(group_col), group_col, "left_semi"
    )
    unsafe_groups = status.filter(~F.col("__safe")).select(group_col)
    fallback = with_u.join(unsafe_groups, group_col, "left_semi")
    pool = safe.unionByName(fallback)
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), F.col(id_col)
    )
    return (
        pool.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__u", "__n_g")
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
    id. Scale shape: one shuffle on the group key (same as
    :func:`reservoir_per_group`). For a giant skewed group, the
    :func:`capped_topk_by_hash` prefilter pattern applies with a
    weight-aware threshold (u < f^w keeps all A-ES winners whose key
    beats -ln(f)/1 for w ≥ 1); not wired here because A-ES groups in
    this engine are source-sized, not crawl-sized."""
    u = md5_uniform(id_col, salt)
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.withColumn("__aes_key", key)
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy(group_col).orderBy(F.col("__aes_key").asc(), F.col(id_col))
        ))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__aes_key")
    )
