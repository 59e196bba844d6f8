"""Skew mitigation for equi-joins (SURVEY.md §4 shuffle strategy).

AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) splits
oversized shuffle partitions automatically and is the first line of
defense. Salting is the explicit fallback for the cases AQE can't fix
— a single hot key that exceeds one task's memory no matter how
partitions split, or a skewed *aggregation* key. The transform:

    large ⋈ small on k
  ≡ (large + salt ∈ [0,B)) ⋈ (small × B salts) on (k, salt)

The hot key's rows spread across B tasks; the small side replicates
B×, which is the explicit trade (use only when small really is small,
or salt only the hot keys via a skew-key list).

Results are exactly the plain join's — the salt is a distribution
detail — so the operator is verified against an unsalted oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Equi-join with the large side salted across ``salt_buckets``.

    ``hot_keys``: optional one-column-per-key DataFrame restricting
    salting to the listed keys — unlisted keys get salt 0 and the small
    side replicates only for hot keys, keeping the replication cost
    proportional to the skew, not the dimension size.
    """
    salts = F.array(*[F.lit(i) for i in range(salt_buckets)])
    # Deterministic-enough spread: hash of the row id stream. The salt
    # value never affects RESULTS (only task placement), so task-retry
    # nondeterminism here is benign.
    spread = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))

    if hot_keys is not None:
        hot = F.broadcast(hot_keys.select(*on).distinct().withColumn("__hot", F.lit(1)))
        l = (
            large.join(hot, on=on, how="left")
            .withColumn(_SALT, F.when(F.col("__hot").isNotNull(), spread).otherwise(F.lit(0)))
            .drop("__hot")
        )
        s = (
            small.join(hot, on=on, how="left")
            .withColumn(
                "__salts",
                F.when(F.col("__hot").isNotNull(), salts).otherwise(F.array(F.lit(0))),
            )
            .drop("__hot")
            .withColumn(_SALT, F.explode("__salts"))
            .drop("__salts")
        )
    else:
        l = large.withColumn(_SALT, spread)
        s = small.withColumn(_SALT, F.explode(salts))
    return l.join(s, on=[*on, _SALT], how=how).drop(_SALT)


def salted_count(df: DataFrame, keys: list[str], salt_buckets: int = 16) -> DataFrame:
    """Two-phase count for skewed aggregation keys: partial count on
    (keys, salt) then final sum on keys — the map-side-combine idea made
    explicit when one key floods a reducer."""
    spread = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    partial = (
        df.withColumn(_SALT, spread)
        .groupBy(*keys, _SALT)
        .agg(F.count("*").alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").cast("long").alias("n"))
