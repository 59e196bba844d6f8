"""Lineage pinning with an opt-in RELIABLE checkpoint path.

Iterative operators (graph rounds, star contraction, the Blelloch
scans, AdaBoost's weight chain) must truncate lineage every few
rounds or round N's plan grows linearly with N. The default cut is
``localCheckpoint(eager=True)`` — executor-local block storage, no
extra I/O, but **non-fault-tolerant by definition**: the blocks die
with their executor, and because the lineage is gone Spark cannot
recompute them, so on a real multi-hour 100-TB job one lost executor
kills the whole job (VERDICT r6 item 4).

Opt-in cure: set the session conf

    spark.conf.set("spark.openCrimeEtl.reliableCheckpointDir",
                   "hdfs://.../ckpt")   # or s3a://, or file:/...

and every ``pin()`` in the package becomes a reliable
``DataFrame.checkpoint(eager=...)`` into that directory (surviving
executor loss; Spark recomputes downstream from the checkpoint
files). Default behavior — conf unset — is byte-identical to the old
``localCheckpoint`` calls. The knob is a *session* conf so callers
opt in per-job without threading a parameter through every operator
signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CONF_KEY = "spark.openCrimeEtl.reliableCheckpointDir"

# setCheckpointDir() appends a UUID subdir, so getCheckpointDir() never
# equals the configured value — remember what we set per application.
_SET_FOR: dict[str, str] = {}


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage: reliable ``checkpoint()`` when
    ``spark.openCrimeEtl.reliableCheckpointDir`` is set, else
    ``localCheckpoint`` (the fast, non-fault-tolerant default)."""
    spark = df.sparkSession
    ckdir = spark.conf.get(CONF_KEY, None)
    if not ckdir:
        return _reset_runaway_stats(df.localCheckpoint(eager=eager))
    sc = spark.sparkContext
    if _SET_FOR.get(sc.applicationId) != ckdir:
        sc.setCheckpointDir(ckdir)
        _SET_FOR[sc.applicationId] = ckdir
    return _reset_runaway_stats(df.checkpoint(eager=eager))


# Catalyst's LogicalRDD INHERITS the checkpointed plan's sizeInBytes
# statistic. In an iterative operator every round's joins MULTIPLY that
# BigInt, so across rounds the statistic's digit count grows ~4x per
# round; by round ~10 the driver spends entire seconds per replan in
# BigInteger.multiplyToomCook3 (measured: a 17-round prefix-doubling
# loop went 0.2s -> 38s PER ROUND on 10k constant rows purely from stat
# arithmetic). Leave real stats alone — they let Catalyst broadcast
# small pinned frames — and reset only once the stat is past any
# physical plausibility (2^127 bytes), where its only remaining effect
# is the quadratic BigInt churn.
_STAT_SANITY_BITS = 127


def _reset_runaway_stats(ck: DataFrame) -> DataFrame:
    try:
        jqe = ck._jdf.queryExecution()
        # py4j converts the scala BigInt to a Python int
        bits = int(jqe.optimizedPlan().stats().sizeInBytes()).bit_length()
        if bits <= _STAT_SANITY_BITS:
            return ck
        spark = ck.sparkSession
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jqe.toRdd(), ck._jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception:
        return ck  # private-API drift: degrade to inherited stats
