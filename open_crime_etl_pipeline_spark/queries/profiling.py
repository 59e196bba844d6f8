"""Data-quality profiling and mergeable distinct-set sketches
(SURVEY.md §2.4 A6/A8 [EXT] — the dbt-check family generalized to a
whole-table profile, plus the KMV/theta sketch that closes the one
set operation HLL cannot do: distinct-INTERSECTION estimation).

The profiler is the Deequ/dbt-docs shape: every column's null count,
exact distinct count, and min/max in ONE scan of the table. The KMV
(k-minimum-values / theta) sketch is the Broder/DataSketches
construction: keep the k smallest values of a uniform hash of the
set; theta = k-th smallest normalized to [0,1) estimates density, so
|S| ~= (k-1)/theta, and because sketches union losslessly (k smallest
of A union B = k smallest of sketch(A) union sketch(B)) the Jaccard of
two sets is estimable from their sketches alone — which HLL's
union-only algebra cannot deliver.

Hash portability: the oracle must replay the sketch exactly, so the
hash is a Knuth multiplicative LCG over a 33-bit prime modulus —
(uid * 2654435761 + 104729) % 4294967311 — pure BIGINT arithmetic
with no overflow on either engine (precedent: the CDC polynomial
fold hashes). Production note: swap in xxhash64 when oracle
portability is not required; the estimator is hash-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..partitioning import fan_out
from .core import _t, dec2
from .registry import register

# One SELECT per profiled column, same metric tuple each — the oracle
# pays 6 scans where the Spark plan pays one; values are identical.
_PROFILE_ORACLE = """
    SELECT 'o_orderkey' AS column_name,
           count(*) - count(o_orderkey) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_val,
           CAST(max(o_orderkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*) - count(o_custkey), count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*) - count(o_totalprice), count(DISTINCT o_totalprice),
           CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR),
           CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*) - count(o_orderdate), count(DISTINCT o_orderdate),
           strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*) - count(o_orderpriority), count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
"""


@register(
    "table_profile_single_pass",
    oracle=_PROFILE_ORACLE,
    doc="Whole-table column profile (null count, exact distinct, min/max) "
    "for every orders column in one scan.",
    tags=("profiling", "agg"),
)
def table_profile_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All per-column metrics in a SINGLE aggregation over a SINGLE
    scan: Catalyst plans the multi-column count(DISTINCT ...) set as
    one Expand (each row fans out once per distinct-aggregate group)
    feeding one partial+final aggregate — the table is read once
    however many columns are profiled, where the naive per-column
    loop (and the SQL oracle) reads it N times. At 100 TB that is the
    difference between one pass and six.

    The 1-row × 24-metric agg result is then unpivoted driver-free:
    inline() over a literal array of per-column structs. Numeric
    min/max stringify through DECIMAL(12,2) and timestamps through a
    pinned format so both engines render identical text.
    """
    # the multi-distinct Expand (x7 row fan-out) + the sort-based
    # partial aggregate over it run scan-side: a single-split input
    # file would serialize ~1M wide rows through one core (guide §2.5)
    orders = fan_out(_t(spark, sf_dir, "orders"))

    ident = lambda c: c.cast("string")  # noqa: E731
    money = lambda c: c.cast("decimal(12,2)").cast("string")  # noqa: E731
    tstxt = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    cols = [
        ("o_orderkey", ident),
        ("o_custkey", ident),
        ("o_orderstatus", ident),
        ("o_totalprice", money),
        ("o_orderdate", tstxt),
        ("o_orderpriority", ident),
    ]
    # r12 split: one fused agg put the string min/max partials into the
    # multi-distinct Expand's grouped aggregate, and a min/max(string)
    # buffer is var-width — Spark falls back to SortAggregate, paying
    # two full sorts of the x7-expanded table (the dominant stage: 45.8s
    # executor time at sf0.1). Split the metrics: the count_distinct set
    # (fixed-width count buffers -> HashAggregate over the Expand) and
    # the null/min/max set (KEYLESS aggregate -> no sort regardless of
    # buffer width; one cheap extra scan). Values are identical; the
    # x7-expanded sort disappears from the plan.
    dist = orders.agg(
        *[F.count_distinct(F.col(c)).alias(f"{c}__nd") for c, _ in cols]
    )
    mm = orders.agg(
        *[
            m
            for c, conv in cols
            for m in (
                F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nn"),
                conv(F.min(c)).alias(f"{c}__mn"),
                conv(F.max(c)).alias(f"{c}__mx"),
            )
        ]
    )
    wide = mm.crossJoin(F.broadcast(dist))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__nn").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_val"),
                F.col(f"{c}__mx").alias("max_val"),
            )
            for c, _ in cols
        ]
    )
    return wide.select(F.inline(rows))


# KMV parameters: k smallest distinct hashes; 33-bit prime modulus.
_K = 64
_M = 4294967311  # smallest prime > 2^32
_HASH = "(user_id * 2654435761 + 104729) % 4294967311"

_KMV_ORACLE = f"""
    WITH ha AS (SELECT DISTINCT {_HASH} AS h FROM events
                WHERE event_type = 'click' AND user_id % 3 != 0),
         hb AS (SELECT DISTINCT {_HASH} AS h FROM events
                WHERE event_type = 'purchase' AND user_id % 4 != 0),
         ka AS (SELECT h FROM ha ORDER BY h LIMIT {_K}),
         kb AS (SELECT h FROM hb ORDER BY h LIMIT {_K}),
         ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) ORDER BY h LIMIT {_K}),
         sz AS (SELECT (SELECT count(*) FROM ha) AS na, (SELECT count(*) FROM hb) AS nb,
                       (SELECT count(*) FROM ka) AS ca, (SELECT count(*) FROM kb) AS cb,
                       (SELECT count(*) FROM ku) AS cu,
                       (SELECT max(h) FROM ka) AS ta, (SELECT max(h) FROM kb) AS tb,
                       (SELECT max(h) FROM ku) AS tu,
                       (SELECT count(*) FROM ku
                        WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)) AS rho,
                       (SELECT count(*) FROM (SELECT user_id FROM events
                                              WHERE event_type = 'click' AND user_id % 3 != 0
                                              INTERSECT
                                              SELECT user_id FROM events
                                              WHERE event_type = 'purchase' AND user_id % 4 != 0)) AS xi
                FROM (SELECT 1))
    SELECT round(CASE WHEN ca < {_K} THEN CAST(ca AS DOUBLE)
                      ELSE {_K - 1}.0 * {_M}.0 / CAST(ta AS DOUBLE) END, 6) AS est_distinct_a,
           round(CASE WHEN cb < {_K} THEN CAST(cb AS DOUBLE)
                      ELSE {_K - 1}.0 * {_M}.0 / CAST(tb AS DOUBLE) END, 6) AS est_distinct_b,
           round(CASE WHEN cu < {_K} THEN CAST(cu AS DOUBLE)
                      ELSE {_K - 1}.0 * {_M}.0 / CAST(tu AS DOUBLE) END, 6) AS est_union,
           round(CAST(rho AS DOUBLE) / {_K}.0, 6) AS est_jaccard,
           round(CAST(rho AS DOUBLE) / {_K}.0 *
                 (CASE WHEN cu < {_K} THEN CAST(cu AS DOUBLE)
                       ELSE {_K - 1}.0 * {_M}.0 / CAST(tu AS DOUBLE) END), 6) AS est_intersection,
           CAST(xi AS BIGINT) AS exact_intersection,
           abs(CAST(rho AS DOUBLE) / {_K}.0 *
               (CASE WHEN cu < {_K} THEN CAST(cu AS DOUBLE)
                     ELSE {_K - 1}.0 * {_M}.0 / CAST(tu AS DOUBLE) END) - CAST(xi AS DOUBLE))
               <= 0.375 * CAST(xi AS DOUBLE) AS within_bound
    FROM sz
"""


@register(
    "kmv_theta_intersection_estimate",
    oracle=_KMV_ORACLE,
    doc="KMV/theta sketch (k=64) distinct + Jaccard + INTERSECTION "
    "estimates for click vs purchase user sets, certified against the "
    "exact intersection (3/sqrt(k) bound).",
    tags=("profiling", "sketch"),
)
def kmv_theta_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase mergeable construction: hashes are bucketed by h % 32
    and each bucket keeps its k smallest DISTINCT values in a bounded
    sort_array(collect_set) (≤ bucket cardinality, never the full set);
    the per-group merge then takes the k smallest of ≤ 32k candidates —
    the same partial/final split every mergeable sketch here uses
    (HLL, CMS, KLL), so no executor ever materializes a full distinct
    set. Estimates, the KMV Jaccard (rho/k over the union sketch), and
    the certificate are computed from the two k-length arrays in one
    broadcast-joined row.

    est(|S|) = (k-1)/theta with theta = k-th smallest hash / M; the
    intersection estimate est_jaccard * est_union is the quantity HLL
    sketches cannot produce without inclusion-exclusion blowup.
    """
    ev = _t(spark, sf_dir, "events")
    # deterministically divergent user subsets (id-modulus carve-outs) so
    # the Jaccard/rho path is exercised away from the trivial 1.0
    side = (F.col("event_type") == "click") & (F.col("user_id") % 3 != 0) | (
        F.col("event_type") == "purchase"
    ) & (F.col("user_id") % 4 != 0)
    hashed = (
        ev.filter(side)
        .select(
            "event_type",
            ((F.col("user_id") * F.lit(2654435761)) + F.lit(104729)).__mod__(F.lit(_M)).alias("h"),
        )
    )
    # phase 1: per-(group, bucket) k smallest distinct hashes
    part = (
        hashed.withColumn("bucket", F.col("h") % 32)
        .groupBy("event_type", "bucket")
        .agg(F.slice(F.sort_array(F.collect_set("h")), 1, _K).alias("ks"))
    )
    # phase 2: per-group merge — k smallest of the union of bucket sketches
    sk = part.groupBy("event_type").agg(
        F.slice(F.array_sort(F.array_distinct(F.flatten(F.collect_list("ks")))), 1, _K).alias(
            "sketch"
        )
    )
    a = sk.filter(F.col("event_type") == "click").select(F.col("sketch").alias("ska"))
    b = sk.filter(F.col("event_type") == "purchase").select(F.col("sketch").alias("skb"))
    # exact intersection of the underlying user sets — the CERTIFICATE
    # truth only (two extra scans a production caller would drop; the
    # sketch product itself is the single `hashed` scan above)
    ua = (
        ev.filter((F.col("event_type") == "click") & (F.col("user_id") % 3 != 0))
        .select("user_id")
        .distinct()
    )
    ub = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 4 != 0))
        .select("user_id")
        .distinct()
    )
    xi = ua.intersect(ub).agg(F.count(F.lit(1)).alias("xi"))

    row = a.crossJoin(F.broadcast(b)).crossJoin(F.broadcast(xi))
    row = row.withColumn("sku", F.slice(F.array_sort(F.array_union("ska", "skb")), 1, _K))
    row = row.withColumn(
        "rho",
        F.expr("size(filter(sku, v -> array_contains(ska, v) AND array_contains(skb, v)))"),
    )

    # every CASE guards on SKETCH length: |sketch| < k means the sketch
    # holds the entire distinct hash set (lossless below k), so the
    # "estimate" is exact — no separate exact-distinct scan needed.
    # The least() clamp keeps element_at in bounds even if a future
    # rewrite stops CASE from short-circuiting the otherwise branch
    # (ANSI element_at throws on out-of-range).
    def est(sketch):
        kth = F.element_at(sketch, F.least(F.size(sketch), F.lit(_K)))
        return F.when(F.size(sketch) < _K, F.size(sketch).cast("double")).otherwise(
            F.lit(float(_K - 1)) * F.lit(float(_M)) / kth.cast("double")
        )

    est_u = est(F.col("sku"))
    est_i = (F.col("rho").cast("double") / F.lit(float(_K))) * est_u
    return row.select(
        F.round(est(F.col("ska")), 6).alias("est_distinct_a"),
        F.round(est(F.col("skb")), 6).alias("est_distinct_b"),
        F.round(est_u, 6).alias("est_union"),
        F.round(F.col("rho").cast("double") / F.lit(float(_K)), 6).alias("est_jaccard"),
        F.round(est_i, 6).alias("est_intersection"),
        F.col("xi").cast("bigint").alias("exact_intersection"),
        (F.abs(est_i - F.col("xi").cast("double")) <= F.lit(0.375) * F.col("xi").cast("double")).alias(
            "within_bound"
        ),
    )
