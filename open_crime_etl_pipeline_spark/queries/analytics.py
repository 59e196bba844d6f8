"""Window functions, sorts/top-k, and multi-dimensional aggregates
(SURVEY.md §2.5, §2.6, A8).

The reference has no OVER clause anywhere; these are the analytics its
warehouse roadmap declares (`readme.md:41-42`) plus the window surface
the merge/dedup operators need (J2's row_number is in pipeline.py).

Determinism rule for oracle parity: every window ordering and every
LIMIT carries a total tiebreak (append the key column) — otherwise the
two engines may legally disagree.

Scale notes: window partitions here are bounded (priority, nation,
day); a window over a huge unpartitioned ordering would single-task —
the global top-k uses orderBy+limit instead, which Spark executes as
per-partition partial top-k + merge (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import _t, davg, dec2, dsum, fmt_date
from .registry import register


@register(
    "topk_per_group",
    oracle="""
        SELECT o_orderpriority, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price,
               rnk
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   rank() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
            FROM orders
        ) WHERE rnk <= 3
    """,
    doc="Top-k per group via rank window (O3; ranking family §2.5).",
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            dec2("o_totalprice").cast("double").alias("total_price"),
            "rnk",
        )
    )


@register(
    "global_topk_orders",
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    doc="Global top-k: orderBy+limit → TakeOrderedAndProject, no full sort (O1/O3).",
    tags=("topk", "sort"),
)
def global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", dec2("o_totalprice").cast("double").alias("total_price"))
    )


@register(
    "lag_lead_daily_orders",
    oracle="""
        WITH daily AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_day, count(*) AS n_orders
            FROM orders WHERE o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
            GROUP BY strftime(o_orderdate, '%Y-%m-%d')
        )
        SELECT order_day, n_orders,
               CAST(lag(n_orders) OVER (ORDER BY order_day) AS BIGINT)  AS prev_n,
               CAST(lead(n_orders) OVER (ORDER BY order_day) AS BIGINT) AS next_n,
               CAST(n_orders - coalesce(lag(n_orders) OVER (ORDER BY order_day), 0) AS BIGINT) AS dod_delta
        FROM daily
    """,
    doc="lag/lead day-over-day deltas (analytic family §2.5).",
    tags=("window",),
)
def lag_lead_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.filter(F.col("o_orderdate") < F.lit("1995-04-01 00:00:00").cast("timestamp"))
        .groupBy(fmt_date("o_orderdate").alias("order_day"))
        .agg(F.count("*").alias("n_orders"))
    )
    w = Window.orderBy("order_day")
    return daily.select(
        "order_day",
        "n_orders",
        F.lag("n_orders").over(w).alias("prev_n"),
        F.lead("n_orders").over(w).alias("next_n"),
        (F.col("n_orders") - F.coalesce(F.lag("n_orders").over(w), F.lit(0))).alias("dod_delta"),
    )


@register(
    "rolling_7day_revenue",
    oracle="""
        WITH daily AS (
            SELECT CAST(l_shipdate AS DATE) AS ship_day,
                   date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS day_idx,
                   sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1995-07-01 00:00:00'
            GROUP BY 1, 2
        )
        SELECT strftime(ship_day, '%Y-%m-%d') AS ship_day,
               CAST(round(rev, 2) AS DOUBLE) AS day_revenue,
               CAST(round(sum(rev) OVER (ORDER BY day_idx
                    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS rolling_7d
        FROM daily
    """,
    doc="7-day rolling revenue via RANGE frame on a day index (frame-spec family §2.5).",
    tags=("window", "frame"),
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    daily = (
        li.filter(F.col("l_shipdate") < F.lit("1995-07-01 00:00:00").cast("timestamp"))
        .groupBy(
            F.col("l_shipdate").cast("date").alias("ship_day"),
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("day_idx"),
        )
        .agg(F.sum(dec2("l_extendedprice")).alias("rev"))
    )
    w = Window.orderBy("day_idx").rangeBetween(-6, 0)
    return daily.select(
        F.date_format("ship_day", "yyyy-MM-dd").alias("ship_day"),
        F.round("rev", 2).cast("double").alias("day_revenue"),
        F.round(F.sum("rev").over(w), 2).cast("double").alias("rolling_7d"),
    )


@register(
    "running_total_monthly",
    oracle="""
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS order_month,
                   count(*) AS n_orders,
                   sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
            FROM orders GROUP BY 1
        )
        SELECT order_month, n_orders,
               CAST(round(rev, 2) AS DOUBLE) AS month_revenue,
               CAST(sum(n_orders) OVER (ORDER BY order_month
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_orders,
               CAST(round(sum(rev) OVER (ORDER BY order_month
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS cum_revenue
        FROM monthly
    """,
    doc="Cumulative running totals with ROWS frame (frame-spec family §2.5).",
    tags=("window", "frame"),
)
def running_total_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month")).agg(
        F.count("*").alias("n_orders"), F.sum(dec2("o_totalprice")).alias("rev")
    )
    w = Window.orderBy("order_month").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return monthly.select(
        "order_month",
        "n_orders",
        F.round("rev", 2).cast("double").alias("month_revenue"),
        F.sum("n_orders").over(w).alias("cum_orders"),
        F.round(F.sum("rev").over(w), 2).cast("double").alias("cum_revenue"),
    )


@register(
    "dense_rank_nations_by_spend",
    oracle="""
        WITH nation_spend AS (
            SELECT n.n_name AS nation_name,
                   sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS spend
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        )
        SELECT nation_name,
               CAST(round(spend, 2) AS DOUBLE) AS total_spend,
               dense_rank() OVER (ORDER BY spend DESC, nation_name) AS spend_rank
        FROM nation_spend
    """,
    doc="dense_rank over joined aggregate (ranking family §2.5 + J6).",
    tags=("window", "join"),
)
def dense_rank_nations_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.sum(dec2("o_totalprice")).alias("spend"))
    )
    w = Window.orderBy(F.col("spend").desc(), F.col("nation_name"))
    return spend.select(
        "nation_name",
        F.round("spend", 2).cast("double").alias("total_spend"),
        F.dense_rank().over(w).alias("spend_rank"),
    )


@register(
    "ntile_percent_rank_customers",
    oracle="""
        SELECT c_custkey,
               CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
               ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS balance_quartile,
               round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank
        FROM customer
    """,
    doc="ntile + percent_rank distribution analytics (§2.5 ranking family).",
    tags=("window",),
)
def ntile_percent_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        dec2("c_acctbal").cast("double").alias("acctbal"),
        F.ntile(4).over(w).alias("balance_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@register(
    "first_value_order_per_customer",
    oracle="""
        SELECT DISTINCT o_custkey,
               first_value(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS first_orderkey,
               strftime(first_value(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ), '%Y-%m-%d') AS first_order_day
        FROM orders
    """,
    doc="first_value analytic — earliest order per customer (§2.5).",
    tags=("window",),
)
def first_value_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        fmt_date(F.first("o_orderdate").over(w)).alias("first_order_day"),
    ).distinct()


@register(
    "rollup_returnflag_status",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals + grouping id (A8 dashboard slices).",
    tags=("agg", "rollup"),
)
def rollup_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            dsum("l_quantity").alias("sum_qty"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .select("l_returnflag", "l_linestatus", "n_rows", "sum_qty", "gid")
    )


@register(
    "cube_priority_status",
    oracle="""
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price,
               CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS INT) AS gid
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    doc="CUBE over two dimensions + grouping id (A8 dashboard slices).",
    tags=("agg", "cube"),
)
def cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            davg("o_totalprice").alias("avg_price"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .select("o_orderpriority", "o_orderstatus", "n_orders", "avg_price", "gid")
    )


@register(
    "approx_distinct_users",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS approx_ok
        FROM events GROUP BY event_type
    """,
    doc="approx_count_distinct / HLL sketch (A8). Sketch estimates are "
        "engine-specific, so the driver-checkable projection is the "
        "derived deterministic property: the estimate lands within 15% "
        "of the exact distinct count (3× the observed worst case at "
        "sf0.1 with Spark's default rsd=0.05) — a broken sketch path "
        "(wrong column, lost merge, garbage estimate) flips the boolean.",
    tags=("agg", "approx"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    ).select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.15 * F.col("exact_users")
        ).alias("approx_ok"),
    )


@register(
    "distinct_users_hll_sketch",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS hll_ok
        FROM events GROUP BY event_type
    """,
    doc="Mergeable DataSketches HLL distinct count (hll_sketch_agg + "
        "hll_sketch_estimate, lgK=14): unlike approx_count_distinct, the "
        "sketch itself is a first-class mergeable value — partial sketches "
        "union across partitions/days without re-scanning, the pattern for "
        "incremental distinct-count rollups over a 100 TB event stream. "
        "Driver-checkable certificate: estimate within the published "
        "3-sigma relative error 3*1.04/sqrt(2^14) ≈ 2.4% of exact (A8 "
        "[EXT]; estimate values are engine-specific).",
    tags=("agg", "approx", "sketch"),
)
def distinct_users_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bound = 3 * 1.04 / (2 ** 14) ** 0.5
    return ev.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").alias("hll_users"),
        F.countDistinct("user_id").alias("exact_users"),
    ).select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("hll_users") - F.col("exact_users"))
            <= bound * F.col("exact_users")
        ).alias("hll_ok"),
    )


@register(
    "global_rank_customers_by_spend",
    oracle="""
        WITH spend AS (
            SELECT o_custkey,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS spend
            FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey, spend,
               row_number() OVER (ORDER BY spend DESC, o_custkey) AS rn
        FROM spend
    """,
    doc="Contiguous global ranking of EVERY customer by spend via the "
        "two-pass range-partition + offset scheme (operators/ranking.py) — "
        "no single-partition window, so the plan that ranks 1.5k customers "
        "here ranks billions unchanged. Tie-break on custkey makes the "
        "order total (§2.5/2.6 scale path).",
    tags=("window", "ranking", "scale"),
)
def global_rank_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_row_number

    spend = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum(dec2("o_totalprice")), 2).cast("double").alias("spend"))
    )
    return global_row_number(
        spend, [F.col("spend").desc(), F.col("o_custkey").asc()], out_col="rn"
    )


@register(
    "quantile_sketch_rank_certificate",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               TRUE AS p50_ok,
               TRUE AS p90_ok
        FROM events GROUP BY event_type
    """,
    doc="approx_percentile sketch with a driver-checkable RANK certificate: "
        "the sketch guarantees rank error <= n/accuracy, so the returned "
        "p50/p90 values are re-ranked against the data (count of values <= "
        "estimate) and certified within n/1000 of the target rank — the "
        "exact value is engine-specific, the certificate is not. This is "
        "the 100 TB percentile path: one pass, mergeable partials, no "
        "global sort (A8 [EXT], sketch family with HLL/CMS).",
    tags=("agg", "approx", "sketch"),
)
def quantile_sketch_rank_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)).alias("ap")
    ).select(
        "event_type", F.col("ap")[0].alias("p50_est"), F.col("ap")[1].alias("p90_est")
    )
    tol = F.greatest(F.col("n_events") / 1000.0, F.lit(1.0))

    def rank_ok(q: float, lo: str, hi: str):
        # tie-robust: every value tied with the estimate occupies the
        # rank interval [count(value < est), count(value <= est)]; the
        # sketch met its guarantee iff that interval intersects
        # [q*n - tol, q*n + tol] (a `<=`-only count is the MAXIMAL rank
        # and falsely fails on heavily tied distributions)
        return (F.col(lo) <= q * F.col("n_events") + tol) & (
            F.col(hi) >= q * F.col("n_events") - tol
        )

    return (
        ev.join(F.broadcast(approx), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("value") < F.col("p50_est")).cast("long")).alias("r50_lo"),
            F.sum((F.col("value") <= F.col("p50_est")).cast("long")).alias("r50_hi"),
            F.sum((F.col("value") < F.col("p90_est")).cast("long")).alias("r90_lo"),
            F.sum((F.col("value") <= F.col("p90_est")).cast("long")).alias("r90_hi"),
        )
        .select(
            "event_type",
            "n_events",
            rank_ok(0.5, "r50_lo", "r50_hi").alias("p50_ok"),
            rank_ok(0.9, "r90_lo", "r90_hi").alias("p90_ok"),
        )
    )


@register(
    "hll_daily_rollup_merge",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS merged_ok
        FROM events GROUP BY event_type
    """,
    doc="The mergeability claim of distinct_users_hll_sketch, MEASURED: "
        "per-(event_type, day) HLL sketches built first (the daily rollup "
        "a 100 TB pipeline materializes), then hll_union_agg merges the "
        "daily sketches into the all-time estimate WITHOUT re-scanning "
        "events — certified within the 3-sigma bound of the exact distinct "
        "count. Re-aggregation over materialized partials is the whole "
        "point of sketch columns (ST8/A8 [EXT]).",
    tags=("agg", "approx", "sketch", "incremental"),
)
def hll_daily_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bound = 3 * 1.04 / (2 ** 14) ** 0.5
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.expr("hll_sketch_agg(user_id, 14)").alias("day_sketch"))
    merged = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.expr("hll_sketch_estimate(hll_union_agg(day_sketch))").alias("merged_users"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("merged_users") - F.col("exact_users"))
            <= bound * F.col("exact_users")
        ).alias("merged_ok"),
    )


@register(
    "gaps_islands_user_sessions",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts,
                   event_id,
                   CASE WHEN date_diff('second',
                            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                            ts) > 1800
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), numbered AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_no
            FROM marked
        )
        SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
               count(*) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
        FROM numbered
        GROUP BY user_id, session_no
    """,
    doc="Gaps-and-islands sessionization — the manual lag + running-sum "
        "form of session windows (30-min inactivity gap): a boundary "
        "flag from lag(), a running sum to number islands, then a "
        "per-island rollup. ONE shuffle on user_id serves both window "
        "functions and the final aggregate (§2.5; the native "
        "session_window twin is session_windows_30m).",
    tags=("window", "events", "agg"),
)
def gaps_islands_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # event_id tie-break in BOTH windows: with ties on (user_id, ts) an
    # ORDER BY ts alone leaves session assignment engine-dependent
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag("ts").over(w)
    new_session = (
        prev.isNull()
        | (F.col("ts").cast("long") - prev.cast("long") > 1800)
    ).cast("long")
    return (
        ev.withColumn("__new", new_session)
        .withColumn("session_no", F.sum("__new").over(wrun))
        .groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
    )


@register(
    "mode_event_type_per_user_bucket",
    oracle="""
        WITH counts AS (
            SELECT user_id % 10 AS user_bucket, event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT user_bucket, event_type AS modal_type, n AS n_events
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY user_bucket
                       ORDER BY n DESC, event_type) AS rn
            FROM counts
        ) WHERE rn = 1
    """,
    doc="Mode (most frequent value) per group with a deterministic "
        "tie-break: count + argmax via ranked window over the SMALL "
        "grouped-count table — the scan-sized data never enters the "
        "window (§2.5/2.6).",
    tags=("window", "agg", "events"),
)
def mode_event_type_per_user_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy(
        (F.col("user_id") % 10).alias("user_bucket"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_bucket").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_bucket", F.col("event_type").alias("modal_type"),
                F.col("n").alias("n_events"))
    )


@register(
    "percent_of_total_revenue",
    oracle="""
        WITH nat AS (
            SELECT n_name,
                   sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
            FROM orders
            JOIN customer ON c_custkey = o_custkey
            JOIN nation ON n_nationkey = c_nationkey
            GROUP BY n_name
        )
        SELECT n_name,
               CAST(round(rev, 2) AS DOUBLE) AS revenue,
               round(CAST(rev AS DOUBLE)
                     / CAST(sum(rev) OVER () AS DOUBLE), 6) AS pct_of_total
        FROM nat
    """,
    doc="Percent-of-total via an unpartitioned window over the ALREADY "
        "AGGREGATED per-nation table (25 rows) — the global window is "
        "safe exactly because aggregation shrank the data first; the "
        "orders scan itself sees only hash-partitioned aggregation "
        "(§2.5 ratio-to-report).",
    tags=("window", "agg", "join"),
)
def percent_of_total_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # customer is scale-proportional — shuffle join on the key (AQE may
    # still broadcast at small SF); only the 25-row nation dim is a
    # legitimate forced broadcast
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(dec2("o_totalprice")).alias("rev"))
    )
    wtot = Window.partitionBy()
    return nat.select(
        "n_name",
        F.round("rev", 2).cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(wtot).cast("double"), 6
        ).alias("pct_of_total"),
    )


@register(
    "forward_fill_missing_values",
    oracle="""
        SELECT user_id, event_id,
               round(last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING), 6) AS filled
        FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
            FROM events
        )
    """,
    doc="Forward-fill / last-observation-carried-forward: nulls (here, "
        "'error' readings) take the most recent non-null per user — the "
        "standard gap-fill for sensor/metric series. One window pass "
        "with IGNORE NULLS semantics (Spark last(ignorenulls) ≡ DuckDB "
        "last_value IGNORE NULLS), event_id tie-break for total order; "
        "one shuffle on user_id (§2.5 [EXT]).",
    tags=("window", "events", "cleaning"),
)
def forward_fill_missing_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type", "value")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.withColumn("__v", v).select(
        "user_id",
        "event_id",
        F.round(F.last("__v", ignorenulls=True).over(w), 6).alias("filled"),
    )


@register(
    "interpolate_missing_values",
    oracle="""
        WITH pts AS (
            SELECT user_id, event_id, ts, epoch_us(ts) AS us,
                   CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
            FROM events
        ), ctx AS (
            SELECT user_id, event_id, us, v,
                   last_value(v IGNORE NULLS) OVER w_prev AS prev_v,
                   last_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
                       OVER w_prev AS prev_us,
                   first_value(v IGNORE NULLS) OVER w_next AS next_v,
                   first_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
                       OVER w_next AS next_us
            FROM pts
            WINDOW w_prev AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING),
                   w_next AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, event_id,
               round(CASE
                   WHEN v IS NOT NULL THEN v
                   WHEN prev_v IS NULL THEN next_v
                   WHEN next_v IS NULL THEN prev_v
                   WHEN next_us = prev_us THEN prev_v
                   ELSE prev_v + (next_v - prev_v)
                        * (CAST(us - prev_us AS DOUBLE)
                           / CAST(next_us - prev_us AS DOUBLE))
               END, 6) AS filled
        FROM ctx
    """,
    doc="Linear time-interpolation of missing readings: each null takes "
        "prev + (next-prev) * elapsed-fraction between its non-null "
        "neighbors (edges fall back to nearest) — the pandas "
        "interpolate(method='time') semantics as TWO window passes over "
        "one shuffle on user_id. Microsecond epochs keep the fraction "
        "arithmetic integer-derived, so the doubles are engine-identical "
        "(§2.5 [EXT], pairs with forward_fill_missing_values).",
    tags=("window", "events", "cleaning"),
)
def interpolate_missing_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type", "value")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    base = ev.select(
        "user_id", "event_id", "ts", F.unix_micros("ts").alias("us"), v.alias("v")
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    us_nn = F.when(F.col("v").isNotNull(), F.col("us"))
    ctx = base.select(
        "user_id", "event_id", "us", "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(us_nn, ignorenulls=True).over(w_prev).alias("prev_us"),
        F.first("v", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(us_nn, ignorenulls=True).over(w_next).alias("next_us"),
    )
    frac = (F.col("us") - F.col("prev_us")).cast("double") / (
        F.col("next_us") - F.col("prev_us")
    ).cast("double")
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .when(F.col("next_us") == F.col("prev_us"), F.col("prev_v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
    )
    return ctx.select("user_id", "event_id", F.round(filled, 6).alias("filled"))


@register(
    "histogram_value_width_bucket",
    oracle="""
        SELECT event_type,
               CAST(CASE WHEN value < 0.0 THEN 0
                         WHEN value >= 500.0 THEN 21
                         ELSE floor(value / 25.0) + 1 END AS INT) AS bucket,
               count(*) AS n
        FROM events
        GROUP BY 1, 2
    """,
    doc="Equi-width histogram via width_bucket (20 bins over [0, 500), "
        "out-of-range to the boundary buckets 0/21) — the fixed-bin "
        "profile a column-stats collector materializes; one partial-"
        "aggregated shuffle keyed (type, bucket). DuckDB has no "
        "width_bucket, so the oracle states Spark's exact arithmetic: "
        "floor(v / width) + 1 with width = (500-0)/20 = 25 exactly "
        "representable, making the bucket ids engine-identical "
        "(A8/F14 [EXT]).",
    tags=("agg", "events", "stats"),
)
def histogram_value_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.width_bucket("value", F.lit(0.0), F.lit(500.0), F.lit(20))
        .cast("int")
        .alias("bucket"),
    ).agg(F.count("*").alias("n"))


@register(
    "exact_percentiles_distributed",
    oracle="""
        WITH ranked AS (
            SELECT CAST(l_extendedprice AS DOUBLE) AS v,
                   row_number() OVER (ORDER BY CAST(l_extendedprice AS DOUBLE)) AS rn
            FROM lineitem
        ), n AS (SELECT max(rn) AS n FROM ranked),
        tgt AS (
            SELECT CAST(p AS DOUBLE) AS p,
                   GREATEST((num * (SELECT n FROM n) + den - 1) // den, 1) AS t
            FROM (VALUES (0.01, 1, 100), (0.1, 1, 10), (0.25, 1, 4),
                         (0.5, 1, 2), (0.75, 3, 4), (0.9, 9, 10),
                         (0.99, 99, 100)) AS f(p, num, den)
        )
        SELECT tgt.p AS p, r.v AS value
        FROM tgt JOIN ranked r ON r.rn = tgt.t
    """,
    doc="EXACT discrete percentiles (value at rank ceil(p*N), computed "
        "with INTEGER arithmetic — Fraction-exact driver ranks on the "
        "Spark side, (num*N + den - 1) // den in the oracle; no FP "
        "touches the rank at any N) "
        "of l_extendedprice via operators/ranking.exact_percentiles: "
        "range-partitioned global row numbers + driver offsets + a "
        "broadcast target-rank filter — one parallel ranked pass, no "
        "single-task global sort and no sketch error. The exact "
        "complement of quantile_sketch_rank_certificate (§2.5/2.6 scale "
        "path; LLM-data: exact token/length percentile cutoffs for "
        "curation thresholds).",
    tags=("window", "ranking", "scale", "percentile"),
)
def exact_percentiles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import exact_percentiles

    return exact_percentiles(
        _t(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99],
    )


@register(
    "weighted_percentiles_distributed",
    oracle="""
        WITH base AS (
            SELECT CAST(l_extendedprice AS DOUBLE) AS v,
                   CAST(l_quantity AS BIGINT) AS w,
                   l_orderkey, l_linenumber
            FROM lineitem
        ),
        summed AS (
            SELECT v, w,
                   sum(w) OVER (ORDER BY v, l_orderkey, l_linenumber
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_w
            FROM base
        ),
        tot AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM base),
        tgt AS (
            SELECT CAST(p AS DOUBLE) AS p,
                   GREATEST((num * (SELECT wt FROM tot) + den - 1) // den, 1)
                       AS t
            FROM (VALUES (0.1, 1, 10), (0.25, 1, 4), (0.5, 1, 2),
                         (0.75, 3, 4), (0.9, 9, 10)) AS f(p, num, den)
        )
        SELECT tgt.p AS p, s.v AS value
        FROM tgt JOIN summed s
          ON s.cum_w >= tgt.t AND s.cum_w - s.w < tgt.t
    """,
    doc="EXACT weighted percentiles of l_extendedprice with l_quantity "
        "as the weight (operators/ranking.weighted_percentiles): the "
        "smallest value whose cumulative weight reaches ceil(p*W), "
        "i.e. percentile_disc over the weight-expanded multiset WITHOUT "
        "materializing the expansion. Cumulative weights ride "
        "global_running_sums (range-partitioned two-pass prefix sums — "
        "never the single-task ORDER BY window the oracle can afford at "
        "sf0.1); thresholds are Fraction-exact integers; each p's "
        "answer is the unique crossing row, fetched by one broadcast "
        "join against the 5-row threshold table. The weighted twin of "
        "exact_percentiles_distributed (curation use: token-weighted "
        "length/score cutoffs, where long docs must count by mass).",
    tags=("window", "ranking", "scale", "percentile"),
)
def weighted_percentiles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import weighted_percentiles

    return weighted_percentiles(
        _t(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_quantity",
        ["l_orderkey", "l_linenumber"],
        [0.1, 0.25, 0.5, 0.75, 0.9],
    )


def _zorder_oracle() -> str:
    from ..operators.zorder import morton_sql

    z = morton_sql("user_id", "CAST(floor(value) AS BIGINT)", bits=16)
    return f"""
        WITH z AS (
            SELECT user_id AS x, CAST(floor(value) AS BIGINT) AS y,
                   {z} AS zkey
            FROM events
        )
        SELECT zkey // 16384 AS bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN x BETWEEN 100 AND 180
                              AND y BETWEEN 50 AND 120 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_match,
               (sum(CASE WHEN x BETWEEN 100 AND 180
                          AND y BETWEEN 50 AND 120 THEN 1 ELSE 0 END) > 0)
                   AS touched
        FROM z GROUP BY bucket
    """


@register(
    "zorder_multidim_pruning",
    oracle=_zorder_oracle(),
    doc="Z-order (Morton) layout keys + the pruning measurement for a "
        "2-D rectangle predicate (operators/zorder.py): interleave "
        "user_id and floor(value) bits into one long — pure "
        "shift/mask/add, codegen'd, bit-identical in both engines — "
        "bucket rows by the key's high bits (the file boundary a "
        "zkey-range-partitioned writer would produce), and report rows "
        "vs rectangle matches per bucket with a touched flag. The "
        "point at 100 TB: files sorted by ONE column prune only that "
        "column, while z-ordered files keep both dimensions local, so "
        "min-max stats skip most buckets for ANY rectangle — the "
        "lakehouse OPTIMIZE ZORDER technique (Morton 1966 / UB-tree), "
        "measured here as the fraction of untouched buckets. "
        "tests/test_zorder.py quantifies the locality win vs an "
        "x-major layout.",
    tags=("layout", "scale", "zorder", "pruning"),
)
def zorder_multidim_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.zorder import morton_key

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("x"),
        F.floor("value").cast("long").alias("y"),
    )
    z = ev.withColumn("zkey", morton_key(F.col("x"), F.col("y"), bits=16))
    match = F.when(
        F.col("x").between(100, 180) & F.col("y").between(50, 120), 1
    ).otherwise(0)
    return (
        z.groupBy(F.shiftright("zkey", 14).alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(match).cast("long").alias("n_match"),
        )
        .select(
            "bucket", "n_rows", "n_match", (F.col("n_match") > 0).alias("touched")
        )
    )


def _zorder_3d_oracle() -> str:
    from ..operators.zorder import morton_sql_nd

    z = morton_sql_nd(
        ["user_id", "CAST(floor(value) AS BIGINT)", "CAST(hour(ts) AS BIGINT)"],
        [16, 16, 5],
    )
    return f"""
        WITH z AS (
            SELECT user_id AS x, CAST(floor(value) AS BIGINT) AS y,
                   CAST(hour(ts) AS BIGINT) AS h,
                   {z} AS zkey
            FROM events
        )
        SELECT zkey // 2147483648 AS bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN h BETWEEN 3 AND 4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_match,
               (sum(CASE WHEN h BETWEEN 3 AND 4 THEN 1 ELSE 0 END) > 0)
                   AS touched
        FROM z GROUP BY bucket
    """


@register(
    "zorder_3d_uneven_pruning",
    oracle=_zorder_3d_oracle(),
    doc="3-D Morton layout with UNEVEN per-column bit budgets "
        "(operators/zorder.py morton_key_nd — round-8 verdict item 6): "
        "user_id (16 bits), floor(value) (16 bits), and hour-of-day "
        "(5 bits — its natural width; a uniform budget would waste 11 "
        "key bits encoding values that never exceed 23) interleave "
        "level-major into one 37-bit long, bucketed by the key's high "
        "bits. The predicate is selective ONLY on the THIRD, narrowest "
        "dimension (hour IN [3,4]) — exactly the case one-column or "
        "2-D layouts cannot prune — and the touched flags show which "
        "zkey-range files a min-max reader skips. Pure shift/mask/add "
        "in a codegen'd Project feeding one hash-aggregate Exchange; "
        "bit-identical arithmetic restated verbatim by the oracle via "
        "morton_sql_nd. tests/test_zorder.py pins the interleave "
        "against a Python reference and quantifies 3-D locality vs an "
        "x-major layout.",
    tags=("layout", "scale", "zorder", "pruning"),
)
def zorder_3d_uneven_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.zorder import morton_key_nd

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("x"),
        F.floor("value").cast("long").alias("y"),
        F.hour("ts").cast("long").alias("h"),
    )
    z = ev.withColumn(
        "zkey",
        morton_key_nd([F.col("x"), F.col("y"), F.col("h")], [16, 16, 5]),
    )
    match = F.when(F.col("h").between(3, 4), 1).otherwise(0)
    return (
        z.groupBy(F.shiftright("zkey", 31).alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(match).cast("long").alias("n_match"),
        )
        .select(
            "bucket", "n_rows", "n_match", (F.col("n_match") > 0).alias("touched")
        )
    )
