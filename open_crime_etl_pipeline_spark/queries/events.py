"""Event-time windowing + semi-structured props (SURVEY.md §2.8 ST10,
§2.7 F14) over the `events` table.

These run in batch mode with the exact grouping semantics Structured
Streaming's ``window()`` / ``session_window()`` use, so the logic is
reusable verbatim in a ``readStream`` pipeline (streaming/ module);
the DuckDB oracle reproduces window assignment with time_bucket /
gaps-and-islands SQL.

Scale notes: tumbling/sliding windows are plain group-bys (shuffle on
window key, partial agg map-side). Session windows shuffle once per
user and sort within the partition — Spark's native session_window does
exactly this; no per-user collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .core import _t, dec2
from .registry import register


@register(
    "tumbling_hourly_windows",
    oracle="""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        FROM events
        WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
        GROUP BY 1, 2
    """,
    doc="Tumbling event-time window ≡ window(ts, '1 hour') (ST10).",
    tags=("events", "window-time"),
)
def tumbling_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(dec2("value")), 2).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@register(
    "sliding_windows_1h_15m",
    oracle="""
        SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS window_start,
               count(*) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events, unnest([0, 1, 2, 3]) AS t(k)
        WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
        GROUP BY 1
    """,
    doc="Sliding window 1h/15m ≡ window(ts, '1 hour', '15 minutes'): each event in 4 windows (ST10).",
    tags=("events", "window-time"),
)
def sliding_windows_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "n_users")
    )


@register(
    "session_windows_30m",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL '30 minutes'
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
        ), sessions AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM marked
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '30 minutes' AS session_end,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS session_value
        FROM sessions
        GROUP BY user_id, session_id
    """,
    doc="Session windows, 30 min gap ≡ session_window(ts, '30 minutes'); oracle = gaps-and-islands (ST10).",
    tags=("events", "window-time", "session"),
)
def session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") < F.lit("2024-01-05 00:00:00").cast("timestamp"))
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(dec2("value")), 2).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@register(
    "json_props_extraction",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
               CAST(min(CAST(props->>'$.k' AS INT)) AS INT) AS min_k,
               CAST(max(CAST(props->>'$.k' AS INT)) AS INT) AS max_k
        FROM events
        GROUP BY event_type
    """,
    doc="JSON props extraction + agg (F14 ≡ from_json/get_json_object over events.props).",
    tags=("events", "json"),
)
def json_props_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("int").alias("min_k"),
        F.max(k).cast("int").alias("max_k"),
    )


@register(
    "from_json_typed_struct",
    oracle="""
        SELECT event_id,
               CAST(props->>'$.k' AS INT) AS prop_k,
               CASE WHEN CAST(props->>'$.k' AS INT) >= 50 THEN 'high' ELSE 'low' END AS k_band
        FROM events WHERE event_id < 1000
    """,
    doc="from_json into a typed struct column (F14; MapType/StructType surface absent from reference).",
    tags=("events", "json"),
)
def from_json_typed_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType(), True)])
    parsed = F.from_json("props", schema).alias("p")
    return (
        ev.filter(F.col("event_id") < 1000)
        .select("event_id", parsed)
        .select(
            "event_id",
            F.col("p.k").alias("prop_k"),
            F.when(F.col("p.k") >= 50, "high").otherwise("low").alias("k_band"),
        )
    )


@register(
    "event_type_hourly_pivot",
    oracle="""
        SELECT time_bucket(INTERVAL '1 day', ts) AS day_start,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)    AS clicks,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)     AS views,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)   AS signups,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)    AS errors
        FROM events
        GROUP BY 1
    """,
    doc="Daily pivot of event types via conditional aggregation (A8 dashboard shape).",
    tags=("events", "agg"),
)
def event_type_hourly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    def cnt(t):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("bigint")
    return ev.groupBy(F.window("ts", "1 day").alias("w")).agg(
        cnt("click").alias("clicks"),
        cnt("view").alias("views"),
        cnt("purchase").alias("purchases"),
        cnt("signup").alias("signups"),
        cnt("error").alias("errors"),
    ).select(F.col("w.start").alias("day_start"), "clicks", "views", "purchases", "signups", "errors")


@register(
    "user_activity_rollup",
    oracle="""
        SELECT user_id,
               count(*) AS n_events,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value,
               min(ts) AS first_seen,
               max(ts) AS last_seen,
               CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS active_span_sec
        FROM events
        GROUP BY user_id
    """,
    doc="Per-user activity profile: multi-agg + timestamp span (A8 + F6 on event time).",
    tags=("events", "agg"),
)
def user_activity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.sum(dec2("value")), 2).cast("double").alias("total_value"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("bigint").alias("active_span_sec"),
    )


@register(
    "value_percentiles_by_type",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events
        GROUP BY event_type
    """,
    doc="Exact linear-interpolated percentiles per group (Spark percentile ≡ "
        "DuckDB quantile_cont; the approx_percentile sketch is the 100 TB "
        "path, same query shape).",
    tags=("events", "agg", "percentile"),
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@register(
    "grouping_sets_type_hour",
    oracle="""
        SELECT event_type, CAST(NULL AS BIGINT) AS hour_of_day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
        UNION ALL
        SELECT CAST(NULL AS VARCHAR) AS event_type, CAST(hour(ts) AS BIGINT) AS hour_of_day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY hour(ts)
    """,
    doc="GROUPING SETS ((event_type), (hour)) — the dashboard-slice shape "
        "cube/rollup generalize (A8).",
    tags=("events", "agg", "grouping-sets"),
)
def grouping_sets_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__ev_gs")
    return spark.sql("""
        SELECT event_type, CAST(hour_of_day AS BIGINT) AS hour_of_day,
               count(*) AS n
        FROM (SELECT event_type, hour(ts) AS hour_of_day FROM __ev_gs)
        GROUP BY GROUPING SETS ((event_type), (hour_of_day))
    """)


@register(
    "asof_join_last_purchase",
    oracle="""
        WITH clicks AS (
            SELECT user_id, event_id AS click_id, ts FROM events
            WHERE event_type = 'click'
        ), purch AS (
            SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT c.user_id AS user_id, c.click_id AS click_id,
               p.purchase_id AS purchase_id,
               round(CAST(p.purchase_value AS DOUBLE), 6) AS purchase_value
        FROM clicks c ASOF LEFT JOIN purch p
          ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
    doc="As-of join (each click ↔ the user's latest purchase at-or-before "
        "it, NULL-extended): union + per-key window carry — ONE shuffle, no "
        "|L|·|R| range-join explosion (operators/asof.py). Oracle is "
        "DuckDB's native ASOF LEFT JOIN; the corpus has no duplicate "
        "(user, ts) purchases, so both tie-break rules coincide.",
    tags=("events", "join", "asof"),
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    joined = asof_join(
        clicks, purchases, on="user_id", ts="ts",
        value_cols=["purchase_id", "purchase_value"], seq="purchase_id",
    )
    return joined.select(
        "user_id", "click_id", "purchase_id",
        F.round(F.col("purchase_value").cast("double"), 6).alias("purchase_value"),
    )


@register(
    "value_distribution_stats",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               round(quantile_cont(CAST(value AS DOUBLE), 0.25), 6) AS p25,
               round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
               round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90,
               round(stddev_samp(CAST(value AS DOUBLE)), 6) AS sd,
               round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                     / count(value), 6) AS avg_value
        FROM events
        GROUP BY event_type
    """,
    doc="Exact distribution statistics per group: continuous-interpolation "
        "percentiles (Spark `percentile` ≡ DuckDB `quantile_cont` — both "
        "use the linear-interpolation definition, verified to 6dp), sample "
        "stddev, and the exact-decimal mean. Exact percentile sorts within "
        "each group partition; at 100 TB swap in percentile_approx "
        "(t-digest, mergeable map-side — no per-group sort) where the "
        "downstream tolerates ε.",
    tags=("events", "agg", "stats"),
)
def value_distribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.9)"), 6).alias("p90"),
        F.round(F.stddev_samp(v), 6).alias("sd"),
        F.round(
            F.sum(dec2("value")).cast("double") / F.count("value"), 6
        ).alias("avg_value"),
    )


@register(
    "correlation_matrix_stats",
    oracle="""
        SELECT round(corr(CAST(value AS DOUBLE),
                          CAST(epoch(ts) AS DOUBLE)), 6) AS corr_value_time,
               round(covar_samp(CAST(value AS DOUBLE),
                                CAST(epoch(ts) AS DOUBLE)) / 1000000, 6) AS covar_value_time_m,
               round(corr(CAST(value AS DOUBLE),
                          CAST(user_id AS DOUBLE)), 6) AS corr_value_user
        FROM events
    """,
    doc="Bivariate statistics (Pearson corr, sample covariance) as single- "
        "pass aggregates — Spark's corr/covar_samp are mergeable moment "
        "accumulators (partial agg map-side, constant-size state), the "
        "same one-pass shape DuckDB uses, so they match to 6dp despite "
        "float summation order differing across 32 partitions.",
    tags=("events", "agg", "stats"),
)
def correlation_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    # cast keeps the microsecond fraction, matching DuckDB's epoch();
    # unix_timestamp() would truncate to whole seconds and diverge
    t_s = F.col("ts").cast("double")
    return ev.select(
        F.round(F.corr(v, t_s), 6).alias("corr_value_time"),
        F.round(F.covar_samp(v, t_s) / F.lit(1000000.0), 6).alias("covar_value_time_m"),
        F.round(F.corr(v, F.col("user_id").cast("double")), 6).alias("corr_value_user"),
    )


@register(
    "asof_join_next_purchase",
    oracle="""
        WITH clicks AS (
            SELECT user_id, event_id AS click_id, ts FROM events
            WHERE event_type = 'click'
        ), purch AS (
            SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT c.user_id AS user_id, c.click_id AS click_id,
               p.purchase_id AS purchase_id,
               round(CAST(p.purchase_value AS DOUBLE), 6) AS purchase_value
        FROM clicks c ASOF LEFT JOIN purch p
          ON c.user_id = p.user_id AND p.ts >= c.ts
    """,
    doc="Forward as-of join (each click ↔ the user's EARLIEST purchase "
        "at-or-after it — attribution's 'what did this click convert to'). "
        "Same union + window-carry single-shuffle plan with the window "
        "reversed (operators/asof.py direction='forward'). Oracle is "
        "DuckDB's native ASOF LEFT JOIN with the inequality flipped.",
    tags=("events", "join", "asof"),
)
def asof_join_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    joined = asof_join(
        clicks, purchases, on="user_id", ts="ts",
        value_cols=["purchase_id", "purchase_value"], seq="purchase_id",
        direction="forward",
    )
    return joined.select(
        "user_id", "click_id", "purchase_id",
        F.round(F.col("purchase_value").cast("double"), 6).alias("purchase_value"),
    )


@register(
    "asof_join_recent_purchase_7d",
    oracle="""
        WITH clicks AS (
            SELECT user_id, event_id AS click_id, ts FROM events
            WHERE event_type = 'click'
        ), purch AS (
            SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
            FROM events WHERE event_type = 'purchase'
        ), cand AS (
            SELECT c.user_id, c.click_id, p.purchase_id, p.purchase_value,
                   row_number() OVER (
                       PARTITION BY c.user_id, c.click_id
                       ORDER BY p.ts DESC, p.purchase_id DESC) AS rn
            FROM clicks c JOIN purch p
              ON c.user_id = p.user_id
             AND p.ts <= c.ts
             AND p.ts >= c.ts - INTERVAL 7 DAY
        )
        SELECT c.user_id AS user_id, c.click_id AS click_id,
               k.purchase_id AS purchase_id,
               round(CAST(k.purchase_value AS DOUBLE), 6) AS purchase_value
        FROM clicks c LEFT JOIN (SELECT * FROM cand WHERE rn = 1) k
          USING (user_id, click_id)
    """,
    doc="As-of join with a staleness bound (latest purchase at most 7 days "
        "before each click; older matches are NULLed like pandas "
        "merge_asof(tolerance=...)). The bound is applied to the carried "
        "payload AFTER the single window pass — still one shuffle, no "
        "re-join. Oracle is the brute-force bounded-range join with a "
        "row_number pick, affordable at oracle scale.",
    tags=("events", "join", "asof"),
)
def asof_join_recent_purchase_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    joined = asof_join(
        clicks, purchases, on="user_id", ts="ts",
        value_cols=["purchase_id", "purchase_value"], seq="purchase_id",
        tolerance="INTERVAL 7 DAY",
    )
    return joined.select(
        "user_id", "click_id", "purchase_id",
        F.round(F.col("purchase_value").cast("double"), 6).alias("purchase_value"),
    )


@register(
    "range_join_window_totals",
    oracle="""
        WITH daily AS (
            SELECT d AS wid,
                   TIMESTAMP '2024-01-01 08:00:00' + INTERVAL (d - 1) DAY AS w_start,
                   TIMESTAMP '2024-01-01 20:00:00' + INTERVAL (d - 1) DAY AS w_end
            FROM range(1, 31) AS t(d)
        ), weekly AS (
            SELECT 100 + w AS wid,
                   TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (7 * (w - 1)) DAY AS w_start,
                   TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (7 * w) DAY AS w_end
            FROM range(1, 6) AS t(w)
        ), windows AS (
            SELECT * FROM daily UNION ALL SELECT * FROM weekly
        )
        SELECT w.wid AS wid, count(*) AS n_events,
               CAST(round(sum(CAST(e.value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        FROM events e JOIN windows w
          ON w.w_start <= e.ts AND e.ts < w.w_end
        GROUP BY w.wid
    """,
    doc="Range join (events into overlapping daily + weekly windows) via the "
        "granule-binning equi-join (operators/rangejoin.py) — a point can "
        "match several intervals, and the plan is an ordinary hash join on "
        "the time granule, not the BroadcastNestedLoopJoin a bare "
        "inequality join degenerates to. Oracle is the naive containment "
        "join, affordable at oracle scale.",
    tags=("events", "join", "range"),
)
def range_join_window_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import range_join

    ev = _t(spark, sf_dir, "events").select("ts", "value")
    # windows built Catalyst-side from string literals: a naive Python
    # datetime through createDataFrame is interpreted in the OS
    # timezone (not the UTC-pinned session), which shifts every window
    # when the host runs in a non-UTC TZ — caught by the TZ=America/
    # Chicago verify run
    day = "make_interval(0, 0, 0, 1, 0, 0, 0)"
    daily = spark.range(1, 31).select(
        F.col("id").cast("int").alias("wid"),
        F.expr(f"timestamp'2024-01-01 08:00:00' + (id - 1) * {day}").alias("w_start"),
        F.expr(f"timestamp'2024-01-01 20:00:00' + (id - 1) * {day}").alias("w_end"),
    )
    weekly = spark.range(1, 6).select(
        (F.col("id") + 100).cast("int").alias("wid"),
        F.expr(f"timestamp'2024-01-01 00:00:00' + (id - 1) * 7 * {day}").alias("w_start"),
        F.expr(f"timestamp'2024-01-01 00:00:00' + id * 7 * {day}").alias("w_end"),
    )
    windows = daily.unionByName(weekly)
    joined = range_join(ev, windows, ts="ts", start="w_start", end="w_end")
    return joined.groupBy("wid").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(dec2("value")), 2).cast("double").alias("total_value"),
    )


@register(
    "conversion_funnel_stages",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN v
              ON v.user_id = e.user_id
             AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 4 HOUR
            WHERE e.event_type = 'click' GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN c
              ON c.user_id = e.user_id
             AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 48 HOUR
            WHERE e.event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT stage, count(*) AS n_users FROM (
            SELECT u.user_id,
                   CASE WHEN p.user_id IS NOT NULL THEN 3
                        WHEN c.user_id IS NOT NULL THEN 2
                        WHEN v.user_id IS NOT NULL THEN 1
                        ELSE 0 END AS stage
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN v USING (user_id)
            LEFT JOIN c USING (user_id)
            LEFT JOIN p USING (user_id)
        ) GROUP BY stage
    """,
    doc="Conversion funnel (view → click ≤4h later → purchase ≤48h after "
        "that, anchored at each user's EARLIEST view — the standard fixed-"
        "anchor funnel): per-user "
        "greedy stage matching as ONE groupBy + sorted-array fold (Catalyst "
        "HOF, single shuffle) instead of one self-join per stage — the "
        "funnel depth doesn't multiply shuffle count. Greedy-on-earliest "
        "equals the min-based derivation the oracle states (ST10/A8 "
        "analytics shape).",
    tags=("events", "funnel", "agg"),
)
def conversion_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    seq = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_type").alias("et")))
    )
    init = F.struct(
        F.lit(None).cast("timestamp").alias("t1"),
        F.lit(None).cast("timestamp").alias("t2"),
        F.lit(None).cast("timestamp").alias("t3"),
    )

    def step(acc, e):
        new_t1 = F.when(
            acc["t1"].isNull() & (e["et"] == "view"), e["ts"]
        ).otherwise(acc["t1"])
        new_t2 = F.when(
            acc["t2"].isNull() & acc["t1"].isNotNull()
            & (e["et"] == "click") & (e["ts"] > acc["t1"])
            & (e["ts"] <= acc["t1"] + F.expr("INTERVAL 4 HOURS")),
            e["ts"],
        ).otherwise(acc["t2"])
        new_t3 = F.when(
            acc["t3"].isNull() & acc["t2"].isNotNull()
            & (e["et"] == "purchase") & (e["ts"] > acc["t2"])
            & (e["ts"] <= acc["t2"] + F.expr("INTERVAL 48 HOURS")),
            e["ts"],
        ).otherwise(acc["t3"])
        return F.struct(new_t1.alias("t1"), new_t2.alias("t2"), new_t3.alias("t3"))

    per_user = (
        ev.groupBy("user_id")
        .agg(seq.alias("seq"))
        .select(
            "user_id", F.aggregate(F.col("seq"), init, step).alias("f")
        )
        .select(
            "user_id",
            F.when(F.col("f.t3").isNotNull(), 3)
            .when(F.col("f.t2").isNotNull(), 2)
            .when(F.col("f.t1").isNotNull(), 1)
            .otherwise(0)
            .alias("stage"),
        )
    )
    return per_user.groupBy("stage").agg(F.count("*").alias("n_users"))


@register(
    "cohort_weekly_retention",
    oracle="""
        WITH user_weeks AS (
            SELECT DISTINCT user_id,
                   CAST(floor(date_diff('day', DATE '2024-01-01',
                                        CAST(ts AS DATE)) / 7.0) AS BIGINT) AS wk
            FROM events
        ), cohort AS (
            SELECT user_id FROM user_weeks WHERE wk = 0
        )
        SELECT wk,
               count(*) AS retained,
               round(CAST(count(*) AS DOUBLE)
                     / (SELECT count(*) FROM cohort), 6) AS retention_pct
        FROM user_weeks
        WHERE user_id IN (SELECT user_id FROM cohort)
        GROUP BY wk
    """,
    doc="Cohort retention: of the users active in week 0, the fraction "
        "still active in each later week. One distinct (user, week) "
        "projection feeds both the cohort and the retention counts; the "
        "cohort re-enters as a LEFT SEMI join and the denominator as a "
        "broadcast scalar — events is scanned once, shuffled once on "
        "user_id (ST10-adjacent [EXT]).",
    tags=("events", "agg", "window"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    user_weeks = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) / 7.0
        ).alias("wk"),
    ).distinct()
    cohort = user_weeks.filter(F.col("wk") == 0).select("user_id")
    cohort_size = cohort.agg(F.count("*").alias("n0"))
    retained = (
        user_weeks.join(cohort, "user_id", "left_semi")
        .groupBy("wk")
        .agg(F.count("*").alias("retained"))
    )
    return retained.crossJoin(F.broadcast(cohort_size)).select(
        "wk",
        "retained",
        F.round(F.col("retained").cast("double") / F.col("n0"), 6).alias(
            "retention_pct"
        ),
    )


@register(
    "event_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        )
        SELECT prev_type, event_type AS next_type,
               CAST(count(*) AS BIGINT) AS n_transitions,
               round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY prev_type)
                     AS DOUBLE), 6) AS p_transition
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    """,
    doc="First-order Markov transition matrix over per-user event "
        "sequences (funnel/journey analytics): LAG per (user, time) "
        "gives consecutive pairs, grouped into counts and row-"
        "normalized transition probabilities with a windowed total. "
        "The sequence window partitions by user_id (high cardinality); "
        "the probability window partitions by prev_type over the "
        "already-aggregated matrix (|event_types|² rows, trivial at "
        "any scale). Ordering ties on ts break by event_id so the "
        "sequence is total and engine-identical (§2.5 windows + §2.8 "
        "event analytics).",
    tags=("events", "window", "markov"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(seq))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )
    norm = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type", "next_type", "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(norm).cast("double"), 6
        ).alias("p_transition"),
    )


@register(
    "variant_props_stats",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_distinct_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
    """,
    doc="VariantType semi-structured path (Spark 4, §2.7 F14 [EXT]): "
        "props JSON is parsed ONCE into an open-schema VARIANT with "
        "parse_json and fields are extracted with typed variant_get — "
        "the engine's native semi-structured storage (binary-encoded, "
        "shredded access) rather than per-extraction string re-parsing "
        "(from_json with a closed schema is the sibling path, "
        "from_json_typed_struct). Aggregates are integer-exact so no "
        "decimal rounding is needed; DuckDB states the same extraction "
        "with json_extract_string.",
    tags=("events", "json", "variant"),
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.countDistinct("k").cast("bigint").alias("n_distinct_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


@register(
    "session_windows_dynamic_gap",
    oracle="""
        WITH ev AS (
            SELECT user_id, ts, value,
                   CASE WHEN event_type IN ('click', 'view')
                        THEN INTERVAL '15 minutes'
                        ELSE INTERVAL '45 minutes' END AS gap
            FROM events WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
        ), marked AS (
            SELECT user_id, ts, value, gap,
                   CASE WHEN max(ts + gap) OVER (
                            PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                            IS NULL
                        OR ts >= max(ts + gap) OVER (
                            PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        THEN 1 ELSE 0 END AS new_session
            FROM ev
        ), sessions AS (
            SELECT user_id, ts, value, gap,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM marked
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts + gap) AS session_end,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS session_value
        FROM sessions
        GROUP BY user_id, session_id
    """,
    doc="Session windows with a DYNAMIC per-event gap (15 min for "
        "click/view, 45 min otherwise) — session_window(ts, gap_col), "
        "the semantics static-gap sessionization can't express: each "
        "event extends its session to ts + its own gap, and windows "
        "merge transitively. The oracle derives the same merge with "
        "gaps-and-islands generalized to variable gaps: an event opens "
        "a new session iff its ts >= the running max of (ts + gap) "
        "over all earlier events of that user (the cumulative max is "
        "monotone, so the check against the GLOBAL running max equals "
        "the check against the current session's end — the proof the "
        "doc relies on). Scale shape identical to the static form: one "
        "shuffle per user, sort within partition (§2.8 ST10).",
    tags=("events", "window-time", "session"),
)
def session_windows_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type").isin("click", "view"), F.lit("15 minutes")
    ).otherwise(F.lit("45 minutes"))
    return (
        ev.filter(F.col("ts") < F.lit("2024-01-05 00:00:00").cast("timestamp"))
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(dec2("value")), 2).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
