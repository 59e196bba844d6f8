"""Scalar-function suite (SURVEY.md §2.7, F1-F14).

Every scalar family the reference uses (timestamp parse/format, date
arithmetic, calendar attributes, zero-padding, regex, string ops) plus
the `[EXT]` math/conditional families, each as an oracle-checked query.

Dialect parity notes baked in:
- day-of-week: Spark ``weekday()`` is 0=Monday → +1 matches DuckDB
  ``isodow`` (1=Mon..7=Sun). Spark ``dayofweek`` (1=Sunday) is avoided.
- transcendentals (ln/exp/pow) are not bit-guaranteed across libm
  implementations — the math query sticks to IEEE-exact ops (abs,
  floor, ceil, sqrt of exact values, mod) and decimal-rounded outputs.
- DuckDB parses with ``strptime`` / formats with ``strftime`` (%g =
  milliseconds); Spark with ``to_timestamp`` / ``date_format`` (SSS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import _t, fmt_date
from .registry import register


@register(
    "calendar_attributes",
    oracle="""
        SELECT DISTINCT
               strftime(o_orderdate, '%Y-%m-%d') AS cal_date,
               CAST(dayofmonth(o_orderdate) AS INT)   AS day,
               CAST(month(o_orderdate) AS INT)  AS month,
               monthname(o_orderdate)           AS month_name,
               CAST(year(o_orderdate) AS INT)   AS year,
               CAST(isodow(o_orderdate) AS INT) AS day_of_week,
               dayname(o_orderdate)             AS day_of_week_name,
               CAST(quarter(o_orderdate) AS INT) AS quarter
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
    """,
    doc="Date-dim derived attributes (F12 ≡ create_date.sql:2-9; F5 extraction).",
    tags=("scalar", "date"),
)
def calendar_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.filter(d < F.lit("1995-07-01 00:00:00").cast("timestamp"))
        .select(
            fmt_date(d).alias("cal_date"),
            F.dayofmonth(d).alias("day"),
            F.month(d).alias("month"),
            F.date_format(d, "MMMM").alias("month_name"),
            F.year(d).alias("year"),
            (F.weekday(d) + 1).alias("day_of_week"),
            F.date_format(d, "EEEE").alias("day_of_week_name"),
            F.quarter(d).alias("quarter"),
        )
        .distinct()
    )


@register(
    "timestamp_parse_roundtrip",
    oracle="""
        SELECT event_id,
               strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') AS ts_str,
               strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S.%g'),
                        '%Y-%m-%dT%H:%M:%S.%g')     AS ts_reparsed
        FROM events WHERE event_id < 500
    """,
    doc="Socrata-style timestamp format/parse round-trip (F1/F2 ≡ helper.py:12-16 str_to_date/date_to_str).",
    tags=("scalar", "date"),
)
def timestamp_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSS"
    ts_str = F.date_format("ts", fmt)
    return ev.filter(F.col("event_id") < 500).select(
        "event_id",
        ts_str.alias("ts_str"),
        F.to_timestamp(ts_str, fmt).alias("ts_reparsed"),
    )


@register(
    "month_window_ranges",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('month', min(o_orderdate)) AS lo,
                   max(o_orderdate) AS hi
            FROM orders
        ), months AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS win_start, hi
            FROM bounds
        )
        SELECT strftime(win_start, '%Y-%m-%d') AS window_start,
               strftime(least(win_start + INTERVAL 1 MONTH, hi), '%Y-%m-%d') AS window_end
        FROM months
    """,
    doc="Month-chunked [start,end) ingest windows, last clamped (F4 ≡ generate_date_range, helper.py:41-65).",
    tags=("scalar", "date"),
)
def month_window_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.max("o_orderdate").alias("hi"),
    )
    months = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))).alias("win_start"),
        "hi",
    )
    return months.select(
        fmt_date("win_start").alias("window_start"),
        fmt_date(F.least(F.col("win_start") + F.expr("INTERVAL 1 MONTH"), F.col("hi"))).alias("window_end"),
    )


@register(
    "string_function_suite",
    oracle="""
        SELECT p_partkey,
               lower(p_brand)                        AS brand_lower,
               upper(split_part(p_type, ' ', 1))     AS type_head,
               substring(p_name, 1, 8)               AS name_prefix,
               CAST(length(p_name) AS INT)           AS name_len,
               concat(p_brand, ':', p_type)          AS brand_type,
               printf('part-%04d', CAST(p_partkey AS INT)) AS padded_id,
               replace(p_brand, '#', '-')            AS brand_dashed
        FROM part
    """,
    doc="String suite: lower/upper/substr/length/concat/split_part/zero-pad/replace (F9/F10/F11 ≡ load.py:17,33-37, helper.py:76).",
    tags=("scalar", "string"),
)
def string_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_brand").alias("brand_lower"),
        F.upper(F.split_part(F.col("p_type"), F.lit(" "), F.lit(1))).alias("type_head"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.format_string("part-%04d", F.col("p_partkey").cast("int")).alias("padded_id"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dashed"),
    )


@register(
    "date_arithmetic",
    oracle="""
        SELECT o.o_orderstatus AS status,
               count(*) AS n_rows,
               CAST(sum(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE))) AS BIGINT) AS total_lag_days,
               round(CAST(sum(date_diff('day', CAST(o.o_orderdate AS DATE),
                                        CAST(l.l_shipdate AS DATE))) AS DOUBLE) / count(*), 6)
                   AS avg_ship_lag_days,
               strftime(max(CAST(l.l_shipdate AS DATE) + INTERVAL 7 DAY), '%Y-%m-%d') AS max_ship_plus_week,
               strftime(min(CAST(l.l_shipdate AS DATE) - INTERVAL 30 DAY), '%Y-%m-%d') AS min_ship_minus_month
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderstatus
    """,
    doc="Date arithmetic: datediff spans, date_add/date_sub offsets (F6 ≡ etl/main.py:31, helper.py:25-26).",
    tags=("scalar", "date"),
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lag_days = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(lag_days).cast("bigint").alias("total_lag_days"),
            F.round(F.sum(lag_days).cast("double") / F.count("*"), 6).alias("avg_ship_lag_days"),
            fmt_date(F.date_add(F.max(F.col("l_shipdate").cast("date")), 7)).alias("max_ship_plus_week"),
            fmt_date(F.date_sub(F.min(F.col("l_shipdate").cast("date")), 30)).alias("min_ship_minus_month"),
        )
    )


@register(
    "regex_extract_filter",
    oracle="""
        SELECT regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
               count(*) AS n_parts,
               CAST(sum(CASE WHEN regexp_matches(p_name, '[aeiou]{2}') THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_double_vowel
        FROM part
        WHERE regexp_matches(p_name, '^[a-z]')
        GROUP BY regexp_extract(p_name, '^([a-z]+)', 1)
    """,
    doc="Regex match + extract (F8/P9 ≡ partition-key regex, helper.py:28-38).",
    tags=("scalar", "regex"),
)
def regex_extract_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").rlike("^[a-z]"))
        .groupBy(F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"))
        .agg(
            F.count("*").alias("n_parts"),
            F.sum(F.when(F.col("p_name").rlike("[aeiou]{2}"), 1).otherwise(0))
            .cast("bigint").alias("n_double_vowel"),
        )
    )


@register(
    "math_function_suite",
    oracle="""
        SELECT p_size,
               count(*) AS n,
               CAST(sum(abs(p_size - 25)) AS BIGINT)          AS sum_abs_dev,
               CAST(max(floor(p_retailprice)) AS DOUBLE)      AS max_floor_price,
               CAST(min(ceil(p_retailprice)) AS DOUBLE)       AS min_ceil_price,
               round(sqrt(CAST(p_size AS DOUBLE)), 6)         AS sqrt_size,
               CAST(p_size % 7 AS INT)                        AS size_mod7,
               CAST(greatest(p_size, 10) AS INT)              AS size_floor10
        FROM part
        GROUP BY p_size
    """,
    doc="Math suite over IEEE-exact ops: abs/floor/ceil/sqrt/mod/greatest (F14 [EXT]).",
    tags=("scalar", "math"),
)
def math_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_size").agg(
        F.count("*").alias("n"),
        F.sum(F.abs(F.col("p_size") - 25)).cast("bigint").alias("sum_abs_dev"),
        F.max(F.floor("p_retailprice")).cast("double").alias("max_floor_price"),
        F.min(F.ceil("p_retailprice")).cast("double").alias("min_ceil_price"),
        F.round(F.sqrt(F.col("p_size").cast("double")), 6).alias("sqrt_size"),
        (F.col("p_size") % 7).cast("int").alias("size_mod7"),
        F.greatest(F.col("p_size"), F.lit(10)).cast("int").alias("size_floor10"),
    ).select("p_size", "n", "sum_abs_dev", "max_floor_price", "min_ceil_price",
             "sqrt_size", "size_mod7", "size_floor10")


@register(
    "conditional_bucketing",
    oracle="""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    ELSE 'large' END AS price_bucket,
               count(*) AS n_orders,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
               coalesce(nullif(min(o_orderpriority), '1-URGENT'), 'none') AS min_nonurgent_priority
        FROM orders
        GROUP BY 1
    """,
    doc="CASE WHEN bucketing + conditional aggregation + coalesce/nullif (F14, A8 pivot-style slices).",
    tags=("scalar", "conditional"),
)
def conditional_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("price_bucket")).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).cast("bigint").alias("n_open"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).cast("bigint").alias("n_finished"),
        F.coalesce(F.nullif(F.min("o_orderpriority"), F.lit("1-URGENT")), F.lit("none"))
        .alias("min_nonurgent_priority"),
    )


@register(
    "epoch_seconds",
    oracle="""
        SELECT o_orderstatus,
               CAST(min(epoch(o_orderdate)) AS BIGINT) AS min_epoch,
               CAST(max(epoch(o_orderdate)) AS BIGINT) AS max_epoch
        FROM orders GROUP BY o_orderstatus
    """,
    doc="Epoch-seconds conversion under pinned UTC (F7 ≡ strftime/strptime keys).",
    tags=("scalar", "date"),
)
def epoch_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min(F.unix_timestamp("o_orderdate")).cast("bigint").alias("min_epoch"),
        F.max(F.unix_timestamp("o_orderdate")).cast("bigint").alias("max_epoch"),
    )


@register(
    "date_dim_holiday_join",
    oracle="""
        WITH dates AS (
            SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31', INTERVAL 1 DAY)) AS d
        ), holidays(hdate, holiday_name) AS (
            VALUES (DATE '1995-01-01', 'New Year''s Day'),
                   (DATE '1995-07-04', 'Independence Day'),
                   (DATE '1995-11-23', 'Thanksgiving'),
                   (DATE '1995-12-25', 'Christmas Day')
        )
        SELECT strftime(d, '%Y-%m-%d') AS cal_date,
               CAST(isodow(d) AS INT)  AS day_of_week,
               h.holiday_name          AS holiday_name,
               CASE WHEN h.holiday_name IS NOT NULL THEN 1 ELSE 0 END AS is_holiday
        FROM dates LEFT JOIN holidays h ON CAST(d AS DATE) = h.hdate
    """,
    doc="Generated date dimension + broadcast holiday lookup (F12/J5 ≡ date dim, create_date.sql; holiday via lookup join).",
    tags=("scalar", "date", "join"),
)
def date_dim_holiday_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.datedim import build_date_dim, default_holidays_df

    dim = build_date_dim(spark, "1995-01-01", "1995-12-31", holidays=default_holidays_df(spark))
    return dim.select(
        fmt_date("date").alias("cal_date"),
        F.col("day_of_week"),
        F.col("holiday_name"),
        F.when(F.col("holiday_name").isNotNull(), 1).otherwise(0).alias("is_holiday"),
    )


@register(
    "unpivot_event_value_stats",
    oracle="""
        WITH agg AS (
            SELECT event_type,
                   round(min(value), 6) AS min_v,
                   round(max(value), 6) AS max_v,
                   round(avg(value), 6) AS avg_v
            FROM events GROUP BY event_type
        )
        SELECT event_type, 'min_v' AS metric, min_v AS metric_value FROM agg
        UNION ALL
        SELECT event_type, 'max_v' AS metric, max_v AS metric_value FROM agg
        UNION ALL
        SELECT event_type, 'avg_v' AS metric, avg_v AS metric_value FROM agg
    """,
    doc="Unpivot (wide→long) via stack() — the inverse of the pivot query (A8/F14).",
    tags=("scalar", "unpivot"),
)
def unpivot_event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.round(F.min("value"), 6).alias("min_v"),
        F.round(F.max("value"), 6).alias("max_v"),
        F.round(F.avg("value"), 6).alias("avg_v"),
    )
    return agg.select(
        "event_type",
        F.expr("stack(3, 'min_v', min_v, 'max_v', max_v, 'avg_v', avg_v) AS (metric, metric_value)"),
    )


@register(
    "null_ordering_explicit",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE round(c_acctbal, 2) END AS bal,
               row_number() OVER (
                   ORDER BY (CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE round(c_acctbal, 2) END)
                            DESC NULLS LAST,
                            c_custkey
               ) AS rnk
        FROM customer
        WHERE c_custkey <= 200
    """,
    doc="Explicit NULLS LAST ordering under a window — Spark and ANSI default "
        "null ordering for DESC differ (Spark: nulls last; many engines: nulls "
        "first), so orderings over nullable keys must pin it (§2.6 risk item).",
    tags=("scalar", "sort", "nulls"),
)
def null_ordering_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    bal = F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(
        F.round("c_acctbal", 2)
    )
    w = Window.orderBy(bal.desc_nulls_last(), F.col("c_custkey"))
    return c.select(
        "c_custkey", bal.alias("bal"), F.row_number().over(w).alias("rnk")
    )


@register(
    "array_hof_suite",
    oracle="""
        SELECT vec_id,
               len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_pos,
               round(list_sum(list_transform(embedding::DOUBLE[], x -> abs(x))), 6) AS l1_norm,
               CAST(len(list_filter(embedding::DOUBLE[], x -> x > 2.5)) > 0 AS BOOLEAN) AS any_gt,
               CAST(len(list_filter(embedding::DOUBLE[], x -> abs(x) <= 10)) = len(embedding) AS BOOLEAN) AS all_bounded,
               round(list_reduce(list_transform(embedding::DOUBLE[], x -> greatest(x, 0.0)),
                                 (a, b) -> greatest(a, b)), 6) AS max_clipped
        FROM embeddings WHERE vec_id < 100
    """,
    doc="Higher-order array function suite: filter/transform/exists/forall/"
        "aggregate — the Catalyst HOF surface every [EXT] operator builds on (F14).",
    tags=("scalar", "array", "hof"),
)
def array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    v = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(F.transform(v, lambda x: F.abs(x)), F.lit(0.0), lambda a, b: a + b), 6
        ).alias("l1_norm"),
        F.exists(v, lambda x: x > 2.5).alias("any_gt"),
        F.forall(v, lambda x: F.abs(x) <= 10).alias("all_bounded"),
        F.round(
            F.aggregate(
                F.transform(v, lambda x: F.greatest(x, F.lit(0.0))),
                F.lit(0.0).cast("double"),
                lambda a, b: F.greatest(a, b),
            ), 6
        ).alias("max_clipped"),
    )
