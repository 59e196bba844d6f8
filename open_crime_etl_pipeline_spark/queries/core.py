"""Core relational inventory — scans, filters, projections, joins,
aggregates (SURVEY.md §2.1-2.4).

Each query exercises one operator family from the reference, mapped to
testdata tables per FIXTURES.md §B. Scale notes per query where the
plan shape matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.readers import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Oracle-parity helpers. Float sums in Spark and DuckDB differ in the
# last ulp (different accumulation order), so a plain round() can flip
# at a .5 boundary. Rule: sum in exact DECIMAL (inputs are 2-decimal
# monetary/qty values), round in decimal space, cast back to DOUBLE —
# bit-identical on both engines. Averages divide the exact decimal sum
# by the count as doubles. Dates are emitted as 'yyyy-MM-dd' strings so
# pandas materialization matches (DateType → datetime.date vs DuckDB
# DATE → datetime64 would diverge).

def dec2(col):
    """Column as DECIMAL(12,2) (exact for 2-decimal monetary values;
    narrow precision keeps decimal arithmetic under both engines' 38-digit
    cap so neither silently promotes to double)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def dsum(col, scale: int = 2):
    """Exact decimal sum → rounded → double."""
    return F.round(F.sum(dec2(col)), scale).cast("double")


def davg(col, scale: int = 6):
    """avg = exact decimal sum / count, rounded — deterministic across engines."""
    return F.round(F.sum(dec2(col)).cast("double") / F.count(F.lit(1)), scale)


def fmt_date(col):
    return F.date_format(col, "yyyy-MM-dd")


# ---------------------------------------------------------------------------
# Flagship: monthly revenue rollup (the analytics the reference warehouse
# exists to serve — crime counts per month ≡ revenue per month; SURVEY §7
# step 0). Scan → join → group-agg → date funcs → sort in one plan.
# Scale: lineitem⋈orders is a shuffle join on o_orderkey (both huge);
# the group-by on month is low-cardinality → partial aggregation does
# almost all the work map-side.
# ---------------------------------------------------------------------------

@register(
    "flagship_monthly_revenue",
    oracle="""
        SELECT date_trunc('month', o.o_orderdate)            AS order_month,
               count(*)                                      AS n_items,
               count(DISTINCT o.o_orderkey)                  AS n_orders,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l.l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
               round(CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY date_trunc('month', o.o_orderdate)
    """,
    doc="Monthly revenue: join + group-by month + multi-agg (A8, J6, F4/F7).",
    tags=("flagship", "join", "agg"),
)
def flagship_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month"))
        .agg(
            F.count("*").alias("n_items"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.round(F.sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))), 2)
            .cast("double").alias("revenue"),
            davg("l_quantity").alias("avg_qty"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary: the canonical scan→filter→group-agg.
# Scale: filter pushed to parquet scan; 4-group output → map-side combine.
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)      AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l_discount AS DECIMAL(12,2))
                              * CAST(1 + l_tax AS DECIMAL(12,2))), 2) AS DOUBLE)      AS sum_charge,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6)      AS avg_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price,
               round(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6)      AS avg_disc,
               count(*)                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="Pricing summary rollup: pushed filter + wide aggregation (P7, A8).",
    tags=("agg", "filter"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(disc_price * dec2(1 + F.col("l_tax"))), 2).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Filters / predicates (P4-P8) and watermark aggregates (A1-A4).
# ---------------------------------------------------------------------------

@register(
    "filter_in_list",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price
        FROM orders
        WHERE o_orderstatus IN ('F', 'P')
        GROUP BY o_orderpriority
    """,
    doc="IN-list predicate under aggregation (P4 ≡ status IN (...) from db_postgres.py:77-81).",
    tags=("filter",),
)
def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus").isin("F", "P"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "global_max_watermark",
    oracle="SELECT max(l_shipdate) AS watermark FROM lineitem",
    doc="Global MAX watermark read (A1 ≡ MAX(source_updated_on), db_postgres.py:65-71).",
    tags=("agg", "incremental"),
)
def global_max_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(F.max("l_shipdate").alias("watermark"))


@register(
    "filtered_max_load_date",
    oracle="""
        SELECT strftime(max(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS last_load_date
        FROM orders WHERE o_orderstatus IN ('F', 'O')
    """,
    doc="Filtered global MAX (A2 ≡ MAX(load_date) WHERE status IN (...), db_postgres.py:73-84).",
    tags=("agg", "incremental"),
)
def filtered_max_load_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus").isin("F", "O"))
        .agg(fmt_date(F.max(F.col("o_orderdate").cast("date"))).alias("last_load_date"))
    )


@register(
    "distinct_success_dates",
    oracle="""
        SELECT DISTINCT strftime(o_orderdate, '%Y-%m-%d') AS load_date
        FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="Distinct-set projection (A3 ≡ SELECT load_date WHERE status='SUCCESS', db_postgres.py:151-156).",
    tags=("filter", "distinct"),
)
def distinct_success_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(fmt_date("o_orderdate").alias("load_date"))
        .distinct()
    )


@register(
    "range_predicate_between",
    oracle="""
        SELECT l_returnflag, count(*) AS n_rows,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 23:59:59'
        GROUP BY l_returnflag
    """,
    doc="Range predicate pushed to scan (P7 ≡ updated_on BETWEEN, extract.py:11).",
    tags=("filter",),
)
def range_predicate_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp"),
                F.lit("1996-12-31 23:59:59").cast("timestamp"),
            )
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
    )


@register(
    "watermark_incremental_scan",
    oracle="""
        SELECT count(*) AS n_rows,
               min(l_shipdate) AS first_ship,
               max(l_shipdate) AS last_ship
        FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
    """,
    doc="Watermark >= predicate + min/max probes (P8/A4 ≡ updated_on >= last_update, etl/main.py:34).",
    tags=("filter", "incremental"),
)
def watermark_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")).agg(
        F.count("*").alias("n_rows"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "conjunctive_predicate",
    oracle="""
        SELECT count(*) AS n_rows,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_price,
               round(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_disc
        FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F' AND l_quantity > 25
    """,
    doc="Conjunctive equality/range predicate (P5/P6 ≡ templated WHERE k1=:k1 AND ..., db_postgres.py:139-147).",
    tags=("filter",),
)
def conjunctive_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F") & (F.col("l_quantity") > 25))
        .agg(
            F.count("*").alias("n_rows"),
            dsum("l_extendedprice").alias("sum_price"),
            davg("l_discount").alias("avg_disc"),
        )
    )


# ---------------------------------------------------------------------------
# Projection / rename (P1/P2 ≡ transform.py drop+rename contract).
# Scale: pure narrow ops; with parquet the projection prunes at the scan.
# ---------------------------------------------------------------------------

@register(
    "project_drop_rename",
    oracle="""
        SELECT o_orderkey AS order_id,
               o_custkey AS customer_id,
               o_orderstatus AS status,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price
        FROM orders
    """,
    doc="Drop + rename projection (P1/P2 ≡ transform.py:9-42 column mapping).",
    tags=("projection",),
)
def project_drop_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    dropped = orders.drop("o_orderdate", "o_orderpriority")
    return dropped.withColumnsRenamed(
        {
            "o_orderkey": "order_id",
            "o_custkey": "customer_id",
            "o_orderstatus": "status",
        }
    ).withColumn("total_price", dec2("o_totalprice").cast("double")).drop("o_totalprice")


@register(
    "union_all_literals",
    oracle="""
        SELECT 1 AS id
        UNION ALL
        SELECT CAST(NULL AS INT) AS id
    """,
    doc="Literal projection + bag union (P10/J4 ≡ my_first_dbt_model.sql:10-21).",
    tags=("union",),
)
def union_all_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = spark.range(1).select(F.lit(1).cast("int").alias("id"))
    b = spark.range(1).select(F.lit(None).cast("int").alias("id"))
    return a.unionAll(b)


# ---------------------------------------------------------------------------
# Joins (J3-J6). Scale notes: region/nation are tiny → broadcast (the
# plan must show BroadcastHashJoin, no shuffle of the fact side for the
# dims); customer⋈orders is a shuffle join on the key.
# ---------------------------------------------------------------------------

@register(
    "star_join_broadcast_dims",
    oracle="""
        SELECT r.r_name AS region_name,
               n.n_name AS nation_name,
               count(*) AS n_customers,
               CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    """,
    doc="Star-schema join with broadcast dims (J5/J6 ≡ declared date-dim join, create_date.sql).",
    tags=("join", "broadcast"),
)
def star_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


@register(
    "semi_join_customers_with_orders",
    oracle="""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_mktsegment
    """,
    doc="Left-semi join / EXISTS (J3 family — membership without multiplicity).",
    tags=("join", "semi"),
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "anti_join_customers_without_orders",
    oracle="""
        SELECT c.c_custkey AS c_custkey, c.c_name AS c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join / NOT EXISTS (J3 ≡ missed-load-date set difference, crime_etl.py:388-392).",
    tags=("join", "anti"),
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "set_except_load_dates",
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS load_date
        FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS load_date
        FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="Set difference of load-date sets (J3/ST9 ≡ pos_missed = snow − pos, crime_etl.py:388-396).",
    tags=("setop",),
)
def set_except_load_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    dates = orders.select(fmt_date("o_orderdate").alias("load_date"), "o_orderstatus")
    open_dates = dates.filter(F.col("o_orderstatus") == "O").select("load_date").distinct()
    done_dates = dates.filter(F.col("o_orderstatus") == "F").select("load_date").distinct()
    return open_dates.exceptAll(done_dates)


@register(
    "left_outer_join_order_counts",
    oracle="""
        SELECT c.c_custkey AS c_custkey,
               count(o.o_orderkey) AS n_orders,
               CAST(round(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(12,2))), 0), 2) AS DOUBLE) AS total_spent
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    """,
    doc="Left outer join preserving unmatched rows + count(col) null semantics (A6-adjacent).",
    tags=("join",),
)
def left_outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum(dec2("o_totalprice")), F.lit(0).cast("decimal(12,2)")), 2)
            .cast("double").alias("total_spent"),
        )
    )


# ---------------------------------------------------------------------------
# Data-quality aggregates (A5/A6 ≡ dbt unique/not_null tests).
# ---------------------------------------------------------------------------

@register(
    "dup_key_check",
    oracle="""
        SELECT l_orderkey, count(*) AS n_rows
        FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
    """,
    doc="Group-count uniqueness check (A5 ≡ dbt unique test, schema.yml:10-12).",
    tags=("agg", "quality"),
)
def dup_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(F.count("*").alias("n_rows")).filter(F.col("n_rows") > 1)


@register(
    "not_null_check",
    oracle="""
        SELECT count(*) AS n_total,
               count(o_custkey) AS n_not_null,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        FROM orders
    """,
    doc="Not-null data-quality check (A6 ≡ dbt not_null test, schema.yml:11).",
    tags=("agg", "quality"),
)
def not_null_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("n_total"),
        F.count("o_custkey").alias("n_not_null"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("n_null"),
    )


# ---------------------------------------------------------------------------
# Decorrelated-subquery / set-operator shapes (§2.3/§2.4 [EXT]).
# ---------------------------------------------------------------------------

@register(
    "correlated_avg_quantity_filter",
    oracle="""
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))) / 7.0, 2)
                    AS DOUBLE) AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#3'
          AND l_quantity < (
              SELECT 0.2 * avg(l_quantity)
              FROM lineitem l2 WHERE l2.l_partkey = p_partkey
          )
    """,
    doc="TPC-H Q17-shape correlated scalar subquery (small-order revenue), "
        "decorrelated the way Catalyst rewrites it: per-part AVG as a "
        "grouped aggregate joined back on the correlation key, then the "
        "range filter. brand_keys and the per-part aggregate are small "
        "relative to lineitem but SCALE-PROPORTIONAL (part grows with SF), "
        "so no explicit broadcast hint is forced — AQE converts both joins "
        "to broadcast at runtime when the measured shuffle size permits, "
        "and falls back to a shuffled join keyed on l_partkey when it "
        "doesn't (one lineitem shuffle either way). Deterministic across "
        "engines because integral quantities make avg() order-independent "
        "(A8/J6 [EXT]).",
    tags=("join", "subquery", "agg"),
)
def correlated_avg_quantity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    brand_keys = part.select("p_partkey")
    # avg over ALL lineitems of each brand-filtered part (semi-join first so
    # the per-part aggregate only computes groups that can survive).
    # No F.broadcast hint: brand_keys grows with SF, and a forced hint
    # overrides Spark's size thresholds — at 100 TB that is a mandated
    # multi-GB broadcast and an executor OOM. AQE picks broadcast at
    # runtime whenever the actual size is small.
    li_of_part = li.join(
        brand_keys, li.l_partkey == brand_keys.p_partkey, "left_semi"
    )
    avg_qty = li_of_part.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li_of_part.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (F.round(F.sum(dec2("l_extendedprice")) / 7.0, 2))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "exists_late_shipment_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4-shape correlated EXISTS (orders with a line shipped >60 "
        "days after order date) as a LEFT SEMI join — the physical form "
        "every engine rewrites EXISTS into. Equi key l_orderkey carries "
        "the shuffle; the extra non-equi conjunct rides along in the same "
        "join, so no second pass over lineitem (J6 [EXT]).",
    tags=("join", "subquery", "agg"),
)
def exists_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "intersect_click_purchase_users",
    oracle="""
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="Set INTERSECT (users present in both behavior sets) — the dual of "
        "set_except_load_dates' EXCEPT; Spark plans it as a distinct-ing "
        "LEFT SEMI join, one shuffle per side on the set key (J3 dual).",
    tags=("setop",),
)
def intersect_click_purchase_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@register(
    "promo_revenue_share",
    oracle="""
        SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
               round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l_discount AS DECIMAL(12,2))
                         ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                                * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE),
                     6) AS promo_share
        FROM lineitem, part
        WHERE p_partkey = l_partkey
        GROUP BY 1
    """,
    doc="TPC-H Q14-shape conditional revenue share (promo %% of revenue "
        "per ship-year): dim lookup on part (2-col projection; AQE "
        "broadcasts when small, shuffles on p_partkey when part is GBs — "
        "it is SCALE-PROPORTIONAL, so no forced hint), then ONE pass over "
        "lineitem computes both the conditional and total sums — no "
        "second scan, no second shuffle. Exact-decimal partials make the "
        "double division engine-identical (A8/J6 [EXT]).",
    tags=("join", "agg"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))
    zero = F.lit(0).cast("decimal(24,4)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(zero)).alias("__promo"),
            F.sum(disc).alias("__total"),
        )
        .select(
            "ship_year",
            F.round(
                F.lit(100.0) * F.col("__promo").cast("double")
                / F.col("__total").cast("double"),
                6,
            ).alias("promo_share"),
        )
    )


@register(
    "nested_agg_avg_order_value",
    oracle="""
        WITH per_order AS (
            SELECT o_orderkey, o_orderpriority,
                   sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS order_value,
                   count(*) AS n_lines
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderkey, o_orderpriority
        )
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(n_lines) AS BIGINT) AS n_lines,
               round(CAST(sum(order_value) AS DOUBLE) / count(*), 6) AS avg_order_value
        FROM per_order
        GROUP BY o_orderpriority
    """,
    doc="Nested aggregation (aggregate of per-group aggregates): average "
        "order VALUE per priority requires summing lines per order first "
        "— a quantity no single-level GROUP BY can produce. Two-level "
        "plan: partial-combined shuffle on l_orderkey, then a 5-group "
        "re-aggregation whose input is orders-sized, not lines-sized "
        "(A8 [EXT]).",
    tags=("agg", "join"),
)
def nested_agg_avg_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.sum(dec2("l_extendedprice")).alias("order_value"),
            F.count("*").alias("n_lines"),
        )
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum("n_lines").alias("n_lines"),
        F.round(F.sum("order_value").cast("double") / F.count("*"), 6).alias(
            "avg_order_value"
        ),
    )


@register(
    "accepted_values_check",
    oracle="""
        SELECT o_orderstatus AS value, count(*) AS n_rows
        FROM orders
        WHERE o_orderstatus NOT IN ('O', 'F', 'P')
        GROUP BY o_orderstatus
    """,
    doc="dbt accepted_values test shape: rows whose status falls outside "
        "the allowed domain, grouped for the failure report (empty = "
        "pass). Completes the reference's dbt test quartet with "
        "dup_key_check (unique) / not_null_check / "
        "referential_integrity_check (A5/A6 family ≡ schema.yml).",
    tags=("agg", "quality"),
)
def accepted_values_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(~F.col("o_orderstatus").isin("O", "F", "P"))
        .groupBy(F.col("o_orderstatus").alias("value"))
        .agg(F.count("*").alias("n_rows"))
    )


@register(
    "referential_integrity_check",
    oracle="""
        SELECT count(*) AS n_orphans,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_orphan_keys
        FROM orders o
        WHERE o_custkey IS NOT NULL
          AND NOT EXISTS (
              SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
          )
    """,
    doc="dbt relationships test shape: child rows whose foreign key has "
        "no parent (orphan orders), as a LEFT ANTI join keyed on the FK "
        "— the orphan side shuffles only keys; 0/0 = referential "
        "integrity holds (A5/A6 family ≡ schema.yml relationships).",
    tags=("agg", "quality", "join"),
)
def referential_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey").filter(
        F.col("o_custkey").isNotNull()
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    orphans = o.join(c, o.o_custkey == c.c_custkey, "left_anti")
    return orphans.agg(
        F.count("*").alias("n_orphans"),
        F.countDistinct("o_custkey").alias("n_orphan_keys"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q3/Q5 shapes — multi-way join breadth (§2.3 J6 [EXT]).
# ---------------------------------------------------------------------------

@register(
    "shipping_priority_top10",
    oracle="""
        SELECT l.l_orderkey AS order_key,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l.l_discount AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
               o.o_orderpriority AS order_priority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, order_key LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): segment-filtered customer "
        "⋈ orders ⋈ lineitem with opposing date predicates, revenue per "
        "order, top-10 under a total order (revenue desc, key asc). "
        "Both date filters reach the parquet scans (PushedFilters); the "
        "top-10 runs as TakeOrderedAndProject — per-partition heaps, no "
        "global sort. Exact-decimal revenue per the engine's money "
        "convention (§2.3 J6, §2.6 O3).",
    tags=("join", "topk", "tpch"),
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    cutoff = F.lit("1997-06-01 00:00:00").cast("timestamp")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    agg = joined.groupBy(
        F.col("l_orderkey").alias("order_key"),
        fmt_date("o_orderdate").alias("order_date"),
        F.col("o_orderpriority").alias("order_priority"),
    ).agg(
        F.round(F.sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))), 2)
        .cast("double").alias("revenue"),
    )
    return agg.select(
        "order_key", "revenue", "order_date", "order_priority"
    ).orderBy(F.col("revenue").desc(), F.col("order_key")).limit(10)


@register(
    "local_supplier_volume",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l.l_discount AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): the 6-way join with "
        "the c_nationkey = s_nationkey locality constraint — revenue "
        "per ASIA nation for one order-year. nation/region are "
        "fixed-size dims (forced broadcast is legitimate); customer/"
        "supplier joins stay unhinted for AQE. The year predicate is "
        "pushed to the orders scan (§2.3 J6).",
    tags=("join", "agg", "tpch"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = F.broadcast(
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(asia_nations, supp.s_nationkey == F.col("n_nationkey"))
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.round(F.sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))), 2)
        .cast("double").alias("revenue"),
    )


@register(
    "sql_api_ansi_parity",
    oracle="""
        SELECT l_returnflag AS return_flag,
               count(DISTINCT l_orderkey) AS n_orders,
               CAST(round(sum(CASE WHEN l_discount > 0.05
                                   THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                   ELSE CAST(0 AS DECIMAL(12,2)) END), 2)
                    AS DOUBLE) AS discounted_revenue,
               round(CAST(sum(CAST(l_tax AS DECIMAL(12,2))) AS DOUBLE)
                     / count(*), 6) AS avg_tax
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l_returnflag
        HAVING count(*) > 100
    """,
    doc="The SQL API surface: this query is executed through "
        "spark.sql() over views the engine registers (io/catalog.py "
        "bootstrap, D1-D3) — the IDENTICAL ANSI text DuckDB runs as the "
        "oracle (only the view name differs), demonstrating that a "
        "reference user's SQL moves over verbatim: CASE, COUNT "
        "(DISTINCT), HAVING, decimal money arithmetic, timestamp "
        "literals. Views are (re)registered per call so a stale "
        "sf_dir can never leak across driver invocations (§2.9 D3 + "
        "SQL front-end).",
    tags=("sql-api", "agg"),
)
def sql_api_ansi_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import load_table

    # createOrReplace (not create-if-absent): the driver calls queries
    # at several sf_dirs in one session; a cached view must never win.
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("sqlapi_lineitem")
    return spark.sql("""
        SELECT l_returnflag AS return_flag,
               count(DISTINCT l_orderkey) AS n_orders,
               CAST(round(sum(CASE WHEN l_discount > 0.05
                                   THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                   ELSE CAST(0 AS DECIMAL(12,2)) END), 2)
                    AS DOUBLE) AS discounted_revenue,
               round(CAST(sum(CAST(l_tax AS DECIMAL(12,2))) AS DOUBLE)
                     / count(*), 6) AS avg_tax
        FROM sqlapi_lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l_returnflag
        HAVING count(*) > 100
    """)


@register(
    "incremental_mv_maintenance",
    oracle="""
        SELECT date_trunc('month', o_orderdate) AS order_month,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                   AS total_revenue,
               CAST(round(max(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                   AS max_price
        FROM orders
        GROUP BY date_trunc('month', o_orderdate)
    """,
    doc="Incremental materialized-view maintenance: the monthly-revenue "
        "MV is NOT recomputed from scratch — the 'stored' MV partials "
        "(aggregated over the historical slice, o_orderkey % 10 != 0) "
        "merge with the delta batch's partials (the remaining tenth) "
        "by re-aggregating the mergeable state: count+=count, "
        "sum(decimal)+=sum, max=max. The oracle IS the full "
        "recompute, so the check proves the self-maintainability "
        "identity agg(all) == merge(agg(hist), agg(delta)) — exactly "
        "because the partials are kept in exact DECIMAL (float "
        "partials would make the identity order-dependent). This is "
        "the foreachBatch-refreshed-dashboard shape at 100 TB: the "
        "delta shuffle is delta-sized, the stored MV is "
        "|groups|-sized, the base table is never re-read. Distinct "
        "counts are deliberately absent (not mergeable from partials "
        "— hll_daily_rollup_merge covers the sketch-merge path). Cf. "
        "self-maintainable aggregates (Gupta-Mumick); S7/ST8 "
        "incremental family.",
    tags=("incremental", "agg", "mv"),
)
def incremental_mv_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate")).alias("order_month")

    def partials(df):
        return df.groupBy(month).agg(
            F.count("*").alias("p_count"),
            F.sum(dec2("o_totalprice")).alias("p_sum"),
            F.max(dec2("o_totalprice")).alias("p_max"),
        )

    stored = partials(orders.filter(F.col("o_orderkey") % 10 != 0))
    delta = partials(orders.filter(F.col("o_orderkey") % 10 == 0))
    return (
        stored.unionByName(delta)
        .groupBy("order_month")
        .agg(
            F.sum("p_count").cast("long").alias("n_orders"),
            F.round(F.sum("p_sum"), 2).cast("double").alias("total_revenue"),
            F.round(F.max("p_max"), 2).cast("double").alias("max_price"),
        )
    )


@register(
    "cdf_version_diff",
    oracle="""
        WITH k AS (SELECT o_orderkey, o_orderstatus FROM orders)
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
                   AS o_orderstatus,
               'insert' AS _change
        FROM k WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 != 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, 'delete' AS _change
        FROM k WHERE o_orderkey % 7 != 0 AND o_orderkey % 11 = 0
        UNION ALL
        SELECT o_orderkey, 'X' AS o_orderstatus, 'update_postimage' AS _change
        FROM k WHERE o_orderkey % 7 != 0 AND o_orderkey % 11 != 0
                 AND o_orderkey % 5 = 0
    """,
    doc="Change-data-feed between two committed versions of the "
        "transactional parquet table (D6/D7 family, "
        "io/table.py::VersionedParquetTable.diff): v1 = orders sans "
        "the %7 keys, v2 = inserts those, deletes the %11 keys, and "
        "flips status to 'X' for the %5 keys — the query commits both "
        "versions to a scratch table, diffs them AFTER the fact (no "
        "write-time change log: snapshot-complete versioning lets any "
        "retained version pair be diffed as two keyed full-outer "
        "passes), localCheckpoints the result to detach from the "
        "scratch files, and removes them. The oracle restates the "
        "three change classes closed-form. Deletes carry the "
        "pre-image. At scale the diff is two hash joins on the key — "
        "never a scan of a change log that had to be captured "
        "eagerly.",
    tags=("incremental", "cdf", "versioned"),
)
def cdf_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    from ..io.table import VersionedParquetTable

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    v1 = orders.filter(F.col("o_orderkey") % 7 != 0)
    v2 = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    root = tempfile.mkdtemp(prefix=f"cdf_{uuid.uuid4().hex[:8]}_")
    try:
        tbl = VersionedParquetTable(spark, root)
        va = tbl.commit(v1)
        vb = tbl.commit(v2)
        return tbl.diff(["o_orderkey"], v_from=va, v_to=vb).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "recursive_cte_tree_rollup",
    oracle="""
        WITH RECURSIVE anc(doc_id, node, hop) AS (
            SELECT doc_id, doc_id, 0 FROM documents
            UNION ALL
            SELECT doc_id, node // 2, hop + 1 FROM anc WHERE node > 0
        ), per_doc AS (
            SELECT doc_id, max(hop) AS depth, sum(node) AS path_sum
            FROM anc GROUP BY doc_id
        )
        SELECT depth, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(path_sum) AS BIGINT) AS total_path_sum
        FROM per_doc GROUP BY depth
    """,
    doc="Recursive CTE (the Spark 4.1 WITH RECURSIVE surface): "
        "hierarchical rollup over the implicit binary tree parent(n) = "
        "n div 2 on doc ids — every document walks its ancestor chain "
        "to the root, then per-depth counts and exact integer "
        "path-sum checksums aggregate the closure. The recursion "
        "engine-side materializes one frontier per level (13 levels at "
        "sf0.1), each a scan-side projection of the previous — the "
        "UNION ALL plan form Spark executes is the same unrolled-loop "
        "shape the graph operators build by hand, now expressed "
        "declaratively. All-integer arithmetic, exact cross-engine. "
        "Hierarchy rollups (taxonomy trees, org charts, BOM "
        "explosions) are a canonical warehouse recursion; depth is "
        "log2(max id), so the closure is O(N log N) rows at any "
        "corpus size (SURVEY.md 2.9/SQL front-end [EXT]).",
    tags=("sql-api", "recursive"),
)
def recursive_cte_tree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import load_table

    load_table(spark, sf_dir, "documents").createOrReplaceTempView("rcte_documents")
    return spark.sql("""
        WITH RECURSIVE anc(doc_id, node, hop) AS (
            SELECT doc_id, doc_id, 0 FROM rcte_documents
            UNION ALL
            SELECT doc_id, node DIV 2, hop + 1 FROM anc WHERE node > 0
        ), per_doc AS (
            SELECT doc_id, max(hop) AS depth, sum(node) AS path_sum
            FROM anc GROUP BY doc_id
        )
        SELECT depth, count(*) AS n_docs,
               CAST(sum(path_sum) AS BIGINT) AS total_path_sum
        FROM per_doc GROUP BY depth
    """)


@register(
    "lateral_topk_orders_per_customer",
    oracle="""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) o
    """,
    doc="LATERAL correlated subquery with ORDER BY + LIMIT (the SQL "
        "cross-apply surface): each customer's top-3 orders by price. "
        "The point is what Catalyst does with it — the per-row "
        "subquery DECORRELATES into a single windowed rank over "
        "orders with WindowGroupLimit pushdown (partial per-map-task "
        "group limits: <= 3 rows per customer ship per task regardless "
        "of skew) joined back to customer, NOT a nested loop per row — "
        "asserted by the plan test. Semantics parity of "
        "topk_per_group, expressed in the SQL front-end; customers "
        "with no orders drop (inner lateral), identically on both "
        "engines. Prices compare bit-exact (same parquet doubles, no "
        "arithmetic) (SURVEY.md SQL front-end [EXT]).",
    tags=("sql-api", "window", "topk"),
)
def lateral_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import load_table

    load_table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql("""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM lat_customer c, LATERAL (
            SELECT o_orderkey, o_totalprice FROM lat_orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) o
    """)
