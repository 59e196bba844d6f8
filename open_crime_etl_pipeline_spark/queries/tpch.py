"""TPC-H shape completion — the remaining canonical decision-support
query shapes not already covered by core.py (Q1/Q3/Q4/Q5/Q14/Q17 live
there). With these, all 22 TPC-H query SHAPES have a registered,
oracle-backed analog (SURVEY.md §2.3 J6 / §2.4 A8 [EXT] relational
breadth).

The fixture schema is reduced TPC-H (TESTDATA.md): no ``partsupp``, no
``l_shipmode/l_commitdate/l_receiptdate``, no ``c_phone/o_comment``.
Queries whose literal TPC-H text needs those columns are ADAPTED to
preserve the operator shape — the thing the engine must execute — on
the columns that exist:

- Q2  min-cost supplier: part-supplier link = lineitem, cost = min
  unit price (correlated-min shape intact).
- Q9  profit: supply cost proxied as 10% of ``p_retailprice``.
- Q11 important stock: per-part lineitem value vs a global-total
  scalar-subquery threshold (HAVING > fraction × scalar intact).
- Q12 shipmode priority bucketing: DISPOSITION — the conditional
  two-way CASE-count aggregation shape is already registered as
  ``conditional_bucketing`` (queries/core.py); no l_shipmode column
  exists to vary it, so no separate query is added.
- Q13 order-count distribution: the o_comment NOT LIKE filter becomes
  an o_orderpriority predicate INSIDE the left-join ON clause (the
  semantics that makes Q13 a left join, preserved).
- Q16 supplier variety: supplier-part association from lineitem; the
  excluded-supplier NOT IN subquery keys on s_acctbal < 0.
- Q20 excess supply: shipped-quantity share per (supplier, part)
  against the part's total (nested-aggregate semi-join shape).
- Q21 waiting orders: "late" = shipped > 90 days after order date;
  the EXISTS / NOT EXISTS pair is computed distributively as
  per-order supplier / late-supplier distinct counts (n_supps > 1 ∧
  n_late = 1) — equivalent set, no correlated double self-join.
- Q22 sales opportunity: country code = c_custkey % 10; "no orders"
  = no orders after 1999-01-01 (every fixture customer has SOME
  order); the avg-balance scalar subquery is exact-decimal so the
  threshold comparison is bit-identical across engines.

Scale notes: every query keeps filters on the scan side (pushed),
joins the big tables on their natural keys (AQE picks broadcast for
dim-sized sides), and computes scalar-subquery thresholds as 1-row
aggregates broadcast-crossJoined — never a driver collect().

Reference provenance: the reference warehouse serves exactly this
class of analytical SQL over its star schema (SURVEY.md §3.3,
db_postgres.py:70-84 executor micro-API); TPC-H is the public
canonical inventory of those shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import _t, davg, dec2, dsum, fmt_date  # noqa: F401
from .registry import register

_TS = lambda s: F.lit(s).cast("timestamp")  # noqa: E731


@register(
    "forecast_revenue_q6",
    oracle="""
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                             * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecasting revenue change): pure scan-side "
        "conjunctive range predicates (year, discount band, quantity "
        "cap) + single global agg — the canonical everything-pushed-"
        "down query; the parquet scan sees all three PushedFilters and "
        "the agg is one partial+final over a 1-row result.",
    tags=("filter", "agg", "tpch"),
)
def forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _TS("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _TS("1998-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(dec2("l_extendedprice") * dec2("l_discount")), 2)
            .cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "nation_volume_shipping_q7",
    oracle="""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                             * CAST(1 - l.l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                               AND TIMESTAMP '1997-12-31 00:00:00'
        GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape (volume shipping): bidirectional nation-pair "
        "trade volume by ship year — the disjunctive cross-nation "
        "predicate over a 6-way join. nation is a 25-row dim (forced "
        "broadcast); the two fact joins shuffle on their keys and the "
        "OR pair filter runs post-join where it belongs (it references "
        "both sides).",
    tags=("join", "agg", "tpch"),
)
def nation_volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            _TS("1996-01-01 00:00:00"), _TS("1997-12-31 00:00:00")
        )
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    cn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    sn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(F.sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))), 2)
            .cast("double").alias("revenue")
        )
    )


@register(
    "market_share_q8",
    oracle="""
        WITH all_orders AS (
            SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
                   CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * CAST(1 - l.l_discount AS DECIMAL(12,2)) AS volume,
                   sn.n_name AS supp_nation
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region r ON cn.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
              AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                                    AND TIMESTAMP '1996-12-31 00:00:00'
        )
        SELECT o_year,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_4' THEN volume
                                   ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                     / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
        FROM all_orders GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): 8-way join narrowing "
        "to ASIA customers buying PROMO parts in a 2-year window, then "
        "share-of-total per year via conditional aggregation. Both "
        "sums are exact decimal; the single share division happens in "
        "double at the end (engine-deterministic). part/nation/region "
        "dims broadcast; fact joins shuffle once each.",
    tags=("join", "agg", "tpch"),
)
def market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            _TS("1995-01-01 00:00:00"), _TS("1996-12-31 00:00:00"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    asia_cust_nations = F.broadcast(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    sn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    vol = dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(asia_cust_nations, F.col("c_nationkey") == F.col("cn_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"), "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_4", F.col("volume"))
                  .otherwise(zero)).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "product_profit_q9",
    oracle="""
        SELECT sn.n_name AS nation, CAST(year(l.l_shipdate) AS INT) AS o_year,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l.l_discount AS DECIMAL(12,2))
                            - CAST(l.l_quantity AS DECIMAL(12,2))
                              * CAST(p.p_retailprice AS DECIMAL(12,2))
                              * CAST('0.1' AS DECIMAL(2,1))), 2) AS DOUBLE) AS profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE p.p_name LIKE '%gear%'
        GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (product-type profit): substring-matched parts "
        "('%gear%'), profit = revenue − supply cost per supplier nation "
        "and ship year. No partsupp table exists, so supply cost is "
        "proxied as 10% of p_retailprice × quantity — the join/agg "
        "shape (LIKE-filtered dim ⋈ fact ⋈ supplier ⋈ nation, two-key "
        "rollup, mixed +/− decimal measure) is what's exercised. The "
        "LIKE filter prunes part BEFORE the broadcast.",
    tags=("join", "agg", "tpch"),
)
def product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    sn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")))
    profit = (
        dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))
        - dec2("l_quantity") * dec2("p_retailprice") * F.lit("0.1").cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("nation", F.year("l_shipdate").cast("int").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


@register(
    "returned_items_topk_q10",
    oracle="""
        SELECT c.c_custkey AS cust_key, c.c_name AS cust_name,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                             * CAST(1 - l.l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
               c.c_acctbal AS acctbal, n.n_name AS nation
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY 1, 2, 4, 5
        ORDER BY revenue DESC, cust_key LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): one-quarter orders "
        "⋈ returned lineitems ⋈ customer ⋈ nation, revenue lost per "
        "customer, top-20 under a total order (revenue desc, key asc). "
        "Both filters are scan-pushed; the limit executes as "
        "TakeOrderedAndProject over per-partition heaps — no global "
        "sort of the full customer ranking.",
    tags=("join", "agg", "topk", "tpch"),
)
def returned_items_topk_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1997-04-01 00:00:00"))
    ).select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nation = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n_key"), F.col("n_name").alias("nation")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, F.col("c_nationkey") == F.col("n_key"))
        .groupBy(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("cust_name"),
            F.col("c_acctbal").alias("acctbal"),
            "nation",
        )
        .agg(
            F.round(F.sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))), 2)
            .cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("cust_key"))
        .limit(20)
    )


@register(
    "important_parts_q11",
    oracle="""
        WITH pv AS (
            SELECT l_partkey AS part_key,
                   sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS value
            FROM lineitem GROUP BY l_partkey
        )
        SELECT part_key, CAST(round(value, 2) AS DOUBLE) AS part_value
        FROM pv
        WHERE CAST(value AS DOUBLE) > 1.5 * (
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
            FROM lineitem)
            / (SELECT count(DISTINCT l_partkey) FROM lineitem)
    """,
    doc="TPC-H Q11 shape (important stock): per-part value with a "
        "HAVING threshold that is a fraction of a GLOBAL scalar "
        "subquery. No partsupp table, so value = lineitem extended "
        "price per part — the group-agg + scalar-subquery-threshold "
        "shape is intact. The threshold is SCALE-FREE — 1.5× the mean "
        "per-part value (grand total / distinct parts), the same "
        "device as literal Q11's 0.0001/SF fraction — so the query "
        "returns a non-empty tail at EVERY scale factor (a fixed "
        "fraction of the grand total empties as SF grows, which made "
        "the sf0.1 hash check vacuous in r4; 29 rows at sf0.01, 252 "
        "at sf0.1 now). Spark computes both scalars in ONE 1-row agg "
        "crossJoined (broadcast) onto the grouped rows: two passes "
        "over a map-side-combined aggregate, zero driver collects. "
        "Both sides exact decimal; one double multiply at the "
        "threshold compare.",
    tags=("agg", "subquery", "tpch"),
)
def important_parts_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    pv = li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.sum(dec2("l_extendedprice")).alias("value"))
    total = li.agg(
        F.sum(dec2("l_extendedprice")).cast("double").alias("grand_total"),
        F.count_distinct("l_partkey").alias("n_parts"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(
            F.col("value").cast("double")
            > 1.5 * F.col("grand_total") / F.col("n_parts"))
        .select("part_key", F.round("value", 2).cast("double").alias("part_value"))
    )


@register(
    "order_count_distribution_q13",
    oracle="""
        WITH c_orders AS (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM c_orders GROUP BY c_count
    """,
    doc="TPC-H Q13 shape (customer order distribution): LEFT join with "
        "the filter in the ON clause (customers with zero qualifying "
        "orders must survive with count 0 — the semantics that forces "
        "an outer join), then a second aggregation over the first's "
        "result (count of counts). The o_comment NOT LIKE filter of "
        "literal Q13 becomes an o_orderpriority predicate (no comment "
        "column). First agg shuffles on custkey; second on the tiny "
        "count domain.",
    tags=("join", "agg", "tpch"),
)
def order_count_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority")
    c_orders = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "top_supplier_q15",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(1 - l_discount AS DECIMAL(12,2))) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey AS supp_key, s.s_name AS supp_name,
               CAST(round(r.total_revenue, 2) AS DOUBLE) AS total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape (top supplier): a derived revenue view joined "
        "against its own MAX — the reuse-a-CTE-twice shape. Spark "
        "computes revenue once, derives the 1-row max, and broadcast-"
        "crossJoins it back for the equality filter; the equality is "
        "on EXACT decimal sums so ties and the max compare are "
        "deterministic across engines (no double-rounding before the "
        "compare).",
    tags=("agg", "subquery", "tpch"),
)
def top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1997-04-01 00:00:00"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount")))
        .alias("total_revenue"))
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "supplier_variety_q16",
    oracle="""
        SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#5'
          AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape (parts/supplier variety): negated-equality + "
        "IN-list part filters, a NOT IN excluded-supplier subquery, "
        "and COUNT(DISTINCT supplier) per part attribute triple. The "
        "part-supplier association comes from lineitem (no partsupp); "
        "the exclusion keys on s_acctbal < 0 (no comment column). "
        "Spark runs NOT IN as a broadcast LEFT ANTI join (the fixture "
        "has no NULL keys; literal NOT IN null semantics would need "
        "NullAwareAntiJoin) and the distinct-count expands then "
        "two-phase aggregates.",
    tags=("join", "agg", "subquery", "tpch"),
)
def supplier_variety_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "large_volume_customers_q18",
    oracle="""
        SELECT c.c_name AS cust_name, c.c_custkey AS cust_key,
               o.o_orderkey AS order_key,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
               o.o_totalprice AS total_price,
               CAST(round(sum(CAST(l.l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150
        )
        GROUP BY 1, 2, 3, 4, 5
    """,
    doc="TPC-H Q18 shape (large-volume customers): IN over a grouped "
        "HAVING subquery (orders whose total quantity exceeds a "
        "threshold), joined back to customer/orders/lineitem and "
        "re-aggregated. Spark expresses the IN as a LEFT SEMI join "
        "against the qualifying-orderkey aggregate — the subquery "
        "side is aggregated BEFORE the semi join, so the big fact "
        "shuffles once on orderkey and qualifying keys are small.",
    tags=("join", "agg", "subquery", "tpch"),
)
def large_volume_customers_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    orders_all = _t(spark, sf_dir, "orders")
    orders = orders_all.join(
        big, orders_all.o_orderkey == big.l_orderkey, "left_semi")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_name").alias("cust_name"),
            F.col("c_custkey").alias("cust_key"),
            F.col("o_orderkey").alias("order_key"),
            fmt_date("o_orderdate").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
        )
        .agg(dsum("l_quantity").alias("sum_qty"))
    )


@register(
    "disjunctive_predicate_revenue_q19",
    oracle="""
        SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                             * CAST(1 - l.l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicates): "
        "an OR of three conjunction groups that each mix columns from "
        "BOTH join sides — the classic optimizer test for extracting "
        "the common single-side conjuncts. Catalyst factors the "
        "part-only disjunction (brand+size) below the join as a scan "
        "filter and keeps the cross-side residual above it; the part "
        "side shrinks to 3 brands before broadcasting.",
    tags=("join", "filter", "tpch"),
)
def disjunctive_predicate_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    g1 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11)
    )
    g2 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20)
    )
    g3 = (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(g1 | g2 | g3)
        .agg(
            F.round(F.sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))), 2)
            .cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "excess_supply_suppliers_q20",
    oracle="""
        WITH sp AS (
            SELECT l.l_suppkey, l.l_partkey,
                   sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS supp_qty
            FROM lineitem l
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1, 2
        ), pt AS (
            SELECT l.l_partkey,
                   sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS part_qty
            FROM lineitem l
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1
        )
        SELECT DISTINCT s.s_suppkey AS supp_key, s.s_name AS supp_name,
                        n.n_name AS nation
        FROM sp
        JOIN pt ON sp.l_partkey = pt.l_partkey
        JOIN part p ON p.p_partkey = sp.l_partkey AND p.p_name LIKE 'red%'
        JOIN supplier s ON s.s_suppkey = sp.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE CAST(sp.supp_qty AS DOUBLE) > 0.5 * CAST(pt.part_qty AS DOUBLE)
    """,
    doc="TPC-H Q20 shape (excess supply): suppliers who, for some "
        "'red%' part, shipped more than half that part's 1997 total — "
        "literal Q20's availqty > 0.5·sum(qty) correlated subquery, "
        "restated distributively: aggregate per (supplier, part) and "
        "per part from the SAME filtered scan, join on partkey, "
        "threshold-compare, project DISTINCT suppliers. Nested "
        "correlated aggregation becomes two shuffles + one join; no "
        "per-part subquery re-execution.",
    tags=("join", "agg", "subquery", "tpch"),
)
def excess_supply_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1998-01-01 00:00:00"))
    ).select("l_suppkey", "l_partkey", "l_quantity")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(dec2("l_quantity")).alias("supp_qty"))
    pt = li.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum(dec2("l_quantity")).alias("part_qty"))
    red_parts = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")).select("p_partkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n_key"), F.col("n_name").alias("nation")))
    return (
        sp.join(pt, sp.l_partkey == pt.pt_partkey)
        .join(F.broadcast(red_parts), sp.l_partkey == red_parts.p_partkey)
        .filter(F.col("supp_qty").cast("double") > 0.5 * F.col("part_qty").cast("double"))
        .join(supp, sp.l_suppkey == supp.s_suppkey)
        .join(nation, F.col("s_nationkey") == F.col("n_key"))
        .select(
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            "nation",
        )
        .distinct()
    )


@register(
    "waiting_orders_suppliers_q21",
    oracle="""
        WITH late AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS is_late
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        )
        SELECT s.s_name AS supp_name, count(DISTINCT l1.l_orderkey) AS numwait
        FROM late l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE l1.is_late
          AND n.n_name IN ('NATION_3', 'NATION_7')
          AND EXISTS (SELECT 1 FROM late l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.is_late)
        GROUP BY 1
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): the "
        "EXISTS / NOT-EXISTS correlated pair over the same fact. "
        "'Late' = shipped > 90 days after order date (no receipt/"
        "commit dates in the fixture). Spark computes per-order "
        "supplier stats ONCE — n_supps = countDistinct(supplier), "
        "n_late = countDistinct(supplier if late) — and the pair "
        "becomes n_supps > 1 ∧ n_late = 1 for a late row: set-"
        "equivalent to the correlated form (the sole late supplier is "
        "the row's own), with two shuffles on orderkey instead of two "
        "correlated self-joins. The oracle states the literal EXISTS "
        "form; matching results prove the rewrite.",
    tags=("join", "agg", "subquery", "tpch"),
)
def waiting_orders_suppliers_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey", "l_suppkey",
            (F.col("l_shipdate")
             > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("is_late"),
        )
    )
    per_order = late.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late"),
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = F.broadcast(
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_3", "NATION_7"))
        .select(F.col("n_nationkey").alias("n_key"))
    )
    return (
        late.filter(F.col("is_late"))
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(nation, F.col("s_nationkey") == F.col("n_key"))
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


@register(
    "global_sales_opportunity_q22",
    oracle="""
        WITH pool AS (
            SELECT c_custkey, c_acctbal, CAST(c_custkey % 10 AS INT) AS cntrycode
            FROM customer WHERE CAST(c_custkey % 10 AS INT) IN (1, 3, 5, 7)
        )
        SELECT cntrycode, count(*) AS numcust,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
        FROM pool p
        WHERE p.c_acctbal > (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
            FROM pool WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = p.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape (global sales opportunity): a selective "
        "customer pool (country code = custkey % 10 — no phone "
        "column), an above-average-balance scalar subquery, and a "
        "NOT EXISTS anti-join against recent orders ('lapsed "
        "customers': every fixture customer has SOME order, so the "
        "anti-join is date-windowed to stay non-vacuous). The avg is "
        "computed as exact-decimal sum / count so the threshold "
        "compare is bit-identical across engines; Spark runs the "
        "NOT EXISTS as LEFT ANTI on custkey and the scalar as a "
        "broadcast crossJoin.",
    tags=("join", "agg", "subquery", "tpch"),
)
def global_sales_opportunity_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    pool = cust.withColumn(
        "cntrycode", (F.col("c_custkey") % 10).cast("int")
    ).filter(F.col("cntrycode").isin(1, 3, 5, 7))
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec2("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _TS("1999-01-01 00:00:00")).select("o_custkey")
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "min_cost_supplier_q2",
    oracle="""
        WITH cost AS (
            SELECT l.l_partkey, l.l_suppkey,
                   min(CAST(l.l_extendedprice AS DOUBLE)
                       / CAST(l.l_quantity AS DOUBLE)) AS unit_price
            FROM lineitem l GROUP BY 1, 2
        )
        SELECT p.p_partkey AS part_key, p.p_name AS part_name,
               s.s_name AS supp_name, s.s_acctbal AS supp_acctbal,
               n.n_name AS nation,
               round(c.unit_price, 4) AS min_unit_price
        FROM part p
        JOIN cost c ON c.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE p.p_size = 15 AND p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
          AND c.unit_price = (
              SELECT min(c2.unit_price) FROM cost c2
              JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
              JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
              JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
              WHERE c2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    """,
    doc="TPC-H Q2 shape (minimum-cost supplier): for each qualifying "
        "part, the EUROPE supplier(s) offering the minimum price — "
        "the correlated-MIN-subquery-in-WHERE shape. Cost comes from "
        "lineitem unit prices (no partsupp). Spark decorrelates: one "
        "grouped cost table, a per-part min over region-filtered "
        "suppliers, equality-join back on (partkey, price). Unit "
        "price is a single IEEE division and MIN is order-independent, "
        "so the equality is engine-deterministic without decimal "
        "rounding. The oracle states the literal correlated form; "
        "matching results prove the decorrelation.",
    tags=("join", "subquery", "tpch"),
)
def min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast("double")
              / F.col("l_quantity").cast("double")).alias("unit_price"))
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_nations = F.broadcast(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_nationkey").alias("n_key"), F.col("n_name").alias("nation"))
    )
    supp = _t(spark, sf_dir, "supplier")
    eu_supp = F.broadcast(
        supp.join(eu_nations, supp.s_nationkey == F.col("n_key"))
        .select("s_suppkey", "s_name", "s_acctbal", "nation")
    )
    eu_cost = cost.join(eu_supp, cost.l_suppkey == F.col("s_suppkey"))
    part = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey", "p_name")
    )
    per_part_min = eu_cost.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("unit_price").alias("min_price"))
    return (
        eu_cost.join(
            per_part_min,
            (eu_cost.l_partkey == F.col("mp_partkey"))
            & (eu_cost.unit_price == F.col("min_price")),
        )
        .join(part, eu_cost.l_partkey == part.p_partkey)
        .select(
            F.col("p_partkey").alias("part_key"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supp_name"),
            F.col("s_acctbal").alias("supp_acctbal"),
            "nation",
            F.round("unit_price", 4).alias("min_unit_price"),
        )
    )
