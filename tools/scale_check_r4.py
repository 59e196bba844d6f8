#!/usr/bin/env python3
"""Round-4 scale proof-points.

1. **Connected components** at m× disjoint co-purchase graph copies
   (node ids offset per replica — reuses scale_check_r3b's replicator).
   Exact-truth invariant: disjoint copies cannot merge, so the number
   of components must be EXACTLY m × the base count and the multiset
   of component sizes m× the base multiset (checked via total nodes
   and size-histogram equality). Records wall seconds and shuffle
   bytes — per-round label shuffles are O(V), so both should grow
   ~linearly in m, never quadratically.

2. **TPC-H Q21 shape** (waiting_orders_suppliers_q21's decorrelated
   per-order distinct-count form) at m× disjoint order replicas
   (orderkeys offset; lineitem follows; the 100-supplier dim is
   SHARED). Exact-truth invariant: each replica contributes the same
   waiting orders, so every supplier's numwait must be exactly m× its
   base value. The interesting scale property: the EXISTS/NOT-EXISTS
   pair costs two orderkey-keyed shuffles of the fact regardless of m —
   a correlated-subquery execution would re-probe per row.

Usage: python tools/scale_check_r4.py [multiplier ...] (default 1 5 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_check import shuffle_bytes  # noqa: E402
from scale_check_r3b import disjoint_edge_replicas  # noqa: E402

_OFF = 50_000_000


def replicated_fact(spark, sf_dir: str, m: int):
    """(orders, lineitem) with m disjoint orderkey-offset copies."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    def reps(df, key):
        parts = [
            df.withColumn(key, F.col(key) + r * _OFF) for r in range(m)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    return reps(orders, "o_orderkey"), reps(li, "l_orderkey")


def q21_shape(spark, orders, li, supp, nation):
    from pyspark.sql import functions as F

    late = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            orders.filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
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
    nat = nation.filter(F.col("n_name").isin("NATION_3", "NATION_7")).select(
        F.col("n_nationkey").alias("n_key"))
    return (
        late.filter(F.col("is_late"))
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_key"))
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


def main() -> None:
    multipliers = [int(x) for x in sys.argv[1:]] or [1, 5, 10]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ui_port = 4053

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("scale-check-r4")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(ui_port))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from open_crime_etl_pipeline_spark.operators.graph import connected_components

    supp = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet")).select(
        "s_suppkey", "s_name", "s_nationkey")
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))

    # Warm-up: compile both plan families once on small inputs.
    connected_components(
        disjoint_edge_replicas(spark, sf_dir, 1).limit(5_000), iters=8
    ).count()
    o1, l1 = replicated_fact(spark, sf_dir, 1)
    q21_shape(spark, o1, l1.limit(20_000), supp, nation).count()

    def best_of(fn, n=2):
        best, result = float("inf"), None
        for _ in range(n):
            t0 = time.perf_counter()
            result = fn()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext._jvm.System.gc()
        return best, result

    base_cc = None   # (n_components, size histogram) at m=1
    base_q21 = None  # {supplier: numwait} at m=1
    for m in multipliers:
        row = {"m": m}

        edges = disjoint_edge_replicas(spark, sf_dir, m).localCheckpoint()
        row["edges"] = edges.count()
        w0, r0 = shuffle_bytes(ui_port)

        def run_cc():
            labels = connected_components(edges, iters=8)
            hist = {
                int(r["n_nodes"]): int(r["n"])
                for r in labels.groupBy("label").count()
                .groupBy(F.col("count").alias("n_nodes"))
                .agg(F.count("*").alias("n")).collect()
            }
            return hist

        row["cc_sec"], hist = best_of(run_cc)
        w1, r1 = shuffle_bytes(ui_port)
        row["cc_shuffle_mb"] = round((w1 - w0) / 2 / 1e6, 1)  # /2: best_of runs twice
        row["n_components"] = sum(hist.values())
        if m == 1:
            base_cc = hist
        # disjoint copies: histogram must be exactly m x the base
        assert hist == {k: v * m for k, v in base_cc.items()}, (m, hist)

        orders, li = replicated_fact(spark, sf_dir, m)
        orders, li = orders.localCheckpoint(), li.localCheckpoint()
        w0, r0 = shuffle_bytes(ui_port)

        def run_q21():
            return {
                r["supp_name"]: int(r["numwait"])
                for r in q21_shape(spark, orders, li, supp, nation).collect()
            }

        row["q21_sec"], waits = best_of(run_q21)
        w1, r1 = shuffle_bytes(ui_port)
        row["q21_shuffle_mb"] = round((w1 - w0) / 2 / 1e6, 1)
        if m == 1:
            base_q21 = waits
        assert waits == {k: v * m for k, v in base_q21.items()}, (m, waits)
        row["q21_suppliers"] = len(waits)

        print(json.dumps(row))

    spark.stop()


if __name__ == "__main__":
    main()
