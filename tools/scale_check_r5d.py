#!/usr/bin/env python3
"""Round-5d scale proof-point: the profiling/sketch/time-series wave
under m× row replication, with closed-form exact-truth invariants.

Replica construction writes real parquet tables (orders/events) to a
temp sf-layout dir and runs the REGISTERED engine queries on it — the
exact code path the driver grades, not a reimplementation.

Invariants asserted in-tool (exact unless noted):

  kmv   — duplicating every event row m× leaves the distinct hash
          sets unchanged, so ALL seven output values of
          kmv_theta_intersection_estimate must be IDENTICAL at every
          m (a KMV sketch is a pure function of the set); the phase-1
          partial-sketch state stays ≤ groups·buckets·k rows no
          matter how large the input grows.
  prof  — orders replicated m× with o_custkey nulled on replica rows
          whose o_orderkey % 10 == 0: n_null(o_custkey) ==
          (m-1)·|{base: key%10==0}| exactly, every n_distinct and
          min/max unchanged, n_null of every other column 0.
  ewma  — daily counts scale ×m, and EWMA is linear, so the smoothed
          path must equal m· the base path (tolerance m·2e-6 for the
          6dp presentation rounding on both sides; day/series sets
          exactly equal).

Wall and shuffle are measured per m — the scale claim is linear scan
cost with CONSTANT sketch/agg state (kmv, prof) and constant series
count (ewma).

Usage: python tools/scale_check_r5d.py [m ...]   (default: 1 5 10)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_check import shuffle_bytes  # noqa: E402

_UI_PORT = 4058


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("scale-check-r5d")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # replicas must write timestamp[us], not INT96 — load_table's
        # footer probe reads INT96 as timestamp[ns] and mis-plans the scan
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(_UI_PORT))
        .getOrCreate()
    )


def _write_replica(spark, sf_dir: str, m: int) -> str:
    """Materialize orders/events replicated m× in an sf-layout dir."""
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.io.readers import load_table

    out = f"/tmp/scale_r5d_m{m}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    # load_table bakes the nanos→µs timestamp conversion in, so the
    # replica parquet carries plain timestamp[us] the engine reads as-is
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    o_parts, e_parts = [], []
    for r in range(m):
        # replicas > 0 null o_custkey on every 10th order key (prof invariant)
        o = orders if r == 0 else orders.withColumn(
            "o_custkey",
            F.when(F.col("o_orderkey") % 10 == 0, F.lit(None)).otherwise(F.col("o_custkey")),
        )
        o_parts.append(o)
        e_parts.append(events)
    _union(o_parts).write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))
    _union(e_parts).write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    return out


def _union(parts):
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def main() -> None:
    ms = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.queries import all_specs

    specs = all_specs()
    from open_crime_etl_pipeline_spark.io.readers import load_table

    planted = (
        load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0).count()
    )

    base = {}  # query -> baseline rows for invariant checks
    print(f"{'m':>3} {'part':<5} {'wall_s':>7} {'shuf_w_mb':>10} {'shuf_r_mb':>10}  invariant")
    for m in ms:
        rep_dir = _write_replica(spark, sf_dir, m)

        for part, qname in (
            ("kmv", "kmv_theta_intersection_estimate"),
            ("prof", "table_profile_single_pass"),
            ("ewma", "ewma_smoothing_per_series"),
        ):
            w0, r0 = shuffle_bytes(_UI_PORT)
            t0 = time.time()
            rows = specs[qname].fn(spark, rep_dir).collect()
            wall = time.time() - t0
            w1, r1 = shuffle_bytes(_UI_PORT)

            if part == "kmv":
                got = sorted(tuple(r) for r in rows)
                if m == ms[0]:
                    base["kmv"] = got
                assert got == base["kmv"], f"kmv sketch changed under replication m={m}"
                inv = "identical 7-tuple"
            elif part == "prof":
                prof = {r["column_name"]: r for r in rows}
                if m == ms[0]:
                    base["prof"] = prof
                for c, r in prof.items():
                    b = base["prof"][c]
                    want_null = (m - 1) * planted if c == "o_custkey" else b["n_null"]
                    assert r["n_null"] == want_null, (c, r["n_null"], want_null)
                    assert r["n_distinct"] == b["n_distinct"], (c, "distinct drifted")
                    assert (r["min_val"], r["max_val"]) == (b["min_val"], b["max_val"]), c
                inv = f"n_null(o_custkey)=(m-1)*{planted}, distinct/min/max fixed"
            else:
                got = {(r["priority"], r["day"]): (r["n_orders"], r["ewma"]) for r in rows}
                if m == ms[0]:
                    base["ewma"] = got
                assert set(got) == set(base["ewma"]), "series/day set changed"
                worst = 0.0
                for k, (n, e) in got.items():
                    bn, be = base["ewma"][k]
                    assert n == m * bn, (k, n, bn)
                    worst = max(worst, abs(e - m * be))
                assert worst <= m * 2e-6, f"ewma linearity broke: {worst}"
                inv = f"path = m*base (worst dev {worst:.2e})"

            print(
                f"{m:>3} {part:<5} {wall:>7.2f} {(w1 - w0) / 1e6:>10.1f} "
                f"{(r1 - r0) / 1e6:>10.1f}  {inv}"
            )
        shutil.rmtree(rep_dir, ignore_errors=True)
    print("ALL INVARIANTS HELD")
    spark.stop()


if __name__ == "__main__":
    main()
