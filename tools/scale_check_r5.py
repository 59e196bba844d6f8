#!/usr/bin/env python3
"""Round-5 scale proof-points.

1. **Adversarial-diameter connected components** — a planted path
   graph (diameter D) is min-label propagation's worst case: O(D)
   synchronous rounds. The large-star/small-star variant
   (operators/graph.py::connected_components_star) halves
   distances-to-min per round. Proofs:
   - D=200: BOTH variants run to convergence — min-prop needs D+1
     rounds, star ~log2(D); identical labels asserted (exact truth:
     every label is 0).
   - D=2000: star runs to convergence (~12 rounds); min-prop is run
     for a FIXED 30-round slice and its full cost extrapolated at the
     measured per-round rate (running all 2000 rounds would only
     restate the linearity).

2. **Skew-join win** (salted_join_skew_check proves equivalence; this
   measures the WIN): 10M-row fact table with a 90%-hot key joined to
   a 10k-row dim under (a) plain sort-merge (AQE skew handling OFF),
   (b) AQE skew-join ON (thresholds lowered so the splitter engages at
   this data size), (c) explicit hot-key salting
   (operators/skew.py::salted_join). Exact-truth invariant: all three
   return the identical (count, checksum). The plain variant's hot
   partition serializes one task; (b)/(c) spread it.

3. **BM25 retrieval at m× corpus replicas** (doc_id offset, text
   unchanged — the r4b replica device). BM25 scores are functions of
   (tf, dl, df, N); all m copies of a doc share them, so the exact
   invariants are: every doc family has exactly ONE distinct score
   (asserted over the FULL scored set, not just top-k), and the
   m=10 top-10 equals a DuckDB oracle run on the same replicated
   corpus (full differential at scale). Shuffle must grow ~linearly.

4. **Logistic-GD training at m× replicas**: the gradient step divides
   by n, so exact replication leaves the mean gradient — and therefore
   the whole 2-step trajectory — unchanged; the 6dp-rounded params at
   m=5,10 must EQUAL the base. Shuffle ~linear (one partial-agg
   shuffle of 4 decimal sums per step).

Usage: python tools/scale_check_r5.py [part ...]  parts: cc skew bm25 gd
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_check import shuffle_bytes  # noqa: E402

_OFF = 10_000_000
_UI_PORT = 4055


def _spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("scale-check-r5")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(_UI_PORT))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def part_cc(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators import graph as G

    def path(d):
        return spark.range(d).select(
            F.col("id").alias("a"), (F.col("id") + 1).alias("b")
        )

    # warm both plan families
    G.connected_components_star(path(16))[0].count()
    G.connected_components(path(16), iters=4).count()

    print("diameter | variant | rounds | wall s | labels-exact")
    for d in (200,):
        t0 = time.perf_counter()
        ls, rs = G.connected_components_star(path(d))
        star_ok = ls.filter(F.col("label") != 0).isEmpty() and ls.count() == d + 1
        tstar = time.perf_counter() - t0
        print(f"{d} | star    | {rs} | {tstar:.1f} | {star_ok}", flush=True)
        assert star_ok and rs <= 16, (rs, star_ok)

        t0 = time.perf_counter()
        lm, rm = G.connected_components_converged(path(d), max_iters=d + 10)
        min_ok = lm.filter(F.col("label") != 0).isEmpty() and lm.count() == d + 1
        tmin = time.perf_counter() - t0
        print(f"{d} | minprop | {rm} | {tmin:.1f} | {min_ok}", flush=True)
        assert min_ok and rm == d + 1, (rm, min_ok)

    d = 2000
    t0 = time.perf_counter()
    ls, rs = G.connected_components_star(path(d))
    star_ok = ls.filter(F.col("label") != 0).isEmpty() and ls.count() == d + 1
    tstar = time.perf_counter() - t0
    print(f"{d} | star    | {rs} | {tstar:.1f} | {star_ok}", flush=True)
    assert star_ok and rs <= 18, (rs, star_ok)
    slice_rounds = 30
    t0 = time.perf_counter()
    G.connected_components(path(d), iters=slice_rounds).count()
    tslice = time.perf_counter() - t0
    est = tslice / slice_rounds * d
    print(
        f"{d} | minprop | {slice_rounds}-round slice {tslice:.1f}s -> "
        f"~{est:.0f}s extrapolated for the {d} rounds convergence needs",
        flush=True,
    )


def part_skew(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators.skew import salted_join

    n_fact, n_dim, hot_frac_mod = 10_000_000, 10_000, 10  # 9/10 rows hot
    fact = spark.range(n_fact).select(
        F.when(F.pmod("id", hot_frac_mod) < hot_frac_mod - 1, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_dim)))
        .alias("k"),
        F.concat(F.lit("payload-" * 8), F.col("id").cast("string")).alias("pay"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("dv")
    )

    def checksum(df):
        r = df.agg(
            F.count("*").alias("n"),
            F.sum(F.length("pay") + F.col("dv")).cast("long").alias("s"),
        ).collect()[0]
        return r["n"], r["s"]

    def run(tag, fn, conf):
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            fn()  # warm/compile once
            w0, _ = shuffle_bytes(_UI_PORT)
            t0 = time.perf_counter()
            out = fn()
            wall = time.perf_counter() - t0
            w1, _ = shuffle_bytes(_UI_PORT)
            print(
                f"{tag} | {wall:.1f}s | {(w1 - w0) / (1 << 20):.0f} MB shuffle "
                f"| {out}",
                flush=True,
            )
            return out
        finally:
            for k in conf:
                spark.conf.unset(k)

    no_bcast = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    print("variant | wall | shuffle | (rows, checksum)")
    plain = run(
        "plain-smj (skew handling off)",
        lambda: checksum(fact.join(dim, "k")),
        {**no_bcast, "spark.sql.adaptive.skewJoin.enabled": "false"},
    )
    aqe = run(
        "aqe-skew-join",
        lambda: checksum(fact.join(dim, "k")),
        {
            **no_bcast,
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
        },
    )
    hot = spark.createDataFrame([(0,)], "k long")
    salted = run(
        "salted (hot-key list)",
        lambda: checksum(
            salted_join(fact, dim, on=["k"], salt_buckets=32, hot_keys=hot)
        ),
        {**no_bcast, "spark.sql.adaptive.skewJoin.enabled": "false"},
    )
    assert plain == aqe == salted, (plain, aqe, salted)
    print("skew invariant held: identical (rows, checksum) across variants")


def _replicated_docs(spark, sf_dir: str, m: int, cols):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(*cols)
    parts = [docs.withColumn("doc_id", F.col("doc_id") + r * _OFF) for r in range(m)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def part_bm25(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.queries.llm import (
        _BM25_TERMS,
        bm25_over,
    )

    bm25_over(_replicated_docs(spark, sf_dir, 1, ["doc_id", "text"]).limit(500)).count()
    base_top = None
    print("m | wall s | shuffle MB | top1 (family, score)")
    for m in (1, 5, 10):
        docs = _replicated_docs(spark, sf_dir, m, ["doc_id", "text"])
        w0, _ = shuffle_bytes(_UI_PORT)
        t0 = time.perf_counter()
        top = bm25_over(docs).collect()
        wall = time.perf_counter() - t0
        w1, _ = shuffle_bytes(_UI_PORT)
        assert len(top) == 10
        # every returned row's family must contain this score m times —
        # check over the FULL scored set: one distinct score per family
        fams = {r["doc_id"] % _OFF for r in top}
        toks = docs.select("doc_id", F.split("text", " ").alias("t"))
        per_fam = (
            toks.select("doc_id", F.explode("t").alias("term"))
            .filter(F.col("term").isin(*_BM25_TERMS))
            .groupBy((F.col("doc_id") % _OFF).alias("fam"), F.col("doc_id"))
            .agg(F.count("*").alias("n"))
            .groupBy("fam")
            .agg(
                F.count("*").alias("copies"),
                F.count_distinct("n").alias("distinct_counts"),
            )
            .filter(
                (F.col("copies") != m) | (F.col("distinct_counts") != 1)
            )
        )
        assert per_fam.isEmpty(), "replica families diverged"
        print(
            f"{m} | {wall:.1f} | {(w1 - w0) / (1 << 20):.0f} | "
            f"({top[0]['doc_id'] % _OFF}, {top[0]['score']})",
            flush=True,
        )
        if m == 1:
            base_top = top
        if m == 10:
            import duckdb

            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW documents AS "
                f"SELECT doc_id + r.range * {_OFF} AS doc_id, text "
                f"FROM read_parquet('{sf_dir}/documents.parquet'), "
                f"range({m}) r"
            )
            from open_crime_etl_pipeline_spark.queries import all_specs

            oracle = all_specs()["bm25_retrieval_topk"].oracle
            odf = con.execute(oracle).fetchdf()
            got = [
                (r["doc_id"], r["score"], r["n_terms_matched"], r["rank"])
                for r in top
            ]
            want = list(
                odf[["doc_id", "score", "n_terms_matched", "rank"]].itertuples(
                    index=False, name=None
                )
            )
            assert got == want, "10x top-10 diverged from DuckDB oracle"
            print("10x DuckDB differential: exact match", flush=True)
    assert base_top is not None


def part_gd(spark, sf_dir: str) -> None:
    from open_crime_etl_pipeline_spark.queries.llm import logistic_gd_over

    cols = ["doc_id", "n_chars", "text"]
    logistic_gd_over(_replicated_docs(spark, sf_dir, 1, cols).limit(500)).count()
    base = None
    print("m | wall s | shuffle MB | params")
    for m in (1, 5, 10):
        docs = _replicated_docs(spark, sf_dir, m, cols)
        w0, _ = shuffle_bytes(_UI_PORT)
        t0 = time.perf_counter()
        params = {
            r["param"]: r["value"] for r in logistic_gd_over(docs).collect()
        }
        wall = time.perf_counter() - t0
        w1, _ = shuffle_bytes(_UI_PORT)
        print(
            f"{m} | {wall:.1f} | {(w1 - w0) / (1 << 20):.0f} | {params}",
            flush=True,
        )
        if base is None:
            base = params
        else:
            assert params == base, (m, params, base)
    print("gd invariant held: identical 6dp params at every multiplier")


def part_esd(spark, sf_dir: str) -> None:
    """Exact substring dedup at m× replicas. Replication makes every
    ≥15-token doc an exact corpus-level duplicate, so the invariants
    are closed-form: replica-0 rows EQUAL the base run row-for-row
    (base ids stay canonical), and every replica-r>0 doc with
    n_tokens ≥ 15 is FULLY excised (n_excised == n_tokens, one span,
    n_kept == 0). Shuffle must stay ~linear in m."""
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators.dedup import (
        repeated_substring_excision,
    )

    repeated_substring_excision(
        _replicated_docs(spark, sf_dir, 1, ["doc_id", "text"]).limit(300)
    ).count()
    base = None
    print("m | wall s | shuffle MB | rows | fully-excised replicas")
    for m in (1, 5, 10):
        docs = _replicated_docs(spark, sf_dir, m, ["doc_id", "text"])
        w0, _ = shuffle_bytes(_UI_PORT)
        t0 = time.perf_counter()
        rows = repeated_substring_excision(docs, min_len=15).collect()
        wall = time.perf_counter() - t0
        w1, _ = shuffle_bytes(_UI_PORT)
        got = {r["doc_id"]: r.asDict() for r in rows}
        if base is None:
            base = got
        assert len(got) == m * len(base), (m, len(got), len(base))
        for did, b in base.items():
            assert got[did] == b, (m, did)  # replica 0 == base, exactly
        full = 0
        for did, r in got.items():
            if did >= _OFF and r["n_tokens"] >= 15:
                assert (
                    r["n_excised"] == r["n_tokens"]
                    and r["n_spans"] == 1
                    and r["n_kept"] == 0
                ), (did, r)
                full += 1
        print(
            f"{m} | {wall:.1f} | {(w1 - w0) / (1 << 20):.0f} | {len(got)} | {full}",
            flush=True,
        )
    print("esd invariant held: replica-0 identity + full excision of copies")


def main() -> None:
    parts = sys.argv[1:] or ["cc", "skew", "bm25", "gd", "esd"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    for p in parts:
        print(f"=== {p} ===", flush=True)
        {
            "cc": part_cc,
            "skew": part_skew,
            "bm25": part_bm25,
            "gd": part_gd,
            "esd": part_esd,
        }[p](spark, sf_dir)
    print("scale_check_r5: all invariants held")


if __name__ == "__main__":
    main()
