#!/usr/bin/env python3
"""Round-5e scale proof-point: Naive Bayes train+apply and TPUT
distributed top-k under m× corpus replication, with closed-form
exact-truth invariants.

Replicas append m copies of documents with doc_id offset by r·8e6 —
a multiple of 8, so the TPUT node assignment (doc_id % 8) is
preserved replica-by-replica.

Invariants asserted in-tool:

  nb   — replication multiplies every count table (token-class,
         class-total, priors' numerator AND denominator) by m and
         leaves the vocabulary fixed, so scoring the m× corpus with
         smoothing alpha·m reproduces the base corpus' posteriors
         EXACTLY in real arithmetic: (mc+ma)/(mt+maV) = (c+a)/(t+aV).
         Assert every replica doc's pred_lang equals its base doc's
         and the 6dp scores agree within 2e-6 (ulp-of-ln slack, the
         r5d ewma precedent).
  tput — per-node counts scale ×m with tie order unchanged (ties
         break on the term string), so the reported sets and the
         candidate union are IDENTICAL and every numeric output
         (exact, lower, upper, tail_cap) is exactly m· the base; both
         boolean certificates are scale-invariant. Asserted exactly.
  ada  — round r's weighted error and total scale ×m^(2^(r-1))
         exactly (m, m^2, m^4): the corpus contributes m copies AND
         the update factors (E, T-E) carry the prior round's scaling,
         so per-doc weights scale m^(2^(r-1)-1) and the sums pick up
         one more m — the doubling recurrence b_{r+1} = 2*b_r + 1.
         The learned stump sequence is IDENTICAL and alpha =
         ln((T-E)/E)/2 is BIT-identical (the common power cancels in
         the ratio). Asserted exactly.

Wall and shuffle are measured per m — the scale claim is linear scan
cost with model-table (nb) / candidate-set (tput) shuffle state that
grows with the DICTIONARY, not the corpus.

Usage: python tools/scale_check_r5e.py [m ...]   (default: 1 5 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_check import shuffle_bytes  # noqa: E402

_UI_PORT = 4059


def shuffle_records(ui_port: int) -> int:
    """Shuffle WRITE RECORDS summed over completed stages — the
    compression-free linearity signal: replica doc_ids are large
    (r·8e6 offsets), so bytes/row degrade with m while the row count
    stays exactly linear; records are what the linear-shuffle claim
    is about."""
    import json
    import urllib.request

    base = f"http://localhost:{ui_port}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as res:
        app_id = json.loads(res.read())[0]["id"]
    with urllib.request.urlopen(
        f"{base}/{app_id}/stages?status=complete", timeout=10
    ) as res:
        stages = json.loads(res.read())
    return sum(s.get("shuffleWriteRecords", 0) for s in stages)
_OFF = 8_000_000  # replica doc_id offset; % 8 == 0 keeps the TPUT node


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("scale-check-r5e")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(_UI_PORT))
        .getOrCreate()
    )


def _replicated_docs(spark, sf_dir: str, m: int):
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.io.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * _OFF)) for r in range(m)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    # materialize once so per-part timings measure the operator, not
    # the union re-read (the r5d tools write real parquet; the text
    # corpus is small enough that an eager checkpoint is equivalent)
    return df.localCheckpoint(eager=True)


def main() -> None:
    ms = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    if ms[0] != 1:
        ms = [1] + ms  # every invariant compares against the m=1 baseline
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators import textstats as TS
    from open_crime_etl_pipeline_spark.queries.llm import (
        _ada_features,
        _adaboost_train,
        _naive_bayes_predict,
        _tput_topk,
    )

    base: dict = {}
    print(
        f"{'m':>3} {'part':<5} {'wall_s':>7} {'shuf_w_mb':>10} "
        f"{'shuf_r_mb':>10} {'shuf_mrec':>9}  invariant"
    )
    for m in ms:
        docs = _replicated_docs(spark, sf_dir, m)

        # ---- nb: alpha-scaled replication reproduces base posteriors
        w0, r0 = shuffle_bytes(_UI_PORT)
        n0 = shuffle_records(_UI_PORT)
        t0 = time.time()
        rows = _naive_bayes_predict(docs, alpha=0.5 * m).collect()
        wall = time.time() - t0
        w1, r1 = shuffle_bytes(_UI_PORT)
        n1 = shuffle_records(_UI_PORT)
        got = {r["doc_id"]: (r["lang"], r["pred_lang"], r["score"]) for r in rows}
        if m == ms[0] and ms[0] == 1:
            base["nb"] = got
        assert len(got) == m * len(base["nb"]), "row count not m*base"
        worst = 0.0
        for did, (lang, pred, score) in got.items():
            blang, bpred, bscore = base["nb"][did % _OFF]
            assert lang == blang and pred == bpred, (did, pred, bpred)
            worst = max(worst, abs(score - bscore))
        assert worst <= 2e-6, f"nb posterior drifted under replication: {worst}"
        print(
            f"{m:>3} {'nb':<5} {wall:>7.2f} {(w1 - w0) / 1e6:>10.1f} "
            f"{(r1 - r0) / 1e6:>10.1f} {(n1 - n0) / 1e6:>9.2f}  "
            f"replica preds == base (score dev {worst:.1e})"
        )

        # ---- tput: every numeric output exactly m*base, certificates fixed
        tok = docs.select(
            (F.col("doc_id") % 8).alias("node"),
            F.explode(TS.tokens("text")).alias("term"),
        )
        w0, r0 = shuffle_bytes(_UI_PORT)
        n0 = shuffle_records(_UI_PORT)
        t0 = time.time()
        rows = _tput_topk(tok, m=40, k=20).collect()
        wall = time.time() - t0
        w1, r1 = shuffle_bytes(_UI_PORT)
        n1 = shuffle_records(_UI_PORT)
        got = {
            r["term"]: (
                r["exact_count"], r["lower_bound"], r["upper_bound"],
                r["bounds_ok"], r["tail_cap"], r["membership_certified"],
            )
            for r in rows
        }
        if m == ms[0] and ms[0] == 1:
            base["tput"] = got
        assert set(got) == set(base["tput"]), "candidate top-k set changed"
        for t, (ex, lo, up, ok, cap, cert) in got.items():
            bex, blo, bup, bok, bcap, bcert = base["tput"][t]
            assert (ex, lo, up, cap) == (m * bex, m * blo, m * bup, m * bcap), t
            assert (ok, cert) == (bok, bcert), t
        print(
            f"{m:>3} {'tput':<5} {wall:>7.2f} {(w1 - w0) / 1e6:>10.1f} "
            f"{(r1 - r0) / 1e6:>10.1f} {(n1 - n0) / 1e6:>9.2f}  "
            f"all bounds/caps exactly m*base, certs fixed"
        )

        # ---- ada: identical stumps, (E, T) exactly m*base, alpha bitwise
        feat = _ada_features(docs)
        w0, r0 = shuffle_bytes(_UI_PORT)
        n0 = shuffle_records(_UI_PORT)
        t0 = time.time()
        rounds = _adaboost_train(feat, k=3)
        wall = time.time() - t0
        w1, r1 = shuffle_bytes(_UI_PORT)
        n1 = shuffle_records(_UI_PORT)
        if m == ms[0] and ms[0] == 1:
            base["ada"] = rounds
        assert len(rounds) == len(base["ada"])
        for got_r, base_r in zip(rounds, base["ada"]):
            r_, f_, t_, s_, e_, tot_, a_ = got_r
            br, bf, bt, bs, be, btot, ba = base_r
            assert (r_, f_, t_, s_) == (br, bf, bt, bs), (got_r, base_r)
            mult = m ** (2 ** (r_ - 1))
            assert (e_, tot_) == (mult * be, mult * btot), (got_r, base_r)
            assert a_ == ba, "alpha not bit-identical under replication"
        print(
            f"{m:>3} {'ada':<5} {wall:>7.2f} {(w1 - w0) / 1e6:>10.1f} "
            f"{(r1 - r0) / 1e6:>10.1f} {(n1 - n0) / 1e6:>9.2f}  "
            f"stumps identical, (E,T) exactly m^(2^(r-1))*base, alpha bitwise"
        )
        docs.unpersist()
    print("ALL INVARIANTS HELD")
    spark.stop()


if __name__ == "__main__":
    main()
