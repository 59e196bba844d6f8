"""Misra-Gries candidate/verify heavy hitters (operators/frequent.py):
exactness vs a brute-force recount, the candidate superset guarantee
under an adversarial local/global frequency split, and the per-partition
candidate-size bound that makes the plan scale."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.operators.frequent import (
    heavy_hitters_exact,
    misra_gries_candidates,
)


def _df(spark, keys, partitions=4):
    return spark.createDataFrame(
        [(k,) for k in keys], "tok string"
    ).repartition(partitions)


def test_heavy_hitters_match_bruteforce(spark):
    # zipf-ish: key i appears 1000//(i+1) times
    keys = [f"t{i}" for i in range(40) for _ in range(1000 // (i + 1))]
    k = 25
    truth = Counter(keys)
    n = len(keys)
    expect = {t: c for t, c in truth.items() if c * k > n}
    got = {
        r["tok"]: r["cnt"]
        for r in heavy_hitters_exact(_df(spark, keys), "tok", k).collect()
    }
    assert got == expect and expect  # nontrivial: some pass, most don't


def test_boundary_is_strict_and_exact(spark):
    # 10 keys x 10 each: N=100, k=10 → threshold cnt*10 > 100 → none
    keys = [f"k{i}" for i in range(10) for _ in range(10)]
    assert heavy_hitters_exact(_df(spark, keys), "tok", 10).count() == 0
    # tip one key to 11 (N=101): 11*10=110 > 101 passes, 10*10=100 < 101 not
    got = heavy_hitters_exact(_df(spark, keys + ["k0"]), "tok", 10).collect()
    assert [(r["tok"], r["cnt"]) for r in got] == [("k0", 11)]


def test_candidates_are_superset_with_thin_global_spread(spark):
    # "H" is globally heavy but locally thin: 8 partitions, H has only
    # 31 of each partition's 151 rows while 12 local distractors have
    # 10 each — a naive per-partition top-5 by count could evict H;
    # MG's guarantee (freq_p > N_p/(k+1) survives) keeps it everywhere.
    rows = []
    for p in range(8):
        rows += ["H"] * 31
        rows += [f"d{p}_{j}" for j in range(12) for _ in range(10)]
    df = _df(spark, rows, partitions=8)
    k = 5
    cands = {
        r["tok"]
        for r in misra_gries_candidates(df, "tok", k)
        .filter(F.col("tok").isNotNull())
        .collect()
    }
    assert "H" in cands
    n = len(rows)
    got = {r["tok"]: r["cnt"] for r in heavy_hitters_exact(df, "tok", k).collect()}
    assert got == {"H": 248} and 248 * k > n


def test_candidate_size_bounded_by_k_per_partition(spark):
    # 5000 distinct keys, k=20, 8 partitions → ≤ 160 candidates ever
    # cross the wire (plus one total row per partition)
    keys = [f"u{i}" for i in range(5000)]
    sk = misra_gries_candidates(_df(spark, keys, partitions=8), "tok", 20)
    cand_rows = sk.filter(F.col("tok").isNotNull()).count()
    total_rows = sk.filter(F.col("tok").isNull()).count()
    assert cand_rows <= 20 * 8
    assert total_rows <= 8
    # and the exact stage still returns the right (empty) answer
    assert heavy_hitters_exact(_df(spark, keys, partitions=8), "tok", 20).count() == 0


def test_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [("a",)] * 9 + [(None,)] * 6, "tok string"
    ).repartition(3)
    got = heavy_hitters_exact(df, "tok", 2).collect()
    # N counts non-null rows only: 9 * 2 > 9 → "a" passes with cnt 9
    assert [(r["tok"], r["cnt"]) for r in got] == [("a", 9)]


def test_phrase_match_positions(spark):
    from open_crime_etl_pipeline_spark.operators.textstats import (
        phrase_match,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox the quick brown dog"),
            (2, "quick brown nothing here"),
            (3, "the quick  brown fox"),  # double space: empty token removed
        ],
        "doc_id long, text string",
    )
    postings = positional_postings(docs, "doc_id", "text")
    got = sorted(
        (r["doc_id"], r["start_pos"])
        for r in phrase_match(postings, "doc_id", "the quick brown").collect()
    )
    assert got == [(1, 1), (1, 5), (3, 1)]
    # single-term phrase degenerates to the posting list
    one = phrase_match(postings, "doc_id", "fox").collect()
    assert sorted((r["doc_id"], r["start_pos"]) for r in one) == [(1, 4), (3, 4)]
