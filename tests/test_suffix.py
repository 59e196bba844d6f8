"""Distributed prefix-doubling suffix ranks (operators/suffix.py):
exact order vs brute force, prefix-of ties, identical-suffix
tie-breaks, and the partition-refinement fixpoint exit on duplicate
documents."""

from __future__ import annotations

from open_crime_etl_pipeline_spark.operators.suffix import suffix_ranks


def _brute(docs):
    sufs = [
        (text[pos - 1 :], did, pos)
        for did, text in docs
        for pos in range(1, len(text) + 1)
    ]
    return {
        (did, pos): i + 1
        for i, (_, did, pos) in enumerate(sorted(sufs))
    }


def _got(spark, docs, **kw):
    df = spark.createDataFrame(list(docs), "doc_id long, text string")
    return {
        (r["doc_id"], r["pos"]): r["sa_rank"]
        for r in suffix_ranks(df, "doc_id", "text", **kw).collect()
    }


def test_matches_bruteforce_small(spark):
    docs = [(1, "banana"), (2, "bandana"), (3, "abracadabra")]
    assert _got(spark, docs, w0=2, max_rounds=8) == _brute(docs)


def test_prefix_of_sorts_first(spark):
    # suffix "ab" (a prefix of "abc") must rank before "abc"
    docs = [(1, "ab"), (2, "abc")]
    got = _got(spark, docs, w0=4)
    assert got == _brute(docs)
    assert got[(1, 1)] < got[(2, 1)]  # "ab" < "abc"


def test_identical_documents_tie_break_by_doc_pos(spark):
    # duplicate docs leave identical full suffixes forever — the
    # fixpoint exit must fire (not run max_rounds) and ties break by
    # (doc, pos); brute force with the same tie-break agrees.
    docs = [(7, "mississippi"), (9, "mississippi"), (8, "missive")]
    assert _got(spark, docs, w0=2, max_rounds=64) == _brute(docs)


def test_long_doc_crosses_many_doubling_rounds(spark):
    text = ("abcde" * 60) + "xyz"  # 303 chars, periodic: forces deep rounds
    docs = [(1, text)]
    assert _got(spark, docs, w0=2, max_rounds=16) == _brute(docs)


def test_deterministic_under_repartition(spark):
    docs = [(i, ("tok%d " % (i * 7 % 13)) * (5 + i % 7)) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, suffix_ranks(df, "doc_id", "text").collect()))
    b = sorted(
        map(tuple, suffix_ranks(df.repartition(7), "doc_id", "text").collect())
    )
    assert a == b
