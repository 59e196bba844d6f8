"""Distributed prefix-doubling suffix ranks (operators/suffix.py):
exact order vs brute force, prefix-of ties, identical-suffix
tie-breaks, the partition-refinement fixpoint exit on duplicate
documents, and the rank-table LCP walk vs brute-force LCP."""

from __future__ import annotations

import pytest

from open_crime_etl_pipeline_spark.operators.suffix import (
    lcp_from_rank_tables,
    suffix_ranks,
)


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


def _brute_lcp(docs):
    """LCP between every pair of lexicographically ADJACENT suffixes."""
    sufs = sorted(
        (text[pos - 1 :], did, pos)
        for did, text in docs
        for pos in range(1, len(text) + 1)
    )
    out = {}
    for (sa, da, pa), (sb, db, pb) in zip(sufs, sufs[1:]):
        n = 0
        for x, y in zip(sa, sb):
            if x != y:
                break
            n += 1
        out[(da, pa, db, pb)] = n
    return out


def _walk_lcp(spark, docs, **kw):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(list(docs), "doc_id long, text string")
    ranks, art = suffix_ranks(df, "doc_id", "text", retain_levels=True, **kw)
    a = ranks.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "sa_rank"
    )
    b = ranks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        (F.col("sa_rank") - 1).alias("sa_rank"),
    )
    pairs = a.join(b, "sa_rank").drop("sa_rank")
    return {
        (r["doc_a"], r["pos_a"], r["doc_b"], r["pos_b"]): r["lcp"]
        for r in lcp_from_rank_tables(art, pairs).collect()
    }


def test_lcp_walk_matches_bruteforce(spark):
    docs = [(1, "banana"), (2, "bandana"), (3, "abracadabra")]
    assert _walk_lcp(spark, docs, w0=2) == _brute_lcp(docs)


def test_lcp_walk_periodic_and_prefix_ties(spark):
    # periodic text: long LCPs spanning several doubling levels; plus a
    # prefix-of pair and an identical cross-doc suffix
    docs = [(1, ("abcde" * 40) + "xy"), (2, "abcdeabc"), (3, "abcdeabc")]
    assert _walk_lcp(spark, docs, w0=2) == _brute_lcp(docs)


def test_lcp_walk_identical_documents(spark):
    # identical docs: every suffix duplicated — the identical-suffix
    # branch (equal TOP rank -> LCP = min suffix length) must fire,
    # because the greedy levels alone cannot reach full length
    docs = [(7, "mississippi"), (9, "mississippi")]
    assert _walk_lcp(spark, docs, w0=4) == _brute_lcp(docs)


def test_lcp_walk_default_w0_short_docs(spark):
    # docs shorter than w0: seed level alone; residual compare handles
    # everything below w0
    docs = [(1, "abc"), (2, "abd"), (3, "ab"), (4, "abc")]
    assert _walk_lcp(spark, docs) == _brute_lcp(docs)


def test_lcp_walk_refuses_prefix_only_tables(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, ("abcde" * 40) + "xy")], "doc_id long, text string"
    )
    ranks, art = suffix_ranks(
        df, "doc_id", "text", w0=2, max_rounds=1, retain_levels=True
    )
    assert not art.exact
    pairs = ranks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
    ).limit(1)
    with pytest.raises(ValueError, match="prefix-only"):
        lcp_from_rank_tables(art, pairs)


def test_deterministic_under_repartition(spark):
    docs = [(i, ("tok%d " % (i * 7 % 13)) * (5 + i % 7)) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, suffix_ranks(df, "doc_id", "text").collect()))
    b = sorted(
        map(tuple, suffix_ranks(df.repartition(7), "doc_id", "text").collect())
    )
    assert a == b


# -- maximal_repeat_intervals (variable-length ExactSubstr index) --------


def _brute_repeats(docs, L):
    """Ground truth: enumerate every length-L window, keep the ones
    occurring >= 2 times corpus-wide, union their spans per doc, and
    collapse to maximal runs — the oracle definition, independent of
    suffix arrays entirely."""
    from collections import Counter

    wins: Counter = Counter()
    for _did, t in docs:
        for s in range(1, len(t) - L + 2):
            wins[t[s - 1 : s - 1 + L]] += 1
    out = set()
    for did, t in docs:
        pts = sorted(
            {
                p
                for s in range(1, len(t) - L + 2)
                if wins[t[s - 1 : s - 1 + L]] >= 2
                for p in range(s, s + L)
            }
        )
        runs: list[list[int]] = []
        for p in pts:
            if runs and p == runs[-1][1] + 1:
                runs[-1][1] = p
            else:
                runs.append([p, p])
        for st, en in runs:
            out.add((did, st, en, en - st + 1))
    return out


def _got_repeats(spark, docs, L, **kw):
    from open_crime_etl_pipeline_spark.operators.suffix import (
        maximal_repeat_intervals,
    )

    df = spark.createDataFrame(list(docs), "doc_id long, text string")
    ranks, art = suffix_ranks(df, "doc_id", "text", retain_levels=True, **kw)
    return {
        tuple(r)
        for r in maximal_repeat_intervals(ranks, art, L, "doc_id").collect()
    }


def _noise(tag: str, n: int) -> str:
    """Deterministic non-periodic filler (periodic filler manufactures
    giant self-repeats — the round-8 planted-LRS lesson)."""
    import hashlib

    out = []
    i = 0
    while sum(len(c) for c in out) < n:
        out.append(hashlib.md5(f"{tag}:{i}".encode()).hexdigest().upper())
        i += 1
    return "".join(out)[:n]


def test_maximal_repeats_planted_cross_doc_and_self(spark):
    # two cross-doc phrases + one in-doc self repeat, buried in
    # unique uppercase-hex noise (phrases lowercase: disjoint alphabet)
    p1, p2 = "sharedphraseone", "otherdupspan"
    docs = [
        (1, _noise("a", 40) + p1 + _noise("b", 30)),
        (2, _noise("c", 25) + p1 + _noise("d", 10) + p2 + _noise("e", 20)),
        (3, p2 + _noise("f", 35) + "selfrepeatxx" + _noise("g", 9) + "selfrepeatxx"),
    ]
    for L in (6, 10, 12):
        assert _got_repeats(spark, docs, L, w0=4) == _brute_repeats(docs, L)


def test_maximal_repeats_left_extension_and_merge(spark):
    # the duplicated span is LONGER than L, so windows chain and the
    # interval collapse must extend LEFT and RIGHT to the full span;
    # two spans one char apart must also merge (contiguity rule)
    long_rep = "abcdefghijklmnop"  # length 16, duplicated, L = 5
    docs = [
        (1, _noise("h", 20) + long_rep + _noise("i", 20)),
        (2, long_rep + "Z" + long_rep),
    ]
    got = _got_repeats(spark, docs, 5, w0=4)
    assert got == _brute_repeats(docs, 5)
    # doc 2: [1,16] and [18,33] do NOT merge (gap char Z is uncovered)
    assert (2, 1, 16, 16) in got and (2, 18, 33, 16) in got


def test_maximal_repeats_empty_and_guard(spark):
    import pytest as _pytest

    from open_crime_etl_pipeline_spark.operators.suffix import (
        maximal_repeat_intervals,
    )

    docs = [(1, _noise("p", 50)), (2, _noise("q", 50))]
    assert _got_repeats(spark, docs, 12, w0=4) == set()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ranks, art = suffix_ranks(df, "doc_id", "text", retain_levels=True)
    with _pytest.raises(ValueError, match="min_len"):
        maximal_repeat_intervals(ranks, art, 0, "doc_id")
