"""Greedy no-split sequence packing (operators/packing.py): bin
invariants, oversized-doc handling, determinism under repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.operators.packing import pack_sequences


def _docs(spark, lens, n_shards=1):
    return spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lens)], "doc_id long, n_tok long"
    )


def test_greedy_walk_exact(spark):
    # budget 10: [4,5] -> bin0 (fill 9); 3 overflows -> bin1 [3,7];
    # 2 overflows -> bin2 [2]; 12 > budget -> own bin3; 1 -> bin4
    out = {
        r["doc_id"]: (r["bin"], r["fill"])
        for r in pack_sequences(
            _docs(spark, [4, 5, 3, 7, 2, 12, 1]), "doc_id", "n_tok", 10, 1
        ).collect()
    }
    assert out == {
        0: (0, 4), 1: (0, 9), 2: (1, 3), 3: (1, 10),
        4: (2, 2), 5: (3, 12), 6: (4, 1),
    }


def test_no_bin_overflows_except_oversized_docs(spark):
    lens = [((i * 37) % 90) + 10 for i in range(500)]  # 10..99
    out = pack_sequences(_docs(spark, lens), "doc_id", "n_tok", 128, 4)
    bins = (
        out.groupBy("shard", "bin")
        .agg(F.max("fill").alias("total"), F.count("*").alias("n"))
        .collect()
    )
    assert all(r["total"] <= 128 for r in bins)  # no doc exceeds budget here
    # every doc assigned exactly once
    assert out.count() == 500
    assert out.select("doc_id").distinct().count() == 500


def test_oversized_doc_gets_own_bin(spark):
    out = pack_sequences(
        _docs(spark, [100, 999, 100]), "doc_id", "n_tok", 256, 1
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    big = by_id[1]
    assert big["fill"] == 999  # alone in its bin, not truncated
    assert (
        sum(1 for r in out if r["bin"] == big["bin"] and r["shard"] == big["shard"])
        == 1
    )


def test_deterministic_under_input_partitioning(spark):
    lens = [((i * 13) % 70) + 5 for i in range(300)]
    base = _docs(spark, lens)
    a = sorted(
        map(tuple, pack_sequences(base, "doc_id", "n_tok", 100, 8).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_sequences(
                base.repartition(13), "doc_id", "n_tok", 100, 8
            ).collect(),
        )
    )
    assert a == b


def test_hash_sharding_packs_every_doc_once_within_budget(spark):
    lens = [((i * 37) % 90) + 10 for i in range(500)]  # 10..99
    df = _docs(spark, lens)
    for mode in ("mod", "hash"):
        out = pack_sequences(df, "doc_id", "n_tok", 128, 8, shard_by=mode)
        rows = out.collect()
        assert sorted(r["doc_id"] for r in rows) == list(range(500))  # exactly once
        per_bin = {}
        for r in rows:
            per_bin.setdefault((r["shard"], r["bin"]), 0)
        for r in out.groupBy("shard", "bin").agg(F.max("fill").alias("t")).collect():
            assert r["t"] <= 128
    # hash mode: shard is xxhash64-derived, within range, non-degenerate
    hashed = pack_sequences(df, "doc_id", "n_tok", 128, 8, shard_by="hash")
    shards = {r["shard"] for r in hashed.select("shard").distinct().collect()}
    assert shards <= set(range(8)) and len(shards) > 1


def test_hash_sharding_skew_immunity(spark):
    # ids all congruent mod 8: "mod" collapses to ONE shard (the skew
    # the docstring warns about); "hash" spreads them
    df = spark.createDataFrame(
        [(i * 8, 10) for i in range(200)], "doc_id long, n_tok long"
    )
    mod_shards = (
        pack_sequences(df, "doc_id", "n_tok", 64, 8, shard_by="mod")
        .select("shard").distinct().count()
    )
    hash_shards = (
        pack_sequences(df, "doc_id", "n_tok", 64, 8, shard_by="hash")
        .select("shard").distinct().count()
    )
    assert mod_shards == 1 and hash_shards > 4


def test_invalid_shard_by_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="shard_by"):
        pack_sequences(_docs(spark, [1]), "doc_id", "n_tok", 10, 1, shard_by="nope")
