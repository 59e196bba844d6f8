"""Empty/short-document edge corpus: Spark's sequence(1, n) DESCENDS
for n < 1 (and raises with an explicit step) where SQL
generate_series is empty — every explode-over-positions query must
pre-filter, or engines diverge exactly when a real corpus hits its
first empty document. This differential-checks the position-exploding
queries on a synthetic documents table containing empty, 1-char, and
2-char docs (shapes the driver testdata never contains)."""

from __future__ import annotations

import pytest

from open_crime_etl_pipeline_spark.queries import all_specs
from open_crime_etl_pipeline_spark.testing import (
    compare_frames,
    duckdb_connection,
)

EDGE_QUERIES = [
    "document_chunk_stride",
    "language_id_ngram_classifier",
    "winnowing_fingerprints",
    "dup_cluster_size_histogram",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("edge_corpus"))
    rows = [
        (0, "", "en", "src0", 0),                      # EMPTY doc
        (25, "a", "de", "src1", 1),                    # 1 char
        (50, "ab", "es", "src0", 2),                   # sub-trigram
        (75, "the quick brown fox jumps over it", "en", "src1", 33),
        (100, "pack my box with five dozen jugs", "fr", "src0", 32),
        (101, "pack my box with five dozen jugs", "fr", "src0", 32),  # dup
        (125, "sphinx of black quartz judge my vow", "zh", "src1", 35),
        (150, "the quick brown fox jumps over it", "en", "src0", 33),  # dup
    ]
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int32"})
    # single FILE like the driver testdata (Spark's write makes a dir)
    pdf.to_parquet(f"{p}/documents.parquet", index=False)
    return p


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_corpus_matches_oracle(name, spark, edge_dir):
    spec = all_specs()[name]
    con = duckdb_connection(edge_dir)
    try:
        spark_pdf = spec.fn(spark, edge_dir).toPandas()
        oracle_pdf = con.execute(spec.oracle).fetchdf()
    finally:
        con.close()
    r = compare_frames(name, spark_pdf, oracle_pdf)
    assert r.ok, r.detail


def test_suffix_ranks_skip_empty_docs(spark):
    from open_crime_etl_pipeline_spark.operators.suffix import suffix_ranks

    docs = [(1, ""), (2, "abc"), (3, "ab")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["pos"], r["sa_rank"])
        for r in suffix_ranks(df, "doc_id", "text", w0=2).collect()
    )
    sufs = sorted(
        (t[p - 1 :], d, p) for d, t in docs for p in range(1, len(t) + 1)
    )
    want = sorted((d, p, i + 1) for i, (_s, d, p) in enumerate(sufs))
    assert got == want  # empty doc contributes no suffixes, no garbage
