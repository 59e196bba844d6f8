"""LLM-data-pipeline queries: dedup, similarity search, text analysis,
multimodal (SURVEY.md §2.11 [EXT]).

The dedup scenarios build a corpus with known duplicates — documents
unioned with id-shifted copies (exact) or first-word-perturbed copies
(near) — so dedup operators have real work whose ground truth the
DuckDB oracle can state in ANSI SQL. Hash-based pipelines whose
internals are portable (fold-hash minhash signatures, md5
fingerprints) are oracle-checked; pipelines built on engine-internal
hashing (xxhash64 LSH buckets, SimHash) are rows-only here and
verified against exact ground truth in pytest instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..operators import textstats as TS
from .core import _t
from .registry import register

_ID_SHIFT = 100000

_CORPUS_SQL_EXACT = """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000 AS doc_id, text FROM documents
        )
"""

_CORPUS_SQL_NEAR = """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000 AS doc_id,
                   regexp_replace(text, '^[a-z]+', 'zzz') AS text
            FROM documents
        )
"""


def _corpus_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.select((F.col("doc_id") + _ID_SHIFT).alias("doc_id"), "text")
    return docs.unionByName(copies)


def _corpus_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.select(
        (F.col("doc_id") + _ID_SHIFT).alias("doc_id"),
        F.regexp_replace("text", "^[a-z]+", "zzz").alias("text"),
    )
    return docs.unionByName(copies)


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

@register(
    "exact_dedup_documents",
    oracle=_CORPUS_SQL_EXACT + """
        SELECT min(doc_id) AS doc_id
        FROM corpus
        GROUP BY lower(trim(regexp_replace(text, '\\s+', ' ')))
    """,
    doc="Exact dedup on normalized text, min-id winner (hash-groupBy; §2.11).",
    tags=("llm", "dedup"),
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus_exact(spark, sf_dir)
    return D.exact_dedup(corpus, "doc_id", "text").select("doc_id")


@register(
    "minhash_signatures_check",
    oracle="""
        WITH docs AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id < 50
        ), shingled AS (
            SELECT doc_id,
                   list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                  for i in range(1, len(words) - 1)]) AS shingles
            FROM docs WHERE len(words) >= 3
        )
        SELECT doc_id,
               list_min([list_reduce(list_prepend((0*131 + 7)::BIGINT,
                    [ord(c)::BIGINT for c in string_split(s, '')]),
                    (acc, x) -> (acc * 31 + x) % 1000003) for s in shingles]) AS sig_0,
               list_min([list_reduce(list_prepend((1*131 + 7)::BIGINT,
                    [ord(c)::BIGINT for c in string_split(s, '')]),
                    (acc, x) -> (acc * 31 + x) % 1000003) for s in shingles]) AS sig_1,
               list_min([list_reduce(list_prepend((2*131 + 7)::BIGINT,
                    [ord(c)::BIGINT for c in string_split(s, '')]),
                    (acc, x) -> (acc * 31 + x) % 1000003) for s in shingles]) AS sig_2,
               list_min([list_reduce(list_prepend((3*131 + 7)::BIGINT,
                    [ord(c)::BIGINT for c in string_split(s, '')]),
                    (acc, x) -> (acc * 31 + x) % 1000003) for s in shingles]) AS sig_3
        FROM shingled
    """,
    doc="MinHash signature computation verified value-by-value via portable fold hash (§2.11).",
    tags=("llm", "dedup", "minhash"),
)
def minhash_signatures_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    sigs = D.minhash_signatures(
        docs, "doc_id", "text", num_hashes=4, shingle_n=3, hash_fn="portable"
    )
    return sigs.select(
        "doc_id",
        *[F.element_at("signature", i + 1).alias(f"sig_{i}") for i in range(4)],
    )


@register(
    "ngram_jaccard_near_dup",
    oracle=_CORPUS_SQL_NEAR + """
        , shingle_lists AS (
            SELECT doc_id,
                   list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                  for i in range(1, len(words) - 1)]) AS shingles
            FROM (SELECT doc_id, string_split(text, ' ') AS words FROM corpus)
            WHERE len(words) >= 3
        ), sh AS (
            SELECT doc_id, unnest(shingles) AS shingle FROM shingle_lists
        ), sizes AS (
            SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b,
               round(CAST(n_inter AS DOUBLE) /
                     CAST(sa.n_shingles + sb.n_shingles - n_inter AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_inter AS DOUBLE) /
              CAST(sa.n_shingles + sb.n_shingles - n_inter AS DOUBLE) >= 0.5
    """,
    doc="Exact n-gram Jaccard similarity self-join finds the perturbed near-dups (§2.11).",
    tags=("llm", "dedup", "jaccard"),
)
def ngram_jaccard_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus_near(spark, sf_dir)
    return D.ngram_jaccard_pairs(corpus, "doc_id", "text", threshold=0.5, shingle_n=3)


# Planted-pair containment certificate for the LSH families: plant k
# exact-copy twins (id + _PLANT_SHIFT, text unchanged). Identical text
# gives identical shingle sets, hence identical MinHash signatures /
# SimHash fingerprints REGARDLESS of the hash family — every band (or
# 16-bit chunk) collides, so ANY correct banding implementation is
# guaranteed to surface these pairs with est_jaccard exactly 1.0
# (hamming exactly 0). The oracle is the planted truth table; a broken
# signature, banding, bucketing, estimation, or pair-ordering step
# flips found/metric and fails the hash. The LSH run still executes
# over the FULL near-dup corpus, so the discovery path is exercised
# end-to-end, and the raw pair sets stay pinned by the exact-ground-
# truth recall tests (tests/test_llm_operators.py).
_PLANT_SHIFT = 200000
_N_PLANT = 32

_PLANTED_SQL = f"""
        WITH planted AS (
            SELECT doc_id FROM documents
            WHERE len(string_split(text, ' ')) >= 3
            ORDER BY doc_id LIMIT {_N_PLANT}
        )
"""


def _planted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k lowest-id docs with >= shingle_n words (so they shingle);
    tokenization (split on single space) mirrors the oracle's
    string_split, same convention the Jaccard oracles already rely on."""
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.size(F.split(F.col("text"), " ")) >= 3)
        .orderBy("doc_id")
        .limit(_N_PLANT)
    )


def _planted_certificate(
    planted: DataFrame, pairs: DataFrame, metric: str, miss_value
) -> DataFrame:
    """(planted_id, found, metric) per planted twin pair: left-join the
    planted truth table against the found pairs (id_b == id_a + shift).
    Duplicate pair rows would fan the join out and fail the oracle's
    row count, so pair distinctness is checked for free."""
    hit = pairs.filter(F.col("id_b") == F.col("id_a") + _PLANT_SHIFT).select(
        F.col("id_a").alias("planted_id"), F.col(metric)
    )
    return (
        planted.select(F.col("doc_id").alias("planted_id"))
        .join(hit, "planted_id", "left")
        .select(
            "planted_id",
            F.col(metric).isNotNull().alias("found"),
            F.coalesce(F.col(metric), F.lit(miss_value)).alias(metric),
        )
    )


@register(
    "minhash_lsh_near_dup",
    oracle=_PLANTED_SQL + """
        SELECT doc_id AS planted_id, TRUE AS found,
               CAST(1.0 AS DOUBLE) AS est_jaccard
        FROM planted
    """,
    doc="MinHash+LSH near-dup over the full near corpus + planted exact "
        "twins; output is the planted-pair containment certificate — "
        "identical signatures MUST band-collide, so found=true / "
        "est_jaccard=1.0 per plant is hash-family-independent ground "
        "truth (§2.11). Raw pair recall vs exact Jaccard stays pinned "
        "in tests/test_llm_operators.py.",
    tags=("llm", "dedup", "minhash"),
)
def minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    planted = _planted_docs(spark, sf_dir)
    corpus = _corpus_near(spark, sf_dir).unionByName(
        planted.select((F.col("doc_id") + _PLANT_SHIFT).alias("doc_id"), "text")
    )
    pairs = D.minhash_near_dup_pairs(
        corpus, "doc_id", "text", num_hashes=16, bands=4, threshold=0.5
    )
    return _planted_certificate(planted, pairs, "est_jaccard", -1.0)


@register(
    "simhash_near_dup",
    oracle=_PLANTED_SQL + """
        SELECT doc_id AS planted_id, TRUE AS found,
               CAST(0 AS INT) AS hamming
        FROM planted
    """,
    doc="SimHash near-dup over the full near corpus + planted exact "
        "twins; output is the planted-pair containment certificate — "
        "identical fingerprints share all four 16-bit chunks, so "
        "found=true / hamming=0 per plant holds for any correct chunk "
        "bucketing (§2.11).",
    tags=("llm", "dedup", "simhash"),
)
def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    planted = _planted_docs(spark, sf_dir)
    corpus = _corpus_near(spark, sf_dir).unionByName(
        planted.select((F.col("doc_id") + _PLANT_SHIFT).alias("doc_id"), "text")
    )
    pairs = D.simhash_near_dup_pairs(corpus, "doc_id", "text", max_hamming=8)
    return _planted_certificate(planted, pairs, "hamming", -1)


# Shared CTE block for the near-dedup family: 3-word shingles → exact
# pairwise Jaccard (decorrelated grouped join) → verified pair graph
# (symmetric edges). near_dedup_representatives appends bounded
# min-propagation rounds; near_dedup_star_components appends a
# converged recursive closure — same candidate graph, two clusterers.
_NEAR_PAIRS_SQL = """
        , shingle_lists AS (
            SELECT doc_id,
                   list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                  for i in range(1, len(words) - 1)]) AS shingles
            FROM (SELECT doc_id, string_split(text, ' ') AS words FROM corpus)
            WHERE len(words) >= 3
        ), sh AS (
            SELECT doc_id, unnest(shingles) AS shingle FROM shingle_lists
        ), sizes AS (
            SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
        ), inter AS MATERIALIZED (
            -- decorrelated on purpose: the correlated-subquery HAVING
            -- form runs per candidate pair and dies at sf0.1 (>240s);
            -- grouped join + two hash joins on sizes finishes in ~2s
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ), pairs AS MATERIALIZED (
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = inter.id_a
            JOIN sizes sb ON sb.doc_id = inter.id_b
            WHERE CAST(n_inter AS DOUBLE) /
                  CAST(sa.n_shingles + sb.n_shingles - n_inter AS DOUBLE) >= 0.7
        ), edges AS MATERIALIZED (
            -- MATERIALIZED throughout: propagation rounds reference the
            -- prior round twice; inlined CTEs would re-evaluate the whole
            -- pair pipeline exponentially (observed: hung at sf0.1)
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION
            SELECT id_b AS s, id_a AS d FROM pairs
        )
"""


@register(
    "near_dedup_representatives",
    oracle=_CORPUS_SQL_NEAR + _NEAR_PAIRS_SQL + """
        , r0 AS MATERIALIZED (
            SELECT DISTINCT s AS m, s AS rep FROM edges
        )
        , r1 AS MATERIALIZED (
            SELECT r.m AS m,
                   least(r.rep, coalesce(min(nb.rep), r.rep)) AS rep
            FROM r0 r
            LEFT JOIN (SELECT e.s AS s, rr.rep AS rep
                       FROM edges e JOIN r0 rr ON e.d = rr.m) nb
              ON nb.s = r.m
            GROUP BY r.m, r.rep
        )
        , r2 AS MATERIALIZED (
            SELECT r.m AS m,
                   least(r.rep, coalesce(min(nb.rep), r.rep)) AS rep
            FROM r1 r
            LEFT JOIN (SELECT e.s AS s, rr.rep AS rep
                       FROM edges e JOIN r1 rr ON e.d = rr.m) nb
              ON nb.s = r.m
            GROUP BY r.m, r.rep
        )
        , r3 AS MATERIALIZED (
            SELECT r.m AS m,
                   least(r.rep, coalesce(min(nb.rep), r.rep)) AS rep
            FROM r2 r
            LEFT JOIN (SELECT e.s AS s, rr.rep AS rep
                       FROM edges e JOIN r2 rr ON e.d = rr.m) nb
              ON nb.s = r.m
            GROUP BY r.m, r.rep
        )
        , r4 AS MATERIALIZED (
            SELECT r.m AS m,
                   least(r.rep, coalesce(min(nb.rep), r.rep)) AS rep
            FROM r3 r
            LEFT JOIN (SELECT e.s AS s, rr.rep AS rep
                       FROM edges e JOIN r3 rr ON e.d = rr.m) nb
              ON nb.s = r.m
            GROUP BY r.m, r.rep
        )
        , r5 AS MATERIALIZED (
            SELECT r.m AS m,
                   least(r.rep, coalesce(min(nb.rep), r.rep)) AS rep
            FROM r4 r
            LEFT JOIN (SELECT e.s AS s, rr.rep AS rep
                       FROM edges e JOIN r4 rr ON e.d = rr.m) nb
              ON nb.s = r.m
            GROUP BY r.m, r.rep
        )
        SELECT doc_id FROM corpus
        WHERE doc_id NOT IN (SELECT m FROM r5 WHERE rep != m)
    """,
    doc="Full near-dedup pipeline: minhash LSH candidates → exact-Jaccard verify (>=0.7) → "
        "bounded min-propagation clustering → keep min-id representative (§2.11). Oracle "
        "replicates the exact pair graph and the same 5-round propagation in SQL.",
    tags=("llm", "dedup", "minhash"),
)
def near_dedup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus_near(spark, sf_dir)
    kept = D.near_dedup(
        corpus, "doc_id", "text",
        num_hashes=32, bands=16, threshold=0.7, verify_exact=True,
        # verified pairs at 0.7 Jaccard are a sparse graph even at 100 TB
        # (dup clusters, not the corpus) — single-partition rounds
        small_graph=True,
    )
    return kept.select("doc_id")


@register(
    "near_dedup_star_components",
    oracle=_CORPUS_SQL_NEAR.replace("WITH corpus", "WITH RECURSIVE corpus", 1)
    + _NEAR_PAIRS_SQL + """
        , reach AS (
            -- CONVERGED transitive closure (recursive set semantics:
            -- UNION dedups, fixpoint when no new (node, reachable)
            -- rows appear) — round-count-free ground truth, unlike the
            -- bounded unrolled propagation near_dedup_representatives
            -- pins. Fine for the oracle: duplicate clusters are tiny.
            SELECT s AS m, s AS r FROM edges
            UNION
            SELECT e.s AS m, rc.r AS r
            FROM edges e JOIN reach rc ON rc.m = e.d
        ), lab AS (
            SELECT m AS doc_id, min(r) AS rep_id FROM reach GROUP BY m
        )
        SELECT l.doc_id, l.rep_id, c.n_members
        FROM lab l
        JOIN (SELECT rep_id, CAST(count(*) AS BIGINT) AS n_members
              FROM lab GROUP BY rep_id) c USING (rep_id)
    """,
    doc="The 100-TB near-dedup clustering path, integrated end to end: "
        "minhash LSH candidates → exact-Jaccard verify (≥0.7, same "
        "pair graph as near_dedup_representatives) → alternating "
        "large-star/small-star contraction (Kiveris et al. SoCC'14, "
        "operators/graph.py::connected_components_star) instead of the "
        "guarded driver union-find or O(diameter) min-propagation — "
        "O(log d) rounds of O(E)-shuffle groupBy+join, no driver "
        "collection, no round-count tuning, so a filament-shaped "
        "duplicate cluster (chained paraphrases A~B~C~…) can't blow "
        "the round budget. Output is the full component map (member, "
        "min-id representative, component size). The oracle clusters "
        "the SAME verified pair graph with a converged recursive "
        "transitive closure — star contraction's fixpoint labels must "
        "equal true-component ground truth exactly, making this both "
        "an integration test of the scale path and a convergence "
        "proof (§2.11 dedup).",
    tags=("llm", "dedup", "minhash", "graph"),
)
def near_dedup_star_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph as G

    corpus = _corpus_near(spark, sf_dir)
    pairs = D.minhash_near_dup_pairs(
        corpus, "doc_id", "text",
        num_hashes=32, bands=16, threshold=0.7, verify_exact=True,
    )
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    labels, _rounds = G.connected_components_star(edges)
    sizes = labels.groupBy("label").agg(F.count("*").alias("n_members"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("rep_id"),
        "n_members",
    )


_INCR_BATCH_SQL = """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
        ), batch AS (
            SELECT doc_id + 1000000 AS doc_id,
                   regexp_replace(text, '^[a-z]+', 'zzz') AS text
            FROM documents WHERE doc_id % 5 = 0
            UNION ALL
            SELECT doc_id + 3000000,
                   regexp_replace(array_to_string(list_reverse(string_split(text, ' ')), ' '),
                                  '^[a-z]+', 'zzz')
            FROM documents WHERE doc_id % 5 = 2
            UNION ALL
            SELECT doc_id + 4000000,
                   regexp_replace(array_to_string(list_reverse(string_split(text, ' ')), ' '),
                                  '^[a-z]+', 'zzy')
            FROM documents WHERE doc_id % 5 = 2
            UNION ALL
            SELECT doc_id + 5000000,
                   translate(text, 'abcdefghijklmnopqrstuvwxyz',
                             'nopqrstuvwxyzabcdefghijklm')
            FROM documents WHERE doc_id % 5 = 3
        ), allv AS (
            SELECT * FROM corpus UNION ALL SELECT * FROM batch
        )
"""


@register(
    "near_dedup_incremental_batch",
    oracle=_INCR_BATCH_SQL + """
        , shingle_lists AS (
            SELECT doc_id,
                   list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                  for i in range(1, len(words) - 1)]) AS shingles
            FROM (SELECT doc_id, string_split(text, ' ') AS words FROM allv)
            WHERE len(words) >= 3
        ), sh AS (
            SELECT doc_id, unnest(shingles) AS shingle FROM shingle_lists
        ), sizes AS (
            SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
        ), inter AS MATERIALIZED (
            -- batch-involving pairs only: the incremental engine path
            -- never generates corpus-corpus candidates (cannot affect
            -- which batch docs survive — see operators/dedup.py)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            WHERE a.doc_id >= 1000000 OR b.doc_id >= 1000000
            GROUP BY a.doc_id, b.doc_id
        ), pairs AS MATERIALIZED (
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = inter.id_a
            JOIN sizes sb ON sb.doc_id = inter.id_b
            WHERE CAST(n_inter AS DOUBLE) /
                  CAST(sa.n_shingles + sb.n_shingles - n_inter AS DOUBLE) >= 0.7
        ), edges AS MATERIALIZED (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION
            SELECT id_b AS s, id_a AS d FROM pairs
        ), r0 AS MATERIALIZED (
            SELECT DISTINCT s AS m, s AS rep FROM edges
        ), r1 AS MATERIALIZED (
            SELECT r.m AS m, least(r.rep, coalesce(min(nb.rep), r.rep)) AS rep
            FROM r0 r
            LEFT JOIN (SELECT e.s AS s, rr.rep AS rep
                       FROM edges e JOIN r0 rr ON e.d = rr.m) nb ON nb.s = r.m
            GROUP BY r.m, r.rep
        ), r2 AS MATERIALIZED (
            SELECT r.m AS m, least(r.rep, coalesce(min(nb.rep), r.rep)) AS rep
            FROM r1 r
            LEFT JOIN (SELECT e.s AS s, rr.rep AS rep
                       FROM edges e JOIN r1 rr ON e.d = rr.m) nb ON nb.s = r.m
            GROUP BY r.m, r.rep
        ), r3 AS MATERIALIZED (
            SELECT r.m AS m, least(r.rep, coalesce(min(nb.rep), r.rep)) AS rep
            FROM r2 r
            LEFT JOIN (SELECT e.s AS s, rr.rep AS rep
                       FROM edges e JOIN r2 rr ON e.d = rr.m) nb ON nb.s = r.m
            GROUP BY r.m, r.rep
        )
        SELECT doc_id FROM batch
        WHERE doc_id NOT IN (SELECT m FROM r3 WHERE rep != m AND m >= 1000000)
    """,
    doc="Incremental near-dedup: a new batch deduped against an "
        "already-indexed corpus (build_near_dup_index: id/shingle-hash/"
        "signature, computed once) plus itself — corpus text is never "
        "re-tokenized and corpus-corpus candidates are never generated; "
        "cost ∝ batch + candidates, the 100 TB steady-state pattern. "
        "Corpus ids precede batch ids, so min-id components encode "
        "corpus-always-wins; the oracle replays the batch-involving "
        "exact-Jaccard pair graph with min-propagation (3 rounds suffice: "
        "scenario components have diameter ≤ 2) (§2.11 [EXT]).",
    tags=("llm", "dedup", "minhash", "incremental"),
)
def near_dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rev = F.concat_ws(" ", F.reverse(F.split("text", " ")))
    batch = (
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.regexp_replace("text", "^[a-z]+", "zzz").alias("text"))
        .unionByName(docs.filter(F.col("doc_id") % 5 == 2).select(
            (F.col("doc_id") + 3_000_000).alias("doc_id"),
            F.regexp_replace(rev, "^[a-z]+", "zzz").alias("text")))
        .unionByName(docs.filter(F.col("doc_id") % 5 == 2).select(
            (F.col("doc_id") + 4_000_000).alias("doc_id"),
            F.regexp_replace(rev, "^[a-z]+", "zzy").alias("text")))
        .unionByName(docs.filter(F.col("doc_id") % 5 == 3).select(
            (F.col("doc_id") + 5_000_000).alias("doc_id"),
            F.translate("text", "abcdefghijklmnopqrstuvwxyz",
                        "nopqrstuvwxyzabcdefghijklm").alias("text")))
    )
    idx = D.build_near_dup_index(docs, "doc_id", "text", num_hashes=32)
    kept = D.near_dedup_incremental(
        idx, batch, "doc_id", "text", num_hashes=32, bands=16, threshold=0.7
    )
    return kept.select("doc_id")


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

@register(
    "cosine_topk_exact",
    oracle="""
        WITH q AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
            FROM embeddings WHERE vec_id < 5
        ), scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   list_dot_product(q.qvec, e.embedding::DOUBLE[]) /
                   (sqrt(list_dot_product(q.qvec, q.qvec)) *
                    sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS raw_sim
            FROM q, embeddings e
            WHERE e.vec_id != q.query_id
        )
        SELECT query_id, neighbor_id, round(raw_sim, 6) AS sim, rank
        FROM (
            SELECT query_id, neighbor_id, raw_sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY raw_sim DESC, neighbor_id) AS rank
            FROM scored
        ) WHERE rank <= 5
    """,
    doc="Exact brute-force cosine top-k ANN baseline: broadcast queries, HOF dot product, ranked (§2.11).",
    tags=("llm", "similarity"),
)
def cosine_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return S.cosine_topk(emb, queries, k=5)


# Planted-twin ANN certificate: union a ×1.000001-scaled copy of each
# query vector into the corpus. Positive scaling preserves the sign of
# every hyperplane dot product (LSH buckets identical in every table)
# and the argmax-cosine cluster assignment (IVF: the twin lands in the
# query's own nearest cluster, which is always probed) — so the twin is
# DETERMINISTICALLY retrieved at rank 1 with cosine 1.0, regardless of
# how approximate the index is. The certificate projection
# (query_id, top1_neighbor_id, top1_sim, n_results) is therefore an
# exact deterministic table DuckDB can state without running the index,
# while still exercising the full signature/bucket/probe/score/rank
# pipeline: a broken bucket join drops the twin or the result count.
# The approximate operating points' recall curves stay pytest-asserted
# against the exact baseline (tests/test_llm_operators.py).
_ANN_TWIN_ORACLE = """
        SELECT vec_id AS query_id,
               vec_id + 100000 AS top1_neighbor_id,
               1.0 AS top1_sim,
               CAST(5 AS BIGINT) AS n_results
        FROM embeddings WHERE vec_id < 5
"""


def _ann_twin_certificate(emb: DataFrame, ann_fn) -> DataFrame:
    queries = emb.filter(F.col("vec_id") < 5)
    twins = queries.select(
        (F.col("vec_id") + _ID_SHIFT).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.000001)).alias("embedding"),
        "label",
    )
    topk = ann_fn(emb.unionByName(twins), queries)
    top1 = topk.filter(F.col("rank") == 1).select(
        "query_id",
        F.col("neighbor_id").alias("top1_neighbor_id"),
        F.col("sim").alias("top1_sim"),
    )
    counts = topk.groupBy("query_id").agg(F.count("*").alias("n_results"))
    return top1.join(counts, "query_id")


@register(
    "cosine_topk_lsh",
    oracle=_ANN_TWIN_ORACLE,
    doc="LSH-bucketed approximate top-k (random hyperplanes, multi-probe) — "
        "the 100 TB scale path (§2.11), driver-checked via the planted-twin "
        "retrieval certificate (see _ann_twin_certificate).",
    tags=("llm", "similarity", "lsh"),
)
def cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return _ann_twin_certificate(
        emb,
        lambda corpus, queries: S.cosine_topk_lsh(
            corpus, queries, dim=64, k=5, n_planes=4, n_tables=8
        ),
    )


@register(
    "embedding_norm_stats",
    oracle="""
        SELECT label,
               count(*) AS n_vectors,
               round(min(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS min_norm,
               round(max(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS max_norm
        FROM embeddings
        GROUP BY label
    """,
    doc="Vector-norm profile per label — array HOF math under aggregation (§2.11).",
    tags=("llm", "similarity"),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    norm = S.l2_norm(S.as_double_array("embedding"))
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.min(norm), 6).alias("min_norm"),
        F.round(F.max(norm), 6).alias("max_norm"),
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@register(
    "token_stats_top_terms",
    oracle="""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ), counts AS (
            SELECT token, count(*) AS n FROM toks WHERE token != '' GROUP BY token
        )
        SELECT token, n, rnk FROM (
            SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS rnk
            FROM counts
        ) WHERE rnk <= 20
    """,
    doc="Corpus term statistics: tokenize → explode → count → top-k (§2.11 text analysis).",
    tags=("llm", "text"),
)
def token_stats_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(TS.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return counts.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 20)


@register(
    "doc_quality_scores",
    oracle="""
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), t -> t != '')) AS n_tokens,
               len(list_distinct(list_filter(string_split(text, ' '), t -> t != ''))) AS n_unique,
               round(CAST(list_sum([length(t) for t in list_filter(string_split(text, ' '), t -> t != '')]) AS DOUBLE)
                     / greatest(len(list_filter(string_split(text, ' '), t -> t != '')), 1), 6) AS avg_token_len,
               round(CAST(len(list_filter(string_split(text, ' '),
                         t -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','with'], t))) AS DOUBLE)
                     / greatest(len(list_filter(string_split(text, ' '), t -> t != '')), 1), 6) AS stop_ratio
        FROM documents
    """,
    doc="Per-document quality metrics: token counts, vocabulary diversity, stopword ratio (§2.11).",
    tags=("llm", "text"),
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = TS.tokens("text")
    total_len = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.round(total_len.cast("double") / F.greatest(F.size(toks), F.lit(1)), 6).alias("avg_token_len"),
        F.round(TS.stopword_ratio("text"), 6).alias("stop_ratio"),
    )


def _pii_oracle() -> str:
    """Build the PII-scrub oracle from the same pattern table the Spark
    side uses (string concat, not f-string: the regexes contain braces)."""
    redacted = "text"
    for _name, pat, repl in TS.PII_PATTERNS:
        redacted = (
            "regexp_replace(" + redacted + ", '" + pat + "', '" + repl + "', 'g')"
        )
    counts = ",\n               ".join(
        "len(regexp_extract_all(text, '" + pat + "')) AS n_" + name + "s"
        for name, pat, _repl in TS.PII_PATTERNS
    )
    return (
        "SELECT doc_id,\n               " + counts + ",\n"
        "               md5(" + redacted + ") AS redacted_key\n"
        "        FROM documents"
    )


@register(
    "pii_redaction_scrub",
    oracle=_pii_oracle(),
    doc="PII scrub pass (emails/phones/IPs → typed placeholders) with "
        "per-kind match counts; redacted_key proves byte-identical rewrite "
        "output across engines. Pure regexp chain — codegen'd linear scan, "
        "no shuffle, so it composes into any curation pipeline for free "
        "(§2.11 text curation). The synthetic corpus carries no PII, so "
        "counts are zero here; the operator itself is exercised on "
        "PII-laden rows in tests/test_llm_operators.py.",
    tags=("llm", "text", "curation"),
)
def pii_redaction_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    counts = TS.pii_counts("text")
    return docs.select(
        "doc_id",
        *[counts[name].alias(f"n_{name}s") for name, _p, _r in TS.PII_PATTERNS],
        F.md5(TS.pii_redact("text")).alias("redacted_key"),
    )


@register(
    "source_mixture_weights",
    oracle="""
        WITH per_src AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(len(list_filter(string_split(text, ' '), t -> t != ''))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ), tot AS (
            SELECT CAST(sum(n_tokens) AS BIGINT) AS tot, count(*) AS n_src
            FROM per_src
        )
        SELECT source, n_docs, n_tokens,
               round(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS token_share,
               round((CAST(tot AS DOUBLE) / CAST(n_src AS DOUBLE)) / CAST(n_tokens AS DOUBLE), 6) AS repeat_factor
        FROM per_src, tot
    """,
    doc="Domain-mixture reweighting: per-source token mass, corpus share, and "
        "the repeat factor that equalizes token contribution across sources — "
        "the sampling-weight computation behind mixture tuning. One partial "
        "agg per source plus a single-row global broadcast: no wide shuffle "
        "at any corpus size (§2.11 curation).",
    tags=("llm", "curation", "aggregate"),
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(TS.tokens("text")).cast("long")).alias("n_tokens"),
    )
    totals = per_src.agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n_src")
    )
    return per_src.join(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.col("tot").cast("double"), 6
        ).alias("token_share"),
        F.round(
            (F.col("tot").cast("double") / F.col("n_src").cast("double"))
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("repeat_factor"),
    )


@register(
    "lang_id_stopword_profile",
    oracle="""
        WITH markers(lang, marker) AS (
            SELECT * FROM (VALUES
                ('en','the'),('en','and'),('en','of'),('en','to'),('en','in'),('en','is'),('en','a'),('en','that'),
                ('de','der'),('de','die'),('de','das'),('de','und'),('de','ist'),('de','nicht'),('de','ein'),('de','zu'),
                ('fr','le'),('fr','la'),('fr','les'),('fr','et'),('fr','est'),('fr','un'),('fr','une'),('fr','dans'),
                ('es','el'),('es','la'),('es','los'),('es','las'),('es','es'),('es','un'),('es','una'),('es','que'),
                ('zh','de'),('zh','shi'),('zh','bu'),('zh','le'),('zh','zai'),('zh','wo'),('zh','you'),('zh','he')
            )
        ), toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        ), scores AS (
            SELECT t.doc_id, m.lang, count(*) AS score
            FROM toks t JOIN markers m ON t.token = m.marker
            GROUP BY t.doc_id, m.lang
        )
        SELECT doc_id, lang AS detected_lang, score FROM (
            SELECT doc_id, lang, score,
                   row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
            FROM scores
        ) WHERE rn = 1
    """,
    doc="Language-ID heuristic: token join against per-language marker profiles, argmax (§2.11).",
    tags=("llm", "text"),
)
def lang_id_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    marker_rows = [(lang, m) for lang, ms in TS.LANG_MARKERS.items() for m in ms]
    markers = F.broadcast(
        spark.createDataFrame(marker_rows, "lang string, marker string")
    )
    toks = docs.select("doc_id", F.explode(TS.tokens("text")).alias("token"))
    scores = (
        toks.join(markers, toks.token == markers.marker)
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("detected_lang"), "score")
    )


@register(
    "doc_fingerprints",
    oracle="""
        WITH shingled AS (
            SELECT doc_id, text,
                   list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                  for i in range(1, len(words) - 1)]) AS shingles
            FROM (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents)
            WHERE len(words) >= 3
        )
        SELECT doc_id,
               md5(list_min(shingles) || '|' || md5(text)) AS fingerprint
        FROM shingled
    """,
    doc="Document fingerprint: md5 of (min shingle | text digest) — winnowing-style, engine-portable (§2.11).",
    tags=("llm", "text"),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TS.doc_fingerprint("text").alias("fingerprint"))


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------

@register(
    "multimodal_features",
    oracle="""
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               sha256(text) AS checksum,
               CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
        FROM documents
    """,
    doc="Multimodal decode plumbing: binary payload + mapInPandas feature stage, checked vs SQL byte math (§2.11).",
    tags=("llm", "multimodal"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    media = M.synthesize_media(docs)
    feats = M.decode_and_featurize(media, fake=True)
    return feats.select(
        "media_id",
        "kind",
        "byte_len",
        "checksum",
        F.element_at("features", 7).cast("bigint").alias("n_spaces"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
        SELECT doc_id AS media_id,
               unnest(range(0, (n_chars % 30 + 1)::INT, 5)) AS frame_idx,
               (n_chars % 30 + 1)::INT AS n_frames
        FROM documents
        WHERE doc_id % 3 = 2
    """,
    doc="Video frame sampling plumbing: every-Nth-frame explode over media metadata (§2.11).",
    tags=("llm", "multimodal"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    media = M.synthesize_media(docs)
    return M.frame_sample(media, every_n=5)


@register(
    "multimodal_resize_plan",
    oracle="""
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               (n_chars % 640 + 16)::INT AS width,
               (n_chars % 480 + 16)::INT AS height,
               round(least(1.0, 256.0 / greatest(n_chars % 640 + 16, n_chars % 480 + 16)), 6) AS scale,
               greatest(CAST(floor((n_chars % 640 + 16) *
                    least(1.0, 256.0 / greatest(n_chars % 640 + 16, n_chars % 480 + 16))) AS INT), 1) AS target_width,
               greatest(CAST(floor((n_chars % 480 + 16) *
                    least(1.0, 256.0 / greatest(n_chars % 640 + 16, n_chars % 480 + 16))) AS INT), 1) AS target_height
        FROM documents
    """,
    doc="Aspect-preserving resize planning as column math over media metadata (§2.11).",
    tags=("llm", "multimodal"),
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return M.resize_meta(M.synthesize_media(docs), max_side=256)


@register(
    "doc_token_counts_bpe",
    oracle="""
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t != '') AS ws_toks,
                   list_filter(string_split(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')), ' '),
                               t -> t != '') AS words
            FROM documents
        )
        SELECT doc_id,
               len(ws_toks) AS n_ws_tokens,
               len(flatten([CASE WHEN length(x) <= 6 THEN [x]
                            ELSE [substring(x, i * 4 + 1, 4)
                                  for i in range(0, (length(x) - 1) // 4 + 1)]
                            END
                            for x in words])) AS n_bpe_tokens
        FROM w
    """,
    doc="Token counting, whitespace + BPE-ish subword segmentation (§2.11 text analysis).",
    tags=("llm", "text", "tokens"),
)
def doc_token_counts_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TS.token_count("text").alias("n_ws_tokens"),
        F.size(TS.bpe_ish_tokens("text")).alias("n_bpe_tokens"),
    )


@register(
    "doc_quality_composite",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x != '') AS toks
            FROM documents
        ), m AS (
            SELECT doc_id,
                   len(toks) AS n,
                   CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS diversity,
                   CAST(len(list_filter(toks, x -> list_contains(
                       ['the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','with'], x)))
                       AS DOUBLE) / greatest(len(toks), 1) AS stop
            FROM t
        )
        SELECT doc_id,
               round((CASE WHEN n BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
                      + diversity
                      + CASE WHEN stop > 0.0 AND stop < 0.6 THEN 1.0 ELSE 0.5 END) / 3.0,
                     6) AS quality
        FROM m
    """,
    doc="Composite quality heuristic: length band + vocab diversity + stopword band "
        "(C4/Gopher-style cheap filters; §2.11).",
    tags=("llm", "text", "quality"),
)
def doc_quality_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TS.quality_score("text").alias("quality"))


@register(
    "embedding_near_dup_lsh",
    oracle="""
        SELECT vec_id AS id_a,
               vec_id + 100000 AS id_b,
               1.0 AS sim
        FROM embeddings
    """,
    doc="Embedding-cosine near-duplicate pairs via hyperplane-LSH self-join "
        "(§2.11). Deterministically oracle-checkable: the planted ×1.000001 "
        "copies share every hyperplane sign bit with their originals (same "
        "bucket by construction, cosine 1.0), and no natural pair in the "
        "corpus clears the 0.99 threshold (verified at sf0.001/0.01/0.1) — "
        "so the result IS exactly the planted-pair table. A broken bucket "
        "join loses pairs; a loosened threshold admits extras; either "
        "flips the hash.",
    tags=("llm", "similarity", "dedup"),
)
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    # duplicate a shifted copy so the operator has true near-dups to find
    noisy = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.000001)).alias("embedding"),
        "label",
    )
    return S.embedding_near_dup_pairs(
        emb.unionByName(noisy), dim=64, threshold=0.99, n_planes=6
    )


@register(
    "cosine_topk_ivf",
    oracle=_ANN_TWIN_ORACLE,
    doc="IVF approximate top-k: deterministic centroid seeding, inverted-list "
        "bucketing, n_probe nearest clusters per query (§2.11 scale path); "
        "driver-checked via the planted-twin retrieval certificate.",
    tags=("llm", "similarity", "ivf"),
)
def cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return _ann_twin_certificate(
        emb,
        lambda corpus, queries: S.cosine_topk_ivf(
            corpus, queries, k=5, n_clusters=8, n_probe=4
        ),
    )


@register(
    "cosine_topk_ivf_kmeanspp",
    oracle=_ANN_TWIN_ORACLE,
    doc="IVF top-k with k-means|| centroids (Bahmani init + distributed Lloyd "
        "refinement): balanced inverted lists bound the per-probe scan "
        "fraction, the property hash seeding cannot guarantee (§2.11 scale "
        "path); driver-checked via the planted-twin retrieval certificate.",
    tags=("llm", "similarity", "ivf", "kmeans"),
)
def cosine_topk_ivf_kmeanspp(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return _ann_twin_certificate(
        emb,
        lambda corpus, queries: S.cosine_topk_ivf(
            corpus, queries, k=5, n_clusters=8, n_probe=4, centroid_init="kmeans||"
        ),
    )


@register(
    "embedding_standardize_by_label",
    oracle="""
        WITH comp AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings
        ), stats AS (
            SELECT label, avg(x) AS mu,
                   -- population std to match numpy's default ddof=0
                   sqrt(avg(x * x) - avg(x) * avg(x)) AS sd
            FROM comp GROUP BY label
        )
        , ex AS (
            SELECT vec_id, label,
                   CAST(generate_subscripts(embedding::DOUBLE[], 1) - 1 AS INT) AS idx,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings
        )
        SELECT ex.vec_id, ex.label, ex.idx,
               round((ex.x - s.mu)
                     / (CASE WHEN s.sd = 0 THEN 1.0 ELSE s.sd END), 6) AS val
        FROM ex JOIN stats s ON ex.label = s.label
    """,
    doc="applyInPandas grouped-map: per-label embedding standardization, "
        "numpy kernel checked value-by-value against window SQL (§2.10). "
        "Output exploded to scalar rows — array columns don't hash "
        "portably across engines.",
    tags=("llm", "similarity", "udf"),
)
def embedding_standardize_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    std = S.standardize_by_group(emb)
    return std.select(
        "vec_id", "label", F.posexplode("std_embedding").alias("idx", "val")
    )


@register(
    "deterministic_split_documents",
    oracle="""
        SELECT doc_id,
               CASE WHEN b < 10 THEN 'test'
                    WHEN b < 20 THEN 'val'
                    ELSE 'train' END AS split
        FROM (
            SELECT doc_id,
                   CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'r1'), 1, 8) AS BIGINT) % 100 AS INT) AS b
            FROM documents
        )
    """,
    doc="Deterministic md5-bucket train/val/test split — identical assignment "
        "in every engine and every run; scan-side, no shuffle (§2.11 sampling).",
    tags=("llm", "sampling"),
)
def deterministic_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import train_val_test_split

    docs = _t(spark, sf_dir, "documents")
    return train_val_test_split(docs, "doc_id", val_pct=10, test_pct=10, salt="r1").select(
        "doc_id", "split"
    )


@register(
    "training_shard_manifest",
    oracle="""
        SELECT shard_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               min(doc_id) AS min_doc_id,
               max(doc_id) AS max_doc_id,
               CAST(sum(CAST('0x' || substring(h, 1, 8) AS BIGINT)) AS BIGINT)
                   AS checksum_lo,
               CAST(sum(CAST('0x' || substring(h, 9, 8) AS BIGINT)) AS BIGINT)
                   AS checksum_hi
        FROM (
            SELECT doc_id, text,
                   md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h,
                   CAST(CAST('0x' || substring(
                       md5(CAST(doc_id AS VARCHAR) || 'shard'), 1, 8)
                       AS BIGINT) % 16 AS INT) AS shard_id
            FROM documents
        )
        GROUP BY shard_id
    """,
    doc="Training-shard manifest — the reproducible data-delivery "
        "receipt a 100 TB handoff needs: every document is assigned "
        "to one of 16 shards by the same engine-portable md5 bucket "
        "deterministic_split_documents uses, and each shard row "
        "carries doc count, total whitespace tokens, id range, and an "
        "ORDER-FREE additive content checksum (per-doc "
        "md5(doc_id:text) split into two 32-bit halves, summed — "
        "commutative, so it partial-aggregates map-side and never "
        "needs the sorted-concat digest that would collect a shard's "
        "doc list; int64 headroom holds to ~2e9 docs/shard, and "
        "shards bound cardinality by construction). Any re-run, "
        "re-partitioning, or engine swap must reproduce the manifest "
        "bit-for-bit — which is exactly what the DuckDB oracle "
        "checks (§2.11 curation/packing).",
    tags=("llm", "curation", "sampling"),
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text")))
    with_h = docs.select(
        hash_bucket("doc_id", 16, "shard").alias("shard_id"),
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("lo"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("hi"),
    )
    return with_h.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.sum("lo").alias("checksum_lo"),
        F.sum("hi").alias("checksum_hi"),
    )


@register(
    "cross_source_contamination_matrix",
    oracle="""
        WITH sh AS (
            SELECT DISTINCT source, shingle
            FROM (
                SELECT source,
                       unnest(list_distinct(
                           [words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                            for i in range(1, len(words) - 1)])) AS shingle
                FROM (SELECT source, string_split(text, ' ') AS words
                      FROM documents)
                WHERE len(words) >= 3
            )
        ), totals AS (
            SELECT source, count(*) AS n FROM sh GROUP BY source
        )
        SELECT a.source AS src_a, b.source AS src_b,
               count(*) AS n_shared,
               round(CAST(count(*) AS DOUBLE)
                     / least(ta.n, tb.n), 6) AS overlap_coeff
        FROM sh a
        JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        JOIN totals ta ON ta.source = a.source
        JOIN totals tb ON tb.source = b.source
        GROUP BY a.source, b.source, ta.n, tb.n
    """,
    doc="Cross-source contamination matrix: for every pair of corpus "
        "sources, how many distinct 3-gram shingles they share and the "
        "overlap coefficient (shared / smaller source's vocabulary) — "
        "the corpus-level leakage diagnostic run before mixing sources "
        "into a training set. Scale shape: shingles are deduped to "
        "(source, shingle) FIRST, so the self-join on shingle has "
        "per-key fanout <= #sources (a handful), never doc-frequency — "
        "a hot stop-shingle costs ~#sources rows, not postings^2; "
        "output is #source-pairs rows (§2.11 curation).",
    tags=("llm", "curation", "contamination"),
)
def cross_source_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("source", "text")
    sh = (
        docs.filter(F.size(TS.tokens("text")) >= 3)
        .select("source", F.explode(TS.word_shingles("text", 3)).alias("shingle"))
        .distinct()
    )
    totals = sh.groupBy("source").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    ta = totals.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(ta, "src_a").join(tb, "src_b")
        .select(
            "src_a", "src_b", "n_shared",
            F.round(
                F.col("n_shared").cast("double") / F.least("n_a", "n_b"), 6
            ).alias("overlap_coeff"),
        )
    )


@register(
    "deterministic_corpus_shuffle",
    oracle="""
        SELECT doc_id,
               CAST(row_number() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || 'shuf1'), doc_id
               ) AS BIGINT) AS shuffle_rank,
               CAST((row_number() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || 'shuf1'), doc_id
               ) - 1) // 256 AS BIGINT) AS shard_id
        FROM documents
    """,
    doc="Deterministic global training-order shuffle + 256-doc sharding: "
        "order by md5(doc_id, salt) — the same permutation in every "
        "engine, run, and partitioning (rand() promises none of those) — "
        "then a contiguous global rank via the two-pass range-partition "
        "row numbering (operators/ranking.py), NOT a single-task global "
        "window: at 100 TB the sort key is range-partitioned, ranks are "
        "per-partition + broadcast offsets, and no task ever sees more "
        "than its slice. shard_id = (rank-1)/256 gives stable training "
        "shards for a dataloader (§2.11 sampling).",
    tags=("llm", "sampling", "curation"),
)
def deterministic_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_row_number

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.withColumn(
        "__k", F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("shuf1")))
    )
    ranked = global_row_number(keyed, ["__k", "doc_id"], out_col="shuffle_rank")
    return ranked.select(
        "doc_id",
        "shuffle_rank",
        F.floor((F.col("shuffle_rank") - 1) / 256).cast("long").alias("shard_id"),
    )


@register(
    "doc_chunking_overlap",
    oracle="""
        WITH t AS (
            SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
            FROM documents WHERE doc_id < 200
        ), n AS (
            SELECT doc_id, toks,
                   greatest(CAST(ceil((len(toks) - 16) / 48.0) AS INT), 1) AS n_chunks
            FROM t
        )
        SELECT doc_id,
               CAST(i AS INT) AS chunk_idx,
               array_to_string(toks[i * 48 + 1 : i * 48 + 64], ' ') AS chunk
        FROM n, unnest(range(0, n_chunks)) AS u(i)
    """,
    doc="Overlapping token-window chunking (64-token chunks, 16 overlap) — the "
        "long-document splitter, exploded to one row per chunk (§2.11 text).",
    tags=("llm", "text", "chunking"),
)
def doc_chunking_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    chunks = TS.chunk_text("text", chunk_tokens=64, overlap=16)
    return docs.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", F.col("c.chunk_idx").alias("chunk_idx"), F.col("c.chunk").alias("chunk")
    )


@register(
    "repetition_quality_metrics",
    oracle="""
        WITH d AS (
            SELECT doc_id, length(text) AS chars,
                   list_filter(string_split(text, ' '), t -> t != '') AS tk
            FROM documents
        ), bi AS (
            SELECT doc_id, chars, tk[i] || ' ' || tk[i+1] AS ngram
            FROM d, unnest(range(1, len(tk) + 1)) AS g(i)
            WHERE i + 1 <= len(tk)
        ), bc AS (
            SELECT doc_id, chars, ngram, count(*) AS cnt
            FROM bi GROUP BY 1, 2, 3
        ), top AS (
            SELECT doc_id, ngram, cnt, chars,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY cnt DESC, ngram DESC
                   ) AS rn
            FROM bc
        ), tri AS (
            SELECT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS ngram
            FROM d, unnest(range(1, len(tk) + 1)) AS g(i)
            WHERE i + 2 <= len(tk)
        ), tc AS (
            SELECT doc_id, ngram, count(*) AS cnt FROM tri GROUP BY 1, 2
        ), dup AS (
            SELECT doc_id,
                   round(CAST(sum(CASE WHEN cnt > 1 THEN cnt * length(ngram)
                                       ELSE 0 END) AS DOUBLE)
                         / greatest(sum(cnt * length(ngram)), 1), 6) AS dup_ngram_frac
            FROM tc GROUP BY 1
        )
        SELECT d0.doc_id,
               coalesce(t.ngram, '') AS top_ngram,
               coalesce(round(CAST(t.cnt * length(t.ngram) AS DOUBLE)
                              / greatest(t.chars, 1), 6), 0.0) AS top_ngram_frac,
               coalesce(dup.dup_ngram_frac, 0.0) AS dup_ngram_frac
        FROM (SELECT doc_id FROM documents) d0
        LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)
        LEFT JOIN dup USING (doc_id)
    """,
    doc="Gopher-style repetition filters (Rae et al. 2021 A1.1): per-doc "
        "top-bigram character coverage and duplicated-trigram character "
        "fraction — the cheap boilerplate detectors run before model-based "
        "quality scoring (§2.11 text analysis).",
    tags=("llm", "text", "quality"),
)
def repetition_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return TS.repetition_metrics(docs, "doc_id", "text", top_n=2, dup_n=3)


@register(
    "contamination_ngram_overlap",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'cont'), 1, 8)
                        AS BIGINT) % 100 AS INT) AS bkt,
                   list_filter(string_split(text, ' '), t -> t != '') AS tk
            FROM documents
        ), tri AS (
            SELECT DISTINCT doc_id, bkt,
                   tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS sh
            FROM d, unnest(range(1, len(tk) + 1)) AS g(i)
            WHERE i + 2 <= len(tk)
        ), bench AS (
            SELECT DISTINCT sh FROM tri WHERE bkt < 5
        ), corpus AS (
            SELECT doc_id, sh FROM tri WHERE bkt >= 5
        ), tot AS (
            SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY 1
        ), hit AS (
            SELECT c.doc_id, count(*) AS n_overlap
            FROM corpus c JOIN bench USING (sh) GROUP BY 1
        )
        SELECT t.doc_id, t.n_shingles,
               CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
               round(CAST(coalesce(h.n_overlap, 0) AS DOUBLE)
                     / greatest(t.n_shingles, 1), 6) AS overlap_frac
        FROM tot t LEFT JOIN hit h USING (doc_id)
    """,
    doc="Benchmark-contamination detection: word 3-gram overlap of each corpus "
        "document against a held-out benchmark split (deterministic 5% md5 "
        "bucket). The benchmark shingle set is broadcast — at 100 TB the "
        "corpus scan stays shuffle-free on the probe side (§2.11).",
    tags=("llm", "text", "dedup"),
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__bkt", hash_bucket("doc_id", 100, "cont")
    )
    tri = docs.select(
        "doc_id", "__bkt", F.explode(TS.word_shingles("text", 3)).alias("sh")
    )
    bench = tri.filter(F.col("__bkt") < 5).select("sh").distinct()
    corpus = tri.filter(F.col("__bkt") >= 5)
    tot = corpus.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hit = (
        corpus.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return tot.join(hit, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
        F.round(
            F.coalesce("n_overlap", F.lit(0).cast("long")).cast("double")
            / F.greatest(F.col("n_shingles"), F.lit(1)),
            6,
        ).alias("overlap_frac"),
    )


@register(
    "contamination_bloom_prefilter",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'cont'), 1, 8)
                        AS BIGINT) % 100 AS INT) AS bkt,
                   list_filter(string_split(text, ' '), t -> t != '') AS tk
            FROM documents
        ), tri AS (
            SELECT DISTINCT doc_id, bkt,
                   tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS sh
            FROM d, unnest(range(1, len(tk) + 1)) AS g(i)
            WHERE i + 2 <= len(tk)
        ), bench AS (
            SELECT DISTINCT sh FROM tri WHERE bkt < 5
        ), corpus AS (
            SELECT doc_id, sh FROM tri WHERE bkt >= 5
        ), tot AS (
            SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY 1
        ), hit AS (
            SELECT c.doc_id, count(*) AS n_overlap
            FROM corpus c JOIN bench USING (sh) GROUP BY 1
        )
        SELECT t.doc_id, t.n_shingles,
               CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
               round(CAST(coalesce(h.n_overlap, 0) AS DOUBLE)
                     / greatest(t.n_shingles, 1), 6) AS overlap_frac
        FROM tot t LEFT JOIN hit h USING (doc_id)
    """,
    doc="Decontamination at broadcast-breaking scale: identical semantics "
        "(and oracle) to contamination_ngram_overlap, but the corpus-side "
        "probe is prefiltered by a broadcast Bloom bit-set over the benchmark "
        "shingles (operators/bloom.py) before the exact hit-join — ~16 "
        "bits/element broadcast instead of the string set, no false "
        "negatives, so the exact join on survivors returns the identical "
        "answer while only (contaminated + ~0.5% FP) shingles reach it. "
        "The build collects bit-or'd words (<= num_bits/64 longs), never "
        "elements (§2.11 [EXT]).",
    tags=("llm", "text", "dedup", "bloom"),
)
def contamination_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import build_bloom, might_contain
    from ..operators.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__bkt", hash_bucket("doc_id", 100, "cont")
    )
    tri = docs.select(
        "doc_id", "__bkt", F.explode(TS.word_shingles("text", 3)).alias("sh")
    )
    bench = tri.filter(F.col("__bkt") < 5).select("sh").distinct()
    corpus = tri.filter(F.col("__bkt") >= 5)
    # totals come from the UNfiltered corpus side; only the hit-join
    # branch goes through the bloom
    tot = corpus.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    num_bits, k = 1 << 18, 3
    bits = build_bloom(bench, "sh", num_bits=num_bits, k=k)
    survivors = corpus.filter(might_contain(bits, F.col("sh"), num_bits, k))
    hit = (
        survivors.join(bench, "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return tot.join(hit, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
        F.round(
            F.coalesce("n_overlap", F.lit(0).cast("long")).cast("double")
            / F.greatest(F.col("n_shingles"), F.lit(1)),
            6,
        ).alias("overlap_frac"),
    )


@register(
    "frequent_terms_cms_certificate",
    oracle="""
        WITH toks AS (
            SELECT unnest(list_filter(string_split(lower(
                       regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), ' '),
                   t -> t != '')) AS term
            FROM documents
        ), counts AS (
            SELECT term, count(*) AS exact_count FROM toks GROUP BY term
        )
        SELECT term, CAST(exact_count AS BIGINT) AS exact_count, TRUE AS cms_ok
        FROM counts ORDER BY exact_count DESC, term LIMIT 20
    """,
    doc="Frequent terms via count-min sketch with a deterministic error "
        "certificate: the CMS aggregates distributed (mergeable, O(sketch) "
        "per partition — the scale path for term stats when the dictionary "
        "doesn't fit), the driver queries the 20 top terms against it, and "
        "cms_ok certifies exact <= estimate <= exact + ceil(eps*N) — the "
        "one-sided CMS guarantee the oracle can state as TRUE. Fixed seed "
        "=> deterministic (§2.11 text analysis [EXT]).",
    tags=("llm", "text", "sketch"),
)
def frequent_terms_cms_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TS.tokens("text")).alias("term"))
    toks = toks.persist()
    total = toks.count()
    eps = 0.001
    sketch_bytes = toks.agg(
        F.expr(f"count_min_sketch(term, {eps}d, 0.99d, 42)").alias("s")
    ).collect()[0].s
    top = (
        toks.groupBy("term").agg(F.count("*").alias("exact_count"))
        .orderBy(F.desc("exact_count"), "term").limit(20).collect()
    )
    toks.unpersist()
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sketch_bytes)
    )
    slack = math.ceil(eps * total)
    rows = []
    for r in top:
        est = cms.estimateCount(r.term)
        rows.append((r.term, r.exact_count, bool(r.exact_count <= est <= r.exact_count + slack)))
    return spark.createDataFrame(rows, "term string, exact_count long, cms_ok boolean")


@register(
    "embedding_quantize_int8",
    oracle="""
        WITH e AS (
            SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
            FROM embeddings
        ), s AS (
            SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e
        )
        SELECT vec_id,
               CAST(i - 1 AS INT) AS pos,
               CAST(round((v[i] - mn)
                          / (CASE WHEN mx > mn THEN mx - mn ELSE 1.0 END) * 255)
                    AS INT) AS q,
               round(mn, 6) AS scale_min,
               round(mx, 6) AS scale_max
        FROM s, unnest(range(1, len(v) + 1)) AS g(i)
    """,
    doc="Per-vector min/max uint8 scalar quantization (4x vector compression "
        "for ANN index shipping), posexploded to scalar rows for the oracle "
        "(arrays hash differently across engines; §2.11 similarity).",
    tags=("llm", "similarity", "quantize"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = S.quantize_int8(emb, "vec_id", "embedding")
    return q.select(
        "vec_id",
        F.posexplode("qvec").alias("pos", "q"),
        F.round("scale_min", 6).alias("scale_min"),
        F.round("scale_max", 6).alias("scale_max"),
    )


# --- Product quantization (PQ/ADC) oracle, generated ----------------------
# Determinism contract (mirrors operators/similarity.py PQ notes): every
# squared distance is a LEFT-ASSOCIATIVE 8-term chain (bit-equal to the
# engine's pinned F.aggregate fold, since IEEE 0.0+t == t), argmin ties
# break on cid, Lloyd means round to 6dp, and the ADC total is an
# explicit pivot chain — no order-unspecified double SUM anywhere.
_PQ_M, _PQ_DSUB, _PQ_K0 = 8, 8, 16

_PQ_SUB_LIST = "[" + ", ".join(
    f"CAST(embedding[t.s * {_PQ_DSUB} + {i}] AS DOUBLE)" for i in range(1, _PQ_DSUB + 1)
) + "]"


def _pq_d2_sql(a: str, b: str) -> str:
    return " + ".join(
        f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])"
        for i in range(1, _PQ_DSUB + 1)
    )


_PQ_ADC_CHAIN = " + ".join(
    f"max(CASE WHEN p.s = {i} THEN p.pd END)" for i in range(_PQ_M)
)

_PQ_ORACLE = f"""
        WITH sub AS (
            SELECT vec_id, t.s AS s, {_PQ_SUB_LIST} AS sub
            FROM embeddings,
                 (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS s) t
        ), cb0 AS (
            SELECT s, vec_id AS cid, sub AS cvec FROM sub WHERE vec_id < {_PQ_K0}
        ), a0 AS (
            SELECT vec_id, s, cid, sub FROM (
                SELECT a.vec_id, a.s, c.cid, a.sub,
                       row_number() OVER (
                           PARTITION BY a.vec_id, a.s
                           ORDER BY {_pq_d2_sql('a.sub', 'c.cvec')} ASC, c.cid ASC
                       ) AS rk
                FROM sub a JOIN cb0 c ON c.s = a.s
            ) WHERE rk = 1
        ), mean_cells AS (
            SELECT s, cid, k.pos AS pos, round(avg(sub[k.pos]), 6) AS mval
            FROM a0, (SELECT unnest(generate_series(1, {_PQ_DSUB})) AS pos) k
            GROUP BY s, cid, k.pos
        ), cb1 AS MATERIALIZED (
            SELECT s, cid, list(mval ORDER BY pos) AS cvec
            FROM mean_cells GROUP BY s, cid
        ), codes AS (
            SELECT vec_id, s, cid FROM (
                SELECT a.vec_id, a.s, c.cid,
                       row_number() OVER (
                           PARTITION BY a.vec_id, a.s
                           ORDER BY {_pq_d2_sql('a.sub', 'c.cvec')} ASC, c.cid ASC
                       ) AS rk
                FROM sub a JOIN cb1 c ON c.s = a.s
            ) WHERE rk = 1
        ), pd AS (
            SELECT q.vec_id AS query_id, c.s, c.cid,
                   {_pq_d2_sql('q.sub', 'c.cvec')} AS pd
            FROM sub q JOIN cb1 c ON c.s = q.s
            WHERE q.vec_id < 5
        ), adc AS (
            SELECT p.query_id, x.vec_id AS neighbor_id, {_PQ_ADC_CHAIN} AS adc
            FROM codes x JOIN pd p ON p.s = x.s AND p.cid = x.cid
            WHERE x.vec_id != p.query_id
            GROUP BY p.query_id, x.vec_id
        )
        SELECT query_id, neighbor_id, round(adc, 6) AS adc_dist2, rank
        FROM (
            SELECT query_id, neighbor_id, adc,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc ASC, neighbor_id ASC) AS rank
            FROM adc
        ) WHERE rank <= 5
"""


@register(
    "pq_adc_topk",
    oracle=_PQ_ORACLE,
    doc="Product quantization + asymmetric-distance search (Jégou et "
        "al., TPAMI 2011) — the vector-COMPRESSION half of the ANN "
        "surface that scalar int8 (embedding_quantize_int8) lacks: "
        "d=64 vectors split into m=8 sub-vectors, each Lloyd-quantized "
        "against a per-subspace k=16 codebook (init = sub-vectors of "
        "the 16 smallest vec_ids, one refinement round), so the corpus "
        "stores 8 small codes per vector (32x smaller than float32). "
        "Query-time ADC never decodes: a broadcast |Q|*m*k exact "
        "distance table + m lookups per candidate, summed by an "
        "explicit fixed-order pivot chain. Scale shape: training/"
        "encode shuffle O(N*m) best-code rows (argmin is a map-side "
        "struct-min partial agg under a broadcast codebook), search "
        "scans codes only — nothing query-dependent shuffles the "
        "corpus. The oracle replays the IDENTICAL algorithm (left-"
        "assoc distance chains bit-equal to the engine's pinned HOF "
        "folds, 6dp Lloyd means, cid tie-breaks) so every ADC "
        "distance and rank must match exactly; recall vs exact L2 and "
        "Lloyd SSE-monotonicity are pytest-asserted (§2.11 "
        "similarity/quantize).",
    tags=("llm", "similarity", "quantize"),
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return pq_adc_over(emb)


def pq_adc_over(emb: DataFrame) -> DataFrame:
    """pq_adc_topk's full pipeline over an arbitrary (vec_id,
    embedding) frame — shared with the scale tool so the proof
    measures exactly what the registered query runs."""
    subs = S.pq_subvectors(emb, "vec_id", "embedding", m=_PQ_M, dsub=_PQ_DSUB)
    init = subs.filter(F.col("vec_id") < _PQ_K0).select(
        "s", F.col("vec_id").alias("cid"), F.col("sub").alias("cvec")
    )
    # 128-row codebook feeds BOTH the encode join and the ADC table:
    # materialize once (driver-local barrier on an O(m*k) frame) so the
    # Lloyd job doesn't replay per consumer.
    cb = S.pq_train_codebook(subs, init, rounds=1).localCheckpoint()
    codes = S.pq_assign(subs, cb).select("vec_id", "s", "cid")
    qsubs = subs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "s", "sub"
    )
    return S.pq_adc_topk(codes, cb, qsubs, m=_PQ_M, k=5)


# --- IVF-PQ residual index (FAISS IVFADC shape), oracle generated ---------
# Coarse quantizer = the SAME PQ machinery with one 64-dim "subspace"
# (kc=8 cells, init = the 8 smallest ids' vectors, one Lloyd round);
# residual r = x − cell_centroid is a scan-side zip_with; the residual
# PQ codebooks, codes, probes and ADC reuse pq_adc_topk's determinism
# contract (pinned left-fold distances == left-assoc SQL chains, 6dp
# Lloyd means, cid tie-breaks, pivot-chain ADC sums).
_IVF_KC, _IVF_NPROBE = 8, 2

_IVFPQ_FULL_LIST = "[" + ", ".join(
    f"CAST(embedding[{k}] AS DOUBLE)" for k in range(1, 65)
) + "]"
_IVFPQ_RESID_LIST = lambda a, c: "[" + ", ".join(  # noqa: E731
    f"{a}.fv[{k}] - {c}.cv[{k}]" for k in range(1, 65)
) + "]"
_IVFPQ_RSUB_LIST = "[" + ", ".join(
    f"rv[t.s * {_PQ_DSUB} + {i}]" for i in range(1, _PQ_DSUB + 1)
) + "]"


def _d2_chain_sql(a: str, b: str, n: int) -> str:
    return " + ".join(
        f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])" for i in range(1, n + 1)
    )


_IVFPQ_ORACLE = f"""
        WITH fvec AS (
            SELECT vec_id, {_IVFPQ_FULL_LIST} AS fv FROM embeddings
        ), ccb0 AS (
            SELECT vec_id AS cid, fv AS cv FROM fvec WHERE vec_id < {_IVF_KC}
        ), ca0 AS (
            SELECT vec_id, cid, fv FROM (
                SELECT a.vec_id, c.cid, a.fv,
                       row_number() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY {_d2_chain_sql('a.fv', 'c.cv', 64)} ASC, c.cid ASC
                       ) AS rk
                FROM fvec a, ccb0 c
            ) WHERE rk = 1
        ), cmean AS (
            SELECT cid, k.pos AS pos, round(avg(fv[k.pos]), 6) AS mval
            FROM ca0, (SELECT unnest(generate_series(1, 64)) AS pos) k
            GROUP BY cid, k.pos
        ), ccb1 AS MATERIALIZED (
            SELECT cid, list(mval ORDER BY pos) AS cv FROM cmean GROUP BY cid
        ), ca1 AS (
            SELECT vec_id, cid AS ccid, fv FROM (
                SELECT a.vec_id, c.cid, a.fv,
                       row_number() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY {_d2_chain_sql('a.fv', 'c.cv', 64)} ASC, c.cid ASC
                       ) AS rk
                FROM fvec a, ccb1 c
            ) WHERE rk = 1
        ), resid AS MATERIALIZED (
            SELECT a.vec_id, a.ccid, {_IVFPQ_RESID_LIST('a', 'c')} AS rv
            FROM ca1 a JOIN ccb1 c ON c.cid = a.ccid
        ), rsub AS (
            SELECT vec_id, ccid, t.s AS s, {_IVFPQ_RSUB_LIST} AS sub
            FROM resid, (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS s) t
        ), rcb0 AS (
            SELECT s, vec_id AS cid, sub AS cvec FROM rsub WHERE vec_id < {_PQ_K0}
        ), ra0 AS (
            SELECT vec_id, s, cid, sub FROM (
                SELECT a.vec_id, a.s, c.cid, a.sub,
                       row_number() OVER (
                           PARTITION BY a.vec_id, a.s
                           ORDER BY {_d2_chain_sql('a.sub', 'c.cvec', _PQ_DSUB)} ASC, c.cid ASC
                       ) AS rk
                FROM rsub a JOIN rcb0 c ON c.s = a.s
            ) WHERE rk = 1
        ), rmean AS (
            SELECT s, cid, k.pos AS pos, round(avg(sub[k.pos]), 6) AS mval
            FROM ra0, (SELECT unnest(generate_series(1, {_PQ_DSUB})) AS pos) k
            GROUP BY s, cid, k.pos
        ), rcb1 AS MATERIALIZED (
            SELECT s, cid, list(mval ORDER BY pos) AS cvec
            FROM rmean GROUP BY s, cid
        ), codes AS (
            SELECT vec_id, ccid, s, cid FROM (
                SELECT a.vec_id, a.ccid, a.s, c.cid,
                       row_number() OVER (
                           PARTITION BY a.vec_id, a.s
                           ORDER BY {_d2_chain_sql('a.sub', 'c.cvec', _PQ_DSUB)} ASC, c.cid ASC
                       ) AS rk
                FROM rsub a JOIN rcb1 c ON c.s = a.s
            ) WHERE rk = 1
        ), probes AS (
            SELECT query_id, ccid FROM (
                SELECT a.vec_id AS query_id, c.cid AS ccid,
                       row_number() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY {_d2_chain_sql('a.fv', 'c.cv', 64)} ASC, c.cid ASC
                       ) AS pr
                FROM fvec a, ccb1 c WHERE a.vec_id < 5
            ) WHERE pr <= {_IVF_NPROBE}
        ), qres AS (
            SELECT p.query_id, p.ccid, {_IVFPQ_RESID_LIST('q', 'c')} AS rv
            FROM probes p
            JOIN fvec q ON q.vec_id = p.query_id
            JOIN ccb1 c ON c.cid = p.ccid
        ), qrsub AS (
            SELECT query_id, ccid, t.s AS s, {_IVFPQ_RSUB_LIST} AS sub
            FROM qres, (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS s) t
        ), pd AS (
            SELECT q.query_id, q.ccid, c.s, c.cid,
                   {_d2_chain_sql('q.sub', 'c.cvec', _PQ_DSUB)} AS pd
            FROM qrsub q JOIN rcb1 c ON c.s = q.s
        ), adc AS (
            SELECT p.query_id, x.vec_id AS neighbor_id, {_PQ_ADC_CHAIN} AS adc
            FROM codes x
            JOIN pd p ON p.ccid = x.ccid AND p.s = x.s AND p.cid = x.cid
            WHERE x.vec_id != p.query_id
            GROUP BY p.query_id, x.vec_id
        )
        SELECT query_id, neighbor_id, round(adc, 6) AS adc_dist2, rank
        FROM (
            SELECT query_id, neighbor_id, adc,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc ASC, neighbor_id ASC) AS rank
            FROM adc
        ) WHERE rank <= 5
"""


@register(
    "ivfpq_residual_adc_topk",
    oracle=_IVFPQ_ORACLE,
    doc="The full IVF-PQ index (the FAISS IVFADC shape every "
        "billion-vector store runs): a kc=8 coarse quantizer — the "
        "SAME PQ machinery with one 64-dim subspace — partitions the "
        "corpus into cells, each vector stores only its cell id plus "
        "8 residual PQ codes (r = x − cell_centroid, a scan-side "
        "zip_with), and a query probes its nprobe=2 nearest cells, "
        "scoring ONLY those cells' codes against a per-(query, cell) "
        "residual ADC lookup table. Scale shape: the probe predicate "
        "is an equi-join on ccid — the index prunes 1−nprobe/kc of "
        "the corpus BEFORE any distance work, on top of pq_adc_topk's "
        "properties (broadcast codebooks, O(N·m) code shuffles, "
        "pivot-chain ADC, corpus never shuffles on the query). The "
        "oracle replays the identical two-level algorithm (64-term "
        "and 8-term left-assoc distance chains bit-equal to the "
        "pinned HOF folds, 6dp Lloyd means, cid tie-breaks), so every "
        "ADC distance and rank must match exactly; cell-pruning "
        "candidate accounting is pytest-asserted (§2.11 similarity/"
        "quantize).",
    tags=("llm", "similarity", "quantize"),
)
def ivfpq_residual_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivfpq_adc_over(_t(spark, sf_dir, "embeddings"))


def ivfpq_adc_over(
    emb: DataFrame, k: int = 5, exclude_self: bool = True
) -> DataFrame:
    """ivfpq_residual_adc_topk's full two-level pipeline over an
    arbitrary (vec_id, embedding) frame — shared with the scale tool
    so the proof measures exactly what the registered query runs."""
    from functools import reduce as _reduce

    from pyspark.sql import Window

    # coarse quantizer: PQ machinery, one 64-dim subspace
    full = S.pq_subvectors(emb, "vec_id", "embedding", m=1, dsub=64)
    cinit = full.filter(F.col("vec_id") < _IVF_KC).select(
        "s", F.col("vec_id").alias("cid"), F.col("sub").alias("cvec")
    )
    ccb = S.pq_train_codebook(full, cinit, rounds=1).localCheckpoint()
    cass = S.pq_assign(full, ccb).select("vec_id", F.col("cid").alias("ccid"))
    cells = ccb.select(F.col("cid").alias("ccid"), F.col("cvec").alias("ccvec"))
    resid = (
        emb.join(cass, "vec_id")
        .join(F.broadcast(cells), "ccid")
        .select(
            "vec_id", "ccid",
            F.zip_with(
                S.as_double_array("embedding"), F.col("ccvec"), lambda x, c: x - c
            ).alias("rvec"),
        )
    )
    # residual sub-vectors CARRY the cell id: ccid is functionally
    # dependent on vec_id, so threading it through the encode groupBy
    # costs nothing and avoids re-joining two O(N) frames (codes x
    # cell assignment) just to recover it — one whole shuffle saved
    # on the index-build path.
    rslices = F.array(*[
        F.slice("rvec", s * _PQ_DSUB + 1, _PQ_DSUB) for s in range(_PQ_M)
    ])
    rsubs = resid.select("vec_id", "ccid", F.posexplode(rslices).alias("s", "sub"))
    rinit = rsubs.filter(F.col("vec_id") < _PQ_K0).select(
        "s", F.col("vec_id").alias("cid"), F.col("sub").alias("cvec")
    )
    rcb = S.pq_train_codebook(rsubs, rinit, rounds=1).localCheckpoint()
    codes = S.pq_assign(rsubs, rcb, carry_cols=("ccid",)).select(
        "vec_id", "ccid", "s", "cid"
    )
    # nprobe nearest cells per query
    qd = (
        full.filter(F.col("vec_id") < 5)
        .join(F.broadcast(ccb), "s")
        .select(
            F.col("vec_id").alias("query_id"), F.col("cid").alias("ccid"),
            S.sq_dist(F.col("sub"), F.col("cvec")).alias("d2"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("ccid").asc()
    )
    probes = (
        qd.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= _IVF_NPROBE)
        .select("query_id", "ccid")
    )
    qres = (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .join(probes, "query_id")
        .join(F.broadcast(cells), "ccid")
        .select(
            "query_id", "ccid",
            F.zip_with(
                S.as_double_array("embedding"), F.col("ccvec"), lambda x, c: x - c
            ).alias("qrv"),
        )
    )
    qslices = F.array(*[
        F.slice("qrv", s * _PQ_DSUB + 1, _PQ_DSUB) for s in range(_PQ_M)
    ])
    qrsubs = qres.select("query_id", "ccid", F.posexplode(qslices).alias("s", "sub"))
    pdist = qrsubs.join(rcb, "s").select(
        "query_id", "ccid", "s", "cid",
        S.sq_dist(F.col("sub"), F.col("cvec")).alias("pd"),
    )
    j = codes.join(F.broadcast(pdist), ["ccid", "s", "cid"])
    if exclude_self:
        j = j.filter(F.col("vec_id") != F.col("query_id"))
    pivoted = j.groupBy("query_id", F.col("vec_id").alias("neighbor_id")).agg(
        *[F.max(F.when(F.col("s") == i, F.col("pd"))).alias(f"_d{i}")
          for i in range(_PQ_M)]
    )
    adc = _reduce(lambda a, b: a + b, [F.col(f"_d{i}") for i in range(_PQ_M)])
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        pivoted.select("query_id", "neighbor_id", adc.alias("adc"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.round("adc", 6).alias("adc_dist2"), "rank",
        )
    )


@register(
    "curation_pipeline_summary",
    oracle="""
        WITH t AS (
            SELECT doc_id, text,
                   list_filter(string_split(text, ' '), x -> x != '') AS toks
            FROM documents
        ), m AS (
            SELECT doc_id, text, len(toks) AS n_tokens,
                   round((CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
                          + CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1)
                          + CASE WHEN (CAST(len(list_filter(toks, x -> list_contains(
                                ['the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','with'], x)))
                                AS DOUBLE) / greatest(len(toks), 1)) > 0.0
                                AND (CAST(len(list_filter(toks, x -> list_contains(
                                ['the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','with'], x)))
                                AS DOUBLE) / greatest(len(toks), 1)) < 0.6
                                THEN 1.0 ELSE 0.5 END) / 3.0, 6) AS quality
            FROM t
        ), kept AS (
            SELECT * FROM m WHERE quality >= 0.5
        ), dedup AS (
            SELECT min(doc_id) AS doc_id
            FROM kept
            GROUP BY lower(trim(regexp_replace(text, '\\s+', ' ')))
        ), survivors AS (
            SELECT m.doc_id, m.n_tokens, m.quality,
                   CAST(CAST('0x' || substring(md5(CAST(m.doc_id AS VARCHAR) || 'cur'), 1, 8)
                        AS BIGINT) % 100 AS INT) AS b
            FROM m JOIN dedup USING (doc_id)
        )
        SELECT CASE WHEN b < 10 THEN 'test'
                    WHEN b < 20 THEN 'val'
                    ELSE 'train' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DOUBLE)
                     / count(*), 6) AS avg_quality
        FROM survivors GROUP BY 1
    """,
    doc="End-to-end curation DAG as one query: quality filter -> exact dedup "
        "(min-id winner) -> deterministic md5 split -> per-split doc/token/"
        "quality rollup. The composition a pre-training data pipeline runs "
        "nightly; every stage is an engine operator (§2.11).",
    tags=("llm", "text", "pipeline"),
)
def curation_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import train_val_test_split

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "text",
        TS.token_count("text").alias("n_tokens"),
        TS.quality_score("text").alias("quality"),
    )
    kept = scored.filter(F.col("quality") >= 0.5)
    deduped = D.exact_dedup(kept, "doc_id", "text")
    survivors = train_val_test_split(deduped, "doc_id", val_pct=10, test_pct=10, salt="cur")
    return survivors.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            F.sum(F.col("quality").cast("decimal(18,6)")).cast("double") / F.count("*"), 6
        ).alias("avg_quality"),
    )


@register(
    "tfidf_top_terms",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        ), df AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ), n AS (
            SELECT count(*) AS n_docs FROM documents
        ), scored AS (
            SELECT tf.doc_id, tf.term, tf.tf,
                   tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS score
            FROM tf JOIN df USING (term), n
        )
        SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, round(score, 6) AS score, rnk
        FROM (
            SELECT doc_id, term, tf, score,
                   row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
            FROM scored
        ) WHERE rnk <= 3
    """,
    doc="TF-IDF: per-(doc, term) term frequency × ln(N/df), top-3 terms per "
        "document. Token explode → two partial-agg groupBys; the term→df "
        "dictionary joins back by term (a dictionary-sized side — "
        "broadcastable even at corpus scale). Deterministic tie-break "
        "(score desc, term asc); equal (tf, df) pairs produce bit-identical "
        "doubles in both engines, so ranks can't diverge (§2.11 text).",
    tags=("llm", "text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()  # one scalar job; literal-folds into the plan
    tf = (
        docs.select("doc_id", F.explode(TS.tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id", "term", "tf",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", F.round("score", 6).alias("score"), "rnk")
    )


@register(
    "sequence_packing_bins",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source,
                   len(list_filter(string_split(text, ' '), t -> t != '')) AS n_tokens
            FROM documents
        ), cum AS (
            SELECT doc_id, source, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM toks
        )
        SELECT source, CAST((cum_tokens - n_tokens) // 512 AS BIGINT) AS bin_id,
               count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        FROM cum GROUP BY source, bin_id
    """,
    doc="Sequence packing for pretraining batches: concatenate-then-chunk "
        "semantics — docs in deterministic order, each assigned to the bin "
        "its starting token offset falls in (512-token bins). The per-source "
        "running token sum uses the two-pass range-partition + broadcast-"
        "offset pattern (operators/ranking.py::grouped_running_sum), NOT a "
        "PARTITION BY source window: source is a low-cardinality skewed key, "
        "and at 100 TB a window would serialize ~the whole corpus through "
        "one task, while the two-pass form splits a dominant source across "
        "many range partitions (§2.11 curation).",
    tags=("llm", "curation", "packing"),
)
def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import grouped_running_sum

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.size(TS.tokens("text")).cast("long").alias("n_tokens")
    )
    cum = grouped_running_sum(
        toks, "source", ["doc_id"], "n_tokens", out_col="cum_tokens"
    )
    return (
        cum.withColumn(
            "bin_id", F.floor((F.col("cum_tokens") - F.col("n_tokens")) / 512)
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
    )


@register(
    "stratified_sample_counts",
    oracle="""
        WITH sampled AS (
            SELECT doc_id, source
            FROM (
                SELECT doc_id, source,
                       CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'mix1'), 1, 8) AS BIGINT) % 100 AS INT) AS b
                FROM documents
            )
            WHERE b < CASE source
                        WHEN 'src0' THEN 80 WHEN 'src1' THEN 40
                        WHEN 'src2' THEN 20 WHEN 'src3' THEN 10
                        ELSE 50 END
        )
        SELECT source, count(*) AS n_kept,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM sampled GROUP BY source
    """,
    doc="Per-stratum deterministic sampling (domain up/down-sampling against "
        "mixture weights): membership is a pure function of md5(doc_id, salt), "
        "so the same rows are kept in every engine, run, and partitioning — "
        "rand()/sampleBy can't promise any of that. Scan-side filter, no "
        "shuffle before the count (§2.11 sampling).",
    tags=("llm", "sampling", "curation"),
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, "doc_id", "source",
        fractions={"src0": 80, "src1": 40, "src2": 20, "src3": 10},
        default_pct=50, salt="mix1",
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("id_checksum"),
    )


@register(
    "multimodal_dedup_checksum",
    oracle=_CORPUS_SQL_EXACT + """
        SELECT min(doc_id) AS media_id
        FROM corpus
        GROUP BY sha256(text)
    """,
    doc="Exact media dedup over the Arrow-batched decode stage: the corpus "
        "(with id-shifted duplicate payloads) flows media-synthesis → "
        "mapInPandas decode (sha256 checksum + byte-stat features) → "
        "min-id per checksum. sha256 is engine-portable, so this oracle-"
        "checks the Pandas-UDF plumbing itself end-to-end — schema, batch "
        "shape, and checksum values — not just row counts (§2.11 multimodal).",
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_dedup_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus_exact(spark, sf_dir)
    media = M.synthesize_media(corpus.withColumn("n_chars", F.length("text")))
    feats = M.decode_and_featurize(media)
    return feats.groupBy("checksum").agg(F.min("media_id").alias("media_id")).select("media_id")


@register(
    "multimodal_raster_roundtrip",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   5 + doc_id % 4 AS w,
                   4 + doc_id % 5 AS h
            FROM documents
        )
        SELECT doc_id AS media_id,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               CAST(h * 7 * w * (w-1) // 2 + w * 13 * h * (h-1) // 2
                    + w * h * (doc_id % 100) AS BIGINT) AS sum_r,
               CAST(h * 5 * w * (w-1) // 2 + w * 11 * h * (h-1) // 2
                    + w * h * (doc_id % 50) AS BIGINT) AS sum_g,
               CAST(h * 3 * w * (w-1) // 2 + w * 2 * h * (h-1) // 2
                    + w * h * (doc_id % 25) AS BIGINT) AS sum_b,
               CAST(7 * w * (w-1) // 2 + w * (doc_id % 100) AS BIGINT) AS row0_sum_r,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT) AS fmt
        FROM dims
    """,
    doc="REAL raster codec round-trip: per document, a deterministic "
        "gradient image is ENCODED to actual BMP (even ids) or binary "
        "PPM (odd ids) bytes and DECODED back by the pure-Python codec "
        "(operators/multimodal.py), both as Arrow-batched mapInPandas "
        "stages — payloads never touch the driver. The oracle states "
        "the closed-form channel sums: a wrong header offset, row "
        "stride/padding, BGR order, or bottom-up flip corrupts sum_* or "
        "row0_sum_r and fails the hash. This is the first fake=False "
        "decode path; NotImplementedError now only remains for formats "
        "that genuinely need native libraries (§2.11 multimodal).",
    tags=("llm", "multimodal", "codec"),
)
def multimodal_raster_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = M.synthesize_raster_media(docs)
    feats = M.decode_and_featurize(media, fake=False)
    f = F.col("features")
    return feats.select(
        "media_id",
        F.element_at(f, 1).cast("int").alias("width"),
        F.element_at(f, 2).cast("int").alias("height"),
        F.element_at(f, 3).cast("long").alias("sum_r"),
        F.element_at(f, 4).cast("long").alias("sum_g"),
        F.element_at(f, 5).cast("long").alias("sum_b"),
        F.element_at(f, 6).cast("long").alias("row0_sum_r"),
        F.element_at(f, 7).cast("int").alias("fmt"),
    )


@register(
    "multimodal_wav_roundtrip",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   100 + doc_id % 50 AS n,
                   1 + doc_id % 2 AS n_ch
            FROM documents
        )
        SELECT doc_id AS media_id,
               CAST(n_ch AS INT) AS n_channels,
               CAST(n AS INT) AS n_samples,
               CAST(3 * n * (n-1) // 2 + n * (doc_id % 100) - 500 * n
                    AS BIGINT) AS sum_ch0,
               CAST(CASE WHEN n_ch = 2
                         THEN n * (n-1) + n * (doc_id % 50) - 300 * n
                         ELSE 0 END AS BIGINT) AS sum_ch1,
               CAST(16000 AS INT) AS sample_rate
        FROM dims
    """,
    doc="REAL audio codec round-trip: per document, deterministic PCM16 "
        "ramps are ENCODED to actual RIFF/WAVE bytes (mono for even "
        "ids, interleaved stereo for odd) and DECODED back by the "
        "pure-Python chunk-walking WAV reader — both Arrow-batched "
        "mapInPandas stages. The oracle states the closed-form signed "
        "channel sums: an unsigned sample parse, a wrong interleave "
        "stride, a fixed-offset (byte-44) data assumption, or a "
        "mis-read fmt chunk corrupts sum_ch*/n_samples and fails the "
        "hash (§2.11 multimodal).",
    tags=("llm", "multimodal", "codec"),
)
def multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = M.synthesize_wav_media(docs)
    feats = M.decode_and_featurize(media, fake=False)
    f = F.col("features")
    return feats.select(
        "media_id",
        F.element_at(f, 1).cast("int").alias("n_channels"),
        F.element_at(f, 2).cast("int").alias("n_samples"),
        F.element_at(f, 3).cast("long").alias("sum_ch0"),
        F.element_at(f, 4).cast("long").alias("sum_ch1"),
        F.element_at(f, 5).cast("int").alias("sample_rate"),
    )


@register(
    "multimodal_video_frame_luma",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   4 + doc_id % 4 AS w,
                   3 + doc_id % 3 AS h,
                   3 + doc_id % 10 AS nf
            FROM documents
        )
        SELECT doc_id AS media_id,
               CAST(t.i AS INT) AS frame_idx,
               CAST(h * (w * (w-1) // 2) + 2 * w * (h * (h-1) // 2)
                    + w * h * (5 * t.i + doc_id % 50) AS BIGINT) AS luma_sum
        FROM dims, unnest(range(0, nf)) AS t(i)
        WHERE t.i % 2 = 0
    """,
    doc="REAL video frame sampling: per document, a deterministic C444 "
        "Y4M stream is ENCODED to actual YUV4MPEG2 bytes, then every "
        "2nd frame's Y plane is DECODED and summed by the pure-Python "
        "chunk walker (operators/multimodal.py::frame_sample_decoded) — "
        "per-frame data genuinely read from the payload, not planned "
        "from metadata. The oracle states the closed-form luma sums; a "
        "wrong plane stride, chroma-size assumption, or FRAME-marker "
        "walk corrupts them (§2.11 multimodal).",
    tags=("llm", "multimodal", "codec"),
)
def multimodal_video_frame_luma(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = M.synthesize_y4m_media(docs)
    return M.frame_sample_decoded(media, every_n=2)


@register(
    "unigram_logprob_quality",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS term
            FROM documents
        ), tf AS (
            SELECT term, count(*) AS n FROM toks GROUP BY term
        ), total AS (
            SELECT CAST(sum(n) AS DOUBLE) AS n_total FROM tf
        )
        SELECT t.doc_id,
               count(*) AS n_tokens,
               round(avg(ln(CAST(tf.n AS DOUBLE) / total.n_total)), 6) AS avg_logprob
        FROM toks t JOIN tf USING (term), total
        GROUP BY t.doc_id
    """,
    doc="Unigram language-model quality score (the perplexity-proxy filter "
        "of CCNet-style curation): per-document mean ln p(token) under the "
        "corpus unigram distribution. Token explode → dictionary-sized term "
        "counts broadcast back → one partial agg per doc; no shuffle "
        "carries raw text (§2.11 quality).",
    tags=("llm", "text", "quality"),
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(TS.tokens("text")).alias("term"))
    tf = toks.groupBy("term").agg(F.count("*").alias("n"))
    n_total = tf.agg(F.sum("n")).first()[0]
    scored = toks.join(F.broadcast(tf), "term").select(
        "doc_id",
        F.log(F.col("n").cast("double") / F.lit(float(n_total))).alias("lp"),
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


@register(
    "duplicate_ngram_fraction",
    oracle="""
        WITH shingle_lists AS (
            SELECT doc_id,
                   list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                  for i in range(1, len(words) - 1)]) AS shingles
            FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
            WHERE len(words) >= 3
        ), sh AS (
            SELECT doc_id, unnest(shingles) AS shingle FROM shingle_lists
        ), dfq AS (
            SELECT shingle, count(*) AS dfreq FROM sh GROUP BY shingle
        )
        SELECT doc_id,
               count(*) AS n_shingles,
               CAST(sum(CASE WHEN dfreq > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               round(CAST(sum(CASE WHEN dfreq > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 6) AS dup_frac
        FROM sh JOIN dfq USING (shingle)
        GROUP BY doc_id
    """,
    doc="Cross-corpus duplicate n-gram fraction per document (CCNet / "
        "RefinedWeb curation signal): distinct 3-gram postings -> "
        "doc-frequency -> fraction of a doc's shingles seen elsewhere. "
        "Inverted-index join on 64-bit shingle hashes, no self-join — "
        "linear in corpus tokens at 100 TB (§2.11).",
    tags=("llm", "dedup", "quality"),
)
def duplicate_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return D.duplicate_ngram_fraction(docs, "doc_id", "text", shingle_n=3)


@register(
    "semdedup_embedding_prune",
    oracle="""
        SELECT vec_id, (vec_id % 3 = 0) AS had_semantic_dup
        FROM embeddings
    """,
    doc="SemDeDup (Abbas et al. 2023): cluster embeddings, prune "
        "within-cluster pairs with cosine >= 0.9, keep min-id "
        "representatives. Planted-twin certificate: every vec_id % 3 == 0 "
        "gets an identical-embedding copy at +10M, so the correct output "
        "is exactly the original ids with had_semantic_dup = (vec_id % 3 "
        "= 0) — deterministic regardless of which clusters the engine "
        "forms, because identical vectors always co-cluster and the "
        "corpus' max natural cosine (~0.60) is far below the threshold "
        "(§2.11).",
    tags=("llm", "dedup", "embedding"),
)
def semdedup_embedding_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = emb.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(twins)
    return S.semdedup(
        corpus, "vec_id", "embedding", n_clusters=16, threshold=0.9
    )


@register(
    "reservoir_sample_per_group",
    oracle="""
        SELECT event_type, event_id FROM (
            SELECT event_type, event_id,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY md5(CAST(event_id AS VARCHAR) || 'rsv'), event_id
                   ) AS rn
            FROM events
        ) WHERE rn <= 5
    """,
    doc="Deterministic per-group reservoir sample: 5 events per type by "
        "md5-hash rank — the same 5 on any engine, run, or cluster size, "
        "unlike rand()/sampleBy. Same portable-md5 family as the "
        "deterministic splits (§2.11).",
    tags=("llm", "sampling"),
)
def reservoir_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import reservoir_per_group

    ev = _t(spark, sf_dir, "events").select("event_type", "event_id")
    return reservoir_per_group(ev, "event_type", "event_id", k=5, salt="rsv")


# ---------------------------------------------------------------------------
# Round-3 additions: signal features over the real codecs, BPE pair
# statistics, per-domain caps, distributed covariance, normalization dedup
# ---------------------------------------------------------------------------

@register(
    "audio_rms_zcr_features",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   100 + doc_id % 50 AS n,
                   1 + doc_id % 2 AS n_ch,
                   doc_id % 100 AS c
            FROM documents
        ), samp AS (
            SELECT doc_id, n, n_ch, CAST(t.i AS BIGINT) AS i,
                   3 * t.i + c - 500 AS s,
                   CASE WHEN t.i > 0 THEN 3 * (t.i - 1) + c - 500 END AS prev_s
            FROM dims, unnest(range(0, n)) AS t(i)
        )
        SELECT doc_id AS media_id,
               CAST(max(n_ch) AS INT) AS n_channels,
               CAST(max(n) AS INT) AS n_samples,
               CAST(sum(s * s) AS BIGINT) AS sumsq_ch0,
               CAST(sum(CASE WHEN prev_s IS NOT NULL
                             AND (prev_s < 0) != (s < 0)
                        THEN 1 ELSE 0 END) AS INT) AS zero_crossings_ch0,
               CAST(max(abs(s)) AS INT) AS peak_abs_ch0
        FROM samp GROUP BY doc_id
    """,
    doc="REAL audio feature extraction: PCM16 WAV payloads are decoded "
        "per-sample (chunk walk, signed parse, stereo de-interleave) and "
        "channel 0's energy (Σs²), zero-crossing count, and peak "
        "amplitude emitted as exact integers. The oracle restates the "
        "ramp signal closed-form over unnest(range(n)) — a wrong "
        "interleave stride or unsigned parse corrupts every statistic. "
        "Payloads never shuffle; only fixed-width feature rows do "
        "(§2.11 multimodal).",
    tags=("llm", "multimodal", "codec"),
)
def audio_rms_zcr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = M.synthesize_wav_media(docs)
    return M.audio_signal_features(media)


@register(
    "video_scene_change_cuts",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   3 + doc_id % 10 AS nf,
                   1 + doc_id % (2 + doc_id % 10) AS cut
            FROM documents
        )
        SELECT doc_id AS media_id,
               CAST(nf AS INT) AS n_frames,
               CAST(2 AS INT) AS n_scenes,
               CAST(cut AS INT) AS first_cut_frame,
               CAST(105 AS BIGINT) AS max_mean_delta
        FROM dims
    """,
    doc="Scene-change detection over REAL decoded video: every frame's "
        "Y plane is read from the Y4M payload, consecutive-frame mean-"
        "luma deltas computed with a per-video LAG window, and "
        "boundaries flagged where |Δmean| > 50. The synthesizer plants "
        "one +100 luma cut at frame 1 + id % (nf-1); the oracle states "
        "the planted truth (2 scenes, cut index, max delta 105 = 100 "
        "jump + 5 gradient drift). A wrong plane stride, frame walk, or "
        "window frame misses or mislocates cuts. The window partitions "
        "by media_id — high-cardinality, no serial key at scale "
        "(§2.11 multimodal).",
    tags=("llm", "multimodal", "codec"),
)
def video_scene_change_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = M.synthesize_y4m_media(docs, scene_cut=True)
    return M.scene_change_stats(media, mean_delta_threshold=50)


@register(
    "image_ahash_clusters",
    oracle="""
        SELECT doc_id AS media_id,
               CAST(5 + doc_id % 4 AS INT) AS width,
               CAST(4 + doc_id % 5 AS INT) AS height,
               count(*) OVER (PARTITION BY doc_id % 20) AS cluster_size
        FROM documents
    """,
    doc="Perceptual-hash image dedup over REAL decoded pixels: each "
        "raster's average-hash (bit = pixel gray·w·h > Σgray, exact "
        "integer threshold — no float mean) is computed from the "
        "decoded BMP/PPM grid, then images cluster on (width, height, "
        "ahash). aHash is brightness-shift-invariant, so the gradient "
        "images — whose per-id offsets differ but whose relative "
        "pattern depends only on (w, h) = (5+id%4, 4+id%5) — cluster "
        "exactly by id % 20 across BOTH formats: the oracle states "
        "those class sizes. A broken threshold, bit order, or decode "
        "path splinters the clusters and fails the hash. Only 16-byte "
        "codes shuffle, never payloads (§2.11 multimodal dedup).",
    tags=("llm", "multimodal", "dedup"),
)
def image_ahash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = M.synthesize_raster_media(docs)
    hashed = M.raster_ahash(media)
    w = Window.partitionBy("width", "height", "ahash")
    return hashed.select(
        "media_id", "width", "height",
        F.count("*").over(w).alias("cluster_size"),
    )


@register(
    "bpe_pair_merge_frequencies",
    oracle="""
        WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ), pairs AS (
            SELECT substring(w, CAST(t.i AS INT), 2) AS pair
            FROM words, unnest(range(1, length(w))) AS t(i)
            WHERE length(w) > 1
        ), counts AS (
            SELECT pair, count(*) AS n FROM pairs GROUP BY pair
        )
        SELECT pair, n, rnk FROM (
            SELECT pair, n,
                   row_number() OVER (ORDER BY n DESC, pair) AS rnk
            FROM counts
        ) WHERE rnk <= 20
    """,
    doc="First BPE merge step, corpus-wide: explode every word's "
        "adjacent character pairs (Catalyst sequence+transform HOFs — "
        "no Python in the hot path), count, and rank the top 20 merge "
        "candidates under a total order (count desc, pair asc) so the "
        "cut is deterministic on any engine. This is the inner loop of "
        "tokenizer training expressed as one scan + one shuffle; "
        "map-side partial aggregation bounds the shuffle by distinct "
        "pairs (≤ alphabet², not corpus size) (§2.11 text analysis).",
    tags=("llm", "text"),
)
def bpe_pair_merge_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(F.explode(TS.tokens("text")).alias("w")).filter(
        F.length("w") > 1
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("pair"))
    return counts.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 20
    )


def _bpe_oracle(k: int, mode: str = "merges") -> str:
    """Unrolled-SQL oracle for the BPE queries: k chained
    (pair-count → argmax → replace) rounds over the sep-joined symbol
    representation. MATERIALIZED is load-bearing — each round's rep is
    referenced by both the next count and the next replace, and the
    replace chain would otherwise re-inline exponentially.
    ``mode="merges"`` emits the k adopted merges;
    ``mode="compression"`` emits per-source symbol-count compression
    after applying all k merges (r{k} carries source + the initial
    symbol count as pass-through columns; pair counts stay corpus-wide
    and source-blind, so both modes learn the identical trajectory)."""
    parts = ["""
        WITH words AS MATERIALIZED (
            SELECT source, w FROM (
                SELECT source, unnest(string_split(text, ' ')) AS w
                FROM documents
            ) WHERE w != '' AND length(w) > 1
        ),
        r0 AS MATERIALIZED (
            SELECT source, CAST(length(w) AS BIGINT) AS n0,
                   chr(31) || array_to_string(string_split(w, ''), chr(31))
                   || chr(31) AS rep
            FROM words
        )"""]
    for i in range(1, k + 1):
        parts.append(f""",
        p{i} AS (
            SELECT syms[CAST(j AS INT)] AS w1,
                   syms[CAST(j + 1 AS INT)] AS w2, count(*) AS n
            FROM (
                SELECT list_filter(string_split(rep, chr(31)), x -> x != '')
                       AS syms
                FROM r{i - 1}
            ), unnest(generate_series(1, len(syms) - 1)) u(j)
            GROUP BY 1, 2
        ),
        m{i} AS MATERIALIZED (
            SELECT w1, w2, n FROM p{i} ORDER BY n DESC, w1, w2 LIMIT 1
        ),
        r{i} AS MATERIALIZED (
            SELECT source, n0,
                   replace(rep,
                           chr(31) || m.w1 || chr(31) || m.w2 || chr(31),
                           chr(31) || m.w1 || m.w2 || chr(31)) AS rep
            FROM r{i - 1}, m{i} m
        )""")
    if mode == "compression":
        return "".join(parts) + f"""
        SELECT source, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(n0) AS BIGINT) AS n_symbols_before,
               CAST(sum(len(list_filter(string_split(rep, chr(31)),
                                        x -> x != ''))) AS BIGINT)
                   AS n_symbols_after,
               round(CAST(sum(len(list_filter(string_split(rep, chr(31)),
                                              x -> x != ''))) AS DOUBLE)
                     / sum(n0), 6) AS compression
        FROM r{k} GROUP BY source"""
    selects = " UNION ALL ".join(
        f"SELECT {i} AS round, w1, w2, w1 || w2 AS merged, "
        f"CAST(n AS BIGINT) AS pair_count FROM m{i}"
        for i in range(1, k + 1)
    )
    return "".join(parts) + f" SELECT * FROM ({selects}) ORDER BY round"


_BPE_SEP = "\x1f"


def _bpe_symbol_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, cnt, n0, rep): one row per DISTINCT (source, word) with
    its instance count — the word-FREQUENCY table every real BPE
    trainer (SentencePiece/HF) operates on, not one row per word
    instance. Pair counts weighted by cnt are exactly the per-instance
    counts, so the learned trajectory is identical, but every merge
    round now scans |vocab| rows instead of |tokens| rows — at sf0.1
    that is 600 vs 262k (436×), and at 100 TB Heaps' law keeps the
    vocabulary sublinear in corpus size while the instance table grows
    linearly. rep = sep-joined character symbols, n0 = symbols/word."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select("source", F.explode(TS.tokens("text")).alias("w")).filter(
        F.length("w") > 1
    )
    wf = words.groupBy("source", "w").agg(F.count(F.lit(1)).alias("cnt"))
    sep = F.lit(_BPE_SEP)
    return wf.select(
        "source",
        "cnt",
        F.length("w").cast("long").alias("n0"),
        F.concat(sep, F.array_join(F.split("w", ""), _BPE_SEP), sep).alias("rep"),
    ).localCheckpoint(eager=True)


def _bpe_merge_loop(rep: DataFrame, k: int):
    """Run k BPE merge rounds over ``rep`` (any frame with a ``rep``
    column; other columns pass through untouched). Returns
    (merges, rep_after): the adopted (round, w1, w2, merged, n) tuples
    and the corpus with ALL k merges applied. Eager checkpoint per
    round — k chained replaces would otherwise re-execute the whole
    prefix at every round's count (O(k²) scans).

    If ``rep`` carries a ``cnt`` column (the word-frequency corpus),
    pair occurrences are weighted by it — sum(cnt) over distinct words
    ≡ count(*) over word instances, exactly."""
    passthrough = [c for c in rep.columns if c != "rep"]
    weighted = "cnt" in rep.columns
    sep = F.lit(_BPE_SEP)
    merges = []
    for i in range(1, k + 1):
        syms = F.filter(F.split("rep", _BPE_SEP), lambda x: x != F.lit(""))
        # adjacent pairs as arrays_zip of two shifted slices — measured
        # 1.5x faster than a sequence+transform+element_at walk (1.4s vs
        # 2.2s per round at sf0.1): slices copy contiguously and the zip
        # avoids a per-element positional lookup closure
        n = F.size(syms)
        pairs = rep.select(
            (F.col("cnt") if weighted else F.lit(1).alias("cnt")),
            F.explode(
                F.arrays_zip(F.slice(syms, 1, n - 1), F.slice(syms, 2, n - 1))
            ).alias("p"),
        ).select("cnt", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        top = (
            pairs.groupBy("w1", "w2")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), "w1", "w2")
            .limit(1)
            .collect()[0]
        )
        merges.append((i, top["w1"], top["w2"], top["w1"] + top["w2"], top["n"]))
        pat = F.concat(sep, F.lit(top["w1"]), sep, F.lit(top["w2"]), sep)
        new = F.concat(sep, F.lit(top["w1"] + top["w2"]), sep)
        rep = rep.select(
            *passthrough, F.replace(F.col("rep"), pat, new).alias("rep")
        ).localCheckpoint(eager=True)
    return merges, rep



@register(
    "bpe_multi_merge_rounds",
    oracle=_bpe_oracle(4),
    doc="BPE tokenizer training, k=4 UNROLLED merge rounds — the "
        "actual iterative loop bpe_pair_merge_frequencies (round 1 "
        "only) is the first step of: count adjacent symbol pairs "
        "corpus-wide, adopt the argmax pair (count desc, then "
        "(w1, w2) lexicographic — a total order, so the trajectory is "
        "deterministic on any engine), rewrite every word, repeat. "
        "Words are sep-joined symbol strings (chr(31) guards symbol "
        "boundaries) and a merge is ONE engine-native replace() — "
        "both Spark and DuckDB scan left-to-right without re-matching "
        "into the replacement, which reproduces greedy "
        "non-overlapping BPE application exactly (verified on the "
        "'aaa' overlap case). Spark loop shape: the symbol corpus is "
        "cached and eagerly checkpointed per round (k chained "
        "replaces would otherwise re-execute the whole prefix each "
        "round — O(k²) scans), each round is one pair-explode + "
        "map-side-combined groupBy (shuffle bounded by distinct "
        "pairs, not corpus size) and an O(1) argmax collect — "
        "exactly the model-state-to-driver, data-stays-distributed "
        "split of the GD training loop. Oracle: k unrolled "
        "MATERIALIZED CTE rounds (§2.11 text/training).",
    tags=("llm", "text", "training", "iterative"),
)
def bpe_multi_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _bpe_merge_loop(
        _bpe_symbol_corpus(spark, sf_dir).select("cnt", "rep"), k=4
    )
    return spark.createDataFrame(
        merges, "round int, w1 string, w2 string, merged string, pair_count long"
    ).orderBy("round")


@register(
    "bpe_vocab_compression",
    oracle=_bpe_oracle(4, mode="compression"),
    doc="BPE train→APPLY: after learning the same 4 corpus-wide "
        "merges as bpe_multi_merge_rounds (identical trajectory — "
        "pair counts are source-blind), every word is re-tokenized "
        "with all 4 merges applied and the per-source symbol-count "
        "compression is reported (words, symbols before/after, "
        "after/before ratio) — the measure a tokenizer-training run "
        "actually optimizes. The application pass is k engine-native "
        "replace() projections over the checkpointed symbol corpus "
        "(scan-side, zero extra shuffles beyond the per-round pair "
        "counts); the final rollup is one tiny per-source aggregate. "
        "Oracle: the same unrolled MATERIALIZED chain with source and "
        "initial symbol count as pass-through columns (§2.11 "
        "text/training).",
    tags=("llm", "text", "training", "iterative"),
)
def bpe_vocab_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    rep0 = _bpe_symbol_corpus(spark, sf_dir)
    _, rep = _bpe_merge_loop(rep0, k=4)
    # per-word symbol counts scale back up by the word's instance count
    # (cnt) — integer-exact, so identical to the per-instance rollup
    n_after = F.size(F.filter(F.split("rep", _BPE_SEP), lambda x: x != F.lit("")))
    return rep.groupBy("source").agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.col("n0") * F.col("cnt")).alias("n_symbols_before"),
        F.sum(n_after.cast("long") * F.col("cnt")).alias("n_symbols_after"),
        F.round(
            F.sum(n_after.cast("double") * F.col("cnt"))
            / F.sum(F.col("n0").cast("double") * F.col("cnt")),
            6,
        ).alias("compression"),
    )


@register(
    "domain_cap_retention",
    oracle="""
        WITH ranked AS (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_retained,
               CAST(sum(doc_id) AS BIGINT) AS retained_id_sum,
               CAST(sum(n_chars) AS BIGINT) AS retained_chars
        FROM ranked WHERE rk <= 10 GROUP BY source
    """,
    doc="Per-domain document cap (web-curation staple: bound any one "
        "domain's contribution): keep the 10 docs per source that rank "
        "first by md5(doc_id) — a deterministic, engine-portable "
        "pseudo-random order, so the SAME docs survive on any cluster "
        "size or engine (contrast rand(), which is neither). Skew "
        "safety comes from Catalyst's WindowGroupLimit rewrite "
        "(plan-asserted): rank()+filter≤k compiles to PARTIAL per-"
        "input-partition top-k heaps before the shuffle, so a domain "
        "holding 30% of a 100 TB crawl ships ≤ k rows per map "
        "partition, never its full row set — measured 2.2 s vs 62 s "
        "for a hand-rolled hash-threshold prefilter on a 20M-row "
        "90%-skewed input (PERF.md r3c) (§2.11 sampling).",
    tags=("llm", "sampling"),
)
def domain_cap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_retained"),
            F.sum("doc_id").alias("retained_id_sum"),
            F.sum("n_chars").alias("retained_chars"),
        )
    )


@register(
    "embedding_covariance_gram",
    oracle="""
        WITH pos AS (
            SELECT vec_id, CAST(t.i AS INT) AS i,
                   CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS x
            FROM embeddings, unnest(range(1, 9)) AS t(i)
        )
        SELECT p1.i AS i, p2.i AS j,
               round(covar_samp(p1.x, p2.x) * 1000, 6) AS cov_k
        FROM pos p1 JOIN pos p2 USING (vec_id)
        WHERE p1.i <= p2.i
        GROUP BY p1.i, p2.i
    """,
    doc="Distributed covariance via one-pass Gram partials: each "
        "partition computes its XᵀX + column sums with a single numpy "
        "matmul (Arrow-batched map-side combine), one groupBy merges "
        "O(partitions · d²) tiny rows — nothing proportional to N ever "
        "shuffles or hits the driver, the exact shape corr/covar use "
        "internally generalized to all pairs at once. Output here is "
        "the 8×8 leading block (36 upper-triangle pairs, ×1000, 6dp) "
        "checked against DuckDB's covar_samp; the full 64×64 feeds the "
        "driver-side power-iteration eigensolver (O(d²), N-independent) "
        "pinned against numpy in pytest (§2.11 embeddings).",
    tags=("llm", "similarity", "stats"),
)
def embedding_covariance_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import linalg as LA

    emb = _t(spark, sf_dir, "embeddings")
    cov = LA.covariance_pairs(emb, "embedding", d=64)
    return cov.filter((F.col("i") <= 8) & (F.col("j") <= 8)).select(
        "i", "j", F.round(F.col("cov") * 1000, 6).alias("cov_k")
    )


@register(
    "pca_top_component_projection",
    oracle="""
        WITH RECURSIVE flat AS (
            SELECT vec_id, u.i AS i, u.x AS x
            FROM (SELECT vec_id, unnest(embedding) AS x,
                         generate_subscripts(embedding, 1) AS i
                  FROM embeddings) u(vec_id, x, i)
        ), mu AS (
            SELECT i, avg(x) AS m FROM flat GROUP BY i
        ), cent AS MATERIALIZED (
            SELECT f.vec_id, f.i, f.x - mu.m AS x
            FROM flat f JOIN mu USING (i)
        ), cov AS MATERIALIZED (
            SELECT a.i AS i, b.i AS j, sum(a.x * b.x) / (max(cnt.n) - 1) AS c
            FROM cent a JOIN cent b USING (vec_id)
            CROSS JOIN (SELECT count(*) AS n FROM embeddings) cnt
            GROUP BY a.i, b.i
        ), pi AS (
            -- deterministic power iteration, identical to the engine's
            -- driver-side loop: v0 = 1/sqrt(d), 200 matvec+normalize steps
            SELECT 0 AS it, i.i AS i, 1.0 / sqrt(64) AS v
            FROM (SELECT DISTINCT i FROM mu) i
            UNION ALL
            SELECT it + 1, i, w / sqrt(sum(w * w) OVER ()) AS v
            FROM (
                SELECT p.it AS it, cov.i AS i, sum(cov.c * p.v) AS w
                FROM pi p JOIN cov ON cov.j = p.i
                WHERE p.it < 200
                GROUP BY p.it, cov.i
            )
        ), vfin AS (
            SELECT i, v FROM pi WHERE it = 200
        ), sgn AS (
            -- engine's sign convention: first nonzero component positive
            SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s
            FROM vfin WHERE abs(v) > 1e-12 ORDER BY i LIMIT 1
        ), proj AS (
            SELECT c.vec_id, sum(c.x * vf.v) AS p
            FROM cent c JOIN vfin vf ON vf.i = c.i
            GROUP BY c.vec_id
        )
        SELECT e.vec_id, e.label, round(p.p * sgn.s, 6) AS pc1
        FROM proj p JOIN embeddings e USING (vec_id) CROSS JOIN sgn
    """,
    doc="Distributed PCA, end to end: the covariance matrix reduces "
        "across the cluster as one-pass Gram partials (O(partitions·d²) "
        "shuffle rows, nothing proportional to N — see "
        "embedding_covariance_gram), the d×d result collects to the "
        "driver (2080 rows, N-independent), 200 deterministic power-"
        "iteration steps extract the top eigenvector (O(d²) flops, "
        "driver-local — data-sized work distributed, model-sized work "
        "local), and the component + mean vectors re-enter the plan as "
        "ARRAY LITERALS for a scan-side centered projection (zip_with/"
        "aggregate HOFs, no shuffle, no Python — the broadcast-model-"
        "apply pattern). The iterate after a FIXED 200 steps is a pure "
        "function of the covariance matrix even where the eigengap is "
        "small, so the oracle — covariance by centered self-join, the "
        "SAME 200 matvec+normalize steps as a recursive CTE, the same "
        "first-nonzero-positive sign convention — must reproduce every "
        "per-row projection to 6dp. Embedding-space decorrelation / "
        "whitening is a standard curation preprocessing step (SemDeDup "
        "and friends operate in this space) (§2.11 embeddings/training).",
    tags=("llm", "similarity", "training"),
)
def pca_top_component_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pca_projection_over(_t(spark, sf_dir, "embeddings"))


def pca_projection_over(emb: DataFrame) -> DataFrame:
    """pca_top_component_projection's full pipeline over an arbitrary
    (vec_id, embedding, label) frame — shared with
    tools/scale_check_r5b.py so the scale proof measures exactly what
    the registered query runs."""
    from ..operators import linalg as LA

    cov = LA.covariance_pairs(emb, "embedding", d=64)
    # bounded collect: d(d+1)/2 = 2080 rows regardless of N
    rows = [r.asDict() for r in cov.collect()]
    _, v = LA.power_iteration_top_eig(rows, d=64, iters=200)
    mu = [0.0] * 64
    for r in rows:
        if r["i"] == r["j"]:
            mu[r["i"] - 1] = float(r["mean_i"])
    proj = LA.project_expr("embedding", mu, [float(x) for x in v])
    return emb.select("vec_id", "label", F.round(proj, 6).alias("pc1"))


@register(
    "pca_whitening_top2",
    oracle="""
        WITH RECURSIVE flat AS (
            SELECT vec_id, u.i AS i, u.x AS x
            FROM (SELECT vec_id, unnest(embedding) AS x,
                         generate_subscripts(embedding, 1) AS i
                  FROM embeddings) u(vec_id, x, i)
        ), mu AS (
            SELECT i, avg(x) AS m FROM flat GROUP BY i
        ), cent AS MATERIALIZED (
            SELECT f.vec_id, f.i, f.x - mu.m AS x
            FROM flat f JOIN mu USING (i)
        ), cov AS MATERIALIZED (
            SELECT a.i AS i, b.i AS j, sum(a.x * b.x) / (max(cnt.n) - 1) AS c
            FROM cent a JOIN cent b USING (vec_id)
            CROSS JOIN (SELECT count(*) AS n FROM embeddings) cnt
            GROUP BY a.i, b.i
        ), pi AS (
            SELECT 0 AS it, i.i AS i, 1.0 / sqrt(64) AS v
            FROM (SELECT DISTINCT i FROM mu) i
            UNION ALL
            SELECT it + 1, i, w / sqrt(sum(w * w) OVER ()) AS v
            FROM (
                SELECT p.it AS it, cov.i AS i, sum(cov.c * p.v) AS w
                FROM pi p JOIN cov ON cov.j = p.i
                WHERE p.it < 200
                GROUP BY p.it, cov.i
            )
        ), v1 AS MATERIALIZED (
            SELECT i, v FROM pi WHERE it = 200
        ), lam1 AS (
            -- Rayleigh BEFORE the sign fix (deflation is sign-invariant),
            -- exactly like power_iteration_components
            SELECT sum(va.v * c.c * vb.v) AS l
            FROM cov c JOIN v1 va ON va.i = c.i JOIN v1 vb ON vb.i = c.j
        ), cov2 AS MATERIALIZED (
            -- Hotelling deflation: C2 = C - lam1 * v1 v1^T
            SELECT c.i AS i, c.j AS j, c.c - lam1.l * va.v * vb.v AS c
            FROM cov c JOIN v1 va ON va.i = c.i JOIN v1 vb ON vb.i = c.j
            CROSS JOIN lam1
        ), pi2 AS (
            SELECT 0 AS it, i.i AS i, 1.0 / sqrt(64) AS v
            FROM (SELECT DISTINCT i FROM mu) i
            UNION ALL
            SELECT it + 1, i, w / sqrt(sum(w * w) OVER ()) AS v
            FROM (
                SELECT p.it AS it, cov2.i AS i, sum(cov2.c * p.v) AS w
                FROM pi2 p JOIN cov2 ON cov2.j = p.i
                WHERE p.it < 200
                GROUP BY p.it, cov2.i
            )
        ), v2 AS MATERIALIZED (
            SELECT i, v FROM pi2 WHERE it = 200
        ), lam2 AS (
            SELECT sum(va.v * c.c * vb.v) AS l
            FROM cov2 c JOIN v2 va ON va.i = c.i JOIN v2 vb ON vb.i = c.j
        ), sgn1 AS (
            SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s
            FROM v1 WHERE abs(v) > 1e-12 ORDER BY i LIMIT 1
        ), sgn2 AS (
            SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s
            FROM v2 WHERE abs(v) > 1e-12 ORDER BY i LIMIT 1
        ), tr AS (
            SELECT sum(c) AS t FROM cov WHERE i = j
        ), p1 AS (
            SELECT c.vec_id, sum(c.x * v.v) AS p
            FROM cent c JOIN v1 v ON v.i = c.i GROUP BY c.vec_id
        ), p2 AS (
            SELECT c.vec_id, sum(c.x * v.v) AS p
            FROM cent c JOIN v2 v ON v.i = c.i GROUP BY c.vec_id
        )
        SELECT e.vec_id, e.label,
               round(p1.p * sgn1.s / sqrt(lam1.l), 6) AS z1,
               round(p2.p * sgn2.s / sqrt(lam2.l), 6) AS z2,
               round(lam1.l / tr.t, 6) AS evr1,
               round(lam2.l / tr.t, 6) AS evr2
        FROM p1 JOIN p2 USING (vec_id) JOIN embeddings e USING (vec_id)
        CROSS JOIN sgn1 CROSS JOIN sgn2
        CROSS JOIN lam1 CROSS JOIN lam2 CROSS JOIN tr
    """,
    doc="PCA WHITENING to the top-2 subspace — the decorrelate-and-"
        "rescale preprocessing SemDeDup-style embedding curation "
        "assumes: same one-pass Gram reduce as "
        "pca_top_component_projection (d²-row shuffle independent of "
        "N, O(k·d²) driver eigensolve), extended to a SECOND component "
        "by Hotelling deflation (C2 = C − λ1·v1v1ᵀ, sign-invariant "
        "Rayleigh λ taken before the sign pin) and another fixed-200-"
        "step power iteration. Both components + the mean re-enter "
        "the plan as array literals; each whitened coordinate zj = "
        "(x−μ)·vj / √λj is a shuffle-free pinned HOF fold over the "
        "scan, and the explained-variance ratios λj/tr(C) ride along "
        "as literals. A fixed iteration count is a pure function of "
        "the covariance (ulp noise decays toward the same fixpoint), "
        "so the oracle — the SAME deflation and second recursive-CTE "
        "power iteration — must reproduce every 6dp coordinate "
        "(§2.11 embeddings/training).",
    tags=("llm", "embeddings", "training"),
)
def pca_whitening_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators import linalg as LA

    emb = _t(spark, sf_dir, "embeddings")
    cov = LA.covariance_pairs(emb, "embedding", d=64)
    rows = [r.asDict() for r in cov.collect()]  # bounded: d(d+1)/2 rows
    (l1, v1), (l2, v2) = LA.power_iteration_components(
        rows, d=64, n_components=2, iters=200
    )
    diag = {r["i"]: (float(r["cov"]), float(r["mean_i"]))
            for r in rows if r["i"] == r["j"]}
    # index-ordered driver sum: deterministic across runs/partitionings
    trace = sum(c for _, (c, _) in sorted(diag.items()))
    mu = [diag[i + 1][1] for i in range(64)]
    z1 = LA.project_expr("embedding", mu, [float(x) for x in v1]) / math.sqrt(l1)
    z2 = LA.project_expr("embedding", mu, [float(x) for x in v2]) / math.sqrt(l2)
    return emb.select(
        "vec_id", "label",
        F.round(z1, 6).alias("z1"),
        F.round(z2, 6).alias("z2"),
        F.round(F.lit(l1 / trace), 6).alias("evr1"),
        F.round(F.lit(l2 / trace), 6).alias("evr2"),
    )


@register(
    "text_normalized_dedup",
    oracle="""
        WITH perturbed AS (
            SELECT doc_id,
                   CASE doc_id % 3
                       WHEN 0 THEN upper(text)
                       WHEN 1 THEN text || '  !!! '
                       ELSE regexp_replace(text, ' ', '   ', 'g')
                   END AS ptext
            FROM documents
        ), normed AS (
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(lower(ptext),
                        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
            FROM perturbed
        )
        SELECT min(doc_id) AS rep_doc_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(length(min_by(norm, doc_id)) AS BIGINT) AS norm_len
        FROM normed GROUP BY norm
    """,
    doc="Normalization-based dedup (ccnet-style): documents are first "
        "deterministically perturbed (upper-cased / punctuation "
        "appended / whitespace doubled, by id % 3), then normalized "
        "(lowercase, strip non-alphanumerics, collapse whitespace) and "
        "grouped on the normalized form. Because normalization exactly "
        "inverts every planted perturbation, groups equal the raw-text "
        "duplicate groups — and the oracle re-derives that through "
        "DuckDB's regex engine, differentially testing regexp_replace "
        "semantics (global flag, class syntax) across engines. Scan-"
        "side only; one shuffle on the normalized key (§2.11 dedup).",
    tags=("llm", "dedup", "text"),
)
def text_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ptext = (
        F.when(F.col("doc_id") % 3 == 0, F.upper("text"))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.col("text"), F.lit("  !!! ")))
        .otherwise(F.regexp_replace("text", " ", "   "))
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(ptext), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return (
        docs.select("doc_id", norm.alias("norm"))
        .groupBy("norm")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count("*").alias("n_docs"),
            F.length(F.min_by("norm", "doc_id")).cast("long").alias("norm_len"),
        )
        .select("rep_doc_id", "n_docs", "norm_len")
    )


@register(
    "weighted_sample_aes",
    oracle="""
        WITH keyed AS (
            SELECT source, doc_id, n_chars,
                   -ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                             || 'aes'), 1, 13) AS UBIGINT) + 1.0)
                       / 4503599627370496.0)
                   / CAST(n_chars AS DOUBLE) AS aes_key
            FROM documents
        ), ranked AS (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY source ORDER BY aes_key, doc_id
                   ) AS rk
            FROM keyed
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_sampled,
               CAST(sum(doc_id) AS BIGINT) AS sampled_id_sum,
               CAST(sum(n_chars) AS BIGINT) AS sampled_chars
        FROM ranked WHERE rk <= 8 GROUP BY source
    """,
    doc="Weighted sampling WITHOUT replacement (Efraimidis–Spirakis "
        "A-ES), 8 docs per source with inclusion probability ∝ n_chars: "
        "rank by -ln(u)/w where u is an md5-derived 52-bit uniform — "
        "exactly representable as a double, so u is bit-identical "
        "across engines and the sample is reproducible on any run, "
        "engine, or cluster size (rand()-based weighted sampling is "
        "none of those). The oracle recomputes the identical keys in "
        "DuckDB — a differential test of the whole chain (md5, hex "
        "parse, ln, division, window rank). One shuffle on the group "
        "key (§2.11 sampling).",
    tags=("llm", "sampling"),
)
def weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_sample_per_group

    docs = _t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    picked = weighted_sample_per_group(
        docs, "source", "doc_id", "n_chars", k=8, salt="aes"
    )
    return picked.groupBy("source").agg(
        F.count("*").alias("n_sampled"),
        F.sum("doc_id").alias("sampled_id_sum"),
        F.sum("n_chars").alias("sampled_chars"),
    )


@register(
    "iqr_outlier_length_filter",
    oracle="""
        WITH q AS (
            SELECT source,
                   quantile_cont(n_chars, 0.25) AS q1,
                   quantile_cont(n_chars, 0.75) AS q3
            FROM documents GROUP BY source
        )
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN d.n_chars >= q.q1 - 1.5 * (q.q3 - q.q1)
                              AND d.n_chars <= q.q3 + 1.5 * (q.q3 - q.q1)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
               round(q.q1, 6) AS q1, round(q.q3, 6) AS q3
        FROM documents d JOIN q ON q.source = d.source
        GROUP BY d.source, q.q1, q.q3
    """,
    doc="IQR outlier filter (curation staple: drop length outliers "
        "before training): exact interpolated quartiles of n_chars per "
        "source, Tukey fences at 1.5·IQR, per-source retention counts. "
        "Spark's percentile() and DuckDB's quantile_cont share the "
        "linear-interpolation definition, so the fences match exactly. "
        "Per-source aggregation then a broadcast-sized fence join — "
        "the quartile state is one row per source, never "
        "row-proportional. Scale note: exact percentile() keeps a "
        "per-group value-frequency map (fine for bounded-domain ints "
        "like n_chars); for unbounded-domain columns at 100 TB swap in "
        "approx_percentile(·, ·, accuracy) — same query shape, "
        "constant-size sketch state (§2.11 quality filtering).",
    tags=("llm", "quality"),
)
def iqr_outlier_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("source", "n_chars")
    q = docs.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.25)").alias("q1"),
        F.expr("percentile(n_chars, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo, hi = F.col("q1") - 1.5 * iqr, F.col("q3") + 1.5 * iqr
    joined = docs.join(q, "source")
    return joined.groupBy("source", "q1", "q3").agg(
        F.count("*").alias("n_total"),
        F.sum(
            F.when((F.col("n_chars") >= lo) & (F.col("n_chars") <= hi), 1)
            .otherwise(0)
        ).alias("n_retained"),
    ).select(
        "source", "n_total", "n_retained",
        F.round("q1", 6).alias("q1"), F.round("q3", 6).alias("q3"),
    )


@register(
    "token_entropy_quality",
    oracle="""
        WITH toks AS (
            SELECT doc_id, t.tok AS tok
            FROM documents,
                 unnest(list_filter(string_split(text, ' '),
                                    x -> x != '')) AS t(tok)
        ), counts AS (
            SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
        ), totals AS (
            SELECT doc_id, sum(c) AS n, count(*) AS n_distinct FROM counts
            GROUP BY doc_id
        )
        SELECT c.doc_id AS doc_id,
               CAST(t.n AS BIGINT) AS n_tokens,
               CAST(t.n_distinct AS BIGINT) AS n_distinct,
               round(-sum((c.c / CAST(t.n AS DOUBLE))
                          * ln(c.c / CAST(t.n AS DOUBLE))), 6) AS token_entropy
        FROM counts c JOIN totals t ON t.doc_id = c.doc_id
        GROUP BY c.doc_id, t.n, t.n_distinct
    """,
    doc="Token-level Shannon entropy per document — the information-"
        "theoretic repetition signal (low entropy ⇒ boilerplate/spam; "
        "complements the Gopher repetition ratios): explode → per-"
        "(doc, token) counts → -Σ p·ln p. All Catalyst (two partial-agg "
        "groupBys keyed by doc_id — entropy state never leaves the "
        "doc's partition chain); ln() cross-engine ulp noise is absorbed "
        "by 6dp rounding on an O(1)-magnitude result (§2.11 quality).",
    tags=("llm", "quality", "text"),
)
def token_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(TS.tokens("text")).alias("tok"))
    counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    totals = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count("*").alias("n_distinct")
    )
    p = F.col("c") / F.col("n").cast("double")
    return (
        counts.join(totals, "doc_id")
        .groupBy("doc_id", "n", "n_distinct")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("token_entropy"))
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            "n_distinct",
            "token_entropy",
        )
    )


@register(
    "udtf_word_bigrams",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x != '') AS toks
            FROM documents
        ), b AS (
            SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram
            FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        )
        SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        FROM b GROUP BY bigram
        ORDER BY n DESC, bigram LIMIT 40
    """,
    doc="Python UDTF surface (§2.10, Spark 4): a lateral table function "
        "expanding each document into word bigrams, consumed via "
        "`FROM docs, LATERAL word_bigrams(text)` and re-aggregated to "
        "the top-40 corpus bigrams (total order: count desc, bigram "
        "asc). This query exists to exercise the UDTF API path — "
        "per-row Python expansion is the engine's SLOW path, and the "
        "equivalent Catalyst form (explode over arrays_zip/slice, used "
        "by token_stats_top_terms and the shingle pipelines) is what "
        "the hot paths use; the oracle proves the UDTF emits exactly "
        "the declarative result. Top-40 executes as "
        "TakeOrderedAndProject over the grouped counts.",
    tags=("llm", "text", "udtf"),
)
def udtf_word_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram string")
    class WordBigrams:
        def eval(self, text):
            if text is None:
                return
            toks = [t for t in text.split(" ") if t]
            for i in range(len(toks) - 1):
                yield (toks[i] + " " + toks[i + 1],)

    spark.udtf.register("word_bigrams", WordBigrams)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs_v")
    return spark.sql("""
        SELECT b.bigram, count(*) AS n, count(DISTINCT d.doc_id) AS n_docs
        FROM udtf_docs_v d, LATERAL word_bigrams(d.text) b
        GROUP BY b.bigram ORDER BY n DESC, b.bigram LIMIT 40
    """)


@register(
    "temperature_resampled_mixture",
    oracle="""
        WITH per_src AS (
            SELECT source, count(*) AS n_docs FROM documents GROUP BY source
        ), tot AS (
            SELECT CAST(sum(n_docs) AS BIGINT) AS total,
                   sum(sqrt(CAST(n_docs AS DOUBLE))) AS z
            FROM per_src
        ), w AS (
            SELECT source, n_docs,
                   sqrt(CAST(n_docs AS DOUBLE)) / z AS p,
                   least(1.0, (sqrt(CAST(n_docs AS DOUBLE)) / z)
                              * CAST(total AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS keep_rate
            FROM per_src, tot
        ), kept AS (
            SELECT d.source, count(*) AS n_kept
            FROM documents d JOIN w ON w.source = d.source
            WHERE (CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || 'temp'), 1, 13)
                        AS UBIGINT) + 1) / 4503599627370496.0 <= w.keep_rate
            GROUP BY d.source
        )
        SELECT w.source AS source, w.n_docs AS n_docs,
               round(w.p, 6) AS sample_prob,
               round(w.keep_rate, 6) AS keep_rate,
               coalesce(kept.n_kept, 0) AS n_kept
        FROM w LEFT JOIN kept ON kept.source = w.source
    """,
    doc="Temperature-based mixture resampling (the multinomial "
        "alpha-smoothing used to rebalance training mixtures, alpha = "
        "0.5): per-source sampling probability p_s proportional to "
        "sqrt(n_s), per-document keep rate min(1, p_s*N/n_s), and the "
        "realized kept count under the engine's deterministic "
        "md5-uniform (same u = (52-bit md5 prefix + 1)/2^52 convention "
        "as the split/sampling family — bit-identical on any engine, "
        "unlike rand(seed)). Head sources thin (keep < 1), tail "
        "sources report the >1 repeat factor capped at 1 for the "
        "without-replacement pass. One partial agg per source + a "
        "1-row broadcast + a scan-side filter: no wide shuffle at any "
        "corpus size (§2.11 sampling/curation).",
    tags=("llm", "sampling", "curation"),
)
def temperature_resampled_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import md5_uniform

    docs = _t(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = per_src.agg(
        F.sum("n_docs").cast("bigint").alias("total"),
        F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("z"),
    )
    p = F.sqrt(F.col("n_docs").cast("double")) / F.col("z")
    w = per_src.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", p.alias("p"),
        F.least(
            F.lit(1.0),
            p * F.col("total").cast("double") / F.col("n_docs").cast("double"),
        ).alias("keep_rate"),
    )
    kept = (
        docs.join(F.broadcast(w), "source")
        .filter(md5_uniform("doc_id", "temp") <= F.col("keep_rate"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        w.join(kept, "source", "left")
        .select(
            "source", "n_docs",
            F.round("p", 6).alias("sample_prob"),
            F.round("keep_rate", 6).alias("keep_rate"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


@register(
    "knn_label_classification",
    oracle="""
        WITH q AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec,
                   label AS true_label
            FROM embeddings WHERE vec_id < 20
        ), scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
                   list_dot_product(q.qvec, e.embedding::DOUBLE[]) /
                   (sqrt(list_dot_product(q.qvec, q.qvec)) *
                    sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS raw_sim
            FROM q, embeddings e
            WHERE e.vec_id != q.query_id
        ), topk AS (
            SELECT query_id, neighbor_id, label FROM (
                SELECT query_id, neighbor_id, label,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY raw_sim DESC, neighbor_id) AS rank
                FROM scored
            ) WHERE rank <= 10
        ), votes AS (
            SELECT query_id, label, count(*) AS c
            FROM topk GROUP BY query_id, label
        ), best AS (
            SELECT query_id, label AS predicted_label, c,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY c DESC, label) AS rn
            FROM votes
        )
        SELECT b.query_id, b.predicted_label,
               CAST(b.c AS BIGINT) AS vote_count,
               q.true_label,
               (b.predicted_label = q.true_label) AS correct
        FROM best b JOIN q ON q.query_id = b.query_id
        WHERE b.rn = 1
    """,
    doc="kNN label classification — the similarity-search family "
        "applied to an actual task: each of 20 query vectors is "
        "classified by majority label among its 10 nearest cosine "
        "neighbors (self excluded; ties break count-desc then "
        "label-asc, a total order). Reuses the exact cosine top-k "
        "operator (broadcast queries, HOF dot products in double — "
        "bit-identical to DuckDB's list_dot_product fold, the same "
        "determinism argument as cosine_topk_exact) plus one small "
        "label join and a per-query vote aggregation over k·|Q| rows. "
        "At scale the brute-force scorer swaps for the IVF/LSH "
        "variants with identical downstream voting (§2.11 "
        "similarity).",
    tags=("llm", "similarity", "classification"),
)
def knn_label_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    topk = S.cosine_topk(emb, queries, k=10)
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    votes = (
        topk.join(labels, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("c"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("label"))
    best = votes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    truth = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return best.join(truth, "query_id").select(
        "query_id",
        F.col("label").alias("predicted_label"),
        F.col("c").cast("bigint").alias("vote_count"),
        "true_label",
        (F.col("label") == F.col("true_label")).alias("correct"),
    )


@register(
    "bigram_lm_logprob_quality",
    oracle="""
        WITH t AS (
            SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
            FROM documents
        ), bigrams AS (
            SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
            FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        ), bg AS (
            SELECT w1, w2, count(*) AS c2 FROM bigrams GROUP BY w1, w2
        ), ug AS (
            SELECT w1, count(*) AS c1 FROM bigrams GROUP BY w1
        ), vocab AS (
            SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM (
                SELECT unnest(toks) AS tok FROM t
            )
        )
        SELECT b.doc_id,
               count(*) AS n_bigrams,
               round(avg(ln((CAST(bg.c2 AS DOUBLE) + 0.5)
                            / (CAST(ug.c1 AS DOUBLE) + 0.5 * vocab.v))), 6)
                   AS avg_bigram_logprob
        FROM bigrams b
        JOIN bg ON bg.w1 = b.w1 AND bg.w2 = b.w2
        JOIN ug ON ug.w1 = b.w1, vocab
        GROUP BY b.doc_id
    """,
    doc="Bigram language-model quality score — the next step up from "
        "the unigram perplexity proxy: per-document mean "
        "ln P(w_i | w_(i-1)) under add-0.5-smoothed corpus bigram "
        "statistics (alpha-smoothing over the corpus vocabulary V, so "
        "unseen continuations are well-defined). Sequential structure "
        "is what unigram scoring cannot see: shuffled word salad "
        "scores near the unigram bound while natural n-gram order "
        "scores higher. Scale shape: bigram expansion via zipped "
        "array slices (Catalyst HOFs, no UDF), dictionary-sized "
        "bigram/unigram count tables joined back on the bigram key — "
        "shuffles carry (w1, w2) pairs and counts, never documents; "
        "one partial agg per doc. ln() ulp noise absorbed by 6dp "
        "rounding on an O(10) result, same argument as "
        "token_entropy_quality (§2.11 quality).",
    tags=("llm", "text", "quality"),
)
def bigram_lm_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TS.tokens("text").alias("toks"))
    n = F.size("toks")
    bigrams = (
        toks.filter(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n - 1).alias("w1"),
                    F.slice("toks", 2, n - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    bg = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    ug = bigrams.groupBy(F.col("w1").alias("u_w1")).agg(F.count("*").alias("c1"))
    vocab = float(
        toks.select(F.explode("toks").alias("tok")).select("tok").distinct().count()
    )
    lp = F.log(
        (F.col("c2").cast("double") + F.lit(0.5))
        / (F.col("c1").cast("double") + F.lit(0.5) * F.lit(vocab))
    )
    return (
        bigrams.join(bg, ["w1", "w2"])
        .join(ug, bigrams["w1"] == F.col("u_w1"))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_bigram_logprob"),
        )
    )


@register(
    "embedding_centroids_by_label",
    oracle="""
        WITH t AS (
            SELECT label, embedding FROM embeddings
        ), unnested AS (
            SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
            FROM t, unnest(generate_series(1, len(embedding))) AS u(i)
        )
        SELECT label, CAST(pos AS INT) AS pos,
               count(*) AS n_vecs,
               round(avg(val), 6) AS centroid_val
        FROM unnested GROUP BY label, pos
    """,
    doc="Distributed per-label centroids (class prototypes / cluster "
        "means over an embedding column) in LONG form: explode each "
        "vector to (label, position, value) and average per (label, "
        "position). This is the scale-correct shape for element-wise "
        "vector aggregation — a collect_list-then-average form would "
        "ship whole vectors to one reducer per label; the explode form "
        "partial-aggregates every (label, pos) cell map-side and "
        "shuffles only |labels|·d running sums. Long output also "
        "sidesteps array-ordering hash hazards. posexplode is "
        "shifted to 1-based to match the SQL side's array indexing "
        "(§2.11 embeddings).",
    tags=("llm", "embeddings", "aggregate"),
)
def embedding_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    cells = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "val")
    ).select(
        "label",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.col("val").cast("double").alias("val"),
    )
    return cells.groupBy("label", "pos").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg("val"), 6).alias("centroid_val"),
    )


@register(
    "hard_negative_mining",
    oracle="""
        WITH q AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec,
                   label AS true_label
            FROM embeddings WHERE vec_id < 20
        ), scored AS (
            SELECT q.query_id, q.true_label, e.vec_id AS neighbor_id,
                   e.label AS neighbor_label,
                   list_dot_product(q.qvec, e.embedding::DOUBLE[]) /
                   (sqrt(list_dot_product(q.qvec, q.qvec)) *
                    sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS raw_sim
            FROM q, embeddings e
            WHERE e.vec_id != q.query_id AND e.label != q.true_label
        )
        SELECT query_id, true_label, neighbor_id AS hard_negative_id,
               neighbor_label AS negative_label,
               round(raw_sim, 6) AS sim, rank
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY raw_sim DESC, neighbor_id) AS rank
            FROM scored
        ) WHERE rank <= 3
    """,
    doc="Hard-negative mining — the contrastive-training data op: for "
        "each query vector, the top-3 most-similar vectors with a "
        "DIFFERENT label (the negatives most likely to confuse a "
        "model, the ones worth training on). Same exact-cosine scorer "
        "and determinism argument as cosine_topk_exact (double HOF dot "
        "products, bit-identical to DuckDB's list_dot_product fold), "
        "with the label-mismatch predicate pushed into the scoring "
        "pass so same-label pairs are never ranked. At scale the "
        "scorer swaps for the IVF/LSH variants; the mining projection "
        "is identical (§2.11 similarity/curation).",
    tags=("llm", "similarity", "curation"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("true_label"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("qvec").cast("array<double>"),
            F.col("embedding").cast("array<double>"),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(F.col(c).cast("array<double>"), lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("true_label"))
        )
        .select(
            "query_id", "true_label",
            F.col("vec_id").alias("hard_negative_id"),
            F.col("label").alias("negative_label"),
            (dot / (norm("qvec") * norm("embedding"))).alias("raw_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_sim").desc(), F.col("hard_negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id", "true_label", "hard_negative_id", "negative_label",
            F.round("raw_sim", 6).alias("sim"), "rank",
        )
    )


# ---------------------------------------------------------------------------
# Wave 5: CCNet-style segment dedup, BM25 retrieval, SymSpell linkage,
# broadcast-model batch inference
# ---------------------------------------------------------------------------

_CCNET_HEADER = "shared header line for every document in corpus "


@register(
    "exact_substring_dedup",
    oracle="""
        WITH tn AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x != '') AS toks,
                   CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                        AS BIGINT) AS n
            FROM documents
        ), pos AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   array_to_string(toks[CAST(i AS INT):CAST(i + 14 AS INT)],
                                   ' ') AS gram
            FROM tn, unnest(generate_series(1, n - 14)) u(i)
            WHERE n >= 15
        ), pr AS (
            -- canonical occurrence = lexicographic-min (doc_id, pos),
            -- stated as rank 1 under ORDER BY (doc_id, pos) — mirrors
            -- the engine's min(struct(doc, pos)) exactly
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY gram
                                      ORDER BY doc_id, pos) AS rn,
                   count(*) OVER (PARTITION BY gram) AS n_occ
            FROM pos
        ), flagged AS (
            SELECT doc_id, pos FROM pr WHERE n_occ > 1 AND rn > 1
        ), covered AS (
            SELECT DISTINCT doc_id, CAST(j AS BIGINT) AS i
            FROM flagged, unnest(generate_series(pos, pos + 14)) v(j)
        ), cov_stats AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_excised,
                   CAST(sum(new_span) AS BIGINT) AS n_spans
            FROM (
                SELECT doc_id, i,
                       CASE WHEN i - lag(i) OVER (PARTITION BY doc_id
                                                  ORDER BY i) = 1
                            THEN 0 ELSE 1 END AS new_span
                FROM covered
            ) GROUP BY doc_id
        ), tok_idx AS (
            SELECT doc_id, CAST(i AS BIGINT) AS i, toks[CAST(i AS INT)] AS tok
            FROM tn, unnest(generate_series(1, n)) u(i)
        ), kept AS (
            SELECT ti.doc_id, ti.i, ti.tok
            FROM tok_idx ti ANTI JOIN covered c
              ON ti.doc_id = c.doc_id AND ti.i = c.i
        ), kd AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                   md5(string_agg(tok, ' ' ORDER BY i)) AS kept_md5
            FROM kept GROUP BY doc_id
        )
        SELECT tn.doc_id, tn.n AS n_tokens,
               coalesce(cs.n_excised, 0) AS n_excised,
               coalesce(cs.n_spans, 0) AS n_spans,
               coalesce(kd.n_kept, 0) AS n_kept,
               coalesce(kd.kept_md5, md5('')) AS kept_md5
        FROM tn
        LEFT JOIN cov_stats cs USING (doc_id)
        LEFT JOIN kd USING (doc_id)
    """,
    doc="Exact substring-level dedup (ExactSubstr, Lee et al. ACL "
        "2022) at L=15 tokens: every position starting a 15-gram that "
        "occurs elsewhere in the corpus is excised unless it is the "
        "gram's canonical (minimum (doc,pos)) occurrence; overlapping "
        "excisions merge into maximal spans. Per doc: token count, "
        "excised-token count, merged-span count, and the md5 of the "
        "document reassembled WITHOUT the excised tokens — a "
        "closed-form receipt that the span union, not just counts, is "
        "identical cross-engine. The union of duplicated-15-gram "
        "spans equals the union of maximal repeated substrings >= 15 "
        "tokens (every long repeat is a chain of repeated 15-grams), "
        "which is why the fixed-L gram table reproduces the paper's "
        "suffix-array semantics without a distributed suffix sort. "
        "Spark plan: per-token fold hash once + per-position "
        "polynomial combine (cdc_chunks' measured device), "
        "hash-frequency PREFILTER (superset — the small modulus "
        "collides at scale by design), then exact gram-string verify "
        "on candidates only; the oracle states the one-phase exact "
        "semantics, proving the prefilter lossless. All shuffles "
        "linear in token count (§2.11 dedup; "
        "operators/dedup.py::repeated_substring_excision).",
    tags=("llm", "dedup", "text"),
)
def exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.repeated_substring_excision(docs, min_len=15)


@register(
    "gram_contamination_traintest",
    oracle="""
        WITH tn AS (
            SELECT doc_id, (doc_id % 20 = 0) AS t,
                   list_filter(string_split(text, ' '), x -> x != '') AS toks,
                   CAST(len(list_filter(string_split(text, ' '),
                                        x -> x != '')) AS BIGINT) AS n
            FROM documents
        ), pos AS (
            SELECT doc_id, t, CAST(i AS BIGINT) AS pos,
                   array_to_string(toks[CAST(i AS INT):CAST(i + 9 AS INT)],
                                   ' ') AS gram
            FROM tn, unnest(generate_series(1, n - 9)) u(i)
            WHERE n >= 10
        ), tg AS (
            SELECT gram, count(DISTINCT doc_id) AS n_train_docs
            FROM pos WHERE NOT t GROUP BY gram
        ), hits AS (
            SELECT p.doc_id, p.gram, tg.n_train_docs
            FROM pos p JOIN tg USING (gram) WHERE p.t
        ), pd AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_contaminated_positions,
                   CAST(count(DISTINCT gram) AS BIGINT)
                       AS n_distinct_contaminated_grams,
                   CAST(max(n_train_docs) AS BIGINT) AS max_train_docs_per_gram
            FROM hits GROUP BY doc_id
        )
        SELECT tn.doc_id, tn.n AS n_tokens,
               coalesce(pd.n_contaminated_positions, 0)
                   AS n_contaminated_positions,
               coalesce(pd.n_distinct_contaminated_grams, 0)
                   AS n_distinct_contaminated_grams,
               coalesce(pd.max_train_docs_per_gram, 0)
                   AS max_train_docs_per_gram,
               coalesce(pd.n_contaminated_positions, 0) > 0 AS contaminated
        FROM tn LEFT JOIN pd USING (doc_id) WHERE tn.t
    """,
    doc="Substring-level train/test contamination audit at L=10 "
        "tokens (deterministic 5% holdout: doc_id % 20 = 0): for each "
        "test document, the positions whose 10-gram also occurs in "
        "ANY train document, the distinct leaked grams, and the "
        "widest train-side spread — the n-gram decontamination check "
        "run before every serious eval (GPT-3/PaLM-style audits; Lee "
        "et al. ACL'22 §6.2). Reuses the ExactSubstr machinery: "
        "scan-side gram hashing, a both-sides hash prefilter "
        "(superset, never trusted), exact gram-string verify on the "
        "candidate set only, then test positions join per-gram train "
        "document counts. The oracle states the one-phase exact "
        "cross-side semantics, proving the prefilter lossless (§2.11 "
        "dedup/curation; operators/dedup.py::gram_contamination).",
    tags=("llm", "dedup", "curation"),
)
def gram_contamination_traintest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn(
        "is_test", F.col("doc_id") % 20 == 0
    )
    return D.gram_contamination(docs, min_len=10)


@register(
    "line_level_dedup_ccnet",
    oracle="""
        WITH corpus AS (
            SELECT doc_id,
                   'shared header line for every document in corpus ' || text AS text
            FROM documents
        ), toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
            FROM corpus
        ), segs AS (
            SELECT doc_id, i AS seg_idx,
                   array_to_string(list_slice(toks, 8*i+1, 8*i+8), ' ') AS seg
            FROM toks,
                 unnest(generate_series(0, CAST(ceil(len(toks)/8.0) AS INT) - 1)) AS u(i)
        ), seg_df AS (
            SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg
        ), flagged AS (
            SELECT s.doc_id, s.seg_idx, s.seg, d.df >= 3 AS is_bp
            FROM segs s JOIN seg_df d USING (seg)
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
               CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
               md5(coalesce(string_agg(CASE WHEN NOT is_bp THEN seg END,
                                       ' ' ORDER BY seg_idx), '')) AS retained_md5
        FROM flagged GROUP BY doc_id
    """,
    doc="CCNet/C4-style line-level dedup: boilerplate SEGMENTS (fixed "
        "8-word chunks standing in for lines — the corpus has no "
        "newlines) that recur in >= 3 distinct documents are removed "
        "from every document, and each doc is reassembled from its "
        "surviving segments in order (md5 receipt). A shared header "
        "is prepended to every doc so the operator has guaranteed "
        "work; the natural corpus adds more (identical docs whose "
        "every segment goes boilerplate). Shape: explode segments -> "
        "distinct-doc count per segment -> join back by segment -> "
        "per-doc ordered reassembly via array_sort(collect_list("
        "struct(idx, seg))). The segment-frequency side is NOT "
        "broadcast: at 100 TB the segment dictionary is corpus-sized, "
        "so it stays a shuffle equi-join on the segment key (the same "
        "inverted-index discipline as duplicate_ngram_fraction); "
        "collect_list is bounded by single-doc size. Cf. CCNet "
        "(Wenzek et al.) paragraph dedup; reference has no analog "
        "(mandated [EXT] §2.11 dedup).",
    tags=("llm", "dedup", "text"),
)
def line_level_dedup_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.select(
        "doc_id", F.concat(F.lit(_CCNET_HEADER), F.col("text")).alias("text")
    )
    toks = corpus.select("doc_id", TS.tokens("text").alias("toks"))
    # Every doc has >= 8 tokens (header), so sequence(0, n_seg-1) is
    # always ascending; an empty doc would need a guard here.
    segs = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("toks") / F.lit(8.0)).cast("int") - 1,
                ),
                lambda i: F.array_join(F.slice(F.col("toks"), i * 8 + 1, 8), " "),
            )
        ).alias("seg_idx", "seg"),
    )
    seg_df = segs.groupBy("seg").agg(F.count_distinct("doc_id").alias("df"))
    flagged = segs.join(seg_df, "seg").withColumn("is_bp", F.col("df") >= 3)
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.when(F.col("is_bp"), 1).otherwise(0)).cast("long").alias("n_removed"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("is_bp"),
                                F.struct(F.col("seg_idx"), F.col("seg")),
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            )
        ).alias("retained_md5"),
    )


_BM25_TERMS = ("spark", "join", "filter")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "bm25_retrieval_topk",
    oracle="""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
            FROM documents
        ), dl AS (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks
        ), stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
        ), tf AS (
            SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
            WHERE term IN ('spark','join','filter') GROUP BY doc_id, term
        ), idf AS (
            SELECT term, ln(1.0 + (s.n_docs - df + 0.5) / (df + 0.5)) AS idf
            FROM (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
                 stats s
        ), contrib AS (
            SELECT tf.doc_id, tf.term,
                   idf.idf * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats s
        ), scored AS (
            -- fixed-order sum over the 3 query terms (each per-term sum
            -- has <= 1 element), so the float add order is identical in
            -- both engines
            SELECT doc_id,
                   coalesce(sum(CASE WHEN term = 'spark'  THEN c END), 0)
                 + coalesce(sum(CASE WHEN term = 'join'   THEN c END), 0)
                 + coalesce(sum(CASE WHEN term = 'filter' THEN c END), 0) AS score,
                   CAST(count(*) AS BIGINT) AS n_terms_matched
            FROM contrib GROUP BY doc_id
        )
        SELECT doc_id, round(score, 6) AS score, n_terms_matched,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
        FROM scored QUALIFY rank <= 10
    """,
    doc="BM25 retrieval (k1=1.2, b=0.75): top-10 documents for the fixed "
        "query {spark, join, filter}. Inverted-index shape: token "
        "explode filtered to query terms BEFORE the tf groupBy (the "
        "posting list never includes non-query terms), df/idf computed "
        "from the postings and broadcast back (|query| rows), avgdl "
        "from an exact integer sum so the double division is "
        "bit-identical cross-engine. The per-doc score adds the <= 3 "
        "per-term contributions in a FIXED literal order via "
        "conditional aggregation — a bare SUM over doubles would be "
        "order-nondeterministic across engines and could flip a "
        "round-to-6dp boundary. Global top-10 = TakeOrderedAndProject "
        "(no full sort); rank window runs over 10 rows. Cf. Robertson "
        "& Zaragoza BM25; §2.11 text/similarity.",
    tags=("llm", "text", "retrieval"),
)
def bm25_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_over(_t(spark, sf_dir, "documents"))


def bm25_over(docs: DataFrame, k: int = 10) -> DataFrame:
    """bm25_retrieval_topk's full pipeline over an arbitrary
    (doc_id, text) frame — shared with tools/scale_check_r5.py so the
    scale proof measures exactly what the registered query runs, and
    with hybrid_rrf_retrieval (k=50 lexical leg)."""
    from pyspark.sql import Window

    # tokenize ONCE: the raw pipeline re-tokenizes documents three times
    # (the corpus-stats scalar job, the dl join, the postings explode);
    # the eager checkpoint is the natural materialization boundary a
    # production index build would have anyway
    toks = docs.select("doc_id", TS.tokens("text").alias("toks")).localCheckpoint(
        eager=True
    )
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    agg = dl.agg(F.count("*").alias("n"), F.sum("dl").alias("s")).collect()[0]
    n_docs, avgdl = float(agg["n"]), agg["s"] / agg["n"]
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    idf = tf.groupBy("term").agg(F.count("*").cast("double").alias("df")).select(
        "term",
        F.log(
            F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    contrib = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id", "term",
            (
                F.col("idf") * F.col("tf") * F.lit(_BM25_K1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(_BM25_K1)
                    * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.lit(avgdl))
                )
            ).alias("c"),
        )
    )
    per_term = [
        F.coalesce(F.sum(F.when(F.col("term") == t, F.col("c"))), F.lit(0.0))
        for t in _BM25_TERMS
    ]
    score = per_term[0] + per_term[1] + per_term[2]
    scored = contrib.groupBy("doc_id").agg(
        score.alias("score"), F.count("*").alias("n_terms_matched")
    )
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(k)
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", F.round("score", 6).alias("score"), "n_terms_matched", "rank"
    )


@register(
    "blocked_fuzzy_join_symspell",
    oracle="""
        WITH corpus AS (
            SELECT c_custkey AS id, 'base' AS side, c_name AS name FROM customer
            UNION ALL
            SELECT c_custkey + 1000000 AS id, 'dirty' AS side,
                   substr(c_name, 1, 9 + CAST(c_custkey % 9 AS INT)) || 'x' ||
                   substr(c_name, 11 + CAST(c_custkey % 9 AS INT)) AS name
            FROM customer
        ), variants AS (
            SELECT id, side, name,
                   substr(name, 1, CAST(i AS INT) - 1) ||
                   substr(name, CAST(i AS INT) + 1) AS var
            FROM corpus, unnest(generate_series(1, length(name))) AS u(i)
        ), cand AS (
            SELECT DISTINCT d.id AS dirty_id, d.name AS d_name,
                   b.id AS match_custkey, b.name AS b_name
            FROM variants d JOIN variants b ON d.var = b.var
            WHERE d.side = 'dirty' AND b.side = 'base'
        )
        SELECT dirty_id, match_custkey,
               CAST(levenshtein(d_name, b_name) AS INT) AS dist
        FROM cand WHERE levenshtein(d_name, b_name) <= 1
    """,
    doc="Entity resolution via 1-deletion-neighborhood blocking "
        "(SymSpell-style): a dirty replica of every customer name (one "
        "digit replaced by 'x' at a key-dependent position) is linked "
        "back to the clean side by edit distance <= 1 — WITHOUT an "
        "all-pairs levenshtein. Each name emits its |name| "
        "delete-one-char variants; two names at substitution distance "
        "1 necessarily share the variant deleting the differing "
        "position, so an equi-join on the variant string is a "
        "complete blocking scheme (provable recall), and candidate "
        "blocks are tiny (names sharing a deletion). levenshtein runs "
        "only on distinct candidate pairs. The deterministic truth "
        "set includes same-decade cousins (a dirty name whose mutated "
        "digit is the one digit distinguishing two base names matches "
        "both). Scale: linear |corpus|x|name| variant inflation and "
        "an equi-join — the standard trade replacing the quadratic "
        "similarity join; cf. SymSpell / Norvig spell-correction "
        "indexing (§2.11 dedup/linkage).",
    tags=("llm", "linkage", "dedup"),
)
def blocked_fuzzy_join_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    k = (F.col("id") % 9).cast("int")
    dirty = cust.select(
        (F.col("id") + 1000000).alias("id"),
        F.concat(
            F.substr(F.col("name"), F.lit(1), F.lit(9) + k),
            F.lit("x"),
            F.substr(F.col("name"), F.lit(11) + k),
        ).alias("name"),
    )
    corpus = cust.withColumn("side", F.lit("base")).unionByName(
        dirty.withColumn("side", F.lit("dirty"))
    )
    variants = corpus.select(
        "id", "side", "name",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("name")),
                lambda i: F.concat(
                    F.substr(F.col("name"), F.lit(1), i - 1),
                    F.substr(F.col("name"), i + 1),
                ),
            )
        ).alias("var"),
    )
    d = variants.filter(F.col("side") == "dirty").select(
        F.col("id").alias("dirty_id"), F.col("name").alias("d_name"), "var"
    )
    b = variants.filter(F.col("side") == "base").select(
        F.col("id").alias("match_custkey"), F.col("name").alias("b_name"), "var"
    )
    cand = d.join(b, "var").select(
        "dirty_id", "d_name", "match_custkey", "b_name"
    ).distinct()
    return cand.filter(F.levenshtein("d_name", "b_name") <= 1).select(
        "dirty_id", "match_custkey",
        F.levenshtein("d_name", "b_name").cast("int").alias("dist"),
    )


_CLASSIFIER_WEIGHTS = (
    ("spark", "2.50"), ("data", "1.20"), ("slow", "-3.00"),
    ("the", "-0.80"), ("query", "1.70"), ("batch", "0.90"),
)
_CLASSIFIER_BIAS = -0.2


@register(
    "linear_classifier_inference",
    oracle="""
        WITH w(term, wt) AS (VALUES
            ('spark', CAST(2.50 AS DECIMAL(4,2))), ('data', CAST(1.20 AS DECIMAL(4,2))),
            ('slow', CAST(-3.00 AS DECIMAL(4,2))), ('the', CAST(-0.80 AS DECIMAL(4,2))),
            ('query', CAST(1.70 AS DECIMAL(4,2))), ('batch', CAST(0.90 AS DECIMAL(4,2)))
        ), toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
            FROM documents
        ), dl AS (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks
        ), tf AS (
            SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
            GROUP BY doc_id, term
        ), dot AS (
            SELECT tf.doc_id, sum(w.wt * tf.tf) AS dot_dec
            FROM tf JOIN w USING (term) GROUP BY tf.doc_id
        ), z AS (
            SELECT dl.doc_id,
                   -0.2 + coalesce(CAST(dot.dot_dec AS DOUBLE), 0.0) / dl.dl AS z
            FROM dl LEFT JOIN dot ON dl.doc_id = dot.doc_id
        )
        SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS prob,
               1.0 / (1.0 + exp(-z)) > 0.5 AS quality_pass
        FROM z
    """,
    doc="Broadcast-model batch inference: a fasttext-style linear "
        "quality classifier (term weights + bias, features = tf/dl) "
        "scored over every document with a sigmoid. The model is a "
        "6-row broadcast table — the canonical 100 TB inference shape "
        "(model ships to executors; the corpus never moves beyond its "
        "tf groupBy). Weighted dot product accumulates in DECIMAL "
        "(exact, order-independent) and converts to DOUBLE once "
        "before the division/sigmoid, so the cross-engine float "
        "story has no sum-order hazard (the repo's DECIMAL-sum "
        "discipline applied to a model dot product). Docs matching "
        "no model term still score (bias-only) via the left join. "
        "Cf. fastText/CCNet LM quality filtering (§2.11 text).",
    tags=("llm", "text", "inference"),
)
def linear_classifier_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    weights = spark.createDataFrame(
        [(t, w) for t, w in _CLASSIFIER_WEIGHTS], "term string, wt string"
    ).select("term", F.col("wt").cast("decimal(4,2)").alias("wt"))
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TS.tokens("text").alias("toks"))
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dot = (
        tf.join(F.broadcast(weights), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("wt") * F.col("tf")).alias("dot_dec"))
    )
    z = dl.join(dot, "doc_id", "left").select(
        "doc_id",
        (
            F.lit(_CLASSIFIER_BIAS)
            + F.coalesce(F.col("dot_dec").cast("double"), F.lit(0.0)) / F.col("dl")
        ).alias("z"),
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
    return z.select(
        "doc_id", F.round(prob, 6).alias("prob"), (prob > 0.5).alias("quality_pass")
    )


@register(
    "cdc_chunk_dedup_stats",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source,
                   list_filter(string_split(text, ' '), t -> t != '') AS toks
            FROM documents
        ), th AS (
            SELECT doc_id, source, toks, CAST(len(toks) AS BIGINT) AS n,
                   list_transform(toks, t -> list_reduce(
                       list_prepend(CAST(7 AS BIGINT),
                           list_transform(string_split(t, ''),
                                          c -> CAST(ascii(c) AS BIGINT))),
                       (acc, x) -> (acc*31 + x) % 1000003)) AS th
            FROM toks
        ), b AS (
            SELECT doc_id, source, toks, n,
                CASE WHEN n >= 4 THEN
                  list_filter(generate_series(CAST(4 AS BIGINT), n), i ->
                    (((((th[CAST(i AS INT)-3]*31 + th[CAST(i AS INT)-2]) % 1000003)
                        * 31 + th[CAST(i AS INT)-1]) % 1000003)
                        * 31 + th[CAST(i AS INT)]) % 1000003 % 8 = 0)
                ELSE [] END AS bounds
            FROM th
        ), bp AS (
            SELECT doc_id, source, toks,
                   list_concat(list_concat([CAST(0 AS BIGINT)], bounds),
                               CASE WHEN len(bounds) > 0 AND bounds[-1] = n
                                    THEN [] ELSE [n] END) AS bps
            FROM b
        ), chunks AS (
            SELECT doc_id, source,
                   array_to_string(
                       list_slice(toks, bps[CAST(j AS INT)]+1, bps[CAST(j AS INT)+1]),
                       ' ') AS chunk,
                   bps[CAST(j AS INT)+1] - bps[CAST(j AS INT)] AS chunk_tokens
            FROM bp, unnest(generate_series(1, len(bps)-1)) AS u(j)
        ), cdf AS (
            SELECT chunk, count(DISTINCT doc_id) AS df FROM chunks GROUP BY chunk
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(count(DISTINCT c.chunk) AS BIGINT) AS n_distinct_chunks,
               CAST(sum(CASE WHEN cdf.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_shared,
               round(CAST(sum(chunk_tokens) AS DOUBLE) / count(*), 6) AS avg_chunk_tokens
        FROM chunks c JOIN cdf USING (chunk)
        GROUP BY source
    """,
    doc="Content-defined chunking (FastCDC-style) + chunk-level dedup "
        "stats over operators/dedup.py::cdc_chunks: a 4-token rolling "
        "window declares a chunk boundary where its hash % 8 == 0, so "
        "boundaries are CONTENT-anchored — an insertion early in a doc "
        "shifts fixed-size chunk grids everywhere but re-synchronizes "
        "CDC chunks after one window, which is why CDC is the "
        "storage/training-corpus dedup standard. Each token is "
        "fold-hashed ONCE and windows combine token hashes with a "
        "polynomial accumulate (measured 2.2x faster than re-hashing "
        "the joined window string per position — PERF.md); the whole "
        "boundary scan is pure Catalyst HOFs, no UDF. Chunks then "
        "explode and dedup globally (distinct-doc frequency per chunk "
        "content) with a per-source rollup. Scale: everything before "
        "the chunk groupBy is scan-side and per-row; the shuffle "
        "carries chunk strings once (at 100 TB you would shuffle "
        "xxhash64(chunk) fingerprints instead — same plan shape). "
        "Cf. FastCDC (Xia et al.); SURVEY.md 2.11 dedup.",
    tags=("llm", "dedup", "chunking"),
)
def cdc_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    chunks = D.cdc_chunks(docs)
    cdf = chunks.groupBy("chunk").agg(F.count_distinct("doc_id").alias("df"))
    return chunks.join(cdf, "chunk").groupBy("source").agg(
        F.count("*").alias("n_chunks"),
        F.count_distinct("chunk").alias("n_distinct_chunks"),
        F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).cast("long").alias("n_in_shared"),
        F.round(
            F.sum("chunk_tokens").cast("double") / F.count("*"), 6
        ).alias("avg_chunk_tokens"),
    )


@register(
    "pmi_collocations_topk",
    oracle="""
        WITH t AS (
            SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
            FROM documents
        ), bigrams AS (
            SELECT toks[i] AS w1, toks[i + 1] AS w2
            FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        ), n AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_bg FROM bigrams
        ), bg AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM bigrams GROUP BY w1, w2
        ), lc AS (
            SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bigrams GROUP BY w1
        ), rc AS (
            SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM bigrams GROUP BY w2
        ), scored AS (
            SELECT bg.w1, bg.w2, bg.c12,
                   ln(bg.c12 * n.n_bg / (lc.c1 * rc.c2)) AS pmi
            FROM bg JOIN lc USING (w1) JOIN rc USING (w2), n
            WHERE bg.c12 >= 5
        )
        SELECT w1, w2, c12, round(pmi, 6) AS pmi,
               CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INT) AS rank
        FROM scored QUALIFY rank <= 20
    """,
    doc="PMI collocation mining: top-20 bigrams by pointwise mutual "
        "information ln(c12·N / (c1·c2)) with a min-count-5 support "
        "floor (raw PMI overweights hapaxes). Left/right marginal "
        "dictionaries join back broadcast (vocab-sized); all ln inputs "
        "are exact integer ratios so the only float op is one ln, "
        "absorbed by 6dp rounding; ties break on (w1, w2). Global "
        "top-20 via TakeOrderedAndProject. Collocation extraction is "
        "the phrase-vocabulary step of tokenizer/corpus pipelines "
        "(cf. word2vec phrase mining, Mikolov et al.); §2.11 text.",
    tags=("llm", "text", "collocations"),
)
def pmi_collocations_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TS.tokens("text").alias("toks"))
    n_col = F.size("toks")
    bigrams = (
        toks.filter(n_col >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n_col - 1).alias("w1"),
                    F.slice("toks", 2, n_col - 1).alias("w2"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    n_bg = float(bigrams.count())
    bg = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    lc = bigrams.groupBy("w1").agg(F.count("*").alias("c1"))
    rc = bigrams.groupBy("w2").agg(F.count("*").alias("c2"))
    scored = (
        bg.filter(F.col("c12") >= 5)
        .join(F.broadcast(lc), "w1")
        .join(F.broadcast(rc), "w2")
        .select(
            "w1", "w2", "c12",
            F.log(
                F.col("c12") * F.lit(n_bg) / (F.col("c1") * F.col("c2"))
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(20)
    w = Window.orderBy(F.col("pmi").desc(), "w1", "w2")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "w1", "w2", "c12", F.round("pmi", 6).alias("pmi"), "rank"
    )


@register(
    "k_anonymity_generalization",
    oracle="""
        WITH g AS (
            SELECT c_nationkey, c_mktsegment, count(*) AS n
            FROM customer GROUP BY c_nationkey, c_mktsegment
        ), gen AS (
            SELECT c.c_nationkey,
                   CASE WHEN g.n >= 10 THEN c.c_mktsegment ELSE '*' END AS segment
            FROM customer c
            JOIN g ON g.c_nationkey = c.c_nationkey
                  AND g.c_mktsegment = c.c_mktsegment
        )
        SELECT c_nationkey AS nationkey, segment,
               CAST(count(*) AS BIGINT) AS group_size,
               count(*) >= 10 AS anonymous
        FROM gen GROUP BY c_nationkey, segment
    """,
    doc="k-anonymity audit with one generalization step (k=10) over the "
        "quasi-identifier (nation, market segment): groups below k get "
        "their segment suppressed to '*' and merge at the nation "
        "level; the output reports every post-generalization group "
        "with its size and whether it now satisfies k. The group-size "
        "table is quasi-identifier-sized (|nations|x|segments|) and "
        "broadcasts back onto the row stream, so the rows shuffle "
        "once for the final count — the privacy-release analog of the "
        "PII-redaction scan (pii_redaction_scrub). Cf. Sweeney "
        "k-anonymity; §2.11 governance.",
    tags=("llm", "governance", "privacy"),
)
def k_anonymity_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(F.count("*").alias("n"))
    gen = cust.join(F.broadcast(g), ["c_nationkey", "c_mktsegment"]).select(
        F.col("c_nationkey").alias("nationkey"),
        F.when(F.col("n") >= 10, F.col("c_mktsegment")).otherwise(F.lit("*")).alias("segment"),
    )
    return gen.groupBy("nationkey", "segment").agg(
        F.count("*").alias("group_size"),
        (F.count("*") >= 10).alias("anonymous"),
    )


@register(
    "ols_trend_per_source",
    oracle="""
        WITH s AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(doc_id) AS BIGINT) AS sx,
                   CAST(sum(n_chars) AS BIGINT) AS sy,
                   CAST(sum(doc_id * n_chars) AS BIGINT) AS sxy,
                   CAST(sum(doc_id * doc_id) AS BIGINT) AS sxx
            FROM documents GROUP BY source
        )
        SELECT source, n,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (n * sxx - sx * sx), 9) AS slope,
               round((sy - (CAST(n * sxy - sx * sy AS DOUBLE)
                            / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept
        FROM s
    """,
    doc="Grouped OLS (per-source linear trend of document length over "
        "corpus position): closed-form slope/intercept from the five "
        "classic sufficient statistics (n, Σx, Σy, Σxy, Σx²) — ALL "
        "integer-exact, so the only float ops are the two final "
        "divisions and the result is bit-deterministic cross-engine "
        "with no Welford/accumulator divergence (why the oracle states "
        "the closed form rather than DuckDB's regr_slope). One "
        "partial-agg shuffle of 5 longs per (source) group — the "
        "distributed-regression shape that scales to any group count; "
        "per-group state is O(1). §2.11 analytics/monitoring (drift "
        "trend per corpus source).",
    tags=("llm", "analytics", "regression"),
)
def ols_trend_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("doc_id").alias("sx"),
        F.sum("n_chars").alias("sy"),
        F.sum(F.col("doc_id") * F.col("n_chars")).alias("sxy"),
        F.sum(F.col("doc_id") * F.col("doc_id")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    return s.select(
        "source", "n",
        F.round(slope, 9).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept"),
    )


def _jl_signs(dim_in: int, j: int) -> list[float]:
    """Deterministic ±1 Achlioptas-style signs for output dim j, derived
    from md5 so the SQL oracle can re-derive the identical matrix with
    its own md5()."""
    import hashlib

    return [
        1.0 if ord(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0]) % 2 == 0 else -1.0
        for i in range(1, dim_in + 1)
    ]


_JL_DIM_IN = 64
_JL_DIM_OUT = 8


def _jl_oracle() -> str:
    cols = ",\n               ".join(
        f"""round(list_reduce(list_transform(generate_series(1, {_JL_DIM_IN}), i ->
                   CAST(embedding[i] AS DOUBLE) *
                   (CASE WHEN ascii(substr(md5(CAST(i AS VARCHAR) || '_' || '{j}'), 1, 1)) % 2 = 0
                         THEN 1.0 ELSE -1.0 END)), (a, b) -> a + b)
                   / sqrt(8.0), 6) AS p{j}"""
        for j in range(1, _JL_DIM_OUT + 1)
    )
    return f"""
        SELECT vec_id,
               {cols}
        FROM embeddings
    """


@register(
    "jl_random_projection",
    oracle=_jl_oracle(),
    doc="Johnson-Lindenstrauss random projection 64→8: a deterministic "
        "±1 sign matrix (md5-derived, so both engines own the identical "
        "matrix — Spark embeds it as literal arrays, the model-as-"
        "broadcast-constant shape; the oracle re-derives it with SQL "
        "md5) projects every embedding via y_j = Σ x_i·s_ij / √8. Each "
        "dot product is a FIXED-ORDER sequential fold (F.aggregate "
        "from 0.0 ≡ DuckDB list_reduce from x₁ since 0.0+x₁ is exact), "
        "so no float add-order hazard. Pure scan-side map — zero "
        "shuffles, the cheap-ANN preprocessing step (project, then "
        "bucket in 8-d). Cf. Achlioptas database-friendly random "
        "projections; §2.11 embeddings.",
    tags=("llm", "embeddings", "projection"),
)
def jl_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    cols = [F.col("vec_id")]
    for j in range(1, _JL_DIM_OUT + 1):
        w = F.array(*[F.lit(s) for s in _jl_signs(_JL_DIM_IN, j)])
        dot = F.aggregate(
            F.zip_with(x, w, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        cols.append(F.round(dot / F.sqrt(F.lit(8.0)), 6).alias(f"p{j}"))
    return emb.select(*cols)


_GD_LR = 0.05
_GD_TERMS = ("spark", "data", "slow")

# Shared CTE prefix for the GD family: features → exact step-1 gradient
# → step-2 sigmoid gradient → trained weights (w2t). Both the training
# query (reports the weights) and the train→apply query (scores every
# document with them) append their own final SELECT, so the two oracles
# can never drift apart.
_GD_ORACLE_CTES = """
        WITH toks AS (
            SELECT doc_id, n_chars,
                   list_filter(string_split(text, ' '), t -> t != '') AS toks
            FROM documents
        ), feat AS (
            SELECT doc_id, CAST(n_chars > 250 AS INT) AS y,
                   CAST(len(list_filter(toks, t -> t = 'spark')) AS BIGINT) AS x1,
                   CAST(len(list_filter(toks, t -> t = 'data')) AS BIGINT) AS x2,
                   CAST(len(list_filter(toks, t -> t = 'slow')) AS BIGINT) AS x3
            FROM toks
        ), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM feat),
        g1 AS (
            -- w=0 => p=0.5 exactly; every contribution is k*0.5, exact in
            -- DECIMAL, so the step-1 gradient is order-independent-exact
            SELECT CAST(sum(CAST((0.5 - y) * x1 AS DECIMAL(38,6))) AS DOUBLE) AS s1,
                   CAST(sum(CAST((0.5 - y) * x2 AS DECIMAL(38,6))) AS DOUBLE) AS s2,
                   CAST(sum(CAST((0.5 - y) * x3 AS DECIMAL(38,6))) AS DOUBLE) AS s3,
                   CAST(sum(CAST(0.5 - y AS DECIMAL(38,6))) AS DOUBLE) AS sb
            FROM feat
        ), w1t AS (
            SELECT -0.05 * s1 / nn.n AS wa, -0.05 * s2 / nn.n AS wb,
                   -0.05 * s3 / nn.n AS wc, -0.05 * sb / nn.n AS bb
            FROM g1, nn
        ), p2 AS (
            SELECT f.y, f.x1, f.x2, f.x3,
                   1.0 / (1.0 + exp(-(((w1t.bb + w1t.wa * f.x1)
                                       + w1t.wb * f.x2) + w1t.wc * f.x3))) AS p
            FROM feat f, w1t
        ), g2 AS (
            -- step-2 contributions are arbitrary doubles; the DECIMAL(38,18)
            -- cast pins each FIXED per-row value once, then the sum is exact
            -- and order-independent (the distributed-agg hazard is the SUM
            -- order, not the per-row value)
            SELECT CAST(sum(CAST((p - y) * x1 AS DECIMAL(38,18))) AS DOUBLE) AS s1,
                   CAST(sum(CAST((p - y) * x2 AS DECIMAL(38,18))) AS DOUBLE) AS s2,
                   CAST(sum(CAST((p - y) * x3 AS DECIMAL(38,18))) AS DOUBLE) AS s3,
                   CAST(sum(CAST(p - y AS DECIMAL(38,18))) AS DOUBLE) AS sb
            FROM p2
        ), w2t AS (
            SELECT w1t.wa - 0.05 * g2.s1 / nn.n AS wa,
                   w1t.wb - 0.05 * g2.s2 / nn.n AS wb,
                   w1t.wc - 0.05 * g2.s3 / nn.n AS wc,
                   w1t.bb - 0.05 * g2.sb / nn.n AS bb
            FROM w1t, g2, nn
        )
"""


@register(
    "logistic_regression_gd_steps",
    oracle=_GD_ORACLE_CTES + """
        SELECT 'bias' AS param, round(bb, 6) AS value FROM w2t
        UNION ALL SELECT 'w_spark', round(wa, 6) FROM w2t
        UNION ALL SELECT 'w_data', round(wb, 6) FROM w2t
        UNION ALL SELECT 'w_slow', round(wc, 6) FROM w2t
    """,
    doc="Distributed model TRAINING, not just inference: two unrolled "
        "batch-gradient-descent steps of logistic regression (lr=0.05, "
        "integer token-count features, label = long-document) with the "
        "canonical Spark training loop — per-step gradients reduce "
        "across the cluster (one partial-agg shuffle of 4 decimal "
        "sums), weights come back to the driver and re-broadcast as "
        "literals into the next step's plan. Determinism: step-1 "
        "contributions are exact halves in DECIMAL; step-2 casts each "
        "fixed per-row double to DECIMAL(38,18) so the distributed sum "
        "is exact and order-independent (the sum ORDER is the "
        "cross-engine hazard, not the per-row values); weight algebra "
        "runs the same IEEE ops in the same order in Python and SQL. "
        "The oracle unrolls both steps in CTEs. At 100 TB this is "
        "exactly mini-batch GD with per-step O(|features|) driver "
        "state (§2.11 training).",
    tags=("llm", "training", "regression"),
)
def logistic_regression_gd_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return logistic_gd_over(_t(spark, sf_dir, "documents"))


def _gd_features(docs: DataFrame) -> DataFrame:
    """(doc_id, y, x1..x3) training frame: label = long-document,
    features = integer token counts of the three probe terms."""
    toks = docs.select("doc_id", "n_chars", TS.tokens("text").alias("toks"))
    return toks.select(
        "doc_id",
        (F.col("n_chars") > 250).cast("int").alias("y"),
        *[
            F.size(F.filter("toks", (lambda term: lambda t: t == term)(term)))
            .cast("long")
            .alias(f"x{i}")
            for i, term in enumerate(_GD_TERMS, 1)
        ],
    )


def logistic_gd_over(docs: DataFrame) -> DataFrame:
    """logistic_regression_gd_steps' full two-step training loop over
    an arbitrary (doc_id, n_chars, text) frame — shared with
    tools/scale_check_r5.py so the scale proof measures exactly what
    the registered query runs."""
    spark = docs.sparkSession
    w2, b2 = _gd_train_params(docs)
    names = ["bias", "w_spark", "w_data", "w_slow"]
    vals = [b2, w2[0], w2[1], w2[2]]
    # F.round (HALF_UP) — not Python round() (banker's) — to match SQL
    return spark.createDataFrame(
        list(zip(names, vals)), "param string, value double"
    ).select("param", F.round("value", 6).alias("value"))


def _gd_train_params(docs: DataFrame) -> tuple:
    """The two unrolled GD steps; returns (w2 list-of-3, b2) as plain
    Python floats, so apply-side queries can embed the trained model as
    plan literals. The weight algebra runs the same IEEE ops in the
    same order as the SQL oracle's CTEs — the floats are cross-engine
    reproducible (see logistic_regression_gd_steps' doc)."""
    feat = _gd_features(docs).persist()
    try:
        row = feat.agg(
            F.count("*").alias("n"),
            *[
                F.sum(((F.lit(0.5) - F.col("y")) * F.col(f"x{i}"))
                      .cast("decimal(38,6)")).alias(f"s{i}")
                for i in range(1, 4)
            ],
            F.sum((F.lit(0.5) - F.col("y")).cast("decimal(38,6)")).alias("sb"),
        ).collect()[0]
        n = float(row["n"])
        w = [-_GD_LR * float(row[f"s{i}"]) / n for i in range(1, 4)]
        b = -_GD_LR * float(row["sb"]) / n
        z = (
            (F.lit(b) + F.lit(w[0]) * F.col("x1"))
            + F.lit(w[1]) * F.col("x2")
        ) + F.lit(w[2]) * F.col("x3")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        row2 = feat.select("y", "x1", "x2", "x3", p.alias("p")).agg(
            *[
                F.sum(((F.col("p") - F.col("y")) * F.col(f"x{i}"))
                      .cast("decimal(38,18)")).alias(f"s{i}")
                for i in range(1, 4)
            ],
            F.sum((F.col("p") - F.col("y")).cast("decimal(38,18)")).alias("sb"),
        ).collect()[0]
        w2 = [w[i] - _GD_LR * float(row2[f"s{i+1}"]) / n for i in range(3)]
        b2 = b - _GD_LR * float(row2["sb"]) / n
    finally:
        feat.unpersist()
    return w2, b2


@register(
    "quality_classifier_train_apply",
    oracle=_GD_ORACLE_CTES + """
        SELECT f.doc_id AS doc_id,
               CAST(f.y AS INT) AS label_long_doc,
               round(1.0 / (1.0 + exp(-(((w2t.bb + w2t.wa * f.x1)
                     + w2t.wb * f.x2) + w2t.wc * f.x3))), 6) AS quality_p,
               (1.0 / (1.0 + exp(-(((w2t.bb + w2t.wa * f.x1)
                     + w2t.wb * f.x2) + w2t.wc * f.x3)))) >= 0.5 AS keep
        FROM feat f, w2t
    """,
    doc="The quality-filter training LOOP closed end to end (the "
        "fineweb/CCNet curation shape): train the logistic model with "
        "the two distributed GD steps of logistic_regression_gd_steps "
        "(per-step gradient = one partial-agg shuffle of 4 decimal "
        "sums), then re-broadcast the trained weights as plan LITERALS "
        "and score EVERY document scan-side — sigmoid over the same "
        "token-count features, keep = p ≥ 0.5. Train and apply read "
        "the same feature frame; apply is shuffle-free (model state is "
        "O(|features|) driver constants, the broadcast-model-apply "
        "pattern that scales to 100 TB corpora unchanged). The oracle "
        "appends a per-document scoring SELECT to the SAME weight CTEs "
        "the training oracle uses, so every per-doc probability (6dp) "
        "and keep decision must match across engines — differentially "
        "testing exp() parity and the pinned IEEE weight algebra "
        "(§2.11 training/quality).",
    tags=("llm", "training", "quality"),
)
def quality_classifier_train_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w, b = _gd_train_params(docs)
    feat = _gd_features(docs)
    # identical association order to the oracle's scoring expression
    z = (
        (F.lit(b) + F.lit(w[0]) * F.col("x1"))
        + F.lit(w[1]) * F.col("x2")
    ) + F.lit(w[2]) * F.col("x3")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feat.select(
        "doc_id",
        F.col("y").cast("int").alias("label_long_doc"),
        F.round(p, 6).alias("quality_p"),
        (p >= F.lit(0.5)).alias("keep"),
    )


@register(
    "udtf_polymorphic_ngrams",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x != '') AS toks
            FROM documents
        ), g AS (
            SELECT toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
            FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(i)
        )
        SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS n
        FROM g GROUP BY w1, w2, w3
        ORDER BY n DESC, w1, w2, w3 LIMIT 15
    """,
    doc="POLYMORPHIC Python UDTF (§2.10, Spark 4's analyze() protocol): "
        "the output schema (w1..wn columns) is computed at PLAN time "
        "from the constant n argument — analyze() receives "
        "AnalyzeArgument metadata, asserts n is a foldable literal, "
        "and returns the n-column AnalyzeResult; the same registration "
        "serves any n. Called with n=3 via LATERAL and re-aggregated "
        "to the top-15 corpus trigrams. Like udtf_word_bigrams this "
        "exists to exercise the API path (per-row Python is the slow "
        "path — the hot-path equivalent is the arrays_zip/slice "
        "explode); the oracle proves the dynamic schema carries "
        "exactly the declarative result.",
    tags=("llm", "text", "udtf"),
)
def udtf_polymorphic_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class NGramColumns:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not n.isConstantExpression or n.value is None:
                raise ValueError("n must be a constant literal")
            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"w{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text, n):
            if text is None:
                return
            toks = [t for t in text.split(" ") if t]
            for i in range(len(toks) - n + 1):
                yield tuple(toks[i : i + n])

    spark.udtf.register("ngram_columns", udtf(NGramColumns))
    _t(spark, sf_dir, "documents").createOrReplaceTempView("udtf_poly_docs_v")
    return spark.sql("""
        SELECT g.w1, g.w2, g.w3, count(*) AS n
        FROM udtf_poly_docs_v d, LATERAL ngram_columns(d.text, 3) g
        GROUP BY g.w1, g.w2, g.w3 ORDER BY n DESC, g.w1, g.w2, g.w3 LIMIT 15
    """)


_ALS_TYPES = ("click", "error", "purchase", "signup", "view")


def _als_item_factors() -> list[list[float]]:
    """Fixed 3-dim item factors for the 5 event types — exact dyadic
    rationals, so V, V^T V and V^T r are all exact in double."""
    return [
        [1.0 + 0.25 * t, 0.5 - 0.25 * (t % 2), 0.125 * t]
        for t in range(len(_ALS_TYPES))
    ]


def _als_ainv() -> list[list[float]]:
    """(V^T V + 0.5 I)^{-1} via the closed-form 3x3 inverse. The nine
    doubles are embedded as repr() literals in BOTH the Spark plan and
    the SQL oracle, so the two engines share the identical matrix."""
    V = _als_item_factors()
    A = [[sum(V[t][i] * V[t][j] for t in range(len(V))) + (0.5 if i == j else 0.0)
          for j in range(3)] for i in range(3)]
    (a, b, c), (d, e, f), (g, h, i) = A
    det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    cof = [
        [e * i - f * h, c * h - b * i, b * f - c * e],
        [f * g - d * i, a * i - c * g, c * d - a * f],
        [d * h - e * g, b * g - a * h, a * e - b * d],
    ]
    return [[cof[r][s] / det for s in range(3)] for r in range(3)]


def _als_oracle() -> str:
    V = _als_item_factors()
    inv = _als_ainv()
    counts = ", ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS c{k}"
        for k, t in enumerate(_ALS_TYPES)
    )
    bs = ",\n                   ".join(
        "("
        + " + ".join(f"c{t} * {V[t][j]!r}" for t in range(len(_ALS_TYPES)))
        + f") AS b{j}"
        for j in range(3)
    )
    us = ",\n               ".join(
        f"round(({inv[i][0]!r} * b0 + {inv[i][1]!r} * b1 + {inv[i][2]!r} * b2), 6)"
        f" AS f{i + 1}"
        for i in range(3)
    )
    return f"""
        WITH r AS (
            SELECT user_id, {counts}
            FROM events GROUP BY user_id
        ), b AS (
            SELECT user_id,
                   {bs}
            FROM r
        )
        SELECT user_id,
               {us}
        FROM b
    """


@register(
    "als_user_factors_update",
    oracle=_als_oracle(),
    doc="One ALS half-step of a recommender (user-factor ridge update "
        "against fixed item factors): with V (5 event-type items x 3 "
        "dims, exact dyadic literals) held fixed, every user's factors "
        "solve (V'V + lambda*I) u = V' r_u in closed form. The normal "
        "matrix inverse is computed ONCE and broadcast as nine shared "
        "literals (repr-roundtripped into both the Spark plan and the "
        "SQL oracle); the distributed work is exactly one partial-agg "
        "shuffle of 5 per-user counts — the canonical ALS data "
        "movement (ratings shuffle once per half-step, the small "
        "side's Gram matrix rides the closure). Per-user arithmetic "
        "is fixed-order over exact integers and dyadic rationals, so "
        "factors are bit-deterministic. Cf. Hu-Koren-Volinsky "
        "implicit-feedback ALS; SURVEY.md 2.11 training.",
    tags=("llm", "training", "recommender"),
)
def als_user_factors_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    V = _als_item_factors()
    inv = _als_ainv()
    ev = _t(spark, sf_dir, "events")
    r = ev.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"c{k}")
            for k, t in enumerate(_ALS_TYPES)
        ]
    )
    def bj(j):
        expr = F.col("c0") * F.lit(V[0][j])
        for t in range(1, len(_ALS_TYPES)):
            expr = expr + F.col(f"c{t}") * F.lit(V[t][j])
        return expr
    b = r.select("user_id", *[bj(j).alias(f"b{j}") for j in range(3)])
    return b.select(
        "user_id",
        *[
            F.round(
                F.lit(inv[i][0]) * F.col("b0")
                + F.lit(inv[i][1]) * F.col("b1")
                + F.lit(inv[i][2]) * F.col("b2"),
                6,
            ).alias(f"f{i + 1}")
            for i in range(3)
        ],
    )


@register(
    "mad_anomaly_lengths",
    oracle="""
        WITH corpus AS (
            SELECT doc_id, source, n_chars FROM documents
            UNION ALL
            SELECT doc_id + 100000 AS doc_id, source, n_chars * 6 AS n_chars
            FROM documents WHERE doc_id % 7 = 0
        ), med AS (
            SELECT source, median(n_chars) AS med FROM corpus GROUP BY source
        ), dev AS (
            SELECT c.source, abs(c.n_chars - m.med) AS dev
            FROM corpus c JOIN med m USING (source)
        ), mad AS (
            SELECT source, median(dev) AS mad FROM dev GROUP BY source
        )
        SELECT c.source, CAST(count(*) AS BIGINT) AS n_docs,
               round(any_value(m.med), 6) AS med,
               round(any_value(a.mad), 6) AS mad,
               CAST(sum(CASE WHEN abs(c.n_chars - m.med) > 3 * a.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        FROM corpus c JOIN med m USING (source) JOIN mad a USING (source)
        GROUP BY c.source
    """,
    doc="Robust anomaly detection (median/MAD, the outlier-resistant "
        "dual of z-scores): per-source exact median doc length, median "
        "absolute deviation, and the count of 3-MAD outliers — over a "
        "corpus with planted 6x-length outliers (doc_id % 7, coprime "
        "with the source count so every source gets some). Exact "
        "interpolated percentiles agree cross-engine (established by "
        "iqr_outlier_length_filter's quartile pins); the med/mad "
        "tables are |sources|-sized and broadcast back onto the row "
        "stream — two grouped-percentile shuffles of (source, value) "
        "pairs total, the same robust-statistics shape at any scale. "
        "MAD flags the planted tail that a mean/stddev fence would "
        "drag toward itself (cf. Leys et al. on MAD vs stddev; "
        "SURVEY.md 2.11 quality/monitoring).",
    tags=("llm", "quality", "robust-stats"),
)
def mad_anomaly_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    planted = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "source",
        (F.col("n_chars") * 6).alias("n_chars"),
    )
    corpus = docs.unionByName(planted)
    med = corpus.groupBy("source").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("med")
    )
    dev = corpus.join(F.broadcast(med), "source").withColumn(
        "dev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = dev.groupBy("source").agg(F.percentile("dev", F.lit(0.5)).alias("mad"))
    return (
        corpus.join(F.broadcast(med), "source")
        .join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.any_value("med"), 6).alias("med"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("n_chars") - F.col("med")) > 3 * F.col("mad"), 1
                ).otherwise(0)
            ).cast("long").alias("n_anomalies"),
        )
    )


@register(
    "naive_bayes_train_apply",
    oracle="""
        WITH tok AS (
            SELECT doc_id, lang,
                   unnest(list_filter(string_split(text, ' '), x -> x != '')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, lang, term, count(*) AS tf FROM tok GROUP BY 1, 2, 3
        ), cls AS (
            SELECT DISTINCT lang AS cls FROM documents
        ), pri AS (
            SELECT lang AS cls, count(*) AS n_docs FROM documents GROUP BY 1
        ), tot AS (
            SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
        ), cwc AS (
            SELECT term, lang AS cls, count(*) AS c FROM tok GROUP BY 1, 2
        ), tokc AS (
            SELECT lang AS cls, CAST(count(*) AS DOUBLE) AS tc FROM tok GROUP BY 1
        ), voc AS (
            SELECT CAST(count(DISTINCT term) AS DOUBLE) AS v FROM tok
        ), sc AS (
            SELECT tf.doc_id, tf.lang, cls.cls,
                   (ln(CAST(pri.n_docs AS DOUBLE) / tot.n)
                    + sum(tf.tf * ln((CAST(COALESCE(cwc.c, 0) AS DOUBLE) + 0.5)
                                     / (tokc.tc + 0.5 * voc.v))))
                   / sum(tf.tf) AS score
            FROM tf
            CROSS JOIN cls
            LEFT JOIN cwc ON cwc.term = tf.term AND cwc.cls = cls.cls
            JOIN tokc ON tokc.cls = cls.cls
            JOIN pri ON pri.cls = cls.cls, voc, tot
            GROUP BY tf.doc_id, tf.lang, cls.cls, pri.n_docs, tot.n, voc.v
        ), r AS (
            SELECT doc_id, lang, cls, round(score, 6) AS score,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY round(score, 6) DESC, cls
                   ) AS rn
            FROM sc
        )
        SELECT doc_id, lang, cls AS pred_lang, score,
               (lang = cls) AS correct
        FROM r WHERE rn = 1
    """,
    doc="Multinomial Naive Bayes language classifier, trained AND "
        "applied entirely as DataFrame aggregations — zero driver "
        "state, the complement of logistic_regression_gd_steps (which "
        "collects a gradient vector per step). Train: class priors, "
        "add-0.5-smoothed token likelihoods P(w|c), corpus vocabulary "
        "size. Apply: per-(doc, class) mean token log-likelihood plus "
        "length-normalized log prior; argmax over the 6dp-rounded "
        "score (class-name tiebreak) predicts the language. Scale "
        "shape: the model IS a (vocab x classes) count table joined "
        "back on the token key — shuffles carry dictionary keys and "
        "per-doc partials, never the corpus; class constants ride "
        "5-row/1-row broadcasts. Length normalization (divide by doc "
        "token count) keeps the score O(10) so 6dp rounding absorbs "
        "cross-engine ln/summation ulps — the bigram_lm_logprob_quality "
        "argument — and leaves the per-doc argmax unchanged "
        "(SURVEY.md 2.12 training [EXT]; cf. Spark MLlib NaiveBayes, "
        "re-expressed as pure relational algebra). Honesty note: the "
        "synthetic testdata draws text and lang independently, so "
        "accuracy here sits at the majority prior — the oracle checks "
        "the posterior math; the planted separable-vocabulary unit "
        "test checks that the operator actually learns.",
    tags=("llm", "training", "classifier"),
)
def naive_bayes_train_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _naive_bayes_predict(_t(spark, sf_dir, "documents"))


def _naive_bayes_predict(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Train-and-apply multinomial NB over ``docs`` (doc_id, lang,
    text): returns (doc_id, lang, pred_lang, score, correct) with one
    row per tokenizable document. ``alpha`` is the Laplace/Lidstone
    smoothing mass (exposed for the scale tool's replication trick:
    an r-times-replicated corpus scored with alpha*r reproduces the
    base corpus' scores exactly, since (rc+ra)/(rt+raV)=(c+a)/(t+aV))."""
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id", "lang", F.explode(TS.tokens("text")).alias("term")
    ).localCheckpoint(eager=True)  # 4 downstream branches, one tokenize
    tf = tok.groupBy("doc_id", "lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    # one docs scan feeds all three class-constant sides: classes and
    # the doc total are derived from the |classes|-row prior table
    pri = docs.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_docs")
    ).localCheckpoint(eager=True)
    classes = pri.select("cls")
    tot = pri.agg(F.sum("n_docs").cast("double").alias("n_total"))
    cwc = tok.groupBy("term", F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tokc = tok.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).cast("double").alias("tc")
    )
    voc = tok.agg(F.count_distinct("term").cast("double").alias("v"))
    # pack the per-term class counts into ONE map row per term, join tf
    # on the token key, and fan out to the 5 classes AFTER the join —
    # the dictionary-keyed shuffle carries tf rows, not tf x classes
    # (measured 5x fewer shuffle records at the 100x-replica point,
    # where the estimated cwc side outgrows the broadcast threshold and
    # the join goes SMJ); absent (w, c) pairs fall back to the
    # smoothing floor via the map-miss null -> coalesce(0)
    cmap = cwc.groupBy("term").agg(
        F.map_from_entries(F.collect_list(F.struct("cls", "c"))).alias("cmap")
    )
    j = (
        tf.join(cmap, "term")
        .crossJoin(F.broadcast(classes))
        .join(F.broadcast(tokc), "cls")
        .crossJoin(F.broadcast(voc))
    )
    ll = F.col("tf") * F.log(
        (
            F.coalesce(F.element_at("cmap", F.col("cls")), F.lit(0)).cast("double")
            + F.lit(alpha)
        )
        / (F.col("tc") + F.lit(alpha) * F.col("v"))
    )
    sc = (
        j.groupBy("doc_id", "lang", "cls")
        .agg(F.sum(ll).alias("sll"), F.sum("tf").alias("n"))
        .join(F.broadcast(pri), "cls")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            "cls",
            F.round(
                (F.log(F.col("n_docs").cast("double") / F.col("n_total"))
                 + F.col("sll"))
                / F.col("n"),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "cls")
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("cls").alias("pred_lang"),
            "score",
            (F.col("lang") == F.col("cls")).alias("correct"),
        )
    )


@register(
    "distributed_topk_tput_bounds",
    oracle="""
        WITH tok AS (
            SELECT doc_id % 8 AS node,
                   unnest(list_filter(string_split(text, ' '), x -> x != '')) AS term
            FROM documents
        ), loc AS (
            SELECT node, term, count(*) AS c FROM tok GROUP BY 1, 2
        ), ranked AS (
            SELECT node, term, c,
                   row_number() OVER (PARTITION BY node ORDER BY c DESC, term) AS rn
            FROM loc
        ), reported AS (
            SELECT node, term, c FROM ranked WHERE rn <= 40
        ), tau AS (
            SELECT node, COALESCE(max(CASE WHEN rn = 40 THEN c END), 0) AS tau
            FROM ranked GROUP BY node
        ), cand AS (
            SELECT DISTINCT term FROM reported
        ), grid AS (
            SELECT cand.term, tau.node, tau.tau FROM cand CROSS JOIN tau
        ), bounds AS (
            SELECT g.term,
                   CAST(sum(COALESCE(r.c, 0)) AS BIGINT) AS lower_bound,
                   CAST(sum(COALESCE(r.c, g.tau)) AS BIGINT) AS upper_bound
            FROM grid g
            LEFT JOIN reported r ON r.node = g.node AND r.term = g.term
            GROUP BY g.term
        ), exact AS (
            SELECT t.term, CAST(count(*) AS BIGINT) AS exact_count
            FROM tok t JOIN cand USING (term)
            GROUP BY t.term
        ), tail AS (
            SELECT CAST(sum(tau) AS BIGINT) AS tail_cap FROM tau
        )
        SELECT b.term, e.exact_count, b.lower_bound, b.upper_bound,
               (b.lower_bound <= e.exact_count
                AND e.exact_count <= b.upper_bound) AS bounds_ok,
               tail.tail_cap,
               (e.exact_count > tail.tail_cap) AS membership_certified
        FROM bounds b JOIN exact e USING (term), tail
        ORDER BY e.exact_count DESC, b.term
        LIMIT 20
    """,
    doc="Two-round distributed top-k with certified bounds (the "
        "TPUT/threshold-algorithm family, Cao & Wang PODC'04): round 1 "
        "ships only each node's local top-40 (terms + counts) plus its "
        "threshold tau = the 40th local count; round 2 fetches exact "
        "counts for the candidate union only. For every candidate the "
        "shipped partials give lower <= exact <= upper (upper caps "
        "non-reporting nodes at their tau), and exact > sum(tau) "
        "certifies top-k membership from round-1 data alone, since any "
        "term NO node reported is globally bounded by sum(tau). Nodes "
        "are simulated as doc_id % 8 so the oracle replays the exact "
        "same placement; all math is integer, hash-stable. Scale "
        "shape: the full term dictionary is aggregated per node but "
        "NEVER crosses nodes — the inter-node shuffle is m*P candidate "
        "rows plus a broadcast semi-join fetch, the whole point of the "
        "protocol at 100 TB where the tail dictionary dwarfs the "
        "head. Here a node's top-m is a window over its local counts; "
        "on a real cluster the same role is played by the map-side "
        "partial agg feeding a size-m heap (SURVEY.md 2.6 O3 [EXT] "
        "scale path).",
    tags=("llm", "text", "topk", "sketch"),
)
def distributed_topk_tput_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        (F.col("doc_id") % 8).alias("node"),
        F.explode(TS.tokens("text")).alias("term"),
    )
    return _tput_topk(tok, m=40, k=20)


def _tput_topk(tok: DataFrame, m: int, k: int) -> DataFrame:
    """TPUT two-round top-k over ``tok`` (node, term): round 1 ships
    each node's local top-m and its threshold tau; round 2 fetches
    exact counts for the candidate union. Returns the exact top-k with
    the round-1 [lower, upper] bound pair, the global tail cap
    sum(tau), and the membership certificate exact > sum(tau)."""
    from pyspark.sql import Window

    local = (
        tok.groupBy("node", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # feeds reported + tau + nothing else
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), "term")
    ranked = local.withColumn("rn", F.row_number().over(w))
    reported = ranked.filter(F.col("rn") <= m).select("node", "term", "c")
    # tau = the m-th local count; a node with < m distinct terms reported
    # everything it has, so its cap for unreported terms is exactly 0
    tau = ranked.groupBy("node").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == m, F.col("c"))), F.lit(0).cast("long")
        ).alias("tau")
    )
    cand = reported.select("term").distinct()
    grid = cand.crossJoin(F.broadcast(tau))  # |cand| x 8, both sides tiny
    bounds = (
        grid.join(reported, ["node", "term"], "left")
        .groupBy("term")
        .agg(
            F.sum(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("lower_bound"),
            F.sum(F.coalesce(F.col("c"), F.col("tau"))).cast("long").alias("upper_bound"),
        )
    )
    # round 2: exact counts for candidates only — the semi-join pushes the
    # candidate filter below the groupBy, so the second pass aggregates
    # the head terms, not the dictionary tail
    exact = (
        tok.join(F.broadcast(cand), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    tail = tau.agg(F.sum("tau").cast("long").alias("tail_cap"))
    return (
        bounds.join(exact, "term")
        .crossJoin(F.broadcast(tail))
        .orderBy(F.desc("exact_count"), "term")
        .limit(k)
        .select(
            "term",
            "exact_count",
            "lower_bound",
            "upper_bound",
            (
                (F.col("lower_bound") <= F.col("exact_count"))
                & (F.col("exact_count") <= F.col("upper_bound"))
            ).alias("bounds_ok"),
            "tail_cap",
            (F.col("exact_count") > F.col("tail_cap")).alias("membership_certified"),
        )
    )


@register(
    "hybrid_rrf_retrieval",
    oracle="""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
            FROM documents
        ), dl AS (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks
        ), stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
        ), tf AS (
            SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
            WHERE term IN ('spark','join','filter') GROUP BY doc_id, term
        ), idf AS (
            SELECT term, ln(1.0 + (s.n_docs - df + 0.5) / (df + 0.5)) AS idf
            FROM (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
                 stats s
        ), contrib AS (
            SELECT tf.doc_id, tf.term,
                   idf.idf * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats s
        ), lex AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY
                       coalesce(sum(CASE WHEN term = 'spark'  THEN c END), 0)
                     + coalesce(sum(CASE WHEN term = 'join'   THEN c END), 0)
                     + coalesce(sum(CASE WHEN term = 'filter' THEN c END), 0) DESC,
                       doc_id) AS lex_rank
            FROM contrib GROUP BY doc_id
            QUALIFY lex_rank <= 50
        ), q AS (
            SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0
        ), dense AS (
            SELECT vec_id AS doc_id,
                   row_number() OVER (ORDER BY
                       list_dot_product(q.qvec, e.embedding::DOUBLE[]) /
                       (sqrt(list_dot_product(q.qvec, q.qvec)) *
                        sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))) DESC,
                       vec_id) AS dense_rank
            FROM embeddings e, q
            WHERE e.vec_id != 0
            QUALIFY dense_rank <= 50
        ), fused AS (
            SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
                   l.lex_rank, d.dense_rank,
                   COALESCE(1.0 / (60 + l.lex_rank), 0.0)
                 + COALESCE(1.0 / (60 + d.dense_rank), 0.0) AS rrf
            FROM lex l FULL OUTER JOIN dense d USING (doc_id)
        )
        SELECT doc_id, lex_rank, dense_rank,
               round(rrf, 6) AS rrf_score,
               CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT)
                   AS fused_rank
        FROM fused QUALIFY fused_rank <= 20
    """,
    doc="Hybrid retrieval via reciprocal-rank fusion (Cormack et al. "
        "SIGIR'09, the standard sparse+dense combiner in RAG stacks): "
        "BM25 top-50 for {spark, join, filter} fused with cosine "
        "top-50 against doc 0's embedding by "
        "rrf = sum 1/(60+rank), full-outer on doc_id so an item "
        "missing from one ranker keeps its other leg (the testdata has "
        "embeddings for only a prefix of the corpus at sf0.1 — exactly "
        "the partial-coverage case RRF absorbs). Determinism: both "
        "legs rank on raw doubles that are bit-identical cross-engine "
        "(BM25's fixed-order conditional sums; the pinned left-fold "
        "dot product), and the fused score is a two-term fixed-order "
        "sum of exact rationals 1/(60+r). Scale shape: each leg is "
        "already scale-shaped (inverted index / broadcast query); the "
        "fusion itself joins two <=50-row sides — driver-free and "
        "constant-cost no matter the corpus (SURVEY.md 2.11 "
        "retrieval [EXT]).",
    tags=("llm", "retrieval", "similarity"),
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = bm25_over(docs, k=50).select("doc_id", F.col("rank").alias("lex_rank"))
    dense = S.cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=50).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("dense_rank")
    )
    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        (
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("dense_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= 20)
        .select(
            "doc_id",
            "lex_rank",
            "dense_rank",
            F.round("rrf", 6).alias("rrf_score"),
            "fused_rank",
        )
    )


_ADA_ORACLE_ROUND = """
        , e{r} AS (
            SELECT c.f, c.t, c.s,
                   sum(CASE WHEN (CASE WHEN (CASE c.f WHEN 1 THEN w.x1
                                             WHEN 2 THEN w.x2
                                             ELSE w.x3 END) > c.t
                                  THEN c.s ELSE -c.s END) != w.y
                            THEN w.w ELSE 0 END) AS e,
                   sum(w.w) AS tot
            FROM w{r} w CROSS JOIN cands c GROUP BY c.f, c.t, c.s
        ), b{r} AS (
            SELECT f, t, s, e, tot FROM e{r} ORDER BY e, f, t, s LIMIT 1
        ), w{n} AS (
            SELECT w.doc_id, w.y, w.x1, w.x2, w.x3,
                   w.w * (CASE WHEN (CASE WHEN (CASE b.f WHEN 1 THEN w.x1
                                                WHEN 2 THEN w.x2
                                                ELSE w.x3 END) > b.t
                                     THEN b.s ELSE -b.s END) = w.y
                          THEN b.e ELSE b.tot - b.e END) AS w
            FROM w{r} w, b{r} b
        )
"""

_ADA_ORACLE_OUT = """
            SELECT {r} AS round,
                   CASE f WHEN 1 THEN 'spark' WHEN 2 THEN 'data'
                          ELSE 'slow' END AS feature,
                   t AS threshold, s AS sign,
                   CAST(e AS BIGINT) AS err_num,
                   CAST(tot AS BIGINT) AS total_weight,
                   round(0.5 * ln(CAST(tot - e AS DOUBLE) / e), 6) AS alpha
            FROM b{r}
"""


@register(
    "adaboost_stumps_train",
    oracle="""
        WITH feat AS (
            SELECT doc_id,
                   CASE WHEN n_chars > 250 THEN 1 ELSE -1 END AS y,
                   CAST(len(list_filter(toks, x -> x = 'spark')) AS BIGINT) AS x1,
                   CAST(len(list_filter(toks, x -> x = 'data')) AS BIGINT) AS x2,
                   CAST(len(list_filter(toks, x -> x = 'slow')) AS BIGINT) AS x3
            FROM (SELECT doc_id, n_chars,
                         list_filter(string_split(text, ' '), x -> x != '') AS toks
                  FROM documents)
        ), cands AS (
            SELECT f, t, s
            FROM (VALUES (1), (2), (3)) ff(f),
                 (VALUES (0), (1), (2), (3)) tt(t),
                 (VALUES (1), (-1)) ss(s)
        ), w1 AS (
            SELECT doc_id, y, x1, x2, x3, CAST(1 AS HUGEINT) AS w FROM feat
        )"""
    + _ADA_ORACLE_ROUND.format(r=1, n=2)
    + _ADA_ORACLE_ROUND.format(r=2, n=3)
    + _ADA_ORACLE_ROUND.format(r=3, n=4)
    + _ADA_ORACLE_OUT.format(r=1)
    + " UNION ALL "
    + _ADA_ORACLE_OUT.format(r=2)
    + " UNION ALL "
    + _ADA_ORACLE_OUT.format(r=3),
    doc="AdaBoost over decision stumps, 3 unrolled boosting rounds — "
        "the sequential-reweighting training loop (Freund & Schapire "
        "'97) the GD/ALS/OLS family lacks. The integer-weight "
        "formulation makes it oracle-exact: weights start at 1 and "
        "update multiplicatively (correct x E, misclassified x (T-E), "
        "where E/T is the round's weighted error) — the SAME weight "
        "ratio trajectory as the canonical exp(+-alpha) update but in "
        "pure 64-bit-safe integer arithmetic, so every candidate "
        "stump's weighted error is an EXACT integer, the argmin is "
        "deterministic (tie-break feature/threshold/sign), and the "
        "one float in the output (alpha = ln((T-E)/E)/2) divides two "
        "exact integers identically cross-engine. Scale shape: each "
        "round is one partial-agg shuffle of 24 candidate sums (the "
        "24-stump grid rides a broadcast literal; the feature table "
        "never moves), the argmin collect is O(1), and the reweight is "
        "a scan-side projection behind a per-round eager checkpoint — "
        "the bpe_multi_merge_rounds iteration discipline. After each "
        "round the chosen stump's error under the NEW weights is "
        "exactly total/2 (the AdaBoost orthogonality invariant, "
        "asserted in pytest). Weights ride DECIMAL(38,0) — the integer "
        "products outgrow 2^63 by round 3 at sf0.1, and 38 exact "
        "digits cover k=3 with two orders to spare on both engines "
        "(SURVEY.md 2.12 training [EXT]).",
    tags=("llm", "training", "boosting"),
)
def adaboost_stumps_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    rounds = _adaboost_train(_ada_features(docs), k=3)
    out = spark.createDataFrame(
        rounds,
        "round int, feature string, threshold int, sign int, "
        "err_num long, total_weight long, alpha double",
    )
    # F.round (HALF_UP) — not Python round() (banker's) — to match SQL
    return out.select(
        "round", "feature", "threshold", "sign", "err_num", "total_weight",
        F.round("alpha", 6).alias("alpha"),
    )


def _ada_features(docs: DataFrame) -> DataFrame:
    """(doc_id, y in {-1,+1}, x1..x3 integer probe-term counts) — the
    long-document label over the _GD_TERMS count features."""
    toks = docs.select("doc_id", "n_chars", TS.tokens("text").alias("toks"))
    return toks.select(
        "doc_id",
        F.when(F.col("n_chars") > 250, 1).otherwise(-1).alias("y"),
        *[
            F.size(F.filter("toks", (lambda term: lambda t: t == term)(term)))
            .cast("long")
            .alias(f"x{i}")
            for i, term in enumerate(_GD_TERMS, 1)
        ],
    )


def _ada_x(f: int):
    return F.col(f"x{f}")  # f is a compile-time-constant feature index


def _adaboost_train(feat: DataFrame, k: int = 3) -> list:
    """Integer-weight AdaBoost loop. Returns one (round, feature_name,
    threshold, sign, err_num, total_weight, alpha) tuple per round;
    raises if a stump is perfect (E=0) or anti-perfect (E=T), where
    the multiplicative integer update degenerates (alpha infinite)."""
    import math

    spark = feat.sparkSession
    cands = spark.createDataFrame(
        [(f, t, s) for f in (1, 2, 3) for t in (0, 1, 2, 3) for s in (1, -1)],
        "f int, t int, s int",
    )
    # DECIMAL(38,0) weights: integer products of per-round factors grow
    # past 2^63 by round 3 at sf0.1 (w <= prod T_r), and decimal keeps
    # them exact to 38 digits on both engines (DuckDB sums to HUGEINT)
    w = feat.withColumn("w", F.lit(1).cast("decimal(38,0)")).localCheckpoint(
        eager=True
    )
    out = []
    for r in range(1, k + 1):
        x = (
            F.when(F.col("f") == 1, F.col("x1"))
            .when(F.col("f") == 2, F.col("x2"))
            .otherwise(F.col("x3"))
        )
        h = F.when(x > F.col("t"), F.col("s")).otherwise(-F.col("s"))
        best = (
            w.crossJoin(F.broadcast(cands))
            .groupBy("f", "t", "s")
            .agg(
                F.sum(F.when(h != F.col("y"), F.col("w")).otherwise(F.lit(0)))
                .cast("decimal(38,0)").alias("e"),
                F.sum("w").cast("decimal(38,0)").alias("tot"),
            )
            .orderBy("e", "f", "t", "s")
            .limit(1)
            .collect()[0]
        )
        e_num, tot = int(best["e"]), int(best["tot"])
        # The output schema carries err_num/total_weight as BIGINT while
        # the training loop keeps weights in DECIMAL(38,0) precisely
        # because the multiplicative products outgrow 2^63 (by round 3
        # at sf0.1 the WEIGHTS do; the emitted per-round SUMS stay well
        # under int64 for k<=3 on this corpus). Guard the narrowing
        # explicitly instead of letting createDataFrame overflow later:
        if tot >= 2**63:
            raise OverflowError(
                f"round {r}: total_weight {tot} exceeds int64 — the "
                "BIGINT output schema only has headroom for k<=3 rounds "
                "at this corpus size; widen the output to decimal(38,0) "
                "before raising k"
            )
        if not 0 < e_num < tot:
            raise ValueError(
                f"round {r}: stump error {e_num}/{tot} is degenerate — "
                "integer AdaBoost needs 0 < E < T (alpha would be infinite)"
            )
        out.append(
            (
                r, _GD_TERMS[best["f"] - 1], best["t"], best["s"],
                e_num, tot, 0.5 * math.log((tot - e_num) / e_num),
            )
        )
        if r == k:
            break  # the final round's reweight is never consumed
        hb = F.when(
            _ada_x(best["f"]) > F.lit(best["t"]), F.lit(best["s"])
        ).otherwise(F.lit(-best["s"]))
        w = w.withColumn(
            "w",
            F.when(hb == F.col("y"), F.col("w") * F.lit(e_num)).otherwise(
                F.col("w") * F.lit(tot - e_num)
            ).cast("decimal(38,0)"),
        ).localCheckpoint(eager=True)
    return out
