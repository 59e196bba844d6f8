"""Curation / pipeline family (§2.11): deterministic splits & corpus shuffle, sequence packing, source mixtures, shard manifests, sampling, k-anonymity, PII scrub, domain caps, multimodal feature extraction, end-to-end curation summary, recursive-CTE & LATERAL shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...operators import dedup as D
from ...operators import multimodal as M
from ...operators import similarity as S
from ...operators import textstats as TS
from ..core import _t
from ..registry import register


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
    "document_chunk_stride",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x != '') AS toks
            FROM documents
        ),
        s AS (
            SELECT doc_id, toks, CAST(u.s AS BIGINT) AS start_tok
            FROM t, unnest(generate_series(1, len(toks), 48)) AS u(s)
        )
        SELECT doc_id,
               CAST((start_tok - 1) // 48 AS BIGINT) AS chunk_id,
               start_tok,
               CAST(LEAST(64, len(toks) - start_tok + 1) AS BIGINT) AS n_tok,
               md5(array_to_string(
                   list_slice(toks, start_tok, start_tok + 63), ' '
               )) AS chunk_key
        FROM s
    """,
    doc="Fixed-length overlapping chunking of documents into training "
        "windows (64 tokens, stride 48 = 25% overlap) — the step between "
        "curation and sequence packing in a pretraining pipeline: chunk "
        "starts explode map-side from one sequence(), the chunk itself is "
        "an array slice, and chunk_key = md5(joined tokens) proves the "
        "exact chunk CONTENT matches across engines, not just the "
        "arithmetic. No shuffle anywhere — explode + slice are narrow, so "
        "the operator streams at scan speed over any corpus size; "
        "downstream packing (greedy_sequence_packing) consumes (chunk_id, "
        "n_tok) directly (§2.11 curation).",
    tags=("llm", "curation", "chunking"),
)
def document_chunk_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # tokenless docs chunk to nothing; filter BEFORE the sequence —
    # Spark's sequence(1, 0, 48) raises (illegal boundaries) where
    # SQL generate_series(1, 0, 48) is simply empty
    base = (
        docs.select("doc_id", TS.tokens("text").alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= 1)
    )
    s = base.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(1), F.col("n"), F.lit(48))).alias("start_tok"),
    )
    return s.select(
        "doc_id",
        ((F.col("start_tok") - 1) / 48).cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(F.lit(64), F.col("n") - F.col("start_tok") + 1)
        .cast("long")
        .alias("n_tok"),
        F.md5(
            F.array_join(F.slice("toks", F.col("start_tok"), F.lit(64)), " ")
        ).alias("chunk_key"),
    )


@register(
    "language_id_ngram_classifier",
    oracle="""
        WITH train AS (
            SELECT lang, text FROM documents WHERE doc_id % 2 = 0
        ),
        tg AS (
            SELECT lang, substr(text, CAST(u.pos AS INT), 3) AS g
            FROM train, unnest(generate_series(1, length(text) - 2)) AS u(pos)
        ),
        prof AS (
            SELECT lang, g FROM (
                SELECT lang, g,
                       row_number() OVER (
                           PARTITION BY lang ORDER BY count(*) DESC, g
                       ) AS rn
                FROM tg GROUP BY lang, g
            ) WHERE rn <= 50
        ),
        test AS (
            SELECT doc_id, lang AS true_lang, text
            FROM documents WHERE doc_id % 2 = 1
        ),
        dg AS (
            SELECT doc_id, substr(text, CAST(u.pos AS INT), 3) AS g
            FROM test, unnest(generate_series(1, length(text) - 2)) AS u(pos)
        ),
        langs AS (SELECT DISTINCT lang FROM prof),
        raw_hits AS (
            SELECT dg.doc_id, p.lang, CAST(count(*) AS BIGINT) AS hits
            FROM dg JOIN prof p ON p.g = dg.g
            GROUP BY dg.doc_id, p.lang
        ),
        scored AS (
            SELECT t.doc_id, t.true_lang, l.lang,
                   COALESCE(h.hits, 0) AS hits
            FROM test t CROSS JOIN langs l
            LEFT JOIN raw_hits h ON h.doc_id = t.doc_id AND h.lang = l.lang
        ),
        pred AS (
            SELECT doc_id, true_lang, lang AS pred_lang,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY hits DESC, lang
                   ) AS rn
            FROM scored
        )
        SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM pred WHERE rn = 1
        GROUP BY true_lang, pred_lang
    """,
    doc="Character-trigram language identification (the Cavnar-Trenkle "
        "n-gram profile heuristic the mandate names): per-language "
        "profiles = top-50 trigrams of the labeled half (top-k per group "
        "— WindowGroupLimit shape, partitions = languages), test docs "
        "score by profile-trigram occurrence count per language and "
        "predict the argmax (ties broken by language name), output the "
        "confusion matrix. Trigram explode is map-side; scoring is one "
        "join against the broadcast-size profile; the per-doc argmax "
        "window partitions on doc_id (5-row partitions). HONEST NOTE: "
        "the synthetic corpus draws every language from ONE shared "
        "vocabulary, so accuracy here is chance-level by construction — "
        "the oracle certifies the exact profile build + scoring "
        "arithmetic, which is the operator.",
    tags=("llm", "text", "curation", "classification"),
)
def language_id_ngram_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ...checkpointing import pin
    from ...partitioning import fan_out

    # both halves pay a full char-trigram explode scan-side — parallelize
    # it instead of serializing on the input's split count (guide §2.5)
    docs = fan_out(_t(spark, sf_dir, "documents"))
    # sub-trigram docs emit no grams on either engine: generate_series
    # (1, length-2) is empty for length < 3 in SQL, but Spark's
    # sequence() would DESCEND — filter before the explode
    train = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .filter(F.length("text") >= 3)
        .select("lang", "text")
    )
    tg = train.select(
        "lang",
        F.explode(F.sequence(F.lit(1), F.length("text") - 2)).alias("pos"),
        F.col("text").alias("__t"),
    ).select("lang", F.expr("substring(__t, pos, 3)").alias("g"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "g")
    prof = (
        tg.groupBy("lang", "g")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("lang", "g")
        # prof feeds TWO consumers (the scoring join and the langs
        # dictionary): un-pinned, Catalyst re-runs the whole train-side
        # explode+count+window chain once per consumer (the before-plan
        # shows the duplicated subtree). It is a <=|langs|*50-row frame —
        # pin it so the train half is scanned once (guide §2.4/§5).
        .transform(pin)
    )
    test = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.col("lang").alias("true_lang"), "text"
    )
    dg = test.filter(F.length("text") >= 3).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text") - 2)).alias("pos"),
        F.col("text").alias("__t"),
    ).select("doc_id", F.expr("substring(__t, pos, 3)").alias("g"))
    raw_hits = (
        dg.join(F.broadcast(prof), "g")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("hits"))
    )
    # r12 argmax rewrite: every raw_hits row has hits >= 1, so a
    # zero-filled language can only win when a doc has NO hits at all —
    # the x|langs| crossJoin + left join + per-doc row_number window
    # reduce to ONE struct-min aggregate over raw_hits (min of
    # (-hits, lang) == hits desc then lang asc, the window's exact
    # order) plus a left join whose null side falls back to the
    # alphabetically-first language, the same row the old window
    # elected from the all-zero partition. Guide §2.4: the window
    # shuffle, the x5 row expansion and one join disappear; confusion
    # matrix identical (interleaved A/B at sf0.1: 4.06 -> 3.38s median).
    perdoc = raw_hits.groupBy("doc_id").agg(
        F.min(F.struct((-F.col("hits")).alias("neg"), F.col("lang").alias("lang")))
        .alias("m")
    )
    first_lang = prof.agg(F.min("lang").alias("__ml"))
    pred = (
        test.select("doc_id", "true_lang")
        .join(perdoc, "doc_id", "left")
        .crossJoin(F.broadcast(first_lang))
        .select(
            "true_lang",
            F.coalesce(F.col("m.lang"), F.col("__ml")).alias("pred_lang"),
        )
        # empty-profile degenerate parity: the old crossJoin(langs)
        # emitted nothing when no language profile existed
        .filter(F.col("pred_lang").isNotNull())
    )
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "quality_threshold_keep_rate",
    oracle="""
        WITH scored AS (
            SELECT doc_id, source,
                   CAST(length(text) AS DOUBLE)
                   / len(list_filter(string_split(text, ' '), t -> t != ''))
                       AS score
            FROM documents
        ),
        ranked AS (
            SELECT score,
                   row_number() OVER (ORDER BY score, doc_id) AS rn
            FROM scored
        ),
        n AS (SELECT max(rn) AS n FROM ranked),
        thr AS (
            SELECT score AS threshold FROM ranked
            WHERE rn = GREATEST((3 * (SELECT n FROM n) + 9) // 10, 1)
        )
        SELECT s.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN s.score >= t.threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               round(CAST(sum(CASE WHEN s.score >= t.threshold
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 6) AS keep_rate,
               t.threshold
        FROM scored s CROSS JOIN thr t
        GROUP BY s.source, t.threshold
    """,
    doc="Calibrated quality gating — the composition a curation pipeline "
        "actually runs: score every document (chars per token — a "
        "Gopher-style signal), set the cut at the EXACT 30th percentile "
        "of the corpus score distribution "
        "(operators/ranking.exact_percentiles: range-partitioned ranked "
        "pass + Fraction-exact integer rank, never a global sort), then "
        "report per-source keep rates against the broadcast scalar "
        "threshold. Calibrating the threshold to a target keep rate "
        "instead of hand-picking a constant is what keeps the gate "
        "stable as the corpus mix drifts; the whole thing is one ranked "
        "pass + one scan (§2.11 curation).",
    tags=("llm", "curation", "quality", "percentile"),
)
def quality_threshold_keep_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ...operators.ranking import exact_percentiles

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        (
            F.length("text").cast("double") / F.size(TS.tokens("text"))
        ).alias("score"),
    )
    thr = (
        exact_percentiles(scored, "score", [0.3])
        .select(F.col("value").alias("threshold"))
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("source", "threshold")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("score") >= F.col("threshold"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            F.round(
                F.col("n_kept").cast("double") / F.col("n_docs"), 6
            ).alias("keep_rate"),
            "threshold",
        )
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
    from ...operators.sampling import train_val_test_split

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
    from ...operators.sampling import hash_bucket

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
    from ...operators.ranking import global_row_number

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
    from ...operators.sampling import train_val_test_split

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
    from ...operators.ranking import grouped_running_sum

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
    from ...operators.sampling import stratified_sample

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
    from ...operators.sampling import reservoir_per_group

    ev = _t(spark, sf_dir, "events").select("event_type", "event_id")
    return reservoir_per_group(ev, "event_type", "event_id", k=5, salt="rsv")

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
    from ...operators.sampling import weighted_sample_per_group

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
    from ...operators.sampling import md5_uniform

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
    "heavy_hitter_tokens",
    oracle="""
        WITH toks AS (
            SELECT unnest(list_filter(string_split(text, ' '), t -> t != '')) AS tok
            FROM documents
        ),
        c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY tok)
        SELECT tok, cnt FROM c
        WHERE cnt * 30 > (SELECT count(*) FROM toks)
    """,
    doc="EXACT heavy-hitter tokens (frequency > N/30) via the "
        "Misra-Gries candidate/verify plan (operators/frequent.py): "
        "per-partition MG(k) sketches in one Arrow-batched pass (N rides "
        "the same pass), union of candidates broadcast back for an exact "
        "recount — the shuffle carries only candidate keys, never the "
        "distinct-token space the oracle's groupBy shuffles. Threshold "
        "cnt*k > N in exact integer arithmetic. LLM-data: stopword/"
        "boilerplate discovery over a corpus whose vocabulary exceeds "
        "executor memory.",
    tags=("llm", "sketch", "tokens", "scale"),
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ...operators.frequent import heavy_hitters_exact

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(TS.tokens("text")).alias("tok"))
    )
    return heavy_hitters_exact(toks, "tok", 30)


@register(
    "greedy_sequence_packing",
    oracle="""
        WITH RECURSIVE docs AS (
            SELECT doc_id,
                   CAST(doc_id % 8 AS BIGINT) AS shard,
                   CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS BIGINT) AS n_tok,
                   row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
            FROM documents
        ),
        pack AS (
            SELECT shard, rn, doc_id, n_tok,
                   CAST(0 AS BIGINT) AS bin, n_tok AS fill
            FROM docs WHERE rn = 1
            UNION ALL
            SELECT d.shard, d.rn, d.doc_id, d.n_tok,
                   CASE WHEN p.fill + d.n_tok > 256 THEN p.bin + 1 ELSE p.bin END,
                   CASE WHEN p.fill + d.n_tok > 256 THEN d.n_tok ELSE p.fill + d.n_tok END
            FROM pack p JOIN docs d ON d.shard = p.shard AND d.rn = p.rn + 1
        )
        SELECT doc_id, shard, bin, fill FROM pack
    """,
    doc="Greedy NO-SPLIT sequence packing (operators/packing.py): the "
        "other packing discipline next to sequence_packing_bins' "
        "concatenate-then-chunk — here a doc never crosses a bin "
        "boundary (needed when attention must not span documents), so "
        "the walk is an overflow-reset recurrence with a true sequential "
        "dependency (non-associative: no prefix-scan form). Docs shard "
        "by doc_id % 8 and each shard packs independently in one "
        "applyInPandas task; shard count is the parallelism knob. The "
        "oracle replays the identical walk as a recursive CTE, proving "
        "every (doc -> bin, fill) assignment.",
    tags=("llm", "curation", "packing", "applyInPandas"),
)
def greedy_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ...operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(TS.tokens("text")).cast("long").alias("n_tok")
    )
    return pack_sequences(docs, "doc_id", "n_tok", budget=256, n_shards=8)


# This module was split out of the former monolithic queries/llm.py (round 6);
# registry names and semantics are unchanged. Reference citations live in the
# individual docstrings.


@register(
    "rendezvous_shard_rebalance",
    oracle="""
        WITH ids AS (SELECT doc_id FROM documents),
        old_a AS (
            SELECT doc_id,
                   CAST(max(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(u.s AS VARCHAR)), 1, 14) AS BIGINT) AS BIGINT) * 16 + u.s) % 16 AS BIGINT) AS old_shard
            FROM ids, unnest(generate_series(0, 7)) AS u(s)
            GROUP BY doc_id
        ),
        new_a AS (
            SELECT doc_id,
                   CAST(max(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(u.s AS VARCHAR)), 1, 14) AS BIGINT) AS BIGINT) * 16 + u.s) % 16 AS BIGINT) AS new_shard
            FROM ids, unnest(generate_series(0, 8)) AS u(s)
            GROUP BY doc_id
        )
        SELECT o.old_shard, n.new_shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               (o.old_shard != n.new_shard) AS moved
        FROM old_a o JOIN new_a n USING (doc_id)
        GROUP BY o.old_shard, n.new_shard, moved
    """,
    doc="Rendezvous (highest-random-weight) shard assignment and the "
        "8 -> 9 shard rebalance movement matrix: per doc, argmax over "
        "candidate shards of md5(doc#shard) — encoded as ONE integer "
        "max (weight*16 + shard, 56-bit weights) so both engines state "
        "identical arithmetic, no argmax join. HRW's minimal-movement "
        "property is visible in the result: every moved doc lands on "
        "the NEW shard 8 (adding a shard only ever steals, never "
        "reshuffles between survivors) at ~1/9 of the corpus — the "
        "growth story for bucketed storage layouts without a full "
        "rewrite (§2.11 curation / lake ops).",
    tags=("llm", "curation", "sharding", "hashing"),
)
def rendezvous_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = _t(spark, sf_dir, "documents").select("doc_id")

    # shard-id field width of the weight*BASE + shard packing below;
    # the decode (% BASE) is only injective while n_shards <= BASE, so
    # a reuse beyond it must widen BASE (and the oracle's constant)
    _HRW_BASE = 16

    def assign(n_shards: int, out: str) -> DataFrame:
        if n_shards > _HRW_BASE:
            raise ValueError(
                f"rendezvous encoding packs shard ids into a base-"
                f"{_HRW_BASE} field; n_shards={n_shards} would alias"
            )
        cand = ids.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("s"),
        ).select(
            "doc_id",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("doc_id").cast("string"),
                                F.lit("#"),
                                F.col("s").cast("string"),
                            )
                        ),
                        1,
                        14,
                    ),
                    16,
                    10,
                ).cast("long")
                * F.lit(_HRW_BASE)
                + F.col("s")
            ).alias("key"),
        )
        return cand.groupBy("doc_id").agg(
            (F.max("key") % F.lit(_HRW_BASE)).cast("long").alias(out)
        )

    old = assign(8, "old_shard")
    new = assign(9, "new_shard")
    return (
        old.join(new, "doc_id")
        .withColumn("moved", F.col("old_shard") != F.col("new_shard"))
        .groupBy("old_shard", "new_shard", "moved")
        .agg(F.count("*").alias("n_docs"))
        .select("old_shard", "new_shard", "n_docs", "moved")
    )
