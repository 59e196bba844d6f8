"""Text-analysis column builders (SURVEY.md §2.11 [EXT]).

All pure Catalyst expressions (split/HOF/regexp) — no Python UDFs in
any hot path, so everything stays inside whole-stage codegen and scales
linearly with executors. The polynomial fold hash is implemented with
``aggregate`` over a char split; it is engine-portable (same arithmetic
reproduces in ANSI SQL via list_reduce), which is what lets minhash
signatures be oracle-verified rather than trusted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small english stopword list used for quality scoring and as one
# language profile; public-domain word list.
STOPWORDS_EN = (
    "the a an and or of to in is are was were be been it this that with",
)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # tiny marker profiles for the n-gram/stopword language-ID heuristic
    "en": ("the", "and", "of", "to", "in", "is", "a", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "que"),
    "zh": ("de", "shi", "bu", "le", "zai", "wo", "you", "he"),
}

HASH_MOD = 1_000_003  # prime modulus for the portable fold hash

# PII scrub patterns, kept to syntax shared by Java regex (Spark) and
# RE2 (DuckDB oracle) so redaction is engine-portable. Applied in tuple
# order — replacements must run in the SAME order everywhere, since an
# earlier rewrite can destroy a later pattern's match.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_redact(col: Column | str) -> Column:
    """Text with email/phone/IP spans replaced by typed placeholder
    tokens — the standard pre-training scrub pass. Pure regexp_replace
    chain: codegen'd, no shuffle, linear scan."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts on the ORIGINAL text (measured before
    any rewrite, so counts are order-independent)."""
    c = F.col(col) if isinstance(col, str) else col
    return {name: F.regexp_count(c, F.lit(pat)) for name, pat, _ in PII_PATTERNS}


def tokens(col: Column | str, delimiter: str = " ") -> Column:
    """Whitespace tokens with empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, delimiter), lambda t: t != F.lit(""))


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-ish subword segmentation: split on non-alphanumerics, then
    words longer than 6 chars contribute their 4-char prefix chunks —
    a deterministic stand-in for a real BPE vocab (which would ship as
    a broadcast lookup table)."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.lower(F.regexp_replace(c, "[^a-zA-Z0-9]+", " ")), " ")
    words = F.filter(words, lambda t: t != F.lit(""))
    return F.flatten(
        F.transform(
            words,
            lambda w: F.when(
                F.length(w) <= 6, F.array(w)
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(0), F.floor((F.length(w) - 1) / 4).cast("int")),
                    lambda i: F.substring(w, (i * 4 + 1).cast("int"), 4),
                )
            ),
        )
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def fold_hash(col: Column | str, seed: int) -> Column:
    """Portable polynomial hash: fold (acc*31 + ord(char)) % HASH_MOD
    over the characters, starting from ``seed``. Reproducible in ANSI
    SQL (list_reduce) — used where hash values must be oracle-checked.
    For engine-internal hashing (exact dedup buckets) prefer
    ``xxhash64`` (faster, 64-bit)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),
        F.lit(seed).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % HASH_MOD,
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the text."""
    toks = tokens(col)
    return F.array_distinct(
        F.when(
            F.size(toks) < n, F.array(F.concat_ws(" ", toks))
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i + 1, n)
                ),
            )
        )
    )


def word_ngrams(col: Column | str, n: int = 2) -> Column:
    """All word n-grams in document order, NON-distinct — repetition
    metrics need multiplicity. (``word_shingles`` is the distinct
    variant used by the similarity operators.) Texts with fewer than
    ``n`` tokens yield an empty array."""
    toks = tokens(col)
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def repetition_metrics(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 3,
):
    """Gopher-style repetition quality metrics (Rae et al. 2021, §A1.1
    filters): per document, (a) the fraction of the document's
    characters covered by occurrences of its single most frequent word
    ``top_n``-gram, and (b) the fraction of ``dup_n``-gram characters
    sitting in n-grams that occur more than once. High values flag
    boilerplate and degenerate repetitive text — the cheap filters a
    training-data pipeline runs before any model-based scoring.

    Ties for the top n-gram break to the lexicographically LARGEST
    n-gram (max count, then max string) — deterministic and cheap to
    mirror in ANSI SQL.

    Scale shape: explode → aggregate keyed by (id, ngram); map-side
    partial aggregation absorbs each document's repetition before the
    shuffle, so shuffled bytes ∝ distinct n-grams, and nothing is
    quadratic. Returns (id, top_ngram, top_ngram_frac, dup_ngram_frac).
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col),
        F.length(text_col).alias("__chars"),
        word_ngrams(text_col, top_n).alias("__top"),
        word_ngrams(text_col, dup_n).alias("__dup"),
    )
    top_counts = (
        base.select(id_col, "__chars", F.explode("__top").alias("ngram"))
        .groupBy(id_col, "__chars", "ngram")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cnt").desc(), F.col("ngram").desc())
    top = (
        top_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("ngram").alias("top_ngram"),
            F.round(
                (F.col("cnt") * F.length("ngram")).cast("double")
                / F.greatest(F.col("__chars"), F.lit(1)),
                6,
            ).alias("top_ngram_frac"),
        )
    )
    dup = (
        base.select(id_col, F.explode("__dup").alias("ngram"))
        .groupBy(id_col, "ngram")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("cnt") > 1, F.col("cnt") * F.length("ngram"))
                    .otherwise(F.lit(0))
                ).cast("double")
                / F.greatest(F.sum(F.col("cnt") * F.length("ngram")), F.lit(1)),
                6,
            ).alias("dup_ngram_frac")
        )
    )
    return (
        df.select(id_col)
        .join(top, id_col, "left")
        .join(dup, id_col, "left")
        .select(
            id_col,
            F.coalesce("top_ngram", F.lit("")).alias("top_ngram"),
            F.coalesce("top_ngram_frac", F.lit(0.0)).alias("top_ngram_frac"),
            F.coalesce("dup_ngram_frac", F.lit(0.0)).alias("dup_ngram_frac"),
        )
    )


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] | None = None) -> Column:
    sw = F.split(F.lit(stopwords[0] if stopwords else STOPWORDS_EN[0]), " ")
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def unique_token_ratio(col: Column | str) -> Column:
    toks = tokens(col)
    return F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")


def avg_token_length(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + vocabulary
    diversity + stopword presence (the C4/Gopher-style cheap filters,
    expressed as one Catalyst expression)."""
    toks = tokens(col)
    n = F.size(toks)
    len_ok = F.when((n >= 10) & (n <= 1000), 1.0).otherwise(0.0)
    diversity = unique_token_ratio(col)
    stop = stopword_ratio(col)
    stop_ok = F.when((stop > 0.0) & (stop < 0.6), 1.0).otherwise(0.5)
    return F.round((len_ok + diversity + stop_ok) / 3.0, 6)


def doc_fingerprint(col: Column | str, shingle_n: int = 3) -> Column:
    """Winnowing-style fingerprint: md5 of the lexicographically
    minimal shingle hash + full-text md5. Stable across engines."""
    return F.md5(F.concat_ws("|", F.array_min(word_shingles(col, shingle_n)), F.md5(col)))


def chunk_text(
    col: Column | str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> Column:
    """Overlapping token-window chunks — the long-document splitter a
    training pipeline runs before tokenization. Returns
    array<struct<chunk_idx int, chunk string>>; stride =
    chunk_tokens − overlap. Pure Catalyst HOFs (sequence/slice/
    concat_ws) — the chunk explode is scan-side, no shuffle."""
    toks = tokens(col)
    stride = max(1, chunk_tokens - overlap)
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - F.lit(overlap)).cast("double") / stride).cast("int"),
        F.lit(1),
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_tokens)).alias("chunk"),
        ),
    )


def positional_postings(df, id_col: str, text_col: str):
    """Positional inverted-index postings: one row (id, pos, tok) per
    token occurrence, 1-based positions. The index shape behind phrase
    and proximity queries — at scale it is written bucketed by token
    so phrase joins co-locate."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos0", "tok")
    ).select(id_col, (F.col("pos0") + 1).cast("long").alias("pos"), "tok")


def phrase_match(postings, id_col: str, phrase: str):
    """Exact phrase search over positional postings: intersect the
    phrase terms' posting lists on (doc, aligned position). Each join
    input is pre-filtered to ONE term (predicate reaches the scan), so
    only the phrase terms' postings are ever read or shuffled — the
    classic positional-index intersection, never a text rescan.
    Returns (id, start_pos) per occurrence."""
    from pyspark.sql import functions as F

    terms = [t for t in phrase.split(" ") if t]
    if not terms:
        raise ValueError("phrase must contain at least one term")
    base = postings.filter(F.col("tok") == terms[0]).select(
        id_col, F.col("pos").alias("start_pos")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = postings.filter(F.col("tok") == t).select(
            id_col, (F.col("pos") - i).alias("start_pos")
        )
        base = base.join(nxt, [id_col, "start_pos"])
    return base
