"""Distributed suffix ranking by prefix doubling (Manber & Myers 1990,
restated as the iterated sort-join the MapReduce/Spark literature uses
for terabyte-scale suffix arrays).

A suffix array over the corpus is the index behind substring-level
dedup (Lee et al. 2022 ExactSubstr), longest-repeated-substring
mining, and contamination scans. Building one at 100 TB cannot sort
full suffix strings (quadratic bytes in flight); prefix doubling sorts
fixed-size integer tuples log(maxlen) times instead:

1. **seed** — rank every suffix by its first ``w0`` characters: the
   distinct ``w0``-grams are globally ranked (range-partitioned
   two-pass ranking, ``operators/ranking.global_row_number`` — never a
   single-task window) and joined back. Rows in flight: (doc, pos,
   rank) — integers, never suffix strings.
2. **double** — a suffix's order-``2k`` rank is the dense rank of the
   pair (rank_k[pos], rank_k[pos+k]), with rank −1 when pos+k runs off
   the document (shorter suffix sorts first, matching plain string
   comparison). The successor rank arrives by an equi-join on
   (doc, pos+k); the pair table is dense-ranked the same two-pass way.
   Each round is therefore: one equi-join + one distinct + one global
   ranking — all hash/range-partitioned, no driver data.
3. **early exit** — when every suffix holds a distinct rank the order
   is final (random-ish text exits after 2-4 rounds); otherwise the
   doubling runs to k ≥ maxlen and remaining ties are IDENTICAL full
   suffixes, broken deterministically by (doc, pos).

Lineage is cut with :func:`..checkpointing.pin` every round (opt-in
reliable checkpoints for cluster fault tolerance, as everywhere).

Output: (id_col, pos, sa_rank) — sa_rank is the 1-based position of
the suffix in the sorted order of ALL corpus suffixes (ties by full
string equality broken by (doc, pos)), i.e. the inverse suffix array.
``pos`` is 1-based to match SQL ``substr``.

LCP at scale (round 8 — implemented as :func:`lcp_from_rank_tables`):
keep each doubling round's rank table (doc, pos) → rank over the first
``w`` characters (windows w0, 2·w0, 4·w0, …, K), and compute the LCP
of any suffix pair with the classic sparse-table walk:

- **identical-suffix branch**: equal rank at the TOP window means the
  suffixes are fully identical (all-distinct exit: no equal ranks
  exist; fixpoint/maxlen exit: remaining ties are identical full
  suffixes — the same soundness argument as the ranking itself), so
  LCP = min(suffix lengths) directly.
- **greedy walk** (non-identical): h = 0; for windows w from the
  second-largest DOWN to w0: if both suffixes' rank-at-position
  (pos + h) exist and are equal, the next w characters match — h += w.
  Equal rank with fewer than w characters remaining would force full
  suffix identity (truncated ranks encode length), excluded by the
  branch above, so every add is exact. Greedy binary decomposition
  over {K/2, …, w0} plus the sub-w0 residual covers every LCP < K.
- **residual** (< w0 characters): one zip_with char-compare of the two
  stored w0-grams — bounded bytes (≤ w0 per pair), never suffix tails.

Each window level costs two integer equi-joins of the pair table
against the level's rank table — O(log maxlen) lookups per pair, no
suffix strings in flight anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpointing import pin
from .ranking import global_row_number


@dataclass(frozen=True)
class SuffixArtifacts:
    """Per-round rank tables retained by ``suffix_ranks(...,
    retain_levels=True)`` for the rank-table LCP walk.

    ``levels``: ascending list of (window_chars, ranks) where ranks is
    (__doc, pos, r) — r is the dense rank of the suffix truncated to
    ``window_chars`` characters. ``grams``: (__doc, pos, __g) with the
    first ``w0`` characters of each suffix (the sub-w0 residual
    comparator). ``exact``: False iff a caller-supplied ``max_rounds``
    cut the doubling before the order was final — LCPs from such
    tables would under-count, so :func:`lcp_from_rank_tables` refuses.
    """

    levels: list[tuple[int, DataFrame]]
    grams: DataFrame
    w0: int
    exact: bool


def _dense_rank_pairs(
    pairs: DataFrame, cols: list[str]
) -> tuple[DataFrame, int]:
    """Dense-rank ``pairs`` (already distinct on ``cols``) by ``cols``
    via the two-pass range-partitioned ranking — row_number over a
    distinct set IS its dense rank. Returns ``(ranked, n_distinct)``:
    the cardinality of the distinct set falls out of the ranking's own
    per-partition count pass, so the doubling loop's fixpoint test
    costs zero extra Spark jobs (no per-round countDistinct action)."""
    return global_row_number(pairs, cols, out_col="__r", with_count=True)


def suffix_ranks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w0: int = 8,
    max_rounds: int | None = None,
    retain_levels: bool = False,
) -> DataFrame | tuple[DataFrame, SuffixArtifacts]:
    """Rank every suffix of every document globally (module docstring).
    Returns (id_col, pos long, sa_rank long); with
    ``retain_levels=True`` returns ``(result, SuffixArtifacts)`` so
    :func:`lcp_from_rank_tables` can compute LCPs without suffix bytes.

    ``max_rounds`` defaults to enough doublings to cover the LONGEST
    document (measured with one cheap agg) — a fixed cap would be a
    CORRECTNESS bug: exhausting the loop before k >= maxlen leaves
    non-identical suffixes tied, and the final (doc, pos) tie-break
    would order them arbitrarily. Pass an explicit value only to bound
    work when a downstream consumer tolerates prefix-only ordering."""
    import math

    # one row per suffix: (doc, pos, first-w0 characters). Empty/null
    # docs have no suffixes — they must be filtered BEFORE the explode:
    # Spark's sequence(1, 0) silently yields the DESCENDING [1, 0]
    # (positions 0 and 1 of an empty string), unlike SQL
    # generate_series(1, 0) which is empty.
    from pyspark.sql import Observation

    # r13: n_total and maxlen ride the suf pin's eager job as an
    # Observation — max(pos) over the suffix rows IS the longest
    # document's length (pos enumerates 1..len per doc), so the
    # separate count() and max(length) jobs are gone (guide §1.2).
    obs = Observation()
    suf = pin(
        df.filter(F.length(text_col) >= 1)
        .select(
            F.col(id_col).alias("__doc"),
            F.explode(F.sequence(F.lit(1), F.length(text_col))).alias("pos"),
            F.col(text_col).alias("__t"),
        )
        .select("__doc", "pos", F.expr(f"substring(__t, pos, {w0})").alias("__g"))
        .observe(obs, F.count(F.lit(1)).alias("n"), F.max("pos").alias("m"))
    )
    vals = obs.get  # blocks on the pin job just executed
    n_total = int(vals["n"] or 0)
    maxlen = int(vals["m"] or 1)
    explicit_cap = max_rounds is not None
    if max_rounds is None:
        # after r rounds the comparison window is w0 * 2^r; cover maxlen
        max_rounds = max(math.ceil(math.log2(max(maxlen, w0) / w0)) + 1, 1)

    # seed ranks from the w0-gram (dense: rank the DISTINCT grams).
    # distinct_r — the number of distinct ranks the current table
    # holds — is a free byproduct of each ranking pass (it numbers the
    # DISTINCT key set, so its row count IS the distinct-rank count);
    # reading it there saves one countDistinct Spark action per
    # doubling round (round-8 verdict item 2).
    grams, distinct_r = _dense_rank_pairs(suf.select("__g").distinct(), ["__g"])
    ranks = pin(
        suf.join(grams, "__g").select(
            "__doc", "pos", F.col("__r").cast("long").alias("r")
        )
    )
    levels: list[tuple[int, DataFrame]] = [(w0, ranks)]

    k = w0
    prev_distinct = -1
    clean_exit = False
    for _ in range(max_rounds):
        if distinct_r == n_total or distinct_r == prev_distinct:
            # all unique -> final; OR the partition refinement reached
            # its fixpoint (a round that splits no class never splits
            # one later: rank_2k classes are built from rank_k classes,
            # so an unchanged partition reproduces itself) — remaining
            # ties are IDENTICAL full suffixes, broken by (doc, pos).
            clean_exit = True
            break
        prev_distinct = distinct_r
        succ = ranks.select(
            "__doc",
            (F.col("pos") - F.lit(k)).alias("pos"),
            F.col("r").alias("r2"),
        )
        paired = (
            ranks.join(succ, ["__doc", "pos"], "left")
            .na.fill({"r2": -1})  # suffix shorter than 2k: sorts first
        )
        # the new table's distinct-rank count = the number of distinct
        # (r, r2) pairs that occur — exactly what this ranking numbers
        pair_ranks, distinct_r = _dense_rank_pairs(
            paired.select("r", "r2").distinct(), ["r", "r2"]
        )
        ranks = pin(
            paired.join(pair_ranks, ["r", "r2"]).select(
                "__doc", "pos", F.col("__r").cast("long").alias("r")
            )
        )
        levels.append((2 * k, ranks))
        k *= 2

    # total order: remaining equal ranks are identical full suffixes
    result = global_row_number(
        ranks, ["r", "__doc", "pos"], out_col="sa_rank"
    ).select(
        F.col("__doc").alias(id_col),
        F.col("pos").cast("long").alias("pos"),
        F.col("sa_rank"),
    )
    if not retain_levels:
        return result
    # exactness: the loop either broke cleanly (all-distinct/fixpoint)
    # or ran until the window covered maxlen — unless an explicit cap
    # cut it short, in which case LCPs from these tables under-count.
    exact = clean_exit or not explicit_cap or k >= maxlen
    return result, SuffixArtifacts(
        levels=levels, grams=suf, w0=w0, exact=exact
    )


def adjacent_suffix_pairs(ranks: DataFrame, id_col: str) -> DataFrame:
    """The n−1 (doc_a, pos_a, doc_b, pos_b) pairs ADJACENT in global
    suffix order — the only pairs LRS / distinct-substring /
    maximal-repeat mining ever compares (repeats always sort adjacent).
    ``ranks`` is the (id_col, pos, sa_rank) frame from
    :func:`suffix_ranks`; the join is a single integer equi-join on
    sa_rank (side b shifted by one)."""
    a = ranks.select(
        F.col(id_col).alias("doc_a"), F.col("pos").alias("pos_a"), "sa_rank"
    )
    b = ranks.select(
        F.col(id_col).alias("doc_b"),
        F.col("pos").alias("pos_b"),
        (F.col("sa_rank") - 1).alias("sa_rank"),
    )
    return a.join(b, "sa_rank").drop("sa_rank")


def maximal_repeat_intervals(
    ranks: DataFrame,
    artifacts: SuffixArtifacts,
    min_len: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document MAXIMAL intervals covered by a duplicated substring
    of length ≥ ``min_len`` — the variable-length ExactSubstr index
    (Lee et al. 2022 build exactly this over a suffix array: every
    position inside a substring that occurs ≥ 2 times anywhere in the
    corpus, collapsed to maximal runs). Returns
    (id_col, rep_start, rep_end, rep_len), positions 1-based inclusive.

    Why adjacent pairs suffice, and why no explicit left-extension
    check is needed (the interval-collapse rule):

    - For a suffix at (doc, pos), let M(pos) = max LCP with its ≤ 2
      NEIGHBORS in global suffix order. If any substring of length
      L ≥ min_len starting at pos occurs elsewhere, all suffixes
      sharing that L-prefix sort contiguously, so one of pos's
      immediate neighbors shares it too: M(pos) ≥ L. Conversely
      M(pos) ≥ min_len certifies the M(pos)-prefix at pos is
      duplicated. So the covered-position set is EXACTLY
      ∪ {[pos, pos+M(pos)−1] : M(pos) ≥ min_len}.
    - Left-maximality is subsumed by the union: if the repeat at pos
      extends one character left, then pos−1 starts a duplicated
      prefix of length M(pos)+1, so pos−1 contributes its OWN interval
      that covers the extension — merging overlapping/contiguous
      intervals (start ≤ previous max end + 1) therefore yields the
      maximal runs without any per-interval rank lookup at pos−1.

    Scale shape: one sa_rank equi-join (adjacent pairs), the rank-table
    LCP walk (integer joins only, no suffix bytes), a (doc, pos)
    hash-aggregate for M, and a PER-DOCUMENT window for the merge — a
    document's intervals are bounded by its length, and a single
    document already fits one task by the data model, so the window
    partitions by the natural key and never funnels the corpus through
    one task."""
    if min_len < 1:
        raise ValueError(f"maximal_repeat_intervals: min_len {min_len} < 1")
    from pyspark.sql import Window

    pairs = adjacent_suffix_pairs(ranks, id_col)
    lcp = lcp_from_rank_tables(artifacts, pairs, out_col="__lcp")
    sides = lcp.select(
        F.col("doc_a").alias("__doc"), F.col("pos_a").alias("pos"), "__lcp"
    ).unionByName(
        lcp.select(
            F.col("doc_b").alias("__doc"), F.col("pos_b").alias("pos"), "__lcp"
        )
    )
    iv = (
        sides.groupBy("__doc", "pos")
        .agg(F.max("__lcp").alias("__m"))
        .filter(F.col("__m") >= min_len)
        .select(
            "__doc",
            F.col("pos").cast("long").alias("st"),
            (F.col("pos") + F.col("__m") - 1).cast("long").alias("en"),
        )
    )
    w_prev = (
        Window.partitionBy("__doc")
        .orderBy("st", "en")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("__doc")
        .orderBy("st", "en")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        iv.withColumn("__pmax", F.max("en").over(w_prev))
        .withColumn(
            "__brk",
            F.when(
                F.col("__pmax").isNull()
                | (F.col("st") > F.col("__pmax") + 1),
                1,
            ).otherwise(0),
        )
        .withColumn("__grp", F.sum("__brk").over(w_run))
        .groupBy("__doc", "__grp")
        .agg(F.min("st").alias("rep_start"), F.max("en").alias("rep_end"))
    )
    return merged.select(
        F.col("__doc").alias(id_col),
        "rep_start",
        "rep_end",
        (F.col("rep_end") - F.col("rep_start") + 1).alias("rep_len"),
    )


def lcp_from_rank_tables(
    artifacts: SuffixArtifacts, pairs: DataFrame, out_col: str = "lcp"
) -> DataFrame:
    """LCP of each (doc_a, pos_a, doc_b, pos_b) suffix pair from the
    doubling rank tables — O(log maxlen) integer equi-joins per level,
    NO suffix strings in flight (module docstring, "LCP at scale").
    Extra columns on ``pairs`` pass through; adds ``out_col`` (long)."""
    if not artifacts.exact:
        raise ValueError(
            "suffix_ranks was cut short by an explicit max_rounds; "
            "LCPs from prefix-only rank tables would under-count"
        )
    levels, grams, w0 = artifacts.levels, artifacts.grams, artifacts.w0

    def rank_at(df: DataFrame, tab: DataFrame, doc_col: str, pos_expr, out: str):
        t = tab.select(
            F.col("__doc").alias("__jd"),
            F.col("pos").alias("__jp"),
            F.col(tab.columns[-1]).alias(out),
        )
        j = df.withColumn("__jk", pos_expr)
        return j.join(
            t, (j[doc_col] == t["__jd"]) & (j["__jk"] == t["__jp"]), "left"
        ).drop("__jd", "__jp", "__jk")

    top = levels[-1][1]
    lengths = top.groupBy("__doc").agg(F.max("pos").alias("__len"))
    p = (
        pairs.join(
            lengths.select(
                F.col("__doc").alias("doc_a"), F.col("__len").alias("__la")
            ),
            "doc_a",
        )
        .join(
            lengths.select(
                F.col("__doc").alias("doc_b"), F.col("__len").alias("__lb")
            ),
            "doc_b",
        )
        .withColumn("__sla", F.col("__la") - F.col("pos_a") + 1)
        .withColumn("__slb", F.col("__lb") - F.col("pos_b") + 1)
    )
    # identical-suffix branch: equal rank at the TOP window (see module
    # docstring for why equality there implies full identity)
    p = rank_at(p, top, "doc_a", F.col("pos_a"), "__ra")
    p = rank_at(p, top, "doc_b", F.col("pos_b"), "__rb")
    p = p.withColumn(
        "__ident", F.col("__ra").isNotNull() & (F.col("__ra") == F.col("__rb"))
    ).drop("__ra", "__rb")
    # greedy walk over descending windows, top level excluded: in the
    # non-identical branch LCP < K, and {K/2..w0} + residual cover K-1
    p = p.withColumn("__h", F.lit(0).cast("long"))
    for w, tab in reversed(levels[:-1]):
        p = rank_at(p, tab, "doc_a", F.col("pos_a") + F.col("__h"), "__ra")
        p = rank_at(p, tab, "doc_b", F.col("pos_b") + F.col("__h"), "__rb")
        p = p.withColumn(
            "__h",
            F.col("__h")
            + F.when(
                F.col("__ra").isNotNull() & (F.col("__ra") == F.col("__rb")),
                F.lit(w),
            ).otherwise(F.lit(0)),
        ).drop("__ra", "__rb")
    # residual < w0: one bounded char-compare of the stored w0-grams
    p = rank_at(p, grams, "doc_a", F.col("pos_a") + F.col("__h"), "__ga")
    p = rank_at(p, grams, "doc_b", F.col("pos_b") + F.col("__h"), "__gb")
    ga = F.coalesce(F.col("__ga"), F.lit(""))
    gb = F.coalesce(F.col("__gb"), F.lit(""))
    mism = F.array_position(
        F.zip_with(F.split(ga, ""), F.split(gb, ""), lambda x, y: ~x.eqNullSafe(y)),
        True,
    )
    residual = F.when(mism == 0, F.least(F.length(ga), F.length(gb))).otherwise(
        mism - 1
    )
    return (
        p.withColumn(
            out_col,
            F.when(F.col("__ident"), F.least(F.col("__sla"), F.col("__slb")))
            .otherwise(F.col("__h") + residual)
            .cast("long"),
        )
        .drop("__la", "__lb", "__sla", "__slb", "__ident", "__h", "__ga", "__gb")
    )
