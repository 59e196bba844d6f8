"""Winnowing fingerprints (operators/winnow.py): the shared-substring
guarantee, density, rightmost-min tie handling, short-doc edge."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.operators.winnow import winnowing_fingerprints

K, W = 5, 8
GUARANTEE = W + K - 1  # any shared substring this long shares a fingerprint


def _fps(spark, docs, k=K, w=W):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = winnowing_fingerprints(df, "doc_id", "text", k=k, w=w)
    by_doc: dict = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    return by_doc


def test_shared_substring_guarantee(spark):
    # a planted 12-char (= w+k-1) common substring in otherwise
    # unrelated docs MUST produce at least one shared fingerprint VALUE
    shared = "GUARANTEEDXX"
    assert len(shared) == GUARANTEE
    docs = [
        (1, "qwertyuiopasdfgh" + shared + "zxcvbnmqwertyuio"),
        (2, "0123456789012345678" + shared + "98765432109876"),
    ]
    fps = _fps(spark, docs)
    assert {fp for _, fp in fps[1]} & {fp for _, fp in fps[2]}


def test_unrelated_docs_share_nothing(spark):
    docs = [(1, "aaaaabbbbbcccccdddddeeeee"), (2, "zzzzzyyyyyxxxxxwwwwwvvvvv")]
    fps = _fps(spark, docs)
    assert not ({fp for _, fp in fps[1]} & {fp for _, fp in fps[2]})


def test_density_about_two_over_w_plus_one(spark):
    import hashlib

    text = "".join(
        hashlib.md5(str(i).encode()).hexdigest()[:2] for i in range(600)
    )  # 1200 pseudo-random chars
    fps = _fps(spark, [(1, text)])[1]
    n_grams = len(text) - K + 1
    density = len(fps) / n_grams
    assert 2 / (W + 1) * 0.5 < density < 2 / (W + 1) * 2.0


def test_matches_reference_implementation(spark):
    import hashlib

    def ref(text, k, w):
        hs = [
            int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:8], 16)
            for i in range(max(len(text) - k + 1, 1))
        ]
        hs = [h for h in hs]  # gram hashes, 1-based positions i+1
        sel = set()
        last_full = max(len(hs) - w + 1, 1)
        for s in range(1, last_full + 1):
            window = hs[s - 1 : s - 1 + w]
            m = min(window)
            # rightmost occurrence of the min
            off = len(window) - 1 - window[::-1].index(m)
            sel.add((s + off, m))
        return sel

    text = "the quick brown fox jumps over the quick brown dog again and again"
    got = _fps(spark, [(1, text)])[1]
    assert got == ref(text, K, W)


def test_doc_shorter_than_window_emits_single_min(spark):
    text = "abcdefg"  # 3 grams < w: one partial window, one fingerprint
    fps = _fps(spark, [(1, text)])[1]
    assert len(fps) == 1


def test_long_document_past_65535_chars(spark):
    # regression (round-8 VERDICT #1): the old h*2^16 + (2^16-1-pos)
    # encoding went NEGATIVE in the offset term past position 65,535,
    # borrowing from the hash field — min-selection picked garbage and
    # the MOSS guarantee silently vanished for any >64 KiB document.
    # Plant the shared substring BEYOND that ceiling in both docs.
    import hashlib

    def noise(seed: str, n: int) -> str:
        out = []
        i = 0
        while sum(len(s) for s in out) < n:
            out.append(hashlib.md5(f"{seed}:{i}".encode()).hexdigest())
            i += 1
        return "".join(out)[:n]

    shared = "GUARANTEEDXX"
    assert len(shared) == GUARANTEE
    docs = [
        (1, noise("a", 70_000) + shared + noise("b", 3_000)),
        (2, noise("c", 80_000) + shared + noise("d", 1_000)),
    ]
    fps = _fps(spark, docs)
    # guarantee holds past the old ceiling
    assert {fp for _, fp in fps[1]} & {fp for _, fp in fps[2]}
    # decoded positions/fingerprints stay in range (no field borrow)
    for d in (1, 2):
        assert all(1 <= pos and 0 <= fp < 1 << 32 for pos, fp in fps[d])
    # selection must still match the reference implementation at this
    # length (exact positions, not just the shared-value existence)
    def ref(text, k, w):
        hs = [
            int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:8], 16)
            for i in range(max(len(text) - k + 1, 1))
        ]
        sel = set()
        last_full = max(len(hs) - w + 1, 1)
        for s in range(1, last_full + 1):
            window = hs[s - 1 : s - 1 + w]
            m = min(window)
            off = len(window) - 1 - window[::-1].index(m)
            sel.add((s + off, m))
        return sel

    assert fps[1] == ref(docs[0][1], K, W)
