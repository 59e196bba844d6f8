"""Property-based tests (SURVEY §5.3): merge idempotence and
last-writer-wins determinism, dedup invariants, salted-op equivalence —
over hypothesis-generated micro-tables."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from open_crime_etl_pipeline_spark.operators.dedup import exact_dedup
from open_crime_etl_pipeline_spark.operators.merge import (
    dedup_last_writer_wins,
    merge_upsert,
)
from open_crime_etl_pipeline_spark.operators.skew import salted_count

SLOW = settings(
    # r13: 12 -> 5 examples. Each example pays multiple full Spark
    # job rounds (a pagerank example is 6 iterations of join+agg), so
    # this module alone was ~220s of the 43-minute suite wall and the
    # round-12 driver run timed out mid-suite (VERIFY_r12
    # tests_ok:false). Every property still runs on every suite run —
    # only the random-example count per property shrinks; hypothesis
    # still shrinks failures. Crank it back up for a deep local soak.
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

row = st.tuples(
    st.integers(min_value=0, max_value=5),    # key
    st.integers(min_value=0, max_value=100),  # version / order col
    st.text(alphabet="abc ", min_size=0, max_size=8),
)
rows = st.lists(row, min_size=0, max_size=15)


def _df(spark, data):
    return spark.createDataFrame(data, "k int, v int, payload string") if data else \
        spark.createDataFrame([], "k int, v int, payload string")


@SLOW
@given(target=rows, source=rows)
def test_merge_idempotent(spark, target, source):
    t, s = _df(spark, target), _df(spark, source)
    once = merge_upsert(t, s, keys=["k"], order_by=["v"]).cache()
    twice = merge_upsert(once, s, keys=["k"], order_by=["v"])
    assert sorted(once.collect()) == sorted(twice.collect())


def _key_unique(data):
    """merge_upsert's documented precondition: targets are key-unique
    (built by merge, whose output is key-unique by induction)."""
    seen, out = set(), []
    for r in data:
        if r[0] not in seen:
            seen.add(r[0])
            out.append(r)
    return out


@SLOW
@given(target=rows, source=rows)
def test_merge_key_unique_and_source_wins(spark, target, source):
    target = _key_unique(target)
    t, s = _df(spark, target), _df(spark, source)
    merged = merge_upsert(t, s, keys=["k"], order_by=["v"]).collect()
    ks = [r.k for r in merged]
    assert len(ks) == len(set(ks))  # PK uniqueness always holds
    src_keys = {r[0] for r in source}
    # for every key present in the source, the merged row is the
    # deterministic last-writer (max (v, payload)) of the source rows
    for key in src_keys:
        winner = max((r for r in source if r[0] == key), key=lambda r: (r[1], r[2]))
        got = next(r for r in merged if r.k == key)
        assert (got.v, got.payload) == (winner[1], winner[2])


@SLOW
@given(data=rows)
def test_lww_dedup_deterministic_across_runs(spark, data):
    df = _df(spark, data)
    a = sorted(dedup_last_writer_wins(df, ["k"], ["v"]).collect())
    b = sorted(dedup_last_writer_wins(df.repartition(5), ["k"], ["v"]).collect())
    assert a == b  # partitioning must not change the winner


@SLOW
@given(data=rows)
def test_exact_dedup_min_id_per_text(spark, data):
    # use v as the id, payload as the text
    df = _df(spark, data).select(F.col("v").alias("id"), F.col("payload").alias("text"))
    kept = exact_dedup(df, "id", "text").collect()
    # expected: min id per normalized text
    import re

    norm = lambda t: re.sub(r"\s+", " ", t.strip()).lower()
    expect = {}
    for _, v, payload in data:
        n = norm(payload)
        expect[n] = min(expect.get(n, v), v)
    assert sorted({r.id for r in kept}) == sorted(set(expect.values()))


@SLOW
@given(data=rows)
def test_salted_count_matches_plain(spark, data):
    df = _df(spark, data)
    plain = {(r.k): r["count"] for r in df.groupBy("k").count().collect()}
    salted = {(r.k): r.n for r in salted_count(df, ["k"], salt_buckets=4).collect()}
    assert plain == salted


# --- as-of join vs brute force -------------------------------------------

asof_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=12
)
asof_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 99)),
    min_size=0, max_size=12,
)


@SLOW
@given(left=asof_left, right=asof_right)
def test_asof_join_matches_brute_force(spark, left, right):
    """asof_join ≡ per-row argmax over right.ts <= left.ts (largest
    seq on ties), on arbitrary key/time collisions incl. duplicates."""
    from open_crime_etl_pipeline_spark.operators.asof import asof_join
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    lrows = [(k, t0 + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(left)]
    rrows = [(k, t0 + dt.timedelta(minutes=m), s, float(s)) for k, m, s in right]
    l = spark.createDataFrame(
        lrows if lrows else [], "k int, ts timestamp, lid int"
    ) if lrows else spark.createDataFrame([], "k int, ts timestamp, lid int")
    r = spark.createDataFrame(
        rrows, "k int, ts timestamp, rid int, rv double"
    ) if rrows else spark.createDataFrame([], "k int, ts timestamp, rid int, rv double")

    got = {
        row.lid: (row.rid, row.rv)
        for row in asof_join(l, r, on="k", ts="ts", value_cols=["rid", "rv"],
                             seq="rid").collect()
    }
    for k, ts, lid in lrows:
        cands = [(rts, rid, rv) for (rk, rts, rid, rv) in rrows
                 if rk == k and rts <= ts]
        expect = (None, None)
        if cands:
            _, rid, rv = max(cands, key=lambda c: (c[0], c[1]))
            expect = (rid, rv)
        assert got[lid] == expect, (lid, got[lid], expect)


# --- SCD2 vs brute force ---------------------------------------------------

scd2_updates = st.lists(
    st.tuples(st.integers(0, 3), st.sampled_from(["A", "B", "C"])),
    min_size=0, max_size=12,
)
scd2_snapshot = st.dictionaries(
    st.integers(0, 3), st.sampled_from(["A", "B", "C"]), max_size=4
)


@SLOW
@given(snap=scd2_snapshot, upds=scd2_updates)
def test_scd2_matches_brute_force(spark, snap, upds):
    """scd2_apply ≡ per-key chronological collapse of equal-attr runs,
    with lead()-closed validity intervals."""
    from open_crime_etl_pipeline_spark.operators.scd2 import scd2_apply
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    snap_rows = [(k, v, t0) for k, v in sorted(snap.items())]
    # unique, increasing ts per key by construction
    upd_rows = [
        (k, v, t0 + dt.timedelta(minutes=i + 1))
        for i, (k, v) in enumerate(upds)
        if k in snap  # updates for unknown keys would start new chains; keep it simple
    ]
    if not snap_rows:
        return
    s = spark.createDataFrame(snap_rows, "k int, status string, valid_from timestamp")
    u = spark.createDataFrame(
        upd_rows, "k int, status string, ts timestamp"
    ) if upd_rows else spark.createDataFrame([], "k int, status string, ts timestamp")

    got = {
        (r.k, r.valid_from): (r.status, r.valid_to, r.is_current)
        for r in scd2_apply(s, u, keys=["k"], attrs=["status"], ts_col="ts").collect()
    }

    expect = {}
    for k in snap:
        chain = [(t0, snap[k])] + sorted(
            [(ts, v) for (kk, v, ts) in upd_rows if kk == k]
        )
        versions = []
        for ts, v in chain:
            if not versions or versions[-1][1] != v:
                versions.append((ts, v))
        for i, (ts, v) in enumerate(versions):
            nxt = versions[i + 1][0] if i + 1 < len(versions) else None
            expect[(k, ts)] = (v, nxt, nxt is None)
    assert got == expect


# --- range join vs naive inequality join -----------------------------------

rj_points = st.lists(st.integers(0, 120), min_size=0, max_size=12)
rj_intervals = st.lists(
    st.tuples(st.integers(0, 120), st.integers(0, 40)), min_size=0, max_size=8
)


@SLOW
@given(points=rj_points, intervals=rj_intervals)
def test_range_join_matches_brute_force(spark, points, intervals):
    """Granule-binned range_join ≡ naive containment across arbitrary
    overlaps, empty intervals, and boundary alignment with the granule."""
    from open_crime_etl_pipeline_spark.operators.rangejoin import range_join
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    m = dt.timedelta(minutes=1)
    prow = [(i, t0 + p * m) for i, p in enumerate(points)]
    irow = [(i, t0 + s * m, t0 + (s + d) * m) for i, (s, d) in enumerate(intervals)]
    p = spark.createDataFrame(prow, "pid int, ts timestamp") if prow else \
        spark.createDataFrame([], "pid int, ts timestamp")
    iv = spark.createDataFrame(irow, "wid int, w_start timestamp, w_end timestamp") \
        if irow else spark.createDataFrame([], "wid int, w_start timestamp, w_end timestamp")
    got = sorted(
        (r.pid, r.wid)
        for r in range_join(p, iv, ts="ts", start="w_start", end="w_end",
                            granule_seconds=600).collect()  # 10-min granule
    )
    expect = sorted(
        (pi, wi)
        for pi, pts in prow
        for wi, ws, we in irow
        if ws <= pts < we
    )
    assert got == expect


def test_reservoir_per_group_partitioning_invariant(spark):
    """The deterministic reservoir's selling point: membership is a pure
    function of (id, salt), so the SAME rows come back regardless of
    how the input is partitioned or ordered."""
    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.operators.sampling import reservoir_per_group

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("k")
    )
    outs = []
    for arranged in (df.repartition(1), df.repartition(16, "k"),
                     df.orderBy(F.col("k").desc())):
        outs.append({
            (r.g, r.k)
            for r in reservoir_per_group(arranged, "g", "k", k=5, salt="s").collect()
        })
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 7 * 5


def test_gaps_islands_deterministic_under_timestamp_ties(spark):
    """Two events sharing (user_id, ts) right after a >30min gap must
    land in the SAME (new) session on every run — the event_id
    tie-break makes the running-sum window total-ordered."""
    import datetime as dt

    from pyspark.sql import functions as F

    from open_crime_etl_pipeline_spark.queries.registry import get_spec

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 2, 0, 0)
    rows = [(1, t0, 10), (1, t1, 12), (1, t1, 11)]  # tie at t1
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])

    # run the same window pipeline the registered query uses, inline
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag("ts").over(w)
    new_session = (
        prev.isNull() | (F.col("ts").cast("long") - prev.cast("long") > 1800)
    ).cast("long")
    out = (
        df.withColumn("__new", new_session)
        .withColumn("session_no", F.sum("__new").over(wrun))
        .groupBy("user_id", "session_no")
        .agg(F.count("*").alias("n"))
        .orderBy("session_no")
        .collect()
    )
    assert [(r.session_no, r.n) for r in out] == [(1, 1), (2, 2)]


# --- raster codec: pure-Python encode/decode roundtrip (no Spark) ---

_pixel = st.tuples(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=255),
)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=7),
    data=st.data(),
)
def test_raster_codec_roundtrip_property(w, h, data):
    """For ANY image (every width hits a different BMP padding class,
    w%4 ∈ {0,1,2,3}), both encoders round-trip to the exact channel
    sums and top-row red sum the pixels imply."""
    from open_crime_etl_pipeline_spark.operators.multimodal import (
        decode_raster,
        encode_bmp24,
        encode_ppm6,
    )

    rows = [[data.draw(_pixel) for _ in range(w)] for _ in range(h)]
    exp = (
        w, h,
        sum(p[0] for r in rows for p in r),
        sum(p[1] for r in rows for p in r),
        sum(p[2] for r in rows for p in r),
        sum(p[0] for p in rows[0]),
    )
    assert decode_raster(encode_bmp24(w, h, rows)) == exp + (1,)
    assert decode_raster(encode_ppm6(w, h, rows)) == exp + (2,)


# ---------------------------------------------------------------------------
# Graph operators vs brute force (r3)
# ---------------------------------------------------------------------------

edge = st.tuples(
    st.integers(min_value=0, max_value=7),
    st.integers(min_value=0, max_value=7),
)
edge_lists = st.lists(edge, min_size=0, max_size=20)


@SLOW
@given(edges=edge_lists)
def test_triangle_count_matches_bruteforce(spark, edges):
    from itertools import combinations

    from open_crime_etl_pipeline_spark.operators.graph import triangle_count

    df = (
        spark.createDataFrame(edges, "a long, b long")
        if edges else spark.createDataFrame([], "a long, b long")
    )
    got = triangle_count(df).collect()[0]
    und = {frozenset(e) for e in edges if e[0] != e[1]}
    nodes = {n for e in und for n in e}
    brute = sum(
        1 for trio in combinations(sorted(nodes), 3)
        if all(frozenset(p) in und for p in combinations(trio, 2))
    )
    assert got["n_edges"] == len(und)
    assert got["n_triangles"] == brute


@SLOW
@given(edges=st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=1, max_value=4),
    ),
    min_size=1, max_size=12,
))
def test_pagerank_matches_numpy_on_random_graphs(spark, edges):
    import numpy as np

    from open_crime_etl_pipeline_spark.operators.graph import pagerank

    rows = [(f"n{s}", f"n{d}", float(w)) for s, d, w in edges]
    df = spark.createDataFrame(rows, "src string, dst string, weight double")
    got = {r["node"]: r["rank"] for r in pagerank(df, 0.85, iters=6).collect()}

    nodes = sorted({r[0] for r in rows} | {r[1] for r in rows})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outw: dict = {}
    for s, d, w in rows:
        outw[s] = outw.get(s, 0.0) + w
    P = np.zeros((n, n))
    for s, d, w in rows:
        P[idx[d], idx[s]] += w / outw[s]
    r = np.full(n, 1.0 / n)
    for _ in range(6):
        r = 0.15 / n + 0.85 * (P @ r)
    for name, i in idx.items():
        assert abs(got[name] - r[i]) < 1e-10


@SLOW
@given(
    vecs=st.lists(
        st.lists(st.floats(min_value=-2.0, max_value=2.0,
                           allow_nan=False, allow_infinity=False,
                           width=32),
                 min_size=4, max_size=4),
        min_size=2, max_size=12,
    )
)
def test_covariance_pairs_matches_numpy(spark, vecs):
    import numpy as np

    from open_crime_etl_pipeline_spark.operators.linalg import covariance_pairs

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    rows = covariance_pairs(df, "embedding", d=4).collect()
    X = np.array(vecs, dtype=np.float32).astype(np.float64)
    ref = np.cov(X, rowvar=False, ddof=1)
    for r in rows:
        assert abs(r["cov"] - ref[r["i"] - 1, r["j"] - 1]) < 1e-9


@SLOW
@given(
    ch0=st.lists(st.integers(min_value=-32768, max_value=32767),
                 min_size=1, max_size=40),
    stereo=st.booleans(),
)
def test_audio_kernel_roundtrip_random_pcm(ch0, stereo):
    from open_crime_etl_pipeline_spark.operators.multimodal import (
        audio_features_ch0,
        encode_wav_pcm16,
    )

    chans = [ch0] + ([[(s // 2) for s in ch0]] if stereo else [])
    wav = encode_wav_pcm16(8000, chans)
    n_ch, n, sumsq, zc, peak = audio_features_ch0(wav)
    assert (n_ch, n) == (len(chans), len(ch0))
    assert sumsq == sum(s * s for s in ch0)
    assert zc == sum(1 for a, b in zip(ch0, ch0[1:]) if (a < 0) != (b < 0))
    assert peak == max(abs(s) for s in ch0)


@SLOW
@given(
    w=st.integers(min_value=2, max_value=8),
    h=st.integers(min_value=2, max_value=8),
    seed=st.integers(min_value=0, max_value=10_000),
    shift=st.integers(min_value=1, max_value=40),
)
def test_ahash_brightness_invariance_random_images(w, h, seed, shift):
    from open_crime_etl_pipeline_spark.operators.multimodal import (
        ahash64,
        encode_bmp24,
        encode_ppm6,
    )

    rng = __import__("random").Random(seed)
    base = [[(rng.randrange(200), rng.randrange(200), rng.randrange(200))
             for _ in range(w)] for _ in range(h)]
    bright = [[(r + shift, g + shift, b + shift) for (r, g, b) in row]
              for row in base]
    hb = ahash64(encode_bmp24(w, h, base))
    hp = ahash64(encode_ppm6(w, h, bright))
    assert hb == hp  # format- and brightness-invariant


@SLOW
@given(edges=edge_lists)
def test_connected_components_matches_bruteforce(spark, edges):
    """8 fixed rounds >= any component's diameter on <=8 nodes, so the
    operator's labels must equal true component minima from a
    brute-force union-find."""
    from open_crime_etl_pipeline_spark.operators.graph import connected_components

    clean = [(a, b) for a, b in edges if a != b]
    if not clean:
        return
    df = spark.createDataFrame(clean, "a long, b long")
    got = {r["node"]: r["label"] for r in connected_components(df, iters=8).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in clean:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    want = {}
    for n in parent:
        root = find(n)
        want.setdefault(root, []).append(n)
    expected = {}
    for members in want.values():
        lo = min(members)
        for n in members:
            expected[n] = lo
    assert got == expected


tput_tokens = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # node
        st.sampled_from("abcdefgh"),                     # term
    ),
    min_size=1,
    max_size=60,
)


@SLOW
@given(toks=tput_tokens)
def test_tput_bounds_sound_on_random_multisets(spark, toks):
    """TPUT soundness over arbitrary (node, term) multisets — pure
    integer math, so every property is exact:
    (1) lower <= exact <= upper for every candidate;
    (2) any term NOT in the candidate union has global count <= the
        published tail cap sum(tau);
    (3) every membership-certified term really is in the true global
        top-k (no unreported term can outrank it)."""
    from collections import Counter

    from open_crime_etl_pipeline_spark.queries.llm import _tput_topk

    m, k = 2, 3
    tok = spark.createDataFrame(toks, "node long, term string")
    out = _tput_topk(tok, m=m, k=k).collect()
    exact = Counter(t for _, t in toks)
    cand_terms = {r["term"] for r in out}

    for r in out:
        assert r["lower_bound"] <= r["exact_count"] <= r["upper_bound"], r
        assert r["exact_count"] == exact[r["term"]], r
    if out:
        tail_cap = out[0]["tail_cap"]
        # (2) every possible non-candidate term is capped by sum(tau).
        # out only holds the top-k slice of candidates; recompute the
        # full candidate union the same way the operator defines it.
        local = Counter(toks)
        reported = set()
        for node in {n for n, _ in toks}:
            node_counts = sorted(
                ((c, t) for (n, t), c in local.items() if n == node),
                key=lambda x: (-x[0], x[1]),
            )
            reported |= {t for _, t in node_counts[:m]}
        for term, cnt in exact.items():
            if term not in reported:
                assert cnt <= tail_cap, (term, cnt, tail_cap)
        # (3) certified => member of the true global top-k
        true_topk = {
            t for t, _ in sorted(exact.items(), key=lambda x: (-x[1], x[0]))[:k]
        }
        for r in out:
            if r["membership_certified"]:
                assert r["term"] in true_topk, r
        assert cand_terms <= reported


# --- segmented affine prefix scan (operators/scan.py) ----------------------

scan_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # series id
        st.integers(min_value=0, max_value=400),    # order key (may tie)
        st.floats(min_value=0.0, max_value=1000.0,
                  allow_nan=False, allow_infinity=False),
    ),
    min_size=1, max_size=40,
)


@SLOW
@given(data=scan_series, chunk_div=st.sampled_from([1, 7, 50, 1000]))
def test_affine_scan_equals_sequential_fold(spark, data, chunk_div):
    """ewma_affine_scan == the sequential recurrence for ANY series
    content and ANY chunk granularity (chunking is an execution
    detail). Duplicate order keys are deduplicated first (the operator
    contract assumes order keys are unique per series — like a day)."""
    from open_crime_etl_pipeline_spark.operators.scan import ewma_affine_scan

    seen, rows = set(), []
    for s, o, x in data:
        if (s, o) not in seen:
            seen.add((s, o))
            rows.append((str(s), f"{o:05d}", x))
    df = spark.createDataFrame(rows, "series string, k string, x double")
    got = {
        (r.series, r.k): r.ewma
        for r in ewma_affine_scan(
            df, "series", "k", "x",
            F.format_string("%05d", (F.col("k").cast("int") / chunk_div).cast("int")),
        ).collect()
    }
    assert len(got) == len(rows)
    by_series: dict = {}
    for s, k, x in rows:
        by_series.setdefault(s, []).append((k, x))
    for s, items in by_series.items():
        e = None
        for k, x in sorted(items):
            e = x if e is None else 0.2 * x + 0.8 * e
            assert abs(got[(s, k)] - e) <= 1e-9 * max(1.0, abs(e))
