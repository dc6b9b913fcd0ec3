"""Property-based tests (hypothesis) — SURVEY §5.2 item 4.

Pure driver-side functions get full hypothesis fuzzing; Spark-side
properties (mode tie-break determinism) run a bounded number of examples
since each example is a Spark job.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from bigdata_weather_system_spark.service.weather import coerce_value


@given(st.integers(min_value=-(10**15), max_value=10**15))
def test_coerce_integer_strings_roundtrip(n):
    out = coerce_value(str(n))
    assert out == n and isinstance(out, int)


@given(
    st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
    )
)
def test_coerce_float_strings_roundtrip(f):
    s = repr(f)
    out = coerce_value(s)
    assert isinstance(out, (int, float))
    assert math.isclose(float(out), f, rel_tol=1e-12, abs_tol=1e-12)


@given(st.sampled_from(["true", "True", "TRUE", "false", "False", "FALSE"]))
def test_coerce_booleans(s):
    assert coerce_value(s) is (s.lower() == "true")


@given(st.text(max_size=30))
def test_coerce_never_raises_and_is_stable(s):
    a = coerce_value(s)
    b = coerce_value(s)
    assert a == b
    # non-numeric, non-boolean text passes through unchanged
    try:
        float(s)
        numeric = True
    except (TypeError, ValueError):
        numeric = False
    if not numeric and s.strip().lower() not in ("true", "false"):
        assert a == s


@given(st.integers())
def test_coerce_non_strings_pass_through(n):
    assert coerce_value(n) is n


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 5)), min_size=1, max_size=40
    )
)
def test_mode_tiebreak_smallest_value(spark, rows):
    """Engine mode must equal: among max-count values per key, the smallest
    (reference tie-break, spark.py:632-635) — for arbitrary multisets."""
    from collections import Counter

    from bigdata_weather_system_spark.operators.profile import mode_per_group

    df = spark.createDataFrame(rows, "k int, v int")
    got = {
        r.k: r.modal for r in mode_per_group(df, ["k"], "v", "modal").collect()
    }
    for k in {k for k, _ in rows}:
        counts = Counter(v for kk, v in rows if kk == k)
        top = max(counts.values())
        expected = min(v for v, c in counts.items() if c == top)
        assert got[k] == expected, (k, counts, got[k])


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=40,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_connected_components_match_union_find(spark, edges):
    """DataFrame CC (min-label propagation + pointer jumping) must equal a
    driver-side union-find on arbitrary graphs — including chains, cycles,
    self-loops, and duplicate edges."""
    from bigdata_weather_system_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for n in parent:
        expected[n] = find(n)

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.cluster_id for r in connected_components(df).collect()}
    # find() compresses toward the min because unions always point the
    # larger root at the smaller one
    assert got == expected


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=40,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_connected_components_distributed_path_matches_union_find(spark, edges):
    """Force the iterative min-label-propagation branch (driver_max_edges=0)
    — the 100 TB path — on arbitrary graphs. The driver union-find branch
    is what every small-scale run takes, so without this the distributed
    branch would ship untested."""
    from bigdata_weather_system_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.cluster_id
        for r in connected_components(df, driver_max_edges=0).collect()
    }
    assert got == expected


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12),
        min_size=2,
        max_size=12,
    )
)
def test_prefix_jaccard_equals_inverted_index_on_random_corpora(spark, word_lists):
    """Prefix filtering must be EXACT on arbitrary corpora — including
    short docs (< n tokens → empty shingle sets), identical docs, and
    heavy token overlap that stresses the rarest-first prefix ordering."""
    from bigdata_weather_system_spark.operators.dedup import (
        jaccard_pairs_prefix,
        ngram_jaccard_pairs,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    inv = sorted(map(tuple, ngram_jaccard_pairs(df, threshold=0.5).collect()))
    pref = sorted(map(tuple, jaccard_pairs_prefix(df, threshold=0.5).collect()))
    assert pref == inv


# --- round-3 continuation-wave properties (Spark-free replicas) -----------


@given(
    st.lists(
        st.integers(min_value=0, max_value=4095),
        min_size=1,
        max_size=200,
    )
)
def test_bitmap_word_popcount_equals_exact_distinct(ids):
    # the driver-side replica of bitmap_distinct_users_rollup's word
    # algebra: OR bits into (word -> mask) then popcount == len(set)
    words: dict[int, int] = {}
    for i in ids:
        words[i // 64] = words.get(i // 64, 0) | (1 << (i % 64))
    assert sum(bin(m).count("1") for m in words.values()) == len(set(ids))


@given(
    st.lists(
        st.integers(min_value=0, max_value=4095), min_size=1, max_size=200
    ),
    st.integers(min_value=1, max_value=4094),
)
def test_bitmap_merge_split_invariance(ids, pivot):
    # merging per-half word maps == building the map over the union:
    # the property that makes daily word tables an incremental increment
    def build(sub):
        w: dict[int, int] = {}
        for i in sub:
            w[i // 64] = w.get(i // 64, 0) | (1 << (i % 64))
        return w

    lo = build([i for i in ids if i < pivot])
    hi = build([i for i in ids if i >= pivot])
    merged: dict[int, int] = dict(lo)
    for k, v in hi.items():
        merged[k] = merged.get(k, 0) | v
    assert merged == build(ids)


@given(
    st.lists(
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
        min_size=2,
        max_size=40,
    )
)
def test_next_greater_frame_scan_matches_bruteforce(vals):
    # bounded-horizon NGE via the frame-scan formulation == brute force
    horizon = 50
    for i, v in enumerate(vals):
        frame = vals[i + 1 : i + 1 + horizon]
        flags = [x > v for x in frame]
        pos = flags.index(True) + 1 if True in flags else None
        brute = next(
            (j - i for j in range(i + 1, len(vals)) if vals[j] > v), None
        )
        if brute is not None and brute <= horizon:
            assert pos == brute
        else:
            assert pos is None


@given(
    st.lists(
        st.floats(
            min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
        ),
        min_size=3,
        max_size=60,
    )
)
def test_huber_clamped_mean_between_min_and_max(vals):
    import statistics

    m0 = statistics.median(vals)
    mad = statistics.median([abs(v - m0) for v in vals]) * 1.4826
    lo, hi = m0 - 1.345 * mad, m0 + 1.345 * mad
    m1 = sum(min(max(v, lo), hi) for v in vals) / len(vals)
    assert min(vals) - 1e-9 <= m1 <= max(vals) + 1e-9
    # with zero spread the estimate is exactly the common value
    if mad == 0:
        assert abs(m1 - m0) < 1e-9


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=2, max_size=300)
)
def test_fellegi_sunter_u_is_a_probability(keys):
    # u = collision mass / total pairs must always land in (0, 1]
    from collections import Counter

    n = len(keys)
    mass = sum(c * (c - 1) for c in Counter(keys).values())
    u = max(mass, 1) / (n * (n - 1))
    assert 0 < u <= 1


# --- wave-5 motion-energy closed form ---------------------------------------

@given(
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=17, max_value=40),
    st.integers(min_value=17, max_value=40),
)
@settings(max_examples=200, deadline=None)
def test_motion_energy_wrap_count_closed_form(mid, f, h, w):
    """The SQL oracle's mod-256 wrap-count formula must equal the
    brute-force count for arbitrary (id, frames, dims) — the identity
    that lets a DuckDB oracle predict REAL numpy frame diffs exactly."""
    import numpy as np

    if f < 2:
        return
    sz = h * w * 3
    d = sz % 256
    for j in range(f - 1):
        b = (mid + j * sz) % 256
        full_cycles, rem = sz // 256, sz % 256
        if b + rem <= 256:
            n_wrap = full_cycles * d + max(
                0, b + rem - max(256 - d, b)
            )
        else:
            n_wrap = (
                full_cycles * d
                + max(0, 256 - max(256 - d, b))
                + max(0, (b + rem - 256) - (256 - d))
            )
        # brute force
        vals = (mid + j * sz + np.arange(sz, dtype=np.int64)) % 256
        nxt = (mid + (j + 1) * sz + np.arange(sz, dtype=np.int64)) % 256
        diff = nxt.astype(np.int64) - vals.astype(np.int64)
        brute_wraps = int((diff < 0).sum()) if d > 0 else 0
        assert n_wrap == brute_wraps, (mid, j, h, w)
        expected_mean = (
            (n_wrap * (256 - d) + (sz - n_wrap) * d) / sz
        )
        assert abs(np.abs(diff).mean() - expected_mean) < 1e-12


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=4000))
def test_gif_lzw_roundtrips_arbitrary_bytes(data):
    """The GIF LZW pair is a bijection on arbitrary byte strings —
    hypothesis hammers the deferred width change, sub-byte packing, and
    the cScSc path far beyond the fixture corpus."""
    from bigdata_weather_system_spark.operators.multimodal import (
        _lzw_gif_decode,
        _lzw_gif_encode,
    )

    enc = _lzw_gif_encode(data)
    assert _lzw_gif_decode(enc, 8, max_out=len(data)) == data


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=5, max_value=60),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_sufficient_stats_solve_matches_numpy_purely(n, p, seed):
    """Driver-side property (no Spark job): summing per-chunk XᵀX/Xᵀy
    partials over ANY chunking and solving equals the one-shot numpy
    solve — the additivity that makes the distributed trainer exact."""
    import numpy as np

    rng = np.random.RandomState(seed)
    x = rng.standard_normal((n, p))
    xh = np.hstack([x, np.ones((n, 1))])
    y = xh @ rng.standard_normal(p + 1) + 0.1 * rng.standard_normal(n)
    # random chunking
    cuts = sorted(set(rng.randint(1, n, size=min(3, n - 1)).tolist()))
    chunks = np.split(np.arange(n), cuts)
    xtx = np.zeros((p + 1, p + 1))
    xty = np.zeros(p + 1)
    for idx in chunks:
        c = xh[idx]
        xtx += c.T @ c
        xty += c.T @ y[idx]
    reg = 0.3
    lam = reg * np.eye(p + 1)
    lam[-1, -1] = 0.0
    merged = np.linalg.solve(xtx + lam, xty)
    oneshot = np.linalg.solve(xh.T @ xh + lam, xh.T @ y)
    np.testing.assert_allclose(merged, oneshot, atol=1e-7)
