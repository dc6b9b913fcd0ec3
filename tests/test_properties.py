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
