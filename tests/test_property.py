"""Property-based tests (hypothesis): temporal operators against
brute-force Python references on randomized small inputs.

Example counts are capped — each example runs Spark jobs — but the
generators hit the edge shapes unit tests rarely enumerate: equal
timestamps across sides, empty key groups, single-row keys, duplicate
point values, interval boundaries landing exactly on bucket edges.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

_keys = st.integers(min_value=0, max_value=2)
_ts = st.integers(min_value=0, max_value=50)


@PROP
@given(
    left=st.lists(st.tuples(_keys, _ts), min_size=0, max_size=12),
    right=st.lists(st.tuples(_keys, _ts), min_size=0, max_size=12),
)
def test_asof_backward_matches_bruteforce(spark, left, right):
    from bigdata_weather_system_spark.operators.temporal import asof_join

    # asof_join requires the right side unique per (key, ts)
    right = sorted(set(right))
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k long, lts long, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in right],
        "k long, rts long, rval long",
    )
    out = asof_join(
        ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["rval"],
    ).collect()
    got = {r.lid: r.rval for r in out}

    expected = {}
    for i, (k, t) in enumerate(left):
        cands = [(rt, k * 1000 + rt) for rk, rt in right if rk == k and rt <= t]
        expected[i] = max(cands)[1] if cands else None
    assert got == expected


@PROP
@given(
    points=st.lists(st.tuples(_keys, _ts), min_size=0, max_size=10),
    intervals=st.lists(
        st.tuples(_keys, _ts, st.integers(min_value=0, max_value=20)),
        min_size=0,
        max_size=8,
    ),
    width=st.sampled_from([3.0, 7.0, 16.0]),
)
def test_interval_containment_matches_bruteforce(
    spark, points, intervals, width
):
    from bigdata_weather_system_spark.operators.temporal import (
        interval_containment_join,
    )

    pdf = spark.createDataFrame(
        [(k, float(t), i) for i, (k, t) in enumerate(points)],
        "k long, p double, pid long",
    )
    idf = spark.createDataFrame(
        [(k, float(lo), float(lo + span), j)
         for j, (k, lo, span) in enumerate(intervals)],
        "k long, lo double, hi double, iid long",
    )
    if not points or not intervals:
        return  # join of an empty side is trivially empty
    out = interval_containment_join(
        pdf, idf, ["k"], "p", "lo", "hi", bucket_width=width
    ).collect()
    got = sorted((r.pid, r.iid) for r in out)
    expected = sorted(
        (i, j)
        for i, (pk, pt) in enumerate(points)
        for j, (ik, lo, span) in enumerate(intervals)
        if pk == ik and lo <= pt < lo + span
    )
    assert got == expected


@PROP
@given(
    rows=st.lists(
        st.tuples(_keys, _ts, st.sampled_from(["a", "b"])),
        min_size=0,
        max_size=14,
    )
)
def test_scd2_intervals_match_bruteforce(spark, rows):
    from bigdata_weather_system_spark.operators.temporal import scd2_intervals

    data = [(k, t, s, i) for i, (k, t, s) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "k long, ts long, state string, eid long"
    )
    out = scd2_intervals(
        df, ["k"], "state", "ts", tiebreak_cols=["eid"]
    ).collect()

    # reference: per key, order by (ts, eid), collapse runs
    expected = {}
    by_key = {}
    for k, t, s, i in data:
        by_key.setdefault(k, []).append((t, i, s))
    for k, seq in by_key.items():
        seq.sort()
        runs = []
        for t, _i, s in seq:
            if runs and runs[-1]["state"] == s:
                runs[-1]["n"] += 1
            else:
                runs.append({"state": s, "from": t, "n": 1})
        for v, run in enumerate(runs, start=1):
            to = runs[v]["from"] if v < len(runs) else None
            expected[(k, v)] = (run["state"], run["from"], to, run["n"])
    got = {
        (r.k, r.version): (r.state, r.valid_from, r.valid_to, r.n_events)
        for r in out
    }
    assert got == expected
    for r in out:
        assert r.is_current == (r.valid_to is None)


@PROP
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=14
        ),
        min_size=1,
        max_size=6,
    )
)
def test_duplicate_span_stats_matches_bruteforce(spark, docs):
    """Span coverage against a brute-force reference: duplicated-window
    positions merged into intervals, coverage = union size — over random
    tiny-alphabet corpora whose windows collide constantly."""
    from bigdata_weather_system_spark.operators.dedup import (
        duplicate_span_stats,
    )

    k = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_dup_windows, r.n_spans, r.covered_tokens)
        for r in duplicate_span_stats(df, k=k).collect()
    }

    # brute force
    from collections import Counter

    grams = Counter()
    per_doc = {}
    for i, toks in enumerate(docs):
        ws = [tuple(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        per_doc[i] = ws
        grams.update(ws)
    for i, toks in enumerate(docs):
        pos = [j for j, w in enumerate(per_doc[i]) if grams[w] >= 2]
        covered = set()
        for p in pos:
            covered.update(range(p, p + k))
        spans = 0
        prev = None
        for p in pos:
            if prev is None or p - prev > k:
                spans += 1
            prev = p
        assert got[i] == (len(pos), spans, len(covered)), (i, docs)


@PROP
@given(
    samples=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=0, max_size=40
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
    ch=st.sampled_from([1, 2]),
)
def test_pcm_codec_roundtrip_property(spark, samples, rate, ch):
    """Any int16 sample buffer must survive encode→decode bit-exactly
    (padded to a whole number of frames), incl. empty → None."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_pcm_blob,
        encode_pcm_blob,
    )

    n = (len(samples) // ch) * ch
    arr = np.array(samples[:n], dtype=np.int16).reshape(-1, ch)
    blob = encode_pcm_blob(arr, rate, ch)
    dec = decode_pcm_blob(blob)
    if arr.size == 0:
        assert dec is None
    else:
        r, back = dec
        assert r == rate and back.shape == arr.shape
        assert (back == arr).all()


@PROP
@given(
    pairs=st.lists(
        st.tuples(
            st.floats(
                min_value=0.0,
                max_value=10.0,
                allow_nan=False,
                allow_infinity=False,
            ),
            st.sampled_from([0.0, 1.0]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_isotonic_calibration_properties(spark, pairs):
    """PAV invariants on random samples: probabilities strictly increase,
    segment sizes partition the sample, and the fit preserves the label
    mean (isotonic regression is mean-preserving over the whole sample)."""
    from bigdata_weather_system_spark.operators.inference import (
        isotonic_calibration,
    )

    df = spark.createDataFrame(pairs, "score double, label double")
    seg = sorted(
        map(tuple, isotonic_calibration(df, "score", "label").collect())
    )
    ps = [p for _, _, p, _ in seg]
    ns = [n for _, _, _, n in seg]
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert all(a < b for a, b in zip(ps, ps[1:]))
    assert sum(ns) == len(pairs)
    mean_fit = sum(p * n for p, n in zip(ps, ns)) / len(pairs)
    mean_y = sum(y for _, y in pairs) / len(pairs)
    assert abs(mean_fit - mean_y) < 1e-9
