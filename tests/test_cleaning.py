"""Unit tests for operators/cleaning.py: segment dedup, PII redaction,
blocked fuzzy matching, winsorized stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_weather_system_spark.operators.cleaning import (
    fuzzy_blocked_pairs,
    redact_pii,
    segment_dedup_stats,
    text_segments,
    winsorized_stats,
)


def test_text_segments_fixed_windows_and_tail(spark):
    df = spark.createDataFrame(
        [("a b c d e f g",), ("",), ("  x  ",)], "t string"
    )
    rows = df.select(text_segments(F.col("t"), 3).alias("s")).collect()
    assert rows[0].s == ["a b c", "d e f", "g"]  # tail shorter than window
    assert rows[1].s == []  # empty text → no segments (not a crash)
    assert rows[2].s == ["x"]


def test_segment_dedup_counts_cross_doc_and_within_doc(spark):
    # doc 1 and doc 2 share the segment "a b"; doc 3 repeats "z z" twice
    # WITHIN itself (self-repetition counts as duplication too).
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "z z z z")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in segment_dedup_stats(df, seg_tokens=2,
                                     max_dup_fraction=0.5).collect()
    }
    assert out[1].n_segments == 2 and out[1].n_dup_segments == 1
    assert out[2].n_segments == 2 and out[2].n_dup_segments == 1
    assert out[3].n_segments == 2 and out[3].n_dup_segments == 2
    assert out[3].dup_fraction == 1.0 and out[3].keep is False
    assert out[1].keep is True


def test_redact_pii_all_classes_and_ordering(spark):
    df = spark.createDataFrame(
        [
            (
                "mail a.b+c@ex-ample.co.uk visit https://x.org/p?q=1 "
                "from 192.168.1.254 call +44 20-7946-0958 done",
            )
        ],
        "t string",
    )
    red = df.select(redact_pii(F.col("t")).alias("r")).head().r
    assert "<EMAIL>" in red and "<URL>" in red and "<IP>" in red
    assert "<PHONE>" in red
    assert "@" not in red and "192.168" not in red
    # the dotted quad must become <IP>, never a half-matched <PHONE>
    assert "<IP> call" in red


def test_fuzzy_blocked_pairs_blocks_and_threshold(spark):
    df = spark.createDataFrame(
        [
            (1, "en", "the quick brown fox jumps"),
            (2, "en", "the quick brown fox jumped"),  # distance 2 from #1
            (3, "en", "completely different text here"),
            (4, "fr", "the quick brown fox jumps"),  # other block: no pair
        ],
        "doc_id long, lang string, text string",
    )
    pairs = fuzzy_blocked_pairs(
        df, block_cols=["lang"], id_col="doc_id", text_col="text",
        prefix_len=48, max_distance=5,
    ).collect()
    got = {(r.id_a, r.id_b): r.distance for r in pairs}
    assert (1, 2) in got and got[(1, 2)] <= 2
    assert all(a < b for a, b in got)
    assert not any(3 in p or 4 in p for p in got)


def test_fuzzy_blocked_pairs_hot_block_cap(spark):
    # 30 identical docs in one block → uncapped = 435 pairs; capped at 10
    # the whole block is dropped.
    rows = [(i, "en", "same text") for i in range(30)] + [
        (100, "de", "aaa"),
        (101, "de", "aab"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    capped = fuzzy_blocked_pairs(
        df, block_cols=["lang"], id_col="doc_id", text_col="text",
        max_distance=5, max_block_size=10,
    ).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(100, 101)}


def test_winsorized_stats_clamps_outliers(spark):
    # group g: 19 values of 1.0 plus one 1000.0 outlier — the winsorized
    # mean must sit near 1, far below the raw mean (~50.95).
    data = [("g", 1.0)] * 19 + [("g", 1000.0)]
    df = spark.createDataFrame(data, "k string, v double")
    row = winsorized_stats(df, "k", "v", lo=0.05, hi=0.95).head()
    assert row.n == 20
    assert row.winsorized_mean < 10.0
    assert row.hi_bound < 1000.0
    assert row.lo_bound == 1.0


def test_semantic_dedup_exact_baseline_matches_oracle(spark, sf_dir):
    """The exact O(n²) semantic-dedup pipeline is NOT a registered query
    (round-2 verdict: registered scale queries must not carry uncapped
    quadratic stages) but stays pinned here as the verification baseline:
    exact cosine pairs → connected components → keep-canonical must match
    the DuckDB recursive-CTE closure bit-for-bit."""
    import duckdb

    from bigdata_weather_system_spark.contract.cleaning_ops import (
        _SEMANTIC_DEDUP_ORACLE,
    )
    from bigdata_weather_system_spark.contract.llm_ops import (
        embedding_near_dup_exact,
    )
    from bigdata_weather_system_spark.operators.dedup import keep_canonical
    from bigdata_weather_system_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_exact(spark, sf_dir).select("id_a", "id_b")
    survivors = keep_canonical(
        e.withColumnRenamed("vec_id", "doc_id"), pairs, "doc_id"
    ).select(F.col("doc_id").alias("vec_id"), "label")
    got = sorted((r.vec_id, r.label) for r in survivors.collect())

    con = duckdb.connect()
    import os

    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet('{}')".format(
            os.path.join(sf_dir, "embeddings.parquet")
        )
    )
    want = sorted(map(tuple, con.execute(_SEMANTIC_DEDUP_ORACLE).fetchall()))
    con.close()
    assert got == want


def test_semantic_bucketed_pairs_have_no_false_positives(spark, sf_dir):
    """Within-cell verification is exact cosine — every bucketed pair must
    appear in the exact pair set (recall floors live in the registered
    semantic_dedup_accuracy_contract)."""
    from bigdata_weather_system_spark.contract.cleaning_ops import (
        _semantic_pairs_bucketed,
    )
    from bigdata_weather_system_spark.contract.llm_ops import (
        embedding_near_dup_exact,
    )
    from bigdata_weather_system_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    appr = {
        (r.id_a, r.id_b)
        for r in _semantic_pairs_bucketed(e).collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_exact(spark, sf_dir)
        .select("id_a", "id_b")
        .collect()
    }
    assert appr <= exact
    assert len(appr) >= 0.9 * len(exact)


def test_compression_ratio_orders_redundancy(spark):
    """Repetitive text must compress harder (lower ratio) than high-entropy
    text, empty text yields NULL, and every ratio respects DEFLATE's
    worst-case expansion bound."""
    import random

    from bigdata_weather_system_spark.operators.cleaning import (
        compression_ratio,
    )

    rng = random.Random(7)
    noisy = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                for _ in range(8))
        for _ in range(200)
    )
    df = spark.createDataFrame(
        [
            (1, "spam ham " * 400),
            (2, noisy),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert out[3].compression_ratio is None
    assert out[1].compression_ratio < out[2].compression_ratio
    assert out[1].compression_ratio < 0.1  # 400x repetition crushes
    for r in (out[1], out[2]):
        bound = (r.raw_bytes + 11 + -(-r.raw_bytes // 16384) * 5) / r.raw_bytes
        assert 0 < r.compression_ratio <= bound


def test_duplicate_span_stats_merges_overlapping_windows(spark):
    """Two docs sharing one 10-token run (k=8 → 3 duplicated windows,
    overlapping) must report ONE merged span covering exactly 10 tokens;
    a doc with no repeated window reports zeros."""
    from bigdata_weather_system_spark.operators.dedup import (
        duplicate_span_stats,
    )

    shared = "a b c d e f g h i j"
    df = spark.createDataFrame(
        [
            (1, shared + " unique1 tail1 x1 y1 z1 w1 v1"),
            (2, "lead2 other2 " + shared + " done2 q2 r2 s2 t2 u2"),
            (3, "entirely fresh words without any repeats at all here now"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicate_span_stats(df, k=8).collect()}
    for d in (1, 2):
        assert out[d].n_dup_windows == 3
        assert out[d].n_spans == 1
        assert out[d].covered_tokens == 10
        assert out[d].dup_coverage_ppm == 10 * 1_000_000 // out[d].n_tokens
    assert out[3].n_dup_windows == 0
    assert out[3].n_spans == 0
    assert out[3].covered_tokens == 0
    assert out[3].dup_coverage_ppm == 0
