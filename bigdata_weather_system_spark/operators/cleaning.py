"""Corpus-cleaning operators: segment-level dedup, PII redaction, blocked
fuzzy matching, and robust (winsorized) statistics.

These extend the dedup/text families with the cleaning passes a real
training-data pipeline runs between crawl and tokenization:

- ``segment_dedup_stats`` — CCNet-style *sub-document* duplication: split
  each doc into fixed-width token segments, count how often each segment
  appears across the whole corpus, and score each doc by its duplicated
  fraction. Catches boilerplate (headers, navbars, license blocks) that
  whole-document dedup misses.
- ``redact_pii`` — email / URL / IPv4 / phone scrubbing as one chained
  ``regexp_replace`` column expression (JVM-side, codegen'd; no UDF).
- ``fuzzy_blocked_pairs`` — record-linkage join: cheap blocking key first,
  then exact Levenshtein only *within* blocks (never all-pairs), riding the
  hot-bucket-capped ``pair_up`` postings path from ``operators.dedup``.
- ``winsorized_stats`` — per-group robust stats: clamp to in-group
  percentile bounds, then aggregate. One window pass + one agg, both on the
  same group partitioning.

Scale notes: segment counting shuffles 16-byte md5 keys (never segment
text); fuzzy matching cost is Σ_blocks c² with c capped; redaction is a
narrow map stage.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import pair_up
from .text import tokens

# --------------------------------------------------------------------------
# Segment-level (sub-document) dedup — CCNet-style
# --------------------------------------------------------------------------


def text_segments(text: Column, seg_tokens: int = 10) -> Column:
    """Consecutive non-overlapping ``seg_tokens``-token segments of ``text``
    as an array of strings (the last segment may be shorter).

    Pure array lambdas (split → sequence → slice → join): segmentation is a
    narrow map stage, no explode-then-regroup shuffle.
    """
    toks = tokens(text)
    k = seg_tokens
    n_seg = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    segs = F.transform(
        # sequence(0, -1) would generate a DESCENDING range — guard empties
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
    )
    return F.when(F.size(toks) > 0, segs).otherwise(
        F.array().cast("array<string>")
    )


def segment_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 10,
    max_dup_fraction: float = 0.5,
) -> DataFrame:
    """Per-document duplicated-segment fraction against the whole corpus.

    CCNet / RefinedWeb-style sub-document dedup: a segment is *duplicated*
    if its exact text occurs in more than one (doc, position) across the
    corpus. Returns one row per doc with ``n_segments``,
    ``n_dup_segments``, ``dup_fraction`` and a ``keep`` flag
    (``dup_fraction <= max_dup_fraction``).

    Plan shape: segment arrays are built narrow (no shuffle), exploded once,
    and counted by the segment's md5 — the shuffle moves 16-byte keys, not
    segment text. The per-doc rollup then groups by the numeric id. Two
    shuffles total, both on compact keys; survives corpus scale because no
    stage ever pairs segments against each other.
    """
    segs = df.select(
        F.col(id_col),
        F.explode(text_segments(F.col(text_col), seg_tokens)).alias("_seg"),
    ).select(F.col(id_col), F.md5(F.col("_seg")).alias("_h"))
    counts = segs.groupBy("_h").agg(F.count("*").alias("_c"))
    per_doc = (
        segs.join(counts, "_h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_segments"),
            F.sum((F.col("_c") > 1).cast("long")).alias("n_dup_segments"),
        )
    )
    frac = F.col("n_dup_segments") / F.col("n_segments")
    return per_doc.select(
        id_col,
        "n_segments",
        "n_dup_segments",
        F.round(frac, 6).alias("dup_fraction"),
        (frac <= F.lit(max_dup_fraction)).alias("keep"),
    )


# --------------------------------------------------------------------------
# PII redaction — chained regexp_replace, RE2-compatible patterns
# --------------------------------------------------------------------------

# Patterns stay inside the RE2 ∩ java.util.regex common subset (no
# lookaround, no backrefs) so a DuckDB oracle can run the same regexes.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Replace emails, URLs, IPv4s, and phone-shaped digit runs with typed
    placeholder tokens. One chained ``regexp_replace`` expression —
    JVM-side, whole-stage-codegen, no Python in the loop.

    Order matters: emails before URLs (an email inside a URL query string
    is swallowed by ``<URL>`` either way), IPs before phones (so dotted
    quads never half-match the looser phone pattern).
    """
    out = text
    for _name, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> list[Column]:
    """Match counts per PII class (aliased ``n_email`` / ``n_url`` /
    ``n_ip`` / ``n_phone``), computed on the RAW text."""
    return [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _tok in PII_PATTERNS
    ]


# --------------------------------------------------------------------------
# Blocked fuzzy matching (record linkage)
# --------------------------------------------------------------------------


def fuzzy_blocked_pairs(
    df: DataFrame,
    block_cols: Sequence[str],
    id_col: str,
    text_col: str,
    prefix_len: int = 48,
    max_distance: int = 8,
    max_block_size: int | None = 2000,
) -> DataFrame:
    """Candidate near-matches by exact Levenshtein distance, computed only
    WITHIN blocks.

    Classic record-linkage shape: a cheap deterministic blocking key (e.g.
    language + length bucket) bounds the quadratic term, then the O(n·m)
    edit distance runs on length-capped prefixes inside each block. Reuses
    the grouped-postings ``pair_up`` (one shuffle, hot-block cap) rather
    than a self-join. Output: ``id_a < id_b``, both prefixes' block key
    columns dropped, ``distance <= max_distance``.

    At corpus scale the cost is Σ_blocks c²·prefix_len² with c capped by
    ``max_block_size`` — never all-pairs, and the distance runs on
    ``prefix_len`` chars, not full documents.
    """
    keyed = df.select(
        F.concat_ws("", *[F.col(c).cast("string") for c in block_cols]).alias(
            "_block"
        ),
        F.col(id_col),
        F.substring(F.col(text_col), 1, prefix_len).alias("_prefix"),
    )
    pairs = pair_up(
        keyed,
        bucket_cols=["_block"],
        payload_cols=[id_col, "_prefix"],
        max_bucket_size=max_block_size,
    )
    dist = F.levenshtein(F.col("a._prefix"), F.col("b._prefix")).cast("long")
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            dist.alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
    )


# --------------------------------------------------------------------------
# Winsorized (robust) per-group statistics
# --------------------------------------------------------------------------


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group mean/stddev after clamping values to the group's
    [``lo``, ``hi``] interpolated percentiles (winsorization — robust to
    heavy tails, standard in feature hygiene).

    One window pass computes the in-group bounds, one agg on the SAME
    group key folds the clamped values — the window's hash partitioning is
    reused by the agg, so there is a single shuffle end-to-end.
    """
    w = Window.partitionBy(group_col)
    v = F.col(value_col)
    lo_b = F.percentile(v, lo).over(w)
    hi_b = F.percentile(v, hi).over(w)
    clamped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return (
        df.select(
            F.col(group_col),
            v,
            lo_b.alias("_lo"),
            hi_b.alias("_hi"),
        )
        .select(
            group_col,
            clamped.alias("_cv"),
            "_lo",
            "_hi",
        )
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("_lo"), 6).alias("lo_bound"),
            F.round(F.min("_hi"), 6).alias("hi_bound"),
            F.round(F.avg("_cv"), 6).alias("winsorized_mean"),
            F.round(F.stddev_samp("_cv"), 6).alias("winsorized_stddev"),
        )
    )


def survivorship_merge(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    rules: dict[str, str],
) -> DataFrame:
    """Golden-record survivorship: collapse duplicate records per key into
    one, field by field, under per-field rules — the MDM merge step that
    follows entity resolution (``fuzzy_blocked_pairs`` finds the
    duplicates; this decides what survives).

    ``rules`` maps field → rule:

    - ``latest_non_null``: value from the highest-``seq_col`` row where
      the field is non-null (the standard freshest-wins rule that still
      back-fills from older duplicates when the newest is sparse);
    - ``earliest``: value from the lowest-``seq_col`` row (provenance
      fields like first-seen);
    - ``max`` / ``min`` / ``sum``: plain aggregates (lifetime counters).

    Everything compiles to ONE hash aggregation — ``max_by``/``min_by``
    argmax aggregates with a null-guarded key, no window, no self-join —
    so the merge is a single shuffle on the entity key and map-side
    combines like any other agg.
    """
    aggs = []
    for field, rule in rules.items():
        c = F.col(field)
        if rule == "latest_non_null":
            aggs.append(
                F.max_by(c, F.when(c.isNotNull(), F.col(seq_col))).alias(field)
            )
        elif rule == "earliest":
            aggs.append(F.min_by(c, F.col(seq_col)).alias(field))
        elif rule == "max":
            aggs.append(F.max(c).alias(field))
        elif rule == "min":
            aggs.append(F.min(c).alias(field))
        elif rule == "sum":
            aggs.append(F.sum(c).alias(field))
        else:
            raise ValueError(f"survivorship_merge: unknown rule {rule!r}")
    return df.groupBy(*[F.col(k) for k in key_cols]).agg(*aggs)


def compression_ratio(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    published redundancy quality signal (low ratio = repetitive
    boilerplate, near-1 = high-entropy text; used as a filter in
    RefinedWeb-style pipelines). zlib is in the stdlib, so unlike the
    image/audio codecs this is a REAL kernel, Arrow-batched through a
    pandas UDF (one Python call per ~10k-row batch, not per row). A SQL
    engine cannot reproduce DEFLATE, so the registered query is
    rows-only; bounds and coverage are pinned by the oracle-checked
    contract twin and pytest."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _zlib_ratio(s):
        import zlib

        def one(t):
            raw = (t or "").encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, 6)) / len(raw)

        return pd.Series([one(t) for t in s])

    return df.select(
        F.col(id_col),
        F.octet_length(F.col(text_col)).cast("long").alias("raw_bytes"),
        _zlib_ratio(F.col(text_col)).alias("compression_ratio"),
    )
