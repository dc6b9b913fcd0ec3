"""Corpus-curation operators, wave 2 (round 5): PII redaction, CCNet-style
corpus-level line dedup, DSIR importance weights, and UniMax per-language
token-budget allocation.

These are the curation passes a 100 TB training corpus runs between raw
extraction (the web/WARC family) and tokenization (the BPE family):

- **Line dedup** — CCNet's (Wenzek et al., LREC 2020) corpus-level
  duplicated-line removal: hash every line across the whole corpus,
  keep the first occurrence (smallest ``(doc_id, line_no)``), drop the
  rest, reassemble documents. The testdata's documents are single-line,
  so "lines" are fixed 8-token windows — the segmentation is a
  parameter, the corpus-wide first-occurrence semantics are the point.
- **DSIR** — Data Selection with Importance Resampling (Xie et al.,
  NeurIPS 2023): hashed unigram features, smoothed log-likelihood ratio
  of a target domain vs the raw corpus, summed per document. The
  per-bucket model is a tiny broadcastable relation (``n_buckets``
  rows); the per-doc score is a fold over at most ``n_buckets`` terms
  in bucket order (deterministic float policy, matching the repo-wide
  sorted-fold idiom).
- **UniMax** — Chung et al., ICLR 2023: allocate a total token budget
  across languages, capping every language at ``max_epochs`` repeats,
  splitting the remainder uniformly over the uncapped (larger)
  languages. The sequential greedy allocator has a closed form under
  the ascending-cap sort (cappedness is a prefix property — see
  ``unimax_allocation``), so the whole thing is two window functions
  over a per-language relation that is orders of magnitude smaller than
  the corpus.

(PII scrubbing already lives in ``operators/cleaning.py`` —
``redact_pii`` / ``pii_counts``, contract query ``doc_pii_redaction``.)

Scale notes (100 TB): line segmentation is per-row linear,
whole-stage-codegen'd. Line dedup shuffles once on line content
(the same key the groupBy would use); the reassembly groupBy shuffles on
``doc_id``. DSIR explodes tokens but aggregates them immediately to
``(doc_id, bucket)`` — map-side partial aggregation collapses the
explosion before the exchange; the λ model is broadcast. UniMax runs its
windows over a #languages-row relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import tokens


def doc_lines(
    df: DataFrame, text_col: str = "text", tokens_per_line: int = 8
) -> DataFrame:
    """Segment each document into fixed ``tokens_per_line`` windows —
    one projection (sequence → slice → array_join), no token-level
    shuffle. Returns ``(doc_id, line_no, line)``; token-less documents
    produce no rows (matching the oracle's empty-unnest semantics)."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    k = F.lit(tokens_per_line)
    n_lines = F.ceil(n / k).cast("int")
    arr = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        "doc_id", F.posexplode(arr).alias("line_no", "line")
    ).withColumn("line_no", F.col("line_no").cast("int"))


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    tokens_per_line: int = 8,
    with_text: bool = False,
) -> DataFrame:
    """CCNet corpus-level line dedup: a line survives only at its FIRST
    corpus occurrence (smallest ``(doc_id, line_no)``); later copies are
    dropped. Returns one row per document: total and kept line counts
    plus the md5 of the reassembled (newline-joined) kept text.
    ``with_text=True`` additionally returns the reassembled
    ``clean_text`` itself — the form downstream curation stages (DSIR
    scoring, UniMax budgeting, tokenization) consume in the chained
    pipeline.

    Plan: first occurrence per line via ``groupBy(line).agg(min(struct))``
    — a COMBINABLE aggregate, so every copy of a hot boilerplate line
    (the exact thing CCNet dedup targets) collapses map-side to one
    partial per partition before the exchange, where the previous
    ``row_number`` window had to ship every copy to a single reducer.
    There is NO join back on line content at all: the first-occurrence
    relation (one row per DISTINCT line) already lists every kept line
    with its home ``(doc_id, line_no)``, so kept counts and reassembly
    aggregate that relation by doc_id directly — a hot line never
    co-locates its copies anywhere. Per-doc totals come from a second
    doc_id-keyed aggregation of the segmentation (a narrow projection
    re-read, not a shuffle of line content), and the two doc-keyed
    relations join co-partitioned. Nothing quadratic, no skew surface,
    no driver-side state."""
    lines = doc_lines(df, text_col, tokens_per_line)
    first = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "line_no")).alias("_f")
    )
    kept_rows = first.select(
        F.col("_f.doc_id").alias("doc_id"),
        F.col("_f.line_no").alias("line_no"),
        "line",
    )
    joined = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("line_no", "line"))),
            lambda x: x["line"],
        ),
        "\n",
    )
    kept_aggs = [
        F.count(F.lit(1)).cast("long").alias("kept_lines"),
        joined.alias("_clean_text"),
    ]
    kept = kept_rows.groupBy("doc_id").agg(*kept_aggs)
    totals = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    out = totals.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce(F.col("kept_lines"), F.lit(0).cast("long")).alias(
            "kept_lines"
        ),
        F.md5(F.coalesce(F.col("_clean_text"), F.lit(""))).alias(
            "clean_md5"
        ),
        F.coalesce(F.col("_clean_text"), F.lit("")).alias("clean_text"),
    )
    return out if with_text else out.drop("clean_text")


def _md5_bucket(col: Column, n_buckets: int) -> Column:
    """Portable hash bucket: first 15 hex chars of md5 → 60-bit int →
    mod. DuckDB twin: ``CAST(('0x' || substring(md5(x),1,15)) AS BIGINT)
    % n``."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
        % n_buckets
    )


def dsir_logweights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """DSIR (Xie et al., NeurIPS 2023) importance log-weights: hashed
    unigram bag-of-words models for the target slice vs the whole
    corpus, add-one smoothed; each document scores the sum over its
    tokens of ``ln p_target(bucket) − ln p_raw(bucket)``.

    Float policy: λ per bucket is rounded to 9 decimals on both engines,
    the per-doc sum folds ``count × λ`` terms in bucket order (≤
    ``n_buckets`` terms), final round to 6 — bit-identical fold inputs
    and order, so the engines agree exactly.

    Scale: the token explosion is scanned ONCE — it collapses map-side
    into ``(doc_id, is_target, bucket)`` partial counts before any
    exchange, and both the per-bucket λ model inputs (``r_b``, ``t_b``)
    and the per-doc term relation derive from that one aggregate, so
    tokenize+md5+explode never runs twice over the corpus. The λ model
    is ``n_buckets`` rows, broadcast. Nothing grows faster than the
    token count."""
    bkt = df.select(
        "doc_id",
        target.alias("is_target"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select(
        "doc_id", "is_target", _md5_bucket(F.col("tok"), n_buckets).alias("bucket")
    )
    # ONE aggregation over the explosion; is_target is constant per doc,
    # so (doc_id, is_target, bucket) has the same cardinality as
    # (doc_id, bucket) and map-side combine still collapses the tokens.
    dbk = bkt.groupBy("doc_id", "is_target", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    cnt = dbk.groupBy("bucket").agg(
        F.sum("c").alias("r_b"),
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(0)).alias(
            "t_b"
        ),
    )
    tot = cnt.agg(
        F.sum("r_b").alias("r_tot"), F.sum("t_b").alias("t_tot")
    )
    b = float(n_buckets)
    lam = cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log((F.col("t_b") + 1.0) / (F.col("t_tot") + b))
            - F.log((F.col("r_b") + 1.0) / (F.col("r_tot") + b)),
            9,
        ).alias("lam"),
    )
    term = dbk.join(F.broadcast(lam), "bucket").select(
        "doc_id", "c", F.struct("bucket", (F.col("c") * F.col("lam")).alias("term")).alias("bt")
    )
    return term.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("bt")),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            ),
            6,
        ).alias("dsir_logweight"),
    )


def unimax_allocation(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    budget_divisor: int = 2,
    max_epochs: int = 2,
) -> DataFrame:
    """UniMax (Chung et al., ICLR 2023) budget allocation: distribute a
    token budget (``total // budget_divisor``) over languages, capping
    each at ``max_epochs × n_tokens`` and splitting what remains
    uniformly across the uncapped languages.

    Closed form instead of the paper's sequential loop: sort languages
    ascending by cap ``t_i``; language ``i`` is capped iff
    ``t_i·(k−i) + S_i ≤ B`` (``S_i`` = prefix cap sum), and cappedness
    is a prefix of that order (if ``i`` satisfies it, so does ``i−1``
    since ``t`` is sorted) — so the allocator is: two window functions,
    one max, one division. Runs over the per-language relation
    (#languages rows), never the corpus."""
    per = df.groupBy(lang_col).agg(
        F.sum(F.size(tokens(F.col(text_col)))).cast("long").alias("n_tokens")
    )
    tot = per.agg(F.sum("n_tokens").cast("long").alias("total"))
    s = per.crossJoin(F.broadcast(tot)).select(
        lang_col,
        "n_tokens",
        (F.col("n_tokens") * max_epochs).alias("cap_tokens"),
        F.expr(f"total div {budget_divisor}").alias("budget"),
    )
    # #languages rows: the global sort the windows imply is a single
    # tiny post-aggregation relation (documented, plan-doctor exempt).
    w = Window.orderBy("cap_tokens", lang_col)
    s = (
        s.withColumn("alloc_rank", F.row_number().over(w))
        .withColumn(
            "s_i",
            F.sum("cap_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("k", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    s = s.withColumn(
        "capped_rk",
        F.when(
            F.col("cap_tokens") * (F.col("k") - F.col("alloc_rank"))
            + F.col("s_i")
            <= F.col("budget"),
            F.col("alloc_rank"),
        ),
    )
    m = s.agg(
        F.coalesce(F.max("capped_rk"), F.lit(0)).alias("m"),
        F.coalesce(
            F.max(F.when(F.col("capped_rk").isNotNull(), F.col("s_i"))),
            F.lit(0).cast("long"),
        ).alias("s_m"),
    )
    j = s.crossJoin(F.broadcast(m))
    alloc = F.when(
        F.col("alloc_rank") <= F.col("m"), F.col("cap_tokens").cast("double")
    ).otherwise(
        (F.col("budget") - F.col("s_m"))
        / (F.col("k") - F.col("m")).cast("double")
    )
    return j.select(
        lang_col,
        "n_tokens",
        "cap_tokens",
        F.col("alloc_rank").cast("long").alias("alloc_rank"),
        (F.col("alloc_rank") <= F.col("m")).cast("int").alias("capped"),
        F.round(alloc, 6).alias("alloc_tokens"),
        F.round(alloc / F.col("n_tokens"), 6).alias("epochs_used"),
    )
