"""Contract queries: corpus curation wave 2 (round 5) — CCNet line
dedup, DSIR importance weights, UniMax budget allocation.

Between raw web extraction (web_ops) and tokenization (the BPE family),
a training corpus runs exactly these passes; each is registered with a
full DuckDB oracle. (PII scrubbing is already covered by cleaning_ops'
``doc_pii_redaction``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .core import register, _t
from ..operators.curation import (
    dsir_logweights,
    line_dedup,
    unimax_allocation,
)

#: DuckDB twin of ``operators.text.tokens`` (the repo-wide idiom).
_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
)


@register(
    "doc_line_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tok AS (
      SELECT doc_id, generate_subscripts(toks, 1) AS ord,
             unnest(toks) AS tok
      FROM t
    ),
    lines AS (
      SELECT doc_id, CAST((ord - 1) // 8 AS INT) AS line_no,
             string_agg(tok, ' ' ORDER BY ord) AS line
      FROM tok GROUP BY doc_id, (ord - 1) // 8
    ),
    rk AS (
      SELECT *, row_number() OVER (
               PARTITION BY line ORDER BY doc_id, line_no) AS rn
      FROM lines
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_lines,
           md5(coalesce(
             string_agg(CASE WHEN rn = 1 THEN line END, chr(10)
                        ORDER BY line_no),
             '')) AS clean_md5
    FROM rk GROUP BY doc_id
    """,
)
def doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet corpus-level line dedup (Wenzek et al., LREC 2020): every
    8-token line is kept only at its first corpus occurrence (smallest
    ``(doc_id, line_no)``); documents are reassembled and reported as
    (total, kept, md5-of-clean-text). The md5 pins byte-exact
    reassembly, not just the counts.

    Plan shape: segmentation is one projection (no token shuffle); the
    first-occurrence rank shuffles once on line content; reassembly
    shuffles once on doc_id. Both exchanges key on the operator's
    natural keys — at 100 TB this is the same two-shuffle profile as
    exact dedup plus a groupBy."""
    return line_dedup(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_TOKS} AS toks FROM documents
    ),
    b AS (
      SELECT doc_id, source,
             CAST(('0x' || substring(md5(unnest(toks)), 1, 15)) AS BIGINT)
               % 64 AS bucket
      FROM t
    ),
    cnt AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS r_b,
             CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                  AS BIGINT) AS t_b
      FROM b GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(sum(r_b) AS BIGINT) AS r_tot,
             CAST(sum(t_b) AS BIGINT) AS t_tot
      FROM cnt
    ),
    lam AS (
      SELECT bucket,
             round(ln((t_b + 1.0) / (t_tot + 64.0))
                   - ln((r_b + 1.0) / (r_tot + 64.0)), 9) AS lam
      FROM cnt CROSS JOIN tot
    ),
    dbk AS (
      SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS c
      FROM b GROUP BY doc_id, bucket
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           round(list_reduce(list(c * lam ORDER BY bucket),
                             (a, x) -> a + x), 6) AS dsir_logweight
    FROM dbk JOIN lam USING (bucket)
    GROUP BY doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al., NeurIPS 2023) data-selection scores: hashed
    unigram (64 md5 buckets) bag-of-words models for the target slice
    (``source = 'src0'``, the high-quality proxy) vs the raw corpus,
    add-one smoothed; per doc, the summed log-likelihood ratio of its
    tokens. Positive ⇒ looks like the target domain; downstream
    selection resamples by these weights.

    Float policy: λ rounded to 9 on both engines, per-doc fold over
    ``count × λ`` terms in bucket order (≤ 64 terms), final round 6 —
    identical inputs and fold order ⇒ exact agreement.

    Plan shape: the token explosion collapses map-side to ``(doc_id,
    bucket)`` partial counts; the 64-row λ model is broadcast; one
    doc-keyed aggregation. Linear in tokens at 100 TB."""
    return dsir_logweights(
        _t(spark, sf_dir, "documents").select("doc_id", "source", "text"),
        target=F.col("source") == "src0",
    )


@register(
    "lang_unimax_allocation",
    oracle=f"""
    WITH per AS (
      SELECT lang, CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM per),
    s AS (
      SELECT lang, n_tokens, n_tokens * 2 AS cap_tokens,
             total // 2 AS budget,
             row_number() OVER (ORDER BY n_tokens * 2, lang) AS alloc_rank,
             sum(n_tokens * 2) OVER (
               ORDER BY n_tokens * 2, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_i,
             count(*) OVER () AS k
      FROM per CROSS JOIN tot
    ),
    f AS (
      SELECT *, CASE WHEN cap_tokens * (k - alloc_rank) + s_i <= budget
                     THEN alloc_rank END AS capped_rk
      FROM s
    ),
    m AS (
      SELECT coalesce(max(capped_rk), 0) AS m,
             coalesce(max(CASE WHEN capped_rk IS NOT NULL THEN s_i END), 0)
               AS s_m
      FROM f
    )
    SELECT lang, n_tokens, cap_tokens,
           CAST(alloc_rank AS BIGINT) AS alloc_rank,
           CAST(CASE WHEN alloc_rank <= m THEN 1 ELSE 0 END AS INT)
             AS capped,
           round(CASE WHEN alloc_rank <= m THEN CAST(cap_tokens AS DOUBLE)
                      ELSE (budget - s_m) / CAST(k - m AS DOUBLE) END, 6)
             AS alloc_tokens,
           round((CASE WHEN alloc_rank <= m THEN CAST(cap_tokens AS DOUBLE)
                       ELSE (budget - s_m) / CAST(k - m AS DOUBLE) END)
                 / n_tokens, 6) AS epochs_used
    FROM f CROSS JOIN m
    """,
)
def lang_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax (Chung et al., ICLR 2023) per-language budget allocation:
    spend ``total_tokens // 2`` across languages, capping each at 2
    epochs of its own tokens and splitting the remainder uniformly over
    the uncapped (larger) languages. The paper's sequential greedy loop
    is replaced by its closed form — under the ascending-cap sort,
    cappedness is a prefix property (``t_i·(k−i) + S_i ≤ B``), so two
    window functions and one max give the exact same allocation.

    Plan shape: one corpus aggregation to a #languages-row relation;
    the windows' global sort runs on those few rows (documented tiny
    post-agg sort). Integer-exact until the single final division."""
    return unimax_allocation(_t(spark, sf_dir, "documents"))
