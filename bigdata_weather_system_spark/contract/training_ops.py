"""Contract queries: training-run assembly operators (round 4).

The decisions a training pipeline makes AFTER the corpus is clean:
which preference pairs feed RLHF/DPO, how a tokenizer's fertility
varies by language (the cost model for multilingual token budgets),
what LSH banding parameters the dedup family should run with, and how
source mixing weights follow from a sampling temperature. Each is a
bounded aggregation or a closed-form scalar grid — no pair stages, no
Python row path — with a full DuckDB oracle.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.text import tokens
from .core import register, _t

#: DuckDB-side whitespace tokenization — identical to llm_ops._TOKS.
_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"

#: Sub-word tokenization both engines reproduce exactly: maximal runs of
#: word chars plus maximal runs of non-word-non-space chars (what the
#: byte-level-BPE-ish `bpe_ish_token_count` splitter yields on clean
#: text, re-expressed as extract-all so RE2 (DuckDB) and Java agree —
#: lookarounds, which the split form uses, don't exist in RE2).
_SUBWORD_RE = r"\w+|[^\w\s]+"


@register(
    "preference_pair_mining",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, value FROM events
      WHERE event_type = 'click' AND value IS NOT NULL
    ),
    best AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id ASC) AS rn
      FROM c
    ),
    worst AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value ASC, event_id ASC) AS rn
      FROM c
    ),
    n AS (SELECT user_id, count(*) AS n_events FROM c GROUP BY user_id)
    SELECT b.user_id,
           b.event_id AS chosen_event_id,
           w.event_id AS rejected_event_id,
           b.value    AS chosen_value,
           w.value    AS rejected_value,
           b.value - w.value AS margin,
           CAST(n.n_events AS BIGINT) AS n_candidates
    FROM best b
    JOIN worst w ON w.user_id = b.user_id AND w.rn = 1
    JOIN n ON n.user_id = b.user_id
    WHERE b.rn = 1 AND n.n_events >= 2 AND b.value - w.value > 0
    """,
)
def preference_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLHF/DPO preference-pair construction: per prompt group (user's
    click stream standing in for a prompt's response set, ``value`` as
    the reward-model score), emit (chosen, rejected) = the best- and
    worst-scored responses with deterministic tie-breaks (ties go to the
    lower event id) and the reward margin — degenerate groups (one
    candidate, or zero margin) are dropped, exactly what a DPO data
    builder must do to avoid training on noise pairs.

    ONE aggregation pass: ``max_by``/``min_by`` on composite struct keys
    pick both extremes with their tie-breaks in the same partial-agg
    shuffle (key ``(value, -event_id)`` maximized ≡ value desc, id asc;
    ``(value, event_id)`` minimized ≡ value asc, id asc) — no window, no
    self-join, mergeable state of two (key, payload) pairs per group, so
    a billion prompt groups cost one skew-safe shuffle."""
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "click") & F.col("value").isNotNull()
    )
    g = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "value"),
            F.struct(F.col("value"), (-F.col("event_id")).alias("nid")),
        ).alias("ch"),
        F.min_by(
            F.struct("event_id", "value"),
            F.struct(F.col("value"), F.col("event_id")),
        ).alias("rj"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    margin = F.col("ch.value") - F.col("rj.value")
    return (
        g.filter((F.col("n_candidates") >= 2) & (margin > 0))
        .select(
            "user_id",
            F.col("ch.event_id").alias("chosen_event_id"),
            F.col("rj.event_id").alias("rejected_event_id"),
            F.col("ch.value").alias("chosen_value"),
            F.col("rj.value").alias("rejected_value"),
            margin.alias("margin"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
        )
    )


@register(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len({_TOKS})) AS BIGINT) AS n_words,
           CAST(sum(len(regexp_extract_all(text, '{_SUBWORD_RE}')))
                AS BIGINT) AS n_subword_tokens,
           round(sum(len(regexp_extract_all(text, '{_SUBWORD_RE}')))
                 * 1.0 / sum(len({_TOKS})), 6) AS fertility,
           round(sum(length(text)) * 1.0
                 / sum(len(regexp_extract_all(text, '{_SUBWORD_RE}'))), 6)
             AS chars_per_token
    FROM documents GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility (subword tokens per whitespace word) and
    compression (chars per subword token) by language — the two numbers
    that decide how a fixed token budget translates into per-language
    data volume, and the standard diagnostic for a tokenizer that
    under-serves a language (fertility ≫ english baseline ⇒ the
    vocabulary under-represents it and its documents burn budget).
    Counts are exact integer sums from one narrow projection (the
    subword splitter is a regexp extract-all both engines reproduce
    bit-for-bit), so the two ratios are single exact-int divisions —
    scan-local work, one bounded groupBy."""
    d = _t(spark, sf_dir, "documents")
    sub = F.size(F.regexp_extract_all(F.col("text"), F.lit(_SUBWORD_RE), 0))
    per = d.select(
        "lang",
        F.size(tokens(F.col("text"))).alias("w"),
        sub.alias("s"),
        F.length("text").alias("ch"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("n_words"),
        F.sum("s").alias("n_subword_tokens"),
        F.round(F.sum("s") / F.sum("w"), 6).alias("fertility"),
        F.round(F.sum("ch") / F.sum("s"), 6).alias("chars_per_token"),
    )


@register(
    "lsh_parameter_planner",
    oracle="""
    WITH cand AS (SELECT unnest([1, 2, 4, 8, 16, 32]) AS b),
    scored AS (
      SELECT b, CAST(32 / b AS INT) AS r,
             round(list_reduce(
               list_transform(range(1, 50), i ->
                 (1 - power(1 - power(i / 100.0, 32.0 / b), b)) * 0.01),
               (a, x) -> a + x), 6) AS fp_area,
             round(list_reduce(
               list_transform(range(50, 100), i ->
                 power(1 - power(i / 100.0, 32.0 / b), b) * 0.01),
               (a, x) -> a + x), 6) AS fn_area,
             round(power(1 - power(0.5, 1.0 / b), b / 32.0), 6)
               AS s50_threshold
      FROM cand
    )
    SELECT b AS n_bands, r AS rows_per_band, fp_area, fn_area,
           round(fp_area + fn_area, 6) AS total_error,
           s50_threshold,
           CAST(row_number() OVER (ORDER BY fp_area + fn_area, b)
                AS BIGINT) AS rank
    FROM scored
    """,
)
def lsh_parameter_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding planner: for every (bands b, rows r = 32/b)
    split of the family's 32 hashes, integrate the S-curve
    P(match | jaccard s) = 1 − (1 − s^r)^b against the ideal step at
    t = 0.5 over a 99-point grid — false-positive area below the
    threshold, false-negative area above — and rank the splits by total
    error (this is how the dedup family's default (8 bands × 4 rows)
    was chosen; re-run with a different t to retune). Also emits each
    split's s50 (the similarity where detection crosses 50%:
    (1 − 0.5^(1/b))^(1/r)). Everything is a closed-form fold over
    literal sequences — the whole plan is 6 rows of per-row expression
    work, ZERO table scans and zero shuffles beyond the 6-row rank;
    both engines fold the grid in ascending index order so the float
    sums agree exactly."""
    cand = spark.createDataFrame(
        [(1,), (2,), (4,), (8,), (16,), (32,)], "b int"
    )
    bd = F.col("b").cast("double")
    r = F.lit(32.0) / bd

    def p_match(i):
        s = i.cast("double") / 100.0
        return 1.0 - F.pow(1.0 - F.pow(s, r), bd)

    fold = lambda lo, hi, f: F.aggregate(
        F.sequence(F.lit(lo), F.lit(hi)),
        F.lit(0.0),
        lambda acc, i: acc + f(i) * 0.01,
    )
    scored = cand.select(
        "b",
        (32 / F.col("b")).cast("int").alias("r"),
        F.round(fold(1, 49, p_match), 6).alias("fp_area"),
        F.round(fold(50, 99, lambda i: 1.0 - p_match(i)), 6).alias(
            "fn_area"
        ),
        F.round(
            F.pow(1.0 - F.pow(F.lit(0.5), 1.0 / bd), bd / 32.0), 6
        ).alias("s50_threshold"),
    )
    return scored.select(
        F.col("b").cast("int").alias("n_bands"),
        F.col("r").alias("rows_per_band"),
        "fp_area",
        "fn_area",
        F.round(F.col("fp_area") + F.col("fn_area"), 6).alias(
            "total_error"
        ),
        "s50_threshold",
        F.row_number()
        .over(
            Window.orderBy(
                F.col("fp_area") + F.col("fn_area"), F.col("b")
            )
        )
        .cast("long")
        .alias("rank"),
    )


@register(
    "mixture_temperature_weights",
    oracle="""
    WITH per AS (
      SELECT source,
             count(*) AS n_docs,
             CAST(sum(len(list_filter(
               regexp_split_to_array(lower(text), '\\s+'),
               x -> x <> ''))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT list_reduce(list(power(n_tokens, 0.7) ORDER BY source),
                         (a, x) -> a + x) AS z,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM per
    )
    SELECT p.source,
           CAST(p.n_docs AS BIGINT) AS n_docs,
           p.n_tokens,
           round(power(p.n_tokens, 0.7) / t.z, 6) AS mix_weight,
           round(power(p.n_tokens, 0.7) / t.z * t.total_tokens
                 / p.n_tokens, 6) AS expected_epochs
    FROM per p CROSS JOIN tot t
    """,
)
def mixture_temperature_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-based source mixing (the multilingual/multi-source
    sampling rule: p_s ∝ n_s^τ, here τ = 0.7): per source, the mixing
    weight and the expected epochs over that source in one pass of the
    mixed stream (weight × total ÷ size — >1 means the source repeats,
    the up-sampling small sources buy at the cost of more epochs). The
    per-source relation is tiny (sources ≪ rows), so the normalizer is
    folded over a SORTED array of per-source terms (one row) and
    broadcast back — float policy: multi-term sums fold in source order
    on both engines, integer token counts stay exact."""
    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
    )
    powv = F.pow(F.col("n_tokens").cast("double"), 0.7)
    tot = per.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("source"), powv.alias("p")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["p"],
        ).alias("z"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    j = per.crossJoin(F.broadcast(tot))
    return j.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(powv / F.col("z"), 6).alias("mix_weight"),
        F.round(
            powv / F.col("z") * F.col("total_tokens") / F.col("n_tokens"),
            6,
        ).alias("expected_epochs"),
    )


# ---------------------------------------------------------------------------
# U6: in-engine distributed training (sufficient-statistics map-reduce)
# ---------------------------------------------------------------------------

#: Known generating coefficients for the synthetic regression target —
#: the label is built IN-PLAN from embedding elements, so the trainer's
#: recovery of these is a closed-form contract, not a fit to noise.
_LIN_TRUTH = (3.0, -2.0, 0.5, 0.25)  # f1, f2, f3, intercept


def _training_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature/label frame: features are embedding elements 1-3, the
    label is a known linear function of them plus 0.5×element-4 as
    irreducible noise (element 4 is OMITTED from the features, so the
    fitted RMSE has a known floor and the recoverable coefficients a
    known truth)."""
    e = _t(spark, sf_dir, "embeddings")
    f1 = F.col("embedding")[0].cast("double")
    f2 = F.col("embedding")[1].cast("double")
    f3 = F.col("embedding")[2].cast("double")
    noise = F.col("embedding")[3].cast("double")
    a, b, c, d = _LIN_TRUTH
    return e.select(
        F.col("vec_id"),
        f1.alias("f1"),
        f2.alias("f2"),
        f3.alias("f3"),
        (a * f1 + b * f2 + c * f3 + d + 0.5 * noise).alias("y"),
    )


@register(
    "distributed_linear_train",
    oracle="""
    SELECT cast(count(*) AS BIGINT) AS n_rows,
           TRUE AS coef_within_tol,
           TRUE AS intercept_within_tol,
           TRUE AS rmse_beats_mean_baseline,
           TRUE AS coefs_finite
    FROM embeddings
    """,
)
def distributed_linear_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6 engine-side: distributed OLS via exact sufficient-statistics
    map-reduce (``operators/training.py`` — per-Arrow-batch XᵀX/Xᵀy
    partials, one tiny merge agg, driver p×p solve; the driver never
    sees a data row). The reference trains out-of-engine
    (``/root/reference/prediction/train.py:462-642``); this is the
    shape that trains ON the cluster.

    The label is synthesized in-plan with KNOWN coefficients
    (``_LIN_TRUTH``) plus an omitted-feature noise term, so the oracle
    asserts: exact row count; every recovered coefficient within 0.2 of
    truth (≈10× the standard error at oracle scale); fitted RMSE beats
    the mean-only baseline (computed engine-side on in-plan
    predictions); all coefficients finite. The exact-merge identity vs
    a single-node numpy solve is pinned to 1e-8 in
    ``tests/test_distributed_training.py``."""
    from ..operators.training import predict_linear, ridge_train_distributed

    data = _training_frame(spark, sf_dir).cache()
    feats = ["f1", "f2", "f3"]
    beta = ridge_train_distributed(data, feats, "y", reg=0.0)
    a, b, c, d = _LIN_TRUTH
    coef_ok = bool(
        abs(beta[0] - a) <= 0.2
        and abs(beta[1] - b) <= 0.2
        and abs(beta[2] - c) <= 0.2
    )
    int_ok = bool(abs(beta[3] - d) <= 0.2)
    finite = bool(np.all(np.isfinite(beta)))

    pred = predict_linear(data, feats, beta)
    resid = F.col("y") - pred
    mu = data.agg(F.avg("y").alias("_mu"))
    return (
        data.crossJoin(F.broadcast(mu))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sqrt(F.avg(resid * resid)).alias("_rmse"),
            F.sqrt(
                F.avg((F.col("y") - F.col("_mu")) * (F.col("y") - F.col("_mu")))
            ).alias("_rmse_base"),
        )
        .select(
            "n_rows",
            F.lit(coef_ok).alias("coef_within_tol"),
            F.lit(int_ok).alias("intercept_within_tol"),
            (F.col("_rmse") < F.col("_rmse_base")).alias(
                "rmse_beats_mean_baseline"
            ),
            F.lit(finite).alias("coefs_finite"),
        )
    )


@register(
    "distributed_logistic_train",
    oracle="""
    SELECT cast(count(*) AS BIGINT) AS n_rows,
           TRUE AS accuracy_floor_met,
           TRUE AS logloss_beats_chance,
           TRUE AS signs_correct,
           TRUE AS coefs_finite
    FROM embeddings
    """,
)
def distributed_logistic_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6 engine-side, GLM case: distributed logistic regression by IRLS
    — every Newton step is one narrow ``mapInPandas`` pass emitting
    per-batch XᵀWX/XᵀWz partials plus a singleton merge agg (see
    ``operators/training.py``; 4 iterations = 4 linear passes, no
    parameter server, no row collect).

    The binary label is synthesized in-plan (sign of 2·f1 − 3·f2 plus
    omitted-feature noise), so the oracle asserts: exact row count;
    engine-side accuracy ≥ 0.8 (Bayes accuracy ≈ 0.95 at this
    noise-to-signal); mean log-loss < ln 2 (the always-0.5 chance
    model); recovered coefficient SIGNS match the generator; finiteness.
    Agreement with a single-node numpy IRLS at 1e-6 is pinned in
    ``tests/test_distributed_training.py``."""
    from ..operators.training import logistic_train_distributed, predict_linear

    e = _t(spark, sf_dir, "embeddings")
    f1 = F.col("embedding")[0].cast("double")
    f2 = F.col("embedding")[1].cast("double")
    noise = F.col("embedding")[3].cast("double")
    data = e.select(
        f1.alias("f1"),
        f2.alias("f2"),
        ((2.0 * f1 - 3.0 * f2 + 0.5 * noise) > 0).cast("double").alias("y"),
    ).cache()
    feats = ["f1", "f2"]
    beta = logistic_train_distributed(data, feats, "y", iterations=4)
    signs = bool(beta[0] > 0 and beta[1] < 0)
    finite = bool(np.all(np.isfinite(beta)))

    eta = predict_linear(data, feats, beta)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    pc = F.greatest(F.least(p, F.lit(1.0 - 1e-12)), F.lit(1e-12))
    return data.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.avg(
                ((eta > 0).cast("double") == F.col("y")).cast("double")
            )
            >= 0.8
        ).alias("accuracy_floor_met"),
        (
            F.avg(
                -(
                    F.col("y") * F.log(pc)
                    + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - pc)
                )
            )
            < float(np.log(2.0))
        ).alias("logloss_beats_chance"),
        F.lit(signs).alias("signs_correct"),
        F.lit(finite).alias("coefs_finite"),
    )
