"""Contract queries: CDC merge application, weighted moving averages, and
per-key distribution profiling (entropy / concentration).

Extensions beyond the reference's §2 inventory (SURVEY §8): snapshot
maintenance from a change feed (the MERGE-INTO shape every warehouse
rebuild needs), a linear-weight moving average expressed purely with
window sums (no per-row Python), and Shannon-entropy / HHI profiling of
per-user event mixes — the distribution-skew diagnostics a corpus
curation pass runs per source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .core import register, _t


@register(
    "cdc_apply_user_state",
    oracle="""
    WITH cutoff AS (SELECT min(ts) + INTERVAL 15 DAY AS c FROM events),
    base AS (
      SELECT user_id, ts, event_id, event_type, value FROM (
        SELECT user_id, ts, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events, cutoff WHERE ts < c
      ) WHERE rn = 1
    ),
    chg AS (
      SELECT user_id, ts, event_id, event_type, value FROM (
        SELECT user_id, ts, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events, cutoff WHERE ts >= c
      ) WHERE rn = 1
    )
    SELECT COALESCE(c.user_id, b.user_id) AS user_id,
           CASE WHEN c.user_id IS NOT NULL THEN c.ts ELSE b.ts END AS ts,
           CASE WHEN c.user_id IS NOT NULL THEN c.event_id
                ELSE b.event_id END AS event_id,
           CASE WHEN c.user_id IS NOT NULL THEN c.event_type
                ELSE b.event_type END AS event_type,
           CASE WHEN c.user_id IS NOT NULL THEN c.value
                ELSE b.value END AS value
    FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
    WHERE NOT COALESCE(c.event_type = 'error', FALSE)
    """,
)
def cdc_apply_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style snapshot maintenance: the first 15 days of events form
    the base per-user state snapshot; the rest is the change feed. The
    latest change per user upserts the state, and a user whose LATEST
    change is an ``error`` event is tombstone-deleted. Both the snapshot
    collapse and the merge shuffle on the same key (user_id), so AQE
    reuses the exchange; the rank-1 filters compile to WindowGroupLimit.
    """
    from ..operators.cdc import apply_changes, latest_changes

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    cut = ev.agg(
        (F.min("ts") + F.expr("INTERVAL 15 DAYS")).alias("_cut")
    )
    ev = ev.crossJoin(F.broadcast(cut))
    base = latest_changes(
        ev.filter(F.col("ts") < F.col("_cut")).drop("_cut"),
        ["user_id"],
        ["ts", "event_id"],
    )
    changes = ev.filter(F.col("ts") >= F.col("_cut")).drop("_cut")
    return apply_changes(
        base,
        changes,
        key_cols=["user_id"],
        seq_cols=["ts", "event_id"],
        op_col="event_type",
        delete_values=("error",),
    )


@register(
    "wma_values_per_user",
    oracle="""
    WITH r AS (
      SELECT event_id, user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT event_id, user_id,
           round((s2 - (rn - cnt) * s1) * 2 / (cnt * (cnt + 1)), 6)
             AS wma_value
    FROM (
      SELECT event_id, user_id, rn,
             count(*)       OVER w AS cnt,
             sum(value)     OVER w AS s1,
             sum(value * rn) OVER w AS s2
      FROM r
      WINDOW w AS (PARTITION BY user_id ORDER BY rn
                   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    )
    """,
)
def wma_values_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-weight moving average over the trailing 8 events per user
    (newest weight 8, oldest 1), computed from TWO plain window sums:
    with rn the per-key row number, Σ wⱼxⱼ = Σ xⱼ·rnⱼ − (rn−cnt)·Σ xⱼ —
    so the position-weighted average needs no per-row weight array, no
    UDF, and only the one shuffle every per-key window shares. The same
    algebra holds at any partition count and any history length (weights
    are frame-relative, so nothing grows with absolute row position)."""
    ev = _t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    r = ev.select(
        "event_id",
        "user_id",
        "value",
        F.row_number().over(wo).alias("rn"),
    )
    w8 = (
        Window.partitionBy("user_id")
        .orderBy(F.col("rn").asc())
        .rowsBetween(-7, 0)
    )
    cnt = F.count(F.lit(1)).over(w8)
    s1 = F.sum("value").over(w8)
    s2 = F.sum(F.col("value") * F.col("rn")).over(w8)
    return r.select(
        "event_id",
        "user_id",
        F.round(
            (s2 - (F.col("rn") - cnt) * s1) * 2 / (cnt * (cnt + 1)), 6
        ).alias("wma_value"),
    )


@register(
    "user_event_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           count(*) AS n_types,
           round(-sum((n::DOUBLE / tot) * ln(n::DOUBLE / tot)) + 0, 6)
             AS entropy,
           -- integer sums are exact in ANY accumulation order, so the
           -- single final division cannot flip a rounding boundary
           -- between threaded runs (observed: hhi 0.204687 vs 0.204688)
           round(sum(n * n)::DOUBLE / (tot * tot), 6) AS hhi
    FROM (
      SELECT user_id, event_type, n,
             sum(n) OVER (PARTITION BY user_id) AS tot
      FROM c
    )
    GROUP BY user_id, tot
    """,
)
def user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-mix profiling: Shannon entropy and Herfindahl
    concentration (HHI) of the event-type distribution — the skew
    diagnostic a curation pass computes per source/domain before
    sampling. Count-group, window-total, final agg: all three stages
    shuffle on user_id once (exchange reuse), counts stay exact and only
    the float ratios are rounded."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    # fold the float sums in SORTED (event_type) order via an array
    # aggregate: a plain F.sum adds partial results in shuffle-arrival
    # order, which varies run to run — a user whose entropy sits within
    # an ulp of a rounding boundary then flips the gate intermittently
    # (observed once at sf0.01). The sorted fold is run-deterministic.
    per_user = c.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("_arr"),
        F.sum("n").alias("_tot"),  # integer sum: exact in any order
    )
    tot = F.col("_tot").cast("double")
    prob = lambda s: s["n"].cast("double") / tot  # noqa: E731
    ent = F.aggregate(
        "_arr",
        F.lit(0.0),
        lambda acc, s: acc - prob(s) * F.log(prob(s)),
    )
    # exact integer sum of squares -> one final float division: immune
    # to accumulation order on BOTH engines (the observed flake was the
    # oracle's threaded float sum crossing a round-6 boundary)
    hhi = F.aggregate(
        "_arr",
        F.lit(0).cast("long"),
        lambda acc, s: acc + s["n"] * s["n"],
    ).cast("double") / (tot * tot)
    return per_user.select(
        "user_id",
        F.size("_arr").cast("long").alias("n_types"),
        # +0.0 folds IEEE −0.0 (single-type users: p=1, ln p = 0) to
        # +0.0 so both engines hash the same bit pattern
        (F.round(ent, 6) + F.lit(0.0)).alias("entropy"),
        F.round(hhi, 6).alias("hhi"),
    )


@register(
    "cusum_change_points",
    oracle="""
    WITH st AS (
      SELECT user_id, avg(value) AS mu,
             coalesce(stddev_samp(value), 0.0) AS sigma
      FROM events GROUP BY user_id
    ),
    p AS (
      SELECT e.event_id, e.user_id, e.ts, st.sigma,
             sum(e.value - st.mu - 0.5 * st.sigma) OVER w AS pk
      FROM events e JOIN st ON e.user_id = st.user_id
      WINDOW w AS (PARTITION BY e.user_id ORDER BY e.ts, e.event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           round(pk - least(0.0, min(pk) OVER w), 6) AS cusum,
           round(pk - least(0.0, min(pk) OVER w), 6) > round(4.0 * sigma, 6)
             AND sigma > 0 AS cusum_flag
    FROM p
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def cusum_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detector per user, as pure window
    algebra: the sequential reset-at-zero recurrence is rewritten to
    prefix-sum minus running-min (closed form), so the whole detector is
    one shuffle on user_id — a stateful-looking scan with a fully
    declarative plan, and the oracle can express it too."""
    from ..operators.temporal import cusum_flags

    ev = _t(spark, sf_dir, "events")
    out = cusum_flags(
        ev,
        key_cols=("user_id",),
        ts_col="ts",
        value_col="value",
        slack_sigmas=0.5,
        threshold_sigmas=4.0,
        tiebreak_cols=("event_id",),
    )
    return out.select("event_id", "user_id", "cusum", "cusum_flag")


@register(
    "feature_store_pit_join",
    oracle="""
    WITH feats AS (
      SELECT user_id,
             date_trunc('day', ts) + INTERVAL 1 DAY AS feature_ts,
             round(avg(value), 6) AS day_avg_value,
             count(*) AS day_n_events
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    labels AS (
      SELECT event_id, user_id, ts, value AS label_value
      FROM events WHERE event_type = 'purchase'
    ),
    joined AS (
      SELECT l.event_id, l.user_id, l.ts, l.label_value,
             f.feature_ts, f.day_avg_value, f.day_n_events
      FROM labels l ASOF LEFT JOIN feats f
        ON l.user_id = f.user_id AND f.feature_ts <= l.ts
    )
    SELECT event_id, user_id, ts, label_value,
           CASE WHEN fresh THEN day_avg_value END AS day_avg_value,
           CASE WHEN fresh THEN day_n_events END AS day_n_events
    FROM (
      SELECT *,
             feature_ts IS NOT NULL
               AND epoch(ts) - epoch(feature_ts) <= 604800.0 AS fresh
      FROM joined
    )
    """,
)
def feature_store_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join (the feature-store pattern):
    purchase events are training labels; per-(user, day) aggregates are
    features stamped with the END of their day, so a label can only ever
    see fully-closed feature windows — no leakage by construction. The
    as-of backward join takes the newest feature at-or-before each label
    with a 7-day staleness bound (older features are nulled, not
    silently served). One shuffle on user_id via the union-window as-of
    formulation; no per-row lookups."""
    from ..operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    feats = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("_day"))
        .agg(
            F.round(F.avg("value"), 6).alias("day_avg_value"),
            F.count(F.lit(1)).alias("day_n_events"),
        )
        .select(
            "user_id",
            (F.col("_day") + F.expr("INTERVAL 1 DAY")).alias("feature_ts"),
            "day_avg_value",
            "day_n_events",
        )
    )
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("label_value")
    )
    return asof_join(
        labels,
        feats,
        on=["user_id"],
        left_ts="ts",
        right_ts="feature_ts",
        right_cols=["day_avg_value", "day_n_events"],
        tolerance_seconds=604800.0,
    ).select(
        "event_id", "user_id", "ts", "label_value",
        "day_avg_value", "day_n_events",
    )


@register(
    "hard_negative_pairs",
    oracle="""
    WITH scored AS (
      SELECT a.vec_id AS anchor_id, c.vec_id AS negative_id,
             round(list_cosine_similarity(a.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]), 6)
               AS cosine_sim
      FROM embeddings a JOIN embeddings c ON a.label <> c.label
    )
    SELECT anchor_id, negative_id, cosine_sim
    FROM (
      SELECT *, row_number() OVER (PARTITION BY anchor_id
                                   ORDER BY cosine_sim DESC,
                                            negative_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 2
    """,
)
def hard_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 hard negatives (most-similar different-label vector) per
    anchor — the contrastive-training pair miner, exact labeled
    baseline."""
    from ..operators.similarity import hard_negative_mining

    e = _t(spark, sf_dir, "embeddings")
    return hard_negative_mining(e, k=2).select(
        "anchor_id", "negative_id", "cosine_sim"
    )


@register(
    "twap_6h_bars",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, value,
             date_trunc('hour', ts)
               - INTERVAL (EXTRACT(hour FROM ts)::INT % 6) HOUR AS bucket,
             epoch(lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id))
               - epoch(ts) AS dt
      FROM events
    )
    SELECT user_id, bucket,
           round(sum(value * dt) / sum(dt), 6) AS twap,
           count(*) AS n_periods,
           round(sum(dt), 3) AS covered_seconds
    FROM d WHERE dt IS NOT NULL
    GROUP BY user_id, bucket
    """,
)
def twap_6h_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) per (user, 6h bucket) over an
    IRREGULAR event stream: each observation holds until the next one,
    so its weight is its holding duration — the correct downsample when
    sampling is bursty (a plain avg over-weights the bursts; see also
    ``events_resampled_6h`` which solves this by gridding instead).
    Holding periods are attributed to the bucket they START in; each
    key's final observation has no duration and is excluded. One window
    (lead) + one agg, both on the user_id partitioning."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp("ts") / 21600) * 21600
    )
    d = ev.select(
        "user_id",
        bucket.alias("bucket"),
        "value",
        (
            F.lead(F.unix_micros("ts")).over(w).cast("double") / 1e6
            - F.unix_micros("ts").cast("double") / 1e6
        ).alias("dt"),
    ).filter(F.col("dt").isNotNull())
    return d.groupBy("user_id", "bucket").agg(
        F.round(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6).alias(
            "twap"
        ),
        F.count(F.lit(1)).alias("n_periods"),
        F.round(F.sum("dt"), 3).alias("covered_seconds"),
    )


@register(
    "user_time_in_state",
    oracle="""
    WITH d AS (
      SELECT user_id, event_type,
             epoch(lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id))
               - epoch(ts) AS dt
      FROM events
    )
    SELECT user_id, event_type,
           round(sum(dt), 3) AS total_seconds,
           count(*) AS n_periods,
           round(sum(dt) / sum(sum(dt)) OVER (PARTITION BY user_id), 6)
             AS time_share
    FROM d WHERE dt IS NOT NULL
    GROUP BY user_id, event_type
    """,
)
def user_time_in_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration attribution: how long each user SPENDS in each state
    (event type), treating every event as a state transition that holds
    until the next — the dwell-time model behind engagement and
    state-machine analytics. The share denominator is a window sum over
    the aggregate (no second shuffle: same user_id partitioning)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    d = ev.select(
        "user_id",
        "event_type",
        (
            F.lead(F.unix_micros("ts")).over(w).cast("double") / 1e6
            - F.unix_micros("ts").cast("double") / 1e6
        ).alias("dt"),
    ).filter(F.col("dt").isNotNull())
    agg = d.groupBy("user_id", "event_type").agg(
        F.sum("dt").alias("_tot"), F.count(F.lit(1)).alias("n_periods")
    )
    share = F.col("_tot") / F.sum("_tot").over(Window.partitionBy("user_id"))
    return agg.select(
        "user_id",
        "event_type",
        F.round("_tot", 3).alias("total_seconds"),
        "n_periods",
        F.round(share, 6).alias("time_share"),
    )


@register(
    "knn_label_eval",
    oracle="""
    WITH scored AS (
      SELECT a.vec_id AS qid, a.label AS true_label,
             c.vec_id AS nid, c.label AS nlabel,
             round(list_cosine_similarity(a.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]), 6) AS sim
      FROM embeddings a JOIN embeddings c ON a.vec_id <> c.vec_id
    ),
    top5 AS (
      SELECT qid, true_label, nlabel FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY sim DESC, nid ASC) AS rn
        FROM scored
      ) WHERE rn <= 5
    ),
    votes AS (
      SELECT qid, true_label, nlabel, count(*) AS v
      FROM top5 GROUP BY qid, true_label, nlabel
    ),
    pred AS (
      SELECT qid, true_label, nlabel AS pred_label FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY v DESC, nlabel ASC) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT true_label AS label,
           cast(count(*) AS BIGINT) AS n,
           cast(sum(CASE WHEN pred_label = true_label
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
    FROM pred GROUP BY true_label
    """,
)
def knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label evaluation: exact 5-NN majority vote per
    vector (cosine, rounded-then-ranked, deterministic tie-breaks at
    both the neighbor and the vote level), scored against the true
    labels per class — the standard embedding-quality probe (if kNN
    can't predict the label, the embedding space doesn't separate the
    classes). Exact baseline; at corpus scale the neighbor stage swaps
    to the IVF/LSH family, the vote/score algebra is unchanged."""
    from ..operators.similarity import cosine_topk_bruteforce

    e = _t(spark, sf_dir, "embeddings")
    top5 = cosine_topk_bruteforce(e, e, k=5)
    labels = e.select(
        F.col("vec_id").alias("qid"), F.col("label").alias("true_label")
    )
    nlabels = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
    )
    votes = (
        top5.withColumnRenamed("query_id", "qid")
        .join(F.broadcast(nlabels), "neighbor_id")
        .groupBy("qid", "nlabel")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("v").desc(), F.col("nlabel").asc()
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("nlabel").alias("pred_label"))
    )
    return (
        pred.join(F.broadcast(labels), "qid")
        .groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("pred_label") == F.col("true_label")).cast("long")
            ).alias("n_correct"),
        )
    )


@register(
    "knn_label_eval_ann",
    oracle="""
    SELECT label, cast(count(*) AS BIGINT) AS n,
           TRUE AS coverage_floor_met,
           TRUE AS subset_recall_floor_met,
           TRUE AS subset_vote_agreement_floor_met
    FROM embeddings GROUP BY label
    """,
)
def knn_label_eval_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of ``knn_label_eval``: the all-pairs neighbor
    stage is replaced by adaptive-plane LSH (bucket occupancy held
    ~constant as the corpus grows, shuffle equi-join on the 8-byte
    bucket key — never a broadcast of the query side, which here IS the
    corpus), the vote/score algebra is unchanged. Pair work is
    O(n · probes · target_bucket) — linear where the exact baseline is
    quadratic.

    Accuracy is pinned the ``ann_recall_contract`` way: per-label counts
    are exact (oracle-valued), and three floors are computed IN the
    query and reduced to booleans the oracle asserts TRUE —
    (a) ≥95% of vectors receive a prediction, (b) recall@5 vs the exact
    brute-force neighbors on a fixed 20-query probe subset beats HALF
    the isotropic-chance level (probed corpus fraction ≈
    (1+planes)/2^planes — on unclustered vectors no probing scheme can
    systematically exceed its probed fraction, so the floor must scale
    with it; capped at 0.25), and (c) the ANN majority-vote label AGREES
    with the exact-kNN vote on ≥10% of that subset (chance for 10
    labels). Scale-aware floors hold at EVERY sf, not just oracle scale.
    This corpus is the worst-case regime (isotropic vectors,
    label-independent — exact 5-NN itself scores ~chance here, which is
    why the contract pins neighbor recall and vote agreement rather than
    label accuracy)."""
    from ..operators.similarity import (
        adaptive_n_planes,
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )

    e = _t(spark, sf_dir, "embeddings")
    n = e.count()
    planes = adaptive_n_planes(n)
    probed_fraction = (1.0 + planes) / float(2**planes)
    recall_floor = min(0.25, 0.5 * probed_fraction)
    ann5 = cosine_topk_lsh(
        e, e, k=5, n_planes=planes, multi_probe=1,
        broadcast_queries=False,
    ).cache()

    labels = e.select("vec_id", "label")

    def vote(top5: DataFrame) -> DataFrame:
        nl = labels.select(
            F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
        )
        votes = (
            top5.withColumnRenamed("query_id", "qid")
            .join(F.broadcast(nl), "neighbor_id")
            .groupBy("qid", "nlabel")
            .agg(F.count(F.lit(1)).alias("v"))
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("v").desc(), F.col("nlabel").asc()
        )
        return (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("qid", F.col("nlabel").alias("pred_label"))
        )

    cov = ann5.agg(
        (F.countDistinct("query_id") / F.lit(float(n)) >= 0.95).alias(
            "coverage_floor_met"
        )
    )

    sub = e.filter(F.col("vec_id") < 20)
    exact5 = cosine_topk_bruteforce(e, sub, k=5).cache()
    ann_sub = ann5.filter(F.col("query_id") < 20)
    hits = (
        ann_sub.select("query_id", "neighbor_id")
        .join(
            exact5.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    rec = (
        hits.crossJoin(exact5.agg(F.count(F.lit(1)).alias("_ne")))
        .select(
            (F.col("_hits") / F.col("_ne") >= F.lit(recall_floor)).alias(
                "subset_recall_floor_met"
            )
        )
    )

    agree = (
        vote(ann_sub)
        .join(
            vote(exact5).withColumnRenamed("pred_label", "_exact_label"),
            "qid",
        )
        .agg(
            F.coalesce(
                F.sum(
                    (F.col("pred_label") == F.col("_exact_label")).cast("long")
                ),
                F.lit(0),
            ).alias("_n_agree")
        )
        .crossJoin(exact5.select("query_id").distinct()
                   .agg(F.count(F.lit(1)).alias("_nq")))
        .select(
            (F.col("_n_agree") / F.col("_nq") >= 0.10).alias(
                "subset_vote_agreement_floor_met"
            )
        )
    )

    per_label = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_label.crossJoin(F.broadcast(cov))
        .crossJoin(F.broadcast(rec))
        .crossJoin(F.broadcast(agree))
    )


@register(
    "knn_label_eval_ann_serving",
    oracle="""
    SELECT label, cast(count(*) AS BIGINT) AS n,
           TRUE AS coverage_floor_met,
           TRUE AS subset_recall_floor_met,
           TRUE AS subset_vote_agreement_floor_met
    FROM embeddings GROUP BY label
    """,
)
def knn_label_eval_ann_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``knn_label_eval_ann`` at the SERVING shape: a small fixed query
    batch (vec_id < 20) against the full corpus through
    ``cosine_topk_lsh(broadcast_queries=True)`` — the exploded
    query·probe rows broadcast to every executor and the corpus side
    never shuffles, the strategy a 100 TB index answers online queries
    with (the self-kNN twin exercises the opposite, shuffle-equi-join
    strategy; with this entry BOTH join paths of the LSH top-k are
    CORRECTNESS-gated, not just plan-pinned — the plan itself is pinned
    in tests/test_plan_hygiene.py). Same scale-aware floor algebra as
    the self-kNN twin: per-label counts exact, coverage ≥95% of the
    query batch, recall@5 vs brute force ≥ half the probed fraction
    (capped 0.25), vote agreement ≥10% (chance for 10 labels)."""
    from ..operators.similarity import (
        adaptive_n_planes,
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )

    e = _t(spark, sf_dir, "embeddings")
    n = e.count()
    planes = adaptive_n_planes(n)
    probed_fraction = (1.0 + planes) / float(2**planes)
    recall_floor = min(0.25, 0.5 * probed_fraction)
    sub = e.filter(F.col("vec_id") < 20)
    ann5 = cosine_topk_lsh(
        e, sub, k=5, n_planes=planes, multi_probe=1,
        broadcast_queries=True,
    ).cache()

    labels = e.select("vec_id", "label")

    def vote(top5: DataFrame) -> DataFrame:
        nl = labels.select(
            F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
        )
        votes = (
            top5.withColumnRenamed("query_id", "qid")
            .join(F.broadcast(nl), "neighbor_id")
            .groupBy("qid", "nlabel")
            .agg(F.count(F.lit(1)).alias("v"))
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("v").desc(), F.col("nlabel").asc()
        )
        return (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("qid", F.col("nlabel").alias("pred_label"))
        )

    n_sub = sub.count()
    cov = ann5.agg(
        (F.countDistinct("query_id") / F.lit(float(n_sub)) >= 0.95).alias(
            "coverage_floor_met"
        )
    )

    exact5 = cosine_topk_bruteforce(e, sub, k=5).cache()
    hits = (
        ann5.select("query_id", "neighbor_id")
        .join(
            exact5.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    rec = (
        hits.crossJoin(exact5.agg(F.count(F.lit(1)).alias("_ne")))
        .select(
            (F.col("_hits") / F.col("_ne") >= F.lit(recall_floor)).alias(
                "subset_recall_floor_met"
            )
        )
    )

    agree = (
        vote(ann5)
        .join(
            vote(exact5).withColumnRenamed("pred_label", "_exact_label"),
            "qid",
        )
        .agg(
            F.coalesce(
                F.sum(
                    (F.col("pred_label") == F.col("_exact_label")).cast("long")
                ),
                F.lit(0),
            ).alias("_n_agree")
        )
        .crossJoin(exact5.select("query_id").distinct()
                   .agg(F.count(F.lit(1)).alias("_nq")))
        .select(
            (F.col("_n_agree") / F.col("_nq") >= 0.10).alias(
                "subset_vote_agreement_floor_met"
            )
        )
    )

    per_label = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_label.crossJoin(F.broadcast(cov))
        .crossJoin(F.broadcast(rec))
        .crossJoin(F.broadcast(agree))
    )


@register(
    "hard_negative_pairs_ann",
    oracle="""
    SELECT cast(count(*) AS BIGINT) AS n_vectors,
           TRUE AS all_pairs_cross_label,
           TRUE AS coverage_floor_met,
           TRUE AS subset_recall_floor_met
    FROM embeddings
    """,
)
def hard_negative_pairs_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of ``hard_negative_pairs``: candidates come from
    the anchor's LSH probe buckets (``hard_negative_mining_lsh`` —
    sketch once, shuffle equi-join on the bucket key, adaptive planes
    keep pair work linear) instead of the label-filtered cross join.
    Emitted similarities are TRUE cosines of genuinely cross-label rows
    — only completeness is approximate.

    The oracle pins: the exact corpus size; that EVERY emitted pair is
    cross-label (a hard invariant on the mined output, asserted over the
    data, not assumed from the plan); ≥95% anchor coverage; and top-2
    recall vs the exact miner on a fixed 20-anchor probe subset (exact
    side is 20 × n — linear) beating half the probed-fraction chance
    level (scale-aware, capped at 0.2 — see ``knn_label_eval_ann`` for
    why floors must track the probed fraction on isotropic vectors)."""
    from ..operators.similarity import (
        adaptive_n_planes,
        dot,
        hard_negative_mining_lsh,
        norm,
    )
    from ..operators.latest import top_n_per_key

    e = _t(spark, sf_dir, "embeddings")
    n = e.count()
    planes = adaptive_n_planes(n)
    recall_floor = min(0.2, 0.5 * (1.0 + planes) / float(2**planes))
    hn = hard_negative_mining_lsh(
        e, k=2, n_planes=planes, multi_probe=1
    ).cache()

    labels = e.select("vec_id", "label")
    cross = (
        hn.join(
            labels.select(
                F.col("vec_id").alias("anchor_id"),
                F.col("label").alias("_albl"),
            ),
            "anchor_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("negative_id"),
                F.col("label").alias("_nlbl"),
            ),
            "negative_id",
        )
        .agg(
            F.coalesce(
                F.bool_and(F.col("_albl") != F.col("_nlbl")), F.lit(True)
            ).alias("all_pairs_cross_label")
        )
    )
    cov = hn.agg(
        (F.countDistinct("anchor_id") / F.lit(float(n)) >= 0.95).alias(
            "coverage_floor_met"
        )
    )

    sub = e.filter(F.col("vec_id") < 20)
    a = sub.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("_albl"),
        F.col("embedding").alias("_avec"),
        norm(F.col("embedding")).alias("_an"),
    )
    c = e.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("_clbl"),
        F.col("embedding").alias("_cvec"),
        norm(F.col("embedding")).alias("_cn"),
    )
    exact2 = top_n_per_key(
        c.crossJoin(F.broadcast(a))
        .filter(F.col("_albl") != F.col("_clbl"))
        .select(
            "anchor_id",
            "negative_id",
            F.round(
                dot(F.col("_avec"), F.col("_cvec"))
                / (F.col("_an") * F.col("_cn")),
                6,
            ).alias("cosine_sim"),
        ),
        ["anchor_id"],
        [F.col("cosine_sim").desc(), F.col("negative_id").asc()],
        n=2,
    ).cache()
    rec = (
        hn.filter(F.col("anchor_id") < 20)
        .select("anchor_id", "negative_id")
        .join(
            exact2.select("anchor_id", "negative_id"),
            ["anchor_id", "negative_id"],
        )
        .agg(F.count(F.lit(1)).alias("_hits"))
        .crossJoin(exact2.agg(F.count(F.lit(1)).alias("_ne")))
        .select(
            (F.col("_hits") / F.col("_ne") >= F.lit(recall_floor)).alias(
                "subset_recall_floor_met"
            )
        )
    )

    return (
        e.agg(F.count(F.lit(1)).alias("n_vectors"))
        .crossJoin(F.broadcast(cross))
        .crossJoin(F.broadcast(cov))
        .crossJoin(F.broadcast(rec))
    )


@register(
    "cuped_ab_analysis",
    oracle="""
    WITH cutoff AS (SELECT min(ts) + INTERVAL 15 DAY AS c FROM events),
    per_user AS (
      SELECT user_id, user_id % 2 AS grp,
             avg(CASE WHEN ts < c THEN value END) AS x,
             avg(CASE WHEN ts >= c THEN value END) AS y
      FROM events, cutoff
      GROUP BY user_id
      HAVING avg(CASE WHEN ts < c THEN value END) IS NOT NULL
         AND avg(CASE WHEN ts >= c THEN value END) IS NOT NULL
    ),
    theta AS (
      SELECT covar_pop(x, y) / var_pop(x) AS th, avg(x) AS xbar
      FROM per_user
    )
    SELECT grp,
           cast(count(*) AS BIGINT) AS n,
           round(avg(y), 6) AS mean_raw,
           round(avg(y - th * (x - xbar)), 6) AS mean_cuped,
           round(var_samp(y - th * (x - xbar)) / var_samp(y), 6)
             AS var_ratio
    FROM per_user CROSS JOIN theta
    GROUP BY grp
    """,
)
def cuped_ab_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for A/B measurement (Deng et al., WSDM
    2013 — the experimentation-platform standard): each user's
    post-period metric is adjusted by their PRE-period covariate,
    ŷ = y − θ(x − x̄) with θ = cov(x,y)/var(x), which strips the
    between-user variance the pre-period already explains and shrinks
    confidence intervals at identical sample size. Everything is closed
    form: one per-user aggregation (conditional averages split the
    periods in a single pass), one pooled θ reduction broadcast back,
    one per-arm summary — three aggregations, no iteration. The
    variance ratio column IS the method's diagnostic: ~1 means the
    covariate bought nothing (true for this synthetic data, whose
    per-user values have no cross-period persistence — the gate checks
    the math, not the effect size); on real metrics with sticky user
    levels it lands well below 1."""
    ev = _t(spark, sf_dir, "events")
    cut = ev.agg((F.min("ts") + F.expr("INTERVAL 15 DAYS")).alias("_cut"))
    per_user = (
        ev.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            (F.col("user_id") % 2).alias("grp"),
            F.avg(F.when(F.col("ts") < F.col("_cut"), F.col("value"))).alias("x"),
            F.avg(F.when(F.col("ts") >= F.col("_cut"), F.col("value"))).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        # one row per user; feeds BOTH the pooled theta reduction and the
        # per-arm rollup — cached so the raw event scan runs once
        .cache()
    )
    theta = per_user.agg(
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("th"),
        F.avg("x").alias("xbar"),
    )
    adj = F.col("y") - F.col("th") * (F.col("x") - F.col("xbar"))
    return (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("y"), 6).alias("mean_raw"),
            F.round(F.avg(adj), 6).alias("mean_cuped"),
            F.round(F.var_samp(adj) / F.var_samp("y"), 6).alias("var_ratio"),
        )
    )


@register(
    "attribution_decay_credit",
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts, value
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts AS tts, event_type
      FROM events WHERE event_type <> 'purchase'
    ),
    touch AS (
      SELECT p.pid, p.value, t.event_type,
             power(0.5, (epoch(p.pts) - epoch(t.tts)) / 1800.0) AS w
      FROM p JOIN t
        ON p.user_id = t.user_id
       AND t.tts < p.pts
       AND t.tts >= p.pts - INTERVAL 1 HOUR
    ),
    shared AS (
      SELECT event_type,
             value * w / sum(w) OVER (PARTITION BY pid) AS credit
      FROM touch
    )
    SELECT event_type,
           cast(count(*) AS BIGINT) AS n_touches,
           round(sum(credit), 4) AS value_credit
    FROM shared GROUP BY event_type
    """,
)
def attribution_decay_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution with exponential time decay: each
    purchase's value is split across the user's touches in the prior
    hour, weighted 0.5^(Δt/30min) and normalized per purchase (a
    window sum over the touch relation — no second pass over raw data),
    then rolled up per channel (event type). The user-equi + time-band
    join is the as-of family's shape; at scale it runs through the
    bucketized ``interval_containment_join`` instead of a raw range
    predicate."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("ts").alias("pts"),
        "value",
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("ts").alias("tts"), "event_type"
    )
    dt = (
        F.unix_micros("pts").cast("double")
        - F.unix_micros("tts").cast("double")
    ) / 1e6
    touch = p.join(
        t,
        (F.col("puser") == F.col("user_id"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR")),
    ).select(
        "pid", "value", "event_type", F.pow(0.5, dt / 1800.0).alias("w")
    )
    credit = F.col("value") * F.col("w") / F.sum("w").over(
        Window.partitionBy("pid")
    )
    return (
        touch.select("event_type", credit.alias("credit"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum("credit"), 4).alias("value_credit"),
        )
    )


@register(
    "markov_next_event_eval",
    oracle="""
    WITH cutoff AS (SELECT min(ts) + INTERVAL 15 DAY AS c FROM events),
    seq AS (
      SELECT user_id, ts, event_type,
             lead(event_type) OVER w AS next_type,
             lead(ts) OVER w AS next_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    train AS (
      SELECT event_type AS prev, next_type, count(*) AS n
      FROM seq, cutoff
      WHERE next_type IS NOT NULL AND next_ts < c
      GROUP BY event_type, next_type
    ),
    model AS (
      SELECT prev, next_type AS pred FROM (
        SELECT *, row_number() OVER (PARTITION BY prev
                                     ORDER BY n DESC, next_type ASC) AS rn
        FROM train
      ) WHERE rn = 1
    ),
    test AS (
      SELECT event_type AS prev, next_type
      FROM seq, cutoff
      WHERE next_type IS NOT NULL AND ts >= c
    )
    SELECT t.prev,
           cast(count(*) AS BIGINT) AS n_test,
           cast(sum(CASE WHEN m.pred = t.next_type THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM test t LEFT JOIN model m ON m.prev = t.prev
    GROUP BY t.prev
    """,
)
def markov_next_event_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event baseline with a TEMPORAL holdout:
    transition counts from the first 15 days (pairs fully inside the
    train window), argmax-next prediction per state (deterministic
    ties), accuracy scored on post-cutoff transitions — the
    train/evaluate split every sequence model is benchmarked against,
    with the split on TIME (not rows) so the eval can't leak future
    transitions into the model. One window pass builds all consecutive
    pairs; the model is a broadcast-sized relation."""
    ev = _t(spark, sf_dir, "events")
    cut = ev.agg((F.min("ts") + F.expr("INTERVAL 15 DAYS")).alias("_cut"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    ).crossJoin(F.broadcast(cut))
    train = (
        seq.filter(F.col("next_type").isNotNull() & (F.col("next_ts") < F.col("_cut")))
        .groupBy(F.col("event_type").alias("prev"), "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mw = Window.partitionBy("prev").orderBy(
        F.col("n").desc(), F.col("next_type").asc()
    )
    model = (
        train.withColumn("rn", F.row_number().over(mw))
        .filter(F.col("rn") == 1)
        .select("prev", F.col("next_type").alias("pred"))
    )
    test = seq.filter(
        F.col("next_type").isNotNull() & (F.col("ts") >= F.col("_cut"))
    ).select(F.col("event_type").alias("prev"), "next_type")
    return (
        test.join(F.broadcast(model), "prev", "left")
        .groupBy("prev")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                (F.col("pred") == F.col("next_type")).cast("long")
            ).alias("n_correct"),
        )
    )


@register(
    "persistence_forecast_backtest",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, value,
             lead(value) OVER w AS next_v,
             lag(value, 24) OVER w AS seasonal_v
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type,
           cast(count(next_v) AS BIGINT) AS n_pairs,
           round(avg(abs(next_v - value)), 6) AS persistence_mae,
           round(sqrt(avg((next_v - value) * (next_v - value))), 6)
             AS persistence_rmse,
           round(avg(CASE WHEN seasonal_v IS NOT NULL
                          THEN abs(next_v - seasonal_v) END), 6)
             AS seasonal_mae
    FROM s WHERE next_v IS NOT NULL
    GROUP BY event_type
    """,
)
def persistence_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline backtest: the persistence predictor (next value
    = current value — the reference API's fallback forecaster) and a
    seasonal-naive alternative (value 24 steps back, the reference's
    12-per-hour daily period shape) scored with MAE/RMSE per event type.
    Any learned model must beat these numbers to justify itself — the
    engine computes the bar in one window pass + one aggregation.
    Reference parity: the persistence predictor at
    /root/reference/prediction/preprocessing/spark.py:1370-1574 serves
    exactly this fallback; here it gets an evaluation harness."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    s = ev.select(
        "event_type",
        "value",
        F.lead("value").over(w).alias("next_v"),
        F.lag("value", 24).over(w).alias("seasonal_v"),
    ).filter(F.col("next_v").isNotNull())
    err = F.col("next_v") - F.col("value")
    serr = F.abs(F.col("next_v") - F.col("seasonal_v"))
    return s.groupBy("event_type").agg(
        F.count("next_v").alias("n_pairs"),
        F.round(F.avg(F.abs(err)), 6).alias("persistence_mae"),
        F.round(F.sqrt(F.avg(err * err)), 6).alias("persistence_rmse"),
        F.round(
            F.avg(F.when(F.col("seasonal_v").isNotNull(), serr)), 6
        ).alias("seasonal_mae"),
    )


@register(
    "event_lateness_profile",
    oracle="""
    WITH a AS (
      SELECT user_id, ts,
             max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS high_water
      FROM events
    ),
    l AS (
      SELECT user_id,
             CASE WHEN high_water IS NOT NULL AND ts < high_water
                  THEN epoch(high_water) - epoch(ts) ELSE 0.0 END AS late_s,
             CASE WHEN high_water IS NOT NULL AND ts < high_water
                  THEN 1 ELSE 0 END AS is_late
      FROM a
    )
    SELECT user_id,
           cast(count(*) AS BIGINT) AS n_events,
           cast(sum(is_late) AS BIGINT) AS n_late,
           round(max(late_s), 3) AS max_lateness_s,
           round(quantile_cont(late_s, 0.95), 3) AS p95_lateness_s
    FROM l GROUP BY user_id
    """,
)
def event_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profile — THE statistic that sizes a streaming
    watermark: with arrival order taken as event_id, an event is late
    when its event time is behind the running high-water mark of
    everything that arrived before it; the per-key max and p95 lateness
    are exactly the delay bound ``withWatermark`` needs (too small drops
    data, too large bloats state). One arrival-ordered window + one
    aggregation per key, the same single-shuffle shape as every per-key
    scan here."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hw = F.max("ts").over(w)
    late = (
        F.when(
            hw.isNotNull() & (F.col("ts") < hw),
            hw.cast("double") - F.col("ts").cast("double"),
        ).otherwise(0.0)
    )
    a = ev.select(
        "user_id",
        late.alias("late_s"),
        (late > 0).cast("long").alias("is_late"),
    )
    return a.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("is_late").alias("n_late"),
        F.round(F.max("late_s"), 3).alias("max_lateness_s"),
        F.round(F.percentile("late_s", 0.95), 3).alias("p95_lateness_s"),
    )


#: Theil-Sen per-user history cap: pair count is quadratic in a key's
#: history, so histories are deterministically hash-sampled to this many
#: events BEFORE pairing (md5(event_id)-ordered rank — uniform over the
#: history, reproducible on both engines, and enforced in the operator
#: rather than left to upstream discipline). 400 events = ≤79,800 pairs
#: per user at any corpus scale.
_THEIL_SEN_MAX_EVENTS = 400

@register(
    "theil_sen_trend_per_user",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_id, epoch(ts) AS x, value AS y,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY md5(cast(event_id AS VARCHAR)), event_id
             ) AS rn
      FROM events
    ),
    e AS (
      SELECT user_id, event_id, x, y FROM ranked
      WHERE rn <= {_THEIL_SEN_MAX_EVENTS}
    ),
    slopes AS (
      SELECT a.user_id,
             (b.y - a.y) / (b.x - a.x) AS slope
      FROM e a JOIN e b
        ON a.user_id = b.user_id AND a.event_id < b.event_id
       AND a.x <> b.x
    )
    SELECT user_id,
           cast(count(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(slope, 0.5), 9) + 0.0 AS ts_slope_per_sec
    FROM slopes GROUP BY user_id
    """,
)
def theil_sen_trend_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per user: the MEDIAN of all pairwise
    slopes - up to 29% contamination cannot move it, where the OLS slope
    (per_user_value_trend) chases every outlier. Pairs ride the
    grouped-postings ``pair_up`` core (one shuffle, postings sorted by
    event_id so a<b needs no self-join; the key travels in the payload
    so the median groups per user). Per-key pair counts are quadratic in
    that key's history — the method's intrinsic cost — so the operator
    ENFORCES a deterministic md5-ordered sample of at most
    ``_THEIL_SEN_MAX_EVENTS`` events per user before pairing (the oracle
    applies the identical rank, keeping the gate exact); a 50k-event
    power user costs 79,800 pairs instead of 1.25B. Slopes rounded at
    9dp (raw magnitudes are ~1e-4/sec)."""
    from ..operators.dedup import pair_up

    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.col("ts").cast("double").alias("x"),
            F.col("value").alias("y"),
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") <= _THEIL_SEN_MAX_EVENTS)
        .drop("_rn")
    )
    pairs = pair_up(ev, ["user_id"], ["event_id", "user_id", "x", "y"])
    slopes = (
        pairs.filter(F.col("a.x") != F.col("b.x"))
        .select(
            F.col("a.user_id").alias("user_id"),
            (
                (F.col("b.y") - F.col("a.y"))
                / (F.col("b.x") - F.col("a.x"))
            ).alias("slope"),
        )
    )
    return slopes.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.round(F.percentile("slope", 0.5), 9) + F.lit(0.0)).alias(
            "ts_slope_per_sec"
        ),
    )


@register(
    "user_burstiness",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)) AS gap
      FROM events
    )
    SELECT user_id,
           cast(count(gap) AS BIGINT) AS n_gaps,
           round(avg(gap), 3) AS mean_gap_s,
           round((stddev_pop(gap) - avg(gap))
                 / (stddev_pop(gap) + avg(gap)), 6) AS burstiness
    FROM g WHERE gap IS NOT NULL
    GROUP BY user_id
    """,
)
def user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of inter-event gaps per
    user: −1 = metronome, 0 = Poisson, →1 = heavy bursts. The temporal
    signature that separates bot-like regular traffic from bursty human
    sessions — computed from one lag window + one aggregation on the
    user key."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap = F.col("ts").cast("double") - F.lag(F.col("ts")).over(w).cast("double")
    g = ev.select("user_id", gap.alias("gap")).filter(F.col("gap").isNotNull())
    mu = F.avg("gap")
    sd = F.stddev_pop("gap")
    return g.groupBy("user_id").agg(
        F.count("gap").alias("n_gaps"),
        F.round(mu, 3).alias("mean_gap_s"),
        F.round((sd - mu) / (sd + mu), 6).alias("burstiness"),
    )


@register(
    "value_autocorrelation_per_user",
    oracle="""
    WITH l AS (
      SELECT user_id, value,
             lag(value, 1)  OVER w AS v1,
             lag(value, 24) OVER w AS v24
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           round(corr(value, v1), 6) + 0.0 AS acf_lag1,
           round(corr(value, v24), 6) + 0.0 AS acf_lag24
    FROM l GROUP BY user_id
    """,
)
def value_autocorrelation_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the value series at lag 1 and lag 24 (the
    reference's 12-per-hour daily period shape) per user — the first
    diagnostic before fitting ANY sequence model: near-zero ACF means
    the LSTM has nothing to learn beyond the mean and the persistence
    baseline (persistence_forecast_backtest) is unbeatable. One lag
    window + one correlation aggregate per key; corr's pairwise
    formulation ignores the NULL lag heads automatically on both
    engines."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    l = ev.select(
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("v1"),
        F.lag("value", 24).over(w).alias("v24"),
    )
    return l.groupBy("user_id").agg(
        (F.round(F.corr("value", "v1"), 6) + F.lit(0.0)).alias("acf_lag1"),
        (F.round(F.corr("value", "v24"), 6) + F.lit(0.0)).alias("acf_lag24"),
    )


@register(
    "ewma_values_per_user",
    oracle="""
    WITH o AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    s AS (
      SELECT user_id, list(value ORDER BY rn) AS vs
      FROM o GROUP BY user_id
    )
    SELECT user_id,
           cast(len(vs) AS BIGINT) AS n_events,
           round(list_reduce(vs, (acc, x) -> acc + 0.3 * (x - acc)), 6)
             AS ewma_value
    FROM s
    """,
)
def ewma_values_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α = 0.3) of each user's
    value stream — the recursive smoother behind drift monitors and
    rate estimators. The recursion s ← s + α·(x − s) is a LEFT FOLD, not
    a window sum, so it runs as one ``F.aggregate`` over the per-key
    ordered array (one groupBy shuffle; per-key state is one double).
    Both engines fold in identical order — seeding with the first value
    (list_reduce starts at element 1; Spark folds the array tail onto a
    head seed), so every IEEE operation matches bit-for-bit before the
    6dp round. The closed-form power-weight formulation would underflow
    (1−α)^n for long histories; the fold cannot."""
    ev = _t(spark, sf_dir, "events")
    ordered = ev.select(
        "user_id",
        F.struct(F.col("ts"), F.col("event_id"), F.col("value")).alias("_s"),
    )
    per = ordered.groupBy("user_id").agg(
        F.transform(F.array_sort(F.collect_list("_s")), lambda s: s["value"])
        .alias("vs")
    )
    ewma = F.aggregate(
        F.slice("vs", 2, F.greatest(F.size("vs") - 1, F.lit(0))),
        F.element_at("vs", 1),
        lambda acc, x: acc + 0.3 * (x - acc),
    )
    return per.select(
        "user_id",
        F.size("vs").cast("long").alias("n_events"),
        F.round(ewma, 6).alias("ewma_value"),
    )


@register(
    "value_psi_drift_per_type",
    oracle="""
    WITH cutoff AS (SELECT min(ts) + INTERVAL 15 DAY AS c FROM events),
    ref AS (SELECT event_type, value FROM events, cutoff WHERE ts < c),
    cur AS (SELECT event_type, value FROM events, cutoff WHERE ts >= c),
    stats AS (
      SELECT event_type, min(value) AS mn, max(value) AS mx,
             count(*) AS n_ref
      FROM ref GROUP BY event_type
    ),
    nc AS (SELECT event_type, count(*) AS n_cur FROM cur GROUP BY event_type),
    rb AS (
      SELECT r.event_type,
             CASE WHEN s.mx > s.mn
                  THEN least(9, greatest(0,
                       CAST(floor((r.value - s.mn) * 10 / (s.mx - s.mn))
                            AS BIGINT)))
                  ELSE 0 END AS bin
      FROM ref r JOIN stats s USING (event_type)
    ),
    cb AS (
      SELECT c.event_type,
             CASE WHEN s.mx > s.mn
                  THEN least(9, greatest(0,
                       CAST(floor((c.value - s.mn) * 10 / (s.mx - s.mn))
                            AS BIGINT)))
                  ELSE 0 END AS bin
      FROM cur c JOIN stats s USING (event_type)
    ),
    grid AS (
      SELECT s.event_type, u.b AS bin, s.n_ref, nc.n_cur
      FROM stats s JOIN nc USING (event_type),
           unnest(range(0, 10)) AS u(b)
    ),
    rc AS (SELECT event_type, bin, count(*) AS nr FROM rb GROUP BY 1, 2),
    cc AS (SELECT event_type, bin, count(*) AS ncu FROM cb GROUP BY 1, 2),
    terms AS (
      SELECT g.event_type, g.bin,
             (coalesce(rc.nr, 0) + 0.5) / (g.n_ref + 5.0) AS p,
             (coalesce(cc.ncu, 0) + 0.5) / (g.n_cur + 5.0) AS q
      FROM grid g
      LEFT JOIN rc ON rc.event_type = g.event_type AND rc.bin = g.bin
      LEFT JOIN cc ON cc.event_type = g.event_type AND cc.bin = g.bin
    )
    SELECT event_type,
           round(list_reduce(
             list((p - q) * ln(p / q) ORDER BY bin) || [0.0],
             (a, b) -> a + b), 6) AS psi
    FROM terms GROUP BY event_type
    """,
)
def value_psi_drift_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type — the standard
    distribution-drift monitor between a reference period (first 15
    days) and the current period: 10 fixed-width bins from the reference
    min/max, Laplace-smoothed bin shares, PSI = Σ (p−q)·ln(p/q). Rule of
    thumb: <0.1 stable, >0.25 drifted. Bin counting is two grouped
    aggregations; the per-type stats broadcast back; the 10-term PSI sum
    folds in bin order so float addition is partition- and
    engine-deterministic."""
    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "value")
    cut = ev.agg((F.min("ts") + F.expr("INTERVAL 15 DAYS")).alias("_cut"))
    ev = ev.crossJoin(F.broadcast(cut))
    ref = ev.filter(F.col("ts") < F.col("_cut"))
    cur = ev.filter(F.col("ts") >= F.col("_cut"))
    stats = ref.groupBy("event_type").agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count(F.lit(1)).alias("n_ref"),
    )
    nc = cur.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_cur"))

    def binned(side):
        j = side.join(F.broadcast(stats.select("event_type", "mn", "mx")),
                      "event_type")
        b = F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.lit(9),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("value") - F.col("mn"))
                        * 10
                        / (F.col("mx") - F.col("mn"))
                    ).cast("int"),
                ),
            ),
        ).otherwise(F.lit(0))
        return j.select("event_type", b.alias("bin")).groupBy(
            "event_type", "bin"
        ).agg(F.count(F.lit(1)).alias("n"))

    rc = binned(ref).withColumnRenamed("n", "nr")
    cc = binned(cur).withColumnRenamed("n", "ncu")
    grid = (
        stats.select("event_type", "n_ref")
        .join(nc, "event_type")
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin"),
        )
    )
    terms = (
        grid.join(rc, ["event_type", "bin"], "left")
        .join(cc, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            (
                (F.coalesce(F.col("nr"), F.lit(0)) + 0.5)
                / (F.col("n_ref") + 5.0)
            ).alias("p"),
            (
                (F.coalesce(F.col("ncu"), F.lit(0)) + 0.5)
                / (F.col("n_cur") + 5.0)
            ).alias("q"),
        )
    )
    term = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    per = terms.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("bin", term.alias("t"))))
        .alias("_arr")
    )
    psi = F.aggregate("_arr", F.lit(0.0), lambda acc, s: acc + s["t"])
    return per.select("event_type", F.round(psi, 6).alias("psi"))


@register(
    "kendall_tau_value_time_per_user",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_id, epoch(ts) AS x, value AS y,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY md5(cast(event_id AS VARCHAR)),
                                         event_id) AS rn
      FROM events
    ),
    e AS (
      SELECT user_id, event_id, x, y FROM ranked
      WHERE rn <= {_THEIL_SEN_MAX_EVENTS}
    ),
    p AS (
      SELECT a.user_id,
             CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS c,
             CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS d,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      FROM e a JOIN e b
        ON a.user_id = b.user_id AND a.event_id < b.event_id
    )
    SELECT user_id,
           cast(count(*) AS BIGINT) AS n_pairs,
           cast(sum(c) AS BIGINT) AS concordant,
           cast(sum(d) AS BIGINT) AS discordant,
           round((sum(c) - sum(d))
                 / sqrt((count(*) - sum(tx))::DOUBLE
                        * (count(*) - sum(ty))::DOUBLE), 6) AS tau_b
    FROM p GROUP BY user_id
    """,
)
def kendall_tau_value_time_per_user(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kendall τ-b rank correlation between time and value per user — the
    robust monotone-trend test (Mann-Kendall) that complements the
    Theil–Sen slope: τ tells you WHETHER the trend is monotone, Theil–Sen
    how steep. Concordant/discordant/tie counts are exact integers from
    the same capped grouped-postings pair core (deterministic md5-ordered
    sample of at most _THEIL_SEN_MAX_EVENTS=400 events per user — the
    O(n²) guard both oracles replay); only the final τ-b ratio touches
    floats."""
    from ..operators.dedup import pair_up

    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.col("ts").cast("double").alias("x"),
            F.col("value").alias("y"),
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") <= _THEIL_SEN_MAX_EVENTS)
        .drop("_rn")
    )
    pairs = pair_up(ev, ["user_id"], ["event_id", "user_id", "x", "y"])
    sgn = (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
    p = pairs.select(
        F.col("a.user_id").alias("user_id"),
        (sgn > 0).cast("long").alias("c"),
        (sgn < 0).cast("long").alias("d"),
        (F.col("a.x") == F.col("b.x")).cast("long").alias("tx"),
        (F.col("a.y") == F.col("b.y")).cast("long").alias("ty"),
    )
    n = F.count(F.lit(1))
    return p.groupBy("user_id").agg(
        n.alias("n_pairs"),
        F.sum("c").alias("concordant"),
        F.sum("d").alias("discordant"),
        F.round(
            (F.sum("c") - F.sum("d"))
            / F.sqrt(
                (n - F.sum("tx")).cast("double")
                * (n - F.sum("ty")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    )


@register(
    "hampel_filter_anomalies",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE value IS NOT NULL
    ),
    pairs AS (
      SELECT c.user_id, c.event_id AS center_id, c.value AS center_v,
             c.rn, m.value AS member_v
      FROM o c
      JOIN o m ON m.user_id = c.user_id
              AND m.rn BETWEEN c.rn - 3 AND c.rn + 3
    ),
    med AS (
      SELECT user_id, center_id, rn,
             max(center_v) AS center_v,
             count(*) AS n_frame,
             quantile_cont(member_v, 0.5) AS frame_median
      FROM pairs GROUP BY user_id, center_id, rn
    ),
    mad AS (
      SELECT p.user_id, p.center_id,
             max(m.center_v)     AS value,
             max(m.n_frame)      AS n_frame,
             max(m.frame_median) AS frame_median,
             quantile_cont(abs(p.member_v - m.frame_median), 0.5) AS fmad
      FROM pairs p
      JOIN med m ON m.user_id = p.user_id AND m.center_id = p.center_id
      GROUP BY p.user_id, p.center_id
    )
    SELECT user_id, center_id AS event_id, value,
           CAST(n_frame AS BIGINT)      AS n_frame,
           round(frame_median, 6)       AS frame_median,
           round(fmad, 6)               AS frame_mad
    FROM mad
    WHERE fmad > 0
      AND abs(value - frame_median) > 3 * 1.4826 * fmad
    """,
)
def hampel_filter_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter — the ROBUST sibling of `rolling_zscore_anomalies`:
    each value is compared against the median ± 3·1.4826·MAD of its
    ±3-row neighborhood, so a burst of outliers cannot poison its own
    detection threshold the way it poisons a rolling mean/stddev. The
    per-frame MAD needs the median of deviations FROM THAT FRAME'S
    median, which no single window pass can express — so the frame is
    materialized as an explicit ±3-offset equi-join (explode of 7
    literal offsets; 7× fan-out, two hash aggregations, everything
    partitioned by user). Replacement value = frame median. Frames at
    sequence edges shrink naturally (the join finds fewer members) —
    identical semantics both engines; zero-MAD frames are skipped
    (dominated by a constant run, no robust scale to test against)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id", "event_id", "value", F.row_number().over(w).alias("rn")
    )
    offsets = F.array(*[F.lit(i) for i in range(-3, 4)])
    centers = o.select(
        "user_id",
        F.col("event_id").alias("center_id"),
        F.col("value").alias("center_v"),
        "rn",
        F.explode(offsets).alias("off"),
    ).select(
        "user_id",
        "center_id",
        "center_v",
        "rn",
        (F.col("rn") + F.col("off")).alias("member_rn"),
    )
    members = o.select(
        "user_id",
        F.col("rn").alias("member_rn"),
        F.col("value").alias("member_v"),
    )
    pairs = centers.join(members, ["user_id", "member_rn"])
    med = pairs.groupBy("user_id", "center_id").agg(
        F.max("center_v").alias("center_v"),
        F.count(F.lit(1)).alias("n_frame"),
        F.expr("percentile(member_v, 0.5)").alias("frame_median"),
    )
    mad = (
        pairs.join(
            med.select("user_id", "center_id", "frame_median"),
            ["user_id", "center_id"],
        )
        .groupBy("user_id", "center_id")
        .agg(
            F.expr(
                "percentile(abs(member_v - frame_median), 0.5)"
            ).alias("fmad"),
        )
    )
    out = med.join(mad, ["user_id", "center_id"])
    return out.filter(
        (F.col("fmad") > 0)
        & (
            F.abs(F.col("center_v") - F.col("frame_median"))
            > 3 * 1.4826 * F.col("fmad")
        )
    ).select(
        "user_id",
        F.col("center_id").alias("event_id"),
        F.col("center_v").alias("value"),
        F.col("n_frame").cast("long").alias("n_frame"),
        F.round("frame_median", 6).alias("frame_median"),
        F.round("fmad", 6).alias("frame_mad"),
    )


@register(
    "embedding_truncation_recall",
    oracle="""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < 20),
    full_sc AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]), 6) AS s
      FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
    ),
    tr_sc AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(
                     (q.embedding::DOUBLE[])[1:16],
                     (c.embedding::DOUBLE[])[1:16]), 6) AS s
      FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
    ),
    full_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, neighbor_id) AS rn
        FROM full_sc) WHERE rn <= 10
    ),
    tr_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, neighbor_id) AS rn
        FROM tr_sc) WHERE rn <= 10
    )
    SELECT f.query_id,
           CAST(count(t.neighbor_id) AS BIGINT) AS n_common,
           round(count(t.neighbor_id) / 10.0, 4) AS recall_at_10
    FROM full_top f
    LEFT JOIN tr_top t ON t.query_id = f.query_id
                      AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
)
def embedding_truncation_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka-style truncation audit: top-10 cosine recall of
    16-dim-truncated embeddings against the full-dimension ranking, per
    query vector — the measurement that decides whether a cheaper
    truncated index tier (stored prefix dims, MRL-trained or not) can
    serve first-stage retrieval with full-dim rerank. Both rankings use
    the exact brute-force operator (linear in corpus × 20 queries — the
    bounded-query evaluation shape); the truncated side is the same
    operator over `slice(embedding, 1, 16)`. Ranked on rounded cosine
    with id tie-breaks, so the ranking is engine-identical."""
    from ..operators.similarity import cosine_topk_bruteforce

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    full_top = cosine_topk_bruteforce(e, q, k=10).select(
        "query_id", "neighbor_id"
    )
    e16 = e.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    q16 = e16.filter(F.col("vec_id") < 20)
    tr_top = (
        cosine_topk_bruteforce(e16, q16, k=10)
        .select(
            F.col("query_id").alias("tq"),
            F.col("neighbor_id").alias("tn"),
        )
    )
    joined = full_top.join(
        tr_top,
        (F.col("query_id") == F.col("tq"))
        & (F.col("neighbor_id") == F.col("tn")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("tn").cast("long").alias("n_common"),
        F.round(F.count("tn") / 10.0, 4).alias("recall_at_10"),
    )


@register(
    "bitemporal_state_lookup",
    oracle="""
    WITH log AS (
      SELECT user_id,
             ts AS valid_from,
             ts + INTERVAL 2 DAY AS tx_from,
             event_type AS state,
             event_id
      FROM events WHERE event_type IN ('signup', 'purchase')
    ),
    pins AS (
      SELECT min(ts) + INTERVAL 20 DAY AS v_time,
             min(ts) + INTERVAL 21 DAY AS t_time
      FROM events
    ),
    then_known AS (
      SELECT user_id, state AS state_known_then FROM (
        SELECT l.user_id, l.state,
               row_number() OVER (
                 PARTITION BY l.user_id
                 ORDER BY l.valid_from DESC, l.event_id DESC) AS rn
        FROM log l CROSS JOIN pins p
        WHERE l.valid_from <= p.v_time AND l.tx_from <= p.t_time
      ) WHERE rn = 1
    ),
    now_known AS (
      SELECT user_id, state AS state_known_now FROM (
        SELECT l.user_id, l.state,
               row_number() OVER (
                 PARTITION BY l.user_id
                 ORDER BY l.valid_from DESC, l.event_id DESC) AS rn
        FROM log l CROSS JOIN pins p
        WHERE l.valid_from <= p.v_time
      ) WHERE rn = 1
    )
    SELECT n.user_id,
           t.state_known_then,
           n.state_known_now,
           t.state_known_then IS DISTINCT FROM n.state_known_now
             AS was_revised
    FROM now_known n LEFT JOIN then_known t ON t.user_id = n.user_id
    """,
)
def bitemporal_state_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of lookup — the two-axis temporal-table semantics
    (valid time = when the fact was true; transaction time = when the
    warehouse learned it) that completes the temporal family
    (`scd2_user_state_history` tracks valid time only;
    `purchases_with_state_asof` is a single-axis as-of). The state log
    models 2-day ingestion latency (tx_from = valid_from + 2d); the
    query reconstructs each user's state as of valid time V *as it was
    known* at transaction time T, and as it is known NOW — rows where
    the two disagree are exactly the late-arriving revisions a
    reproducible-training-snapshot pipeline must pin. Both lookups are
    the same latest-per-key rank pattern (WindowGroupLimit-eligible)
    under different predicate pushdowns; the time pins ride a broadcast
    1-row cross join. One window pass per axis, no self-join on data."""
    ev = _t(spark, sf_dir, "events")
    log = ev.filter(
        F.col("event_type").isin("signup", "purchase")
    ).select(
        "user_id",
        F.col("ts").alias("valid_from"),
        (F.col("ts") + F.expr("INTERVAL 2 DAYS")).alias("tx_from"),
        F.col("event_type").alias("state"),
        "event_id",
    )
    pins = ev.agg(
        (F.min("ts") + F.expr("INTERVAL 20 DAYS")).alias("v_time"),
        (F.min("ts") + F.expr("INTERVAL 21 DAYS")).alias("t_time"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("valid_from").desc(), F.col("event_id").desc()
    )

    def latest(df, label):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("state").alias(label))
        )

    pinned = log.crossJoin(F.broadcast(pins))
    then_known = latest(
        pinned.filter(
            (F.col("valid_from") <= F.col("v_time"))
            & (F.col("tx_from") <= F.col("t_time"))
        ),
        "state_known_then",
    )
    now_known = latest(
        pinned.filter(F.col("valid_from") <= F.col("v_time")),
        "state_known_now",
    )
    return now_known.join(then_known, "user_id", "left").select(
        "user_id",
        "state_known_then",
        "state_known_now",
        (
            ~(
                F.col("state_known_then").eqNullSafe(
                    F.col("state_known_now")
                )
            )
        ).alias("was_revised"),
    )


@register(
    "adf_unit_root_per_type",
    oracle="""
    WITH o AS (
      SELECT event_type, value,
             lag(value) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS y_lag
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT event_type, y_lag AS x, value - y_lag AS dy
      FROM o WHERE y_lag IS NOT NULL
    ),
    s AS (
      SELECT event_type, count(*) AS n,
             sum(x) AS sx, sum(dy) AS sy,
             sum(x * x) AS sxx, sum(x * dy) AS sxy,
             sum(dy * dy) AS syy
      FROM d GROUP BY event_type
    ),
    fit AS (
      SELECT event_type, n,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               AS alpha,
             sx, sy, sxx, sxy, syy
      FROM s
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_obs,
           round(beta, 6) AS beta,
           round(beta / sqrt(
             ((syy - 2 * beta * sxy - 2 * alpha * sy
               + beta * beta * sxx + 2 * alpha * beta * sx
               + n * alpha * alpha) / (n - 2))
             / (sxx - sx * sx / n)), 6) AS adf_t_stat,
           beta / sqrt(
             ((syy - 2 * beta * sxy - 2 * alpha * sy
               + beta * beta * sxx + 2 * alpha * beta * sx
               + n * alpha * alpha) / (n - 2))
             / (sxx - sx * sx / n)) < -2.86 AS stationary_05
    FROM fit
    """,
)
def adf_unit_root_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey–Fuller unit-root test per event type (the no-lag ADF
    regression Δy_t = α + β·y_{t−1} + ε): β near 0 means a random walk
    (differencing required before any ARIMA-family model); β
    significantly negative (t < −2.86, the 5% DF critical value) means
    the series mean-reverts and is safe to model in levels — the
    stationarity gate every forecasting pipeline should run before the
    smoothers this registry already has (EWMA/Holt/Kalman). One lag
    window pass builds (y_{t−1}, Δy); everything else is closed-form
    OLS from five partial-aggregated raw sums, with the residual sum of
    squares expanded algebraically (Σε² = Σdy² − 2βΣx·dy − 2αΣdy +
    β²Σx² + 2αβΣx + nα²) so no second data pass is needed. Exact same
    float expression both engines; 6dp round."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        "value",
        F.lag("value").over(w).alias("y_lag"),
    ).filter(F.col("y_lag").isNotNull())
    d = o.select(
        "event_type",
        F.col("y_lag").alias("x"),
        (F.col("value") - F.col("y_lag")).alias("dy"),
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    beta = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    alpha = (F.col("sy") - beta * F.col("sx")) / F.col("n")
    rss = (
        F.col("syy")
        - 2 * beta * F.col("sxy")
        - 2 * alpha * F.col("sy")
        + beta * beta * F.col("sxx")
        + 2 * alpha * beta * F.col("sx")
        + F.col("n") * alpha * alpha
    )
    se = F.sqrt(
        (rss / (F.col("n") - 2))
        / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_obs"),
        F.round(beta, 6).alias("beta"),
        F.round(beta / se, 6).alias("adf_t_stat"),
        (beta / se < -2.86).alias("stationary_05"),
    )


@register(
    "watermark_tuning_curve",
    oracle="""
    WITH arr AS (
      SELECT ts, value,
             max(ts) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS max_seen
      FROM events
    ),
    delays AS (
      SELECT unnest([0, 3600, 21600, 86400]) AS delay_s
    ),
    flagged AS (
      SELECT d.delay_s,
             CASE WHEN a.max_seen IS NOT NULL
                   AND epoch(a.ts) < epoch(a.max_seen) - d.delay_s
                  THEN 1 ELSE 0 END AS dropped
      FROM arr a CROSS JOIN delays d
    )
    SELECT CAST(delay_s AS BIGINT) AS watermark_delay_s,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(dropped) AS BIGINT) AS n_dropped,
           round(sum(dropped) * 1.0 / count(*), 6) AS drop_rate
    FROM flagged GROUP BY delay_s
    """,
)
def watermark_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark tuning curve — the operational planning query behind
    every `withWatermark` setting: replaying the batch table in ARRIVAL
    order (event_id, the ingestion sequence), how many events would a
    streaming job DROP at watermark delays of 0 / 1h / 6h / 24h? An
    event is dropped when its event time is older than the max event
    time already seen minus the delay — exactly Structured Streaming's
    late-data rule. One running-max window over arrival order, a 4-row
    broadcast delay grid, one aggregate; the output is the
    completeness-vs-state-size trade-off curve an operator reads before
    setting the production watermark (pair with
    `event_lateness_profile` for WHERE the lateness comes from)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    arr = ev.select(
        F.col("ts").cast("double").alias("es"),
        F.max(F.col("ts").cast("double")).over(w).alias("max_seen"),
    )
    delays = spark.createDataFrame(
        [(0,), (3600,), (21600,), (86400,)], "delay_s long"
    )
    flagged = arr.crossJoin(F.broadcast(delays)).select(
        "delay_s",
        F.when(
            F.col("max_seen").isNotNull()
            & (F.col("es") < F.col("max_seen") - F.col("delay_s")),
            1,
        )
        .otherwise(0)
        .alias("dropped"),
    )
    return flagged.groupBy("delay_s").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("dropped").cast("long").alias("n_dropped"),
        F.round(
            F.sum("dropped") * 1.0 / F.count(F.lit(1)), 6
        ).alias("drop_rate"),
    ).select(
        F.col("delay_s").alias("watermark_delay_s"),
        "n_events",
        "n_dropped",
        "drop_rate",
    )


@register(
    "incremental_agg_retraction",
    oracle="""
    WITH cutoff AS (SELECT min(ts) + INTERVAL 15 DAY AS c FROM events),
    base AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events, cutoff WHERE ts < c
      ) WHERE rn = 1
    ),
    chg AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events, cutoff WHERE ts >= c
      ) WHERE rn = 1
    ),
    merged AS (
      SELECT COALESCE(c.user_id, b.user_id) AS user_id,
             CASE WHEN c.user_id IS NOT NULL THEN c.event_type
                  ELSE b.event_type END AS event_type,
             CASE WHEN c.user_id IS NOT NULL THEN c.value
                  ELSE b.value END AS value
      FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
      WHERE NOT COALESCE(c.event_type = 'error', FALSE)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           round(sum(coalesce(value, 0.0)), 4) AS sum_value
    FROM merged GROUP BY event_type
    """,
)
def incremental_agg_retraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental aggregate-view maintenance with RETRACTIONS — the
    third leg of the IVM family (`incremental_profile_merge` merges
    append-only partials, `incremental_join_view_delta` maintains a
    join): a per-event-type (n_users, Σvalue) view over per-user latest
    state is maintained under a change feed by applying signed deltas —
    retract (−1, −old_value) for every changed user's prior state, add
    (+1, +new_value) for its new state (tombstones add nothing) — and
    the maintained result must equal a from-scratch recompute, which is
    exactly what the oracle computes. At scale this is the whole point
    of retraction streams: the delta pass touches only the CHANGE FEED
    joined to the (user-bucketed) base snapshot, never rescanning the
    fact history; the final combine is a #types-row full-outer join.
    Groups whose count reaches zero drop out, matching the recompute."""
    from ..operators.cdc import latest_changes

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    cut = ev.agg((F.min("ts") + F.expr("INTERVAL 15 DAYS")).alias("_cut"))
    ev = ev.crossJoin(F.broadcast(cut))
    base = latest_changes(
        ev.filter(F.col("ts") < F.col("_cut")).drop("_cut"),
        ["user_id"],
        ["ts", "event_id"],
    ).select(
        "user_id",
        F.col("event_type").alias("b_type"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("b_val"),
    )
    chg = latest_changes(
        ev.filter(F.col("ts") >= F.col("_cut")).drop("_cut"),
        ["user_id"],
        ["ts", "event_id"],
    ).select(
        "user_id",
        F.col("event_type").alias("c_type"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("c_val"),
    )
    base_view = base.groupBy(F.col("b_type").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("b_val").alias("sv")
    )
    # retraction: every changed user's OLD contribution leaves the view
    retract = chg.join(base, "user_id").select(
        F.col("b_type").alias("t"),
        F.lit(-1).alias("dn"),
        (-F.col("b_val")).alias("dv"),
    )
    # addition: the new state enters, unless the change is a tombstone
    add = chg.filter(F.col("c_type") != "error").select(
        F.col("c_type").alias("t"),
        F.lit(1).alias("dn"),
        F.col("c_val").alias("dv"),
    )
    deltas = (
        retract.unionByName(add)
        .groupBy("t")
        .agg(F.sum("dn").alias("dn"), F.sum("dv").alias("dv"))
    )
    combined = base_view.join(
        deltas, base_view.event_type == deltas.t, "full_outer"
    ).select(
        F.coalesce(F.col("event_type"), F.col("t")).alias("event_type"),
        (
            F.coalesce(F.col("n"), F.lit(0))
            + F.coalesce(F.col("dn"), F.lit(0))
        )
        .cast("long")
        .alias("n_users"),
        (
            F.coalesce(F.col("sv"), F.lit(0.0))
            + F.coalesce(F.col("dv"), F.lit(0.0))
        ).alias("sum_raw"),
    )
    return combined.filter(F.col("n_users") > 0).select(
        "event_type",
        "n_users",
        F.round("sum_raw", 4).alias("sum_value"),
    )
