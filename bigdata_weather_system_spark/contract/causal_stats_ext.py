"""Contract queries — continuation wave 4: causal inference, parametric
hypothesis tests, state-space smoothing, market-basket rule mining, and
multi-ranking retrieval fusion.

Families the registry did not yet cover: Welch's unequal-variance t-test
and one-way ANOVA (the parametric siblings of the existing Mann-Whitney /
Kruskal-Wallis rank tests), propensity-stratified treatment-effect
estimation (the observational sibling of the existing CUPED / DiD
queries), a 1-D Kalman filter (the optimal-gain sibling of the EWMA /
Holt folds), association rules with support/confidence/lift over order
baskets, and reciprocal-rank fusion of two BM25 retrieval lists (the
multi-query RAG retrieval stage downstream of ``doc_bm25_search``).

Reference parity note: the reference (kan3103/bigdata-weather-system)
has no statistics/mining layer at all — these extend the engine along
SURVEY §8's training-data-pipeline axis, same as rounds 2-3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .core import register, _t
from .llm_ops import _TOKS


# ---------------------------------------------------------------------------
# Market-basket association rules (support / confidence / lift)
# ---------------------------------------------------------------------------

@register(
    "basket_brand_association_rules",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS orderkey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    tot AS (SELECT count(DISTINCT orderkey) AS n_orders FROM baskets),
    item AS (SELECT brand, count(*) AS n_item FROM baskets GROUP BY brand),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_ab
      FROM baskets a JOIN baskets b
        ON a.orderkey = b.orderkey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT p.brand_a, p.brand_b,
           CAST(p.n_ab AS BIGINT)                                AS n_ab,
           round(p.n_ab * 1.0 / t.n_orders, 6)                   AS support,
           round(p.n_ab * 1.0 / ia.n_item, 6)                    AS conf_a_to_b,
           round(p.n_ab * 1.0 / ib.n_item, 6)                    AS conf_b_to_a,
           round(p.n_ab * 1.0 * t.n_orders / (ia.n_item * ib.n_item), 6)
                                                                 AS lift
    FROM pairs p
    JOIN item ia ON ia.brand = p.brand_a
    JOIN item ib ON ib.brand = p.brand_b
    CROSS JOIN tot t
    WHERE p.n_ab >= 20
    """,
)
def basket_brand_association_rules(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Market-basket association rules over order baskets at brand
    granularity: support, both directed confidences, and lift for every
    brand pair co-purchased in ≥20 orders.

    Scale shape: the classic Apriori blow-up is avoided structurally —
    pair generation is a self-equi-join of the DISTINCT (order, brand)
    relation on orderkey, so fan-out per order is C(k,2) where k = that
    order's distinct brands (bounded by lineitems per order, ≤7 in
    TPC-H), i.e. linear in orders, never quadratic in the catalog. The
    brand dimension (≤ a few thousand rows at any SF) rides broadcast
    joins, and the order total is a 1-row broadcast cross join — the
    only O(data) shuffles are the basket distinct and the pair groupBy,
    both on bounded-cardinality keys."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("orderkey"),
                F.col("p_brand").alias("brand"))
        .distinct()
    )
    tot = baskets.select(
        F.countDistinct("orderkey").alias("n_orders")
    )
    item = baskets.groupBy("brand").agg(F.count("*").alias("n_item"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.orderkey") == F.col("b.orderkey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"),
            F.col("b.brand").alias("brand_b"),
        )
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 20)
    )
    ia = item.select(
        F.col("brand").alias("brand_a"), F.col("n_item").alias("n_a")
    )
    ib = item.select(
        F.col("brand").alias("brand_b"), F.col("n_item").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ia), "brand_a")
        .join(F.broadcast(ib), "brand_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(F.col("n_ab") * 1.0 / F.col("n_orders"), 6)
            .alias("support"),
            F.round(F.col("n_ab") * 1.0 / F.col("n_a"), 6)
            .alias("conf_a_to_b"),
            F.round(F.col("n_ab") * 1.0 / F.col("n_b"), 6)
            .alias("conf_b_to_a"),
            F.round(
                F.col("n_ab") * 1.0 * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Welch's unequal-variance two-sample t-test
# ---------------------------------------------------------------------------

@register(
    "welch_ttest_purchase_vs_click",
    oracle="""
    WITH g AS (
      SELECT
        count(CASE WHEN event_type = 'purchase' THEN 1 END)    AS n1,
        avg(CASE WHEN event_type = 'purchase' THEN value END)  AS m1,
        var_samp(CASE WHEN event_type = 'purchase' THEN value END) AS v1,
        count(CASE WHEN event_type = 'click' THEN 1 END)       AS n2,
        avg(CASE WHEN event_type = 'click' THEN value END)     AS m2,
        var_samp(CASE WHEN event_type = 'click' THEN value END) AS v2
      FROM events WHERE value IS NOT NULL
    )
    SELECT CAST(n1 AS BIGINT) AS n_purchase,
           CAST(n2 AS BIGINT) AS n_click,
           round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1)
                    + pow(v2 / n2, 2) / (n2 - 1)), 6) AS welch_dof,
           abs((m1 - m2) / sqrt(v1 / n1 + v2 / n2)) > 1.959964
             AS significant_05
    FROM g
    """,
)
def welch_ttest_purchase_vs_click(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Welch's unequal-variance t-test comparing purchase vs click
    values — the parametric counterpart of `mannwhitney_purchase_vs_click`
    (Welch is the default two-sample test when variances differ; the
    Satterthwaite degrees of freedom make the F-distribution
    approximation honest). Everything reduces to one conditional-
    aggregation pass (count/avg/var_samp per arm in a single
    partial-aggregated scan — no per-arm subqueries, no join), then
    scalar math on a 1-row relation. At 100 TB this is the cheapest
    possible shape: one scan, six partial aggregates, one row shuffled."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    is_p = F.when(F.col("event_type") == "purchase", F.col("value"))
    is_c = F.when(F.col("event_type") == "click", F.col("value"))
    g = ev.agg(
        F.count(is_p).alias("n1"),
        F.avg(is_p).alias("m1"),
        F.var_samp(is_p).alias("v1"),
        F.count(is_c).alias("n2"),
        F.avg(is_c).alias("m2"),
        F.var_samp(is_c).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    t = (F.col("m1") - F.col("m2")) / F.sqrt(se2)
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
    )
    return g.select(
        F.col("n1").cast("long").alias("n_purchase"),
        F.col("n2").cast("long").alias("n_click"),
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("welch_dof"),
        (F.abs(t) > 1.959964).alias("significant_05"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA F-test across event types
# ---------------------------------------------------------------------------

@register(
    "anova_value_by_type",
    oracle="""
    WITH g AS (
      SELECT event_type, count(*) AS n, sum(value) AS s,
             sum(value * value) AS ss
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    l AS (
      SELECT list(n  ORDER BY event_type) AS ns,
             list(s  ORDER BY event_type) AS sums,
             list(ss ORDER BY event_type) AS ssqs,
             count(*) AS k
      FROM g
    ),
    t AS (
      SELECT k,
             list_reduce(ns,   (a, b) -> a + b) AS n_total,
             list_reduce(sums, (a, b) -> a + b) AS sum_total,
             list_reduce(list_transform(range(1, k + 1),
               i -> sums[i] * sums[i] / ns[i]), (a, b) -> a + b)
               AS sum_sq_over_n,
             list_reduce(list_transform(range(1, k + 1),
               i -> ssqs[i] - sums[i] * sums[i] / ns[i]), (a, b) -> a + b)
               AS ssw
      FROM l
    )
    SELECT CAST(k AS BIGINT)                                   AS k_groups,
           CAST(n_total AS BIGINT)                             AS n_total,
           round(sum_sq_over_n - sum_total * sum_total / n_total, 6)
                                                               AS ss_between,
           round(ssw, 6)                                       AS ss_within,
           CAST(k - 1 AS BIGINT)                               AS df1,
           CAST(n_total - k AS BIGINT)                         AS df2,
           round(((sum_sq_over_n - sum_total * sum_total / n_total)
                  / (k - 1)) / (ssw / (n_total - k)), 6)       AS f_stat,
           round((sum_sq_over_n - sum_total * sum_total / n_total)
                 / (sum_sq_over_n - sum_total * sum_total / n_total + ssw),
                 6)                                            AS eta_sq
    FROM t
    """,
)
def anova_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test of value across event types — the parametric
    counterpart of `kruskal_wallis_value_by_type`. Decomposed as
    SSB = Σ s_g²/n_g − S²/N and SSW = Σ (ss_g − s_g²/n_g) from per-group
    raw sufficient statistics (n, Σx, Σx²), so the data pass is one
    partial-aggregated groupBy; the cross-group reductions then FOLD over
    the type-sorted list of group stats (collect_list + array_sort +
    F.aggregate) so float addition order is identical in both engines —
    the same order-determinism discipline as the BM25 weight fold. Group
    count is tiny (event types), so the fold is driver-free scalar math
    on a 1-row relation."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    lst = g.agg(
        F.array_sort(
            F.collect_list(F.struct("event_type", "n", "s", "ss"))
        ).alias("gs"),
        F.count("*").alias("k"),
    )

    def fold(expr_fn):
        return F.aggregate(
            F.col("gs"), F.lit(0.0), lambda acc, x: acc + expr_fn(x)
        )

    t = lst.select(
        "k",
        fold(lambda x: x["n"]).alias("n_total"),
        fold(lambda x: x["s"]).alias("sum_total"),
        fold(lambda x: x["s"] * x["s"] / x["n"]).alias("sum_sq_over_n"),
        fold(lambda x: x["ss"] - x["s"] * x["s"] / x["n"]).alias("ssw"),
    )
    ssb = F.col("sum_sq_over_n") - F.col("sum_total") * F.col(
        "sum_total"
    ) / F.col("n_total")
    return t.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n_total").cast("long").alias("n_total"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(F.col("ssw"), 6).alias("ss_within"),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("n_total") - F.col("k")).cast("long").alias("df2"),
        F.round(
            (ssb / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n_total") - F.col("k"))),
            6,
        ).alias("f_stat"),
        F.round(ssb / (ssb + F.col("ssw")), 6).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# Propensity-stratified average treatment effect
# ---------------------------------------------------------------------------

_ATE_ORACLE = """
    WITH cutoff AS (SELECT min(ts) + INTERVAL 15 DAY AS c FROM events),
    pre AS (
      SELECT user_id, count(*) AS n_pre,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS treated
      FROM events, cutoff WHERE ts < c GROUP BY user_id
    ),
    post AS (
      SELECT user_id, sum(value) AS outcome
      FROM events, cutoff
      WHERE ts >= c AND event_type = 'purchase' AND value IS NOT NULL
      GROUP BY user_id
    ),
    pop AS (
      SELECT p.user_id, p.treated, coalesce(o.outcome, 0.0) AS outcome,
             ntile(5) OVER (ORDER BY p.n_pre, p.user_id) AS stratum
      FROM pre p LEFT JOIN post o ON o.user_id = p.user_id
    ),
    tot AS (SELECT count(*) AS n_all FROM pop)
    SELECT CAST(stratum AS BIGINT)                         AS stratum,
           CAST(count(*) AS BIGINT)                        AS n_users,
           CAST(sum(treated) AS BIGINT)                    AS n_treated,
           CAST(count(*) - sum(treated) AS BIGINT)         AS n_control,
           round(avg(CASE WHEN treated = 1 THEN outcome END), 6)
                                                           AS mean_treated,
           round(avg(CASE WHEN treated = 0 THEN outcome END), 6)
                                                           AS mean_control,
           round(avg(CASE WHEN treated = 1 THEN outcome END)
                 - avg(CASE WHEN treated = 0 THEN outcome END), 6)
                                                           AS stratum_effect,
           round((count(*) * 1.0 / max(t.n_all))
                 * (avg(CASE WHEN treated = 1 THEN outcome END)
                    - avg(CASE WHEN treated = 0 THEN outcome END)), 6)
                                                           AS ate_contribution
    FROM pop CROSS JOIN tot t
    GROUP BY stratum
    """


@register("stratified_ate_purchase", oracle=_ATE_ORACLE)
def stratified_ate_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified average-treatment-effect estimate for an observational
    "did pre-period clickers spend more on purchases later?" question:
    users are stratified into quintiles of pre-period activity (the
    propensity proxy), treatment = any pre-period click, outcome =
    post-period purchase spend, and the per-stratum treated−control gap
    is weighted by stratum size (ate_contribution sums to the stratified
    ATE). Complements `cuped_ab_analysis` (randomized, variance
    reduction) and `did_treatment_effect` (panel) with the
    subclassification estimator. ntile's SQL-standard deterministic split
    over a total order (n_pre, user_id) makes strata engine-identical.
    One groupBy per period + one ntile window over the per-user relation
    (users ≪ events) — no per-event window, no quadratic stage."""
    ev = _t(spark, sf_dir, "events")
    cutoff = ev.agg(
        (F.min("ts") + F.expr("INTERVAL 15 DAYS")).alias("c")
    )
    with_c = ev.crossJoin(F.broadcast(cutoff))
    pre = (
        with_c.filter(F.col("ts") < F.col("c"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_pre"),
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("treated"),
        )
    )
    post = (
        with_c.filter(
            (F.col("ts") >= F.col("c"))
            & (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy("user_id")
        .agg(F.sum("value").alias("outcome"))
    )
    pop = (
        pre.join(post, "user_id", "left")
        .select(
            "user_id",
            "treated",
            F.coalesce(F.col("outcome"), F.lit(0.0)).alias("outcome"),
            "n_pre",
        )
        .withColumn(
            "stratum",
            F.ntile(5).over(Window.orderBy("n_pre", "user_id")),
        )
    )
    tot = pop.agg(F.count("*").alias("n_all"))
    m_t = F.avg(F.when(F.col("treated") == 1, F.col("outcome")))
    m_c = F.avg(F.when(F.col("treated") == 0, F.col("outcome")))
    return (
        pop.crossJoin(F.broadcast(tot))
        .groupBy("stratum")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("treated").cast("long").alias("n_treated"),
            (F.count("*") - F.sum("treated")).cast("long").alias("n_control"),
            F.round(m_t, 6).alias("mean_treated"),
            F.round(m_c, 6).alias("mean_control"),
            F.round(m_t - m_c, 6).alias("stratum_effect"),
            F.round(
                (F.count("*") * 1.0 / F.max("n_all")) * (m_t - m_c), 6
            ).alias("ate_contribution"),
        )
        .select(
            F.col("stratum").cast("long").alias("stratum"),
            "n_users",
            "n_treated",
            "n_control",
            "mean_treated",
            "mean_control",
            "stratum_effect",
            "ate_contribution",
        )
    )


# ---------------------------------------------------------------------------
# 1-D Kalman filter per user (random-walk state, optimal gain)
# ---------------------------------------------------------------------------

_KALMAN_ORACLE = """
    WITH RECURSIVE o AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE value IS NOT NULL
    ),
    cap AS (SELECT * FROM o WHERE rn <= 64),
    n AS (SELECT user_id, max(rn) AS n_events FROM cap GROUP BY user_id),
    k AS (
      SELECT user_id, 1 AS rn, value AS x, 1.0::DOUBLE AS p
      FROM cap WHERE rn = 1
      UNION ALL
      SELECT k.user_id, k.rn + 1,
             k.x + ((k.p + 0.04) / (k.p + 0.04 + 0.25))
                   * (c.value - k.x),
             (1.0 - (k.p + 0.04) / (k.p + 0.04 + 0.25)) * (k.p + 0.04)
      FROM k JOIN cap c ON c.user_id = k.user_id AND c.rn = k.rn + 1
    )
    SELECT k.user_id,
           CAST(n.n_events AS BIGINT) AS n_events,
           round(k.x, 6) AS x_filtered,
           round(k.p, 6) AS p_final
    FROM k JOIN n ON k.user_id = n.user_id AND k.rn = n.n_events
    """


@register("kalman_filter_value_per_user", oracle=_KALMAN_ORACLE)
def kalman_filter_value_per_user(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1-D Kalman filter (random-walk state x, process noise q=0.04,
    observation noise r=0.25) over each user's ordered value stream —
    the optimal-gain generalization of the fixed-α EWMA smoother: the
    gain (p+q)/(p+q+r) adapts as the state covariance p converges.
    Like EWMA/Holt this is a LEFT FOLD with two doubles of state, run as
    one ``F.aggregate`` over the per-key sorted array (one groupBy
    shuffle). Histories are capped at the FIRST 64 events per key
    (deterministic (ts, event_id) order) so per-key state stays bounded
    at any scale — the same bounded-history discipline as the Theil-Sen
    cap — and the oracle's recursive CTE terminates in ≤64 rounds. Both
    engines evaluate the literally identical float-op sequence (the
    predicted covariance p+q is inlined, not bound), so the fold is
    bit-deterministic before the 6dp round."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 64)
        .select("user_id", "rn", "value")
    )
    per = capped.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "value"))),
            lambda s: s["value"],
        ).alias("vs")
    )
    seed = F.struct(
        F.element_at("vs", 1).cast("double").alias("x"),
        F.lit(1.0).alias("p"),
    )

    def step(acc, z):
        new_x = acc["x"] + ((acc["p"] + 0.04) / (acc["p"] + 0.04 + 0.25)) * (
            z - acc["x"]
        )
        new_p = (1.0 - (acc["p"] + 0.04) / (acc["p"] + 0.04 + 0.25)) * (
            acc["p"] + 0.04
        )
        return F.struct(new_x.alias("x"), new_p.alias("p"))

    kf = F.aggregate(
        F.slice("vs", 2, F.greatest(F.size("vs") - 1, F.lit(0))),
        seed,
        step,
    )
    return per.select(
        "user_id",
        F.size("vs").cast("long").alias("n_events"),
        F.round(kf["x"], 6).alias("x_filtered"),
        F.round(kf["p"], 6).alias("p_final"),
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of two BM25 retrieval lists
# ---------------------------------------------------------------------------

def _bm25_ranked_cte(terms: list[str], suffix: str) -> str:
    """DuckDB CTE chain: top-50 BM25 ranking for a query bag, ranks
    assigned on (round(bm25,6) DESC, doc_id) — the same deterministic
    tie-break the Spark side uses."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    hits{suffix} AS (
      SELECT doc_id, dl, tok AS term, count(*) AS tf
      FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM base)
      WHERE tok IN ({in_list})
      GROUP BY doc_id, dl, tok
    ),
    dfreq{suffix} AS (
      SELECT term, count(*) AS df_t FROM hits{suffix} GROUP BY term
    ),
    w{suffix} AS (
      SELECT h.doc_id, h.term,
             ln(1.0 + (c.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
               * (h.tf * 2.2)
               / (h.tf + 1.2 * (0.25 + 0.75 * h.dl / c.avgdl)) AS wt
      FROM hits{suffix} h JOIN dfreq{suffix} d USING (term)
      CROSS JOIN corpus c
    ),
    s{suffix} AS (
      SELECT doc_id,
             list_reduce(list(wt ORDER BY term), (a, b) -> a + b) AS bm25
      FROM w{suffix} GROUP BY doc_id
    ),
    r{suffix} AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id)
               AS rnk
      FROM s{suffix}
      ORDER BY round(bm25, 6) DESC, doc_id LIMIT 50
    )"""


_RRF_ORACLE = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    base AS (SELECT doc_id, len(toks) AS dl, toks FROM t),
    corpus AS (
      SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl
      FROM base
    ),{_bm25_ranked_cte(["spark", "join", "vector"], "1")},
    {_bm25_ranked_cte(["hash", "merge", "stream"], "2")},
    fused AS (
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             a.rnk AS rank_q1, b.rnk AS rank_q2,
             coalesce(1.0 / (60 + a.rnk), 0.0)
               + coalesce(1.0 / (60 + b.rnk), 0.0) AS rrf
      FROM r1 a FULL OUTER JOIN r2 b ON a.doc_id = b.doc_id
    )
    SELECT doc_id,
           CAST(rank_q1 AS BIGINT) AS rank_q1,
           CAST(rank_q2 AS BIGINT) AS rank_q2,
           round(rrf, 6) AS rrf_score
    FROM fused
    ORDER BY round(rrf, 6) DESC, doc_id LIMIT 20
    """


@register("retrieval_rrf_fusion", oracle=_RRF_ORACLE)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (RRF, k=60) of two BM25 retrieval lists —
    the standard multi-query / hybrid-retrieval merge a RAG pipeline
    runs when the same corpus is queried under different formulations.
    Each arm is the full `bm25_scores` operator (term-filtered explode,
    broadcast df, sorted-term weight fold); its top-50 is taken with
    orderBy+limit (TakeOrderedAndProject — a per-partition heap then a
    50-row merge, never a global sort), and ranks are assigned by a
    window over those 50 surviving rows, so the only single-partition
    stage touches ≤50 rows by construction. The fusion join is 50×50.
    Rank ties break on (round(bm25,6) DESC, doc_id) in both engines, and
    the BM25 fold is bit-deterministic, so ranks match exactly."""
    from ..operators.text import bm25_scores

    d = _t(spark, sf_dir, "documents")

    def ranked(terms: list[str]) -> DataFrame:
        scored = bm25_scores(d, terms).select(
            "doc_id", F.round("bm25", 6).alias("bm25_r")
        )
        top = scored.orderBy(
            F.col("bm25_r").desc(), F.col("doc_id").asc()
        ).limit(50)
        w = Window.orderBy(F.col("bm25_r").desc(), F.col("doc_id").asc())
        return top.select(
            "doc_id", F.row_number().over(w).alias("rnk")
        )

    r1 = ranked(["spark", "join", "vector"]).select(
        F.col("doc_id").alias("d1"), F.col("rnk").alias("rank_q1")
    )
    r2 = ranked(["hash", "merge", "stream"]).select(
        F.col("doc_id").alias("d2"), F.col("rnk").alias("rank_q2")
    )
    fused = r1.join(r2, r1.d1 == r2.d2, "full_outer").select(
        F.coalesce(F.col("d1"), F.col("d2")).alias("doc_id"),
        F.col("rank_q1").cast("long").alias("rank_q1"),
        F.col("rank_q2").cast("long").alias("rank_q2"),
        F.round(
            F.coalesce(1.0 / (60 + F.col("rank_q1")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rank_q2")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    ).limit(20)


@register(
    "ps_api_daily_value_profile",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(value) AS BIGINT) AS n_events,
           round(avg(value), 6) AS avg_value,
           round(max(value), 6) AS max_value
    FROM events WHERE value IS NOT NULL
    GROUP BY CAST(ts AS DATE)
    """,
)
def ps_api_daily_value_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pandas-on-Spark API surface pin: the daily value profile written
    against `pyspark.pandas` (groupby/agg on a ps.DataFrame) and handed
    back as a plain Spark DataFrame. The point is API parity, not a new
    operator — pandas-idiom code (the interface many data scientists
    port from) compiles to the SAME Catalyst plan as the DataFrame
    version (hash agg with partial aggregation), which the shared
    DuckDB oracle then verifies like any other query. Falls back to the
    plain DataFrame build if the pandas API is unavailable in a
    stripped runtime."""
    try:
        import pyspark.pandas as ps

        ev = _t(spark, sf_dir, "events")
        pdf = ev.selectExpr(
            "CAST(ts AS DATE) AS day", "value"
        ).pandas_api()
        pdf = pdf[pdf["value"].notnull()]
        g = pdf.groupby("day").agg(
            n_events=("value", "count"),
            avg_value=("value", "mean"),
            max_value=("value", "max"),
        )
        out = g.reset_index().to_spark()
    except Exception:  # pragma: no cover - stripped-runtime fallback
        ev = _t(spark, sf_dir, "events").filter(
            F.col("value").isNotNull()
        )
        out = (
            ev.groupBy(F.to_date("ts").alias("day"))
            .agg(
                F.count("value").alias("n_events"),
                F.avg("value").alias("avg_value"),
                F.max("value").alias("max_value"),
            )
        )
    return out.select(
        "day",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("avg_value", 6).alias("avg_value"),
        F.round("max_value", 6).alias("max_value"),
    )


# Abramowitz-Stegun 7.1.26 erf approximation — written ONCE as SQL text
# and reused verbatim by both engines so the float op sequence is
# literally identical (the only transcendental is exp on equal inputs).
def _phi_sql(z: str) -> str:
    """P(Z <= z) for z >= 0 via A&S 7.1.26 (|err| < 1.5e-7)."""
    x = f"(({z}) / 1.4142135623730951)"
    t = f"(1.0 / (1.0 + 0.3275911 * {x}))"
    poly = (
        f"((((1.061405429 * {t} - 1.453152027) * {t} + 1.421413741)"
        f" * {t} - 0.284496736) * {t} + 0.254829592) * {t}"
    )
    return f"(0.5 * (1.0 + (1.0 - {poly} * exp(-{x} * {x}))))"


_BH_Q = 0.10

_FDR_ORACLE = f"""
    WITH g AS (
      SELECT event_type, count(*) AS n, sum(value) AS s,
             sum(value * value) AS ss
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    tot AS (
      SELECT list_reduce(list(n  ORDER BY event_type), (a, b) -> a + b)
               AS n_all,
             list_reduce(list(s  ORDER BY event_type), (a, b) -> a + b)
               AS s_all,
             list_reduce(list(ss ORDER BY event_type), (a, b) -> a + b)
               AS ss_all
      FROM g
    ),
    z AS (
      SELECT g.event_type, g.n,
             (g.s / g.n - (t.s_all - g.s) / (t.n_all - g.n))
             / sqrt(
                 ((g.ss - g.s * g.s / g.n) / (g.n - 1)) / g.n
                 + (((t.ss_all - g.ss)
                     - (t.s_all - g.s) * (t.s_all - g.s)
                       / (t.n_all - g.n)) / (t.n_all - g.n - 1))
                   / (t.n_all - g.n)) AS zstat
      FROM g CROSS JOIN tot t
    ),
    p AS (
      SELECT event_type, n, zstat,
             2.0 * (1.0 - {_phi_sql('abs(zstat)')}) AS pval
      FROM z
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY pval, event_type) AS rk,
             count(*) OVER () AS m
      FROM p
    ),
    cut AS (
      SELECT max(CASE WHEN pval <= rk * {_BH_Q} / m THEN rk
                      ELSE 0 END) OVER () AS k_max, *
      FROM ranked
    )
    SELECT event_type,
           CAST(n AS BIGINT)   AS n_obs,
           round(zstat, 4) + 0 AS z_stat,
           round(pval, 6)      AS p_value,
           CAST(rk AS BIGINT)  AS p_rank,
           rk <= k_max         AS rejected_fdr10
    FROM cut
    """


@register("type_mean_shift_fdr", oracle=_FDR_ORACLE)
def type_mean_shift_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing control — Benjamini–Hochberg FDR at q=0.10 over
    the family of per-type mean-shift tests (each type's value mean vs
    the complement, Welch z from sufficient statistics): the correction
    every metrics platform needs once it tests many segments at once,
    completing the testing family (single tests exist; this governs the
    FAMILY). The normal CDF is the Abramowitz–Stegun 7.1.26 erf
    polynomial written once as shared SQL text, so both engines run the
    literally identical float sequence (exp is the only libm call, on
    equal inputs). Complement-arm statistics come from (total − type)
    sufficient stats — one groupBy + one fold-ordered total, no second
    scan; the BH step-up runs as two windows over the |types|-row
    relation."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    tot = g.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("event_type", "n"))),
            F.lit(0.0),
            lambda a, x: a + x["n"],
        ).alias("n_all"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("event_type", "s"))),
            F.lit(0.0),
            lambda a, x: a + x["s"],
        ).alias("s_all"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("event_type", "ss"))),
            F.lit(0.0),
            lambda a, x: a + x["ss"],
        ).alias("ss_all"),
    )
    zdf = g.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n",
        (
            (F.col("s") / F.col("n"))
            - (F.col("s_all") - F.col("s"))
            / (F.col("n_all") - F.col("n"))
        ).alias("_md"),
        (
            ((F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
             / (F.col("n") - 1)) / F.col("n")
            + (
                (
                    (F.col("ss_all") - F.col("ss"))
                    - (F.col("s_all") - F.col("s"))
                    * (F.col("s_all") - F.col("s"))
                    / (F.col("n_all") - F.col("n"))
                )
                / (F.col("n_all") - F.col("n") - 1)
            )
            / (F.col("n_all") - F.col("n"))
        ).alias("_se2"),
    ).select(
        "event_type",
        "n",
        (F.col("_md") / F.sqrt(F.col("_se2"))).alias("zstat"),
    )
    p = zdf.select(
        "event_type",
        "n",
        "zstat",
        (2.0 * (1.0 - F.expr(_phi_sql("abs(zstat)")))).alias("pval"),
    )
    w_rank = Window.orderBy("pval", "event_type")
    w_all = Window.partitionBy()
    ranked = p.select(
        "*",
        F.row_number().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    cut = ranked.select(
        "*",
        F.max(
            F.when(
                F.col("pval") <= F.col("rk") * _BH_Q / F.col("m"),
                F.col("rk"),
            ).otherwise(0)
        )
        .over(w_all)
        .alias("k_max"),
    )
    return cut.select(
        "event_type",
        F.col("n").cast("long").alias("n_obs"),
        # + 0.0 canonicalizes IEEE negative zero (raw-repr compare)
        (F.round("zstat", 4) + F.lit(0.0)).alias("z_stat"),
        F.round("pval", 6).alias("p_value"),
        F.col("rk").cast("long").alias("p_rank"),
        (F.col("rk") <= F.col("k_max")).alias("rejected_fdr10"),
    )


@register(
    "ab_test_power_grid",
    oracle=f"""
    WITH base AS (
      SELECT count(*) AS n,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               * 1.0 / count(*) AS p0
      FROM events
    ),
    grid AS (
      SELECT CAST(unnest([0.01, 0.02, 0.03, 0.04, 0.05]) AS DOUBLE)
        AS mde
    ),
    calc AS (
      SELECT g.mde, b.n, b.p0,
             g.mde / sqrt((b.p0 * (1 - b.p0)
                           + (b.p0 + g.mde) * (1 - b.p0 - g.mde))
                          / (b.n / 2.0))
               - 1.6448536269514722 AS zshift
      FROM grid g CROSS JOIN base b
    )
    SELECT round(mde, 2) AS mde,
           CAST(n AS BIGINT) AS n_obs,
           round(p0, 6) AS baseline_rate,
           round(CASE WHEN zshift >= 0 THEN {_phi_sql('zshift')}
                      ELSE 1.0 - {_phi_sql('(-zshift)')} END, 4)
             AS power,
           (CASE WHEN zshift >= 0 THEN {_phi_sql('zshift')}
                 ELSE 1.0 - {_phi_sql('(-zshift)')} END) >= 0.8
             AS powered_80
    FROM calc
    """,
)
def ab_test_power_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test power planning grid: with the observed event volume
    split 50/50 and the observed purchase share as the baseline rate,
    the power of a one-sided two-proportion z-test (α = 0.05) to detect
    minimum effects of +1..5pp is power = Φ(δ/SE − z_α) with the
    unpooled SE at the candidate rates — the pre-registration
    calculation every experimentation pipeline runs before committing
    traffic. The normal CDF is the same A&S 7.1.26 polynomial shared as
    SQL text with the FDR query (valid for z ≥ 0; the negative branch
    goes through Φ(−z) symmetry EXPLICITLY on both engines so the
    approximation error is identical). One 1-row baseline aggregate
    crossed with a 5-row grid: constant work beyond one scan."""
    ev = _t(spark, sf_dir, "events")
    base = ev.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            * 1.0
            / F.count(F.lit(1))
        ).alias("p0"),
    )
    grid = spark.range(1, 6).select((F.col("id") / 100.0).alias("mde"))
    se = F.sqrt(
        (
            F.col("p0") * (1 - F.col("p0"))
            + (F.col("p0") + F.col("mde"))
            * (1 - F.col("p0") - F.col("mde"))
        )
        / (F.col("n") / 2.0)
    )
    calc = grid.crossJoin(F.broadcast(base)).withColumn(
        "zshift", F.col("mde") / se - 1.6448536269514722
    )
    power = F.when(
        F.col("zshift") >= 0, F.expr(_phi_sql("zshift"))
    ).otherwise(1.0 - F.expr(_phi_sql("(-zshift)")))
    return calc.select(
        F.round("mde", 2).alias("mde"),
        F.col("n").cast("long").alias("n_obs"),
        F.round("p0", 6).alias("baseline_rate"),
        F.round(power, 4).alias("power"),
        (power >= 0.8).alias("powered_80"),
    )


@register(
    "quantile_treatment_effects",
    oracle="""
    WITH obs AS (
      SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 2 AS treated,
             value
      FROM events WHERE value IS NOT NULL
    ),
    qs AS (
      SELECT treated,
             quantile_cont(value, [0.1, 0.25, 0.5, 0.75, 0.9]) AS q
      FROM obs GROUP BY treated
    ),
    wide AS (
      SELECT t.q AS qt, c.q AS qc
      FROM (SELECT q FROM qs WHERE treated = 1) t
      CROSS JOIN (SELECT q FROM qs WHERE treated = 0) c
    ),
    pos AS (SELECT unnest([1, 2, 3, 4, 5]) AS i)
    SELECT round(CAST(([0.1, 0.25, 0.5, 0.75, 0.9])[i] AS DOUBLE), 2)
             AS quantile,
           round(qt[i], 4) AS treated_q,
           round(qc[i], 4) AS control_q,
           round(qt[i] - qc[i], 4) AS qte
    FROM wide CROSS JOIN pos
    """,
)
def quantile_treatment_effects(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile treatment effects across the value distribution for the
    deterministic hashed 50/50 assignment: differences of exact
    interpolated quantiles (p10/p25/p50/p75/p90) between arms — the
    distributional read-out that catches effects a mean comparison
    hides (a treatment that helps the p90 while hurting the p10 nets
    to zero in the ATE). Each arm's five quantiles come from ONE
    percentile-array aggregate (a single pass sharing one sort buffer
    instead of five), then the two 5-element arrays meet in a 1×1
    cross join and unzip into a 5-row relation by index. Same md5
    assignment convention as the uplift/CUPED family, so both engines
    agree exactly."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    treated = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
        % 2
    )
    ps = [0.1, 0.25, 0.5, 0.75, 0.9]
    qs = (
        ev.select(treated.alias("treated"), "value")
        .groupBy("treated")
        .agg(
            F.percentile(
                "value", F.array(*[F.lit(p) for p in ps])
            ).alias("q")
        )
    )
    t = qs.filter(F.col("treated") == 1).select(F.col("q").alias("qt"))
    c = qs.filter(F.col("treated") == 0).select(F.col("q").alias("qc"))
    wide = t.crossJoin(F.broadcast(c))
    idx = wide.select(
        "qt",
        "qc",
        F.posexplode(F.array(*[F.lit(p) for p in ps])).alias("i", "p"),
    )
    return idx.select(
        F.round("p", 2).alias("quantile"),
        F.round(F.element_at("qt", F.col("i") + 1), 4).alias("treated_q"),
        F.round(F.element_at("qc", F.col("i") + 1), 4).alias("control_q"),
        F.round(
            F.element_at("qt", F.col("i") + 1)
            - F.element_at("qc", F.col("i") + 1),
            4,
        ).alias("qte"),
    )


@register(
    "wasserstein_value_shift",
    oracle="""
    WITH qs AS (
      SELECT event_type,
             quantile_cont(value, [0.05, 0.10, 0.15, 0.20, 0.25, 0.30,
                                   0.35, 0.40, 0.45, 0.50, 0.55, 0.60,
                                   0.65, 0.70, 0.75, 0.80, 0.85, 0.90,
                                   0.95]) AS q,
             count(*) AS n
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
      GROUP BY event_type
    ),
    wide AS (
      SELECT c.q AS qc, p.q AS qp, c.n AS n_click, p.n AS n_purchase
      FROM (SELECT q, n FROM qs WHERE event_type = 'click') c
      CROSS JOIN (SELECT q, n FROM qs WHERE event_type = 'purchase') p
    ),
    pos AS (SELECT unnest(range(1, 20)) AS i)
    SELECT CAST(any_value(n_click) AS BIGINT) AS n_click,
           CAST(any_value(n_purchase) AS BIGINT) AS n_purchase,
           round(sum(abs(qc[i] - qp[i])) / 19.0, 4) AS w1_distance
    FROM wide CROSS JOIN pos
    """,
)
def wasserstein_value_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1-D Wasserstein (earth-mover) distance between the click and
    purchase value distributions via the quantile-function identity
    W₁ = ∫|F₁⁻¹(u) − F₂⁻¹(u)|du, approximated on a 19-point quantile
    grid — the drift metric that, unlike KS (sup of CDF gap) or PSI
    (binned likelihood ratio), measures HOW FAR mass moved in value
    units, which is what makes it the preferred embedding/feature-shift
    monitor. Each side's entire quantile grid comes from ONE
    percentile-array aggregate (a single sort buffer), so the distance
    costs two partial-aggregated passes and a 19-term fold — no global
    sort, no pairwise transport problem."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("click", "purchase")
    )
    ps = [i / 20.0 for i in range(1, 20)]
    qs = ev.groupBy("event_type").agg(
        F.percentile("value", F.array(*[F.lit(p) for p in ps])).alias(
            "q"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    c = qs.filter(F.col("event_type") == "click").select(
        F.col("q").alias("qc"), F.col("n").alias("n_click")
    )
    p = qs.filter(F.col("event_type") == "purchase").select(
        F.col("q").alias("qp"), F.col("n").alias("n_purchase")
    )
    wide = c.crossJoin(F.broadcast(p))
    w1 = (
        F.aggregate(
            F.zip_with(
                F.col("qc"),
                F.col("qp"),
                lambda a, b: F.abs(a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / 19.0
    )
    return wide.select(
        F.col("n_click").cast("long").alias("n_click"),
        F.col("n_purchase").cast("long").alias("n_purchase"),
        F.round(w1, 4).alias("w1_distance"),
    )


@register(
    "competing_risks_incidence",
    oracle="""
    WITH firsts AS (
      SELECT user_id, event_type AS cause, CAST(ts AS DATE) AS day
      FROM (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    n0 AS (SELECT count(*) AS n_users FROM firsts),
    daily AS (
      SELECT day, cause, count(*) AS c FROM firsts GROUP BY day, cause
    ),
    cum AS (
      SELECT day, cause, c,
             sum(c) OVER (PARTITION BY cause ORDER BY day) AS cum_c
      FROM daily
    )
    SELECT cum.day, cum.cause,
           CAST(cum.c AS BIGINT) AS n_first_events,
           round(cum.cum_c * 1.0 / n0.n_users, 6) AS cum_incidence
    FROM cum CROSS JOIN n0
    """,
)
def competing_risks_incidence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Competing-risks cumulative incidence: each user 'fails' once, by
    whichever event type arrives FIRST, and CIF_cause(t) is the share
    of users whose first event was that cause by day t — the third leg
    of the survival family (Kaplan–Meier: one risk; Nelson–Aalen:
    hazard; this: which-cause-wins), and the correct read-out when
    causes compete (naively running KM per cause overestimates every
    one of them). With complete observation the Aalen–Johansen
    estimator reduces to this empirical first-event distribution, which
    keeps it closed-form: one latest/earliest-per-key rank
    (WindowGroupLimit), one bounded daily aggregate, and a per-cause
    running sum over (days × causes) rows."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        ev.select(
            "user_id",
            F.col("event_type").alias("cause"),
            F.to_date("ts").alias("day"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    n0 = firsts.agg(F.count(F.lit(1)).alias("n_users"))
    daily = firsts.groupBy("day", "cause").agg(
        F.count(F.lit(1)).alias("c")
    )
    wc = Window.partitionBy("cause").orderBy("day")
    cum = daily.select(
        "day", "cause", "c", F.sum("c").over(wc).alias("cum_c")
    )
    return cum.crossJoin(F.broadcast(n0)).select(
        "day",
        "cause",
        F.col("c").cast("long").alias("n_first_events"),
        F.round(F.col("cum_c") * 1.0 / F.col("n_users"), 6).alias(
            "cum_incidence"
        ),
    )


@register(
    "thompson_arm_posteriors",
    oracle="""
    WITH arms AS (
      SELECT event_type,
             count(*) AS n,
             sum(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS wins
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_plays,
           CAST(wins AS BIGINT) AS n_wins,
           CAST(1 + wins AS BIGINT) AS alpha,
           CAST(1 + n - wins AS BIGINT) AS beta,
           round((1.0 + wins) / (2.0 + n), 6) AS posterior_mean,
           round(((1.0 + wins) / (2.0 + n)) * (1.0 - (1.0 + wins) / (2.0 + n))
                 / (3.0 + n), 10) AS posterior_var
    FROM arms
    """,
)
def thompson_arm_posteriors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Thompson-sampling posterior state per arm: Beta(1+wins,
    1+losses) conjugate updates from one aggregation pass — the entire
    state a Bernoulli bandit needs to run (sampling happens at serve
    time; the BATCH job's product is exactly these sufficient
    statistics, refreshed per window). Posterior mean and variance are
    closed-form Beta moments, so the engine-side cost is one groupBy
    emitting #arms rows regardless of traffic — the same
    sufficient-statistics-not-data contract as the registry's
    off-policy evaluation suite, which consumes these arms as its
    logging policy."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    arms = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("value") >= 50, 1).otherwise(0)
        ).alias("wins"),
    )
    mean = (1.0 + F.col("wins")) / (2.0 + F.col("n"))
    return arms.select(
        "event_type",
        F.col("n").cast("long").alias("n_plays"),
        F.col("wins").cast("long").alias("n_wins"),
        (1 + F.col("wins")).cast("long").alias("alpha"),
        (1 + F.col("n") - F.col("wins")).cast("long").alias("beta"),
        F.round(mean, 6).alias("posterior_mean"),
        F.round(mean * (1.0 - mean) / (3.0 + F.col("n")), 10).alias(
            "posterior_var"
        ),
    )


@register(
    "assignment_srm_check",
    oracle="""
    WITH users AS (
      SELECT DISTINCT user_id,
             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 2 AS arm
      FROM events
    ),
    s AS (
      SELECT count(*) AS n,
             sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_t
      FROM users
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(n_t AS BIGINT) AS n_treated,
           CAST(n - n_t AS BIGINT) AS n_control,
           round((n_t - n / 2.0) * (n_t - n / 2.0) / (n / 4.0)
                 + ((n - n_t) - n / 2.0) * ((n - n_t) - n / 2.0)
                   / (n / 4.0), 4) AS chi2_stat,
           ((n_t - n / 2.0) * (n_t - n / 2.0) / (n / 4.0)
            + ((n - n_t) - n / 2.0) * ((n - n_t) - n / 2.0) / (n / 4.0))
             > 3.8415 AS srm_detected
    FROM s
    """,
)
def assignment_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for the registry's hashed 50/50
    assignment: a one-degree chi-square of the observed arm counts
    against the designed split — the FIRST health gate every experiment
    readout runs, because a biased assignment invalidates all the
    downstream effect estimates (CUPED, QTE, uplift) no matter how
    careful they are. SRM detected (χ² > 3.84) on a content-hashed
    assignment would mean the hash itself is broken — this query is the
    canary wired to the same md5 convention every treatment query uses.
    One distinct + one 1-row conditional aggregate."""
    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct().select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("arm")
    )
    s = users.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_t"),
    )
    n, nt = F.col("n"), F.col("n_t")
    chi2 = (nt - n / 2.0) * (nt - n / 2.0) / (n / 4.0) + (
        (n - nt) - n / 2.0
    ) * ((n - nt) - n / 2.0) / (n / 4.0)
    return s.select(
        n.cast("long").alias("n_users"),
        nt.cast("long").alias("n_treated"),
        (n - nt).cast("long").alias("n_control"),
        F.round(chi2, 4).alias("chi2_stat"),
        (chi2 > 3.8415).alias("srm_detected"),
    )
