"""Contract queries: in-plan model evaluation + privacy-audit extras.

A training-data engine doesn't just transform data — it has to SCORE
what it produces: does a cheap classifier separate the classes, do the
forecasting baselines hold up under scaled error metrics, and does the
released slice leak identities? Each query here is a single declarative
plan (groupBy partials + broadcast-joined model state), so every one of
them survives a 1000-executor scale-up: model state is a handful of rows
(class priors, likelihood tables), the fact-table pass is one shuffle,
and nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .core import register, _t

#: Deterministic content-hash split bucket (same md5 convention as
#: doc_train_test_split — stable across runs and partitionings).
_BUCKET = (
    "CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT) % 100"
)


def _bucket_col() -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
        % 100
    )


@register(
    "event_naive_bayes_eval",
    oracle=f"""
    WITH feat AS (
      SELECT event_id, event_type AS cls,
             CAST(floor(hour(ts) / 6) AS INT) AS hq,
             CASE WHEN value < 10 THEN 0 WHEN value < 50 THEN 1
                  WHEN value < 100 THEN 2 ELSE 3 END AS vb,
             {_BUCKET} AS b
      FROM events
    ),
    train AS (SELECT * FROM feat WHERE b < 80),
    test  AS (SELECT * FROM feat WHERE b >= 80),
    cstat AS (SELECT cls, count(*) AS n_c FROM train GROUP BY cls),
    tot   AS (SELECT sum(n_c) AS total FROM cstat),
    hstat AS (SELECT cls, hq, count(*) AS n_h FROM train GROUP BY cls, hq),
    vstat AS (SELECT cls, vb, count(*) AS n_v FROM train GROUP BY cls, vb),
    scored AS (
      SELECT t.event_id, t.cls AS true_cls, c.cls AS cand,
             (CAST(c.n_c AS DOUBLE) / tot.total)
               * ((COALESCE(h.n_h, 0) + 1.0) / (c.n_c + 4.0))
               * ((COALESCE(v.n_v, 0) + 1.0) / (c.n_c + 4.0)) AS score
      FROM test t
      CROSS JOIN cstat c
      CROSS JOIN tot
      LEFT JOIN hstat h ON h.cls = c.cls AND h.hq = t.hq
      LEFT JOIN vstat v ON v.cls = c.cls AND v.vb = t.vb
    ),
    pred AS (
      SELECT event_id, true_cls, cand AS pred_cls FROM (
        SELECT *, row_number() OVER (
          PARTITION BY event_id
          ORDER BY round(score, 12) DESC, cand ASC) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT true_cls AS event_type,
           cast(count(*) AS BIGINT) AS n_test,
           cast(sum(CASE WHEN pred_cls = true_cls THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(sum(CASE WHEN pred_cls = true_cls THEN 1.0 ELSE 0.0 END)
                 / count(*), 6) AS accuracy
    FROM pred GROUP BY true_cls
    """,
)
def event_naive_bayes_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical Naive Bayes, trained and evaluated entirely in-plan:
    features are (6-hour quadrant, value band), the class is the event
    type, the split is an 80/20 content-hash bucket on the event id, and
    the likelihood tables use add-one (Laplace) smoothing over the 4
    feature levels.

    The 100 TB shape: the "model" is three tiny aggregate tables (5
    priors, <=20 conditional counts each) — the training pass is one
    map-side-combining groupBy over the fact table, and scoring is a
    broadcast cross join of the test rows against 5 class rows followed
    by two broadcast lookups. No iterative solver, no driver state, no
    Python row path; the deterministic argmax (score rounded to 12,
    class-name tie-break) makes the whole train+eval loop a value-hashed
    oracle query."""
    ev = _t(spark, sf_dir, "events")
    feat = ev.select(
        "event_id",
        F.col("event_type").alias("cls"),
        F.floor(F.hour("ts") / 6).cast("int").alias("hq"),
        F.when(F.col("value") < 10, 0)
        .when(F.col("value") < 50, 1)
        .when(F.col("value") < 100, 2)
        .otherwise(3)
        .alias("vb"),
        _bucket_col().alias("b"),
    )
    train = feat.filter(F.col("b") < 80)
    test = feat.filter(F.col("b") >= 80)
    cstat = train.groupBy("cls").agg(F.count(F.lit(1)).alias("n_c"))
    tot = cstat.agg(F.sum("n_c").alias("total"))
    hstat = train.groupBy("cls", "hq").agg(F.count(F.lit(1)).alias("n_h"))
    vstat = train.groupBy("cls", "vb").agg(F.count(F.lit(1)).alias("n_v"))
    cand = F.broadcast(cstat.crossJoin(tot)).withColumnRenamed("cls", "cand")
    scored = (
        test.crossJoin(cand)
        .join(
            F.broadcast(hstat).withColumnRenamed("cls", "cand"),
            ["cand", "hq"],
            "left",
        )
        .join(
            F.broadcast(vstat).withColumnRenamed("cls", "cand"),
            ["cand", "vb"],
            "left",
        )
        .select(
            "event_id",
            F.col("cls").alias("true_cls"),
            "cand",
            (
                (F.col("n_c").cast("double") / F.col("total"))
                * (
                    (F.coalesce(F.col("n_h"), F.lit(0)) + 1.0)
                    / (F.col("n_c") + 4.0)
                )
                * (
                    (F.coalesce(F.col("n_v"), F.lit(0)) + 1.0)
                    / (F.col("n_c") + 4.0)
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("event_id").orderBy(
        F.round(F.col("score"), 12).desc(), F.col("cand").asc()
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("true_cls", F.col("cand").alias("pred_cls"))
    )
    hit = (F.col("pred_cls") == F.col("true_cls")).cast("long")
    return pred.groupBy(F.col("true_cls").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(hit).alias("n_correct"),
        F.round(F.sum(hit.cast("double")) / F.count(F.lit(1)), 6).alias(
            "accuracy"
        ),
    )


@register(
    "l_diversity_audit",
    oracle="""
    WITH g AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(floor(value / 10) AS BIGINT) AS vb,
             count(DISTINCT user_id) AS l, count(*) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT cast(count(*) AS BIGINT) AS n_groups,
           cast(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           cast(sum(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           cast(min(l) AS BIGINT) AS min_l,
           round(avg(CAST(l AS DOUBLE)), 6) AS avg_l
    FROM g
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l=3) — the companion gate to
    `k_anonymity_audit`: a quasi-identifier group can be large (k-safe)
    yet still leak if every row in it shares one sensitive value, so
    this measures DISTINCT sensitive values (user_id) per
    (event_type, day, value-band) group. One groupBy with a distinct
    aggregate, one 1-row summary; at scale the distinct count inside the
    group is the only state and it partial-aggregates per key."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("d"),
        F.floor(F.col("value") / 10).cast("long").alias("vb"),
    ).agg(
        F.countDistinct("user_id").alias("l"),
        F.count(F.lit(1)).alias("n"),
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("l") < 3).cast("long")).alias("n_violating_groups"),
        F.sum(F.when(F.col("l") < 3, F.col("n")).otherwise(0)).alias(
            "n_rows_at_risk"
        ),
        F.min("l").alias("min_l"),
        F.round(F.avg(F.col("l").cast("double")), 6).alias("avg_l"),
    )


@register(
    "forecast_scaled_error_metrics",
    oracle="""
    WITH s AS (
      SELECT event_type, value,
             avg(value) OVER w3 AS f3,
             count(value) OVER w3 AS c3,
             lag(value) OVER w AS prev_v
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
             w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
    ),
    e AS (
      SELECT event_type,
             abs(value - f3) AS ae,
             2.0 * abs(value - f3) / (abs(value) + abs(f3)) AS sape,
             abs(value - prev_v) AS nae
      FROM s WHERE c3 = 3
    )
    SELECT event_type,
           cast(count(*) AS BIGINT) AS n,
           round(avg(sape), 6) AS smape,
           round(avg(ae) / NULLIF(avg(nae), 0), 6) AS mase
    FROM e GROUP BY event_type
    """,
)
def forecast_scaled_error_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-free forecast scoring (Hyndman & Koehler's MASE plus sMAPE)
    for the rolling-mean-of-3 predictor, benchmarked against the naive
    persistence forecast on the SAME evaluation rows — MASE < 1 means
    the model beats persistence, and unlike MAPE both metrics survive
    values near zero and unit changes. Per-key window pass (no global
    sort) + one aggregation; complements `persistence_forecast_backtest`
    which reports unscaled MAE/RMSE."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w3 = w.rowsBetween(-3, -1)
    s = ev.select(
        "event_type",
        "value",
        F.avg("value").over(w3).alias("f3"),
        F.count("value").over(w3).alias("c3"),
        F.lag("value").over(w).alias("prev_v"),
    ).filter(F.col("c3") == 3)
    ae = F.abs(F.col("value") - F.col("f3"))
    sape = 2.0 * ae / (F.abs(F.col("value")) + F.abs(F.col("f3")))
    nae = F.abs(F.col("value") - F.col("prev_v"))
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(sape), 6).alias("smape"),
        F.round(
            F.avg(ae) / F.nullif(F.avg(nae), F.lit(0.0)), 6
        ).alias("mase"),
    )


@register(
    "t_closeness_audit",
    oracle="""
    WITH base AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             least(9, greatest(0, CAST(floor(value / 10) AS BIGINT)))
               AS band
      FROM events WHERE value IS NOT NULL
    ),
    tot AS (SELECT count(*) AS n_all FROM base),
    gdist AS (
      SELECT band, count(*) AS n_b FROM base GROUP BY band
    ),
    grp AS (
      SELECT event_type, d, count(*) AS n_g FROM base GROUP BY event_type, d
    ),
    cell AS (
      SELECT event_type, d, band, count(*) AS n_gb
      FROM base GROUP BY event_type, d, band
    ),
    grid AS (
      SELECT g.event_type, g.d, g.n_g, b.band, b.n_b,
             coalesce(c.n_gb, 0) AS n_gb
      FROM grp g CROSS JOIN gdist b
      LEFT JOIN cell c ON c.event_type = g.event_type AND c.d = g.d
                      AND c.band = b.band
    ),
    cum AS (
      SELECT event_type, d, n_g, band,
             sum(n_gb * 1.0 / n_g
                 - n_b * 1.0 / (SELECT n_all FROM tot))
               OVER (PARTITION BY event_type, d ORDER BY band) AS cdf_gap
      FROM grid
    ),
    emd AS (
      SELECT event_type, d, max(n_g) AS n_g,
             sum(abs(cdf_gap)) / count(*) AS emd
      FROM cum GROUP BY event_type, d
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_groups,
           CAST(sum(CASE WHEN emd > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
                                                          AS n_violating_groups,
           CAST(sum(CASE WHEN emd > 0.2 THEN n_g ELSE 0 END) AS BIGINT)
                                                          AS n_rows_at_risk,
           round(max(emd), 6)                             AS max_emd,
           round(avg(emd), 6)                             AS avg_emd
    FROM emd
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (t=0.2) — the third privacy gate after
    `k_anonymity_audit` and `l_diversity_audit`: a group can be k-large
    and l-diverse yet still leak if its sensitive-value DISTRIBUTION is
    far from the population's. Sensitive attribute = value band (clamped
    decade bins); groups = (event_type, day); distance = 1-D earth
    mover's distance over the ordered bands, computed as the mean |CDF
    gap| between group and global distributions (the ordered-attribute
    EMD from the t-closeness paper). The band grid is a 10-row broadcast
    cross join so absent bands contribute zero mass; the CDF gap is a
    frame-ordered running sum (bit-reproducible); everything else is two
    hash aggregates and a 1-row summary. Scale: cells = groups × 10 —
    linear in groups, the window partitions by group with a 10-row
    frame."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.least(
            F.lit(9),
            F.greatest(F.lit(0), F.floor(F.col("value") / 10)),
        )
        .cast("long")
        .alias("band"),
    )
    tot = base.agg(F.count(F.lit(1)).alias("n_all"))
    gdist = base.groupBy("band").agg(F.count(F.lit(1)).alias("n_b"))
    grp = base.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("n_g")
    )
    cell = base.groupBy("event_type", "d", "band").agg(
        F.count(F.lit(1)).alias("n_gb")
    )
    grid = (
        grp.crossJoin(F.broadcast(gdist))
        .join(cell, ["event_type", "d", "band"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "d",
            "n_g",
            "band",
            (
                F.coalesce(F.col("n_gb"), F.lit(0)) * 1.0 / F.col("n_g")
                - F.col("n_b") * 1.0 / F.col("n_all")
            ).alias("gap"),
        )
    )
    w = (
        Window.partitionBy("event_type", "d")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "event_type", "d", "n_g", F.sum("gap").over(w).alias("cdf_gap")
    )
    emd = cum.groupBy("event_type", "d").agg(
        F.max("n_g").alias("n_g"),
        (F.sum(F.abs(F.col("cdf_gap"))) / F.count(F.lit(1))).alias("emd"),
    )
    return emd.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("emd") > 0.2).cast("long")).alias("n_violating_groups"),
        F.sum(F.when(F.col("emd") > 0.2, F.col("n_g")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.round(F.max("emd"), 6).alias("max_emd"),
        F.round(F.avg("emd"), 6).alias("avg_emd"),
    )


_IPF_ROUNDS = 3


def _ipf_oracle() -> str:
    parts = ["""
WITH base AS (
  SELECT event_type,
         CAST(extract(dow FROM ts) AS BIGINT) AS wd,
         CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 5 = 0 AS in_sample
  FROM events
),
cells AS MATERIALIZED (
  SELECT event_type, wd,
         CAST(count(CASE WHEN in_sample THEN 1 END) AS DOUBLE) AS n_s
  FROM base GROUP BY event_type, wd
  HAVING count(CASE WHEN in_sample THEN 1 END) > 0
),
rowt AS MATERIALIZED (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS r FROM base
  GROUP BY event_type
),
colt AS MATERIALIZED (
  SELECT wd, CAST(count(*) AS DOUBLE) AS cl FROM base GROUP BY wd
),
w0 AS (SELECT event_type, wd, n_s AS w FROM cells)"""]
    for k in range(1, _IPF_ROUNDS + 1):
        parts.append(f""",
w{k}a AS MATERIALIZED (
  SELECT c.event_type, c.wd,
         round(c.w * r.r / sum(c.w) OVER (PARTITION BY c.event_type), 9)
           AS w
  FROM w{k - 1 if k > 1 else 0}{"b" if k > 1 else ""} c
  JOIN rowt r ON r.event_type = c.event_type
),
w{k}b AS MATERIALIZED (
  SELECT c.event_type, c.wd,
         round(c.w * t.cl / sum(c.w) OVER (PARTITION BY c.wd), 9) AS w
  FROM w{k}a c JOIN colt t ON t.wd = c.wd
)""")
    parts.append(f"""
SELECT c.event_type, c.wd AS weekday,
       CAST(s.n_s AS BIGINT) AS n_sample,
       round(c.w, 4) AS raked_weight,
       round(abs(sum(c.w) OVER (PARTITION BY c.event_type) - r.r) / r.r,
             6) AS row_margin_gap
FROM w{_IPF_ROUNDS}b c
JOIN cells s ON s.event_type = c.event_type AND s.wd = c.wd
JOIN rowt r ON r.event_type = c.event_type""")
    return "".join(parts)


@register("ipf_raked_weights", oracle=_ipf_oracle())
def ipf_raked_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) — the survey-weighting /
    post-stratification operator: a deterministic ~20% hash sample's
    (event_type × weekday) cell counts are alternately scaled to match
    the FULL data's row and column margins over 3 fixed rounds, yielding
    per-cell weights whose totals reproduce the population margins (the
    column margin exactly after the final scale; the row-margin residual
    is emitted as the convergence diagnostic). Weights are rounded to
    9dp per half-step — the PCA/GMM determinism discipline — so both
    engines iterate on identical tables. Everything after the one
    counting pass is (types × 7)-grain: window scalings over bounded
    partitions, margin joins broadcast-sized."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        (F.dayofweek("ts") - 1).cast("long").alias("wd"),
        (
            F.conv(
                F.substring(
                    F.md5(F.col("event_id").cast("string")), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % 5
            == 0
        ).alias("in_sample"),
    )
    cells = (
        base.groupBy("event_type", "wd")
        .agg(
            F.count(F.when(F.col("in_sample"), 1))
            .cast("double")
            .alias("n_s")
        )
        .filter(F.col("n_s") > 0)
    )
    rowt = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("r")
    )
    colt = base.groupBy("wd").agg(
        F.count(F.lit(1)).cast("double").alias("cl")
    )
    w = cells.select("event_type", "wd", F.col("n_s").alias("w"))
    wrow = Window.partitionBy("event_type")
    wcol = Window.partitionBy("wd")
    for _ in range(_IPF_ROUNDS):
        w = w.join(F.broadcast(rowt), "event_type").select(
            "event_type",
            "wd",
            F.round(
                F.col("w") * F.col("r") / F.sum("w").over(wrow), 9
            ).alias("w"),
        )
        w = w.join(F.broadcast(colt), "wd").select(
            "event_type",
            "wd",
            F.round(
                F.col("w") * F.col("cl") / F.sum("w").over(wcol), 9
            ).alias("w"),
        )
    return (
        w.join(cells, ["event_type", "wd"])
        .join(F.broadcast(rowt), "event_type")
        .select(
            "event_type",
            F.col("wd").alias("weekday"),
            F.col("n_s").cast("long").alias("n_sample"),
            F.round("w", 4).alias("raked_weight"),
            F.round(
                F.abs(F.sum("w").over(wrow) - F.col("r")) / F.col("r"), 6
            ).alias("row_margin_gap"),
        )
    )


@register(
    "ips_policy_value_estimate",
    oracle="""
    WITH logged AS (
      SELECT event_type AS arm,
             CASE WHEN extract(hour FROM ts) < 12 THEN 0 ELSE 1 END
               AS ctx,
             CASE WHEN value > 60 THEN 1.0 ELSE 0.0 END AS r
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
    ),
    prop AS (
      SELECT arm, count(*) * 1.0 / (SELECT count(*) FROM logged) AS p
      FROM logged GROUP BY arm
    ),
    qhat AS (
      SELECT arm, ctx, avg(r) AS q FROM logged GROUP BY arm, ctx
    ),
    scored AS (
      SELECT l.arm, l.ctx, l.r, p.p, q.q,
             CASE WHEN (l.ctx = 0 AND l.arm = 'click')
                    OR (l.ctx = 1 AND l.arm = 'view')
                  THEN 1.0 ELSE 0.0 END AS matched
      FROM logged l
      JOIN prop p ON p.arm = l.arm
      JOIN qhat q ON q.arm = l.arm AND q.ctx = l.ctx
    ),
    dm AS (
      SELECT sum(cnt * q) / sum(cnt) AS dm_value FROM (
        SELECT l.ctx, count(*) AS cnt, max(q.q) AS q
        FROM logged l
        JOIN qhat q ON q.ctx = l.ctx
         AND q.arm = CASE WHEN l.ctx = 0 THEN 'click' ELSE 'view' END
        GROUP BY l.ctx)
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_logged,
           round(avg(matched * r / p), 6)                 AS ips_value,
           round(sum(matched * r / p) / sum(matched / p), 6)
                                                          AS snips_value,
           round(max(d.dm_value), 6)                      AS dm_value,
           round(max(d.dm_value)
                 + avg(matched / p * (r - q)), 6)         AS dr_value
    FROM scored CROSS JOIN dm d
    """,
)
def ips_policy_value_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Off-policy (counterfactual) evaluation suite — what a
    recommendation/bandit team computes before shipping a new policy
    without an A/B test: the target policy ("click in the morning, view
    in the afternoon") is scored on LOGGED data from the empirical
    logging policy via all four standard estimators — IPS (unbiased,
    high variance), SNIPS (self-normalized), the direct method (reward
    model q̂(a, ctx) from the same log), and doubly-robust
    (DM + importance-weighted residual correction, unbiased if EITHER
    the propensities or q̂ are right). Everything reduces to two bounded
    aggregates (per-arm propensities, per-(arm, ctx) reward model)
    broadcast back onto one scan; no per-row Python, no window. The
    estimator algebra is exact counts and means; one final 6dp round."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
        & F.col("value").isNotNull()
    )
    logged = ev.select(
        F.col("event_type").alias("arm"),
        F.when(F.hour("ts") < 12, 0).otherwise(1).alias("ctx"),
        F.when(F.col("value") > 60, 1.0).otherwise(0.0).alias("r"),
    )
    n = logged.agg(F.count(F.lit(1)).alias("n_all"))
    prop = (
        logged.groupBy("arm")
        .agg(F.count(F.lit(1)).alias("n_a"))
        .crossJoin(F.broadcast(n))
        .select("arm", (F.col("n_a") * 1.0 / F.col("n_all")).alias("p"))
    )
    qhat = logged.groupBy("arm", "ctx").agg(F.avg("r").alias("q"))
    target_arm = F.when(F.col("ctx") == 0, F.lit("click")).otherwise(
        F.lit("view")
    )
    scored = (
        logged.join(F.broadcast(prop), "arm")
        .join(F.broadcast(qhat), ["arm", "ctx"])
        .select(
            "arm",
            "ctx",
            "r",
            "p",
            "q",
            F.when(F.col("arm") == target_arm, 1.0)
            .otherwise(0.0)
            .alias("matched"),
        )
    )
    q_t = qhat.select(
        F.col("arm").alias("t_arm"),
        F.col("ctx").alias("t_ctx"),
        F.col("q").alias("t_q"),
    )
    target_of_ctx = F.when(F.col("ctx") == 0, F.lit("click")).otherwise(
        F.lit("view")
    )
    dm = (
        logged.select("ctx")
        .join(
            F.broadcast(q_t),
            (F.col("t_arm") == target_of_ctx)
            & (F.col("t_ctx") == F.col("ctx")),
        )
        .groupBy("ctx")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("t_q").alias("q"))
        .agg(
            (
                F.sum(F.col("cnt") * F.col("q")) / F.sum("cnt")
            ).alias("dm_value")
        )
    )
    return scored.crossJoin(F.broadcast(dm)).agg(
        F.count(F.lit(1)).cast("long").alias("n_logged"),
        F.round(
            F.avg(F.col("matched") * F.col("r") / F.col("p")), 6
        ).alias("ips_value"),
        F.round(
            F.sum(F.col("matched") * F.col("r") / F.col("p"))
            / F.sum(F.col("matched") / F.col("p")),
            6,
        ).alias("snips_value"),
        F.round(F.max("dm_value"), 6).alias("dm_value"),
        F.round(
            F.max("dm_value")
            + F.avg(
                F.col("matched") / F.col("p") * (F.col("r") - F.col("q"))
            ),
            6,
        ).alias("dr_value"),
    )


@register(
    "quality_gates_kappa",
    oracle="""
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    e AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(unnest(tk)), 1, 15)) AS BIGINT) % 64
               AS bucket
      FROM toks
    ),
    c AS (SELECT doc_id, bucket, count(*) AS n FROM e GROUP BY doc_id, bucket),
    clf AS (
      SELECT doc_id,
             round(1.0 / (1.0 + exp(-(
               sum(n * (((bucket * 2654435761) % 4096) / 4096.0 - 0.5))
                 / sum(n) - 0.05))), 6) > 0.5 AS a
      FROM c GROUP BY doc_id
    ),
    heur AS (
      SELECT doc_id,
             round(least(len(tk) / 50.0, 1.0) * 0.4
               + (1 - least(CASE WHEN length(text) > 0
                     THEN (length(text) - length(regexp_replace(text,
                           '[.,;:!?''"()\\[\\]{}<>-]', '', 'g')))::DOUBLE
                          / length(text) ELSE 0.0 END * 5, 1.0)) * 0.2
               + (1 - least(CASE WHEN length(text) > 0
                     THEN (length(text) - length(regexp_replace(text,
                           '[0-9]', '', 'g')))::DOUBLE / length(text)
                     ELSE 0.0 END * 5, 1.0)) * 0.2
               + least(CASE WHEN len(tk) > 0
                     THEN len(list_filter(tk, x -> list_contains(
                           ['the','and','of','to','is','a'], x)))::DOUBLE
                          / len(tk) ELSE 0.0 END * 4, 1.0) * 0.2,
               4) >= 0.5 AS b
      FROM toks
    ),
    conf AS (
      SELECT count(*) AS n,
             sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n11,
             sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n10,
             sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n01,
             sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS n00
      FROM clf JOIN heur USING (doc_id)
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(n11 AS BIGINT) AS n_both_keep,
           CAST(n10 AS BIGINT) AS n_clf_only,
           CAST(n01 AS BIGINT) AS n_heur_only,
           CAST(n00 AS BIGINT) AS n_both_drop,
           round((n11 + n00) * 1.0 / n, 6) AS observed_agreement,
           round(((n11 + n10) * (n11 + n01)
                  + (n01 + n00) * (n10 + n00)) * 1.0 / (n * n), 6)
             AS expected_agreement,
           round(((n11 + n00) * 1.0 / n
                  - ((n11 + n10) * (n11 + n01)
                     + (n01 + n00) * (n10 + n00)) * 1.0 / (n * n))
                 / (1 - ((n11 + n10) * (n11 + n01)
                         + (n01 + n00) * (n10 + n00)) * 1.0 / (n * n)),
                 6) AS cohens_kappa
    FROM conf
    """,
)
def quality_gates_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between the corpus' two independent quality gates —
    the hashed-bucket linear classifier (`doc_quality_classifier_scores`
    keep flag) and the C4-style heuristic (`doc_quality_scores`
    composite ≥ 0.5): the standard annotator-agreement audit a pipeline
    runs before trusting a learned filter to replace its heuristic
    (κ ≈ 0 means the classifier learned something orthogonal to — or
    instead of — the heuristic; κ near 1 means it is a re-derivation).
    All inputs are exact integer confusion counts from one join of two
    per-doc relations; κ's three divisions are the only float ops, each
    rounded once. One scan per gate, one broadcast-sized join, one
    1-row aggregate — nothing here grows faster than the corpus."""
    from ..operators.text import quality_score, tokens

    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast(
            "bigint"
        )
        % 64
    )
    weight = ((F.col("bucket") * F.lit(2654435761)) % 4096) / F.lit(
        4096.0
    ) - F.lit(0.5)
    c = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    score = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(-(F.sum(F.col("n") * weight) / F.sum("n") - F.lit(0.05)))
    )
    clf = c.groupBy("doc_id").agg(
        (F.round(score, 6) > 0.5).alias("a")
    )
    heur = quality_score(docs).select(
        "doc_id", (F.col("quality_score") >= 0.5).alias("b")
    )
    j = clf.join(heur, "doc_id")
    conf = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("a") & F.col("b")).cast("long")).alias("n11"),
        F.sum((F.col("a") & ~F.col("b")).cast("long")).alias("n10"),
        F.sum((~F.col("a") & F.col("b")).cast("long")).alias("n01"),
        F.sum((~F.col("a") & ~F.col("b")).cast("long")).alias("n00"),
    )
    po = (F.col("n11") + F.col("n00")) / F.col("n")
    pe = (
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    ) / (F.col("n") * F.col("n"))
    return conf.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("n11").cast("long").alias("n_both_keep"),
        F.col("n10").cast("long").alias("n_clf_only"),
        F.col("n01").cast("long").alias("n_heur_only"),
        F.col("n00").cast("long").alias("n_both_drop"),
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("expected_agreement"),
        F.round((po - pe) / (1 - pe), 6).alias("cohens_kappa"),
    )


@register(
    "embedding_silhouette_by_label",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, i AS dim, embedding[i]::DOUBLE AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    cent AS (
      SELECT label, dim, round(avg(val), 4) AS cv
      FROM ex GROUP BY label, dim
    ),
    carr AS (
      SELECT label AS clabel, list(cv ORDER BY dim) AS cvec
      FROM cent GROUP BY label
    ),
    dists AS (
      SELECT e.vec_id, e.label, c.clabel,
             sqrt(list_reduce(
               list_transform(range(1, len(e.embedding) + 1),
                 i -> (e.embedding[i]::DOUBLE - c.cvec[i])
                      * (e.embedding[i]::DOUBLE - c.cvec[i])),
               (a, x) -> a + x)) AS d
      FROM embeddings e CROSS JOIN carr c
    ),
    ab AS (
      SELECT vec_id, label,
             min(CASE WHEN clabel = label THEN d END) AS a,
             min(CASE WHEN clabel <> label THEN d END) AS b
      FROM dists GROUP BY vec_id, label
    ),
    s AS (
      SELECT vec_id, label, (b - a) / greatest(a, b) AS sil FROM ab
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_points,
           round(list_reduce(list(sil ORDER BY vec_id), (x, y) -> x + y)
                 / count(*), 6) AS mean_silhouette,
           CAST(sum(CASE WHEN sil < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_misassigned
    FROM s GROUP BY label
    """,
)
def embedding_silhouette_by_label(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Simplified silhouette per label over the embedding table (the
    centroid-based silhouette of Hruschka et al. — a(i) = distance to
    the OWN label's centroid, b(i) = distance to the nearest other
    centroid, s = (b−a)/max(a,b)): the label-quality score that tells a
    curation pipeline which class clusters are coherent and how many
    points sit closer to a foreign centroid (n_misassigned — relabel or
    drop candidates). Exact-parity float discipline: centroids are
    per-dim means ROUNDED to 4 decimals (kills summation-order ULPs),
    every distance folds its 64 dims in index order with plain
    multiplies (no pow), sqrt is IEEE-exact, and the per-label mean
    folds in vec_id order. Scale shape: the centroid relation is
    labels×dims (tiny, broadcast); the point pass is one narrow
    projection per point×centroid — never point×point like the true
    silhouette, which is quadratic and dies first at 100 TB."""
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "val"),
    ).select(
        "vec_id", "label", "dim", F.col("val").cast("double").alias("val")
    )
    cent = ex.groupBy("label", "dim").agg(
        F.round(F.avg("val"), 4).alias("cv")
    )
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cv"))),
            lambda st: st["cv"],
        ).alias("cvec")
    ).withColumnRenamed("label", "clabel")
    pts = e.crossJoin(F.broadcast(carr))
    diff = lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)
    d = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("embedding"), F.col("cvec"), diff),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    dists = pts.select("vec_id", "label", "clabel", d.alias("d"))
    ab = dists.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), F.col("d"))).alias(
            "a"
        ),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d"))).alias(
            "b"
        ),
    )
    sil = (F.col("b") - F.col("a")) / F.greatest("a", "b")
    s = ab.select("vec_id", "label", sil.alias("sil"))
    return s.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.round(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("vec_id", "sil"))
                ),
                F.lit(0.0),
                lambda acc, st: acc + st["sil"],
            )
            / F.count(F.lit(1)),
            6,
        ).alias("mean_silhouette"),
        F.sum((F.col("sil") < 0).cast("long")).alias("n_misassigned"),
    )
