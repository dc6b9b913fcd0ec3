"""Contract queries: model/data diagnostics wave.

The families already in the registry FIT things (OLS trends, smoothers,
classifiers, forecasts); this wave adds the DIAGNOSTIC layer a pipeline
runs before trusting them: a portmanteau white-noise test on residual
structure (Ljung–Box), a count-model overdispersion gate (Poisson vs
negative-binomial dispatch), a proper-score decomposition
(Brier = uncertainty + reliability − resolution), a log-log demand
elasticity fit, a sharp regression-discontinuity effect, and an AMS
F2 sketch (the classic second-moment estimator behind join-size
planning). Every query is closed-form from one or two partial-aggregate
passes — no iteration, no collect, no Python row path — so each one
survives a 1000-executor scale-up unchanged: the shuffle carries a few
aggregate rows per group, never the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .core import register, _t


@register(
    "ljung_box_white_noise",
    oracle="""
    WITH m AS (
      SELECT event_type, sum(value) / count(*) AS ybar
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    d AS (
      SELECT e.event_type, e.ts, e.event_id, e.value - m.ybar AS d
      FROM events e JOIN m USING (event_type)
      WHERE e.value IS NOT NULL
    ),
    l AS (
      SELECT event_type, d,
             lag(d, 1) OVER w AS d1,
             lag(d, 2) OVER w AS d2,
             lag(d, 3) OVER w AS d3
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    s AS (
      SELECT event_type, count(*) AS n, sum(d * d) AS s0,
             sum(d * d1) AS s1, sum(d * d2) AS s2, sum(d * d3) AS s3
      FROM l GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_obs,
           round(s1 / s0, 6) AS r1,
           round(s2 / s0, 6) AS r2,
           round(s3 / s0, 6) AS r3,
           round(n * (n + 2.0) * (
             (s1 / s0) * (s1 / s0) / (n - 1)
             + (s2 / s0) * (s2 / s0) / (n - 2)
             + (s3 / s0) * (s3 / s0) / (n - 3)), 4) AS lb_q3,
           n * (n + 2.0) * (
             (s1 / s0) * (s1 / s0) / (n - 1)
             + (s2 / s0) * (s2 / s0) / (n - 2)
             + (s3 / s0) * (s3 / s0) / (n - 3)) > 7.8147 AS reject_white_noise_05
    FROM s
    """,
)
def ljung_box_white_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau test per event type (lags 1–3): is there ANY
    autocorrelation structure left in the value series, jointly across
    the first k lags?  Q = n(n+2)·Σ_k r_k²/(n−k) ~ χ²(k) under white
    noise; Q > 7.8147 (the 5% χ²₃ critical value) rejects. This is the
    residual gate for the registry's forecasting family (EWMA / Holt /
    Kalman / ADF): a model whose residuals reject white noise is leaving
    signal on the table. Two passes only — one tiny groupBy for the per
    type mean (broadcast back), one window-lag pass collapsing to five
    raw sums per type — so the shuffle payload is O(#types), not O(rows),
    at any scale."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    m = ev.groupBy("event_type").agg(
        (F.sum("value") / F.count(F.lit(1))).alias("ybar")
    )
    d = ev.join(F.broadcast(m), "event_type").select(
        "event_type",
        "ts",
        "event_id",
        (F.col("value") - F.col("ybar")).alias("d"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = d.select(
        "event_type",
        "d",
        F.lag("d", 1).over(w).alias("d1"),
        F.lag("d", 2).over(w).alias("d2"),
        F.lag("d", 3).over(w).alias("d3"),
    )
    s = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("d") * F.col("d")).alias("s0"),
        F.sum(F.col("d") * F.col("d1")).alias("s1"),
        F.sum(F.col("d") * F.col("d2")).alias("s2"),
        F.sum(F.col("d") * F.col("d3")).alias("s3"),
    )
    r1 = F.col("s1") / F.col("s0")
    r2 = F.col("s2") / F.col("s0")
    r3 = F.col("s3") / F.col("s0")
    n = F.col("n")
    q = (
        n
        * (n + 2.0)
        * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2) + r3 * r3 / (n - 3))
    )
    return s.select(
        "event_type",
        n.cast("long").alias("n_obs"),
        F.round(r1, 6).alias("r1"),
        F.round(r2, 6).alias("r2"),
        F.round(r3, 6).alias("r3"),
        F.round(q, 4).alias("lb_q3"),
        (q > 7.8147).alias("reject_white_noise_05"),
    )


@register(
    "event_count_overdispersion",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    s AS (
      SELECT event_type, count(*) AS n, sum(c) AS sc,
             sum(c * c) AS scc
      FROM daily GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           round(sc * 1.0 / n, 6) AS mean_daily,
           round((scc - sc * 1.0 * sc / n) / (n - 1), 6) AS var_daily,
           round(((scc - sc * 1.0 * sc / n) / (n - 1)) / (sc * 1.0 / n), 6)
             AS dispersion_index,
           round(((n - 1) * ((scc - sc * 1.0 * sc / n) / (n - 1))
                    / (sc * 1.0 / n) - (n - 1))
                 / sqrt(2.0 * (n - 1)), 4) AS z_stat,
           ((n - 1) * ((scc - sc * 1.0 * sc / n) / (n - 1))
              / (sc * 1.0 / n) - (n - 1))
             / sqrt(2.0 * (n - 1)) > 1.645 AS overdispersed_05
    FROM s
    """,
)
def event_count_overdispersion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Overdispersion gate for daily event counts per type: a Poisson
    arrival model demands variance ≈ mean; real traffic (bursts,
    campaigns, outages) is overdispersed and needs a negative-binomial
    (or at least quasi-Poisson) model. The chi-square dispersion test
    statistic (n−1)·s²/m̄ ~ χ²(n−1) is normalized to a one-sided z via
    the standard (χ² − df)/√(2df) approximation; z > 1.645 rejects
    equidispersion at 5%. Two cheap aggregations: daily counts (bounded
    by types × days) then three raw sums per type — the choose-your-
    count-model dispatch that precedes the anomaly/forecast queries,
    priced at two tiny shuffles regardless of data volume."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    n = F.col("n")
    mean = F.col("sc") * 1.0 / n
    var = (F.col("scc") - F.col("sc") * 1.0 * F.col("sc") / n) / (n - 1)
    disp = var / mean
    z = ((n - 1) * disp - (n - 1)) / F.sqrt(2.0 * (n - 1))
    return s.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.round(mean, 6).alias("mean_daily"),
        F.round(var, 6).alias("var_daily"),
        F.round(disp, 6).alias("dispersion_index"),
        F.round(z, 4).alias("z_stat"),
        (z > 1.645).alias("overdispersed_05"),
    )


@register(
    "brier_score_decomposition",
    oracle="""
    WITH scored AS (
      SELECT 1.0 / (1.0 + exp(-(value - 50.0) / 25.0)) AS p,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS o
      FROM events WHERE value IS NOT NULL
    ),
    binned AS (
      SELECT LEAST(CAST(floor(p * 10) AS INT), 9) AS b, p, o FROM scored
    ),
    per_bin AS (
      SELECT b, count(*) AS nb, sum(p) AS sp, sum(o) AS so
      FROM binned GROUP BY b
    ),
    tot AS (
      SELECT sum(nb) AS n, sum(so) AS so_all FROM per_bin
    ),
    parts AS (
      SELECT
        sum(nb * (sp / nb) * (sp / nb) - 2 * (sp / nb) * so + so)
          / any_value(g.n) AS bs,
        sum(nb * ((sp / nb) - (so / nb)) * ((sp / nb) - (so / nb)))
          / any_value(g.n) AS rel,
        sum(nb * ((so / nb) - (g.so_all / g.n))
               * ((so / nb) - (g.so_all / g.n))) / any_value(g.n) AS res,
        any_value((g.so_all / g.n) * (1.0 - g.so_all / g.n)) AS unc
      FROM per_bin CROSS JOIN tot g
    )
    SELECT round(bs, 6) AS brier_score,
           round(rel, 6) AS reliability,
           round(res, 6) AS resolution,
           round(unc, 6) AS uncertainty,
           abs(bs - (unc + rel - res)) < 1e-9 AS decomposition_closes
    FROM parts
    """,
)
def brier_score_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Murphy decomposition of the Brier score — BS = uncertainty +
    reliability − resolution — for a deterministic logistic forecast of
    "this event is a purchase" from the value column, binned into 10
    probability buckets with the bin-mean forecast (which makes the
    decomposition an exact algebraic identity, asserted in-row as
    ``decomposition_closes``). Reliability says how miscalibrated the
    forecast is; resolution says how much it separates outcomes; the
    identity check is the self-test. One row-level projection collapses
    to ≤10 bin aggregates (n_b, Σp, Σo — and since o is binary,
    Σ(p̄_b − o)² within a bin is closed-form n_b·p̄_b² − 2·p̄_b·Σo + Σo,
    no second data pass), then a 10-row rollup. Shuffle payload: 10
    rows, at any scale."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    p = 1.0 / (1.0 + F.exp(-(F.col("value") - 50.0) / 25.0))
    o = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    binned = ev.select(
        F.least(F.floor(p * 10).cast("int"), F.lit(9)).alias("b"),
        p.alias("p"),
        o.alias("o"),
    )
    per_bin = binned.groupBy("b").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("p").alias("sp"),
        F.sum("o").alias("so"),
    )
    glob = per_bin.agg(
        F.sum("nb").alias("n"), F.sum("so").alias("so_all")
    )
    pb = F.col("sp") / F.col("nb")
    ob = F.col("so") / F.col("nb")
    obar = F.col("so_all") / F.col("n")
    joined = per_bin.crossJoin(F.broadcast(glob))
    parts = joined.agg(
        (
            F.sum(
                F.col("nb") * pb * pb
                - 2 * pb * F.col("so")
                + F.col("so")
            )
            / F.first("n")
        ).alias("bs"),
        (
            F.sum(F.col("nb") * (pb - ob) * (pb - ob)) / F.first("n")
        ).alias("rel"),
        (
            F.sum(F.col("nb") * (ob - obar) * (ob - obar)) / F.first("n")
        ).alias("res"),
        F.first(obar * (1.0 - obar)).alias("unc"),
    )
    return parts.select(
        F.round("bs", 6).alias("brier_score"),
        F.round("rel", 6).alias("reliability"),
        F.round("res", 6).alias("resolution"),
        F.round("unc", 6).alias("uncertainty"),
        (
            F.abs(
                F.col("bs")
                - (F.col("unc") + F.col("rel") - F.col("res"))
            )
            < 1e-9
        ).alias("decomposition_closes"),
    )


@register(
    "price_elasticity_per_brand",
    oracle="""
    WITH obs AS (
      SELECT p.p_brand,
             ln(l.l_quantity) AS y,
             ln(l.l_extendedprice / l.l_quantity) AS x
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    ),
    s AS (
      SELECT p_brand, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      FROM obs GROUP BY p_brand
    )
    SELECT p_brand,
           CAST(n AS BIGINT) AS n_lines,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS elasticity,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS r_squared
    FROM s
    """,
)
def price_elasticity_per_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Log-log price elasticity of demand per part brand: OLS slope of
    ln(quantity) on ln(unit price) over every lineitem, brand by brand —
    the classic constant-elasticity fit behind pricing and what-if
    revenue models (a slope near −1 means revenue-neutral price moves).
    The fact-side pass joins lineitem to the part dim (broadcast — the
    dim is tiny relative to the fact table at every scale factor) and
    collapses immediately to six raw sums per brand; slope and R² are
    closed-form from those partials. One broadcast join + one partial
    aggregation: the shuffle carries #brands rows, so the plan is
    unchanged at 100 TB."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    obs = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select(
        "p_brand",
        F.log(F.col("l_quantity")).alias("y"),
        F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("x"),
    )
    s = obs.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (
        (n * sxy - sx * sy)
        * (n * sxy - sx * sy)
        / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    )
    return s.select(
        "p_brand",
        n.cast("long").alias("n_lines"),
        F.round(slope, 6).alias("elasticity"),
        F.round(r2, 6).alias("r_squared"),
    )


@register(
    "purchase_rd_effect_at_50",
    oracle="""
    WITH obs AS (
      SELECT value - 50.0 AS v,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y,
             value >= 50.0 AS rhs
      FROM events
      WHERE value IS NOT NULL AND value >= 25.0 AND value <= 75.0
    ),
    s AS (
      SELECT
        count(*) FILTER (WHERE NOT rhs) AS nl,
        sum(v)  FILTER (WHERE NOT rhs) AS sxl,
        sum(y)  FILTER (WHERE NOT rhs) AS syl,
        sum(v * v) FILTER (WHERE NOT rhs) AS sxxl,
        sum(v * y) FILTER (WHERE NOT rhs) AS sxyl,
        count(*) FILTER (WHERE rhs) AS nr,
        sum(v)  FILTER (WHERE rhs) AS sxr,
        sum(y)  FILTER (WHERE rhs) AS syr,
        sum(v * v) FILTER (WHERE rhs) AS sxxr,
        sum(v * y) FILTER (WHERE rhs) AS sxyr
      FROM obs
    )
    SELECT CAST(nl AS BIGINT) AS n_left,
           CAST(nr AS BIGINT) AS n_right,
           round((syl - (nl * sxyl - sxl * syl)
                    / (nl * sxxl - sxl * sxl) * sxl) / nl, 6)
             AS alpha_left,
           round((syr - (nr * sxyr - sxr * syr)
                    / (nr * sxxr - sxr * sxr) * sxr) / nr, 6)
             AS alpha_right,
           round((syr - (nr * sxyr - sxr * syr)
                    / (nr * sxxr - sxr * sxr) * sxr) / nr
                 - (syl - (nl * sxyl - sxl * syl)
                      / (nl * sxxl - sxl * sxl) * sxl) / nl, 6)
             AS rd_effect
    FROM s
    """,
)
def purchase_rd_effect_at_50(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sharp regression-discontinuity estimate at the value = 50 cutoff:
    within a ±25 bandwidth, fit a local linear probability model of
    "purchase" on the centered running variable separately on each side,
    and report the jump in the fitted intercepts at the cutoff — the
    canonical quasi-experimental design when treatment switches on at a
    threshold (free-shipping minimums, credit-score cutoffs). Both side
    fits come from ONE single-pass conditional aggregation (FILTER-ed
    raw sums, ten numbers total) followed by closed-form OLS intercepts
    α = (Σy − β·Σx)/n — no second pass, no per-side subquery scans, one
    shuffle carrying a single row."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & (F.col("value") >= 25.0)
        & (F.col("value") <= 75.0)
    )
    v = F.col("value") - 50.0
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    rhs = F.col("value") >= 50.0
    obs = ev.select(v.alias("v"), y.alias("y"), rhs.alias("rhs"))

    def side(cond, suffix):
        c = cond if suffix == "r" else ~cond
        return [
            F.count(F.when(c, F.lit(1))).alias(f"n{suffix}"),
            F.sum(F.when(c, F.col("v"))).alias(f"sx{suffix}"),
            F.sum(F.when(c, F.col("y"))).alias(f"sy{suffix}"),
            F.sum(F.when(c, F.col("v") * F.col("v"))).alias(
                f"sxx{suffix}"
            ),
            F.sum(F.when(c, F.col("v") * F.col("y"))).alias(
                f"sxy{suffix}"
            ),
        ]

    s = obs.agg(*(side(F.col("rhs"), "l") + side(F.col("rhs"), "r")))

    def alpha(sfx):
        n, sx, sy = F.col(f"n{sfx}"), F.col(f"sx{sfx}"), F.col(f"sy{sfx}")
        sxx, sxy = F.col(f"sxx{sfx}"), F.col(f"sxy{sfx}")
        beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        return (sy - beta * sx) / n

    return s.select(
        F.col("nl").cast("long").alias("n_left"),
        F.col("nr").cast("long").alias("n_right"),
        F.round(alpha("l"), 6).alias("alpha_left"),
        F.round(alpha("r"), 6).alias("alpha_right"),
        F.round(alpha("r") - alpha("l"), 6).alias("rd_effect"),
    )


@register(
    "ams_f2_user_sketch",
    oracle="""
    WITH exact AS (
      SELECT sum(n * n) AS f2
      FROM (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
    ),
    fan AS (
      SELECT j.rep,
             CASE WHEN CAST(('0x' || substring(
                      md5(j.rep || ':' || CAST(e.user_id AS VARCHAR)),
                      1, 1)) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS sign
      FROM events e CROSS JOIN (
        SELECT CAST(unnest(range(32)) AS VARCHAR) AS rep) j
    ),
    counters AS (
      SELECT rep, sum(sign) AS z FROM fan GROUP BY rep
    ),
    est AS (
      SELECT sum(z * 1.0 * z) / count(*) AS f2_hat FROM counters
    )
    SELECT CAST(exact.f2 AS BIGINT) AS exact_f2,
           round(est.f2_hat, 2) AS ams_estimate,
           round(abs(est.f2_hat - exact.f2) / exact.f2, 6) AS rel_error,
           abs(est.f2_hat - exact.f2) / exact.f2 < 1.0 AS within_bound
    FROM exact CROSS JOIN est
    """,
)
def ams_f2_user_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon–Matias–Szegedy) second-moment sketch over the event
    stream's user_id column, checked against the exact F2 = Σ n_u² — the
    self-join size that query planners need for join-cardinality and
    skew estimates without a full groupBy on the key. 32 independent
    ±1 hash counters (sign = md5 parity of rep:user, identical
    expression in both engines, so the estimate itself is deterministic
    and value-checked, not just bounded): each counter is a single SUM,
    the estimate is the mean of their squares, and the standard AMS
    variance bound 2·F2²/32 puts the relative error well inside the
    asserted 1.0. The 32× fan-out collapses immediately to map-side
    partial sums — the shuffle carries 32 rows per partition at any
    scale, the same pattern as bootstrap_value_mean."""
    ev = _t(spark, sf_dir, "events").select("user_id")
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * F.col("n")).alias("f2"))
    )
    fan = ev.select(
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("rep"),
        "user_id",
    ).select(
        "rep",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("rep").cast("string"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    1,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("sign"),
    )
    counters = fan.groupBy("rep").agg(F.sum("sign").alias("z"))
    est = counters.agg(
        (F.sum(F.col("z") * 1.0 * F.col("z")) / F.count(F.lit(1))).alias(
            "f2_hat"
        )
    )
    joined = exact.crossJoin(F.broadcast(est))
    rel = F.abs(F.col("f2_hat") - F.col("f2")) / F.col("f2")
    return joined.select(
        F.col("f2").cast("long").alias("exact_f2"),
        F.round("f2_hat", 2).alias("ams_estimate"),
        F.round(rel, 6).alias("rel_error"),
        (rel < 1.0).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random-projection audit
# ---------------------------------------------------------------------------

import hashlib as _hashlib

_RP_IN, _RP_OUT = 64, 16


def _rp_sign(j: int, i: int) -> float:
    """Deterministic ±1 sign for projection row j, input dim i (md5
    parity — content-addressed, so both engines and every executor see
    the identical matrix with zero coordination)."""
    h = _hashlib.md5(f"{j}:{i}".encode()).hexdigest()
    return 1.0 if int(h[0], 16) % 2 == 0 else -1.0


#: 16×64 sign matrix, a module-level constant (model state, not data).
_RP_SIGNS = [
    [_rp_sign(j, i) for i in range(_RP_IN)] for j in range(_RP_OUT)
]


def _rp_sql_rows() -> str:
    comps = []
    for row in _RP_SIGNS:
        lits = ", ".join(str(s) for s in row)
        comps.append(
            f"list_dot_product(embedding::DOUBLE[], [{lits}]::DOUBLE[])"
        )
    return ",\n             ".join(comps)


@register(
    "embedding_rp_projection_recall",
    oracle=f"""
    WITH proj AS (
      SELECT vec_id,
             [{_rp_sql_rows()}]::DOUBLE[] AS p
      FROM embeddings
    ),
    q AS (SELECT * FROM embeddings WHERE vec_id < 20),
    full_sc AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]), 6) AS s
      FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
    ),
    rp_sc AS (
      SELECT qp.vec_id AS query_id, cp.vec_id AS neighbor_id,
             round(list_cosine_similarity(qp.p, cp.p), 6) AS s
      FROM proj qp JOIN proj cp ON qp.vec_id <> cp.vec_id
      WHERE qp.vec_id < 20
    ),
    full_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, neighbor_id) AS rn
        FROM full_sc) WHERE rn <= 10
    ),
    rp_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, neighbor_id) AS rn
        FROM rp_sc) WHERE rn <= 10
    )
    SELECT f.query_id,
           CAST(count(t.neighbor_id) AS BIGINT) AS n_common,
           round(count(t.neighbor_id) / 10.0, 4) AS recall_at_10
    FROM full_top f
    LEFT JOIN rp_top t ON t.query_id = f.query_id
                      AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
)
def embedding_rp_projection_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Johnson–Lindenstrauss audit: top-10 cosine recall of a 64→16
    ±1 random-sign projection (Achlioptas-style, the sparse-friendly JL
    construction) against the full-dimension ranking, per query vector —
    the measurement that prices a 4× cheaper projected first-stage index
    before committing to it (the sibling of `embedding_truncation_recall`,
    which audits PREFIX truncation; sign projection mixes all dims and
    typically retains more geometry at the same budget). The sign matrix
    is a 16×64 content-hashed constant, so the projection is one
    zip-with/fold per component with zero data movement; both rankings
    use the exact brute-force operator, rounded + id-tie-broken so the
    ranking is engine-identical."""
    from ..operators.similarity import cosine_topk_bruteforce

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    def project(vec):
        comps = [
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(s) for s in row]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for row in _RP_SIGNS
        ]
        return F.array(*comps)

    q = e.filter(F.col("vec_id") < 20)
    full_top = cosine_topk_bruteforce(e, q, k=10).select(
        "query_id", "neighbor_id"
    )
    proj = e.select("vec_id", project(F.col("embedding")).alias("embedding"))
    projq = proj.filter(F.col("vec_id") < 20)
    rp_top = cosine_topk_bruteforce(proj, projq, k=10).select(
        F.col("query_id").alias("tq"), F.col("neighbor_id").alias("tn")
    )
    joined = full_top.join(
        rp_top,
        (F.col("query_id") == F.col("tq"))
        & (F.col("neighbor_id") == F.col("tn")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("tn").cast("long").alias("n_common"),
        F.round(F.count("tn") / 10.0, 4).alias("recall_at_10"),
    )


@register(
    "purchase_rate_trend_test",
    oracle="""
    WITH obs AS (
      SELECT GREATEST(LEAST(CAST(floor(value / 10) AS INT), 9), 0) AS b,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r
      FROM events WHERE value IS NOT NULL
    ),
    per_bin AS (
      SELECT b, count(*) AS nb, sum(r) AS rb FROM obs GROUP BY b
    ),
    s AS (
      SELECT sum(nb) AS n, sum(rb) AS r,
             sum(nb * b) AS sx, sum(nb * b * b) AS sxx,
             sum(rb * b) AS srx
      FROM per_bin
    )
    SELECT CAST(n AS BIGINT) AS n_total,
           CAST(r AS BIGINT) AS n_purchases,
           round((srx - r * 1.0 * sx / n)
                 / sqrt((r * 1.0 / n) * (1.0 - r * 1.0 / n)
                        * (sxx - sx * 1.0 * sx / n)), 4) AS z_stat,
           (srx - r * 1.0 * sx / n)
             / sqrt((r * 1.0 / n) * (1.0 - r * 1.0 / n)
                    * (sxx - sx * 1.0 * sx / n)) > 1.645
             AS increasing_trend_05
    FROM s
    """,
)
def purchase_rate_trend_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cochran–Armitage trend test: does the purchase RATE increase
    monotonically across ordered value bins (fixed-width deciles of the
    value column)? The test statistic T = Σr_b·x_b − R·Σn_b·x_b/N over
    its null variance (R/N)(1−R/N)(Σn_b·x_b² − (Σn_b·x_b)²/N) is the
    standard dose-response z — strictly more powerful than the χ²
    independence test when the alternative is ordered, which is exactly
    the funnel question ("do higher-value events convert more?"). One
    row-level pass to ≤10 bin aggregates, then a 10-row rollup: shuffle
    payload is 10 rows at any scale, and every sum is integer until the
    final closed-form division."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = F.greatest(
        F.least(F.floor(F.col("value") / 10).cast("int"), F.lit(9)),
        F.lit(0),
    )
    r = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    per_bin = ev.select(b.alias("b"), r.alias("r")).groupBy("b").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("r").alias("rb")
    )
    s = per_bin.agg(
        F.sum("nb").alias("n"),
        F.sum("rb").alias("r"),
        F.sum(F.col("nb") * F.col("b")).alias("sx"),
        F.sum(F.col("nb") * F.col("b") * F.col("b")).alias("sxx"),
        F.sum(F.col("rb") * F.col("b")).alias("srx"),
    )
    n, rr = F.col("n"), F.col("r")
    t = F.col("srx") - rr * 1.0 * F.col("sx") / n
    var = (
        (rr * 1.0 / n)
        * (1.0 - rr * 1.0 / n)
        * (F.col("sxx") - F.col("sx") * 1.0 * F.col("sx") / n)
    )
    z = t / F.sqrt(var)
    return s.select(
        n.cast("long").alias("n_total"),
        rr.cast("long").alias("n_purchases"),
        F.round(z, 4).alias("z_stat"),
        (z > 1.645).alias("increasing_trend_05"),
    )


@register(
    "boxcox_lambda_grid",
    oracle="""
    WITH grid AS (
      SELECT CAST(unnest([-1.0, -0.5, 0.0, 0.5, 1.0, 2.0]) AS DOUBLE)
        AS lam
    ),
    obs AS (
      SELECT g.lam,
             CASE WHEN g.lam = 0.0 THEN ln(value)
                  ELSE (pow(value, g.lam) - 1.0) / g.lam END AS t,
             ln(value) AS ly
      FROM events CROSS JOIN grid g
      WHERE value IS NOT NULL AND value > 0
    ),
    s AS (
      SELECT lam, count(*) AS n, sum(t) AS st, sum(t * t) AS stt,
             sum(ly) AS sly
      FROM obs GROUP BY lam
    ),
    ll AS (
      SELECT lam, n,
             -n / 2.0 * ln((stt - st * st / n) / n)
               + (lam - 1.0) * sly AS loglik
      FROM s
    )
    SELECT round(lam, 1) AS lam,
           CAST(n AS BIGINT) AS n_obs,
           round(loglik, 4) AS profile_loglik,
           loglik = max(loglik) OVER () AS is_best
    FROM ll
    """,
)
def boxcox_lambda_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box–Cox variance-stabilization selection over a fixed λ grid
    (−1, −0.5, 0, 0.5, 1, 2): for each candidate the profile Gaussian
    log-likelihood −n/2·ln(σ̂²_λ) + (λ−1)·Σln y is closed-form from
    three partial-aggregated sums of the transformed values, and the
    argmax is the transform a forecasting/regression pipeline should
    apply before fitting. The 6× grid fan-out collapses immediately to
    map-side partials (the bootstrap/AMS pattern) — shuffle payload is
    6 rows per partition at any scale, and the winner flag is a window
    max over the 6-row grid relation."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    grid = [-1.0, -0.5, 0.0, 0.5, 1.0, 2.0]
    fan = ev.select(
        F.explode(F.array(*[F.lit(x) for x in grid])).alias("lam"),
        "value",
    ).select(
        "lam",
        F.when(F.col("lam") == 0.0, F.log("value"))
        .otherwise(
            (F.pow(F.col("value"), F.col("lam")) - 1.0) / F.col("lam")
        )
        .alias("t"),
        F.log("value").alias("ly"),
    )
    s = fan.groupBy("lam").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum("ly").alias("sly"),
    )
    n = F.col("n")
    loglik = -n / 2.0 * F.log(
        (F.col("stt") - F.col("st") * F.col("st") / n) / n
    ) + (F.col("lam") - 1.0) * F.col("sly")
    ll = s.select("lam", n.alias("n"), loglik.alias("loglik"))
    w = Window.partitionBy()
    return ll.select(
        F.round("lam", 1).alias("lam"),
        F.col("n").cast("long").alias("n_obs"),
        F.round("loglik", 4).alias("profile_loglik"),
        (F.col("loglik") == F.max("loglik").over(w)).alias("is_best"),
    )


@register(
    "hashing_collision_audit",
    oracle="""
    WITH keys AS (SELECT DISTINCT user_id FROM events),
    hashed AS (
      SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 1024 AS bucket
      FROM keys
    ),
    s AS (
      SELECT (SELECT count(*) FROM keys) AS n_keys,
             count(DISTINCT bucket) AS occupied,
             max(cnt) AS max_load
      FROM (SELECT bucket, count(*) AS cnt FROM hashed GROUP BY bucket)
    )
    SELECT CAST(n_keys AS BIGINT) AS n_keys,
           CAST(occupied AS BIGINT) AS n_buckets_occupied,
           round(1024.0 * (1.0 - pow(1023.0 / 1024.0, n_keys)), 4)
             AS expected_occupied,
           round(1.0 - occupied * 1.0 / n_keys, 6) AS collision_rate,
           CAST(max_load AS BIGINT) AS max_bucket_load,
           abs(occupied - 1024.0 * (1.0 - pow(1023.0 / 1024.0, n_keys)))
             <= 0.15 * 1024.0 * (1.0 - pow(1023.0 / 1024.0, n_keys))
             AS matches_birthday_model
    FROM s
    """,
)
def hashing_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing collision audit for a 1024-bucket hash space over
    the distinct user keys: observed occupied buckets vs the
    birthday-model expectation B·(1 − (1−1/B)^K), the collision rate a
    hashed-feature model silently absorbs, and the max bucket load (the
    skew a hashed shuffle key would inherit). The ±15%% agreement flag
    is the canary for a BROKEN hash (a biased hash under-occupies).
    Same md5 convention as the registry's split buckets, so both
    engines agree exactly. One distinct + one 1024-group aggregate —
    bounded relations all the way down."""
    ev = _t(spark, sf_dir, "events")
    keys = ev.select("user_id").distinct()
    hashed = keys.select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % 1024
        ).alias("bucket")
    )
    per_bucket = hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    nk = keys.agg(F.count(F.lit(1)).alias("n_keys"))
    s = per_bucket.agg(
        F.count(F.lit(1)).alias("occupied"),
        F.max("cnt").alias("max_load"),
    ).crossJoin(F.broadcast(nk))
    expected = 1024.0 * (
        1.0 - F.pow(F.lit(1023.0 / 1024.0), F.col("n_keys"))
    )
    return s.select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("occupied").cast("long").alias("n_buckets_occupied"),
        F.round(expected, 4).alias("expected_occupied"),
        F.round(
            1.0 - F.col("occupied") * 1.0 / F.col("n_keys"), 6
        ).alias("collision_rate"),
        F.col("max_load").cast("long").alias("max_bucket_load"),
        (
            F.abs(F.col("occupied") - expected) <= 0.15 * expected
        ).alias("matches_birthday_model"),
    )


@register(
    "best_split_changepoint_per_type",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(value) / count(*) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    pre AS (
      SELECT event_type, day, y,
             row_number() OVER w AS i,
             sum(y) OVER w AS p,
             sum(y * y) OVER w AS q,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(y) OVER (PARTITION BY event_type) AS p_n,
             sum(y * y) OVER (PARTITION BY event_type) AS q_n
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    gains AS (
      SELECT event_type, day, i, n, p, p_n,
             (q_n - p_n * p_n / n)
               - ((q - p * p / i)
                  + ((q_n - q) - (p_n - p) * (p_n - p) / (n - i)))
               AS gain,
             q_n - p_n * p_n / n AS sse_total
      FROM pre WHERE i < n
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY gain DESC, day) AS rk
      FROM gains
    )
    SELECT event_type, day AS split_day,
           CAST(i AS BIGINT) AS n_left,
           CAST(n - i AS BIGINT) AS n_right,
           round(p / i, 6) AS mean_left,
           round((p_n - p) / (n - i), 6) AS mean_right,
           round(gain, 6) AS sse_gain,
           round(gain / sse_total, 6) AS gain_ratio
    FROM best WHERE rk = 1
    """,
)
def best_split_changepoint_per_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binary-segmentation changepoint (first split) on each type's daily
    mean-value series: the split day that maximizes the SSE reduction of
    a two-segment piecewise-constant fit — the greedy step that CART,
    binary segmentation, and PELT all build on, and the complement to
    the registry's CUSUM query (CUSUM thresholds cumulative drift; this
    finds the single best structural break and its explained-variance
    share). Everything is prefix-sum algebra over the bounded
    (type × day) relation: one window pass produces (P_i, Q_i, totals),
    each candidate split's gain is closed-form, and a per-type rank
    picks the argmax. The fact scan is one partial-aggregated groupBy;
    windows never touch raw events."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg((F.sum("value") / F.count(F.lit(1))).alias("y"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "day",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("i"),
        F.sum("y").over(w).alias("p"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("q"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("y").over(wp).alias("p_n"),
        F.sum(F.col("y") * F.col("y")).over(wp).alias("q_n"),
    )
    i, n = F.col("i"), F.col("n")
    p, q = F.col("p"), F.col("q")
    pn, qn = F.col("p_n"), F.col("q_n")
    sse_total = qn - pn * pn / n
    gain = sse_total - (
        (q - p * p / i) + ((qn - q) - (pn - p) * (pn - p) / (n - i))
    )
    gains = pre.filter(i < n).select(
        "event_type",
        "day",
        "i",
        "n",
        "p",
        "p_n",
        gain.alias("gain"),
        sse_total.alias("sse_total"),
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.col("gain").desc(), "day"
        )
    )
    best = gains.withColumn("rk", rk).filter(F.col("rk") == 1)
    return best.select(
        "event_type",
        F.col("day").alias("split_day"),
        F.col("i").cast("long").alias("n_left"),
        (F.col("n") - F.col("i")).cast("long").alias("n_right"),
        F.round(F.col("p") / F.col("i"), 6).alias("mean_left"),
        F.round(
            (F.col("p_n") - F.col("p")) / (F.col("n") - F.col("i")), 6
        ).alias("mean_right"),
        F.round("gain", 6).alias("sse_gain"),
        F.round(F.col("gain") / F.col("sse_total"), 6).alias(
            "gain_ratio"
        ),
    )


@register(
    "lorenz_value_concentration",
    oracle="""
    WITH totals AS (
      SELECT user_id, round(sum(value), 6) AS tv
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    bounds AS (
      SELECT quantile_cont(tv, [0.1, 0.2, 0.3, 0.4, 0.5,
                                0.6, 0.7, 0.8, 0.9]) AS b
      FROM totals
    ),
    binned AS (
      SELECT t.tv,
             1 + CASE WHEN t.tv > b.b[9] THEN 9
                      WHEN t.tv > b.b[8] THEN 8
                      WHEN t.tv > b.b[7] THEN 7
                      WHEN t.tv > b.b[6] THEN 6
                      WHEN t.tv > b.b[5] THEN 5
                      WHEN t.tv > b.b[4] THEN 4
                      WHEN t.tv > b.b[3] THEN 3
                      WHEN t.tv > b.b[2] THEN 2
                      WHEN t.tv > b.b[1] THEN 1
                      ELSE 0 END AS decile
      FROM totals t CROSS JOIN bounds b
    ),
    per AS (
      SELECT decile, count(*) AS n_users, sum(tv) AS v
      FROM binned GROUP BY decile
    ),
    cum AS (
      SELECT decile, n_users, v,
             sum(v) OVER (ORDER BY decile) AS cum_v,
             sum(v) OVER () AS tot_v,
             sum(n_users) OVER (ORDER BY decile) AS cum_n,
             sum(n_users) OVER () AS tot_n
      FROM per
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(n_users AS BIGINT) AS n_users,
           round(cum_n * 1.0 / tot_n, 6) AS cum_user_share,
           round(cum_v / tot_v, 6) AS cum_value_share
    FROM cum
    """,
)
def lorenz_value_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lorenz concentration curve of per-user value totals WITHOUT a
    global sort: decile BOUNDARIES come from one percentile-array
    aggregate, each user is bucketed against the broadcast boundaries
    (strictly-greater comparison, so both engines bucket ties
    identically), and cumulative user/value shares accumulate over the
    10-row relation — the 'top 10% of users hold X% of value' read-out
    behind whale analysis and revenue-risk audits, as curve points the
    registry's per-type Gini summarizes. User totals are ROUNDED to 6dp
    before bucketing on BOTH engines so a last-ulp float-sum difference
    can never flip a boundary assignment. The naive Lorenz curve sorts
    every user globally; this plan never sorts anything bigger than 10
    rows."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    totals = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 6).alias("tv")
    )
    ps = [i / 10.0 for i in range(1, 10)]
    bounds = totals.agg(
        F.percentile("tv", F.array(*[F.lit(p) for p in ps])).alias("b")
    )
    binned = totals.crossJoin(F.broadcast(bounds)).select(
        "tv",
        (
            1
            + F.aggregate(
                F.col("b"),
                F.lit(0),
                lambda acc, bd: acc
                + F.when(F.col("tv") > bd, 1).otherwise(0),
            )
        ).alias("decile"),
    )
    per = binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("tv").alias("v")
    )
    # 10-row relation: partitionless cumulative bounded by decile count
    wo = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wa = Window.partitionBy()
    cum = per.select(
        "decile",
        "n_users",
        F.sum("v").over(wo).alias("cum_v"),
        F.sum("v").over(wa).alias("tot_v"),
        F.sum("n_users").over(wo).alias("cum_n"),
        F.sum("n_users").over(wa).alias("tot_n"),
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_users").cast("long").alias("n_users"),
        F.round(F.col("cum_n") * 1.0 / F.col("tot_n"), 6).alias(
            "cum_user_share"
        ),
        F.round(F.col("cum_v") / F.col("tot_v"), 6).alias(
            "cum_value_share"
        ),
    )


@register(
    "error_prr_by_weekday",
    oracle="""
    WITH o AS (
      -- DuckDB dayofweek is 0=Sunday..6; Spark's is 1=Sunday..7 — shift
      SELECT dayofweek(ts) + 1 AS dow,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      FROM events
    ),
    per AS (
      SELECT dow, sum(is_err) AS a, count(*) - sum(is_err) AS b
      FROM o GROUP BY dow
    ),
    tot AS (SELECT sum(a) AS ta, sum(b) AS tb FROM per)
    SELECT CAST(dow AS INT) AS dow,
           CAST(a AS BIGINT) AS n_errors,
           CAST(a + b AS BIGINT) AS n_events,
           round((a * 1.0 / (a + b))
                 / ((t.ta - a) * 1.0 / ((t.ta - a) + (t.tb - b))), 4)
             AS prr,
           a >= 3 AND (a * 1.0 / (a + b))
             / ((t.ta - a) * 1.0 / ((t.ta - a) + (t.tb - b))) > 2.0
             AS signal
    FROM per CROSS JOIN tot t
    """,
)
def error_prr_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional reporting ratio (PRR) screen for error events by
    weekday — the pharmacovigilance-style disproportionality monitor
    applied to ops data: for each weekday, the error rate ON that day
    over the error rate on all OTHER days; PRR > 2 with ≥3 cases is the
    classic signal threshold for 'errors concentrate here'. The
    complement arm is algebraic from the totals (the same one-scan
    trick as the FDR family), so screening all 7 signals costs ONE
    partial-aggregated pass and a 7-row broadcast combine."""
    ev = _t(spark, sf_dir, "events")
    o = ev.select(
        F.dayofweek("ts").alias("dow"),
        F.when(F.col("event_type") == "error", 1)
        .otherwise(0)
        .alias("is_err"),
    )
    per = o.groupBy("dow").agg(
        F.sum("is_err").alias("a"),
        (F.count(F.lit(1)) - F.sum("is_err")).alias("b"),
    )
    tot = per.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    j = per.crossJoin(F.broadcast(tot))
    rate_in = F.col("a") * 1.0 / (F.col("a") + F.col("b"))
    rate_out = (F.col("ta") - F.col("a")) * 1.0 / (
        (F.col("ta") - F.col("a")) + (F.col("tb") - F.col("b"))
    )
    prr = rate_in / rate_out
    return j.select(
        F.col("dow").cast("int").alias("dow"),
        F.col("a").cast("long").alias("n_errors"),
        (F.col("a") + F.col("b")).cast("long").alias("n_events"),
        F.round(prr, 4).alias("prr"),
        ((F.col("a") >= 3) & (prr > 2.0)).alias("signal"),
    )


@register(
    "expected_calibration_error",
    oracle="""
    WITH scored AS (
      SELECT 1.0 / (1.0 + exp(-(value - 50.0) / 25.0)) AS p,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS o
      FROM events WHERE value IS NOT NULL
    ),
    per_bin AS (
      SELECT LEAST(CAST(floor(p * 10) AS INT), 9) AS b,
             count(*) AS nb, sum(p) AS sp, sum(o) AS so
      FROM scored GROUP BY LEAST(CAST(floor(p * 10) AS INT), 9)
    ),
    tot AS (SELECT sum(nb) AS n FROM per_bin)
    SELECT CAST(any_value(t.n) AS BIGINT) AS n_obs,
           CAST(count(*) AS BIGINT) AS n_bins,
           round(sum(nb * abs(sp / nb - so / nb)) / any_value(t.n), 6)
             AS ece,
           round(max(abs(sp / nb - so / nb)), 6) AS mce
    FROM per_bin CROSS JOIN tot t
    """,
)
def expected_calibration_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Expected calibration error (ECE) and max calibration error (MCE)
    for the same logistic purchase forecast the Brier query scores:
    per-confidence-bin |mean forecast − empirical rate|, averaged
    weighted by bin mass (ECE) and taken at its worst bin (MCE) — the
    pair every model card reports next to the proper score (Brier says
    how GOOD the forecast is; ECE says whether you can TRUST its
    probabilities as frequencies). Same ≤10-row bin relation as the
    Brier decomposition — the marginal cost of adding a calibration
    metric to the scoring pass is zero extra scans."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    p = 1.0 / (1.0 + F.exp(-(F.col("value") - 50.0) / 25.0))
    o = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    per_bin = (
        ev.select(
            F.least(F.floor(p * 10).cast("int"), F.lit(9)).alias("b"),
            p.alias("p"),
            o.alias("o"),
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum("p").alias("sp"),
            F.sum("o").alias("so"),
        )
    )
    tot = per_bin.agg(F.sum("nb").alias("n"))
    gap = F.abs(F.col("sp") / F.col("nb") - F.col("so") / F.col("nb"))
    j = per_bin.crossJoin(F.broadcast(tot))
    return j.agg(
        F.first("n").cast("long").alias("n_obs"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.round(F.sum(F.col("nb") * gap) / F.first("n"), 6).alias("ece"),
        F.round(F.max(gap), 6).alias("mce"),
    )


@register(
    "gumbel_daily_max_extremes",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, max(value) AS mx
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    s AS (
      SELECT event_type, count(*) AS n, sum(mx) AS sm,
             sum(mx * mx) AS smm
      FROM daily GROUP BY event_type
    ),
    fit AS (
      SELECT event_type, n,
             sqrt((smm - sm * sm / n) / (n - 1))
               * 0.7796968012336761 AS beta,
             sm / n - sqrt((smm - sm * sm / n) / (n - 1))
               * 0.7796968012336761 * 0.5772156649015329 AS mu
      FROM s
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           round(mu, 4) AS gumbel_mu,
           round(beta, 4) AS gumbel_beta,
           round(mu - beta * ln(-ln(1.0 - 1.0 / 100.0)), 4)
             AS return_level_100d,
           round(mu - beta * ln(-ln(1.0 - 1.0 / 365.0)), 4)
             AS return_level_365d
    FROM fit
    """,
)
def gumbel_daily_max_extremes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Extreme-value capacity planning per event type: fit a Gumbel
    distribution to the DAILY BLOCK MAXIMA of value (the Fisher–
    Tippett domain for light-tailed maxima) by method of moments
    (β̂ = s·√6/π, μ̂ = m̄ − γ·β̂ with γ = Euler–Mascheroni), then read
    off the 100-day and 365-day return levels μ − β·ln(−ln(1−1/N)) —
    'the peak you should expect once per N days', the tail question
    p99-style percentiles systematically understate because they
    interpolate INSIDE the observed range. Two bounded aggregations
    (daily maxima, then three raw sums per type); the EVT constants are
    literals, so both engines run the identical float sequence."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.max("value").alias("mx"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mx").alias("sm"),
        F.sum(F.col("mx") * F.col("mx")).alias("smm"),
    )
    n = F.col("n")
    sd = F.sqrt(
        (F.col("smm") - F.col("sm") * F.col("sm") / n) / (n - 1)
    )
    beta = sd * 0.7796968012336761  # sqrt(6)/pi
    mu = F.col("sm") / n - beta * 0.5772156649015329
    rl = lambda days: mu - beta * F.log(  # noqa: E731
        -F.log(F.lit(1.0 - 1.0 / days))
    )
    return s.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.round(mu, 4).alias("gumbel_mu"),
        F.round(beta, 4).alias("gumbel_beta"),
        F.round(rl(100.0), 4).alias("return_level_100d"),
        F.round(rl(365.0), 4).alias("return_level_365d"),
    )


@register(
    "seasonality_periodogram",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(value) / count(*) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    anchored AS (
      SELECT d.event_type, d.y,
             datediff('day', m.d0, d.day) AS i
      FROM daily d JOIN (
        SELECT event_type, min(day) AS d0 FROM daily GROUP BY event_type
      ) m USING (event_type)
    ),
    centered AS (
      SELECT a.event_type, a.i, a.y - s.ybar AS d
      FROM anchored a JOIN (
        SELECT event_type, sum(y) / count(*) AS ybar
        FROM anchored GROUP BY event_type
      ) s USING (event_type)
    ),
    fan AS (
      SELECT c.event_type, p.period, c.d, c.i
      FROM centered c CROSS JOIN (
        SELECT CAST(unnest([7, 14, 30]) AS INT) AS period) p
    ),
    spec AS (
      SELECT event_type, period,
             sum(d * cos(2 * pi() * i / period)) AS sc,
             sum(d * sin(2 * pi() * i / period)) AS ss,
             sum(d * d) AS energy,
             count(*) AS n
      FROM fan GROUP BY event_type, period
    )
    SELECT event_type,
           CAST(period AS INT) AS period_days,
           round((sc * sc + ss * ss) / (n * energy), 6)
             AS power_share,
           (sc * sc + ss * ss) = max(sc * sc + ss * ss)
             OVER (PARTITION BY event_type) AS dominant
    FROM spec
    """,
)
def seasonality_periodogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fixed-frequency periodogram over each type's daily mean series:
    spectral power at candidate periods 7/14/30 days via the Goertzel
    sums P = (Σd·cos ωi)² + (Σd·sin ωi)², normalized by n·Σd² so the
    share is scale-free — the cycle detector that tells the
    forecasting family WHICH seasonality to model before committing to
    a seasonal decomposition (the event-series sibling of the PCM
    Goertzel tone probe). Series are centered (per-type mean join)
    so the DC component can't leak into every bin. One bounded daily
    aggregate, one 3-period fan-out collapsing to five sums per
    (type, period): the fact table is scanned once."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg((F.sum("value") / F.count(F.lit(1))).alias("y"))
    d0 = daily.groupBy("event_type").agg(F.min("day").alias("d0"))
    anchored = daily.join(F.broadcast(d0), "event_type").select(
        "event_type", "y", F.datediff("day", "d0").alias("i")
    )
    means = anchored.groupBy("event_type").agg(
        (F.sum("y") / F.count(F.lit(1))).alias("ybar")
    )
    centered = anchored.join(F.broadcast(means), "event_type").select(
        "event_type", "i", (F.col("y") - F.col("ybar")).alias("d")
    )
    fan = centered.select(
        "event_type",
        "i",
        "d",
        F.explode(F.array(F.lit(7), F.lit(14), F.lit(30))).alias(
            "period"
        ),
    )
    two_pi = 2 * 3.141592653589793
    spec = fan.groupBy("event_type", "period").agg(
        F.sum(
            F.col("d") * F.cos(two_pi * F.col("i") / F.col("period"))
        ).alias("sc"),
        F.sum(
            F.col("d") * F.sin(two_pi * F.col("i") / F.col("period"))
        ).alias("ss"),
        F.sum(F.col("d") * F.col("d")).alias("energy"),
        F.count(F.lit(1)).alias("n"),
    )
    power = F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")
    w = Window.partitionBy("event_type")
    return spec.select(
        "event_type",
        F.col("period").cast("int").alias("period_days"),
        F.round(power / (F.col("n") * F.col("energy")), 6).alias(
            "power_share"
        ),
        (power == F.max(power).over(w)).alias("dominant"),
    )


@register(
    "nb_moments_fit_per_type",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    s AS (
      SELECT event_type, count(*) AS n, sum(c) AS sc, sum(c * c) AS scc
      FROM daily GROUP BY event_type
    ),
    mo AS (
      SELECT event_type, n,
             sc * 1.0 / n AS m,
             (scc - sc * 1.0 * sc / n) / (n - 1) AS v
      FROM s
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           round(m, 6) AS mean_daily,
           round(v, 6) AS var_daily,
           v > m AS fit_valid,
           CASE WHEN v > m THEN round(m * m / (v - m), 6) END AS nb_r,
           CASE WHEN v > m THEN round(m / v, 6) END AS nb_p
    FROM mo
""",
)
def nb_moments_fit_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial method-of-moments fit on daily counts per type
    (r̂ = m²/(s²−m), p̂ = m/s²) — the model the overdispersion gate
    dispatches TO when it rejects Poisson; a type whose variance does
    not exceed its mean gets fit_valid = false and NULL parameters
    instead of a garbage fit. Same two bounded aggregations as the
    dispersion test; the parameters are closed-form from the same three
    sums."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    n = F.col("n")
    m = F.col("sc") * 1.0 / n
    v = (F.col("scc") - F.col("sc") * 1.0 * F.col("sc") / n) / (n - 1)
    valid = v > m
    return s.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.round(m, 6).alias("mean_daily"),
        F.round(v, 6).alias("var_daily"),
        valid.alias("fit_valid"),
        F.when(valid, F.round(m * m / (v - m), 6)).alias("nb_r"),
        F.when(valid, F.round(m / v, 6)).alias("nb_p"),
    )

@register(
    "weekday_seasonal_strength",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             dayofweek(CAST(ts AS DATE)) + 1 AS dow,
             sum(value) / count(*) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    g AS (
      SELECT event_type, count(*) AS n, sum(y) AS sy, sum(y * y) AS syy
      FROM daily GROUP BY event_type
    ),
    dw AS (
      SELECT event_type, dow, count(*) AS nw, sum(y) AS syw
      FROM daily GROUP BY event_type, dow
    ),
    ss AS (
      SELECT d.event_type,
             any_value(g.n) AS n,
             any_value(g.syy - g.sy * g.sy / g.n) AS ss_total,
             sum(d.nw * (d.syw / d.nw - g.sy / g.n)
                      * (d.syw / d.nw - g.sy / g.n)) AS ss_between
      FROM dw d JOIN g ON g.event_type = d.event_type
      GROUP BY d.event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           round(ss_between / ss_total, 6) AS weekday_eta2,
           ss_between / ss_total > 0.2 AS strongly_seasonal
    FROM ss
""",
)
def weekday_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal-strength index per type: η² = SS_between(weekday)
    / SS_total over the daily mean series — the share of day-to-day
    variance the weekly cycle explains, the scalar that decides whether
    the forecasting family should bother with weekday seasonality
    (complementing the periodogram, which finds the PERIOD; this scores
    a KNOWN period's strength). Two bounded aggregations on the daily
    relation; the between-group sum reuses the same raw sums."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg((F.sum("value") / F.count(F.lit(1))).alias("y"))
    # Bare F.dayofweek (1..7) matches the oracle's DuckDB dayofweek+1 —
    # same convention as error_prr_by_weekday. dow is only a grouping
    # key today, but keep the labels aligned so emitting it stays safe.
    daily = daily.withColumn("dow", F.dayofweek("day"))
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dw = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("nw"), F.sum("y").alias("syw")
    )
    j = dw.join(F.broadcast(g), "event_type")
    mean_all = F.col("sy") / F.col("n")
    dev = F.col("syw") / F.col("nw") - mean_all
    ss = j.groupBy("event_type").agg(
        F.first("n").alias("n"),
        F.first(
            F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
        ).alias("ss_total"),
        F.sum(F.col("nw") * dev * dev).alias("ss_between"),
    )
    eta2 = F.col("ss_between") / F.col("ss_total")
    return ss.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(eta2, 6).alias("weekday_eta2"),
        (eta2 > 0.2).alias("strongly_seasonal"),
    )


@register(
    "simpson_slope_reversal",
    oracle="""
    WITH obs AS (
      SELECT event_type, CAST(hour(ts) AS DOUBLE) AS x, value AS y
      FROM events WHERE value IS NOT NULL
    ),
    per AS (
      SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM obs GROUP BY event_type
    ),
    tot AS (
      SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
             sum(sxx) AS sxx, sum(sxy) AS sxy
      FROM per
    )
    SELECT p.event_type,
           CAST(p.n AS BIGINT) AS n_obs,
           round((p.n * p.sxy - p.sx * p.sy)
                 / (p.n * p.sxx - p.sx * p.sx), 6) AS slope_type,
           round((t.n * t.sxy - t.sx * t.sy)
                 / (t.n * t.sxx - t.sx * t.sx), 6) AS slope_global,
           ((p.n * p.sxy - p.sx * p.sy) > 0)
             <> ((t.n * t.sxy - t.sx * t.sy) > 0) AS sign_reversed
    FROM per p CROSS JOIN tot t
    """,
)
def simpson_slope_reversal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Simpson's-paradox detector: the OLS slope of value on hour-of-day
    computed globally AND within each event type; a type whose
    within-group slope has the opposite sign of the pooled slope is the
    textbook aggregation trap (the pooled trend is a composition
    artifact, not a causal signal) — the sanity gate before anyone
    reads the global trend chart. The global sufficient statistics are
    the SUM of the per-group ones, so the whole detector is one
    partial-aggregated scan + a #types-row broadcast combine."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    obs = ev.select(
        "event_type",
        F.hour("ts").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    per = obs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    tot = per.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
    )
    j = per.crossJoin(F.broadcast(tot))
    slope_t = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    slope_g = (
        F.col("tn") * F.col("tsxy") - F.col("tsx") * F.col("tsy")
    ) / (F.col("tn") * F.col("tsxx") - F.col("tsx") * F.col("tsx"))
    num_t = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    num_g = F.col("tn") * F.col("tsxy") - F.col("tsx") * F.col("tsy")
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_obs"),
        F.round(slope_t, 6).alias("slope_type"),
        F.round(slope_g, 6).alias("slope_global"),
        ((num_t > 0) != (num_g > 0)).alias("sign_reversed"),
    )


@register(
    "kish_effective_sample_size",
    oracle="""
    WITH s AS (
      SELECT event_type, count(*) AS n, sum(value) AS sw,
             sum(value * value) AS sww
      FROM events WHERE value IS NOT NULL AND value > 0
      GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_rows,
           round(sw * sw / sww, 2) AS kish_ess,
           round((sw * sw / sww) / n, 6) AS efficiency,
           (sw * sw / sww) / n < 0.5 AS weights_degenerate
    FROM s
    """,
)
def kish_effective_sample_size(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kish effective sample size per type when rows are weighted by
    value: ESS = (Σw)²/Σw² — the number every weighted estimator
    (IPS, raked surveys, importance-sampled evals) should report next
    to its point estimate, because n rows with degenerate weights can
    carry the information of far fewer. Efficiency = ESS/n; below 0.5
    flags a weight distribution whose variance is eating more than
    half the sample — the trigger for the registry's weight-clipping
    / sampling-rate queries. One partial-aggregated pass, three sums
    per group."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sw"),
        F.sum(F.col("value") * F.col("value")).alias("sww"),
    )
    ess = F.col("sw") * F.col("sw") / F.col("sww")
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_rows"),
        F.round(ess, 2).alias("kish_ess"),
        F.round(ess / F.col("n"), 6).alias("efficiency"),
        (ess / F.col("n") < 0.5).alias("weights_degenerate"),
    )


@register(
    "hurst_rescaled_range",
    oracle="""
    WITH m AS (
      SELECT event_type, sum(value) / count(*) AS ybar
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    seq AS (
      SELECT e.event_type, e.value - m.ybar AS d,
             row_number() OVER (PARTITION BY e.event_type
                                ORDER BY e.ts, e.event_id) - 1 AS i
      FROM events e JOIN m USING (event_type)
      WHERE e.value IS NOT NULL
    ),
    fan AS (
      SELECT s.event_type, b.bs, CAST(floor(s.i / b.bs) AS INT) AS blk,
             s.d, s.i
      FROM seq s CROSS JOIN (
        SELECT CAST(unnest([32, 64, 128]) AS INT) AS bs) b
    ),
    walk AS (
      SELECT event_type, bs, blk, d,
             sum(d) OVER (PARTITION BY event_type, bs, blk
                          ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
      FROM fan
    ),
    per_blk AS (
      SELECT event_type, bs, blk,
             count(*) AS n,
             max(cum) - min(cum) AS r,
             sqrt(greatest(sum(d * d) / count(*)
                  - (sum(d) / count(*)) * (sum(d) / count(*)), 1e-300))
               AS s
      FROM walk GROUP BY event_type, bs, blk
    ),
    rs AS (
      SELECT event_type, bs,
             sum(ln(r / s)) / count(*) AS mean_log_rs
      FROM per_blk WHERE n = bs AND r > 0 GROUP BY event_type, bs
    ),
    fit AS (
      SELECT event_type, count(*) AS k,
             sum(ln(CAST(bs AS DOUBLE))) AS sx, sum(mean_log_rs) AS sy,
             sum(ln(CAST(bs AS DOUBLE)) * ln(CAST(bs AS DOUBLE))) AS sxx,
             sum(ln(CAST(bs AS DOUBLE)) * mean_log_rs) AS sxy
      FROM rs GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(r.bs AS INT) AS block_size,
           round(r.mean_log_rs, 6) AS mean_log_rs,
           round((f.k * f.sxy - f.sx * f.sy)
                 / (f.k * f.sxx - f.sx * f.sx), 4) AS hurst_h
    FROM rs r JOIN fit f USING (event_type)
    """,
)
def hurst_rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent per event type via classic rescaled-range (R/S)
    analysis: split each demeaned value series into blocks of 32/64/128
    observations, compute each block's cumulative-walk range over its
    standard deviation, and fit H as the log-log slope of mean ln(R/S)
    against block size — H ≈ 0.5 is a random walk, H > 0.5 long-range
    persistence (trends compound; EWMA-style smoothers underreact),
    H < 0.5 mean reversion. The memory diagnostic that complements ADF
    (unit root) and Ljung–Box (short-lag correlation) with LONG-range
    structure. All windows are per-(type, block-size, block) —
    partitions of a bounded fan-out of the series — and the fit is
    closed-form from three points per type. Partial blocks and
    zero-range blocks are excluded identically on both engines."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    m = ev.groupBy("event_type").agg(
        (F.sum("value") / F.count(F.lit(1))).alias("ybar")
    )
    w_i = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.join(F.broadcast(m), "event_type").select(
        "event_type",
        (F.col("value") - F.col("ybar")).alias("d"),
        (F.row_number().over(w_i) - 1).alias("i"),
    )
    fan = seq.select(
        "event_type",
        "d",
        "i",
        F.explode(F.array(F.lit(32), F.lit(64), F.lit(128))).alias("bs"),
    ).withColumn("blk", F.floor(F.col("i") / F.col("bs")).cast("int"))
    w_cum = (
        Window.partitionBy("event_type", "bs", "blk")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = fan.select(
        "event_type", "bs", "blk", "d", F.sum("d").over(w_cum).alias("cum")
    )
    per_blk = walk.groupBy("event_type", "bs", "blk").agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("cum") - F.min("cum")).alias("r"),
        F.sqrt(
            F.greatest(
                F.sum(F.col("d") * F.col("d")) / F.count(F.lit(1))
                - (F.sum("d") / F.count(F.lit(1)))
                * (F.sum("d") / F.count(F.lit(1))),
                F.lit(1e-300),
            )
        ).alias("s"),
    )
    rs = (
        per_blk.filter(
            (F.col("n") == F.col("bs")) & (F.col("r") > 0)
        )
        .groupBy("event_type", "bs")
        .agg(
            (
                F.sum(F.log(F.col("r") / F.col("s")))
                / F.count(F.lit(1))
            ).alias("mean_log_rs")
        )
    )
    lx = F.log(F.col("bs").cast("double"))
    fit = rs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(lx).alias("sx"),
        F.sum("mean_log_rs").alias("sy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(lx * F.col("mean_log_rs")).alias("sxy"),
    )
    h = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return rs.join(F.broadcast(fit), "event_type").select(
        "event_type",
        F.col("bs").cast("int").alias("block_size"),
        F.round("mean_log_rs", 6).alias("mean_log_rs"),
        F.round(h, 4).alias("hurst_h"),
    )


@register(
    "runs_test_randomness",
    oracle="""
    WITH m AS (
      SELECT event_type, sum(value) / count(*) AS ybar
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    signs AS (
      SELECT e.event_type,
             CASE WHEN e.value > m.ybar THEN 1 ELSE 0 END AS s,
             lag(CASE WHEN e.value > m.ybar THEN 1 ELSE 0 END)
               OVER (PARTITION BY e.event_type
                     ORDER BY e.ts, e.event_id) AS prev
      FROM events e JOIN m USING (event_type)
      WHERE e.value IS NOT NULL
    ),
    agg AS (
      SELECT event_type,
             sum(s) AS n1, count(*) - sum(s) AS n2,
             1 + sum(CASE WHEN prev IS NOT NULL AND s <> prev
                          THEN 1 ELSE 0 END) AS runs
      FROM signs GROUP BY event_type
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST(runs AS BIGINT) AS n_runs,
           round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 4)
             AS z_stat,
           abs((runs - (2.0 * n1 * n2 / (n1 + n2) + 1))
               / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                      / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))))
             > 1.959964 AS reject_random_05
    FROM agg
    """,
)
def runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test per event type: are above-mean and
    below-mean values RANDOMLY interleaved in time, or do they clump
    (too few runs = positive serial dependence / regimes; too many =
    oscillation)? The nonparametric cousin of Ljung–Box — it needs no
    moments, only the sign sequence, so heavy tails can't distort it.
    Runs are counted with one lag window (a run starts wherever the
    sign changes); the z statistic is closed-form from (n₁, n₂, R).
    One mean pass + one lag-window pass per key, three integers per
    type shuffled."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    m = ev.groupBy("event_type").agg(
        (F.sum("value") / F.count(F.lit(1))).alias("ybar")
    )
    s = F.when(F.col("value") > F.col("ybar"), 1).otherwise(0)
    # the lag runs over TIME order — a run starts at every sign change
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    signs = (
        ev.join(F.broadcast(m), "event_type")
        .select("event_type", "ts", "event_id", s.alias("s"))
        .select(
            "event_type",
            "s",
            F.lag("s").over(w).alias("prev"),
        )
    )
    agg = signs.groupBy("event_type").agg(
        F.sum("s").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("s") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        ).alias("runs"),
    )
    n1, n2, runs = F.col("n1"), F.col("n2"), F.col("runs")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    sig = F.sqrt(
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    z = (runs - mu) / sig
    return agg.select(
        "event_type",
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        runs.cast("long").alias("n_runs"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.959964).alias("reject_random_05"),
    )


@register(
    "mean_reversion_halflife",
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
      SELECT event_type, count(*) AS n, sum(x) AS sx, sum(dy) AS sy,
             sum(x * x) AS sxx, sum(x * dy) AS sxy
      FROM d GROUP BY event_type
    ),
    fit AS (
      SELECT event_type, n,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta
      FROM s
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_obs,
           round(beta, 6) AS ar_beta,
           beta > -1 AND beta < 0 AS reverting,
           CASE WHEN beta > -1 AND beta < 0
                THEN round(-0.6931471805599453 / ln(1.0 + beta), 4)
           END AS halflife_steps
    FROM fit
    """,
)
def mean_reversion_halflife(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ornstein–Uhlenbeck mean-reversion half-life per type from the
    same Δy = α + β·y_{t−1} regression the ADF gate fits: when
    −1 < β < 0 the series reverts and the half-life is
    −ln 2 / ln(1+β) steps — the number that turns 'stationary' (ADF's
    yes/no) into an actionable horizon (how long a deviation takes to
    halve: the window length for the registry's rolling z-score and
    seasonal-baseline anomaly rules). Non-reverting series emit NULL
    instead of a nonsense horizon. Same single lag-window pass + five
    raw sums as ADF."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", "value", F.lag("value").over(w).alias("y_lag")
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
    )
    beta = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    reverting = (beta > -1) & (beta < 0)
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_obs"),
        F.round(beta, 6).alias("ar_beta"),
        reverting.alias("reverting"),
        F.when(
            reverting,
            F.round(-0.6931471805599453 / F.log(1.0 + beta), 4),
        ).alias("halflife_steps"),
    )
