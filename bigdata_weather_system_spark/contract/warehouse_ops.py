"""Contract queries: warehouse allocation / classification / privacy ops.

Three classic "the analysts will ask for this week one" operators the
reference has no analogue for, each engineered for exact cross-engine
reproducibility:

- ``order_discount_proration`` — allocate an integer per-order budget
  across lineitems by the LARGEST-REMAINDER method so the allocations
  sum to the budget EXACTLY (the penny-reconciliation problem every
  billing/finance pipeline hits). All arithmetic is bigint: shares and
  remainders come from integer multiply/divide, so Spark and DuckDB
  agree bit-for-bit — no float rounding anywhere near a decision.
- ``part_revenue_abc`` — ABC (Pareto) inventory classification by
  cumulative revenue share. Per-part revenue is computed in exact
  integer 1e-4 currency units and the A/B/C thresholds are integer
  cross-multiplications (10*cum <= 7*total), so class boundaries cannot
  flip on a last-ulp float difference.
- ``dp_noisy_event_counts`` — epsilon-differentially-private counts via
  Laplace noise with a SEEDED inverse-CDF draw (md5-derived uniform),
  reproducible across engines; the only float op is one ln(), guarded
  by rounding to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .core import register, _t


# ---------------------------------------------------------------------------
# Largest-remainder proration
# ---------------------------------------------------------------------------

@register(
    "order_discount_proration",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_linenumber,
             CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(floor(o.o_totalprice * 5) AS BIGINT)            AS budget
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    t AS (
      SELECT *,
             sum(cents) OVER (PARTITION BY l_orderkey) AS total_cents
      FROM li
    ),
    b AS (
      SELECT *,
             (budget * cents) // total_cents AS base_cents,
             (budget * cents) %  total_cents AS remainder
      FROM t
    ),
    r AS (
      SELECT *,
             budget - sum(base_cents) OVER (PARTITION BY l_orderkey)
               AS leftover,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY remainder DESC, l_linenumber, cents)
               AS rk
      FROM b
    )
    SELECT l_orderkey, l_linenumber,
           CAST(base_cents + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents
    FROM r
    """,
)
def order_discount_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate a 5%-of-order-total budget (integer cents) across the
    order's lineitems proportional to extended price, largest-remainder
    method: floor every proportional share, then hand the leftover cents
    to the largest fractional remainders (ties to the lowest line
    number). Per-order allocations sum EXACTLY to the budget — the
    invariant that naive per-row rounding breaks and that finance
    reconciliation requires; pinned in tests/test_warehouse_ops.py.

    Plan shape: one shuffle join lineitem⋈orders on the order key, then
    THREE window passes over the SAME partitioning (total, leftover,
    remainder rank) — Spark reuses one hash partitioning for all of
    them, so the whole query is join + one exchange. All decision
    arithmetic is bigint (budget*cents <= ~2.5e13, far inside int64),
    so there is no float anywhere a penny could flip.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.floor(F.col("o_totalprice") * 5).cast("long").alias("budget"),
    )
    w = Window.partitionBy("l_orderkey")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem,
    # so the remainder rank tie-breaks through cents as well — rows that
    # are still identical after that produce identical outputs either way.
    wr = Window.partitionBy("l_orderkey").orderBy(
        F.col("remainder").desc(), F.col("l_linenumber"), F.col("cents")
    )
    t = (
        li.join(orders, on="l_orderkey")
        .withColumn("total_cents", F.sum("cents").over(w))
        .withColumn(
            "base_cents",
            F.expr("(budget * cents) DIV total_cents"),
        )
        .withColumn("remainder", (F.col("budget") * F.col("cents")) % F.col("total_cents"))
        .withColumn("leftover", F.col("budget") - F.sum("base_cents").over(w))
        .withColumn("rk", F.row_number().over(wr))
    )
    return t.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("base_cents")
            + F.when(F.col("rk") <= F.col("leftover"), F.lit(1)).otherwise(F.lit(0))
        ).alias("alloc_cents"),
    )


# ---------------------------------------------------------------------------
# ABC (Pareto) classification
# ---------------------------------------------------------------------------

@register(
    "part_revenue_abc",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
               AS rev_e4
      FROM lineitem GROUP BY l_partkey
    ),
    c AS (
      SELECT l_partkey, rev_e4,
             sum(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum_e4,
             sum(rev_e4) OVER ()                         AS total_e4
      FROM rev
    ),
    k AS (
      SELECT *,
             CASE WHEN 10 * cum_e4 <= 7 * total_e4 THEN 'A'
                  WHEN 10 * cum_e4 <= 9 * total_e4 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM c
    )
    SELECT abc_class,
           count(*)                                   AS n_parts,
           round(sum(rev_e4) / 10000.0, 2)            AS revenue,
           round(sum(rev_e4) / (1.0 * max(total_e4)), 6) AS revenue_share
    FROM k GROUP BY abc_class
    """,
)
def part_revenue_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue; class A =
    the head that covers 70% of cumulative revenue, B to 90%, C the
    tail. The staple Pareto cut for stocking policy / SKU curation.

    Determinism engineering: per-part revenue is an exact bigint in 1e-4
    currency units (price cents x integer discount percent), cumulative
    and total sums stay bigint, and the 70/90% thresholds are integer
    cross-multiplications — so the classification is bit-identical
    across engines even though a float pipeline would wobble at class
    boundaries. Plan shape: one hash agg over lineitem (the fact-side
    heavy lifting, map-side partials), then a single-partition window
    over the PART dimension only (2k rows per SF1 x scale of the dim —
    the global sort is over parts, never lineitems; at 100 TB the dim
    window is still tiny next to the fact agg). Final 3-group rollup.
    """
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.select(
            "l_partkey",
            (
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
                * (100 - F.floor(F.col("l_discount") * 100 + 0.5).cast("long"))
            ).alias("rev_e4"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("rev_e4").alias("rev_e4"))
    )
    wc = (
        Window.orderBy(F.col("rev_e4").desc(), F.col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = rev.withColumn("cum_e4", F.sum("rev_e4").over(wc)).withColumn(
        "total_e4", F.sum("rev_e4").over(Window.partitionBy())
    )
    k = c.withColumn(
        "abc_class",
        F.when(10 * F.col("cum_e4") <= 7 * F.col("total_e4"), "A")
        .when(10 * F.col("cum_e4") <= 9 * F.col("total_e4"), "B")
        .otherwise("C"),
    )
    return k.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("rev_e4") / 10000.0, 2).alias("revenue"),
        F.round(F.sum("rev_e4") / (1.0 * F.max("total_e4")), 6).alias("revenue_share"),
    )


# ---------------------------------------------------------------------------
# Differentially-private counts (seeded Laplace)
# ---------------------------------------------------------------------------

@register(
    "dp_noisy_event_counts",
    oracle="""
    WITH c AS (
      SELECT event_type, count(*) AS n_true FROM events GROUP BY event_type
    ),
    u AS (
      SELECT *,
             (CAST(('0x' || substring(md5('dp:' || event_type), 1, 15))
                   AS BIGINT) % 1000000 + 0.5) / 1000000.0 AS unif
      FROM c
    )
    SELECT event_type, n_true,
           round(-2.0 * sign(unif - 0.5) * ln(1 - 2 * abs(unif - 0.5)), 6)
             AS laplace_noise,
           round(n_true
                 - 2.0 * sign(unif - 0.5) * ln(1 - 2 * abs(unif - 0.5)), 6)
             AS n_noisy
    FROM u
    """,
)
def dp_noisy_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """epsilon-DP release of per-type event counts: Laplace(b=2) noise
    (sensitivity 1 for a count, epsilon = 0.5) added to each true count.
    The noise draw is the inverse-CDF transform of a SEEDED uniform
    derived from md5 of the group key — the same cross-engine
    reproducible-randomness idiom the sampling family uses — so the
    'random' release is deterministic, auditable, and identical in the
    oracle. (A production release would use a real CSPRNG per epoch;
    the mechanism, sensitivity accounting, and inverse-CDF shape are
    exactly this.)

    Plan shape: one hash aggregation, then pure scalar math on the
    5-row result; the noise never touches the fact table. The single
    libm call (ln) is rounded to 6 decimals on both sides.
    """
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_true"))
    unif = (
        F.conv(F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 15), 16, 10)
        .cast("long") % 1_000_000 + 0.5
    ) / 1_000_000.0
    noise = -2.0 * F.signum(unif - 0.5) * F.log(1 - 2 * F.abs(unif - 0.5))
    return c.select(
        "event_type",
        "n_true",
        F.round(noise, 6).alias("laplace_noise"),
        F.round(F.col("n_true") + noise, 6).alias("n_noisy"),
    )


@register(
    "fifo_credit_matching",
    oracle="""
    WITH d AS (
      SELECT user_id, event_id AS lot_id, value,
             sum(value) OVER w         AS d_hi,
             sum(value) OVER w - value AS d_lo
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    c AS (
      SELECT user_id, event_id AS draw_id, value,
             sum(value) OVER w         AS c_hi,
             sum(value) OVER w - value AS c_lo
      FROM events WHERE event_type = 'click'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT d.user_id, d.lot_id, c.draw_id,
           round(least(d.d_hi, c.c_hi) - greatest(d.d_lo, c.c_lo), 6)
             AS matched
    FROM d JOIN c ON d.user_id = c.user_id
                 AND d.d_lo < c.c_hi AND c.c_lo < d.d_hi
    """,
)
def fifo_credit_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching — the inventory-costing / credit-consumption
    primitive: per user, 'purchase' events deposit credit lots and
    'click' events consume them strictly first-in-first-out; the output
    says how much of each draw came from each lot. The classic
    implementation is a stateful scan; the set-based formulation maps
    each lot and each draw to its [cum_lo, cum_hi) interval on the
    per-user cumulative axis and INTERSECTS them — FIFO consumption is
    exactly interval overlap, a fact that turns the sequential algorithm
    into one equi-join with range predicates.

    Determinism: running window sums accumulate sequentially in frame
    order, so both engines compute bit-identical cumulative bounds (no
    shuffle-order variance — this is the one float-sum shape that IS
    reproducible), making the strict-inequality overlap test safe; the
    matched amount is rounded only for display. Scale shape: two window
    passes and a join all hash-partitioned on user_id; the candidate
    space is per-user lots x draws, bucketable exactly like the band
    joins in the temporal family if per-key history grows hot.
    """
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def side(event_type: str, id_alias: str, prefix: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == event_type)
            .select(
                "user_id",
                F.col("event_id").alias(id_alias),
                "value",
                F.sum("value").over(w).alias(f"{prefix}_hi"),
                (F.sum("value").over(w) - F.col("value")).alias(f"{prefix}_lo"),
            )
        )

    d = side("purchase", "lot_id", "d")
    c = side("click", "draw_id", "c")
    return (
        d.join(
            c,
            on=[
                d["user_id"] == c["user_id"],
                d["d_lo"] < c["c_hi"],
                c["c_lo"] < d["d_hi"],
            ],
        )
        .select(
            d["user_id"],
            "lot_id",
            "draw_id",
            F.round(
                F.least(F.col("d_hi"), F.col("c_hi"))
                - F.greatest(F.col("d_lo"), F.col("c_lo")),
                6,
            ).alias("matched"),
        )
    )


@register(
    "business_days_to_ship",
    oracle="""
    WITH ship AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             CAST(o.o_orderdate AS DATE) AS od,
             CAST(min(l.l_shipdate) AS DATE) AS sd
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, CAST(o.o_orderdate AS DATE)
    ),
    bd AS (
      SELECT o_orderpriority,
             (5 * ((datediff('day', DATE '1970-01-01', sd) + 3) // 7)
              + least((datediff('day', DATE '1970-01-01', sd) + 3) % 7, 5))
             -
             (5 * ((datediff('day', DATE '1970-01-01', od) + 3) // 7)
              + least((datediff('day', DATE '1970-01-01', od) + 3) % 7, 5))
               AS busdays
      FROM ship WHERE sd >= od
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)            AS n_orders,
           round(avg(busdays), 6)              AS avg_busdays,
           CAST(min(busdays) AS BIGINT)        AS min_busdays,
           CAST(max(busdays) AS BIGINT)        AS max_busdays,
           round(sum(CASE WHEN busdays <= 5 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6)                AS share_within_5bd
    FROM bd GROUP BY o_orderpriority
    """,
)
def business_days_to_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day (Mon-Fri) order-to-first-shipment latency per order
    priority — the SLA metric calendars care about, where a Friday order
    shipping Monday is 1 business day, not 3. Weekday counting is pure
    integer closed form, no calendar table and no per-day explode:
    W(d) = 5*((epochday+3)//7) + min((epochday+3)%7, 5) counts weekdays
    since epoch (the +3 aligns the week to Monday; 1970-01-01 was a
    Thursday), and busdays = W(ship) - W(order). Epoch days are
    non-negative here so // and truncating division agree across
    engines, and all math is exact integers until the final avg. One
    join + two hash aggregates; the per-order min-shipdate agg
    partial-aggregates before the shuffle."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd0")
    )
    ship = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "od")
        .agg(F.min("sd0").alias("sd"))
        .filter(F.col("sd") >= F.col("od"))
    )
    epoch = F.lit("1970-01-01").cast("date")

    def wd(col):
        n = F.datediff(col, epoch) + 3
        return 5 * F.floor(n / 7) + F.least(n % 7, F.lit(5))

    bd = ship.select(
        "o_orderpriority", (wd(F.col("sd")) - wd(F.col("od"))).alias("busdays")
    )
    return bd.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.avg("busdays"), 6).alias("avg_busdays"),
        F.min("busdays").cast("long").alias("min_busdays"),
        F.max("busdays").cast("long").alias("max_busdays"),
        F.round(
            F.sum(F.when(F.col("busdays") <= 5, 1).otherwise(0)) * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("share_within_5bd"),
    )


@register(
    "part_reorder_points",
    oracle="""
    WITH daily AS (
      SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
             sum(l_quantity) AS demand
      FROM lineitem GROUP BY l_partkey, CAST(l_shipdate AS DATE)
    ),
    stats AS (
      SELECT l_partkey,
             count(*) AS n_days,
             avg(demand) AS mean_daily,
             stddev_samp(demand) AS sd_daily
      FROM daily GROUP BY l_partkey
      HAVING count(*) >= 5
    )
    SELECT l_partkey,
           CAST(n_days AS BIGINT)                          AS n_days,
           round(mean_daily, 6)                            AS mean_daily,
           round(sd_daily, 6)                              AS sd_daily,
           round(1.64 * sd_daily * sqrt(7), 6)             AS safety_stock,
           round(mean_daily * 7 + 1.64 * sd_daily * sqrt(7), 6)
                                                           AS reorder_point
    FROM stats
    """,
)
def part_reorder_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory reorder points per part (lead time L=7 days, 95%
    service level z=1.64): ROP = μ_daily·L + z·σ_daily·√L — the planning
    output downstream of `part_inventory_turns`. Daily demand is the
    per-(part, ship-day) quantity sum over OBSERVED demand days (sparse
    calendar by construction — the σ is demand-day variability, stated
    rather than zero-filled; a dense-calendar variant just left-joins a
    day spine first). Two hash aggregations, both partial-aggregated;
    √L is a compile-time scalar. Parts below 5 observed days are
    excluded — no meaningful σ."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("d")
    ).agg(F.sum("l_quantity").alias("demand"))
    stats = (
        daily.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.avg("demand").alias("mean_daily"),
            F.stddev_samp("demand").alias("sd_daily"),
        )
        .filter(F.col("n_days") >= 5)
    )
    safety = 1.64 * F.col("sd_daily") * F.sqrt(F.lit(7.0))
    return stats.select(
        "l_partkey",
        F.col("n_days").cast("long").alias("n_days"),
        F.round("mean_daily", 6).alias("mean_daily"),
        F.round("sd_daily", 6).alias("sd_daily"),
        F.round(safety, 6).alias("safety_stock"),
        F.round(F.col("mean_daily") * 7 + safety, 6).alias(
            "reorder_point"
        ),
    )


@register(
    "revenue_pvm_decomposition",
    oracle="""
    WITH pins AS (
      SELECT min(l_shipdate) AS t0,
             min(l_shipdate) + INTERVAL 365 DAY AS t1,
             min(l_shipdate) + INTERVAL 730 DAY AS t2
      FROM lineitem
    ),
    per AS (
      SELECT l.l_partkey,
             CASE WHEN l.l_shipdate >= p.t0 AND l.l_shipdate < p.t1
                  THEN 1 ELSE 2 END AS period,
             sum(l.l_quantity) AS q,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
      FROM lineitem l CROSS JOIN pins p
      WHERE l.l_shipdate >= p.t0 AND l.l_shipdate < p.t2
      GROUP BY l.l_partkey,
               CASE WHEN l.l_shipdate >= p.t0 AND l.l_shipdate < p.t1
                    THEN 1 ELSE 2 END
    ),
    wide AS (
      SELECT coalesce(a.l_partkey, b.l_partkey) AS pk,
             a.q AS q1, a.rev / a.q AS p1,
             b.q AS q2, b.rev / b.q AS p2,
             coalesce(a.rev, 0.0) AS r1, coalesce(b.rev, 0.0) AS r2
      FROM (SELECT * FROM per WHERE period = 1) a
      FULL OUTER JOIN (SELECT * FROM per WHERE period = 2) b
        ON a.l_partkey = b.l_partkey
    ),
    eff AS (
      SELECT
        CASE WHEN q1 IS NOT NULL AND q2 IS NOT NULL THEN 'continuing'
             WHEN q1 IS NULL THEN 'new' ELSE 'discontinued' END AS bucket,
        round(r2 - r1, 4) AS d_total,
        CASE WHEN q1 IS NOT NULL AND q2 IS NOT NULL
             THEN round(q1 * (p2 - p1), 4) ELSE 0.0 END AS d_price,
        CASE WHEN q1 IS NOT NULL AND q2 IS NOT NULL
             THEN round(p1 * (q2 - q1), 4) ELSE 0.0 END AS d_volume,
        CASE WHEN q1 IS NOT NULL AND q2 IS NOT NULL
             THEN round((p2 - p1) * (q2 - q1), 4) ELSE 0.0 END AS d_cross
      FROM wide
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT)    AS n_parts,
           round(sum(d_total), 2)      AS delta_revenue,
           round(sum(d_price), 2)      AS price_effect,
           round(sum(d_volume), 2)     AS volume_effect,
           round(sum(d_cross), 2)      AS cross_effect,
           abs(sum(d_total)
               - (sum(d_price) + sum(d_volume) + sum(d_cross)))
             < 0.05 OR bucket <> 'continuing' AS decomposition_closes
    FROM eff GROUP BY bucket
    """,
)
def revenue_pvm_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Price–volume–mix revenue bridge between two consecutive years —
    the FP&A decomposition behind every 'why did revenue move' review:
    for parts sold in BOTH periods, ΔR splits exactly into
    q₁·Δp (price) + p₁·Δq (volume) + Δp·Δq (cross), with new and
    discontinued parts reported as their own buckets (their delta IS
    their revenue). Per-part effects are rounded to 4dp BEFORE the
    cross-part sums (the cohort-LTV float discipline) and the closure
    identity rides along as an oracle-checked boolean. One period-tagged
    groupBy + one full-outer self-alignment on partkey — both keyed on
    the part dimension, partial-aggregated, no window, no pair stage."""
    li = _t(spark, sf_dir, "lineitem")
    pins = li.agg(
        F.min("l_shipdate").alias("t0"),
        (F.min("l_shipdate") + F.expr("INTERVAL 365 DAYS")).alias("t1"),
        (F.min("l_shipdate") + F.expr("INTERVAL 730 DAYS")).alias("t2"),
    )
    tagged = (
        li.crossJoin(F.broadcast(pins))
        .filter(
            (F.col("l_shipdate") >= F.col("t0"))
            & (F.col("l_shipdate") < F.col("t2"))
        )
        .select(
            "l_partkey",
            F.when(F.col("l_shipdate") < F.col("t1"), 1)
            .otherwise(2)
            .alias("period"),
            "l_quantity",
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("net"),
        )
    )
    per = tagged.groupBy("l_partkey", "period").agg(
        F.sum("l_quantity").alias("q"), F.sum("net").alias("rev")
    )
    a = per.filter(F.col("period") == 1).select(
        F.col("l_partkey").alias("pk_a"),
        F.col("q").alias("q1"),
        (F.col("rev") / F.col("q")).alias("p1"),
        F.col("rev").alias("r1"),
    )
    b = per.filter(F.col("period") == 2).select(
        F.col("l_partkey").alias("pk_b"),
        F.col("q").alias("q2"),
        (F.col("rev") / F.col("q")).alias("p2"),
        F.col("rev").alias("r2"),
    )
    wide = a.join(b, a.pk_a == b.pk_b, "full_outer").select(
        F.coalesce("pk_a", "pk_b").alias("pk"),
        "q1",
        "p1",
        "q2",
        "p2",
        F.coalesce("r1", F.lit(0.0)).alias("r1"),
        F.coalesce("r2", F.lit(0.0)).alias("r2"),
    )
    both = F.col("q1").isNotNull() & F.col("q2").isNotNull()
    eff = wide.select(
        F.when(both, "continuing")
        .when(F.col("q1").isNull(), "new")
        .otherwise("discontinued")
        .alias("bucket"),
        F.round(F.col("r2") - F.col("r1"), 4).alias("d_total"),
        F.when(both, F.round(F.col("q1") * (F.col("p2") - F.col("p1")), 4))
        .otherwise(0.0)
        .alias("d_price"),
        F.when(both, F.round(F.col("p1") * (F.col("q2") - F.col("q1")), 4))
        .otherwise(0.0)
        .alias("d_volume"),
        F.when(
            both,
            F.round(
                (F.col("p2") - F.col("p1"))
                * (F.col("q2") - F.col("q1")),
                4,
            ),
        )
        .otherwise(0.0)
        .alias("d_cross"),
    )
    return eff.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(F.sum("d_total"), 2).alias("delta_revenue"),
        F.round(F.sum("d_price"), 2).alias("price_effect"),
        F.round(F.sum("d_volume"), 2).alias("volume_effect"),
        F.round(F.sum("d_cross"), 2).alias("cross_effect"),
        (
            (
                F.abs(
                    F.sum("d_total")
                    - (
                        F.sum("d_price")
                        + F.sum("d_volume")
                        + F.sum("d_cross")
                    )
                )
                < 0.05
            )
            | (F.first("bucket") != "continuing")
        ).alias("decomposition_closes"),
    )


@register(
    "cube_materialization_advisor",
    oracle="""
    WITH obs AS (
      SELECT event_type AS t, dayofweek(ts) AS w,
             GREATEST(LEAST(CAST(floor(value / 25) AS INT), 3), 0) AS v
      FROM events WHERE value IS NOT NULL
    ),
    cube_rows AS (
      SELECT grouping(t) AS gt, grouping(w) AS gw, grouping(v) AS gv
      FROM obs GROUP BY CUBE (t, w, v)
    ),
    per AS (
      SELECT gt, gw, gv, count(*) AS n_groups
      FROM cube_rows GROUP BY gt, gw, gv
    ),
    base AS (
      SELECT n_groups AS n_base FROM per
      WHERE gt = 0 AND gw = 0 AND gv = 0
    ),
    scored AS (
      SELECT concat(CASE WHEN gt = 0 THEN 't' ELSE '-' END,
                    CASE WHEN gw = 0 THEN 'w' ELSE '-' END,
                    CASE WHEN gv = 0 THEN 'v' ELSE '-' END) AS dims,
             n_groups,
             CAST(pow(2, (1 - gt) + (1 - gw) + (1 - gv)) AS BIGINT)
               AS n_answerable,
             b.n_base - n_groups AS storage_saving,
             CAST(pow(2, (1 - gt) + (1 - gw) + (1 - gv)) AS BIGINT)
               * (b.n_base - n_groups) AS benefit_score
      FROM per CROSS JOIN base b
    )
    SELECT dims,
           CAST(n_groups AS BIGINT) AS n_groups,
           n_answerable,
           CAST(storage_saving AS BIGINT) AS storage_saving,
           CAST(benefit_score AS BIGINT) AS benefit_score,
           CAST(row_number() OVER (ORDER BY benefit_score DESC, dims)
                AS BIGINT) AS greedy_rank
    FROM scored
    """,
)
def cube_materialization_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Materialized-view selection over the 3-dim cube lattice
    (event_type × weekday × value-tier), Harinarayan–Rajaraman–Ullman
    style: ONE cube pass counts the group cardinality of all 2³
    groupings simultaneously (each cube output row carries its
    grouping flags; counting rows per flag combination IS the per-view
    size estimate), then each candidate view is scored by
    benefit = (#queries it can answer: 2^|dims|) × (rows saved vs the
    finest view). The rank orders what to materialize first under a
    storage budget — the advisor every rollup pipeline runs before
    committing cube storage. Single shuffle for the cube (Spark's
    Expand feeds one hash aggregate), then an 8-row relation: the
    advisor costs one aggregation at any scale, and swapping exact
    counts for HLL partials makes the same plan stream-mergeable."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    obs = ev.select(
        F.col("event_type").alias("t"),
        # Spark dayofweek is 1..7 (Sun=1); DuckDB's is 0..6 (Sun=0).
        # Shift to the oracle's base so w's VALUES agree, not just the
        # (label-invariant) per-grouping-set counts the advisor emits.
        (F.dayofweek("ts") - F.lit(1)).alias("w"),
        F.greatest(
            F.least(F.floor(F.col("value") / 25).cast("int"), F.lit(3)),
            F.lit(0),
        ).alias("v"),
    )
    cube_rows = obs.cube("t", "w", "v").agg(
        F.grouping("t").alias("gt"),
        F.grouping("w").alias("gw"),
        F.grouping("v").alias("gv"),
    )
    per = cube_rows.groupBy("gt", "gw", "gv").agg(
        F.count(F.lit(1)).alias("n_groups")
    )
    # the base (finest) grouping's size comes from a window max over the
    # 8-row lattice relation — a filter+cross-join here would RECOMPUTE
    # the whole cube for the base branch (2 fact scans, 2 Expands;
    # caught by tests/test_plan_hygiene.py)
    w_all = Window.partitionBy()
    per = per.withColumn(
        "n_base",
        F.max(
            F.when(
                (F.col("gt") == 0)
                & (F.col("gw") == 0)
                & (F.col("gv") == 0),
                F.col("n_groups"),
            )
        ).over(w_all),
    )
    n_dims = (1 - F.col("gt")) + (1 - F.col("gw")) + (1 - F.col("gv"))
    answerable = F.pow(F.lit(2), n_dims).cast("long")
    scored = per.select(
        F.concat(
            F.when(F.col("gt") == 0, F.lit("t")).otherwise(F.lit("-")),
            F.when(F.col("gw") == 0, F.lit("w")).otherwise(F.lit("-")),
            F.when(F.col("gv") == 0, F.lit("v")).otherwise(F.lit("-")),
        ).alias("dims"),
        F.col("n_groups").cast("long").alias("n_groups"),
        answerable.alias("n_answerable"),
        (F.col("n_base") - F.col("n_groups"))
        .cast("long")
        .alias("storage_saving"),
        (answerable * (F.col("n_base") - F.col("n_groups")))
        .cast("long")
        .alias("benefit_score"),
    )
    # 8-row relation: the partitionless rank is bounded by the lattice
    # size (2^dims), never the data
    w = Window.orderBy(F.col("benefit_score").desc(), F.col("dims"))
    return scored.select(
        "*", F.row_number().over(w).cast("long").alias("greedy_rank")
    )


@register(
    "waterfill_budget_allocation",
    oracle="""
    WITH demand AS (
      SELECT event_type, sum(value) AS d
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    tot AS (SELECT sum(d) * 0.5 AS budget, count(*) AS k FROM demand),
    ranked AS (
      SELECT event_type, d,
             row_number() OVER (ORDER BY d, event_type) AS i,
             sum(d) OVER (ORDER BY d, event_type
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prefix
      FROM demand
    ),
    feas AS (
      SELECT r.*, t.budget, t.k,
             coalesce(r.prefix, 0.0)
               + r.d * (t.k - r.i + 1) <= t.budget AS fully_served
      FROM ranked r CROSS JOIN tot t
    ),
    lvl AS (
      SELECT max(CASE WHEN fully_served THEN i ELSE 0 END) AS j,
             max(CASE WHEN fully_served THEN coalesce(prefix, 0.0) + d
                      ELSE 0.0 END) AS p_j,
             any_value(budget) AS budget,
             any_value(k) AS k
      FROM feas
    )
    SELECT f.event_type,
           round(f.d, 4) AS demand,
           round(LEAST(f.d, CASE WHEN l.k > l.j
                                 THEN (l.budget - l.p_j) / (l.k - l.j)
                                 ELSE f.d END), 4) AS allocation,
           f.fully_served
    FROM feas f CROSS JOIN lvl l
    """,
)
def waterfill_budget_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Water-filling (max-min fair) budget allocation: a budget of half
    the total demand is split across event types so that small demands
    are fully served and the rest share the remaining budget equally at
    the water level λ = (B − Σ_{served} d) / (#unserved) — the
    proportional-fairness primitive behind quota assignment, capacity
    planning, and rate limiting. The classic sort-based solve needs
    only the #types-row demand relation: a prefix-sum feasibility scan
    (type i is fully servable iff prefix_{i−1} + d_i·(k−i+1) ≤ B)
    finds the last fully-served rank j in one window pass, and every
    allocation is closed-form from (j, prefix_j). All windows operate
    on the bounded demand relation, never the fact table; the fact
    scan is one partial-aggregated groupBy."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    demand = ev.groupBy("event_type").agg(F.sum("value").alias("d"))
    tot = demand.agg(
        (F.sum("d") * 0.5).alias("budget"),
        F.count(F.lit(1)).alias("k"),
    )
    # #types-row relation: the partitionless windows are bounded
    w_rank = Window.orderBy("d", "event_type")
    w_pre = Window.orderBy("d", "event_type").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = demand.select(
        "event_type",
        "d",
        F.row_number().over(w_rank).alias("i"),
        F.sum("d").over(w_pre).alias("prefix"),
    )
    feas = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "fully_served",
        F.coalesce(F.col("prefix"), F.lit(0.0))
        + F.col("d") * (F.col("k") - F.col("i") + 1)
        <= F.col("budget"),
    )
    lvl = feas.agg(
        F.max(
            F.when(F.col("fully_served"), F.col("i")).otherwise(0)
        ).alias("j"),
        F.max(
            F.when(
                F.col("fully_served"),
                F.coalesce(F.col("prefix"), F.lit(0.0)) + F.col("d"),
            ).otherwise(0.0)
        ).alias("p_j"),
        F.first("budget").alias("budget"),
        F.first("k").alias("k"),
    )
    out = feas.select("event_type", "d", "fully_served").crossJoin(
        F.broadcast(lvl)
    )
    level = F.when(
        F.col("k") > F.col("j"),
        (F.col("budget") - F.col("p_j")) / (F.col("k") - F.col("j")),
    ).otherwise(F.col("d"))
    return out.select(
        "event_type",
        F.round("d", 4).alias("demand"),
        F.round(F.least(F.col("d"), level), 4).alias("allocation"),
        "fully_served",
    )
