"""Contract query: Markov removal-effect attribution.

The third member of the attribution family — `attribution_decay_credit`
(position/recency heuristic) and `shapley_channel_attribution`
(cooperative-game exact credit) already exist; this adds the
data-driven absorbing-Markov-chain model: user journeys become a
first-order chain over channels with START / CONV / DROP states, the
baseline conversion probability is the chain's absorption mass at CONV,
and each channel's credit is its REMOVAL EFFECT — how much absorption
drops when every hop into that channel is redirected to DROP.

Execution shape: the O(data) work is one journey window + one
transition groupBy; the bounded (states ≤ channels+3)² matrix then
collapses to a SINGLE ROW holding the sorted entry list, and all five
power iterations (full + one per removed channel) run as chained
narrow projections over that row — array expressions, ZERO shuffles
per round. Every per-target accumulation folds over the
(src, dst, p)-sorted entry list, and the oracle's unrolled MATERIALIZED
rounds fold with the identical ORDER BY, so both engines execute the
same float sequence (the markov_stationary / BM25 / ANOVA discipline).
Removal variants keep redirected entries UNMERGED on both sides —
merging would turn π·p₁ + π·p₂ into π·(p₁+p₂), a different float
sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .core import register, _t

_CHANNELS = ["click", "error", "signup", "view"]
_ROUNDS = 12
_STATES = sorted(["CONV", "DROP", "START"] + _CHANNELS)


def _oracle() -> str:
    variants = {"full": None, **{c: c for c in _CHANNELS}}
    parts = [
        """
WITH firstconv AS (
  SELECT user_id, min(ts) AS conv_ts
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
chan AS (
  SELECT e.user_id, e.ts, e.event_id, e.event_type,
         row_number() OVER (PARTITION BY e.user_id
                            ORDER BY e.ts, e.event_id) AS step
  FROM events e LEFT JOIN firstconv f ON f.user_id = e.user_id
  WHERE e.event_type IN ('click', 'error', 'signup', 'view')
    AND (f.conv_ts IS NULL OR e.ts < f.conv_ts)
),
nodes AS (
  SELECT user_id, 0 AS step, 'START' AS state
  FROM (SELECT DISTINCT user_id FROM events)
  UNION ALL
  SELECT user_id, step, event_type FROM chan
  UNION ALL
  SELECT u.user_id,
         coalesce((SELECT max(step) FROM chan c
                   WHERE c.user_id = u.user_id), 0) + 1,
         CASE WHEN f.user_id IS NULL THEN 'DROP' ELSE 'CONV' END
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN firstconv f ON f.user_id = u.user_id
),
hops AS (
  SELECT state AS src,
         lead(state) OVER (PARTITION BY user_id ORDER BY step) AS dst
  FROM nodes
),
m0 AS MATERIALIZED (
  SELECT src, dst,
         count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY src) AS p
  FROM hops WHERE dst IS NOT NULL GROUP BY src, dst
  UNION ALL SELECT 'CONV', 'CONV', 1.0
  UNION ALL SELECT 'DROP', 'DROP', 1.0
)"""
    ]
    for v, removed in variants.items():
        if removed is None:
            parts.append(f",\nm_{v} AS MATERIALIZED (SELECT * FROM m0)")
        else:
            # UNMERGED redirect — see module docstring
            parts.append(f""",
m_{v} AS MATERIALIZED (
  SELECT src,
         CASE WHEN dst = '{removed}' THEN 'DROP' ELSE dst END AS dst,
         p
  FROM m0 WHERE src <> '{removed}'
)""")
        parts.append(
            f",\nv_{v}_0 AS (SELECT 'START' AS t, 1.0 AS pi)"
        )
        for r in range(1, _ROUNDS + 1):
            parts.append(f""",
v_{v}_{r} AS MATERIALIZED (
  SELECT m.dst AS t,
         list_reduce(list(v.pi * m.p ORDER BY m.src, m.dst, m.p),
                     (a, b) -> a + b) AS pi
  FROM m_{v} m JOIN v_{v}_{r - 1} v ON v.t = m.src
  GROUP BY m.dst
)""")
        parts.append(f""",
p_{v} AS (
  SELECT coalesce((SELECT pi FROM v_{v}_{_ROUNDS} WHERE t = 'CONV'),
                  0.0) AS p
)""")
    eff_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, (SELECT p FROM p_{c}) AS p_without"
        for c in _CHANNELS
    )
    parts.append(f""",
eff AS ({eff_rows}),
scored AS (
  SELECT channel, p_without,
         1.0 - p_without / (SELECT p FROM p_full) AS effect
  FROM eff
),
tot AS (
  SELECT list_reduce(list(effect ORDER BY channel), (a, b) -> a + b)
    AS s
  FROM scored
)
SELECT s.channel,
       round((SELECT p FROM p_full), 6)  AS p_conv_full,
       round(s.p_without, 6)             AS p_conv_without,
       round(s.effect, 6)                AS removal_effect,
       round(s.effect / t.s, 6)          AS attribution_share
FROM scored s CROSS JOIN tot t""")
    return "".join(parts)


@register("markov_removal_attribution", oracle=_oracle())
def markov_removal_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Markov removal-effect channel attribution (see module docstring).
    Scale shape: one window pass over events builds the journey chain,
    one groupBy builds the bounded transition relation, one agg folds
    it into a single sorted-entry-array row, and the 5 × 12 power
    rounds are chained narrow projections over that row — zero shuffles
    after the transition agg, constant work at any corpus size."""
    ev = _t(spark, sf_dir, "events")
    firstconv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    users = ev.select("user_id").distinct()
    chan = (
        ev.filter(F.col("event_type").isin(*_CHANNELS))
        .join(firstconv, "user_id", "left")
        .filter(
            F.col("conv_ts").isNull() | (F.col("ts") < F.col("conv_ts"))
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("state"),
        )
        .withColumn(
            "step",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .select("user_id", "step", "state")
    )
    maxstep = chan.groupBy("user_id").agg(
        F.max("step").alias("max_step")
    )
    start = users.select(
        "user_id", F.lit(0).alias("step"), F.lit("START").alias("state")
    )
    terminal = (
        users.join(maxstep, "user_id", "left")
        .join(
            firstconv.select("user_id", F.lit(1).alias("_c")),
            "user_id",
            "left",
        )
        .select(
            "user_id",
            (F.coalesce(F.col("max_step"), F.lit(0)) + 1).alias("step"),
            F.when(F.col("_c").isNotNull(), F.lit("CONV"))
            .otherwise(F.lit("DROP"))
            .alias("state"),
        )
    )
    nodes = start.unionByName(chan).unionByName(terminal)
    hops = nodes.select(
        F.col("state").alias("src"),
        F.lead("state")
        .over(Window.partitionBy("user_id").orderBy("step"))
        .alias("dst"),
    ).filter(F.col("dst").isNotNull())
    wsrc = Window.partitionBy("src")
    m_data = (
        hops.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "src",
            "dst",
            (F.col("n") * 1.0 / F.sum("n").over(wsrc)).alias("p"),
        )
    )
    loops = spark.createDataFrame(
        [("CONV", "CONV", 1.0), ("DROP", "DROP", 1.0)],
        "src string, dst string, p double",
    )
    m0 = m_data.unionByName(loops)

    # --- collapse the bounded matrix to one sorted-entry-array row ----
    states_arr = F.array(*[F.lit(s) for s in _STATES])
    start_arr = F.array(
        *[F.lit(1.0 if s == "START" else 0.0) for s in _STATES]
    )
    conv_idx = _STATES.index("CONV") + 1  # element_at is 1-based

    row = m0.agg(
        F.array_sort(F.collect_list(F.struct("src", "dst", "p"))).alias(
            "e_full"
        )
    )

    def redirected(c: str):
        return F.array_sort(
            F.transform(
                F.filter(F.col("e_full"), lambda e: e["src"] != c),
                lambda e: F.struct(
                    e["src"].alias("src"),
                    F.when(e["dst"] == c, F.lit("DROP"))
                    .otherwise(e["dst"])
                    .alias("dst"),
                    e["p"].alias("p"),
                ),
            )
        )

    variants = ["full"] + _CHANNELS
    row = row.select(
        "e_full",
        *[redirected(c).alias(f"e_{c}") for c in _CHANNELS],
        *[start_arr.alias(f"pi_{v}") for v in variants],
    )

    def one_round(pi_col: str, e_col: str):
        return F.transform(
            states_arr,
            lambda t: F.aggregate(
                F.filter(F.col(e_col), lambda e: e["dst"] == t),
                F.lit(0.0),
                lambda acc, e: acc
                + F.element_at(
                    F.col(pi_col),
                    F.array_position(states_arr, e["src"]).cast("int"),
                )
                * e["p"],
            ),
        )

    entry_cols = ["e_full"] + [f"e_{c}" for c in _CHANNELS]
    for _ in range(_ROUNDS):
        # the repartition(1) of a 1-row relation is a deliberate barrier:
        # without it CollapseProject inlines every round's π into the
        # next round's fold lambda, where per-entry re-evaluation makes
        # the collapsed expression exponential in rounds. With the
        # barrier each round's π is computed exactly once per row.
        row = row.repartition(1).select(
            *entry_cols,
            *[
                one_round(f"pi_{v}", f"e_{v if v != 'full' else 'full'}")
                .alias(f"pi_{v}")
                for v in variants
            ],
        )
    final = row.select(
        F.element_at("pi_full", conv_idx).alias("p_full"),
        *[
            F.element_at(f"pi_{c}", conv_idx).alias(f"p_{c}")
            for c in _CHANNELS
        ],
    )
    # effects fold in channel-sorted order (matches ORDER BY channel)
    eff_exprs = [
        (1.0 - F.col(f"p_{c}") / F.col("p_full")).alias(f"eff_{c}")
        for c in sorted(_CHANNELS)
    ]
    final = final.select("p_full", *[F.col(f"p_{c}") for c in _CHANNELS],
                         *eff_exprs)
    tot = F.aggregate(
        F.array(*[F.col(f"eff_{c}") for c in sorted(_CHANNELS)]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    long = final.select(
        "p_full",
        tot.alias("s"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("channel"),
                        F.col(f"p_{c}").alias("p_without"),
                        F.col(f"eff_{c}").alias("effect"),
                    )
                    for c in _CHANNELS
                ]
            )
        ).alias("x"),
    )
    return long.select(
        F.col("x.channel").alias("channel"),
        F.round("p_full", 6).alias("p_conv_full"),
        F.round("x.p_without", 6).alias("p_conv_without"),
        F.round("x.effect", 6).alias("removal_effect"),
        F.round(F.col("x.effect") / F.col("s"), 6).alias(
            "attribution_share"
        ),
    )
