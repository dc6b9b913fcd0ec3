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

    # --- bounded-matrix power rounds: driver-side since round 8 -------
    # The O(data) work ends at m0 (one window pass + one transition
    # groupBy). m0 is BOUNDED — at most (channels+3)² ≈ 49 entries — so
    # the 5 × 12 power rounds are constant work on constant data. The
    # previous formulation ran them as 12 chained repartition(1)
    # barriers over a 1-row relation (each an Exchange + AQE stage on
    # one row: pure stage-latency, ~3s of the query's 4.4s at sf0.1 and
    # the same dead weight on a cluster). Collecting the ≤49-entry
    # matrix and folding in plain Python is the repo's bounded
    # driver-side-shaping pattern (BPE merge collect, codebook means) —
    # and the float sequence is replicated EXACTLY: entries fold in
    # (src, dst, p)-sorted order per target state, products then adds,
    # IEEE doubles in both engines (oracle parity pins it).
    entries = sorted(
        (r["src"], r["dst"], float(r["p"])) for r in m0.collect()
    )

    def redirected(c: str) -> list:
        return sorted(
            (src, "DROP" if dst == c else dst, p)
            for src, dst, p in entries
            if src != c
        )

    idx = {s: i for i, s in enumerate(_STATES)}

    def power(ents: list) -> float:
        pi = [1.0 if s == "START" else 0.0 for s in _STATES]
        for _ in range(_ROUNDS):
            nxt = []
            for t in _STATES:
                acc = 0.0
                for src, dst, p in ents:
                    if dst == t:
                        acc = acc + pi[idx[src]] * p
                nxt.append(acc)
            pi = nxt
        return pi[idx["CONV"]]

    p_full = power(entries)
    p_without = {c: power(redirected(c)) for c in _CHANNELS}
    eff = {c: 1.0 - p_without[c] / p_full for c in _CHANNELS}
    # effects fold in channel-sorted order (matches ORDER BY channel)
    tot = 0.0
    for c in sorted(_CHANNELS):
        tot = tot + eff[c]
    raw = spark.createDataFrame(
        [
            (c, p_full, p_without[c], eff[c], eff[c] / tot)
            for c in _CHANNELS
        ],
        "channel string, p_full double, p_without double, "
        "effect double, share double",
    )
    # rounding stays in-engine so HALF_UP double rounding is identical
    # to every other contract query's
    return raw.select(
        "channel",
        F.round("p_full", 6).alias("p_conv_full"),
        F.round("p_without", 6).alias("p_conv_without"),
        F.round("effect", 6).alias("removal_effect"),
        F.round("share", 6).alias("attribution_share"),
    )
