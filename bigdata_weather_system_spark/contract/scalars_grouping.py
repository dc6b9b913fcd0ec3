"""Contract queries: scalar functions, JSON, conditionals, grouping sets,
pivot, exact/approx distinct, percentiles.

Covers SURVEY §2.8 (scalar function families the reference uses) plus the
grouping-set/pivot/percentile capabilities Spark provides beyond the
reference (§2.4 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .core import register, _t


# ---------------------------------------------------------------------------
# String / regex scalar functions over documents (P-family parity)
# ---------------------------------------------------------------------------

@register(
    "doc_text_scalars",
    oracle="""
    SELECT doc_id,
           length(text)                                   AS n_chars_computed,
           length(trim(text))                             AS n_chars_trimmed,
           lower(substr(text, 1, 16))                     AS head_lower,
           CAST(CASE WHEN contains(text, 'spark') THEN 1 ELSE 0 END AS BIGINT) AS mentions_spark,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_consonantish,
           split_part(text, ' ', 1)                       AS first_token
    FROM documents
    """,
)
def doc_text_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/trim/length/substr/contains/regexp_replace/split (SURVEY §2.8)."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars_computed"),
        F.length(F.trim(t)).cast("long").alias("n_chars_trimmed"),
        F.lower(F.substring(t, 1, 16)).alias("head_lower"),
        F.when(t.contains("spark"), 1).otherwise(0).cast("long").alias("mentions_spark"),
        F.length(F.regexp_replace(t, "[aeiou]", "")).cast("long").alias("n_consonantish"),
        F.split_part(t, F.lit(" "), F.lit(1)).alias("first_token"),
    )


@register(
    "json_props_extract",
    oracle="""
    SELECT CAST(props->>'$.k' AS BIGINT) AS k_value, count(*) AS n,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY CAST(props->>'$.k' AS BIGINT)
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column (P2/P3 parity —
    get_json_object is the schema-tolerant cousin of from_json+getItem)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy(k.alias("k_value")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value")
    )


@register(
    "value_tier_case",
    oracle="""
    SELECT CASE WHEN value >= 150 THEN 'high'
                WHEN value >= 50  THEN 'mid'
                ELSE 'low' END AS tier,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1
    """,
)
def value_tier_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.when conditional chains (SURVEY §2.8 'Conditional')."""
    ev = _t(spark, sf_dir, "events")
    tier = (
        F.when(F.col("value") >= 150, "high")
        .when(F.col("value") >= 50, "mid")
        .otherwise("low")
    )
    return ev.groupBy(tier.alias("tier")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@register(
    "event_date_parts",
    oracle="""
    SELECT extract(year FROM ts)  AS y,
           extract(month FROM ts) AS m,
           extract(day FROM ts)   AS d,
           extract(hour FROM ts)  AS h,
           count(*) AS n
    FROM events GROUP BY 1, 2, 3, 4
    """,
)
def event_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction (hour/day/month/year — §2.8 'Date/time')."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube / pivot
# ---------------------------------------------------------------------------

@register(
    "rollup_returnflag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@register(
    "cube_type_day",
    oracle="""
    SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           count(*) AS n, round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY CUBE (event_type, CAST(CAST(ts AS DATE) AS VARCHAR))
    """,
)
def cube_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").cast("string").alias("day"), "value"
    )
    return ev.cube("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value")
    )


@register(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O",
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F"
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out


# ---------------------------------------------------------------------------
# Distinct counting + percentiles
# ---------------------------------------------------------------------------

@register(
    "distinct_users_per_type",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) with an in-query accuracy contract.

    Raw sketch estimates differ across engines by design, so the estimate
    itself can't be hash-compared; instead the query emits the exact
    count plus a Spark-computed ``within_5pct`` boolean, and the oracle
    asserts TRUE — the driver's hash gate now genuinely fails if the
    sketch drifts outside the 5% band (default rsd=0.05; HLL++ sparse
    mode is near-exact at these cardinalities)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users_exact"),
            F.approx_count_distinct("user_id").alias("_approx"),
        )
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("_approx") - F.col("n_users_exact"))
                / F.col("n_users_exact")
                <= 0.05
            ).alias("within_5pct"),
        )
    )


@register(
    "value_percentiles_per_type",
    oracle="""
    SELECT event_type,
           round(median(value), 4)                   AS median_value,
           round(quantile_cont(value, 0.90), 4)      AS p90_value,
           round(quantile_cont(value, 0.99), 4)      AS p99_value
    FROM events GROUP BY event_type
    """,
)
def value_percentiles_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (A9 parity: reference computes these
    driver-side, weather_utils.py:58-84 — here they stay in-plan)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.median("value"), 4).alias("median_value"),
        F.round(F.percentile("value", 0.90), 4).alias("p90_value"),
        F.round(F.percentile("value", 0.99), 4).alias("p99_value"),
    )


@register(
    "unit_conversions",
    oracle="""
    SELECT event_id, value,
           round(value * 9.0 / 5.0 + 32.0, 4) AS value_f,
           round(value + 273.15, 4)           AS value_k
    FROM events WHERE event_type = 'view'
    """,
)
def unit_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Celsius→F/K arithmetic in-plan (reference does this in Python,
    weather_utils.py:10-26 — pure column math needs no UDF)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    v = F.col("value")
    return ev.select(
        "event_id",
        "value",
        F.round(v * 9.0 / 5.0 + 32.0, 4).alias("value_f"),
        F.round(v + 273.15, 4).alias("value_k"),
    )


# ---------------------------------------------------------------------------
# Map-typed JSON promotion, cyclic time features, forward fill
# (P2-P4 / U3 / U5 — the reference's parse-and-feature core, in-plan)
# ---------------------------------------------------------------------------

@register(
    "props_map_promotion",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k_promoted,
           len(json_keys(props))         AS n_keys
    FROM events
    """,
)
def props_map_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-layer schema handling (SURVEY §1.3): from_json into an untyped
    MAP<string,string> staging column, then explicit promotion + cast of
    known keys (reference spark.py:131,186,219-245). Unknown keys survive
    in the map — no schema-inference scan at any corpus size."""
    from pyspark.sql import types as T

    ev = _t(spark, sf_dir, "events")
    payload = F.from_json(
        F.col("props"), T.MapType(T.StringType(), T.StringType())
    )
    staged = ev.withColumn("_payload", payload)
    return staged.select(
        "event_id",
        F.col("_payload").getItem("k").cast("long").alias("k_promoted"),
        F.size(F.map_keys("_payload")).cast("long").alias("n_keys"),
    )


@register(
    "event_cyclic_time_features",
    oracle="""
    SELECT event_id,
           round(sin(2 * pi() * ((hour(ts)*3600 + minute(ts)*60
                 + CAST(floor(second(ts)) AS BIGINT)) / 86400.0)), 6) + 0.0 AS tod_sin,
           round(cos(2 * pi() * ((hour(ts)*3600 + minute(ts)*60
                 + CAST(floor(second(ts)) AS BIGINT)) / 86400.0)), 6) + 0.0 AS tod_cos
    FROM events
    """,
)
def event_cyclic_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cyclic time-of-day encodings in-plan (U3 — the reference computes
    sin/cos driver-side per row, spark.py:48-71; pure column math here)."""
    from ..functions import cyclic_time_features

    ev = _t(spark, sf_dir, "events")
    feats = cyclic_time_features(F.col("ts"))
    # + 0.0 collapses IEEE negative zero (round can yield -0.0 on one engine
    # and +0.0 on the other for the same input — hash-visible difference)
    return ev.select(
        "event_id",
        (F.round(feats["tod_sin"], 6) + F.lit(0.0)).alias("tod_sin"),
        (F.round(feats["tod_cos"], 6) + F.lit(0.0)).alias("tod_cos"),
    )


@register(
    "forward_fill_values",
    oracle="""
    SELECT event_id, user_id,
           round(last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                 IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS filled_value
    FROM events
    """,
)
def forward_fill_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill over per-key order (U5 — the reference ffills a numpy
    matrix driver-side, spark.py:1420-1441; F.last(ignorenulls) keeps it
    distributed). Error-row values are nulled first, mimicking sensor gaps."""
    from ..functions import forward_fill

    # when(== 'error', NULL).otherwise(value), NOT when(!= 'error', value):
    # for a NULL event_type the latter nulls the value (condition unknown →
    # no branch) while the oracle's CASE keeps it — invert to match
    ev = _t(spark, sf_dir, "events").withColumn(
        "filled_value",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    out = forward_fill(
        ev, cols=["filled_value"], partition_cols=["user_id"], order_col="event_id"
    )
    return out.select(
        "event_id", "user_id", F.round("filled_value", 2).alias("filled_value")
    )


# ---------------------------------------------------------------------------
# Lateral explode + unpivot (generator / reshape family)
# ---------------------------------------------------------------------------

@register(
    "doc_shingle_explode",
    oracle="""
    SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(toks) - 2, 0) + 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
    FROM (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
      FROM documents WHERE doc_id < 100
    )
    """,
)
def doc_shingle_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/lateral-view family: explode one row into one row per
    3-word shingle (the fan-out primitive under MinHash/Jaccard dedup)."""
    from ..operators.text import word_shingles

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("shingle")
    )


@register(
    "unpivot_event_metrics",
    oracle="""
    SELECT event_id, 'value' AS metric, value AS metric_value FROM events
    UNION ALL
    SELECT event_id, 'user_id' AS metric, CAST(user_id AS DOUBLE) AS metric_value
    FROM events
    """,
)
def unpivot_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (melt/unpivot — the inverse of pivot_status_by_flag).
    Spark plans this as a generator expansion, no shuffle."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "user_id_d", F.col("user_id").cast("double")
    )
    return (
        ev.withColumnRenamed("value", "value_m")
        .melt(
            ids=["event_id"],
            values=["value_m", "user_id_d"],
            variableColumnName="metric",
            valueColumnName="metric_value",
        )
        .withColumn(
            "metric",
            F.when(F.col("metric") == "value_m", "value").otherwise("user_id"),
        )
    )


@register(
    "events_value_bins",
    oracle="""
    SELECT CAST(least(greatest(floor(value / 50.0), 0), 9) AS BIGINT) AS bin,
           count(*) AS n_rows,
           round(avg(value), 6) AS avg_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY 1
    """,
)
def events_value_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram binning (feature bucketing): clamp-floor bin
    id — portable arithmetic (DuckDB has no width_bucket), single partial
    hash agg keyed by 10 bins."""
    ev = _t(spark, sf_dir, "events")
    bin_col = (
        F.least(F.greatest(F.floor(F.col("value") / 50.0), F.lit(0)), F.lit(9))
        .cast("long")
        .alias("bin")
    )
    return ev.groupBy(bin_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "value_quartile_buckets",
    oracle="""
    WITH q AS (
      SELECT event_id, value,
             ntile(4) OVER (ORDER BY value, event_id) AS quartile
      FROM events
    )
    SELECT quartile, count(*) AS n_rows,
           round(min(value), 6) AS lo,
           round(max(value), 6) AS hi,
           round(avg(value), 6) AS avg_value
    FROM q GROUP BY quartile
    """,
)
def value_quartile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) bucketing via ntile over a unique total order
    — the data-adaptive twin of the fixed-width events_value_bins. The
    global sort is the cost at scale; for 100 TB swap to approx quantile
    cut points + the clamp-floor assignment (events_value_bins shape)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.orderBy(F.col("value").asc(), F.col("event_id").asc())
    q = ev.select(
        "value", F.ntile(4).over(w).cast("long").alias("quartile")
    )
    return q.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


@register(
    "weighted_mean_value_by_type",
    oracle="""
    SELECT event_type,
           round(sum(value * user_id)
                 / sum(CASE WHEN value IS NOT NULL THEN user_id END), 6)
             AS w_mean,
           count(*) AS n_rows
    FROM events
    WHERE user_id > 0
    GROUP BY event_type
    """,
)
def weighted_mean_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via GROUPED_AGG pandas UDF (Arrow-vectorized
    UDAF), oracled against the plain-SQL formulation — the pattern for
    aggregates Spark lacks built-in. No partial agg for Python UDAFs:
    bounded groups only (here: a handful of event types)."""
    from ..functions.python_udfs import weighted_mean

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") > 0)
    # a GROUPED_AGG pandas UDF cannot share an agg() with built-in
    # aggregates — compute the count in a second agg and join (both sides
    # reuse the same shuffle distribution on event_type)
    wm = ev.groupBy("event_type").agg(
        F.round(
            weighted_mean(F.col("value"), F.col("user_id").cast("double")), 6
        ).alias("w_mean")
    )
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_rows"))
    return wm.join(counts, on="event_type")


@register(
    "zscore_values_per_user",
    oracle="""
    SELECT event_id, user_id, value,
           CASE WHEN stddev_pop(value) OVER w = 0 THEN 0.0
                ELSE round((value - avg(value) OVER w) / stddev_pop(value) OVER w, 6)
           END AS zscore
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def zscore_values_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score via applyInPandas (grouped-map Arrow UDF), oracled
    against the pure-window SQL formulation — pins that the pandas path
    computes exactly what the relational path would."""
    from ..functions.python_udfs import zscore_per_group

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = zscore_per_group(ev, ["user_id"], "value")
    return out.select(
        "event_id", "user_id", "value", F.round("zscore", 6).alias("zscore")
    )


@register(
    "props_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS BIGINT)
             AS k_mod10,
           json_extract_string(props, '$.missing') IS NULL AS missing_is_null
    FROM events
    """,
)
def props_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path: ``parse_json`` → binary variant →
    typed ``try_variant_get`` extraction. Variant is the engine-native
    answer to schemaless JSON columns at scale — parsed ONCE into a
    binary form that supports typed path access without re-tokenizing
    the string per expression (the ``from_json``-with-full-schema
    alternative needs the schema up front; the per-expression
    ``get_json_object`` re-parses every call). The oracle reads the same
    paths with DuckDB's JSON extraction."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k_int"),
        (k % 10).cast("long").alias("k_mod10"),
        F.try_variant_get(v, "$.missing", "string").isNull().alias(
            "missing_is_null"
        ),
    )


@register(
    "mad_value_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS ad, m.med
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (SELECT event_type, median(ad) AS mad FROM dev GROUP BY event_type)
    SELECT d.event_type,
           cast(count(*) AS BIGINT)   AS n_events,
           round(any_value(d.med), 4) AS median_value,
           round(any_value(m.mad), 4) AS mad_value,
           cast(sum(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def mad_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation: flag rows
    with |x − median| > 3·MAD per event type — the breakdown-point-0.5
    alternative to z-scores, whose mean/stddev an outlier itself drags.
    Two median passes; the per-group medians are broadcast back (a
    handful of rows), so the corpus is scanned twice and never
    shuffled wide."""
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("_med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "_med",
        F.abs(F.col("value") - F.col("_med")).alias("_ad"),
    )
    mad = dev.groupBy("event_type").agg(F.median("_ad").alias("_mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("_med"), 4).alias("median_value"),
            F.round(F.min("_mad"), 4).alias("mad_value"),
            F.sum((F.col("_ad") > 3 * F.col("_mad")).cast("long")).alias(
                "n_outliers"
            ),
        )
    )


@register(
    "k_anonymity_audit",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(floor(value) AS BIGINT) AS vb
      FROM events
    ),
    g AS (SELECT event_type, d, vb, count(*) AS n FROM q
          GROUP BY event_type, d, vb)
    SELECT cast(count(*) AS BIGINT)                          AS n_groups,
           cast(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
                                                             AS n_violating_groups,
           cast(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
                                                             AS n_rows_at_risk,
           cast(min(n) AS BIGINT)                            AS min_group_size
    FROM g
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the quasi-identifier (event_type, day,
    floor(value)): how many equivalence classes are small enough to
    re-identify a user — the privacy gate a training-data release runs
    before shipping. One groupBy on the quasi-identifier, one 1-row
    summary; at 100 TB the quasi-id groupBy is the only shuffle and
    combines map-side."""
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.floor("value").cast("long").alias("vb"),
    )
    g = q.groupBy("event_type", "d", "vb").agg(F.count(F.lit(1)).alias("n"))
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("n") < 5).cast("long")).alias("n_violating_groups"),
        F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0)).alias(
            "n_rows_at_risk"
        ),
        F.min("n").alias("min_group_size"),
    )
