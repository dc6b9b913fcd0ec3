"""Temporal operators Spark lacks as built-ins: as-of join, sessionization.

The reference meets its "latest value at time T" needs with window-rank
dedup (SURVEY §2.3, reference spark.py:256-267); these operators are the
general forms a training-data pipeline needs, expressed as single-shuffle
DataFrame plans:

- **as-of join** (backward): for each left row, the latest right row with
  the same key and ``right_ts <= left_ts``. Implemented as a tagged
  union + forward-fill window — one shuffle on the join key, no range
  explosion, no per-row driver work. This is the standard scalable shape
  (a sort-merge within key partitions); a naive ``join + filter + argmax``
  would materialize O(left × right-per-key) intermediates.
- **sessionization**: gap-based session ids per key via lag + cumulative
  sum — two window passes over one shuffle, the batch twin of Structured
  Streaming's ``F.session_window``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: the latest right row at or before each left row
    (``direction="backward"``, the default) or the earliest right row at
    or after it (``direction="forward"``).

    ``right`` must be unique per (``on``, ``right_ts``) — pre-dedup it
    (e.g. ``dedup_latest``) for deterministic results. All ``right_cols``
    (default: every non-key right column, including ``right_ts``) are
    appended to the left rows; unmatched left rows keep them null.

    Plan shape: union the two inputs tagged by side, sort within each key
    partition by (event time, side) so right rows at an equal timestamp
    sort toward the left row (inclusive bound), then fill the right
    payload across the frame — ``last(ignorenulls)`` over the preceding
    frame for backward, ``first(ignorenulls)`` over the following frame
    for forward. One shuffle on ``on``; no driver-side loops; works
    unchanged at any per-key history length.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported as-of direction: {direction!r}")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]
    payload = F.struct(
        *[F.col(c) for c in right_cols],
        F.col(right_ts).alias("_matched_ts"),
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        payload.alias("_rp"),
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
    )
    tagged = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        # right rows at an equal timestamp sort FIRST (side 0 < 1) so the
        # <= bound is inclusive; fill from the past
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ats").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = F.last("_rp", ignorenulls=True).over(w)
        gap = F.col("_ats").cast("double") - F.col("_rp._matched_ts").cast("double")
    else:
        # right rows at an equal timestamp sort LAST so the >= bound is
        # inclusive; fill from the future
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ats").asc(), F.col("_side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        fill = F.first("_rp", ignorenulls=True).over(w)
        gap = F.col("_rp._matched_ts").cast("double") - F.col("_ats").cast("double")
    filled = tagged.withColumn("_rp", fill)
    out = filled.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        out = out.withColumn(
            "_rp", F.when(gap <= F.lit(float(tolerance_seconds)), F.col("_rp"))
        )
    for c in right_cols:
        out = out.withColumn(c, F.col(f"_rp.{c}"))
    return out.drop("_ats", "_side", "_rp")


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: float,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign gap-based session ids per key.

    A row starts a new session when it is the first for its key or arrives
    more than ``gap_seconds`` after the previous row. Adds ``session_id``
    (1-based per key). Batch equivalent of ``F.session_window(ts, gap)``
    but keyed by ordinal id so sessions are joinable/groupable directly.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.col(ts_col).cast("double") - prev_ts.cast("double")) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("session_id", F.sum(new_session).over(wsum).cast("long"))


def session_profiles(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: float,
    value_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Sessionize then aggregate one row per session (bounds, size, sum)."""
    s = sessionize(df, key_cols, ts_col, gap_seconds, tiebreak_cols)
    return s.groupBy(*key_cols, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 2).alias("total_value"),
    )


def range_band_join(
    df: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join rows to the band whose [lo, hi) interval contains ``value_col``.

    The band table is broadcast — a non-equi broadcast nested-loop join,
    which is the right physical plan when the band side is small (tiers,
    histograms, SLA buckets). For two large interval sets, bucketize both
    sides to an equi-join key first.
    """
    cond = (F.col(value_col) >= bands[lo_col]) & (F.col(value_col) < bands[hi_col])
    return df.join(F.broadcast(bands), cond, "inner")


def resample_to_grid(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    step_seconds: int,
    value_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
    interpolate: bool = False,
) -> DataFrame:
    """Regular-grid resample with forward fill per key — the gap-filling
    twin of the reference's 12-events/hour cadence assumption (reference
    spark.py:809-810 treats the feed as a dense grid; real crawls miss
    cycles, so a downstream consumer needs the dense grid made explicit).

    Stages, all partitioned by key (no global shuffle):

    1. snap observations to the grid: ``floor(epoch/step)*step``; keep the
       LATEST observation per (key, bucket) (desc rank over ts +
       tiebreaks);
    2. per-key dense grid: ``sequence(min_bucket, max_bucket, step)``
       exploded — rows = span/step per key, generated executor-side;
    3. left join observations onto the grid (co-partitioned equi-join on
       (key, bucket) — AQE handles per-key skew);
    4. forward-fill ``value_cols`` with ``last(ignorenulls)`` over the
       key-partitioned grid order. The first grid point of every key is
       an observation by construction, so filled columns have no leading
       nulls.

    Adds ``grid_ts``, ``is_observed``, and ``<c>_ffill`` per value col;
    with ``interpolate=True`` also ``<c>_lerp`` — linear interpolation
    between the surrounding NON-NULL observations of that column
    (anchors are tracked per column, so a bucket observed with a null
    value is interpolated across, not used as an anchor), falling back
    to forward fill after the last observation. Interpolation adds one
    backward window pass (``first(ignorenulls)`` over the following
    frame) on the same key partitioning — no extra shuffle.
    """
    keys = [F.col(k) for k in key_cols]
    epoch = F.col(ts_col).cast("double") / F.lit(step_seconds)
    bucket = F.timestamp_seconds(
        F.floor(epoch).cast("long") * F.lit(step_seconds)
    )
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    wlatest = Window.partitionBy(*keys, F.col("grid_ts")).orderBy(*order)
    # project before the rank window: the (key, bucket) shuffle should
    # carry only the columns this operator needs, not the full input row
    # (deduped — ts/value columns may double as tiebreaks)
    needed: list[str] = []
    for c in (*key_cols, ts_col, *tiebreak_cols, *value_cols):
        if c not in needed:
            needed.append(c)
    src = df.select(*needed)
    latest = (
        src.withColumn("grid_ts", bucket)
        .withColumn("_rn", F.row_number().over(wlatest))
        .filter(F.col("_rn") == 1)
        .select(*key_cols, "grid_ts", *[F.col(c) for c in value_cols])
        .withColumn("_obs", F.lit(True))
    )
    # bounds come from the RAW rows, not from `latest`: per-key min/max
    # bucket is invariant under the latest-per-bucket dedup, and deriving
    # it upstream keeps the rank-window subtree out of this branch (plans
    # as a cheap partial-agg scan; Catalyst cannot share the window
    # diamond otherwise)
    bounds = src.select(*key_cols, bucket.alias("grid_ts")).groupBy(*keys).agg(
        F.min("grid_ts").alias("_mn"), F.max("grid_ts").alias("_mx")
    )
    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(
                F.col("_mn"),
                F.col("_mx"),
                F.expr(f"INTERVAL {int(step_seconds)} SECONDS"),
            )
        ).alias("grid_ts"),
    )
    joined = grid.join(latest, on=[*key_cols, "grid_ts"], how="left")
    wfill = (
        Window.partitionBy(*keys)
        .orderBy(F.col("grid_ts").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined.withColumn(
        "is_observed", F.coalesce(F.col("_obs"), F.lit(False))
    )
    for c in value_cols:
        out = out.withColumn(
            f"{c}_ffill", F.last(F.col(c), ignorenulls=True).over(wfill)
        )
    if interpolate:
        wback = (
            Window.partitionBy(*keys)
            .orderBy(F.col("grid_ts").asc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        gts = F.col("grid_ts").cast("double")
        for c in value_cols:
            # per-column anchors: a bucket observed with a NULL value for
            # this column is not an anchor — its timestamp must not skew
            # the interpolation weight of the surrounding real values
            anchor_ts = F.when(F.col(c).isNotNull(), F.col("grid_ts"))
            prev_t = F.last(anchor_ts, ignorenulls=True).over(wfill).cast("double")
            next_t = F.first(anchor_ts, ignorenulls=True).over(wback).cast("double")
            prev_v = F.last(F.col(c), ignorenulls=True).over(wfill)
            next_v = F.first(F.col(c), ignorenulls=True).over(wback)
            frac = (gts - prev_t) / (next_t - prev_t)
            out = out.withColumn(
                f"{c}_lerp",
                F.when(F.col(c).isNotNull(), F.col(c))
                .when(next_v.isNull(), prev_v)
                .otherwise(prev_v + (next_v - prev_v) * frac),
            )
    return out.drop("_obs", *value_cols)


def interval_containment_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: Sequence[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Equi-join-shaped containment join of points against intervals
    ``[lo, hi)`` sharing the key — the LARGE×LARGE path that
    ``range_band_join``'s broadcast nested loop cannot take.

    Both sides are bucketized on ``floor(x / bucket_width)``: each
    interval explodes to the buckets it covers (executor-side
    ``sequence``), each point maps to its single bucket, and the join
    becomes a plain shuffled equi-join on (keys..., bucket) with the
    exact ``lo <= p < hi`` predicate as a post-filter. A point matches an
    interval in exactly ONE bucket (its own), so no dedup pass is needed.
    Cost scales with Σ interval_span/bucket_width — size the width near
    the typical interval span so most intervals explode to O(1) buckets.
    ``how='left'`` keeps unmatched points (interval columns null).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_containment_join: unsupported how={how!r}")
    keys = list(key_cols)
    # 'left' rejoins matched rows back onto the point side; (keys, point)
    # is NOT unique in general (two events can share a timestamp), so tag
    # each point row with a unique id and rejoin on that — joining on the
    # point value would cross-multiply duplicate (key, point) rows.
    src = (
        points
        if how == "inner"
        else points.withColumn("_pid", F.monotonically_increasing_id())
    )
    pb = src.withColumn(
        "_bucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                # floor(hi/width) may cover one bucket past an exclusive
                # hi that sits exactly on a boundary — a harmless
                # candidate superset; the exact containment filter below
                # removes false matches
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    contained = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) < F.col(hi_col)
    )
    matched = pb.join(ib, on=keys + ["_bucket"]).filter(contained).drop("_bucket")
    if how == "inner":
        return matched
    icols = [c for c in ib.columns if c not in keys + ["_bucket"]]
    return (
        src.join(matched.select("_pid", *icols), on="_pid", how="left")
        .drop("_pid")
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    state_col: str,
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type-2 build: collapse each key's ordered
    state stream into validity intervals ``[valid_from, valid_to)``,
    merging CONSECUTIVE rows with an unchanged state (the classic SCD2
    compaction a warehouse runs on a mutation/event log).

    Change detection (lag), run-grouping (cumulative sum), the interval
    agg, and the valid_to/version windows all share ONE hash partitioning
    on the key — a single shuffle end-to-end regardless of history depth.
    Output per interval: keys, ``state``, ``version`` (1-based per key),
    ``valid_from``, ``valid_to`` (null = current), ``n_events``,
    ``is_current``.
    """
    keys = [F.col(k) for k in key_cols]
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    state = F.col(state_col)
    changed = (
        F.lag(state).over(w).isNull() | (state != F.lag(state).over(w))
    ).cast("long")
    run = F.sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = (
        df.select(
            *keys,
            state,
            F.col(ts_col),
            *[F.col(c) for c in tiebreak_cols],
            changed.alias("_chg"),
        )
        .withColumn("_run", run)
        .groupBy(*key_cols, "_run", state_col)
        .agg(
            F.min(ts_col).alias("valid_from"),
            F.count("*").alias("n_events"),
        )
    )
    w2 = Window.partitionBy(*key_cols).orderBy("valid_from")
    return (
        seg.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("version", F.row_number().over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_run")
    )


def ohlc_bars(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_secs: int = 21600,
) -> DataFrame:
    """Open/high/low/close (+count/avg) bars per key and fixed time bucket
    — the downsampling shape time-series stores call a rollup.

    One partial-aggregable pass: open/close ride ``min_by``/``max_by`` on
    a zero-padded ``(epoch_us, tiebreak)`` string key (totally ordered and
    mergeable, so map-side combine still applies — no window, no second
    shuffle). Bucket is an epoch-derived long, scale-safe like the epoch
    bucketing in ``operators/profile.py``.
    """
    okey = F.format_string(
        "%020d%020d", F.unix_micros(F.col(ts_col)), F.col(tiebreak_col)
    )
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_secs).cast(
        "long"
    )
    v = F.col(value_col)
    return (
        df.select(
            *[F.col(k) for k in key_cols],
            bucket.alias("bucket"),
            v.alias("_v"),
            okey.alias("_ok"),
        )
        .groupBy(*key_cols, "bucket")
        .agg(
            F.min_by("_v", "_ok").alias("open"),
            F.max("_v").alias("high"),
            F.min("_v").alias("low"),
            F.max_by("_v", "_ok").alias("close"),
            F.count("*").alias("n"),
            F.round(F.avg("_v"), 6).alias("avg_value"),
        )
    )


def cusum_flags(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    slack_sigmas: float = 0.5,
    threshold_sigmas: float = 4.0,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """One-sided upper CUSUM change-point detection per key, computed
    entirely with window algebra — no recursion, no UDF, no state store.

    The textbook recurrence S_k = max(0, S_{k-1} + (x_k − μ − kσ)) looks
    sequential, but has the closed form

        S_k = P_k − min(0, min_{j≤k} P_j),   P_k = Σ_{i≤k} (x_i − μ − kσ)

    (the reset-at-zero is exactly "subtract the running minimum of the
    prefix sum, floored at the implicit P₀ = 0"). That turns a stateful
    scan into: per-key mean/stddev (one unordered window), a running sum,
    and a running min — all on ONE (key) partitioning, so the whole
    detector costs a single shuffle at any scale. A point is flagged when
    S_k exceeds ``threshold_sigmas``·σ.

    Output adds ``cusum`` (rounded, 6dp) and ``cusum_flag`` columns.
    Constant series (σ = 0 or a single row) never flag.
    """
    keys = [F.col(c) for c in key_cols]
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    wstat = Window.partitionBy(*keys)
    wrun = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    mu = F.avg(value_col).over(wstat)
    sigma = F.coalesce(F.stddev_samp(value_col).over(wstat), F.lit(0.0))
    d = F.col(value_col) - F.col("_mu") - F.lit(slack_sigmas) * F.col("_sigma")
    out = (
        df.withColumn("_mu", mu)
        .withColumn("_sigma", sigma)
        .withColumn("_p", F.sum(d).over(wrun))
        .withColumn("_rmin", F.least(F.lit(0.0), F.min("_p").over(wrun)))
    )
    s = F.col("_p") - F.col("_rmin")
    # flag compares ROUNDED statistic to ROUNDED threshold: the raw
    # comparison could flip between engines when S sits within an ulp of
    # the threshold (different partial-agg orders for mu/sigma)
    return (
        out.withColumn("cusum", F.round(s, 6))
        .withColumn(
            "cusum_flag",
            (F.round(s, 6) > F.round(F.lit(threshold_sigmas) * F.col("_sigma"), 6))
            & (F.col("_sigma") > 0),
        )
        .drop("_mu", "_sigma", "_p", "_rmin")
    )
