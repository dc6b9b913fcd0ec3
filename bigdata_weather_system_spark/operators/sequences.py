"""Sliding-window sequence builder (training-sample exporter).

Capability parity with ``_build_sequences``
(``/root/reference/prediction/preprocessing/getSample.py:150-214``): per key,
a trailing window of ``seq_len`` rows is collected into an
``array<struct<...>>`` column, forecast targets are taken with ``lead`` for
steps 1..forecast_len, and rows whose window/targets are incomplete are
dropped.

Scale notes:
- One shuffle on the key columns; both the collect_list frame and the leads
  share a single ``WindowExec`` ordering, so Catalyst evaluates them in one
  pass over each partition.
- Rows frames bound the state to ``seq_len`` rows per partition cursor — no
  unbounded buffering. Skewed keys (one location with billions of rows)
  stream through the sorted partition rather than materializing it.
- Output is nested Parquet-friendly; write with ``df.write.parquet`` — the
  reference's ``coalesce(1).json`` single-file pattern is kept only as an
  option since it serializes the final stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def build_sequences(
    df: DataFrame,
    key_cols: Sequence[str] = ("location",),
    ts_col: str = "event_timestamp",
    feature_cols: Sequence[str] = (),
    target_cols: Sequence[str] = (),
    seq_len: int = 24,
    forecast_len: int = 1,
    ts_as_string: bool = True,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build (sequence, target, target_sequence) training rows.

    Output columns: key cols, ``start_timestamp``, ``end_timestamp``,
    ``sequence`` (array<struct>, exactly ``seq_len`` elements),
    ``target`` (struct, = first forecast step),
    ``target_sequence`` (array<struct>, ``forecast_len`` elements).

    Ordering within a key is ``ts_col`` then ``tiebreak_cols``. If
    duplicate (key, timestamp) rows can exist, pass a unique tiebreak
    (e.g. kafka_timestamp / event_id) or dedup upstream (W2,
    ``dedup_latest``) — with an ambiguous order, window contents and
    ``lead`` targets vary run to run.
    """
    feature_cols = list(feature_cols) or [
        c for c in df.columns if c not in (*key_cols, ts_col)
    ]
    target_cols = list(target_cols) or feature_cols

    ts_out = (
        F.col(ts_col).cast("string") if ts_as_string else F.col(ts_col)
    ).alias("event_timestamp")

    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    frame = w.rowsBetween(-(seq_len - 1), 0)

    entry = F.struct(ts_out, *[F.col(c) for c in feature_cols])
    target_entry = lambda step: F.struct(  # noqa: E731
        (
            F.lead(F.col(ts_col), step).over(w).cast("string")
            if ts_as_string
            else F.lead(F.col(ts_col), step).over(w)
        ).alias("event_timestamp"),
        *[F.lead(F.col(c), step).over(w).alias(c) for c in target_cols],
    )

    out = df.select(
        *key_cols,
        F.col(ts_col),
        F.collect_list(entry).over(frame).alias("sequence"),
        F.array(*[target_entry(s) for s in range(1, forecast_len + 1)]).alias(
            "target_sequence"
        ),
    )
    out = out.filter(
        (F.size("sequence") == seq_len)
        & F.element_at("target_sequence", forecast_len)
        .getField("event_timestamp")
        .isNotNull()
    )
    return out.select(
        *key_cols,
        F.element_at("sequence", 1).getField("event_timestamp").alias("start_timestamp"),
        F.element_at("sequence", seq_len)
        .getField("event_timestamp")
        .alias("end_timestamp"),
        "sequence",
        F.element_at("target_sequence", 1).alias("target"),
        "target_sequence",
    )
