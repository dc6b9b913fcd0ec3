"""Raw JSON event parse chain (the spine of the reference's layer 2).

Capability parity with ``_parse_kafka_dataframe``
(``/root/reference/prediction/preprocessing/spark.py:179-253``): binary→string
cast, JSON→map decode, null-coalescing key/time projection, multi-format
timestamp parse with broker-time fallback, typed metric promotion, error-row
filter. All of it is pure column expressions — one stateless narrow stage,
fully inside whole-stage codegen, applied identically to a batch scan or a
``readStream`` source (stream/batch duality, SURVEY.md §2.9 T7).

Scale note: ``keep_payload=False`` drops the string map after promotion —
retaining a map<string,string> per row is the single heaviest column at
100 TB and is only needed when raw key passthrough is part of the output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..schemas import METRIC_FIELDS, PAYLOAD_SCHEMA

#: Accepted event-time formats, tried in order (reference parity:
#: ISO-8601 'T' form, space form, Z-suffixed) before broker-time fallback.
_TS_CLEAN = lambda c: F.regexp_replace(F.regexp_replace(c, "T", " "), "Z$", "")  # noqa: E731


def _parse_event_time(raw: Column, fallback: Column) -> Column:
    cleaned = _TS_CLEAN(raw)
    return F.coalesce(
        F.try_to_timestamp(raw),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd HH:mm")),
        fallback,
    )


def parse_raw_events(
    raw: DataFrame,
    *,
    key_col: str = "key",
    value_col: str = "value",
    ts_col: str = "timestamp",
    keep_payload: bool = True,
    drop_error_rows: bool = True,
) -> DataFrame:
    """Kafka-shaped (key, value, timestamp) rows → typed weather events.

    Works on both batch and streaming DataFrames (no stateful ops).
    """
    key = F.col(key_col).cast("string")
    payload = F.from_json(F.col(value_col).cast("string"), PAYLOAD_SCHEMA)

    df = raw.select(
        key.alias("key"),
        payload.alias("payload"),
        F.col(ts_col).cast("timestamp").alias("kafka_timestamp"),
    )

    event_time_raw = F.coalesce(
        F.col("payload").getItem("time"), F.col("payload").getItem("timestamp")
    )
    df = df.select(
        "key",
        F.coalesce(F.col("payload").getItem("location_name"), F.col("key")).alias(
            "location"
        ),
        "payload",
        _parse_event_time(event_time_raw, F.col("kafka_timestamp")).alias(
            "event_timestamp"
        ),
        "kafka_timestamp",
        *[
            F.col("payload").getItem(name).cast(dtype).alias(name)
            for name, dtype in METRIC_FIELDS.items()
        ],
    )

    if drop_error_rows:
        msg = F.col("payload").getItem("message")
        df = df.filter(F.coalesce(F.length(F.trim(msg)), F.lit(0)) == 0)
    if not keep_payload:
        df = df.drop("payload")
    return df
