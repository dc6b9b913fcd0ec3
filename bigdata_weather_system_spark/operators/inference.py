"""Batch model scoring over sequence rows (U4's scale path).

The reference runs LSTM inference driver-side per request
(``/root/reference/prediction/preprocessing/spark.py:1370-1574``) — fine for
one location, wrong for scoring a corpus. Here: Arrow-batched
``mapInPandas`` with broadcast model weights, the idiomatic Spark shape for
batch inference. The bundled model is a deterministic linear head (no torch
in this container); a real checkpoint drops into ``model_fn`` without
changing the plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from pyspark.sql import DataFrame, types as T

SCORE_SCHEMA_SUFFIX = [
    T.StructField("predicted_value", T.DoubleType(), True),
]


def linear_model(weights: np.ndarray):
    """seq (L,) values → next-value prediction = w·seq (toy but real math)."""

    def fn(mat: np.ndarray) -> np.ndarray:  # (batch, L)
        return mat @ weights

    return fn


def score_sequences(
    seq_df: DataFrame,
    key_cols: list[str],
    seq_len: int,
    model_fn=None,
    value_field: str = "value",
) -> DataFrame:
    """Append ``predicted_value`` to sequence rows via mapInPandas.

    ``seq_df`` is the output of operators.sequences.build_sequences —
    ``sequence`` is array<struct> with a ``value`` field. Weights/model
    closures are serialized once per task (broadcast semantics), batches
    arrive as Arrow record batches.
    """
    model = model_fn or linear_model(np.full(seq_len, 1.0 / seq_len))
    # end_timestamp's type follows the input (string for the default
    # ts_as_string sequences, timestamp when built with ts_as_string=False)
    out_schema = T.StructType(
        [seq_df.schema[c] for c in key_cols]
        + [seq_df.schema["end_timestamp"]]
        + SCORE_SCHEMA_SUFFIX
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            mat = np.array(
                [[e[value_field] for e in seq] for seq in pdf["sequence"]],
                dtype=np.float64,
            )
            preds = model(mat)
            out = pdf[key_cols].copy()
            out["end_timestamp"] = pdf["end_timestamp"]
            out["predicted_value"] = preds
            yield out

    return seq_df.mapInPandas(batches, schema=out_schema)
