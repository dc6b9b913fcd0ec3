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

from pyspark.sql import DataFrame, functions as F, types as T

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


def truncated_mean_model(mat: np.ndarray) -> np.ndarray:
    """Integer window-mean head: pred = trunc(sum(window) / L). Integer
    arithmetic end-to-end, so the autoregressive recursion is EXACTLY
    reproducible in a SQL oracle (``//`` in DuckDB truncates toward zero,
    hence the sign/abs dance — numpy floor_divide floors)."""
    s = mat.sum(axis=1, dtype=np.int64)
    return np.sign(s) * (np.abs(s) // mat.shape[1])


def autoregressive_rollout(
    ctx_df: DataFrame,
    n_steps: int,
    model_fn=None,
    window_col: str = "window",
) -> DataFrame:
    """Batch autoregressive multi-step inference — the distributed shape of
    the reference's driver-side per-request loop
    (``/root/reference/prediction/preprocessing/spark.py:1370-1574``):
    context window → predict → append prediction, slide window → repeat.

    ``ctx_df`` carries one row per key: an ``array<long>`` context
    ``window`` (time-ascending) plus any passthrough columns. The loop
    over steps runs INSIDE the Arrow batch, vectorized across all rows at
    once (``(batch, L)`` matrix per step) — thousands of keys roll out in
    parallel per task, where the reference rolls out one location per
    HTTP request on the driver. Emits one row per (key, step 1..n_steps)
    with the integer prediction; feed a real checkpoint through
    ``model_fn`` without changing the plumbing.
    """
    from pyspark.sql import types as T

    model = model_fn or truncated_mean_model
    passthrough = [f for f in ctx_df.schema.fields if f.name != window_col]
    out_schema = T.StructType(
        list(passthrough)
        + [
            T.StructField("step", T.IntegerType(), False),
            T.StructField("pred", T.LongType(), True),
        ]
    )
    pass_names = [f.name for f in passthrough]

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.vstack(
                [np.asarray(w, dtype=np.int64) for w in pdf[window_col]]
            )
            preds = np.empty((len(pdf), n_steps), dtype=np.int64)
            for s_i in range(n_steps):
                p = np.asarray(model(mat), dtype=np.int64)
                preds[:, s_i] = p
                mat = np.concatenate([mat[:, 1:], p[:, None]], axis=1)
            rep = (
                pdf[pass_names]
                .loc[pdf.index.repeat(n_steps)]
                .reset_index(drop=True)
            )
            rep["step"] = np.tile(
                np.arange(1, n_steps + 1, dtype=np.int32), len(pdf)
            )
            rep["pred"] = preds.reshape(-1)
            yield rep

    return ctx_df.mapInPandas(batches, schema=out_schema)


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Isotonic regression calibration via pool-adjacent-violators (PAV):
    fit the monotone step function mapping raw scores to calibrated
    probabilities — the non-parametric calibrator used when Platt
    scaling's sigmoid is too rigid. Returns one row per fitted segment:
    (score_lo, score_hi, calibrated_p, n).

    PAV is inherently sequential over the score-sorted sample, so the
    fit runs on ONE task — which is the correct distributed posture:
    calibration fits on a bounded holdout (thousands of rows), never the
    corpus; the expensive part (scoring the corpus) stays distributed
    and the fitted segments broadcast back for application. Rows sort by
    (score, label) with a stable order so the fit is deterministic.
    """
    from collections.abc import Iterator

    import pandas as pd

    sample = df.select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("double").alias("y"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())

    def fit(batches: Iterator) -> Iterator:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True).sort_values(
            ["s", "y"], kind="mergesort"
        )
        blocks: list[list[float]] = []  # [sum_y, n, lo, hi]
        for s, y in zip(pdf["s"].to_numpy(), pdf["y"].to_numpy()):
            blocks.append([float(y), 1.0, float(s), float(s)])
            # pool while the running means violate monotonicity
            while (
                len(blocks) > 1
                and blocks[-2][0] / blocks[-2][1]
                >= blocks[-1][0] / blocks[-1][1]
            ):
                sy, n, lo, hi = blocks.pop()
                blocks[-1][0] += sy
                blocks[-1][1] += n
                blocks[-1][3] = hi
        yield pd.DataFrame(
            {
                "score_lo": [b[2] for b in blocks],
                "score_hi": [b[3] for b in blocks],
                "calibrated_p": [b[0] / b[1] for b in blocks],
                "n": [int(b[1]) for b in blocks],
            }
        )

    return sample.coalesce(1).mapInPandas(
        fit,
        schema="score_lo double, score_hi double, calibrated_p double, n long",
    )
