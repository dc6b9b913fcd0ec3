"""Python UDTF + grouped-agg pandas UDF — the rest of the UDF surface.

The reference registers zero UDFs (SURVEY §2.10); the engine's hot paths
are all built-in column expressions. These two exist to pin the remaining
extension points Spark offers when built-ins genuinely run out:

- ``SentenceSplit``: a Python UDTF (table function) — one text row in,
  one row per sentence out, usable via ``F.udtf`` call or ``LATERAL``
  SQL. UDTFs run row-at-a-time in Python: keep them OFF the 100 TB hot
  path (explode + split columns do this faster); the API matters for
  logic that truly needs per-row Python with multi-row output.
- ``weighted_mean``: a GROUPED_AGG pandas UDF (vectorized UDAF over
  Arrow batches) — the scalable custom-aggregate shape; partial
  aggregation is not available to Python UDAFs, so each group's values
  ship to one executor: fine for bounded groups, use two-stage built-in
  aggs otherwise.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_SENTENCE_SCHEMA = StructType(
    [
        StructField("sentence_idx", IntegerType()),
        StructField("sentence", StringType()),
        StructField("n_words", IntegerType()),
    ]
)


# NB: returnType must be DataType instances, not DDL strings — string DDL
# is parsed through the active SparkContext AT IMPORT TIME, which breaks
# any import that happens before the session exists.
@udtf(returnType=_SENTENCE_SCHEMA)
class SentenceSplit:
    """Split text on sentence punctuation; emit one row per sentence."""

    def eval(self, text: str):
        if text is None:
            return
        import re

        parts = [p.strip() for p in re.split(r"[.!?]+", text) if p.strip()]
        for i, p in enumerate(parts):
            yield i, p, len(p.split())


@pandas_udf(DoubleType())
def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """sum(v*w)/sum(w) over the rows where BOTH are non-null (pandas
    skipna on the raw sums would keep a null value's weight in the
    denominator and skew toward zero), vectorized via Arrow; zero total
    weight — including an all-null group — yields NaN, which Arrow
    surfaces as SQL null."""
    m = v.notna() & w.notna()
    num = float((v[m] * w[m]).sum())
    den = float(w[m].sum())
    return num / den if den != 0.0 else float("nan")


def zscore_per_group(df, key_cols, value_col: str, out_col: str = "zscore"):
    """Per-group z-score normalization via applyInPandas (grouped-map UDF).

    Each group arrives as ONE pandas DataFrame over Arrow — the shape for
    per-entity feature normalization where the whole group is needed at
    once. Population std (ddof=0) to match SQL ``stddev_pop``;
    zero-variance groups normalize to 0.0 (not NaN). The same math is
    expressible with window functions (the oracle does) — applyInPandas
    earns its keep only when the per-group logic outgrows column algebra;
    groups must fit in executor memory.
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType())]
    )

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        std = float(v.std(ddof=0))
        mean = float(v.mean())
        pdf = pdf.copy()
        pdf[out_col] = 0.0 if std == 0.0 else (v - mean) / std
        return pdf

    return df.groupBy(*key_cols).applyInPandas(_norm, schema=schema)
