"""Contract query: PCA top component of the embedding corpus.

The oracle unrolls the identical fixed-round power iteration as
materialized DuckDB CTEs over the same rounded covariance relation —
turning an "iterative, therefore rows-only" algorithm into a full
value-hash parity gate, the same trick the graph family uses for
PageRank/k-core/LPA.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.pca import power_iteration_top_component
from .core import register, _t

_DIM = 64
_ITERS = 8


def _mv_step(k: int, p: int) -> str:
    return f"""
    mv{k} AS MATERIALIZED (
      SELECT C.i AS i, sum(C.c * v{p}.v) AS mv
      FROM C JOIN v{p} ON C.j = v{p}.i GROUP BY C.i
    ),
    n{k} AS (SELECT sqrt(sum(mv * mv)) AS s FROM mv{k}),
    v{k} AS MATERIALIZED (
      SELECT i, mv / n{k}.s AS v FROM mv{k} CROSS JOIN n{k}
    )"""


_STEPS = ",".join(_mv_step(k, k - 1) for k in range(1, _ITERS + 1))

_ORACLE = f"""
WITH ex AS MATERIALIZED (
  SELECT vec_id, CAST(r.i AS INTEGER) AS i,
         CAST(embedding[r.i + 1] AS DOUBLE) AS x
  FROM embeddings, unnest(range(0, {_DIM})) AS r(i)
),
mom AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy, count(*) AS n
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
),
mu AS (SELECT i, avg(x) AS mu FROM ex GROUP BY i),
up AS (
  SELECT mom.i, mom.j,
         round(sxy / n - mi.mu * mj.mu, 9) AS c
  FROM mom JOIN mu mi ON mom.i = mi.i JOIN mu mj ON mom.j = mj.i
),
C AS MATERIALIZED (
  SELECT i, j, c FROM up
  UNION ALL
  SELECT j AS i, i AS j, c FROM up WHERE i <> j
),
v0 AS MATERIALIZED (
  SELECT CAST(r.i AS INTEGER) AS i, 0.125 AS v
  FROM unnest(range(0, {_DIM})) AS r(i)
),
{_STEPS},
cv AS MATERIALIZED (
  SELECT C.i AS i, sum(C.c * v{_ITERS}.v) AS mv
  FROM C JOIN v{_ITERS} ON C.j = v{_ITERS}.i GROUP BY C.i
),
lam AS (
  SELECT sum(cv.mv * v{_ITERS}.v) AS lam
  FROM cv JOIN v{_ITERS} ON cv.i = v{_ITERS}.i
),
sgn AS (
  SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s
  FROM v{_ITERS} ORDER BY abs(v) DESC, i LIMIT 1
)
SELECT v{_ITERS}.i            AS dim_idx,
       round(v{_ITERS}.v * sgn.s, 4) AS loading,
       round(lam.lam, 4)      AS eigenvalue
FROM v{_ITERS} CROSS JOIN sgn CROSS JOIN lam
"""


@register("embedding_pca_top_component", oracle=_ORACLE)
def embedding_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component (loadings + eigenvalue) of the 64-dim
    embedding corpus — the first step of every spectral diagnostic on a
    training-data embedding table (anisotropy checks, whitening,
    dominant-direction removal a la all-but-the-top).

    Scale shape: ONE distributed pass computes the d(d+1)/2 moment sums
    (each vector emits its upper-triangle outer product via nested
    array transforms, JVM-side); everything after lives on d^2 = 4096
    rows regardless of corpus size. The fixed 8-round matvec/normalize
    recurrence runs as chained joins with a per-round lineage cut
    (64-row ``localCheckpoint``, the ALS idiom — a lazy chain would
    double the logical plan every round). No driver-side linear
    algebra: the eigenvector never leaves the cluster. Covariance
    entries round to 9 decimals so both
    engines iterate from bit-identical matrices; loadings round to 4
    with a deterministic sign convention (largest-|loading| coordinate
    positive)."""
    emb = _t(spark, sf_dir, "embeddings")
    return power_iteration_top_component(emb, "embedding", _DIM, iterations=_ITERS)
