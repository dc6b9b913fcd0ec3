"""Online ANN index maintenance: ``ivf_index_append`` + the streaming
maintainer ``start_online_ivf_index``.

The math invariant (append under a frozen quantizer ≡ full rebuild with
the same centroids) is oracle-checked by the registered
``cosine_topk_ivf_incremental`` query; these tests pin the FILESYSTEM
behavior the contract query cannot: the batch=N/cell=K layout, cell
pruning across batch directories, idempotent batch replay, and the
bootstrap-then-freeze centroid lifecycle of the streaming twin.
"""
from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from bigdata_weather_system_spark.operators.similarity import (
    cosine_topk_ivf_from_index,
    cosine_topk_ivf_indexed,
    ivf_assign,
    ivf_centroids,
    ivf_index_append,
    materialize_ivf_index,
)

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(TEST_SF_DIR, "embeddings.parquet"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_index_append_matches_full_rebuild(spark, emb, tmp_path):
    """Build the index from 80% of the corpus, append the rest against
    the frozen centroids, and serve: results over the grown index must
    equal serving an index assigned over the full corpus in one shot
    (same quantizer) — the batch-side append invariant."""
    base = emb.filter(F.col("vec_id") % 10 < 8)
    delta = emb.filter(F.col("vec_id") % 10 >= 8)
    path = str(tmp_path / "ivf")
    cents = materialize_ivf_index(base, path, n_cells=8)
    ivf_index_append(delta, path, cents)  # flat append into the same layout

    q = emb.filter(F.col("vec_id") < 10)
    grown = cosine_topk_ivf_indexed(spark, path, q, cents, k=5, n_probe=3)
    rebuilt = cosine_topk_ivf_from_index(
        ivf_assign(emb, cents), q, cents, k=5, n_probe=3
    )
    assert _rows(grown) == _rows(rebuilt)
    # every corpus row landed exactly once
    assert spark.read.parquet(path).count() == emb.count()


def test_batched_layout_prunes_on_cell_and_replay_is_idempotent(
    spark, emb, tmp_path
):
    """batch=N/cell=K layout: a cell filter must touch only that cell's
    files across ALL batch directories, and re-running a batch (crash
    replay) must overwrite its own directory, not duplicate rows."""
    path = str(tmp_path / "ivf_batched")
    cents = ivf_centroids(emb, "vec_id", "embedding", 8, 42, "md5")
    b0 = emb.filter(F.col("vec_id") % 2 == 0)
    b1 = emb.filter(F.col("vec_id") % 2 == 1)
    ivf_index_append(b0, path, cents, batch_id=0)
    ivf_index_append(b1, path, cents, batch_id=1)
    total = spark.read.parquet(path).count()
    assert total == emb.count()

    pruned = spark.read.parquet(path).filter(F.col("cell") == 3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan
    # the static cell predicate must be a partition filter, not a data
    # filter over all batch directories
    assert "= 3)" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    # both batch directories contribute rows to the pruned cell
    assert pruned.select("batch").distinct().count() == 2

    # crash replay of batch 1: same rows, no duplicates
    ivf_index_append(b1, path, cents, batch_id=1)
    assert spark.read.parquet(path).count() == total


def test_online_ivf_index_bootstrap_freeze_and_serve(spark, emb, tmp_path):
    """Streaming twin: first micro-batch trains + publishes the
    centroids, later batches assign against the FROZEN file, and
    serving over the maintained root equals a one-shot assignment of
    everything seen under those centroids."""
    from bigdata_weather_system_spark.streaming.pipeline import (
        start_online_ivf_index,
    )

    rows = emb.select("vec_id", "embedding").collect()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    third = (len(rows) + 2) // 3
    for b in range(3):
        with open(in_dir / f"b{b}.json", "w") as fh:
            for r in rows[b * third : (b + 1) * third]:
                fh.write(
                    json.dumps(
                        {
                            "vec_id": r.vec_id,
                            "embedding": [float(x) for x in r.embedding],
                        }
                    )
                    + "\n"
                )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    index_path = str(tmp_path / "index")
    cents_path = str(tmp_path / "centroids.json")
    q = start_online_ivf_index(
        stream,
        index_path=index_path,
        centroids_path=cents_path,
        checkpoint_path=str(tmp_path / "ckpt"),
        n_cells=8,
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            if (
                os.path.exists(index_path)
                and spark.read.parquet(index_path).count() >= len(rows)
            ):
                break
    finally:
        q.stop()

    with open(cents_path) as fh:
        cents = json.load(fh)
    assert len(cents) == 8

    idx = spark.read.parquet(index_path)
    assert idx.count() == len(rows)
    # three micro-batches -> three banked batch directories
    assert (
        idx.select("batch").distinct().count() == 3
    ), "expected one batch directory per micro-batch"

    queries = emb.filter(F.col("vec_id") < 10).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    served = cosine_topk_ivf_indexed(
        spark, index_path, queries, cents, k=5, n_probe=3
    )
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    oneshot = cosine_topk_ivf_from_index(
        ivf_assign(corpus, cents), queries, cents, k=5, n_probe=3
    )
    assert _rows(served) == _rows(oneshot)

    # restart path: a NEW maintainer over the same paths must reuse the
    # frozen centroids (not retrain) — feed one more file and check the
    # file's content hash is unchanged
    before = open(cents_path).read()
    with open(in_dir / "b3.json", "w") as fh:
        for r in rows[:5]:
            fh.write(
                json.dumps(
                    {
                        "vec_id": 100000 + r.vec_id,
                        "embedding": [float(x) for x in r.embedding],
                    }
                )
                + "\n"
            )
    q2 = start_online_ivf_index(
        stream,
        index_path=index_path,
        centroids_path=cents_path,
        checkpoint_path=str(tmp_path / "ckpt"),
        n_cells=8,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert open(cents_path).read() == before
    assert spark.read.parquet(index_path).count() == len(rows) + 5
