"""Semantic tests for wave 8: Hampel filter vs a pure-Python frame
recompute, reorder points vs numpy, truncation recall vs brute-force
python cosine."""

from __future__ import annotations

import numpy as np

from bigdata_weather_system_spark.contract import cdc_ext, warehouse_ops
from tests.conftest import TEST_SF_DIR


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_hampel_matches_python_frames(spark):
    got = {
        r["event_id"]: r
        for r in _rows(cdc_ext.hampel_filter_anomalies(spark, TEST_SF_DIR))
    }
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    expected = {}
    for uid, rows in by_user.items():
        rows.sort()
        vals = [v for _, _, v in rows]
        for i, (_, eid, v) in enumerate(rows):
            frame = vals[max(0, i - 3): i + 4]
            med = float(np.median(frame))
            mad = float(np.median([abs(x - med) for x in frame]))
            if mad > 0 and abs(v - med) > 3 * 1.4826 * mad:
                expected[eid] = (len(frame), med, mad)
    assert set(got) == set(expected)
    for eid, (n, med, mad) in expected.items():
        assert got[eid]["n_frame"] == n
        assert abs(got[eid]["frame_median"] - med) < 1e-5
        assert abs(got[eid]["frame_mad"] - mad) < 1e-5


def test_reorder_points_match_numpy(spark):
    got = {
        r["l_partkey"]: r
        for r in _rows(warehouse_ops.part_reorder_points(spark, TEST_SF_DIR))
    }
    li = (
        spark.read.parquet(f"{TEST_SF_DIR}/lineitem.parquet")
        .selectExpr("l_partkey", "to_date(l_shipdate) AS d", "l_quantity")
        .collect()
    )
    demand: dict = {}
    for r in li:
        demand.setdefault(r.l_partkey, {}).setdefault(r.d, 0.0)
        demand[r.l_partkey][r.d] += r.l_quantity
    for pk, days in demand.items():
        vals = np.array(list(days.values()))
        if len(vals) < 5:
            assert pk not in got
            continue
        mu, sd = vals.mean(), vals.std(ddof=1)
        rop = mu * 7 + 1.64 * sd * np.sqrt(7)
        assert got[pk]["n_days"] == len(vals)
        assert abs(got[pk]["mean_daily"] - mu) < 1e-5
        assert abs(got[pk]["reorder_point"] - rop) < 1e-4


def test_truncation_recall_matches_python(spark):
    got = {
        r["query_id"]: r
        for r in _rows(
            cdc_ext.embedding_truncation_recall(spark, TEST_SF_DIR)
        )
    }
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(
            f"{TEST_SF_DIR}/embeddings.parquet"
        ).collect()
    }

    def top10(qid, dims=None):
        qv = emb[qid] if dims is None else emb[qid][:dims]
        scored = []
        for nid, v in emb.items():
            if nid == qid:
                continue
            cv = v if dims is None else v[:dims]
            s = round(
                float(qv @ cv)
                / (float(np.sqrt(qv @ qv)) * float(np.sqrt(cv @ cv))),
                6,
            )
            scored.append((-s, nid))
        scored.sort()
        return {nid for _, nid in scored[:10]}

    for qid in sorted(emb):
        if qid >= 20:
            break
        full, tr = top10(qid), top10(qid, dims=16)
        n_common = len(full & tr)
        assert got[qid]["n_common"] == n_common, qid
        assert abs(got[qid]["recall_at_10"] - n_common / 10.0) < 1e-9
        assert 0 <= got[qid]["recall_at_10"] <= 1
