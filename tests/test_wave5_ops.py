"""Semantic tests for the wave-5 queries: motion energy vs brute-force
numpy over the decoded buffers, business days vs numpy.busday_count,
t-closeness vs an independent numpy EMD recompute, and label-leakage
structural guarantees."""

from __future__ import annotations

import numpy as np

from bigdata_weather_system_spark.contract import cleaning_ops, eval_ops
from bigdata_weather_system_spark.contract import pipeline_ops, warehouse_ops
from bigdata_weather_system_spark.operators.multimodal import (
    decode_raw_blob,
    encode_raw_blob,
)
from tests.conftest import TEST_SF_DIR


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_motion_energy_matches_bruteforce_decode(spark):
    out = {
        (r["media_id"], r["pair_idx"]): r
        for r in _rows(cleaning_ops.media_motion_energy(spark, TEST_SF_DIR))
    }
    doc_ids = [
        r.doc_id
        for r in spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("doc_id")
        .limit(10)
        .collect()
    ]
    for mid in doc_ids:
        h, w, c = 16 + mid % 16, 16 + mid % 24, 3
        f = 2 + mid % 4
        n = f * h * w * c
        pix = ((mid + np.arange(n, dtype=np.int64)) % 256).astype(
            np.uint8
        ).reshape(f, h, w, c)
        # round-trip through the codec to exercise the real decode path
        arr = decode_raw_blob(encode_raw_blob(pix, f))
        assert arr is not None and arr.shape == (f, h, w, c)
        flat = arr.reshape(f, -1).astype(np.int32)
        for j in range(f - 1):
            expected = float(
                np.abs(flat[j + 1] - flat[j]).astype(np.float64).mean()
            )
            got = out[(mid, j)]
            assert got["n_pixels"] == h * w * c
            assert abs(got["mean_abs_diff"] - expected) < 1e-6, (mid, j)


def test_business_days_matches_numpy_busday(spark):
    got = {
        r["o_orderpriority"]: r
        for r in _rows(
            warehouse_ops.business_days_to_ship(spark, TEST_SF_DIR)
        )
    }
    orders = spark.read.parquet(f"{TEST_SF_DIR}/orders.parquet").collect()
    li = (
        spark.read.parquet(f"{TEST_SF_DIR}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg({"l_shipdate": "min"})
        .collect()
    )
    first_ship = {r.l_orderkey: r["min(l_shipdate)"] for r in li}
    by_prio: dict = {}
    for o in orders:
        sd = first_ship.get(o.o_orderkey)
        if sd is None:
            continue
        od_d, sd_d = o.o_orderdate.date(), sd.date()
        if sd_d < od_d:
            continue
        # numpy busday_count counts weekdays in [od, sd) — identical to
        # W(sd) - W(od) by telescoping.
        bd = int(np.busday_count(od_d, sd_d))
        by_prio.setdefault(o.o_orderpriority, []).append(bd)
    for prio, vals in by_prio.items():
        g = got[prio]
        assert g["n_orders"] == len(vals)
        assert abs(g["avg_busdays"] - np.mean(vals)) < 1e-5
        assert g["min_busdays"] == min(vals)
        assert g["max_busdays"] == max(vals)


def test_t_closeness_matches_numpy_emd(spark):
    got = _rows(eval_ops.t_closeness_audit(spark, TEST_SF_DIR))[0]
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL")
        .select("event_type", "ts", "value")
        .collect()
    )
    binned: dict = {}
    global_counts = np.zeros(10)
    for r in ev:
        band = int(min(9, max(0, r.value // 10)))
        key = (r.event_type, r.ts.date())
        binned.setdefault(key, np.zeros(10))[band] += 1
        global_counts[band] += 1
    gshare = global_counts / global_counts.sum()
    emds = {
        k: np.abs(np.cumsum(v / v.sum() - gshare)).mean()
        for k, v in binned.items()
    }
    assert got["n_groups"] == len(emds)
    assert abs(got["max_emd"] - max(emds.values())) < 1e-5
    assert abs(got["avg_emd"] - np.mean(list(emds.values()))) < 1e-5
    n_viol = sum(1 for e in emds.values() if e > 0.2)
    assert got["n_violating_groups"] == n_viol
    assert 0 <= got["avg_emd"] <= got["max_emd"] <= 1 + 1e-9


def test_label_leakage_structural_guarantees(spark):
    got = _rows(pipeline_ops.label_leakage_audit(spark, TEST_SF_DIR))[0]
    # The exact as-of join (strict <) can never leak by construction.
    assert got["n_exact_leaks"] == 0
    assert 0 <= got["day_grain_leak_rate"] <= 1
    assert got["n_day_grain_leaks"] <= got["n_labeled_users"]
    if got["avg_lead_hours"] is not None:
        assert got["avg_lead_hours"] > 0
