"""CDC merge application (operators/cdc.py) and containment pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_weather_system_spark.operators.cdc import (
    apply_changes,
    latest_changes,
)
from bigdata_weather_system_spark.operators.dedup import containment_pairs


def _state(rows):
    return {r["k"]: (r["v"], r["op"]) for r in rows}


def test_latest_changes_picks_highest_seq(spark):
    chg = spark.createDataFrame(
        [(1, 10, "a", "up"), (1, 20, "b", "up"), (2, 5, "c", "up")],
        "k int, seq int, v string, op string",
    )
    out = latest_changes(chg, ["k"], ["seq"]).collect()
    assert {(r["k"], r["v"]) for r in out} == {(1, "b"), (2, "c")}


def test_apply_changes_upsert_delete_insert_keep(spark):
    base = spark.createDataFrame(
        [(1, 0, "old1", "up"), (2, 0, "old2", "up"), (3, 0, "old3", "up")],
        "k int, seq int, v string, op string",
    )
    chg = spark.createDataFrame(
        [
            (1, 1, "new1", "up"),      # update
            (2, 1, None, "delete"),    # tombstone → key dropped
            (4, 1, "new4", "up"),      # insert (not in base)
        ],
        "k int, seq int, v string, op string",
    )
    out = apply_changes(
        base, chg, ["k"], ["seq"], op_col="op", delete_values=("delete",)
    )
    st = _state(out.collect())
    assert st == {
        1: ("new1", "up"),
        3: ("old3", "up"),  # untouched base row survives
        4: ("new4", "up"),
    }


def test_apply_changes_later_upsert_resurrects_tombstoned_key(spark):
    base = spark.createDataFrame([(1, 0, "old", "up")], "k int, seq int, v string, op string")
    chg = spark.createDataFrame(
        [(1, 1, None, "delete"), (1, 2, "back", "up")],
        "k int, seq int, v string, op string",
    )
    out = apply_changes(
        base, chg, ["k"], ["seq"], op_col="op", delete_values=("delete",)
    )
    assert _state(out.collect()) == {1: ("back", "up")}


def test_apply_changes_null_payload_from_change_wins(spark):
    # a change row with NULL payload must overwrite, not fall back to base
    base = spark.createDataFrame([(1, 0, "old", "up")], "k int, seq int, v string, op string")
    chg = spark.createDataFrame([(1, 1, None, "up")], "k int, seq int, v string, op string")
    out = apply_changes(base, chg, ["k"], ["seq"], op_col="op").collect()
    assert out[0]["v"] is None


def test_containment_pairs_catches_embedded_doc(spark):
    short = "alpha beta gamma delta epsilon zeta"
    long = "intro words here " + short + " trailing filler tokens close out"
    other = "completely different text with no overlap at all whatsoever yes"
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, other)], "doc_id long, text string"
    )
    out = containment_pairs(docs, "doc_id", "text", n=3, threshold=0.8).collect()
    pairs = {(r["id_a"], r["id_b"]): r["containment"] for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.8  # short ⊂ long
    assert all(3 not in p for p in pairs)
    # Jaccard on the same pair is small — containment is the only lens
    # that flags it
    from bigdata_weather_system_spark.operators.dedup import ngram_jaccard_pairs

    jac = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    assert jac.filter((F.col("id_a") == 1) & (F.col("id_b") == 2)).count() == 0


def test_pit_join_never_leaks_same_day_features(spark):
    """A label mid-day must see features only through the END of the
    previous day — the same-day aggregate (which includes the label row
    itself) is not yet closed and must not be served."""
    from bigdata_weather_system_spark.contract.cdc_ext import (
        feature_store_pit_join,
    )
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    out = feature_store_pit_join(spark, sf)
    ev = spark.read.parquet  # noqa: F841  (features derive from events)
    # every served feature timestamp is at or before the label ts, and
    # strictly before the label's own day could have closed
    from pyspark.sql import functions as F

    served = out.filter(F.col("day_n_events").isNotNull())
    assert served.count() > 0
    # no served feature window may END after the label timestamp: verify
    # via reconstruction — a same-day leak would mean avg includes rows
    # with ts >= label ts. Cheap proxy: labels on the dataset's first day
    # must have NULL features (no closed window exists yet).
    first_day = out.agg(F.min(F.to_date("ts"))).collect()[0][0]
    leaked = out.filter(
        (F.to_date("ts") == F.lit(first_day))
        & F.col("day_n_events").isNotNull()
    ).count()
    assert leaked == 0


def test_apply_log_to_snapshot_roundtrip(spark, tmp_path):
    """The streaming maintenance job folds an append log into a snapshot
    with the SAME batch apply_changes semantics (duality pin)."""
    from bigdata_weather_system_spark.streaming.pipeline import (
        apply_log_to_snapshot,
    )

    base_p, log_p, out_p = (
        str(tmp_path / "base"), str(tmp_path / "log"), str(tmp_path / "out")
    )
    spark.createDataFrame(
        [(1, 0, "a", "up"), (2, 0, "b", "up")],
        "k int, seq int, v string, op string",
    ).write.parquet(base_p)
    spark.createDataFrame(
        [(1, 1, "a2", "up", 7), (2, 1, None, "delete", 7), (3, 1, "c", "up", 8)],
        "k int, seq int, v string, op string, _batch_id int",
    ).write.parquet(log_p)
    apply_log_to_snapshot(
        spark, base_p, log_p, out_p,
        keys=("k",), seq_cols=("seq",), op_col="op",
    )
    got = {r["k"]: r["v"] for r in spark.read.parquet(out_p).collect()}
    assert got == {1: "a2", 3: "c"}  # 2 tombstoned, 3 inserted, 1 updated


def test_apply_changes_matches_sequential_replay_property(spark):
    """apply_changes must equal a sequential per-key replay of the feed
    (MERGE-in-sequence-order semantics) for arbitrary interleavings of
    upserts and tombstones."""
    import random

    rng = random.Random(11)
    for trial in range(5):
        keys = list(range(6))
        base_rows = [
            (k, 0, f"b{k}", "up") for k in keys if rng.random() < 0.7
        ]
        chg_rows = [
            (
                rng.choice(keys),
                seq,
                None if rng.random() < 0.2 else f"v{seq}",
                "delete" if rng.random() < 0.3 else "up",
            )
            for seq in range(1, 1 + rng.randint(1, 12))
        ]
        base = spark.createDataFrame(
            base_rows or [(99, 0, "x", "up")],
            "k int, seq int, v string, op string",
        )
        chg = spark.createDataFrame(
            chg_rows, "k int, seq int, v string, op string"
        )
        got = {
            r["k"]: (r["v"], r["op"])
            for r in apply_changes(
                base, chg, ["k"], ["seq"], op_col="op",
                delete_values=("delete",),
            ).collect()
        }
        # reference model: key deleted iff its LATEST change is a
        # tombstone (later upserts resurrect); otherwise latest change
        # wins, untouched base rows survive
        expect = {}
        latest = {}
        for k, seq, v, op in chg_rows:
            if k not in latest or seq > latest[k][0]:
                latest[k] = (seq, v, op)
        for k, _, v, op in (base_rows or [(99, 0, "x", "up")]):
            expect[k] = (v, op)
        for k, (seq, v, op) in latest.items():
            if op == "delete":
                expect.pop(k, None)
            else:
                expect[k] = (v, op)
        assert got == expect, f"trial {trial}: {got} != {expect}"
