"""Sustained-load soaks for the stateful streaming sinks.

The functional tests pin the online-dedup and quality-gated sinks 3
micro-batches deep; these soaks run them 100 micro-batches deep
(file source, maxFilesPerTrigger=1) and assert the properties that only
show up under sustained load: state/index growth bounded by the admitted
survivors (never the batch count), and per-batch latency that stays flat
instead of creeping with history — the difference between a sink that
survives a week of production and one that slowly drowns in its own
state.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from pyspark.sql import functions as F

N_BATCHES = 100


def _median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def _batch_latencies(query):
    """triggerExecution ms for every data-carrying micro-batch, from the
    query's progress ring buffer (holds the last 100 — sized to N_BATCHES)."""
    out = []
    for p in query.recentProgress:
        prog = json.loads(p) if isinstance(p, str) else p
        if prog.get("numInputRows", 0) > 0:
            out.append(float(prog["durationMs"]["triggerExecution"]))
    return out


def _assert_stable(lat, factor=3.0):
    """Median latency of the last quartile of batches must stay within
    `factor` of the first quartile's — a per-batch cost that tracks
    history would blow through this immediately at 100 batches."""
    assert len(lat) >= N_BATCHES // 2, f"too few progress rows: {len(lat)}"
    q = max(10, len(lat) // 4)
    first, last = _median(lat[:q]), _median(lat[-q:])
    assert last <= factor * max(first, 1.0), (
        f"per-batch latency crept: first-quartile median {first:.0f}ms → "
        f"last-quartile median {last:.0f}ms over {len(lat)} batches"
    )


@pytest.mark.slow
def test_online_dedup_sink_100_batch_soak(spark, tmp_path):
    """100 single-doc micro-batches alternating novel / near-dup-of-the-
    previous-novel: the clean corpus and the materialized LSH index must
    grow with SURVIVORS only (index = num_bands × survivors postings,
    sets = survivors), and per-batch latency must not trend upward —
    each batch probes the band-partitioned index, it never rescans the
    admitted corpus."""
    from bigdata_weather_system_spark.streaming.pipeline import (
        start_online_dedup_sink,
    )

    src = tmp_path / "docs_stream"
    src.mkdir()

    def novel_text(i):
        # per-doc unique vocabulary → unique 3-shingles → no accidental
        # cross-doc collisions; dedup hits are the constructed ones only
        return " ".join(f"w{i}x{j} tok{i}" for j in range(8))

    expected_survivors = []
    for i in range(N_BATCHES):
        if i % 2 == 0:
            text = novel_text(i)
            expected_survivors.append(i)
        else:
            text = novel_text(i - 1) + " zz"  # near-dup of previous novel
        path = src / f"b{i:03d}.jsonl"
        with open(path, "w") as f:
            f.write(json.dumps({"doc_id": i, "text": text}) + "\n")
        # FileStreamSource orders batches by mtime (ties arbitrary):
        # force strictly increasing stamps so batch order IS doc order
        stamp = 1_700_000_000 + i
        os.utime(path, (stamp, stamp))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    idx = str(tmp_path / "idx")
    sets = str(tmp_path / "sets")
    clean = str(tmp_path / "clean")
    q = start_online_dedup_sink(
        stream, idx, sets, clean, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        lat = _batch_latencies(q)
    finally:
        q.stop()

    kept = sorted(r.doc_id for r in spark.read.parquet(clean).collect())
    assert kept == expected_survivors
    n_surv = len(expected_survivors)
    # index growth bounded by survivors: 8 band postings per admitted doc,
    # one shingle-set row per admitted doc — batches that admitted nothing
    # appended nothing
    assert spark.read.parquet(idx).count() == 8 * n_surv
    assert spark.read.parquet(sets).count() == n_surv
    _assert_stable(lat)


@pytest.mark.slow
def test_quality_gated_sink_100_batch_soak(spark, tmp_path):
    """100 micro-batches through the constraint gate (every 5th violates
    the temperature range): good/quarantine partitions split exactly,
    the report grows one row per (batch, constraint), and per-batch
    latency stays flat — the gate re-evaluates constraints on the BATCH,
    never on accumulated history."""
    from bigdata_weather_system_spark.operators.quality import (
        Constraint,
        completeness,
        in_range_fraction,
    )
    from bigdata_weather_system_spark.sources.raw_events import (
        parse_raw_events,
    )
    from bigdata_weather_system_spark.streaming import read_event_stream
    from bigdata_weather_system_spark.streaming.pipeline import (
        start_quality_gated_sink,
    )

    src = tmp_path / "events_stream"
    src.mkdir()
    t0 = dt.datetime(2025, 11, 14, 10, 0)
    n_bad = 0
    for i in range(N_BATCHES):
        bad = i % 5 == 4
        n_bad += bad
        temp = 250.0 if bad else 20.0 + (i % 7)
        p = {
            "location_name": f"L{i % 3}",
            "time": (t0 + dt.timedelta(minutes=i)).isoformat(
                timespec="minutes"
            ),
            "temperature": str(temp),
            "weathercode": "1",
            "interval": "900",
            "is_day": "1",
        }
        rec = {
            "key": p["location_name"],
            "value": json.dumps(p),
            "timestamp": (t0 + dt.timedelta(minutes=i)).isoformat(),
        }
        path = src / f"b{i:03d}.json"
        with open(path, "w") as f:
            f.write(json.dumps(rec) + "\n")
        stamp = 1_700_000_000 + i
        os.utime(path, (stamp, stamp))

    checks = [
        Constraint("temp_complete", completeness("temperature"), 1.0),
        Constraint(
            "temp_range", in_range_fraction("temperature", -60, 60), 1.0
        ),
    ]
    good = str(tmp_path / "good")
    quar = str(tmp_path / "quarantine")
    rep = str(tmp_path / "report")
    raw = read_event_stream(
        spark, "files", str(src), max_files_per_trigger=1
    )
    q = start_quality_gated_sink(
        parse_raw_events(raw, keep_payload=False),
        checks,
        good,
        quar,
        rep,
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        lat = _batch_latencies(q)
    finally:
        q.stop()

    assert spark.read.parquet(good).count() == N_BATCHES - n_bad
    assert spark.read.parquet(quar).count() == n_bad
    report = spark.read.parquet(rep)
    assert report.count() == N_BATCHES * len(checks)  # one row per pair
    assert (
        report.filter(~F.col("passed")).count() == n_bad
    )  # only temp_range rows fail
    _assert_stable(lat)


@pytest.mark.slow
def test_parquet_sink_crash_recovery_soak(spark, tmp_path):
    """Round-5 verdict item #7 — the T6 exactly-once pin under sustained
    load WITH a mid-soak crash: feed 100 single-record micro-batches,
    kill the query partway through (while unprocessed files remain),
    restart from the same checkpoint, drain, and assert the parquet sink
    holds each record EXACTLY once — no batch lost at the stop point, no
    batch replayed across the restart (the file sink's transaction log +
    the source's checkpointed offsets are the mechanism under test).
    A third start on the drained stream must also append nothing."""
    import time

    from bigdata_weather_system_spark.streaming import read_event_stream
    from bigdata_weather_system_spark.streaming.pipeline import (
        start_parquet_sink,
    )

    src = tmp_path / "events_stream"
    src.mkdir()
    t0 = dt.datetime(2025, 11, 14, 10, 0)
    for i in range(N_BATCHES):
        p = {
            "location_name": f"L{i % 3}",
            "time": (t0 + dt.timedelta(minutes=i)).isoformat(
                timespec="minutes"
            ),
            "temperature": str(15.0 + (i % 9)),
            "weathercode": str(i % 4),
            "interval": "900",
            "is_day": "1",
        }
        rec = {
            "key": p["location_name"],
            "value": json.dumps(p),
            "timestamp": (t0 + dt.timedelta(minutes=i)).isoformat(),
        }
        path = src / f"b{i:03d}.json"
        with open(path, "w") as f:
            f.write(json.dumps(rec) + "\n")
        stamp = 1_700_000_000 + i
        os.utime(path, (stamp, stamp))

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        raw = read_event_stream(
            spark, "files", str(src), max_files_per_trigger=1
        )
        return start_parquet_sink(raw, sink, ckpt)

    # Phase 1: run until ~40 batches committed, then stop MID-STREAM.
    q = start()
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            lp = q.lastProgress
            prog = json.loads(lp) if isinstance(lp, str) else lp
            if prog and prog.get("batchId", -1) >= 40:
                break
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination(60)
    n_after_crash = spark.read.parquet(sink).count()
    assert 0 < n_after_crash < N_BATCHES, (
        f"crash point degenerate: {n_after_crash} rows"
    )

    # Phase 2: restart from the same checkpoint, drain everything.
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
        q2.awaitTermination(60)

    rows = spark.read.parquet(sink).collect()
    # exactly-once: every minute-stamped record once, none lost, none
    # duplicated across the crash/restart boundary
    stamps = sorted(r.event_timestamp for r in rows)
    want = sorted(t0 + dt.timedelta(minutes=i) for i in range(N_BATCHES))
    assert len(rows) == N_BATCHES, f"{len(rows)} rows != {N_BATCHES}"
    assert stamps == want

    # Phase 3: a fresh start on the drained stream appends nothing.
    q3 = start()
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()
        q3.awaitTermination(60)
    assert spark.read.parquet(sink).count() == N_BATCHES
