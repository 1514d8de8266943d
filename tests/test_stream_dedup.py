"""Watermark-bounded streaming dedup (streaming/stream_dedup.py): a
redelivery inside the horizon is dropped across micro-batches, one
arriving after the horizon is re-emitted (the documented bound), state
is watermark-driven, and the stream's within-horizon output equals the
batch dropDuplicates fixpoint."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from knowledgegraphs_spark.streaming.stream_dedup import (
    dedup_documents_stream,
    dedup_turns_stream,
    stream_dedup_turns,
)

UTC = dt.timezone.utc


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, second, tzinfo=UTC)


def _write_file(spark, path: str, rows, mtime: float) -> None:
    df = spark.createDataFrame(
        [(c, i, r, t, None, ts) for (c, i, r, t, ts) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    tmp = tempfile.mkdtemp()
    try:
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "d"))
        part = next(f for f in os.listdir(os.path.join(tmp, "d")) if f.endswith(".parquet"))
        shutil.copyfile(os.path.join(tmp, "d", part), path)
        os.utime(path, (mtime, mtime))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_redelivery_within_horizon_dropped_beyond_reemitted(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(inp)
    # batch 0: first arrival of (c1, 0) at 10:00 + frontier at 10:02
    # → watermark after batch 0 = 10:02 - 10m (delay) < 10:00: state kept
    _write_file(
        spark,
        os.path.join(inp, "f0"),
        [("c1", 0, "user", "original", _ts(0, 0)), ("cf", 0, "user", "frontier", _ts(2, 0))],
        mtime=1_700_000_000.0,
    )
    # batch 1: redelivery of (c1, 0) within the horizon → dropped, even
    # though its text differs (idempotency key wins, first write sticks)
    _write_file(
        spark,
        os.path.join(inp, "f1"),
        [("c1", 0, "user", "redelivered COPY", _ts(0, 30))],
        mtime=1_700_000_100.0,
    )
    # batch 2: frontier to 10:30 → watermark 10:20 evicts (c1, 0) state
    _write_file(
        spark,
        os.path.join(inp, "f2"),
        [("cg", 0, "user", "advance", _ts(30, 0))],
        mtime=1_700_000_200.0,
    )
    # batch 3: filler — state eviction runs at batch end with the 10:20
    # watermark batch 2 established, removing (c1, 0) (expiry 10:10);
    # a re-delivery in THIS batch would still hit live state
    _write_file(
        spark,
        os.path.join(inp, "f3"),
        [("ch", 0, "user", "filler", _ts(32, 0))],
        mtime=1_700_000_300.0,
    )
    # batch 4: (c1, 0) again, state evicted → RE-emitted (the documented
    # horizon bound)
    _write_file(
        spark,
        os.path.join(inp, "f4"),
        [("c1", 0, "user", "late duplicate", _ts(33, 0))],
        mtime=1_700_000_400.0,
    )

    q = stream_dedup_turns(spark, inp, out, ckpt, max_files_per_trigger=1)
    q.awaitTermination(180)

    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in spark.read.parquet(out).collect()
    )
    assert ("c1", 0, "original") in got
    assert ("c1", 0, "redelivered COPY") not in got  # within-horizon drop
    assert ("c1", 0, "late duplicate") in got  # past-horizon re-emission
    assert len([g for g in got if g[0] == "c1"]) == 2


def test_first_arrival_emitted_without_waiting_for_watermark(spark, tmp_path):
    # dedup is not an aggregation: rows appear in the batch that saw them
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(inp)
    _write_file(
        spark, os.path.join(inp, "f0"), [("c1", 0, "user", "only row", _ts(0, 0))],
        mtime=1_700_000_000.0,
    )
    q = stream_dedup_turns(spark, inp, out, ckpt)
    q.awaitTermination(180)
    assert spark.read.parquet(out).count() == 1


def test_stream_matches_batch_fixpoint_within_horizon(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(inp)
    rows = [
        (f"c{i % 5}", i % 3, "user", f"first {i % 5} {i % 3}", _ts(i % 4, i % 60))
        for i in range(30)
    ]
    _write_file(spark, os.path.join(inp, "f0"), rows, mtime=1_700_000_000.0)
    q = stream_dedup_turns(spark, inp, out, ckpt)
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    assert got.count() == got.select("conv_id", "turn_idx").distinct().count() == 15


def test_state_is_watermarked_and_plan_carries_dedup_operator(spark, tmp_path):
    probe = str(tmp_path / "probe")
    os.makedirs(probe)
    stream = spark.readStream.schema(
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).parquet(probe)
    plan = dedup_turns_stream(stream)._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" in plan, plan
    assert "DeduplicateWithinWatermark" in plan, plan


def test_document_fingerprint_dedup_in_batch_mode(spark):
    docs = spark.createDataFrame(
        [
            (0, "same text", _ts(0)),
            (1, "same text", _ts(1)),  # exact dup, later ts
            (2, "other text", _ts(2)),
        ],
        "doc_id long, text string, ts timestamp",
    )
    got = dedup_documents_stream(docs).collect()
    assert sorted(r["text"] for r in got) == ["other text", "same text"]
    assert "_fp" not in got[0].asDict()
