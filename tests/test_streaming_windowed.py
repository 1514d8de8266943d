"""Watermarked windowed aggregation: exactly-once window emission,
late-data drop, bounded state, and stream==batch equality on on-time
rows. Files feed one-per-trigger so the watermark advances at known
points between micro-batches — the late row provably arrives AFTER the
watermark passed its window."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from knowledgegraphs_spark.streaming.windowed import (
    stream_windowed_turn_stats,
    windowed_turn_stats,
)

UTC = dt.timezone.utc


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, second, tzinfo=UTC)


def _write_file(spark, path: str, rows, mtime: float) -> None:
    """One flat parquet FILE at ``path`` (the stream source lists files,
    not directories) with a pinned mtime — the file source processes in
    modification-time order, which the late-drop test depends on."""
    import shutil
    import tempfile

    df = spark.createDataFrame(
        [(c, i, r, t, None, ts) for (c, i, r, t, ts) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    tmp = tempfile.mkdtemp()
    try:
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "d"))
        part = next(
            f for f in os.listdir(os.path.join(tmp, "d")) if f.endswith(".parquet")
        )
        shutil.copyfile(os.path.join(tmp, "d", part), path)
        os.utime(path, (mtime, mtime))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_windowed_stats_watermark_drops_late_and_emits_once(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(inp)

    # batch 0: two on-time rows in window [10:00, 10:01) + a frontier row
    # at 10:05 → eviction watermark after the batch = 10:03 (delay 2 min)
    _write_file(
        spark,
        os.path.join(inp, "f0"),
        [
            ("c1", 0, "user", "hello there world", _ts(0, 10)),
            ("c2", 0, "assistant", "hi", _ts(0, 30)),
            ("c1", 1, "user", "one two three four", _ts(5, 0)),
        ],
        mtime=1_700_000_000.0,
    )
    # batch 1: an on-time middle row. Needed because since SPARK-40925
    # the LATE-EVENT filter uses the PREVIOUS batch's watermark while
    # state eviction uses the current one — a late row one batch after
    # the frontier would still be merged; two batches after, it must be
    # dropped. Batch 1 also emits the [10:00, 10:01) windows (eviction
    # watermark 10:03 passed their end).
    _write_file(
        spark,
        os.path.join(inp, "f1"),
        [("c5", 0, "user", "mid row", _ts(6, 0))],
        mtime=1_700_000_100.0,
    )
    # batch 2: a LATE row for the already-emitted [10:00, 10:01) window
    # (late-event watermark now 10:03/10:04 > event 10:00:50 → dropped —
    # append-mode exactly-once would otherwise double-emit the window),
    # plus a flush row at 10:20 that closes the 10:05/10:06 windows
    _write_file(
        spark,
        os.path.join(inp, "f2"),
        [
            ("c3", 0, "user", "late straggler", _ts(0, 50)),
            ("c9", 0, "system", "flush", _ts(20, 0)),
        ],
        mtime=1_700_000_200.0,
    )

    q = stream_windowed_turn_stats(spark, inp, out, ckpt, max_files_per_trigger=1)
    q.awaitTermination(180)

    got = {
        (r["window_start"].minute, r["role"]): (r["n_turns"], r["n_tokens"])
        for r in spark.read.parquet(out).collect()
    }
    # the late 'c3' row is NOT in the 10:00/user bucket
    assert got[(0, "user")] == (1, 3)
    assert got[(0, "assistant")] == (1, 1)
    # the 10:05/10:06 windows closed via the flush row's watermark advance
    assert got[(5, "user")] == (1, 4)
    assert got[(6, "user")] == (1, 2)
    # the flush window itself never closes (watermark stops at 10:18)
    assert (20, "system") not in got
    assert len(got) == 4


def test_windowed_stats_stream_equals_batch_on_ontime_rows(spark, tmp_path):
    """Restricted to the windows the stream emitted, the streaming rollup
    must equal the batch plan over the on-time rows (same logical plan —
    watermark is a no-op in batch)."""
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(inp)
    rows = [
        (f"c{i % 7}", i, ["user", "assistant"][i % 2], f"tok{i} a b", _ts(i % 4, (7 * i) % 60))
        for i in range(40)
    ] + [("cf", 0, "system", "flush", _ts(30, 0))]
    _write_file(spark, os.path.join(inp, "f0"), rows, mtime=1_700_000_000.0)

    q = stream_windowed_turn_stats(spark, inp, out, ckpt)
    q.awaitTermination(180)
    streamed = spark.read.parquet(out)

    batch = windowed_turn_stats(
        spark.createDataFrame(
            [(c, i, r, t, None, ts) for (c, i, r, t, ts) in rows],
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )
    )
    emitted = {(r["window_start"], r["role"]) for r in streamed.collect()}
    want = sorted(
        tuple(r)
        for r in batch.collect()
        if (r["window_start"], r["role"]) in emitted
    )
    got = sorted(tuple(r) for r in streamed.collect())
    assert got == want
    # all four data windows emitted (flush closed them); windows re-read
    # from the sink exactly once each
    assert len(emitted) == len(got)


def test_windowed_state_is_bounded_by_watermark(spark, tmp_path):
    """The streaming aggregation's state eviction is driven by the
    watermark column Spark derives — assert the plan carries the
    watermark (no watermark → unbounded state, the classic leak)."""
    probe = str(tmp_path / "probe")
    os.makedirs(probe)
    stream = spark.readStream.schema(
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).parquet(probe)
    plan = windowed_turn_stats(stream)._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" in plan, plan
