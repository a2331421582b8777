"""Watermarked windowed streaming aggregation (ops/stream_extract.py).

The oracle query consumes its drop directory as one batch (write
timing must not decide late-drops); THIS test drives the genuinely
multi-batch semantics with controlled file modification times (the
file source processes files in mod-time order).

Spark's late-event filter uses the watermark as of the PREVIOUS
batch's start (one batch behind the eviction watermark — verified
empirically), so the late row is delivered two batches after the
window's on-time data: by then the late filter has advanced past its
window and the row must be dropped, not re-open the emitted window.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

H = 3_600_000_000  # one hour in µs
M = 60_000_000     # one minute in µs


def _write(path: str, rows, mtime: float):
    tbl = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "value": pa.array([r[1] for r in rows], pa.float64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us", "UTC")),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def test_late_rows_dropped_ontime_rows_aggregated(spark, tmp_path):
    base = 1_700_000_000_000_000 - (1_700_000_000_000_000 % H)
    drop = tmp_path / "drop"
    chk = tmp_path / "chk"
    drop.mkdir()
    now = time.time()
    # batch 0: hour-0 rows + a row at hour-2 +10min -> the watermark
    # after this batch (hour-1 +40min) passes hour-0's window end
    _write(
        str(drop / "a.parquet"),
        [("click", 1.0, base + 5 * M),
         ("view", 2.0, base + 20 * M),
         ("click", 3.0, base + 2 * H + 10 * M)],
        now - 90,
    )
    # batch 1: on-time row; hour-0's window is emitted at this batch
    # (eviction watermark hour-1 +40min) with batch-0 counts
    _write(
        str(drop / "b.parquet"),
        [("click", 4.0, base + 2 * H + 30 * M)],
        now - 60,
    )
    # batch 2: a LATE row back in hour-0 — the late filter is now at
    # hour-1 +40min, so it must be dropped, not re-open the window
    _write(
        str(drop / "c.parquet"),
        [("click", 99.0, base + 6 * M)],
        now - 30,
    )

    stream = (
        spark.readStream.schema("event_type string, value double,"
                                " ts timestamp")
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(drop))
    )
    win = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
             .alias("cents"))
        .select(F.unix_micros("w.start").alias("ws"), "event_type", "n",
                "cents")
    )
    q = (
        win.writeStream.format("memory")
        .queryName("late_test_sink")
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["ws"], r["event_type"]): (r["n"], r["cents"])
        for r in spark.table("late_test_sink").collect()
    }
    # hour-0 window: batch-0 rows only — the late 99.0 click is gone
    assert got[(base, "click")] == (1, 100)
    assert got[(base, "view")] == (1, 200)
    # hour-2's window end (base+3H) > final watermark (base+2H): held
    assert all(ws < base + 2 * H for ws, _ in got)
    assert len(got) == 2
    # the late row is accounted as dropped-by-watermark, not lost
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress if p["stateOperators"]
    )
    assert dropped == 1
