"""Streaming windowed aggregation with watermark: append-mode windows
must equal the batch aggregation over the non-late events once the
watermark closes them, late-but-inside-watermark events must be
included, and later-than-watermark events must be dropped."""

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from stractt_spark.streaming.windows import (
    EVENTS_SCHEMA,
    stream_windowed_counts,
)

BASE = "/tmp/stractt_stream_windows_test"


def _rows(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t,
             float(v), "{}")
            for i, (m, u, t, v) in enumerate(rows)
        ],
        EVENTS_SCHEMA,
    )


@pytest.fixture(scope="module")
def streamed(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    inp = f"{BASE}/in"
    # batch 1: events in hours 0..5 → watermark lands at max(ts) - 2h
    b1 = [(h * 60 + 5, 1, "view", 1) for h in range(6)]
    _rows(spark, b1).write.mode("append").parquet(inp)
    stream_windowed_counts(
        spark, inp, f"{BASE}/ckpt", f"{BASE}/out",
        window="1 hour", watermark="2 hours",
    )
    first = spark.read.parquet(f"{BASE}/out").collect()

    # batch 2: on-time events (hours 8..9), a LATE event for hour 4
    # (inside the new watermark? no: watermark after batch 1 ≈ 03:05,
    # hour-4 event at 04:30 is ABOVE it → accepted and aggregated),
    # and a TOO-LATE event for hour 0 (far below watermark → dropped)
    b2 = (
        [(h * 60 + 5, 1, "view", 1) for h in (8, 9)]
        + [(4 * 60 + 30, 2, "view", 10)]   # late, inside watermark
        + [(0 * 60 + 30, 3, "view", 100)]  # too late, dropped
    )
    _rows(spark, b2).write.mode("append").parquet(inp)
    stream_windowed_counts(
        spark, inp, f"{BASE}/ckpt", f"{BASE}/out",
        window="1 hour", watermark="2 hours",
    )
    final = spark.read.parquet(f"{BASE}/out").collect()
    return first, final


def _by_hour(rows):
    return {
        (r["window_start"].hour, r["event_type"]): (r["n"], r["sum_value"])
        for r in rows
    }


def test_first_pass_emits_only_watermark_closed_windows(streamed):
    first, _ = streamed
    got = _by_hour(first)
    # max ts in batch 1 = 05:05 → watermark 03:05 → closed: hours 0..2
    assert got == {
        (0, "view"): (1, 1.0), (1, "view"): (1, 1.0), (2, "view"): (1, 1.0),
    }


def test_second_pass_late_inside_watermark_counted(streamed):
    _, final = streamed
    got = _by_hour(final)
    # second pass watermark = 09:05 - 2h = 07:05 → hours 3..6 close
    # (7 has no events); the late hour-4 event (04:30 > 03:05 watermark
    # at ingest time) must be IN hour 4's aggregate
    assert got[(4, "view")] == (2, 11.0)
    assert got[(3, "view")] == (1, 1.0)
    assert got[(5, "view")] == (1, 1.0)


def test_too_late_event_dropped(streamed):
    _, final = streamed
    # the hour-0 straggler arrived with watermark ≈ 03:05 → dropped;
    # hour 0 was already emitted with n=1 and MUST NOT be re-emitted
    # (raw rows, not the dict — a duplicate emission would collapse)
    hour0 = [r for r in final if r["window_start"].hour == 0]
    assert len(hour0) == 1
    assert (hour0[0]["n"], hour0[0]["sum_value"]) == (1, 1.0)


def test_open_windows_not_emitted(streamed):
    _, final = streamed
    got = _by_hour(final)
    # hours 8 and 9 are above the final watermark → still open
    assert (8, "view") not in got and (9, "view") not in got
