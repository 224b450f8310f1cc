"""Custom stateful streaming operator (applyInPandasWithState):
gap-based sessionization — gap-break closes emit exactly once, the
EventTimeTimeout closes idle sessions once the watermark passes
end+gap, open sessions survive restarts via the state store, and the
closed set equals the batch sessionize twin."""

import datetime as dt
import shutil

import pytest

from stractt_spark.streaming.sessions import (
    EVENTS_SCHEMA,
    stream_sessionize,
)

BASE = "/tmp/stractt_stream_sessions_test"


def _rows(spark, rows, id0=0):
    return spark.createDataFrame(
        [
            (id0 + i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m),
             u, "view", float(v), "{}")
            for i, (m, u, v) in enumerate(rows)
        ],
        EVENTS_SCHEMA,
    )


def _us(minutes):
    base = int(dt.datetime(2024, 1, 1).timestamp()
               - dt.datetime(1970, 1, 1).timestamp())
    return (base + minutes * 60) * 1_000_000


@pytest.fixture(scope="module")
def streamed(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    inp = f"{BASE}/in"
    # user 1: s1 (00:05,00:15), gap → s2 (01:30), gap → s3 (05:00, open)
    # user 2: one event 00:10 — closeable only by the TIMEOUT
    b1 = [
        (5, 1, 1.0), (15, 1, 2.0), (90, 1, 3.0), (300, 1, 4.0),
        (10, 2, 7.0),
    ]
    _rows(spark, b1).write.mode("append").parquet(inp)
    stream_sessionize(
        spark, inp, f"{BASE}/ckpt", f"{BASE}/out",
        gap_minutes=30, watermark="2 hours",
    )
    first = spark.read.parquet(f"{BASE}/out").collect()

    # batch 2: user 1 at 09:00 closes s3 by gap; user 3 appears
    b2 = [(540, 1, 5.0), (545, 3, 9.0)]
    _rows(spark, b2, id0=100).write.mode("append").parquet(inp)
    stream_sessionize(
        spark, inp, f"{BASE}/ckpt", f"{BASE}/out",
        gap_minutes=30, watermark="2 hours",
    )
    final = spark.read.parquet(f"{BASE}/out").collect()
    return first, final


def _key(rows):
    return sorted(
        (r["user_id"], r["started_us"], r["ended_us"], r["n_events"],
         r["sum_value"])
        for r in rows
    )


def test_first_pass_gap_and_timeout_closes(streamed):
    first, _ = streamed
    # gap-break closes: s1, s2 of user 1; timeout close: user 2's
    # single-event session (end+gap 00:40 < watermark 03:00)
    assert _key(first) == [
        (1, _us(5), _us(15), 2, 3.0),
        (1, _us(90), _us(90), 1, 3.0),
        (2, _us(10), _us(10), 1, 7.0),
    ]


def test_second_pass_closes_restored_open_session(streamed):
    """The open session survived in the state store across the two
    invocations and closes when its gap-breaking successor arrives."""
    first, final = streamed
    new = [k for k in _key(final) if k not in _key(first)]
    assert (1, _us(300), _us(300), 1, 4.0) in new
    # user 3's lone 09:05 event: end+gap 09:35 > watermark 07:00 → open
    assert not any(k[0] == 3 for k in new)


def test_closed_sessions_match_batch_twin(streamed, spark):
    """Every emitted session equals the batch sessionize of the same
    events (same boundaries, counts, sums)."""
    from pyspark.sql import functions as F

    from stractt_spark.operators.events import sessionize

    _, final = streamed
    ev = spark.read.parquet(f"{BASE}/in")
    batch = sessionize(ev, gap_minutes=30).select(
        "user_id", "started_us", "ended_us", "n_events", "sum_value"
    ).collect()
    batch_keys = _key(batch)
    for k in _key(final):
        assert k in batch_keys, k


def test_requires_utc_session(spark):
    import pytest as _pt

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with _pt.raises(ValueError, match="timeZone"):
            stream_sessionize(
                spark, f"{BASE}/in", f"{BASE}/ckpt2", f"{BASE}/out2"
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
