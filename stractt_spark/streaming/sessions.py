"""Custom STATEFUL streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the arbitrary-state API the built-in
window/watermark aggregations cannot express (a session's end is data-
dependent: it closes only when its user has been idle past the gap).

Semantics (the streaming twin of ``operators.events.sessionize``):

* per user, events accumulate into the OPEN session while each arrives
  within ``gap_minutes`` of the previous one;
* an event past the gap CLOSES the open session (emitted downstream,
  exactly once) and starts a new one;
* an EventTimeTimeout fires when the WATERMARK passes the open
  session's end + gap — no later on-time event can extend it, so it is
  closed and emitted without needing a successor event.

State per user is one open-session tuple (start_us, end_us, n, sum) —
constant bytes per key, the property that lets a 100-TB event stream
keep per-user state at all.  Closed sessions equal the batch
sessionization of the same (non-late) events — asserted in
tests/test_streaming_sessions.py.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)

_OUT_SCHEMA = (
    "user_id long, started_us long, ended_us long, "
    "n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, end long, n long, s double"


def make_session_fold(gap_minutes: int):
    gap_us = int(gap_minutes) * 60 * 1_000_000

    def fold(key, pdfs, state: GroupState):
        user_id = int(key[0])
        closed = []
        if state.hasTimedOut:
            # watermark passed end+gap: no on-time event can extend it
            if state.exists:
                st, en, n, s = state.get
                closed.append((user_id, st, en, n, s))
                state.remove()
        else:
            rows = []
            for pdf in pdfs:
                us = (
                    pdf["ts"].astype("datetime64[us]").astype("int64")
                )
                for t_us, v in zip(us, pdf["value"]):
                    rows.append((int(t_us), float(v)))
            rows.sort()
            if state.exists:
                st, en, n, s = state.get
            else:
                st = en = n = 0
                s = 0.0
            for t_us, v in rows:
                if n == 0:
                    st, en, n, s = t_us, t_us, 1, v
                elif t_us - en > gap_us:
                    closed.append((user_id, st, en, n, s))
                    st, en, n, s = t_us, t_us, 1, v
                else:
                    en = max(en, t_us)
                    n += 1
                    s += v
            if n:
                state.update((st, en, n, s))
                # close exactly when the watermark passes end + gap:
                # Spark fires an event-time timeout when timeout_ms <
                # watermark_ms (strict), so timeout = (en+gap)//1000
                # fires iff wm_ms*1000 > en+gap_us — the same strict
                # microsecond comparison the batch-equality oracle
                # uses (ADVICE r4: the former ms-truncation +1 could
                # defer a close one microbatch past the contract).
                # Clamp AT the current watermark (Spark refuses only
                # timeouts BELOW it — possible when a barely-on-time
                # event extends a nearly-expired session).
                state.setTimeoutTimestamp(max(
                    (en + gap_us) // 1000,
                    state.getCurrentWatermarkMs(),
                ))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(
                        [c[0] for c in closed], dtype="int64"),
                    "started_us": pd.Series(
                        [c[1] for c in closed], dtype="int64"),
                    "ended_us": pd.Series(
                        [c[2] for c in closed], dtype="int64"),
                    "n_events": pd.Series(
                        [c[3] for c in closed], dtype="int64"),
                    "sum_value": pd.Series(
                        [round(c[4], 4) for c in closed], dtype="float64"),
                }
            )

    return fold


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    schema: str = EVENTS_SCHEMA,
) -> None:
    """Process every file currently in ``input_dir`` (availableNow) and
    append the sessions CLOSED by a gap-break or by the watermark to
    ``out_dir``; open sessions stay in state for the next increment."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT"):
        # event-time timeouts compare instant-epoch millis against the
        # watermark while the kernel's epochs are NTZ wall-clock — they
        # only coincide under a UTC session (the engine default)
        raise ValueError(
            f"stream_sessionize needs spark.sql.session.timeZone=UTC "
            f"(got {tz!r}) for NTZ-consistent event-time timeouts"
        )
    src = spark.readStream.schema(schema).parquet(input_dir)
    if dict(src.dtypes).get("ts") == "timestamp_ntz":
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    sessions = (
        src.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fold(gap_minutes),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    q = (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
