"""Event analytics: sessionization, windowed counts, funnel, JSON props
— deterministic hand-built cases with known answers (the gate's DuckDB
oracle covers the big corpus; these pin the semantics)."""

import datetime as dt

from pyspark.sql import functions as F

from stractt_spark.operators.events import (
    funnel,
    props_histogram,
    sessionize,
    windowed_counts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t,
             float(v), p)
            for i, (m, u, t, v, p) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )


def test_sessionize_gap_splits(spark):
    # user 1: events at 0, 10, 50 min (gap 40 > 30 splits) → 2 sessions
    # user 2: events at 0, 29, 58 (each gap 29 ≤ 30) → 1 session
    ev = _ev(spark, [
        (0, 1, "view", 1, "{}"), (10, 1, "view", 2, "{}"),
        (50, 1, "view", 4, "{}"),
        (0, 2, "view", 1, "{}"), (29, 2, "view", 1, "{}"),
        (58, 2, "view", 1, "{}"),
    ])
    got = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["sum_value"])
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    assert got == {
        (1, 1): (2, 3.0), (1, 2): (1, 4.0), (2, 1): (3, 3.0),
    }


def test_sessionize_boundary_exactly_gap_is_same_session(spark):
    # gap of exactly 30 min does NOT split (strict >)
    ev = _ev(spark, [(0, 1, "view", 1, "{}"), (30, 1, "view", 1, "{}")])
    got = sessionize(ev, gap_minutes=30).collect()
    assert len(got) == 1 and got[0]["n_events"] == 2


def test_windowed_counts(spark):
    ev = _ev(spark, [
        (5, 1, "view", 1, "{}"), (59, 2, "view", 2, "{}"),
        (61, 1, "click", 3, "{}"),
    ])
    got = {
        (r["window_us"], r["event_type"]): (r["n"], r["sum_value"])
        for r in windowed_counts(ev).collect()
    }
    h0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    h1 = h0 + 3_600_000_000
    assert got == {(h0, "view"): (2, 3.0), (h1, "click"): (1, 3.0)}


def test_funnel_strict_order(spark):
    # user 1 completes view→click→purchase in order
    # user 2 clicks BEFORE viewing → stalls at stage 1
    # user 3 views+clicks but never purchases → stage 2
    ev = _ev(spark, [
        (0, 1, "view", 0, "{}"), (1, 1, "click", 0, "{}"),
        (2, 1, "purchase", 0, "{}"),
        (0, 2, "click", 0, "{}"), (1, 2, "view", 0, "{}"),
        (0, 3, "view", 0, "{}"), (1, 3, "click", 0, "{}"),
    ])
    got = {r["stage"]: r["users"] for r in funnel(ev).collect()}
    assert got == {1: 3, 2: 2, 3: 1}


def test_funnel_same_timestamp_not_ordered(spark):
    # click at the SAME instant as view does not count (strict >)
    ev = _ev(spark, [(0, 1, "view", 0, "{}"), (0, 1, "click", 0, "{}")])
    got = {r["stage"]: r["users"] for r in funnel(ev).collect()}
    # later stages still emit their row (count 0), matching the oracle
    assert got == {1: 1, 2: 0, 3: 0}


def test_props_histogram(spark):
    ev = _ev(spark, [
        (0, 1, "view", 0, '{"k": 13}'), (1, 1, "view", 0, '{"k": 23}'),
        (2, 1, "click", 0, '{"k": 7}'),
    ])
    got = {
        (r["event_type"], r["bucket"]): r["n"]
        for r in props_histogram(ev).collect()
    }
    assert got == {("view", 3): 2, ("click", 7): 1}


def test_epoch_us_is_timezone_invariant(spark):
    """The NTZ→epoch conversion must not route through the session
    timezone (the driver's session tz is unknown)."""
    ev = _ev(spark, [(0, 1, "view", 1, "{}")])
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = sessionize(ev).collect()[0]["started_us"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert got == int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) * 1_000_000


def test_retention_cohorts_known_history(spark):
    """Hand-computed cohort table: users joining on different days with
    known return patterns."""
    import datetime as dt

    from stractt_spark.operators.events import retention_cohorts

    def row(eid, day, user):
        return (eid, dt.datetime(2024, 1, day, 12, 0), user, "view",
                1.0, "{}")

    rows = [
        row(1, 1, 100), row(2, 1, 101),          # cohort d1: 2 users
        row(3, 2, 100),                          # u100 returns day+1
        row(4, 3, 100), row(5, 3, 101),          # both return day+2
        row(6, 2, 102),                          # cohort d2: 1 user
        row(7, 4, 102),                          # returns day+2
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    out = {
        (r["cohort_us"], r["period"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    d1 = int(dt.datetime(2024, 1, 1).timestamp() -
             dt.datetime(1970, 1, 1).timestamp()) * 1_000_000
    day_us = 86400 * 1_000_000
    assert out == {
        (d1, 0): 2, (d1, 1): 1, (d1, 2): 2,
        (d1 + day_us, 0): 1, (d1 + day_us, 2): 1,
    }
