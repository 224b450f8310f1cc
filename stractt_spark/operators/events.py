"""Event-stream analytics over the ``events`` table: sessionization,
tumbling-window aggregation, funnel analysis, JSON property extraction.

These are the batch halves of the engine's streaming story (the same
windowing semantics Structured Streaming applies with watermarks) and
the event-log operators a training-data pipeline runs next to the text
stack.  Everything is pure Spark SQL expressions — window functions and
built-ins only, no UDFs — so Catalyst plans one shuffle per
``partitionBy``/``groupBy`` and every gate has an exact DuckDB oracle.

Timestamps cross the engine boundary as epoch MICROSECONDS (int64).
The events column is TIMESTAMP_NTZ (naive wall clock), so the
conversion must NOT route through the session timezone:
``timestampdiff(MICROSECOND, TIMESTAMP_NTZ epoch, ts)`` treats the
wall clock as UTC — exactly DuckDB's ``epoch_us`` on its naive
TIMESTAMP — and is invariant to ``spark.sql.session.timeZone``
(a ``cast(ts AS TIMESTAMP)`` is not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(expr: str) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column/expression,
    independent of the session timezone (naive wall clock == UTC,
    matching DuckDB epoch_us)."""
    return F.expr(
        "timestampdiff(MICROSECOND, "
        f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {expr})"
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Gap-based sessions: a new session starts when a user is idle
    longer than ``gap_minutes``.  → one row per session:
    (user_id, session_idx, started_us, ended_us, n_events, sum_value).

    One shuffle (partitionBy user); the session index is the running
    count of gap-breaks — the standard lag/cumsum sessionization, which
    is also what ``session_window`` computes in Structured Streaming."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols]
    )
    gap_us = int(gap_minutes) * 60 * 1_000_000
    us = _epoch_us(ts_col)
    lagged = F.lag(us).over(w)
    new_sess = F.when(
        lagged.isNull() | ((us - lagged) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    staged = events.withColumn("_new", new_sess).withColumn(
        "_sess",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        staged.groupBy(
            F.col(user_col).cast("long").alias("user_id"),
            F.col("_sess").cast("long").alias("session_idx"),
        )
        .agg(
            F.min(_epoch_us(ts_col)).alias("started_us"),
            F.max(_epoch_us(ts_col)).alias("ended_us"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling 1-hour windows × event type → (window_us, event_type,
    n, sum_value) — the batch twin of the Structured Streaming
    ``window(ts, '1 hour')`` aggregation."""
    return (
        events.groupBy(
            _epoch_us(f"date_trunc('hour', {ts_col})").alias("window_us"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: stage i counts users whose first step-i event
    happens AFTER their first step-(i-1) completion time (strict event
    order, earliest-occurrence semantics).  → (stage, step, users),
    stage 1-indexed.  One aggregation per user (conditional min over
    the running constraint), expressed as chained conditional mins —
    no joins, one shuffle."""
    us = _epoch_us(ts_col)
    per_user = events.groupBy(F.col(user_col).alias("u"))
    # t_i = min ts of step i events with ts > t_{i-1}; computed with a
    # per-user sorted array fold to keep it one pass
    arr = F.array_sort(
        F.collect_list(F.struct(us.alias("t"), F.col(type_col).alias("e")))
    )
    cur = per_user.agg(arr.alias("evs"))
    prev_col = F.lit(-1).cast("long")

    def step_pred(step, prev):
        # one-arg lambda (pyspark introspects the signature); step/prev
        # close over, they are not lambda parameters
        return lambda x: (x["e"] == F.lit(step)) & (x["t"] > prev)

    for i, step in enumerate(steps):
        nxt = F.filter(F.col("evs"), step_pred(step, prev_col))
        tcol = F.when(F.size(nxt) > 0, F.element_at(nxt, 1)["t"])
        cur = cur.withColumn(f"_t{i}", tcol)
        prev_col = F.col(f"_t{i}")
    out = None
    for i, step in enumerate(steps):
        row = cur.filter(F.col(f"_t{i}").isNotNull()).agg(
            F.lit(i + 1).cast("long").alias("stage"),
            F.lit(step).alias("step"),
            F.count("*").cast("long").alias("users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def props_histogram(
    events: DataFrame,
    json_col: str = "props",
    key: str = "k",
    type_col: str = "event_type",
) -> DataFrame:
    """Extract an integer property from the JSON ``props`` column and
    histogram it per event type → (event_type, bucket, n); JVM-side
    ``get_json_object`` (DuckDB twin: ``json_extract_string``)."""
    val = F.get_json_object(F.col(json_col), f"$.{key}").cast("long")
    return (
        events.select(F.col(type_col).alias("event_type"),
                      (val % 10).alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_periods: int = 14,
) -> DataFrame:
    """Day-cohort retention: cohort = a user's first active day; for
    each (cohort, period) the count of distinct users active exactly
    ``period`` days after their cohort day → (cohort_us, period,
    n_users).  The canonical training-/product-analytics rollup.

    Shape: one groupBy for first-activity, one distinct on (user, day),
    one join (AQE picks broadcast iff the user dimension is small), one
    final aggregate — every step a shuffle on user_id or the
    (cohort, period) key, nothing quadratic."""
    day = f"date_trunc('day', {ts_col})"
    first = events.groupBy(
        F.col(user_col).cast("long").alias("user_id")
    ).agg(F.min(F.expr(day)).alias("_cohort"))
    active = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.expr(day).alias("_day"),
    ).distinct()
    return (
        active.join(first, "user_id")
        .withColumn("period", F.datediff("_day", "_cohort").cast("long"))
        .filter(F.col("period") <= max_periods)
        .groupBy(
            _epoch_us("_cohort").alias("cohort_us"),
            "period",
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )
