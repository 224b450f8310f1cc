"""Streaming windowed aggregation with watermarks — the event-stream
half of §2.10, complementing the index-ingest stream.

``stream_windowed_counts`` runs the standard Structured Streaming
shape: ``readStream`` over an arriving-files directory →
``withWatermark(ts, …)`` → tumbling ``window(ts, …)`` × event-type
aggregation → ``writeStream`` in APPEND mode, so a window row is
emitted exactly once, when the watermark passes its end (late events
inside the watermark still update state; events later than the
watermark are dropped — the documented completeness/latency trade).

The batch twin is :func:`stractt_spark.operators.events.windowed_counts`
— the streaming test asserts the emitted closed windows equal the batch
aggregation over the non-late events, which is the contract a 100 TB
deployment relies on when it replaces nightly batch rollups with a
continuous stream."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: str = EVENTS_SCHEMA,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> None:
    """Process every file currently in ``input_dir`` (availableNow) and
    append the windows FINALIZED by the watermark to ``out_dir``.
    Re-invoking after new files arrive continues from the checkpointed
    offsets + watermark — the incremental rollup loop."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    # EventTimeWatermark requires TIMESTAMP; the events column is
    # TIMESTAMP_NTZ.  The session-tz cast is fine HERE (unlike the batch
    # epoch conversion): windowing only needs internal consistency, and
    # the window start is cast back to NTZ so the emitted wall-clock
    # boundaries are session-tz-invariant again.
    if dict(src.dtypes).get(ts_col) == "timestamp_ntz":
        src = src.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    agg = (
        src.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
