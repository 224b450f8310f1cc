"""Streaming exact deduplication — continuous ingest dedup for §2.6's
doc-hash layer (reference hashes at `src/webpage/mod.rs:664-693`; the
batch twin is :func:`stractt_spark.operators.dedup.exact_dedup_groups`).

The Spark-first shape is the built-in stateful operator, not custom
state: ``readStream`` → ``sha2(text, 256)`` → ``dropDuplicates`` on the
hash → ``writeStream`` APPEND.  The streaming state store remembers one
row per distinct hash ACROSS microbatches, so a duplicate arriving in a
later file/batch is dropped exactly like an in-batch one — the property
a continuous 100 TB ingest pipeline relies on (nightly-batch dedup sees
only its own partition of time; the stream sees everything since the
checkpoint).

State sizing at scale: plain ``dropDuplicates`` state grows with the
number of DISTINCT keys ever seen — exact global dedup is inherently
O(distinct) state, which a real deployment shards by the hash key
across executors (the state store already partitions by
``spark.sql.shuffle.partitions``; 32 B/key ≈ 32 GB per 10^9 distinct
docs, spread over the cluster).  When the dedup contract is bounded in
TIME ("drop re-crawls within 7 days"), pass ``ts_col`` — the operator
switches to ``dropDuplicatesWithinWatermark``, and the state store
EVICTS keys older than the watermark delay, making state proportional
to the arrival rate × window instead of all-time distinct count.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: str = DOCUMENTS_SCHEMA,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "24 hours",
    max_files_per_trigger: int | None = None,
) -> None:
    """Process every file currently in ``input_dir`` (availableNow) and
    append one row per FIRST-SEEN distinct ``sha2(text)`` to
    ``out_dir``; duplicates — within a microbatch or in any later one —
    are dropped via the checkpointed state store.  Re-invoking after new
    files arrive continues from the checkpoint, so the dedup guarantee
    spans the stream's whole lifetime (or the watermark window when
    ``ts_col`` bounds it)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_dir)
    keyed = src.withColumn("text_sha256", F.sha2(F.col(text_col), 256))
    if ts_col is not None:
        if dict(src.dtypes).get(ts_col) == "timestamp_ntz":
            keyed = keyed.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        keyed = keyed.withWatermark(ts_col, watermark)
        deduped = keyed.dropDuplicatesWithinWatermark(["text_sha256"])
    else:
        deduped = keyed.dropDuplicates(["text_sha256"])
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
