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


def stream_ingest_dedup(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str = DOCUMENTS_SCHEMA,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    available_now: bool = True,
    processing_interval: str = "10 seconds",
    max_files_per_trigger: int | None = None,
):
    """Streaming NEAR-dup ingest into a persisted incremental dedup
    index (:mod:`stractt_spark.operators.dedup_index`) — the near-dup
    twin of :func:`stream_dedup` (whose state-store key is the exact
    sha256) and of :func:`~stractt_spark.streaming.ann.stream_ingest_ann`
    (whose exactly-once discipline this mirrors).

    Each microbatch runs the batch ingest decision (check against the
    persisted corpus ∪ lower-id intra-batch, matched-any-lower rule),
    persists the per-doc decision table under
    ``{index_dir}/stream_decisions/``, and appends the survivors as a
    ledgered batch dir.  Re-invoking after new files arrive continues
    from the checkpoint; later batches dedup against everything any
    earlier batch kept.

    Exactly-once under microbatch re-delivery, mirroring
    ``stream_ingest_ann``'s crash-window analysis:

    (a) crash before the append's manifest commit — the half-written
        batch dir is unreferenced; ``append_batch`` detects the orphan
        and rewrites it on retry.  The decision table recomputes
        identically (the index state is unchanged, and the decision is a
        pure function of index ∪ batch content).
    (b) crash between the append's manifest commit and the stream
        ledger write — the retry must NOT re-run the decision (the
        survivors are now IN the index and would self-match as dups).
        The pre-append decisions parquet is the source of truth: the
        retry adopts the newest manifest batch iff it is unclaimed by
        any stream-ledger entry and its doc_id set equals the stored
        kept set; anything else stays a loud error.
    """
    import hashlib
    import os

    from ..operators import dedup_index as dix

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    # ledger keys are namespaced by the stream identity (checkpoint
    # dir): microbatch ids restart at 0 per checkpoint
    ns = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    def _dec_path(key: str) -> str:
        return os.path.join(
            index_dir, "stream_decisions", key.replace(":", "_") + ".parquet"
        )

    def process(batch_df, batch_id: int) -> None:
        key = f"{ns}:{batch_id}"
        m = dix.read_dedup_manifest(index_dir)
        ledger = m.get("stream_batches", {})
        if key in ledger:
            return  # re-delivered batch: already fully committed
        if batch_df.isEmpty():
            return
        dec_path = _dec_path(key)
        if os.path.exists(dec_path):
            # a previous attempt got past the decision write.  Window
            # (b): adopt the newest batch if it is exactly our kept set
            # and no ledger entry claims it; otherwise the crash was in
            # window (a) / pre-append and the decision recomputes below.
            kept = (
                spark.read.parquet(dec_path)
                .filter("kept")
                .select("doc_id")
            )
            batches = m.get("batches", [])
            newest = batches[-1] if batches else None
            claimed = set(m.get("stream_batches", {}).values())
            if newest is not None and newest not in claimed:
                newest_ids = spark.read.parquet(
                    os.path.join(index_dir, newest, "docsets.parquet")
                ).select("doc_id")
                if (
                    not newest_ids.join(kept, "doc_id", "left_anti").count()
                    and not kept.join(
                        newest_ids, "doc_id", "left_anti"
                    ).count()
                    and kept.count() > 0
                ):
                    m.setdefault("stream_batches", {})[key] = newest
                    dix._write_manifest(index_dir, m)
                    return
        # the decision must be persisted BEFORE the append (it is the
        # window-(b) source of truth above), so run the two halves of
        # the shared engine separately: pure check → decisions write →
        # survivor append
        matches = dix.check_batch(
            spark,
            index_dir,
            batch_df,
            threshold=threshold,
            text_col=text_col,
            id_col=id_col,
            include_intra=True,
            max_bucket_size=max_bucket_size,
        )
        decisions = dix.decisions_frame(batch_df, matches, id_col)
        decisions.write.mode("overwrite").parquet(dec_path)
        name = dix.append_survivors(
            spark, index_dir, batch_df, decisions,
            text_col=text_col, id_col=id_col,
        )
        m = dix.read_dedup_manifest(index_dir)
        m.setdefault("stream_batches", {})[key] = name
        dix._write_manifest(index_dir, m)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    # continuous mode: returns the LIVE query immediately — the caller
    # owns its lifecycle (stop()/awaitTermination()) and must surface
    # failures via q.exception(), since foreachBatch errors (including
    # the loud window-(b) genuine-duplicate error) are not re-raised
    # here; same contract as stream_ingest_ann's continuous branch
    return writer.trigger(processingTime=processing_interval).start()


def read_stream_decisions(spark: SparkSession, index_dir: str):
    """All per-microbatch decision tables written by
    :func:`stream_ingest_dedup` (doc_id, kept, dup_of, jaccard)."""
    import os

    return spark.read.parquet(
        os.path.join(index_dir, "stream_decisions", "*.parquet")
    )
