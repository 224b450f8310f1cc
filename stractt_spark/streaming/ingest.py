"""Incremental index ingest with Structured Streaming.

The reference has no streaming surface (batch crawl → batch index,
SURVEY.md §2.10); this is the Spark-native extension a continuously-
crawled corpus needs: ``readStream`` over an arriving-files directory →
``foreachBatch`` → each micro-batch becomes NEW segments appended to the
index.

Exactly-once without transactions (parquet stand-in for Iceberg):

* each batch writes its unified rows to its OWN directory
  ``batches/b{batch_id}.parquet`` with ``mode("overwrite")`` — a retried
  batch overwrites the identical content instead of double-appending;
* a batch becomes visible only when its id is committed to the
  ``stream_batches`` ledger inside stats.json, in the SAME atomic
  ``os.replace`` that updates num_docs/avgdl — readers
  (:class:`~stractt_spark.plans.build.SegmentIndex`) union only the main
  table plus LEDGERED batch dirs, so a crash between data write and
  ledger commit leaves an invisible orphan that the retry overwrites;
* term_stats is recomputed over main + ledgered + the new batch just
  before the ledger commit — a crash in that window leaves df counts
  transiently inflated until the retry completes (an Iceberg deployment
  makes this window disappear: one snapshot commits data + stats).

Build parameters (analyzer, positions, attr_cols, docs_per_segment) are
READ FROM THE INDEX'S stats.json, never from the caller — appending with
mismatched tokenization or position options would silently corrupt query
semantics.

Micro-batch doc ids: assigned deterministically from ``order_cols``
(a unique key) starting at a fresh segment boundary after the high-water
mark, so existing segments are never rewritten (the deferred-remap
invariant of operators/merge.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.segments import NORMS_SENTINEL, build_segments_fused
from ..plans.build import IndexPaths


def batch_dir(index_dir: str, batch_id: int) -> str:
    return os.path.join(index_dir, "batches", f"b{batch_id}.parquet")


def registered_paths(index_dir: str, stats: dict) -> list[str]:
    paths = IndexPaths(index_dir)
    return [paths.index] + [
        batch_dir(index_dir, b) for b in stats.get("stream_batches", [])
    ]


def append_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    order_cols: tuple[str, ...] = ("repo", "path", "commit"),
) -> None:
    """Append one micro-batch of docs as new segments (idempotent)."""
    paths = IndexPaths(index_dir)
    with open(paths.stats) as f:
        stats = json.load(f)
    if batch_id in set(stats.get("stream_batches", [])):
        return  # already committed
    # build options come from the index itself
    text_col = stats.get("text_col", "content")
    analyzer = stats["analyzer"]
    positions = bool(stats.get("positions"))
    attr_cols = stats.get("attr_cols") or None
    dps = stats["docs_per_segment"]
    hwm = stats.get("next_doc_id", stats["num_docs"])

    n_new = batch_df.count()
    if n_new == 0:
        return
    # ids start at a fresh segment boundary after the high-water mark
    base = ((hwm + dps - 1) // dps) * dps
    from ..operators.postings import assign_doc_ids

    src = batch_df.drop("doc_id") if "doc_id" in batch_df.columns else batch_df
    docs = assign_doc_ids(src, list(order_cols)).withColumn(
        "doc_id", F.col("doc_id") + F.lit(base)
    )

    unified = build_segments_fused(
        docs, text_col, "doc_id", analyzer, dps,
        include_positions=positions, attr_cols=attr_cols,
    )
    bdir = batch_dir(index_dir, batch_id)
    (
        unified.sortWithinPartitions("segment_id", "term", "block_id")
        .write.mode("overwrite")  # idempotent claim: retry rewrites in place
        .parquet(bdir)
    )

    # derived tables over main + ledgered + this batch
    all_dirs = registered_paths(index_dir, stats) + [bdir]
    full = spark.read.parquet(*all_dirs)
    (
        full.filter(F.col("term") != NORMS_SENTINEL)
        .groupBy("term")
        .agg(F.sum("num_docs").cast("long").alias("df"))
        .write.mode("overwrite")
        .parquet(paths.term_stats + ".tmp")
    )
    _swap_dir(paths.term_stats)

    from ..functions.codec import varint_decode

    meta = full.filter(F.col("term") == NORMS_SENTINEL).select("tf_bytes").collect()
    total_tokens = sum(int(varint_decode(bytes(r["tf_bytes"]))[0]) for r in meta)

    # single atomic commit: ledger + stats together
    stats["num_docs"] = int(stats["num_docs"] + n_new)
    stats["next_doc_id"] = int(base + n_new)
    stats["total_tokens"] = int(total_tokens)
    stats["avgdl"] = total_tokens / stats["num_docs"] if stats["num_docs"] else 0.0
    stats.setdefault("stream_batches", []).append(batch_id)
    tmp = paths.stats + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=2)
    os.replace(tmp, paths.stats)


def _swap_dir(target: str) -> None:
    import shutil

    tmp = target + ".tmp"
    if os.path.isdir(target):
        shutil.rmtree(target)
    os.replace(tmp, target)


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    schema: str,
    checkpoint_dir: str,
    order_cols: tuple[str, ...] = ("repo", "path", "commit"),
    available_now: bool = True,
    **_compat,
):
    """readStream(parquet files in input_dir) → incremental index appends.

    ``available_now=True`` drains everything currently present and stops
    (test/backfill mode); False runs continuously per micro-batch.
    Tokenizer/positions/attr options always come from the target index's
    stats.json.
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(spark, batch_df, batch_id, index_dir, order_cols=order_cols)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()
