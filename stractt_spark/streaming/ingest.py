"""Incremental index ingest with Structured Streaming.

The reference has no streaming surface (batch crawl → batch index,
SURVEY.md §2.10); this is the Spark-native extension a continuously-
crawled corpus needs: ``readStream`` over an arriving-files directory →
``foreachBatch`` → each micro-batch becomes NEW segments appended to the
unified index table.

Design points:

* a micro-batch's docs get segment ids strictly after all existing ones
  (``next_doc_id`` high-water mark in stats.json), so appends never touch
  existing segments — the same deferred-remap invariant as the batch merge
  (operators/merge.py);
* the unified fused layout makes append trivial: new block+sentinel rows
  are ``mode("append")`` parquet writes (Iceberg appends in production —
  snapshot-isolated);
* global stats (num_docs, total_tokens, avgdl) and term_stats are
  re-derived incrementally per batch; BM25 scores therefore legitimately
  drift as the corpus grows, exactly as a re-built batch index would;
* exactly-once: the streaming checkpoint (Spark's) deduplicates input
  files; the per-batch index append is idempotent via the batch-id ledger
  in stats.json.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.segments import NORMS_SENTINEL, build_segments_fused
from ..plans.build import IndexPaths


def append_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    text_col: str = "content",
    id_col: str = "doc_id",
    analyzer: str = "ascii",
    positions: bool = False,
    attr_cols: list[str] | None = None,
    order_cols: tuple[str, ...] = ("repo", "path", "commit"),
) -> None:
    """Append one micro-batch of docs as new segments; doc ids are
    assigned deterministically from ``order_cols`` (a unique key) starting
    at the index's high-water mark."""
    paths = IndexPaths(index_dir)
    with open(paths.stats) as f:
        stats = json.load(f)
    done_batches = set(stats.get("stream_batches", []))
    if batch_id in done_batches:  # idempotent re-delivery
        return
    dps = stats["docs_per_segment"]
    hwm = stats.get("next_doc_id", stats["num_docs"])

    n_new = batch_df.count()
    if n_new == 0:
        return
    # place the batch's ids after the high-water mark, aligned to a fresh
    # segment boundary so existing segments are never rewritten
    base = ((hwm + dps - 1) // dps) * dps
    from ..operators.postings import assign_doc_ids

    src = batch_df.drop(id_col) if id_col in batch_df.columns else batch_df
    docs = assign_doc_ids(src, list(order_cols)).withColumn(
        "doc_id", F.col("doc_id") + F.lit(base)
    )

    unified = build_segments_fused(
        docs, text_col, "doc_id", analyzer, dps,
        include_positions=positions, attr_cols=attr_cols,
    )
    (
        unified.sortWithinPartitions("segment_id", "term", "block_id")
        .write.mode("append")
        .parquet(paths.index)
    )

    # refresh derived tables + stats (term_stats is small: one agg over
    # pruned columns of the appended table)
    full = spark.read.parquet(paths.index)
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
    text_col: str = "content",
    analyzer: str = "ascii",
    positions: bool = False,
    attr_cols: list[str] | None = None,
    order_cols: tuple[str, ...] = ("repo", "path", "commit"),
    available_now: bool = True,
):
    """readStream(parquet files in input_dir) → incremental index appends.

    ``available_now=True`` drains everything currently present and stops
    (test/backfill mode); False runs continuously per micro-batch.
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(
            spark, batch_df, batch_id, index_dir,
            text_col=text_col, analyzer=analyzer,
            positions=positions, attr_cols=attr_cols, order_cols=order_cols,
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()
