"""Streaming ANN ingest — continuous embedding arrival into a persisted
vector index (the vector twin of :mod:`stractt_spark.streaming.ingest`),
for BOTH persisted ANN flavors: IVF (coarse k-means cells) and
sign-LSH (seed-derived hyperplane signatures).

Shape: ``readStream`` over arriving embedding files → ``foreachBatch``
→ the flavor's frozen-quantizer append
(:func:`~stractt_spark.operators.similarity.append_ivf` /
:func:`~stractt_spark.operators.similarity.append_sign_index`) into a
new ledgered batch dir.  The index stays queryable throughout — queries
read base ∪ ledgered appends, and an in-flight append is invisible
until its ledger commit.

Exactly-once across failures: Structured Streaming may re-deliver a
microbatch whose foreachBatch ran but whose offset commit didn't.  The
appends are not idempotent on their own (re-sending live vec_ids is a
loud error by design), so this wrapper records the STREAM batch id →
append batch id mapping in the ANN manifest and skips already-ledgered
stream batches on re-delivery.  The ledger write happens after the
append's own commit, so the crash windows are: (a) before the append
ledger — orphan dir, invisible, rewritten on retry; (b) between the two
ledgers — the stream batch re-runs, sees its vec_ids live, and the
manifest self-heals by adopting the committed append (the data is
already exactly what the retry would write, since assignment under a
frozen quantizer — k-means cells or hyperplane signs — is a pure
function of the vector).

Retrain policy is unchanged: appends never nudge the quantizer;
``ivf_needs_retrain`` flags drift and ``retrain_ivf`` rebuilds — the
streaming wrapper just makes arrival continuous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EMBEDDINGS_SCHEMA = "vec_id long, embedding array<float>"

# manifest kind → (append fn name, ledgered batch-dir prefix)
_FLAVORS = {
    "ivf": ("append_ivf", "cells_b"),
    "sign": ("append_sign_index", "sign_b"),
}


def stream_ingest_ann(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str = EMBEDDINGS_SCHEMA,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Drain every embedding file currently in ``input_dir``
    (availableNow) into frozen-quantizer appends of whichever ANN
    flavor ``index_dir`` holds; re-invoking after new files arrive
    continues from the checkpoint.  Idempotent under microbatch
    re-delivery via the manifest's stream-batch ledger."""
    import hashlib

    from ..operators import similarity as sim

    kind = sim.read_ann_manifest(index_dir).get("kind")
    if kind not in _FLAVORS:
        raise ValueError(
            f"stream_ingest_ann: {index_dir} has unknown ANN kind {kind!r}"
        )
    append_name, bprefix = _FLAVORS[kind]
    append_fn = getattr(sim, append_name)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    # microbatch ids restart at 0 for every NEW checkpoint, so the
    # ledger key must be namespaced by the stream identity (one logical
    # stream ↔ one checkpoint dir — Spark's own contract) or a second
    # stream's batch 0 would collide with the first's
    ns = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        key = f"{ns}:{batch_id}"
        m = sim.read_ann_manifest(index_dir)
        ledger = m.get("stream_batches", {})
        if key in ledger:
            return  # re-delivered batch: already fully committed
        if batch_df.isEmpty():
            return
        try:
            ab = append_fn(
                spark, index_dir, batch_df, id_col=id_col, vec_col=vec_col
            )
        except ValueError as ex:
            if "already exist" not in str(ex):
                raise
            # crash window (b): the append committed but the stream
            # ledger write didn't happen.  Adopt the newest append batch
            # instead of re-writing — but ONLY when (1) appends exist at
            # all, (2) that append is not already claimed by another
            # stream-ledger entry (a truly crash-orphaned append is
            # never ledgered), and (3) its vec_id set equals this
            # batch's.  Anything else is a genuine user-duplicate and
            # stays a loud error.  Content equality inside the window is
            # guaranteed by the source-replay contract: the retried
            # microbatch re-reads the SAME checkpointed file offsets, so
            # the re-delivered rows are byte-identical to the ones the
            # crashed attempt appended.
            m = sim.read_ann_manifest(index_dir)
            batches = m.get("append_batches", [])
            if not batches:
                raise  # fresh index, no append to adopt: genuine dup
            ab = max(batches)
            if int(ab) in {int(v) for v in
                           m.get("stream_batches", {}).values()}:
                raise  # newest append already ledgered: genuine dup
            prev = (
                spark.read.parquet(f"{index_dir}/{bprefix}{ab}.parquet")
                .select("vec_id").distinct()
            )
            ours = batch_df.select(
                F.col(id_col).cast("long").alias("vec_id"))
            if (
                prev.join(ours, "vec_id", "left_anti").count()
                or ours.join(prev, "vec_id", "left_anti").count()
            ):
                raise
        m = sim.read_ann_manifest(index_dir)
        m.setdefault("stream_batches", {})[key] = int(ab)
        sim._write_ann_manifest(index_dir, m)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()


def stream_ingest_ivf(*args, **kwargs):
    """Back-compat alias — IVF was the first streamed flavor; the
    dispatch now lives in :func:`stream_ingest_ann`."""
    return stream_ingest_ann(*args, **kwargs)
