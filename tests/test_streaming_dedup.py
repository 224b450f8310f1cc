"""Streaming exact dedup: duplicates must be dropped across microbatches
(state carry-over), across separate availableNow invocations (checkpoint
carry-over), and — with ``ts_col`` — evicted state must re-admit a key
once the watermark has passed it (the bounded-state trade)."""

import datetime as dt
import shutil

import pytest

from stractt_spark.streaming.dedup import stream_dedup

BASE = "/tmp/stractt_stream_dedup_test"

DOCS_SCHEMA = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_cross_batch_and_cross_invocation_dedup(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    inp, ck, out = f"{BASE}/in", f"{BASE}/ckpt", f"{BASE}/out"
    _docs(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")]).coalesce(
        1
    ).write.mode("append").parquet(inp)
    _docs(spark, [(4, "beta"), (5, "gamma")]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    # one invocation, forced into one-file microbatches: the batch-2
    # "beta" duplicate is dropped only if state crosses batches
    stream_dedup(spark, inp, ck, out, schema=DOCS_SCHEMA,
                 max_files_per_trigger=1)
    got = {r["text"] for r in spark.read.parquet(out).collect()}
    assert got == {"alpha", "beta", "gamma"}

    # a later invocation (new files arrived): checkpointed state still
    # remembers all three hashes
    _docs(spark, [(6, "gamma"), (7, "delta")]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    stream_dedup(spark, inp, ck, out, schema=DOCS_SCHEMA)
    rows = spark.read.parquet(out).collect()
    assert sorted(r["text"] for r in rows) == [
        "alpha", "beta", "delta", "gamma"]


TS_SCHEMA = "doc_id long, text string, ts timestamp_ntz"


def test_watermark_bounded_state_evicts_and_readmits(spark):
    base = BASE + "_wm"
    shutil.rmtree(base, ignore_errors=True)
    inp, ck, out = f"{base}/in", f"{base}/ckpt", f"{base}/out"
    t0 = dt.datetime(2024, 1, 1)

    def ts(h, m=0):
        return t0 + dt.timedelta(hours=h, minutes=m)

    # batch 1: "alpha" at h0 and a dup inside the 2h window at h1
    spark.createDataFrame(
        [(1, "alpha", ts(0)), (2, "alpha", ts(1)), (3, "beta", ts(1))],
        TS_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(inp)
    stream_dedup(spark, inp, ck, out, schema=TS_SCHEMA, ts_col="ts",
                 watermark="2 hours")
    assert sorted(
        r["text"] for r in spark.read.parquet(out).collect()
    ) == ["alpha", "beta"]

    # batch 2 runs while the watermark is still h1−2h, so a repeat
    # "alpha" here is STILL dropped (its state expires at h0+2h, not
    # yet evicted); the batch's own h12 events then push the watermark
    # to h10, which evicts alpha/beta state afterwards
    spark.createDataFrame(
        [(4, "alpha", ts(12)), (5, "gamma", ts(12))], TS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(inp)
    stream_dedup(spark, inp, ck, out, schema=TS_SCHEMA, ts_col="ts",
                 watermark="2 hours")
    assert sorted(
        r["text"] for r in spark.read.parquet(out).collect()
    ) == ["alpha", "beta", "gamma"]

    # batch 3: watermark (h10) has passed alpha's expiry (h2) → its
    # state was evicted and a fresh "alpha" is re-admitted; "gamma"
    # (expiring h14 > h10) is still held → its dup stays dropped.
    # Time-bounded dedup semantics: the price of bounded state.
    spark.createDataFrame(
        [(6, "alpha", ts(12, 30)), (7, "gamma", ts(12, 30))], TS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(inp)
    stream_dedup(spark, inp, ck, out, schema=TS_SCHEMA, ts_col="ts",
                 watermark="2 hours")
    texts = sorted(r["text"] for r in spark.read.parquet(out).collect())
    assert texts == ["alpha", "alpha", "beta", "gamma"]
