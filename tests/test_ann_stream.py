"""Streaming IVF ingest: streamed appends must equal the batch append
path row-for-row, re-invocation must be a no-op, microbatch re-delivery
must self-heal without double-appending, and genuine duplicate ids must
stay a loud error."""

import shutil

import pytest
from pyspark.sql import functions as F

from stractt_spark.operators.similarity import (
    _read_ivf_cells,
    append_ivf,
    build_ivf_index,
    read_ann_manifest,
)
from stractt_spark.streaming.ann import stream_ingest_ivf

BASE = "/tmp/stractt_ann_stream_test"
DIM = 8


def _vecs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: (F.sin((F.col("id") + 1.0) * j * 0.7718) * 10.0)
            .cast("float"),
        ).alias("embedding"),
    )


@pytest.fixture(scope="module")
def streamed(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    idx, idx_b = f"{BASE}/idx", f"{BASE}/idx_batch"
    build_ivf_index(spark, _vecs(spark, 0, 100), idx, n_cells=4,
                    sample=64, iters=4)
    build_ivf_index(spark, _vecs(spark, 0, 100), idx_b, n_cells=4,
                    sample=64, iters=4)
    inp = f"{BASE}/in"
    _vecs(spark, 100, 150).coalesce(1).write.mode("append").parquet(inp)
    _vecs(spark, 150, 200).coalesce(1).write.mode("append").parquet(inp)
    stream_ingest_ivf(spark, inp, idx, f"{BASE}/ckpt",
                      max_files_per_trigger=1)
    # batch twin: the same two appends through the direct API
    append_ivf(spark, idx_b, _vecs(spark, 100, 150))
    append_ivf(spark, idx_b, _vecs(spark, 150, 200))
    return idx, idx_b, inp


def _rows(spark, idx):
    return sorted(
        (r["vec_id"], r["cell"])
        for r in _read_ivf_cells(spark, idx).select("vec_id", "cell").collect()
    )


def test_streamed_equals_batch_appends(spark, streamed):
    idx, idx_b, _ = streamed
    assert _rows(spark, idx) == _rows(spark, idx_b)
    m = read_ann_manifest(idx)
    assert m["num_vecs"] == 200
    assert len(m["append_batches"]) == 2
    assert sorted(m["stream_batches"].values()) == m["append_batches"]


def test_reinvoke_without_new_files_is_noop(spark, streamed):
    idx, _, inp = streamed
    before = read_ann_manifest(idx)
    stream_ingest_ivf(spark, inp, idx, f"{BASE}/ckpt",
                      max_files_per_trigger=1)
    assert read_ann_manifest(idx) == before


def test_redelivery_self_heals_after_ledger_crash(spark, streamed):
    idx, _, _ = streamed
    # simulate crash window (b): an append committed via the direct API
    # (as a crashed stream run would leave it), then the SAME data
    # re-delivered through a fresh stream checkpoint
    append_ivf(spark, idx, _vecs(spark, 200, 230))
    before = read_ann_manifest(idx)
    inp2 = f"{BASE}/in2"
    _vecs(spark, 200, 230).coalesce(1).write.parquet(inp2)
    stream_ingest_ivf(spark, inp2, idx, f"{BASE}/ckpt2")
    m = read_ann_manifest(idx)
    # no double append, no extra vectors; the committed append adopted
    assert m["num_vecs"] == before["num_vecs"] == 230
    assert m["append_batches"] == before["append_batches"]
    assert max(m["append_batches"]) in m["stream_batches"].values()


def test_genuine_duplicate_ids_stay_loud(spark, streamed):
    idx, _, _ = streamed
    inp3 = f"{BASE}/in3"
    # vec_id 50 is live in the BASE index — not a re-delivered append
    _vecs(spark, 50, 60).coalesce(1).write.parquet(inp3)
    from pyspark.errors.exceptions.base import PySparkException

    with pytest.raises((ValueError, PySparkException, Exception)) as ei:
        stream_ingest_ivf(spark, inp3, idx, f"{BASE}/ckpt3")
    assert "already exist" in str(ei.value)
