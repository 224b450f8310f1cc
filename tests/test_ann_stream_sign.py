"""Streaming ingest into the sign-LSH flavor through the same
stream_ingest_ann dispatch: streamed appends must equal the batch
append path row-for-row and the manifest ledger must track both."""

import shutil

import pytest
from pyspark.sql import functions as F

from stractt_spark.operators.similarity import (
    append_sign_index,
    build_sign_index_persisted,
    open_sign_index,
    read_ann_manifest,
)
from stractt_spark.streaming.ann import stream_ingest_ann

BASE = "/tmp/stractt_ann_stream_sign_test"
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
def streamed_sign(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    idx, idx_b = f"{BASE}/idx", f"{BASE}/idx_batch"
    build_sign_index_persisted(
        spark, _vecs(spark, 0, 100), idx, n_tables=4, n_planes=8)
    build_sign_index_persisted(
        spark, _vecs(spark, 0, 100), idx_b, n_tables=4, n_planes=8)
    inp = f"{BASE}/in"
    _vecs(spark, 100, 150).coalesce(1).write.mode("append").parquet(inp)
    _vecs(spark, 150, 200).coalesce(1).write.mode("append").parquet(inp)
    stream_ingest_ann(spark, inp, idx, f"{BASE}/ckpt",
                      max_files_per_trigger=1)
    # batch twin: the same two appends through the direct API
    append_sign_index(spark, idx_b, _vecs(spark, 100, 150))
    append_sign_index(spark, idx_b, _vecs(spark, 150, 200))
    return idx, idx_b


def test_sign_stream_equals_batch_appends(spark, streamed_sign):
    idx, idx_b = streamed_sign

    def rows(d):
        return sorted(
            (r["vec_id"], r["table_id"], r["bucket"])
            for r in open_sign_index(spark, d)
            .select("vec_id", "table_id", "bucket").collect()
        )

    assert rows(idx) == rows(idx_b)
    m = read_ann_manifest(idx)
    assert m["num_vecs"] == 200
    assert len(m["append_batches"]) == 2
    assert sorted(m["stream_batches"].values()) == m["append_batches"]


def test_sign_duplicate_ids_stay_loud(spark, streamed_sign):
    idx, _ = streamed_sign
    inp2 = f"{BASE}/in_dup"
    shutil.rmtree(inp2, ignore_errors=True)
    # vec_id 50 is live in the BASE index; the newest append is already
    # stream-ledgered, so the self-heal path must refuse to adopt it
    _vecs(spark, 50, 60).coalesce(1).write.parquet(inp2)
    with pytest.raises(Exception) as ei:
        stream_ingest_ann(spark, inp2, idx, f"{BASE}/ckpt_dup")
    assert "already exist" in str(ei.value)


def test_sign_duplicate_on_fresh_index_stays_loud(spark):
    """Review finding (r5): an index with ZERO appends used to crash
    with max(()) in the self-heal path instead of surfacing the
    duplicate-id error."""
    base = BASE + "_fresh"
    shutil.rmtree(base, ignore_errors=True)
    idx = f"{base}/idx"
    build_sign_index_persisted(
        spark, _vecs(spark, 0, 100), idx, n_tables=2, n_planes=8)
    inp = f"{base}/in"
    _vecs(spark, 50, 60).coalesce(1).write.parquet(inp)
    with pytest.raises(Exception) as ei:
        stream_ingest_ann(spark, inp, idx, f"{base}/ckpt")
    assert "already exist" in str(ei.value)
