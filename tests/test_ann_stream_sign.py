"""Streaming ingest into the sign-LSH flavor through the same
stream_ingest_ann dispatch: streamed appends must equal the batch
append path row-for-row and the manifest ledger must track both."""

import shutil

import pytest
from pyspark.sql import functions as F

from stractt_spark.operators.similarity import (
    append_sign_index,
    build_sign_index,
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


def _persist_sign(spark, vecs, out):
    from stractt_spark.operators.similarity import (
        build_sign_index_persisted,
    )

    build_sign_index_persisted(spark, vecs, out, n_tables=4, n_planes=8)


def test_sign_stream_equals_batch_appends(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    idx, idx_b = f"{BASE}/idx", f"{BASE}/idx_batch"
    _persist_sign(spark, _vecs(spark, 0, 100), idx)
    _persist_sign(spark, _vecs(spark, 0, 100), idx_b)
    inp = f"{BASE}/in"
    _vecs(spark, 100, 150).coalesce(1).write.mode("append").parquet(inp)
    _vecs(spark, 150, 200).coalesce(1).write.mode("append").parquet(inp)
    stream_ingest_ann(spark, inp, idx, f"{BASE}/ckpt",
                      max_files_per_trigger=1)
    append_sign_index(spark, idx_b, _vecs(spark, 100, 150))
    append_sign_index(spark, idx_b, _vecs(spark, 150, 200))

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


def test_sign_duplicate_ids_stay_loud(spark):
    idx = f"{BASE}/idx"
    inp2 = f"{BASE}/in_dup"
    shutil.rmtree(inp2, ignore_errors=True)
    _vecs(spark, 50, 60).coalesce(1).write.parquet(inp2)
    with pytest.raises(Exception) as ei:
        stream_ingest_ann(spark, inp2, idx, f"{BASE}/ckpt_dup")
    assert "already exist" in str(ei.value)
