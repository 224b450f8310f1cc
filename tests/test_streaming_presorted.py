"""Streaming appends to a PRESORTED index: new segments are internally
pre-score ranked (deferred global re-sort, the merge discipline), so
quota + pre ranking + orig-id mapping stay sound — query results over
original ids must be value-identical to a one-shot batch build over the
same docs."""

import json
import shutil

import pytest
from pyspark.sql import functions as F

from stractt_spark.plans.build import SegmentIndex, build_index_fused
from stractt_spark.sources.corpus import make_corpus
from stractt_spark.streaming.ingest import append_batch

BASE = "/tmp/stractt_stream_presorted_test"


def _docs(spark, rows, lo, hi):
    return spark.createDataFrame(
        [(i, rows[i]["content"]) for i in range(lo, hi)],
        "doc_id long, text string",
    ).withColumn(
        "pre_score",
        F.lit(2048.0) * ((F.col("doc_id") * F.lit(2654435761)) % 1000)
        / F.lit(1000.0),
    )


@pytest.fixture(scope="module")
def streamed_presorted(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    rows = make_corpus(450)
    dps = 96

    # streamed index: initial 300 docs, then two appended batches
    initial = _docs(spark, rows, 0, 300)
    idx_dir = f"{BASE}/streamed"
    build_index_fused(
        spark, initial, idx_dir, text_col="text", docs_per_segment=dps,
        pre_scores=initial.select("doc_id", "pre_score"),
    )
    append_batch(spark, _docs(spark, rows, 300, 380), 0, idx_dir,
                 pre_score_col="pre_score")
    append_batch(spark, _docs(spark, rows, 380, 450), 1, idx_dir,
                 pre_score_col="pre_score")

    # yardstick: one-shot batch build over ALL 450 docs
    full = _docs(spark, rows, 0, 450)
    batch_dir_ = f"{BASE}/batch"
    build_index_fused(
        spark, full, batch_dir_, text_col="text", docs_per_segment=dps,
        pre_scores=full.select("doc_id", "pre_score"),
    )
    return (
        SegmentIndex(spark, idx_dir).cache(),
        SegmentIndex(spark, batch_dir_).cache(),
    )


@pytest.mark.parametrize("query,mode", [
    ("merge sort", "should"), ("the", "should"), ("merge sort", "must"),
])
def test_streamed_equals_batch_presorted(streamed_presorted, query, mode):
    """pre+bm25 over ORIGINAL ids: streamed == one-shot batch build
    (scores are id-layout independent; df/avgdl/norms must agree)."""
    streamed, batch = streamed_presorted
    got = streamed.search_list(query, k=10, mode=mode, with_pre_score=True,
                               orig_ids=True)
    expected = batch.search_list(query, k=10, mode=mode, with_pre_score=True,
                                 orig_ids=True)
    assert [(d, round(s, 9)) for d, s in got] == [
        (d, round(s, 9)) for d, s in expected
    ]


def test_streamed_quota_sound(streamed_presorted):
    """Each streamed segment is internally pre-ordered, so the quota
    drops nothing a full scan would keep."""
    streamed, _ = streamed_presorted
    full = streamed.search_list("merge sort", k=10, mode="should",
                                with_pre_score=True, orig_ids=True)
    quota = streamed.search_list("merge sort", k=10, mode="should",
                                 with_pre_score=True, orig_ids=True,
                                 max_docs_per_segment=48)
    assert quota == full


def test_streamed_docmap_covers_all_batches(streamed_presorted, spark):
    streamed, _ = streamed_presorted
    assert streamed.docmap.count() == 450
    assert streamed.docmap.select("orig_id").distinct().count() == 450


def test_streamed_presorted_stats(streamed_presorted):
    streamed, batch = streamed_presorted
    assert streamed.stats["num_docs"] == 450 == batch.stats["num_docs"]
    assert abs(streamed.stats["avgdl"] - batch.stats["avgdl"]) < 1e-9


def test_presorted_append_retry_idempotent(streamed_presorted, spark):
    """Re-delivering a ledgered batch id is a no-op (docmap included)."""
    streamed, _ = streamed_presorted
    idx_dir = streamed.paths.root
    with open(streamed.paths.stats) as f:
        before = json.load(f)
    rows = make_corpus(450)
    append_batch(spark, _docs(spark, rows, 300, 380), 0, idx_dir,
                 pre_score_col="pre_score")
    with open(streamed.paths.stats) as f:
        after = json.load(f)
    assert after == before


def test_presorted_append_requires_pre(spark, streamed_presorted):
    streamed, _ = streamed_presorted
    rows = make_corpus(460)
    extra = _docs(spark, rows, 450, 460).drop("pre_score")
    with pytest.raises(ValueError, match="PRESORTED"):
        append_batch(spark, extra, 7, streamed.paths.root)
