"""Merging PRESORTED indexes: the deferred global re-sort.

Streamed appends keep each new segment internally pre-ordered
(batch-local rank); merge_indexes restores the INDEX-WIDE pre-score
order — internal ids reassigned by global (pre desc, orig asc) rank over
the union of every source's docmap, postings decoded/remapped/re-encoded.
The bar is byte-identity: the merged unified table must equal what a
one-shot build_index_fused(pre_scores=...) writes for the same corpus."""

import shutil

import pytest
from pyspark.sql import functions as F

from stractt_spark.operators.merge import merge_indexes
from stractt_spark.plans.build import SegmentIndex, build_index_fused
from stractt_spark.sources.corpus import make_corpus
from stractt_spark.streaming.ingest import append_batch

BASE = "/tmp/stractt_merge_presorted_test"


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
def merged(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    rows = make_corpus(530)
    dps = 96

    # source A: presorted build over 300 docs + two streamed batches
    a_dir = f"{BASE}/a"
    initial = _docs(spark, rows, 0, 300)
    build_index_fused(
        spark, initial, a_dir, text_col="text", docs_per_segment=dps,
        positions=True, pre_scores=initial.select("doc_id", "pre_score"),
    )
    append_batch(spark, _docs(spark, rows, 300, 380), 0, a_dir,
                 pre_score_col="pre_score")
    append_batch(spark, _docs(spark, rows, 380, 450), 1, a_dir,
                 pre_score_col="pre_score")

    # source B: an independent presorted build over a disjoint doc range
    b_dir = f"{BASE}/b"
    b_docs = _docs(spark, rows, 450, 530)
    build_index_fused(
        spark, b_docs, b_dir, text_col="text", docs_per_segment=dps,
        positions=True, pre_scores=b_docs.select("doc_id", "pre_score"),
    )

    out_dir = f"{BASE}/merged"
    merge_indexes(spark, [a_dir, b_dir], out_dir)

    # yardstick: one-shot presorted build over ALL 530 docs
    full = _docs(spark, rows, 0, 530)
    full_dir = f"{BASE}/full"
    build_index_fused(
        spark, full, full_dir, text_col="text", docs_per_segment=dps,
        positions=True, pre_scores=full.select("doc_id", "pre_score"),
    )
    return out_dir, full_dir


def _rows(spark, index_dir):
    return sorted(
        (
            (r["segment_id"], r["term"], r["block_id"], r["first_doc_id"],
             r["last_doc_id"], r["num_docs"],
             bytes(r["id_bytes"]), bytes(r["tf_bytes"]),
             bytes(r["pos_bytes"]) if r["pos_bytes"] is not None else None,
             r["max_tf"], r["min_norm_id"])
            for r in spark.read.parquet(f"{index_dir}/index.parquet").collect()
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )


def test_merged_bytes_equal_one_shot_build(merged, spark):
    """Blocks, packed norms, packed pre-scores, exact dl tails — all of it
    byte-identical to the one-shot presorted build."""
    out_dir, full_dir = merged
    assert _rows(spark, out_dir) == _rows(spark, full_dir)


def test_merged_docmap_equals_one_shot(merged, spark):
    out_dir, full_dir = merged
    got = sorted(
        (r["doc_id"], r["orig_id"], r["pre_score"])
        for r in spark.read.parquet(f"{out_dir}/docmap.parquet").collect()
    )
    want = sorted(
        (r["doc_id"], r["orig_id"], r["pre_score"])
        for r in spark.read.parquet(f"{full_dir}/docmap.parquet").collect()
    )
    assert got == want


@pytest.mark.parametrize("query,mode", [
    ("merge sort", "should"), ("the", "should"), ("merge sort", "must"),
])
def test_merged_search_equals_one_shot(merged, spark, query, mode):
    out_dir, full_dir = merged
    got = SegmentIndex(spark, out_dir).search_list(
        query, k=10, mode=mode, with_pre_score=True, orig_ids=True)
    want = SegmentIndex(spark, full_dir).search_list(
        query, k=10, mode=mode, with_pre_score=True, orig_ids=True)
    assert [(d, round(s, 9)) for d, s in got] == [
        (d, round(s, 9)) for d, s in want
    ]


def test_merged_quota_sound_globally(merged, spark):
    """After the merge the quota's cut is globally pre-ordered again."""
    out_dir, _ = merged
    idx = SegmentIndex(spark, out_dir)
    full = idx.search_list("merge sort", k=10, mode="should",
                           with_pre_score=True, orig_ids=True)
    quota = idx.search_list("merge sort", k=10, mode="should",
                            with_pre_score=True, orig_ids=True,
                            max_docs_per_segment=48)
    assert quota == full


def test_merged_stats(merged, spark):
    import json

    out_dir, full_dir = merged
    with open(f"{out_dir}/stats.json") as f:
        got = json.load(f)
    with open(f"{full_dir}/stats.json") as f:
        want = json.load(f)
    assert got["num_docs"] == want["num_docs"] == 530
    assert got["total_tokens"] == want["total_tokens"]
    assert abs(got["avgdl"] - want["avgdl"]) < 1e-9
    assert got["presorted"] and got["positions"]


def test_merge_refuses_mixed_flavors(merged, spark):
    out_dir, _ = merged
    rows = make_corpus(40)
    plain_dir = f"{BASE}/plain"
    build_index_fused(
        spark, _docs(spark, rows, 0, 40).drop("pre_score"), plain_dir,
        text_col="text", docs_per_segment=96,
    )
    with pytest.raises(ValueError, match="mix"):
        merge_indexes(spark, [out_dir, plain_dir], f"{BASE}/mixed")


def test_merge_refuses_orig_id_collision(merged, spark):
    out_dir, full_dir = merged
    with pytest.raises(ValueError, match="collide"):
        merge_indexes(spark, [out_dir, full_dir], f"{BASE}/collide")
