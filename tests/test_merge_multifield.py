"""Merging MULTI-FIELD indexes.

Plain sources merge by prefix-sum offset remap (deferred docID remap,
reference src/inverted_index.rs:308-355); presorted sources get the same
global (pre desc, orig asc) re-rank as the single-field presorted merge.
The bar is FULL byte-identity with a one-shot
build_index_fused_multifield over the union: posting blocks, per-field
packed norm arrays, packed f32 pre-scores, AND the sentinel token
totals + exact per-doc dl tails (re-packed from the decoded tails)."""

import json
import shutil

import pytest
from pyspark.sql import functions as F

from stractt_spark.operators.merge import merge_indexes
from stractt_spark.operators.multifield import (
    MultiFieldSegmentIndex,
    build_index_fused_multifield,
)
from stractt_spark.sources.corpus import make_corpus
from stractt_spark.streaming.ingest import append_batch

BASE = "/tmp/stractt_merge_mf_test"
FIELDS = {"path": "path", "content": "content"}
DPS = 96


def _docs(spark, rows, lo, hi, id_base=None):
    """Docs [lo, hi) with ids starting at id_base (default: lo)."""
    base = lo if id_base is None else id_base
    return spark.createDataFrame(
        [
            (base + (i - lo), rows[i]["path"], rows[i]["content"])
            for i in range(lo, hi)
        ],
        "doc_id long, path string, content string",
    ).withColumn(
        "pre_score",
        F.lit(2048.0) * ((F.col("doc_id") * F.lit(2654435761)) % 1000)
        / F.lit(1000.0),
    )


@pytest.fixture(scope="module")
def merged(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    rows = make_corpus(530)

    # ---- plain: two sources with LOCAL dense id spaces (deferred remap)
    a_dir = f"{BASE}/plain_a"
    build_index_fused_multifield(
        spark, _docs(spark, rows, 0, 300).drop("pre_score"), a_dir,
        FIELDS, docs_per_segment=DPS, positions=True,
    )
    b_dir = f"{BASE}/plain_b"
    build_index_fused_multifield(
        spark,
        _docs(spark, rows, 300, 530, id_base=0).drop("pre_score"), b_dir,
        FIELDS, docs_per_segment=DPS, positions=True,
    )
    plain_out = f"{BASE}/plain_merged"
    merge_indexes(spark, [a_dir, b_dir], plain_out)
    plain_full = f"{BASE}/plain_full"
    build_index_fused_multifield(
        spark, _docs(spark, rows, 0, 530).drop("pre_score"), plain_full,
        FIELDS, docs_per_segment=DPS, positions=True,
    )

    # ---- presorted: source A streamed twice, source B independent
    pa_dir = f"{BASE}/pre_a"
    initial = _docs(spark, rows, 0, 300)
    build_index_fused_multifield(
        spark, initial, pa_dir, FIELDS, docs_per_segment=DPS,
        positions=True, pre_scores=initial.select("doc_id", "pre_score"),
    )
    append_batch(spark, _docs(spark, rows, 300, 380), 0, pa_dir,
                 pre_score_col="pre_score")
    append_batch(spark, _docs(spark, rows, 380, 450), 1, pa_dir,
                 pre_score_col="pre_score")
    pb_dir = f"{BASE}/pre_b"
    b_docs = _docs(spark, rows, 450, 530)
    build_index_fused_multifield(
        spark, b_docs, pb_dir, FIELDS, docs_per_segment=DPS,
        positions=True, pre_scores=b_docs.select("doc_id", "pre_score"),
    )
    pre_out = f"{BASE}/pre_merged"
    merge_indexes(spark, [pa_dir, pb_dir], pre_out)
    pre_full = f"{BASE}/pre_full"
    full = _docs(spark, rows, 0, 530)
    build_index_fused_multifield(
        spark, full, pre_full, FIELDS, docs_per_segment=DPS,
        positions=True, pre_scores=full.select("doc_id", "pre_score"),
    )
    return {
        "plain": (plain_out, plain_full),
        "pre": (pre_out, pre_full),
        "dirs": (a_dir, pa_dir),
    }


def _rows(spark, index_dir):
    """Every unified row, byte-for-byte (the sentinel dl tails make even
    the token-total diagnostics exactly reproducible from a merge)."""
    out = []
    for r in spark.read.parquet(f"{index_dir}/index.parquet").collect():
        out.append((
            r["segment_id"], r["term"], r["block_id"], r["first_doc_id"],
            r["last_doc_id"], r["num_docs"],
            bytes(r["id_bytes"]),
            bytes(r["tf_bytes"]),
            bytes(r["pos_bytes"]) if r["pos_bytes"] is not None else None,
            r["max_tf"], r["min_norm_id"],
        ))
    return sorted(out, key=lambda t: (t[0], t[1], t[2]))


@pytest.mark.parametrize("flavor", ["plain", "pre"])
def test_merged_bytes_equal_one_shot_build(merged, spark, flavor):
    out_dir, full_dir = merged[flavor]
    assert _rows(spark, out_dir) == _rows(spark, full_dir)


def test_merged_docmap_equals_one_shot(merged, spark):
    out_dir, full_dir = merged["pre"]
    got = sorted(
        (r["doc_id"], r["orig_id"], r["pre_score"])
        for r in spark.read.parquet(f"{out_dir}/docmap.parquet").collect()
    )
    want = sorted(
        (r["doc_id"], r["orig_id"], r["pre_score"])
        for r in spark.read.parquet(f"{full_dir}/docmap.parquet").collect()
    )
    assert got == want


@pytest.mark.parametrize("flavor", ["plain", "pre"])
def test_merged_stats_exact(merged, flavor):
    out_dir, full_dir = merged[flavor]
    with open(f"{out_dir}/stats.json") as f:
        got = json.load(f)
    with open(f"{full_dir}/stats.json") as f:
        want = json.load(f)
    assert got["num_docs"] == want["num_docs"] == 530
    assert got["multifield"]["field_totals"] == want["multifield"]["field_totals"]
    assert got["multifield"]["boosts"] == want["multifield"]["boosts"]
    assert got["total_tokens"] == want["total_tokens"]
    for f_ in got["multifield"]["avgdl"]:
        assert abs(
            got["multifield"]["avgdl"][f_] - want["multifield"]["avgdl"][f_]
        ) < 1e-9


@pytest.mark.parametrize("query,mode", [
    ("merge sort", "should"), ("the", "should"), ("merge sort", "must"),
])
def test_plain_merged_search_equals_one_shot(merged, spark, query, mode):
    out_dir, full_dir = merged["plain"]
    got = MultiFieldSegmentIndex(spark, out_dir).search_list(
        query, k=10, mode=mode)
    want = MultiFieldSegmentIndex(spark, full_dir).search_list(
        query, k=10, mode=mode)
    assert [(d, round(s, 9)) for d, s in got] == [
        (d, round(s, 9)) for d, s in want
    ]


@pytest.mark.parametrize("query,mode", [
    ("merge sort", "should"), ("the", "should"), ("merge sort", "must"),
])
def test_pre_merged_search_equals_one_shot(merged, spark, query, mode):
    out_dir, full_dir = merged["pre"]
    got = MultiFieldSegmentIndex(spark, out_dir).search_list(
        query, k=10, mode=mode, with_pre_score=True, orig_ids=True)
    want = MultiFieldSegmentIndex(spark, full_dir).search_list(
        query, k=10, mode=mode, with_pre_score=True, orig_ids=True)
    assert [(d, round(s, 9)) for d, s in got] == [
        (d, round(s, 9)) for d, s in want
    ]


def test_pre_merged_quota_sound_globally(merged, spark):
    """After the merge the quota's cut is globally pre-ordered again
    (streamed appends only guaranteed batch-local order)."""
    out_dir, _ = merged["pre"]
    idx = MultiFieldSegmentIndex(spark, out_dir)
    full = idx.search_list("merge sort", k=10, mode="should",
                           with_pre_score=True, orig_ids=True)
    quota = idx.search_list("merge sort", k=10, mode="should",
                            with_pre_score=True, orig_ids=True,
                            max_docs_per_segment=48)
    assert quota == full


def test_merged_phrase_search(merged, spark):
    out_dir, full_dir = merged["plain"]
    got = MultiFieldSegmentIndex(spark, out_dir).search_list(
        '"merge sort"', k=10, mode="should", phrase=True)
    want = MultiFieldSegmentIndex(spark, full_dir).search_list(
        '"merge sort"', k=10, mode="should", phrase=True)
    assert [(d, round(s, 9)) for d, s in got] == [
        (d, round(s, 9)) for d, s in want
    ]


def test_merge_refuses_mf_single_mix(merged, spark):
    from stractt_spark.plans.build import build_index_fused

    a_dir, _ = merged["dirs"]
    rows = make_corpus(40)
    sf_dir = f"{BASE}/single"
    build_index_fused(
        spark,
        _docs(spark, rows, 0, 40).drop("pre_score")
        .withColumnRenamed("content", "text"),
        sf_dir, text_col="text", docs_per_segment=DPS,
    )
    with pytest.raises(ValueError, match="MULTI-FIELD"):
        merge_indexes(spark, [a_dir, sf_dir], f"{BASE}/mix_sf")


def test_merge_refuses_mixed_mf_flavors(merged, spark):
    a_dir, pa_dir = merged["dirs"]
    with pytest.raises(ValueError, match="PRESORTED"):
        merge_indexes(spark, [a_dir, pa_dir], f"{BASE}/mix_flavor")


def test_merge_refuses_field_mismatch(merged, spark):
    a_dir, _ = merged["dirs"]
    rows = make_corpus(40)
    other = f"{BASE}/otherfields"
    build_index_fused_multifield(
        spark, _docs(spark, rows, 0, 40).drop("pre_score"), other,
        {"content": "content"}, docs_per_segment=DPS, positions=True,
    )
    with pytest.raises(ValueError, match="fields"):
        merge_indexes(spark, [a_dir, other], f"{BASE}/mix_fields")


def test_merge_refuses_boost_mismatch(merged, spark):
    a_dir, _ = merged["dirs"]
    rows = make_corpus(40)
    other = f"{BASE}/otherboosts"
    build_index_fused_multifield(
        spark, _docs(spark, rows, 0, 40).drop("pre_score"), other,
        FIELDS, docs_per_segment=DPS, positions=True,
        field_boosts={"path": 3.0, "content": 1.0},
    )
    with pytest.raises(ValueError, match="boosts"):
        merge_indexes(spark, [a_dir, other], f"{BASE}/mix_boosts")
