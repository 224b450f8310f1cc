"""Streaming appends to MULTI-FIELD indexes: micro-batches tokenize the
build's field columns into the same per-field term namespaces (physical
'\\x02field\\x1ftoken' terms) with per-field norm sentinel rows — the
composed presorted+multifield flavor streams too, with per-batch docmaps
and batch-local pre ranking (deferred global re-sort, as on the
single-field flavor)."""

import json
import shutil

import pytest
from pyspark.sql import functions as F

from stractt_spark.operators.multifield import (
    MultiFieldSegmentIndex,
    build_index_fused_multifield,
)
from stractt_spark.sources.corpus import make_corpus
from stractt_spark.streaming.ingest import append_batch

BASE = "/tmp/stractt_stream_mf_test"


def _docs(spark, rows, lo, hi):
    return spark.createDataFrame(
        [(i, rows[i]["path"], rows[i]["content"]) for i in range(lo, hi)],
        "doc_id long, path string, content string",
    ).withColumn(
        "pre_score",
        F.lit(2048.0) * ((F.col("doc_id") * F.lit(2654435761)) % 1000)
        / F.lit(1000.0),
    )


FIELDS = {"path": "path", "content": "content"}


@pytest.fixture(scope="module")
def streamed_mf(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    rows = make_corpus(450)
    dps = 96

    # plain (non-presorted) streamed MF index: 300 docs + two batches
    plain_dir = f"{BASE}/plain"
    build_index_fused_multifield(
        spark, _docs(spark, rows, 0, 300).drop("pre_score"), plain_dir,
        FIELDS, docs_per_segment=dps, positions=True,
    )
    append_batch(spark, _docs(spark, rows, 300, 380).drop("pre_score"),
                 0, plain_dir, order_cols=("doc_id",))
    append_batch(spark, _docs(spark, rows, 380, 450).drop("pre_score"),
                 1, plain_dir, order_cols=("doc_id",))

    # presorted streamed MF index over the same docs
    pre_dir = f"{BASE}/pre"
    initial = _docs(spark, rows, 0, 300)
    build_index_fused_multifield(
        spark, initial, pre_dir, FIELDS, docs_per_segment=dps,
        positions=True, pre_scores=initial.select("doc_id", "pre_score"),
    )
    append_batch(spark, _docs(spark, rows, 300, 380), 0, pre_dir,
                 pre_score_col="pre_score")
    append_batch(spark, _docs(spark, rows, 380, 450), 1, pre_dir,
                 pre_score_col="pre_score")

    # yardsticks: one-shot batch builds over ALL 450 docs
    full = _docs(spark, rows, 0, 450)
    batch_plain = f"{BASE}/batch_plain"
    build_index_fused_multifield(
        spark, full.drop("pre_score"), batch_plain, FIELDS,
        docs_per_segment=dps, positions=True,
    )
    batch_pre = f"{BASE}/batch_pre"
    build_index_fused_multifield(
        spark, full, batch_pre, FIELDS, docs_per_segment=dps,
        positions=True, pre_scores=full.select("doc_id", "pre_score"),
    )
    return {
        "plain": MultiFieldSegmentIndex(spark, plain_dir).cache(),
        "pre": MultiFieldSegmentIndex(spark, pre_dir).cache(),
        "batch_plain": MultiFieldSegmentIndex(spark, batch_plain).cache(),
        "batch_pre": MultiFieldSegmentIndex(spark, batch_pre).cache(),
    }


@pytest.mark.parametrize("query,mode", [
    ("merge sort", "should"), ("buffer", "should"), ("merge sort", "must"),
])
def test_streamed_presorted_mf_equals_batch(streamed_mf, query, mode):
    """pre + Σ_f boost·bm25_f over ORIGINAL ids: streamed == one-shot
    (df/per-field avgdl/norms/pre all must agree)."""
    got = streamed_mf["pre"].search_list(
        query, k=10, mode=mode, with_pre_score=True, orig_ids=True)
    expected = streamed_mf["batch_pre"].search_list(
        query, k=10, mode=mode, with_pre_score=True, orig_ids=True)
    assert [(d, round(s, 9)) for d, s in got] == [
        (d, round(s, 9)) for d, s in expected
    ]


def test_streamed_mf_phrase_equals_batch(streamed_mf):
    """Per-field positions stream through appends (phrase queries work
    across build + batch segments)."""
    got = streamed_mf["pre"].search_list(
        "flush.query", k=10, mode="must", phrase=True,
        with_pre_score=True, orig_ids=True)
    expected = streamed_mf["batch_pre"].search_list(
        "flush.query", k=10, mode="must", phrase=True,
        with_pre_score=True, orig_ids=True)
    assert got and [(d, round(s, 9)) for d, s in got] == [
        (d, round(s, 9)) for d, s in expected
    ]


def test_streamed_mf_quota_sound(streamed_mf):
    full = streamed_mf["pre"].search_list(
        "merge sort", k=10, mode="should", with_pre_score=True,
        orig_ids=True)
    quota = streamed_mf["pre"].search_list(
        "merge sort", k=10, mode="should", with_pre_score=True,
        orig_ids=True, max_docs_per_segment=48)
    assert quota == full


@pytest.mark.parametrize("query,mode", [
    ("merge sort", "should"), ("buffer scan", "must"),
])
def test_streamed_plain_mf_score_multiset(streamed_mf, query, mode):
    """Non-presorted streamed MF: internal ids differ from the one-shot
    build (batch ids start past the high-water mark), but the SCORE
    multiset must match — df, per-field avgdl and norms all agree."""
    got = sorted(round(s, 9) for _, s in streamed_mf["plain"].search_list(
        query, k=450, mode=mode))
    expected = sorted(round(s, 9) for _, s in
                      streamed_mf["batch_plain"].search_list(
                          query, k=450, mode=mode))
    assert got == expected and got


def test_streamed_mf_stats_match_batch(streamed_mf):
    s, b = streamed_mf["plain"].stats, streamed_mf["batch_plain"].stats
    assert s["num_docs"] == 450 == b["num_docs"]
    assert s["multifield"]["field_totals"] == b["multifield"]["field_totals"]
    for f_ in s["multifield"]["avgdl"]:
        assert abs(s["multifield"]["avgdl"][f_]
                   - b["multifield"]["avgdl"][f_]) < 1e-9


def test_streamed_mf_term_stats_match_batch(streamed_mf, spark):
    """Incremental term_stats fold counts only real physical terms (no
    \\x00 metadata rows) and matches the one-shot build exactly."""
    got = {
        r["term"]: r["df"]
        for r in streamed_mf["plain"].term_stats.collect()
    }
    expected = {
        r["term"]: r["df"]
        for r in streamed_mf["batch_plain"].term_stats.collect()
    }
    assert got == expected
    assert not any(t.startswith("\x00") for t in got)


def test_mf_append_retry_idempotent(streamed_mf, spark):
    idx = streamed_mf["pre"]
    with open(idx.paths.stats) as f:
        before = json.load(f)
    rows = make_corpus(450)
    append_batch(spark, _docs(spark, rows, 300, 380), 0, idx.paths.root,
                 pre_score_col="pre_score")
    with open(idx.paths.stats) as f:
        after = json.load(f)
    assert after == before


def test_streamed_mf_with_attrs_equals_batch(spark):
    """MF + attr terms + streaming: streamed batches must write the same
    \x01 attr posting rows as the batch build, so site: filters and
    goggle site clauses keep covering appended docs."""
    from stractt_spark.sources.corpus import make_corpus

    rows = make_corpus(200)
    sites = ["a.com", "b.com"]

    def docs(lo, hi):
        return spark.createDataFrame(
            [(i, rows[i]["path"], rows[i]["content"], sites[i % 2])
             for i in range(lo, hi)],
            "doc_id long, path string, content string, site string",
        )

    inc = f"{BASE}/attr_inc"
    shutil.rmtree(inc, ignore_errors=True)
    build_index_fused_multifield(
        spark, docs(0, 120), inc, FIELDS, docs_per_segment=48,
        positions=True, attr_cols=["site"],
    )
    append_batch(spark, docs(120, 200), 0, inc, order_cols=("doc_id",))

    full = f"{BASE}/attr_full"
    shutil.rmtree(full, ignore_errors=True)
    build_index_fused_multifield(
        spark, docs(0, 200), full, FIELDS, docs_per_segment=48,
        positions=True, attr_cols=["site"],
    )
    a = MultiFieldSegmentIndex(spark, inc)
    b = MultiFieldSegmentIndex(spark, full)
    # non-presorted appends assign SEGMENT-ALIGNED internal ids (batch
    # base rounds up to a segment boundary), so internal ids past the
    # append differ from the one-shot build by the gap — compare score
    # multisets, like the plain streamed-MF test above
    for q in ("hash join site:a.com", "merge sort -site:b.com"):
        got = [s for _, s in a.search_list(q, k=10, mode="should")]
        want = [s for _, s in b.search_list(q, k=10, mode="should")]
        assert got == want, q
    # appended docs must appear under the filter: batch base aligned to
    # 144 (= ceil(120/48)·48), original id i ≥ 120 → internal 144+(i−120)
    got_all = a.search_list("return site:b.com", k=200, mode="should")
    assert any(d >= 144 for d, _ in got_all)
    # b.com == odd original ids on BOTH sides of the append gap
    assert all(
        (d % 2 == 1) if d < 120 else ((d - 24) % 2 == 1)
        for d, _ in got_all
    )
