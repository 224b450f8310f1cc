"""Composed index flavors: PRESORTED multi-field build — one index with
BOTH the pre-score sort order (src/inverted_index.rs:100-106) and
per-field postings (src/schema.rs:294-315), quota + pre ranking on
multi-field queries."""

import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from stractt_spark.operators.multifield import (
    MultiFieldSegmentIndex,
    build_index_fused_multifield,
)
from stractt_spark.sources.corpus import make_corpus

BASE = "/tmp/stractt_test_mf_presorted"


def _pre(doc_id: int) -> float:
    return 2048.0 * ((doc_id * 2654435761) % 1000) / 1000.0


@pytest.fixture(scope="module")
def mfpre(spark):
    rows = make_corpus(400)
    docs = spark.createDataFrame(
        [(i, r["path"], r["content"]) for i, r in enumerate(rows)],
        "doc_id long, path string, content string",
    )
    pre = docs.select(
        "doc_id",
        (F.lit(2048.0) * ((F.col("doc_id") * F.lit(2654435761)) % 1000)
         / F.lit(1000.0)).alias("pre_score"),
    )
    shutil.rmtree(BASE, ignore_errors=True)
    build_index_fused_multifield(
        spark, docs, BASE, {"path": "path", "content": "content"},
        docs_per_segment=96, pre_scores=pre, positions=True,
    )
    plain_dir = BASE + "_plain"
    shutil.rmtree(plain_dir, ignore_errors=True)
    build_index_fused_multifield(
        spark, docs, plain_dir, {"path": "path", "content": "content"},
        docs_per_segment=96, positions=True,
    )
    return (
        MultiFieldSegmentIndex(spark, BASE).cache(),
        MultiFieldSegmentIndex(spark, plain_dir).cache(),
    )


@pytest.mark.parametrize("query,mode", [
    ("buffer", "should"), ("merge sort", "should"), ("merge sort", "must"),
    ("buffer scan -flush", "must"),
])
def test_pre_plus_bm25_equals_plain_plus_pre(mfpre, query, mode):
    """with_pre_score rank = pre(orig doc) + the plain per-field BM25 —
    verified doc-by-doc against the non-presorted index over the same
    corpus (covers BOTH kernel paths: pruned OR and the exact fallback)."""
    idx, plain = mfpre
    got = dict(idx.search_list(
        query, k=400, mode=mode, with_pre_score=True, orig_ids=True
    ))
    base = dict(plain.search_list(query, k=400, mode=mode))
    assert set(got) == set(base)
    for d, s in got.items():
        assert abs(s - (base[d] + np.float64(np.float32(_pre(d))))) < 1e-6, d


def test_quota_on_equals_full_scan(mfpre):
    """max-docs quota ON == quota OFF on the presorted mf index (sound
    early termination on the composed layout)."""
    idx, _ = mfpre
    for mode in ("should", "must"):
        full = idx.search_list(
            "merge sort", k=10, mode=mode, with_pre_score=True, orig_ids=True
        )
        quota = idx.search_list(
            "merge sort", k=10, mode=mode, with_pre_score=True,
            orig_ids=True, max_docs_per_segment=48,
        )
        assert quota == full, mode


def test_quota_prunes_candidates(mfpre):
    """A tiny quota must actually truncate (the knob is real, not a
    no-op): with max_docs=2 per segment the candidate pool shrinks."""
    idx, _ = mfpre
    full = idx.search_list("buffer", k=400, mode="should",
                           with_pre_score=True)
    tiny = idx.search_list("buffer", k=400, mode="should",
                           with_pre_score=True, max_docs_per_segment=2)
    assert len(tiny) < len(full)
    assert {d for d, _ in tiny} <= {d for d, _ in full}


def test_orig_ids_map_back(mfpre):
    """orig_ids maps internal pre-rank ids back through docmap.parquet."""
    idx, plain = mfpre
    got = idx.search_list("buffer", k=5, mode="should",
                          with_pre_score=True, orig_ids=True)
    base_docs = {d for d, _ in plain.search_list("buffer", k=400, mode="should")}
    assert {d for d, _ in got} <= base_docs
    # scores descend and include the pre component
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_guards(mfpre):
    idx, plain = mfpre
    with pytest.raises(ValueError, match="presorted"):
        plain.search("buffer", with_pre_score=True)
    with pytest.raises(ValueError, match="unsafe_quota"):
        plain.search("buffer", max_docs_per_segment=10)
    # unsafe opt-in still works on the plain index
    assert plain.search_list(
        "buffer", k=5, max_docs_per_segment=10**9, unsafe_quota=True,
        mode="should",
    )


def test_phrases_compose_with_pre(mfpre):
    """Per-field phrase queries still work on the presorted build, and
    with_pre_score adds exactly the pre component."""
    idx, plain = mfpre
    got = dict(idx.search_list(
        "flush.query", k=400, mode="must", phrase=True,
        with_pre_score=True, orig_ids=True,
    ))
    base = dict(plain.search_list("flush.query", k=400, mode="must",
                                  phrase=True))
    assert set(got) == set(base) and got
    for d, s in got.items():
        assert abs(s - (base[d] + np.float64(np.float32(_pre(d))))) < 1e-6
