"""Multi-field boosted BM25: rank-identity vs the multi-field oracle and
reference-shaped behaviors (title/path boost dominance)."""

import math

import pytest

from stractt_spark.operators.multifield import (
    MultiFieldOracle,
    bm25_topk_multifield,
    build_postings_multifield,
    multifield_stats,
)
from stractt_spark.sources.corpus import make_corpus


@pytest.fixture(scope="module")
def mf(spark):
    rows = make_corpus(400)
    docs = spark.createDataFrame(
        [(i, r["path"], r["content"]) for i, r in enumerate(rows)],
        "doc_id long, path string, content string",
    )
    postings = build_postings_multifield(
        docs, {"path": "path", "content": "content"}
    ).cache()
    stats = multifield_stats(docs, postings)
    oracle = MultiFieldOracle()
    for i, r in enumerate(rows):
        oracle.add(i, {"path": r["path"], "content": r["content"]})
    return docs, postings, stats, oracle, rows


QUERIES = [
    ("buffer", "must"),
    ("merge sort", "must"),
    ("src scan", "must"),       # 'src' appears mostly in paths
    ("the buffer", "should"),
    ("scan -merge", "must"),
    ("zzz_nothing", "must"),
]


@pytest.mark.parametrize("query,mode", QUERIES)
def test_multifield_rank_identity(mf, query, mode):
    docs, postings, stats, oracle, _ = mf
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk_multifield(
            postings, query, stats["num_docs"], stats["avgdl"], k=10, mode=mode
        ).collect()
    ]
    expected = oracle.search(query, k=10, mode=mode)
    assert [d for d, _ in got] == [d for d, _ in expected], (query, mode)
    for (d1, s1), (_, s2) in zip(got, expected):
        assert math.isclose(s1, s2, rel_tol=1e-9, abs_tol=1e-12), (query, d1)


def test_path_match_counts_as_match(mf):
    """A Must term matched ONLY in the path field still satisfies the term
    (Should over fields inside the Must, parser.rs:54-91)."""
    docs, postings, stats, oracle, rows = mf
    # 'src' occurs in every path ('src/modX/...') but rarely in content
    res = oracle.search("src", k=400, mode="must")
    assert len(res) == 400  # every doc matches via its path


def test_path_boost_dominates(spark):
    """With title-like boost 10 vs body 4, a path match outranks a content
    match of the same term (reference boost ordering, schema.rs:294-315)."""
    rows = [
        (0, "alpha util", "filler words here three"),
        (1, "beta util", "alpha words here three"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, path string, content string")
    postings = build_postings_multifield(docs, {"path": "path", "content": "content"})
    stats = multifield_stats(docs, postings)
    got = [
        r["doc_id"]
        for r in bm25_topk_multifield(
            postings, "alpha", stats["num_docs"], stats["avgdl"], k=2, mode="must"
        ).collect()
    ]
    assert got == [0, 1]
    oracle = MultiFieldOracle()
    for i, p, c in rows:
        oracle.add(i, {"path": p, "content": c})
    assert [d for d, _ in oracle.search("alpha", k=2)] == [0, 1]
