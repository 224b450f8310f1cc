"""Phrase queries through the persisted segment index (WAND path with
position streams): rank-identical to the oracle and the exhaustive path."""

import math
import shutil

import pytest

from stractt_spark.oracle import build_oracle
from stractt_spark.plans.build import SegmentIndex, build_index_fused
from stractt_spark.sources.corpus import make_corpus

IDX = "/tmp/stractt_test_posidx"


@pytest.fixture(scope="module")
def built(spark):
    rows = make_corpus(500)
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(rows)], "doc_id long, content string"
    )
    shutil.rmtree(IDX, ignore_errors=True)
    build_index_fused(spark, docs, IDX, docs_per_segment=96, positions=True)
    oracle = build_oracle([(i, r["content"]) for i, r in enumerate(rows)])
    return SegmentIndex(spark, IDX).cache(), oracle


PHRASE_QUERIES = [
    ("+=", "must"),
    ("::", "should"),
    ("()", "must"),
    ("merge.sort", "must"),
    ("foo.bar", "must"),
    ("buffer +=", "must"),
    ("buffer ()", "should"),
    ("scan () -merge", "must"),
]


@pytest.mark.parametrize("query,mode", PHRASE_QUERIES)
def test_wand_phrase_rank_identity(built, query, mode):
    index, oracle = built
    got = index.search_list(query, k=10, mode=mode, phrase=True)
    expected = oracle.search(query, k=10, mode=mode, phrase=True)
    assert [d for d, _ in got] == [d for d, _ in expected], (query, mode)
    for (d1, s1), (_, s2) in zip(got, expected):
        assert math.isclose(s1, s2, rel_tol=1e-9, abs_tol=1e-12), (query, d1)


def test_non_phrase_queries_still_work(built):
    index, oracle = built
    for q, m in [("the", "should"), ("merge sort", "must")]:
        got = index.search_list(q, k=10, mode=m)
        expected = oracle.search(q, k=10, mode=m)
        assert [d for d, _ in got] == [d for d, _ in expected]


def test_positions_flag_enforced(spark, tmp_path):
    rows = make_corpus(60)
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(rows)], "doc_id long, content string"
    )
    out = str(tmp_path / "nopos")
    build_index_fused(spark, docs, out, docs_per_segment=64, positions=False)
    idx = SegmentIndex(spark, out)
    with pytest.raises(ValueError, match="positions"):
        idx.search("foo.bar", phrase=True)
