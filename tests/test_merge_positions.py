"""Merging fused positions-indexes preserves phrase capability."""

import shutil

import pytest

from stractt_spark.operators.merge import merge_indexes
from stractt_spark.oracle import build_oracle
from stractt_spark.plans.build import SegmentIndex, build_index_fused
from stractt_spark.sources.corpus import make_corpus

BASE = "/tmp/stractt_mergepos"


@pytest.fixture(scope="module")
def merged(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    rows = make_corpus(300)
    subs = []
    for ci, chunk in enumerate([rows[:150], rows[150:]]):
        docs = spark.createDataFrame(
            [(i, r["content"]) for i, r in enumerate(chunk)],
            "doc_id long, content string",
        )
        d = f"{BASE}/sub{ci}"
        build_index_fused(spark, docs, d, docs_per_segment=64, positions=True)
        subs.append(d)
    out = f"{BASE}/merged"
    merge_indexes(spark, subs, out, docs_per_segment=64)
    oracle = build_oracle([(i, r["content"]) for i, r in enumerate(rows)])
    return SegmentIndex(spark, out).cache(), oracle


def test_merged_keeps_positions(merged):
    index, _ = merged
    assert index.stats["positions"] is True


@pytest.mark.parametrize("query,mode", [("()", "should"), ("merge.sort", "must"),
                                        ("+= buffer", "must")])
def test_merged_phrase_rank_identity(merged, query, mode):
    index, oracle = merged
    got = index.search_list(query, k=10, mode=mode, phrase=True)
    expected = oracle.search(query, k=10, mode=mode, phrase=True)
    assert [d for d, _ in got] == [d for d, _ in expected], (query, mode)
