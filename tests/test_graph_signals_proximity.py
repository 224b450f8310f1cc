"""Harmonic centrality (reference 4-node unit-test values), signal
aggregation, proximity ladder rescoring."""

import math

import pytest

from stractt_spark.operators.graph import bfs_distances, harmonic_centrality
from stractt_spark.operators.signals import aggregate_signals, precompute_score
from stractt_spark.operators.wand import sloppy_chain_count

import numpy as np


def test_harmonic_centrality_reference_graph(spark):
    # the reference's hand-drawn graph (webgraph/mod.rs:556-693):
    # A→B, B→C, A→C, C→A, D→C; expected C=1.0, A=2/3, B=11/18, D=0
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("A", "C"), ("C", "A"), ("D", "C")],
        "src string, dst string",
    )
    cent = {r["node"]: r["centrality"] for r in harmonic_centrality(edges).collect()}
    assert math.isclose(cent["C"], 1.0, abs_tol=1e-9)
    assert math.isclose(cent["A"], 2.0 / 3.0, abs_tol=1e-9)
    assert math.isclose(cent["B"], 11.0 / 18.0, abs_tol=1e-9)
    assert cent["D"] == 0.0


def test_bfs_distances(spark):
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "D")], "src string, dst string"
    )
    d = {(r["src"], r["dst"]): r["dist"] for r in bfs_distances(edges).collect()}
    assert d[("A", "B")] == 1 and d[("A", "C")] == 2 and d[("A", "D")] == 3
    assert ("D", "A") not in d  # unreachable stays absent (infinite)


def test_signal_aggregation(spark):
    topk = spark.createDataFrame(
        [(1, 2.0), (2, 1.9), (3, 1.0)], "doc_id long, score double"
    )
    signals = spark.createDataFrame(
        [(2, 0.01), (3, 0.001)], "doc_id long, centrality double"
    )
    out = aggregate_signals(topk, signals, {"centrality": 2048.0}).collect()
    # doc 2: 1.9 + 20.48 wins; doc 1 has no signal row (coalesce 0)
    assert [r["doc_id"] for r in out] == [2, 3, 1]
    assert math.isclose(out[0]["score"], 1.9 + 2048 * 0.01, rel_tol=1e-12)
    assert math.isclose(out[2]["score"], 2.0, rel_tol=1e-12)


def test_precompute_score(spark):
    docs = spark.createDataFrame(
        [(0, 0.5, 1.0), (1, None, 2.0)], "doc_id long, a double, b double"
    )
    out = {r["doc_id"]: r["pre_score"] for r in
           precompute_score(docs, {"a": 10.0, "b": 1.0}).collect()}
    assert out[0] == 6.0
    assert out[1] == 2.0  # null signal coalesces to 0


def test_sloppy_chain_count():
    a = np.array([0, 10])
    b = np.array([1, 12])
    c = np.array([2, 15])
    assert sloppy_chain_count([a, b, c], 0) == 1       # 0,1,2 adjacent
    assert sloppy_chain_count([a, b, c], 2) == 2       # 10,12,15 within slop 2
    assert sloppy_chain_count([a, b], 0) == 1
    assert sloppy_chain_count([np.array([5]), np.array([4])], 32) == 0  # order matters


@pytest.fixture(scope="module")
def pos_index(spark):
    import shutil

    from stractt_spark.plans.build import SegmentIndex, build_index_fused
    from stractt_spark.sources.corpus import make_corpus

    rows = make_corpus(400)
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(rows)], "doc_id long, content string"
    )
    shutil.rmtree("/tmp/stractt_prox_idx", ignore_errors=True)
    build_index_fused(spark, docs, "/tmp/stractt_prox_idx",
                      docs_per_segment=96, positions=True)
    return SegmentIndex(spark, "/tmp/stractt_prox_idx").cache()


def test_proximity_rescore(pos_index):
    base = pos_index.search_list("merge sort", k=10)
    prox = pos_index.search_proximity("merge sort", k=10)
    assert len(prox) == 10
    # proximity only ADDS boosts: every rescored score ≥ its base score
    base_all = dict(pos_index.search_list("merge sort", k=40))
    for d, s in prox:
        assert s >= base_all[d] - 1e-12
    # docs where the terms are adjacent must gain a nonzero bonus
    gained = [d for d, s in prox if s > base_all[d] + 1e-9]
    assert gained, "no doc gained a proximity bonus"


def test_proximity_single_term_passthrough(pos_index):
    assert pos_index.search_proximity("buffer", k=5) == \
        pos_index.search_list("buffer", k=5)
