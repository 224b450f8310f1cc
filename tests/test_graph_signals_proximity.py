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
    prox = pos_index.search_proximity("merge sort", k=10)
    assert len(prox) == 10
    # proximity only ADDS boosts: every score ≥ its base score
    base_all = dict(pos_index.search_list("merge sort", k=400))
    for d, s in prox:
        assert s >= base_all[d] - 1e-12
    # docs where the terms are adjacent must gain a nonzero bonus
    gained = [d for d, s in prox if s > base_all[d] + 1e-9]
    assert gained, "no doc gained a proximity bonus"


def test_proximity_single_term_passthrough(pos_index):
    assert pos_index.search_proximity("buffer", k=5) == \
        pos_index.search_list("buffer", k=5)


def test_proximity_single_phase_full_scan_identity(pos_index):
    """In-kernel ladder == plain-Python FULL-SCAN single-phase ladder
    (r4 VERDICT #3: the oracle must not share the engine's candidate
    window) — checked in both modes."""
    from stractt_spark.functions.bm25 import K1
    from stractt_spark.functions.bm25 import idf as idf_fn
    from stractt_spark.functions.bm25 import tf_component
    from stractt_spark.operators.wand import PROXIMITY_LADDER
    from stractt_spark.oracle import OracleIndex
    from stractt_spark.sources.corpus import make_corpus

    rows = make_corpus(400)
    oracle = OracleIndex(analyzer="ascii")
    for i, r in enumerate(rows):
        oracle.add(i, r["content"])
    terms = ["merge", "sort"]
    w_phrase = sum(
        idf_fn(oracle.doc_freq(t), oracle.num_docs) for t in terms
    ) * (K1 + 1.0)
    for mode in ("must", "should"):
        base = oracle.search("merge sort", k=oracle.num_docs, mode=mode)
        rescored = []
        for d, s in base:
            pos_lists = [oracle.positions.get(t, {}).get(d) for t in terms]
            bonus = 0.0
            if all(p is not None for p in pos_lists):
                arrs = [np.asarray(p) for p in pos_lists]
                for b, slop in PROXIMITY_LADDER:
                    f = sloppy_chain_count(arrs, slop)
                    if f:
                        bonus += b * w_phrase * float(
                            tf_component(f, oracle.doc_dl[d], oracle.avgdl)
                        )
            rescored.append((d, s + bonus))
        rescored.sort(key=lambda r: (-r[1], r[0]))
        want = [(d, round(s, 6)) for d, s in rescored[:10]]
        got = [(d, round(s, 6))
               for d, s in pos_index.search_proximity("merge sort", k=10,
                                                      mode=mode)]
        assert got == want, mode


def test_proximity_catches_overfetch_miss(spark):
    """A doc whose BASE rank falls far outside any overfetch window but
    whose terms sit perfectly adjacent must still win — the failure mode
    two-phase rescoring structurally misses (r4 VERDICT #3)."""
    import shutil

    from stractt_spark.plans.build import SegmentIndex, build_index_fused

    # 80 filler docs with high-tf 'alpha'/'beta' separated by >32 tokens
    # (beyond the widest ladder rung — zero proximity bonus), one winner
    # doc with a single adjacent "alpha beta" and tf 1
    filler = " ".join(
        ["alpha " + " ".join(["x"] * 40) + " beta " + " ".join(["y"] * 40)]
        * 6
    )  # tf 6 each, gap 41 > slop 32 + 1
    winner = "alpha beta " + " ".join(["pad"] * 40)  # tf 1 each, adjacent
    rows = [(i, filler) for i in range(80)] + [(80, winner)]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    d = "/tmp/stractt_prox_overfetch_idx"
    shutil.rmtree(d, ignore_errors=True)
    build_index_fused(spark, docs, d, docs_per_segment=32, positions=True)
    idx = SegmentIndex(spark, d).cache()
    base = idx.search_list("alpha beta", k=81, mode="must")
    # the winner is dead last by base bm25 — outside any 4×k=40 window
    assert [r[0] for r in base].index(80) >= 40
    prox = idx.search_proximity("alpha beta", k=10, mode="must")
    # slop-2 rungs do give filler docs a bonus, but the slop-0 adjacency
    # rung must lift the true phrase doc to the top
    assert prox[0][0] == 80


def test_full_signal_values_reference_transforms(spark):
    """The 8-signal VALUE transforms (signal.rs:62-120) against
    hand-computed expectations, including the cache-length zero paths
    (fetch ≥ 1000 ms, update > 3 years)."""
    from stractt_spark.operators.signals import (
        FULL_COEFFS,
        full_signal_values,
        precompute_score,
        region_fractions,
    )

    now = 1_700_000_000
    rows = [
        # doc, host_u64, page_u64, home, fetch, ts, trackers, region
        (0, 500_000_000, 250_000_000, 1, 99, now - 3600 * 10, 4, 1),
        (1, 0, 1_000_000_000 - 1, 0, 1000, now - 3600 * 26280, 0, 2),
        (2, 123, 456, 0, 1499, now - 3600 * 26279, 8, 3),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, host_centrality long, page_centrality long, "
        "is_homepage int, fetch_time_ms long, update_timestamp long, "
        "num_trackers int, region int",
    )
    fr = region_fractions(docs)
    assert fr == {1: 1 / 3, 2: 1 / 3, 3: 1 / 3}
    vals = {r["doc_id"]: r.asDict() for r in full_signal_values(
        docs, now, selected_region=1, region_fracs=fr).collect()}
    v0 = vals[0]
    assert math.isclose(v0["host_centrality"], 0.5)
    assert math.isclose(v0["page_centrality"], 0.25)
    assert v0["is_homepage"] == 1.0
    assert math.isclose(v0["fetch_time_ms"], 1.0 / 100.0)
    assert math.isclose(
        v0["update_timestamp"], math.log(2.0) / math.log(11.0)
    )
    assert math.isclose(v0["num_trackers"], 1.0 / 5.0)
    assert math.isclose(v0["region"], 50.0 + 1 / 3)   # selected region
    v1 = vals[1]
    assert v1["fetch_time_ms"] == 0.0        # ≥ 1000 ms → cache miss
    assert v1["update_timestamp"] == 0.0     # ≥ 3*365*24 hours → 0
    assert math.isclose(v1["region"], 1 / 3)  # unselected region
    v2 = vals[2]
    assert v2["update_timestamp"] > 0.0      # 26279 h: last cache slot
    # the coefficient fold (minus bm25) matches a hand dot product
    pre = {r["doc_id"]: r["pre_score"] for r in precompute_score(
        docs.select("doc_id").join(
            full_signal_values(docs, now, 1, fr), "doc_id"),
        {k: v for k, v in FULL_COEFFS.items() if k != "bm25"},
    ).collect()}
    want0 = (
        0.1 * (1 / 100) + 2048.0 * 0.5 + 0.1 * 1 + 20.0 * (1 / 5)
        + 4096.0 * 0.25 + 60.0 * (50.0 + 1 / 3)
        + 80.0 * (math.log(2.0) / math.log(11.0))
    )
    assert math.isclose(pre[0], want0, rel_tol=1e-12)


def test_chain_max_gaps_equals_sloppy_chain_count():
    """The vectorized one-walk-per-start rung counting must equal the
    reference sloppy_chain_count for every slop, on randomized position
    lists (deterministic seed)."""
    import random

    import numpy as np

    from stractt_spark.operators.wand import (
        _chain_max_gaps,
        sloppy_chain_count,
    )

    rng = random.Random(77)
    for _ in range(300):
        n_terms = rng.randint(2, 4)
        lists = []
        for _t in range(n_terms):
            n = rng.randint(0, 8)
            lists.append(np.array(
                sorted(rng.sample(range(40), n)), dtype=np.int64))
        if any(a.size == 0 for a in lists):
            continue
        gaps = _chain_max_gaps(lists)
        for slop in (0, 1, 2, 4, 16, 32):
            want = sloppy_chain_count(lists, slop)
            got = int((gaps <= slop + 1).sum())
            assert got == want, (lists, slop, got, want)
