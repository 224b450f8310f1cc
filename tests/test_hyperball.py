"""HyperBall sketch-based harmonic centrality: the distributed kernel
must be bit-identical (after rounding) to the pure-Python twin, and the
estimates must sit inside the documented HLL error bound of the exact
values."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from stractt_spark.operators.graph import (
    _hb_estimate,
    _hb_init,
    harmonic_centrality,
    hyperball_harmonic,
    hyperball_harmonic_py,
)


def _random_edges(n_nodes=80, n_edges=240, seed=5):
    rng = np.random.default_rng(seed)
    out = set()
    while len(out) < n_edges:
        s, d = rng.integers(0, n_nodes, 2)
        if s != d:
            out.add((int(s), int(d)))
    return sorted(out)


def test_hll_estimator_accuracy():
    """The counter alone: |estimate − true| within ~3σ for set sizes
    spanning the linear-counting and raw regimes."""
    for true_n in (1, 5, 40, 200, 1500):
        regs = _hb_init(0)
        for i in range(1, true_n):
            regs = np.maximum(regs, _hb_init(i))
        est = _hb_estimate(regs)
        sigma = 1.04 / np.sqrt(regs.size)
        assert abs(est - true_n) <= max(3 * sigma * true_n, 2.0), (
            true_n, est
        )


def test_distributed_matches_pure_python_twin(spark):
    edges = _random_edges()
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["centrality"]
        for r in hyperball_harmonic(df).collect()
    }
    want = hyperball_harmonic_py(edges)
    assert got == want


def test_error_bound_vs_exact(spark):
    """Documented bound: per-ball σ ≈ 1.04/√512 ≈ 4.6 %.  The harmonic
    sum folds many ball estimates, so per-node centrality error stays
    within a few σ; assert mean relative error < 5 % and max < 15 %
    over reachable nodes."""
    edges = _random_edges()
    df = spark.createDataFrame(edges, "src long, dst long")
    exact = {
        r["node"]: r["centrality"]
        for r in harmonic_centrality(df, max_iter=30).collect()
    }
    approx = hyperball_harmonic_py(edges)
    rel = [
        abs(approx[v] - exact[v]) / exact[v]
        for v in exact if exact[v] > 0
    ]
    assert np.mean(rel) < 0.05, np.mean(rel)
    assert max(rel) < 0.15, max(rel)


def test_chain_graph_known_values():
    """0→1→2→3: balls grow one hop per round; harmonic sums are exact
    small-set values (linear counting is near-exact at n ≤ 4)."""
    cents = hyperball_harmonic_py([(0, 1), (1, 2), (2, 3)])
    exact = {0: 0.0, 1: 1 / 3, 2: (1 + 1 / 2) / 3, 3: (1 + 1 / 2 + 1 / 3) / 3}
    for v, c in exact.items():
        assert abs(cents[v] - c) < 0.05, (v, cents[v], c)


def test_unreached_nodes_score_zero(spark):
    df = spark.createDataFrame([(0, 1), (0, 2)], "src long, dst long")
    got = {
        r["node"]: r["centrality"]
        for r in hyperball_harmonic(df).collect()
    }
    assert got[0] == 0.0
    assert got[1] > 0 and got[2] > 0
