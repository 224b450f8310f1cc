"""Graph operators: BFS distances + harmonic centrality.

Reference: uniform-weight shortest paths from each node over reversed
edges (src/webgraph/mod.rs:273-314) and harmonic centrality
``Σ_{d(u,v)<∞, u≠v} (1/d) / (n−1)`` (src/webgraph/mod.rs:411-468) — used
there to precompute the host/page centrality signals joined in at index
time (SURVEY.md §2.7).

Spark-first shape: distances as an iteratively-expanded DataFrame —
frontier ⋈ edges per hop with a min-distance fold, a.k.a. parallel BFS by
DataFrame joins.  Each iteration is one shuffle on dst; AQE handles skew.
Exact all-pairs is O(V·E) worst case like the reference's per-node
Dijkstra — the reference's own computation, kept as the exact gate.  At
web scale one switches to HyperBall sketches (Boldi & Vigna 2013):
:func:`hyperball_harmonic` keeps ONE HyperLogLog counter per node
(2^p byte registers) for the ball of nodes that reach it, grows every
ball one hop per iteration with a register-max merge (one shuffle on
dst per hop — per-node state is CONSTANT, so the per-iteration cost is
O(V·m + E·m) bytes instead of the exact table's O(reachable pairs)),
and folds the per-hop ball growth into the harmonic sum
``Σ_t (|b^t| − |b^{t−1}|)/t``.  With p=9 the counter error is
σ ≈ 1.04/√512 ≈ 4.6 % per ball (documented bound, asserted against the
exact values in tests/test_hyperball.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame, max_iter: int = 20, checkpoint_every: int = 2
) -> DataFrame:
    """edges (src, dst) → all-pairs finite distances (src, dst, dist).

    Iterates frontier ⋈ edges until fixpoint or max_iter (graph diameter
    bound).  Uniform weight 1, like the reference.

    ``checkpoint_every``: every k hops the accumulated distance table is
    ``localCheckpoint``-ed, truncating the union-of-unions lineage — an
    unbounded iterative plan otherwise grows linearly with depth and
    eventually overwhelms the driver's plan compilation on deep graphs
    (the standard iterative-algorithm discipline on Spark)."""
    # self-loops excluded from the seed: d(u,u) is not part of the
    # Σ_{u≠v} harmonic sum (a (u,u) seed row would inflate centrality)
    dist = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.lit(1).alias("dist"))
        .distinct()
        .cache()
    )
    frontier = dist
    for it in range(max_iter - 1):
        expanded = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.dst") == F.col("e.src"))
            .select(
                F.col("f.src").alias("src"),
                F.col("e.dst").alias("dst"),
                (F.col("f.dist") + 1).alias("dist"),
            )
            .filter(F.col("src") != F.col("dst"))
        )
        new = (
            expanded.join(dist, ["src", "dst"], "left_anti")
            .groupBy("src", "dst")
            .agg(F.min("dist").alias("dist"))
            .cache()
        )
        if new.count() == 0:
            break
        dist = dist.unionByName(new)
        if (it + 1) % checkpoint_every == 0:
            dist = dist.localCheckpoint(eager=True)
        else:
            dist = dist.cache()
        # CRITICAL: re-derive the frontier FROM the accumulated dist
        # (rows at the new depth) instead of carrying `new` forward.
        # frontier_k's plan otherwise embeds frontier_{k-1}'s full plan,
        # the per-hop plan size grows exponentially, and the DRIVER's
        # Catalyst analysis becomes the bottleneck (measured: a 14-hop
        # BFS spent minutes inside TreeNode analysis; .cache() does NOT
        # truncate the analyzed plan).  Deriving from dist bounds every
        # plan at checkpoint_every union layers past the last
        # localCheckpoint RDD leaf.
        frontier = dist.filter(F.col("dist") == it + 2)
    return dist


def harmonic_centrality(
    edges: DataFrame, max_iter: int = 20, round_to: int = 9,
    dist: DataFrame | None = None,
) -> DataFrame:
    """→ (node, centrality) with centrality = Σ_u 1/d(u, node) / (n−1),
    n = number of distinct nodes; nodes nobody reaches score 0.0
    (reference src/webgraph/mod.rs:411-468; its 4-node unit test values
    are reproduced in tests/test_graph.py)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n <= 1:
        return nodes.withColumn("centrality", F.lit(0.0))
    if dist is None:
        dist = bfs_distances(edges, max_iter)
    sums = (
        dist.groupBy("dst")
        .agg((F.sum(F.lit(1.0) / F.col("dist")) / F.lit(float(n - 1))).alias("centrality"))
        .withColumnRenamed("dst", "node")
    )
    return (
        nodes.join(sums, "node", "left")
        .fillna(0.0, subset=["centrality"])
        .select("node", F.round("centrality", round_to).alias("centrality"))
    )


# ---------------------------------------------------------- HyperBall

HB_P = 9  # 2^9 = 512 registers/node → σ ≈ 1.04/√512 ≈ 4.6 %


def _hb_hash(node: int) -> int:
    """Deterministic 64-bit hash shared by the distributed kernel and
    the pure-Python twin (the expected-table oracle)."""
    import hashlib

    return int.from_bytes(
        hashlib.md5(f"hb|{int(node)}".encode()).digest()[:8], "big"
    )


def _hb_init(node: int, p: int = HB_P):
    """HLL registers for the singleton {node}."""
    import numpy as np

    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    h = _hb_hash(node)
    idx = h & (m - 1)
    w = h >> p
    regs[idx] = (64 - p) - w.bit_length() + 1
    return regs


def _hb_estimate(regs) -> float:
    """Standard HyperLogLog estimator with the small-range
    linear-counting correction (Flajolet et al. 2007) — ball sizes here
    are far below the large-range regime."""
    import numpy as np

    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    if e <= 2.5 * m:
        v = int((regs == 0).sum())
        if v > 0:
            e = m * np.log(m / v)
    return float(e)


def hyperball_harmonic(
    edges: DataFrame,
    p: int = HB_P,
    max_iter: int = 30,
    round_to: int = 6,
    checkpoint_every: int = 4,
) -> DataFrame:
    """→ (node, centrality) ≈ harmonic centrality via HyperBall.

    Per iteration t: every node's ball counter is max-merged with its
    in-neighbors' counters (edges u→v grow v's ball — the set of nodes
    REACHING v), and the estimated growth adds ``Δ/t`` to the node's
    harmonic sum.  Stops when no register changes (ball fixpoint) or at
    ``max_iter``.  One shuffle on dst per hop; state is V × 2^p bytes
    regardless of how many pairs are reachable — the property that makes
    this the 100× path over the exact all-pairs table."""
    import numpy as np
    import pandas as pd

    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n <= 1:
        return nodes.withColumn("centrality", F.lit(0.0))

    def init(pdfs):
        for pdf in pdfs:
            regs = [_hb_init(int(x), p).tobytes() for x in pdf["node"]]
            yield pd.DataFrame({
                "node": pdf["node"].astype("int64"),
                "regs": pd.Series(regs, dtype="object"),
                "est": pd.Series(
                    [_hb_estimate(np.frombuffer(r, dtype=np.uint8))
                     for r in regs], dtype="float64"),
                "hsum": pd.Series(np.zeros(len(pdf)), dtype="float64"),
            })

    state = nodes.mapInPandas(
        init, "node long, regs binary, est double, hsum double"
    ).localCheckpoint(eager=True)

    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).cache()

    for t in range(1, max_iter + 1):
        contrib = (
            e.join(
                state.select(F.col("node").alias("src"), "regs"), "src"
            )
            .select(
                F.col("dst").alias("node"), "regs",
                F.lit(0.0).alias("est"), F.lit(0.0).alias("hsum"),
                F.lit(False).alias("own"),
            )
        )
        merged = state.withColumn("own", F.lit(True)).unionByName(contrib)

        def fold(pdfs, _t=t):
            # hash-partitioned by node; fold the WHOLE partition with
            # numpy (reduceat over code-sorted register rows) instead of
            # one applyInPandas group — and one vectorized estimator
            # pass — per node (the per-node pandas-frame overhead
            # dominated on large V)
            frames = list(pdfs)
            if not frames:
                return
            pdf = pd.concat(frames, ignore_index=True)
            if not len(pdf):
                return
            codes, _uniq = pd.factorize(pdf["node"], sort=True)
            order = np.argsort(codes, kind="stable")
            M = np.stack([
                np.frombuffer(bytes(b), dtype=np.uint8)
                for b in pdf["regs"].iloc[order]
            ])
            starts = np.flatnonzero(
                np.r_[True, np.diff(codes[order]) != 0]
            )
            regs_max = np.maximum.reduceat(M, starts, axis=0)
            own_mask = pdf["own"].to_numpy()[order]
            # exactly one own row per node: scatter its est/hsum/regs
            own_rows = np.flatnonzero(own_mask)
            grp_of_own = np.searchsorted(starts, own_rows, side="right") - 1
            n_grp = starts.size
            est0 = np.zeros(n_grp)
            hsum = np.zeros(n_grp)
            base_rows = np.zeros(n_grp, dtype=np.int64)
            est0[grp_of_own] = pdf["est"].to_numpy()[order][own_rows]
            hsum[grp_of_own] = pdf["hsum"].to_numpy()[order][own_rows]
            base_rows[grp_of_own] = own_rows
            changed = (regs_max != M[base_rows]).any(axis=1)
            m_ = M.shape[1]
            alpha = 0.7213 / (1.0 + 1.079 / m_)
            pw = np.power(2.0, -regs_max.astype(np.float64)).sum(axis=1)
            est1 = alpha * m_ * m_ / pw
            v = (regs_max == 0).sum(axis=1)
            small = (est1 <= 2.5 * m_) & (v > 0)
            est1[small] = m_ * np.log(m_ / v[small])
            # registers are monotone; clamp the estimator's branch-
            # boundary jitter so the harmonic sum never decreases
            inc = np.where(changed, np.maximum(est1 - est0, 0.0), 0.0)
            hsum = hsum + inc / float(_t)
            est = np.where(changed, np.maximum(est0, est1), est0)
            nodes_sorted = pdf["node"].to_numpy()[order][starts]
            yield pd.DataFrame({
                "node": pd.Series(nodes_sorted, dtype="int64"),
                "regs": pd.Series(
                    [r.tobytes() for r in regs_max], dtype="object"),
                "est": pd.Series(est, dtype="float64"),
                "hsum": pd.Series(hsum, dtype="float64"),
                "changed": pd.Series(changed, dtype="bool"),
            })

        new_state = merged.repartition("node").mapInPandas(
            fold,
            "node long, regs binary, est double, hsum double, changed boolean",
        )
        if t % checkpoint_every == 0:
            new_state = new_state.localCheckpoint(eager=True)
        else:
            new_state = new_state.cache()
        n_changed = new_state.agg(
            F.sum(F.col("changed").cast("long")).alias("c")
        ).collect()[0]["c"]
        prev, state = state, new_state.drop("changed")
        # release the superseded iteration's storage (cache/checkpoint
        # blocks otherwise accumulate one copy per hop)
        try:
            prev.unpersist()
        except Exception:
            pass
        if not n_changed:
            break

    e.unpersist()
    return state.select(
        "node",
        F.round(F.col("hsum") / F.lit(float(n - 1)), round_to).alias(
            "centrality"
        ),
    )


def hyperball_harmonic_py(
    edge_list: list[tuple[int, int]],
    p: int = HB_P,
    max_iter: int = 30,
    round_to: int = 6,
) -> dict[int, float]:
    """Pure-Python twin of :func:`hyperball_harmonic` — identical
    hashes, registers, estimator, and iteration/termination rule, so the
    distributed kernel's output is bit-identical after rounding.  The
    expected-table oracle for the driver gate."""
    import numpy as np

    edge_set = sorted({(int(s), int(d)) for s, d in edge_list if s != d})
    nodes = sorted({x for e_ in edge_set for x in e_})
    n = len(nodes)
    if n <= 1:
        return {v: 0.0 for v in nodes}
    regs = {v: _hb_init(v, p) for v in nodes}
    est = {v: _hb_estimate(regs[v]) for v in nodes}
    hsum = {v: 0.0 for v in nodes}
    in_nbrs: dict[int, list[int]] = {v: [] for v in nodes}
    for s, d in edge_set:
        in_nbrs[d].append(s)
    for t in range(1, max_iter + 1):
        new_regs = {}
        any_changed = False
        for v in nodes:
            r = regs[v]
            for u in in_nbrs[v]:
                r = np.maximum(r, regs[u])
            changed = bool((r != regs[v]).any())
            if changed:
                any_changed = True
                e1 = _hb_estimate(r)
                hsum[v] = hsum[v] + max(0.0, e1 - est[v]) / float(t)
                est[v] = max(est[v], e1)
            new_regs[v] = r
        regs = new_regs
        if not any_changed:
            break
    return {v: round(hsum[v] / float(n - 1), round_to) for v in nodes}
