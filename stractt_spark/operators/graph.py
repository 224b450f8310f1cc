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
Dijkstra; at web scale one switches this to HyperBall-style sketches —
out of scope here (SURVEY.md marks it optional), the exact form is what
the reference computes and tests.
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
