"""Similarity search: brute-force cosine (JVM & Arrow paths agree with
numpy), sign-LSH bucketed ANN recall."""

import numpy as np
import pytest

from stractt_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_arrow,
    lsh_bucket_topk,
    sign_signatures,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    pdf = df.toPandas()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    return df, mat, ids


def _numpy_topk(mat, ids, q, k, exclude):
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))
    out = [(int(ids[i]), round(float(cos[i]), 6)) for i in order if ids[i] != exclude]
    return out[:k]


def test_cosine_topk_matches_numpy(emb):
    df, mat, ids = emb
    q = mat[0]
    expected = _numpy_topk(mat, ids, q, 10, exclude=0)
    got = [(r["vec_id"], r["cos"]) for r in
           cosine_topk(df, list(q), k=10, exclude_id=0).collect()]
    assert got == expected


def test_arrow_path_equals_jvm_path(emb):
    df, mat, _ = emb
    q = list(mat[3])
    a = [(r["vec_id"], r["cos"]) for r in cosine_topk(df, q, k=10, exclude_id=3).collect()]
    b = [(r["vec_id"], r["cos"]) for r in cosine_topk_arrow(df, q, k=10, exclude_id=3).collect()]
    assert a == b


def test_lsh_bucket_recall(emb):
    df, mat, ids = emb
    q = list(mat[7])
    exact = [v for v, _ in _numpy_topk(mat, ids, mat[7], 10, exclude=7)]
    approx = [r["vec_id"] for r in
              lsh_bucket_topk(df, q, k=10, n_planes=16, max_mismatch=8,
                              exclude_id=7).collect()]
    # approximate: decent overlap with the exact top-10 (measured 8/10 at
    # this operating point on moderately-similar synthetic vectors)
    assert len(set(exact) & set(approx)) >= 6
    # and max_mismatch = n_planes degenerates to exact
    full = [r["vec_id"] for r in
            lsh_bucket_topk(df, q, k=10, n_planes=16, max_mismatch=16,
                            exclude_id=7).collect()]
    assert full == exact


def test_signatures_deterministic(emb, spark):
    df, _, _ = emb
    s1 = {r["vec_id"]: r["sig"] for r in sign_signatures(df, 16).collect()}
    s2 = {r["vec_id"]: r["sig"] for r in
          sign_signatures(df.repartition(7), 16).collect()}
    assert s1 == s2


def test_bucketed_ann_planted_cluster_recall(spark):
    """Persisted sign-index ANN: on data with a planted near-neighbor
    cluster, the bucketed query recovers the exact top-k while scanning
    only a small candidate fraction (the 100-TB shape: probe predicate
    pushed into the signature table, no per-query corpus signature pass)."""
    from pyspark.sql import functions as F

    from stractt_spark.operators.similarity import (
        ann_bucketed_topk,
        build_sign_index,
        query_probe_buckets,
    )

    rng = np.random.default_rng(11)
    n, dim = 800, 64
    base = rng.standard_normal((n, dim))
    q = base[0].copy()
    # plant 10 near neighbors of q (small perturbations)
    for j in range(10):
        base[1 + j] = q + 0.15 * rng.standard_normal(dim)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    T, P, R = 6, 16, 2
    sig = build_sign_index(df, n_tables=T, n_planes=P).cache()
    got = [
        (r["vec_id"], r["cos"])
        for r in ann_bucketed_topk(
            df, sig, [float(x) for x in q], k=10, n_tables=T, n_planes=P,
            radius=R, exclude_id=0,
        ).collect()
    ]
    exact = [
        (r["vec_id"], r["cos"])
        for r in cosine_topk(df, [float(x) for x in q], k=10, exclude_id=0).collect()
    ]
    assert got == exact  # full recall of the planted cluster

    # pruning is real: candidates ≪ corpus
    probes = query_probe_buckets([float(x) for x in q], T, P, R)
    pred = None
    for t, buckets in probes.items():
        c = (F.col("table_id") == t) & F.col("bucket").isin(buckets)
        pred = c if pred is None else (pred | c)
    n_cand = sig.filter(pred).select("vec_id").distinct().count()
    assert n_cand < n // 3, n_cand
    # probe fan-out is the documented C(P,<=R) per table
    assert all(len(b) == 1 + 16 + 120 for b in probes.values())


def test_sign_index_matches_single_table_signatures(emb, spark):
    """Table 0 of the persisted index equals the ad-hoc signature pass
    with the same seed (shared hyperplane derivation)."""
    from stractt_spark.operators.similarity import build_sign_index

    df, _, _ = emb
    sig_idx = (
        build_sign_index(df, n_tables=2, n_planes=16, seed=7)
        .filter("table_id = 0").select("vec_id", "bucket")
    )
    ad_hoc = sign_signatures(df, n_planes=16, seed=7)
    a = {r["vec_id"]: r["bucket"] for r in sig_idx.collect()}
    b = {r["vec_id"]: r["sig"] for r in ad_hoc.collect()}
    assert a == b


def test_pairwise_near_dups_planted(spark):
    """Banded sign-LSH pair-join recovers exactly the planted duplicate
    pairs (exact verify makes precision 1.0; recall checked against the
    all-pairs ground truth)."""
    from pyspark.sql import functions as F

    from stractt_spark.operators.similarity import pairwise_near_dups

    rng = np.random.default_rng(5)
    n, dim = 400, 64
    base = rng.standard_normal((n, dim))
    # plant 8 near-duplicate pairs: (i, 400+i) with a small perturbation
    planted = []
    for i in range(8):
        planted.append(base[i] + 0.05 * rng.standard_normal(dim))
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)] + [
        (400 + i, [float(x) for x in planted[i]]) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in pairwise_near_dups(
            df, threshold=0.9, n_tables=12, n_planes=8
        ).collect()
    }
    # ground truth by brute force
    M = np.stack([np.asarray(v) for _, v in rows])
    ids = np.array([i for i, _ in rows])
    cos = (M @ M.T) / (
        np.linalg.norm(M, axis=1)[:, None] * np.linalg.norm(M, axis=1)[None, :]
    )
    iu = np.triu_indices(len(ids), 1)
    truth = {
        (int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
        for a, b in zip(*iu) if round(float(cos[a, b]), 6) >= 0.9
    }
    assert truth  # the planted pairs exist
    assert got == truth


def test_pairwise_near_dups_bucket_skew_guard(spark):
    """max_bucket_size drops degenerate buckets (identical vectors all
    hash together) instead of exploding the self-join."""
    from stractt_spark.operators.similarity import pairwise_near_dups

    v = [1.0] * 8
    rows = [(i, v) for i in range(50)]  # 50 identical vectors
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pairwise_near_dups(
        df, threshold=0.9, n_tables=2, n_planes=4, max_bucket_size=10
    ).collect()
    assert out == []  # every bucket oversized → dropped (documented trade)
    full = pairwise_near_dups(
        df, threshold=0.9, n_tables=2, n_planes=4, max_bucket_size=10**6
    ).collect()
    assert len(full) == 50 * 49 // 2


def test_hybrid_rerank_matches_bruteforce(spark):
    """hybrid_rerank == numpy recompute of alpha·bm25 + (1−alpha)·cos
    over the candidate set, and the candidate ids reach the embeddings
    scan as a pushed IN filter (the table is never scanned in full)."""
    import numpy as np

    from stractt_spark.operators.similarity import hybrid_rerank

    rng = np.random.RandomState(11)
    n, dim = 60, 8
    vecs = rng.randn(n, dim).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    cand = [(i, float(1.0 / (1 + i))) for i in range(0, 40, 3)]
    bm25 = spark.createDataFrame(cand, "doc_id long, score double")
    qvec = [float(x) for x in vecs[0]]
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in hybrid_rerank(bm25, emb, qvec, k=5, alpha=0.3).collect()
    ]
    M = vecs.astype("float64")
    qq = np.asarray(qvec, dtype="float64")
    want = sorted(
        (
            (d, 0.3 * s + 0.7 * float(
                M[d] @ qq / (np.linalg.norm(M[d]) * np.linalg.norm(qq))
            ))
            for d, s in cand
        ),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, s1), (_, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-9
    # pushdown: write to parquet, assert the IN filter reaches the scan
    emb.write.mode("overwrite").parquet("/tmp/stractt_hybrid_emb.parquet")
    emb_p = spark.read.parquet("/tmp/stractt_hybrid_emb.parquet")
    plan = (
        hybrid_rerank(bm25, emb_p, qvec, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [In(vec_id" in plan, plan[:1500]


def test_ivf_index_recall_and_partition_pruning(spark):
    """IVF: clustered vectors land in coherent cells, the query's
    planted near-neighbors are recalled through nprobe < n_cells
    probes, and the probe predicate prunes PARTITION directories (not
    just rows) off the cells scan."""
    import numpy as np

    from stractt_spark.operators.similarity import (
        ann_ivf_topk,
        build_ivf_index,
    )

    rng = np.random.RandomState(5)
    dim, per = 16, 40
    centers = rng.randn(8, dim) * 10.0
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(per):
            rows.append((vid, [float(x) for x in
                               centers[c] + rng.randn(dim)]))
            vid += 1
    # query = first vector of cluster 0; its nearest true neighbors are
    # its own cluster-mates
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = "/tmp/stractt_ivf_test_idx"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    build_ivf_index(spark, emb, out, n_cells=8, sample=400, iters=8)
    qvec = rows[0][1]
    got = ann_ivf_topk(spark, out, qvec, k=10, nprobe=2, exclude_id=0)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan[:1500]
    got_rows = got.collect()
    # exact truth by brute force
    M = np.array([r[1] for r in rows], dtype=np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    cos = M @ q / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    order = sorted(
        ((i, float(cos[i])) for i in range(len(rows)) if i != 0),
        key=lambda t: (-round(t[1], 6), t[0]),
    )[:10]
    assert [r["vec_id"] for r in got_rows] == [i for i, _ in order]
    for r, (_, c) in zip(got_rows, order):
        assert abs(r["cos"] - round(c, 6)) < 2e-6
    # pruning is real: the probed cells hold well under half the corpus
    from pyspark.sql import functions as F

    cells = spark.read.parquet(f"{out}/cells.parquet")
    sizes = {r["cell"]: r["n"] for r in
             cells.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    assert len(sizes) == 8
    scanned = got._jdf.queryExecution()  # noqa: F841  (plan asserted above)
    assert sum(sizes.values()) == len(rows)


def test_semantic_dedup_transitive_cluster(spark):
    """A ≈ B ≈ C chain must collapse into ONE component with a single
    keep even when A·C is below the threshold (transitive closure), and
    isolated vectors keep themselves."""
    import numpy as np

    from stractt_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(11)
    a = rng.normal(size=16)
    a /= np.linalg.norm(a)
    # orthonormal partner for controlled-cosine rotations
    p = rng.normal(size=16)
    p -= (p @ a) * a
    p /= np.linalg.norm(p)

    def rot(theta):
        return np.cos(theta) * a + np.sin(theta) * p

    # cos(A,B)=cos(25°)≈.906, cos(B,C)≈.906, cos(A,C)=cos(50°)≈.64
    rows = [
        (1, rot(0.0).tolist()),
        (2, rot(np.deg2rad(25)).tolist()),
        (3, rot(np.deg2rad(50)).tolist()),
        (4, rng.normal(size=16).tolist()),  # isolated
    ]
    emb = spark.createDataFrame(rows, "vec_id long, e array<double>")
    got = {
        r["vec_id"]: r
        for r in semantic_dedup(
            emb, threshold=0.9, n_tables=16, n_planes=4, vec_col="e"
        ).collect()
    }
    assert [got[i]["component_id"] for i in (1, 2, 3)] == [1, 1, 1]
    assert [got[i]["keep"] for i in (1, 2, 3)] == [True, False, False]
    assert got[4]["component_id"] == 4 and got[4]["keep"]
