"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — brute-force cosine top-k against a query vector,
  entirely JVM-side (``zip_with`` dot product + ``aggregate`` norms inside
  whole-stage codegen, then TakeOrderedAndProject).  The correct baseline
  and the verification oracle for the approximate paths.
* :func:`cosine_topk_arrow` — the same math as a vectorized numpy matmul
  in ``mapInPandas`` (one GEMV per Arrow batch) — the throughput path when
  vectors are long or k·batches is large.
* :func:`lsh_bucket_topk` — random-hyperplane (sign-LSH) bucketing: docs
  whose sign-signature shares ≥ (n_planes − max_mismatch) bits with the
  query's are rescored exactly; the scale path (bucket filter prunes the
  scan; at 100 TB the signature column is partition/bucket key material).
* :func:`pairwise_near_dups` — embedding near-duplicate pairs above a
  cosine threshold via sign-LSH banding + exact verify (the embedding
  analogue of MinHash dedup).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """→ (vec_id, cos) top-k by cosine similarity, JVM-side only.

    Vectors are cast to double before any arithmetic so results are
    bit-identical to the numpy/DuckDB double paths."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    df = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        (_dot(v, q) / (_norm(v) * _norm(q))).alias("_cos"),
    )
    if exclude_id is not None:
        df = df.filter(F.col("vec_id") != F.lit(exclude_id))
    return (
        df.orderBy(F.desc("_cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("_cos", 6).alias("cos"))
    )


def cosine_topk_arrow(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Same result as :func:`cosine_topk`; one numpy GEMV per Arrow batch,
    per-partition top-k before the global cut (partial/final top-k)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    src = embeddings.select(F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("_v"))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"].values])
            dots = m @ q
            norms = np.sqrt((m * m).sum(axis=1))
            cos = dots / (norms * qn)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            if exclude_id is not None:
                keep = ids != exclude_id
                ids, cos = ids[keep], cos[keep]
            if cos.size > k:  # per-batch partial top-k
                part = np.argpartition(-cos, k - 1)[:k]
                ids, cos = ids[part], cos[part]
            yield pd.DataFrame({"vec_id": pd.Series(ids, dtype="int64"),
                                "cos": pd.Series(cos, dtype="float64")})

    return (
        src.mapInPandas(score, "vec_id long, cos double")
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("cos", 6).alias("cos"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def sign_signatures(
    embeddings: DataFrame,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """→ (vec_id, sig long): random-hyperplane sign bits packed into a long."""

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        bits = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"].values])
            if planes is None:
                planes = _hyperplanes(m.shape[1], n_planes, seed)
            signs = (m @ planes.T) > 0  # (n, planes)
            sig = (signs.astype(np.uint64) * bits).sum(axis=1).astype(np.int64)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].astype("int64"),
                                "sig": pd.Series(sig, dtype="int64")})

    src = embeddings.select(F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("_v"))
    return src.mapInPandas(emit, "vec_id long, sig long")


def build_sign_index(
    embeddings: DataFrame,
    n_tables: int = 4,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Persistable multi-table sign-LSH index: → (table_id, bucket,
    vec_id), one row per (vector, table).

    THE scale path for ANN: built once (one GEMM per Arrow batch against
    all ``n_tables × n_planes`` hyperplanes), written as a table with
    ``bucket`` as filter/partition-key material.  Queries then push a
    ``(table_id, bucket) IN probes`` predicate into the parquet scan and
    rescore only the matching candidate ids — per-query work is
    O(candidates), never a corpus-wide signature scan."""

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        bits = np.uint64(1) << np.arange(n_planes, dtype=np.uint64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"].values])
            if planes is None:
                planes = np.concatenate(
                    [_hyperplanes(m.shape[1], n_planes, seed + t)
                     for t in range(n_tables)]
                )  # (T*P, dim)
            signs = (m @ planes.T) > 0  # (n, T*P)
            n = len(pdf)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            out_t = np.repeat(np.arange(n_tables, dtype=np.int32), n)
            out_id = np.tile(ids, n_tables)
            buckets = np.empty(n * n_tables, dtype=np.int64)
            for t in range(n_tables):
                sig = (
                    signs[:, t * n_planes:(t + 1) * n_planes].astype(np.uint64)
                    * bits
                ).sum(axis=1)
                buckets[t * n:(t + 1) * n] = sig.astype(np.int64)
            yield pd.DataFrame(
                {"table_id": pd.Series(out_t, dtype="int32"),
                 "bucket": pd.Series(buckets, dtype="int64"),
                 "vec_id": pd.Series(out_id, dtype="int64")}
            )

    src = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("_v")
    )
    return src.mapInPandas(emit, "table_id int, bucket long, vec_id long")


def query_probe_buckets(
    query_vec: list[float],
    n_tables: int = 4,
    n_planes: int = 16,
    radius: int = 1,
    seed: int = 7,
) -> dict[int, list[int]]:
    """Multi-probe LSH bucket set per table: the query's bucket plus every
    bucket within Hamming distance ≤ ``radius`` (C(P,≤r) probes/table —
    the standard recall knob that avoids building more tables)."""
    from itertools import combinations

    q = np.asarray(query_vec, dtype=np.float64)
    out: dict[int, list[int]] = {}
    for t in range(n_tables):
        planes = _hyperplanes(len(q), n_planes, seed + t)
        bits = np.uint64(1) << np.arange(n_planes, dtype=np.uint64)
        sig = int(((q @ planes.T > 0).astype(np.uint64) * bits).sum())
        probes = [sig]
        for r in range(1, radius + 1):
            for combo in combinations(range(n_planes), r):
                flip = 0
                for b in combo:
                    flip |= 1 << b
                probes.append(sig ^ flip)
        out[t] = probes
    return out


def ann_bucketed_topk(
    embeddings: DataFrame,
    sign_index: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_tables: int = 4,
    n_planes: int = 16,
    radius: int = 1,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Approximate top-k over a PERSISTED sign index: probe buckets are a
    pushed-down ``(table_id, bucket)`` predicate, candidates are the union
    over tables, and only candidates are exactly rescored (cosine).  The
    parameters (tables × probes) trade recall for candidates scanned; the
    exact rescore makes every returned (id, cos) value exact."""
    probes = query_probe_buckets(query_vec, n_tables, n_planes, radius, seed)
    pred = None
    for t, buckets in probes.items():
        c = (F.col("table_id") == t) & F.col("bucket").isin(buckets)
        pred = c if pred is None else (pred | c)
    cand = sign_index.filter(pred).select("vec_id").distinct()
    hits = embeddings.join(
        cand.withColumnRenamed("vec_id", "_near_id"),
        embeddings[id_col].cast("long") == F.col("_near_id"),
        "left_semi",
    )
    return cosine_topk(hits, query_vec, k, id_col, vec_col, exclude_id)


def pairwise_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_tables: int = 8,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold — the
    embedding analogue of MinHash dedup, and the same scale shape:

    1. multi-table sign signatures (:func:`build_sign_index`; coarser
       buckets than the top-k ANN config — pair recall needs higher
       per-table collision probability);
    2. candidate pairs = vectors sharing a (table_id, bucket), deduped
       across tables — a self-join on the bucket key, NEVER all-pairs;
    3. ``max_bucket_size`` drops degenerate buckets before the self-join
       (a bucket with f vectors contributes f² candidate rows — the
       skew guard, same role as Jaccard's max_shingle_freq);
    4. exact cosine verification of candidates only; output
       (id_a, id_b, cos) with id_a < id_b, cos rounded 6dp ≥ threshold.
    """
    sig = build_sign_index(
        embeddings, n_tables, n_planes, id_col, vec_col, seed
    )
    sizes = sig.groupBy("table_id", "bucket").count()
    kept = sig.join(
        F.broadcast(sizes.filter(F.col("count") > max_bucket_size)
                    .select("table_id", "bucket")),
        ["table_id", "bucket"], "left_anti",
    )
    cand = (
        kept.alias("x")
        .join(kept.alias("y"), ["table_id", "bucket"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b"))
        .distinct()
    )
    v = embeddings.select(
        F.col(id_col).cast("long").alias("_vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    joined = (
        cand.join(v.withColumnRenamed("_vid", "id_a")
                  .withColumnRenamed("_v", "_va"), "id_a")
        .join(v.withColumnRenamed("_vid", "id_b")
              .withColumnRenamed("_v", "_vb"), "id_b")
    )
    cos = _dot(F.col("_va"), F.col("_vb")) / (
        _norm(F.col("_va")) * _norm(F.col("_vb"))
    )
    return (
        joined.withColumn("cos", F.round(cos, 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_tables: int = 8,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """→ (vec_id, component_id, keep): SemDeDup-shaped semantic
    deduplication (Abbas et al. 2023) — embedding near-duplicate PAIRS
    (cos ≥ threshold, banded sign-LSH + exact verify, never all-pairs)
    are closed into duplicate CLUSTERS by large-star/small-star
    contraction, and one canonical vector per cluster is kept (smallest
    id — deterministic).  Vectors in no near-dup pair keep themselves.
    The paper routes the pair search through k-means cells; the sign-LSH
    bucketing here plays the identical candidate-limiting role with the
    same verified-exact output contract (and composes with the persisted
    IVF cells via :func:`build_ivf_index` when a trained quantizer
    exists).

    100-TB shape: inherits :func:`pairwise_near_dups`'s bucketed
    self-join + skew guard and the O(log n)-round component closure —
    no stage is all-pairs and no state leaves the cluster."""
    from .dedup import connected_components_star

    pairs = pairwise_near_dups(
        embeddings, threshold=threshold, n_tables=n_tables,
        n_planes=n_planes, id_col=id_col, vec_col=vec_col, seed=seed,
        max_bucket_size=max_bucket_size,
    ).select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    comp = connected_components_star(pairs)
    all_ids = embeddings.select(F.col(id_col).cast("long").alias("vec_id"))
    return (
        all_ids.join(
            comp.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left"
        )
        .select(
            "vec_id",
            F.coalesce("component_id", F.col("vec_id")).alias("component_id"),
        )
        .withColumn("keep", F.col("vec_id") == F.col("component_id"))
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    max_mismatch: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    exclude_id: int | None = None,
) -> DataFrame:
    """Approximate top-k: only vectors whose sign-signature is within
    ``max_mismatch`` Hamming bits of the query's are exactly rescored.
    Recall rises with max_mismatch; max_mismatch = n_planes ⇒ exact."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _hyperplanes(len(q), n_planes, seed)
    qsig = int(((q @ planes.T > 0).astype(np.uint64)
                * (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))).sum())
    sigs = sign_signatures(embeddings, n_planes, id_col, vec_col, seed)
    near = sigs.filter(
        F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_mismatch
    ).select(F.col("vec_id").alias("_near_id"))
    cand = embeddings.join(
        near, embeddings[id_col].cast("long") == F.col("_near_id"), "left_semi"
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col, exclude_id)


def hybrid_rerank(
    bm25_top: DataFrame,
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    alpha: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid text+vector ranking: rerank a BOUNDED BM25 candidate set
    (stage 1: `SegmentIndex.search(query, k=n)`) by
    ``alpha · bm25 + (1 − alpha) · cosine(query_vec, embedding)``
    → (doc_id, score, bm25, cos) top-k.

    Scale shape: the candidate set (≤ n rows) is collected to the
    driver, its ids pushed into the embeddings scan as an ``IN``
    predicate (parquet row-group pruning — the 100-TB embeddings table
    is never scanned in full) and the scores joined back via a literal
    map; cosine is the same JVM double path as :func:`cosine_topk`
    (bit-identical to the DuckDB oracle's list_dot_product)."""
    rows = bm25_top.collect()
    if not rows:
        spark = embeddings.sparkSession
        return spark.createDataFrame(
            [], "doc_id long, score double, bm25 double, cos double"
        )
    ids = [int(r["doc_id"]) for r in rows]
    smap = F.create_map(
        *[x for r in rows
          for x in (F.lit(int(r["doc_id"])), F.lit(float(r["score"])))]
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cand = (
        embeddings.filter(F.col(id_col).isin(ids))
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            (_dot(v, q) / (_norm(v) * _norm(q))).alias("cos"),
        )
        .withColumn("bm25", smap[F.col("doc_id")])
    )
    return (
        cand.select(
            "doc_id",
            (F.lit(float(alpha)) * F.col("bm25")
             + F.lit(1.0 - float(alpha)) * F.col("cos")).alias("score"),
            "bm25", "cos",
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def build_ivf_index(
    spark,
    embeddings: DataFrame,
    out_dir: str,
    n_cells: int = 16,
    sample: int = 4096,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """IVF (inverted-file) ANN index — the coarse-quantizer scale path
    beside the sign-LSH bucketed index.

    Centroids are trained with Lloyd's k-means on a DETERMINISTIC
    driver-side sample (rows ranked by a hash of their id — the
    standard big-data recipe: train on a bounded sample, assign
    everything in one distributed pass; no nondeterministic distributed
    float reductions, so the index is bit-reproducible).  Assignments
    are written ``partitionBy(cell)`` so a query's probe set prunes
    whole directories off the scan.

    Layout: ``{out}/centroids.parquet`` (cell, centroid double[]),
    ``{out}/cells.parquet/cell=N/`` (vec_id, e double[])."""
    import hashlib

    import numpy as np

    def _h(i: int) -> int:
        return int.from_bytes(
            hashlib.md5(f"ivf|{i}".encode()).digest()[:8], "big"
        )

    base = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("e"),
    )
    rows = (
        base.withColumn(
            "_r", F.xxhash64(F.col("vec_id"), F.lit("ivf-sample"))
        )
        .orderBy("_r", "vec_id")
        .limit(int(sample))
        .select("vec_id", "e")
        .collect()
    )
    rows.sort(key=lambda r: _h(int(r["vec_id"])))
    M = np.array([list(r["e"]) for r in rows], dtype=np.float64)
    k_ = min(n_cells, len(M))
    cent = M[:k_].copy()

    def _d2(A: np.ndarray, C: np.ndarray) -> np.ndarray:
        # ‖a−c‖² via the GEMM expansion — same form the distributed
        # assign_cells kernel uses (train/assign arithmetic consistency),
        # and ~100× faster than the (sample × cells × dim) broadcast
        # temp, which at 8192×256×64 float64 allocates ~1 GB per k-means
        # iteration and is pure memory-bandwidth burn
        return (
            (A ** 2).sum(axis=1)[:, None]
            - 2.0 * A @ C.T
            + (C ** 2).sum(axis=1)[None, :]
        )

    for _ in range(iters):
        d2 = _d2(M, cent)
        assign = d2.argmin(axis=1)
        for c in range(k_):
            sel = assign == c
            if sel.any():
                cent[c] = M[sel].mean(axis=0)
            else:
                # deterministic re-seed: the sample point farthest from
                # its centroid
                far = int(d2[np.arange(len(M)), assign].argmax())
                cent[c] = M[far]
    cent_rows = [(c, [float(x) for x in cent[c]]) for c in range(k_)]
    spark.createDataFrame(
        cent_rows, "cell int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/centroids.parquet")

    cent_b = cent.copy()
    # lifecycle manifest: frozen-quantizer fingerprint, append ledger,
    # and the train-time dispersion the drift guard compares against
    d2_final = _d2(M, cent)
    train_disp = float(d2_final.min(axis=1).mean()) if len(M) else 0.0

    def assign_cells(pdfs):
        import numpy as np

        for pdf in pdfs:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["e"].values])
            d2 = (
                (X ** 2).sum(axis=1)[:, None]
                - 2.0 * X @ cent_b.T
                + (cent_b ** 2).sum(axis=1)[None, :]
            )
            pdf = pdf.copy()
            pdf["cell"] = d2.argmin(axis=1).astype("int32")
            yield pdf[["cell", "vec_id", "e"]]

    (
        base.mapInPandas(
            assign_cells, "cell int, vec_id long, e array<double>"
        )
        # cell-pure output partitions: without this, partitionBy writes
        # (input partitions × cells) files — 8k+ tiny files at 500k
        # vecs/256 cells, and the file-count scales with cluster width.
        # One hash shuffle on cell caps it at ≤1 file per cell per
        # holding partition; the within-partition sort makes file
        # contents deterministic (shuffle arrival order is not)
        .repartition(int(k_), "cell")
        .sortWithinPartitions("cell", "vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{out_dir}/cells.parquet")
    )
    num = base.count()
    _write_ann_manifest(out_dir, {
        "kind": "ivf",
        "n_cells": int(k_),
        "dim": int(M.shape[1]) if len(M) else 0,
        "sample": int(sample),
        "iters": int(iters),
        "num_vecs": int(num),
        "base_vecs": int(num),
        "train_dispersion": train_disp,
        "quantizer_fp": hashlib.md5(cent.tobytes()).hexdigest()[:16],
        "append_batches": [],
    })


def ann_ivf_topk(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    exclude_id: int | None = None,
) -> DataFrame:
    """Query the IVF index: rank cells by centroid distance to the
    query (driver-side — centroids are tiny), scan ONLY the ``nprobe``
    nearest cells (`cell IN (...)` prunes partition directories), exact
    cosine rescore → (vec_id, cos) top-k with :func:`cosine_topk`'s
    rounding/tie conventions."""
    import numpy as np

    cent_rows = spark.read.parquet(f"{index_dir}/centroids.parquet").collect()
    cent = {int(r["cell"]): np.array(r["centroid"]) for r in cent_rows}
    qq = np.asarray(query_vec, dtype=np.float64)
    probes = sorted(
        cent, key=lambda c: (float(((cent[c] - qq) ** 2).sum()), c)
    )[:nprobe]
    cells = _read_ivf_cells(spark, index_dir, with_batch=True).filter(
        F.col("cell").isin([int(c) for c in probes])
    )
    cells = mask_deleted(spark, index_dir, cells)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col("e")
    df = cells.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        (_dot(v, q) / (_norm(v) * _norm(q))).alias("_cos"),
    )
    if exclude_id is not None:
        df = df.filter(F.col("vec_id") != F.lit(int(exclude_id)))
    return (
        df.orderBy(F.desc("_cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("_cos", 6).alias("cos"))
    )


# ------------------------------------------------------------------
# ANN index LIFECYCLE — appends under a frozen quantizer, merge, drift
# guard, retrain — mirroring the text index's streaming/merge
# discipline (the reference continuously re-indexes,
# src/entrypoint/indexer.rs:255-312; a 100-TB embeddings table grows
# the same way).


def _ann_manifest_path(index_dir: str) -> str:
    import os

    return os.path.join(index_dir, "ann.json")


def _write_ann_manifest(index_dir: str, manifest: dict) -> None:
    """Atomic manifest swap (tmp + rename) — a crash mid-update leaves
    the previous manifest intact, same discipline as the text index's
    stats.json."""
    import json
    import os

    os.makedirs(index_dir, exist_ok=True)
    p = _ann_manifest_path(index_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, p)


def read_ann_manifest(index_dir: str) -> dict:
    import json

    with open(_ann_manifest_path(index_dir)) as f:
        return json.load(f)


def _ivf_cell_dirs(index_dir: str) -> list[str]:
    """cells.parquet plus every LEDGERED append batch dir (unledgered
    dirs from a crashed append are invisible — the visibility rule the
    text index's streamed batches follow)."""
    import os

    try:
        m = read_ann_manifest(index_dir)
    except FileNotFoundError:
        # pre-lifecycle index: base dir only
        return [f"{index_dir}/cells.parquet"]
    return [f"{index_dir}/cells.parquet"] + [
        f"{index_dir}/cells_b{b}.parquet" for b in m.get("append_batches", [])
    ]


def _batch_of_dir(d: str) -> int:
    """Ledger batch id encoded in a cells/sign dir name (base dir = 0)."""
    stem = d.rstrip("/").rsplit("/", 1)[-1]
    for prefix in ("cells_b", "sign_b"):
        if stem.startswith(prefix):
            return int(stem[len(prefix):].split(".")[0])
    return 0


def _read_ivf_cells(
    spark, index_dir: str, with_batch: bool = False
) -> DataFrame:
    """Union of per-dir reads: each batch dir is its own partitioned
    root (Spark refuses multiple partition roots in one read); a cell
    predicate still prunes directories inside EVERY member scan.
    ``with_batch`` tags each row with its ledger batch id so
    :func:`mask_deleted` can scope tombstones (a re-appended vec_id's
    NEW row must serve while the pre-delete row stays masked)."""
    dirs = _ivf_cell_dirs(index_dir)
    out = None
    for d in dirs:
        x = spark.read.parquet(d).select("cell", "vec_id", "e")
        if with_batch:
            x = x.withColumn("_batch", F.lit(_batch_of_dir(d)))
        out = x if out is None else out.unionByName(x)
    return out


def _read_sign(spark, index_dir: str, with_batch: bool = False) -> DataFrame:
    """Union of per-dir sign-table reads, optionally batch-tagged (same
    tombstone-scoping contract as :func:`_read_ivf_cells`)."""
    out = None
    for d in _sign_dirs(index_dir):
        x = spark.read.parquet(d)
        if with_batch:
            x = x.withColumn("_batch", F.lit(_batch_of_dir(d)))
        out = x if out is None else out.unionByName(x)
    return out


def append_ivf(
    spark,
    index_dir: str,
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Append new vectors to a persisted IVF index under the FROZEN
    quantizer: one distributed assignment pass against the stored
    centroids, written ``partitionBy(cell)`` into a new ledgered batch
    dir.  Returns the batch id.

    Incremental-equals-fresh contract: assignment under frozen centroids
    is a pure function of the vector, so the incremental index holds
    exactly the rows a one-shot assignment pass over the union would
    produce (tested).  The QUANTIZER itself is not updated — that is the
    documented retrain policy: appends keep serving, ivf_needs_retrain
    flags drift, retrain_ivf rebuilds (training is a global decision, a
    per-batch centroid nudge would silently shift every earlier
    assignment)."""
    m = read_ann_manifest(index_dir)
    if m.get("kind") != "ivf":
        raise ValueError(f"{index_dir} is not an IVF index")
    cent_rows = spark.read.parquet(f"{index_dir}/centroids.parquet").collect()
    cent_b = np.array(
        [r["centroid"] for r in sorted(cent_rows, key=lambda r: r["cell"])],
        dtype=np.float64,
    )
    base = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("e"),
    )
    # refuse duplicate LIVE ids loudly: a re-sent vec_id would occupy
    # two serving rows (two top-k slots, inflated num_vecs) until a
    # retrain.  Tombstoned ids are fine — that's the documented
    # ``update = delete + append`` flow; the batch-scoped tombstone
    # keeps the stale row masked while the new one serves.
    dup = base.join(
        mask_deleted(
            spark, index_dir,
            _read_ivf_cells(spark, index_dir, with_batch=True),
        ).select("vec_id"),
        "vec_id", "left_semi",
    ).count()
    if dup:
        raise ValueError(
            f"append_ivf: {dup} vec_id(s) already exist in the index — "
            "delete_vectors first (update = delete + append), or retrain"
        )
    _refuse_legacy_tombstoned(
        spark, index_dir, base.select("vec_id"), "append_ivf")

    def assign_cells(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["e"].values])
            d2 = (
                (X ** 2).sum(axis=1)[:, None]
                - 2.0 * X @ cent_b.T
                + (cent_b ** 2).sum(axis=1)[None, :]
            )
            pdf = pdf.copy()
            pdf["cell"] = d2.argmin(axis=1).astype("int32")
            yield pdf[["cell", "vec_id", "e"]]

    batch_id = 1 + max(m.get("append_batches", []), default=0)
    bdir = f"{index_dir}/cells_b{batch_id}.parquet"
    assigned = base.mapInPandas(
        assign_cells, "cell int, vec_id long, e array<double>"
    )
    (
        # cell-pure partitions + deterministic order, like the base
        # build: caps the batch dir at ≤1 file per cell instead of
        # (input partitions × cells)
        assigned.repartition(int(m["n_cells"]), "cell")
        .sortWithinPartitions("cell", "vec_id")
        .write.mode("overwrite")  # idempotent retry rewrites
        .partitionBy("cell").parquet(bdir)
    )
    n = spark.read.parquet(bdir).count()
    # ledger commit AFTER the data is fully written — a crash before
    # this point leaves an invisible orphan dir, not a corrupt index
    m["append_batches"] = m.get("append_batches", []) + [batch_id]
    m["num_vecs"] = int(m.get("num_vecs", 0) + n)
    _write_ann_manifest(index_dir, m)
    return batch_id


def ivf_needs_retrain(
    spark,
    index_dir: str,
    growth_factor: float = 1.0,
    dispersion_factor: float = 2.0,
    sample: int = 4096,
) -> dict:
    """Drift guard: measure (a) appended growth vs the trained base and
    (b) current dispersion (mean distance² to nearest centroid over a
    deterministic sample of the CURRENT vectors) vs the train-time
    dispersion.  Returns the measurements plus a ``retrain`` verdict —
    policy: retrain when appends exceed ``growth_factor`` × base size or
    dispersion exceeds ``dispersion_factor`` × the train value (the new
    data no longer looks like what the quantizer was fit on)."""
    m = read_ann_manifest(index_dir)
    cent_rows = spark.read.parquet(f"{index_dir}/centroids.parquet").collect()
    cent = np.array(
        [r["centroid"] for r in sorted(cent_rows, key=lambda r: r["cell"])],
        dtype=np.float64,
    )
    rows = (
        mask_deleted(
            spark, index_dir,
            _read_ivf_cells(spark, index_dir, with_batch=True),
        )
        .withColumn("_r", F.xxhash64(F.col("vec_id"), F.lit("ivf-drift")))
        .orderBy("_r", "vec_id")
        .limit(int(sample))
        .select("e")
        .collect()
    )
    X = np.array([list(r["e"]) for r in rows], dtype=np.float64)
    disp = float(
        (
            (X ** 2).sum(axis=1)[:, None]
            - 2.0 * X @ cent.T
            + (cent ** 2).sum(axis=1)[None, :]
        ).min(axis=1).mean()
    ) if len(X) else 0.0
    base_n = int(m.get("base_vecs", m["num_vecs"]))
    deleted = int(m.get("deleted_vecs", 0))
    # growth over LIVE appends: tombstoned vectors no longer serve
    # queries, so they must not push the retrain trigger
    appended = max(int(m["num_vecs"]) - base_n - deleted, 0)
    growth = appended / base_n if base_n else float("inf")
    train_disp = float(m.get("train_dispersion", 0.0)) or 1e-12
    ratio = disp / train_disp
    return {
        "appended": appended,
        "deleted": deleted,
        "base_vecs": base_n,
        "growth": growth,
        "dispersion": disp,
        "train_dispersion": train_disp,
        "dispersion_ratio": ratio,
        "retrain": bool(growth > growth_factor or ratio > dispersion_factor),
    }


def retrain_ivf(
    spark,
    index_dir: str,
    out_dir: str,
    n_cells: int | None = None,
    sample: int | None = None,
    iters: int | None = None,
) -> None:
    """Rebuild the IVF index over every registered vector (base +
    appends) with a freshly trained quantizer — the retrain half of the
    append/retrain policy.  Same deterministic training recipe as
    build_ivf_index, so retrain(X) == build(X) bit-for-bit."""
    m = read_ann_manifest(index_dir)
    # tombstoned vectors leave physically here (mask-now/reclaim-at-
    # rebuild, like the text index's compaction)
    allv = mask_deleted(
        spark, index_dir,
        _read_ivf_cells(spark, index_dir, with_batch=True),
    ).select("vec_id", "e")
    build_ivf_index(
        spark, allv, out_dir,
        n_cells=n_cells or m["n_cells"],
        sample=sample or m.get("sample", 4096),
        iters=iters or m.get("iters", 10),
        vec_col="e",
    )


# ----------------------------------------------- persisted sign index


def build_sign_index_persisted(
    spark,
    embeddings: DataFrame,
    out_dir: str,
    n_tables: int = 4,
    n_planes: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the multi-table sign-LSH index with a lifecycle manifest.
    The hyperplanes are derived from ``seed`` — the quantizer is frozen
    BY CONSTRUCTION, so appends and merges are exact (same signature for
    the same vector, forever)."""
    sig = build_sign_index(
        embeddings, n_tables, n_planes, id_col, vec_col, seed
    )
    sig.write.mode("overwrite").parquet(f"{out_dir}/sign.parquet")
    n = spark.read.parquet(f"{out_dir}/sign.parquet").select(
        "vec_id"
    ).distinct().count()
    _write_ann_manifest(out_dir, {
        "kind": "sign",
        "n_tables": int(n_tables),
        "n_planes": int(n_planes),
        "seed": int(seed),
        "num_vecs": int(n),
        "append_batches": [],
    })


def _sign_dirs(index_dir: str) -> list[str]:
    m = read_ann_manifest(index_dir)
    return [f"{index_dir}/sign.parquet"] + [
        f"{index_dir}/sign_b{b}.parquet" for b in m.get("append_batches", [])
    ]


def append_sign_index(
    spark,
    index_dir: str,
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Append signatures for new vectors under the index's frozen
    (seed-derived) hyperplanes — ledgered batch dirs, same crash
    semantics as append_ivf.  The incremental index is ROW-identical to
    a fresh build over the union (tested)."""
    m = read_ann_manifest(index_dir)
    if m.get("kind") != "sign":
        raise ValueError(f"{index_dir} is not a sign-LSH index")
    dup = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id")
    ).join(
        mask_deleted(
            spark, index_dir, _read_sign(spark, index_dir, with_batch=True)
        ).select("vec_id"),
        "vec_id", "left_semi",
    ).count()
    if dup:
        raise ValueError(
            f"append_sign_index: {dup} vec_id(s) already exist — "
            "delete_vectors first (update = delete + append)"
        )
    _refuse_legacy_tombstoned(
        spark, index_dir,
        embeddings.select(F.col(id_col).cast("long").alias("vec_id")),
        "append_sign_index")
    batch_id = 1 + max(m.get("append_batches", []), default=0)
    bdir = f"{index_dir}/sign_b{batch_id}.parquet"
    build_sign_index(
        embeddings, m["n_tables"], m["n_planes"], id_col, vec_col, m["seed"]
    ).write.mode("overwrite").parquet(bdir)
    n = spark.read.parquet(bdir).select("vec_id").distinct().count()
    m["append_batches"] = m.get("append_batches", []) + [batch_id]
    m["num_vecs"] = int(m.get("num_vecs", 0) + n)
    _write_ann_manifest(index_dir, m)
    return batch_id


def open_sign_index(spark, index_dir: str) -> DataFrame:
    """The full signature table (base ∪ ledgered appends, tombstoned
    vectors masked) — feed to :func:`ann_bucketed_topk`."""
    return mask_deleted(
        spark, index_dir, _read_sign(spark, index_dir, with_batch=True)
    )


def merge_sign_indexes(
    spark, source_dirs: list[str], out_dir: str
) -> None:
    """Merge sign indexes into one compact table.  Refuses mismatched
    quantizer parameters (different planes/seed → the same vector hashes
    differently and probes silently miss — the ANN analogue of the text
    merge's mixed-flavor refusal)."""
    ms = [read_ann_manifest(d) for d in source_dirs]
    for d, m in zip(source_dirs, ms):
        if m.get("kind") != "sign":
            raise ValueError(f"{d} is not a sign-LSH index")
        for key in ("n_tables", "n_planes", "seed"):
            if m[key] != ms[0][key]:
                raise ValueError(
                    f"sign-index merge: {d} has {key}={m[key]} but "
                    f"{source_dirs[0]} has {key}={ms[0][key]} — probes "
                    "over the merged table would silently miss"
                )
    allsig = None
    for d in source_dirs:
        x = mask_deleted(spark, d, _read_sign(spark, d, with_batch=True))
        allsig = x if allsig is None else allsig.unionByName(x)
    allsig.write.mode("overwrite").parquet(f"{out_dir}/sign.parquet")
    n = spark.read.parquet(f"{out_dir}/sign.parquet").select(
        "vec_id"
    ).distinct().count()
    _write_ann_manifest(out_dir, {
        "kind": "sign",
        "n_tables": ms[0]["n_tables"],
        "n_planes": ms[0]["n_planes"],
        "seed": ms[0]["seed"],
        "num_vecs": int(n),
        "append_batches": [],
    })


# ------------------------------------------------------- vector deletes


def _tombstone_path(index_dir: str) -> str:
    import os

    return os.path.join(index_dir, "tombstones.parquet")


def delete_vectors(spark, index_dir: str, vec_ids) -> int:
    """Tombstone vectors in an IVF or sign index — the same
    mask-now/reclaim-at-rebuild discipline as the text index's deletes:
    a (vec_id, upto_batch) parquet append that queries anti-join BEFORE
    the top-k cut; the rows leave physically at the next retrain/merge.
    Returns the number of NEW tombstones (already-deleted and unknown
    ids are skipped).

    Tombstones are BATCH-SCOPED: ``upto_batch`` records the highest
    ledgered batch at delete time, and masking only hides rows in
    batches ≤ that mark.  This is what makes ``update = delete +
    append`` actually work — the re-appended row lands in a LATER batch
    and serves, while the stale pre-delete row stays masked forever."""
    from pyspark.sql import functions as F

    m = read_ann_manifest(index_dir)
    ids = sorted({int(i) for i in vec_ids})
    if not ids:
        return 0
    if m.get("kind") == "ivf":
        rows = _read_ivf_cells(spark, index_dir, with_batch=True)
    else:
        rows = _read_sign(spark, index_dir, with_batch=True)
    # live = has at least one unmasked row (already-deleted ids have
    # none; a deleted-then-re-appended id is live again and gets a NEW
    # tombstone covering its new batch)
    live = mask_deleted(spark, index_dir, rows).select("vec_id").distinct()
    upto = max(m.get("append_batches", []), default=0)
    cand = spark.createDataFrame(
        [(i, int(upto)) for i in ids], "vec_id long, upto_batch int"
    ).join(live, "vec_id", "left_semi")
    n = cand.count()
    if n == 0:
        return 0
    tp = _tombstone_path(index_dir)
    cand.write.mode("append").parquet(tp)
    m["deleted_vecs"] = int(m.get("deleted_vecs", 0) + n)
    _write_ann_manifest(index_dir, m)
    return int(n)


def _legacy_tombstoned(spark, index_dir: str) -> DataFrame | None:
    """vec_ids covered by a LEGACY tombstone (no ``upto_batch`` — masks
    every batch, including future appends), or None when no tombstones
    exist.  Appends must refuse these ids: the re-appended row would be
    invisible forever while still counting in ``num_vecs``."""
    import os

    tp = _tombstone_path(index_dir)
    if not os.path.isdir(tp):
        return None
    t = spark.read.option("mergeSchema", "true").parquet(tp)
    if "upto_batch" not in t.columns:
        return t.select("vec_id").distinct()
    return (
        t.filter(F.col("upto_batch").isNull()).select("vec_id").distinct()
    )


def _refuse_legacy_tombstoned(spark, index_dir: str, ids: DataFrame,
                              op: str) -> None:
    legacy = _legacy_tombstoned(spark, index_dir)
    if legacy is None:
        return
    n = ids.join(legacy, "vec_id", "left_semi").count()
    if n:
        raise ValueError(
            f"{op}: {n} vec_id(s) are covered by LEGACY all-batch "
            "tombstones — a re-append would be masked forever; retrain "
            "(reclaims tombstones) before re-appending these ids"
        )


def mask_deleted(spark, index_dir: str, df: DataFrame) -> DataFrame:
    """Anti-join a result/candidate frame against the index's tombstones
    (no-op when none exist).  A plain anti join, NOT a forced broadcast —
    the deleted set is unbounded over an index's lifetime.

    When ``df`` carries a ``_batch`` column (from ``with_batch=True``
    reads), tombstones mask only rows with batch ≤ the tombstone's
    ``upto_batch`` — re-appended rows in later batches survive.  Without
    a batch column every row of a tombstoned id is masked (legacy /
    conservative behavior, correct whenever no re-append happened)."""
    import os

    tp = _tombstone_path(index_dir)
    if not os.path.isdir(tp):
        return df.drop("_batch") if "_batch" in df.columns else df
    # mergeSchema: a dir can hold BOTH legacy (vec_id-only) and new
    # (vec_id, upto_batch) files; without it one file's schema wins and
    # either upto_batch disappears for every row or legacy rows read as
    # NULL — and `_batch <= NULL` is never true, resurrecting deleted
    # vectors.  Per-ROW legacy handling: NULL upto_batch → mask all.
    t = spark.read.option("mergeSchema", "true").parquet(tp)
    if "upto_batch" not in t.columns:  # legacy tombstones only: mask all
        t = t.withColumn("upto_batch", F.lit(2**31 - 1))
    else:
        t = t.withColumn(
            "upto_batch", F.coalesce(F.col("upto_batch"), F.lit(2**31 - 1))
        )
    if "_batch" in df.columns:
        t = t.select(
            F.col("vec_id").alias("_t_vid"), F.col("upto_batch")
        )
        cond = (df["vec_id"] == t["_t_vid"]) & (
            df["_batch"] <= t["upto_batch"]
        )
        return df.join(t, cond, "left_anti").drop("_batch")
    return df.join(t.select("vec_id"), "vec_id", "left_anti")
