"""Deduplication operators for training-data pipelines.

Beyond the reference's scope (its only dedup is result-diversity re-ranking
and ``unique_by(site)``, SURVEY.md §2.6/2.7), these are the standard
web-scale corpus-dedup family, each expressed Spark-first:

* :func:`exact_dedup_groups` — hash-groupBy on sha256(text); one shuffle on
  a 32-byte key; at 100 TB this is the cheapest full-corpus op there is.
* :func:`ngram_jaccard_pairs` — exact token-n-gram Jaccard ≥ τ pairs via
  an inverted shingle index (explode → self-join on shingle → count
  intersections → filter) — all JVM-side DataFrame ops, the join key is the
  shingle so the shuffle is bounded by posting sizes, with a frequency cap
  on pathological shingles (stopword-like shingles otherwise produce
  quadratic candidate blowup — the classic skew guard).
* :func:`minhash_signatures` / :func:`lsh_candidate_pairs` — MinHash + LSH
  banding: vectorized numpy MinHash (one (n_shingles × n_perm) universal-
  hash matrix min-reduced per doc), bands exploded → groupBy band-bucket →
  within-bucket pairs.  Candidates are verified with exact Jaccard.
* :func:`simhash64` — 64-bit SimHash over token hashes (vectorized bit
  accumulation), near-dup = small Hamming distance via banded equality
  joins on 4×16-bit chunks (Hamming ≤ 3 ⇒ at least one chunk equal).

Determinism: all hashes are blake2b/xxhash with fixed seeds — no RNG state.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

# ------------------------------------------------------------------ exact


def exact_dedup_groups(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """→ (doc_id, text_sha256, keep_id, group_size); keep_id = min doc id
    of the identical-text group (the row a dedup pass would keep)."""
    h = F.sha2(F.col(text_col), 256).alias("text_sha256")
    w = Window.partitionBy("text_sha256")
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"), h)
        .withColumn("keep_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count("*").over(w).cast("long"))
    )


# ------------------------------------------------- token n-gram shingles


def token_shingles(
    docs: DataFrame, text_col: str, id_col: str, n: int = 3, analyzer: str = "ascii"
) -> DataFrame:
    """→ (doc_id, shingle) distinct token n-grams per doc (Arrow pass)."""
    from ..functions.tokenizer import get_analyzer

    tokenize = get_analyzer(analyzer)
    src = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("_t"))

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            sh: list[str] = []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["_t"].values):
                toks = tokenize(text or "")
                grams = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
                ids.extend([doc_id] * len(grams))
                sh.extend(grams)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "shingle": pd.Series(sh, dtype="object")}
            )

    return src.mapInPandas(emit, "doc_id long, shingle string")


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 1000,
    analyzer: str = "ascii",
) -> DataFrame:
    """Exact n-gram Jaccard-similar pairs: → (doc_a, doc_b, jaccard) with
    doc_a < doc_b, jaccard ≥ threshold (rounded 6dp).

    ``max_shingle_freq`` drops shingles present in more docs than the cap
    before the self-join — the skew guard (a shingle in f docs contributes
    f² candidate rows).  Exactness note: dropping a shingle can only lower
    measured similarity, so with a cap the op is "Jaccard over non-stop
    shingles"; set the cap ≥ corpus size for literal exactness (tests do).
    """
    sh = token_shingles(docs, text_col, id_col, n, analyzer)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("f"))
    sh_kept = sh.join(
        F.broadcast(freq.filter(F.col("f") > max_shingle_freq)), "shingle", "left_anti"
    )
    a = sh_kept.alias("a")
    b = sh_kept.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return _jaccard_from_intersections(inter, sizes, threshold)


def _jaccard_from_intersections(
    inter: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """(doc_a, doc_b, inter) + per-doc shingle counts → pairs with
    ``jaccard = round(inter/(na+nb−inter), 6) ≥ threshold``.  The single
    definition shared by the exact and the LSH-verified paths (and pinned
    to the same 6dp rounding as the SQL oracle)."""
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed("doc_id", "doc_a")
                               .withColumnRenamed("n_sh", "na")), "doc_a")
        .join(F.broadcast(sizes.withColumnRenamed("doc_id", "doc_b")
                          .withColumnRenamed("n_sh", "nb")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------- MinHash


def _hash64(strings: list[str], seed: int = 0) -> np.ndarray:
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8, salt=seed.to_bytes(8, "little")).digest(),
            "little",
        )
    return out


_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_matrix(shingle_hashes: np.ndarray, a: np.ndarray, bvec: np.ndarray) -> np.ndarray:
    """Universal-hash MinHash: sig[p] = min((a[p]*h + b[p]) mod M) — one
    vectorized (n_shingles × n_perm) broadcast, min-reduced."""
    h = shingle_hashes.reshape(-1, 1).astype(np.uint64)
    vals = (h * a.reshape(1, -1) + bvec.reshape(1, -1)) % _MERSENNE
    return vals.min(axis=0)


def minhash_signatures(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_perm: int = 64,
    analyzer: str = "ascii",
    seed: int = 42,
) -> DataFrame:
    """→ (doc_id, sig array<long>) MinHash signatures (empty docs omitted)."""
    from ..functions.tokenizer import get_analyzer

    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
    bvec = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
    tokenize = get_analyzer(analyzer)
    src = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("_t"))

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["_t"].values):
                toks = tokenize(text or "")
                grams = list({" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)})
                if not grams:
                    continue
                sig = _minhash_matrix(_hash64(grams), a, bvec)
                ids.append(doc_id)
                sigs.append(sig.astype(np.int64))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "sig": pd.Series(sigs, dtype="object")})

    return src.mapInPandas(emit, "doc_id long, sig array<long>")


def banded_buckets(signatures: DataFrame, bands: int) -> DataFrame:
    """→ (doc_id, band, bucket): the LSH banding projection — the
    signature split into ``bands`` equal chunks, each hashed to a
    bucket key.  Shared by the self-join candidate path below and the
    incremental index (``operators/dedup_index.py``), whose persisted
    bucket table must hash identically to fresh batches."""
    sig_len = F.size("sig")
    rows_per_band = (sig_len / F.lit(bands)).cast("int")
    return (
        signatures.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda i: F.slice(
                        "sig", i * rows_per_band + 1, rows_per_band
                    ),
                )
            ).alias("band", "chunk"),
        )
        .withColumn("bucket", F.xxhash64(F.col("band"), F.col("chunk").cast("string")))
        .select("doc_id", "band", "bucket")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 16,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: signatures split into ``bands`` rows-per-band chunks;
    docs sharing any (band, chunk-hash) bucket become candidate pairs.
    → (doc_a, doc_b) distinct, doc_a < doc_b.

    ``max_bucket_size`` is the scale skew guard (the LSH analogue of
    ngram_jaccard_pairs' ``max_shingle_freq``): a bucket of f docs emits
    f² candidate rows, so one templated cluster can dominate the whole
    shuffle.  Buckets above the cap are dropped BEFORE the self-join
    (one window count, no extra join).  Recall note: a true near-dup
    pair collides in ~bands·j^r bands, so it survives unless EVERY one
    of its buckets is oversized; None (default) keeps literal
    exactness, which the correctness gates use."""
    banded = banded_buckets(signatures, bands)
    if max_bucket_size is not None:
        banded = (
            banded.withColumn(
                "_bc",
                F.count("*").over(Window.partitionBy("band", "bucket")),
            )
            .filter(F.col("_bc") <= int(max_bucket_size))
            .drop("_bc")
        )
    x = banded.alias("x")
    y = banded.alias("y")
    return (
        x.join(y, ["band", "bucket"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    analyzer: str = "ascii",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard (the scale path: LSH
    prunes the pair space, the exact check runs only on candidates).
    → (doc_a, doc_b, jaccard ≥ threshold).  ``max_bucket_size`` passes
    through to :func:`lsh_candidate_pairs` (bucket skew guard)."""
    sigs = minhash_signatures(docs, text_col, id_col, n, num_perm, analyzer)
    # the candidate frame is consumed three times below (both sides of
    # cand_docs plus the verify join); checkpoint it so the banded LSH
    # self-join — the dominant shuffle — runs exactly once instead of
    # depending on the optimizer's exchange reuse (candidates are a
    # sliver of the pair space, so the materialization is tiny)
    cands = lsh_candidate_pairs(sigs, bands, max_bucket_size).localCheckpoint(
        eager=True
    )
    sh = token_shingles(docs, text_col, id_col, n, analyzer)
    # prune the shingle table to CANDIDATE docs before the verify join:
    # at corpus scale the candidate set is a sliver of the corpus, and
    # without this the join shuffles every doc's shingles (measured: the
    # unpruned verify spilled ~80 GB at 1.2M docs; pruned it ships only
    # the candidates' shingles)
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_c = sh.join(cand_docs, "doc_id", "left_semi")
    sizes = sh_c.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh_c.withColumnRenamed("doc_id", "doc_a")
    b = sh_c.withColumnRenamed("doc_id", "doc_b")
    inter = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return _jaccard_from_intersections(inter, sizes, threshold)


# --------------------------------------------------------------- SimHash


def simhash64(
    docs: DataFrame, text_col: str, id_col: str, analyzer: str = "ascii"
) -> DataFrame:
    """→ (doc_id, simhash long): 64-bit SimHash over tf-weighted token
    hashes (vectorized bit-count accumulation per doc)."""
    from ..functions.tokenizer import get_analyzer

    tokenize = get_analyzer(analyzer)
    src = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("_t"))

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_cols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for pdf in batches:
            ids, hs = [], []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["_t"].values):
                toks = tokenize(text or "")
                if not toks:
                    continue
                uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
                th = _hash64(list(uniq))
                bits = ((th.reshape(-1, 1) & bit_cols) != 0)  # (n_terms, 64)
                votes = (counts.reshape(-1, 1) * (bits * 2 - 1)).sum(axis=0)
                sh = np.uint64(0)
                sh = (bit_cols[votes > 0]).sum(dtype=np.uint64)
                ids.append(doc_id)
                hs.append(np.int64(sh.astype(np.int64)))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "simhash": pd.Series(hs, dtype="int64")})

    return src.mapInPandas(emit, "doc_id long, simhash long")


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: banded join on 4×16-bit chunks (pigeonhole:
    hamming ≤ 3 over 64 bits ⇒ ≥1 of 4 chunks identical), then exact
    popcount filter. → (doc_a, doc_b, hamming)."""
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias(f"c{i}")
        for i in range(4)
    ]
    t = sim.select("doc_id", "simhash", *chunks)
    pairs = None
    for i in range(4):
        x = t.alias("x")
        y = t.alias("y")
        p = (
            x.join(y, F.col(f"x.c{i}") == F.col(f"y.c{i}"))
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
                F.col("x.simhash").alias("ha"),
                F.col("y.simhash").alias("hb"),
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 30,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Undirected connected components by min-label propagation →
    (doc_id, component_id = smallest id in the component).

    The FINAL step of a real near-dup pipeline: pair edges (from
    MinHash/SimHash/embedding banding) become duplicate CLUSTERS, and
    ``component_id`` doubles as the canonical keep-id.  Iterative
    small-parent propagation: each round every node adopts the minimum
    label among itself and its neighbors' labels; converges in
    O(diameter) rounds.  One shuffle per round on the node key; the same
    bounded-lineage discipline as graph.bfs_distances (localCheckpoint
    every k rounds — an uncut iterative plan stalls driver analysis).

    Scale note: label propagation is the Spark-native form; the
    large-star/small-star optimization (Kiveris et al.) halves rounds on
    pathological chains — named here as the 100× refinement, not needed
    at gate scale (near-dup components are tiny and shallow by
    construction)."""
    sym = (
        edges.select(F.col("a").cast("long"), F.col("b").cast("long"))
        .unionByName(
            edges.select(
                F.col("b").cast("long").alias("a"),
                F.col("a").cast("long").alias("b"),
            )
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for it in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("node").alias("b"), F.col("label").alias("_nl")
                ),
                "b",
            )
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("_nl").alias("_nbr"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_nbr"), F.col("label"))
                ).alias("label"),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.cache()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        prev, labels = labels, new_labels
        try:
            prev.unpersist()
        except Exception:
            pass
        if changed == 0:
            break
    else:
        # ADVICE r4: exhausting max_iter with labels still moving means
        # a component (diameter > max_iter chain) got SPLIT labels —
        # silently returning would over-keep duplicate docs.  Fail loud;
        # callers with genuinely deep graphs raise max_iter (or use
        # star-contraction, which converges in O(log n) rounds).
        sym.unpersist()
        # max_iter <= 0 means the loop never ran and `changed` is unbound
        moving = changed if max_iter > 0 else "all"
        raise RuntimeError(
            f"connected_components: not converged after {max_iter} "
            f"iterations ({moving} labels still changing) — components "
            "would be split; raise max_iter or use "
            "connected_components_star"
        )
    sym.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star contraction round (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 — public algorithm):
    for every node u, connect each strictly-LARGER neighbor to the
    minimum of u's closed neighborhood.  Edges are unordered in the
    algorithm, so the input is symmetrized here."""
    # symmetrize by exploding each edge into both directions (single
    # plan branch — a self-unionByName of shared lineage trips Spark's
    # attribute dedup on checkpointed inputs, SPARK "key not found")
    e = _both_directions(e).distinct()
    # neighborhood min via a window: ONE shuffle on u, no self-join
    m = F.least(F.col("u"), F.min("v").over(Window.partitionBy("u")))
    return (
        e.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _both_directions(e: DataFrame) -> DataFrame:
    """(u,v) → rows (u,v) and (v,u) via explode — one plan branch."""
    return e.select(
        F.explode(F.array(
            F.struct(F.col("u").alias("u"), F.col("v").alias("v")),
            F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
        )).alias("s")
    ).select("s.u", "s.v")


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient each edge (larger → smaller), then for
    every node u connect all its smaller neighbors AND u itself to the
    minimum neighbor."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    withm = oriented.withColumn(
        "m", F.min("v").over(Window.partitionBy("u"))
    )
    # emit (v→m) and (u→m) from ONE plan branch (explode, not a
    # self-union — see _large_star)
    return (
        withm.select(
            F.explode(F.array(
                F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
            )).alias("s")
        )
        .select("s.u", "s.v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction — O(log n) rounds even on pathological chain/path
    graphs where plain min-label propagation needs O(diameter) rounds
    (the 100×-scale refinement :func:`connected_components` names).

    Same output contract as :func:`connected_components`:
    (doc_id, component_id = smallest id in the component).  Convergence
    test: a large-star round that changes nothing means every edge
    already points at its component minimum (the edge set is a star
    forest rooted at the minima)."""
    spark = edges.sparkSession
    e = (
        edges.select(F.col("a").cast("long"), F.col("b").cast("long"))
        .filter(F.col("a") != F.col("b"))
        .select(F.col("a").alias("u"), F.col("b").alias("v"))
    )
    nodes = (
        _both_directions(e).select("u")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # symmetric start
    e = _both_directions(e).distinct().localCheckpoint(eager=True)
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # converged iff the star test holds: large-star is a no-op when
        # every node's neighbors are already all ≤ it or it points at
        # the min — check by edge-set equality (cheap: both checkpointed)
        same = (
            e2.exceptAll(e).isEmpty() and e.exceptAll(e2).isEmpty()
        )
        e = e2
        if same:
            break
    else:
        raise RuntimeError(
            f"connected_components_star: not converged after {max_iter} "
            "rounds — raise max_iter"
        )
    # at convergence every edge is (node → component min); isolated-in-e
    # roots label themselves
    labels = (
        nodes.join(e, "u", "left")
        .groupBy("u")
        .agg(F.min("v").alias("m"))
        .select(
            F.col("u").alias("doc_id"),
            F.coalesce(F.col("m"), F.col("u")).alias("component_id"),
        )
    )
    return labels


def near_dup_components(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    analyzer: str = "ascii",
    method: str = "star",
) -> DataFrame:
    """MinHash-LSH near-dup pairs → duplicate CLUSTERS → per-doc
    (doc_id, component_id, keep): ``keep`` marks the one canonical doc
    per cluster (the smallest id — deterministic).  Docs in no near-dup
    pair keep themselves.  This is the operator a training-data dedup
    actually ends with: ``docs.join(..., keep).filter("keep")``.

    ``method="star"`` (default) clusters with large-star/small-star
    contraction — O(log n) rounds regardless of component diameter, the
    production choice (plain label propagation needs O(diameter) rounds
    and raises past its round budget on pathological dup chains; pass
    ``method="label"`` to use it where components are known shallow)."""
    pairs = minhash_dedup_pairs(
        docs, text_col, id_col, n=n, num_perm=num_perm, bands=bands,
        threshold=threshold, analyzer=analyzer,
    ).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    if method == "star":
        comp = connected_components_star(pairs)
    elif method == "label":
        comp = connected_components(pairs)
    else:
        raise ValueError(f"near_dup_components: unknown method {method!r}")
    all_docs = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    return (
        all_docs.join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component_id"), F.col("doc_id")).alias(
                "component_id"
            ),
        )
        .withColumn("keep", F.col("doc_id") == F.col("component_id"))
    )


# ----------------------------- substring-level (token-window) dedup


def _cross_doc_dup_windows(
    docs: DataFrame, text_col: str, id_col: str, n: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared front half of the substring-dedup ops: → (toks, wins, dup).

    ``toks`` = (doc_id, t array<string>); ``wins`` = one row per n-token
    window (doc_id, s, ng) where ``ng`` is the xxhash64 of the token
    slice — the shuffle key shrinks from ~50 B of text to 8 B and no
    concat string is ever built (a 64-bit collision can only mark a
    unique window as duplicated, P ≈ W²/2⁶⁴ over the whole corpus — the
    same probabilistic-exactness class as MinHash banding); ``dup`` =
    the window keys occurring in more than one doc, tested as
    min(doc_id) != max(doc_id): ONE shuffle with map-side partial
    min/max, vs count_distinct's two-phase distinct expansion over the
    full window table."""
    from ..functions.tokenizer import SQL_TOKEN_PATTERN as _SQL_TOKEN_PATTERN

    tokens = F.expr(
        f"regexp_extract_all(lower({text_col}), "
        "'" + _SQL_TOKEN_PATTERN + "', 0)"
    )
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), tokens.alias("t")
    )
    wins = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= n,
                F.sequence(F.lit(1), F.size("t") - F.lit(n - 1)),
            ).otherwise(F.array())
        ).alias("s"),
        "t",
    ).select(
        "doc_id", "s",
        F.xxhash64(F.slice("t", F.col("s"), n)).alias("ng"),
    )
    dup = (
        wins.groupBy("ng")
        .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("ng")
    )
    return toks, wins, dup


def duplicated_ngram_stats(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """→ (doc_id, n_tokens, dup_tokens, dup_frac): the fraction of each
    doc's token positions covered by an exact ``n``-token window that
    also occurs in ANOTHER doc — the substring-level duplication metric
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"), complementing the doc-level MinHash/SimHash ops: a
    corpus can be free of near-duplicate DOCS yet still teach a model
    boilerplate verbatim because license headers / generated stubs
    repeat inside otherwise-distinct files.  Filter or de-weight on
    ``dup_frac`` (the paper cuts at ~0.2).

    All built-in expressions, no UDF, no pair join — the 100-TB shape:
      1. one map-side window expansion (``explode(sequence)`` + slice);
      2. one count aggregation keyed by the window string (partial
         aggregation absorbs hot boilerplate windows — there is never a
         window×window join, so the f² blowup of shingle-pair
         approaches cannot occur);
      3. a semi-join of windows against the duplicated set;
      4. covered-position counting as an INTERVAL UNION via one window
         function over (doc_id, start) — each duplicated window
         contributes ``max(0, end − max(start−1, prev_max_end))``
         tokens, which sums to exactly the union length.  Never
         explodes windows into positions: on a boilerplate-saturated
         corpus (dup_frac → 1) the position explode is n× the window
         count (measured: 1.7B rows at 1.2M docs) while the interval
         union stays at one row per window.
    """
    toks, wins, dup = _cross_doc_dup_windows(docs, text_col, id_col, n)
    dwins = wins.join(dup, "ng", "left_semi").select("doc_id", "s")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    covered = (
        dwins.withColumn(
            "prev_end", F.max(F.col("s") + F.lit(n - 1)).over(w)
        )
        .select(
            "doc_id",
            F.greatest(
                F.lit(0),
                (F.col("s") + F.lit(n - 1))
                - F.greatest(
                    F.col("s") - F.lit(1),
                    F.coalesce(F.col("prev_end"), F.lit(0)),
                ),
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").cast("long").alias("dup_tokens"))
    )
    return (
        toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias(
                "dup_tokens"
            ),
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


def strip_duplicated_spans(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """→ (doc_id, clean_text, n_tokens, kept_tokens): the corpus with
    every cross-doc-duplicated ``n``-token window REMOVED — the
    intervention half of :func:`duplicated_ngram_stats` (Lee et al.
    2022 cut duplicated spans rather than whole docs).  ``clean_text``
    is the kept tokens joined by single spaces (tokenization is the
    normalizing pass — original whitespace/punctuation outside tokens
    is not preserved, which is the standard contract for a training-
    corpus rewrite).

    Same no-pair-join shape as the stats op, plus one ordered
    re-aggregation: kept (position, token) pairs are grouped per doc
    and ``array_sort`` restores document order (sort key is the
    position struct field — deterministic, no reliance on shuffle
    order)."""
    toks, wins, dup = _cross_doc_dup_windows(docs, text_col, id_col, n)
    covered = (
        wins.join(dup, "ng", "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("s"), F.col("s") + F.lit(n - 1))
            ).alias("p"),
        )
        .distinct()
    )
    pos_tok = toks.select(
        "doc_id", F.posexplode("t").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    kept = pos_tok.join(covered, ["doc_id", "p"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda st: st["tok"],
            ),
        ).alias("clean_text"),
        F.count("*").cast("long").alias("kept_tokens"),
    )
    return (
        toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_tokens",
            F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long").alias(
                "kept_tokens"
            ),
        )
    )


def deterministic_split(
    docs: DataFrame,
    id_col: str,
    text_col: str | None = None,
    test_buckets: int = 25,
    salt: str = "split-v1",
) -> DataFrame:
    """→ (doc_id, bucket_hex, split): reproducible train/test assignment
    by md5 bucket — ``bucket_hex`` is the first byte of
    ``md5(salt ‖ key)`` (256 buckets), ``split = 'test'`` for the first
    ``test_buckets`` of them (realized test fraction = test_buckets/256).

    Pure map-side expression: no shuffle, no RNG state, stable across
    engines, runs, and cluster sizes — the properties a 100 TB split
    must have (a `rand()` split is neither reproducible nor append-
    stable; a mod-on-id split breaks when ids are reassigned).

    ``text_col`` keys the hash by CONTENT instead of id: byte-identical
    docs land in the same side by construction, so exact duplicates can
    never straddle train/test — the contamination guard; compose with
    :func:`near_dup_components` / :func:`strip_duplicated_spans` for
    near-dup and substring leakage.  Changing ``salt`` re-deals every
    bucket (fresh split without touching the data)."""
    key = F.col(text_col) if text_col else F.col(id_col).cast("string")
    h2 = F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 2)
    thr = format(test_buckets, "02x")
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        h2.alias("bucket_hex"),
        F.when(h2 < thr, F.lit("test")).otherwise(F.lit("train")).alias(
            "split"
        ),
    )


def _window_hashes(
    docs: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """→ (doc_id, s, ng): one row per ``n``-token window, keyed by the
    xxhash64 of the token slice (same key discipline as
    :func:`_cross_doc_dup_windows` — 8-byte join keys, no concat string,
    collision class P ≈ W²/2⁶⁴)."""
    from ..functions.tokenizer import SQL_TOKEN_PATTERN as _P

    tokens = F.expr(
        f"regexp_extract_all(lower({text_col}), '" + _P + "', 0)"
    )
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), tokens.alias("t")
    )
    return toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= n,
                F.sequence(F.lit(1), F.size("t") - F.lit(n - 1)),
            ).otherwise(F.array())
        ).alias("s"),
        "t",
    ).select(
        "doc_id", "s",
        F.xxhash64(F.slice("t", F.col("s"), n)).alias("ng"),
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: → (doc_id, n_windows, hit_windows,
    contaminated) — for each TRAIN doc, how many of its ``n``-token
    windows also occur anywhere in the BENCH set, and whether any do.
    This is the standard eval-leakage check run before LLM training
    (n-gram overlap against the held-out / benchmark suite): a train doc
    with ``contaminated = true`` teaches the model its own test answers
    and must be dropped or span-stripped before training.

    Counting is per window POSITION (not distinct n-grams), so
    ``hit_windows / n_windows`` is the contaminated-window fraction and
    composes with the interval-union coverage machinery of
    :func:`duplicated_ngram_stats` when span-level cuts are wanted.

    100-TB shape: the bench side is an eval suite — MBs against a corpus
    of TBs — so its distinct window-hash set broadcasts
    (``broadcast_bench=True``) and the whole op is ONE map-side pass
    over the train corpus plus a map-side join: no shuffle of corpus
    bytes at all.  With ``broadcast_bench=False`` it degrades to a
    shuffle semi-join keyed by the 8-byte hash (for decontaminating
    against another full corpus).  Train windows never pair-join
    against each other, so there is no f² blowup on hot n-grams.
    """
    t_wins = _window_hashes(train, text_col, id_col, n)
    b_set = _window_hashes(bench, text_col, id_col, n).select("ng").distinct()
    if broadcast_bench:
        b_set = F.broadcast(b_set)
    hits = (
        t_wins.join(b_set, "ng", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("hit_windows"))
    )
    totals = t_wins.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_windows")
    )
    ids = train.select(F.col(id_col).cast("long").alias("doc_id"))
    return (
        ids.join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("hit_windows", F.lit(0)).cast("long").alias(
                "hit_windows"
            ),
            (F.coalesce("hit_windows", F.lit(0)) > 0).alias("contaminated"),
        )
    )
