"""Deterministic corpus sampling for training-data mixing.

A training run mixes sources at target weights (code 30%, web 50%, ...).
``sampleBy``/``rand()`` give Bernoulli draws — per-run nondeterminism and
only EXPECTED counts; a 100 TB pipeline wants the same property set the
deterministic split has (:func:`stractt_spark.operators.dedup.
deterministic_split`): reproducible across runs, engines and cluster
sizes, and EXACT per-stratum counts.

:func:`stratified_sample_exact` ranks docs inside each stratum by a
salted content-free hash (``md5(salt ‖ id)``) and keeps the first
``ceil(frac_s · n_s)``.  The hash order is a fixed random permutation of
every stratum, so the kept set is an exact-size uniform sample that is
STABLE under re-runs and prefix-stable in ``frac`` (raising a stratum's
weight only ADDS docs — the property that lets a mixing sweep reuse
shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def stratified_sample_exact(
    docs: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float] | None = None,
    default_frac: float = 1.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """→ (doc_id, stratum, rk, n_stratum, keep): exact deterministic
    stratified sampling — within each stratum, docs are ranked by
    ``md5(salt ‖ id)`` (ties broken by id; ranks are therefore unique
    and engine-independent) and ``keep = rk ≤ ceil(frac · n_stratum)``
    with ``frac`` looked up per stratum in ``fractions`` (falling back
    to ``default_frac``).  Filter on ``keep`` for the mixed corpus; the
    full assignment is returned so the cut is auditable.

    Scale shape: ONE shuffle keyed by the stratum (window rank +
    windowed count — no joins, no collects).  A pathologically hot
    stratum concentrates its sort in few partitions; the standard
    mitigation at 100 TB is a two-phase cut (approximate hash-threshold
    prefilter per stratum, then exact rank over the ~frac·n survivors),
    which composes from this same operator applied after a cheap
    hash-range filter — the semantics here stay the exact contract.
    """
    strat = F.col(strata_col).cast("string")
    h = F.md5(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(strat).orderBy(h, F.col(id_col).cast("long"))
    wn = Window.partitionBy(strat)
    frac = F.lit(float(default_frac))
    for k, v in sorted((fractions or {}).items()):
        frac = F.when(strat == k, F.lit(float(v))).otherwise(frac)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        strat.alias("stratum"),
        F.row_number().over(w).cast("long").alias("rk"),
        F.count("*").over(wn).cast("long").alias("n_stratum"),
        (
            F.row_number().over(w)
            <= F.ceil(frac * F.count("*").over(wn))
        ).alias("keep"),
    )


def pack_sequences(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    ctx_len: int = 2048,
    chunk_docs: int = 65536,
) -> DataFrame:
    """→ (doc_id, n_tokens, offset, bin_first, bin_last): sequence
    packing for pretraining — docs are concatenated in ``id`` order into
    one token stream and sliced into fixed ``ctx_len`` context windows;
    each doc reports its token span start (``offset``, the exclusive
    prefix sum of token counts) and the first/last window it lands in.
    A doc with ``bin_first != bin_last`` straddles a window boundary
    (the standard concat-and-slice packing admits such splits; a loader
    groups rows by bin to emit training sequences).

    Empty docs get ``bin_first == bin_last == offset // ctx_len``.

    Scale shape — the distributed PREFIX SUM, with no global-order
    window (a ``Window.orderBy`` without partitioning funnels the whole
    corpus through ONE partition — the classic scale trap this operator
    exists to avoid):

      1. per-doc token counts: one map-side pass;
      2. docs bucket into coarse chunks (``id // chunk_docs``) and the
         running count WITHIN each chunk is a window partitioned by
         chunk — parallel across chunks;
      3. chunk totals aggregate to a TINY per-chunk table (corpus_size /
         chunk_docs rows); its exclusive prefix sum runs on that summary
         only, and broadcast-joins back.

    Determinism: ordering is (id) throughout — engine- and
    partitioning-independent.
    """
    from ..functions.tokenizer import SQL_TOKEN_PATTERN as _P

    n_toks = F.size(
        F.expr(f"regexp_extract_all(lower({text_col}), '{_P}', 0)")
    ).cast("long")
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_toks.alias("n_tokens"),
        # integer `div`, not `/`+cast: double division of huge offsets
        # can round across an integer boundary before truncation
        F.expr(
            f"CAST({id_col} AS BIGINT) div {int(chunk_docs)}"
        ).alias("_chunk"),
    )
    w_local = (
        Window.partitionBy("_chunk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "_local_before",
        F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0)).cast("long"),
    )
    totals = base.groupBy("_chunk").agg(
        F.sum("n_tokens").cast("long").alias("_chunk_total")
    )
    w_chunks = (
        Window.orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_chunk_before",
        F.coalesce(F.sum("_chunk_total").over(w_chunks), F.lit(0))
        .cast("long"),
    ).select("_chunk", "_chunk_before")
    off = (F.col("_chunk_before") + F.col("_local_before")).cast("long")
    c = int(ctx_len)
    return (
        local.join(F.broadcast(offsets), "_chunk")
        .select("doc_id", "n_tokens", off.alias("offset"))
        .select(
            "doc_id",
            "n_tokens",
            "offset",
            F.expr(f"offset div {c}").alias("bin_first"),
            F.expr(
                f"(offset + greatest(n_tokens, 1) - 1) div {c}"
            ).alias("bin_last"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    target_docs: DataFrame,
    text_col: str,
    id_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """→ (doc_id, n_tokens, logratio, avg_logratio): Data Selection via
    Importance Resampling (Xie et al. 2023) — per-doc importance weight
    ``Σ_tok [ln p̂_target(tok) − ln p̂_raw(tok)]`` under add-α-smoothed
    unigram models of the target domain (``target_docs``) and the raw
    corpus (``docs``), with a shared vocab size V = |vocab(raw ∪
    target)| + 1 (one unseen slot).  Docs whose token distribution looks
    like the target domain score high; resampling keeps the top mass
    (compose with :func:`stratified_sample_exact` or
    ``quality_quantile_cut`` for the cut).  The paper hashes n-gram
    features into buckets; this is the exact-unigram instance — bucketed
    features compose by replacing the token key with
    ``pmod(xxhash64(tok), n_buckets)``, the same pipeline shape (kept
    exact here so the cross-engine oracle is bit-checkable).

    ``avg_logratio`` is the per-token mean (length-normalized variant);
    empty docs get an explicit 0.0 for both.

    100-TB shape: doc-term counts are one groupBy with map-side partial
    agg; both unigram LMs aggregate FROM that table (the corpus is
    tokenized once); scoring is one join keyed by the token against the
    (vocab-sized, usually broadcastable) log-ratio table plus a per-doc
    sum.  Only three scalar aggregates ever reach the driver."""
    from ..functions.tokenizer import SQL_TOKEN_PATTERN as _P

    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{_P}', 0)"
    )
    occ = (
        docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("c_doc"))
    )
    raw_counts = occ.groupBy("tok").agg(F.sum("c_doc").alias("c_raw"))
    tgt_counts = (
        target_docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c_tgt"))
    )
    n_raw, v_raw = raw_counts.agg(
        F.sum("c_raw"), F.count("*")
    ).collect()[0]
    n_tgt = tgt_counts.agg(F.coalesce(F.sum("c_tgt"), F.lit(0))).collect()[0][0]
    v_extra = (
        tgt_counts.join(raw_counts, "tok", "left_anti").count()
    )
    vocab = int(v_raw) + int(v_extra) + 1
    a = float(alpha)
    lr = raw_counts.join(tgt_counts, "tok", "left").select(
        "tok",
        (
            F.log(
                (F.coalesce("c_tgt", F.lit(0)) + F.lit(a))
                / F.lit(float(n_tgt) + a * vocab)
            )
            - F.log(
                (F.col("c_raw") + F.lit(a))
                / F.lit(float(n_raw) + a * vocab)
            )
        ).alias("lr"),
    )
    per_doc = (
        occ.join(lr, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("c_doc").cast("long").alias("n_tokens"),
            F.sum(F.col("c_doc") * F.col("lr")).alias("_s"),
        )
    )
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.round(F.coalesce("_s", F.lit(0.0)), 6).alias("logratio"),
        F.round(
            F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.col("_s") / F.col("n_tokens").cast("double")),
            6,
        ).alias("avg_logratio"),
    )


def shard_assign(
    docs: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shard-v1",
) -> DataFrame:
    """→ (doc_id, shard, pos): deterministic global shuffle + shard
    assignment for training — every doc lands in a pseudo-random shard
    with a pseudo-random position inside it, reproducible across runs,
    engines, and cluster sizes (the property ``df.repartition`` +
    ``rand()`` shuffles lack).

    ``shard = H mod n_shards`` where ``H`` is the first 60 bits of
    ``md5(salt ‖ id)`` — a fixed uniform hash, so shards are
    hash-buckets with NO global ordering step.  ``pos`` is the doc's
    rank inside its shard under the same hash (ties impossible after
    the id suffix), i.e. the within-shard read order of an epoch.

    Scale shape: one shuffle keyed by ``shard`` + a per-shard sort —
    identical to :func:`stratified_sample_exact`'s window.  At 100 TB
    n_shards is picked ≫ executor count (e.g. 64k), so each window
    sorts ~corpus/64k rows; no single global sort ever happens, and
    re-running with a different salt is a fresh epoch permutation.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    big = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    shard = F.pmod(big, F.lit(int(n_shards))).cast("long")
    w = Window.partitionBy(shard).orderBy(h, F.col(id_col).cast("long"))
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        shard.alias("shard"),
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )
