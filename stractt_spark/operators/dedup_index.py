"""Incremental (persisted) MinHash-LSH dedup index.

At 100 TB a corpus is never deduplicated in one shot: crawl batches
arrive continuously, and re-shingling the whole corpus per batch is a
full-corpus pass you cannot afford.  This module persists the two dedup
tables once per ingested batch and checks every NEW batch against them
with candidate-bounded joins only:

* ``buckets``  — ``(doc_id, band, bucket)``: the LSH banding projection
  (:func:`~stractt_spark.operators.dedup.banded_buckets` — the SAME
  function that banded the persisted rows bands each fresh batch, so
  bucket keys are identical by construction).  Checking a batch is one
  equality join on ``(band, bucket)``; its shuffle is bounded by bucket
  collisions, never by corpus size.
* ``docsets`` — ``(doc_id, n_sh, sh_hashes)``: each doc's distinct
  shingle set as sorted xxhash64 values.  Exact-Jaccard verification of
  a candidate pair is one array intersection; only candidates' rows are
  ever read (semi-join pruned), so the expensive table is touched
  proportionally to near-dup density, not corpus size.  Storing 8-byte
  hashes instead of shingle strings is the scale choice; a pair's
  measured Jaccard deviates from string-exact only on an xxhash64
  collision within the pair's union (P ≈ |union|²/2⁶⁴ — negligible).

Lifecycle discipline mirrors the ANN index (``similarity.py`` /
``ann.json``): a ``dedup.json`` manifest with an atomic tmp+rename swap,
a ledger of ``batch_N`` directories (a crash mid-append leaves the
previous manifest intact and the orphan dir unreferenced), the MinHash
parameter set + analyzer fingerprint stamped at build and re-checked on
every append (an index banded under different ``(n, num_perm, bands,
seed)`` or an older tokenizer definition must fail loudly — its buckets
would silently never collide with fresh batches).

Reference parity: the reference's dedup is query-time result diversity
(``/root/reference/src/query/mod.rs`` top-k de-rank) — corpus-scale
incremental dedup is part of the training-data-pipeline extension
mandated by the brief, shaped after the dedup stage of web-scale corpus
pipelines (CCNet/Gopher-style batch ingestion).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.tokenizer import analyzer_fingerprint
from .dedup import banded_buckets, minhash_signatures, token_shingles

_MANIFEST = "dedup.json"


# ------------------------------------------------------------- manifest


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, _MANIFEST)


def _write_manifest(index_dir: str, manifest: dict) -> None:
    """Atomic manifest swap (tmp + rename) — same discipline as
    ``similarity._write_ann_manifest`` and the text index's
    ``stats.json``: a crash mid-update leaves the previous ledger
    intact and any half-written batch dir unreferenced."""
    os.makedirs(index_dir, exist_ok=True)
    p = _manifest_path(index_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, p)


def read_dedup_manifest(index_dir: str) -> dict:
    with open(_manifest_path(index_dir)) as f:
        return json.load(f)


def _params_of(n: int, num_perm: int, bands: int, analyzer: str, seed: int) -> dict:
    return {
        "n": int(n),
        "num_perm": int(num_perm),
        "bands": int(bands),
        "analyzer": analyzer,
        "analyzer_fp": analyzer_fingerprint(analyzer),
        "seed": int(seed),
    }


def _check_params(manifest: dict, index_dir: str) -> dict:
    p = manifest["params"]
    fp = analyzer_fingerprint(p["analyzer"])
    if fp != p["analyzer_fp"]:
        raise ValueError(
            f"dedup index {index_dir}: analyzer {p['analyzer']!r} fingerprint "
            f"mismatch (index {p['analyzer_fp']}, current {fp}) — the persisted "
            "buckets were shingled under a different tokenizer definition; "
            "rebuild the index"
        )
    return p


# ------------------------------------------------------------ projections


def _shingle_sets(
    docs: DataFrame, text_col: str, id_col: str, n: int, analyzer: str
) -> DataFrame:
    """→ (doc_id, n_sh, sh_hashes sorted array<long>) — each doc's
    distinct shingle set, hashed JVM-side.  Per-doc groups are bounded
    by doc length, so the collect_set agg is skew-safe."""
    sh = token_shingles(docs, text_col, id_col, n, analyzer)
    return (
        sh.withColumn("h", F.xxhash64("shingle"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("h")).alias("sh_hashes"))
        .withColumn("n_sh", F.size("sh_hashes").cast("long"))
        .select("doc_id", "n_sh", "sh_hashes")
    )


def _batch_tables(
    spark: SparkSession, docs: DataFrame, p: dict, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """(buckets, docsets) for a doc frame under the index's params —
    the single projection shared by build, check, and append, so
    persisted rows and fresh batches hash identically by construction."""
    sigs = minhash_signatures(
        docs, text_col, id_col,
        n=p["n"], num_perm=p["num_perm"], analyzer=p["analyzer"], seed=p["seed"],
    )
    buckets = banded_buckets(sigs, p["bands"])
    docsets = _shingle_sets(docs, text_col, id_col, p["n"], p["analyzer"])
    return buckets, docsets


def _read_index_tables(
    spark: SparkSession, index_dir: str, manifest: dict
) -> tuple[DataFrame, DataFrame]:
    """(buckets, docsets) across the ledger, each row tagged with its
    batch ordinal ``_batch`` — the granularity batch-scoped tombstones
    mask at (see :func:`delete_docs`)."""
    buckets = docsets = None
    for i, b in enumerate(manifest["batches"]):
        d = os.path.join(index_dir, b)
        bk = spark.read.parquet(os.path.join(d, "buckets.parquet")).withColumn(
            "_batch", F.lit(i)
        )
        ds = spark.read.parquet(os.path.join(d, "docsets.parquet")).withColumn(
            "_batch", F.lit(i)
        )
        buckets = bk if buckets is None else buckets.unionByName(bk)
        docsets = ds if docsets is None else docsets.unionByName(ds)
    return buckets, docsets


def _write_batch(
    index_dir: str, name: str, buckets: DataFrame, docsets: DataFrame
) -> None:
    d = os.path.join(index_dir, name)
    buckets.write.mode("errorifexists").parquet(os.path.join(d, "buckets.parquet"))
    docsets.write.mode("errorifexists").parquet(os.path.join(d, "docsets.parquet"))


# ------------------------------------------------------------- lifecycle


def _tombstone_path(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones.parquet")


def _live(
    df: DataFrame, spark: SparkSession, index_dir: str, manifest: dict
) -> DataFrame:
    """Mask tombstoned rows out of an index table read (``df`` must
    carry the ``_batch`` ordinal from :func:`_read_index_tables`).
    Tombstones are BATCH-SCOPED — ``(doc_id, upto_batch)`` hides only
    rows in batches ≤ the mark, so a re-appended id's NEW rows (in a
    later batch) serve while the stale pre-delete rows stay masked
    forever — the same contract as the ANN index's ``mask_deleted``.

    The MANIFEST, not the filesystem, is the authority on whether
    tombstones apply: compaction's atomic manifest swap clears the
    ``tombstones`` key in the same instant it re-bases the batch
    ordinals, so a crash before the stale tombstone file's physical
    reclaim can never mask the freshly compacted (ordinal-0) rows."""
    if not manifest.get("tombstones"):
        return df
    p = _tombstone_path(index_dir)
    dead = spark.read.parquet(p)
    return df.join(
        dead,
        (df["doc_id"] == dead["doc_id"]) & (df["_batch"] <= dead["upto_batch"]),
        "left_anti",
    )


def delete_docs(spark: SparkSession, index_dir: str, doc_ids) -> int:
    """Tombstone docs out of the index (mask-now / compact-later, the
    same discipline as the text index's deletes and the ANN
    ``delete_vectors``): tombstoned docs stop matching future batches
    immediately and their ids become re-appendable (an UPDATE is
    delete + re-ingest — the re-appended content lands in a LATER batch
    than the tombstone's ``upto_batch`` mark, so it serves while the
    old rows stay masked).  Returns the number of NEW tombstones
    written; ids not live in the index are ignored (deleting them is a
    no-op, not an error — idempotent re-deletes).

    Crash note: tombstone rows are appended BEFORE the manifest commit
    activates them (``tombstones`` key + n_docs decrement).  A crash in
    between leaves inert rows that the NEXT successful delete
    activates — masking stays correct (the crashed rows were asked-for
    deletes); only the advisory ``n_docs`` can overcount by the
    crashed rows."""
    manifest = read_dedup_manifest(index_dir)
    ids_df = spark.createDataFrame(
        [(int(i),) for i in doc_ids], "doc_id long"
    ).distinct()
    _, docsets = _read_index_tables(spark, index_dir, manifest)
    upto = len(manifest["batches"]) - 1
    live_hits = ids_df.join(
        _live(docsets, spark, index_dir, manifest).select("doc_id"),
        "doc_id",
        "left_semi",
    ).select("doc_id", F.lit(upto).alias("upto_batch"))
    n_new = live_hits.count()
    if n_new == 0:
        return 0
    live_hits.write.mode("append").parquet(_tombstone_path(index_dir))
    manifest["tombstones"] = "tombstones.parquet"
    manifest["n_docs"] = manifest["n_docs"] - n_new
    _write_manifest(index_dir, manifest)
    return n_new


def compact_dedup_index(spark: SparkSession, index_dir: str) -> dict:
    """Reclaim tombstoned rows: rewrite the ledger as a single batch
    dir holding only live docs, drop the tombstone table and the old
    batch dirs.  After compaction the index is row-equivalent to a
    fresh build over the surviving docs' tables (same buckets, same
    docsets — both are content-pure projections, so no re-shingle is
    needed).  Returns the updated manifest.

    Crash discipline (write-new → atomic manifest swap → delete-old,
    the same order as every other lifecycle op here): the compacted
    tables are written to a NEW generation dir while the old dirs still
    exist, so a crash at ANY point leaves a readable index — before the
    manifest swap the old ledger still serves; after it the new dir
    serves and the stale dirs are unreferenced dead weight (reclaimed
    by the next compaction, or by ``append_batch``'s orphan self-heal
    if a future batch name lands on one)."""
    import shutil as _sh

    manifest = read_dedup_manifest(index_dir)
    _check_params(manifest, index_dir)
    buckets, docsets = _read_index_tables(spark, index_dir, manifest)
    live_b = _live(buckets, spark, index_dir, manifest).drop("_batch")
    live_d = _live(docsets, spark, index_dir, manifest).drop("_batch")
    gen = 0
    while os.path.exists(os.path.join(index_dir, f"batch_c{gen}")):
        gen += 1
    name = f"batch_c{gen}"
    _write_batch(index_dir, name, live_b, live_d)
    n_docs = spark.read.parquet(
        os.path.join(index_dir, name, "docsets.parquet")
    ).count()
    old = list(manifest["batches"])
    manifest["batches"] = [name]
    manifest["n_docs"] = n_docs
    manifest.pop("tombstones", None)  # the swap deactivates them atomically
    _write_manifest(index_dir, manifest)
    # past the commit point: everything below is reclaim, safe to lose
    for b in old:
        _sh.rmtree(os.path.join(index_dir, b), ignore_errors=True)
    _sh.rmtree(_tombstone_path(index_dir), ignore_errors=True)
    return manifest


def merge_dedup_indexes(
    spark: SparkSession, source_dirs: list[str], out_dir: str
) -> dict:
    """Merge dedup indexes into one compact single-batch index (the
    dedup analogue of ``merge_sign_indexes`` / the text index's
    `merge_indexes`): tombstones are reclaimed (only live rows ship),
    and the output is row-equivalent to a fresh build over the union of
    surviving docs — both tables are content-pure projections, so no
    re-shingle happens.  Refuses mismatched MinHash/banding/analyzer
    params (the same content would band to different buckets — future
    batches would silently never collide with half the corpus) and
    doc-id collisions across sources (dup_of would be ambiguous).
    Returns the new manifest."""
    manifests = [read_dedup_manifest(d) for d in source_dirs]
    p0 = _check_params(manifests[0], source_dirs[0])
    for d, m in zip(source_dirs[1:], manifests[1:]):
        p = _check_params(m, d)
        if p != p0:
            raise ValueError(
                f"dedup-index merge: {d} has params {p} but "
                f"{source_dirs[0]} has {p0} — the same content bands to "
                "different buckets; rebuild one side"
            )
    live_b = live_d = None
    for d, m in zip(source_dirs, manifests):
        buckets, docsets = _read_index_tables(spark, d, m)
        b = _live(buckets, spark, d, m).drop("_batch")
        ds = _live(docsets, spark, d, m).drop("_batch")
        live_b = b if live_b is None else live_b.unionByName(b)
        live_d = ds if live_d is None else live_d.unionByName(ds)
    n_docs = live_d.count()
    n_ids = live_d.select("doc_id").distinct().count()
    if n_ids != n_docs:
        raise ValueError(
            f"dedup-index merge: {n_docs - n_ids} doc ids appear in more "
            "than one source index"
        )
    _write_batch(out_dir, "batch_0", live_b, live_d)
    manifest = {
        "kind": "minhash_lsh_dedup",
        "params": p0,
        "batches": ["batch_0"],
        "n_docs": n_docs,
    }
    _write_manifest(out_dir, manifest)
    return manifest


def build_dedup_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
    analyzer: str = "ascii",
    seed: int = 42,
) -> dict:
    """Build ``batch_0`` of a persisted dedup index and stamp its
    manifest.  Returns the manifest.  Defaults pin the high-recall
    banding used by the ``minhash_pairs`` gate (32 bands × 2 rows:
    P[miss a Jaccard-0.5 pair] = (1−0.5²)^32 ≈ 4e-13)."""
    p = _params_of(n, num_perm, bands, analyzer, seed)
    buckets, docsets = _batch_tables(spark, docs, p, text_col, id_col)
    _write_batch(out_dir, "batch_0", buckets, docsets)
    n_docs = spark.read.parquet(
        os.path.join(out_dir, "batch_0", "docsets.parquet")
    ).count()
    manifest = {
        "kind": "minhash_lsh_dedup",
        "params": p,
        "batches": ["batch_0"],
        "n_docs": n_docs,
    }
    _write_manifest(out_dir, manifest)
    return manifest


def check_batch(
    spark: SparkSession,
    index_dir: str,
    batch_docs: DataFrame,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_intra: bool = False,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Best near-dup match per batch doc against the PERSISTED corpus:
    → (doc_id, dup_of, jaccard) with jaccard ≥ threshold (6dp-rounded,
    the same definition as :func:`~stractt_spark.operators.dedup.
    ngram_jaccard_pairs`); dup_of = argmax-jaccard match, ties to the
    smallest doc id.

    ``include_intra=True`` additionally matches each batch doc against
    LOWER-id docs of the same batch (the matched-any-lower ingest rule),
    via the same banding — candidates are batch×batch bucket collisions
    with the lower id taking the index side.

    Scale shape: one ``(band, bucket)`` equality join generates
    candidates (``max_bucket_size`` caps pathological buckets, same
    guard + recall argument as ``lsh_candidate_pairs``); the exact
    verify reads only candidate docs' shingle sets (semi-join pruned)
    and intersects sorted hash arrays JVM-side.  Nothing here scans the
    persisted corpus beyond the bucket join.
    """
    manifest = read_dedup_manifest(index_dir)
    p = _check_params(manifest, index_dir)
    idx_buckets, idx_docsets = _read_index_tables(spark, index_dir, manifest)
    idx_buckets = _live(idx_buckets, spark, index_dir, manifest).drop("_batch")
    idx_docsets = _live(idx_docsets, spark, index_dir, manifest).drop("_batch")
    # checkpoint the batch projections: they feed the candidate join,
    # the verify sides, and (in ingest) the append — without this the
    # tokenize+minhash pass over the batch replays once per action
    b_buckets, b_docsets = (
        t.localCheckpoint(eager=True)
        for t in _batch_tables(spark, batch_docs, p, text_col, id_col)
    )
    # prune the CORPUS bucket table to the batch's bucket keys before
    # anything else: batch keys are batch_docs × bands rows (tiny next
    # to the corpus), so the broadcast semi-join filters the persisted
    # table map-side and everything downstream — the skew-cap window
    # and the candidate join — is collision-bounded, not corpus-bounded
    idx_buckets = idx_buckets.join(
        F.broadcast(b_buckets.select("band", "bucket").distinct()),
        ["band", "bucket"],
        "left_semi",
    )
    if max_bucket_size is not None:
        # cap on the INDEX side (the side that grows with the corpus);
        # per-bucket counts over the pruned table equal the unpruned
        # ones for every bucket that can produce a candidate
        idx_buckets = (
            idx_buckets.withColumn(
                "_bc", F.count("*").over(Window.partitionBy("band", "bucket"))
            )
            .filter(F.col("_bc") <= int(max_bucket_size))
            .drop("_bc")
        )

    bb = b_buckets.select(
        F.col("doc_id").alias("b_doc"), "band", "bucket"
    )
    cands = (
        bb.join(
            idx_buckets.select(F.col("doc_id").alias("i_doc"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("b_doc", "i_doc")
        .distinct()
    )
    if include_intra:
        intra = (
            bb.join(
                b_buckets.select(
                    F.col("doc_id").alias("i_doc"), "band", "bucket"
                ),
                ["band", "bucket"],
            )
            .filter(F.col("i_doc") < F.col("b_doc"))
            .select("b_doc", "i_doc")
            .distinct()
        )
        cands = cands.unionByName(intra).distinct()
    # the candidate frame feeds both verify sides' semi-join prunes plus
    # the verify join itself — checkpoint so the bucket join runs once
    cands = cands.localCheckpoint(eager=True)

    i_sets = idx_docsets.join(
        cands.select(F.col("i_doc").alias("doc_id")).distinct(), "doc_id", "left_semi"
    )
    if include_intra:
        # a doc id can appear on both sides only when the batch reuses a
        # live index id (append_batch refuses it; check alone allows it)
        # — prefer the INDEX row deterministically, never an arbitrary
        # dropDuplicates survivor
        b_part = (
            b_docsets.join(
                cands.select(F.col("i_doc").alias("doc_id")).distinct(),
                "doc_id",
                "left_semi",
            )
            # anti vs the candidate-pruned index rows (tiny), not the
            # corpus: a colliding id that is a candidate i_doc is
            # necessarily present in i_sets already
            .join(i_sets.select("doc_id"), "doc_id", "left_anti")
        )
        i_sets = i_sets.unionByName(b_part)
    b_sets = b_docsets.join(
        cands.select(F.col("b_doc").alias("doc_id")).distinct(), "doc_id", "left_semi"
    )

    verified = (
        cands.join(
            b_sets.select(
                F.col("doc_id").alias("b_doc"),
                F.col("n_sh").alias("nb"),
                F.col("sh_hashes").alias("hb"),
            ),
            "b_doc",
        )
        .join(
            i_sets.select(
                F.col("doc_id").alias("i_doc"),
                F.col("n_sh").alias("ni"),
                F.col("sh_hashes").alias("hi"),
            ),
            "i_doc",
        )
        .withColumn("inter", F.size(F.array_intersect("hb", "hi")).cast("long"))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("nb") + F.col("ni") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= float(threshold))
    )
    w = Window.partitionBy("b_doc").orderBy(F.desc("jaccard"), F.asc("i_doc"))
    return (
        verified.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("b_doc").alias("doc_id"),
            F.col("i_doc").alias("dup_of"),
            "jaccard",
        )
    )


def append_batch(
    spark: SparkSession,
    index_dir: str,
    batch_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Append a batch's dedup tables as a new ledgered ``batch_N`` dir
    (no dedup decision — callers wanting check-then-append use
    :func:`ingest_dedup`).  Refuses doc ids already in the index (an id
    collision would make ``dup_of`` ambiguous and double-count sets).
    Returns the updated manifest."""
    manifest = read_dedup_manifest(index_dir)
    p = _check_params(manifest, index_dir)
    _, idx_docsets = _read_index_tables(spark, index_dir, manifest)
    # checkpoint: the tables feed the dup check plus two parquet writes,
    # and each action would otherwise replay the tokenize+minhash pass
    buckets, docsets = (
        t.localCheckpoint(eager=True)
        for t in _batch_tables(spark, batch_docs, p, text_col, id_col)
    )
    # the dup check is against LIVE ids only: a tombstoned id is
    # legitimately re-appendable (the update flow), and because its
    # tombstone is scoped to batches ≤ its mark, the new rows — landing
    # in a strictly later batch — serve without touching the tombstone.
    # Broadcast the (small) batch ids so the corpus id column is
    # filtered map-side rather than shuffled.
    dup_ids = (
        _live(idx_docsets, spark, index_dir, manifest)
        .select("doc_id")
        .join(F.broadcast(docsets.select("doc_id")), "doc_id", "left_semi")
        .count()
    )
    if dup_ids:
        raise ValueError(
            f"append_batch: {dup_ids} doc ids already exist in {index_dir}"
        )
    name = f"batch_{len(manifest['batches'])}"
    target = os.path.join(index_dir, name)
    if os.path.exists(target) and name not in manifest["batches"]:
        # crash orphan: a previous append wrote (some of) this dir but
        # died before its manifest commit — the manifest never
        # referenced it, so it is provably dead weight; clear and rewrite
        import shutil as _sh

        _sh.rmtree(target, ignore_errors=True)
    _write_batch(index_dir, name, buckets, docsets)
    added = spark.read.parquet(
        os.path.join(index_dir, name, "docsets.parquet")
    ).count()
    manifest["batches"].append(name)
    manifest["n_docs"] = manifest["n_docs"] + added
    _write_manifest(index_dir, manifest)
    return manifest


def ingest_dedup(
    spark: SparkSession,
    index_dir: str,
    batch_docs: DataFrame,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The composed pipeline op: check a batch against the persisted
    corpus AND against lower-id docs of the same batch, append only the
    survivors, return the per-doc decision table
    → (doc_id, kept boolean, dup_of, jaccard).

    Drop rule (matched-any-lower): a batch doc is dropped iff it has a
    ≥ threshold match in the index or among ANY lower-id batch doc —
    deliberately independent of whether that lower doc was itself kept,
    so the decision for doc d never depends on the transitive keep
    chain (each doc's verdict is a pure function of the corpus + batch
    content below it, which keeps the op deterministic under
    re-partitioning and makes the oracle a single non-recursive SQL
    query).  Kept rows carry the sentinels dup_of=-1, jaccard=0.0.

    The decision frame is materialized before the append so the
    returned DataFrame does not re-run the check after the index has
    already absorbed the batch (which would re-match every kept doc
    against itself)."""
    decisions, _ = decide_and_append(
        spark,
        index_dir,
        batch_docs,
        threshold=threshold,
        text_col=text_col,
        id_col=id_col,
        max_bucket_size=max_bucket_size,
    )
    return decisions


def decide_and_append(
    spark: SparkSession,
    index_dir: str,
    batch_docs: DataFrame,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> tuple[DataFrame, str | None]:
    """:func:`ingest_dedup`'s engine, shared with the streaming wrapper
    (:func:`~stractt_spark.streaming.dedup.stream_ingest_dedup`) so the
    decision shape can never drift between the batch and streamed
    paths: → (materialized decisions, appended batch name or None when
    every doc was a dup).  The streaming wrapper calls the two halves
    (:func:`decisions_frame`, :func:`append_survivors`) separately, with
    its decisions-parquet write in between."""
    matches = check_batch(
        spark,
        index_dir,
        batch_docs,
        threshold=threshold,
        text_col=text_col,
        id_col=id_col,
        include_intra=True,
        max_bucket_size=max_bucket_size,
    )
    decisions = decisions_frame(batch_docs, matches, id_col)
    name = append_survivors(
        spark, index_dir, batch_docs, decisions,
        text_col=text_col, id_col=id_col,
    )
    return decisions, name


def decisions_frame(
    batch_docs: DataFrame, matches: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Materialized per-doc decision table from a :func:`check_batch`
    result: → (doc_id, kept, dup_of, jaccard) with kept rows carrying
    the sentinels dup_of=-1 / jaccard=0.0."""
    ids = batch_docs.select(F.col(id_col).cast("long").alias("doc_id"))
    return (
        ids.join(matches, "doc_id", "left")
        .select(
            "doc_id",
            F.col("dup_of").isNull().alias("kept"),
            F.coalesce("dup_of", F.lit(-1)).cast("long").alias("dup_of"),
            F.coalesce("jaccard", F.lit(0.0)).alias("jaccard"),
        )
        .localCheckpoint(eager=True)
    )


def append_survivors(
    spark: SparkSession,
    index_dir: str,
    batch_docs: DataFrame,
    decisions: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str | None:
    """Append the ``kept`` docs of a decision table; → the new batch
    name, or None when every doc was a dup."""
    kept = decisions.filter("kept").select("doc_id")
    survivors = batch_docs.join(
        kept, batch_docs[id_col].cast("long") == kept["doc_id"], "left_semi"
    )
    if not survivors.limit(1).count():
        return None
    m = append_batch(
        spark, index_dir, survivors, text_col=text_col, id_col=id_col
    )
    return m["batches"][-1]
