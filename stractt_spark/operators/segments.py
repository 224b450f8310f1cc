"""Segment build: postings → compressed per-segment posting blocks.

Spark-first re-expression of the reference's segment writer + posting
format ([tantivy contract]; usage /root/reference/src/inverted_index.rs:
130-177, SURVEY.md §2.3):

* a **segment** is a doc-id range (``segment_id = doc_id // docs_per_
  segment``) holding the full posting lists for its docs — the same
  addressing unit the reference searches per-thread and merges
  (src/inverted_index.rs:54-76).  Doc-range segmentation also splits any
  globally-hot term's postings across segments, which is exactly the
  salting the north rule asks for — the shuffle key is (segment_id, term),
  never a bare hot term.
* posting lists are **128-doc blocks of delta-encoded, varint-packed doc
  ids** plus varint tfs.  The delta chain is contiguous across blocks of
  one (segment, term): block i's first delta is relative to block i-1's
  last doc, and each block's absolute ``first_doc_id``/``last_doc_id``
  live in its row, so (a) a full list decodes with ONE vectorized pass
  over the concatenated bytes, and (b) any block subset decodes
  independently (skip-friendly).
* per block we keep **max_tf and min_norm_id** — the exact skip data
  block-max WAND needs (max-tf-per-block is the tantivy skip-list payload
  the reference's early termination relies on). A build-time
  ``max_impact`` is NOT stored: idf/avgdl change under merge, so the query
  computes bounds from (max_tf, min_norm_id) + current global stats.
* fieldnorms are packed one byte per doc per segment
  (``norm_bytes[local_id]``), mirroring the reference's fieldnorm cache
  (src/fastfield_cache.rs).

Shuffle accounting: exactly ONE wide exchange — the groupBy
(segment_id, term) that brings each posting list together (the reference's
pairwise index-merge fold, replaced by a single sort-merge shuffle,
SURVEY.md §4).  Encoding is a narrow Arrow pass over grouped rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOCK_SIZE = 128  # docs per posting block [tantivy contract]

SEGMENTS_SCHEMA = StructType(
    [
        StructField("segment_id", IntegerType(), False),
        StructField("term", StringType(), False),
        StructField("block_id", IntegerType(), False),
        StructField("first_doc_id", LongType(), False),
        StructField("last_doc_id", LongType(), False),
        StructField("num_docs", IntegerType(), False),
        StructField("id_bytes", BinaryType(), False),
        StructField("tf_bytes", BinaryType(), False),
        # per-block position stream (delta+varint, chain reset per doc) —
        # present when the index is built WithFreqsAndPositions, else null
        StructField("pos_bytes", BinaryType(), True),
        StructField("max_tf", IntegerType(), False),
        StructField("min_norm_id", IntegerType(), False),
    ]
)

NORMS_SCHEMA = StructType(
    [
        StructField("segment_id", IntegerType(), False),
        StructField("base_doc_id", LongType(), False),
        StructField("n_docs", IntegerType(), False),
        StructField("norm_bytes", BinaryType(), False),
    ]
)


def with_segment_id(postings: DataFrame, docs_per_segment: int) -> DataFrame:
    return postings.withColumn(
        "segment_id", (F.col("doc_id") / F.lit(docs_per_segment)).cast("int")
    )


def encode_segment_arrays(
    seg: int,
    term_codes: np.ndarray,
    uniq_terms: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norm_ids: np.ndarray,
    positions_flat: np.ndarray | None = None,
) -> pd.DataFrame:
    """Encode ONE segment's postings (already sorted by (term_code,
    doc_id); ``term_codes`` index into sorted ``uniq_terms``) into block
    rows — fully vectorized: one delta pass with per-term chain resets, ONE
    varint encode of the whole segment id/tf streams (sliced at block
    boundaries via per-value byte lengths), and reduceat for the per-block
    max_tf / min_norm skip metadata.  The only Python-level loop is the
    final per-block byte slicing.  Integer term codes keep every
    comparison/sort off the string path (pandas object sorts measurably
    bottlenecked the stage)."""
    from ..functions.codec import varint_encode

    n = len(doc_ids)
    ids = doc_ids.astype(np.uint64)
    term_change = np.empty(n, dtype=bool)
    term_change[0] = True
    np.not_equal(term_codes[1:], term_codes[:-1], out=term_change[1:])
    term_starts = np.flatnonzero(term_change)
    # delta chain contiguous within each term; absolute at term start
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    deltas[term_starts] = ids[term_starts]

    term_lens = np.diff(np.append(term_starts, n))
    bpt = (term_lens + BLOCK_SIZE - 1) // BLOCK_SIZE  # blocks per term
    total_blocks = int(bpt.sum())
    # block_id within term, block start/end row offsets
    first_block = np.cumsum(bpt) - bpt
    block_id = np.arange(total_blocks, dtype=np.int64) - np.repeat(first_block, bpt)
    block_starts = np.repeat(term_starts, bpt) + block_id * BLOCK_SIZE
    block_ends = np.minimum(
        block_starts + BLOCK_SIZE, np.repeat(term_starts + term_lens, bpt)
    )

    id_stream, id_nbytes = varint_encode(deltas, return_lengths=True)
    tf_stream, tf_nbytes = varint_encode(tfs.astype(np.uint64), return_lengths=True)
    id_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(id_nbytes, out=id_off[1:])
    tf_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tf_nbytes, out=tf_off[1:])

    max_tf = np.maximum.reduceat(tfs, block_starts)
    min_norm = np.minimum.reduceat(norm_ids, block_starts)
    id_bytes = [id_stream[id_off[s]:id_off[e]] for s, e in zip(block_starts, block_ends)]
    tf_bytes = [tf_stream[tf_off[s]:tf_off[e]] for s, e in zip(block_starts, block_ends)]

    if positions_flat is not None:
        # positions delta-encoded with chain reset per posting row; block
        # byte ranges derived from cumulative tf (value space) + per-value
        # byte lengths — same one-pass-encode / slice-at-boundaries trick
        pos = positions_flat.astype(np.uint64)
        cumtf = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tfs, out=cumtf[1:])
        pdeltas = np.empty(len(pos), dtype=np.uint64)
        if len(pos):
            pdeltas[0] = pos[0]
            np.subtract(pos[1:], pos[:-1], out=pdeltas[1:])
            row_starts_v = cumtf[:-1][tfs > 0]
            pdeltas[row_starts_v] = pos[row_starts_v]
        pos_stream, pos_nbytes = varint_encode(pdeltas, return_lengths=True)
        pos_off = np.zeros(len(pos) + 1, dtype=np.int64)
        np.cumsum(pos_nbytes, out=pos_off[1:])
        pos_bytes = [
            pos_stream[pos_off[cumtf[s]]:pos_off[cumtf[e]]]
            for s, e in zip(block_starts, block_ends)
        ]
    else:
        pos_bytes = [None] * total_blocks

    return pd.DataFrame(
        {
            "segment_id": pd.Series(np.full(total_blocks, seg), dtype="int32"),
            "term": pd.Series(
                np.repeat(uniq_terms[term_codes[term_starts]], bpt), dtype="object"
            ),
            "block_id": pd.Series(block_id, dtype="int32"),
            "first_doc_id": pd.Series(ids[block_starts].astype(np.int64), dtype="int64"),
            "last_doc_id": pd.Series(ids[block_ends - 1].astype(np.int64), dtype="int64"),
            "num_docs": pd.Series(block_ends - block_starts, dtype="int32"),
            "id_bytes": pd.Series(id_bytes, dtype="object"),
            "tf_bytes": pd.Series(tf_bytes, dtype="object"),
            "pos_bytes": pd.Series(pos_bytes, dtype="object"),
            "max_tf": pd.Series(max_tf, dtype="int32"),
            "min_norm_id": pd.Series(min_norm, dtype="int32"),
        }
    )


def build_segments(postings: DataFrame, docs_per_segment: int) -> DataFrame:
    """postings (doc_id, term, tf, norm_id) → block rows (SEGMENTS_SCHEMA).

    One shuffle (groupBy segment_id — flat Tungsten rows, NO collect_list:
    JVM array-aggregation object churn measurably anti-scaled with cores),
    then one vectorized Arrow encode per segment.  A segment's postings
    must fit a worker's memory — that is the ``docs_per_segment`` knob,
    mirroring the reference's 1 GB-per-segment writer budget
    (/root/reference/src/inverted_index.rs:130)."""

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame()
        # integer sort: factorize terms (sort=True → codes follow
        # lexicographic term order), then ONE lexsort on (code, doc_id)
        codes, uniq = pd.factorize(pdf["term"], sort=True)
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((ids, codes))
        tfs = pdf["tf"].to_numpy(dtype=np.int64)[order]
        positions_flat = None
        if "positions" in pdf.columns:
            pos_obj = pdf["positions"].to_numpy(dtype=object)[order]
            positions_flat = np.fromiter(
                (v for sub in pos_obj for v in sub),
                dtype=np.int64,
                count=int(tfs.sum()),
            )
        return encode_segment_arrays(
            int(key[0]),
            codes[order],
            np.asarray(uniq, dtype=object),
            ids[order],
            tfs,
            pdf["norm_id"].to_numpy(dtype=np.int64)[order],
            positions_flat,
        )

    return (
        with_segment_id(postings, docs_per_segment)
        .groupBy("segment_id")
        .applyInPandas(encode, SEGMENTS_SCHEMA)
    )


# Sentinel "term" for per-segment metadata rows in the fused unified table:
# sorts before every real token (no real token starts with \x00) and carries
# the packed norm bytes + exact token totals of its segment.
NORMS_SENTINEL = "\x00__seg_meta__"
# tombstone rows (operators/deletes.py): id_bytes = raw sorted int64 doc
# ids, one row per (segment, delete batch); ride the segments side of the
# unified table and are masked pre-cut by every query kernel
DELETES_TERM = "\x00__del__"

# Reserved namespace for attribute filter terms: the reference implements
# site:/domain: filters as term queries on identity-tokenized fields
# (site_no_tokenizer, src/query/parser.rs:193-216, tokenizer.rs:157-202);
# here attribute values become "\x01field:value" terms — they flow through
# posting lists, intersection and pruning like any term, carry tf=1, and
# are excluded from dl/fieldnorms and scoring.
ATTR_PREFIX = "\x01"


def attr_term(fieldname: str, value: str) -> str:
    return f"{ATTR_PREFIX}{fieldname}:{value}"


def build_segments_fused(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    analyzer: str,
    docs_per_segment: int,
    stopwords: frozenset[str] = frozenset(),
    include_positions: bool = False,
    attr_cols: list[str] | None = None,
    pre_col: str | None = None,
    aligned_input: bool = False,
) -> DataFrame:
    """Docs → unified index rows in ONE shuffle + ONE Arrow pass
    (``aligned_input=True``: ZERO shuffles — see encode_partition below).

    ``attr_cols``: document attribute columns (e.g. repo, lang) indexed as
    identity filter terms ``\\x01col:value`` (see :func:`attr_term`) —
    tf=1, excluded from dl/norm stats, usable as Must/MustNot filters.

    ``pre_col``: per-doc query-independent pre-computed score column
    (reference ``pre_computed_score``, src/ranking/signal.rs:296-333).
    Packed as a float32 array into the sentinel row's otherwise-unused
    ``pos_bytes`` (``pre[local_id]``), mirroring the packed-norms layout —
    the query kernel adds it to the final score and the build's
    pre-score-ordered doc ids make the max-docs quota sound (the
    reference's sorted-by-score segments, src/inverted_index.rs:100-106).

    This is the reference's build shape verbatim re-expressed: each task
    receives a complete doc-range segment and builds its full posting
    blocks locally (the reference's indexing worker does the same per job,
    /root/reference/src/entrypoint/indexer.rs:80-184, writer commit
    src/inverted_index.rs:166-177).  Compared to the staged path it skips
    persisting an intermediate row-oriented postings table (at 10^12 files
    that's two full extra passes over the largest intermediate in the
    system) and shuffles raw doc text once, grouped by segment — the only
    wide exchange in the build.

    Output: SEGMENTS_SCHEMA rows; per segment one extra NORMS_SENTINEL row
    holding (id_bytes = packed norm bytes, tf_bytes = varint
    [exact_total_tokens, n_docs_with_tokens], first_doc_id = segment base).
    """
    from ..functions.codec import varint_encode
    from ..functions.fieldnorm import fieldnorm_to_id
    from ..functions.tokenizer import get_analyzer

    tokenize = get_analyzer(analyzer)
    needs_stops = analyzer in ("normal", "code")
    attr_cols = attr_cols or []
    pre_cols = (
        [F.col(pre_col).cast("double").alias("_pre")] if pre_col else []
    )
    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("_text"),
        *[F.col(c).cast("string").alias(f"_a_{c}") for c in attr_cols],
        *pre_cols,
    ).withColumn("segment_id", (F.col("doc_id") / F.lit(docs_per_segment)).cast("int"))

    def encode_segment(seg: int, pdf: pd.DataFrame) -> pd.DataFrame:
        base = seg * docs_per_segment
        doc_ids_in = pdf["doc_id"].to_numpy(dtype=np.int64)
        texts = pdf["_text"].values
        attr_vals = {c: pdf[f"_a_{c}"].values for c in attr_cols}
        # tokenize + tf per doc (dict counting is C-speed), flatten
        all_terms: list[str] = []
        all_docs: list[np.ndarray] = []
        all_tfs: list[list[int]] = []
        all_pos: list[list[int]] = []  # per posting row, when positions on
        dls = np.zeros(len(texts), dtype=np.int64)
        from collections import Counter

        for i, text in enumerate(texts):
            toks = (
                tokenize(text or "", stopwords) if needs_stops else tokenize(text or "")
            )
            dls[i] = len(toks)
            atoks = [
                attr_term(c, attr_vals[c][i])
                for c in attr_cols
                if attr_vals[c][i] is not None
            ]
            if include_positions:
                pos: dict[str, list[int]] = {}
                for j, t in enumerate(toks):
                    pos.setdefault(t, []).append(j)
                for at in atoks:
                    pos.setdefault(at, []).append(0)
                all_terms.extend(pos.keys())
                all_tfs.append([len(v) for v in pos.values()])
                all_pos.extend(pos.values())
                all_docs.append(np.full(len(pos), doc_ids_in[i], dtype=np.int64))
            else:
                tf = Counter(toks)  # C fast-path, ~2× the dict.get loop
                for at in atoks:
                    tf[at] = 1
                all_terms.extend(tf.keys())
                all_tfs.append(list(tf.values()))
                all_docs.append(np.full(len(tf), doc_ids_in[i], dtype=np.int64))
        norm_ids = fieldnorm_to_id(dls)
        # packed norms row
        local = doc_ids_in - base
        span = int(local.max()) + 1 if len(local) else 0
        narr = np.zeros(span, dtype=np.uint8)
        narr[local] = norm_ids.astype(np.uint8)
        pre_packed = None
        if pre_col:
            parr = np.zeros(span, dtype=np.float32)
            parr[local] = pdf["_pre"].to_numpy(dtype=np.float64).astype(np.float32)
            pre_packed = parr.tobytes()

        def meta_row(n_postings: int, n_blocks: int, bytes_compressed: int):
            # all per-segment build metrics ride in the sentinel row so the
            # stats/lineage stage reads ONLY pruned sentinel columns, never
            # the block binaries.  After the 5 metric values the varint
            # stream carries the EXACT per-doc token counts (span-aligned,
            # 0 for absent docs) — the reference's num_tokens fast field
            # (src/ranking/goggles/pattern_query.rs:243,290 reads it for
            # trailing-anchor pattern matching); quantized norms alone
            # cannot answer "is this the document's last token".
            dl_span = np.zeros(span, dtype=np.uint64)
            dl_span[local] = dls.astype(np.uint64)
            stats_vals = np.concatenate([
                np.array(
                    [int(dls.sum()), len(texts), n_postings, n_blocks,
                     bytes_compressed],
                    dtype=np.uint64,
                ),
                dl_span,
            ])
            return pd.DataFrame(
                {
                    "segment_id": pd.Series([seg], dtype="int32"),
                    "term": pd.Series([NORMS_SENTINEL], dtype="object"),
                    "block_id": pd.Series([-1], dtype="int32"),
                    "first_doc_id": pd.Series([base], dtype="int64"),
                    "last_doc_id": pd.Series([base + span - 1], dtype="int64"),
                    "num_docs": pd.Series([span], dtype="int32"),
                    "id_bytes": pd.Series([narr.tobytes()], dtype="object"),
                    "tf_bytes": pd.Series([varint_encode(stats_vals)], dtype="object"),
                    # sentinel pos_bytes carries the packed float32
                    # pre-score array (None for non-presorted builds)
                    "pos_bytes": pd.Series([pre_packed], dtype="object"),
                    "max_tf": pd.Series([0], dtype="int32"),
                    "min_norm_id": pd.Series([0], dtype="int32"),
                }
            )

        if not all_terms:
            return meta_row(0, 0, 0)
        terms_arr = np.array(all_terms, dtype=object)
        ids_arr = np.concatenate(all_docs)
        tfs_arr = np.fromiter(
            (v for sub in all_tfs for v in sub), dtype=np.int64, count=len(terms_arr)
        )
        norms_per_posting = np.repeat(norm_ids, [len(x) for x in all_tfs])
        codes, uniq = pd.factorize(terms_arr, sort=True)
        order = np.lexsort((ids_arr, codes))
        positions_flat = None
        if include_positions:
            pos_obj = np.empty(len(all_pos), dtype=object)
            pos_obj[:] = all_pos
            pos_obj = pos_obj[order]
            positions_flat = np.fromiter(
                (v for sub in pos_obj for v in sub),
                dtype=np.int64,
                count=int(tfs_arr.sum()),
            )
        blocks = encode_segment_arrays(
            seg,
            codes[order],
            np.asarray(uniq, dtype=object),
            ids_arr[order],
            tfs_arr[order],
            norms_per_posting[order],
            positions_flat,
        )
        nbytes = int(
            blocks["id_bytes"].str.len().sum() + blocks["tf_bytes"].str.len().sum()
        )
        return pd.concat(
            [meta_row(len(ids_arr), len(blocks), nbytes), blocks], ignore_index=True
        )

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return encode_segment(int(key[0]), pdf)

    if not aligned_input:
        # Explicit hash repartition on the group key BEFORE the cogroup-free
        # groupBy: AQE's post-shuffle coalescing targets
        # advisoryPartitionSizeInBytes of SHUFFLE bytes, but the reduce-side
        # cost here is the Arrow→Python encode kernel, which AQE cannot see
        # — measured locally it folded a 4-segment corpus into 3 tasks (two
        # segments serialized on one core).  A user-specified repartition is
        # exempt from AQE coalescing, so the kernel keeps
        # spark.sql.shuffle.partitions-way parallelism (cluster-configured;
        # segments per task still bounded below by the segment layout).
        n_shuffle = int(
            src.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        return (
            src.repartition(n_shuffle, "segment_id")
            .groupBy("segment_id")
            .applyInPandas(encode, SEGMENTS_SCHEMA)
        )

    # ZERO-SHUFFLE path: the caller guarantees every input partition holds
    # only WHOLE segments (range-partitioned by id with segment-aligned
    # boundaries — an Iceberg table sorted/split on the id column, or
    # corpus_spark_df(align=docs_per_segment)).  Each partition encodes
    # its segments in place; build_index_fused verifies the contract after
    # the write (a segment spanning two partitions would emit two sentinel
    # rows).  This removes the build's only wide exchange — at 100 TB the
    # difference between one pass and two over the corpus bytes.
    def encode_partition(batches):
        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        whole = pd.concat(parts, ignore_index=True)
        for seg, g in whole.groupby("segment_id", sort=True):
            yield encode_segment(int(seg), g.reset_index(drop=True))

    return src.mapInPandas(encode_partition, SEGMENTS_SCHEMA)


def split_unified(unified: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Unified fused table → (segments view, norms view) — pure filters,
    pushed to the parquet scan.  The norms view carries ``pre_bytes``
    (packed float32 pre-computed scores) when the build was presorted,
    else null."""
    segments = unified.filter(F.col("term") != NORMS_SENTINEL)
    norms = unified.filter(F.col("term") == NORMS_SENTINEL).select(
        "segment_id",
        F.col("first_doc_id").alias("base_doc_id"),
        F.col("num_docs").alias("n_docs"),
        F.col("id_bytes").alias("norm_bytes"),
        F.col("pos_bytes").alias("pre_bytes"),
        # varint [5 metrics, then exact per-doc token counts] — the query
        # kernel decodes the tail for trailing-anchor goggle patterns
        F.col("tf_bytes").alias("meta_bytes"),
    )
    return segments, norms


def build_norms(doc_stats_df: DataFrame, docs_per_segment: int) -> DataFrame:
    """doc_stats (doc_id, dl, norm_id) → one packed row per segment:
    ``norm_bytes[doc_id - base_doc_id] = norm_id`` (0 for absent docs)."""

    staged = doc_stats_df.withColumn(
        "segment_id", (F.col("doc_id") / F.lit(docs_per_segment)).cast("int")
    )

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(key[0])
        base = seg * docs_per_segment
        local = pdf["doc_id"].to_numpy(dtype=np.int64) - base
        n = int(local.max()) + 1
        arr = np.zeros(n, dtype=np.uint8)
        arr[local] = pdf["norm_id"].to_numpy(dtype=np.int64).astype(np.uint8)
        return pd.DataFrame(
            {
                "segment_id": pd.Series([seg], dtype="int32"),
                "base_doc_id": pd.Series([base], dtype="int64"),
                "n_docs": pd.Series([n], dtype="int32"),
                "norm_bytes": pd.Series([arr.tobytes()], dtype="object"),
            }
        )

    return staged.groupBy("segment_id").applyInPandas(pack, NORMS_SCHEMA)


def decode_term_blocks(
    block_pdf: pd.DataFrame,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode ALL blocks of one (segment, term) — rows must be the complete
    contiguous block set sorted by block_id.  One vectorized varint pass
    over the concatenated byte stream, then a single cumsum.

    → (doc_ids uint64, tfs uint64)
    """
    from ..functions.codec import varint_decode

    id_stream = b"".join(block_pdf["id_bytes"].values)
    tf_stream = b"".join(block_pdf["tf_bytes"].values)
    deltas = varint_decode(id_stream)
    ids = np.cumsum(deltas, dtype=np.uint64)
    return ids, varint_decode(tf_stream)


def decode_block_subset(rows: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Decode an arbitrary subset of blocks of one (segment, term).

    Uses each block's absolute ``first_doc_id`` to re-anchor the delta
    chain: ids = cumsum(deltas) - cumsum[start] + first_doc_id per block.
    Vectorized: one decode + one repeat-based correction.
    """
    from ..functions.codec import varint_decode

    id_stream = b"".join(rows["id_bytes"].values)
    tf_stream = b"".join(rows["tf_bytes"].values)
    deltas = varint_decode(id_stream)
    raw = np.cumsum(deltas, dtype=np.uint64)
    counts = rows["num_docs"].to_numpy(dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    firsts = rows["first_doc_id"].to_numpy(dtype=np.int64).astype(np.uint64)
    # correction so each block's first id equals its stored first_doc_id
    corr = firsts - raw[starts]
    ids = raw + np.repeat(corr, counts)
    return ids, varint_decode(tf_stream)


def decode_subset_positions(
    rows: pd.DataFrame, tfs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode the position streams of a block subset (any contiguity —
    the delta chain resets at every posting row, so blocks are
    independent).  ``tfs`` must be the subset's decoded tf array.

    → (positions_flat, row_offsets) where row r's positions are
    ``positions_flat[row_offsets[r]:row_offsets[r+1]]``.
    """
    from ..functions.codec import varint_decode

    pos_stream = b"".join(rows["pos_bytes"].values)
    deltas = varint_decode(pos_stream)
    raw = np.cumsum(deltas, dtype=np.uint64)
    offsets = np.zeros(len(tfs) + 1, dtype=np.int64)
    np.cumsum(tfs.astype(np.int64), out=offsets[1:])
    if len(raw):
        row_starts = offsets[:-1]  # every posting row has tf ≥ 1
        corr = raw[row_starts] - deltas[row_starts]
        pos = raw - np.repeat(corr, tfs.astype(np.int64))
    else:
        pos = raw
    return pos.astype(np.int64), offsets
