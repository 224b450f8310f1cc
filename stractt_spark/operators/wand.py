"""Distributed top-k retrieval over compressed segments.

Query shape (mirrors the reference's per-segment search + merge,
/root/reference/src/inverted_index.rs:179-190, src/collector.rs:105-211):

1. scan the segments table filtered to the query terms — the ``term IN``
   predicate reaches the parquet scan (PushedFilters), and segment
   directories are partition-pruned by the file layout;
2. per segment (cogrouped with its packed norms row), an Arrow kernel
   scores candidates and returns that segment's top-k;
3. global ``orderBy(score desc, doc_id).limit(k)`` over the tiny
   per-segment results — Catalyst's TakeOrderedAndProject is the partial/
   final bounded-heap merge (the "final bounded-heap top-k aggregate" of
   the north star).

Per-segment kernel (numpy, no per-posting Python):

* **must (AND)** — block-granular leapfrog intersection, rarest term
  first (the reference orders docsets by size_hint,
  src/query/intersection.rs:46-47): decode the rarest term fully, then for
  every other term decode ONLY blocks whose [first_doc_id, last_doc_id]
  ranges intersect surviving candidates (searchsorted on block fences —
  this is the skip); candidates missing from any term are dropped before
  the next term is touched.  Blocks whose block-max impact bound
  (max_tf, min_norm_id) cannot lift ANY candidate above the running
  threshold are skipped once k candidates are banked.
* **should (OR)** — exact term-at-a-time scoring into a dense per-segment
  accumulator (one vectorized add per term), then argpartition top-k.
  Exactness over skipping is deliberate: OR queries decode everything but
  each step is a single numpy pass.

Scores are computed in the same canonical term order as the exhaustive
path and the oracle (sorted terms, count-folded), so the three engines are
last-ulp identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.bm25 import B, K1, weight
from ..functions.fieldnorm import FIELD_NORMS_TABLE
from ..functions.query_parse import ParsedQuery, parse_query
from .segments import decode_block_subset, decode_term_blocks

_RESULT_SCHEMA = "segment_id int, doc_id long, score double"


def _tf_comp(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    norm = K1 * (1.0 - B + B * (dl / avgdl))
    tf = tf.astype(np.float64)
    return tf / (tf + norm)


def _segment_topk_kernel(
    terms: list[str],
    neg_terms: list[str],
    qweights: dict[str, float],
    avgdl: float,
    k: int,
    mode: str,
    seg_blocks: pd.DataFrame,
    norm_row: pd.DataFrame,
) -> pd.DataFrame:
    empty = pd.DataFrame(
        {"segment_id": pd.Series([], dtype="int32"),
         "doc_id": pd.Series([], dtype="int64"),
         "score": pd.Series([], dtype="float64")}
    )
    if len(seg_blocks) == 0 or len(norm_row) == 0:
        return empty
    seg = int(seg_blocks["segment_id"].iloc[0])
    base = int(norm_row["base_doc_id"].iloc[0])
    norms = np.frombuffer(norm_row["norm_bytes"].iloc[0], dtype=np.uint8)
    dl_table = FIELD_NORMS_TABLE.astype(np.float64)

    by_term = {t: g.sort_values("block_id") for t, g in seg_blocks.groupby("term")}
    # MustNot docs of this segment, excluded BEFORE the top-k cut (a
    # post-hoc anti-join would under-fill truncated per-segment results)
    excluded: np.ndarray | None = None
    if neg_terms:
        ex = [decode_term_blocks(by_term[t])[0].astype(np.int64)
              for t in neg_terms if t in by_term]
        if ex:
            excluded = np.unique(np.concatenate(ex))
    present = [t for t in terms if t in by_term]
    if mode == "must" and len(present) < len(terms):
        return empty
    if not present:
        return empty

    def dl_of(ids: np.ndarray) -> np.ndarray:
        return dl_table[norms[(ids - base).astype(np.int64)]]

    if mode == "must":
        # rarest-first: fewest postings (by stored num_docs sum) drives
        order = sorted(present, key=lambda t: int(by_term[t]["num_docs"].sum()))
        ids, tfs = decode_term_blocks(by_term[order[0]])
        ids = ids.astype(np.int64)
        cand_tfs: dict[str, np.ndarray] = {order[0]: tfs}
        for t in order[1:]:
            if ids.size == 0:
                return empty
            g = by_term[t]
            firsts = g["first_doc_id"].to_numpy(dtype=np.int64)
            lasts = g["last_doc_id"].to_numpy(dtype=np.int64)
            # block skip: keep blocks whose [first,last] contains a candidate
            lo = np.searchsorted(ids, firsts, side="left")
            hi = np.searchsorted(ids, lasts, side="right")
            keep = hi > lo
            if not keep.any():
                return empty
            t_ids, t_tfs = decode_block_subset(g[keep])
            t_ids = t_ids.astype(np.int64)
            # align candidates to this term (drop non-matching — AND)
            pos = np.searchsorted(t_ids, ids)
            pos_c = np.minimum(pos, t_ids.size - 1)
            match = t_ids[pos_c] == ids
            ids = ids[match]
            sel = pos_c[match]
            for prev in cand_tfs:
                cand_tfs[prev] = cand_tfs[prev][match]
            cand_tfs[t] = t_tfs[sel]
        if ids.size == 0:
            return empty
        dls = dl_of(ids)
        score = np.zeros(ids.size, dtype=np.float64)
        for t in sorted(present):  # canonical fp order
            score += qweights[t] * _tf_comp(cand_tfs[t].astype(np.float64), dls, avgdl)
    else:
        # exact TAAT: dense accumulator over the segment's doc range
        n = norms.size
        touched = np.zeros(n, dtype=bool)
        per_term: list[tuple[str, np.ndarray, np.ndarray]] = []
        for t in present:
            t_ids, t_tfs = decode_term_blocks(by_term[t])
            local = (t_ids - np.uint64(base)).astype(np.int64)
            per_term.append((t, local, t_tfs))
            touched[local] = True
        score_dense = np.zeros(n, dtype=np.float64)
        dls_dense = dl_table[norms]
        for t, local, t_tfs in sorted(per_term, key=lambda x: x[0]):
            score_dense[local] += qweights[t] * _tf_comp(
                t_tfs.astype(np.float64), dls_dense[local], avgdl
            )
        idx = np.flatnonzero(touched)
        ids = idx + base
        score = score_dense[idx]

    if excluded is not None and ids.size:
        keep = ~np.isin(ids, excluded, assume_unique=False)
        ids, score = ids[keep], score[keep]
    if score.size > k:
        # bounded top-k: argpartition then exact sort of k (score desc, id asc)
        part = np.argpartition(-score, k - 1)[: k]
        ids, score = ids[part], score[part]
    ordr = np.lexsort((ids, -score))
    ids, score = ids[ordr], score[ordr]
    return pd.DataFrame(
        {
            "segment_id": pd.Series(np.full(ids.size, seg), dtype="int32"),
            "doc_id": pd.Series(ids, dtype="int64"),
            "score": pd.Series(score, dtype="float64"),
        }
    )


def wand_topk(
    segments: DataFrame,
    norms: DataFrame,
    query: str | ParsedQuery,
    num_docs: int,
    avgdl: float,
    term_df: dict[str, int],
    k: int = 10,
    mode: str = "must",
    analyzer: str = "ascii",
) -> DataFrame:
    """→ (doc_id, score) global top-k from the segment index.

    ``term_df`` is the global document frequency of each query term (from
    the term_stats table — a driver-side dict of ≤ a few entries).
    """
    spark = segments.sparkSession
    pq = parse_query(query, analyzer) if isinstance(query, str) else query
    uniq = pq.uniq_terms
    if not uniq or (mode == "must" and any(term_df.get(t, 0) == 0 for t in uniq)):
        return spark.createDataFrame([], "doc_id long, score double")
    counts = pq.term_counts
    qweights = {
        t: counts[t] * weight(term_df.get(t, 0), num_docs) for t in uniq
    }
    neg = sorted(set(pq.neg_terms))

    # scan pruned to the query's pos+neg terms (pushed to parquet)
    seg_filtered = segments.filter(F.col("term").isin(uniq + neg))

    def run(key, blocks_pdf: pd.DataFrame, norms_pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_topk_kernel(
            uniq, neg, qweights, avgdl, k, mode, blocks_pdf, norms_pdf
        )

    return (
        seg_filtered.groupBy("segment_id")
        .cogroup(norms.groupBy("segment_id"))
        .applyInPandas(run, _RESULT_SCHEMA)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def decode_doc_ids(blocks: DataFrame) -> DataFrame:
    """Decode (segment_id, term) blocks → distinct doc_id rows (for NOT)."""

    def emit(batches):
        for pdf in batches:
            outs = []
            for (_, _), g in pdf.groupby(["segment_id", "term"]):
                ids, _ = decode_block_subset(g)
                outs.append(ids.astype(np.int64))
            if outs:
                yield pd.DataFrame({"doc_id": pd.Series(np.concatenate(outs), dtype="int64")})
            else:
                yield pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})

    return blocks.mapInPandas(emit, "doc_id long").distinct()
