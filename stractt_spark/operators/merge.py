"""Hierarchical index merge with deferred docID remap.

Reference semantics re-expressed for Spark:

* ``Index::merge`` adopts another index's segments file-level and defers
  docID remapping to segment merge (/root/reference/src/inverted_index.rs:
  308-355) — here: each source index keeps its dense local id space
  [0, num_docs) and the merge assigns ``new_id = old_id + offset`` where
  offsets are prefix sums over the *ordered* source list (derived from
  sorted metadata, never task order — SURVEY.md §7(d)).
* ``merge_into_segments`` balances merged segments with greedy LPT
  bin-packing by doc count (/root/reference/src/inverted_index.rs:247-297)
  — :func:`lpt_buckets` reproduces that assignment; the merged index is
  then re-segmented to contiguous doc ranges, which is what makes the
  packed-norms addressing and block-max skipping work post-merge.
* the heavy lifting is ONE sort-merge shuffle keyed (segment_id, term)
  inside ``build_segments`` — the Spark-native replacement for the
  reference's pairwise index fold (SURVEY.md §4 partitioning row).

Posting decode for the merge is a cogrouped Arrow pass (segments ⋈ norms
per source segment) — no join shuffle, both tables are already keyed by
segment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .segments import decode_term_blocks


def lpt_buckets(sizes: list[int], n_buckets: int) -> list[int]:
    """Greedy Longest-Processing-Time assignment: sort items by size desc,
    place each in the currently-smallest bucket. Returns bucket index per
    item (reference: inverted_index.rs:247-297)."""
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    loads = [0] * n_buckets
    out = [0] * len(sizes)
    for i in order:
        b = min(range(n_buckets), key=lambda j: (loads[j], j))
        out[i] = b
        loads[b] += sizes[i]
    return out


def decode_postings(
    segments: DataFrame,
    norms: DataFrame,
    doc_offset: int = 0,
    include_positions: bool = False,
) -> DataFrame:
    """segments + packed norms → postings rows
    ``(doc_id [+offset], term, tf, dl, norm_id [, positions])`` — the exact
    inverse of the segment encode, so build/merge roundtrips are testable
    and merged indexes keep phrase capability.

    ``dl`` is the *quantized* decode of norm_id (the exact dl is not stored
    in the index; it is only used for avgdl, which merge takes from the
    source stats sums — matching the reference, where merged avgdl is
    likewise the sum of per-segment totals)."""
    from ..functions.fieldnorm import FIELD_NORMS_TABLE
    from .postings import POSTINGS_POS_SCHEMA, POSTINGS_SCHEMA
    from .segments import decode_subset_positions

    def run(key, seg_pdf: pd.DataFrame, norm_pdf: pd.DataFrame):
        cols = {"doc_id": pd.Series([], dtype="int64"),
                "term": pd.Series([], dtype="object"),
                "tf": pd.Series([], dtype="int32"),
                "dl": pd.Series([], dtype="int32"),
                "norm_id": pd.Series([], dtype="int32")}
        if include_positions:
            cols["positions"] = pd.Series([], dtype="object")
        if len(seg_pdf) == 0 or len(norm_pdf) == 0:
            return pd.DataFrame(cols)
        base = int(norm_pdf["base_doc_id"].iloc[0])
        narr = np.frombuffer(norm_pdf["norm_bytes"].iloc[0], dtype=np.uint8)
        outs = []
        for term, g in seg_pdf.groupby("term"):
            g = g.sort_values("block_id")
            ids, tfs = decode_term_blocks(g)
            ids = ids.astype(np.int64)
            nid = narr[ids - base].astype(np.int32)
            out = {
                "doc_id": pd.Series(ids + doc_offset, dtype="int64"),
                "term": pd.Series([term] * len(ids), dtype="object"),
                "tf": pd.Series(tfs.astype(np.int32), dtype="int32"),
                "dl": pd.Series(
                    FIELD_NORMS_TABLE[nid].astype(np.int32), dtype="int32"
                ),
                "norm_id": pd.Series(nid, dtype="int32"),
            }
            if include_positions:
                pos, offs = decode_subset_positions(g, tfs)
                out["positions"] = pd.Series(
                    [pos[offs[i]:offs[i + 1]].tolist() for i in range(len(ids))],
                    dtype="object",
                )
            outs.append(pd.DataFrame(out))
        return pd.concat(outs, ignore_index=True)

    schema = POSTINGS_POS_SCHEMA if include_positions else POSTINGS_SCHEMA
    return (
        segments.groupBy("segment_id")
        .cogroup(norms.groupBy("segment_id"))
        .applyInPandas(run, schema)
    )


def merge_indexes(
    spark: SparkSession,
    source_dirs: list[str],
    out_dir: str,
    docs_per_segment: int | None = None,
) -> "IndexPaths":
    """Merge N independently-built indexes into one re-segmented index.

    Sources are taken in the given order; doc ids are remapped by prefix-sum
    offsets over each source's id span max(next_doc_id, num_docs), which
    covers streaming appends past num_docs.  Global stats and term dfs are
    sums over sources (disjoint doc spaces).
    """
    import json
    import os

    from ..plans.build import IndexPaths
    from .segments import build_norms, build_segments

    from pyspark.sql import functions as F

    srcs = [IndexPaths(d) for d in source_dirs]
    stats = []
    for s in srcs:
        with open(s.stats) as f:
            stats.append(json.load(f))
    dps = docs_per_segment or stats[0]["docs_per_segment"]
    analyzer = stats[0]["analyzer"]
    if any(st["analyzer"] != analyzer for st in stats):
        raise ValueError("cannot merge indexes built with different analyzers")
    # flavor guards: a multi-field source's per-field norm rows
    # ('\x02field\x1f…' terms + '\x00__mf__…' sentinels) would be varint-
    # decoded as single-field posting deltas — silent corruption; a
    # presorted source's pre-score rank ids would be remapped into a plain
    # id-ordered space, silently voiding the quota soundness premise
    for d, st in zip(source_dirs, stats):
        if "multifield" in st:
            raise ValueError(
                f"merge_indexes cannot merge the MULTI-FIELD index at {d}: "
                "per-field rows would decode as corrupt single-field "
                "postings; rebuild the union with build_index_fused_multifield"
            )
        if st.get("presorted"):
            raise ValueError(
                f"merge_indexes cannot merge the PRESORTED index at {d}: "
                "remapping would break pre-score rank order; rebuild the "
                "union with build_index_fused(pre_scores=...)"
            )
    # merged index keeps positions iff EVERY source has them
    positions = all(st.get("positions") for st in stats)

    # Each source's id space is sized by max(next_doc_id, num_docs):
    # streaming appends assign ids past num_docs (fresh segment boundary
    # after the high-water mark, streaming/ingest.py), so sizing by
    # num_docs alone would collide remapped ids across sources.  For a
    # never-appended source this degenerates to the dense num_docs offset.
    offsets = []
    acc = 0
    for st in stats:
        offsets.append(acc)
        acc += max(st.get("next_doc_id", 0), st["num_docs"])

    parts = []
    from ..streaming.ingest import registered_paths
    from .segments import split_unified

    for d, s, st, off in zip(source_dirs, srcs, stats, offsets):
        if st.get("layout") == "fused":
            # union the main table AND every ledgered streaming batch dir —
            # reading paths.index alone silently drops streamed docs
            seg, nrm = split_unified(
                spark.read.parquet(*registered_paths(d, st))
            )
        else:
            seg = spark.read.parquet(s.segments)
            nrm = spark.read.parquet(s.norms)
        parts.append(
            decode_postings(seg, nrm, doc_offset=off, include_positions=positions)
        )
    postings = parts[0]
    for p in parts[1:]:
        postings = postings.unionByName(p)

    os.makedirs(out_dir, exist_ok=True)
    out = IndexPaths(out_dir)
    postings.write.mode("overwrite").parquet(out.postings)
    postings = spark.read.parquet(out.postings)

    seg = build_segments(postings, dps)
    (
        seg.sortWithinPartitions("segment_id", "term", "block_id")
        .write.mode("overwrite")
        .parquet(out.segments)
    )
    from .postings import doc_stats

    build_norms(doc_stats(postings), dps).write.mode("overwrite").parquet(out.norms)
    postings.groupBy("term").agg(F.count("*").alias("df")).write.mode(
        "overwrite"
    ).parquet(out.term_stats)

    merged = {
        "num_docs": sum(st["num_docs"] for st in stats),
        "total_tokens": sum(st["total_tokens"] for st in stats),
        # high-water mark for future appends: the full remapped id span
        "next_doc_id": acc,
        "analyzer": analyzer,
        "docs_per_segment": dps,
        "positions": positions,
        "merged_from": [
            {"dir": d, "offset": off, "num_docs": st["num_docs"]}
            for d, off, st in zip(source_dirs, offsets, stats)
        ],
    }
    merged["avgdl"] = (
        merged["total_tokens"] / merged["num_docs"] if merged["num_docs"] else 0.0
    )
    with open(out.stats, "w") as f:
        json.dump(merged, f, indent=2)
    with open(out.manifest, "w") as f:
        json.dump({"stages": {s: {"ok": True, "fingerprint": "merge"} for s in
                              ("postings", "segments", "norms", "term_stats", "stats")}},
                  f)
    return out
