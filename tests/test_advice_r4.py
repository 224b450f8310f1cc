"""Round-4 regression tests for the advisor findings (ADVICE.md r3):

* MF kernel base_doc_id must come from a norms SENTINEL row — tombstone
  rows also ride the norms side of the cogroup and carry a different
  base; arbitrary row order must not change results.
* delete_docs must refuse phantom ids (gap slots inside the id span):
  compaction's delete accounting would otherwise subtract docs that
  never existed from num_docs/total_tokens.
* stats.json carries an analyzer fingerprint; opening an index whose
  analyzer definition changed raises instead of silently mis-tokenizing
  queries.
* search_with_metrics enforces the same quota-soundness guards as
  search.
* decode_exact_dls falls back to quantized dls on legacy sentinels
  without the exact-dl tail (no NaN column / opaque Arrow error).
"""

import json
import math
import os
import shutil

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stractt_spark.operators.deletes import (
    compact_index,
    delete_docs,
    read_tombstones,
)
from stractt_spark.plans.build import SegmentIndex, build_index_fused
from stractt_spark.sources.corpus import make_corpus

BASE = "/tmp/stractt_advice_r4_test"


@pytest.fixture(scope="module")
def corpus(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE, exist_ok=True)
    return make_corpus(300)


# ---------------------------------------------------------- MF base row


def test_mf_kernel_base_ignores_tombstone_row_order(spark, corpus):
    """Shuffle the norms-side rows so a tombstone row (whose
    first_doc_id is a DELETED id, not the segment base) comes first:
    the kernel must still derive the right base and produce the same
    ranking as before the shuffle."""
    from stractt_spark.operators.multifield import (
        MultiFieldSegmentIndex,
        build_index_fused_multifield,
    )

    rows = corpus
    docs = spark.createDataFrame(
        [(i, rows[i]["path"], rows[i]["content"]) for i in range(300)],
        "doc_id long, path string, content string",
    )
    mf_dir = f"{BASE}/mf"
    build_index_fused_multifield(
        spark, docs, mf_dir, {"path": "path", "content": "content"},
        docs_per_segment=96,
    )
    before = MultiFieldSegmentIndex(spark, mf_dir).search_list(
        "merge sort", k=30, mode="should"
    )
    # delete high ids only, so every tombstone row's first_doc_id is far
    # above its segment base
    dels = [i for i in range(60, 96)] + [i for i in range(150, 190, 3)]
    assert delete_docs(spark, mf_dir, dels) == len(dels)

    idx = MultiFieldSegmentIndex(spark, mf_dir)
    # force the adversarial order: tombstones FIRST on the norms side
    idx.norms = idx.norms.orderBy(F.asc("sentinel"))
    got = idx.search_list("merge sort", k=10, mode="should")
    want = [(d, s) for d, s in before if d not in set(dels)][:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, s1), (_, s2) in zip(got, want):
        assert math.isclose(s1, s2, rel_tol=1e-12)


# ------------------------------------------------------ phantom deletes


def test_delete_rejects_gap_slot_ids(spark, corpus):
    """An index whose internal id span has gaps (ids never assigned a
    doc) must not accept tombstones for the gap ids — and stats after
    compaction must match a fresh build over the true survivors."""
    rows = corpus
    # ids 0..299 with every multiple of 7 missing: gap slots in-span
    live_ids = [i for i in range(300) if i % 7 != 0]
    docs = spark.createDataFrame(
        [(i, rows[i]["content"]) for i in live_ids],
        "doc_id long, content string",
    )
    d = f"{BASE}/gappy"
    build_index_fused(spark, docs, d, text_col="content",
                      docs_per_segment=96)
    # request deleting 4 real docs and 4 phantoms — only the real ones
    # are tombstoned
    req = [8, 9, 7, 14, 21, 28, 15, 16]
    wrote = delete_docs(spark, d, req)
    assert wrote == 4
    assert read_tombstones(spark, d).tolist() == [8, 9, 15, 16]

    out = f"{BASE}/gappy_compacted"
    compact_index(spark, d, out)
    with open(f"{out}/stats.json") as f:
        got = json.load(f)
    fresh = f"{BASE}/gappy_fresh"
    survivors = [i for i in live_ids if i not in {8, 9, 15, 16}]
    build_index_fused(
        spark,
        spark.createDataFrame(
            [(i, rows[i]["content"]) for i in survivors],
            "doc_id long, content string",
        ),
        fresh, text_col="content", docs_per_segment=96,
    )
    with open(f"{fresh}/stats.json") as f:
        want = json.load(f)
    assert got["num_docs"] == want["num_docs"] == len(survivors)
    assert got["total_tokens"] == want["total_tokens"]


# ----------------------------------------------------- analyzer stamp


def test_analyzer_fp_stamped_and_checked(spark, corpus):
    d = f"{BASE}/fp"
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(corpus[:100])],
        "doc_id long, content string",
    )
    build_index_fused(spark, docs, d, text_col="content",
                      docs_per_segment=64)
    with open(f"{d}/stats.json") as f:
        stats = json.load(f)
    from stractt_spark.functions.tokenizer import analyzer_fingerprint

    assert stats["analyzer_fp"] == analyzer_fingerprint(stats["analyzer"])
    SegmentIndex(spark, d)  # opens fine

    stats["analyzer_fp"] = "0" * 16  # simulate an old tokenizer build
    with open(f"{d}/stats.json", "w") as f:
        json.dump(stats, f)
    with pytest.raises(ValueError, match="tokenizer behavior changed"):
        SegmentIndex(spark, d)
    # legacy index without the stamp still opens (can't know — documented)
    del stats["analyzer_fp"]
    with open(f"{d}/stats.json", "w") as f:
        json.dump(stats, f)
    SegmentIndex(spark, d)


# ------------------------------------------------- metrics quota guards


def test_search_with_metrics_enforces_quota_guards(spark, corpus):
    d = f"{BASE}/plain_metrics"
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(corpus[:100])],
        "doc_id long, content string",
    )
    build_index_fused(spark, docs, d, text_col="content",
                      docs_per_segment=64)
    idx = SegmentIndex(spark, d)
    with pytest.raises(ValueError, match="doc-id-ordered"):
        idx.search_with_metrics("merge sort", k=5, mode="should",
                                max_docs_per_segment=32)
    # presorted + tombstoned: quota raises on the metrics path too
    pre = docs.select(
        "doc_id", (F.col("doc_id") * 1.0).alias("pre_score")
    )
    dp = f"{BASE}/pre_metrics"
    build_index_fused(spark, docs, dp, text_col="content",
                      docs_per_segment=64, pre_scores=pre)
    assert delete_docs(spark, dp, [3, 4]) == 2
    idxp = SegmentIndex(spark, dp)
    with pytest.raises(ValueError, match="TOMBSTONED"):
        idxp.search_with_metrics("merge sort", k=5, mode="should",
                                 with_pre_score=True,
                                 max_docs_per_segment=32)
    # and unsafe_quota opts in, same as search
    top, m = idxp.search_with_metrics(
        "merge sort", k=5, mode="should", with_pre_score=True,
        max_docs_per_segment=32, unsafe_quota=True,
    )
    assert m["blocks_total"] >= m["blocks_decoded"] >= 0


# ------------------------------------------------ legacy exact-dl decode


def test_decode_exact_dls_legacy_fallback(spark):
    """A sentinel without the exact-dl tail (pre-tail index) decodes via
    the quantized norm table instead of emitting NaNs."""
    from stractt_spark.functions.codec import varint_encode
    from stractt_spark.functions.fieldnorm import FIELD_NORMS_TABLE
    from stractt_spark.operators.merge import decode_exact_dls

    norm_ids = np.array([3, 7, 0, 12], dtype=np.uint8)
    legacy = spark.createDataFrame(
        pd.DataFrame({
            "base_doc_id": pd.Series([64], dtype="int64"),
            "n_docs": pd.Series([4], dtype="int32"),
            # only the 5 metric values — no dl tail
            "meta_bytes": [varint_encode([10, 2, 3, 4, 5])],
            "norm_bytes": [norm_ids.tobytes()],
        })
    )
    got = decode_exact_dls(legacy).toPandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == [64, 65, 66, 67]
    want = FIELD_NORMS_TABLE[norm_ids.astype(np.int64)].astype(np.int64)
    assert got["dl"].tolist() == want.tolist()

    # corrupt: no tail AND mismatched norm span → loud error
    bad = spark.createDataFrame(
        pd.DataFrame({
            "base_doc_id": pd.Series([0], dtype="int64"),
            "n_docs": pd.Series([4], dtype="int32"),
            "meta_bytes": [varint_encode([1, 2, 3, 4, 5])],
            "norm_bytes": [norm_ids[:2].tobytes()],
        })
    )
    with pytest.raises(Exception, match="rebuild the index"):
        decode_exact_dls(bad).collect()


def test_append_and_merge_check_analyzer_fp(spark, corpus):
    """Streaming appends and merges must refuse tokenizer-version
    mismatches too — an append under a changed definition would silently
    mix incompatible postings; a merge of differently-tokenized sources
    would serve one query against two vocabularies."""
    from stractt_spark.operators.merge import merge_indexes
    from stractt_spark.streaming.ingest import append_batch

    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(corpus[:100])],
        "doc_id long, content string",
    )
    a = f"{BASE}/fp_a"
    b = f"{BASE}/fp_b"
    for d in (a, b):
        build_index_fused(spark, docs, d, text_col="content",
                          docs_per_segment=64)
    # stale fp on a → append refuses
    with open(f"{a}/stats.json") as f:
        st = json.load(f)
    st["analyzer_fp"] = "f" * 16
    with open(f"{a}/stats.json", "w") as f:
        json.dump(st, f)
    with pytest.raises(ValueError, match="tokenizer behavior changed"):
        append_batch(spark, docs.limit(5), 0, a, order_cols=("doc_id",))
    # fp mismatch between sources → merge refuses
    with pytest.raises(ValueError, match="tokenizer definitions differ"):
        merge_indexes(spark, [a, b], f"{BASE}/fp_merged")
    # matching legacy sources (no stamp) merge fine and the merged index
    # carries NO stamp (we cannot know which definition built them)
    del st["analyzer_fp"]
    with open(f"{a}/stats.json", "w") as f:
        json.dump(st, f)
    with open(f"{b}/stats.json") as f:
        stb = json.load(f)
    del stb["analyzer_fp"]
    with open(f"{b}/stats.json", "w") as f:
        json.dump(stb, f)
    out = f"{BASE}/fp_merged_legacy"
    merge_indexes(spark, [a, b], out)
    with open(f"{out}/stats.json") as f:
        assert json.load(f)["analyzer_fp"] is None


def test_merge_with_one_legacy_source_drops_stamp(spark, corpus):
    """Merging a stamped source with a legacy (no-fp) source must NOT
    stamp the output with the stamped source's fp — the legacy postings'
    tokenizer version is unknowable and the stamp would upgrade them to
    checked-and-passing."""
    from stractt_spark.operators.merge import merge_indexes

    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(corpus[:80])],
        "doc_id long, content string",
    )
    a, b = f"{BASE}/mixfp_a", f"{BASE}/mixfp_b"
    for d in (a, b):
        build_index_fused(spark, docs, d, text_col="content",
                          docs_per_segment=64)
    with open(f"{a}/stats.json") as f:
        st = json.load(f)
    del st["analyzer_fp"]  # legacy source
    with open(f"{a}/stats.json", "w") as f:
        json.dump(st, f)
    out = f"{BASE}/mixfp_merged"
    merge_indexes(spark, [a, b], out)
    with open(f"{out}/stats.json") as f:
        assert json.load(f)["analyzer_fp"] is None
