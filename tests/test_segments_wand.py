"""Segment index + WAND path: codec roundtrip through Spark, rank-identity
vs the oracle AND the exhaustive DataFrame path, resume, lineage."""

import math
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from stractt_spark.operators.postings import build_postings
from stractt_spark.operators.segments import (
    build_segments,
    decode_block_subset,
    decode_term_blocks,
)
from stractt_spark.oracle import build_oracle
from stractt_spark.plans.build import SegmentIndex, StageAborted, build_index
from stractt_spark.sources.corpus import make_corpus

IDX = "/tmp/stractt_test_index"

QUERIES = [
    ("the", "should"),
    ("buffer", "must"),
    ("dtu", "should"),
    ("merge sort", "must"),
    ("read file into buffer", "must"),
    ("read file into buffer", "should"),
    ("scan -merge", "must"),
    ("result", "must"),
    ("zzz_nope", "must"),
]


@pytest.fixture(scope="module")
def built(spark):
    rows = make_corpus(700)
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(rows)], "doc_id long, content string"
    )
    shutil.rmtree(IDX, ignore_errors=True)
    # small segments so the corpus spans several (700 docs / 96 ≈ 8 segments)
    paths = build_index(spark, docs, IDX, docs_per_segment=96)
    oracle = build_oracle([(i, r["content"]) for i, r in enumerate(rows)])
    return SegmentIndex(spark, IDX).cache(), oracle, docs, paths


@pytest.mark.parametrize("query,mode", QUERIES)
def test_wand_rank_identity(built, query, mode):
    index, oracle, _, _ = built
    got = index.search_list(query, k=10, mode=mode)
    expected = oracle.search(query, k=10, mode=mode)
    assert [d for d, _ in got] == [d for d, _ in expected], (query, mode)
    for (d1, s1), (_, s2) in zip(got, expected):
        assert math.isclose(s1, s2, rel_tol=1e-9, abs_tol=1e-12), (query, d1)


def test_block_roundtrip_through_spark(built, spark):
    index, _, _, _ = built
    segs = index.segments.toPandas()
    # pick the heaviest (segment, term) list — must be multi-block
    key = (
        segs.groupby(["segment_id", "term"])["num_docs"].sum().idxmax()
    )
    g = segs[(segs.segment_id == key[0]) & (segs.term == key[1])].sort_values("block_id")
    ids, tfs = decode_term_blocks(g)
    assert list(ids) == sorted(ids)
    assert len(ids) == int(g["num_docs"].sum())
    # subset decode (skip even blocks) re-anchors correctly
    sub = g.iloc[1::2]
    if len(sub):
        sids, stfs = decode_block_subset(sub)
        mask = np.isin(ids, sids)
        assert list(sids) == list(ids[mask])
        assert list(stfs) == list(tfs[mask])


def test_blocks_are_128_docs(built):
    index, _, _, _ = built
    pdf = index.segments.toPandas()
    assert pdf["num_docs"].max() <= 128
    # every non-final block of a list is exactly 128
    last_block = pdf.groupby(["segment_id", "term"])["block_id"].transform("max")
    nonfinal = pdf[pdf.block_id < last_block]
    assert (nonfinal["num_docs"] == 128).all()


def test_lineage_written(built, spark):
    index, _, docs, paths = built
    lin = spark.read.parquet(paths.lineage).toPandas()
    seg_rows = lin[lin.stage == "segments"]
    assert seg_rows["bytes_compressed"].sum() > 0
    # postings accounted in lineage == total postings rows
    total_postings = spark.read.parquet(paths.postings).count()
    assert int(seg_rows["postings"].sum()) == total_postings
    norm_rows = lin[lin.stage == "norms"]
    assert int(norm_rows["docs"].sum()) >= docs.count()


def test_resume_skips_completed_stages(spark, tmp_path):
    rows = make_corpus(120)
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(rows)], "doc_id long, content string"
    )
    out = str(tmp_path / "idx")
    with pytest.raises(StageAborted):
        build_index(spark, docs, out, docs_per_segment=64, fail_after="segments")
    # segments written, norms absent
    assert os.path.isdir(os.path.join(out, "segments.parquet"))
    assert not os.path.isdir(os.path.join(out, "norms.parquet"))
    seg_mtime = os.path.getmtime(os.path.join(out, "segments.parquet"))
    # resume: completes remaining stages without rewriting segments
    build_index(spark, docs, out, docs_per_segment=64)
    assert os.path.getmtime(os.path.join(out, "segments.parquet")) == seg_mtime
    idx = SegmentIndex(spark, out)
    assert len(idx.search_list("buffer", k=5)) > 0


def test_compression_ratio(built, spark):
    """Sanity: delta+varint beats raw 8-byte ids by a wide margin."""
    index, _, _, paths = built
    pdf = index.segments.toPandas()
    raw = int(pdf["num_docs"].sum()) * 8
    packed = int(pdf["id_bytes"].str.len().sum())
    assert packed < raw * 0.35
