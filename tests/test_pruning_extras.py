"""Block-max pruning stays ENABLED and sound under the additive
post-retrieval passes (proximity ladder rungs, positive goggle const
bonuses) — the r5 verdict's perf_weak item.

Reference for each case = the same wand_topk call with
``score_coeff=1.0``: a coeff forces the exhaustive (full-decode) path,
and multiplying by 1.0 is bit-exact, so the reference scores carry the
identical fp association.  Equality is asserted on exact (doc_id, score)
lists; the pruning win is asserted on the decoded/total sentinels.
"""

import shutil

import pytest

from stractt_spark.functions.query_parse import parse_query
from stractt_spark.operators.segments import attr_term
from stractt_spark.operators.wand import wand_topk
from stractt_spark.plans.build import SegmentIndex, build_index_fused
from stractt_spark.sources.corpus import make_corpus

DIR_PRE = "/tmp/stractt_prune_extras_pre"
DIR_FLAT = "/tmp/stractt_prune_extras_flat"


def _build(spark, out_dir, presorted):
    from pyspark.sql import functions as F

    # block-max skip needs MANY 128-doc blocks per driving-term posting
    # list (the bench's 16384-doc-segment lesson): one 8192-doc segment
    # gives the rarest query term ~10-25 blocks = several 8-block chunks,
    # enough for the banked threshold to beat later chunks' pre envelope
    rows = make_corpus(8000)
    docs = spark.createDataFrame(
        [(i, r["content"], r["repo"]) for i, r in enumerate(rows)],
        "doc_id long, content string, repo string",
    )
    pre = None
    if presorted:
        pre = docs.select(
            "doc_id",
            (F.lit(2048.0) * ((F.col("doc_id") * F.lit(2654435761))
             % 1000) / F.lit(1000.0)).alias("pre_score"),
        )
    shutil.rmtree(out_dir, ignore_errors=True)
    build_index_fused(
        spark, docs, out_dir, docs_per_segment=8192, positions=True,
        attr_cols=["repo"], pre_scores=pre,
    )
    return SegmentIndex(spark, out_dir).cache()


@pytest.fixture(scope="module")
def pre_idx(spark):
    return _build(spark, DIR_PRE, presorted=True)


@pytest.fixture(scope="module")
def flat_idx(spark):
    return _build(spark, DIR_FLAT, presorted=False)


def _run(idx, query, mode, **kw):
    pq = parse_query(query, idx.analyzer)
    tdf = idx.term_df(pq.all_match_terms)
    return wand_topk(
        idx.segments, idx.norms, pq, idx.stats["num_docs"],
        idx.stats["avgdl"], tdf, k=10, mode=mode,
        analyzer=idx.analyzer, with_metrics=True, **kw,
    )


LADDER = ((2.0, 0), (1.0, 2), (0.5, 32))


def test_ladder_should_flat_exact(flat_idx):
    # On a doc-id-ordered index over a uniform corpus the ladder envelope
    # (Σ boost·ladder_w ≈ Σ boost·Σ qweights) dwarfs the flat bm25 spread,
    # so no block clears the skip bar — the win needs a presorted index
    # (pre spread ≫ envelope; tests below).  The routing through the
    # block-max union must still be EXACT.
    top, m = _run(flat_idx, "merge sort", "should", ladder=LADDER)
    ref, mref = _run(
        flat_idx, "merge sort", "should", ladder=LADDER, score_coeff=1.0
    )
    assert top == ref
    assert mref["blocks_decoded"] == mref["blocks_total"]  # exhaustive ref
    assert m["blocks_decoded"] <= m["blocks_total"]


def test_ladder_must_presorted_pruned_and_exact(pre_idx):
    top, m = _run(
        pre_idx, "merge sort", "must", ladder=LADDER, add_pre=True
    )
    ref, _ = _run(
        pre_idx, "merge sort", "must", ladder=LADDER, add_pre=True,
        score_coeff=1.0,
    )
    assert top == ref
    assert 0 < m["blocks_decoded"] < m["blocks_total"], m


def test_const_boost_should_presorted_pruned_and_exact(pre_idx):
    # bonus < pre spread, else the envelope (pre_max + ub + bonus) can
    # never drop below the banked threshold and nothing is skippable
    clause = {
        "action": "boost",
        "bonus": 0.4 * 2048.0,
        "site_term": attr_term("repo", "org1/repo1"),
    }
    top, m = _run(
        pre_idx, "merge sort", "should", const_clauses=[clause],
        add_pre=True,
    )
    ref, _ = _run(
        pre_idx, "merge sort", "should", const_clauses=[clause],
        add_pre=True, score_coeff=1.0,
    )
    assert top == ref
    assert 0 < m["blocks_decoded"] < m["blocks_total"], m
    # the bonus must actually fire for some top doc (the repo exists)
    assert any(s > 2060.0 for _, s in top)


def test_const_discard_keeps_exhaustive_path(pre_idx):
    # a discard clause can REMOVE banked docs — pruning must stay off
    clause = {
        "action": "discard",
        "bonus": 0.0,
        "site_term": attr_term("repo", "org1/repo1"),
    }
    top, m = _run(
        pre_idx, "merge sort", "should", const_clauses=[clause],
        add_pre=True,
    )
    ref, _ = _run(
        pre_idx, "merge sort", "should", const_clauses=[clause],
        add_pre=True, score_coeff=1.0,
    )
    assert top == ref
    assert m["blocks_decoded"] == m["blocks_total"]
