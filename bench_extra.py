#!/usr/bin/env python
"""Supplementary measurements for the optimization rounds (NOT the driver
contract — that is bench.py, frozen).  Everything here recomputes from the
parquet inputs; nothing is persisted across invocations.

Sections (each prints one labelled JSON line):

* ``builds``   — per-stage wall times of the same five index builds
  bench.py performs, read from the build manifests (guide §1: know where
  the time goes before touching anything).
* ``pruning_extras`` — decoded/total block counts for proximity-ladder and
  goggle-const queries on a presorted corpus index: the r5 verdict's
  perf_weak shape, now pruned (wand.py envelope extension).  bench.py's
  own pruning section cannot show this (its query set predates the fix and
  is frozen).
* ``ops_noop`` — wall time of representative LLM-pipeline operators over
  the sf documents table, isolated with the noop sink (guide §1.4) so the
  numbers time computation, not output writes, plus the Exchange count of
  each plan.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... python bench_extra.py
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def _exchanges(df) -> int:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # count Exchange nodes in the tree section only (details repeat names)
    tree = plan.split("\n\n")[0]
    return tree.count("Exchange")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from stractt_spark.plans.build import SegmentIndex, build_index_fused
    from stractt_spark.session import get_spark

    spark = get_spark(app_name="stractt-bench-extra", cpus=cpus)
    spark.range(0, cpus * 4, 1, cpus * 2).mapInPandas(
        lambda it: it, "id long"
    ).count()
    sc = spark.sparkContext

    # --- builds: stage-level wall times --------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cpus * 2)
    out: dict = {}
    idx_dir = "/tmp/stractt_bx_idx"
    shutil.rmtree(idx_dir, ignore_errors=True)
    sc.setJobDescription("bench_extra: fused build (docs table)")
    build_index_fused(spark, docs, idx_dir, text_col="text", id_col="doc_id",
                      analyzer="ascii", docs_per_segment=1024)
    with open(f"{idx_dir}/_manifest.json") as f:
        m = json.load(f)
    out["docs_build_stages"] = {
        s: e.get("elapsed_sec") for s, e in m["stages"].items()
    }
    print(json.dumps({"section": "builds", **out}))

    # --- pruning under ladder / const clauses --------------------------
    # presorted positions index over the documents table; ladder + goggle
    # queries pruned by the extended envelope (wand.py extras)
    from stractt_spark.functions.query_parse import parse_query
    from stractt_spark.operators.segments import attr_term
    from stractt_spark.operators.wand import wand_topk

    # the synthetic code corpus at the bench's own scale/segment shape
    # (50k docs, 16384-doc segments): block skipping needs many 128-doc
    # blocks per posting list, which the tiny documents table cannot give
    from stractt_spark.sources.corpus import corpus_spark_df

    corpus_docs = int(os.environ.get("SPARK_GRAFT_CORPUS_DOCS", "50000"))
    cache_path = (
        f"/tmp/stractt_bench_corpus_v2_n{corpus_docs}_s42_al1024.parquet"
    )
    if not os.path.isdir(cache_path):
        corpus_spark_df(
            spark, corpus_docs, partitions=max(cpus * 2, 16), align=1024
        ).write.mode("overwrite").parquet(cache_path)
    corpus = spark.read.parquet(cache_path)
    pdir = "/tmp/stractt_bx_pidx"
    shutil.rmtree(pdir, ignore_errors=True)
    pre = corpus.select(
        "doc_id",
        (F.lit(2048.0) * ((F.col("doc_id") * F.lit(2654435761)) % 1000)
         / F.lit(1000.0)).alias("pre_score"),
    )
    sc.setJobDescription("bench_extra: presorted positions corpus build")
    build_index_fused(
        spark, corpus, pdir, text_col="content", id_col="doc_id",
        analyzer="code", docs_per_segment=16384,
        positions=True, attr_cols=["lang"], pre_scores=pre,
    )
    pidx = SegmentIndex(spark, pdir).cache()

    def metrics_of(query, mode, **kw):
        pq = parse_query(query, pidx.analyzer)
        tdf = pidx.term_df(pq.all_match_terms)
        sc.setJobDescription(f"bench_extra: pruning {query!r} {kw.keys()}")
        t0 = time.time()
        top, m = wand_topk(
            pidx.segments, pidx.norms, pq, pidx.stats["num_docs"],
            pidx.stats["avgdl"], tdf, k=10, mode=mode,
            analyzer=pidx.analyzer, with_metrics=True, add_pre=True, **kw,
        )
        frac = (
            round(m["blocks_decoded"] / m["blocks_total"], 4)
            if m["blocks_total"] else None
        )
        return {
            "rows": len(top), "sec": round(time.time() - t0, 3),
            "blocks_decoded": m["blocks_decoded"],
            "blocks_total": m["blocks_total"], "decoded_frac": frac,
        }

    ladder = ((2.0, 0), (1.0, 2), (0.5, 32))

    def boost_clause(bonus):
        return [{"action": "boost", "bonus": bonus,
                 "site_term": attr_term("lang", "python")}]

    pruning = {
        "ladder_must": metrics_of("merge sort", "must", ladder=ladder),
        "ladder_should_baseline_exhaustive": metrics_of(
            "merge sort", "should", ladder=ladder
        ),
        # skip depth degrades smoothly with the bonus size: the envelope
        # must assume every unseen doc could carry the full bonus, so a
        # bonus comparable to the pre spread forces near-full decode
        # (honest), while a typical small boost keeps most of the skip
        "goggle_boost_small_should": metrics_of(
            "merge sort", "should", const_clauses=boost_clause(0.05 * 2048.0)
        ),
        "goggle_boost_large_should": metrics_of(
            "merge sort", "should", const_clauses=boost_clause(0.4 * 2048.0)
        ),
        "goggle_discard_should_exhaustive": metrics_of(
            "merge sort", "should",
            const_clauses=[{"action": "discard", "bonus": 0.0,
                            "site_term": attr_term("lang", "python")}],
        ),
        "plain_should_reference": metrics_of("merge sort", "should"),
    }
    print(json.dumps({"section": "pruning_extras", "pruning": pruning}))

    # --- representative pipeline operators, noop-sink isolated ----------
    from stractt_spark.operators.dedup import (
        duplicated_ngram_stats, minhash_dedup_pairs,
    )
    from stractt_spark.operators.textstats import gopher_repetition, quality_score

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ops = {}

    sc.setJobDescription("bench_extra: quality_score noop")
    q = quality_score(d, "text", "doc_id")
    ops["quality_score"] = {"sec": _noop(q), "exchanges": _exchanges(q)}

    sc.setJobDescription("bench_extra: gopher_repetition noop")
    g = gopher_repetition(d, "text", "doc_id")
    ops["gopher_repetition"] = {"sec": _noop(g), "exchanges": _exchanges(g)}

    sc.setJobDescription("bench_extra: minhash dedup pairs noop")
    pairs = minhash_dedup_pairs(d, "text", "doc_id")
    ops["minhash_dedup_pairs"] = {"sec": _noop(pairs), "exchanges": _exchanges(pairs)}

    sc.setJobDescription("bench_extra: duplicated_ngram_stats noop")
    cov = duplicated_ngram_stats(d, "text", "doc_id", n=8)
    ops["dup_ngram_stats"] = {"sec": _noop(cov), "exchanges": _exchanges(cov)}

    print(json.dumps({"section": "ops_noop", "sf_dir": sf_dir, "ops": ops}))
    spark.stop()


if __name__ == "__main__":
    main()
