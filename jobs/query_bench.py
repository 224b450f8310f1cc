#!/usr/bin/env python
"""Query latency + pruning at LARGE corpus scale (1.2M docs).

The per-round bench.py measures queries over sf0.1 (5k docs) and a 50k
synthetic corpus — both latency-floor-dominated (Spark job launch ≈
0.45 s).  This job opens an index ALREADY BUILT by scale_bench.py
(default: the local[4] run's output, 1.2M docs) and measures the four
reference query classes at a size where the kernels, not the fixed
overhead, set the time; it also reports the measured block-pruning
fraction per query and, with ``--presorted``, builds the presorted
variant and measures the production pre+bm25 ranking shape.

Usage::

    python jobs/query_bench.py [--index /tmp/stractt_scale_idx_4]
        [--cpus 32] [--trials 3] [--presorted]

Emits one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = {
    "q_common": ("return", "should"),
    "q_rare": ("dtu", "should"),
    "q_and": ("merge sort", "must"),
    "q_multi": ("hash join scan filter", "should"),
    "q_or_rare": ("return dtu", "should"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default="/tmp/stractt_scale_idx_4")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--presorted", action="store_true")
    ap.add_argument("--multifield", action="store_true",
                    help="also build the 1.2M multi-field index (path + "
                         "content namespaces) and measure MF search / "
                         "count / batch latencies — the reference's "
                         "default query shape at scale")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from stractt_spark.plans.build import SegmentIndex, build_index_fused
    from stractt_spark.session import get_spark

    spark = get_spark(app_name="stractt-query-bench", cpus=args.cpus)
    # prewarm the python worker pool (per-executor constant, excluded)
    spark.range(0, args.cpus * 4, 1, args.cpus * 2).mapInPandas(
        lambda it: it, "id long"
    ).count()

    idx = SegmentIndex(spark, args.index).cache()
    out: dict = {
        "job": "query_bench",
        "num_docs": idx.stats["num_docs"],
        "docs_per_segment": idx.stats["docs_per_segment"],
        "cpus": args.cpus,
        "queries": {},
        "pruning": {},
    }
    for name, (q, mode) in QUERIES.items():
        times = []
        nrows = 0
        for _ in range(args.trials):
            t0 = time.time()
            nrows = len(idx.search(q, k=10, mode=mode).collect())
            times.append(time.time() - t0)
        out["queries"][name] = round(min(times), 3)
        out.setdefault("query_rows", {})[name] = nrows
        _, m = idx.search_with_metrics(q, k=10, mode=mode)
        out["pruning"][name] = {
            "blocks_decoded": m["blocks_decoded"],
            "blocks_total": m["blocks_total"],
            "decoded_frac": round(
                m["blocks_decoded"] / m["blocks_total"], 4
            ) if m["blocks_total"] else None,
        }

    # batched execution: the same 5 queries in ONE pass (search_batch)
    # vs sequential jobs — the amortization evidence in BENCH.md
    batch = [(n, q, m) for n, (q, m) in QUERIES.items()]
    seq_times, bat_times = [], []
    for _ in range(max(args.trials - 1, 1)):
        t0 = time.time()
        for _, q, m in batch:
            idx.search(q, k=10, mode=m).collect()
        seq_times.append(time.time() - t0)
        t0 = time.time()
        idx.search_batch(batch, k=10).collect()
        bat_times.append(time.time() - t0)
    out["batch_sequential_sec"] = round(min(seq_times), 3)
    out["batch_one_pass_sec"] = round(min(bat_times), 3)
    out["batch_speedup"] = round(min(seq_times) / min(bat_times), 2)

    if args.presorted:
        pdir = args.index.rstrip("/") + "_pre"
        if not os.path.isfile(os.path.join(pdir, "stats.json")):
            # the presorted variant is built from the SAME deterministic
            # synthetic corpus (generation is pure in (seed, row index))
            from stractt_spark.sources.corpus import corpus_spark_df

            n = idx.stats["num_docs"]
            corpus = corpus_spark_df(spark, n, partitions=64)
            pre = corpus.select(
                "doc_id",
                (F.lit(2048.0)
                 * ((F.col("doc_id") * F.lit(2654435761)) % 1000)
                 / F.lit(1000.0)).alias("pre_score"),
            )
            t0 = time.time()
            build_index_fused(
                spark, corpus, pdir, text_col="content", id_col="doc_id",
                analyzer=idx.stats["analyzer"],
                docs_per_segment=idx.stats["docs_per_segment"],
                pre_scores=pre,
            )
            out["presorted_build_sec"] = round(time.time() - t0, 3)
        pidx = SegmentIndex(spark, pdir).cache()
        times = []
        for _ in range(args.trials):
            t0 = time.time()
            pidx.search("hash join", k=10, mode="should",
                        with_pre_score=True).collect()
            times.append(time.time() - t0)
        out["queries"]["q_pre_or"] = round(min(times), 3)
        _, m = pidx.search_with_metrics("hash join", k=10, mode="should",
                                        with_pre_score=True)
        out["pruning"]["q_pre_or"] = {
            "blocks_decoded": m["blocks_decoded"],
            "blocks_total": m["blocks_total"],
            "decoded_frac": round(
                m["blocks_decoded"] / m["blocks_total"], 4
            ) if m["blocks_total"] else None,
        }
        times = []
        for _ in range(args.trials):
            t0 = time.time()
            pidx.search("hash join", k=10, mode="should",
                        with_pre_score=True,
                        max_docs_per_segment=1024).collect()
            times.append(time.time() - t0)
        out["queries"]["q_pre_or_quota"] = round(min(times), 3)

    if args.multifield:
        from stractt_spark.operators.multifield import (
            MultiFieldSegmentIndex,
            build_index_fused_multifield,
        )
        from stractt_spark.sources.corpus import corpus_spark_df

        mdir = args.index.rstrip("/") + "_mf"
        if not os.path.isfile(os.path.join(mdir, "stats.json")):
            n = idx.stats["num_docs"]
            corpus = corpus_spark_df(spark, n, partitions=64)
            t0 = time.time()
            build_index_fused_multifield(
                spark, corpus, mdir, {"path": "path", "content": "content"},
                analyzer=idx.stats["analyzer"],
                docs_per_segment=idx.stats["docs_per_segment"],
            )
            out["mf_build_sec"] = round(time.time() - t0, 3)
        midx = MultiFieldSegmentIndex(spark, mdir).cache()
        mf_queries = {
            "qmf_and": ("merge sort", "must"),
            "qmf_or": ("hash join", "should"),
            "qmf_common": ("return", "should"),
        }
        for name, (q, mode) in mf_queries.items():
            times = []
            for _ in range(args.trials):
                t0 = time.time()
                midx.search(q, k=10, mode=mode).collect()
                times.append(time.time() - t0)
            out["queries"][name] = round(min(times), 3)
        times = []
        for _ in range(args.trials):
            t0 = time.time()
            midx.search_with_count("merge sort", k=10, mode="must")
            times.append(time.time() - t0)
        out["queries"]["qmf_count"] = round(min(times), 3)
        mbatch = [(n_, q, m) for n_, (q, m) in mf_queries.items()]
        seq_times, bat_times = [], []
        for _ in range(max(args.trials - 1, 1)):
            t0 = time.time()
            for _, q, m in mbatch:
                midx.search(q, k=10, mode=m).collect()
            seq_times.append(time.time() - t0)
            t0 = time.time()
            midx.search_batch(mbatch, k=10).collect()
            bat_times.append(time.time() - t0)
        out["mf_batch_sequential_sec"] = round(min(seq_times), 3)
        out["mf_batch_one_pass_sec"] = round(min(bat_times), 3)
        out["mf_batch_speedup"] = round(min(seq_times) / min(bat_times), 2)

        # the COMPOSED production shape at scale: presorted + multifield
        # (index-wide pre-score order + per-field postings), pre+bm25
        # ranking with the per-field kernel's measured pruning
        mpdir = args.index.rstrip("/") + "_mf_pre"
        if not os.path.isfile(os.path.join(mpdir, "stats.json")):
            n = idx.stats["num_docs"]
            corpus = corpus_spark_df(spark, n, partitions=64)
            pre = corpus.select(
                "doc_id",
                (F.lit(2048.0)
                 * ((F.col("doc_id") * F.lit(2654435761)) % 1000)
                 / F.lit(1000.0)).alias("pre_score"),
            )
            t0 = time.time()
            build_index_fused_multifield(
                spark, corpus, mpdir,
                {"path": "path", "content": "content"},
                analyzer=idx.stats["analyzer"],
                docs_per_segment=idx.stats["docs_per_segment"],
                pre_scores=pre,
            )
            out["mf_pre_build_sec"] = round(time.time() - t0, 3)
        mpidx = MultiFieldSegmentIndex(spark, mpdir).cache()
        times = []
        for _ in range(args.trials):
            t0 = time.time()
            mpidx.search("hash join", k=10, mode="should",
                         with_pre_score=True).collect()
            times.append(time.time() - t0)
        out["queries"]["qmf_pre_or"] = round(min(times), 3)
        _, m2 = mpidx.search(
            "hash join", k=10, mode="should", with_pre_score=True,
            with_metrics=True,
        )
        out["pruning"]["qmf_pre_or"] = {
            "blocks_decoded": m2["blocks_decoded"],
            "blocks_total": m2["blocks_total"],
            "decoded_frac": round(
                m2["blocks_decoded"] / m2["blocks_total"], 4
            ) if m2["blocks_total"] else None,
        }
        times = []
        for _ in range(args.trials):
            t0 = time.time()
            mpidx.search("hash join", k=10, mode="should",
                         with_pre_score=True,
                         max_docs_per_segment=1024).collect()
            times.append(time.time() - t0)
        out["queries"]["qmf_pre_or_quota"] = round(min(times), 3)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
