#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., ...extras}

Sections:
* index build over the documents table (tokenize → postings, cached)
* headline BM25 queries (reference bench query classes: common term,
  rare/zero term, two-term AND, multi-term OR —
  /root/reference/benches/search-preindexed.rs:34-38)
* index build over the deterministic synthetic code corpus (the
  input_hint shape) → docs/sec throughput figure used for the N vs 4N
  scaling evidence (see BENCH.md / scale_bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES: dict[str, tuple[str, str]] = {
    "q1_common": ("the", "should"),
    "q2_rare": ("dtu", "should"),
    "q3_and": ("merge sort", "must"),
    "q4_multi": ("hash join sort order", "should"),
}


def run(sf_dir: str, cpus: int, corpus_docs: int) -> dict:
    from stractt_spark.operators.postings import build_postings
    from stractt_spark.plans.engine import SearchEngine
    from stractt_spark.session import get_spark
    from stractt_spark.sources.corpus import corpus_spark_df

    spark = get_spark(app_name="stractt-bench", cpus=cpus)
    out: dict = {}
    t_all = time.time()

    # --- index build over the documents table
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    eng = SearchEngine.from_docs(docs, "text", "doc_id", analyzer="ascii", cache=True)
    n_post = eng.postings.count()  # materialize the cache
    t_build = time.time() - t0
    out["docs_build_sec"] = round(t_build, 3)
    out["num_docs"] = eng.num_docs
    out["num_postings"] = n_post

    # --- headline queries (top-10, collected)
    qtimes: dict[str, float] = {}
    for name, (q, mode) in BENCH_QUERIES.items():
        t0 = time.time()
        rows = eng.search(q, k=10, mode=mode).collect()
        qtimes[name] = round(time.time() - t0, 3)
        out.setdefault("query_rows", {})[name] = len(rows)

    # --- synthetic code-corpus build throughput (docs/sec headline).
    # Generation is NOT part of the measured build: the production input is
    # an Iceberg table that already exists — generate once to parquet
    # (cached across runs), then measure read → tokenize → postings.
    cache_path = f"/tmp/stractt_bench_corpus_v2_n{corpus_docs}_s42.parquet"
    if not os.path.isdir(cache_path):
        corpus_spark_df(spark, corpus_docs, partitions=max(cpus, 8)).write.mode(
            "overwrite"
        ).parquet(cache_path)
    from pyspark.sql import functions as F

    t0 = time.time()
    # A few-MB local parquet collapses to 1-2 input splits under the 128 MB
    # split size; repartition so the tokenize stage actually uses the cores
    # (at production scale the table has thousands of natural splits).
    corpus = spark.read.parquet(cache_path).repartition(cpus * 2)
    cp = build_postings(corpus, "content", "doc_id", analyzer="code")
    n_cpost = cp.count()
    t_corpus = time.time() - t0
    out["corpus_docs"] = corpus_docs
    out["corpus_postings"] = n_cpost
    out["corpus_build_sec"] = round(t_corpus, 3)
    out["corpus_docs_per_sec"] = round(corpus_docs / t_corpus, 1)

    total = time.time() - t_all
    spark.stop()

    sf = sf_dir.rstrip("/").split("sf")[-1]
    return {
        "metric": "index-build docs/sec + BM25 top-10 query latency",
        "value": round(total, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        **out,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus_docs = int(os.environ.get("SPARK_GRAFT_CORPUS_DOCS", "20000"))
    result = run(sf_dir, cpus, corpus_docs)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
