"""Structured-Streaming incremental ingest: appended segments must be
query-equivalent to a batch build over the same docs."""

import shutil

import pytest

from stractt_spark.oracle import build_oracle
from stractt_spark.plans.build import SegmentIndex, build_index_fused
from stractt_spark.sources.corpus import make_corpus

BASE = "/tmp/stractt_stream_test"


@pytest.fixture(scope="module")
def streamed(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    rows = make_corpus(500)
    dps = 96

    def df_of(chunk):
        return spark.createDataFrame(
            [(r["repo"], r["path"], r["commit"], r["content"]) for r in chunk],
            "repo string, path string, commit string, content string",
        )

    # initial batch index over the first 300 docs (ids = rank by key)
    from stractt_spark.operators.postings import assign_doc_ids

    initial = assign_doc_ids(df_of(rows[:300]), ["repo", "path", "commit"])
    idx_dir = f"{BASE}/index"
    build_index_fused(spark, initial, idx_dir, docs_per_segment=dps)

    # stream two more files, one micro-batch each
    from stractt_spark.streaming.ingest import stream_ingest

    in_dir = f"{BASE}/incoming"
    schema = "repo string, path string, commit string, content string"
    id_maps = []  # (chunk_rows, base) in ingestion order
    import json
    import os

    os.makedirs(in_dir, exist_ok=True)
    for fi, chunk in enumerate([rows[300:400], rows[400:500]]):
        df_of(chunk).coalesce(1).write.mode("append").parquet(in_dir)
        with open(f"{idx_dir}/stats.json") as f:
            hwm = json.load(f).get("next_doc_id", 300)
        base = ((hwm + dps - 1) // dps) * dps
        stream_ingest(
            spark, in_dir, idx_dir, schema,
            checkpoint_dir=f"{BASE}/ckpt", available_now=True,
        )
        id_maps.append((chunk, base))

    # oracle with the same deterministic id layout
    oracle = build_oracle([])
    key = lambda r: (r["repo"], r["path"], r["commit"])
    for i, r in enumerate(sorted(rows[:300], key=key)):
        oracle.add(i, r["content"])
    for chunk, base in id_maps:
        for i, r in enumerate(sorted(chunk, key=key)):
            oracle.add(base + i, r["content"])
    return SegmentIndex(spark, idx_dir).cache(), oracle


def test_stream_stats(streamed):
    index, oracle = streamed
    assert index.stats["num_docs"] == 500 == oracle.num_docs
    assert index.stats["total_tokens"] == oracle.total_tokens
    assert abs(index.stats["avgdl"] - oracle.avgdl) < 1e-9


@pytest.mark.parametrize(
    "query,mode",
    [("the", "should"), ("merge sort", "must"), ("buffer -scan", "must"),
     ("dtu", "should")],
)
def test_stream_rank_identity(streamed, query, mode):
    index, oracle = streamed
    got = index.search_list(query, k=10, mode=mode)
    expected = oracle.search(query, k=10, mode=mode)
    assert [d for d, _ in got] == [d for d, _ in expected], (query, mode)


def test_orphan_batch_dir_invisible_until_ledgered(streamed, spark):
    """Crash between batch-dir write and ledger commit: the orphan dir is
    invisible to readers; the retried append overwrites it and commits."""
    import json

    from stractt_spark.streaming.ingest import append_batch, batch_dir

    index, oracle = streamed
    root = index.paths.root
    extra = make_corpus(520)[500:520]
    df = spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["content"]) for r in extra],
        "repo string, path string, commit string, content string",
    )
    # simulate the crash: run a full append, then roll back ONLY the
    # ledger/stats commit (as if os.replace never happened)
    with open(f"{root}/stats.json") as f:
        before = json.load(f)
    append_batch(spark, df, 999, root)
    with open(f"{root}/stats.json") as f:
        after = json.load(f)
    assert 999 in after["stream_batches"]
    with open(f"{root}/stats.json", "w") as f:
        json.dump(before, f)  # roll back the commit; batch dir survives
    import os

    assert os.path.isdir(batch_dir(root, 999))  # orphan exists...
    fresh = SegmentIndex(spark, root)
    assert fresh.stats["num_docs"] == before["num_docs"]  # ...but invisible
    # retry is clean: overwrites the orphan, commits once
    append_batch(spark, df, 999, root)
    with open(f"{root}/stats.json") as f:
        final = json.load(f)
    assert final["stream_batches"].count(999) == 1
    assert final["num_docs"] == before["num_docs"] + 20
    idx2 = SegmentIndex(spark, root)
    assert len(idx2.search_list("buffer", k=5)) > 0


def test_stream_idempotent_batch(streamed, spark):
    """Re-delivering an already-ledgered batch id is a no-op."""
    index, _ = streamed
    import json

    from stractt_spark.streaming.ingest import append_batch

    with open(index.paths.stats) as f:
        before = json.load(f)
    dummy = spark.createDataFrame(
        [("r", "p", "c", "text")],
        "repo string, path string, commit string, content string",
    )
    append_batch(spark, dummy, before["stream_batches"][0], index.paths.root)
    with open(index.paths.stats) as f:
        after = json.load(f)
    assert after["num_docs"] == before["num_docs"]
