"""Streaming near-dup ingest into the persisted dedup index: streamed
batches must equal the batch ingest path (decisions AND index state),
re-invocation must be a no-op, window-(b) re-delivery must adopt the
committed append without double-appending, and later microbatches must
dedup against earlier microbatches' survivors."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from stractt_spark.operators.dedup_index import (
    build_dedup_index,
    check_batch,
    ingest_dedup,
    read_dedup_manifest,
)
from stractt_spark.operators.dedup_index import _write_manifest  # test hook
from stractt_spark.streaming.dedup import (
    read_stream_decisions,
    stream_ingest_dedup,
)

BASE = "/tmp/stractt_dedup_idx_stream_test"
SCHEMA = "doc_id long, text string"

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "completely different content about spark segment posting compression"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
]
FILE1 = [
    (10, "the quick brown fox jumps over the lazy dog near the river pond"),
    (11, "functional reactive streams compose backpressure aware operators"),
]
FILE2 = [
    # near-dup of FILE1's survivor 11 — must be caught ACROSS microbatches
    (20, "functional reactive streams compose backpressure aware operators too"),
    (21, "entirely novel subject matter unrelated to anything indexed before"),
]
THRESH = 0.6


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def streamed(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    idx, idx_b = f"{BASE}/idx", f"{BASE}/idx_batch"
    for d in (idx, idx_b):
        build_dedup_index(
            spark, _df(spark, CORPUS), d, n=1, num_perm=64, bands=32
        )
    inp = f"{BASE}/in"
    os.makedirs(inp)
    import pandas as pd

    pd.DataFrame(FILE1, columns=["doc_id", "text"]).to_parquet(
        f"{inp}/part1.parquet", index=False
    )
    pd.DataFrame(FILE2, columns=["doc_id", "text"]).to_parquet(
        f"{inp}/part2.parquet", index=False
    )
    # FileStreamSource orders by ms-granular mtime and back-to-back
    # writes can tie — pin part2 strictly later so microbatch order
    # (and the cross-microbatch assertions below) is deterministic
    t1 = os.path.getmtime(f"{inp}/part1.parquet")
    os.utime(f"{inp}/part2.parquet", (t1 + 2, t1 + 2))
    stream_ingest_dedup(
        spark, inp, idx, f"{BASE}/ckpt", threshold=THRESH,
        max_files_per_trigger=1,
    )
    # batch twin: the same two batches through ingest_dedup directly
    dec_b1 = ingest_dedup(spark, idx_b, _df(spark, FILE1), threshold=THRESH)
    dec_b2 = ingest_dedup(spark, idx_b, _df(spark, FILE2), threshold=THRESH)
    return idx, idx_b, inp, dec_b1.unionByName(dec_b2)


def _decs(df):
    return sorted(
        (r["doc_id"], r["kept"], r["dup_of"], r["jaccard"])
        for r in df.collect()
    )


def test_streamed_equals_batch_ingest(spark, streamed):
    idx, idx_b, _, batch_dec = streamed
    assert _decs(read_stream_decisions(spark, idx)) == _decs(batch_dec)
    m, mb = read_dedup_manifest(idx), read_dedup_manifest(idx_b)
    assert m["n_docs"] == mb["n_docs"]
    assert m["batches"] == mb["batches"]
    # doc 20 was dropped as a dup of 11 — a doc that only exists because
    # microbatch 1 kept it (cross-microbatch dedup)
    decs = {r["doc_id"]: (r["kept"], r["dup_of"])
            for r in read_stream_decisions(spark, idx).collect()}
    assert decs[20] == (False, 11)
    assert decs[10][0] is False and decs[10][1] == 0
    assert decs[11][0] is True and decs[21][0] is True


def test_reinvoke_without_new_files_is_noop(spark, streamed):
    idx, _, inp, _ = streamed
    before = read_dedup_manifest(idx)
    stream_ingest_dedup(
        spark, inp, idx, f"{BASE}/ckpt", threshold=THRESH,
        max_files_per_trigger=1,
    )
    assert read_dedup_manifest(idx) == before


def test_redelivery_adopts_committed_append(spark, streamed):
    """Window (b): the decisions parquet exists and the append's
    manifest commit landed, but the stream ledger write didn't.
    Re-delivery must adopt the committed batch, not re-run the decision
    (which would self-match every survivor as a dup)."""
    idx, _, _, _ = streamed
    before = read_dedup_manifest(idx)
    # simulate: drop the newest batch's ledger entry, as a crash between
    # the two commits would leave it
    m = read_dedup_manifest(idx)
    victim_key = [k for k, v in m["stream_batches"].items()
                  if v == m["batches"][-1]][0]
    del m["stream_batches"][victim_key]
    _write_manifest(idx, m)
    # re-deliver the same microbatch through a fresh checkpoint whose
    # batch 0 maps to the victim's decision file
    ns_dir = os.path.join(idx, "stream_decisions")
    victim_dec = os.path.join(
        ns_dir, victim_key.replace(":", "_") + ".parquet"
    )
    inp2 = f"{BASE}/in2"
    _df(spark, FILE2).coalesce(1).write.parquet(inp2)
    import hashlib

    ns2 = hashlib.md5(f"{BASE}/ckpt2".encode()).hexdigest()[:8]
    shutil.copytree(victim_dec, os.path.join(ns_dir, f"{ns2}_0.parquet"))
    stream_ingest_dedup(
        spark, inp2, idx, f"{BASE}/ckpt2", threshold=THRESH
    )
    m2 = read_dedup_manifest(idx)
    # no double append, no changed doc count; the committed batch adopted
    assert m2["n_docs"] == before["n_docs"]
    assert m2["batches"] == before["batches"]
    assert m2["stream_batches"][f"{ns2}:0"] == m2["batches"][-1]


def test_all_dup_batch_ledgers_none(spark, streamed):
    """A microbatch whose every doc is a dup appends nothing and
    ledgers None — and a later identical probe still matches the
    ORIGINAL docs, not phantom ones."""
    idx, _, _, _ = streamed
    before = read_dedup_manifest(idx)
    inp3 = f"{BASE}/in3"
    dup_rows = [(30, FILE1[1][1]), (31, FILE2[1][1])]
    _df(spark, dup_rows).coalesce(1).write.parquet(inp3)
    stream_ingest_dedup(spark, inp3, idx, f"{BASE}/ckpt3", threshold=THRESH)
    m = read_dedup_manifest(idx)
    assert m["n_docs"] == before["n_docs"]
    assert m["batches"] == before["batches"]
    import hashlib

    ns3 = hashlib.md5(f"{BASE}/ckpt3".encode()).hexdigest()[:8]
    assert m["stream_batches"][f"{ns3}:0"] is None
    probe = _df(spark, [(40, FILE1[1][1] + " extra")])
    got = check_batch(spark, idx, probe, threshold=THRESH).collect()
    assert len(got) == 1 and got[0]["dup_of"] == 11
