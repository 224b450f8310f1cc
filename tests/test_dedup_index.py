"""Incremental persisted MinHash-LSH dedup index lifecycle."""

import itertools

import pytest

from stractt_spark.functions.tokenizer import tokenize_ascii
from stractt_spark.operators.dedup_index import (
    append_batch,
    build_dedup_index,
    check_batch,
    compact_dedup_index,
    delete_docs,
    ingest_dedup,
    read_dedup_manifest,
)


def _jaccard(a: str, b: str, n: int = 1) -> float:
    ta, tb = tokenize_ascii(a), tokenize_ascii(b)
    sa = {" ".join(ta[i:i + n]) for i in range(len(ta) - n + 1)}
    sb = {" ".join(tb[i:i + n]) for i in range(len(tb) - n + 1)}
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "completely different content about spark segment posting compression"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3, "one two three four five six seven eight nine ten"),
]
BATCH1 = [
    # near-dup of corpus doc 0 (one token changed)
    (10, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    # fresh content
    (11, "functional reactive streams compose backpressure aware operators"),
    # near-dup of 11 WITHIN the batch (lower-id batch match)
    (12, "functional reactive streams compose backpressure aware operators cleanly"),
    # fresh
    (13, "petrichor rises from dry earth after the first summer rain"),
]
BATCH2 = [
    # near-dup of batch-1 doc 13 — must match the APPENDED batch
    (20, "petrichor rises from dry earth after the first summer rain again"),
    (21, "entirely novel subject matter unrelated to anything indexed before"),
]

THRESH = 0.6
N = 1


def _expected_best(doc, others):
    """(dup_of, jaccard) vs an explicit doc set, argmax/tie-min rule."""
    best = None
    for oid, otext in others:
        j = round(_jaccard(doc[1], otext, N), 6)
        if j >= THRESH and (best is None or j > best[1]
                            or (j == best[1] and oid < best[0])):
            best = (oid, j)
    return best


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dedup_idx") / "idx")
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    build_dedup_index(
        spark, docs, d, n=N, num_perm=64, bands=32, analyzer="ascii"
    )
    return d


def test_build_manifest(index_dir):
    m = read_dedup_manifest(index_dir)
    assert m["kind"] == "minhash_lsh_dedup"
    assert m["batches"] == ["batch_0"]
    assert m["n_docs"] == len(CORPUS)
    assert m["params"]["bands"] == 32 and m["params"]["analyzer_fp"]


def test_check_batch_matches_bruteforce(spark, index_dir):
    batch = spark.createDataFrame(BATCH1, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dup_of"], r["jaccard"])
        for r in check_batch(
            spark, index_dir, batch, threshold=THRESH
        ).collect()
    }
    expected = {}
    for doc in BATCH1:
        best = _expected_best(doc, CORPUS)
        if best:
            expected[doc[0]] = best
    assert got == expected
    assert 10 in got and got[10][0] == 0  # the planted near-dup


def test_check_batch_include_intra(spark, index_dir):
    batch = spark.createDataFrame(BATCH1, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dup_of"], r["jaccard"])
        for r in check_batch(
            spark, index_dir, batch, threshold=THRESH, include_intra=True
        ).collect()
    }
    expected = {}
    for i, doc in enumerate(BATCH1):
        pool = CORPUS + [d for d in BATCH1 if d[0] < doc[0]]
        best = _expected_best(doc, pool)
        if best:
            expected[doc[0]] = best
    assert got == expected
    assert got[12][0] == 11  # intra-batch lower-id match


def test_ingest_then_next_batch_sees_appended_docs(spark, tmp_path):
    d = str(tmp_path / "idx2")
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    build_dedup_index(spark, docs, d, n=N, num_perm=64, bands=32)

    b1 = spark.createDataFrame(BATCH1, "doc_id long, text string")
    dec1 = {r["doc_id"]: (r["kept"], r["dup_of"], r["jaccard"])
            for r in ingest_dedup(spark, d, b1, threshold=THRESH).collect()}
    assert set(dec1) == {10, 11, 12, 13}
    assert dec1[10][0] is False and dec1[10][1] == 0
    assert dec1[11] == (True, -1, 0.0)
    assert dec1[12][0] is False and dec1[12][1] == 11
    assert dec1[13] == (True, -1, 0.0)
    m = read_dedup_manifest(d)
    assert m["batches"] == ["batch_0", "batch_1"]
    assert m["n_docs"] == len(CORPUS) + 2  # only survivors appended

    b2 = spark.createDataFrame(BATCH2, "doc_id long, text string")
    dec2 = {r["doc_id"]: (r["kept"], r["dup_of"])
            for r in ingest_dedup(spark, d, b2, threshold=THRESH).collect()}
    # 20 dups the batch-1 SURVIVOR 13 that now lives in the index
    assert dec2[20] == (False, 13)
    assert dec2[21] == (True, -1)
    assert read_dedup_manifest(d)["n_docs"] == len(CORPUS) + 3


def test_dropped_docs_not_appended(spark, tmp_path):
    """A dropped dup must NOT enter the index: re-ingesting fresh
    content similar only to the dropped doc is kept."""
    d = str(tmp_path / "idx3")
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    build_dedup_index(spark, docs, d, n=N, num_perm=64, bands=32)
    b1 = spark.createDataFrame(
        [BATCH1[0]], "doc_id long, text string"
    )  # doc 10, dropped as dup of 0
    ingest_dedup(spark, d, b1, threshold=THRESH)
    # doc 30 = same text as 10; still matches corpus doc 0 (not 10):
    b2 = spark.createDataFrame(
        [(30, BATCH1[0][1])], "doc_id long, text string"
    )
    dec = {r["doc_id"]: (r["kept"], r["dup_of"])
           for r in ingest_dedup(spark, d, b2, threshold=THRESH).collect()}
    assert dec[30][0] is False and dec[30][1] == 0


def test_append_refuses_duplicate_ids(spark, index_dir):
    clash = spark.createDataFrame(
        [(0, "anything at all")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="already exist"):
        append_batch(spark, index_dir, clash)


def test_check_empty_result_and_below_threshold(spark, index_dir):
    batch = spark.createDataFrame(
        [(40, "zzz qqq xxx unique gibberish tokens")],
        "doc_id long, text string",
    )
    assert check_batch(spark, index_dir, batch, threshold=0.9).count() == 0


def test_delete_masks_matches_and_update_flow(spark, tmp_path):
    """delete + re-append is the documented UPDATE flow: tombstoned
    docs stop matching immediately, their ids become re-appendable,
    and the re-appended content serves with its NEW shingles."""
    d = str(tmp_path / "idx4")
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    build_dedup_index(spark, docs, d, n=N, num_perm=64, bands=32)

    probe = spark.createDataFrame(
        [(50, CORPUS[0][1] + " extra")], "doc_id long, text string"
    )
    assert check_batch(spark, d, probe, threshold=THRESH).count() == 1

    assert delete_docs(spark, d, [0]) == 1
    assert read_dedup_manifest(d)["n_docs"] == len(CORPUS) - 1
    # tombstoned doc no longer matches
    assert check_batch(spark, d, probe, threshold=THRESH).count() == 0
    # idempotent re-delete is a no-op
    assert delete_docs(spark, d, [0]) == 0

    # re-append id 0 with CHANGED content (the update): tombstone must
    # clear and the new content must serve
    upd = spark.createDataFrame(
        [(0, "brand new replacement text for the updated document zero")],
        "doc_id long, text string",
    )
    append_batch(spark, d, upd)
    m = read_dedup_manifest(d)
    assert m["n_docs"] == len(CORPUS)
    probe2 = spark.createDataFrame(
        [(51, "brand new replacement text for the updated document zero ok")],
        "doc_id long, text string",
    )
    got = check_batch(spark, d, probe2, threshold=THRESH).collect()
    assert len(got) == 1 and got[0]["dup_of"] == 0
    # the OLD content of 0 stays dead
    assert check_batch(spark, d, probe, threshold=THRESH).count() == 0


def test_compact_reclaims_tombstones(spark, tmp_path):
    d = str(tmp_path / "idx5")
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    build_dedup_index(spark, docs, d, n=N, num_perm=64, bands=32)
    b1 = spark.createDataFrame(
        [BATCH1[1], BATCH1[3]], "doc_id long, text string"
    )
    append_batch(spark, d, b1)
    delete_docs(spark, d, [2, 11])
    before = {
        r["doc_id"]: (r["dup_of"], r["jaccard"])
        for r in check_batch(
            spark,
            d,
            spark.createDataFrame(BATCH2, "doc_id long, text string"),
            threshold=0.3,
        ).collect()
    }
    m = compact_dedup_index(spark, d)
    assert m["batches"] == ["batch_c0"] and m["n_docs"] == len(CORPUS)
    import os

    assert not os.path.exists(os.path.join(d, "tombstones.parquet"))
    after = {
        r["doc_id"]: (r["dup_of"], r["jaccard"])
        for r in check_batch(
            spark,
            d,
            spark.createDataFrame(BATCH2, "doc_id long, text string"),
            threshold=0.3,
        ).collect()
    }
    assert before == after  # compaction is behavior-invariant


def test_merge_equals_fresh_build(spark, tmp_path):
    """Merging two half-corpus indexes (one carrying a tombstone) must
    behave identically to a fresh build over the union of live docs."""
    from stractt_spark.operators.dedup_index import merge_dedup_indexes

    d1, d2 = str(tmp_path / "m1"), str(tmp_path / "m2")
    dm, df = str(tmp_path / "merged"), str(tmp_path / "fresh")
    half1, half2 = CORPUS[:2], CORPUS[2:]
    build_dedup_index(
        spark, spark.createDataFrame(half1 + [(99, "doomed text row")],
                                     "doc_id long, text string"),
        d1, n=N, num_perm=64, bands=32,
    )
    delete_docs(spark, d1, [99])
    build_dedup_index(
        spark, spark.createDataFrame(half2, "doc_id long, text string"),
        d2, n=N, num_perm=64, bands=32,
    )
    m = merge_dedup_indexes(spark, [d1, d2], dm)
    assert m["n_docs"] == len(CORPUS)
    build_dedup_index(
        spark, spark.createDataFrame(CORPUS, "doc_id long, text string"),
        df, n=N, num_perm=64, bands=32,
    )
    probe = spark.createDataFrame(BATCH1, "doc_id long, text string")
    got_m = _decs(check_batch(spark, dm, probe, threshold=0.3))
    got_f = _decs(check_batch(spark, df, probe, threshold=0.3))
    assert got_m == got_f
    # the tombstoned doc did not survive the merge
    assert check_batch(
        spark, dm,
        spark.createDataFrame([(100, "doomed text row indeed")],
                              "doc_id long, text string"),
        threshold=0.6,
    ).count() == 0


def test_merge_refuses_param_mismatch_and_id_collision(spark, tmp_path):
    from stractt_spark.operators.dedup_index import merge_dedup_indexes

    d1, d2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    build_dedup_index(spark, docs, d1, n=N, num_perm=64, bands=32)
    build_dedup_index(spark, docs, d2, n=N, num_perm=64, bands=16)
    with pytest.raises(ValueError, match="bands to different buckets"):
        merge_dedup_indexes(spark, [d1, d2], str(tmp_path / "out1"))
    d3 = str(tmp_path / "p3")
    build_dedup_index(spark, docs, d3, n=N, num_perm=64, bands=32)
    with pytest.raises(ValueError, match="more than one source"):
        merge_dedup_indexes(spark, [d1, d3], str(tmp_path / "out2"))


def _decs(df):
    return sorted(
        (r["doc_id"], r["dup_of"], r["jaccard"]) for r in df.collect()
    )


def test_max_bucket_size_guard_runs(spark, index_dir):
    batch = spark.createDataFrame(BATCH1, "doc_id long, text string")
    out = check_batch(
        spark, index_dir, batch, threshold=THRESH, max_bucket_size=100
    ).collect()
    assert {r["doc_id"] for r in out} >= {10}


# ---------------------------------------------------- property testing


def test_check_batch_equals_bruteforce_randomized(spark, tmp_path):
    """Property: over randomized small corpora/batches, check_batch's
    best-match table equals the brute-force all-pairs computation —
    banding recall (32×2), hash-set verification, and the
    argmax-tie-min rule all at once.  Deterministic seeds (no
    hypothesis engine: one Spark index build per example is too slow
    for shrinking; fixed examples keep the suite stable)."""
    import random

    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa", "lam", "mu"]
    for seed in (7, 23):
        rng = random.Random(seed)

        def doc():
            k = rng.randint(4, 9)
            return " ".join(rng.choice(vocab) for _ in range(k))

        corpus = [(i, doc()) for i in range(12)]
        # make some batch docs near-dups of corpus docs
        batch = []
        for j in range(6):
            if j % 2 == 0:
                src = rng.choice(corpus)[1]
                batch.append((100 + j, src + " " + rng.choice(vocab)))
            else:
                batch.append((100 + j, doc()))
        d = str(tmp_path / f"prop{seed}")
        build_dedup_index(
            spark,
            spark.createDataFrame(corpus, "doc_id long, text string"),
            d, n=N, num_perm=64, bands=32,
        )
        thresh = 0.5
        got = {
            r["doc_id"]: (r["dup_of"], r["jaccard"])
            for r in check_batch(
                spark, d,
                spark.createDataFrame(batch, "doc_id long, text string"),
                threshold=thresh,
            ).collect()
        }
        expected = {}
        for bid, btext in batch:
            best = None
            for cid, ctext in corpus:
                j = round(_jaccard(btext, ctext, N), 6)
                if j >= thresh and (
                    best is None or j > best[1]
                    or (j == best[1] and cid < best[0])
                ):
                    best = (cid, j)
            if best:
                expected[bid] = best
        assert got == expected, f"seed {seed}: {got} != {expected}"
