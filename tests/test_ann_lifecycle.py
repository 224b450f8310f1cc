"""ANN index lifecycle (VERDICT r3 #4): appends under a frozen
quantizer, ledgered batch dirs, merge with flavor guards, drift guard +
retrain — mirroring the text index's streaming/merge discipline."""

import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from stractt_spark.operators.similarity import (
    ann_bucketed_topk,
    ann_ivf_topk,
    append_ivf,
    append_sign_index,
    build_ivf_index,
    build_sign_index,
    build_sign_index_persisted,
    cosine_topk,
    ivf_needs_retrain,
    merge_sign_indexes,
    open_sign_index,
    read_ann_manifest,
    retrain_ivf,
)

BASE = "/tmp/stractt_ann_lifecycle_test"
DIM = 16
N = 500


@pytest.fixture(scope="module")
def vecs(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=DIM)]) for i in range(N)]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _sorted_rows(df):
    return sorted(
        (r["cell"], r["vec_id"], tuple(r["e"])) for r in df.collect()
    )


# ----------------------------------------------------------------- IVF


def test_ivf_append_equals_frozen_assignment_pass(spark, vecs):
    """Incremental index rows == a one-shot assignment pass over the
    union under the SAME centroids (appends never shift the quantizer)."""
    rows, df = vecs
    inc = f"{BASE}/ivf_inc"
    build_ivf_index(spark, df.filter(F.col("vec_id") < 300), inc, n_cells=8)
    append_ivf(spark, inc, df.filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)))
    append_ivf(spark, inc, df.filter(F.col("vec_id") >= 400))
    m = read_ann_manifest(inc)
    assert m["append_batches"] == [1, 2]
    assert m["num_vecs"] == N

    from stractt_spark.operators.similarity import _read_ivf_cells

    got = _sorted_rows(_read_ivf_cells(spark, inc))
    # independent reference: assign EVERY vector to the stored centroids
    # with plain numpy on the driver
    cent_rows = spark.read.parquet(f"{inc}/centroids.parquet").collect()
    cent = np.array(
        [r["centroid"] for r in sorted(cent_rows, key=lambda r: r["cell"])]
    )
    want = sorted(
        (
            int(((np.array(e) - cent) ** 2).sum(axis=1).argmin()),
            i,
            tuple(float(x) for x in np.asarray(e, dtype=np.float32)
                  .astype(np.float64)),
        )
        for i, e in rows
    )
    assert got == want


def test_ivf_appended_vectors_are_queryable_exact(spark, vecs):
    rows, df = vecs
    inc = f"{BASE}/ivf_inc"  # built above
    for probe_id in (5, 350, 450):
        q = rows[probe_id][1]
        got = [(r["vec_id"], r["cos"]) for r in
               ann_ivf_topk(spark, inc, q, k=5, nprobe=8).collect()]
        want = [(r["vec_id"], r["cos"]) for r in
                cosine_topk(df, q, k=5).collect()]
        assert got == want, probe_id


def test_ivf_drift_guard(spark, vecs):
    rows, df = vecs
    inc = f"{BASE}/ivf_drift"
    build_ivf_index(spark, df.filter(F.col("vec_id") < 400), inc, n_cells=8)
    v = ivf_needs_retrain(spark, inc)
    assert not v["retrain"] and v["appended"] == 0
    # growth trigger: append more than growth_factor × base
    append_ivf(spark, inc, df.filter(F.col("vec_id") >= 400))
    v = ivf_needs_retrain(spark, inc, growth_factor=0.2)
    assert v["retrain"] and v["appended"] == 100
    # dispersion trigger: append vectors from a SHIFTED distribution
    rng = np.random.default_rng(99)
    far = spark.createDataFrame(
        [(10_000 + i, [float(x) for x in rng.normal(loc=25.0, size=DIM)])
         for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    append_ivf(spark, inc, far)
    v = ivf_needs_retrain(spark, inc, growth_factor=10.0,
                          dispersion_factor=2.0)
    assert v["dispersion_ratio"] > 2.0 and v["retrain"]


def test_ivf_retrain_equals_fresh_build(spark, vecs):
    """retrain over (base ∪ appends) == build_ivf_index over the same
    vectors — same deterministic training recipe, bit-identical cells
    and centroids."""
    rows, df = vecs
    inc = f"{BASE}/ivf_inc"
    out = f"{BASE}/ivf_retrained"
    retrain_ivf(spark, inc, out)
    fresh = f"{BASE}/ivf_fresh"
    build_ivf_index(spark, df, fresh, n_cells=8)

    from stractt_spark.operators.similarity import _read_ivf_cells

    assert _sorted_rows(_read_ivf_cells(spark, out)) == _sorted_rows(
        _read_ivf_cells(spark, fresh)
    )
    c1 = sorted((r["cell"], tuple(r["centroid"])) for r in
                spark.read.parquet(f"{out}/centroids.parquet").collect())
    c2 = sorted((r["cell"], tuple(r["centroid"])) for r in
                spark.read.parquet(f"{fresh}/centroids.parquet").collect())
    assert c1 == c2


def test_ivf_append_refuses_wrong_kind(spark, vecs):
    rows, df = vecs
    d = f"{BASE}/sign_for_kind"
    build_sign_index_persisted(spark, df.limit(50), d)
    with pytest.raises(ValueError, match="not an IVF index"):
        append_ivf(spark, d, df.limit(10))


# ------------------------------------------------------------ sign LSH


def test_sign_append_row_identical_to_fresh(spark, vecs):
    """Hyperplanes are seed-derived (frozen by construction): the
    incremental signature table == fresh build over the union, row for
    row."""
    rows, df = vecs
    inc = f"{BASE}/sign_inc"
    build_sign_index_persisted(
        spark, df.filter(F.col("vec_id") < 300), inc
    )
    append_sign_index(spark, inc, df.filter(F.col("vec_id") >= 300))
    got = sorted(
        (r["table_id"], r["bucket"], r["vec_id"])
        for r in open_sign_index(spark, inc).collect()
    )
    want = sorted(
        (r["table_id"], r["bucket"], r["vec_id"])
        for r in build_sign_index(df).collect()
    )
    assert got == want
    assert read_ann_manifest(inc)["num_vecs"] == N


def test_sign_appended_queryable(spark, vecs):
    rows, df = vecs
    inc = f"{BASE}/sign_inc"
    q = rows[420][1]
    got = [(r["vec_id"], r["cos"]) for r in ann_bucketed_topk(
        df, open_sign_index(spark, inc), q, k=1, radius=0,
    ).collect()]
    assert got and got[0][0] == 420 and got[0][1] == 1.0


def test_sign_merge_and_flavor_guard(spark, vecs):
    rows, df = vecs
    a, b = f"{BASE}/sign_a", f"{BASE}/sign_b"
    build_sign_index_persisted(spark, df.filter(F.col("vec_id") < 250), a)
    build_sign_index_persisted(spark, df.filter(F.col("vec_id") >= 250), b)
    out = f"{BASE}/sign_merged"
    merge_sign_indexes(spark, [a, b], out)
    got = sorted(
        (r["table_id"], r["bucket"], r["vec_id"])
        for r in open_sign_index(spark, out).collect()
    )
    want = sorted(
        (r["table_id"], r["bucket"], r["vec_id"])
        for r in build_sign_index(df).collect()
    )
    assert got == want
    # mismatched seed → refuse loudly
    c = f"{BASE}/sign_c"
    build_sign_index_persisted(
        spark, df.filter(F.col("vec_id") < 50), c, seed=99
    )
    with pytest.raises(ValueError, match="seed"):
        merge_sign_indexes(spark, [a, c], f"{BASE}/sign_bad")


# ------------------------------------------------------ vector deletes


def test_ivf_delete_masks_and_retrain_reclaims(spark, vecs):
    from stractt_spark.operators.similarity import (
        _read_ivf_cells,
        delete_vectors,
        mask_deleted,
    )

    rows, df = vecs
    d = f"{BASE}/ivf_del"
    build_ivf_index(spark, df, d, n_cells=8)
    # the true nearest neighbor of vec 7's query is itself — delete it
    q = rows[7][1]
    top0 = ann_ivf_topk(spark, d, q, k=3, nprobe=8).collect()
    assert top0[0]["vec_id"] == 7
    # unknown + duplicate ids are skipped
    assert delete_vectors(spark, d, [7, 7, 999999]) == 1
    assert delete_vectors(spark, d, [7]) == 0
    top1 = ann_ivf_topk(spark, d, q, k=3, nprobe=8).collect()
    assert all(r["vec_id"] != 7 for r in top1)
    # the runner-up moved up and is still exact
    want = [(r["vec_id"], r["cos"]) for r in cosine_topk(
        df.filter(F.col("vec_id") != 7), q, k=3).collect()]
    assert [(r["vec_id"], r["cos"]) for r in top1] == want
    # retrain reclaims: rebuilt index physically drops the vector
    out = f"{BASE}/ivf_del_retrained"
    retrain_ivf(spark, d, out)
    assert _read_ivf_cells(spark, out).filter(
        F.col("vec_id") == 7).count() == 0
    assert read_ann_manifest(d)["deleted_vecs"] == 1


def test_sign_delete_masks_and_merge_reclaims(spark, vecs):
    from stractt_spark.operators.similarity import delete_vectors

    rows, df = vecs
    d = f"{BASE}/sign_del"
    build_sign_index_persisted(spark, df, d)
    assert delete_vectors(spark, d, [42]) == 1
    sig = open_sign_index(spark, d)
    assert sig.filter(F.col("vec_id") == 42).count() == 0
    # probing can no longer return the deleted vector (wider radius so
    # OTHER vectors' buckets are probed — i.i.d. vectors rarely share
    # the exact bucket)
    got = ann_bucketed_topk(df, sig, rows[42][1], k=5, radius=2).collect()
    assert got and all(r["vec_id"] != 42 for r in got)
    # a single-source merge compacts the tombstone away
    out = f"{BASE}/sign_del_merged"
    merge_sign_indexes(spark, [d], out)
    assert not __import__("os").path.isdir(f"{out}/tombstones.parquet")
    assert spark.read.parquet(f"{out}/sign.parquet").filter(
        F.col("vec_id") == 42).count() == 0


# ------------------------------------------- update = delete + append


def test_ivf_update_delete_then_reappend(spark, vecs):
    """ADVICE r4: the documented ``update = delete + append`` flow must
    actually work — re-appending a tombstoned id is accepted, the NEW
    row serves, and the stale pre-delete row stays masked (batch-scoped
    tombstones)."""
    from stractt_spark.operators.similarity import (
        delete_vectors,
        mask_deleted,
        _read_ivf_cells,
    )

    rows, df = vecs
    d = f"{BASE}/ivf_upd"
    build_ivf_index(spark, df, d, n_cells=8)
    q = rows[7][1]
    assert ann_ivf_topk(spark, d, q, k=1, nprobe=8).collect()[0][
        "vec_id"] == 7
    assert delete_vectors(spark, d, [7]) == 1
    # update: re-append id 7 with a DIFFERENT vector (vec 9's direction,
    # slightly scaled so it stays distinguishable from vec 9 itself)
    new_vec = [1.001 * x for x in rows[9][1]]
    append_ivf(spark, d, spark.createDataFrame(
        [(7, new_vec)], "vec_id long, embedding array<float>"))
    # exactly ONE live row for id 7, and it is the new vector
    live = mask_deleted(
        spark, d, _read_ivf_cells(spark, d, with_batch=True)
    ).filter(F.col("vec_id") == 7).collect()
    assert len(live) == 1
    assert np.allclose(list(live[0]["e"]), new_vec, atol=1e-6)
    # a query in the new direction now finds the updated 7 near the top
    got = ann_ivf_topk(spark, d, rows[9][1], k=3, nprobe=8).collect()
    assert {r["vec_id"] for r in got[:2]} == {7, 9}
    # and a query in the OLD direction no longer returns it first
    assert ann_ivf_topk(spark, d, q, k=1, nprobe=8).collect()[0][
        "vec_id"] != 7
    # delete-again of the re-appended id masks the NEW row too
    assert delete_vectors(spark, d, [7]) == 1
    assert mask_deleted(
        spark, d, _read_ivf_cells(spark, d, with_batch=True)
    ).filter(F.col("vec_id") == 7).count() == 0
    assert read_ann_manifest(d)["deleted_vecs"] == 2


def test_sign_update_delete_then_reappend(spark, vecs):
    from stractt_spark.operators.similarity import delete_vectors

    rows, df = vecs
    d = f"{BASE}/sign_upd"
    build_sign_index_persisted(spark, df, d)
    assert delete_vectors(spark, d, [42]) == 1
    new_vec = [1.001 * x for x in rows[10][1]]
    upd = spark.createDataFrame(
        [(42, new_vec)], "vec_id long, embedding array<float>")
    append_sign_index(spark, d, upd)
    sig = open_sign_index(spark, d)
    m = read_ann_manifest(d)
    # one live signature row per table for id 42 — the updated ones
    assert sig.filter(F.col("vec_id") == 42).count() == m["n_tables"]
    corpus = df.filter(F.col("vec_id") != 42).unionByName(upd)
    got = ann_bucketed_topk(corpus, sig, rows[10][1], k=2, radius=1).collect()
    assert {r["vec_id"] for r in got} == {10, 42}
