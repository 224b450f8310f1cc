"""Naive Bayes classifier + deterministic shard assignment.

Cross-engine value identity for both is covered by the entry-contract
sweep (nb_lang_predict / shard_assign vs DuckDB); these tests pin the
semantic properties: NB learns real signal, handles empty/OOV docs, the
argmax tie rule is deterministic; shards are balanced hash-buckets with
contiguous positions and salt-keyed permutations.
"""

import math

import pytest
from pyspark.sql import functions as F

from stractt_spark.operators.classifier import (
    nb_predict,
    nb_scores,
    nb_train,
)
from stractt_spark.operators.sampling import shard_assign

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_nb_beats_majority_baseline(docs):
    model = nb_train(docs, "text", "lang")
    preds = nb_predict(docs, "text", "doc_id", model)
    joined = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    ).join(preds, "doc_id")
    n = joined.count()
    correct = joined.where("lang = pred").count()
    majority = (
        docs.groupBy("lang").count().orderBy(F.desc("count"))
        .first()["count"]
    )
    # self-prediction accuracy must clear the predict-the-mode baseline
    assert correct / n > majority / n
    assert n == docs.count()


def test_nb_empty_doc_gets_prior_argmax(spark):
    train = spark.createDataFrame(
        [(0, "aa bb", "x"), (1, "aa bb", "x"), (2, "cc dd", "y")],
        "doc_id long, text string, lang string",
    )
    model = nb_train(train, "text", "lang")
    test = spark.createDataFrame(
        [(10, "")], "doc_id long, text string"
    )
    row = nb_predict(test, "text", "doc_id", model).collect()[0]
    # empty doc: score = log_prior only → majority class "x"
    assert row["pred"] == "x"
    assert math.isclose(row["score"], round(math.log(2 / 3), 6))


def test_nb_oov_tokens_use_unseen_slot(spark):
    train = spark.createDataFrame(
        [(0, "aa aa aa", "x"), (1, "bb", "y")],
        "doc_id long, text string, lang string",
    )
    model = nb_train(train, "text", "lang")
    # vocab = {aa, bb} + 1 unseen slot = 3
    assert model.vocab == 3
    test = spark.createDataFrame(
        [(10, "zz zz")], "doc_id long, text string"
    )
    scores = {
        r["label"]: r["score"]
        for r in nb_scores(test, "text", "doc_id", model).collect()
    }
    # zz unseen in both classes: score_c = ln(prior) + 2·ln(α/(N_c+αV))
    exp_x = math.log(0.5) + 2 * math.log(1.0 / (3 + 3))
    exp_y = math.log(0.5) + 2 * math.log(1.0 / (1 + 3))
    assert math.isclose(scores["x"], round(exp_x, 6), abs_tol=2e-6)
    assert math.isclose(scores["y"], round(exp_y, 6), abs_tol=2e-6)


def test_nb_tie_breaks_to_greatest_label(spark):
    train = spark.createDataFrame(
        [(0, "aa", "x"), (1, "aa", "y")],
        "doc_id long, text string, lang string",
    )
    model = nb_train(train, "text", "lang")
    test = spark.createDataFrame([(9, "aa")], "doc_id long, text string")
    # perfectly symmetric classes → identical scores → max label wins
    assert nb_predict(test, "text", "doc_id", model).collect()[0][
        "pred"
    ] == "y"


def test_shard_assign_properties(docs):
    n_shards = 8
    out = shard_assign(docs, "doc_id", n_shards).cache()
    n = out.count()
    assert n == docs.count()
    stats = (
        out.groupBy("shard")
        .agg(
            F.count("*").alias("c"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.countDistinct("pos").alias("d"),
        )
        .collect()
    )
    assert 0 < len(stats) <= n_shards
    for r in stats:
        # positions are exactly 0..c-1 within each shard
        assert (r["lo"], r["hi"], r["d"]) == (0, r["c"] - 1, r["c"])
    # deterministic: a second run is row-identical
    again = shard_assign(docs, "doc_id", n_shards)
    assert out.exceptAll(again).count() == 0
    # a different salt is a different permutation (same shard sizes
    # modulo hashing, but positions move)
    moved = shard_assign(docs, "doc_id", n_shards, salt="epoch-2")
    assert out.exceptAll(moved).count() > 0
    out.unpersist()
