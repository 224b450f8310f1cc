"""Multinomial Naive Bayes text classifier — train + predict on Spark.

The quality/domain classifier slot of a training-data pipeline (the
CCNet / GPT-3-style "does this doc look like the target corpus" filter):
a supervised model TRAINED distributed, then APPLIED map-side.  Naive
Bayes is chosen deliberately over SGD-family models: every model
parameter is a pure function of exact integer counts, so training is
one shuffle, bit-reproducible across runs, engines and cluster sizes —
the same determinism contract the rest of the pipeline ops carry
(cf. operators/sampling.py).

Model (add-α smoothing, Laplace over the training vocab + one explicit
unseen slot, mirroring dsir_weights' convention):

    score(d, c) = ln P̂(c) + Σ_tok c_d(tok) · ln( (n_{c,tok} + α)
                                                / (N_c + α·V) )

    P̂(c)  = docs_c / docs_total
    n_{c,tok} = token count of tok inside class c's training docs
    N_c   = total tokens in class c
    V     = |vocab(train)| + 1

Tokens unseen in class c (including tokens unseen in ANY class at
predict time) fall into the α/(N_c + α·V) slot — the formula needs no
OOV special case.

Prediction is argmax_c over scores ROUNDED to 6 decimals, ties broken
toward the lexicographically GREATEST label (max over (score, label)
structs — the same deterministic argmax rule the BPE trainer uses), so
the winner is engine-independent despite float-sum ordering noise.

100-TB shape: training = one tokenize pass + one (label, tok) groupBy
(map-side partial agg absorbs hot tokens); the model is vocab×classes
bounded — small enough to broadcast.  Scoring = one broadcast join
keyed by token + one per-(doc, class) sum; the docs×classes frame is a
broadcast cross join against a |classes|-row table.  No driver-side
per-doc state; only |classes|+2 scalars ever reach the driver.

Reference scope: the reference ranks with hand-set signal coefficients
(src/ranking/signal.rs) — a TRAINED corpus-level classifier is a
training-data-pipeline extension, not reference parity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizer import SQL_TOKEN_PATTERN


def _occ(docs: DataFrame, text_col: str, *keys) -> DataFrame:
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{SQL_TOKEN_PATTERN}', 0)"
    )
    return docs.select(*keys, F.explode(toks).alias("tok"))


@dataclass(frozen=True)
class NBModel:
    """A trained multinomial-NB model.

    ``classes``: (label, log_prior, log_unseen) — ``log_unseen`` is the
    per-token score ln(α / (N_c + α·V)) a token absent from class c
    contributes.  ``tok_scores``: (label, tok, dlog) with ``dlog =
    ln(n_{c,tok} + α) − ln(α)`` — the EXTRA score a class-c-seen token
    earns over the unseen slot, so scoring never materializes the full
    vocab×classes grid.  Both tables are bounded by vocab size, not
    corpus size.
    """

    classes: DataFrame
    tok_scores: DataFrame
    alpha: float
    vocab: int


def nb_train(
    docs: DataFrame,
    text_col: str,
    label_col: str,
    alpha: float = 1.0,
) -> NBModel:
    """Train multinomial NB: one tokenize pass, one (label, tok)
    groupBy, |classes|+1 scalar aggregates on the driver."""
    lab = F.col(label_col).cast("string").alias("label")
    a = float(alpha)
    cls_counts = (
        docs.groupBy(lab).agg(F.count("*").cast("long").alias("n_docs"))
    )
    tok_counts = (
        _occ(docs, text_col, lab)
        .groupBy("label", "tok")
        .agg(F.count("*").cast("long").alias("n"))
    )
    vocab = int(tok_counts.select("tok").distinct().count()) + 1
    n_total = cls_counts.agg(F.sum("n_docs")).collect()[0][0]
    class_tokens = tok_counts.groupBy("label").agg(
        F.sum("n").cast("long").alias("n_class_toks")
    )
    classes = (
        cls_counts.join(class_tokens, "label", "left")
        .select(
            "label",
            F.log(F.col("n_docs") / F.lit(float(n_total))).alias(
                "log_prior"
            ),
            F.log(
                F.lit(a)
                / (
                    F.coalesce("n_class_toks", F.lit(0)).cast("double")
                    + F.lit(a * vocab)
                )
            ).alias("log_unseen"),
        )
    )
    tok_scores = tok_counts.select(
        "label",
        "tok",
        (F.log(F.col("n") + F.lit(a)) - F.lit(_ln(a))).alias("dlog"),
    )
    return NBModel(classes=classes, tok_scores=tok_scores,
                   alpha=a, vocab=vocab)


def _ln(x: float) -> float:
    import math

    return math.log(x)


def nb_predict(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    model: NBModel,
) -> DataFrame:
    """→ (doc_id, pred, score): argmax-class per doc under ``model``.

    ``score`` is the winning class's log-joint rounded to 6 decimals
    (the rounding under which the argmax is taken).  One broadcast
    token join + one (doc, label) sum + one per-doc struct-max — docs
    with no tokens get the prior-only argmax.
    """
    best = nb_scores(docs, text_col, id_col, model).groupBy("doc_id").agg(
        F.max(F.struct("score", "label")).alias("b")
    )
    return best.select(
        "doc_id",
        F.col("b.label").alias("pred"),
        F.col("b.score").alias("score"),
    )


def nb_scores(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    model: NBModel,
) -> DataFrame:
    """→ (doc_id, label, score): the full per-class log-joint matrix
    (rounded 6) — the auditable form behind :func:`nb_predict`."""
    occ = (
        _occ(docs, text_col, F.col(id_col).cast("long").alias("doc_id"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("c_doc"))
    )
    doclen = occ.groupBy("doc_id").agg(
        F.sum("c_doc").cast("long").alias("n_tok")
    )
    seen = (
        occ.join(F.broadcast(model.tok_scores), "tok")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.col("c_doc") * F.col("dlog")).alias("s_seen"))
    )
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(doclen, "doc_id", "left")
        .na.fill({"n_tok": 0})
        .crossJoin(F.broadcast(model.classes))
        .join(seen, ["doc_id", "label"], "left")
        .select(
            "doc_id",
            "label",
            F.round(
                F.col("log_prior")
                + F.col("n_tok") * F.col("log_unseen")
                + F.coalesce("s_seen", F.lit(0.0)),
                6,
            ).alias("score"),
        )
    )
