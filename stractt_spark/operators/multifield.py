"""Multi-field indexing + boosted per-field BM25.

The reference indexes ~16 text fields and lowers every query term to
``Must(BooleanQuery(Should over every searchable field))`` with static
per-field boosts (title 10, body 4, url 1, …) — src/query/parser.rs:54-91,
boosts src/schema.rs:294-315.  Each field has its own document frequency,
fieldnorms and avgdl, so the per-field BM25 components differ; the doc's
score for a term is the SUM over matching fields of
``boost_f · bm25_f(term)``, and a Must term is satisfied by a match in
ANY field.

Spark shape: one postings table with a ``field`` column — per-(field,term)
rows carry that field's tf and that field's byte-quantized norm — and the
score is a union of per-(term,field) unit frames folded in canonical
(term, field) order.  For the code corpus the default fields mirror
title/body: ``path`` (boost 10) and ``content`` (boost 4).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.bm25 import B, K1, weight
from ..functions.query_parse import parse_query
from .score import decoded_dl

# reference-shaped defaults: path ≈ title (10), content ≈ body (4)
DEFAULT_FIELD_BOOSTS: dict[str, float] = {"path": 10.0, "content": 4.0}

MF_POSTINGS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("field", StringType(), False),
        StructField("term", StringType(), False),
        StructField("tf", IntegerType(), False),
        StructField("dl", IntegerType(), False),
        StructField("norm_id", IntegerType(), False),
    ]
)


def build_postings_multifield(
    docs: DataFrame,
    field_cols: dict[str, str],
    id_col: str = "doc_id",
    analyzer: str = "ascii",
) -> DataFrame:
    """docs → (doc_id, field, term, tf, dl, norm_id) in one Arrow pass;
    dl/norm are PER FIELD (each field has its own fieldnorm, like the
    reference's per-field norm readers)."""
    from ..functions.fieldnorm import fieldnorm_to_id
    from ..functions.tokenizer import get_analyzer

    tokenize = get_analyzer(analyzer)
    fields = sorted(field_cols)
    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        *[F.col(field_cols[f_]).alias(f"_f_{f_}") for f_ in fields],
    )

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        from collections import Counter

        for pdf in batches:
            doc_ids, fs, terms, tfs, dls = [], [], [], [], []
            cols = [pdf[f"_f_{f_}"].values for f_ in fields]
            for ri, doc_id in enumerate(pdf["doc_id"].values):
                for fi, f_ in enumerate(fields):
                    text = cols[fi][ri] or ""
                    toks = tokenize(text)
                    tf = Counter(toks)
                    doc_ids.extend([doc_id] * len(tf))
                    fs.extend([f_] * len(tf))
                    terms.extend(tf.keys())
                    tfs.extend(tf.values())
                    dls.extend([len(toks)] * len(tf))
            dl_arr = np.asarray(dls, dtype=np.int64)
            norm_ids = fieldnorm_to_id(dl_arr) if len(dls) else dl_arr
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "field": pd.Series(fs, dtype="object"),
                    "term": pd.Series(terms, dtype="object"),
                    "tf": pd.Series(tfs, dtype="int32"),
                    "dl": pd.Series(dl_arr, dtype="int32"),
                    "norm_id": pd.Series(norm_ids, dtype="int32"),
                }
            )

    return src.mapInPandas(emit, MF_POSTINGS_SCHEMA)


def multifield_stats(docs: DataFrame, postings: DataFrame) -> dict:
    """num_docs + per-field exact avgdl (each field averages over ALL docs,
    like the reference's per-field total_tokens/total_docs)."""
    n_docs = docs.count()
    rows = (
        postings.select("doc_id", "field", "dl")
        .groupBy("doc_id", "field")
        .agg(F.first("dl").alias("dl"))
        .groupBy("field")
        .agg(F.sum("dl").alias("total"))
        .collect()
    )
    return {
        "num_docs": n_docs,
        "avgdl": {r["field"]: (r["total"] / n_docs if n_docs else 0.0) for r in rows},
    }


def bm25_topk_multifield(
    postings: DataFrame,
    query: str,
    num_docs: int,
    avgdl_by_field: dict[str, float],
    field_boosts: dict[str, float] | None = None,
    k: int = 10,
    mode: str = "must",
    analyzer: str = "ascii",
) -> DataFrame:
    """→ (doc_id, score) top-k; score = Σ_{term,field matched}
    boost_f · bm25_f(term); Must = every term matched in ≥1 field."""
    boosts = field_boosts or DEFAULT_FIELD_BOOSTS
    pq = parse_query(query, analyzer)
    uniq = pq.uniq_terms
    spark = postings.sparkSession
    if not uniq:
        return spark.createDataFrame([], "doc_id long, score double")
    counts = pq.term_counts
    fields = sorted(boosts)

    matched = postings.filter(
        F.col("term").isin(uniq) & F.col("field").isin(fields)
    )
    dfs = {
        (r["term"], r["field"]): r["c"]
        for r in matched.groupBy("term", "field").agg(F.count("*").alias("c")).collect()
    }
    if mode == "must" and any(
        all(dfs.get((t, f_), 0) == 0 for f_ in fields) for t in uniq
    ):
        return spark.createDataFrame([], "doc_id long, score double")

    # per-(term, field) unit weights: counts·boost·(idf_f·(k1+1));
    # association boost·weight then w·(tf/(tf+norm)) — canonical everywhere
    frames = []
    for f_ in fields:
        terms_f = [t for t in uniq if dfs.get((t, f_), 0) > 0]
        if not terms_f:
            continue
        wmap = F.create_map(
            *[
                x
                for t in terms_f
                for x in (
                    F.lit(t),
                    F.lit(
                        counts[t] * boosts[f_] * weight(dfs[(t, f_)], num_docs)
                    ),
                )
            ]
        )
        tf = F.col("tf").cast("double")
        norm = F.lit(K1) * (
            F.lit(1.0 - B)
            + F.lit(B) * decoded_dl(F.col("norm_id")) / F.lit(float(avgdl_by_field[f_]))
        )
        frames.append(
            matched.filter((F.col("field") == f_) & F.col("term").isin(terms_f)).select(
                "doc_id",
                F.col("term").alias("_t"),
                F.lit(f_).alias("_f"),
                (wmap[F.col("term")] * (tf / (tf + norm))).alias("_s"),
            )
        )
    units = frames[0]
    for fr in frames[1:]:
        units = units.unionByName(fr)

    scored = units.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("_t", "_f", "_s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_s"],
        ).alias("score"),
        F.size(F.array_distinct(F.collect_list("_t"))).alias("_nterms"),
    )
    if mode == "must":
        scored = scored.filter(F.col("_nterms") == F.lit(len(uniq)))
    scored = scored.drop("_nterms")

    if pq.neg_terms:
        neg_docs = (
            postings.filter(F.col("term").isin(list(set(pq.neg_terms))))
            .select("doc_id")
            .distinct()
        )
        scored = scored.join(neg_docs, "doc_id", "left_anti")
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


class MultiFieldOracle:
    """Pure-Python yardstick with identical fp association order."""

    def __init__(self, field_boosts: dict[str, float] | None = None,
                 analyzer: str = "ascii") -> None:
        from ..oracle import OracleIndex

        self.boosts = field_boosts or DEFAULT_FIELD_BOOSTS
        self.analyzer = analyzer
        self.fields = {f_: OracleIndex(analyzer=analyzer) for f_ in self.boosts}
        self.num_docs = 0

    def add(self, doc_id: int, field_values: dict[str, str]) -> None:
        self.num_docs += 1
        for f_, idx in self.fields.items():
            idx.add(doc_id, field_values.get(f_, ""))

    def search(self, query: str, k: int = 10, mode: str = "must"):
        from ..functions.bm25 import tf_component

        pq = parse_query(query, self.analyzer)
        uniq = pq.uniq_terms
        if not uniq:
            return []
        counts = pq.term_counts
        fields = sorted(self.boosts)
        # candidates: per term the union over fields; then AND/OR over terms
        term_docs = {
            t: set().union(*(set(self.fields[f_].postings.get(t, {})) for f_ in fields))
            for t in uniq
        }
        if mode == "must":
            if any(not s for s in term_docs.values()):
                return []
            cand = set.intersection(*term_docs.values())
        else:
            cand = set.union(*term_docs.values())
        for t in set(pq.neg_terms):
            for f_ in fields:
                cand -= set(self.fields[f_].postings.get(t, {}))
        if not cand:
            return []
        scores = {d: 0.0 for d in cand}
        for t in sorted(uniq):
            for f_ in fields:
                fidx = self.fields[f_]
                plist = fidx.postings.get(t, {})
                if not plist:
                    continue
                wt = counts[t] * self.boosts[f_] * weight(len(plist), self.num_docs)
                avgdl = fidx.avgdl
                for d in cand:
                    tf = plist.get(d)
                    if tf is not None:
                        scores[d] += wt * float(
                            tf_component(tf, fidx.doc_dl[d], avgdl)
                        )
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]