"""Exhaustive BM25 top-k as a pure DataFrame program (no UDF at query time).

This is the "minimum end-to-end slice" path (SURVEY.md §7 step 2) and the
always-correct fallback the WAND path is tested against.  The whole score
is one Catalyst expression:

* ``weight = (K1+1) · ln(1 + (N − df + 0.5)/(df + 0.5))`` — constants fold,
  mirroring the reference's precomputed weight (bm25.rs:109-117);
* the byte-quantized ``dl`` is recovered JVM-side with ``element_at`` on a
  256-element literal array (the fieldnorm table) — no Python in the loop;
* AND / NOT semantics are the join algebra the reference's boolean tree
  lowers to (SURVEY.md §2.4): Must = per-doc matched-term count equals the
  distinct query-term count, MustNot = left-anti join;
* the final ``orderBy(desc(score), doc_id).limit(k)`` compiles to
  ``TakeOrderedAndProject`` — Spark's built-in partial+final bounded top-k,
  exactly the per-segment-heap → merge_fruits shape of the reference
  collector (src/collector.rs:105-211).

Scale notes: the term filter is pushed to the parquet scan (PushedFilters:
``In(term, ...)``); df_t is computed from the already-filtered postings
(each (term,doc) row appears once, so ``count`` *is* the document
frequency) and broadcast.  Nothing shuffles the full postings table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.bm25 import B, K1
from ..functions.fieldnorm import FIELD_NORMS_TABLE
from ..functions.query_parse import ParsedQuery, parse_query

def _norm_table_col() -> F.Column:
    # 256-entry fieldnorm decode table as a literal array column (folded by
    # Catalyst; element_at is 1-based). Built lazily — Column construction
    # needs an active SparkContext.
    return F.array(*[F.lit(int(v)) for v in FIELD_NORMS_TABLE])


def decoded_dl(norm_id_col) -> F.Column:
    return F.element_at(_norm_table_col(), norm_id_col + F.lit(1)).cast("double")


def bm25_score_col(tf_col, dl_col, avgdl: float, df_col, num_docs: int) -> F.Column:
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(num_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )
    tf = tf_col.cast("double")
    norm = F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl_col / F.lit(float(avgdl)))
    return F.lit(K1 + 1.0) * idf * tf / (tf + norm)


def bm25_topk(
    postings: DataFrame,
    query: str | ParsedQuery,
    num_docs: int,
    avgdl: float,
    k: int = 10,
    mode: str = "must",
    analyzer: str = "ascii",
) -> DataFrame:
    """→ DataFrame (doc_id, score) of the top-k, score desc / doc_id asc."""
    pq = parse_query(query, analyzer) if isinstance(query, str) else query
    uniq = pq.uniq_terms
    spark = postings.sparkSession
    if not uniq:
        return spark.createDataFrame([], "doc_id long, score double")

    matched = postings.filter(F.col("term").isin(uniq)).select(
        "doc_id", "term", "tf", "norm_id"
    )
    # document frequency per query term — tiny agg over filtered postings
    df_t = matched.groupBy("term").agg(F.count("*").alias("df_t"))
    # per-term multiplicity in the query (duplicated terms score repeatedly)
    counts = pq.term_counts
    qcount = F.create_map(
        *[x for t in uniq for x in (F.lit(t), F.lit(float(counts[t])))]
    )
    scored = (
        matched.join(F.broadcast(df_t), "term")
        .withColumn(
            "_s",
            qcount[F.col("term")]
            * bm25_score_col(
                F.col("tf"),
                decoded_dl(F.col("norm_id")),
                avgdl,
                F.col("df_t").cast("double"),
                num_docs,
            ),
        )
        .groupBy("doc_id")
        # Deterministic fp summation: fold per-term contributions in term
        # order (array_sort on the struct sorts by term first).  A plain
        # sum() adds in partition arrival order, which flips last-ulp ties
        # between runs — rank-identity requires a canonical order, and the
        # oracle sums in the same one.  ≤ #query-terms elements per doc.
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "_s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_s"],
            ).alias("score"),
            F.count("*").alias("_nmatch"),
        )
    )
    if mode == "must":
        scored = scored.filter(F.col("_nmatch") == F.lit(len(uniq)))
    scored = scored.drop("_nmatch")

    if pq.neg_terms:
        neg_docs = (
            postings.filter(F.col("term").isin(list(set(pq.neg_terms))))
            .select("doc_id")
            .distinct()
        )
        scored = scored.join(neg_docs, "doc_id", "left_anti")

    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
