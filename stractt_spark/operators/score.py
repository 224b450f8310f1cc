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
    phrase: bool = False,
) -> DataFrame:
    """→ DataFrame (doc_id, score) of the top-k, score desc / doc_id asc.

    Query units are single terms and (with ``phrase=True`` parsing or an
    explicit ParsedQuery) phrase groups.  Phrase matching is pure JVM:
    ``tf_phrase = size(array_intersect(pos₀, shift(pos₁,−1), …))`` — the
    intersection of shifted position arrays IS the set of phrase start
    positions; scored as BM25 with tf = phrase count and weight = Σ
    member idf (reference PhraseQuery semantics, query/parser.rs:228-236,
    bm25.rs:66-90).  Requires postings built with include_positions."""
    pq = (
        parse_query(query, analyzer, phrase=phrase)
        if isinstance(query, str)
        else query
    )
    uniq = pq.uniq_terms
    spark = postings.sparkSession
    match_terms = pq.all_match_terms
    if not match_terms:
        return spark.createDataFrame([], "doc_id long, score double")

    matched = postings.filter(F.col("term").isin(match_terms))
    # global document frequency per involved term (tiny: ≤ #terms rows)
    dfs = {
        r["term"]: r["c"]
        for r in matched.groupBy("term").agg(F.count("*").alias("c")).collect()
    }
    from ..functions.bm25 import idf as idf_fn

    if mode == "must" and (
        any(dfs.get(t, 0) == 0 for t in uniq)
        or any(dfs.get(t, 0) == 0 for ph in pq.phrases for t in ph)
    ):
        return spark.createDataFrame([], "doc_id long, score double")

    counts = pq.term_counts
    unit_frames = []
    n_units = 0
    from ..functions.bm25 import weight as weight_fn

    if uniq:
        # weight literal per term (constant-folded), count-folded like the
        # reference's duplicated-term scoring.  Association order is
        # counts·(idf·(k1+1)) then w·(tf/(tf+norm)) — identical in every
        # path (oracle, exhaustive, WAND) so scores are bit-equal.
        wmap = F.create_map(
            *[
                x
                for t in uniq
                for x in (
                    F.lit(t),
                    F.lit(counts[t] * weight_fn(dfs.get(t, 0), num_docs)),
                )
            ]
        )
        tf = F.col("tf").cast("double")
        norm = F.lit(K1) * (
            F.lit(1.0 - B) + F.lit(B) * decoded_dl(F.col("norm_id")) / F.lit(float(avgdl))
        )
        unit_frames.append(
            matched.filter(F.col("term").isin(uniq)).select(
                "doc_id",
                F.lit(0).alias("_kind"),
                F.col("term").alias("_key"),
                (wmap[F.col("term")] * (tf / (tf + norm))).alias("_s"),
            )
        )
        n_units += len(uniq)

    for pi, ph in enumerate(pq.phrases):
        w_ph = sum(idf_fn(dfs.get(t, 0), num_docs) for t in ph) * (K1 + 1.0)
        base = matched.filter(F.col("term") == ph[0]).select(
            "doc_id", F.col("positions").alias("_p"), "norm_id"
        )
        for j, t in enumerate(ph[1:], start=1):
            nxt = matched.filter(F.col("term") == t).select(
                "doc_id",
                F.transform("positions", lambda x: x - j).alias(f"_p{j}"),
            )
            base = base.join(nxt, "doc_id").withColumn(
                "_p", F.array_intersect("_p", f"_p{j}")
            ).drop(f"_p{j}")
        tfp = F.size("_p").cast("double")
        norm = F.lit(K1) * (
            F.lit(1.0 - B) + F.lit(B) * decoded_dl(F.col("norm_id")) / F.lit(float(avgdl))
        )
        unit_frames.append(
            base.filter(F.size("_p") > 0).select(
                "doc_id",
                F.lit(1).alias("_kind"),
                F.lit(" ".join(ph) + f"\x00{pi}").alias("_key"),
                (F.lit(w_ph) * (tfp / (tfp + norm))).alias("_s"),
            )
        )
        n_units += 1

    units = unit_frames[0]
    for f_ in unit_frames[1:]:
        units = units.unionByName(f_)

    scored = (
        units.groupBy("doc_id")
        # Deterministic fp summation: fold unit contributions in canonical
        # order — single terms (kind 0) sorted by term, then phrases (kind
        # 1) sorted by text; matches the oracle exactly so last-ulp ties
        # break identically.
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_kind", "_key", "_s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_s"],
            ).alias("score"),
            F.count("*").alias("_nmatch"),
        )
    )
    if mode == "must":
        scored = scored.filter(F.col("_nmatch") == F.lit(n_units))
    scored = scored.drop("_nmatch")

    if pq.neg_terms:
        neg_docs = (
            postings.filter(F.col("term").isin(list(set(pq.neg_terms))))
            .select("doc_id")
            .distinct()
        )
        scored = scored.join(neg_docs, "doc_id", "left_anti")

    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
