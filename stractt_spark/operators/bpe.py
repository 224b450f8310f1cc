"""Distributed BPE tokenizer training + encoding.

Byte-pair-encoding merge learning (Sennrich et al. 2016) re-expressed
for Spark's execution model.  The key scale observation: after ONE pass
over corpus bytes for word counts, training never touches the corpus
again — every merge iteration runs on the WORD-COUNT table, whose size
is bounded by the vocabulary (≈10⁵–10⁸ rows) regardless of corpus bytes.
At 100 TB the pipeline is:

1. ``word_counts``: one tokenize + groupBy pass (map-side partial agg
   absorbs hot words);
2. ``learn_bpe``: N iterations over the cached word table — each is an
   adjacent-pair explode + groupBy + a ONE-ROW argmax collect, then a
   pure-projection fold rewriting the symbol arrays (no shuffle in the
   apply step; lineage bounded by periodic localCheckpoint like the
   iterative graph ops);
3. ``bpe_token_counts``: one map-side Arrow pass over the corpus with
   the learned merge ranks broadcast (classic rank-greedy encoding per
   word, memoized per batch) — encoding is corpus-bandwidth-bound, the
   same shape as the index build's tokenize pass.

Determinism (the cross-engine gate contract): the winning pair each
round is max by (count, left, right) — ties broken by the
lexicographically GREATEST (left, right); training stops early when the
best pair count < 2 (merging singletons is vacuous).  The pure-Python
twin in the oracle replays the identical rule.

Reference scope note: the reference tokenizes with fixed lexer rules
(src/tokenizer.rs) — subword-unit LEARNING is a training-data-pipeline
extension, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenizer import SQL_TOKEN_PATTERN


def word_counts(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """→ (word, cnt): the corpus word-frequency table BPE trains on.
    One tokenize pass + one groupBy; the output is vocab-bounded."""
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{SQL_TOKEN_PATTERN}', 0)"
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


# fold that applies ONE merge (l, r → l||r) left-to-right greedily to a
# symbol array: acc ⊕ x = replace-last when (last(acc), x) == (l, r)
_MERGE_FOLD = (
    "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) -> "
    "IF(size(acc) > 0 AND element_at(acc, -1) = {l} AND x = {r}, "
    "concat(slice(acc, 1, size(acc) - 1), array({m})), "
    "concat(acc, array(x))))"
)


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def learn_bpe(
    spark: SparkSession,
    words: DataFrame,
    n_merges: int,
    checkpoint_every: int = 8,
) -> DataFrame:
    """→ (rank, left, right, merged): the learned merge table, rank 0
    first.  ``words`` is a (word, cnt) DataFrame (:func:`word_counts`).

    Each iteration: weighted adjacent-pair counts over the symbol arrays
    (explode + groupBy on the VOCAB-sized table), a one-row argmax
    collect, and a zero-shuffle fold applying the merge.  The symbol
    table is cached and localCheckpoint-ed every ``checkpoint_every``
    rounds so lineage stays bounded at large n_merges."""
    syms = words.select(
        "cnt",
        F.expr("transform(split(word, ''), c -> c)").alias("syms"),
    ).filter(F.size("syms") > 0)
    syms = syms.cache()
    syms.count()
    merges: list[tuple[int, str, str, str]] = []
    prev = syms
    for rank in range(int(n_merges)):
        pairs = prev.select(
            "cnt",
            F.explode(
                F.arrays_zip(
                    F.slice(
                        "syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))
                    ).alias("l"),
                    F.slice(
                        "syms", 2, F.greatest(F.size("syms") - 1, F.lit(0))
                    ).alias("r"),
                )
            ).alias("p"),
        ).select("cnt", F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.desc("total"), F.desc("l"), F.desc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["total"] < 2:
            break
        left, right = best[0]["l"], best[0]["r"]
        merged = left + right
        merges.append((rank, left, right, merged))
        nxt = prev.select(
            "cnt",
            F.expr(
                _MERGE_FOLD.format(
                    l=_sql_str(left), r=_sql_str(right), m=_sql_str(merged)
                )
            ).alias("syms"),
        )
        if (rank + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
            prev.unpersist()
        prev = nxt
    return spark.createDataFrame(
        merges, "rank long, left string, right string, merged string"
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Rank-greedy BPE encode of one word; returns the token count."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def bpe_token_counts(
    docs: DataFrame, text_col: str, id_col: str, merges: DataFrame
) -> DataFrame:
    """→ (doc_id, n_words, n_bpe_tokens): the corpus encoded with the
    LEARNED merges — per-doc word count and subword-token count (the
    real training-cost denominator once a tokenizer exists).

    One map-side Arrow pass: the merge table (vocab-bounded, a few MB)
    is collected once and closed over — each executor batch builds the
    rank dict and memoizes per-word encodings, so hot words cost one
    dict hit.  No shuffle, no per-row Python UDF."""
    rank_rows = [
        ((r["left"], r["right"]), int(r["rank"])) for r in merges.collect()
    ]
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{SQL_TOKEN_PATTERN}', 0)"
    )
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), toks.alias("words")
    )

    def enc(batches):
        import pandas as pd

        ranks = dict(rank_rows)
        memo: dict[str, int] = {}
        for pdf in batches:
            counts = []
            for words in pdf["words"]:
                total = 0
                for w in words:
                    n = memo.get(w)
                    if n is None:
                        n = _encode_word(w, ranks)
                        memo[w] = n
                    total += n
                counts.append(total)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_words": [len(w) for w in pdf["words"]],
                    "n_bpe_tokens": counts,
                }
            )

    return base.mapInPandas(
        enc, "doc_id long, n_words long, n_bpe_tokens long"
    )
