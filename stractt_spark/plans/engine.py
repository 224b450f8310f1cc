"""High-level search engine facade.

``SearchEngine.from_docs`` is the in-memory path (postings cached, stats
computed once) used by tests and small corpora; ``SearchEngine.load`` reads
a persisted index built by :mod:`stractt_spark.plans.build` (segments +
stats tables) and serves the WAND path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.query_parse import parse_query
from ..operators.postings import build_postings, global_stats
from ..operators.score import bm25_topk


class SearchEngine:
    def __init__(
        self,
        postings: DataFrame,
        num_docs: int,
        avgdl: float,
        analyzer: str = "ascii",
    ) -> None:
        self.postings = postings
        self.num_docs = num_docs
        self.avgdl = avgdl
        self.analyzer = analyzer

    @classmethod
    def from_docs(
        cls,
        docs: DataFrame,
        text_col: str = "content",
        id_col: str = "doc_id",
        analyzer: str = "ascii",
        stopwords: frozenset[str] = frozenset(),
        cache: bool = True,
        positions: bool = False,
    ) -> "SearchEngine":
        postings = build_postings(
            docs, text_col, id_col, analyzer, stopwords, include_positions=positions
        )
        if cache:
            postings = postings.cache()
        stats = global_stats(docs, postings, id_col)
        return cls(postings, stats["num_docs"], stats["avgdl"], analyzer)

    def search(
        self, query: str, k: int = 10, mode: str = "must", phrase: bool = False
    ) -> DataFrame:
        pq = parse_query(query, self.analyzer, phrase=phrase)
        return bm25_topk(
            self.postings, pq, self.num_docs, self.avgdl, k=k, mode=mode
        )

    def search_list(
        self, query: str, k: int = 10, mode: str = "must", phrase: bool = False
    ):
        """Driver-side list of (doc_id, score) — test/bench convenience."""
        return [
            (r["doc_id"], r["score"])
            for r in self.search(query, k, mode, phrase).collect()
        ]
