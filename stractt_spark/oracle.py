"""Pure-Python single-node reference engine (the rank-identity yardstick).

Implements exactly the scoring semantics the Spark engine must reproduce
(SURVEY.md §5, FIXTURES.md §3): reference tokenizer, byte-quantized
fieldnorms, BM25 with K1=1.2/B=0.75, Must(AND) semantics for multi-term
queries with ``-term`` MustNot (reference ``src/query/mod.rs:122-150``,
``src/query/parser.rs:100-109``), score = Σ per-term BM25, top-k by
(score desc, doc_id asc).

This module never touches Spark; tests assert the distributed engine is
rank-identical (and score-equal within 1e-5 tolerance) to this oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .functions.bm25 import score_term
from .functions.fieldnorm import quantize_length
from .functions.tokenizer import get_analyzer, term_freqs


@dataclass
class OracleIndex:
    analyzer: str = "ascii"
    num_docs: int = 0
    total_tokens: int = 0
    # term -> {doc_id: tf}
    postings: dict[str, dict[int, int]] = field(default_factory=dict)
    # doc_id -> quantized dl
    doc_dl: dict[int, int] = field(default_factory=dict)

    @property
    def avgdl(self) -> float:
        # exact lengths, not quantized (bm25.rs:66-73)
        return self.total_tokens / self.num_docs if self.num_docs else 0.0

    def add(self, doc_id: int, text: str) -> None:
        tokens = get_analyzer(self.analyzer)(text)
        self.num_docs += 1
        self.total_tokens += len(tokens)
        self.doc_dl[doc_id] = int(quantize_length(len(tokens)))
        for term, tf in term_freqs(tokens).items():
            self.postings.setdefault(term, {})[doc_id] = tf

    def doc_freq(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def search(
        self, query: str, k: int = 10, mode: str = "must"
    ) -> list[tuple[int, float]]:
        """Top-k (doc_id, score). ``mode``: 'must' = AND over positive
        terms (reference default: every simple term is Occur::Must,
        query/parser.rs:54-91); 'should' = OR (union scoring).
        ``-term`` prefixes are MustNot in either mode."""
        pos_terms, neg_terms = [], []
        analyzer = get_analyzer(self.analyzer)
        for raw in query.split():
            if raw.startswith("-") and len(raw) > 1:
                neg_terms.extend(analyzer(raw[1:]))
            else:
                pos_terms.extend(analyzer(raw))
        # duplicate-term cap MAX_SIMILAR_TERMS=10 (query/mod.rs:35,104-115)
        capped: list[str] = []
        seen: dict[str, int] = {}
        for t in pos_terms:
            seen[t] = seen.get(t, 0) + 1
            if seen[t] <= 10:
                capped.append(t)
        pos_terms = capped
        if not pos_terms:
            return []

        uniq = list(dict.fromkeys(pos_terms))
        doc_sets = [set(self.postings.get(t, {})) for t in uniq]
        if mode == "must":
            if any(not s for s in doc_sets):
                return []
            cand = set.intersection(*doc_sets)
        else:
            cand = set.union(*doc_sets)
        for t in neg_terms:
            cand -= set(self.postings.get(t, {}))
        if not cand:
            return []

        avgdl = self.avgdl
        # Canonical fp order: fold terms sorted alphabetically, duplicated
        # query terms folded as count × score — must match the engine's
        # summation order exactly (score.py) for last-ulp tie stability.
        counts: dict[str, int] = {}
        for t in pos_terms:
            counts[t] = counts.get(t, 0) + 1
        scores: dict[int, float] = {d: 0.0 for d in cand}
        for t in sorted(counts):
            plist = self.postings.get(t, {})
            n = len(plist)
            for d in cand:
                tf = plist.get(d)
                if tf is not None:
                    scores[d] += counts[t] * float(
                        score_term(tf, self.doc_dl[d], avgdl, n, self.num_docs)
                    )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


def build_oracle(rows: list[tuple[int, str]], analyzer: str = "ascii") -> OracleIndex:
    idx = OracleIndex(analyzer=analyzer)
    for doc_id, text in rows:
        idx.add(doc_id, text)
    return idx
