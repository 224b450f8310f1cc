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

from .functions.bm25 import K1, idf, tf_component, weight
from .functions.fieldnorm import quantize_length
from .functions.tokenizer import get_analyzer, term_freqs


@dataclass
class OracleIndex:
    analyzer: str = "ascii"
    num_docs: int = 0
    total_tokens: int = 0
    # term -> {doc_id: tf}
    postings: dict[str, dict[int, int]] = field(default_factory=dict)
    # term -> {doc_id: [positions]} (WithFreqsAndPositions, schema.rs:117-122)
    positions: dict[str, dict[int, list[int]]] = field(default_factory=dict)
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
        for i, t in enumerate(tokens):
            self.positions.setdefault(t, {}).setdefault(doc_id, []).append(i)

    def phrase_freq(self, tokens: list[str], doc_id: int) -> int:
        """Number of exact-adjacency phrase matches in doc (slop 0) —
        start positions p with tokens[i] at p+i for all i."""
        starts = set(self.positions.get(tokens[0], {}).get(doc_id, []))
        for i, t in enumerate(tokens[1:], start=1):
            nxt = self.positions.get(t, {}).get(doc_id, [])
            starts &= {p - i for p in nxt}
            if not starts:
                return 0
        return len(starts)

    def doc_freq(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def search(
        self, query: str, k: int = 10, mode: str = "must", phrase: bool = False
    ) -> list[tuple[int, float]]:
        """Top-k (doc_id, score). ``mode``: 'must' = AND over positive
        units (reference default: every simple term is Occur::Must,
        query/parser.rs:54-91); 'should' = OR (union scoring).
        ``-term`` prefixes are MustNot in either mode.

        ``phrase=True``: a whitespace unit whose analyzer output is >1
        tokens becomes a PhraseQuery (parser.rs:228-236) — matched by
        exact adjacency, scored as BM25 with tf = phrase count and weight
        = Σ member-term idf (the multi-term Bm25Weight, bm25.rs:66-90)."""
        from .functions.query_parse import parse_query

        pq = parse_query(query, self.analyzer, phrase=phrase)
        pos_terms, neg_terms, phrases = pq.pos_terms, pq.neg_terms, pq.phrases
        if not pos_terms and not phrases:
            return []

        uniq = list(dict.fromkeys(pos_terms))
        doc_sets = [set(self.postings.get(t, {})) for t in uniq]
        phrase_docs: list[dict[int, int]] = []
        for ph in phrases:
            # AND of member terms, then adjacency verification
            member_sets = [set(self.postings.get(t, {})) for t in ph]
            cand_ph = set.intersection(*member_sets) if all(member_sets) else set()
            pf = {d: self.phrase_freq(ph, d) for d in cand_ph}
            phrase_docs.append({d: f for d, f in pf.items() if f > 0})
        if mode == "must":
            sets = doc_sets + [set(p) for p in phrase_docs]
            if not sets or any(not s for s in sets):
                return []
            cand = set.intersection(*sets)
        else:
            sets = doc_sets + [set(p) for p in phrase_docs]
            cand = set.union(*sets) if sets else set()
        for t in neg_terms:
            cand -= set(self.postings.get(t, {}))
        if not cand:
            return []

        avgdl = self.avgdl
        # Canonical fp order: single terms sorted alphabetically (count-
        # folded), then phrases sorted by joined text — must match the
        # engine's summation order exactly for last-ulp tie stability.
        counts = pq.term_counts
        scores: dict[int, float] = {d: 0.0 for d in cand}
        for t in sorted(counts):
            plist = self.postings.get(t, {})
            # association order counts·weight, then w·tf_comp — identical
            # to both Spark paths for bit-equal scores
            wt = counts[t] * weight(len(plist), self.num_docs)
            for d in cand:
                tf = plist.get(d)
                if tf is not None:
                    scores[d] += wt * float(
                        tf_component(tf, self.doc_dl[d], avgdl)
                    )
        for ph, pdocs in sorted(
            zip(phrases, phrase_docs), key=lambda x: " ".join(x[0])
        ):
            w = sum(
                idf(len(self.postings.get(t, {})), self.num_docs) for t in ph
            ) * (K1 + 1.0)
            # w·(tf_comp) association — matches engine paths
            for d in cand:
                pf = pdocs.get(d)
                if pf:
                    scores[d] += w * float(
                        tf_component(pf, self.doc_dl[d], avgdl)
                    )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


def build_oracle(rows: list[tuple[int, str]], analyzer: str = "ascii") -> OracleIndex:
    idx = OracleIndex(analyzer=analyzer)
    for doc_id, text in rows:
        idx.add(doc_id, text)
    return idx
