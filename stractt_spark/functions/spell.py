"""Spell correction + compound splitting over the index dictionary.

Reference: a dictionary of the top-100k terms with counts
(src/spell/dictionary.rs:135-149); correction picks the most-probable
(highest-count) dictionary term within an edit distance that grows
logarithmically with term length (src/spell/spell_checker.rs:33-88);
compound splitting tries to split an unknown term into two dictionary
words (src/spell/splitter.rs:26).  All driver-side over a broadcastable
term→df dict, exactly like the reference's per-query usage
(src/searcher/local.rs:129).
"""

from __future__ import annotations

import math

DICT_SIZE = 100_000


def max_edit_distance(term: str) -> int:
    """Logarithmic-in-length budget (spell_checker.rs:33-88 shape)."""
    return max(1, int(math.log2(max(len(term), 2))) - 1)


def levenshtein(a: str, b: str, cutoff: int) -> int:
    """Band-limited edit distance; returns cutoff+1 when exceeded."""
    if abs(len(a) - len(b)) > cutoff:
        return cutoff + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        row_min = cur[0]
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            row_min = min(row_min, cur[j])
        if row_min > cutoff:
            return cutoff + 1
        prev = cur
    return prev[-1]


class SpellChecker:
    def __init__(self, term_counts: dict[str, int], dict_size: int = DICT_SIZE):
        top = sorted(term_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:dict_size]
        self.counts = dict(top)
        self._by_len: dict[int, list[str]] = {}
        for t in self.counts:
            self._by_len.setdefault(len(t), []).append(t)

    def correct(self, term: str) -> str | None:
        """Most-probable dictionary term within the edit budget; None if
        the term is known or nothing qualifies."""
        if term in self.counts:
            return None
        budget = max_edit_distance(term)
        best: tuple[int, int, str] | None = None  # (dist, -count, term)
        for length in range(len(term) - budget, len(term) + budget + 1):
            for cand in self._by_len.get(length, ()):
                d = levenshtein(term, cand, budget)
                if d <= budget:
                    key = (d, -self.counts[cand], cand)
                    if best is None or key < best:
                        best = key
        return best[2] if best else None

    def split_compound(self, term: str) -> tuple[str, str] | None:
        """Split an unknown term into the most probable known pair
        (splitter.rs:26): maximize the smaller count (balanced split)."""
        if term in self.counts:
            return None
        best: tuple[int, tuple[str, str]] | None = None
        for i in range(2, len(term) - 1):
            a, b = term[:i], term[i:]
            if a in self.counts and b in self.counts:
                score = min(self.counts[a], self.counts[b])
                if best is None or score > best[0]:
                    best = (score, (a, b))
        return best[1] if best else None

    def suggest_query(self, terms: list[str]) -> list[str] | None:
        """Corrected query if any term changed, else None (local.rs:129)."""
        changed = False
        out: list[str] = []
        for t in terms:
            c = self.correct(t)
            if c is not None:
                out.append(c)
                changed = True
            else:
                out.append(t)
        return out if changed else None
