"""Autosuggest: prefix → top-10 suggestions in lexicographic order.

Reference (/root/reference/src/autosuggest.rs:27-58): queries load from
CSV into a sorted fst::Set; ``suggestions`` lowercases the prefix, runs a
starts-with automaton and takes the FIRST 10 of the sorted stream — i.e.
the 10 lexicographically-smallest completions (NOT frequency-ranked).

Two shapes:

* :class:`Autosuggest` — driver-side sorted list + bisect (the fst
  stand-in) for a broadcastable dictionary;
* :func:`suggest_df` — the distributed form: a ``startsWith`` filter on
  the term dictionary DataFrame (pushed to the parquet scan as
  StringStartsWith) + ``orderBy(term).limit(10)``.
"""

from __future__ import annotations

from bisect import bisect_left

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Autosuggest:
    def __init__(self, queries: list[str]) -> None:
        self._sorted = sorted(queries)

    @classmethod
    def from_terms(cls, terms: list[str]) -> "Autosuggest":
        return cls(terms)

    def suggestions(self, prefix: str, k: int = 10) -> list[str]:
        p = prefix.lower()
        out: list[str] = []
        i = bisect_left(self._sorted, p)
        while i < len(self._sorted) and len(out) < k:
            s = self._sorted[i]
            if not s.startswith(p):
                break
            out.append(s)
            i += 1
        return out


def suggest_df(
    term_dict: DataFrame, prefix: str, k: int = 10, term_col: str = "term"
) -> DataFrame:
    """Distributed prefix suggestion over a term dictionary table: the
    startsWith predicate reaches the scan, the lexicographic top-k is a
    TakeOrderedAndProject."""
    return (
        term_dict.filter(F.col(term_col).startswith(prefix.lower()))
        .select(term_col)
        .orderBy(F.asc(term_col))
        .limit(k)
    )
