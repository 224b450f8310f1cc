"""Snippet generation: best highlighted fragment per result document.

Reference semantics (/root/reference/src/snippet.rs:120-260, tantivy-
derived):

* each query term gets weight ``1 / (1 + df)`` (snippet.rs:223-241);
* the document text is token-streamed with byte offsets; a fragment
  accumulates tokens until the next token's end would exceed
  ``max_num_chars`` (280, snippet.rs:34) past the fragment start, then a
  new fragment opens at that token's start — fragments with at least one
  term hit are candidates (search_fragments, snippet.rs:131-153);
* the best fragment has the highest summed term weight; ties go to the
  EARLIEST (start, stop) (select_best_fragment_combination,
  snippet.rs:158-190);
* the fragment renders with ``<b>…</b>`` around each hit and html
  escaping elsewhere (Snippet::to_html, snippet.rs:85-106); overlapping
  highlight ranges are skipped (``item.start < start_from``);
* a document whose text contains no query term yields an EMPTY snippet;
  an empty text falls back to the first ``max_num_chars`` characters of
  the fallback text (generate, snippet.rs:262-310 — description /
  dirty-text fallbacks collapse to one text column in this corpus).

Spark shape: one Arrow-batched ``mapInPandas`` over the (small) top-k
docs joined with their text — the snippet stage touches k documents, not
the corpus.  Term weights come from the driver-side term_df dict (≤ a few
entries), broadcast by closure.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

DEFAULT_MAX_NUM_CHARS = 280  # snippet.rs:34

# offset-preserving token patterns per analyzer (findall loses offsets);
# "alnum" mirrors tantivy's SimpleTokenizer (alphanumeric runs only) used
# by the reference's unit tests
_OFFSET_RES = {
    "ascii": re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"),
    "simple": re.compile(r"\w+|[^\w\s]"),
    "normal": re.compile(r"\w+|[^\w\s]"),
    "code": re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"),
    "alnum": re.compile(r"[A-Za-z0-9]+"),
}


@dataclass
class FragmentCandidate:
    """snippet.rs:37-72 — a token window with its hit score and ranges."""

    score: float = 0.0
    start_offset: int = 0
    stop_offset: int = 0
    highlighted: list[tuple[int, int]] = field(default_factory=list)


def search_fragments(
    text: str,
    term_weights: dict[str, float],
    max_num_chars: int = DEFAULT_MAX_NUM_CHARS,
    analyzer: str = "ascii",
) -> list[FragmentCandidate]:
    """All scoring fragments of the text (search_fragments,
    snippet.rs:131-153): a fragment accumulates tokens until the next
    token's end would exceed ``max_num_chars`` past the fragment start;
    only fragments containing at least one term are kept."""
    token_re = _OFFSET_RES.get(analyzer, _OFFSET_RES["ascii"])
    fragments: list[FragmentCandidate] = []
    cur = FragmentCandidate()
    for m in token_re.finditer(text):
        if m.end() - cur.start_offset > max_num_chars:
            if cur.score > 0.0:
                fragments.append(cur)
            cur = FragmentCandidate(
                start_offset=m.start(), stop_offset=m.start()
            )
        cur.stop_offset = m.end()
        w = term_weights.get(m.group().lower())
        if w is not None:
            cur.score += w
            cur.highlighted.append((m.start(), m.end()))
    if cur.score > 0.0:
        fragments.append(cur)
    return fragments


def select_best_fragment(
    fragments: list[FragmentCandidate],
) -> FragmentCandidate | None:
    """Highest score wins; ties go to the EARLIEST (start, stop)
    (select_best_fragment_combination, snippet.rs:158-190)."""
    best: FragmentCandidate | None = None
    for f in fragments:
        if (
            best is None
            or f.score > best.score
            or (f.score == best.score
                and (f.start_offset, f.stop_offset)
                < (best.start_offset, best.stop_offset))
        ):
            best = f
    return best


def to_html(frag_text: str, highlights: list[tuple[int, int]]) -> str:
    """``<b>…</b>`` highlighting with html escaping; overlapping ranges
    skipped (Snippet::to_html, snippet.rs:85-106).  ``highlights`` are
    fragment-relative."""
    out: list[str] = []
    start_from = 0
    for h0, h1 in highlights:
        if h0 < start_from:
            start_from = h1
            continue
        out.append(_html.escape(frag_text[start_from:h0], quote=False))
        out.append("<b>")
        out.append(_html.escape(frag_text[h0:h1], quote=False))
        out.append("</b>")
        start_from = h1
    out.append(_html.escape(frag_text[start_from:], quote=False))
    return "".join(out)


def snippet_of(
    text: str,
    term_weights: dict[str, float],
    max_num_chars: int = DEFAULT_MAX_NUM_CHARS,
    analyzer: str = "ascii",
    highlight: bool = True,
) -> str:
    """Reference-exact snippet for one document (pure function; the Spark
    operator maps it over Arrow batches).  Empty when no term occurs in
    the text (generate, snippet.rs:262-310)."""
    if not text:
        return ""
    best = select_best_fragment(
        search_fragments(text, term_weights, max_num_chars, analyzer)
    )
    if best is None:
        return ""
    frag = text[best.start_offset:best.stop_offset]
    if not highlight:
        return frag
    rel = [(h0 - best.start_offset, h1 - best.start_offset)
           for h0, h1 in best.highlighted]
    return to_html(frag, rel)


def term_weights_of(term_df: dict[str, int]) -> dict[str, float]:
    """Query-term snippet weights: 1 / (1 + df), terms with df == 0
    dropped (snippet.rs:223-241)."""
    return {t: 1.0 / (1.0 + df) for t, df in term_df.items() if df > 0}


def generate_snippets(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    term_df: dict[str, int],
    max_num_chars: int = DEFAULT_MAX_NUM_CHARS,
    analyzer: str = "ascii",
    highlight: bool = True,
    out_col: str = "snippet",
) -> DataFrame:
    """(id, text, …) → (id, …, snippet) — Arrow-batched, no per-row Python
    UDF registration; intended for the top-k result rows after the
    doc-store join (the reference renders snippets per result page,
    never per corpus)."""
    weights = term_weights_of(term_df)
    fields = [f for f in docs.schema.fields if f.name != text_col]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in fields]
        + [f"{out_col} string"]
    )

    def run(batches):
        for pdf in batches:
            texts = pdf[text_col].values
            empties = pdf[text_col].fillna("").str.slice(0, max_num_chars)
            snips = []
            for i, t in enumerate(texts):
                s = snippet_of(t or "", weights, max_num_chars, analyzer,
                               highlight)
                # empty-text fallback: first max_num_chars raw chars
                snips.append(s if t else empties.iloc[i])
            out = pdf[[f.name for f in fields]].copy()
            out[out_col] = snips
            yield out

    return docs.mapInPandas(run, out_schema)
