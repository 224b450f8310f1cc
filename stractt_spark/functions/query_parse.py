"""Driver-side query parsing (reference src/query/parser.rs:280-322).

The reference splits on whitespace, treats ``-term`` as MustNot
(:100-109), analyzes every term with the field analyzer (a term that
splits into several tokens — ``foo.bar`` → ``foo . bar`` — contributes all
of them), and caps duplicate terms at ``MAX_SIMILAR_TERMS = 10``
(src/query/mod.rs:35,104-115).  ``site:``-style field prefixes are parsed
here but mapped onto column predicates by the caller.

This is a tiny pure function on the driver — the reference's parser is
likewise query-string-sized work, not a data-parallel op.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .tokenizer import get_analyzer

MAX_SIMILAR_TERMS = 10

_FIELD_PREFIXES = ("repo:", "path:", "lang:", "site:")


@dataclass
class ParsedQuery:
    pos_terms: list[str] = field(default_factory=list)  # with multiplicity, capped
    neg_terms: list[str] = field(default_factory=list)
    # phrase groups: a whitespace unit whose analyzer output is >1 tokens
    # becomes a PhraseQuery in the reference (src/query/parser.rs:228-236);
    # populated only when parse_query(..., phrase=True)
    phrases: list[list[str]] = field(default_factory=list)
    filters: dict[str, str] = field(default_factory=dict)      # field -> value (Must)
    anti_filters: dict[str, str] = field(default_factory=dict)  # field -> value (MustNot)
    # ``!tag`` shortcut candidates in query order (reference
    # Term::PossibleBang, src/query/parser.rs:312-313): recorded for
    # redirect resolution AND still scored as a normal term ("!tag"
    # re-enters simple tokenization, parser.rs:164-170)
    bangs: list[str] = field(default_factory=list)

    @property
    def uniq_terms(self) -> list[str]:
        return list(dict.fromkeys(self.pos_terms))

    @property
    def term_counts(self) -> dict[str, int]:
        c: dict[str, int] = {}
        for t in self.pos_terms:
            c[t] = c.get(t, 0) + 1
        return c

    @property
    def all_match_terms(self) -> list[str]:
        """Every positive term the engine must look up (single + phrase)."""
        out = list(self.pos_terms)
        for p in self.phrases:
            out.extend(p)
        return list(dict.fromkeys(out))


def parse_query(query: str, analyzer: str = "ascii", phrase: bool = False) -> ParsedQuery:
    an = get_analyzer(analyzer)
    out = ParsedQuery()
    for raw in query.split():
        neg = raw.startswith("-") and len(raw) > 1
        body = raw[1:] if neg else raw
        pref = next((p for p in _FIELD_PREFIXES if body.startswith(p)), None)
        if pref and len(body) > len(pref):
            fieldname, value = pref[:-1], body[len(pref):]
            (out.anti_filters if neg else out.filters)[fieldname] = value
            continue
        if not neg and body.startswith("!") and len(body) > 1:
            # candidate bang: surfaced for redirect resolution, and the
            # whole "!tag" unit still tokenizes into the match terms
            # (the reference's PossibleBang → simple_into_tantivy path)
            out.bangs.append(body[1:])
        toks = an(body)
        if neg:
            out.neg_terms.extend(toks)
        elif phrase and len(toks) > 1:
            out.phrases.append(toks)
        else:
            out.pos_terms.extend(toks)
    # MAX_SIMILAR_TERMS cap
    seen: dict[str, int] = {}
    capped: list[str] = []
    for t in out.pos_terms:
        seen[t] = seen.get(t, 0) + 1
        if seen[t] <= MAX_SIMILAR_TERMS:
            capped.append(t)
    out.pos_terms = capped
    return out


def resolve_bang(
    query: str, bangs: dict[str, str]
) -> tuple[str, str] | None:
    """``!tag`` shortcut resolution (reference src/bangs.rs:81-118): the
    FIRST top-level ``!tag`` unit whose tag is registered wins; the
    redirect URL is the bang's template with ``{{{s}}}`` replaced by the
    rest of the query (every other unit verbatim, including other bangs
    — the reference substitutes each remaining term's string form, which
    round-trips to its original syntax).  A negated ``-!tag`` is a
    MustNot term, not a bang (the reference only matches top-level
    PossibleBang).  Returns (tag, redirect_url) or None.

    ``bangs`` maps tag → URL template — the driver-side analogue of the
    reference's JSON bang table (a small broadcastable dict)."""
    units = query.split()
    for i, u in enumerate(units):
        if u.startswith("!") and len(u) > 1 and not u.startswith("!-"):
            tag = u[1:]
            if tag in bangs:
                rest = " ".join(units[:i] + units[i + 1:])
                return tag, bangs[tag].replace("{{{s}}}", rest)
    return None
