"""Goggles: user-supplied ranking programs (parse + pattern matching).

Reference: /root/reference/src/ranking/goggles/ —
``parser.lalrpop`` grammar, ``ast.rs`` raw AST, ``mod.rs`` instruction
lowering (Boost/Downrank → Should const-boost ×SCALE, Discard → MustNot,
bare ``$discard`` → results must match some other instruction),
``pattern_query.rs`` token-pattern matching with anchors/wildcards via
``intersection_with_slop``.

Grammar essentials (parser.lalrpop:54-86):

* one instruction per line (or ``;``-separated); ``!…`` lines are
  comments/headers; empty lines ignored;
* instruction = pattern parts, then optional ``$opt1,opt2,…``;
* pattern parts: ``*`` wildcard, ``^`` delimiter (no-op for matching),
  ``|`` anchor, anything matching the Ident class is a raw string that
  the field tokenizer splits into adjacent terms;
* options: ``site=X``, ``inurl``/``intitle``/``indescription``/
  ``incontent`` (field selector), ``boost[=n]``, ``downrank[=n]``,
  ``discard``;
* alterations ``@signal = v`` / ``@field_x = v`` override signal /
  field-boost coefficients (mod.rs:119-140).

Matching (pattern_query.rs:271-342): the first term's positions seed the
running set; each later term intersects via :func:`intersection_with_slop`
with slop 1 (adjacent), or unbounded after a ``*``; a leading anchor pins
the first term to position 0, a trailing anchor pins the LAST term's last
occurrence to the final token.  (In the reference the leading-anchor arm
is written ``if i == 0`` inside a loop that ``skip(1)``s — unreachable as
shipped; we implement the documented intent and note the divergence.)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

SCALE = 500.0  # goggles/mod.rs:17

WILDCARD = "*"
DELIMITER = "^"
ANCHOR = "|"

_FIELD_OPTIONS = {"inurl": "url", "intitle": "title",
                  "indescription": "description", "incontent": "content"}


@dataclass
class Instruction:
    patterns: list[str] = field(default_factory=list)  # tokens + markers
    site: str | None = None
    field_sel: str | None = None
    action: str = "boost"     # boost | downrank | discard
    value: int = 1

    @property
    def is_empty_discard(self) -> bool:
        # bare "$discard": no patterns, no site (mod.rs:314-321)
        return (
            self.action == "discard" and not self.patterns and self.site is None
        )


@dataclass
class Goggle:
    instructions: list[Instruction] = field(default_factory=list)
    alterations: dict[str, float] = field(default_factory=dict)

    @property
    def has_empty_discard(self) -> bool:
        return any(i.is_empty_discard for i in self.instructions)


def parse_goggle(text: str) -> Goggle:
    """Parse a goggle program (subset of the reference grammar: the Ident
    character class, pattern markers, options and ``@`` alterations; header
    comments are skipped like any comment)."""
    import re

    g = Goggle()
    ident_re = re.compile(r"[a-zA-Z0-9_/][a-zA-Z_/:\.\?@0-9&\-]*")
    for raw_line in re.split(r"[;\n]", text):
        line = raw_line.strip()
        if not line or line.startswith("!"):
            continue
        if line.startswith("@"):
            # alteration: @signal = value
            m = re.match(r"@\s*([A-Za-z0-9_]+)\s*=\s*([0-9.\-]+)", line)
            if m:
                g.alterations[m.group(1)] = float(m.group(2))
            continue
        pattern_src, _, opts_src = line.partition("$")
        inst = Instruction()
        i = 0
        s = pattern_src.strip()
        while i < len(s):
            c = s[i]
            if c in (WILDCARD, DELIMITER, ANCHOR):
                inst.patterns.append(c)
                i += 1
            elif c.isspace():
                i += 1
            else:
                m = ident_re.match(s, i)
                if not m:
                    raise ValueError(f"bad pattern at {s[i:]!r}")
                inst.patterns.append(m.group())
                i = m.end()
        if opts_src:
            for opt in opts_src.split(","):
                opt = opt.strip()
                if opt.startswith("site="):
                    inst.site = opt[5:]
                elif opt in _FIELD_OPTIONS:
                    inst.field_sel = _FIELD_OPTIONS[opt]
                elif opt == "discard":
                    inst.action = "discard"
                elif opt.startswith("boost"):
                    inst.action = "boost"
                    inst.value = int(opt[6:]) if opt.startswith("boost=") else 1
                elif opt.startswith("downrank"):
                    inst.action = "downrank"
                    inst.value = int(opt[9:]) if opt.startswith("downrank=") else 1
        g.instructions.append(inst)
    return g


@dataclass
class SiteRankings:
    """User site preferences → goggle sugar (reference
    src/ranking/site_rankings.rs:25-70): preferred sites boost 5,
    disliked downrank 5, blocked discard."""

    preferred: list[str] = field(default_factory=list)
    disliked: list[str] = field(default_factory=list)
    blocked: list[str] = field(default_factory=list)

    def into_goggle(self) -> Goggle:
        g = Goggle()
        for site in self.preferred:
            g.instructions.append(
                Instruction(site=site, action="boost", value=5)
            )
        for site in self.disliked:
            g.instructions.append(
                Instruction(site=site, action="downrank", value=5)
            )
        for site in self.blocked:
            g.instructions.append(Instruction(site=site, action="discard"))
        return g


def intersection_with_slop(
    left: np.ndarray, right: np.ndarray, slop: int
) -> np.ndarray:
    """Exact port of pattern_query.rs:387-427: keep every right position
    that lies within ``slop`` AFTER some left position (left ≤ r ≤ left +
    slop, best left chosen greedily)."""
    out = []
    li, ri = 0, 0
    nl, nr = len(left), len(right)
    while li < nl and ri < nr:
        lv, rv = int(left[li]), int(right[ri])
        r_slop = rv - slop if rv >= slop else 0
        if lv < r_slop:
            li += 1
        elif r_slop <= lv <= rv:
            while li + 1 < nl and int(left[li + 1]) <= rv:
                li += 1
            out.append(rv)
            ri += 1
        else:
            ri += 1
    return np.asarray(out, dtype=np.int64)


def compile_pattern(parts: list[str], analyzer: str = "ascii"):
    """Raw pattern parts → (terms, ops) where ops describes the match
    program: each entry is ('term', term) | ('wildcard',) | ('anchor_start',)
    | ('anchor_end',).  Raw strings are split by the field tokenizer into
    adjacent terms (pattern_query.rs constructor)."""
    from .tokenizer import get_analyzer

    tokenize = get_analyzer(analyzer)
    ops: list[tuple] = []
    terms: list[str] = []
    n = len(parts)
    for i, p in enumerate(parts):
        if p == WILDCARD:
            ops.append(("wildcard",))
        elif p == DELIMITER:
            continue  # Delimeter arm is a no-op (pattern_query.rs:316)
        elif p == ANCHOR:
            ops.append(("anchor_start",) if i == 0 else ("anchor_end",))
        else:
            for tok in tokenize(p):
                ops.append(("term", tok))
                terms.append(tok)
    return terms, ops


def pattern_phrase_count(
    positions: dict[str, np.ndarray], ops: list[tuple], num_tokens: int
) -> int:
    """Number of pattern matches in one document.  ``positions`` maps each
    pattern term to its sorted position array (missing term ⇒ 0)."""
    left: np.ndarray | None = None
    slop = 1
    last_term: str | None = None
    anchor_start = False
    for j, op in enumerate(ops):
        kind = op[0]
        if kind == "wildcard":
            slop = 1 << 60
        elif kind == "anchor_start":
            anchor_start = True
        elif kind == "anchor_end":
            pass  # checked at the end against the last term
        elif kind == "term":
            t = op[1]
            pos = positions.get(t)
            if pos is None or len(pos) == 0:
                return 0
            if left is None:
                left = np.asarray(pos, dtype=np.int64)
                if anchor_start and int(left[0]) != 0:
                    return 0
            else:
                left = intersection_with_slop(left, np.asarray(pos), slop)
                if len(left) == 0:
                    return 0
            slop = 1
            last_term = t
    if left is None:
        return 0
    if ops and ops[-1][0] == "anchor_end":
        if last_term is None:
            return 0
        lp = positions.get(last_term)
        if lp is None or len(lp) == 0 or int(lp[-1]) != num_tokens - 1:
            return 0
    return int(len(left))
