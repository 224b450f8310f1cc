"""Tokenizers reproducing the reference lexer semantics.

Reference: the ``Simple`` tokenizer is a Logos lexer where a token is a run
of word-ish characters ``[\\w\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Cyrillic}
\\p{Arabic}]+`` and **every other non-whitespace character is emitted as its
own single-character token** (the lexer Error variant is not skipped) —
``/root/reference/src/tokenizer.rs:204-259``, golden tests at
``:294-324`` (``"example.com"`` → ``["example",".","com"]``, ``"c++"`` →
``["c","+","+"]``).  The ``Normal`` analyzer is Simple → lowercase →
optional stop-word removal (``src/tokenizer.rs:127-137``); ``Identity``
keeps the whole string as one token (``:157-202``).

Python's ``\\w`` (unicode by default) already contains Han / Hiragana /
Katakana / Cyrillic / Arabic letters, so the run class ``[\\w|]`` below is
EXACTLY the reference's Logos class ``[\\w|\\p{Han}|...]+``: Logos compiles
``#[regex]`` patterns through ``regex-syntax``, whose ``\\w`` is
Unicode-aware — the explicit script alternatives in the reference class
are redundant with ``\\w`` (each named script is Alphabetic, hence in
``\\w``), and the class also contains the LITERAL ``|`` characters of the
alternation-free class syntax, so ``a|b`` lexes as ONE token.  That
``\\w`` is Unicode there (not ASCII) is independently forced by the
reference's own design: the ``Stemmed`` analyzer feeds these tokens to
per-language Snowball stemmers picked by whatlang
(``src/tokenizer.rs:24-47,139-155``) — accented Latin (``schön``,
``año``) must lex as word runs or German/Spanish stemming could never
fire.  Consequently Greek/Hebrew/accented-Latin are run-class in BOTH
engines.  The skip set is exactly ``[ \\t\\n\\f]+`` — ``\\r``, ``\\v`` and
Unicode spaces are NOT skipped and fall to the Error arm, i.e. they are
emitted as single-char tokens consuming a position; the single-char
class below excludes exactly the four skip characters to match.

Two extra analyzers exist for the code corpus (north star: "code-aware
tokenizer: identifier splitting, lowercase, stoplist"):

* ``ascii``  — same shape but with an explicit ASCII class, so the exact
  same pattern is expressible in Spark SQL (Java regex) and DuckDB (RE2)
  for the oracle-parity gate; unicode word chars outside ASCII are treated
  as single-char tokens.
* ``code``   — ascii tokens, then identifiers are split on ``_`` and
  camelCase boundaries, lowercased, punctuation dropped, optional stoplist.

Everything here is pure Python/regex on strings; the Spark entry points
wrap these in Arrow-batched pandas UDFs (see
``stractt_spark.operators.postings``) — no per-row Python UDFs.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

# Reference-exact pattern: word runs over [\w|] (unicode \w covers the
# Logos class's named scripts; the literal | is part of the class), then
# every char outside the exact [ \t\n\f] skip set as its own token
# (tokenizer.rs:204-212 — the Error arm is emitted, not skipped).
_SIMPLE_RE = re.compile(r"[\w|]+|[^\w| \t\n\f]")

# Engine-agnostic ASCII variant; keep in sync with SQL_TOKEN_PATTERN.
_ASCII_RE = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]")

# The same pattern, as a string usable verbatim in Spark `regexp_extract_all`
# (Java regex) and DuckDB `regexp_extract_all` (RE2).  The negated class
# spells out the ASCII whitespace set [ \t\n\r\f\v] so it matches Python's
# `\s` on ASCII input (__spark_entry__ imports this constant — one
# definition everywhere).  The whitespace characters are embedded RAW, not
# as backslash escapes: Spark's SQL string-literal lexer drops the
# backslash of escapes it doesn't know (`\v` → `v`), which would silently
# turn the class into one that excludes the LETTER v — raw control
# characters pass through every engine's literal parser untouched.
# Remaining documented divergence: Python `\s` also skips Unicode
# whitespace (U+00A0, U+2000..), which this ASCII class emits as
# single-char tokens; the synthetic corpus and the oracle gate are
# ASCII-only so the three engines agree on every gated byte.
SQL_TOKEN_PATTERN = "[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r\f\v]"

# camelCase boundaries: lower|digit → Upper, and ACRONYMWord ("HTTPServer"
# → "HTTP" + "Server").
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")


def tokenize_simple(text: str) -> list[str]:
    """Reference ``Simple`` tokenizer (tokenizer.rs:204-259). Case kept."""
    return _SIMPLE_RE.findall(text)


def tokenize_normal(text: str, stopwords: frozenset[str] = frozenset()) -> list[str]:
    """Reference ``Normal`` analyzer: Simple → lowercase → stoplist
    (tokenizer.rs:127-137).  Lowercasing happens PER TOKEN after lexing
    (the reference's LowerCaser is a token filter) — lowercasing the text
    first would change tokenization for chars whose lowercase adds a
    combining mark (``İ`` → ``i`` + U+0307, and U+0307 is not ``\\w``)."""
    toks = [t.lower() for t in _SIMPLE_RE.findall(text)]
    if stopwords:
        toks = [t for t in toks if t not in stopwords]
    return toks


def tokenize_ascii(text: str) -> list[str]:
    """ASCII-class variant of ``Normal`` (lowercased), chosen so the exact
    same regex runs in Spark SQL and DuckDB for the oracle gate."""
    return _ASCII_RE.findall(text.lower())


def split_identifier(token: str) -> list[str]:
    """Split one identifier on ``_`` and camelCase boundaries, lowercase.

    ``parseHTTPResponse_fast`` → ``["parse","http","response","fast"]``.
    """
    parts: list[str] = []
    for chunk in token.split("_"):
        if not chunk:
            continue
        parts.extend(p.lower() for p in _CAMEL_RE.split(chunk) if p)
    return parts


# Single-pass code analyzer: acronym runs, capitalized segments, and
# lower/digit runs match directly — underscores and punctuation fall out as
# non-matches.  One findall per document (no per-token Python), canonical
# semantics: "parseHTTPResponse_fast" → parse/HTTP/Response/fast,
# "AB1c" → AB/1c (digit run after an acronym starts a new token).
_CODE_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+")


def tokenize_code(text: str, stopwords: frozenset[str] = frozenset()) -> list[str]:
    """Code-aware analyzer: identifiers split on ``_`` and camelCase
    boundaries, lowercased; punctuation dropped; stoplist applied."""
    if stopwords:
        return [t for m in _CODE_RE.findall(text) if (t := m.lower()) not in stopwords]
    return [m.lower() for m in _CODE_RE.findall(text)]


def tokenize_identity(text: str) -> list[str]:
    """Reference ``Identity`` tokenizer (tokenizer.rs:157-202)."""
    return [text]


class _BoundedStemCache:
    """Worker-lifetime stem memo with a hard size cap — corpus vocabulary
    is tiny relative to token count, but a long-lived executor must not
    grow an unbounded dict on adversarial vocab."""

    def __init__(self, cap: int = 1 << 20) -> None:
        self._cache: dict[str, str] = {}
        self._cap = cap

    def __call__(self, token: str) -> str:
        s = self._cache.get(token)
        if s is None:
            from .stem import porter_stem

            s = porter_stem(token)
            if len(self._cache) >= self._cap:
                self._cache.clear()
            self._cache[token] = s
        return s


_STEM_CACHE = _BoundedStemCache()


def tokenize_stemmed(text: str) -> list[str]:
    """Reference ``Stemmed`` analyzer: Simple → lowercase → stem
    (tokenizer.rs:139-155; empty stoplist there too).  Re-scope: English
    Porter uniformly — the reference picks snowball by whatlang detection,
    but this corpus is source code with English identifiers/comments."""
    return [_STEM_CACHE(t.lower()) for t in _SIMPLE_RE.findall(text)]


def tokenize_stemmed_ascii(text: str) -> list[str]:
    """ASCII-class Stemmed variant (same relationship as ascii↔normal)."""
    return [_STEM_CACHE(t) for t in _ASCII_RE.findall(text.lower())]


class _LangStemCaches:
    def __init__(self) -> None:
        self._caches: dict[str, dict[str, str]] = {}

    def stem(self, lang: str, token: str) -> str:
        cache = self._caches.setdefault(lang, {})
        s = cache.get(token)
        if s is None:
            from .stem_multi import stem_for_lang

            s = stem_for_lang(lang)(token)
            if len(cache) >= (1 << 20):
                cache.clear()
            cache[token] = s
        return s


_MULTI_STEM_CACHE = _LangStemCaches()


def tokenize_stemmed_multi(text: str) -> list[str]:
    """Language-dispatching Stemmed analyzer: detect the text's language
    (stopword-overlap heuristic — the dependency-free analogue of the
    reference's per-stream whatlang call, tokenizer.rs:139-155) and stem
    with the matching Snowball stemmer (es→Spanish, de→German, everything
    else→English Porter, mirroring the reference's fallback arm)."""
    from .stem_multi import detect_lang_tokens

    toks = [t.lower() for t in _SIMPLE_RE.findall(text)]
    lang = detect_lang_tokens(toks)
    return [_MULTI_STEM_CACHE.stem(lang, t) for t in toks]


ANALYZERS = {
    "simple": tokenize_simple,
    "normal": tokenize_normal,
    "ascii": tokenize_ascii,
    "code": tokenize_code,
    "identity": tokenize_identity,
    "stemmed": tokenize_stemmed,
    "stemmed_ascii": tokenize_stemmed_ascii,
    "stemmed_multi": tokenize_stemmed_multi,
}


def get_analyzer(name: str):
    try:
        return ANALYZERS[name]
    except KeyError:  # pragma: no cover
        raise ValueError(f"unknown analyzer {name!r}; one of {sorted(ANALYZERS)}")


# Tokenization-behavior dependencies per analyzer: the regex patterns and
# filter-chain markers whose change alters what an index's postings look
# like.  Bump a marker string when a filter's BEHAVIOR changes without its
# pattern changing.
_ANALYZER_DEPS: dict[str, tuple[str, ...]] = {
    "simple": (_SIMPLE_RE.pattern,),
    "normal": (_SIMPLE_RE.pattern, "lowercase:v1", "stoplist:v1"),
    "ascii": (_ASCII_RE.pattern, SQL_TOKEN_PATTERN, "lowercase:v1"),
    "code": (_CODE_RE.pattern, "lowercase:v1", "stoplist:v1"),
    "identity": ("identity:v1",),
    "stemmed": (_SIMPLE_RE.pattern, "lowercase:v1", "porter:v1"),
    "stemmed_ascii": (_ASCII_RE.pattern, "lowercase:v1", "porter:v1"),
    "stemmed_multi": (
        _SIMPLE_RE.pattern, "lowercase:v1", "porter:v1",
        "snowball-es:v1", "snowball-de:v1", "langdetect:v1",
    ),
}


def analyzer_fingerprint(name: str) -> str:
    """Stable fingerprint of an analyzer's tokenization behavior.

    Stamped into ``stats.json`` at build time and checked when an index is
    opened: a persisted index whose postings were tokenized under an older
    definition of the same analyzer (e.g. the round-3 ``_SIMPLE_RE``
    class change) must FAIL LOUDLY instead of silently tokenizing queries
    differently from its postings (term misses, shifted phrase
    positions)."""
    import hashlib

    deps = _ANALYZER_DEPS.get(name)
    if deps is None:  # pragma: no cover
        raise ValueError(f"unknown analyzer {name!r}")
    payload = "\x1f".join((name,) + deps).encode("utf-8")
    return hashlib.sha1(payload).hexdigest()[:16]


def term_freqs(tokens: Iterable[str]) -> dict[str, int]:
    tf: dict[str, int] = {}
    for t in tokens:
        tf[t] = tf.get(t, 0) + 1
    return tf


def term_positions(tokens: Iterable[str]) -> dict[str, list[int]]:
    """Token → positions (0-based), mirroring WithFreqsAndPositions
    (reference src/schema.rs:117-122)."""
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(tokens):
        pos.setdefault(t, []).append(i)
    return pos
