"""Porter stemmer (classic 1980 algorithm) for the ``Stemmed`` analyzer.

Reference: the ``Stemmed`` tokenizer is Simple → lowercase → per-language
snowball stemmer (/root/reference/src/tokenizer.rs:139-155, stemming
behavior tests src/inverted_index.rs:480-1055).  This is a from-scratch
implementation of M. Porter, "An algorithm for suffix stripping",
Program 14(3) 1980 — the English stemmer of that family — in pure Python
(no snowball bindings exist in this container).  Deliberate re-scope:
the reference picks the stemmer by whatlang detection; this corpus is
source code with English identifiers/comments, so English is applied
uniformly (the analyzer accepts any callable for other languages).

The stemmer is a pure function of the token; ``StemCache`` memoizes per
Arrow batch, since corpus vocabulary is tiny relative to token count.
"""

from __future__ import annotations

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    """Porter consonant: not aeiou, and 'y' only when it follows a vowel
    (i.e. 'y' after a consonant acts as a vowel)."""
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in [C](VC)^m[V]."""
    m = 0
    i, n = 0, len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)
    )


def _ends_cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


# (suffix, replacement, min_m) rule tables — longest suffix wins within a
# step; if its m-condition fails, NO other rule of the step applies.
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _longest_rule(w: str, rules):
    best = None
    for suf, rep in rules:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def porter_stem(word: str) -> str:
    """Classic Porter stem of a lowercase word; words of length ≤ 2 are
    returned unchanged (the paper's k > 1 guard)."""
    w = word
    if len(w) <= 2:
        return w

    # ---- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b
    fired = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            fired = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            fired = True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"

    # ---- step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- step 2
    r = _longest_rule(w, _STEP2)
    if r and _measure(w[: len(w) - len(r[0])]) > 0:
        w = w[: len(w) - len(r[0])] + r[1]

    # ---- step 3
    r = _longest_rule(w, _STEP3)
    if r and _measure(w[: len(w) - len(r[0])]) > 0:
        w = w[: len(w) - len(r[0])] + r[1]

    # ---- step 4
    best = None
    for suf in _STEP4:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best:
        stem = w[: len(w) - len(best)]
        if _measure(stem) > 1 and (best != "ion" or stem[-1:] in ("s", "t")):
            w = stem

    # ---- step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # ---- step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


class StemCache:
    """Vocabulary-memoized stemming (corpus vocab ≪ token count)."""

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}

    def __call__(self, token: str) -> str:
        s = self._cache.get(token)
        if s is None:
            s = porter_stem(token)
            self._cache[token] = s
        return s


def stem_tokens(tokens: list[str], cache: StemCache | None = None) -> list[str]:
    c = cache or StemCache()
    return [c(t) for t in tokens]
