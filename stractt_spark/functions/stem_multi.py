"""Per-language stemming: Snowball Spanish + German (from the published
algorithm descriptions, snowballstem.org) and a language-dispatching
Stemmed analyzer.

The reference's ``Stemmed`` tokenizer runs whatlang over the text being
tokenized and picks the matching Snowball stemmer
(/root/reference/src/tokenizer.rs:24-47,139-155 — es→Spanish, de→German,
…, everything else→English).  Here the detector is the same
stopword-overlap heuristic as operators/textstats.language_id (the
dependency-free whatlang analogue), and the dispatch covers the corpus
languages: en→Porter English, es→Snowball Spanish, de→Snowball German;
fr/zh fall back to English like the reference's unmapped languages.

Both stemmers below are independent from-scratch implementations of the
published algorithms (no Snowball runtime): regions R1/R2/RV are marked
once as positions on the original word and persist through the steps,
exactly as the Snowball among/setlimit machinery does.
"""

from __future__ import annotations

# --------------------------------------------------------------- Spanish

_SP_VOWELS = frozenset("aeiouáéíóúü")

_SP_PRONOUNS = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_SP_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")   # delete + de-accent
_SP_PRE_B = ("ando", "iendo", "ar", "er", "ir")   # delete
_SP_ACCENT = str.maketrans("áéíóú", "aeiou")

_SP_G1 = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
    "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
    "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa",
)
_SP_G2 = (
    "aciones", "adoras", "adores", "ancias", "adora", "ación", "antes",
    "ancia", "ador", "ante",
)
_SP_G6_PRE = ("os", "ic", "ad")
_SP_2A = (
    "yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
    "ya", "ye", "yo", "yó",
)
_SP_2B_GU = ("emos", "éis", "en", "es")
_SP_2B = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aremos", "eríais", "eremos", "iríais", "iremos", "ierais",
    "ieseis", "asteis", "isteis", "ábamos", "áramos", "ásemos",
    "arían", "arías", "aréis", "erían", "erías", "eréis", "irían",
    "irías", "iréis", "ieran", "iesen", "ieron", "iendo", "ieras",
    "ieses", "abais", "arais", "aseis", "íamos", "arán", "arás",
    "aría", "erán", "erás", "ería", "irán", "irás", "iría", "iera",
    "iese", "aste", "iste", "aban", "aran", "asen", "aron", "ando",
    "abas", "adas", "idas", "aras", "ases", "íais", "ados", "idos",
    "amos", "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba",
    "ada", "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis",
    "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as", "ís",
)
_SP_3 = ("os", "a", "o", "á", "í", "ó")


def _region_after(w: str, start: int, vowels: frozenset) -> int:
    """Standard Snowball region: position after the first non-vowel that
    follows a vowel, scanning from ``start``; end of word if absent."""
    n = len(w)
    i = start
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    return i + 1 if i < n else n


def _sp_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _SP_VOWELS:
        i = 2
        while i < n and w[i] not in _SP_VOWELS:
            i += 1
        return i + 1 if i < n else n
    if w[0] in _SP_VOWELS and w[1] in _SP_VOWELS:
        i = 2
        while i < n and w[i] in _SP_VOWELS:
            i += 1
        return i + 1 if i < n else n
    return 3


def spanish_stem(word: str) -> str:
    """Snowball Spanish stemmer (published algorithm, implemented from
    the description).  Input must be lowercase."""
    w = word
    if len(w) <= 2:
        return w.translate(_SP_ACCENT)
    rv = _sp_rv(w)
    r1 = _region_after(w, 0, _SP_VOWELS)
    r2 = _region_after(w, r1, _SP_VOWELS)

    def in_rv(suffix_len: int, base: str = None) -> bool:
        s = w if base is None else base
        return len(s) - suffix_len >= rv

    # ---- step 0: attached pronoun — the pronoun among runs inside the
    # RV limit (a pronoun not in RV is no match, shorter ones may still
    # match); once a pronoun matches, the base-ending conditions do NOT
    # backtrack to shorter pronouns
    for p in sorted(_SP_PRONOUNS, key=len, reverse=True):
        if not w.endswith(p) or len(w) - len(p) < rv:
            continue
        stemless = w[: -len(p)]
        for a in sorted(_SP_PRE_A, key=len, reverse=True):
            if stemless.endswith(a) and len(stemless) - len(a) >= rv:
                w = stemless.translate(_SP_ACCENT)
                break
        else:
            for b in sorted(_SP_PRE_B, key=len, reverse=True):
                if stemless.endswith(b) and len(stemless) - len(b) >= rv:
                    w = stemless
                    break
            else:
                if (
                    stemless.endswith("yendo")
                    and stemless[: -5].endswith("u")
                    and len(stemless) - 5 >= rv
                ):
                    w = stemless
        break

    # ---- step 1: standard suffixes (longest match, single attempt)
    step1_done = False

    def _ends_r2(s: str, suf: str) -> bool:
        return s.endswith(suf) and len(s) - len(suf) >= r2

    all_s1 = sorted(
        set(_SP_G1) | set(_SP_G2) | {"logías", "logía", "uciones", "ución",
                                     "encias", "encia", "amente", "mente",
                                     "idades", "idad", "ivas", "ivos",
                                     "iva", "ivo"},
        key=len, reverse=True,
    )
    for suf in all_s1:
        if not w.endswith(suf):
            continue
        base = w[: -len(suf)]
        if suf in _SP_G1:
            if len(base) >= r2:
                w = base
                step1_done = True
        elif suf in _SP_G2:
            if len(base) >= r2:
                w = base
                step1_done = True
                if _ends_r2(w, "ic"):
                    w = w[:-2]
        elif suf in ("logías", "logía"):
            if len(base) >= r2:
                w = base + "log"
                step1_done = True
        elif suf in ("uciones", "ución"):
            if len(base) >= r2:
                w = base + "u"
                step1_done = True
        elif suf in ("encias", "encia"):
            if len(base) >= r2:
                w = base + "ente"
                step1_done = True
        elif suf == "amente":
            if len(base) >= r1:
                w = base
                step1_done = True
                if _ends_r2(w, "iv"):
                    w = w[:-2]
                    if _ends_r2(w, "at"):
                        w = w[:-2]
                else:
                    for pre in _SP_G6_PRE:
                        if _ends_r2(w, pre):
                            w = w[: -len(pre)]
                            break
        elif suf == "mente":
            if len(base) >= r2:
                w = base
                step1_done = True
                for pre in ("ante", "able", "ible"):
                    if _ends_r2(w, pre):
                        w = w[: -len(pre)]
                        break
        elif suf in ("idades", "idad"):
            if len(base) >= r2:
                w = base
                step1_done = True
                for pre in ("abil", "ic", "iv"):
                    if _ends_r2(w, pre):
                        w = w[: -len(pre)]
                        break
        elif suf in ("ivas", "ivos", "iva", "ivo"):
            if len(base) >= r2:
                w = base
                step1_done = True
                if _ends_r2(w, "at"):
                    w = w[:-2]
        break  # longest match only — no backtracking to shorter suffixes

    # ---- step 2a: verb suffixes beginning y (only if step 1 did nothing)
    step2a_done = False
    if not step1_done:
        for suf in sorted(_SP_2A, key=len, reverse=True):
            if not w.endswith(suf) or len(w) - len(suf) < rv:
                continue  # outside RV ⇒ no match, shorter may still match
            if w[: -len(suf)].endswith("u"):
                w = w[: -len(suf)]
                step2a_done = True
            break  # 'u' condition failure does not backtrack

    # ---- step 2b: other verb suffixes
    if not step1_done and not step2a_done:
        for suf in sorted(set(_SP_2B) | set(_SP_2B_GU), key=len, reverse=True):
            if not w.endswith(suf) or len(w) - len(suf) < rv:
                continue
            w = w[: -len(suf)]
            if suf in _SP_2B_GU and w.endswith("gu") and len(w) - 1 >= rv:
                w = w[:-1]
            break

    # ---- step 3: residual suffix
    for suf in _SP_3:
        if w.endswith(suf) and len(w) - len(suf) >= rv:
            w = w[: -len(suf)]
            break
    else:
        for suf in ("e", "é"):
            if w.endswith(suf) and len(w) - 1 >= rv:
                w = w[:-1]
                if w.endswith("gu") and len(w) - 1 >= rv:
                    w = w[:-1]
                break

    return w.translate(_SP_ACCENT)


# ---------------------------------------------------------------- German

_DE_VOWELS = frozenset("aeiouyäöü")
_DE_S_END = frozenset("bdfghklmnrt")
_DE_ST_END = frozenset("bdfghklmnt")
_DE_FINAL = str.maketrans({"ä": "a", "ö": "o", "ü": "u", "U": "u", "Y": "y"})


def german_stem(word: str) -> str:
    """Snowball German stemmer (published algorithm, implemented from the
    description).  Input must be lowercase."""
    w = word.replace("ß", "ss")
    # mark u/y between vowels as consonants
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS and chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    vowels = _DE_VOWELS

    r1 = _region_after(w, 0, vowels)
    r1 = max(r1, 3)  # region before R1 must hold ≥3 letters
    r2 = _region_after(w, _region_after(w, 0, vowels), vowels)

    def ends_r(s: str, suf: str, r: int) -> bool:
        return s.endswith(suf) and len(s) - len(suf) >= r

    def longest(s: str, suffixes) -> str | None:
        best = None
        for suf in suffixes:
            if s.endswith(suf) and (best is None or len(suf) > len(best)):
                best = suf
        return best

    # ---- step 1 — ONE among over all groups: the longest suffix present
    # is matched and its condition tested once, with no backtracking to a
    # shorter suffix when the condition fails
    suf = longest(w, ("em", "ern", "er", "e", "en", "es", "s"))
    if suf in ("em", "ern", "er"):
        if ends_r(w, suf, r1):
            w = w[: -len(suf)]
    elif suf in ("e", "en", "es"):
        if ends_r(w, suf, r1):
            w = w[: -len(suf)]
            if w.endswith("niss"):
                w = w[:-1]
    elif suf == "s":
        if ends_r(w, "s", r1) and len(w) >= 2 and w[-2] in _DE_S_END:
            w = w[:-1]

    # ---- step 2
    suf = longest(w, ("en", "er", "est", "st"))
    if suf in ("en", "er", "est"):
        if ends_r(w, suf, r1):
            w = w[: -len(suf)]
    elif suf == "st":
        if (
            ends_r(w, "st", r1)
            and len(w) >= 6  # st-ending preceded by ≥3 letters
            and w[-3] in _DE_ST_END
        ):
            w = w[:-2]

    # ---- step 3: d-suffixes
    suf = longest(w, ("end", "ung", "ig", "ik", "isch", "lich", "heit",
                      "keit"))
    if suf in ("end", "ung"):
        if ends_r(w, suf, r2):
            w = w[: -len(suf)]
            if ends_r(w, "ig", r2) and not w[: -2].endswith("e"):
                w = w[:-2]
    elif suf in ("ig", "ik", "isch"):
        if ends_r(w, suf, r2) and not w[: -len(suf)].endswith("e"):
            w = w[: -len(suf)]
    elif suf in ("lich", "heit"):
        if ends_r(w, suf, r2):
            w = w[: -len(suf)]
            for pre in ("er", "en"):
                if ends_r(w, pre, r1):
                    w = w[: -len(pre)]
                    break
    elif suf == "keit":
        if ends_r(w, "keit", r2):
            w = w[:-4]
            for pre in ("lich", "ig"):
                if ends_r(w, pre, r2):
                    w = w[: -len(pre)]
                    break

    return w.translate(_DE_FINAL)


# ------------------------------------------------- language dispatch

# mirrors operators/textstats.LANG_STOPWORDS + its tie rule (hits desc,
# lang DESC) — duplicated there as Spark/SQL expressions, single source
# of the sets
def detect_lang_tokens(tokens: list[str]) -> str:
    from ..operators.textstats import LANG_STOPWORDS

    best = ("", -1)
    for lang in sorted(LANG_STOPWORDS):
        stops = LANG_STOPWORDS[lang]
        hits = sum(1 for t in tokens if t in stops)
        if hits > best[1] or (hits == best[1] and lang > best[0]):
            best = (lang, hits)
    return best[0]


LANG_STEMMERS = {
    "es": spanish_stem,
    "de": german_stem,
    # fr / zh and everything unmapped fall back to English Porter, like
    # the reference's `_ => Stemmer::new(Language::English)` arm
}


def stem_for_lang(lang: str):
    if lang in LANG_STEMMERS:
        return LANG_STEMMERS[lang]
    from .stem import porter_stem

    return porter_stem
