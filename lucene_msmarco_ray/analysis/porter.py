"""Porter stemmer — a faithful implementation of the classic algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3), 1980).

The reference gets stemming from Lucene's ``EnglishAnalyzer`` (reference:
src/main/java/indexing/MsMarcoIndexer.java:25-46), whose final stage is the
PorterStemFilter implementing this same published algorithm. We implement it
from the published description, not from any Lucene source.

Words of length <= 2 are returned unchanged (per the paper).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_consonant(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        # 'y' is a consonant at position 0, else consonant iff preceded by a vowel
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in [C](VC)^m[V]."""
    m = 0
    i, n = 0, len(stem)
    # skip initial consonants
    while i < n and _is_consonant(stem, i):
        i += 1
    while i < n:
        # in a vowel run
        while i < n and not _is_consonant(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_consonant(stem, i):
            i += 1
    return m


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o condition: stem ends cvc where final c is not w, x or y."""
    if len(word) < 3:
        return False
    n = len(word)
    return (
        _is_consonant(word, n - 3)
        and not _is_consonant(word, n - 2)
        and _is_consonant(word, n - 1)
        and word[-1] not in "wxy"
    )


def _replace_m(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If word ends with suffix and measure(stem) > min_m-? apply; here
    min_m is the strict lower bound: m > min_m-1 i.e. m >= min_m."""
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) >= min_m:
        return stem + repl
    return word  # suffix matched but condition failed → stop trying others


def stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # ---- Step 1a ----
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- Step 1b ----
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _contains_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _contains_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_consonant(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"

    # ---- Step 1c ----
    if w.endswith("y") and _contains_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- Step 2 (m > 0) ----
    _STEP2 = (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    )
    for suf, repl in _STEP2:
        r = _replace_m(w, suf, repl, 1)
        if r is not None:
            w = r
            break

    # ---- Step 3 (m > 0) ----
    _STEP3 = (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    )
    for suf, repl in _STEP3:
        r = _replace_m(w, suf, repl, 1)
        if r is not None:
            w = r
            break

    # ---- Step 4 (m > 1) ----
    _STEP4 = (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    )
    for suf in _STEP4:
        if w.endswith(suf):
            stem_ = w[: len(w) - len(suf)]
            if suf == "ion" and (not stem_ or stem_[-1] not in "st"):
                break
            if _measure(stem_) > 1:
                w = stem_
            break

    # ---- Step 5a ----
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]

    # ---- Step 5b ----
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]

    return w


class CachingStemmer:
    """Per-worker stem cache; natural-language vocabularies repeat heavily, so
    the cache turns stemming into a dict lookup in the hot path. Construct once
    per actor / task (SURVEY.md T6)."""

    __slots__ = ("_cache",)

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}

    def __call__(self, word: str) -> str:
        s = self._cache.get(word)
        if s is None:
            s = stem(word)
            self._cache[word] = s
        return s
