"""Analysis chain: text → terms.

Reproduces the reference's term identity (SURVEY.md §1.2):

1. number normalization: regex ``(-)?\\d+(\\.\\d*)?`` → `` _NUM_ ``
   (reference: src/main/java/indexing/MsMarcoIndexer.java:62-64, test at
   src/main/java/retrieval/NumberReplacementTest.java:8);
2. "english": standard-tokenize → lowercase → possessive strip → stop-word
   removal → Porter stem (reference: indexing/MsMarcoIndexer.java:25-46,
   analyze() helper :112-135, duplicated utils/IndexUtils.java:64-86);
3. "whitespace": plain whitespace split, no lowercase/stop/stem — the BPE
   pre-tokenized path (reference: indexing/MsMarcoIndexer.java:27-28,
   tokenization/bpe_msmarco.sh);
4. "simple": lowercase + word-regex split (no stop/stem) — our SQL-oracle
   friendly analyzer used by the DuckDB correctness gate.

Analyzers are plain callables ``str -> list[str]``; construct once per worker
(module-level singletons via :func:`get_analyzer` or in an actor ``__init__``,
SURVEY.md T6) so regexes/stem caches are reused across batches.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from .porter import CachingStemmer
from .stopwords import load_stopwords

# Exactly the reference regex (MsMarcoIndexer.java:62-64): optional leading
# minus, digits, optional decimal tail → replaced with " _NUM_ ".
_NUM_RE = re.compile(r"(-)?\d+(\.\d*)?")
NUM_TOKEN = "_NUM_"

# Standard-tokenizer approximation: runs of word chars (Unicode-aware, like
# Lucene's UAX#29 StandardTokenizer), keeping word-internal apostrophes (so
# the possessive filter has something to strip).
_WORD_RE = re.compile(r"\w+(?:'\w+)*", re.UNICODE)
_POSSESSIVE_RE = re.compile(r"'s$")


def normalize_numbers(text: str) -> str:
    return _NUM_RE.sub(" _NUM_ ", text)


class EnglishAnalyzer:
    """lowercase → tokenize → strip possessive → stop-remove → Porter stem."""

    def __init__(self, stopword_file: str | None = None,
                 normalize_nums: bool = True) -> None:
        self.stops = load_stopwords(stopword_file)
        self.stem = CachingStemmer()
        self.normalize_nums = normalize_nums

    def __call__(self, text: str) -> list[str]:
        if self.normalize_nums:
            text = normalize_numbers(text)
        text = text.lower()
        out = []
        stops = self.stops
        stem = self.stem
        for tok in _WORD_RE.findall(text):
            if tok.endswith("'s"):      # possessive filter, no regex per token
                tok = tok[:-2]
            if tok in stops:
                continue
            if tok == "_num_":
                out.append(NUM_TOKEN)
                continue
            out.append(stem(tok))
        return out


class WhitespaceAnalyzer:
    """Pure whitespace split; no case folding (Lucene WhitespaceAnalyzer
    semantics — the reference's fallback path, MsMarcoIndexer.java:27-28)."""

    def __init__(self, normalize_nums: bool = False) -> None:
        self.normalize_nums = normalize_nums

    def __call__(self, text: str) -> list[str]:
        if self.normalize_nums:
            text = normalize_numbers(text)
        return text.split()


class SimpleAnalyzer:
    """lowercase + word split — semantics expressible in ANSI SQL, used for
    the DuckDB oracle gate (string_split on single spaces matches because the
    fixture corpus is single-space separated; general text uses the regex)."""

    def __init__(self, normalize_nums: bool = False) -> None:
        self.normalize_nums = normalize_nums
        self._re = re.compile(r"[0-9a-z_]+")

    def __call__(self, text: str) -> list[str]:
        if self.normalize_nums:
            text = normalize_numbers(text)
        return self._re.findall(text.lower())


_REGISTRY: dict[str, Callable[..., Callable[[str], list[str]]]] = {
    "english": EnglishAnalyzer,
    "whitespace": WhitespaceAnalyzer,
    "simple": SimpleAnalyzer,
}

_SINGLETONS: dict[tuple, Callable[[str], list[str]]] = {}


def get_analyzer(name: str, stopword_file: str | None = None,
                 normalize_nums: bool | None = None) -> Callable[[str], list[str]]:
    """Per-process analyzer singleton (state — stem cache, stop set, compiled
    regexes — built once per worker, reused across batches)."""
    if name == "english":
        key = (name, stopword_file, True if normalize_nums is None else normalize_nums)
        if key not in _SINGLETONS:
            _SINGLETONS[key] = EnglishAnalyzer(stopword_file, key[2])
        return _SINGLETONS[key]
    if name not in _REGISTRY:
        raise ValueError(f"unknown analyzer {name!r}; options: {sorted(_REGISTRY)}")
    key = (name, bool(normalize_nums))
    if key not in _SINGLETONS:
        _SINGLETONS[key] = _REGISTRY[name](normalize_nums=bool(normalize_nums))
    return _SINGLETONS[key]
