"""Stopword sets.

The reference builds its EnglishAnalyzer over a custom 571-word stop list
(reference: src/main/java/indexing/MsMarcoIndexer.java:25-42 reading stop.txt).
We do not copy that file; the default here is the standard public Lucene
English stop set (33 words, unchanged since Lucene's earliest releases), and a
custom list can be supplied via ``EngineConfig.stopword_file`` (one word per
line, same format the reference consumes).
"""

from __future__ import annotations

LUCENE_ENGLISH_STOP_SET = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)


def load_stopwords(path: str | None) -> frozenset[str]:
    if path is None:
        return LUCENE_ENGLISH_STOP_SET
    with open(path, "r", encoding="utf-8") as f:
        return frozenset(w.strip().lower() for w in f if w.strip())
