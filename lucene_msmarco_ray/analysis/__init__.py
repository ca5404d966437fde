from .analyzer import (
    EnglishAnalyzer,
    SimpleAnalyzer,
    WhitespaceAnalyzer,
    get_analyzer,
    normalize_numbers,
)
from .porter import CachingStemmer, stem
from .stopwords import LUCENE_ENGLISH_STOP_SET, load_stopwords

__all__ = [
    "EnglishAnalyzer", "SimpleAnalyzer", "WhitespaceAnalyzer", "get_analyzer",
    "normalize_numbers", "CachingStemmer", "stem",
    "LUCENE_ENGLISH_STOP_SET", "load_stopwords",
]
