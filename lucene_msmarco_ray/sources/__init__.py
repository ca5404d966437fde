from .corpus import read_code_corpus

__all__ = ["read_code_corpus"]
