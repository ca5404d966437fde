from .tokenize import TokenizeStage

__all__ = ["TokenizeStage"]
