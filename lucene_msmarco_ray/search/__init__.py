from .scoring import BM25Scorer, LMDirichletScorer, make_scorer
from .searcher import IndexReader, SearchStage, retrieve, score_query_taat

__all__ = ["BM25Scorer", "LMDirichletScorer", "make_scorer",
           "IndexReader", "SearchStage", "retrieve", "score_query_taat"]
