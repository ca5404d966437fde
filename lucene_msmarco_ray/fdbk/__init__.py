from .rlm import (
    TopDocsTermStats,
    expand_query,
    kldiv_rerank,
    rm1_weights,
    rm_conditional_weights,
)

__all__ = ["TopDocsTermStats", "rm1_weights", "rm_conditional_weights",
           "kldiv_rerank", "expand_query"]
