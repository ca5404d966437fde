from .methods import (
    QPP_REGISTRY,
    avg_idf,
    cumulative_nqc,
    max_idf,
    nqc,
    qpp_idfs,
    rsd,
    uef,
)

__all__ = ["QPP_REGISTRY", "nqc", "cumulative_nqc", "avg_idf", "max_idf",
           "qpp_idfs", "rsd", "uef"]
