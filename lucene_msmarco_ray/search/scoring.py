"""Similarity functions — Lucene 8.8.0 semantics, vectorized.

BM25 (Lucene 8 formula, the one "rank-identical to Lucene BM25" requires):
    idf(term)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(d,t) = tf / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q,d)  = Σ_{t∈q} boost_t · idf(t) · tfnorm(d,t)

The reference mirrors this in its helper (reference:
src/main/java/retrieval/TermWtUtil.java:6-12 and
src/main/java/indexing/SparseVecWriter.java:29-38; note TermWtUtil.bm25Weight
multiplies idf inside the denominator — a transcription bug in the reference
helper; we follow the Lucene formula, matching the reference's actual
retrieval path which sets Lucene's BM25Similarity,
src/main/java/stochastic_qpp/QPPOnPreRetrievedResults.java:78).
Defaults (k1=0.7, b=0.3) per BASELINE.json; (1.2, 0.75) supported.

Lucene's lossy 1-byte norm encoding is deliberately NOT emulated — doc
lengths are exact (SURVEY.md §7 hard part 1; the oracle defines exact
lengths).

LM-Dirichlet (reference: src/main/java/retrieval/OneStepRetriever.java:87-88):
    p(t|C)      = (cf + 1) / (total_len + 1)        (Lucene's LMStats)
    score(q,d)  = Σ_{t∈q∩d} boost_t · max(0, ln(1 + tf/(mu·p)) + ln(mu/(dl+mu)))
with the per-term clamp at 0 as in Lucene 8's LMDirichletSimilarity.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class BM25Scorer:
    k1: float = 0.7
    b: float = 0.3

    def cache_key(self) -> tuple:
        """Hashable identity for per-(term, scorer) contribution caches.

        Every field that changes term_scores MUST appear here — the searcher
        keys decoded-posting contributions on it, so an omitted param would
        silently share scores between distinct scorers."""
        return ("bm25", self.k1, self.b)

    def idf(self, N: int, df) -> np.ndarray | float:
        return np.log(1.0 + (N - np.asarray(df, dtype=np.float64) + 0.5)
                      / (np.asarray(df, dtype=np.float64) + 0.5))

    def term_scores(self, tf: np.ndarray, dl: np.ndarray, df: int, cf: int,
                    N: int, avgdl: float, total_len: int) -> np.ndarray:
        idf = float(self.idf(N, df))
        tfn = tf / (tf + self.k1 * (1.0 - self.b + self.b * dl / avgdl))
        return idf * tfn

    def block_upper_bound(self, max_tf: np.ndarray, min_dl: np.ndarray,
                          df: int, cf: int, N: int, avgdl: float,
                          total_len: int) -> np.ndarray:
        """Valid for any block: tfnorm is increasing in tf, decreasing in dl."""
        idf = float(self.idf(N, df))
        tfn = max_tf / (max_tf + self.k1 * (1.0 - self.b + self.b * min_dl / avgdl))
        return idf * tfn


@dataclass(frozen=True)
class LMDirichletScorer:
    mu: float = 1000.0
    clamp: bool = True  # Lucene 8 clamps each term score at 0

    def cache_key(self) -> tuple:
        return ("lmdir", self.mu, self.clamp)

    def term_scores(self, tf: np.ndarray, dl: np.ndarray, df: int, cf: int,
                    N: int, avgdl: float, total_len: int) -> np.ndarray:
        p = (cf + 1.0) / (total_len + 1.0)
        s = np.log(1.0 + tf / (self.mu * p)) + np.log(self.mu / (dl + self.mu))
        return np.maximum(s, 0.0) if self.clamp else s

    def block_upper_bound(self, max_tf, min_dl, df, cf, N, avgdl, total_len):
        p = (cf + 1.0) / (total_len + 1.0)
        s = np.log(1.0 + max_tf / (self.mu * p)) + np.log(self.mu / (min_dl + self.mu))
        return np.maximum(s, 0.0) if self.clamp else s


def make_scorer(name: str, **kw):
    if name == "bm25":
        return BM25Scorer(**{k: v for k, v in kw.items() if k in ("k1", "b")})
    if name in ("lmdir", "lmdirichlet"):
        return LMDirichletScorer(**{k: v for k, v in kw.items() if k in ("mu", "clamp")})
    raise ValueError(f"unknown scorer {name!r}")
