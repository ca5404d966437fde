"""Query-performance-prediction estimators (SURVEY.md A12-A18) — semantics
mirrored from the reference, quirks flagged:

* idf here is ln(N/df) — NOT the BM25 idf (reference:
  src/main/java/qpp/BaseIDFSpecificity.java:44-87). Query terms are a SET
  (extractTerms de-duplicates). Two different df=0 conventions coexist in the
  reference and are kept: ``max_idf``/``avg_idf`` SKIP df=0 terms
  (BaseIDFSpecificity.java:56-62, AvgIDFSpecificity.java:42-61 — avg still
  divides by the full term count); the idf vector used inside NQC maps df=0
  to df=1 (BaseIDFSpecificity.java idfs(), "avoid 0 error").
* NQC (NQCSpecificity.java:25-62): population variance of the top-k scores
  × mean idf (df=0→1 convention).
* CumulativeNQC (CumulativeNQC.java:14-21): Σ_{i=1..k-1} NQC@i, divided by k.
* RSD (RSDSpecificity.java:16-51): 10 samples; each shuffles the ranked list
  and takes the first min(20, n) docs; estimate = mean over samples of
  RBO(full, sample) × baseQPP(sample). The reference uses one shared
  java.util.Random(314152) whose consumption order depends on query
  processing order — a non-reproducible global. Our deviation (flagged,
  round 2): the per-(qid, sample) shuffle is a deterministic ARITHMETIC
  pseudo-permutation (multiplicative hash mod 2^31-1 over (doc_id, sample,
  qid), ordered ascending) — run-order independent AND reproducible by the
  DuckDB gate oracle in plain SQL. The estimator's statistical role (random
  rank-perturbation) is preserved; the exact sample sets differ from any
  seeded-RNG variant, as they already did from the reference's.
* UEF (UEFSpecificity.java:29-66): 10 samples; fit RM-conditional on each
  sample, KL-div rerank the sample, rank-dist(full, reranked-sample); final
  = NUM_SAMPLES/Σdist × baseQPP(full).
* PreComputed (PreComputedPredictor.java:38-56): qid → score lookup.
"""

from __future__ import annotations

import math
from zlib import crc32

import numpy as np

from ..eval.correlation import rank_dist, rbo
from ..fdbk.rlm import (
    RLM_NUM_TOP_DOCS,
    TopDocsTermStats,
    kldiv_rerank,
    rm_conditional_weights,
)

NUM_SAMPLES = 10


def qpp_idfs(terms: list[str], num_docs: int, df_lookup) -> np.ndarray:
    """idf vector for NQC: ln(N/df), df=0 → 1 (reference 'avoid 0 error')."""
    uniq = sorted(set(terms))
    out = np.empty(len(uniq))
    for i, t in enumerate(uniq):
        df = df_lookup(t) or 1
        out[i] = math.log(num_docs / df)
    return out


def max_idf(terms: list[str], num_docs: int, df_lookup) -> float:
    best = 0.0
    for t in set(terms):
        df = df_lookup(t)
        if df:
            best = max(best, math.log(num_docs / df))
    return best


def avg_idf(terms: list[str], num_docs: int, df_lookup) -> float:
    uniq = set(terms)
    s = 0.0
    for t in uniq:
        df = df_lookup(t)
        if df:
            s += math.log(num_docs / df)
    return s / len(uniq) if uniq else 0.0


def nqc(scores: np.ndarray, k: int, terms: list[str], num_docs: int,
        df_lookup) -> float:
    rsvs = np.asarray(scores, np.float64)[:k]
    if rsvs.size == 0:
        return 0.0
    var = float(np.mean((rsvs - rsvs.mean()) ** 2))
    idfs = qpp_idfs(terms, num_docs, df_lookup)
    avg = float(idfs.mean()) if idfs.size else 1.0
    return var * avg


def cumulative_nqc(scores: np.ndarray, k: int, terms: list[str],
                   num_docs: int, df_lookup) -> float:
    s = sum(nqc(scores, i, terms, num_docs, df_lookup) for i in range(1, k))
    return s / k


M31 = (1 << 31) - 1
_SAMPLE_A = 1315423911      # doc multiplier
_SAMPLE_B = 2654435761      # sample-index multiplier
_SAMPLE_C = 97              # qid multiplier


def _qid_key(qid: str) -> int:
    s = str(qid)
    return int(s) if s.isdigit() else crc32(s.encode())


def sample_order_keys(doc_ids: np.ndarray, qid: str, i: int) -> np.ndarray:
    """Deterministic pseudo-shuffle key per (doc, sample, qid):
    ((doc+1)·A + (i+1)·B + qid·C) mod 2^31-1 — all products < 2^62, exact in
    int64, and recomputable in SQL (the gate oracle embeds this formula)."""
    d = np.asarray(doc_ids, np.int64)
    return ((d + 1) * _SAMPLE_A + (i + 1) * _SAMPLE_B
            + _qid_key(qid) * _SAMPLE_C) % M31


def _sample_topdocs(topdocs: list[tuple[int, float]], qid: str, i: int,
                    k: int) -> list[tuple[int, float]]:
    ids = np.fromiter((d for d, _ in topdocs), np.int64, len(topdocs))
    h = sample_order_keys(ids, qid, i)
    order = np.lexsort((ids, h))[: min(len(topdocs), k)]
    return [topdocs[j] for j in order]


def rsd(topdocs: list[tuple[int, float]], k: int, terms: list[str],
        num_docs: int, df_lookup, qid: str = "",
        base=nqc) -> float:
    """topdocs: [(doc_id, score)] ranked. base is the NQC-style estimator."""
    full_ids = [d for d, _ in topdocs]
    total = 0.0
    for i in range(NUM_SAMPLES):
        sample = _sample_topdocs(topdocs, qid, i,
                                 min(RLM_NUM_TOP_DOCS, len(topdocs)))
        est = base(np.array([s for _, s in sample]), k, terms, num_docs, df_lookup)
        sim = rbo(full_ids, [d for d, _ in sample], k=len(full_ids), p=0.9)
        total += sim * est
    return total / NUM_SAMPLES


def uef(topdocs: list[tuple[int, float]], doc_vectors: dict[int, dict[str, int]],
        k: int, terms: list[str], num_docs: int, df_lookup, qid: str = "",
        base=nqc) -> float:
    full_ids = [d for d, _ in topdocs]
    total_dist = 0.0
    for i in range(NUM_SAMPLES):
        sample = _sample_topdocs(topdocs, qid, 7919 + i,
                                 min(RLM_NUM_TOP_DOCS, len(topdocs)))
        stats = TopDocsTermStats(sample, doc_vectors, len(sample))
        if not stats.docvecs or stats.sum_sim == 0:
            continue
        weights = rm_conditional_weights(stats)
        reranked = kldiv_rerank(stats, weights, sample)
        total_dist += rank_dist(full_ids, [d for d, _ in reranked])
    if total_dist == 0:
        return 0.0
    base_est = base(np.array([s for _, s in topdocs]), k, terms, num_docs,
                    df_lookup)
    return (NUM_SAMPLES / total_dist) * base_est


def corel_specificity(base_estimate: float,
                      knn_queries: list[tuple[str, float]],
                      rel_docs_of, base_idf_fn, lam: float) -> float:
    """A17 CoRel (reference: qpp/CoRelSpecificity.java:28-115, the live
    uncommented path): λ·variantSpec + (1−λ)·Σ refSim·base(rq)/Σ refSim over
    KNN queries that have rel docs.

    Reference quirks, kept/flagged: the per-knn estimate calls the base
    model with topDocs=null (:107) — only IDF-family estimators (which
    ignore the ranked list) survive that, so ``base_idf_fn(qid)`` here is an
    avg/max-IDF-style estimate of the knn query; the doc→query-index search
    (:100-104) computes a result that is never used (dead code — not
    executed here); knn queries without rel docs are skipped (:93-95).

    ``base_estimate`` is the VariantSpecificity estimate of the original
    query (CoRel extends VariantSpecificity, :36).
    """
    score = 0.0
    z = 0.0
    for qid, ref_sim in knn_queries:
        rel = rel_docs_of(qid)
        if not rel:
            continue
        score += ref_sim * base_idf_fn(qid)
        z += ref_sim
    if z == 0:
        return lam * base_estimate
    return lam * base_estimate + (1 - lam) * score / z


class PreComputedPredictor:
    """qid → precomputed score (reference: qpp/PreComputedPredictor.java:38-56)."""

    def __init__(self, mapping: dict[str, float]):
        self.mapping = {str(k): float(v) for k, v in mapping.items()}

    def __call__(self, qid: str, *_a, **_k) -> float:
        return self.mapping.get(str(qid), 0.0)


QPP_REGISTRY = {
    "nqc": nqc, "cumnqc": cumulative_nqc, "avgidf": avg_idf,
    "maxidf": max_idf, "rsd": rsd, "uef": uef,
}
