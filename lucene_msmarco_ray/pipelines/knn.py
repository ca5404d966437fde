"""KNN query models and few-shot example generation (SURVEY.md T2, J4, O8,
S12; reference: src/main/java/retrieval/KNNRelModel.java).

* QueryKnn — the reference's second Lucene index over training queries
  (KNNRelModel.java:56-62, Constants.java MSMARCO_QUERY_INDEX) becomes a
  small in-memory BM25 scorer: the query corpus is tiny relative to the
  document corpus, so it is built driver-side and broadcast (T2).
* generate_fewshot — per test query: top-K related training queries, each
  with its rel docs' ranks under a fresh top-1000 retrieval and one negative
  sampled from ranks 50-150 (`50 + rand*100`, KNNRelModel.java:269 — seeded
  per (qid, reldoc) here for determinism, SURVEY.md O8).
"""

from __future__ import annotations

import math
from collections import Counter
from zlib import crc32

import numpy as np


class QueryKnn:
    """Brute-force BM25 top-k over a (small) query collection."""

    def __init__(self, queries: dict[str, list[str]], k1: float = 0.7,
                 b: float = 0.3):
        self.qids = list(queries)
        self.term_lists = [queries[q] for q in self.qids]
        self.k1, self.b = k1, b
        self.N = len(self.qids)
        self.df: Counter[str] = Counter()
        for terms in self.term_lists:
            self.df.update(set(terms))
        self.dl = np.array([len(t) for t in self.term_lists], np.float64)
        self.avgdl = float(self.dl.mean()) if self.N else 0.0

    def topk(self, terms: list[str], k: int = 10,
             exclude_qid: str | None = None) -> list[tuple[str, float]]:
        scores = np.zeros(self.N)
        tfs = [Counter(t) for t in self.term_lists]
        for term, qtf in Counter(terms).items():
            df = self.df.get(term)
            if not df:
                continue
            idf = math.log(1 + (self.N - df + 0.5) / (df + 0.5))
            for i, tf_map in enumerate(tfs):
                tf = tf_map.get(term)
                if tf:
                    tfn = tf / (tf + self.k1 * (1 - self.b
                                                + self.b * self.dl[i] / self.avgdl))
                    scores[i] += qtf * idf * tfn
        order = np.lexsort((np.arange(self.N), -scores))
        out = []
        for i in order:
            if scores[i] <= 0:
                break
            qid = self.qids[i]
            if qid == exclude_qid:
                continue
            out.append((qid, float(scores[i])))
            if len(out) >= k:
                break
        return out


def find_rank(doc_id, ranked_ids) -> int:
    """1-based rank of doc in a ranked list, -1 if absent."""
    for i, d in enumerate(ranked_ids, start=1):
        if d == doc_id:
            return i
    return -1


def sample_negative_rank(qid: str, rel_doc, lo: int = 50, span: int = 100) -> int:
    """O8: `lo + rand*span`, seeded per (qid, reldoc) — the reference uses
    unseeded Math.random (KNNRelModel.java:269)."""
    rng = np.random.default_rng((4451, crc32(str(qid).encode()),
                                 crc32(str(rel_doc).encode())))
    return lo + int(rng.integers(0, span))


def generate_fewshot(test_queries: dict[str, str], knn: QueryKnn,
                     analyzer, rel_docs_of, retrieve_fn, doc_text_of,
                     k_related: int = 10) -> list[dict]:
    """→ S12 few-shot JSON structure (KNNRelModel.java:228-291,412-441).
    ``retrieve_fn(terms, k)`` → ranked doc ids; ``doc_text_of(doc)`` → text."""
    out = []
    for qid, text in test_queries.items():
        related = []
        for rank_rq, (rq_qid, _score) in enumerate(
                knn.topk(analyzer(text), k_related, exclude_qid=qid), start=1):
            ranked = retrieve_fn(analyzer(text), 1000)
            rel = rel_docs_of(rq_qid)
            if not rel:
                continue
            doc_info = {}
            for rel_doc in sorted(rel):
                neg_rank = sample_negative_rank(rq_qid, rel_doc)
                neg_doc = (ranked[min(neg_rank, len(ranked) - 1)]
                           if ranked else None)
                doc_info = {
                    "reldoc.id": rel_doc,
                    "reldoc.text": doc_text_of(rel_doc),
                    "reldoc.lexmodel.rank": find_rank(rel_doc, ranked),
                    "nreldoc.id": neg_doc,
                    "nreldoc.text": doc_text_of(neg_doc) if neg_doc is not None else "",
                    "nreldoc.lexmodel.rank": neg_rank,
                }
            related.append({
                "msmarco.query.id": rq_qid,
                "msmarco.query.text": " ".join(knn.term_lists[knn.qids.index(rq_qid)]),
                "msmarco.query.rank": rank_rq,
                # quirk kept: the reference overwrites docInfoJsonObj per rel
                # doc and appends only the LAST one (KNNRelModel.java:255-283)
                "msmarco.qrel.info": [doc_info],
            })
        out.append({"query.id": qid, "query.text": text, "fewshots": related})
    return out
