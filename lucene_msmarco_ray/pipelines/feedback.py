"""Feedback / QPP Ray pipelines: per-query computations over a run table.

Shape (SURVEY.md §3.3): run × queries → ``groupby(qid).map_groups`` with a
callable-class stage — the IndexReader (doc lens, stats, term cache) is
per-actor state built once (T1), queries are broadcast (J4), and each group
is one query's ranked list, so no further shuffle is needed downstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..fdbk.rlm import (
    RLM_NUM_TOP_DOCS,
    TopDocsTermStats,
    expand_query,
    kldiv_rerank,
    rm1_weights,
    rm_conditional_weights,
)
from ..qpp.methods import avg_idf, cumulative_nqc, max_idf, nqc, rsd, uef
from ..search.searcher import IndexReader


def _topdocs_of(g: pd.DataFrame) -> list[tuple[int, float]]:
    g = g.sort_values("rank")
    return list(zip(g["doc_id"].astype(int), g["score"].astype(float)))


class FeedbackRerankStage:
    """One qid group → KL-div-reranked run rows (RM1 or RM-conditional).

    ``model``: "iid" | "conditional" (reference: fdbk/RelevanceModelIId vs
    RelevanceModelConditional).
    """

    __name__ = "feedback_rerank"

    def __init__(self, index_dir: str, queries_ref, model: str = "conditional",
                 num_top_docs: int = RLM_NUM_TOP_DOCS):
        self.reader = IndexReader(index_dir)
        self.queries = ray.get(queries_ref)
        from ..analysis import get_analyzer
        st = self.reader.stats
        self.analyzer = get_analyzer(
            st["analyzer"], st.get("stopword_file"),
            st.get("normalize_numbers", True) if st["analyzer"] == "english" else False)
        self.model = model
        self.num_top_docs = num_top_docs

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        qid = str(g["qid"].iloc[0])
        topdocs = _topdocs_of(g)
        vecs = self.reader.term_vectors([d for d, _ in topdocs])
        stats = TopDocsTermStats(topdocs, vecs, self.num_top_docs)
        if not stats.docvecs or stats.sum_tf == 0:
            return g[["qid", "doc_id", "rank", "score"]]
        if self.model == "iid":
            qterms = self.analyzer(self.queries.get(qid, ""))
            weights = rm1_weights(stats, qterms)
        else:
            weights = rm_conditional_weights(stats)
        reranked = kldiv_rerank(stats, weights, topdocs)
        return pd.DataFrame({
            "qid": qid,
            "doc_id": [d for d, _ in reranked],
            "rank": np.arange(1, len(reranked) + 1, dtype=np.int64),
            "score": [s for _, s in reranked],
        })


class ExpandQueryStage:
    """One qid group → RM3-expanded query rows (qid, term, boost) (R5/A6)."""

    __name__ = "expand_query"

    def __init__(self, index_dir: str, queries_ref, model: str = "conditional",
                 num_top_docs: int = RLM_NUM_TOP_DOCS, num_terms: int = 20,
                 fb: float = 0.2):
        self.inner = FeedbackRerankStage(index_dir, queries_ref, model,
                                         num_top_docs)
        self.num_terms = num_terms
        self.fb = fb

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        self_ = self.inner
        qid = str(g["qid"].iloc[0])
        topdocs = _topdocs_of(g)
        vecs = self_.reader.term_vectors([d for d, _ in topdocs])
        stats = TopDocsTermStats(topdocs, vecs, self_.num_top_docs)
        qterms = self_.analyzer(self_.queries.get(qid, ""))
        if not stats.docvecs or stats.sum_tf == 0:
            return pd.DataFrame({"qid": qid, "term": qterms,
                                 "boost": [1.0 - self.fb] * len(qterms)})
        if self_.model == "iid":
            weights = rm1_weights(stats, qterms)
        else:
            weights = rm_conditional_weights(stats)
        expanded = expand_query(weights, qterms, self_.reader.num_docs,
                                self_.reader.df, self.num_terms, self.fb)
        return pd.DataFrame({"qid": qid,
                             "term": [t for t, _ in expanded],
                             "boost": [b for _, b in expanded]})


class QPPStage:
    """One qid group → one row of QPP estimates (A12-A16)."""

    __name__ = "qpp_stage"

    def __init__(self, index_dir: str, queries_ref, k: int = 50,
                 methods: tuple[str, ...] = ("nqc", "cumnqc", "avgidf",
                                             "maxidf", "rsd", "uef")):
        self.reader = IndexReader(index_dir)
        self.queries = ray.get(queries_ref)
        from ..analysis import get_analyzer
        st = self.reader.stats
        self.analyzer = get_analyzer(
            st["analyzer"], st.get("stopword_file"),
            st.get("normalize_numbers", True) if st["analyzer"] == "english" else False)
        self.k = k
        self.methods = methods

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        qid = str(g["qid"].iloc[0])
        topdocs = _topdocs_of(g)
        scores = np.array([s for _, s in topdocs])
        terms = self.analyzer(self.queries.get(qid, ""))
        N, dfl, k = self.reader.num_docs, self.reader.df, self.k
        row: dict = {"qid": qid}
        for m in self.methods:
            if m == "nqc":
                row[m] = nqc(scores, k, terms, N, dfl)
            elif m == "cumnqc":
                row[m] = cumulative_nqc(scores, min(k, len(scores)), terms, N, dfl)
            elif m == "avgidf":
                row[m] = avg_idf(terms, N, dfl)
            elif m == "maxidf":
                row[m] = max_idf(terms, N, dfl)
            elif m == "rsd":
                row[m] = rsd(topdocs, k, terms, N, dfl, qid=qid)
            elif m == "uef":
                vecs = self.reader.term_vectors(
                    [d for d, _ in topdocs[:RLM_NUM_TOP_DOCS]])
                row[m] = uef(topdocs, vecs, k, terms, N, dfl, qid=qid)
        for key, v in row.items():
            if key != "qid":
                row[key] = round(float(v), 6)
        return pd.DataFrame([row])


def feedback_rerank(run_ds, index_dir: str, queries: dict[str, str],
                    model: str = "conditional",
                    num_top_docs: int = RLM_NUM_TOP_DOCS, concurrency=(1, 4)):
    qref = ray.put(dict(queries))
    return run_ds.groupby("qid").map_groups(
        FeedbackRerankStage, batch_format="pandas", concurrency=concurrency,
        fn_constructor_kwargs=dict(index_dir=index_dir, queries_ref=qref,
                                   model=model, num_top_docs=num_top_docs))


def expand_queries(run_ds, index_dir: str, queries: dict[str, str],
                   model: str = "conditional", num_terms: int = 20,
                   fb: float = 0.2, concurrency=(1, 4)):
    qref = ray.put(dict(queries))
    return run_ds.groupby("qid").map_groups(
        ExpandQueryStage, batch_format="pandas", concurrency=concurrency,
        fn_constructor_kwargs=dict(index_dir=index_dir, queries_ref=qref,
                                   model=model, num_terms=num_terms, fb=fb))


def qpp_estimates(run_ds, index_dir: str, queries: dict[str, str], k: int = 50,
                  methods: tuple[str, ...] = ("nqc", "cumnqc", "avgidf",
                                              "maxidf", "rsd", "uef"),
                  concurrency=(1, 4)):
    qref = ray.put(dict(queries))
    return run_ds.groupby("qid").map_groups(
        QPPStage, batch_format="pandas", concurrency=concurrency,
        fn_constructor_kwargs=dict(index_dir=index_dir, queries_ref=qref,
                                   k=k, methods=methods))
