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


class InducedRescoreStage:
    """One qid group → LM-JM induced rescoring of the run (M10; reference:
    qrels/RetrievedResults.java:51-96, λ=0.2). Ranks on the 6-dp-rounded
    score with doc-id tie-break so results are SQL-comparable."""

    __name__ = "induced_rescore"

    def __init__(self, index_dir: str, queries_ref, lam: float = 0.2):
        self.reader = IndexReader(index_dir)
        self.queries = ray.get(queries_ref)
        from ..analysis import get_analyzer
        st = self.reader.stats
        self.analyzer = get_analyzer(
            st["analyzer"], st.get("stopword_file"),
            st.get("normalize_numbers", True) if st["analyzer"] == "english" else False)
        self.lam = lam

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        from ..fdbk.srlm import lmjm_weight
        qid = str(g["qid"].iloc[0])
        docs = g.sort_values("rank")["doc_id"].astype(int).tolist()
        vecs = self.reader.term_vectors(docs)
        qset = set(self.analyzer(self.queries.get(qid, "")))
        N = self.reader.num_docs
        rows = []
        for doc in docs:
            vec = vecs.get(doc, {})
            dl = float(sum(vec.values()))
            s = 0.0
            for t in qset:
                tf = vec.get(t)
                df = self.reader.df(t) if tf else 0
                if tf and df:
                    s += lmjm_weight(tf, N, df, dl, self.lam)
            rows.append((doc, round(s, 6)))
        rows.sort(key=lambda x: (-x[1], x[0]))
        return pd.DataFrame({
            "qid": qid,
            "doc_id": [d for d, _ in rows],
            "rank": np.arange(1, len(rows) + 1, dtype=np.int64),
            "score": [s for _, s in rows],
        })


class SparseVecTopDocsStage:
    """One qid group → (qid, doc_id, term, wt) rows for its top-k docs, with
    the reference's own BM25 weight incl. its quirks (S9; reference:
    indexing/SparseVecWriter.java:117-164, weight :29-38,157)."""

    __name__ = "sparsevec_topdocs"

    def __init__(self, index_dir: str, k: int = 10, k1: float = 1.2,
                 b: float = 0.75, avgdl_const: float = 57.25):
        self.reader = IndexReader(index_dir)
        self.k, self.k1, self.b = k, k1, b
        self.avgdl_const = avgdl_const

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        from ..sources.extra import sparsevec_bm25_weight
        qid = str(g["qid"].iloc[0])
        docs = g.sort_values("rank").head(self.k)["doc_id"].astype(int).tolist()
        vecs = self.reader.term_vectors(docs)
        N = self.reader.num_docs
        out_d, out_t, out_w = [], [], []
        for doc in docs:
            vec = vecs.get(doc, {})
            dl = float(sum(vec.values()))
            for term, tf in sorted(vec.items()):
                df = self.reader.df(term)
                w = sparsevec_bm25_weight(tf, N, df, dl, self.k1, self.b,
                                          self.avgdl_const)
                out_d.append(doc)
                out_t.append(term)
                out_w.append(round(w, 6))
        return pd.DataFrame({"qid": qid, "doc_id": out_d, "term": out_t,
                             "wt": out_w})


def induced_rescore(run_ds, index_dir: str, queries: dict[str, str],
                    lam: float = 0.2, concurrency=(1, 4)):
    qref = ray.put(dict(queries))
    return run_ds.groupby("qid").map_groups(
        InducedRescoreStage, batch_format="pandas", concurrency=concurrency,
        fn_constructor_kwargs=dict(index_dir=index_dir, queries_ref=qref,
                                   lam=lam))


def sparsevec_topdocs(run_ds, index_dir: str, k: int = 10,
                      concurrency=(1, 4), **kw):
    return run_ds.groupby("qid").map_groups(
        SparseVecTopDocsStage, batch_format="pandas", concurrency=concurrency,
        fn_constructor_kwargs=dict(index_dir=index_dir, k=k, **kw))


class _LmDocWeightStage:
    """One fwd bucket dir → (doc_id, term, wt) rows, fully vectorized.

    The df map is deserialized ONCE per actor in ``__init__`` (J3 broadcast;
    round-1 review flagged the old per-group ``ray.get``), and the forward
    index's doc-bucket partitioning means every doc's rows are already
    co-located — ZERO shuffle, one task per bucket."""

    __name__ = "lm_doc_weights"

    def __init__(self, df_ref, num_docs: int):
        import pandas as _pd
        dfm = ray.get(df_ref)
        self.df_series = _pd.Series(dfm, dtype=np.float64)
        self.num_docs = float(num_docs)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..fdbk.srlm import LAMBDA_ODDS
        from ..index.build import pads_dirs
        out = []
        for dirs in batch["dirs"]:
            t = pads_dirs(list(dirs)).to_table(
                columns=["doc_id", "term", "tf"])
            doc = t["doc_id"].to_numpy(zero_copy_only=False)
            tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
            term = t["term"].to_pandas()
            df = term.map(self.df_series).to_numpy()
            order = np.argsort(doc, kind="stable")
            doc, tf, df = doc[order], tf[order], df[order]
            term = term.to_numpy()[order]
            starts = np.flatnonzero(np.concatenate(([True],
                                                    doc[1:] != doc[:-1])))
            sizes = np.diff(np.concatenate((starts, [doc.size])))
            dl = np.repeat(np.add.reduceat(tf, starts), sizes)
            w = np.log1p(LAMBDA_ODDS * (tf / dl) * (self.num_docs / df))
            # df==0 terms drop before normalization (lm_term_weights contract)
            w = np.where(df > 0, w, 0.0)
            z = np.repeat(np.sqrt(np.add.reduceat(w * w, starts)), sizes)
            keep = (df > 0) & (z > 0)
            out.append(pd.DataFrame({
                "doc_id": doc[keep].astype(np.int64),
                "term": term[keep],
                "wt": np.round(w[keep] / z[keep], 6)}))
        if not out:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "term": pd.Series([], dtype=str),
                                 "wt": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)


def lm_doc_weights(index_dir: str, concurrency=(1, 8)):
    """M6 as a dataset op: every (doc, term) → L2-normalized LM-idf weight.
    df map is broadcast once per actor (J3); the per-doc normalization is
    vectorized inside each forward-index bucket (docs are co-located by the
    build-time ``fwd/bucket=doc//B`` partitioning), so the whole op is a
    shuffle-free map over bucket descriptors."""
    import json
    import os

    import pyarrow.dataset as pads
    import ray.data as rd

    seg = pads.dataset(os.path.join(index_dir, "segments")).to_table(
        columns=["term", "df"])
    df_ref = ray.put(dict(zip(seg["term"].to_pylist(),
                              seg["df"].to_pylist())))
    with open(os.path.join(index_dir, "stats.json")) as f:
        num_docs = json.load(f)["num_docs"]

    from ..index.build import fwd_bucket_dirs
    buckets = fwd_bucket_dirs(index_dir)
    if not buckets:
        raise FileNotFoundError(
            f"no forward index (staged kind=f) under {index_dir} — rebuild "
            "with build_index() to enable lm_doc_weights")
    desc = rd.from_items([{"dirs": ds_} for _, ds_ in sorted(buckets.items())],
                         override_num_blocks=len(buckets))
    return desc.map_batches(
        _LmDocWeightStage, batch_format="pandas", batch_size=1,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(df_ref=df_ref, num_docs=num_docs))


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
