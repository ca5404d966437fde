"""Supervised relevance model (SRLM), Rocchio, KNN query variants, induced
rescoring, scalar weight helpers (SURVEY.md A7-A9, M6-M7, M10, A17).

Semantics mirrored from the reference with quirks flagged:

* LM doc term weights (M6, src/main/java/retrieval/SupervisedRLM.java:68-119):
  wt(w) = ln(1 + λ/(1−λ) · tf/Σtf · N/df), λ=0.9 (LAMBDA_ODDS, Constants
  .java:29-30), then L2-normalized.
* scalar helpers (M7, src/main/java/retrieval/TermWtUtil.java:6-20): the
  reference's ``bm25Weight`` multiplies the idf INSIDE the denominator and
  hard-codes the fairness-collection avgdl — a transcription bug kept
  verbatim here under its reference name (our retrieval path uses the
  correct Lucene formula in search/scoring.py).
* SRLM fit (A7, SupervisedRLM.java:151-200, TermDistribution.java:25-43):
  cooccur_q[w] += p(q|d)·p(w|d) over rel docs of each training query; the
  reference's normalizeCooccurStats() is a NO-OP (its collect result is
  discarded — SupervisedRLM.java:188-199) and pruning to NUM_TOP_TERMS=5
  happens only on loadFromDisk (:238, prune :132-140); both behaviors kept.
* model TSV round-trip (S11, :202-238): ``qterm \\t term^wt term^wt …``.
* SRLM rerank (SupervisedRLM.java:240-270): score'(d) = Σ_q cos(cooccur_q,
  lm_wts(d)) × score(d), sorted desc (stable).
* Rocchio (A8, KNNRelModel.java:297-360): origQ={qterm: α}; per KNN query,
  rel/nonrel accumulators are NOT reset across KNN queries (quirk kept);
  nonrel docs = first ROCCHIO_NUM_NEGATIVE top-docs not in the rel set
  (anti-join J6); merge with +β/|rel| and −γ/|nonrel|; keep weights >0, top
  NUM_EXPANSION_TERMS. Deviation: an empty nonrel set is skipped instead of
  producing a −γ/0 = −∞ merge (flagged; the reference would NaN/∞ out).
* avg LM doc model (A9, KNNRelModel.java:524-542): Σ over queries' rel docs
  of simWithOrig·lm_wts(d), L2-normalized.
* induced rescoring (M10, qrels/RetrievedResults.java:51-96): score(q,d) =
  Σ_{t∈q∩d} lmjm(tf, N, df, dl, λ=0.2); re-sort + rerank; dedup-before-
  compute replaces the reference's static cache (T5).
* KNN variants (T2/J4, KNNRelModel.java:141-182): variants TSV parsed from
  token index 2; refSim uniform 1.0 or RBO vs the original query's top docs;
  missing qids skipped.
"""

from __future__ import annotations

import math
from collections import Counter

MODEL_DELIM = "^"
LAMBDA = 0.9
LAMBDA_ODDS = LAMBDA / (1 - LAMBDA)
NUM_TOP_TERMS = 5
ROCCHIO_ALPHA, ROCCHIO_BETA = 0.5, 0.35
ROCCHIO_GAMMA = 1 - (ROCCHIO_ALPHA + ROCCHIO_BETA)
ROCCHIO_NUM_NEGATIVE = 3
NUM_EXPANSION_TERMS = 20
FAIRNESS_COLL_AVG_LEN = 2.5


# ---- scalar weight helpers (M7) ----

def bm25_idf(N: int, n: int) -> float:
    return math.log(1 + (N - n + 0.5) / (n + 0.5))


def bm25_weight_reference_helper(k: float, b: float, f: int, N: int, n: int,
                                 doc_len: float) -> float:
    """Verbatim reference TermWtUtil.bm25Weight — including its bug (idf in
    the denominator, fairness avgdl). Do NOT use for retrieval."""
    return f * (k + 1) / (f + k * (1 - b + b * doc_len / FAIRNESS_COLL_AVG_LEN)
                          * bm25_idf(N, n))


def tfidf_weight(f: int, N: int, n: int) -> float:
    return f * math.log(N / n)


def lmjm_weight(f: int, N: int, n: int, doc_len: float,
                lam: float = 0.2) -> float:
    return math.log(1 + lam / (1 - lam) * f / doc_len * N / n)


# ---- LM doc term weights (M6) ----

def lm_term_weights(vec: dict[str, int], num_docs: int, df_lookup,
                    idf_weighting: bool = True) -> dict[str, float]:
    if not vec:
        return {}
    sum_tf = float(sum(vec.values()))
    if idf_weighting:
        wts = {}
        for w, tf in vec.items():
            df = df_lookup(w)
            if not df:
                continue
            wts[w] = math.log(1 + LAMBDA_ODDS * tf / sum_tf * num_docs / df)
    else:
        wts = {w: float(tf) for w, tf in vec.items()}
    norm = math.sqrt(sum(v * v for v in wts.values()))
    return {w: v / norm for w, v in wts.items()} if norm else {}


def cosine_sim(a: dict[str, float], b: dict[str, float]) -> float:
    if not a:
        return 0.0
    return sum(v * b[w] for w, v in a.items() if w in b)


def kl_div(p: dict[str, float], q: dict[str, float]) -> float:
    out = 0.0
    for w, p_w in p.items():
        q_w = q.get(w)
        if q_w is None or p_w == 0:
            continue
        out += p_w * math.log(p_w / q_w)
    return out


def l2_norm(wts: dict[str, float]) -> float:
    return math.sqrt(sum(v * v for v in wts.values()))


# ---- SRLM model (A7 / S11) ----

class SupervisedRLMModel:
    def __init__(self):
        self.dists: dict[str, dict[str, float]] = {}

    def update(self, qterm: str, doc_wts: dict[str, float]) -> None:
        p_q_d = doc_wts.get(qterm, 0.0)
        if p_q_d == 0.0:
            return   # every p_w_q = 0 → reference's `if (p_w_q > 0)` skips all
        dist = self.dists.setdefault(qterm, {})
        for w, p_w_d in doc_wts.items():
            c = p_q_d * p_w_d
            if c > 0:
                dist[w] = dist.get(w, 0.0) + c

    def fit(self, queries: dict[str, str], rel_docs: dict[str, list],
            doc_wts_lookup) -> None:
        """queries: qid→qtext (terms whitespace-split, reference behavior);
        rel_docs: qid→[doc]; doc_wts_lookup(doc)→lm weights."""
        for qid, qtext in queries.items():
            docs = rel_docs.get(qid)
            if not docs:
                continue
            qterms = qtext.split()
            for doc in docs:
                wts = doc_wts_lookup(doc)
                for q in qterms:
                    self.update(q, wts)
        # reference normalizeCooccurStats() is a no-op (result discarded) —
        # deliberately NOT normalizing here.

    def prune(self, top_k: int = NUM_TOP_TERMS) -> None:
        # tie-break deviation (flagged): (-round(wt,9), term) instead of the
        # reference's HashMap-order ties — deterministic + SQL-reproducible
        for q, dist in self.dists.items():
            top = sorted(dist.items(),
                         key=lambda e: (-round(e[1], 9), e[0]))[:top_k]
            self.dists[q] = dict(top)

    def save_tsv(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            for q, dist in self.dists.items():
                items = sorted(dist.items(), key=lambda e: (-e[1], e[0]))
                body = " ".join(f"{w}{MODEL_DELIM}{wt}" for w, wt in items)
                f.write(f"{q}\t{body} \n".replace("  \n", " \n"))

    @classmethod
    def load_tsv(cls, path: str, prune: bool = True) -> "SupervisedRLMModel":
        m = cls()
        with open(path, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 2:
                    continue
                dist = {}
                for tok in parts[1].split():
                    w, _, wt = tok.partition(MODEL_DELIM)
                    dist[w] = float(wt)
                m.dists[parts[0]] = dist
        if prune:
            m.prune()
        return m

    def rerank(self, qtext: str, topdocs: list[tuple[int, float]],
               doc_wts_lookup) -> list[tuple[int, float]]:
        qterms = qtext.split()
        out = []
        for doc, score in topdocs:
            p_r_d = 0.0
            wts = None
            for q in qterms:
                dist = self.dists.get(q)
                if dist is not None:
                    if wts is None:
                        wts = doc_wts_lookup(doc)
                    p_r_d += cosine_sim(dist, wts)
            out.append((doc, p_r_d * score))
        return sorted(out, key=lambda x: -x[1])


# ---- Rocchio (A8) ----

def _merge_into(a: dict[str, float], weight: float, b: dict[str, float]) -> None:
    for k, v in a.items():
        b[k] = b.get(k, 0.0) + v * weight


def rocchio_expand(query_terms: list[str],
                   knn_queries: list[tuple[str, float]],
                   rel_docs_of, topdocs: list[int],
                   doc_wts_lookup,
                   alpha: float = ROCCHIO_ALPHA, beta: float = ROCCHIO_BETA,
                   gamma: float = ROCCHIO_GAMMA,
                   num_negative: int = ROCCHIO_NUM_NEGATIVE,
                   num_terms: int = NUM_EXPANSION_TERMS
                   ) -> list[tuple[str, float]]:
    """knn_queries: [(qid, refSim)]; rel_docs_of(qid)→set of doc ids;
    topdocs: the original query's ranked doc ids."""
    orig = {t: alpha for t in dict.fromkeys(query_terms)}
    rel_acc: dict[str, float] = {}
    nonrel_acc: dict[str, float] = {}
    for knn_qid, _sim in knn_queries:
        rel = rel_docs_of(knn_qid)
        if not rel:
            continue
        for doc in rel:
            _merge_into(doc_wts_lookup(doc), 1.0, rel_acc)
        nonrel_docs = []
        for doc in topdocs:
            if doc not in rel:
                nonrel_docs.append(doc)
                if len(nonrel_docs) >= num_negative:
                    break
        for doc in nonrel_docs:
            _merge_into(doc_wts_lookup(doc), 1.0, nonrel_acc)
        _merge_into(rel_acc, beta / len(rel), orig)
        if nonrel_docs:   # deviation: reference divides by 0 here when empty
            _merge_into(nonrel_acc, -gamma / len(nonrel_docs), orig)
    kept = [(t, w) for t, w in orig.items() if w > 0]
    # tie-break deviation (flagged): (-round(w,9), term) for determinism
    # (9dp absorbs float-summation-order noise at the selection cutoff)
    kept.sort(key=lambda e: (-round(e[1], 9), e[0]))
    return kept[:num_terms]


def avg_lm_doc_model(queries: list[tuple[str, float]], rel_docs_of,
                     doc_wts_lookup) -> dict[str, float]:
    """A9: queries = [(qid, simWithOrig)]."""
    acc: dict[str, float] = {}
    for qid, sim in queries:
        for doc in rel_docs_of(qid) or ():
            _merge_into(doc_wts_lookup(doc), sim, acc)
    norm = l2_norm(acc)
    return {w: v / norm for w, v in acc.items()} if norm else {}


# ---- induced rescoring (M10) ----

def induce_scores(run: list[tuple[int, float]], query_terms: list[str],
                  num_docs: int, df_lookup, doc_vec_lookup,
                  lam: float = 0.2) -> list[tuple[int, int, float]]:
    """→ [(doc, rank, score)] rescored with LM-JM over matched query terms,
    re-sorted (score desc, then stable) and re-ranked."""
    qset = set(query_terms)
    rescored = []
    for doc, _ in run:
        vec = doc_vec_lookup(doc)
        dl = float(sum(vec.values())) if vec else 0.0
        s = 0.0
        for t in qset:
            tf = vec.get(t)
            if not tf:
                continue
            df = df_lookup(t)
            if not df:
                continue
            s += lmjm_weight(tf, num_docs, df, dl, lam)
        rescored.append((doc, s))
    rescored.sort(key=lambda x: -x[1])
    return [(doc, i + 1, s) for i, (doc, s) in enumerate(rescored)]


# ---- bigrams (A19) ----

def frequent_bigrams(queries: list[list[str]], top_n: int = 100
                     ) -> list[tuple[str, int]]:
    """All unordered term pairs (i<j positions) per query → counts → top-N
    (reference: src/main/java/retrieval/BigramsFinder.java:17-48)."""
    counts: Counter[str] = Counter()
    for terms in queries:
        n = len(terms)
        for i in range(n - 1):
            for j in range(i + 1, n):
                counts[f"{terms[i]}^{terms[j]}"] += 1
    return counts.most_common(top_n)


# ---- KNN variants (T2/J4) + variant-based QPP (A17) ----

def parse_variants_tsv(path: str, known_qids: set[str] | None = None
                       ) -> dict[str, list[tuple[str, str]]]:
    """qid \\t origText \\t v1 \\t v2 … → qid → [(variant_id, text)];
    variants parsed from token index 2; unknown qids skipped when
    known_qids given (KNNRelModel.java:157-159)."""
    out: dict[str, list[tuple[str, str]]] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            tokens = line.rstrip("\n").split("\t")
            if len(tokens) < 3:
                continue
            qid = tokens[0]
            if known_qids is not None and qid not in known_qids:
                continue
            lst = out.setdefault(qid, [])
            for i in range(2, len(tokens)):
                lst.append((f"{qid}_v_{i}", tokens[i]))
    return out


def variant_specificity(base_estimate: float,
                        variant_estimates: list[tuple[float, float]],
                        lam: float) -> float:
    """A17 combine: λ·(Σ refSim·est)/Σ refSim + (1−λ)·base; falls back to
    base when no variants / zero total refSim
    (qpp/VariantSpecificity.java:62-111)."""
    if not variant_estimates:
        return base_estimate
    z = sum(r for r, _ in variant_estimates)
    if z == 0:
        return base_estimate
    vs = sum(r * e for r, e in variant_estimates) / z
    return lam * vs + (1 - lam) * base_estimate
