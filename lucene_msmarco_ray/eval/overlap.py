"""Top-term-overlap post-processing — the reference's PostProcess.py
(reference: PostProcess.py:1-99) re-expressed as a Ray pipeline: compare the
top-k terms of an ESTIMATED dense term-weight vector (values indexed by
vocab id) against the top-k of the ORIGINAL sparse vector, per document.

Reference quirks, reproduced verbatim and flagged:
* weights compare as STRINGS (``val_ar.sort(reverse=True)`` on str — so
  "9.5" > "10.2"); both sides keep that ordering;
* the estimated side adds ALL positions of each selected value and only
  checks the k cutoff after a value completes — est can exceed k entries
  (PostProcess.py:36-50); the original side cuts at exactly k (:72-77);
* the per-doc normalized overlap divides by len(orig-top) (:92), and the
  reference's final average divides by a hard-coded 1000 (:97) — here the
  denominator defaults to the actual doc count (flagged deviation; pass
  ``avg_denom=1000`` for verbatim behavior).

Dataflow: the vocab (id→word) broadcasts once via ``ray.put``; the original
sparse rows group by doc; the estimated vectors map per batch. Per-doc lists
are ≤ k+dups entries so the join of the two sides is a broadcast of the
estimated top lists (swap in ops.join.bucketed_hash_join when the doc count
outgrows the object store).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray


def _est_top_words(vals: list[str], vocab: dict[int, str], k: int) -> list[str]:
    """PostProcess.py:21-50 — positions grouped by value string, values
    sorted desc as strings, all positions of a value appended, cutoff
    checked after each value."""
    by_val: dict[str, list[int]] = {}
    order: list[str] = []
    for idx, v in enumerate(vals):
        if v not in by_val:
            order.append(v)
            by_val[v] = []
        by_val[v].append(idx)
    est: list[str] = []
    n = 0
    for v in sorted(order, reverse=True):
        for i in by_val[v]:
            w = vocab.get(i)
            if w is not None:
                est.append(w)
            n += 1
        if n >= k:
            break
    return est


def _orig_top_words(terms: list[str], wts: list[str], k: int) -> list[str]:
    """PostProcess.py:57-83 — same string-desc value sort, but the cutoff
    applies inside the expansion (exactly k entries)."""
    by_val: dict[str, list[str]] = {}
    for t, v in zip(terms, wts):
        by_val.setdefault(v, []).append(t)
    out: list[str] = []
    for v in sorted(by_val, reverse=True):
        for t in by_val[v]:
            out.append(t)
            if len(out) >= k:
                return out
    return out


def top_term_overlap(est_ds, orig_ds, vocab: dict[int, str], k: int = 20):
    """est_ds: (doc_id, vals list<string> indexed by vocab id);
    orig_ds: (doc_id, term, wt string, pos line order).
    → Dataset (doc_id, overlap, norm_overlap, frac_orig)."""
    vref = ray.put(dict(vocab))

    class _EstStage:
        __name__ = "est_top_words"

        def __init__(self):
            self.vocab = ray.get(vref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            tops = [_est_top_words(list(v), self.vocab, k)
                    for v in batch["vals"].to_pylist()]
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "est": pa.array(tops, pa.list_(pa.string()))})

    est_top = est_ds.map_batches(_EstStage, batch_format="pyarrow",
                                 concurrency=(1, 4))
    eref = ray.put({int(r["doc_id"]): list(r["est"])
                    for r in est_top.iter_rows()})

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("pos")
        doc = int(g["doc_id"].iloc[0])
        orig = _orig_top_words(g["term"].tolist(),
                               [str(w) for w in g["wt"]], k)
        est = ray.get(eref).get(doc, [])
        ov = sum(1 for w in orig if w in est)
        return pd.DataFrame([{
            "doc_id": doc, "overlap": ov,
            "norm_overlap": round(ov / k, 6),
            "frac_orig": round(ov / len(orig), 6) if orig else 0.0}])

    per_doc.__name__ = "term_overlap"
    return orig_ds.groupby("doc_id").map_groups(per_doc,
                                                batch_format="pandas")


def overlap_summary(per_doc_df: pd.DataFrame,
                    avg_denom: int | None = None) -> dict:
    """Driver-side average (PostProcess.py:97 divides by a hard-coded 1000;
    default here is the actual doc count — flagged deviation)."""
    denom = avg_denom if avg_denom is not None else max(1, len(per_doc_df))
    return {"avg_frac_orig": round(float(per_doc_df["frac_orig"].sum())
                                   / denom, 6),
            "docs": int(len(per_doc_df))}
