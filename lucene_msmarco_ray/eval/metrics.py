"""TREC-style evaluation metrics — reference semantics reproduced verbatim,
including its quirks (SURVEY.md A10/A11), all flagged inline:

* "relevant" means rel >= EVAL_MIN_REL = 2 (reference:
  src/main/java/qrels/PerQueryRelDocs.java:28-33,
  src/main/java/retrieval/Constants.java:57);
* AP: Σ precision@rank over relevant hits / total #relevant in qrels
  (src/main/java/qrels/RetrievedResults.java:150-170);
* P@k (…:172-183); Recall = (#rel>=2 seen) / relMap.size() — the DENOMINATOR
  counts every rel>0 label (PerQueryRelDocs stores only rel>0,
  src/main/java/qrels/PerQueryRelDocs.java:22-25), while the numerator uses
  isRel (rel>=2) — a reference asymmetry, reproduced as-spec'd (…:184-196);
* RR returns the reciprocal rank of the LAST doc with rel > 0 (not >=2) — a
  reference quirk, reproduced as-spec'd (…:197-206);
* nDCG@c: linear gain rel/log2(rank+1); ideal DCG from ALL rel>0 labels
  sorted desc (…:208-256);
* macro averages: mean over queries, except recall which divides the summed
  rel-seen by the summed totalNumRel (src/main/java/qrels/
  AllRetrievedResults.java:201-223, AllRelRcds.java:26-35 — kept verbatim).

Dataflow: run × qrels is a broadcast-small-side join (J1: qrels fit in the
object store; ``ray.put`` once, dict lookup per batch), then per-query metric
computation in ``groupby(qid).map_groups`` — numpy inside, one group per qid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

EVAL_MIN_REL = 2


def annotate_rel(run_ds, qrels_df: pd.DataFrame):
    """M9: left-join rel labels onto a run (broadcast small side, fill 0)."""
    ref = ray.put({(str(q), int(d)): int(r) for q, d, r in
                   zip(qrels_df["qid"], qrels_df["docid"], qrels_df["rel"])})

    def ann(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        qids = batch["qid"].to_pylist()
        docs = batch["doc_id"].to_pylist()
        rel = np.fromiter((m.get((str(q), int(d)), 0) for q, d in zip(qids, docs)),
                          np.int64, len(qids))
        return batch.append_column("rel", pa.array(rel))

    return run_ds.map_batches(ann, batch_format="pyarrow")


def _metrics_for_group(g: pd.DataFrame, total_rel: int, total_pos: int,
                       all_rels: np.ndarray,
                       cutoffs: tuple[int, ...]) -> dict:
    g = g.sort_values("rank")
    rel = g["rel"].to_numpy()
    rank = g["rank"].to_numpy()
    is_rel = rel >= EVAL_MIN_REL

    out: dict[str, float] = {}
    # AP
    if total_rel > 0 and is_rel.any():
        nrel_at = np.cumsum(is_rel)
        out["ap"] = float(np.sum(nrel_at[is_rel] / rank[is_rel]) / total_rel)
    else:
        out["ap"] = 0.0
    # P@k
    for k in (5, 10):
        out[f"p{k}"] = float(is_rel[rank <= k].sum() / k)
    # RR of the LAST doc with rel > 0 (reference quirk: computeRR skips
    # rel<=0 only, no EVAL_MIN_REL; RetrievedResults.java:197-206)
    is_pos = rel > 0
    out["rr"] = float(1.0 / rank[is_pos][-1]) if is_pos.any() else 0.0
    # recall: numerator rel>=2 hits, denominator ALL rel>0 labels
    # (relMap.size(); RetrievedResults.java:184-195)
    out["recall"] = float(is_rel.sum() / total_pos) if total_pos else 0.0
    out["_rel_seen"] = float(is_rel.sum())
    out["_total_rel"] = float(total_pos)
    # nDCG@c — linear gain, ideal from ALL rel>0 labels sorted desc
    ideal = np.sort(all_rels[all_rels > 0])[::-1]
    for c in cutoffs:
        top = g[g["rank"] <= c]
        dcg = float(np.sum(top["rel"].to_numpy()
                           / np.log2(top["rank"].to_numpy() + 1.0)))
        ic = ideal[:c]
        idcg = float(np.sum(ic / np.log2(np.arange(1, ic.size + 1) + 1.0)))
        out[f"ndcg{c}"] = dcg / idcg if idcg > 0 else 0.0
    return out


def per_query_metrics(run_ds, qrels_df: pd.DataFrame,
                      cutoffs: tuple[int, ...] = (10, 100)):
    """→ Dataset(qid, ap, p5, p10, rr, recall, ndcg{c}...)."""
    qrels_df = qrels_df.copy()
    qrels_df["qid"] = qrels_df["qid"].astype(str)
    by_q = {
        q: (int((sub["rel"] >= EVAL_MIN_REL).sum()),   # numRel, for AP
            int((sub["rel"] > 0).sum()),               # relMap.size(), recall
            sub["rel"].to_numpy(dtype=np.int64))
        for q, sub in qrels_df.groupby("qid")
    }
    qref = ray.put(by_q)
    annotated = annotate_rel(run_ds, qrels_df)

    def group_metrics(g: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(qref)
        qid = str(g["qid"].iloc[0])
        total_rel, total_pos, rels = m.get(qid, (0, 0, np.empty(0, np.int64)))
        row = _metrics_for_group(g, total_rel, total_pos, rels, cutoffs)
        row = {k: round(v, 6) for k, v in row.items()}
        row["qid"] = qid
        cols = ["qid", "ap", "p5", "p10", "rr", "recall",
                *[f"ndcg{c}" for c in cutoffs], "_rel_seen", "_total_rel"]
        return pd.DataFrame([{c: row[c] for c in cols}])

    group_metrics.__name__ = "per_query_metrics"
    return annotated.groupby("qid").map_groups(group_metrics,
                                               batch_format="pandas")


def macro_averages(per_query_df: pd.DataFrame) -> dict[str, float]:
    """A11 — driver-side (tiny table). Recall uses the reference's
    Σseen/Σtotal normalization, everything else is a plain mean."""
    out = {}
    for c in per_query_df.columns:
        if c in ("qid", "_rel_seen", "_total_rel") :
            continue
        out[c] = round(float(per_query_df[c].mean()), 6)
    tot = per_query_df["_total_rel"].sum()
    out["recall"] = round(float(per_query_df["_rel_seen"].sum() / tot), 6) \
        if tot else 0.0
    return out


def evaluate_run(run_ds, qrels_df: pd.DataFrame,
                 cutoffs: tuple[int, ...] = (10, 100)):
    """Full Evaluator path (reference: src/main/java/qrels/Evaluator.java:97-109):
    per-query table + macro dict."""
    pq = per_query_metrics(run_ds, qrels_df, cutoffs).to_pandas()
    return pq, macro_averages(pq)


def evaluate_run_dir(run_dir: str, qrels_path: str, depth: int = 50,
                     pattern: str = "*.res",
                     cutoffs: tuple[int, ...] = (10, 100)):
    """evalat50.sh equivalent (reference:
    ColBERT-PRF-VirtualAppendix/evalat50.sh): concatenate every res file in
    ``run_dir`` matching ``pattern`` (also reads .res.gz transparently),
    truncate each query's list to ``depth`` (trec_eval -M50), evaluate
    against the qrels. Returns (per_query_df, macro dict)."""
    import glob
    import gzip
    import os
    import tempfile

    import ray.data as rd

    from ..sources.trec import read_qrels, read_run
    files = sorted(glob.glob(os.path.join(run_dir, pattern))
                   + glob.glob(os.path.join(run_dir, pattern + ".gz")))
    if not files:
        raise FileNotFoundError(f"no run files matching {pattern} in {run_dir}")
    with tempfile.NamedTemporaryFile("w", suffix=".res", delete=False) as tmp:
        for f in files:
            opener = gzip.open if f.endswith(".gz") else open
            with opener(f, "rt") as fh:
                tmp.write(fh.read())
        cat = tmp.name
    try:
        run_df = read_run(cat, num_wanted=depth) \
            .rename(columns={"docid": "doc_id"})
        run_df["doc_id"] = run_df["doc_id"].astype(int)
        return evaluate_run(rd.from_pandas(run_df), read_qrels(qrels_path),
                            cutoffs)
    finally:
        os.unlink(cat)
