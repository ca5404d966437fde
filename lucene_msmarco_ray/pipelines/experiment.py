"""Experiment drivers — the reference's evaluator entry points re-expressed
(SURVEY.md §3.3; reference: src/main/java/experiments/TRECDLQPPEvaluator.java,
src/main/java/stochastic_qpp/StochasticQPPEvaluation.java:229-264).

Shape: the heavy per-query work (retrieval, metrics, QPP) runs as Ray
pipelines; the final correlation over the per-query arrays (≤ hundreds of
rows) is driver-side numpy — same split as SURVEY.md §2.11.
"""

from __future__ import annotations

import pandas as pd

from ..eval.correlation import METRIC_REGISTRY
from ..eval.metrics import per_query_metrics
from .feedback import qpp_estimates


def qpp_experiment(run_ds, qrels_df: pd.DataFrame, queries: dict[str, str],
                   index_dir: str, target_metric: str = "ap",
                   methods: tuple[str, ...] = ("nqc", "avgidf", "maxidf"),
                   k: int = 50,
                   corr_metrics: tuple[str, ...] = ("kendall", "sare")
                   ) -> pd.DataFrame:
    """runSingleExperiment equivalent: per-query target metric + QPP
    estimates → correlation per (method, corr_metric)."""
    target = per_query_metrics(run_ds, qrels_df, cutoffs=(10,)).to_pandas()
    est = qpp_estimates(run_ds, index_dir, queries, k=k,
                        methods=methods).to_pandas()
    merged = target.merge(est, on="qid").sort_values("qid")
    rows = []
    for m in methods:
        for cm in corr_metrics:
            fn = METRIC_REGISTRY[cm]
            rows.append({
                "method": m, "corr_metric": cm,
                "value": round(float(fn(merged[target_metric].to_numpy(),
                                        merged[m].to_numpy())), 6),
            })
    return pd.DataFrame(rows)


def stochastic_qpp_evaluation(run_ds, qrels_df: pd.DataFrame,
                              queries: dict[str, str], index_dir: str,
                              num_samples: int = 10,
                              methods: tuple[str, ...] = ("nqc",),
                              target_metric: str = "ap", k: int = 50
                              ) -> pd.DataFrame:
    """StochasticQPPEvaluation: perturb each query's ranked list per sample
    (rel↔nonrel swaps), recompute QPP, report per-sample tau/SARE deltas vs
    the unperturbed baseline."""
    import numpy as np
    import ray.data as rd

    from ..qpp.stochastic import sample_one, sample_permutations

    base = qpp_experiment(run_ds, qrels_df, queries, index_dir,
                          target_metric, methods, k)
    run_df = run_ds.to_pandas() if not isinstance(run_ds, pd.DataFrame) else run_ds
    rel_map = {}
    for q, g in qrels_df.groupby("qid"):
        rel_map[str(q)] = set(g[g["rel"] >= 2]["docid"].astype(int))

    rows = []
    for s in range(num_samples):
        perturbed = []
        for qid, g in run_df.groupby("qid"):
            g = g.sort_values("rank")
            topdocs = list(zip(g["doc_id"].astype(int),
                               g["score"].astype(float)))
            rel = rel_map.get(str(qid), set())
            perms = sample_permutations(topdocs, lambda d: d in rel)
            chosen = sample_one(perms, str(qid), s)
            for rank, (doc, score) in enumerate(chosen, start=1):
                perturbed.append({"qid": str(qid), "doc_id": doc,
                                  "rank": rank, "score": score})
        pds = rd.from_pandas(pd.DataFrame(perturbed))
        exp = qpp_experiment(pds, qrels_df, queries, index_dir,
                             target_metric, methods, k)
        for _, r in exp.iterrows():
            b = base[(base.method == r["method"]) &
                     (base.corr_metric == r["corr_metric"])]["value"].iloc[0]
            rows.append({"sample": s, "method": r["method"],
                         "corr_metric": r["corr_metric"],
                         "value": r["value"],
                         "delta": round(float(r["value"] - b), 6)})
    return pd.DataFrame(rows)
