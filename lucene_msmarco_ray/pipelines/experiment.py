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


def perturb_runs(run_ds, qrels_df: pd.DataFrame, num_samples: int,
                 id_sep: str = "#"):
    """All ``num_samples`` rank-swap perturbations of every query's ranked
    list in ONE ``groupby(qid).map_groups`` pass — no driver materialization.

    Each sample applies the single rel↔nonrel swap selected by the
    deterministic arithmetic ``perm_index`` (qpp.stochastic; identity is
    always permutation 0), mirroring the reference's RankSwapper enumeration
    (stochastic_qpp/StochasticQPPEvaluation.java:229-264, RankSwapper.java:
    34-141) with SQL-reproducible choice instead of unseeded Math.random.
    → Dataset(qid=f"{{qid}}{id_sep}{{sample}}", sample, doc_id, rank, score);
    the composite qid lets one downstream metrics/QPP pass treat every
    (query, sample) as its own group."""
    import numpy as np
    import ray

    from ..qpp.stochastic import chosen_swap, perm_index

    rel_map = {str(q): set(g[g["rel"] >= 2]["docid"].astype(int))
               for q, g in qrels_df.groupby("qid")}
    relref = ray.put(rel_map)

    def groups(g: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(relref)
        qid = str(g["qid"].iloc[0])
        g = g.sort_values("rank")
        docs = g["doc_id"].to_numpy().astype(np.int64)
        scores = g["score"].to_numpy().astype(np.float64)
        n = docs.size
        rel = m.get(qid, set())
        isrel = np.fromiter((int(d) in rel for d in docs), bool, n)
        rel_pos = np.flatnonzero(isrel)
        if rel_pos.size == 0 or rel_pos[0] != 0:     # TOPDOC_ALWAYS_SWAPPED
            rel_pos = np.concatenate(([0], rel_pos))
        nonrel_pos = np.flatnonzero(~isrel)
        n_perms = 1 + rel_pos.size * nonrel_pos.size
        ranks = np.arange(1, n + 1, dtype=np.int64)
        frames = []
        for s in range(num_samples):
            d2, s2 = docs.copy(), scores.copy()
            sw = chosen_swap(rel_pos.size, nonrel_pos.size,
                             perm_index(qid, s, n_perms))
            if sw is not None:
                r, nr = int(rel_pos[sw[0]]), int(nonrel_pos[sw[1]])
                d2[[r, nr]] = d2[[nr, r]]        # ALLOW_UNSORTED_TOPDOCS:
                s2[[r, nr]] = s2[[nr, r]]        # (doc, score) move together
            frames.append(pd.DataFrame({
                "qid": f"{qid}{id_sep}{s}", "sample": np.int64(s),
                "doc_id": d2, "rank": ranks, "score": s2}))
        return pd.concat(frames, ignore_index=True)

    groups.__name__ = "perturb_runs"
    return run_ds.groupby("qid").map_groups(groups, batch_format="pandas")


def stochastic_qpp_evaluation(run_ds, qrels_df: pd.DataFrame,
                              queries: dict[str, str], index_dir: str,
                              num_samples: int = 10,
                              methods: tuple[str, ...] = ("nqc",),
                              target_metric: str = "ap", k: int = 50,
                              corr_metrics: tuple[str, ...] = ("kendall",
                                                               "sare")
                              ) -> pd.DataFrame:
    """StochasticQPPEvaluation: perturb each query's ranked list per sample
    (rel↔nonrel swaps), recompute metric + QPP, report per-sample
    correlations and deltas vs the unperturbed baseline.

    Dataflow (no whole-run driver materialization — round-2 review):
    ONE perturbation pass emits all samples under composite qids, then ONE
    per_query_metrics pass + ONE qpp_estimates pass over the (query, sample)
    groups; only the tiny per-(sample, qid) arrays reach the driver for the
    final correlations."""
    base = qpp_experiment(run_ds, qrels_df, queries, index_dir,
                          target_metric, methods, k, corr_metrics)
    pert = perturb_runs(run_ds, qrels_df, num_samples)
    # replicate the small sides under the composite qids (broadcast-sized:
    # qrels × samples and queries × samples)
    qrels_s = pd.concat(
        [qrels_df.assign(qid=qrels_df["qid"].astype(str) + f"#{s}")
         for s in range(num_samples)], ignore_index=True)
    queries_s = {f"{q}#{s}": t for q, t in queries.items()
                 for s in range(num_samples)}
    target = per_query_metrics(pert, qrels_s, cutoffs=(10,)).to_pandas()
    est = qpp_estimates(pert, index_dir, queries_s, k=k,
                        methods=methods).to_pandas()
    merged = target.merge(est, on="qid")
    split = merged["qid"].str.rsplit("#", n=1, expand=True)
    merged["qid"] = split[0]
    merged["sample"] = split[1].astype(int)
    # per-sample qid-string order — the same stable order qpp_experiment
    # uses, so SARE position arithmetic matches the baseline's
    merged = merged.sort_values(["sample", "qid"], kind="mergesort")
    rows = []
    for s, gs in merged.groupby("sample", sort=True):
        for m in methods:
            for cm in corr_metrics:
                fn = METRIC_REGISTRY[cm]
                v = round(float(fn(gs[target_metric].to_numpy(),
                                   gs[m].to_numpy())), 6)
                b = base[(base.method == m) &
                         (base.corr_metric == cm)]["value"].iloc[0]
                rows.append({"sample": int(s), "method": m,
                             "corr_metric": cm, "value": v,
                             "delta": round(float(v - b), 6)})
    return pd.DataFrame(rows)
