"""Feedback models, QPP estimators, correlation metrics, stochastic swaps."""

import math

import numpy as np
import pytest

from lucene_msmarco_ray.eval.correlation import (
    jaccard,
    kendall,
    minmax_normalize,
    pairwise_accuracy,
    rank_dist,
    rbo,
    rmse,
    sare,
)
from lucene_msmarco_ray.fdbk.rlm import (
    TopDocsTermStats,
    expand_query,
    kldiv_rerank,
    rm1_weights,
    rm_conditional_weights,
)
from lucene_msmarco_ray.qpp.methods import avg_idf, cumulative_nqc, max_idf, nqc
from lucene_msmarco_ray.qpp.stochastic import sample_permutations, shuffle_topdocs


def test_sare_reference_golden():
    # the reference's embedded smoke test (correlation/SARE.java:65-70)
    gt = [0.32, 0.15, 0.67, 0.08, 0.96, 0.45]
    pred = [0.22, 0.75, 0.47, 0.83, 0.16, 0.05]
    assert sare(gt, pred) == pytest.approx(10 / 36)


def test_rbo_and_rankdist():
    a = list(range(20))
    assert rbo(a, a, k=20, p=0.9) == pytest.approx(1 - 0.9 ** 20)
    assert rbo(a, list(reversed(a)), k=20, p=0.9) < rbo(a, a)
    assert rank_dist(a, a) == pytest.approx(0.0)
    # disjoint lists → no intersection → 0 (reference behavior)
    assert rank_dist([1, 2], [5, 6]) == 0.0


def test_correlation_helpers():
    with pytest.raises(ValueError):
        minmax_normalize([2.0, 2.0])
    assert pairwise_accuracy([1, 2, 3], [1, 2, 3]) == 1.0
    assert pairwise_accuracy([1, 2], [2, 1]) == 0.0
    assert rmse([0.0, 1.0], [0.0, 1.0]) == 0.0
    assert kendall([1, 2, 3], [1, 2, 3]) == pytest.approx(1.0)


TOPDOCS = [(0, 2.0), (1, 1.5), (2, 1.0)]
VECS = {0: {"x": 2, "y": 1}, 1: {"x": 1, "z": 3}, 2: {"y": 2}}


def test_topdocs_term_stats_quirks():
    st = TopDocsTermStats(TOPDOCS, VECS, num_top_docs=2)
    # collection stats only over the first 2 docs
    assert st.term_tf == {"x": 3, "y": 1, "z": 3}
    assert st.term_df == {"x": 2, "y": 1, "z": 1}
    assert st.sum_tf == 7
    assert st.sum_df == 2.0  # quirk: = numTopDocs, never incremented
    # quirk: sim added once per unique term per doc: 2 terms×2.0 + 2 terms×1.5
    assert st.sum_sim == pytest.approx(2 * 2.0 + 2 * 1.5)
    # doc vectors built for ALL docs in the list
    assert 2 in st.docvecs


def test_rm1_weights_formula():
    st = TopDocsTermStats(TOPDOCS, VECS, num_top_docs=2)
    w = rm1_weights(st, ["x", "missing"], lam=0.9)
    p_q = st.term_tf["x"] / st.sum_tf  # 'missing' skipped
    mult = math.exp(math.log(1 + p_q) - 1)
    exp_x = (0.9 * 3 / 7 + 0.1 * 2 / 2.0) * mult
    assert w["x"] == pytest.approx(exp_x)


def test_rm_conditional_and_kldiv():
    st = TopDocsTermStats(TOPDOCS, VECS, num_top_docs=2)
    w = rm_conditional_weights(st)
    # doc0: x: (0.9*2/3 + 0.1*2/2)*2/7 ; doc1: x: (0.9*1/4 + 0.1*2/2)*1.5/7
    exp_x = (0.9 * 2 / 3 + 0.1 * 1.0) * 2.0 / 7.0 + \
            (0.9 * 1 / 4 + 0.1 * 1.0) * 1.5 / 7.0
    assert w["x"] == pytest.approx(exp_x)
    rr = kldiv_rerank(st, w, TOPDOCS)
    assert len(rr) == 3 and {d for d, _ in rr} == {0, 1, 2}
    assert rr[0][1] >= rr[1][1] >= rr[2][1]


def test_expand_query():
    st = TopDocsTermStats(TOPDOCS, VECS, num_top_docs=2)
    w = rm1_weights(st, ["x"])
    exp = expand_query(w, ["x"], num_docs=100,
                       df_lookup=lambda t: {"x": 10, "y": 5, "z": 1}.get(t, 0),
                       num_terms=2, fb=0.2)
    assert exp[0] == ("x", pytest.approx(0.8))
    added = dict(exp[1:])
    assert set(added) == {"y", "z"} and all(0 < b < 0.2 for b in added.values())


def test_nqc_family():
    scores = np.array([3.0, 2.0, 1.0])
    dfl = lambda t: {"a": 10}.get(t, 0)
    v = nqc(scores, 3, ["a"], 100, dfl)
    assert v == pytest.approx(np.var(scores) * math.log(100 / 10))
    # df=0 term → df treated as 1 inside NQC idf vector
    v2 = nqc(scores, 3, ["zz"], 100, dfl)
    assert v2 == pytest.approx(np.var(scores) * math.log(100 / 1))
    assert max_idf(["a", "zz"], 100, dfl) == pytest.approx(math.log(10))
    # avgidf: skips df=0 in the sum but divides by all terms
    assert avg_idf(["a", "zz"], 100, dfl) == pytest.approx(math.log(10) / 2)
    assert cumulative_nqc(scores, 3, ["a"], 100, dfl) == pytest.approx(
        (nqc(scores, 1, ["a"], 100, dfl) + nqc(scores, 2, ["a"], 100, dfl)) / 3)


def test_stochastic_permutations():
    td = [(10, 3.0), (11, 2.0), (12, 1.0), (13, 0.5)]
    rel = {11}
    perms = sample_permutations(td, lambda d: d in rel)
    # relRanks={0 (forced), 1}, nonrelRanks={0? no—0 is rel-forced...}
    # ranks: 0→10 nonrel but forced rel; 1→11 rel; 2,3 nonrel
    assert len(perms) == 1 + 2 * 3
    assert perms[0] == td
    sh = shuffle_topdocs(td, "q1", 0)
    assert sorted(d for d, _ in sh) == [10, 11, 12, 13]
    assert sh == shuffle_topdocs(td, "q1", 0)      # deterministic
    assert sh != shuffle_topdocs(td, "q1", 1)      # draw-dependent


def test_jaccard():
    assert jaccard([1, 2, 3], [2, 3, 4]) == pytest.approx(2 / 4)


def test_corel_specificity():
    from lucene_msmarco_ray.qpp.methods import corel_specificity
    rel = {"k1": {1}, "k2": set()}
    idf = {"k1": 2.0}
    out = corel_specificity(3.0, [("k1", 0.5), ("k2", 1.0)],
                            lambda q: rel.get(q), lambda q: idf[q], lam=0.4)
    # k2 skipped (no rel docs): 0.4*3 + 0.6*(0.5*2.0)/0.5
    assert out == pytest.approx(0.4 * 3.0 + 0.6 * 2.0)
    # no usable knn queries → lam * base only
    assert corel_specificity(3.0, [("k2", 1.0)], lambda q: set(),
                             lambda q: 0, lam=0.4) == pytest.approx(1.2)


def test_polynomial_regression():
    from lucene_msmarco_ray.eval.correlation import (
        polyfit_r2,
        polynomial_fit,
        polynomial_predict,
    )
    # exact quadratic y = 2 + 3x + 0.5x^2 — coefficients recovered in
    # ascending order (commons-math3 PolynomialCurveFitter convention)
    x = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0])
    y = 2.0 + 3.0 * x + 0.5 * x * x
    c = polynomial_fit(x, y, degree=2)
    assert np.allclose(c, [2.0, 3.0, 0.5])
    assert np.allclose(polynomial_predict(c, x), y)
    assert polyfit_r2(x, y) == pytest.approx(1.0)
    # hand-computed least-squares line through 3 non-collinear points:
    # x=[0,1,2], y=[0,1,3] → slope 3/2, intercept -1/6
    c1 = polynomial_fit([0, 1, 2], [0, 1, 3], degree=1)
    assert np.allclose(c1, [-1 / 6, 3 / 2])
    # noisy data → R² strictly below 1
    rng_y = y + np.array([0.5, -0.5, 0.5, -0.5, 0.5, -0.5])
    assert 0.9 < polyfit_r2(x, rng_y) < 1.0


def test_train_and_test_grid():
    import pandas as pd

    from lucene_msmarco_ray.pipelines.experiment import train_and_test

    # variant estimates correlate perfectly with the target metric while the
    # small-magnitude base anti-correlates: every λ>0 grid point (run at
    # λ/2) yields tau=1.0, λ=0 yields −1 — the strictly-greater rule (:118)
    # keeps the FIRST winner, λ=0.5 with numVariants=1.
    qids = ["q1", "q2", "q3", "q4"]
    ap = [0.1, 0.2, 0.3, 0.4]
    base = [0.4, 0.3, 0.2, 0.1]           # anti-correlated with ap
    vest = [10.0, 20.0, 30.0, 40.0]       # perfectly correlated, dominant
    metric = pd.DataFrame({"qid": qids, "ap": ap})
    base_df = pd.DataFrame({"qid": qids, "est": base})
    var_df = pd.DataFrame({"qid": qids, "variant_rank": 0,
                           "ref_sim": 1.0, "est": vest})
    out = train_and_test(metric, base_df, var_df,
                         metric, base_df, var_df,
                         max_num_variants=2, lambda_step=0.5)
    assert out["lambda"] == 0.5 and out["num_variants"] == 1
    assert out["train_tau"] == pytest.approx(1.0)
    assert out["test_tau"] == pytest.approx(out["train_tau"])
    # all-negative grid → fallback winner stays (λ=0, nv=0, tau 0.0)
    anti = pd.DataFrame({"qid": qids, "ap": base})  # ap == base ordering
    flip = pd.DataFrame({"qid": qids, "est": ap})   # est anti-ordered
    var_anti = pd.DataFrame({"qid": qids, "variant_rank": 0,
                             "ref_sim": 1.0, "est": ap})
    out2 = train_and_test(anti, flip, var_anti, anti, flip, var_anti,
                          max_num_variants=1, lambda_step=0.5)
    assert out2["num_variants"] == 0 and out2["lambda"] == 0.0
    assert out2["train_tau"] == 0.0
