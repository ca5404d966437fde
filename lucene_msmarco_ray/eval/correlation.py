"""Rank/score correlation metrics and list-overlap measures (SURVEY.md §2.11,
O3-O5) — driver-side functions over per-query arrays (≤ a few hundred
queries), semantics mirrored from the reference with quirks flagged.

* pearson/spearman/kendall — commons-math3 equivalents (reference:
  src/main/java/correlation/{Pearson,Spearman,Kendal}Correlation.java);
  kendall is tau-b, like commons-math3 KendallsCorrelation.
* rmse (RmseCorrelation.java:16-40): pred is min-max normalized only when
  max(pred) > 1 (quirk), gt used as-is.
* pairwise accuracy (PairwiseAccuracyMetric.java:3-36): fraction of pairs
  (i<j) on which pred and ref order the same way, with <= comparisons.
* quantized class accuracy / sim / strict (Quantized*.java): min-max
  normalize both, quantize into numIntervals bins by floor(x/delta) — note
  the max value lands in bin numIntervals (quirk of (int)(1.0/delta)).
* SARE (SARE.java:25-63): sort (index, score) pairs by score ASC on both
  sides; per position, |gt_index − pred_index|/n; mean over positions.
* RBO (OverlapStats.java:61-105): set-based — (1−p)·Σ_{d=1..k}
  p^{d−1}·|A_d ∩ B_d|/d with p=0.9.
* rank-dist (OverlapStats.java:119-140): positions of A compared against
  positions in the doc-id-SORTED B (binarySearch quirk), RMS of the
  normalized shifts over the intersection.
* min-max normalize (MinMaxNormalizer.java:9-23): errors out on max==min in
  the reference; we raise ValueError.
"""

from __future__ import annotations

import numpy as np


def pearson(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.corrcoef(a, b)[0, 1])


def _average_ranks(x: np.ndarray) -> np.ndarray:
    order = np.argsort(x, kind="stable")
    ranks = np.empty(x.size, np.float64)
    ranks[order] = np.arange(1, x.size + 1)
    # average ranks over ties
    for v in np.unique(x):
        m = x == v
        if m.sum() > 1:
            ranks[m] = ranks[m].mean()
    return ranks


def spearman(a, b) -> float:
    return pearson(_average_ranks(np.asarray(a, np.float64)),
                   _average_ranks(np.asarray(b, np.float64)))


def kendall(a, b) -> float:
    """Kendall tau-b with tie correction (commons-math3 KendallsCorrelation
    semantics). O(n²) pairwise — fine for per-query arrays (≤ hundreds)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    i, j = np.triu_indices(a.size, k=1)
    da = np.sign(a[i] - a[j])
    db = np.sign(b[i] - b[j])
    conc = float(np.sum((da * db) > 0))
    disc = float(np.sum((da * db) < 0))
    ties_a = float(np.sum((da == 0) & (db != 0)))
    ties_b = float(np.sum((db == 0) & (da != 0)))
    denom = np.sqrt((conc + disc + ties_a) * (conc + disc + ties_b))
    return (conc - disc) / denom if denom else np.nan


def minmax_normalize(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    lo, hi = x.min(), x.max()
    if hi == lo:
        raise ValueError("max and min identical for minmax normalization")
    return (x - lo) / (hi - lo)


def rmse(gt, pred) -> float:
    gt = np.asarray(gt, np.float64)
    pred = np.asarray(pred, np.float64)
    if pred.max() > 1:   # reference quirk: normalize pred only when needed
        pred = minmax_normalize(pred)
    return float(np.sqrt(np.mean((pred - gt) ** 2)))


def pairwise_accuracy(pred, ref) -> float:
    pred = np.asarray(pred, np.float64)
    ref = np.asarray(ref, np.float64)
    i, j = np.triu_indices(pred.size, k=1)
    agree = (pred[i] <= pred[j]) == (ref[i] <= ref[j])
    return float(agree.mean())


def _quantize(x: np.ndarray, num_intervals: int) -> np.ndarray:
    delta = 1.0 / num_intervals
    return (x / delta).astype(np.int64)


def quantized_class_accuracy(gt, pred, num_intervals: int = 10) -> float:
    qa = _quantize(minmax_normalize(gt), num_intervals)
    qb = _quantize(minmax_normalize(pred), num_intervals)
    return float((qa == qb).mean())


def quantized_sim(gt, pred, num_intervals: int = 10) -> float:
    qa = _quantize(minmax_normalize(gt), num_intervals)
    qb = _quantize(minmax_normalize(pred), num_intervals)
    max_dist = num_intervals * qa.size
    return 1.0 - float(np.abs(qa - qb).sum()) / max_dist


def quantized_strict_match(gt, pred, num_intervals: int = 10) -> float:
    return quantized_class_accuracy(gt, pred, num_intervals)


def sare_per_query(gt, pred) -> np.ndarray:
    gt = np.asarray(gt, np.float64)
    pred = np.asarray(pred, np.float64)
    n = gt.size
    # stable sort ASC by score; rank field = original index
    gt_order = np.argsort(gt, kind="stable")
    pred_order = np.argsort(pred, kind="stable")
    return np.abs(gt_order - pred_order) / n


def sare(gt, pred) -> float:
    return float(sare_per_query(gt, pred).mean())


def rbo(list_a, list_b, k: int | None = None, p: float = 0.9) -> float:
    """Set-based RBO as in the reference (not the Webber et al. tail-extrapolated
    form): (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d."""
    a = list(list_a)
    b = list(list_b)
    if k is None:
        k = len(a)
    total = 0.0
    for d in range(1, k + 1):
        ov = len(set(a[:d]) & set(b[:d]))
        total += (ov / d) * p ** (d - 1)
    return (1 - p) * total


def rank_dist(list_a, list_b) -> float:
    """RMS normalized rank shift over the intersection; positions in B are
    positions in the doc-id-SORTED B array (reference binarySearch quirk)."""
    a = np.asarray(list_a)
    b_sorted = np.sort(np.asarray(list_b))
    n = a.size
    total = 0.0
    for pos_a, doc in enumerate(a):
        pos_b = np.searchsorted(b_sorted, doc)
        if pos_b < b_sorted.size and b_sorted[pos_b] == doc:
            d = (pos_a - pos_b) / n
            total += d * d
    return float(np.sqrt(total / n))


def polynomial_fit(x, y, degree: int = 2) -> np.ndarray:
    """Least-squares polynomial fit (reference:
    src/main/java/correlation/PolynomialRegression.java — commons-math3
    PolynomialCurveFitter.create(2) over observed points). Returns the
    coefficients in ASCENDING degree order, like commons-math3 (coeff[0] is
    the constant term)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    return np.polyfit(x, y, degree)[::-1].copy()


def polynomial_predict(coeffs, x) -> np.ndarray:
    """Evaluate an ascending-coefficient polynomial at ``x``."""
    c = np.asarray(coeffs, np.float64)
    return np.polyval(c[::-1], np.asarray(x, np.float64))


def polyfit_r2(gt, pred, degree: int = 2) -> float:
    """Registered-metric form of the polynomial regression: R² of the
    degree-``degree`` least-squares fit predicting ``pred`` from ``gt``
    (1.0 = pred is an exact polynomial function of gt)."""
    gt = np.asarray(gt, np.float64)
    pred = np.asarray(pred, np.float64)
    fitted = polynomial_predict(polynomial_fit(gt, pred, degree), gt)
    ss_res = float(np.sum((pred - fitted) ** 2))
    ss_tot = float(np.sum((pred - pred.mean()) ** 2))
    return 1.0 - ss_res / ss_tot if ss_tot else 1.0


def jaccard(list_a, list_b) -> float:
    sa, sb = set(list_a), set(list_b)
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0


METRIC_REGISTRY = {
    "pearson": pearson, "spearman": spearman, "kendall": kendall,
    "rmse": rmse, "pairacc": pairwise_accuracy, "sare": sare,
    "classacc": quantized_class_accuracy, "qsim": quantized_sim,
    "qsim_strict": quantized_strict_match, "polyfit_r2": polyfit_r2,
}
