"""PostProcess.py equivalent (eval/overlap.py) and the evalat50-style
directory evaluator, against hand-computed goldens."""

import gzip

import pandas as pd
import pytest

from lucene_msmarco_ray.eval.overlap import (
    _est_top_words,
    _orig_top_words,
    overlap_summary,
    top_term_overlap,
)


def test_est_top_words_quirks():
    vocab = {0: "w0", 1: "w1", 2: "w2", 3: "w3"}
    # STRING sort: "9.5" > "10.2" (reference quirk)
    vals = ["10.2", "9.5", "9.5", "1.0"]
    # desc string order: 9.5 (pos 1,2) → 10.2 (pos 0) → 1.0 (pos 3)
    assert _est_top_words(vals, vocab, k=2) == ["w1", "w2"]
    # k cutoff only applies AFTER a value's positions all land (can exceed k)
    assert _est_top_words(vals, vocab, k=1) == ["w1", "w2"]
    assert _est_top_words(vals, vocab, k=3) == ["w1", "w2", "w0"]


def test_orig_top_words_exact_cut():
    terms = ["a", "b", "c"]
    wts = ["9.5", "9.5", "10.2"]
    # string sort: 9.5 first; cut INSIDE the expansion at exactly k
    assert _orig_top_words(terms, wts, k=1) == ["a"]
    assert _orig_top_words(terms, wts, k=3) == ["a", "b", "c"]


def test_top_term_overlap_pipeline(ray_session):
    import ray.data as rd
    vocab = {0: "alpha", 1: "beta", 2: "gamma"}
    est = rd.from_items([
        {"doc_id": 1, "vals": ["5.0", "9.0", "1.0"]},   # top: beta, alpha
        {"doc_id": 2, "vals": ["1.0", "2.0", "3.0"]},   # top: gamma, beta
    ], override_num_blocks=2)
    orig = rd.from_items([
        {"doc_id": 1, "term": "beta", "wt": "8.0", "pos": 0},
        {"doc_id": 1, "term": "delta", "wt": "7.0", "pos": 1},
        {"doc_id": 2, "term": "gamma", "wt": "9.0", "pos": 0},
        {"doc_id": 2, "term": "beta", "wt": "1.0", "pos": 1},
    ], override_num_blocks=2)
    out = top_term_overlap(est, orig, vocab, k=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["overlap"].tolist() == [1, 2]       # doc1: beta; doc2: both
    assert out["frac_orig"].tolist() == [0.5, 1.0]
    s = overlap_summary(out)
    assert s == {"avg_frac_orig": 0.75, "docs": 2}
    assert overlap_summary(out, avg_denom=1000)["avg_frac_orig"] \
        == pytest.approx(0.0015)


def test_evaluate_run_dir(ray_session, tmp_path):
    from lucene_msmarco_ray.eval.metrics import evaluate_run_dir
    qrels = tmp_path / "q.qrels"
    qrels.write_text("1 0 10 2\n1 0 11 1\n2 0 20 3\n")
    (tmp_path / "a2019.res").write_text(
        "1 Q0 10 1 0.9 x\n1 Q0 12 2 0.8 x\n")
    with gzip.open(tmp_path / "b2020.res.gz", "wt") as f:
        f.write("2 Q0 20 1 0.7 x\n")
    pq_df, macro = evaluate_run_dir(str(tmp_path), str(qrels), depth=50)
    assert sorted(pq_df["qid"]) == ["1", "2"]
    # q1: 1 of 2 rel>0 labels found (the rel=2 one) → recall 0.5; q2: 1/1
    assert macro["recall"] == pytest.approx(2 / 3)
    assert macro["ap"] == pytest.approx((1.0 + 1.0) / 2)
    # depth truncation works
    _, macro1 = evaluate_run_dir(str(tmp_path), str(qrels), depth=1)
    assert macro1["ap"] == macro["ap"]