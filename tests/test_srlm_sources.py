"""SRLM / Rocchio / induced rescoring / bigrams / extra sources."""

import json
import math

import numpy as np
import pytest

from lucene_msmarco_ray.fdbk.srlm import (
    SupervisedRLMModel,
    avg_lm_doc_model,
    bm25_weight_reference_helper,
    cosine_sim,
    frequent_bigrams,
    induce_scores,
    lm_term_weights,
    lmjm_weight,
    parse_variants_tsv,
    rocchio_expand,
    variant_specificity,
)
from lucene_msmarco_ray.sources.extra import (
    read_metadata_jsonl,
    read_preevaluated,
    write_permutation_map,
)

DF = {"a": 10, "b": 5, "c": 2}
N = 100


def dfl(t):
    return DF.get(t, 0)


def test_lm_term_weights():
    vec = {"a": 2, "b": 1}
    w = lm_term_weights(vec, N, dfl)
    raw_a = math.log(1 + 9 * (2 / 3) * (100 / 10))
    raw_b = math.log(1 + 9 * (1 / 3) * (100 / 5))
    norm = math.hypot(raw_a, raw_b)
    assert w["a"] == pytest.approx(raw_a / norm)
    assert w["b"] == pytest.approx(raw_b / norm)
    # df=0 terms dropped
    assert "zz" not in lm_term_weights({"zz": 3, "a": 1}, N, dfl)


def test_srlm_fit_update_and_roundtrip(tmp_path):
    m = SupervisedRLMModel()
    doc_wts = {"q1": 0.5, "w1": 0.3, "w2": 0.2}
    m.update("q1", doc_wts)
    assert m.dists["q1"]["w1"] == pytest.approx(0.15)
    assert m.dists["q1"]["q1"] == pytest.approx(0.25)
    # qterm absent from doc → no contribution at all
    m.update("zz", doc_wts)
    assert "zz" not in m.dists
    p = str(tmp_path / "model.tsv")
    m.save_tsv(p)
    m2 = SupervisedRLMModel.load_tsv(p, prune=True)
    assert m2.dists["q1"] == pytest.approx(m.dists["q1"])


def test_srlm_prune_and_rerank():
    m = SupervisedRLMModel()
    m.dists["q"] = {f"t{i}": float(i) for i in range(10)}
    m.prune(5)
    assert set(m.dists["q"]) == {"t9", "t8", "t7", "t6", "t5"}
    wts = {"t9": 1.0}
    out = m.rerank("q", [(1, 2.0), (2, 1.0)],
                   lambda d: wts if d == 1 else {})
    assert out[0][0] == 1 and out[0][1] == pytest.approx(9.0 * 2.0)
    assert out[1][1] == 0.0


def test_rocchio():
    rel = {"kq": {101}}
    docw = {101: {"x": 0.5, "y": 0.5}, 102: {"z": 1.0}}
    out = rocchio_expand(["q"], [("kq", 1.0)], lambda q: rel.get(q),
                         [101, 102], lambda d: docw[d])
    d = dict(out)
    assert d["q"] == pytest.approx(0.5)
    # beta/|rel| * 0.5 for x,y ; gamma/1 * 1.0 subtracted for z (z absent → excluded)
    assert d["x"] == pytest.approx(0.35 * 0.5)
    assert "z" not in d  # negative weight filtered


def test_avg_lm_doc_model():
    docw = {1: {"x": 3.0, "y": 4.0}}
    m = avg_lm_doc_model([("q", 2.0)], lambda q: {1}, lambda d: docw[d])
    assert m["x"] == pytest.approx(6.0 / 10.0)
    assert m["y"] == pytest.approx(8.0 / 10.0)


def test_induce_scores():
    vecs = {1: {"a": 2, "b": 1}, 2: {"c": 5}}
    out = induce_scores([(1, 9.9), (2, 0.1)], ["a", "c"], N, dfl,
                        lambda d: vecs[d], lam=0.2)
    s1 = lmjm_weight(2, N, 10, 3.0, 0.2)
    s2 = lmjm_weight(5, N, 2, 5.0, 0.2)
    got = {d: s for d, _, s in out}
    assert got[1] == pytest.approx(s1) and got[2] == pytest.approx(s2)
    assert out[0][1] == 1  # ranks reassigned by new score


def test_bigrams():
    out = frequent_bigrams([["a", "b", "c"], ["a", "c"]], top_n=2)
    assert out[0] == ("a^c", 2)
    assert len(out) == 2


def test_variants_and_combine(tmp_path):
    p = str(tmp_path / "v.tsv")
    open(p, "w").write("7\torig text\tv one\tv two\n8\torig\tx\n")
    vs = parse_variants_tsv(p, known_qids={"7"})
    assert list(vs) == ["7"] and vs["7"][0] == ("7_v_2", "v one")
    assert variant_specificity(2.0, [], 0.5) == 2.0
    assert variant_specificity(2.0, [(1.0, 4.0), (1.0, 0.0)], 0.5) == \
        pytest.approx(0.5 * 2.0 + 0.5 * 2.0)


def test_reference_helper_quirk():
    # idf sits in the denominator — weight DECREASES as idf grows
    lo = bm25_weight_reference_helper(1.2, 0.75, 3, 1000, 500, 10)
    hi = bm25_weight_reference_helper(1.2, 0.75, 3, 1000, 5, 10)
    assert hi < lo


def test_metadata_reader(tmp_path):
    p = str(tmp_path / "m.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"page_id": 1, "gender": "['male']"}) + "\n")
        f.write(json.dumps({"page_id": 2, "gender": "['female','x']"}) + "\n")
        f.write(json.dumps({"page_id": 3, "gender": "[]"}) + "\n")
    m = read_metadata_jsonl(p)
    assert m == {"1": True, "2": False}


def test_preevaluated_reader(tmp_path):
    p = str(tmp_path / "e.txt")
    open(p, "w").write("qid ndcg awrf\n7 0.5 0.25\n")
    df = read_preevaluated(p)
    assert df.iloc[0]["qid"] == "7" and df.iloc[0]["awrf"] == 0.25


def test_permutation_map(tmp_path):
    p = str(tmp_path / "pm.tsv")
    write_permutation_map(p, {"1": [5, 6, 7]}, {"1": [6, 5, 7]}, sample_id=1)
    assert open(p).read() == "1\t2>1,1>2,3>3,\n"
    write_permutation_map(p, {"1": [5, 6, 7]}, {"1": [6, 5, 7]}, sample_id=0)
    assert open(p).read() == "1\t1>1,2>2,3>3,\n"
