"""Evaluation metrics vs hand-computed goldens (reference semantics incl.
rel>=2 threshold, RR-of-last-rel quirk, linear-gain nDCG)."""

import math

import pandas as pd
import pytest

from lucene_msmarco_ray.eval.metrics import evaluate_run, per_query_metrics
from lucene_msmarco_ray.sources.trec import (
    read_qrels,
    read_queries,
    read_run,
    resort_run,
    write_run,
)


@pytest.fixture
def tiny_run(ray_session):
    import ray.data as rd
    return rd.from_items([
        {"qid": "1", "doc_id": 5, "rank": 1, "score": 0.9},
        {"qid": "1", "doc_id": 1, "rank": 2, "score": 0.8},
        {"qid": "1", "doc_id": 2, "rank": 3, "score": 0.7},
        {"qid": "1", "doc_id": 3, "rank": 4, "score": 0.6},
    ])


QRELS = pd.DataFrame({"qid": ["1", "1", "1"], "docid": [1, 2, 3],
                      "rel": [3, 1, 2]})


def test_metrics_goldens(tiny_run):
    pq = per_query_metrics(tiny_run, QRELS, cutoffs=(10,)).to_pandas()
    row = pq.iloc[0]
    assert row["ap"] == pytest.approx((1 / 2 + 2 / 4) / 2)
    assert row["p5"] == pytest.approx(2 / 5)
    assert row["p10"] == pytest.approx(2 / 10)
    # RR quirk: reciprocal of the LAST rel>0 doc seen (rank 4), not the first
    assert row["rr"] == pytest.approx(0.25)
    # recall: rel>=2 hits (docs 1,3) over ALL rel>0 labels (3 of them) —
    # reference divides by relMap.size() (RetrievedResults.java:184-195)
    assert row["recall"] == pytest.approx(2 / 3)
    dcg = 3 / math.log2(3) + 1 / math.log2(4) + 2 / math.log2(5)
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert row["ndcg10"] == pytest.approx(dcg / idcg, abs=1e-6)


def test_rr_counts_rel1_docs(tiny_run):
    # computeRR skips only rel<=0: a trailing rel=1 doc (below EVAL_MIN_REL)
    # still resets RR (RetrievedResults.java:197-206)
    qr = pd.DataFrame({"qid": ["1", "1"], "docid": [1, 3], "rel": [3, 1]})
    row = per_query_metrics(tiny_run, qr, cutoffs=(10,)).to_pandas().iloc[0]
    assert row["rr"] == pytest.approx(0.25)   # doc 3 (rel=1) at rank 4
    assert row["recall"] == pytest.approx(1 / 2)


def test_macro(tiny_run):
    pq, macro = evaluate_run(tiny_run, QRELS, cutoffs=(10,))
    assert macro["recall"] == pytest.approx(2 / 3)
    assert macro["ap"] == pq["ap"].mean()


def test_trec_roundtrip(tmp_path, tiny_run):
    p = str(tmp_path / "run.res")
    write_run(tiny_run, p, run_name="t")
    lines = open(p).read().splitlines()
    assert lines[0].split("\t") == ["1", "Q0", "5", "1", "0.900000", "t"]
    df = read_run(p)
    assert df["docid"].tolist() == ["5", "1", "2", "3"]
    assert df["rank"].tolist() == [1, 2, 3, 4]


def test_run_reader_variants(tmp_path):
    # unsorted 6-col with duplicate scores → resort + tie-break docid asc
    p = str(tmp_path / "u.res")
    open(p, "w").write("1 Q0 d2 9 0.5 x\n1 Q0 d9 1 0.9 x\n1 Q0 d1 5 0.5 x\n")
    df = read_run(p)
    assert df["docid"].tolist() == ["d9", "d1", "d2"]
    assert df["rank"].tolist() == [1, 2, 3]
    # 3-col
    p3 = str(tmp_path / "m3.res")
    open(p3, "w").write("1 d1 0.3\n1 d2 0.7\n")
    assert read_run(p3)["docid"].tolist() == ["d2", "d1"]
    # 2-col: order of appearance
    p2 = str(tmp_path / "m2.res")
    open(p2, "w").write("1 d7\n1 d4\n")
    assert read_run(p2)["docid"].tolist() == ["d7", "d4"]
    # truncate
    assert len(read_run(p, num_wanted=2)) == 2


def test_qrels_and_queries_readers(tmp_path):
    q = str(tmp_path / "q.tsv")
    open(q, "w").write("7\thello world\n8\tfoo\n")
    df = read_queries(q)
    assert df["qid"].tolist() == ["7", "8"]
    r = str(tmp_path / "q.qrels")
    open(r, "w").write("7 0 d1 2\n7 0 d2 0\n8 0 d3 1\n")
    qr = read_qrels(r)
    # rel<=0 dropped at parse (reference behavior)
    assert len(qr) == 2 and set(qr["docid"]) == {"d1", "d3"}
