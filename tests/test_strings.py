"""ops.strings: regex redaction + semi-structured field extraction."""

import pyarrow as pa
import pytest

from lucene_msmarco_ray.ops.strings import (extract_field_agg,
                                            extract_int_field, redact)


def _ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_redact_sequential_semantics(ray_session):
    # pattern 1's replacement CREATES a match for pattern 2 — the count
    # must see it (sequential, like chained regexp_replace in SQL)
    rows = [{"doc_id": 1, "text": "call alice now"},
            {"doc_id": 2, "text": "bob bob"},
            {"doc_id": 3, "text": "nothing here"}]
    out = redact(_ds(rows), [(r"alice|bob", "bob2"),
                             (r"bob2", "<X>")]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["text_redacted"].tolist() == [
        "call <X> now", "<X> <X>", "nothing here"]
    # doc 1: 1 (alice) + 1 (created bob2); doc 2: 2 + 2; doc 3: 0
    assert out["n_redactions"].tolist() == [2, 4, 0]


def test_extract_int_field_null_on_no_match(ray_session):
    rows = [{"event_id": 1, "props": '{"k": 7}'},
            {"event_id": 2, "props": "not json"},
            {"event_id": 3, "props": '{"k": 40}'}]
    out = extract_int_field(_ds(rows), r'"k":\s*(?P<k>\d+)', "props",
                            "event_id", out_col="k").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out["k"].tolist()[0] == 7 and out["k"].tolist()[2] == 40
    assert out["k"].isna().tolist() == [False, True, False]


def test_extract_field_agg_counts_matched_only(ray_session):
    rows = [{"event_type": "a", "props": '{"k": 1}'},
            {"event_type": "a", "props": "garbage"},
            {"event_type": "a", "props": '{"k": 2}'},
            {"event_type": "b", "props": '{"k": 10}'}]
    out = extract_field_agg(_ds(rows), r'"k":\s*(?P<k>\d+)', "props",
                            "event_type").to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    assert out["sum_value"].tolist() == [3, 10]
    assert out["n_rows"].tolist() == [2, 1]  # the garbage row is unmatched


def test_redact_parallelism_invariant(ray_session):
    # same output regardless of block structure
    rows = [{"doc_id": i, "text": f"user{i} said value twice value"}
            for i in range(200)]
    pats = [(r"user\d+", "<U>"), (r"\bvalue\b", "<V>")]
    a = redact(_ds(rows), pats).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = redact(_ds(rows).repartition(17), pats).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert (a["n_redactions"] == 3).all()
