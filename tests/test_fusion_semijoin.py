"""Semi/anti joins and reciprocal-rank fusion against hand-computed
goldens."""

import numpy as np
import pyarrow as pa
import pytest


def test_semi_and_anti_join(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.join import bucketed_semi_join
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 2, 5], pa.int64()),
        "v": pa.array(["a", "b", "c", "d", "e"])}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 2, 3, 9], pa.int64())}))
    sch = pa.schema([pa.field("k", pa.int64()), pa.field("v", pa.string())])
    semi = bucketed_semi_join(left, right, key="k", right_key="rk",
                              how="semi", left_schema=sch).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert semi["v"].tolist() == ["b", "c", "d"]
    anti = bucketed_semi_join(left, right, key="k", right_key="rk",
                              how="anti", left_schema=sch).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert anti["v"].tolist() == ["a", "e"]
    assert str(anti["k"].dtype) == "int64"      # schema never widens


def test_semi_join_rejects_bad_how(ray_session):
    from lucene_msmarco_ray.ops.join import bucketed_semi_join
    with pytest.raises(ValueError):
        bucketed_semi_join(None, None, key="k", how="outer")


def test_rrf_fuse_goldens(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import rrf_fuse

    def run(rows):
        return rd.from_arrow(pa.table({
            "qid": pa.array([r[0] for r in rows]),
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int64())}))

    # q1: doc 10 is rank 1 in A and rank 2 in B; doc 20 rank 2/1;
    # doc 30 only in A (rank 3)
    a = run([("q1", 10, 1), ("q1", 20, 2), ("q1", 30, 3)])
    b = run([("q1", 20, 1), ("q1", 10, 2)])
    out = rrf_fuse([a, b], k_rrf=60).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    big = 10 ** 12
    exp = {10: big // 61 + big // 62, 20: big // 62 + big // 61,
           30: big // 63}
    assert dict(zip(out["doc_id"], out["rrf_micro"])) == exp
    assert dict(zip(out["doc_id"], out["n_runs"])) == {10: 2, 20: 2, 30: 1}

    # doc 10 and 20 tie exactly (same integer contributions) → tie broken
    # by item id ascending in the ranked variant
    ranked = rrf_fuse([a, b], k_rrf=60, topk=2).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    assert ranked["doc_id"].tolist() == [10, 20]
    assert ranked["rank"].tolist() == [1, 2]
