"""Bucketed hash join and embedding near-dup ops."""

import numpy as np
import pytest


def test_bucketed_hash_join(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.join import bucketed_hash_join
    left = rd.from_items([{"k": i, "a": i * 10} for i in range(50)])
    right = rd.from_items([{"k": i, "b": i * 100} for i in range(0, 50, 2)])
    out = bucketed_hash_join(left, right, key="k", num_buckets=8).to_pandas()
    assert len(out) == 25
    out = out.sort_values("k")
    assert (out["b"] == out["k"] * 100).all()
    assert (out["a"] == out["k"] * 10).all()
    # no-match join is empty
    far = rd.from_items([{"k": 999, "b": 1}])
    assert len(bucketed_hash_join(left, far, key="k").to_pandas()) == 0


def test_embedding_neardup(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.ann import embedding_neardup
    rng = np.random.default_rng(0)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    # rows 0 and 1 are near-identical; row 2 is the exact negation of 0
    base[1] = base[0] + 0.001
    base[2] = -base[0]
    ds = rd.from_items([{"vec_id": i, "embedding": base[i].tolist()}
                        for i in range(20)])
    out = embedding_neardup(ds, threshold=0.95).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs
    assert all(a < b for a, b in pairs)          # each pair exactly once, a<b
    assert not any({a, b} == {0, 2} for a, b in pairs)
    assert (out["cosine"] >= 0.95).all()
