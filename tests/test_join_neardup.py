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


def test_bucketed_hash_join_left_keeps_int_dtypes(ray_session):
    """Non-inner joins: unmatched rows are typed nulls — the right side's
    int column must stay int64 in EVERY output block (no partition-dependent
    float64 widening)."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from lucene_msmarco_ray.ops.join import bucketed_hash_join
    left = rd.from_items([{"k": i, "a": i * 10} for i in range(50)])
    right = rd.from_items([{"k": i, "b": i * 100} for i in range(0, 50, 7)])
    out = bucketed_hash_join(left, right, key="k", num_buckets=8, how="left")
    blocks = [ray.get(r) for r in out.to_arrow_refs()]
    for blk in blocks:
        if blk.num_rows:
            assert blk.schema.field("b").type == pa.int64(), blk.schema
    tbl = pa.concat_tables([b for b in blocks if b.num_rows]).to_pandas()
    assert len(tbl) == 50
    m = tbl[tbl["k"] % 7 == 0]
    assert (m["b"] == m["k"] * 100).all()
    assert tbl["b"].isna().sum() == 50 - len(m)


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


def test_embedding_neardup_matches_allpairs(ray_session, tmp_path):
    """Block-pair self-join == naive all-pairs, at several block counts
    (pairs must appear exactly once regardless of block assignment)."""
    import ray.data as rd

    from lucene_msmarco_ray.ops.ann import embedding_neardup
    rng = np.random.default_rng(7)
    m = rng.standard_normal((40, 8))
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    thr = 0.3
    exp = {(i, j) for i in range(40) for j in range(i + 1, 40)
           if sims[i, j] >= thr}
    for nb in (1, 3, 8):
        ds = rd.from_items([{"vec_id": i, "embedding": m[i].tolist()}
                            for i in range(40)])
        out = embedding_neardup(ds, threshold=thr, num_blocks=nb,
                                work_dir=str(tmp_path / f"nb{nb}")).to_pandas()
        got = set(zip(out["doc_a"], out["doc_b"]))
        assert got == exp, f"num_blocks={nb}"
        assert len(out) == len(got)              # no duplicate emission


def test_ivf_knn_recall_and_determinism(ray_session):
    """IVF top-k ⊆ probed clusters; the probed clusters' results agree with
    brute force restricted to them; kmeans is parallelism-invariant."""
    import ray.data as rd

    from lucene_msmarco_ray.ops.ann import (
        _assign_clusters,
        brute_force_knn,
        ivf_knn,
        kmeans_fit,
    )
    rng = np.random.default_rng(5)
    m = rng.standard_normal((80, 8))
    items = [{"vec_id": i, "embedding": m[i].tolist()} for i in range(80)]
    ds1 = rd.from_items(items, override_num_blocks=1)
    ds8 = rd.from_items(items, override_num_blocks=8)
    c1 = kmeans_fit(ds1, n_clusters=4, n_iters=2)
    c8 = kmeans_fit(ds8, n_clusters=4, n_iters=2)
    assert np.array_equal(c1, c8)            # 9dp rounding ⇒ invariant

    qids = np.array([0, 3])
    out = ivf_knn(rd.from_items(items, override_num_blocks=4), qids, m[[0, 3]],
                  k=5, n_clusters=4, n_probe=2, n_iters=2).to_pandas()
    # every result's vector lies in one of the query's probed clusters
    assign = _assign_clusters(m, c1)
    d2 = np.round(((m[[0, 3]][:, None, :] - c1[None, :, :]) ** 2).sum(axis=2), 9)
    probes = np.argsort(d2, kind="stable", axis=1)[:, :2]
    for qi, q in enumerate(qids):
        sub = out[out["q_id"] == q]
        assert set(assign[sub["vec_id"].to_numpy()]) <= set(probes[qi])
        # and within the probed set, it IS the brute-force answer
        allowed = np.flatnonzero(np.isin(assign, probes[qi]))
        ds_allowed = rd.from_items([items[i] for i in allowed],
                                   override_num_blocks=2)
        bf = brute_force_knn(ds_allowed, np.array([q]), m[[q]],
                             k=5).to_pandas()
        assert sub.sort_values("rank")["vec_id"].tolist() == \
            bf.sort_values("rank")["vec_id"].tolist()


def test_lsh_knn_per_query_bucket(ray_session):
    """Each query's results only contain vectors from ITS bucket, and sims
    agree with brute force on those vectors."""
    import ray.data as rd

    from lucene_msmarco_ray.ops.ann import (
        brute_force_knn,
        lsh_buckets,
        lsh_knn,
        lsh_planes,
    )
    rng = np.random.default_rng(3)
    m = rng.standard_normal((60, 16))
    ds = rd.from_items([{"vec_id": i, "embedding": m[i].tolist()}
                        for i in range(60)])
    qids = np.array([0, 5])
    qmat = m[[0, 5]]
    out = lsh_knn(ds, qids, qmat, k=5, nbits=3, seed=5).to_pandas()
    planes = lsh_planes(3, 16, seed=5)
    buckets = lsh_buckets(m, planes)
    for q in (0, 5):
        sub = out[out["q_id"] == q]
        assert (buckets[sub["vec_id"].to_numpy()] == buckets[q]).all()
    # the query vector itself (sim 1.0) is always in its own bucket → rank 1
    assert out[out["q_id"] == 0].iloc[0]["vec_id"] == 0


def test_lsh_knn_multiprobe_recall_and_probe_membership(ray_session):
    """Multiprobe results stay within each query's probe set (own bucket +
    lowest-margin bit flips), recall vs brute force is monotone in probe
    count, and probing every 1-bit flip recovers everything a Hamming-1
    neighborhood can."""
    import ray.data as rd

    from lucene_msmarco_ray.ops.ann import (
        brute_force_knn,
        lsh_buckets,
        lsh_knn,
        lsh_planes,
    )
    rng = np.random.default_rng(11)
    m = rng.standard_normal((200, 16))
    ds = rd.from_items([{"vec_id": i, "embedding": m[i].tolist()}
                        for i in range(200)])
    qsel = [0, 7, 19]
    qids = np.array(qsel)
    qmat = m[qsel]
    nbits = 4
    exact = brute_force_knn(rd.from_items(
        [{"vec_id": i, "embedding": m[i].tolist()} for i in range(200)]),
        qids, qmat, k=10).to_pandas()
    truth = {q: set(g["vec_id"]) for q, g in exact.groupby("q_id")}

    planes = lsh_planes(nbits, 16, seed=5)
    buckets = lsh_buckets(m, planes)
    margins = np.abs(qmat @ planes.T)

    recalls = []
    for mp in (0, 2, nbits):
        out = lsh_knn(ds, qids, qmat, k=10, nbits=nbits, seed=5,
                      multiprobe=mp).to_pandas()
        for qi, q in enumerate(qsel):
            sub = out[out["q_id"] == q]
            flips = np.argsort(margins[qi], kind="stable")[:mp]
            allowed = {int(buckets[q])} | {int(buckets[q] ^ (1 << b))
                                           for b in flips}
            assert set(buckets[sub["vec_id"].to_numpy()].tolist()) \
                <= allowed
        hits = sum(len(set(out[out["q_id"] == q]["vec_id"]) & truth[q])
                   for q in qsel)
        recalls.append(hits / sum(len(truth[q]) for q in qsel))
    assert recalls[0] <= recalls[1] <= recalls[2]
    assert recalls[2] > recalls[0]          # the lever actually moves
