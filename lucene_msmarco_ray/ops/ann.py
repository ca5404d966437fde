"""Similarity search over an embedding column (``list<float>``).

* brute_force_knn — exact cosine top-k: the query matrix is broadcast ONCE
  via ``ray.put`` and each batch does one numpy matmul; per-batch partial
  top-k keeps the shuffle tiny (≤ k·n_queries rows per batch), then a single
  per-query group merge produces the final top-k. This is the baseline and
  the oracle for approximate variants.
* lsh_knn — random-hyperplane LSH bucketing (Charikar 2002): probe only the
  query buckets; recall < 1 traded for touching a fraction of the corpus —
  the scale path when brute force is too wide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return m / nrm


class _BruteForceStage:
    """Per-batch cosine vs the broadcast query matrix → partial top-k rows."""

    def __init__(self, qref, k: int, id_col: str, vec_col: str):
        q = ray.get(qref)
        self.qids = q["qids"]
        self.qmat = _normalize(q["mat"])
        self.k, self.id_col, self.vec_col = k, id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        mat = _normalize(_batch_matrix(batch, self.vec_col))
        sims = self.qmat @ mat.T                      # (nq, nb)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            s = sims[qi]
            idx = np.argpartition(-s, k - 1)[:k] if s.size > k else np.arange(s.size)
            out_q.extend([self.qids[qi]] * idx.size)
            out_id.append(ids[idx])
            out_sim.append(s[idx])
        return pa.table({
            "q_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(np.concatenate(out_id) if out_id else
                               np.empty(0, np.int64)),
            "sim": pa.array(np.concatenate(out_sim) if out_sim else
                            np.empty(0, np.float64)),
        })


def _final_topk(k: int):
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["sim"] = g["sim"].round(6)
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["q_id", "vec_id", "rank", "sim"]]
    merge.__name__ = "final_topk"
    return merge


def brute_force_knn(ds, query_ids: np.ndarray, query_mat: np.ndarray, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact cosine top-k → (q_id, vec_id, rank, sim[rounded 6dp]).
    Ties broken (sim desc, vec_id asc) on the ROUNDED similarity so ranks are
    reproducible against the SQL oracle."""
    qref = ray.put({"qids": np.asarray(query_ids, np.int64),
                    "mat": np.asarray(query_mat, np.float64)})
    partial = ds.map_batches(
        _BruteForceStage, fn_constructor_kwargs=dict(
            qref=qref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 8))
    return partial.groupby("q_id").map_groups(_final_topk(k),
                                              batch_format="pandas")


class _NearDupStage:
    """block of vectors × broadcast full matrix → pairs (a < b) with cosine
    ≥ threshold. Exact baseline; the scale path buckets with lsh first so
    each block only multiplies against its candidate buckets."""

    def __init__(self, allref, threshold: float, id_col: str, vec_col: str):
        a = ray.get(allref)
        self.all_ids = a["ids"]
        self.all_mat = a["mat"]          # already normalized
        self.threshold = threshold
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        mat = _normalize(_batch_matrix(batch, self.vec_col))
        sims = mat @ self.all_mat.T                  # (nb, N)
        bi, aj = np.nonzero(sims >= self.threshold)
        left = ids[bi]
        right = self.all_ids[aj]
        keep = left < right                          # each pair once, a < b
        return pa.table({
            "doc_a": pa.array(left[keep], pa.int64()),
            "doc_b": pa.array(right[keep], pa.int64()),
            "cosine": pa.array(np.round(sims[bi, aj][keep], 6)),
        })


def embedding_neardup(ds, threshold: float = 0.95, id_col: str = "vec_id",
                      vec_col: str = "embedding"):
    """Embedding-cosine near-duplicate pairs → (doc_a, doc_b, cosine).
    Exact all-pairs via broadcast matrix + blocked matmul — O(N²) similarity
    but only O(N·d) shipped; swap in lsh_knn bucketing for the web-scale
    path."""
    import pyarrow.parquet  # noqa: F401  (ensure arrow loaded in workers)
    mats = []
    ids = []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        ids.append(b[id_col].to_numpy(zero_copy_only=False))
        mats.append(_normalize(_batch_matrix(b, vec_col)))
    allref = ray.put({"ids": np.concatenate(ids),
                      "mat": np.concatenate(mats)})
    return ds.map_batches(
        _NearDupStage, fn_constructor_kwargs=dict(
            allref=allref, threshold=threshold, id_col=id_col,
            vec_col=vec_col),
        batch_format="pyarrow", batch_size=2048, concurrency=(1, 8))


class _LshStage:
    """vec → (bucket, vec_id, embedding passthrough for rescoring)."""

    def __init__(self, planes_ref, id_col: str, vec_col: str):
        self.planes = ray.get(planes_ref)
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_matrix(batch, self.vec_col))
        bits = (mat @ self.planes.T) > 0                    # (n, nbits)
        bucket = np.zeros(mat.shape[0], dtype=np.int64)
        for b in range(self.planes.shape[0]):
            bucket |= bits[:, b].astype(np.int64) << b
        return batch.append_column("bucket", pa.array(bucket))


def lsh_knn(ds, query_ids: np.ndarray, query_mat: np.ndarray, k: int = 10,
            nbits: int = 8, seed: int = 5, id_col: str = "vec_id",
            vec_col: str = "embedding"):
    """Approximate cosine top-k probing only each query's LSH bucket.
    Partitioning assumption: bucket sizes ≈ n/2^nbits; skewed data ⇒ pick
    nbits so the hottest bucket still fits one group."""
    dim = query_mat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, dim))
    planes_ref = ray.put(planes)
    qmat = _normalize(np.asarray(query_mat, np.float64))
    qbits = (qmat @ planes.T) > 0
    qbucket = np.zeros(qmat.shape[0], dtype=np.int64)
    for b in range(nbits):
        qbucket |= qbits[:, b].astype(np.int64) << b
    wanted = set(int(x) for x in qbucket)

    bucketed = ds.map_batches(
        _LshStage, fn_constructor_kwargs=dict(
            planes_ref=planes_ref, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", concurrency=(1, 8))
    probed = bucketed.filter(expr=f"bucket in {sorted(wanted)}")
    qref = ray.put({"qids": np.asarray(query_ids, np.int64), "mat": qmat})
    partial = probed.map_batches(
        _BruteForceStage, fn_constructor_kwargs=dict(
            qref=qref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 8))
    return partial.groupby("q_id").map_groups(_final_topk(k),
                                              batch_format="pandas")
