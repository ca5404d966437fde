"""Measured quality/throughput anchors (recorded in BASELINE.md):

* ``--ann``: recall@10 of the approximate ANN paths (LSH-bucketed,
  IVF-probed) against the exact brute-force baseline on the sf
  embeddings table — the number that justifies calling them the scale
  path.
* ``--media``: multimodal decode throughput (rows/s per modality) over
  REAL mixed-format payloads (PNG + baseline JPEG images, WAV audio,
  MPNG/MP4 video) through the actor-pool stages.

Usage: python scripts/quality_anchors.py [--ann] [--media] [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ann_recall(sf_dir: str, n_queries: int = 50) -> None:
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from lucene_msmarco_ray.ops.ann import brute_force_knn, ivf_knn, lsh_knn

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    qids = emb["vec_id"].slice(0, n_queries).to_numpy().astype(np.int64)
    qmat = np.asarray(emb["embedding"].slice(0, n_queries).to_pylist(),
                      np.float64)

    def run(fn, label, **kw):
        ds = rd.from_arrow(emb)
        out = fn(ds, qids, qmat, k=10, **kw).to_pandas()
        return label, {qid: set(g["vec_id"]) for qid, g in
                       out.groupby("q_id")}

    _, truth = run(brute_force_knn, "exact")
    variants = []
    for n_probe in (2, 4, 8):
        variants.append((f"ivf (nlist=8, nprobe={n_probe}, "
                         f"scans ~{n_probe}/8 of corpus)",
                         lambda ds, a, b, k, p=n_probe:
                         ivf_knn(ds, a, b, k=k, n_probe=p)))
    for nbits, mp in ((2, 0), (4, 0), (6, 0), (4, 2), (6, 3), (6, 6)):
        probes = 1 + mp
        variants.append((f"lsh (nbits={nbits}, multiprobe={mp}, scans "
                         f"~{probes}/{1 << nbits} of corpus)",
                         lambda ds, a, b, k, n=nbits, m=mp:
                         lsh_knn(ds, a, b, k=k, nbits=n, multiprobe=m)))
    for label, fn in variants:
        _, approx = run(fn, label)
        hits = sum(len(approx.get(qid, set()) & truth[qid])
                   for qid in truth)
        tot = sum(len(truth[qid]) for qid in truth)
        print(f"{label}: recall@10 = {hits / tot:.4f} "
              f"({hits}/{tot} over {len(truth)} queries)")


def media_throughput(n_per_kind: int = 400) -> None:
    import ray.data as rd

    from lucene_msmarco_ray.ops.multimodal import (
        decode_media,
        synth_real_media_table,
    )
    tbl = synth_real_media_table(3 * n_per_kind)
    ds = rd.from_arrow(tbl).materialize()
    for kind, kw in (("image", {}), ("audio", {}),
                     ("video", {"stride_ms": 80})):
        t0 = time.time()
        out = decode_media(ds, kind, fake=False, batch_size=32,
                           concurrency=(1, 8), **kw)
        nrows = out.count()
        dt = time.time() - t0
        print(f"{kind}: {n_per_kind} payloads -> {nrows} rows in {dt:.2f}s "
              f"= {n_per_kind / dt:.0f} payloads/s")


if __name__ == "__main__":
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sf = next((a for a in sys.argv[1:] if not a.startswith("--")),
              "/root/testdata/sf0.1")
    if "--ann" in sys.argv or len(sys.argv) == 1:
        ann_recall(sf)
    if "--media" in sys.argv or len(sys.argv) == 1:
        media_throughput()
    ray.shutdown()
