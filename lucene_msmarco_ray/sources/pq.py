"""Right-sized parquet reads.

Ray's default read planning targets high parallelism: a small file is split
into up to ~num_cpus·2 tiny blocks. That is correct for CPU-bound per-row
work but actively harmful when the read feeds an all-to-all exchange —
a sort/groupby over 128 near-empty blocks is pure scheduling overhead
(measured: the sf0.1 ``asof_join`` gate's Sort exchange dropped 3.04 s →
0.9 s, 3.4× end-to-end, when the 2 MB events table was read as ONE block
instead of 128).

``read_parquet_sized`` applies the principled rule: ≥ ``target_block_bytes``
of file bytes per block (default 32 MB). Tiny inputs stop over-splitting
(floor ``min_blocks``); large inputs are unaffected — 100 GB at 32 MB/block
is 3200 blocks, full parallelism on any cluster we'd run. File size is
compressed parquet, so the in-memory block is a few× larger — 32 MB keeps
blocks comfortably under Ray's 128 MB in-memory target.
"""

from __future__ import annotations

import os

__all__ = ["read_parquet_sized", "sized_num_blocks"]

_TARGET_BLOCK_BYTES = 32 << 20


def _paths_bytes(paths) -> int:
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    total = 0
    for p in paths:
        p = os.fspath(p)
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files if f.endswith(".parquet"))
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def sized_num_blocks(paths, target_block_bytes: int = _TARGET_BLOCK_BYTES,
                     min_blocks: int = 1) -> int:
    """Number of read blocks so each holds ≥ target_block_bytes file bytes."""
    total = _paths_bytes(paths)
    return max(min_blocks, -(-total // max(1, target_block_bytes)))


def read_parquet_sized(paths, *, target_block_bytes: int = _TARGET_BLOCK_BYTES,
                       min_blocks: int = 1, **kwargs):
    """``ray.data.read_parquet`` with ``override_num_blocks`` sized to the
    input bytes (local-filesystem paths only — remote URIs fall back to
    Ray's default planning). Use for reads that feed a shuffle or a cheap
    vectorized transform; keep the default planner for CPU-heavy per-row
    stages on small inputs."""
    import ray.data as rd

    if kwargs.get("override_num_blocks") is None:
        n = sized_num_blocks(paths, target_block_bytes, min_blocks)
        if n > 0:
            kwargs["override_num_blocks"] = n
    return rd.read_parquet(paths, **kwargs)
