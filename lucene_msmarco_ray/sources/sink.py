"""Resumable partitioned parquet sink.

At 100 TB a single flat ``write_parquet`` is the wrong output contract: a
failed run restarts from zero, and nothing downstream can tell which parts
of the output are complete. This sink writes ONE directory per partition
value (``<root>/<col>=<val>/part.parquet``) and marks each directory with a
``_SUCCESS`` file only after its data file is durably in place (tmp file →
``os.replace`` rename, so a crash mid-write never leaves a readable but
truncated partition). A re-run with ``resume=True`` drops the rows of every
already-marked partition BEFORE the shuffle — the repeated work is one
cheap vectorized filter pass over the input, not a rewrite of the output.

Execution shape: rows are exchanged once on the partition column (coarse —
callers pick the cardinality; use :func:`add_hash_bucket` to derive a
bounded bucket column from a high-cardinality id) and each partition is
written by exactly ONE task, which is what makes the per-partition marker
a correct completion record. Per-partition output is deterministic: rows
are sorted by ``sort_cols`` (default: all columns) before encoding, so a
resumed run and a fresh run produce byte-comparable partitions regardless
of upstream block order.

Reference contract mirrored: the reference's writers emit one flat file
per job (e.g. SparseVecWriter — /root/reference/indexing/SparseVecWriter.java:150)
and restart from scratch on failure; this sink is the scale-path
re-expression of that output stage.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["add_hash_bucket", "write_partitioned", "read_partitioned",
           "finished_partitions"]

_KNUTH = 2654435761
_M32 = 1 << 32


def add_hash_bucket(ds, id_col: str, num_buckets: int,
                    bucket_col: str = "bucket"):
    """Append a deterministic ``id → bucket`` column (multiplicative hash,
    parallelism-invariant) so a high-cardinality id can drive a
    bounded-cardinality partitioned write."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = ((ids.astype(np.uint64) & np.uint64(_M32 - 1))
             * np.uint64(_KNUTH)) % np.uint64(_M32)
        b = ((h * np.uint64(num_buckets)) >> np.uint64(32)).astype(np.int64)
        return batch.append_column(bucket_col, pa.array(b))

    return ds.map_batches(f, batch_format="pyarrow")


def _part_dir(root: str, col: str, val) -> str:
    return os.path.join(root, f"{col}={val}")


def finished_partitions(root: str, partition_col: str) -> set:
    """Partition values whose directories carry a ``_SUCCESS`` marker."""
    done = set()
    prefix = partition_col + "="
    if not os.path.isdir(root):
        return done
    for name in os.listdir(root):
        if name.startswith(prefix) and os.path.exists(
                os.path.join(root, name, "_SUCCESS")):
            done.add(name[len(prefix):])
    return done


def write_partitioned(ds, root: str, partition_col: str,
                      sort_cols=None, resume: bool = True) -> dict:
    """Write ``ds`` as one parquet directory per ``partition_col`` value,
    each committed with a ``_SUCCESS`` marker; with ``resume=True`` rows of
    already-committed partitions are filtered out before the exchange.

    Returns ``{"written": n_partitions, "skipped": n_partitions}``.
    """
    os.makedirs(root, exist_ok=True)
    done = finished_partitions(root, partition_col) if resume else set()

    if done:
        done_arr = pa.array(sorted(done), pa.string())

        def drop_done(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            vals = pc.cast(batch[partition_col], pa.string())
            return batch.filter(pc.invert(pc.is_in(vals,
                                                   value_set=done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    def write_part(df: pd.DataFrame) -> pd.DataFrame:
        val = df[partition_col].iloc[0]
        by = list(sort_cols) if sort_cols else list(df.columns)
        df = df.sort_values(by, kind="mergesort")
        pdir = _part_dir(root, partition_col, val)
        os.makedirs(pdir, exist_ok=True)
        # pid-prefixed tmp + atomic rename: a crashed/duplicate task never
        # leaves a truncated part.parquet, and the last rename wins with
        # identical (deterministically sorted) content
        tmp = os.path.join(pdir, f".part.{os.getpid()}.tmp")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(pdir, "part.parquet"))
        with open(os.path.join(pdir, "_SUCCESS"), "w"):
            pass
        return pd.DataFrame({partition_col: [val]})

    write_part.__name__ = "write_part"
    written = (ds.groupby(partition_col)
               .map_groups(write_part, batch_format="pandas")
               .count())
    return {"written": int(written), "skipped": len(done)}


def read_partitioned(root: str, partition_col: str, **kwargs):
    """Read back only the committed partitions (uncommitted directories —
    e.g. from a run that died mid-write — are invisible)."""
    from lucene_msmarco_ray.sources.pq import read_parquet_sized

    paths = [os.path.join(_part_dir(root, partition_col, v), "part.parquet")
             for v in sorted(finished_partitions(root, partition_col))]
    if not paths:
        raise FileNotFoundError(f"no committed partitions under {root}")
    return read_parquet_sized(paths, **kwargs)
