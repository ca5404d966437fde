"""Bucketed hash join — the portable large×large equi-join pattern
(SURVEY.md §2.6 note: every reference join has a broadcastable small side;
this fills the general case for pipelines that don't).

Both sides get ``bucket = hash(key) % num_buckets`` in a map stage; a single
groupby co-locates matching buckets; each group joins its two sides with a
pandas merge. Skew note: a hot key lands in one bucket — raise
``num_buckets`` or pre-salt hot keys (the same discipline as the posting
merge, SURVEY.md I6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _with_bucket(ds, key: str, num_buckets: int, side: int):
    def f(batch: pa.Table) -> pa.Table:
        import zlib
        vals = batch[key].to_pylist()
        b = np.fromiter((zlib.crc32(str(v).encode()) % num_buckets
                         for v in vals), np.int64, len(vals))
        t = batch.append_column("__bucket", pa.array(b))
        return t.append_column("__side", pa.array(np.full(len(vals), side,
                                                          np.int8)))
    return ds.map_batches(f, batch_format="pyarrow")


def bucketed_hash_join(left, right, key: str, num_buckets: int = 32,
                       how: str = "inner", suffixes=("_l", "_r")):
    """Equi-join two Datasets on ``key``. One shuffle (the bucket groupby);
    per-bucket pandas merge."""
    lds = _with_bucket(left, key, num_buckets, 0)
    rds = _with_bucket(right, key, num_buckets, 1)
    both = lds.union(rds)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0].drop(columns=["__bucket", "__side"]) \
            .dropna(axis=1, how="all")
        rg = g[g["__side"] == 1].drop(columns=["__bucket", "__side"]) \
            .dropna(axis=1, how="all")
        if lg.empty or (rg.empty and how == "inner"):
            return pd.DataFrame()
        return lg.merge(rg, on=key, how=how, suffixes=suffixes)

    join_bucket.__name__ = "join_bucket"
    return both.groupby("__bucket").map_groups(join_bucket,
                                               batch_format="pandas")
