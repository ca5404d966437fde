"""Bucketed hash join — the portable large×large equi-join pattern
(SURVEY.md §2.6 note: every reference join has a broadcastable small side;
this fills the general case for pipelines that don't).

Both sides get ``bucket = hash(key) % num_buckets`` in a map stage; a single
groupby co-locates matching buckets; each group joins its two sides with a
pandas merge. Skew note: a hot key lands in one bucket — raise
``num_buckets`` or pre-salt hot keys (the same discipline as the posting
merge, SURVEY.md I6).

Design notes (round-2 rewrite):
- The two sides are unioned under ONE exactly-aligned Arrow schema (each
  side appends typed-null columns for the other side's fields), so integer
  columns never widen to float64 through pandas-NaN promotion.
- Inside ``join_bucket`` each side is re-selected by its recorded column
  list (never ``dropna``), so an all-null real column survives and an empty
  side keeps its schema — left/outer joins with an empty side yield typed
  nulls instead of a pandas KeyError.
- Bucket hashing is vectorized via ``pandas.util.hash_array`` (C kernel,
  deterministic across processes for int and string keys alike).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _hash_mod(arr: pa.ChunkedArray | pa.Array, num_buckets: int) -> np.ndarray:
    """Vectorized deterministic bucket assignment for an Arrow column."""
    if pa.types.is_integer(arr.type):
        np_vals = arr.combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(arr, pa.ChunkedArray) else arr.to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.ascontiguousarray(np_vals))
    else:
        # String/binary keys: hash_array over an object ndarray (C loop, not
        # a Python-level per-row generator).
        h = pd.util.hash_array(np.asarray(arr.to_pylist(), dtype=object))
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _with_bucket(ds, key: str, num_buckets: int, side: int,
                 target: pa.Schema):
    """Tag each row with its bucket + side and align to ``target`` schema
    (missing fields become typed nulls)."""
    def f(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = []
        for field in target:
            if field.name == "__bucket":
                cols.append(pa.array(_hash_mod(batch[key], num_buckets),
                                     type=pa.int64()))
            elif field.name == "__side":
                cols.append(pa.array(np.full(n, side, np.int8)))
            elif field.name in batch.column_names:
                cols.append(batch[field.name].cast(field.type))
            else:
                cols.append(pa.nulls(n, type=field.type))
        return pa.Table.from_arrays(cols, schema=target)
    f.__name__ = f"bucket_side{side}"
    return ds.map_batches(f, batch_format="pyarrow")


def bucketed_hash_join(left, right, key: str, num_buckets: int = 32,
                       how: str = "inner", suffixes=("_l", "_r")):
    """Equi-join two Datasets on ``key``. One shuffle (the bucket groupby);
    per-bucket pandas merge with per-side dtype preservation. For
    ``how != "inner"`` unmatched rows carry typed NULLs (integer columns
    stay integers — the output is rebuilt against the declared schema)."""
    lschema, rschema = left.schema().base_schema, right.schema().base_schema
    lcols = [n for n in lschema.names if n != key]
    rcols = [n for n in rschema.names if n != key]
    overlap = sorted(set(lcols) & set(rcols))
    if overlap:
        raise ValueError(
            f"bucketed_hash_join: non-key columns {overlap} exist on both "
            "sides; rename before joining (suffixing across the union would "
            "be ambiguous)")

    fields = [pa.field(key, lschema.field(key).type)]
    fields += [pa.field(n, lschema.field(n).type) for n in lcols]
    fields += [pa.field(n, rschema.field(n).type) for n in rcols]
    fields += [pa.field("__bucket", pa.int64()), pa.field("__side", pa.int8())]
    target = pa.schema(fields)

    lds = _with_bucket(left, key, num_buckets, 0, target)
    rds = _with_bucket(right, key, num_buckets, 1, target)
    both = lds.union(rds)

    out_fields = [f for f in target if f.name not in ("__bucket", "__side")]
    out_schema = pa.schema(out_fields)

    def join_bucket(g: pa.Table) -> pa.Table:
        side = g["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        lg = g.filter(pa.array(side == 0)).select([key] + lcols)
        rg = g.filter(pa.array(side == 1)).select([key] + rcols)
        if (lg.num_rows == 0 and how in ("inner", "left")) or \
           (rg.num_rows == 0 and how == "inner"):
            return out_schema.empty_table()
        merged = lg.to_pandas().merge(rg.to_pandas(), on=key, how=how,
                                      suffixes=suffixes)
        if merged.empty:
            return out_schema.empty_table()
        # column-wise rebuild against the declared schema: from_pandas=True
        # maps the NaN of outer/left unmatched rows to typed nulls, so
        # integer columns never widen to float64 in SOME buckets only
        # (schema-unstable blocks) — every group emits out_schema exactly
        cols = [pa.array(merged[f.name], type=f.type, from_pandas=True)
                for f in out_schema]
        return pa.Table.from_arrays(cols, schema=out_schema)

    join_bucket.__name__ = "join_bucket"
    return both.groupby("__bucket").map_groups(join_bucket,
                                               batch_format="pyarrow")
