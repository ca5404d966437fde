"""Segment compaction — the Lucene merge-policy analog for appended
indexes.

Every :func:`~.append.append_documents` splices new pid-prefixed parquet
files into the live ``segments/shard=S/salt=K`` tree, so a term
accumulates one posting RUN per append that touched its salt bucket; the
reader stitches them lazily with ``codec.concat_runs`` on every load.
Compaction folds that debt back to ONE row per (term, shard, salt) — a
pure zero-decode concatenating merge (byte concat + block-metadata
offset shift, exactly what the reader computes lazily, persisted), so
search results are bit-identical before and after, block-max metadata
included. The (shard, salt) directory layout is PRESERVED: doc-sharded
search topology, stats, and future appends are unaffected, and a later
compaction folds those appends again.

Scale shape: one independent Ray task per (shard, salt) directory — no
exchange at all; the merge is embarrassingly parallel over the same
partitioning the build chose. Crash safety: the new tree is fully
written to ``segments.compact.tmp`` first, the live tree is moved to
``segments.pre-compact``, the new tree renamed in, then the backup
removed; a crash between the renames is auto-recovered on the next
compact/open by restoring the backup.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import ray.data as rd

from .codec import concat_runs
from .manifest import Manifest


def _recover_interrupted(index_dir: str) -> None:
    seg = os.path.join(index_dir, "segments")
    bak = seg + ".pre-compact"
    if os.path.isdir(bak) and not os.path.isdir(seg):
        os.replace(bak, seg)


class _CompactDirTask:
    """Merge every term's runs within one (shard, salt) directory into a
    single segment row. Batch = one plan row ({dir, shard, salt})."""

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        from .build import (
            rows_to_segment_table,
            term_postings_from_row,
        )
        row = batch.iloc[0]
        tbl = pads.dataset(row["dir"]).to_table()
        by_term: dict[str, list] = {}
        for r in tbl.to_pylist():
            by_term.setdefault(r["term"], []).append(
                term_postings_from_row(r))
        terms = sorted(by_term)
        tps = [concat_runs(by_term[t]) for t in terms]
        return rows_to_segment_table(
            terms, np.full(len(terms), int(row["shard"]), np.int32), tps,
            salts=np.full(len(terms), int(row["salt"]), np.int32))


def compact_index(index_dir: str) -> dict:
    """Compact all (shard, salt) segment directories; returns a summary
    {dirs, rows_before, rows_after}. Idempotent — a second run is a
    cheap no-op rewrite (every term already has one row per dir)."""
    _recover_interrupted(index_dir)
    man = Manifest(os.path.join(index_dir, "manifest.json"))
    if not man.data.get("params") or not man.merge_done:
        raise ValueError(f"{index_dir} is not a completed index build")
    seg_dir = os.path.join(index_dir, "segments")

    plan = []
    rows_before = 0
    for sh in sorted(os.listdir(seg_dir)):
        if not sh.startswith("shard="):
            continue
        for sa in sorted(os.listdir(os.path.join(seg_dir, sh))):
            if not sa.startswith("salt="):
                continue
            d = os.path.join(seg_dir, sh, sa)
            plan.append({"dir": d,
                         "shard": int(sh.split("=", 1)[1]),
                         "salt": int(sa.split("=", 1)[1])})
            rows_before += pads.dataset(d).count_rows()
    if not plan:
        return {"dirs": 0, "rows_before": 0, "rows_after": 0}

    tmp = seg_dir + ".compact.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    runs = rd.from_items(plan, override_num_blocks=len(plan)) \
        .map_batches(_CompactDirTask, batch_size=1, batch_format="pandas",
                     concurrency=(1, 16))
    runs.write_parquet(tmp, partition_cols=["shard", "salt"])

    bak = seg_dir + ".pre-compact"
    shutil.rmtree(bak, ignore_errors=True)
    os.replace(seg_dir, bak)
    os.replace(tmp, seg_dir)
    shutil.rmtree(bak, ignore_errors=True)

    rows_after = pads.dataset(seg_dir).count_rows()
    man.data.setdefault("compactions", []).append(
        {"dirs": len(plan), "rows_before": int(rows_before),
         "rows_after": int(rows_after)})
    man.save()
    summary = {"dirs": len(plan), "rows_before": int(rows_before),
               "rows_after": int(rows_after)}
    stats_path = os.path.join(index_dir, "stats.json")
    with open(stats_path) as f:
        stats = json.load(f)
    stats["segment_rows"] = int(rows_after)
    with open(stats_path, "w") as f:
        json.dump(stats, f, indent=1)
    return summary
