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
compact/open by restoring the backup. Compaction is SINGLE-WRITER: the
non-atomic swap is bracketed by a ``segments.compact.inprogress``
sentinel (pid + host), and a reader that opens inside the swap window
raises while the sentinel's process is alive instead of restoring the
backup out from under the live writer.
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


def _sentinel_path(index_dir: str) -> str:
    return os.path.join(index_dir, "segments.compact.inprogress")


def _sentinel_live(path: str) -> bool:
    """True iff the sentinel names a compaction that may still be
    running. Same-host pids are probed with kill(0); a sentinel written
    on ANOTHER host can't be probed, so it is conservatively treated as
    live (fail loud rather than race a cross-node writer)."""
    import socket
    try:
        with open(path) as f:
            info = json.load(f)
    except (OSError, ValueError):
        return False
    if info.get("host") != socket.gethostname():
        return True
    try:
        os.kill(int(info["pid"]), 0)
        return True
    except (OSError, ValueError, TypeError):
        return False


def _recover_interrupted(index_dir: str, writer: bool = False) -> None:
    """Restore a crashed compaction's backup so a reader never serves a
    missing/empty segments dir. The seg→bak→tmp swap in
    :func:`compact_index` is not atomic, so a reader that opens inside
    the swap window would otherwise restore the backup out from under
    the LIVE writer (whose final ``os.replace`` then fails on a
    non-empty dir). Recovery is therefore gated on the writer's
    sentinel: while it names a live process, readers raise instead of
    recovering; once the process is dead (or the sentinel absent — a
    hard kill before the swap), recovery proceeds. ``writer=True``
    (only :func:`compact_index`, which holds the single-writer
    contract) recovers unconditionally."""
    seg = os.path.join(index_dir, "segments")
    bak = seg + ".pre-compact"
    if os.path.isdir(bak) and not os.path.isdir(seg):
        sent = _sentinel_path(index_dir)
        if not writer and os.path.exists(sent) and _sentinel_live(sent):
            raise RuntimeError(
                f"compaction of {index_dir} is in progress (sentinel "
                f"{sent}); readers must not open mid-swap — retry after "
                "it completes, or remove the sentinel if the writer is "
                "known dead")
        os.replace(bak, seg)
    if writer:
        try:
            os.remove(_sentinel_path(index_dir))
        except OSError:
            pass


def fragmentation(seg_dir: str) -> tuple[int, int]:
    """(segment rows, distinct (term, shard, salt) rows) — the exact
    fold compaction would perform. Rows come from Parquet footers
    (metadata only); distinct counts scan ONLY the term column, one
    parallel task per (shard, salt) dir, so the cost is O(vocab · runs)
    like the vocab recount every append already pays — never O(corpus).
    ``rows / unique`` is the mean posting-run count per term the reader
    must concat lazily: the auto-compaction trigger ratio."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    dirs = []
    rows = 0
    for root, _, fs in os.walk(seg_dir):
        pfs = [os.path.join(root, f) for f in fs if f.endswith(".parquet")]
        if pfs:
            dirs.append(root)
            rows += sum(pq.read_metadata(p).num_rows for p in pfs)
    if not dirs:
        return 0, 0

    def _distinct(b: pd.DataFrame) -> pd.DataFrame:
        n = sum(
            pc.count_distinct(
                pads.dataset(d).to_table(columns=["term"])["term"]).as_py()
            for d in b["dir"])
        return pd.DataFrame({"n": [n]})

    parts = rd.from_items([{"dir": d} for d in dirs],
                          override_num_blocks=max(1, len(dirs))) \
        .map_batches(_distinct, batch_size=1, batch_format="pandas")
    unique = sum(r["n"] for r in parts.take_all())
    return int(rows), int(unique)


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
    _recover_interrupted(index_dir, writer=True)
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
    # sentinel brackets the non-atomic swap: readers opening inside the
    # window fail loud instead of restoring bak under the live writer
    import socket
    with open(_sentinel_path(index_dir), "w") as f:
        json.dump({"pid": os.getpid(), "host": socket.gethostname()}, f)
    os.replace(seg_dir, bak)
    os.replace(tmp, seg_dir)
    os.remove(_sentinel_path(index_dir))
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
