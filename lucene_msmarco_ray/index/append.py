"""Incremental index append: add new documents to an existing index in
O(new docs) — the old segments are never read, re-encoded, or rewritten.

This is the additive-segment contract of the reference's indexing path
(reference: src/main/java/indexing/MsMarcoIndexer.java:67-90 drives a
Lucene IndexWriter, which appends new segments without touching committed
ones). Here the (shard, salt) layout makes it natural: appended docs have
doc ids in a fresh dense range, so their postings land in salt buckets
whose doc ranges are disjoint from every existing run, and the reader's
zero-decode run concat (``codec.concat_runs`` — which orders runs by
first doc id) already merges old and new runs per term at read time. A
full rebuild and a build+append produce bit-identical search results:
postings, document stats (num_docs / total_len / avgdl) and BM25/LM
scores all match (test-enforced).

Cost model at scale: tokenize + staged write + encode of the NEW docs
only, plus a vocabulary recount (a term-column scan of the segment
metadata — O(vocab), not O(corpus)). Nothing existing is rewritten, so
appending 1% of a 100-TB corpus costs ~1% of a build. The append is
checkpointed exactly like a build partition (manifest + input lineage):
a crashed append resumes, a re-run with unchanged inputs is a no-op for
the tokenize stage and an idempotent overwrite for the encode stage
(appended segment files are prefixed with the partition id and replaced
atomically per run).

Contract: appended ``id_col`` values must be dense and contiguous right
after the existing docs (``[num_docs, num_docs + n_new)``) — verified
from Parquet footer min/max statistics before any segment is touched.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from ..config import EngineConfig
from .build import (
    _EncodeGkeyTask,
    count_distinct_terms,
    expand_parquet_files,
    stage_tokenize_partition,
)
from .manifest import Manifest


def _cfg_from_params(params: dict) -> EngineConfig:
    """Reconstruct the build-relevant config from the manifest so an append
    can NEVER tokenize with a different analysis chain than the build."""
    return EngineConfig(
        analyzer=params["analyzer"],
        normalize_numbers=params["normalize_numbers"],
        stopword_file=params["stopword_file"],
        block_size=params["block_size"],
        num_shards=params["num_shards"],
        salt_docs_per_bucket=params["salt_docs_per_bucket"],
        fwd_docs_per_bucket=params["fwd_docs_per_bucket"],
        emit_fwd=params["emit_fwd"],
    )


def _id_bounds(meta_files: list[str], id_col: str) -> tuple[int, int]:
    """(min, max) of ``id_col`` across files from footer statistics only."""
    lo, hi = None, None
    for f in meta_files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i
               for i in range(len(md.schema))}[id_col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:   # pragma: no cover
                t = pq.read_table(f, columns=[id_col])[id_col]
                v = t.to_numpy(zero_copy_only=False)
                smin, smax = int(v.min()), int(v.max())
            else:
                smin, smax = int(st.min), int(st.max)
            lo = smin if lo is None else min(lo, smin)
            hi = smax if hi is None else max(hi, smax)
    if lo is None:
        raise ValueError("append dataset produced no documents")
    return lo, hi


def append_documents(index_dir: str, ds, *, text_col: str = "text",
                     id_col: str = "doc_id", key_col: str | None = None,
                     input_lineage: str | None = None,
                     pid: str | None = None,
                     auto_compact_ratio: float | None = 4.0) -> dict:
    """Append ``ds``'s documents to the index at ``index_dir``.

    Returns the updated stats dict (also persisted to ``stats.json``).

    Auto-compaction (the Lucene merge-policy analog): after the splice,
    when the mean posting-run count per (term, shard, salt) — measured
    exactly by :func:`~.compact.fragmentation` at O(vocab · runs) cost —
    exceeds ``auto_compact_ratio``, :func:`~.compact.compact_index` runs
    in place, so continuous ingestion is self-maintaining instead of
    accruing unbounded read-time run-concat debt. Compaction is
    bit-identical for search, so the only observable effect is the fold.
    Pass ``None`` to disable (manual compaction only).
    """
    man = Manifest(os.path.join(index_dir, "manifest.json"))
    params = man.data.get("params")
    if not params or not man.merge_done:
        raise ValueError(f"{index_dir} is not a completed index build")
    cfg = _cfg_from_params(params)

    if pid is None:
        seq = sum(1 for p in man.data["partitions"] if p.startswith("append"))
        pid = f"append{seq:03d}"
    elif (input_lineage is not None
          and man.partition_done(pid, input_lineage)
          and any(a.get("pid") == pid
                  for a in man.data.get("appends", []))):
        # this exact append (same pid, same input lineage) already
        # completed — checkpointed no-op
        with open(os.path.join(index_dir, "stats.json")) as f:
            return json.load(f)

    # ---- stage A: tokenize + staged write (same checkpoint machinery as a
    # build partition; a re-run with unchanged input lineage skips this) ----
    stage_tokenize_partition(index_dir, man, pid, ds, cfg,
                             text_col=text_col, id_col=id_col,
                             key_col=key_col, in_sha=input_lineage)

    # ---- dense-id contract: this partition must cover exactly
    # [total - n_new, total) where total = Σ rows over ALL partitions ----
    parts = man.data["partitions"]
    n_new = int(parts[pid]["rows"])
    dl_new = int(parts[pid]["total_len"])
    total = sum(int(p["rows"]) for p in parts.values())
    total_len = sum(int(p["total_len"]) for p in parts.values())
    part_dir = os.path.join(index_dir, "staged", f"part={pid}")
    meta_files = expand_parquet_files([os.path.join(part_dir, "kind=m")])
    lo, hi = _id_bounds(meta_files, "doc_id")
    if (lo, hi) != (total - n_new, total - 1):
        raise ValueError(
            f"append ids must be dense [{total - n_new}, {total}); got "
            f"[{lo}, {hi + 1}) — assign ids starting at the index's "
            "current num_docs")

    # ---- stage C: encode ONLY this partition's gkey groups; old segment
    # rows are untouched (their salt-bucket doc ranges are disjoint, so the
    # reader's concat_runs stitches per-term runs at load time) ----
    gkeys: dict[int, list[str]] = {}
    pdir = os.path.join(part_dir, "kind=p")
    if os.path.isdir(pdir):
        for entry in sorted(os.listdir(pdir)):
            if entry.startswith("gkey="):
                k = int(entry.split("=", 1)[1])
                gkeys.setdefault(k, []).extend(
                    expand_parquet_files([os.path.join(pdir, entry)]))
    seg_dir = os.path.join(index_dir, "segments")
    tmp = os.path.join(index_dir, f"segments.append-{pid}.tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    if gkeys:
        plan = [{"gkey": k, "files": fs} for k, fs in sorted(gkeys.items())]
        runs = rd.from_items(plan, override_num_blocks=max(1, len(plan))) \
            .map_batches(_EncodeGkeyTask(cfg.block_size), batch_size=1,
                         batch_format="pandas")
        runs.write_parquet(tmp, partition_cols=["shard", "salt"])
        # splice the new (shard, salt) files into the live tree with
        # pid-prefixed names: idempotent (a resumed append first removes
        # its own prefix) and never collides with build or other appends
        for root, _, fs in os.walk(seg_dir):
            for f in fs:
                if f.startswith(f"{pid}-"):
                    os.remove(os.path.join(root, f))
        for root, _, fs in os.walk(tmp):
            for f in fs:
                if not f.endswith(".parquet"):
                    continue
                rel = os.path.relpath(root, tmp)
                dest = os.path.join(seg_dir, rel)
                os.makedirs(dest, exist_ok=True)
                os.replace(os.path.join(root, f),
                           os.path.join(dest, f"{pid}-{f}"))
        shutil.rmtree(tmp, ignore_errors=True)

    # ---- stats: exact integer folds from the manifest + a vocab recount
    # (O(vocab) term-column scan — never O(corpus)) ----
    stats = dict(man.data.get("stats") or {})
    stats["num_docs"] = total
    stats["total_len"] = total_len
    stats["avgdl"] = (total_len / total) if total else 0.0
    stats["n_salt"] = max(1, int(np.ceil(total / cfg.salt_docs_per_bucket)))
    stats["num_terms"] = count_distinct_terms(seg_dir, multi_run=True)
    man.data.setdefault("appends", []).append(
        {"pid": pid, "rows": n_new, "total_len": dl_new})
    man.set_stats(stats)
    man.save()
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)

    if auto_compact_ratio is not None:
        from .compact import compact_index, fragmentation
        rows, unique = fragmentation(seg_dir)
        if unique and rows / unique > auto_compact_ratio:
            compact_index(index_dir)
            with open(os.path.join(index_dir, "stats.json")) as f:
                stats = json.load(f)
    return stats
