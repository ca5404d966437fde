"""Index build pipeline — the Ray-Data-native equivalent of the reference's
``IndexWriter.addDocument`` internals (reference:
src/main/java/indexing/MsMarcoIndexer.java:48-90, where tokenization,
in-memory segment build, flush and merge all happen inside Lucene).

Dataflow (SURVEY.md §3.1, operators I1-I7)::

    corpus parquet ──map_batches(TokenizeStage)──►
        staged/part=<pid>/kind={p,f,m}   (ONE pass, ONE partitioned write:
        p = postings keyed by gkey=shard·2^20+salt, f = forward-index copy
        keyed by doc bucket, m = doc metadata + lineage sha)
    staged kind=m ──aggregate──► stats.json  (N, total_len → avgdl)
    staged kind=p ──one vectorized encode task per gkey dir──►
        segments/shard=S/salt=B/*.parquet (block-local varbyte + block-max)

Shuffle inventory: exactly ONE exchange over the postings, realized as the
partitioned staged write (no all-to-all operator). A salted term's runs
stay as SEPARATE segment rows — the reader concatenates them at load time
(codec.concat_runs, zero decode), and the (shard, salt) directory layout
doubles as the doc-partitioned search path's pruning structure. Skew: heavy
terms are split across salt buckets — the per-group memory bound is
``(vocab slice) × salt_docs_per_bucket`` postings, independent of any one
term's df (SURVEY.md I6).

Resumability: tokenize partitions are skipped when their lineage sha matches
(manifest); segment writes go to a temp dir then rename (idempotent).
"""

from __future__ import annotations

import json
import os
import shutil
from zlib import crc32

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray.data as rd

from ..config import EngineConfig
from ..stages.tokenize import TokenizeStage
from .codec import TermPostings, encode_group_postings
from .manifest import Manifest

SEGMENT_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("shard", pa.int32()),
    ("salt", pa.int32()),          # doc-range bucket of this run (I6); the
                                   # doc-partitioned search path prunes on it
    ("df", pa.int64()),
    ("cf", pa.int64()),
    ("doc_bytes", pa.large_binary()),
    ("tf_bytes", pa.large_binary()),
    ("b_count", pa.list_(pa.int32())),
    ("b_first", pa.list_(pa.int64())),
    ("b_last", pa.list_(pa.int64())),
    ("b_max_tf", pa.list_(pa.int32())),
    ("b_min_dl", pa.list_(pa.int32())),
    ("b_doc_off", pa.list_(pa.int64())),
    ("b_tf_off", pa.list_(pa.int64())),
])


def term_shard(term: str, num_shards: int) -> int:
    return crc32(term.encode("utf-8")) % num_shards


def _list_array(arrays: list[np.ndarray], dtype: pa.DataType) -> pa.ListArray:
    lens = np.fromiter((len(a) for a in arrays), dtype=np.int64, count=len(arrays))
    offsets = np.zeros(len(arrays) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    values = np.concatenate(arrays) if arrays else np.empty(0)
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                    pa.array(values, type=dtype))


def rows_to_segment_table(terms: list[str], shards: np.ndarray,
                          tps: list[TermPostings],
                          salts: np.ndarray | None = None) -> pa.Table:
    if salts is None:
        salts = np.zeros(len(terms), np.int32)
    return pa.Table.from_arrays([
        pa.array(terms, type=pa.string()),
        pa.array(shards.astype(np.int32)),
        pa.array(salts.astype(np.int32)),
        pa.array(np.fromiter((t.df for t in tps), np.int64, len(tps))),
        pa.array(np.fromiter((t.cf for t in tps), np.int64, len(tps))),
        pa.array([t.doc_bytes for t in tps], type=pa.large_binary()),
        pa.array([t.tf_bytes for t in tps], type=pa.large_binary()),
        _list_array([t.b_count for t in tps], pa.int32()),
        _list_array([t.b_first for t in tps], pa.int64()),
        _list_array([t.b_last for t in tps], pa.int64()),
        _list_array([t.b_max_tf for t in tps], pa.int32()),
        _list_array([t.b_min_dl for t in tps], pa.int32()),
        _list_array([t.b_doc_off for t in tps], pa.int64()),
        _list_array([t.b_tf_off for t in tps], pa.int64()),
    ], schema=SEGMENT_SCHEMA)


def term_postings_from_row(row: dict) -> TermPostings:
    return TermPostings(
        df=int(row["df"]), cf=int(row["cf"]),
        doc_bytes=row["doc_bytes"], tf_bytes=row["tf_bytes"],
        b_count=np.asarray(row["b_count"], np.int32),
        b_first=np.asarray(row["b_first"], np.int64),
        b_last=np.asarray(row["b_last"], np.int64),
        b_max_tf=np.asarray(row["b_max_tf"], np.int32),
        b_min_dl=np.asarray(row["b_min_dl"], np.int32),
        b_doc_off=np.asarray(row["b_doc_off"], np.int64),
        b_tf_off=np.asarray(row["b_tf_off"], np.int64),
    )


def _large_binary_slices(data: bytes, offsets: np.ndarray) -> pa.Array:
    """Zero-copy large_binary array: per-row slices of ONE byte buffer."""
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(offsets) - 1,
        [None, pa.py_buffer(np.ascontiguousarray(offsets, np.int64)),
         pa.py_buffer(data)])


def _list_from_flat(values: np.ndarray, counts: np.ndarray,
                    dtype: pa.DataType) -> pa.ListArray:
    offsets = np.zeros(counts.size + 1, np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                    pa.array(values, type=dtype))


def group_segment_table(terms: np.ndarray, shard: int, enc: dict,
                        salt: int = 0) -> pa.Table:
    """Segment rows for one encoded group (see codec.encode_group_postings)
    — all columns built from flat arrays, no per-term Python."""
    bpt = enc["blocks_per_term"]
    return pa.Table.from_arrays([
        pa.array(terms, type=pa.string()),
        pa.array(np.full(enc["n_terms"], shard, np.int32)),
        pa.array(np.full(enc["n_terms"], salt, np.int32)),
        pa.array(enc["df"]),
        pa.array(enc["cf"]),
        _large_binary_slices(enc["doc_bytes"], enc["doc_byte_offsets"]),
        _large_binary_slices(enc["tf_bytes"], enc["tf_byte_offsets"]),
        _list_from_flat(enc["b_count"], bpt, pa.int32()),
        _list_from_flat(enc["b_first"], bpt, pa.int64()),
        _list_from_flat(enc["b_last"], bpt, pa.int64()),
        _list_from_flat(enc["b_max_tf"], bpt, pa.int32()),
        _list_from_flat(enc["b_min_dl"], bpt, pa.int32()),
        _list_from_flat(enc["b_doc_off"], bpt, pa.int64()),
        _list_from_flat(enc["b_tf_off"], bpt, pa.int64()),
    ], schema=SEGMENT_SCHEMA)


class _EncodeGkeyTask:
    """One (shard, salt) group — all postings files of one gkey directory —
    → encoded term-run rows. The 'shuffle' already happened in the staged
    partitioned write; this task just reads its group's files. The encode
    itself is ONE vectorized pass over the whole group (no per-term loop —
    round-1's merge hot spot, 14.2s of a 28.6s 2M-doc build)."""

    def __init__(self, block_size: int):
        self.block_size = block_size

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        from ..stages.tokenize import GKEY_SALT_SPAN
        out = []
        for _, row in batch.iterrows():
            gkey = int(row["gkey"])
            shard = gkey // GKEY_SALT_SPAN
            salt = gkey % GKEY_SALT_SPAN
            tbl = pa.concat_tables([
                pq.read_table(f, columns=["term", "doc_id", "tf", "dl"])
                for f in row["files"]])
            if tbl.num_rows == 0:
                continue
            codes, uniq = pd.factorize(tbl["term"].to_pandas())
            doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
            tf = tbl["tf"].to_numpy(zero_copy_only=False)
            dl = tbl["dl"].to_numpy(zero_copy_only=False)
            order = np.lexsort((doc, codes))
            codes, doc, tf, dl = codes[order], doc[order], tf[order], dl[order]
            enc = encode_group_postings(codes, doc, tf, dl, self.block_size)
            terms = uniq.to_numpy()[codes[enc["term_starts"]]] \
                if hasattr(uniq, "to_numpy") else np.asarray(uniq)[codes[enc["term_starts"]]]
            out.append(group_segment_table(terms, shard, enc, salt))
        if not out:
            return rows_to_segment_table([], np.empty(0), [])
        return pa.concat_tables(out)


def pads_dirs(dirs: list[str]) -> pads.Dataset:
    """pyarrow dataset over a list of directories (pads.dataset() itself only
    accepts one dir, or a list of files/datasets)."""
    if len(dirs) == 1:
        return pads.dataset(dirs[0])
    return pads.dataset([pads.dataset(d) for d in dirs])


def expand_parquet_files(dirs: list[str]) -> list[str]:
    """List of dirs → flat sorted list of parquet files (ray.data.read_parquet
    accepts a single dir but not a list of dirs)."""
    out: list[str] = []
    for d in dirs:
        for root, _, fs in os.walk(d):
            out.extend(os.path.join(root, f) for f in fs if f.endswith(".parquet"))
    return sorted(out)


def _gkey_files(out_dir: str) -> dict[int, list[str]]:
    """gkey → parquet files across all staged build partitions."""
    out: dict[int, list[str]] = {}
    for pdir in _staged_dirs(out_dir, "p"):
        for entry in sorted(os.listdir(pdir)):
            if not entry.startswith("gkey="):
                continue
            k = int(entry.split("=", 1)[1])
            out.setdefault(k, []).extend(
                expand_parquet_files([os.path.join(pdir, entry)]))
    return out


def fwd_bucket_dirs(index_dir: str) -> dict[int, list[str]]:
    """doc-bucket → directories of the forward index (kind=f rows), across
    all staged build partitions. A bucket's term vectors are the union of
    its dirs (one per build partition that saw docs of that range)."""
    out: dict[int, list[str]] = {}
    for pdir in _staged_dirs(index_dir, "f"):
        for entry in sorted(os.listdir(pdir)):
            if entry.startswith("gkey="):
                b = int(entry.split("=", 1)[1])
                out.setdefault(b, []).append(os.path.join(pdir, entry))
    if not out:
        man_path = os.path.join(index_dir, "manifest.json")
        if os.path.exists(man_path):
            with open(man_path) as f:
                params = json.load(f).get("params") or {}
            if params.get("emit_fwd") is False:
                raise RuntimeError(
                    f"index {index_dir} was built with emit_fwd=False — "
                    "term-vector / feedback operators need a forward index; "
                    "rebuild with EngineConfig(emit_fwd=True)")
    return out


def file_lineage(paths: list[str]) -> str:
    """Cheap input-lineage digest for resume invalidation: (path, size,
    mtime_ns) per file — no content read. Callers pass this alongside a
    partition so a changed input re-tokenizes instead of resuming stale."""
    import hashlib
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


def _staged_dirs(out_dir: str, kind: str) -> list[str]:
    base = os.path.join(out_dir, "staged")
    if not os.path.isdir(base):
        return []
    return sorted(
        os.path.join(base, p, f"kind={kind}")
        for p in os.listdir(base)
        if p.startswith("part=") and os.path.isdir(os.path.join(base, p, f"kind={kind}"))
    )


def stage_tokenize_partition(out_dir: str, man: Manifest, pid: str, ds,
                             cfg: EngineConfig, *, text_col: str,
                             id_col: str, key_col: str | None,
                             in_sha: str | None) -> bool:
    """Stage A for ONE build partition (shared by :func:`build_index` and
    :func:`append.append_documents`): tokenize → partitioned staged write →
    lineage fold. Returns True if the partition was (re)built, False if the
    manifest checkpoint was reused."""
    if man.partition_done(pid, in_sha):
        return False
    part_dir = os.path.join(out_dir, "staged", f"part={pid}")
    tmp_dir = part_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(part_dir, ignore_errors=True)
    tok = ds.map_batches(
        TokenizeStage(cfg, text_col=text_col, id_col=id_col, key_col=key_col),
        batch_format="pyarrow", batch_size=cfg.tokenize_batch_size,
        concurrency=cfg.tokenize_concurrency)
    # NOTE: no min_rows_per_file here — it makes the Write operator
    # coalesce blocks into a couple of giant single-threaded parquet
    # encodes (measured 40s vs 6s at 200k docs); file granularity is
    # already governed by the upstream block size (one per row group)
    tok.write_parquet(tmp_dir, partition_cols=["kind", "gkey"])
    os.replace(tmp_dir, part_dir)
    # lineage + partition stats from the kind=l summary rows the
    # tokenize stage emitted (one per batch): the driver folds a few
    # hundred tiny rows — no re-scan of kind=m. XOR of batch XORs ==
    # XOR of the per-row hashes (associative/commutative), so the
    # resulting sha is identical to a row-level fold.
    lin_files = expand_parquet_files([os.path.join(part_dir, "kind=l")])
    acc = np.zeros(32, dtype=np.uint8)
    nrows = 0
    dl_total = 0
    for f in lin_files:
        t = pq.read_table(f, columns=["sha256", "doc_id", "tf"])
        for h in t["sha256"].to_pylist():
            acc ^= np.frombuffer(bytes.fromhex(h), dtype=np.uint8)
        dl_total += int(t["doc_id"].to_numpy(zero_copy_only=False).sum())
        nrows += int(t["tf"].to_numpy(zero_copy_only=False)
                     .astype(np.int64).sum())
    import hashlib as _hashlib
    sha = _hashlib.sha256(acc.tobytes()).hexdigest()
    man.mark_partition(pid, sha, nrows, [], input_sha=in_sha,
                       total_len=dl_total)
    man.save()
    return True


def count_distinct_terms(seg_dir: str, multi_run: bool) -> int:
    """Vocabulary size of an index's segment tree. ``multi_run=False`` may
    use footer row counts (one segment row per term); otherwise distinct
    terms are counted per shard in parallel — terms never cross shards, so
    one task's memory is its shard's vocab slice (at extreme vocab sizes
    swap in a sketch)."""
    if not multi_run:
        return sum(
            pq.read_metadata(os.path.join(root, f)).num_rows
            for root, _, fs in os.walk(seg_dir) for f in fs
            if f.endswith(".parquet"))
    shard_dirs = sorted(
        os.path.join(seg_dir, e) for e in os.listdir(seg_dir)
        if e.startswith("shard="))

    def _distinct_terms(b: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as _pc
        n = sum(
            _pc.count_distinct(
                pads.dataset(d).to_table(columns=["term"])["term"]
            ).as_py() for d in b["dir"])
        return pd.DataFrame({"n": [n]})

    parts = rd.from_items(
        [{"dir": d} for d in shard_dirs],
        override_num_blocks=max(1, len(shard_dirs))) \
        .map_batches(_distinct_terms, batch_format="pandas",
                     batch_size=1).to_pandas()
    return int(parts["n"].sum())


def build_index(
    source,
    out_dir: str,
    cfg: EngineConfig = EngineConfig(),
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_col: str | None = None,
    partitions: list[tuple] | None = None,
    resume: bool = True,
    input_lineage: str | None = None,
) -> dict:
    """Build an inverted index under ``out_dir``.

    ``source``: a ``ray.data.Dataset`` (single build partition) — or pass
    ``partitions`` as ``[(partition_id, dataset), ...]`` for per-partition
    resumable builds (one entry per input shard; SURVEY.md I7).
    Returns the stats dict (also persisted to ``stats.json``).
    """
    import time as _time
    stage_secs: dict[str, float] = {}
    _t0 = _time.monotonic()
    os.makedirs(out_dir, exist_ok=True)
    man = Manifest(os.path.join(out_dir, "manifest.json"))
    params = {
        "analyzer": cfg.analyzer, "normalize_numbers": cfg.normalize_numbers,
        "stopword_file": cfg.stopword_file, "block_size": cfg.block_size,
        "num_shards": cfg.num_shards,
        "salt_docs_per_bucket": cfg.salt_docs_per_bucket,
        "fwd_docs_per_bucket": cfg.fwd_docs_per_bucket,
        "emit_fwd": cfg.emit_fwd,
        "text_col": text_col, "id_col": id_col,
        # bump to invalidate indexes whose on-disk layout predates a change
        # (2: segments partitioned by (shard, salt) + salt column;
        #  3: kind=l per-batch lineage summary rows in the staged write)
        "segment_layout": 3,
    }
    if not resume:
        for sub in ("staged", "segments"):
            shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
        man.data = {"params": None, "partitions": {},
                    "merge": {"status": "pending"}, "stats": None}
    man.set_params(params)

    if partitions is None:
        partitions = [("all", source, input_lineage)]
    # accept (pid, ds) or (pid, ds, input_sha); see file_lineage()
    partitions = [(p[0], p[1], p[2] if len(p) > 2 else None)
                  for p in partitions]

    # ---- stage A: tokenize per partition (resumable) ----
    any_rebuilt = False
    for pid, ds, in_sha in partitions:
        any_rebuilt |= stage_tokenize_partition(
            out_dir, man, pid, ds, cfg, text_col=text_col, id_col=id_col,
            key_col=key_col, in_sha=in_sha)

    if any_rebuilt:
        # changed/new inputs invalidate the downstream merge checkpoint
        man.data["merge"] = {"status": "pending"}

    stage_secs["tokenize"] = round(_time.monotonic() - _t0, 3)
    _t0 = _time.monotonic()

    # ---- global stats (I4) — summed from the manifest's per-partition
    # (rows, total_len), recorded by the lineage pass: no re-read of the
    # meta files. Fold over ALL manifest partitions, not just the ones this
    # call passed — a resumed build on an index that has since been
    # APPENDED to (append.append_documents registers extra partitions)
    # must not shrink the doc stats back to the original build's.
    # Fallback (manifests written before total_len existed):
    # footer row counts + one parallel column sum.
    pstats = list(man.data["partitions"].values())
    if all("total_len" in p for p in pstats):
        ndocs = sum(int(p["rows"]) for p in pstats)
        total_len = sum(int(p["total_len"]) for p in pstats)
    else:
        meta_files = expand_parquet_files(_staged_dirs(out_dir, "m"))
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=16) as ex:
            ndocs = sum(ex.map(lambda f: pq.read_metadata(f).num_rows,
                               meta_files))
        total_len = int(rd.read_parquet(meta_files, columns=["dl"]).sum("dl")) \
            if ndocs else 0
    avgdl = (total_len / ndocs) if ndocs else 0.0
    n_salt = max(1, int(np.ceil(ndocs / cfg.salt_docs_per_bucket))) if ndocs else 1

    stats = {
        "num_docs": int(ndocs), "total_len": int(total_len), "avgdl": avgdl,
        "num_shards": cfg.num_shards, "n_salt": int(n_salt),
        "salt_docs_per_bucket": int(cfg.salt_docs_per_bucket),
        "block_size": cfg.block_size, "analyzer": cfg.analyzer,
        "normalize_numbers": cfg.normalize_numbers,
        "stopword_file": cfg.stopword_file,
    }

    stage_secs["stats"] = round(_time.monotonic() - _t0, 3)
    _t0 = _time.monotonic()

    # ---- stage C/D: shuffle-merge postings into segments ----
    seg_dir = os.path.join(out_dir, "segments")
    if not (man.merge_done and os.path.isdir(seg_dir)):
        seg_tmp = seg_dir + ".tmp"
        shutil.rmtree(seg_tmp, ignore_errors=True)
        shutil.rmtree(seg_dir, ignore_errors=True)
        # the staged write already partitioned postings by gkey: the merge is
        # one independent task per (shard, salt) group — no all-to-all
        # operator (Ray's sort shuffle showed 2x run-to-run wall variance
        # here; the partitioned-write shuffle is deterministic and each gkey
        # directory is independently resumable)
        plan = [{"gkey": k, "files": fs}
                for k, fs in sorted(_gkey_files(out_dir).items())]
        runs = rd.from_items(plan, override_num_blocks=max(1, len(plan))) \
            .map_batches(_EncodeGkeyTask(cfg.block_size), batch_size=1,
                         batch_format="pandas")
        # NO second exchange for salted terms: a term's salt runs stay as
        # separate segment ROWS within its shard dir and the reader concats
        # them at load time (codec.concat_runs — pure metadata/bytes concat,
        # zero decode). Round-1 shipped an eager groupby(shard) merge here;
        # it shuffled every encoded posting byte through a sort operator for
        # no read-time benefit (measured 6.5s of the 2M-doc build).
        runs.write_parquet(seg_tmp, partition_cols=["shard", "salt"])
        os.replace(seg_tmp, seg_dir)
        n_terms = count_distinct_terms(seg_dir, multi_run=n_salt > 1)
        man.mark_merge(cfg.num_shards, {"num_terms": int(n_terms)})
        stats["num_terms"] = int(n_terms)
    else:
        prior = man.data.get("stats") or {}
        if "num_terms" in prior:
            stats["num_terms"] = prior["num_terms"]

    stage_secs["merge"] = round(_time.monotonic() - _t0, 3)
    # forward index (kind=f) is emitted by the SAME tokenize pass /
    # partitioned write as the postings — no separate stage
    stats["fwd_bucket_docs"] = int(cfg.fwd_docs_per_bucket)
    stats["stage_secs"] = stage_secs
    man.set_stats(stats)
    man.save()
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    return stats
