"""Posting-list codec: delta-gap + variable-byte compression with per-block
block-max metadata.

The reference delegates all of this to Lucene's internal postings format
(reference: src/main/java/indexing/MsMarcoIndexer.java:83 — addDocument is
where control crosses into Lucene). Per the north rule we build it explicitly:

* doc ids sorted ascending, encoded as deltas (first id absolute), varbyte;
* term frequencies encoded varbyte in a parallel stream;
* per block of ``block_size`` postings we keep ``(last_doc, max_tf, min_dl)``
  — enough to compute a similarity-agnostic upper bound at query time for
  block-max WAND (Ding & Suel, SIGIR 2011): BM25 tf-norm is increasing in tf
  and decreasing in doc length, so (max_tf, min_dl) bounds the block for ANY
  (k1, b), the same trick Lucene 8 uses with (tf, norm) impact pairs.

Everything is numpy-vectorized: encode/decode touch no Python loop over
postings (only a loop over byte-position ≤ 10, and over blocks for metadata).

Varbyte layout: little-endian 7-bit groups; high bit set ⇒ more bytes follow.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a non-negative int64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits, 1)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    maxb = int(nbytes.max())
    for k in range(maxb):
        sel = nbytes > k
        byte = (v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[sel] - 1) > k
        out[offsets[sel] + k] = byte.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def varbyte_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Vectorized varbyte decode → int64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    terminal = b < 128
    # value index per byte: 0-based, increments after each terminal byte
    vidx = np.concatenate(([0], np.cumsum(terminal)[:-1].astype(np.int64)))
    nvals = int(terminal.sum())
    if nvals == 0 or terminal[-1] != True:  # noqa: E712 — np.bool_
        raise ValueError("truncated varbyte stream (no terminal byte at end)")
    # byte position within its value
    starts = np.flatnonzero(np.concatenate(([True], terminal[:-1])))
    pos = np.arange(b.size, dtype=np.int64) - starts[vidx]
    out = np.zeros(nvals, dtype=np.uint64)
    np.bitwise_or.at(out, vidx, (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos).astype(np.uint64))
    res = out.astype(np.int64)
    if count is not None and res.size != count:
        raise ValueError(f"decoded {res.size} values, expected {count}")
    return res


@dataclass
class EncodedPostings:
    """One term's (or one salt-bucket's) encoded postings."""
    df: int
    cf: int
    doc_bytes: bytes        # delta-gap varbyte of sorted doc ids
    tf_bytes: bytes         # varbyte of tfs (parallel order)
    first_doc: int
    last_doc: int
    block_last_doc: np.ndarray   # int64 per block
    block_max_tf: np.ndarray     # int32 per block
    block_min_dl: np.ndarray     # int32 per block


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, doc_lens: np.ndarray,
                    block_size: int = 128) -> EncodedPostings:
    """Encode one term's postings. Inputs need not be sorted; sorted by doc id
    here (tie-impossible: one posting per (term, doc))."""
    order = np.argsort(doc_ids, kind="stable")
    d = np.asarray(doc_ids, dtype=np.int64)[order]
    t = np.asarray(tfs, dtype=np.int64)[order]
    dl = np.asarray(doc_lens, dtype=np.int64)[order]
    deltas = np.empty_like(d)
    deltas[0] = d[0]
    np.subtract(d[1:], d[:-1], out=deltas[1:])
    if d.size > 1 and deltas[1:].min() <= 0:
        raise ValueError("duplicate doc id in postings for one term")
    n = d.size
    nblocks = (n + block_size - 1) // block_size
    # block reductions via ufunc.reduceat (vectorized over blocks)
    bstarts = np.arange(0, n, block_size, dtype=np.int64)
    block_last = d[np.minimum(bstarts + block_size - 1, n - 1)]
    block_max_tf = np.maximum.reduceat(t, bstarts).astype(np.int32)
    block_min_dl = np.minimum.reduceat(dl, bstarts).astype(np.int32)
    assert block_last.size == nblocks
    return EncodedPostings(
        df=int(n), cf=int(t.sum()),
        doc_bytes=varbyte_encode(deltas), tf_bytes=varbyte_encode(t),
        first_doc=int(d[0]), last_doc=int(d[-1]),
        block_last_doc=block_last, block_max_tf=block_max_tf,
        block_min_dl=block_min_dl,
    )


def decode_postings(doc_bytes: bytes, tf_bytes: bytes,
                    df: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """→ (doc_ids ascending, tfs)."""
    deltas = varbyte_decode(doc_bytes, df)
    tfs = varbyte_decode(tf_bytes, df)
    return np.cumsum(deltas), tfs


def merge_encoded_runs(runs: list[EncodedPostings], doc_lens_lookup=None,
                       block_size: int = 128) -> EncodedPostings:
    """Concatenate salt-bucket runs of ONE term whose doc-id ranges are
    disjoint and ordered (SURVEY.md I6 stage 2). Decodes + re-encodes so block
    boundaries stay uniform; cost is linear and confined to the (rare) salted
    heavy terms."""
    runs = sorted(runs, key=lambda r: r.first_doc)
    for a, b in zip(runs, runs[1:]):
        if b.first_doc <= a.last_doc:
            raise ValueError("salt-bucket doc ranges overlap")
    docs, tfs, dls = [], [], []
    for r in runs:
        d, t = decode_postings(r.doc_bytes, r.tf_bytes, r.df)
        docs.append(d)
        tfs.append(t)
        # reconstruct per-posting doc lens from lookup for block metadata
        if doc_lens_lookup is not None:
            dls.append(doc_lens_lookup(d))
    d = np.concatenate(docs)
    t = np.concatenate(tfs)
    if doc_lens_lookup is not None:
        dl = np.concatenate(dls)
    else:
        # fall back: block min_dl recomputation impossible → conservative 1
        dl = np.ones_like(d)
    return encode_postings(d, t, dl, block_size)
