"""End-to-end corpus curation for training-data pipelines.

Composes the textstats + dedup families into the standard LLM-corpus
cleaning flow — quality features -> language filter -> exact dedup — as ONE
streaming pass over the text plus ONE metadata-only shuffle:

* stage 1 (``map_batches``, pyarrow): tokenize once, compute token count,
  stopword ratio, mean token length, uniqueness ratio and the marker-word
  language vote in a single fused kernel (each of these alone is the
  corresponding :mod:`textstats` operator), apply every filter predicate
  vectorized inside the batch, and hash ONLY the surviving docs' text with
  the dedup family's 124-bit polynomial content hash. Rejected docs never
  leave the stage; text never leaves the stage.
* stage 2 (``groupby(content_hash)``): keeper = min doc_id per hash with a
  duplicate count. Exact duplicates have identical text, hence identical
  features, so per-feature ``Min`` aggregates carry the keeper's values
  without a join back to the corpus.

At 100 TB the shuffle moves only (hash, id, 5 small features) for the docs
that survive filtering — the same discipline as :func:`ops.dedup.exact_dedup`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import content_hash_hex
from .textstats import (LANG_MARKERS, STOP_SMALL, _doc_segments,
                        _flat_tokens)


def curate_corpus(ds, text_col: str = "text", id_col: str = "doc_id",
                  min_tokens: int = 1, langs=None,
                  min_uniq_ratio: float | None = None,
                  max_stop_ratio: float | None = None,
                  min_mean_token_len: float | None = None):
    """→ Dataset(doc_id, dup_count, n_tokens, stop_ratio, mean_token_len,
    uniq_ratio, lang_pred): one row per kept, deduplicated document.

    Filters (all optional, AND-ed, applied to 6-dp-rounded features so the
    SQL oracle can replay the comparisons exactly): ``min_tokens``,
    ``langs`` (iterable of predicted languages to keep; ``None`` keeps all
    including 'und'), ``min_uniq_ratio``, ``max_stop_ratio``,
    ``min_mean_token_len``.
    """

    lang_keys = sorted(LANG_MARKERS)
    marker_sets = {lang: pa.array(sorted(LANG_MARKERS[lang]))
                   for lang in lang_keys}
    stop_set = pa.array(sorted(STOP_SMALL))
    keep_langs = None if langs is None else sorted(set(langs))
    lang_arr = np.array(lang_keys, dtype=object)

    def features(batch: pa.Table) -> pa.Table:
        import pandas as pd
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, counts = _flat_tokens(texts)
        n_docs = counts.size
        sr = np.zeros(n_docs, np.float64)
        mtl = np.zeros(n_docs, np.float64)
        ur = np.zeros(n_docs, np.float64)
        votes = np.zeros((len(lang_keys), n_docs), np.int64)
        nz, offs = _doc_segments(counts)
        if nz.size:
            nzc = counts[nz].astype(np.float64)
            is_stop = pc.is_in(flat, value_set=stop_set) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            sr[nz] = np.round(np.add.reduceat(is_stop, offs) / nzc, 6)
            tlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
            mtl[nz] = np.round(np.add.reduceat(tlen, offs) / nzc, 6)
            codes, _ = pd.factorize(flat.to_pandas())
            doc_idx = np.repeat(nz, counts[nz])
            order = np.lexsort((codes, doc_idx))
            c, d = codes[order], doc_idx[order]
            new = np.concatenate(([True],
                                  (d[1:] != d[:-1]) | (c[1:] != c[:-1])))
            ur[nz] = np.round(np.add.reduceat(new.astype(np.int64), offs)
                              / nzc, 6)
            for li, lang in enumerate(lang_keys):
                hit = pc.is_in(flat, value_set=marker_sets[lang]) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                votes[li, nz] = np.add.reduceat(hit, offs)
        best_i = np.argmax(votes, axis=0)  # first max = alphabetical tie
        best = votes[best_i, np.arange(n_docs)] if n_docs else \
            np.empty(0, np.int64)
        preds = np.where(best > 0, lang_arr[best_i], "und")

        mask = counts >= min_tokens
        if keep_langs is not None:
            mask &= np.isin(preds, keep_langs)
        if min_uniq_ratio is not None:
            mask &= ur >= min_uniq_ratio
        if max_stop_ratio is not None:
            mask &= sr <= max_stop_ratio
        if min_mean_token_len is not None:
            mask &= mtl >= min_mean_token_len
        idx = np.flatnonzero(mask)
        sel = pa.array(idx, pa.int64())
        kept_text = pc.take(texts, sel)
        return pa.table({
            "content_hash": content_hash_hex(kept_text.to_pylist()),
            id_col: pc.take(batch[id_col].cast(pa.int64()), sel),
            "n_tokens": pa.array(counts[idx]),
            "stop_ratio": pa.array(sr[idx]),
            "mean_token_len": pa.array(mtl[idx]),
            "uniq_ratio": pa.array(ur[idx]),
            "lang_pred": pa.array(preds[idx].astype(str), pa.string()),
        })

    # coarse fold, not groupby().aggregate(): content_hash cardinality
    # scales with the corpus, where Ray's per-row-Python block merge is
    # the wrong reduce (15.7x measured at 2M hashes — see ops/fold.py)
    from .fold import coarse_group_agg
    feats = ds.map_batches(features, batch_format="pyarrow")
    agg = coarse_group_agg(feats, ["content_hash"], [
        (id_col, id_col, "min"),
        ("dup_count", id_col, "size"),
        ("n_tokens", "n_tokens", "min"),
        ("stop_ratio", "stop_ratio", "min"),
        ("mean_token_len", "mean_token_len", "min"),
        ("uniq_ratio", "uniq_ratio", "min"),
        ("lang_pred", "lang_pred", "min")])
    return agg.select_columns([id_col, "dup_count", "n_tokens", "stop_ratio",
                               "mean_token_len", "uniq_ratio", "lang_pred"])
