"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All are stateless vectorizable ``map_batches`` transforms emitting flat Arrow
columns; floats are rounded to 6 dp so results hash-match the SQL oracles.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# small public marker-word sets (top function words per language)
LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is you that it he was for on are".split()),
    "fr": frozenset("le la et les des en un une du que pour dans ce il".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist".split()),
    "es": frozenset("de la que el en y a los del se las por un para".split()),
}

STOP_SMALL = frozenset("a an the and of to is in that it".split())


def token_count(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id, n_tokens, n_unique)."""

    def f(batch: pa.Table) -> pa.Table:
        nt, nu = [], []
        for text in batch[text_col].to_pylist():
            toks = text.split()
            nt.append(len(toks))
            nu.append(len(set(toks)))
        return pa.table({"doc_id": batch[id_col].cast(pa.int64()),
                         "n_tokens": pa.array(nt, pa.int64()),
                         "n_unique": pa.array(nu, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def quality_score(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id, n_tokens, stop_ratio, mean_token_len, uniq_ratio) — simple
    heuristic quality features (length / stopword density / repetition)."""

    def f(batch: pa.Table) -> pa.Table:
        nt, sr, mtl, ur = [], [], [], []
        for text in batch[text_col].to_pylist():
            toks = text.split()
            n = len(toks)
            nt.append(n)
            if n == 0:
                sr.append(0.0)
                mtl.append(0.0)
                ur.append(0.0)
                continue
            sr.append(round(sum(t in STOP_SMALL for t in toks) / n, 6))
            mtl.append(round(sum(len(t) for t in toks) / n, 6))
            ur.append(round(len(set(toks)) / n, 6))
        return pa.table({"doc_id": batch[id_col].cast(pa.int64()),
                         "n_tokens": pa.array(nt, pa.int64()),
                         "stop_ratio": pa.array(sr, pa.float64()),
                         "mean_token_len": pa.array(mtl, pa.float64()),
                         "uniq_ratio": pa.array(ur, pa.float64())})

    return ds.map_batches(f, batch_format="pyarrow")


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id, lang_pred, lang_score) — marker-word voting; ties broken
    alphabetically; 'und' when no marker hits."""
    langs = sorted(LANG_MARKERS)

    def f(batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for text in batch[text_col].to_pylist():
            toks = text.split()
            best_lang, best = "und", 0
            for lang in langs:  # alphabetical → deterministic tie-break
                s = sum(t in LANG_MARKERS[lang] for t in toks)
                if s > best:
                    best, best_lang = s, lang
            preds.append(best_lang)
            scores.append(best)
        return pa.table({"doc_id": batch[id_col].cast(pa.int64()),
                         "lang_pred": pa.array(preds, pa.string()),
                         "lang_score": pa.array(scores, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def fingerprint(ds, text_col: str = "text", id_col: str = "doc_id", n: int = 3):
    """→ (doc_id, fp) — document fingerprint = lexicographic min of the md5
    hex digests of the word n-grams (a 1-gram winnowing variant; expressible
    in SQL as min(md5(gram)) for the oracle)."""

    def f(batch: pa.Table) -> pa.Table:
        fps = []
        for text in batch[text_col].to_pylist():
            toks = text.split()
            grams = ([" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
                     if len(toks) >= n else ([" ".join(toks)] if toks else []))
            fps.append(min((hashlib.md5(g.encode()).hexdigest() for g in grams),
                           default=""))
        return pa.table({"doc_id": batch[id_col].cast(pa.int64()),
                         "fp": pa.array(fps, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")
