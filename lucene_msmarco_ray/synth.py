"""Deterministic synthetic code corpus + queries (FIXTURES.md F1/F2).

Pure functions of (seed, n) — no wall clock, no unseeded RNG — so two runs at
any parallelism produce byte-identical tables. Mirrors BASELINE.json's
input_hint schema: (repo, path, commit, lang, content).

The vocabulary mixes code-ish identifiers, stemmable English words, stopwords
and numeric literals so the full analysis chain (_NUM_ rule, stop removal,
Porter) is exercised; a few heavy terms appear in >50% of docs to exercise
salted skew handling (SURVEY.md I6).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SYNTH_VERSION = 3   # bump to invalidate cached corpora under /tmp

_LANG_EXT = {"py": "py", "java": "java", "c": "c", "go": "go", "js": "js"}

_HEAVY = ["return", "value", "index", "data", "result"]
_STEMMABLE = ["running", "indexes", "caches", "merged", "tokenized", "builder",
              "relational", "searching", "scored", "ranking", "optimization",
              "partitioned", "nationalization", "readers", "flushes"]
_STOPS = ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"]


def _vocab(rng: np.random.Generator, size: int = 2000) -> list[str]:
    """~``size`` identifiers that survive the analysis chain DISTINCT (the
    stems must not collapse, or every query term becomes a worst-case heavy
    term); a few suffixed forms are layered on top to exercise stemming."""
    cons = "bcdfghjklmnpqrstvwz"
    vowel = "aeiou"
    roots = []
    seen = set()
    while len(roots) < size:
        w = "".join([
            cons[int(rng.integers(len(cons)))],
            vowel[int(rng.integers(len(vowel)))],
            cons[int(rng.integers(len(cons)))],
            vowel[int(rng.integers(len(vowel)))],
            cons[int(rng.integers(len(cons)))],
        ])
        if w not in seen:
            seen.add(w)
            roots.append(w)
    suffixed = [r + s for r, s in zip(roots[:200],
                                      ["_id", "_len", "_off", "_map"] * 50)]
    return (roots + suffixed)[:size + 200]


def _zipf_probs(n: int) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1, dtype=np.float64)
    return p / p.sum()


def generate_corpus(n_docs: int, seed: int = 42, n_files: int = 4,
                    out_dir: str | None = None) -> list[str] | pa.Table:
    """Write ``n_files`` parquet files of the synthetic corpus (if ``out_dir``)
    or return one pyarrow table. Rows are globally sorted by doc_key so the
    (file, row) order IS the doc_key order (deterministic doc ids,
    SURVEY.md I1)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(rng))
    heavy = np.array(_HEAVY + _STOPS)
    stem_words = np.array(_STEMMABLE)

    # Zipf-ish doc lengths in [10, 2000]
    lens = np.minimum(10 + (rng.pareto(1.3, n_docs) * 40).astype(np.int64), 2000)
    repos = np.array([f"org{i % 7}/repo{i % 23}" for i in range(n_docs)])
    langs = rng.choice(list(_LANG_EXT), n_docs)
    paths = np.array([f"src/d{i % 13}/f{i}.{_LANG_EXT[l]}"
                      for i, l in enumerate(langs)])
    commits = np.array(["".join(rng.choice(list("0123456789abcdef"), 40))
                        for _ in range(min(n_docs, 50))])[  # few commits, reused
        rng.integers(0, min(n_docs, 50), n_docs)]

    vocab_p = _zipf_probs(len(vocab))   # Zipf-ish df distribution
    # vectorized: draw one flat token stream, split per doc
    total = int(lens.sum())
    flat = rng.choice(vocab, total, p=vocab_p)
    bounds = np.cumsum(lens)[:-1]
    heavy_mask = rng.random(n_docs) < 0.6   # heavy terms in >50% of docs
    n_extras = np.maximum(1, lens // 20)
    extra_stems = rng.choice(stem_words, int(n_extras.sum()))
    extra_nums = rng.integers(-999, 10_000, int(n_extras.sum()))
    e_bounds = np.concatenate(([0], np.cumsum(n_extras)))
    contents = []
    for i, body_arr in enumerate(np.split(flat, bounds)):
        body = list(body_arr)
        L = len(body)
        if heavy_mask[i]:
            nh = max(1, L // 10)
            body[:nh] = heavy[(i + np.arange(nh)) % len(heavy)]
        s, e = e_bounds[i], e_bounds[i + 1]
        body.extend(extra_stems[s:e])
        body.extend(str(x) for x in extra_nums[s:e])
        contents.append(" ".join(body))

    keys = np.array([f"{r}/{p}@{c}" for r, p, c in zip(repos, paths, commits)])
    order = np.argsort(keys, kind="stable")
    tbl = pa.table({
        "repo": pa.array(repos[order].tolist(), pa.string()),
        "path": pa.array(paths[order].tolist(), pa.string()),
        "commit": pa.array(commits[order].tolist(), pa.string()),
        "lang": pa.array(langs[order].tolist(), pa.string()),
        "content": pa.array([contents[i] for i in order], pa.large_string()),
    })
    if out_dir is None:
        return tbl
    os.makedirs(out_dir, exist_ok=True)
    files = []
    per = (n_docs + n_files - 1) // n_files
    for f in range(n_files):
        part = tbl.slice(f * per, per)
        if part.num_rows == 0:
            break
        path = os.path.join(out_dir, f"corpus-{f:04d}.parquet")
        # small row groups → fine-grained read/tokenize tasks (the read plan
        # is one task per row group; coarse groups leave straggler waves)
        pq.write_table(part, path, row_group_size=8192)
        files.append(path)
    return files


def generate_queries(n_queries: int = 50, seed: int = 7) -> pa.Table:
    """Synthetic query set (FIXTURES.md F2): 2-8 vocabulary words; includes an
    all-stopword query, a df=0 term, and heavy-term duplicates."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(rng))
    rows = []
    for q in range(n_queries):
        nw = int(rng.integers(2, 9))
        words = list(rng.choice(vocab, nw))
        if q % 5 == 0:
            words.append(_HEAVY[q % len(_HEAVY)])
        if q % 7 == 0:
            words.append(str(rng.integers(0, 5000)))
        rows.append({"qid": str(q + 1), "text": " ".join(words)})
    rows.append({"qid": str(n_queries + 1), "text": "the and of to"})
    rows.append({"qid": str(n_queries + 2), "text": "zzxqjv unseen_term_xq"})
    return pa.Table.from_pylist(rows)
