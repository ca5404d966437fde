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

_LANG_EXT = {"py": "py", "java": "java", "c": "c", "go": "go", "js": "js"}

_HEAVY = ["return", "value", "index", "data", "result"]
_STEMMABLE = ["running", "indexes", "caches", "merged", "tokenized", "builder",
              "relational", "searching", "scored", "ranking", "optimization",
              "partitioned", "nationalization", "readers", "flushes"]
_STOPS = ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"]


def _vocab(rng: np.random.Generator, size: int = 2000) -> list[str]:
    roots = ["buf", "ptr", "iter", "node", "hash", "heap", "byte", "page",
             "lock", "pool", "task", "span", "slot", "leaf", "tree", "list",
             "blk", "seg", "doc", "term", "post", "freq", "norm", "sort"]
    suff = ["", "_id", "_len", "_cnt", "_off", "_ptr", "er", "s", "ing", "ed",
            "_map", "_set", "_arr", "_buf", "x", "2"]
    out = []
    for r in roots:
        for s in suff:
            out.append(r + s)
    i = 0
    while len(out) < size:
        out.append(f"sym{i}")
        i += 1
    return out[:size]


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

    contents = []
    for i in range(n_docs):
        L = int(lens[i])
        body = list(rng.choice(vocab, L))
        # heavy terms in >50% of docs
        if rng.random() < 0.6:
            body[: max(1, L // 10)] = rng.choice(heavy, max(1, L // 10))
        # stemmable + numbers sprinkled in
        n_extra = max(1, L // 20)
        body.extend(rng.choice(stem_words, n_extra))
        body.extend(str(x) for x in rng.integers(-999, 10_000, n_extra))
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
        pq.write_table(part, path)
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
