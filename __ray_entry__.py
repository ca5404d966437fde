"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (index build + BM25 retrieval) on
sf0.001. ``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2); ``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible one. Column names/types match between both sides; floats are
rounded to 6 dp on both sides so the value-hash comparison is robust to
summation-order ulps.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections import Counter
from collections.abc import Callable
from typing import Any

import numpy as np

# ---------------------------------------------------------------------------
# fixed gate query set (terms drawn from the testdata `documents` vocabulary;
# includes duplicate-term, stop-like, df=0 and no-hit edge queries per
# FIXTURES.md F2)
# ---------------------------------------------------------------------------
GATE_QUERIES: list[tuple[str, str]] = [
    ("1", "table value hash"),
    ("2", "window sort merge"),
    ("3", "key scan filter"),
    ("4", "agg join column data"),
    ("5", "slow fast stream"),
    ("6", "spark order row line"),
    ("7", "group query vector big"),
    ("8", "dup small customer"),
    ("9", "table table key"),          # duplicate term → double weight
    ("10", "the a value"),
    ("11", "zzmissing value"),         # df=0 term mixed with a real term
    ("12", "zzmissing"),               # no hits at all
]

_K = 1000
_INDEX_CACHE: dict[str, str] = {}

# variant table for the variant_qpp gate: deterministic leave-one-term-out
# variants of every gate query (the reference reads generated variants from
# QPP_JM_VARIANTS_FILE_*; the gate synthesizes an equivalent-shaped table)
_N_GATE_VARIANTS = 2


def _gate_variants() -> list[tuple[str, int, str, float]]:
    """[(qid, variant_rank, variant_text, ref_sim)] — variant v drops the
    query's (v mod len)-th term; ref_sim = 1 − 0.1·(v+1)."""
    out = []
    for qid, text in GATE_QUERIES:
        toks = text.split()
        for v in range(_N_GATE_VARIANTS):
            drop = v % len(toks)
            vt = " ".join(t for i, t in enumerate(toks) if i != drop)
            out.append((qid, v, vt, round(1.0 - 0.1 * (v + 1), 6)))
    return out


def _index_dir_for(sf_dir: str) -> str:
    import hashlib
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join("/tmp/graft_idx", f"{os.path.basename(sf_dir.rstrip('/'))}_{tag}")


def _ensure_index(sf_dir: str) -> str:
    """Build (or resume) the gate index over <sf_dir>/documents.parquet."""
    if sf_dir in _INDEX_CACHE:
        return _INDEX_CACHE[sf_dir]
    import ray.data as rd

    from lucene_msmarco_ray.config import EngineConfig
    from lucene_msmarco_ray.index.build import build_index

    from lucene_msmarco_ray.index.build import file_lineage
    out = _index_dir_for(sf_dir)
    cfg = EngineConfig(analyzer="simple", num_shards=8)
    src = os.path.join(sf_dir, "documents.parquet")
    ds = rd.read_parquet(src, columns=["doc_id", "text"])
    build_index(ds, out, cfg, text_col="text", id_col="doc_id",
                input_lineage=file_lineage([src]))
    _INDEX_CACHE[sf_dir] = out
    return out


def _ensure_appended_index(sf_dir: str) -> str:
    """Gate index built INCREMENTALLY: base build over the first half of
    documents, then `append_documents` for the rest — O(new docs), old
    segments untouched. Downstream read-back must equal the full-corpus
    oracle."""
    key = sf_dir + "#appended"
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    import pyarrow.parquet as _pq
    import ray.data as rd

    from lucene_msmarco_ray.config import EngineConfig
    from lucene_msmarco_ray.index.append import append_documents
    from lucene_msmarco_ray.index.build import build_index, file_lineage
    out = _index_dir_for(sf_dir) + "_appended"
    src = os.path.join(sf_dir, "documents.parquet")
    half = _pq.read_metadata(src).num_rows // 2
    cfg = EngineConfig(analyzer="simple", num_shards=8)
    lin = file_lineage([src])
    base = rd.read_parquet(src, columns=["doc_id", "text"]) \
        .filter(expr=f"doc_id < {half}")
    build_index(base, out, cfg, text_col="text", id_col="doc_id",
                input_lineage=lin + f"#base<{half}")
    rest = rd.read_parquet(src, columns=["doc_id", "text"]) \
        .filter(expr=f"doc_id >= {half}")
    append_documents(out, rest, text_col="text", id_col="doc_id",
                     pid="rest", input_lineage=lin + f"#rest>={half}")
    _INDEX_CACHE[key] = out
    return out


def _ensure_compacted_index(sf_dir: str) -> str:
    """Gate index built incrementally (as `_ensure_appended_index`, its
    own directory) and then COMPACTED — `compact_index` folds the
    append's per-term posting runs back to one row per (term, shard,
    salt); the read-back must still equal the full-corpus oracle."""
    key = sf_dir + "#compacted"
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    import pyarrow.parquet as _pq
    import ray.data as rd

    from lucene_msmarco_ray.config import EngineConfig
    from lucene_msmarco_ray.index.append import append_documents
    from lucene_msmarco_ray.index.build import build_index, file_lineage
    from lucene_msmarco_ray.index.compact import compact_index
    out = _index_dir_for(sf_dir) + "_compacted"
    src = os.path.join(sf_dir, "documents.parquet")
    half = _pq.read_metadata(src).num_rows // 2
    cfg = EngineConfig(analyzer="simple", num_shards=8)
    lin = file_lineage([src])
    base = rd.read_parquet(src, columns=["doc_id", "text"]) \
        .filter(expr=f"doc_id < {half}")
    build_index(base, out, cfg, text_col="text", id_col="doc_id",
                input_lineage=lin + f"#base<{half}")
    rest = rd.read_parquet(src, columns=["doc_id", "text"]) \
        .filter(expr=f"doc_id >= {half}")
    append_documents(out, rest, text_col="text", id_col="doc_id",
                     pid="rest", input_lineage=lin + f"#rest>={half}")
    compact_index(out)
    _INDEX_CACHE[key] = out
    return out


def _ensure_salted_index(sf_dir: str) -> str:
    """Gate index variant with small doc-range salt buckets so the
    doc-partitioned sharded search path has REAL shards to exercise
    (500 fixture docs / 128 → 4 doc shards)."""
    key = sf_dir + "#salted"
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    import ray.data as rd

    from lucene_msmarco_ray.config import EngineConfig
    from lucene_msmarco_ray.index.build import build_index, file_lineage
    out = _index_dir_for(sf_dir) + "_salted"
    cfg = EngineConfig(analyzer="simple", num_shards=8,
                       salt_docs_per_bucket=128)
    src = os.path.join(sf_dir, "documents.parquet")
    ds = rd.read_parquet(src, columns=["doc_id", "text"])
    build_index(ds, out, cfg, text_col="text", id_col="doc_id",
                input_lineage=file_lineage([src]))
    _INDEX_CACHE[key] = out
    return out


def _queries_ds():
    import ray.data as rd
    return rd.from_items([{"qid": q, "text": t} for q, t in GATE_QUERIES])


def _rounded_run(sf_dir: str, scorer: str, k: int = _K, queries=None,
                 head: int | None = None, **scorer_kw):
    """Engine run re-ranked on 6-dp-rounded scores (qid, doc_id, rank, score).
    The flagship `retrieve` keeps exact Lucene ordering; this wrapper only
    stabilizes the gate comparison against SQL float summation order.
    ``queries``: [(qid, text)] — defaults to GATE_QUERIES. ``head``: keep
    only this many rows per query AFTER the rounded re-rank (retrieval still
    goes to depth ``k``, so the kept set matches SQL's rounded-order top-N
    exactly even at tie boundaries)."""
    import pandas as pd
    import ray.data as rd

    from lucene_msmarco_ray.search.searcher import retrieve

    idx = _ensure_index(sf_dir)
    qs = _queries_ds() if queries is None else rd.from_items(
        [{"qid": q, "text": t} for q, t in queries])
    run = retrieve(qs, idx, scorer=scorer, k=k, concurrency=(1, 2),
                   actor_num_cpus=0.5,
                   **scorer_kw)
    keep = head or k

    def rr(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = g["score"].round(6)
        g = g.sort_values(["score", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(keep)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "doc_id", "rank", "score"]]

    rr.__name__ = "rerank_rounded"
    return run.groupby("qid").map_groups(rr, batch_format="pandas")


# ---------------------------------------------------------------------------
# SQL oracle fragments
# ---------------------------------------------------------------------------

_TOKS = """
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
), toks2 AS (SELECT doc_id, term FROM toks WHERE term <> '')"""

_CORE = _TOKS + """,
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks2 GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT count(*) FROM toks2)::DOUBLE
           / (SELECT count(*) FROM documents) AS avgdl,
         (SELECT count(*) FROM toks2)::DOUBLE AS total_len
),
df AS (SELECT term, count(*)::DOUBLE AS df, sum(tf)::DOUBLE AS cf
       FROM tf GROUP BY 1)"""


def _query_values() -> str:
    rows = []
    for qid, text in GATE_QUERIES:
        for term, qtf in sorted(Counter(text.split()).items()):
            rows.append(f"('{qid}', '{term}', {qtf})")
    return "qv(qid, term, qtf) AS (VALUES " + ", ".join(rows) + ")"


def _bm25_sql(k1: float, b: float, k: int = _K) -> str:
    return f"""WITH {_CORE},
{_query_values()},
matched AS (
  SELECT qv.qid, tf.doc_id,
         sum(qv.qtf * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl))) AS raw
  FROM qv
  JOIN tf ON tf.term = qv.term
  JOIN df ON df.term = qv.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked_all AS (
  SELECT qid, doc_id, round(raw, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(raw, 6) DESC, doc_id) AS rank
  FROM matched
),
ranked AS (SELECT * FROM ranked_all WHERE rank <= {k})
SELECT qid, doc_id, rank::BIGINT AS rank, score
FROM ranked"""


def _lmdir_sql(mu: float, k: int = _K) -> str:
    return f"""WITH {_CORE},
{_query_values()},
matched AS (
  SELECT qv.qid, tf.doc_id,
         sum(qv.qtf * greatest(0,
             ln(1 + tf.tf / ({mu} * ((df.cf + 1) / (s.total_len + 1))))
             + ln({mu} / (dl.dl + {mu})))) AS raw
  FROM qv
  JOIN tf ON tf.term = qv.term
  JOIN df ON df.term = qv.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT qid, doc_id, round(raw, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(raw, 6) DESC, doc_id) AS rank
  FROM matched
)
SELECT qid, doc_id, rank::BIGINT AS rank, score
FROM ranked WHERE rank <= {k}"""


def _minmax_sql(k1: float, b: float) -> str:
    return f"""WITH {_CORE},
{_query_values()},
matched AS (
  SELECT qv.qid, tf.doc_id,
         sum(qv.qtf * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl))) AS raw
  FROM qv
  JOIN tf ON tf.term = qv.term JOIN df ON df.term = qv.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1, 2
),
r AS (SELECT qid, doc_id, score FROM (
        SELECT qid, doc_id, round(raw, 6) AS score,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(raw, 6) DESC, doc_id) AS rnk
        FROM matched) WHERE rnk <= {_K}),
mm AS (SELECT qid, min(score) AS lo, max(score) AS hi FROM r GROUP BY 1)
SELECT r.qid, r.doc_id,
       round(CASE WHEN mm.hi = mm.lo THEN 0.0
                  ELSE (r.score - mm.lo) / (mm.hi - mm.lo) END, 6) AS norm_score
FROM r JOIN mm ON r.qid = mm.qid"""


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in sorted(words)) + "]"


def _gate_qrels(sf_dir: str):
    """Deterministic synthetic qrels for the gate: every (gate qid, doc) pair
    gets rel = (doc_id*7 + qid*13) % 4 — graded 0..3 with rel>=2 'relevant'
    (mirrors FIXTURES.md F3; identical arithmetic in the SQL oracle)."""
    import pandas as pd
    import pyarrow.parquet as pq
    ids = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id"])["doc_id"].to_numpy()
    frames = []
    for qid, _ in GATE_QUERIES:
        rel = (ids * 7 + int(qid) * 13) % 4
        frames.append(pd.DataFrame({"qid": qid, "docid": ids, "rel": rel}))
    df = pd.concat(frames, ignore_index=True)
    return df[df["rel"] > 0]  # parse-time drop of rel<=0 (AllRelRcds.java:52-63)


_QRELS_SQL = """
qq AS (SELECT DISTINCT qid FROM qv),
qrels AS (
  SELECT qq.qid, d.doc_id, (d.doc_id * 7 + CAST(qq.qid AS INT) * 13) % 4 AS rel
  FROM qq CROSS JOIN (SELECT doc_id FROM documents) d),
ann AS (
  SELECT r.qid, r.doc_id, r.rank,
         coalesce(q.rel, 0) AS rel
  FROM ranked r LEFT JOIN qrels q ON q.qid = r.qid AND q.doc_id = r.doc_id)"""


def _eval_sql(k1: float, b: float) -> str:
    bm = _bm25_sql(k1, b)
    ranked_cte = bm[: bm.rindex(")\nSELECT")] + ")"  # keep WITH ... ranked
    return ranked_cte + "," + _QRELS_SQL + """,
tot AS (SELECT qid,
               sum(CASE WHEN rel >= 2 THEN 1 ELSE 0 END)::DOUBLE AS total_rel,
               sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)::DOUBLE AS total_pos
        FROM qrels GROUP BY 1),
hits AS (SELECT qid, rank,
                row_number() OVER (PARTITION BY qid ORDER BY rank) AS nrel
         FROM ann WHERE rel >= 2),
aps AS (SELECT qid, sum(nrel / rank::DOUBLE) AS s, count(*)::DOUBLE AS nseen
        FROM hits GROUP BY 1),
posr AS (SELECT qid, max(rank) AS lastpos FROM ann WHERE rel > 0 GROUP BY 1),
pk AS (SELECT qid,
              sum(CASE WHEN rel >= 2 AND rank <= 5 THEN 1 ELSE 0 END) / 5.0 AS p5,
              sum(CASE WHEN rel >= 2 AND rank <= 10 THEN 1 ELSE 0 END) / 10.0 AS p10,
              sum(CASE WHEN rank <= 10 THEN rel / log2(rank + 1.0) ELSE 0 END) AS dcg10
       FROM ann GROUP BY 1),
ideal AS (SELECT qid, rel,
                 row_number() OVER (PARTITION BY qid ORDER BY rel DESC, doc_id) AS pos
          FROM qrels WHERE rel > 0),
idcg AS (SELECT qid, sum(rel / log2(pos + 1.0)) AS idcg10
         FROM ideal WHERE pos <= 10 GROUP BY 1)
SELECT pk.qid,
  round(coalesce(aps.s, 0) / tot.total_rel, 6) AS ap,
  round(pk.p5, 6) AS p5, round(pk.p10, 6) AS p10,
  round(coalesce(1.0 / posr.lastpos, 0), 6) AS rr,
  round(coalesce(aps.nseen, 0) / tot.total_pos, 6) AS recall,
  round(coalesce(pk.dcg10, 0) / idcg.idcg10, 6) AS ndcg10
FROM pk
JOIN tot ON tot.qid = pk.qid
JOIN idcg ON idcg.qid = pk.qid
LEFT JOIN aps ON aps.qid = pk.qid
LEFT JOIN posr ON posr.qid = pk.qid"""


def _rel_annotate_sql(k1: float, b: float) -> str:
    bm = _bm25_sql(k1, b)
    ranked_cte = bm[: bm.rindex(")\nSELECT")] + ")"
    return ranked_cte + "," + _QRELS_SQL + """
SELECT qid, doc_id, rank, rel::BIGINT AS rel FROM ann"""


def _induced_sql(k1: float, b: float) -> str:
    """LM-JM induced rescoring of the BM25 run (λ=0.2 → odds 0.25)."""
    bm = _bm25_sql(k1, b)
    ranked_cte = bm[: bm.rindex(")\nSELECT")] + ")"
    return ranked_cte + """,
qset AS (SELECT DISTINCT qid, term FROM qv),
scored AS (
  SELECT r.qid, r.doc_id,
         round(sum(ln(1 + 0.25 * (tf.tf / dl.dl) * (s.n / df.df))), 6) AS score
  FROM ranked r
  JOIN qset ON qset.qid = r.qid
  JOIN tf ON tf.term = qset.term AND tf.doc_id = r.doc_id
  JOIN df ON df.term = qset.term
  JOIN dl ON dl.doc_id = r.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2)
SELECT qid, doc_id,
       row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::BIGINT
         AS rank,
       score
FROM scored"""


def _sparsevec_sql(k1: float, b: float) -> str:
    """S9: top-10 docs per query, every doc term weighted with the
    reference's own (buggy) bm25 helper, avgdl constant 57.25."""
    bm = _bm25_sql(k1, b)
    ranked_cte = bm[: bm.rindex(")\nSELECT")] + ")"
    return ranked_cte + """
SELECT r.qid, r.doc_id, tf.term,
       round(tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / 57.25)
             * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))), 6) AS wt
FROM ranked r
JOIN tf ON tf.doc_id = r.doc_id
JOIN df ON df.term = tf.term
JOIN dl ON dl.doc_id = r.doc_id
CROSS JOIN stats s
WHERE r.rank <= 10"""


def _bigram_sql() -> str:
    rows = []
    for qid, text in GATE_QUERIES:
        for pos, term in enumerate(text.split()):
            rows.append(f"('{qid}', {pos}, '{term}')")
    return ("WITH qp(qid, pos, term) AS (VALUES " + ", ".join(rows) + """)
SELECT t1.term || '^' || t2.term AS bigram, count(*)::BIGINT AS freq
FROM qp t1 JOIN qp t2 ON t1.qid = t2.qid AND t1.pos < t2.pos
GROUP BY 1""")


_GRAM_CTE = """t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
gl AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_transform(generate_series(1, len(toks) - 2),
                                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              WHEN len(toks) >= 1 THEN [array_to_string(toks, ' ')]
              ELSE []::VARCHAR[] END AS grams
  FROM t),
g AS (SELECT doc_id, unnest(grams) AS gram FROM gl)"""


def _roll_sql(col: str, base: int) -> str:
    """SQL for the engine's polynomial rolling hash (ops/dedup.py):
    fold(acc*base + codepoint) mod 2^31-1 — list_reduce seeds acc with the
    first element, identical to a zero-init fold."""
    return (f"list_reduce(list_transform(range(1, len({col}) + 1), "
            f"i -> ord(substr({col}, i, 1))::BIGINT), "
            f"(acc, c) -> (acc * {base} + c) % 2147483647)")


def _dedup_exact_sql() -> str:
    """Independent DuckDB recomputation of exact_dedup's 124-bit content
    hash: four base-B polynomial rolls (ops/dedup.py CONTENT_HASH_BASES),
    hex-concatenated exactly like content_hash_hex."""
    from lucene_msmarco_ray.ops.dedup import CONTENT_HASH_BASES
    rolls = ", ".join(
        f"CASE WHEN len(text) = 0 THEN 0 ELSE {_roll_sql('text', b)} END"
        for b in CONTENT_HASH_BASES)
    fmt = "%08x" * len(CONTENT_HASH_BASES)
    return f"""SELECT printf('{fmt}', {rolls}) AS content_hash,
  min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS dup_count
FROM documents GROUP BY 1"""


def _curate_sql(min_tokens: int = 20, keep_langs=("en", "es"),
                min_uniq: float = 0.35, max_stop: float = 0.25) -> str:
    """Independent DuckDB replay of ops/curate.curate_corpus: quality +
    language features over whitespace tokens, the same filter predicates on
    the 6-dp-rounded features, then exact dedup by the 124-bit polynomial
    content hash with keeper = min doc_id."""
    from lucene_msmarco_ray.ops.dedup import CONTENT_HASH_BASES
    from lucene_msmarco_ray.ops.textstats import LANG_MARKERS, STOP_SMALL
    langs = sorted(LANG_MARKERS)
    score_cols = ",\n  ".join(
        f"len(list_filter(toks, x -> list_contains({_sql_list(LANG_MARKERS[l])}, x)))"
        f" AS s_{l}" for l in langs)
    max_expr = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    pred_branches = " ".join(f"WHEN s_{l} = m THEN '{l}'" for l in langs)
    rolls = ", ".join(
        f"CASE WHEN len(text) = 0 THEN 0 ELSE {_roll_sql('text', b)} END"
        for b in CONTENT_HASH_BASES)
    fmt = "%08x" * len(CONTENT_HASH_BASES)
    lang_list = ", ".join(f"'{l}'" for l in keep_langs)
    return f"""WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tn AS (SELECT * FROM t WHERE len(toks) >= {min_tokens}),
f AS (SELECT doc_id, text, len(toks)::BIGINT AS n_tokens,
  round(len(list_filter(toks, x -> list_contains({_sql_list(STOP_SMALL)}, x)))
        / len(toks)::DOUBLE, 6) AS stop_ratio,
  round(list_aggregate(list_transform(toks, x -> len(x)), 'sum')
        / len(toks)::DOUBLE, 6) AS mean_token_len,
  round(len(list_distinct(toks)) / len(toks)::DOUBLE, 6) AS uniq_ratio,
  {score_cols}
  FROM tn),
m AS (SELECT *, {max_expr} AS m FROM f),
l AS (SELECT *, CASE WHEN m = 0 THEN 'und' {pred_branches} END AS lang_pred
      FROM m),
k AS (SELECT * FROM l
      WHERE lang_pred IN ({lang_list}) AND uniq_ratio >= {min_uniq}
        AND stop_ratio <= {max_stop}),
h AS (SELECT *, printf('{fmt}', {rolls}) AS content_hash FROM k)
SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS dup_count,
  min(n_tokens) AS n_tokens, min(stop_ratio) AS stop_ratio,
  min(mean_token_len) AS mean_token_len, min(uniq_ratio) AS uniq_ratio,
  min(lang_pred) AS lang_pred
FROM h GROUP BY content_hash"""


def _minhash_sql(num_perm: int = 64, bands: int = 16, seed: int = 13) -> str:
    """Independent DuckDB recomputation of minhash_lsh_candidates: same gram
    hashes, same seeded (a,b) permutation constants, same band keys."""
    from lucene_msmarco_ray.ops.dedup import minhash_params
    a, b = minhash_params(num_perm, seed)
    r = num_perm // bands
    vals = ", ".join(f"({p}, {int(a[p])}, {int(b[p])})"
                     for p in range(num_perm))
    return f"""WITH {_GRAM_CTE},
gh AS (SELECT doc_id, {_roll_sql('gram', 131)} AS h FROM g),
perm(p, a, b) AS (VALUES {vals}),
sig AS (SELECT gh.doc_id, perm.p,
               min((perm.a * gh.h + perm.b) % 2147483647) AS mh
        FROM gh CROSS JOIN perm GROUP BY 1, 2),
bk AS (SELECT doc_id, p // {r} AS band_id,
              string_agg(mh::VARCHAR, '-' ORDER BY p) AS band_key
       FROM sig GROUP BY 1, 2)
SELECT DISTINCT a.doc_id::BIGINT AS doc_a, b.doc_id::BIGINT AS doc_b
FROM bk a JOIN bk b
  ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id"""


def _importance_sql() -> str:
    """DSIR importance-weight oracle (target LM = lang='en' docs, source
    LM = all docs), shared by the weights gate and the Gumbel resample
    gate."""
    return """WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
scf AS (SELECT term, count(*)::BIGINT AS c FROM tok GROUP BY 1),
stot AS (SELECT sum(c)::BIGINT AS total FROM scf),
sm AS (SELECT term,
         CAST(floor(ln(c::DOUBLE / total) * 1000000 + 0.5) AS BIGINT) AS m
       FROM scf, stot),
ttok AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents WHERE lang = 'en'),
tcf AS (SELECT term, count(*)::BIGINT AS c FROM ttok GROUP BY 1),
ttot AS (SELECT sum(c)::BIGINT AS total FROM tcf),
tm AS (SELECT term,
         CAST(floor(ln(c::DOUBLE / total) * 1000000 + 0.5) AS BIGINT) AS m
       FROM tcf, ttot),
toov AS (SELECT CAST(floor(ln(0.5 / total) * 1000000 + 0.5) AS BIGINT) AS o
         FROM ttot),
agg AS (SELECT tok.doc_id,
               sum(coalesce(tm.m, toov.o) - sm.m)::BIGINT AS lw,
               count(*)::BIGINT AS n
        FROM tok JOIN sm USING (term) LEFT JOIN tm USING (term), toov
        GROUP BY 1)
SELECT t.doc_id, coalesce(agg.n, 0)::BIGINT AS n_tokens,
       coalesce(agg.lw, 0)::BIGINT AS logw_micro,
       coalesce(floor((agg.lw / 1000000.0 / agg.n) * 1000000 + 0.5)
                  / 1000000.0, 0.0) AS avg_logw
FROM t LEFT JOIN agg USING (doc_id)"""


def _components_sql() -> str:
    """Recursive-CTE min-label closure over the minhash candidate pairs —
    the shared oracle for BOTH connected-components engines (driver
    union-find and distributed label propagation)."""
    return f"""WITH RECURSIVE pairs AS ({_minhash_sql()}),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT a AS node FROM e),
reach AS (
  SELECT node, node AS label FROM nodes
  UNION
  SELECT e.b AS node, reach.label FROM reach JOIN e ON reach.node = e.a)
SELECT node::BIGINT AS doc_id, min(label)::BIGINT AS component
FROM reach GROUP BY 1"""


def _simhash_sql(max_hamming: int = 3) -> str:
    """Independent DuckDB recomputation of simhash_pairs: two 31-bit rolling
    hashes per token (bases 131/137) → 62-bit fingerprint → all-pairs Hamming
    (the engine's 4-band LSH is pigeonhole-complete for d<=3, so the exact
    all-pairs scan is the correct oracle)."""
    return f"""WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
th AS (SELECT doc_id, {_roll_sql('tk', 131)} AS h1, {_roll_sql('tk', 137)} AS h2
       FROM tok),
bits AS (SELECT doc_id, j,
                sum(CASE WHEN ((CASE WHEN j < 31 THEN h1 >> j
                                     ELSE h2 >> (j - 31) END) & 1) = 1
                         THEN 1 ELSE -1 END) AS v
         FROM th CROSS JOIN (SELECT unnest(range(62)) AS j)
         GROUP BY 1, 2),
fp AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << j)
                               ELSE 0 END)::BIGINT AS f
       FROM bits GROUP BY 1)
SELECT a.doc_id::BIGINT AS doc_a, b.doc_id::BIGINT AS doc_b,
       bit_count(xor(a.f, b.f))::BIGINT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.f, b.f)) <= {max_hamming}"""


def _ranked_cte(k1: float, b: float) -> str:
    bm = _bm25_sql(k1, b)
    return bm[: bm.rindex(")\nSELECT")] + ")"


def _qp_values() -> str:
    """Per-OCCURRENCE query terms (duplicates preserved — fit/expand loops
    count them twice, reference behavior)."""
    rows = []
    for qid, text in GATE_QUERIES:
        for pos, term in enumerate(text.split()):
            rows.append(f"('{qid}', {pos}, '{term}')")
    return "qp(qid, pos, term) AS (VALUES " + ", ".join(rows) + ")"


_RELD = """reld AS (
  SELECT qid, doc_id FROM (
    SELECT qq.qid, d.doc_id,
           row_number() OVER (PARTITION BY qq.qid ORDER BY d.doc_id) AS rn
    FROM (SELECT DISTINCT qid FROM qv) qq
    JOIN documents d ON (d.doc_id * 7 + CAST(qq.qid AS INT) * 13) % 4 >= 2)
  WHERE rn <= 5)"""

_LMW = """w1 AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + 9.0 * (tf.tf / dl.dl) * (s.n / df.df)) AS w
  FROM tf JOIN dl ON dl.doc_id = tf.doc_id
  JOIN df ON df.term = tf.term CROSS JOIN stats s),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS z FROM w1 GROUP BY 1),
lmw AS (SELECT w1.doc_id, w1.term, w1.w / nrm.z AS w
        FROM w1 JOIN nrm ON nrm.doc_id = w1.doc_id)"""

# RM-conditional weights over the run's top-20 (RelevanceModelConditional
# semantics incl. the sum_df=numTopDocs and per-unique-term sum_sim quirks)
_RMCOND = """top20 AS (SELECT qid, doc_id, score FROM ranked WHERE rank <= 20),
tstat AS (SELECT t20.qid, tf.term, count(*)::DOUBLE AS tdf
          FROM top20 t20 JOIN tf ON tf.doc_id = t20.doc_id GROUP BY 1, 2),
nuniq AS (SELECT doc_id, count(*)::DOUBLE AS nu FROM tf GROUP BY 1),
ssim AS (SELECT t20.qid, sum(t20.score * nuniq.nu) AS sum_sim
         FROM top20 t20 JOIN nuniq ON nuniq.doc_id = t20.doc_id GROUP BY 1),
wts AS (
  SELECT t20.qid, tf.term,
         sum((0.9 * tf.tf / dl.dl + 0.1 * ts.tdf / 20.0)
             * t20.score / ssim.sum_sim) AS wt
  FROM top20 t20
  JOIN tf ON tf.doc_id = t20.doc_id
  JOIN dl ON dl.doc_id = t20.doc_id
  JOIN tstat ts ON ts.qid = t20.qid AND ts.term = tf.term
  JOIN ssim ON ssim.qid = t20.qid
  GROUP BY 1, 2)"""


def _fdbk_rerank_sql(k1: float, b: float) -> str:
    """RM-conditional KL-div rerank of the whole run
    (fdbk/RelevanceModelConditional.java + KLDivReranker.java)."""
    return _ranked_cte(k1, b) + f""",
{_RMCOND},
kl AS (SELECT r.qid, r.doc_id,
              sum(w.wt * ln(w.wt / (tf.tf / dl.dl))) AS kl
       FROM ranked r
       JOIN wts w ON w.qid = r.qid
       JOIN tf ON tf.doc_id = r.doc_id AND tf.term = w.term
       JOIN dl ON dl.doc_id = r.doc_id
       GROUP BY 1, 2),
scored AS (SELECT r.qid, r.doc_id,
                  round(1 - exp(coalesce(kl.kl, 0)), 6) AS score
           FROM ranked r
           LEFT JOIN kl ON kl.qid = r.qid AND kl.doc_id = r.doc_id)
SELECT qid, doc_id,
       row_number() OVER (PARTITION BY qid
                          ORDER BY score DESC, doc_id)::BIGINT AS rank,
       score
FROM scored"""


def _rm3_expand_sql(k1: float, b: float, num_terms: int = 20,
                    fb: float = 0.2) -> str:
    """RM3 expansion terms (RelevanceModelIId.java:119-175 selection with the
    engine's documented (-round(w,9), term) tie-break)."""
    return _ranked_cte(k1, b) + f""",
{_qp_values()},
{_RMCOND},
idfw AS (SELECT w.qid, w.term, w.wt * ln(s.n / df.df) AS iw
         FROM wts w JOIN df ON df.term = w.term CROSS JOIN stats s),
nrm2 AS (SELECT qid, sum(iw) AS norm FROM idfw GROUP BY 1),
expt AS (SELECT i.qid, i.term, i.iw,
                row_number() OVER (PARTITION BY i.qid
                                   ORDER BY round(i.iw, 9) DESC, i.term) AS rn
         FROM idfw i
         WHERE NOT EXISTS (SELECT 1 FROM qp
                           WHERE qp.qid = i.qid AND qp.term = i.term))
SELECT qp.qid, qp.term, {1.0 - fb} AS boost
FROM qp WHERE EXISTS (SELECT 1 FROM ranked r WHERE r.qid = qp.qid)
UNION ALL
SELECT e.qid, e.term, round({fb} * e.iw / n.norm, 6) AS boost
FROM expt e JOIN nrm2 n ON n.qid = e.qid
WHERE e.rn <= {num_terms}"""


def _srlm_rerank_sql(k1: float, b: float, top_k: int = 50,
                     prune_to: int = 5) -> str:
    """SRLM fit over the gate rel docs + rerank of the run's top-50
    (SupervisedRLM.java:151-270; model weights rounded at 9dp as the
    engine's srlm_fit does)."""
    return _ranked_cte(k1, b) + f""",
{_qp_values()},
{_RELD},
{_LMW},
contrib AS (
  SELECT qp.term AS qterm, lw.term AS term,
         round(sum(pq.w * lw.w), 9) AS wt_c
  FROM qp
  JOIN reld r ON r.qid = qp.qid
  JOIN lmw pq ON pq.doc_id = r.doc_id AND pq.term = qp.term
  JOIN lmw lw ON lw.doc_id = r.doc_id
  GROUP BY 1, 2),
model AS (SELECT qterm, term, wt_c FROM (
    SELECT *, row_number() OVER (PARTITION BY qterm
                                 ORDER BY wt_c DESC, term) AS rn
    FROM contrib) WHERE rn <= {prune_to}),
topk AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= {top_k}),
cosims AS (
  SELECT t.qid, qp.pos, t.doc_id, sum(m.wt_c * lw.w) AS cs
  FROM topk t
  JOIN qp ON qp.qid = t.qid
  JOIN model m ON m.qterm = qp.term
  JOIN lmw lw ON lw.doc_id = t.doc_id AND lw.term = m.term
  GROUP BY 1, 2, 3),
prd AS (SELECT qid, doc_id, sum(cs) AS prd FROM cosims GROUP BY 1, 2),
scored AS (SELECT t.qid, t.doc_id,
                  round(coalesce(p.prd, 0) * t.score, 6) AS score
           FROM topk t
           LEFT JOIN prd p ON p.qid = t.qid AND p.doc_id = t.doc_id)
SELECT qid, doc_id,
       row_number() OVER (PARTITION BY qid
                          ORDER BY score DESC, doc_id)::BIGINT AS rank,
       score
FROM scored"""


def _rocchio_sql(k1: float, b: float, top_k: int = 20,
                 num_terms: int = 20) -> str:
    """Rocchio expansion (KNNRelModel.java:297-360) with the single KNN
    query = the query itself, rel docs = gate qrels first-5 rel>=2."""
    return _ranked_cte(k1, b) + f""",
{_qp_values()},
{_RELD},
{_LMW},
relacc AS (SELECT r.qid, lw.term, sum(lw.w) AS w
           FROM reld r JOIN lmw lw ON lw.doc_id = r.doc_id GROUP BY 1, 2),
nrel AS (SELECT qid, count(*)::DOUBLE AS k FROM reld GROUP BY 1),
nonreld AS (SELECT qid, doc_id FROM (
    SELECT t.qid, t.doc_id,
           row_number() OVER (PARTITION BY t.qid ORDER BY t.rank) AS rn
    FROM (SELECT qid, doc_id, rank FROM ranked WHERE rank <= {top_k}) t
    WHERE NOT EXISTS (SELECT 1 FROM reld r
                      WHERE r.qid = t.qid AND r.doc_id = t.doc_id))
  WHERE rn <= 3),
nonacc AS (SELECT nr.qid, lw.term, sum(lw.w) AS w
           FROM nonreld nr JOIN lmw lw ON lw.doc_id = nr.doc_id GROUP BY 1, 2),
nnon AS (SELECT qid, count(*)::DOUBLE AS k FROM nonreld GROUP BY 1),
parts AS (
  SELECT DISTINCT qid, term, 0.5 AS w FROM qp
  UNION ALL
  SELECT ra.qid, ra.term, 0.35 * ra.w / nrel.k
  FROM relacc ra JOIN nrel ON nrel.qid = ra.qid
  UNION ALL
  SELECT na.qid, na.term, -0.15 * na.w / nnon.k
  FROM nonacc na JOIN nnon ON nnon.qid = na.qid),
merged AS (SELECT qid, term, sum(w) AS w FROM parts GROUP BY 1, 2),
kept AS (SELECT qid, term, w,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY round(w, 9) DESC, term) AS rn
         FROM merged WHERE w > 0)
SELECT qid, term, round(w, 6) AS wt FROM kept WHERE rn <= {num_terms}"""


def _qpp_sampling_sql(k1: float, b: float, k: int = 50,
                      num_samples: int = 10) -> str:
    """RSD + UEF with the engine's deterministic arithmetic pseudo-shuffle
    (qpp/methods.py sample_order_keys) — fully recomputable in SQL.

    UEF note: the engine's rank_dist uses positions in the doc-id-SORTED
    sample (reference binarySearch quirk), which makes the KL rerank order
    irrelevant to the distance — so the oracle needs only the sample sets,
    the skip condition (some sample doc within the run's top-20 with
    positive score-weighted unique-term mass), and the rank arithmetic."""
    return _ranked_cte(k1, b) + f""",
qterms AS (SELECT DISTINCT qid, term FROM qv),
qidf AS (
  SELECT qt.qid, avg(ln(s.n / coalesce(df.df, 1))) AS avg_idf
  FROM qterms qt LEFT JOIN df ON df.term = qt.term CROSS JOIN stats s
  GROUP BY 1),
cnt AS (SELECT qid, count(*)::DOUBLE AS n FROM ranked GROUP BY 1),
grid AS (SELECT qid, unnest(range({num_samples})) AS i FROM cnt),
hkeys AS (
  SELECT g.qid, g.i, r.doc_id, r.rank, r.score,
         ((r.doc_id + 1) * 1315423911 + (g.i + 1) * 2654435761
          + CAST(g.qid AS BIGINT) * 97) % 2147483647 AS h,
         ((r.doc_id + 1) * 1315423911 + (g.i + 7920) * 2654435761
          + CAST(g.qid AS BIGINT) * 97) % 2147483647 AS hu
  FROM grid g JOIN ranked r ON r.qid = g.qid),
rsamp AS (SELECT * FROM (
    SELECT qid, i, doc_id, rank, score,
           row_number() OVER (PARTITION BY qid, i ORDER BY h, doc_id) AS sn
    FROM hkeys) WHERE sn <= 20),
rest AS (SELECT qid, i, var_pop(score) AS vp FROM rsamp GROUP BY 1, 2),
depth AS (SELECT c.qid, unnest(generate_series(1, c.n::BIGINT)) AS d
          FROM cnt c),
sfx AS (SELECT qid, d,
               sum(pow(0.9, d - 1) / d)
                 OVER (PARTITION BY qid ORDER BY d DESC) AS s
        FROM depth),
rbo AS (SELECT sa.qid, sa.i, 0.1 * sum(x.s) AS rbo_v
        FROM rsamp sa
        JOIN sfx x ON x.qid = sa.qid AND x.d = greatest(sa.rank, sa.sn)
        GROUP BY 1, 2),
rsd AS (SELECT r.qid,
               sum(r.rbo_v * e.vp * q.avg_idf) / {num_samples} AS rsd
        FROM rbo r
        JOIN rest e ON e.qid = r.qid AND e.i = r.i
        JOIN qidf q ON q.qid = r.qid
        GROUP BY 1),
usamp AS (SELECT * FROM (
    SELECT qid, i, doc_id, rank, score,
           row_number() OVER (PARTITION BY qid, i ORDER BY hu, doc_id) AS sn
    FROM hkeys) WHERE sn <= 20),
nuniq2 AS (SELECT doc_id, count(*)::DOUBLE AS nu FROM tf GROUP BY 1),
uvalid AS (SELECT u.qid, u.i
           FROM usamp u JOIN nuniq2 ON nuniq2.doc_id = u.doc_id
           WHERE u.rank <= 20
           GROUP BY 1, 2 HAVING sum(u.score * nuniq2.nu) > 0),
udist AS (
  SELECT u.qid, u.i,
         sqrt(sum(pow((u.rank - 1 - u.rbz) / c.n, 2)) / c.n) AS dist
  FROM (SELECT *, row_number() OVER (PARTITION BY qid, i
                                     ORDER BY doc_id) - 1 AS rbz
        FROM usamp) u
  JOIN cnt c ON c.qid = u.qid
  GROUP BY u.qid, u.i, c.n),
totd AS (SELECT d.qid, sum(d.dist) AS td
         FROM udist d JOIN uvalid v ON v.qid = d.qid AND v.i = d.i
         GROUP BY 1),
fest AS (SELECT qid, var_pop(score) AS vp FROM ranked
         WHERE rank <= {k} GROUP BY 1)
SELECT f.qid, round(r.rsd, 6) AS rsd,
       round(CASE WHEN coalesce(t.td, 0) > 0
                  THEN ({num_samples} / t.td) * f.vp * q.avg_idf
                  ELSE 0 END, 6) AS uef
FROM fest f
JOIN rsd r ON r.qid = f.qid
JOIN qidf q ON q.qid = f.qid
LEFT JOIN totd t ON t.qid = f.qid"""


def _qpp_correlation_sql(k1: float, b: float, k: int = 50) -> str:
    """qpp_experiment oracle: per-query AP (6dp) × {nqc, avgidf, maxidf}
    (6dp) → pearson (corr()), Kendall tau-b (pair counting, commons-math3
    semantics), SARE (stable ASC argsort rank shifts, qid-string position
    as the stable tiebreak — matching merged.sort_values('qid'))."""
    return _ranked_cte(k1, b) + f""",
{_QRELS_SQL},
tot AS (SELECT qid,
               sum(CASE WHEN rel >= 2 THEN 1 ELSE 0 END)::DOUBLE AS total_rel
        FROM qrels GROUP BY 1),
hits AS (SELECT qid, rank,
                row_number() OVER (PARTITION BY qid ORDER BY rank) AS nrel
         FROM ann WHERE rel >= 2),
aps AS (SELECT qid, sum(nrel / rank::DOUBLE) AS s FROM hits GROUP BY 1),
evalq AS (SELECT t.qid, round(coalesce(a.s, 0) / t.total_rel, 6) AS ap
          FROM tot t LEFT JOIN aps a ON a.qid = t.qid
          WHERE EXISTS (SELECT 1 FROM ranked r WHERE r.qid = t.qid)),
qterms AS (SELECT DISTINCT qid, term FROM qv),
idfv AS (
  SELECT qt.qid,
         ln(s.n / coalesce(df.df, 1)) AS idf_nqc,
         CASE WHEN df.df IS NOT NULL THEN ln(s.n / df.df) END AS idf_real
  FROM qterms qt LEFT JOIN df ON df.term = qt.term CROSS JOIN stats s),
qidf AS (
  SELECT qid, avg(idf_nqc) AS avg_idf_nqc,
         coalesce(max(idf_real), 0) AS maxidf,
         coalesce(sum(idf_real), 0) / count(*) AS avgidf
  FROM idfv GROUP BY 1),
v AS (SELECT qid, var_pop(score) AS vp FROM ranked
      WHERE rank <= {k} GROUP BY 1),
qppq AS (SELECT v.qid, round(v.vp * q.avg_idf_nqc, 6) AS nqc,
                round(q.avgidf, 6) AS avgidf, round(q.maxidf, 6) AS maxidf
         FROM v JOIN qidf q ON q.qid = v.qid),
est AS (SELECT qid, 'nqc' AS method, nqc AS val FROM qppq
        UNION ALL SELECT qid, 'avgidf', avgidf FROM qppq
        UNION ALL SELECT qid, 'maxidf', maxidf FROM qppq),
merged AS (SELECT e.method, e.qid, ev.ap, e.val,
                  row_number() OVER (PARTITION BY e.method
                                     ORDER BY e.qid) AS pos
           FROM est e JOIN evalq ev ON ev.qid = e.qid),
n1 AS (SELECT method, count(*)::DOUBLE AS n FROM merged GROUP BY 1),
pear AS (SELECT method, corr(ap, val) AS pv FROM merged GROUP BY 1),
prs AS (SELECT a.method,
               sum(CASE WHEN sign(a.ap - b.ap) * sign(a.val - b.val) > 0
                        THEN 1 ELSE 0 END)::DOUBLE AS conc,
               sum(CASE WHEN sign(a.ap - b.ap) * sign(a.val - b.val) < 0
                        THEN 1 ELSE 0 END)::DOUBLE AS disc,
               sum(CASE WHEN a.ap = b.ap AND a.val <> b.val
                        THEN 1 ELSE 0 END)::DOUBLE AS ta,
               sum(CASE WHEN a.val = b.val AND a.ap <> b.ap
                        THEN 1 ELSE 0 END)::DOUBLE AS tb
        FROM merged a JOIN merged b
          ON a.method = b.method AND a.pos < b.pos
        GROUP BY 1),
kend AS (SELECT method,
                (conc - disc) / sqrt((conc + disc + ta) * (conc + disc + tb))
                  AS kv
         FROM prs),
ga AS (SELECT method, pos,
              row_number() OVER (PARTITION BY method ORDER BY ap, pos) AS r
       FROM merged),
gp AS (SELECT method, pos,
              row_number() OVER (PARTITION BY method ORDER BY val, pos) AS r
       FROM merged),
sare AS (SELECT ga.method, avg(abs(ga.pos - gp.pos) / n1.n) AS sv
         FROM ga JOIN gp ON gp.method = ga.method AND gp.r = ga.r
         JOIN n1 ON n1.method = ga.method
         GROUP BY 1)
SELECT method, 'pearson' AS corr_metric, round(pv, 6) AS value FROM pear
UNION ALL SELECT method, 'kendall', round(kv, 6) FROM kend
UNION ALL SELECT method, 'sare', round(sv, 6) FROM sare"""


def _variant_qpp_sql(k1: float, b: float, k: int = 50,
                     lam: float = 0.5) -> str:
    """variant_qpp_estimates oracle: BM25 re-run per VARIANT (the gate's
    leave-one-term-out table embedded as VALUES), NQC on each variant's own
    min-max-normalized top-``k``, refSim-weighted combine with the base
    query's NQC (VariantSpecificity.java:63-115 arithmetic, zero/empty
    fallbacks included)."""
    vv_rows, vr_rows = [], []
    for qid, vrank, vtext, ref_sim in _gate_variants():
        # ::DOUBLE — bare 0.9 parses as DECIMAL, making sum(ref_sim) exact
        # (1.7) where the engine's float sum gives 1.7000000000000002; the
        # combine then straddles a 6dp rounding boundary differently.
        vr_rows.append(f"('{qid}', {vrank}, {ref_sim}::DOUBLE)")
        for term, qtf in sorted(Counter(vtext.split()).items()):
            vv_rows.append(f"('{qid}', {vrank}, '{term}', {qtf})")
    vv = "vv(qid, vrank, term, qtf) AS (VALUES " + ", ".join(vv_rows) + ")"
    vref = ("vref(qid, vrank, ref_sim) AS (VALUES "
            + ", ".join(vr_rows) + ")")
    return _ranked_cte(k1, b) + f""",
{vv},
{vref},
vmatched AS (
  SELECT vv.qid, vv.vrank, tf.doc_id,
         sum(vv.qtf * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)))
           AS raw
  FROM vv
  JOIN tf ON tf.term = vv.term
  JOIN df ON df.term = vv.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2, 3),
vkeep AS (SELECT * FROM (
    SELECT qid, vrank, doc_id, round(raw, 6) AS score,
           row_number() OVER (PARTITION BY qid, vrank
                              ORDER BY round(raw, 6) DESC, doc_id) AS rank
    FROM vmatched) WHERE rank <= {k}),
vmm AS (SELECT qid, vrank, min(score) AS lo, max(score) AS hi
        FROM vkeep GROUP BY 1, 2),
vnorm AS (SELECT kk.qid, kk.vrank, kk.rank,
                 CASE WHEN m.hi = m.lo THEN 0.0
                      ELSE (kk.score - m.lo) / (m.hi - m.lo) END AS ns
          FROM vkeep kk
          JOIN vmm m ON m.qid = kk.qid AND m.vrank = kk.vrank),
vvar AS (SELECT qid, vrank, var_pop(ns) AS vp FROM vnorm
         WHERE rank <= {k} GROUP BY 1, 2),
vidf AS (SELECT vq.qid, vq.vrank, avg(ln(s.n / coalesce(df.df, 1))) AS ai
         FROM (SELECT DISTINCT qid, vrank, term FROM vv) vq
         LEFT JOIN df ON df.term = vq.term CROSS JOIN stats s
         GROUP BY 1, 2),
vest AS (SELECT v.qid, v.vrank, round(v.vp * i.ai, 6) AS est
         FROM vvar v JOIN vidf i ON i.qid = v.qid AND i.vrank = v.vrank),
bmm AS (SELECT qid, min(score) AS lo, max(score) AS hi
        FROM ranked GROUP BY 1),
bnorm AS (SELECT r.qid, r.rank,
                 CASE WHEN m.hi = m.lo THEN 0.0
                      ELSE (r.score - m.lo) / (m.hi - m.lo) END AS ns
          FROM ranked r JOIN bmm m ON m.qid = r.qid),
bvar AS (SELECT qid, var_pop(ns) AS vp FROM bnorm
         WHERE rank <= {k} GROUP BY 1),
qterms AS (SELECT DISTINCT qid, term FROM qv),
qidf3 AS (SELECT qt.qid, avg(ln(s.n / coalesce(df.df, 1))) AS ai
          FROM qterms qt LEFT JOIN df ON df.term = qt.term
          CROSS JOIN stats s GROUP BY 1),
best AS (SELECT b.qid, round(b.vp * qi.ai, 6) AS est
         FROM bvar b JOIN qidf3 qi ON qi.qid = b.qid),
comb AS (SELECT vr.qid, sum(vr.ref_sim) AS z,
                sum(vr.ref_sim * ve.est) AS sv
         FROM vref vr
         JOIN vest ve ON ve.qid = vr.qid AND ve.vrank = vr.vrank
         GROUP BY 1)
SELECT b.qid, round(CASE WHEN c.z IS NULL OR c.z = 0 THEN b.est
                         ELSE {lam} * (c.sv / c.z) + (1 - {lam}) * b.est END,
                    6) AS est
FROM best b LEFT JOIN comb c ON c.qid = b.qid"""


def _stochastic_qpp_sql(k1: float, b: float, k: int = 50,
                        num_samples: int = 5) -> str:
    """stochastic_qpp_evaluation oracle: replay the deterministic rank-swap
    arithmetic (qpp/stochastic.perm_index — identity at 0, else sorted
    (rel rank × nonrel rank) enumeration with rank 0 always rel-eligible),
    recompute per-(qid, sample) AP and NQC on the perturbed lists, then
    per-sample Kendall tau-b and SARE plus deltas vs the unperturbed run."""
    return _ranked_cte(k1, b) + f""",
pos0 AS (SELECT qid, doc_id, rank - 1 AS pos, score,
                CASE WHEN (doc_id * 7 + CAST(qid AS INT) * 13) % 4 >= 2
                     THEN 1 ELSE 0 END AS isrel
         FROM ranked),
relp AS (SELECT qid, pos,
                row_number() OVER (PARTITION BY qid ORDER BY pos) AS rn
         FROM pos0 WHERE isrel = 1 OR pos = 0),
nonp AS (SELECT qid, pos,
                row_number() OVER (PARTITION BY qid ORDER BY pos) AS rn
         FROM pos0 WHERE isrel = 0),
cnt2 AS (SELECT q.qid, coalesce(r.c, 0) AS nr, coalesce(n.c, 0) AS nn
         FROM (SELECT DISTINCT qid FROM pos0) q
         LEFT JOIN (SELECT qid, count(*) AS c FROM relp GROUP BY 1) r
           ON r.qid = q.qid
         LEFT JOIN (SELECT qid, count(*) AS c FROM nonp GROUP BY 1) n
           ON n.qid = q.qid),
pick AS (SELECT c.qid, sm.s,
                ((CAST(c.qid AS BIGINT) % 2147483647 + 1) * 1315423911
                 + (sm.s + 1) * 2654435761) % 2147483647
                  % (1 + c.nr * c.nn) AS idx,
                c.nn
         FROM cnt2 c
         CROSS JOIN (SELECT unnest(range({num_samples})) AS s) sm),
swp AS (SELECT p.qid, p.s, r.pos AS rpos, n.pos AS npos
        FROM pick p
        JOIN relp r ON r.qid = p.qid AND r.rn = (p.idx - 1) // p.nn + 1
        JOIN nonp n ON n.qid = p.qid AND n.rn = (p.idx - 1) % p.nn + 1
        WHERE p.idx > 0),
pert AS (
  SELECT pk.qid, pk.s, p0.pos + 1 AS rank,
         CASE WHEN p0.pos = sw.rpos THEN pn.doc_id
              WHEN p0.pos = sw.npos THEN pr.doc_id
              ELSE p0.doc_id END AS doc_id,
         CASE WHEN p0.pos = sw.rpos THEN pn.score
              WHEN p0.pos = sw.npos THEN pr.score
              ELSE p0.score END AS score
  FROM pick pk
  JOIN pos0 p0 ON p0.qid = pk.qid
  LEFT JOIN swp sw ON sw.qid = pk.qid AND sw.s = pk.s
  LEFT JOIN pos0 pr ON pr.qid = pk.qid AND pr.pos = sw.rpos
  LEFT JOIN pos0 pn ON pn.qid = pk.qid AND pn.pos = sw.npos),
tot2 AS (SELECT qq.qid,
                sum(CASE WHEN (d.doc_id * 7 + CAST(qq.qid AS INT) * 13) % 4
                         >= 2 THEN 1 ELSE 0 END)::DOUBLE AS total_rel
         FROM (SELECT DISTINCT qid FROM ranked) qq
         CROSS JOIN documents d GROUP BY 1),
phits AS (SELECT qid, s, rank,
                 row_number() OVER (PARTITION BY qid, s ORDER BY rank)
                   AS nrel
          FROM pert WHERE (doc_id * 7 + CAST(qid AS INT) * 13) % 4 >= 2),
paps AS (SELECT qid, s, sum(nrel / rank::DOUBLE) AS v
         FROM phits GROUP BY 1, 2),
pevalq AS (SELECT pk.qid, pk.s,
                  round(coalesce(a.v, 0) / t.total_rel, 6) AS ap
           FROM pick pk
           JOIN tot2 t ON t.qid = pk.qid
           LEFT JOIN paps a ON a.qid = pk.qid AND a.s = pk.s),
qterms AS (SELECT DISTINCT qid, term FROM qv),
qidf2 AS (SELECT qt.qid, avg(ln(s.n / coalesce(df.df, 1))) AS avg_idf_nqc
          FROM qterms qt LEFT JOIN df ON df.term = qt.term
          CROSS JOIN stats s GROUP BY 1),
pv2 AS (SELECT qid, s, var_pop(score) AS vp FROM pert
        WHERE rank <= {k} GROUP BY 1, 2),
pest AS (SELECT pv2.qid, pv2.s, round(pv2.vp * q.avg_idf_nqc, 6) AS val
         FROM pv2 JOIN qidf2 q ON q.qid = pv2.qid),
pm AS (SELECT e.s, e.qid, ev.ap, e.val,
              row_number() OVER (PARTITION BY e.s ORDER BY e.qid) AS pos
       FROM pest e JOIN pevalq ev ON ev.qid = e.qid AND ev.s = e.s),
pn1 AS (SELECT s, count(*)::DOUBLE AS n FROM pm GROUP BY 1),
pprs AS (SELECT a.s,
                sum(CASE WHEN sign(a.ap - b.ap) * sign(a.val - b.val) > 0
                         THEN 1 ELSE 0 END)::DOUBLE AS conc,
                sum(CASE WHEN sign(a.ap - b.ap) * sign(a.val - b.val) < 0
                         THEN 1 ELSE 0 END)::DOUBLE AS disc,
                sum(CASE WHEN a.ap = b.ap AND a.val <> b.val
                         THEN 1 ELSE 0 END)::DOUBLE AS ta,
                sum(CASE WHEN a.val = b.val AND a.ap <> b.ap
                         THEN 1 ELSE 0 END)::DOUBLE AS tb
         FROM pm a JOIN pm b ON a.s = b.s AND a.pos < b.pos
         GROUP BY 1),
pkend AS (SELECT s, (conc - disc)
                 / sqrt((conc + disc + ta) * (conc + disc + tb)) AS kv
          FROM pprs),
pga AS (SELECT s, pos,
               row_number() OVER (PARTITION BY s ORDER BY ap, pos) AS r
        FROM pm),
pgp AS (SELECT s, pos,
               row_number() OVER (PARTITION BY s ORDER BY val, pos) AS r
        FROM pm),
psare AS (SELECT ga.s, avg(abs(ga.pos - gp.pos) / n1.n) AS sv
          FROM pga ga JOIN pgp gp ON gp.s = ga.s AND gp.r = ga.r
          JOIN pn1 n1 ON n1.s = ga.s
          GROUP BY 1),
bhits AS (SELECT qid, rank,
                 row_number() OVER (PARTITION BY qid ORDER BY rank) AS nrel
          FROM ranked
          WHERE (doc_id * 7 + CAST(qid AS INT) * 13) % 4 >= 2),
baps AS (SELECT qid, sum(nrel / rank::DOUBLE) AS v FROM bhits GROUP BY 1),
bevalq AS (SELECT t.qid, round(coalesce(a.v, 0) / t.total_rel, 6) AS ap
           FROM tot2 t LEFT JOIN baps a ON a.qid = t.qid),
bv2 AS (SELECT qid, var_pop(score) AS vp FROM ranked
        WHERE rank <= {k} GROUP BY 1),
bm2 AS (SELECT e.qid, ev.ap, round(e.vp * q.avg_idf_nqc, 6) AS val,
               row_number() OVER (ORDER BY e.qid) AS pos
        FROM bv2 e JOIN qidf2 q ON q.qid = e.qid
        JOIN bevalq ev ON ev.qid = e.qid),
bn1 AS (SELECT count(*)::DOUBLE AS n FROM bm2),
bprs AS (SELECT
             sum(CASE WHEN sign(a.ap - b.ap) * sign(a.val - b.val) > 0
                      THEN 1 ELSE 0 END)::DOUBLE AS conc,
             sum(CASE WHEN sign(a.ap - b.ap) * sign(a.val - b.val) < 0
                      THEN 1 ELSE 0 END)::DOUBLE AS disc,
             sum(CASE WHEN a.ap = b.ap AND a.val <> b.val
                      THEN 1 ELSE 0 END)::DOUBLE AS ta,
             sum(CASE WHEN a.val = b.val AND a.ap <> b.ap
                      THEN 1 ELSE 0 END)::DOUBLE AS tb
         FROM bm2 a JOIN bm2 b ON a.pos < b.pos),
bkend AS (SELECT round((conc - disc)
                 / sqrt((conc + disc + ta) * (conc + disc + tb)), 6) AS kv
          FROM bprs),
bga AS (SELECT pos, row_number() OVER (ORDER BY ap, pos) AS r FROM bm2),
bgp AS (SELECT pos, row_number() OVER (ORDER BY val, pos) AS r FROM bm2),
bsare AS (SELECT round(avg(abs(ga.pos - gp.pos) / n1.n), 6) AS sv
          FROM bga ga JOIN bgp gp ON gp.r = ga.r CROSS JOIN bn1 n1)
SELECT k.s::BIGINT AS sample, 'nqc' AS method, 'kendall' AS corr_metric,
       round(k.kv, 6) AS value, round(round(k.kv, 6) - bk.kv, 6) AS delta
FROM pkend k CROSS JOIN bkend bk
UNION ALL
SELECT s.s::BIGINT, 'nqc', 'sare',
       round(s.sv, 6), round(round(s.sv, 6) - bs.sv, 6)
FROM psare s CROSS JOIN bsare bs"""


def _ann_lsh_sql(nbits: int = 6, seed: int = 5, dim: int = 64,
                 k: int = 10) -> str:
    """Independent DuckDB recomputation of lsh_knn: identical seeded
    hyperplanes embedded as literals; bucket = sign bits of raw dot products
    (normalization-invariant, matches the engine's raw-dot bit path); each
    query ranks only its own bucket's vectors by rounded cosine."""
    from lucene_msmarco_ray.ops.ann import lsh_planes
    planes = lsh_planes(nbits, dim, seed)
    vals = ", ".join(
        f"({b}, [{', '.join(repr(float(x)) for x in planes[b])}]::DOUBLE[])"
        for b in range(nbits))
    return f"""WITH p(b, vec) AS (VALUES {vals}),
bk AS (SELECT e.vec_id,
              sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.vec) > 0
                       THEN (1::BIGINT << p.b) ELSE 0 END)::BIGINT AS bucket
       FROM embeddings e CROSS JOIN p GROUP BY e.vec_id),
q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
      FROM embeddings WHERE vec_id IN (0, 1, 2)),
sims AS (SELECT q.q_id, e.vec_id,
                round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6)
                  AS sim
         FROM q
         JOIN bk bq ON bq.vec_id = q.q_id
         JOIN bk bv ON bv.bucket = bq.bucket
         JOIN embeddings e ON e.vec_id = bv.vec_id),
ranked AS (SELECT q_id, vec_id, sim,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY sim DESC, vec_id) AS rank
           FROM sims)
SELECT q_id, vec_id, rank::BIGINT AS rank, sim FROM ranked
WHERE rank <= {k}"""


def _ann_ivf_sql(n_clusters: int = 8, n_probe: int = 2, k: int = 10,
                 dim: int = 64, n_iters: int = 2) -> str:
    """Independent DuckDB recomputation of ivf_knn: the deterministic Lloyd
    iterations are UNROLLED as CTE pairs (assignment → element-wise centroid
    means), with the engine's exact conventions — init = vectors of the
    n_clusters smallest ids, squared distances and centroids rounded at 9dp,
    smaller-cluster-id tie-breaks, empty clusters keep their centroid."""
    iters = []
    prev = "c0"
    for it in range(n_iters):
        a, c, cf = f"a{it}", f"c{it + 1}", f"c{it + 1}f"
        iters.append(f"""d{it} AS (
  SELECT ev.vec_id, c.cluster, round(sum(pow(ev.x - c.cx, 2)), 9) AS d2
  FROM ev JOIN {prev} c ON c.i = ev.i GROUP BY 1, 2),
{a} AS (SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
    FROM d{it}) WHERE rn = 1),
{c} AS (SELECT {a}.cluster, ev.i, round(avg(ev.x), 9) AS cx
  FROM {a} JOIN ev ON ev.vec_id = {a}.vec_id GROUP BY 1, 2),
{cf} AS (SELECT p.cluster, p.i, coalesce(n.cx, p.cx) AS cx
  FROM {prev} p LEFT JOIN {c} n ON n.cluster = p.cluster AND n.i = p.i)""")
        prev = cf
    iters_sql = ",\n".join(iters)
    return f"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
           FROM embeddings),
dims AS (SELECT unnest(range({dim})) AS i),
ev AS (SELECT e.vec_id, d.i, e.v[d.i + 1] AS x FROM e CROSS JOIN dims d),
c0 AS (SELECT vec_id AS cluster, i, round(x, 9) AS cx
       FROM ev WHERE vec_id < {n_clusters}),
{iters_sql},
fd AS (SELECT ev.vec_id, c.cluster, round(sum(pow(ev.x - c.cx, 2)), 9) AS d2
       FROM ev JOIN {prev} c ON c.i = ev.i GROUP BY 1, 2),
af AS (SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
    FROM fd) WHERE rn = 1),
probe AS (SELECT vec_id AS q_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
    FROM fd WHERE vec_id IN (0, 1, 2)) WHERE rn <= {n_probe}),
sims AS (SELECT q.vec_id AS q_id, e2.vec_id,
                round(list_cosine_similarity(q.v, e2.v), 6) AS sim
         FROM e q
         JOIN probe p ON p.q_id = q.vec_id
         JOIN af ON af.cluster = p.cluster
         JOIN e e2 ON e2.vec_id = af.vec_id
         WHERE q.vec_id IN (0, 1, 2)),
ranked AS (SELECT q_id, vec_id, sim,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY sim DESC, vec_id) AS rank
           FROM sims)
SELECT q_id, vec_id, rank::BIGINT AS rank, sim FROM ranked
WHERE rank <= {k}"""


def _qpp_sql(k1: float, b: float, k: int = 50) -> str:
    """NQC / cumulative-NQC / avgIDF / maxIDF per gate query. idf = ln(N/df)
    with the reference's two df=0 conventions (see qpp/methods.py)."""
    bm = _bm25_sql(k1, b)
    ranked_cte = bm[: bm.rindex(")\nSELECT")] + ")"
    return ranked_cte + f""",
qterms AS (SELECT DISTINCT qid, term FROM qv),
idfv AS (
  SELECT qt.qid,
         ln(s.n / coalesce(df.df, 1)) AS idf_nqc,          -- df=0 → 1
         CASE WHEN df.df IS NOT NULL THEN ln(s.n / df.df) END AS idf_real
  FROM qterms qt LEFT JOIN df ON df.term = qt.term CROSS JOIN stats s),
qidf AS (
  SELECT qid, avg(idf_nqc) AS avg_idf_nqc,
         coalesce(max(idf_real), 0) AS maxidf,
         coalesce(sum(idf_real), 0) / count(*) AS avgidf
  FROM idfv GROUP BY 1),
topk AS (SELECT qid, rank, score FROM ranked WHERE rank <= {k}),
cnt AS (SELECT qid, count(*) AS c FROM ranked GROUP BY 1),
v AS (SELECT qid, var_pop(score) AS vp FROM topk GROUP BY 1),
grid AS (SELECT cnt.qid, unnest(generate_series(1, least({k}, cnt.c) - 1)) AS i,
                least({k}, cnt.c) AS kk
         FROM cnt),
cum AS (
  SELECT g.qid, g.kk, g.i, var_pop(t.score) AS vi
  FROM grid g JOIN topk t ON t.qid = g.qid AND t.rank <= g.i
  GROUP BY 1, 2, 3)
SELECT v.qid,
  round(v.vp * q.avg_idf_nqc, 6) AS nqc,
  round(coalesce(c.s, 0) * q.avg_idf_nqc / c.kk, 6) AS cumnqc,
  round(q.avgidf, 6) AS avgidf,
  round(q.maxidf, 6) AS maxidf
FROM v
JOIN qidf q ON q.qid = v.qid
JOIN (SELECT qid, kk, sum(vi) AS s FROM cum GROUP BY 1, 2) c ON c.qid = v.qid"""


# ---------------------------------------------------------------------------
# queries()
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship: index build + BM25 top-k retrieval on sf0.001."""
    return _rounded_run("/root/testdata/sf0.001", "bm25", k=100, k1=0.7, b=0.3)


def queries() -> dict[str, Callable[[str], Any]]:
    import pyarrow as pa
    import pyarrow.dataset as pads

    def _read16(sf_dir: str, table: str, columns):
        # Right-sized read (≥32MB file bytes per block) with a floor of 16
        # blocks so CPU-heavy map stages keep parallelism on small gate
        # inputs while shuffles stop paying 128-empty-block scheduling
        # overhead (measured: minhash 6.3→1.4s, simhash 3.5→1.6s at sf0.1).
        from lucene_msmarco_ray.sources.pq import read_parquet_sized
        return read_parquet_sized(os.path.join(sf_dir, table),
                                  columns=columns, min_blocks=16)

    def term_stats(sf_dir: str):
        # read back from the engine's own segment files — exercises the full
        # build path (tokenize → shuffle → encode → parquet). A term's salt
        # runs are separate rows (read-time concat design), so aggregate.
        idx = _ensure_index(sf_dir)
        t = pads.dataset(os.path.join(idx, "segments")).to_table(
            columns=["term", "df", "cf"]) \
            .group_by("term").aggregate([("df", "sum"), ("cf", "sum")])
        return t.rename_columns(["term", "df", "cf"]).sort_by("term")

    def index_append(sf_dir: str):
        """Incremental build+append (half the corpus each) read back as
        per-term df/cf — must equal the SAME full-corpus term-stats
        oracle as a one-shot build (the old segments were never
        rewritten; appended salt runs aggregate like any other runs)."""
        idx = _ensure_appended_index(sf_dir)
        t = pads.dataset(os.path.join(idx, "segments")).to_table(
            columns=["term", "df", "cf"]) \
            .group_by("term").aggregate([("df", "sum"), ("cf", "sum")])
        return t.rename_columns(["term", "df", "cf"]).sort_by("term")

    def index_compact(sf_dir: str):
        """Build + append + COMPACT (index/compact.py zero-decode
        concatenating merge) read back as per-term df/cf — must still
        equal the full-corpus term-stats oracle, proving the fold
        changed layout, not content."""
        idx = _ensure_compacted_index(sf_dir)
        t = pads.dataset(os.path.join(idx, "segments")).to_table(
            columns=["term", "df", "cf"]) \
            .group_by("term").aggregate([("df", "sum"), ("cf", "sum")])
        return t.rename_columns(["term", "df", "cf"]).sort_by("term")

    def doc_stats(sf_dir: str):
        idx = _ensure_index(sf_dir)
        base = os.path.join(idx, "staged")
        dirs = [os.path.join(base, p, "kind=m") for p in sorted(os.listdir(base))
                if p.startswith("part=")]
        from lucene_msmarco_ray.index.build import pads_dirs
        t = pads_dirs(dirs).to_table(columns=["doc_id", "dl"])
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "doc_len": t["dl"].cast(pa.int64())})

    def bm25_topk(sf_dir: str):
        return _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)

    def bm25_topk_sharded(sf_dir: str):
        """Doc-partitioned sharded retrieval over a 4-shard salted index —
        must equal the single-reader BM25 oracle exactly."""
        import pandas as pd

        from lucene_msmarco_ray.search.sharded import retrieve_sharded
        idx = _ensure_salted_index(sf_dir)
        run = retrieve_sharded(_queries_ds(), idx, scorer="bm25", k=_K,
                               k1=0.7, b=0.3, concurrency=(1, 2),
                               actor_num_cpus=0.5)

        def rr(g: pd.DataFrame) -> pd.DataFrame:
            g = g.copy()
            g["score"] = g["score"].round(6)
            g = g.sort_values(["score", "doc_id"], ascending=[False, True],
                              kind="mergesort").head(_K)
            g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
            return g[["qid", "doc_id", "rank", "score"]]

        rr.__name__ = "rerank_rounded"
        return run.groupby("qid").map_groups(rr, batch_format="pandas")

    def bm25_topk_ref_params(sf_dir: str):
        return _rounded_run(sf_dir, "bm25", k1=1.2, b=0.75)

    def lmdir_topk(sf_dir: str):
        return _rounded_run(sf_dir, "lmdir", mu=1000.0)

    def minmax_norm(sf_dir: str):
        import pandas as pd
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)

        def mm(g: pd.DataFrame) -> pd.DataFrame:
            lo, hi = g["score"].min(), g["score"].max()
            g = g.copy()
            g["norm_score"] = (0.0 if hi == lo
                               else (g["score"] - lo) / (hi - lo))
            if hi == lo:
                g["norm_score"] = 0.0
            g["norm_score"] = g["norm_score"].round(6)
            return g[["qid", "doc_id", "norm_score"]]

        mm.__name__ = "minmax"
        return run.groupby("qid").map_groups(mm, batch_format="pandas")

    def dedup_exact(sf_dir: str):
        from lucene_msmarco_ray.ops.dedup import exact_dedup
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return exact_dedup(ds)

    def tok_count(sf_dir: str):
        from lucene_msmarco_ray.ops.textstats import token_count
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return token_count(ds)

    def quality(sf_dir: str):
        from lucene_msmarco_ray.ops.textstats import quality_score
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return quality_score(ds)

    def pmi_colloc(sf_dir: str):
        """PMI collocations over adjacent token pairs — single-pass
        partial counts (unigrams ride the same exchange as y='' rows),
        vocabulary-sized unigram broadcast."""
        from lucene_msmarco_ray.ops.textstats import pmi_collocations
        ds = _read16(sf_dir, "documents.parquet", ["text"])
        return pmi_collocations(ds, min_count=5)

    def lm_perplexity_gate(sf_dir: str):
        """Unigram-LM self-perplexity per document: one groupby trains
        the LM (vocabulary-sized reduce), fixed-point micro-nat log-probs
        make per-doc sums exact integers, actor-pool scoring pass."""
        from lucene_msmarco_ray.ops.textstats import unigram_lm_perplexity
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return unigram_lm_perplexity(ds, concurrency=2)

    def lm_perplexity_join_gate(sf_dir: str):
        """The SAME unigram-LM scores through the huge-vocab bucketed-
        join path (ops/vocab_join.py): max_broadcast_vocab=1 forces the
        detect-and-switch every real corpus would hit only past 4M vocab
        rows, so the driver adjudicates the fallback's bit-identity
        against the IDENTICAL oracle as `lm_perplexity`."""
        from lucene_msmarco_ray.ops.textstats import unigram_lm_perplexity
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return unigram_lm_perplexity(ds, concurrency=2,
                                     max_broadcast_vocab=1)

    def bigram_lm_join_gate(sf_dir: str):
        """The SAME interpolated bigram-LM scores through the FULLY
        distributed two-level path: max_broadcast_vocab=0 keeps bigram
        AND unigram vocab as Datasets, resolving per-pair c(w1)/c(w2)
        via two vocab_join.lookup_micro exchanges — adjudicated against
        the IDENTICAL oracle as `bigram_lm`."""
        from lucene_msmarco_ray.ops.textstats import bigram_lm_perplexity
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return bigram_lm_perplexity(ds, lam=0.9, concurrency=2,
                                    max_broadcast_vocab=0)

    def tfidf_keywords_join_gate(sf_dir: str):
        """tfidf_keywords through the forced bucketed-join path — same
        oracle as `tfidf_keywords`, adjudicating the fallback's
        bit-identity (idf resolve via vocab_join.resolve_micro + the
        per-doc top-k via topk_per_group instead of batch-local)."""
        from lucene_msmarco_ray.ops.textstats import tfidf_keywords
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return tfidf_keywords(ds, k=5, max_broadcast_vocab=1)

    def repetition_stats_gate(sf_dir: str):
        """Gopher-style repetition filters: per-doc top-bigram and
        duplicated-trigram occupancy, vectorized 62-bit gram hashing —
        the oracle counts the gram STRINGS independently."""
        from lucene_msmarco_ray.ops.textstats import repetition_stats
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return repetition_stats(ds)

    def neardup_filter_gate(sf_dir: str):
        """End-to-end near-dedup: minhash pairs → components → drop every
        non-keeper (doc_id != component) from the corpus via the anti
        semi-join. The full dedup flow a training pipeline actually
        runs."""
        from lucene_msmarco_ray.ops.dedup import (connected_components,
                                                  minhash_lsh_candidates)
        from lucene_msmarco_ray.ops.join import bucketed_semi_join
        docs_t = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        comp = connected_components(minhash_lsh_candidates(docs_t))

        def nonkeepers(batch):
            import numpy as np
            d = batch["doc_id"].to_numpy(zero_copy_only=False)
            c = batch["component"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(d != c)).select(["doc_id"])

        losers = comp.map_batches(nonkeepers, batch_format="pyarrow")
        corpus = _read16(sf_dir, "documents.parquet", ["doc_id", "n_chars"])
        sch = pa.schema([pa.field("doc_id", pa.int64()),
                         pa.field("n_chars", pa.int64())])
        return bucketed_semi_join(corpus, losers, key="doc_id",
                                  how="anti", left_schema=sch)

    def group_zscore_gate(sf_dir: str):
        """Per-language z-score of document length — exact int64
        fixed-point moments folded once, broadcast, stateless apply."""
        from lucene_msmarco_ray.ops.relational import group_zscore
        ds = _read16(sf_dir, "documents.parquet",
                     ["doc_id", "lang", "n_chars"])
        return group_zscore(ds, ["lang"], "n_chars")

    def scorer_fusion_gate(sf_dir: str):
        """RRF fusion of the BM25 and LM-Dirichlet runs over the gate
        index — fusion on REAL retrieval output; both member runs are
        themselves oracle-checked gates."""
        from lucene_msmarco_ray.ops.relational import rrf_fuse
        a = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3) \
            .select_columns(["qid", "doc_id", "rank"])
        b = _rounded_run(sf_dir, "lmdir", mu=1000.0) \
            .select_columns(["qid", "doc_id", "rank"])
        return rrf_fuse([a, b], k_rrf=60, group_col="qid",
                        item_col="doc_id", topk=20)

    def importance_resample_gate(sf_dir: str):
        """DSIR selection: Gumbel top-100 over the importance weights —
        deterministic hash-uniform Gumbel keys, per-block top-n
        candidates into one bounded reduce."""
        from lucene_msmarco_ray.ops.textstats import (importance_resample,
                                                      importance_weights)
        docs = _read16(sf_dir, "documents.parquet",
                       ["doc_id", "text", "lang"])
        target = docs.filter(expr="lang == 'en'")
        w = importance_weights(docs, target, concurrency=2) \
            .select_columns(["doc_id", "logw_micro"])
        return importance_resample(w, n=100)

    def dedup_components_gate(sf_dir: str):
        """MinHash candidate pairs folded into canonical dedup groups —
        union-find over the (small-by-construction) pair reduction;
        oracle = recursive-CTE min-label closure over the SAME pair SQL."""
        from lucene_msmarco_ray.ops.dedup import (connected_components,
                                                  minhash_lsh_candidates)
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return connected_components(minhash_lsh_candidates(ds))

    def dedup_components_dist_gate(sf_dir: str):
        """Distributed min-label propagation (no driver graph state) over
        the same minhash pairs — must equal the SAME recursive-CTE
        oracle as the union-find gate."""
        from lucene_msmarco_ray.ops.dedup import (
            connected_components_distributed, minhash_lsh_candidates)
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return connected_components_distributed(minhash_lsh_candidates(ds))

    def importance_weights_gate(sf_dir: str):
        """DSIR-style importance weights: target LM = lang='en' docs,
        source LM = all docs; exact int64 micro-nat log-ratios summed
        per doc, one broadcast of the folded ratio table."""
        from lucene_msmarco_ray.ops.textstats import importance_weights
        docs = _read16(sf_dir, "documents.parquet",
                       ["doc_id", "text", "lang"])
        target = docs.filter(expr="lang == 'en'")
        return importance_weights(docs, target, concurrency=2)

    def decontaminate_gate(sf_dir: str):
        """Benchmark decontamination: flag docs sharing any 5-gram with
        the benchmark subset (doc_id % 100 == 0) — benchmark grams reduce
        to one broadcast; the corpus pass is shuffle-free. The oracle
        joins the gram STRINGS."""
        from lucene_msmarco_ray.ops.dedup import flag_contaminated
        docs = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])

        def every_100th(batch):
            import numpy as np
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(ids % 100 == 0))

        bench = _read16(sf_dir, "documents.parquet", ["doc_id", "text"]) \
            .map_batches(every_100th, batch_format="pyarrow")
        return flag_contaminated(docs, bench, n=5)

    def quantize_embeddings_gate(sf_dir: str):
        """Per-dim affine int8 quantization — bit-exact integer codes
        (clamp/floor over IEEE double ops on identical inputs), oracle
        replays the grid from the same min/max."""
        from lucene_msmarco_ray.ops.ann import quantize_embeddings
        ds = _read16(sf_dir, "embeddings.parquet", ["vec_id", "embedding"])
        return quantize_embeddings(ds)

    def group_centroids_gate(sf_dir: str):
        """Per-label embedding centroids (long format) — batch-local
        partial sums in exact int64 micro-units, one (label, dim)-sized
        exchange; oracle replays via embedding[i] + generate_series."""
        from lucene_msmarco_ray.ops.ann import group_centroids
        ds = _read16(sf_dir, "embeddings.parquet", ["label", "embedding"])
        return group_centroids(ds)

    def quantile_filter_gate(sf_dir: str):
        """Composite: docs longer than their language's p90 n_chars —
        group_quantile thresholds (tiny, one row per lang) broadcast into
        a stateless filter pass; oracle = quantile_disc window."""
        import ray

        from lucene_msmarco_ray.ops.relational import group_quantile
        docs = _read16(sf_dir, "documents.parquet",
                       ["doc_id", "lang", "n_chars"])
        thr = group_quantile(docs, ["lang"], "n_chars", [0.9], ["p90"]) \
            .to_pandas()
        tref = ray.put(dict(zip(thr["lang"], thr["p90"])))

        def keep(batch):
            import numpy as np
            import pyarrow as pa
            tm = ray.get(tref)
            lang = batch["lang"].to_pylist()
            cut = np.array([tm[v] for v in lang], np.float64)
            n = batch["n_chars"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(n > cut))

        return docs.map_batches(keep, batch_format="pyarrow")

    def group_mad_gate(sf_dir: str):
        """Per-language median absolute deviation — two group_quantile
        passes (median → broadcast → |x−med| → median) with
        quantile_disc semantics; robust spread for outlier filters."""
        import ray

        from lucene_msmarco_ray.ops.relational import group_quantile
        docs = _read16(sf_dir, "documents.parquet", ["lang", "n_chars"])
        med = group_quantile(docs, ["lang"], "n_chars", [0.5], ["med"]) \
            .to_pandas()
        mref = ray.put(dict(zip(med["lang"], med["med"])))

        def absdev(batch):
            import numpy as np
            mm = ray.get(mref)
            lang = batch["lang"].to_pylist()
            m = np.array([mm[v] for v in lang], np.float64)
            v = batch["n_chars"].to_numpy(zero_copy_only=False)
            return pa.table({"lang": batch["lang"],
                             "ad": pa.array(np.abs(v - m))})

        mad = group_quantile(
            docs.map_batches(absdev, batch_format="pyarrow"),
            ["lang"], "ad", [0.5], ["mad"]).to_pandas()
        out = med.merge(mad, on="lang").sort_values("lang") \
            .reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    def chunk_boundaries_gate(sf_dir: str):
        """Fixed-size within-doc chunking — boundary rows only (zero-copy
        stage); oracle unnests a per-doc chunk-ordinal series."""
        from lucene_msmarco_ray.ops.textstats import chunk_boundaries
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return chunk_boundaries(ds, chunk_tokens=64)

    def bigram_lm_gate(sf_dir: str):
        """Interpolated bigram-LM self-perplexity (λ=0.9) — exact int64
        micro-nat pair scores, one broadcast of the bigram-vocab ratio
        table."""
        from lucene_msmarco_ray.ops.textstats import bigram_lm_perplexity
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return bigram_lm_perplexity(ds, lam=0.9, concurrency=2)

    def heavy_hitters_gate(sf_dir: str):
        """Exact terms above total/k via mergeable Misra-Gries pruning
        (k=30): the sketch only prunes candidates, the final integer
        filter is exact — oracle = plain HAVING cf*k > total."""
        from lucene_msmarco_ray.ops.textstats import heavy_hitters
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return heavy_hitters(ds, k=30)

    def normalize_text_gate(sf_dir: str):
        """Curation normalization (lowercase + whitespace collapse + trim)
        — three Arrow RE2 kernels vs the oracle's lower/regexp_replace/
        trim."""
        from lucene_msmarco_ray.ops.textstats import normalize_text
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return normalize_text(ds)

    def _projected_schema(sf_dir: str, table: str, cols: list):
        import pyarrow.parquet as pq
        sch = pq.read_schema(os.path.join(sf_dir, table))
        return pa.schema([sch.field(c) for c in cols])

    def semi_join_gate(sf_dir: str):
        """Lineitems of URGENT orders via the bucketed semi join — the
        right side ships only its (deduped) key column; oracle = WHERE
        EXISTS."""
        from lucene_msmarco_ray.ops.join import bucketed_semi_join
        lcols = ["l_orderkey", "l_linenumber", "l_extendedprice"]
        left = _read16(sf_dir, "lineitem.parquet", lcols)
        right = _read16(sf_dir, "orders.parquet",
                        ["o_orderkey", "o_orderpriority"]) \
            .filter(expr="o_orderpriority == '1-URGENT'")
        return bucketed_semi_join(
            left, right, key="l_orderkey", right_key="o_orderkey",
            how="semi",
            left_schema=_projected_schema(sf_dir, "lineitem.parquet", lcols))

    def anti_join_gate(sf_dir: str):
        """Lineitems of non-URGENT orders (NOT EXISTS) — same exchange,
        inverted membership."""
        from lucene_msmarco_ray.ops.join import bucketed_semi_join
        lcols = ["l_orderkey", "l_linenumber", "l_extendedprice"]
        left = _read16(sf_dir, "lineitem.parquet", lcols)
        right = _read16(sf_dir, "orders.parquet",
                        ["o_orderkey", "o_orderpriority"]) \
            .filter(expr="o_orderpriority == '1-URGENT'")
        return bucketed_semi_join(
            left, right, key="l_orderkey", right_key="o_orderkey",
            how="anti",
            left_schema=_projected_schema(sf_dir, "lineitem.parquet", lcols))

    def rrf_fuse_gate(sf_dir: str):
        """Reciprocal-rank fusion of two per-language document rankings
        (longest-docs and smallest-ids, both built with the partial-top-k
        combiner); contributions are exact int64 floor divisions so the
        fused scores are bit-stable and the oracle replays them with
        SQL // arithmetic."""
        from lucene_msmarco_ray.ops.relational import (rrf_fuse,
                                                       topk_per_group)
        docs = _read16(sf_dir, "documents.parquet",
                       ["doc_id", "lang", "n_chars"])
        run_a = topk_per_group(docs, ["lang"], "n_chars", 50,
                               descending=True, tie_cols=["doc_id"]) \
            .select_columns(["lang", "doc_id", "rank"])
        run_b = topk_per_group(docs, ["lang"], "doc_id", 50,
                               descending=False) \
            .select_columns(["lang", "doc_id", "rank"])
        return rrf_fuse([run_a, run_b], k_rrf=60, group_col="lang",
                        item_col="doc_id", topk=20)

    def funnel_gate(sf_dir: str):
        """Ordered funnel view→click→purchase within 24h — greedy
        earliest-completion per user, one user-hash exchange plus a k-row
        partial-count reduce; oracle = chained min() CTEs."""
        from lucene_msmarco_ray.ops.events import funnel_counts
        from lucene_msmarco_ray.sources.pq import read_parquet_sized
        ds = read_parquet_sized(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"])
        return funnel_counts(ds, ["view", "click", "purchase"],
                             within_seconds=86_400)

    def cohort_retention_gate(sf_dir: str):
        """Weekly cohort retention — batch-local (user, period) dedup,
        one user-hash exchange, (cohort, offset) partial-count reduce;
        oracle = min-period window + distinct counts."""
        from lucene_msmarco_ray.ops.events import cohort_retention
        from lucene_msmarco_ray.sources.pq import read_parquet_sized
        ds = read_parquet_sized(os.path.join(sf_dir, "events.parquet"),
                                columns=["user_id", "ts"])
        return cohort_retention(ds, period_seconds=604_800)

    def cumulative_agg_gate(sf_dir: str):
        """Per-user running (count, value) totals ordered by (ts,
        event_id) — one coarse exchange, segmented fixed-point cumsum;
        oracle = SQL window cumsum over the same int64 hundredths."""
        from lucene_msmarco_ray.ops.events import cumulative_agg
        from lucene_msmarco_ray.sources.pq import read_parquet_sized
        ds = read_parquet_sized(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "value"])
        return cumulative_agg(ds)

    def cumulative_agg_chunked_gate(sf_dir: str):
        """Skew-proof two-level cumulative_agg (per-(user, time-chunk)
        segments + distributed exclusive-prefix offsets) — must equal the
        SAME window-cumsum oracle as the plain op; chunk = 1h on gate data
        so chunks genuinely split and the offset shift is exercised."""
        from lucene_msmarco_ray.ops.events import cumulative_agg_chunked
        from lucene_msmarco_ray.sources.pq import read_parquet_sized
        ds = read_parquet_sized(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "value"])
        return cumulative_agg_chunked(ds, chunk_seconds=3600)

    def langid(sf_dir: str):
        from lucene_msmarco_ray.ops.textstats import lang_id
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return lang_id(ds)

    def fp(sf_dir: str):
        from lucene_msmarco_ray.ops.textstats import fingerprint
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return fingerprint(ds)

    def curate(sf_dir: str):
        from lucene_msmarco_ray.ops.curate import curate_corpus
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return curate_corpus(ds, min_tokens=20, langs=("en", "es"),
                             min_uniq_ratio=0.35, max_stop_ratio=0.25)

    def ngram_jacc(sf_dir: str):
        from lucene_msmarco_ray.ops.dedup import ngram_jaccard_pairs
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return ngram_jaccard_pairs(ds, n=3, threshold=0.8)

    def _emb_queries(sf_dir: str):
        import pyarrow.parquet as pq
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        ids = t["vec_id"].to_numpy()
        sel = np.isin(ids, [0, 1, 2])
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)[sel]
        return ids[sel], mat

    def ann_bruteforce(sf_dir: str):
        from lucene_msmarco_ray.ops.ann import brute_force_knn
        qids, qmat = _emb_queries(sf_dir)
        ds = _read16(sf_dir, "embeddings.parquet", ["vec_id", "embedding"])
        return brute_force_knn(ds, qids, qmat, k=10)

    def ann_lsh(sf_dir: str):
        from lucene_msmarco_ray.ops.ann import lsh_knn
        qids, qmat = _emb_queries(sf_dir)
        ds = _read16(sf_dir, "embeddings.parquet", ["vec_id", "embedding"])
        return lsh_knn(ds, qids, qmat, k=10, nbits=6)

    def ann_ivf(sf_dir: str):
        from lucene_msmarco_ray.ops.ann import ivf_knn
        qids, qmat = _emb_queries(sf_dir)
        ds = _read16(sf_dir, "embeddings.parquet", ["vec_id", "embedding"])
        return ivf_knn(ds, qids, qmat, k=10, n_clusters=8, n_probe=2,
                       n_iters=2)

    def emb_neardup(sf_dir: str):
        from lucene_msmarco_ray.ops.ann import embedding_neardup
        ds = _read16(sf_dir, "embeddings.parquet", ["vec_id", "embedding"])
        return embedding_neardup(ds, threshold=0.45)

    def bucket_join(sf_dir: str):
        from lucene_msmarco_ray.ops.join import bucketed_hash_join
        from lucene_msmarco_ray.ops.textstats import quality_score, token_count
        docs = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        left = token_count(docs)
        right = quality_score(docs).drop_columns(["n_tokens"])
        i64, f64 = pa.int64(), pa.float64()
        return bucketed_hash_join(
            left, right, key="doc_id", num_buckets=16,
            left_schema=pa.schema([("doc_id", i64), ("n_tokens", i64),
                                   ("n_unique", i64)]),
            right_schema=pa.schema([("doc_id", i64), ("stop_ratio", f64),
                                    ("mean_token_len", f64),
                                    ("uniq_ratio", f64)]))

    def minhash_pairs(sf_dir: str):
        from lucene_msmarco_ray.ops.dedup import minhash_lsh_candidates
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return minhash_lsh_candidates(ds)

    def simhash(sf_dir: str):
        from lucene_msmarco_ray.ops.dedup import simhash_pairs
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return simhash_pairs(ds)

    def eval_metrics(sf_dir: str):
        import pandas as pd

        from lucene_msmarco_ray.eval.metrics import per_query_metrics
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        pq = per_query_metrics(run, _gate_qrels(sf_dir), cutoffs=(10,))

        def clean(df: pd.DataFrame) -> pd.DataFrame:
            return df[["qid", "ap", "p5", "p10", "rr", "recall", "ndcg10"]]

        return pq.map_batches(clean, batch_format="pandas")

    def rel_annotate(sf_dir: str):
        import pyarrow as pa

        from lucene_msmarco_ray.eval.metrics import annotate_rel
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        ann = annotate_rel(run, _gate_qrels(sf_dir))

        def clean(batch: pa.Table) -> pa.Table:
            return batch.select(["qid", "doc_id", "rank", "rel"])

        return ann.map_batches(clean, batch_format="pyarrow")

    def _gate_query_map() -> dict[str, str]:
        return dict(GATE_QUERIES)

    def induced(sf_dir: str):
        from lucene_msmarco_ray.pipelines.feedback import induced_rescore
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        idx = _ensure_index(sf_dir)
        return induced_rescore(run, idx, _gate_query_map(), concurrency=(1, 2))

    def lm_docw(sf_dir: str):
        from lucene_msmarco_ray.pipelines.feedback import lm_doc_weights
        return lm_doc_weights(_ensure_index(sf_dir))

    def sparsevec_top(sf_dir: str):
        from lucene_msmarco_ray.pipelines.feedback import sparsevec_topdocs
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        idx = _ensure_index(sf_dir)
        return sparsevec_topdocs(run, idx, k=10, concurrency=(1, 2))

    def bigrams(sf_dir: str):
        import pandas as pd

        from lucene_msmarco_ray.fdbk.srlm import frequent_bigrams
        out = frequent_bigrams([t.split() for _, t in GATE_QUERIES], top_n=100)
        return pd.DataFrame(out, columns=["bigram", "freq"])

    def _gate_rel_docs(sf_dir: str) -> dict[str, list[int]]:
        qrels = _gate_qrels(sf_dir)
        return {q: g[g.rel >= 2]["docid"].astype(int).head(5).tolist()
                for q, g in qrels.groupby("qid")}

    def srlm_rerank(sf_dir: str):
        import ray.data as rd

        from lucene_msmarco_ray.pipelines.feedback import srlm_rerank_pipeline
        idx = _ensure_index(sf_dir)
        rel_docs = _gate_rel_docs(sf_dir)
        rel_pairs = rd.from_items(
            [{"qid": q, "doc_id": d} for q, ds_ in sorted(rel_docs.items())
             for d in ds_],
            override_num_blocks=max(1, len(rel_docs)))
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        return srlm_rerank_pipeline(run, idx, _gate_query_map(), rel_pairs,
                                    top_k=50, prune_to=5, round_to=6,
                                    concurrency=(1, 2))

    def rocchio(sf_dir: str):
        from lucene_msmarco_ray.pipelines.feedback import rocchio_pipeline
        idx = _ensure_index(sf_dir)
        rel_map = _gate_rel_docs(sf_dir)
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        return rocchio_pipeline(run, idx, _gate_query_map(), rel_map,
                                top_k=20, round_to=6, concurrency=(1, 2))

    def sessionize_gate(sf_dir: str):
        from lucene_msmarco_ray.ops.events import sessionize
        from lucene_msmarco_ray.sources.pq import read_parquet_sized
        ds = read_parquet_sized(os.path.join(sf_dir, "events.parquet"),
                                columns=["event_id", "ts", "user_id",
                                         "value"])
        return sessionize(ds, gap_seconds=1800)

    def windowed_agg_gate(sf_dir: str):
        from lucene_msmarco_ray.ops.events import windowed_agg
        from lucene_msmarco_ray.sources.pq import read_parquet_sized
        ds = read_parquet_sized(os.path.join(sf_dir, "events.parquet"),
                                columns=["ts", "event_type", "value"])
        return windowed_agg(ds, window_seconds=3600)

    def sliding_window_gate(sf_dir: str):
        from lucene_msmarco_ray.ops.events import sliding_window_agg
        ds = _read16(sf_dir, "events.parquet",
                     ["event_type", "ts", "value"])
        return sliding_window_agg(ds, window_seconds=3600, hop_seconds=900)

    def topk_per_group_gate(sf_dir: str):
        """Top-3 orders per customer by price (partial-top-k combiner —
        the shuffle only ever moves ≤ k rows per group per block)."""
        from lucene_msmarco_ray.ops.relational import topk_per_group
        ds = _read16(sf_dir, "orders.parquet",
                     ["o_custkey", "o_orderkey", "o_totalprice"])
        return topk_per_group(ds, ["o_custkey"], "o_totalprice", 3,
                              tie_cols=["o_orderkey"])

    def group_distinct_gate(sf_dir: str):
        """COUNT(DISTINCT l_suppkey) per return flag — batch-local dedup
        before the pair exchange, pre-counted partials after it."""
        from lucene_msmarco_ray.ops.relational import group_distinct_count
        ds = _read16(sf_dir, "lineitem.parquet",
                     ["l_returnflag", "l_suppkey"])
        return group_distinct_count(ds, ["l_returnflag"], "l_suppkey")

    def hash_sample_gate(sf_dir: str):
        """Deterministic 10% multiplicative-hash sample of orders —
        shuffle-free, parallelism-invariant, SQL-replayable arithmetic."""
        from lucene_msmarco_ray.ops.relational import hash_sample
        ds = _read16(sf_dir, "orders.parquet",
                     ["o_orderkey", "o_custkey", "o_totalprice"])
        return hash_sample(ds, "o_orderkey", 0.1)

    def stratified_sample_gate(sf_dir: str):
        """Per-stratum deterministic sampling (25% of O-status orders, 5%
        of F, none of P via the default) — shuffle-free, HUGEINT-replayed
        by the oracle."""
        from lucene_msmarco_ray.ops.relational import stratified_sample
        ds = _read16(sf_dir, "orders.parquet",
                     ["o_orderkey", "o_orderstatus", "o_totalprice"])
        return stratified_sample(ds, "o_orderstatus", "o_orderkey",
                                 {"O": 0.25, "F": 0.05}, default=0.0)

    def hash_split_gate(sf_dir: str):
        """Deterministic 80/10/10 train/val/test labels over orders —
        shuffle-free hash-range cut, CASE-replayed by the oracle."""
        from lucene_msmarco_ray.ops.relational import hash_split
        ds = _read16(sf_dir, "orders.parquet",
                     ["o_orderkey", "o_totalprice"])
        return hash_split(ds, "o_orderkey",
                          {"train": 0.8, "val": 0.1, "test": 0.1})

    def pack_sequences_gate(sf_dir: str):
        """LM-training concat-and-chunk packing: documents laid out in
        deterministic hash order, each assigned the 2048-token bin its
        start offset lands in — a distributed two-pass prefix sum (range-
        bucketed hash, per-bucket totals scanned on the driver), replayed
        by the oracle as one SQL window cumsum."""
        from lucene_msmarco_ray.ops.relational import pack_sequences
        from lucene_msmarco_ray.ops.textstats import token_count
        docs = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        cnt = token_count(docs).drop_columns(["n_unique"])
        return pack_sequences(cnt, "doc_id", "n_tokens", budget=2048)

    def token_budget_gate(sf_dir: str):
        """Deterministic token-budget fill: the prefix of whole documents
        (in pack_sequences' hash order) whose start_off + n_tokens fits a
        20k-token budget — the 'select N training tokens' primitive;
        oracle = the same window cumsum with a WHERE prefix filter."""
        from lucene_msmarco_ray.ops.relational import take_token_budget
        from lucene_msmarco_ray.ops.textstats import token_count
        docs = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        cnt = token_count(docs).drop_columns(["n_unique"])
        return take_token_budget(cnt, budget=20_000, id_col="doc_id",
                                 size_col="n_tokens")

    def duplicate_spans_gate(sf_dir: str):
        """Per-document duplicated-text fraction over 5-token spans —
        linear in tokens (doc-level output, no pair blowup); the oracle
        recounts with distinct gram strings."""
        from lucene_msmarco_ray.ops.dedup import duplicate_spans
        docs = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return duplicate_spans(docs, w=5)

    def approx_distinct_gate(sf_dir: str):
        """KMV distinct-count sketch (k=256) of part keys per return
        flag — bounded O(k) exchange per group, estimator replayed
        bit-exactly by the oracle's HUGEINT floor division."""
        from lucene_msmarco_ray.ops.relational import approx_distinct
        ds = _read16(sf_dir, "lineitem.parquet",
                     ["l_returnflag", "l_partkey"])
        return approx_distinct(ds, ["l_returnflag"], "l_partkey", k=256)

    def sample_n_gate(sf_dir: str):
        """Deterministic exact-size global sample: the 500 orders with
        smallest id hash — ORDER BY hash LIMIT n in the oracle."""
        from lucene_msmarco_ray.ops.relational import sample_n
        ds = _read16(sf_dir, "orders.parquet",
                     ["o_orderkey", "o_totalprice"])
        return sample_n(ds, "o_orderkey", 500)

    def partitioned_sink_gate(sf_dir: str):
        """Resumable partitioned parquet sink, gated on the full
        write→commit→read-back roundtrip: documents are hash-bucketed,
        written one committed directory per bucket, read back through the
        marker-aware reader, and the (doc_id, bucket) pairs must match
        the oracle's HUGEINT bucket arithmetic."""
        import shutil

        from lucene_msmarco_ray.sources.sink import (add_hash_bucket,
                                                     read_partitioned,
                                                     write_partitioned)
        root = os.path.join("/tmp", "graft_sink_gate_"
                            + os.path.basename(os.path.normpath(sf_dir)))
        shutil.rmtree(root, ignore_errors=True)
        docs = _read16(sf_dir, "documents.parquet", ["doc_id"])
        write_partitioned(add_hash_bucket(docs, "doc_id", 8), root,
                          "bucket", sort_cols=["doc_id"])
        return read_partitioned(root, "bucket") \
            .map_batches(lambda b: b.select(["doc_id", "bucket"]),
                         batch_format="pyarrow")

    def group_quantile_gate(sf_dir: str):
        """Exact p50/p90 of l_extendedprice per return flag via the
        two-pass order-preserving-bucket algorithm (quantile_disc
        semantics — always an element of the data, so bit-stable)."""
        from lucene_msmarco_ray.ops.relational import group_quantile
        ds = _read16(sf_dir, "lineitem.parquet",
                     ["l_returnflag", "l_extendedprice"])
        return group_quantile(ds, ["l_returnflag"], "l_extendedprice",
                              [0.5, 0.9], ["p50", "p90"])

    def asof_join_gate(sf_dir: str):
        """Each click matched to the user's latest preceding (or same-
        instant) view — DuckDB ASOF LEFT JOIN is the oracle. Unmatched
        clicks keep LEFT-join semantics but the gate coalesces the NULL
        view_event to -1 on BOTH sides: it is the only gate whose raw
        output would contain nulls, and null/NaN value-hashing is the
        one comparison axis the other 36 gates never exercise (they all
        coalesce in their oracles)."""
        import pyarrow.parquet as pq

        from lucene_msmarco_ray.ops.events import asof_join
        from lucene_msmarco_ray.sources.pq import read_parquet_sized
        ev = os.path.join(sf_dir, "events.parquet")
        schema = pq.read_schema(ev)    # metadata-only; filter keeps it
        clicks = read_parquet_sized(ev).filter(expr="event_type == 'click'")
        views = read_parquet_sized(ev).filter(expr="event_type == 'view'")
        joined = asof_join(clicks, views, by_col="user_id", ts_col="ts",
                           right_cols={"event_id": "view_event"},
                           left_cols=["event_id"],
                           left_schema=schema, right_schema=schema)

        def fill(batch):
            import pyarrow.compute as pc
            return batch.set_column(
                batch.schema.get_field_index("view_event"), "view_event",
                pc.fill_null(batch["view_event"], -1))

        return joined.map_batches(fill, batch_format="pyarrow")

    def asof_join_nulls_gate(sf_dir: str):
        """Null-parity companion to asof_join: the SAME join, but the gate
        output carries an explicit view_is_null flag DERIVED FROM the
        op's actual nulls (plus the coalesced value for dtype-stable
        hashing). If the op ever started emitting a sentinel instead of
        NULL for unmatched rows, the flag would diverge from the oracle's
        `v.event_id IS NULL` — restoring the null-handling coverage the
        coalesced gate gave up."""
        import pyarrow.parquet as pq

        from lucene_msmarco_ray.ops.events import asof_join
        from lucene_msmarco_ray.sources.pq import read_parquet_sized
        ev = os.path.join(sf_dir, "events.parquet")
        schema = pq.read_schema(ev)
        clicks = read_parquet_sized(ev).filter(expr="event_type == 'click'")
        views = read_parquet_sized(ev).filter(expr="event_type == 'view'")
        joined = asof_join(clicks, views, by_col="user_id", ts_col="ts",
                           right_cols={"event_id": "view_event"},
                           left_cols=["event_id"],
                           left_schema=schema, right_schema=schema)

        def flag(batch):
            import pyarrow.compute as pc
            col = batch["view_event"]
            out = batch.set_column(
                batch.schema.get_field_index("view_event"), "view_event",
                pc.fill_null(col, -1))
            return out.append_column("view_is_null", pc.is_null(col))

        return joined.map_batches(flag, batch_format="pyarrow")

    def sessionize_chunked_gate(sf_dir: str):
        """Skew-proof two-level sessionize (per-(user, time-chunk)
        fragments + fragment merge) — must equal the SAME window-function
        oracle as plain sessionize; chunk = 1h on gate data so fragments
        genuinely split and re-merge."""
        from lucene_msmarco_ray.ops.events import sessionize_chunked
        from lucene_msmarco_ray.sources.pq import read_parquet_sized
        ds = read_parquet_sized(os.path.join(sf_dir, "events.parquet"),
                                columns=["ts", "user_id", "value"])
        return sessionize_chunked(ds, gap_seconds=1800, chunk_seconds=3600)

    def range_join_gate(sf_dir: str):
        """Every click within 10 minutes AFTER a view by the same user —
        the bucketed interval join (intervals replicate to ≤2 buckets of
        width = the window; clicks land in exactly one)."""
        import pyarrow.compute as pc

        from lucene_msmarco_ray.ops.join import bucketed_range_join
        from lucene_msmarco_ray.sources.pq import read_parquet_sized
        ev = os.path.join(sf_dir, "events.parquet")
        win_us = 600_000_000

        def views_of(batch):
            ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            return pa.table({"user_id": batch["user_id"].cast(pa.int64()),
                             "view_event": batch["event_id"].cast(pa.int64()),
                             "lo_us": ts, "hi_us": pc.add(ts, win_us)})

        def clicks_of(batch):
            ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            return pa.table({"user_id": batch["user_id"].cast(pa.int64()),
                             "click_event": batch["event_id"].cast(pa.int64()),
                             "p_us": ts})

        views = read_parquet_sized(ev) \
            .filter(expr="event_type == 'view'") \
            .map_batches(views_of, batch_format="pyarrow")
        clicks = read_parquet_sized(ev) \
            .filter(expr="event_type == 'click'") \
            .map_batches(clicks_of, batch_format="pyarrow")
        i64 = pa.int64()
        out = bucketed_range_join(
            views, clicks, lo_col="lo_us", hi_col="hi_us", point_col="p_us",
            key="user_id", bucket_width=win_us,
            left_schema=pa.schema([("user_id", i64), ("view_event", i64),
                                   ("lo_us", i64), ("hi_us", i64)]),
            right_schema=pa.schema([("user_id", i64), ("click_event", i64),
                                    ("p_us", i64)]))
        return out.select_columns(["user_id", "view_event", "click_event"])

    def variant_qpp(sf_dir: str):
        """VariantSpecificity composite (reference:
        experiments/TRECDLQPPEvaluatorWithGenVariants.java): per-variant
        retrieval through the searcher pool → NQC on each variant's
        normalized list → refSim-weighted combine with the base NQC."""
        import pandas as pd

        from lucene_msmarco_ray.pipelines.experiment import (
            variant_qpp_estimates,
        )
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        idx = _ensure_index(sf_dir)
        vdf = pd.DataFrame(_gate_variants(),
                           columns=["qid", "variant_rank", "variant_text",
                                    "ref_sim"])

        def rfn(qlist):
            return _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3,
                                queries=qlist, head=50)

        return variant_qpp_estimates(run, vdf, idx, _gate_query_map(),
                                     k=50, num_variants=_N_GATE_VARIANTS,
                                     lam=0.5, retrieve_fn=rfn, est_round=6)

    def media_decode(sf_dir: str):
        """Real multimodal decode (rows-only gate — PNG/WAV decoding is not
        SQL-expressible): synthesize deterministic REAL payloads, decode
        images (stdlib-zlib PNG) and audio (PCM WAV) through the actor-pool
        stages, return per-media feature checksums."""
        import pandas as pd
        import ray.data as rd

        from lucene_msmarco_ray.ops.multimodal import (
            decode_media,
            synth_real_media_table,
        )
        tbl = synth_real_media_table(60)
        img = decode_media(rd.from_arrow(tbl), "image", fake=False,
                           concurrency=(1, 2)).to_pandas()
        aud = decode_media(rd.from_arrow(tbl), "audio", fake=False,
                           concurrency=(1, 2)).to_pandas()
        vid = decode_media(rd.from_arrow(tbl), "video", fake=False,
                           stride_ms=80, concurrency=(1, 2)).to_pandas()
        # one row per sampled frame -> collapse to one checksum per video
        vid = vid.groupby("media_id", as_index=False) \
            .agg(checksum=("feature", lambda fs: round(
                float(sum(np.sum(f) for f in fs)), 6)))
        img["kind"], aud["kind"], vid["kind"] = "image", "audio", "video"
        img["checksum"] = [round(float(np.sum(f)), 6) for f in img["feature"]]
        aud["checksum"] = [round(float(np.sum(f)), 6) for f in aud["feature"]]
        cols = ["media_id", "kind", "checksum"]
        out = pd.concat([img[cols], aud[cols], vid[cols]])
        return out.sort_values("media_id").reset_index(drop=True)

    def stochastic_qpp(sf_dir: str):
        """StochasticQPPEvaluation composite (reference:
        stochastic_qpp/StochasticQPPEvaluation.java:229-264): deterministic
        rank-swap samples → per-sample AP×NQC tau/SARE + deltas."""
        from lucene_msmarco_ray.pipelines.experiment import (
            stochastic_qpp_evaluation,
        )
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        idx = _ensure_index(sf_dir)
        return stochastic_qpp_evaluation(run, _gate_qrels(sf_dir),
                                         _gate_query_map(), idx,
                                         num_samples=5, methods=("nqc",),
                                         corr_metrics=("kendall", "sare"))

    def qpp_correlation(sf_dir: str):
        """§2.11 composite (TRECDLQPPEvaluator surface): per-query AP ×
        QPP estimates → pearson / kendall tau-b / SARE per method."""
        from lucene_msmarco_ray.pipelines.experiment import qpp_experiment
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        idx = _ensure_index(sf_dir)
        out = qpp_experiment(run, _gate_qrels(sf_dir), _gate_query_map(),
                             idx, target_metric="ap",
                             methods=("nqc", "avgidf", "maxidf"),
                             corr_metrics=("pearson", "kendall", "sare"))
        return out

    def bpe_roundtrip(sf_dir: str):
        """T7: train BPE on the documents table (Ray word-count pipeline),
        encode every doc in an actor-pool stage WITH word markers, decode,
        and return the reconstruction — the SQL oracle checks it equals the
        whitespace-normalized original text (an exactness property of the
        subword segmentation that SQL can verify without running BPE)."""

        from lucene_msmarco_ray.analysis.bpe import (
            BpeModel,
            bpe_pretokenize,
            learn_bpe,
        )
        docs = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        model = learn_bpe(docs, num_merges=50)
        enc = bpe_pretokenize(docs, model, out_col="bpe_text",
                              strip_marker=False)

        def recon(batch):
            import pyarrow as _pa
            out = [BpeModel.decode(t.split())
                   for t in batch["bpe_text"].to_pylist()]
            return _pa.table({"doc_id": batch["doc_id"].cast(_pa.int64()),
                              "recon": _pa.array(out, _pa.string())})

        return enc.map_batches(recon, batch_format="pyarrow")

    def qpp_basic(sf_dir: str):
        from lucene_msmarco_ray.pipelines.feedback import qpp_estimates
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        idx = _ensure_index(sf_dir)
        return qpp_estimates(run, idx, _gate_query_map(), k=50,
                             methods=("nqc", "cumnqc", "avgidf", "maxidf"),
                             concurrency=(1, 2))

    def qpp_sampling(sf_dir: str):
        from lucene_msmarco_ray.pipelines.feedback import qpp_estimates
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        idx = _ensure_index(sf_dir)
        return qpp_estimates(run, idx, _gate_query_map(), k=50,
                             methods=("rsd", "uef"), concurrency=(1, 2))

    def fdbk_rerank(sf_dir: str):
        from lucene_msmarco_ray.pipelines.feedback import feedback_rerank
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        idx = _ensure_index(sf_dir)
        return feedback_rerank(run, idx, _gate_query_map(),
                               model="conditional", concurrency=(1, 2),
                               round_to=6)

    def fdbk_term_stats_gate(sf_dir: str):
        """FdbkTermStats.java composite: dump the RM-conditional
        feedback-term weights per query from a run (printfdbkterms.sh)."""
        from lucene_msmarco_ray.pipelines.feedback import fdbk_term_stats
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        idx = _ensure_index(sf_dir)
        return fdbk_term_stats(run, idx, concurrency=(1, 2), round_to=6)

    def redact_text_gate(sf_dir: str):
        """PII-style regex scrubbing — ordered rewrites, per-doc match
        count with sequential semantics (counts see each pattern's input
        state); pure Arrow RE2 kernels, the oracle chains regexp_replace
        in the same RE2 dialect."""
        from lucene_msmarco_ray.ops.strings import redact
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return redact(ds, [(r"customer \w+", "<NAME>"),
                           (r"\bvalue\b", "<V>")])

    def json_extract_agg_gate(sf_dir: str):
        """Numeric field out of the semi-structured props column (RE2
        named group, no JSON parser in the hot path) + per-event-type
        sum/count via the partial-aggregate discipline."""
        from lucene_msmarco_ray.ops.strings import extract_field_agg
        ds = _read16(sf_dir, "events.parquet", ["event_type", "props"])
        return extract_field_agg(ds, r'"k":\s*(?P<k>\d+)', "props",
                                 "event_type")

    def bloom_semi_join_gate(sf_dir: str):
        """Same rows as semi_join but through the Bloom pre-filter path
        (distributed word-or-fold build -> broadcast bit set -> exact semi
        join over the survivors); a deliberately small filter (m=4096 for
        ~115 distinct urgent orderkeys at sf0.01) keeps a real
        false-positive rate in play so the exactness contract is
        exercised, not vacuous."""
        from lucene_msmarco_ray.ops.join import bloom_semi_join
        lcols = ["l_orderkey", "l_linenumber", "l_extendedprice"]
        left = _read16(sf_dir, "lineitem.parquet", lcols)
        right = _read16(sf_dir, "orders.parquet",
                        ["o_orderkey", "o_orderpriority"]) \
            .filter(expr="o_orderpriority == '1-URGENT'")
        return bloom_semi_join(
            left, right, key="l_orderkey", right_key="o_orderkey",
            how="semi", m_bits=4096,
            left_schema=_projected_schema(sf_dir, "lineitem.parquet", lcols))

    def tfidf_keywords_gate(sf_dir: str):
        """Top-5 tf-idf keywords per doc: ONE vocabulary-bounded df
        exchange + broadcast micro-idf; per-doc top-k is batch-local (a
        doc is one row). Fixed-point idf = floor(ln(N/df)·1e6+0.5) so the
        oracle replays scores exactly."""
        from lucene_msmarco_ray.ops.textstats import tfidf_keywords
        ds = _read16(sf_dir, "documents.parquet", ["doc_id", "text"])
        return tfidf_keywords(ds, k=5)

    def time_deltas_gate(sf_dir: str):
        """Per-user inter-arrival deltas (the lag-window primitive): one
        coarse user-hash exchange, one vectorized lexsort+diff per
        partition; ties broken by event_id like the oracle's lag() ORDER
        BY (ts, event_id)."""
        from lucene_msmarco_ray.ops.events import time_deltas
        ds = _read16(sf_dir, "events.parquet",
                     ["event_id", "user_id", "ts"])
        return time_deltas(ds)

    def rm3_expand(sf_dir: str):
        from lucene_msmarco_ray.pipelines.feedback import expand_queries
        run = _rounded_run(sf_dir, "bm25", k1=0.7, b=0.3)
        idx = _ensure_index(sf_dir)
        return expand_queries(run, idx, _gate_query_map(), concurrency=(1, 2),
                              round_to=6)

    # Gate ORDER is deliberate (the driver samples a prefix of this
    # dict): STALENESS FIRST — the round-4 lesson is that a gate whose
    # implementing module changed AFTER its last driver-green row is the
    # one place a silent break can hide (funnel broke exactly that way),
    # so those gates lead the registry every round. Tiers: (a) gates
    # whose implementing module changed since their last driver-green
    # CORRECTNESS row, most-suspect first; (b) gates new this round;
    # (c) unchanged gates ordered by how long ago their last driver row
    # was (oldest round first), most load-bearing first within a tier.
    # The rule is documented in ARCHITECTURE.md §verification.
    return {
        # (a) module changed since last driver-green row —
        # ops/events.py funnel fix (last green r3, crashed r4 verdict):
        "funnel": funnel_gate,
        # ops/fold.py coarse-fold conversion (late r5) touched
        # dedup/curate/relational/events/join — their gates lead
        # the window so the driver adjudicates the changed code:
        "dedup_exact": dedup_exact,
        "curate_corpus": curate,
        "dedup_components": dedup_components_gate,
        "dedup_components_dist": dedup_components_dist_gate,
        "neardup_filter": neardup_filter_gate,
        "sessionize_chunked": sessionize_chunked_gate,
        "rrf_fuse": rrf_fuse_gate,
        "scorer_fusion": scorer_fusion_gate,
        "group_distinct": group_distinct_gate,
        "topk_per_group": topk_per_group_gate,
        "pmi_colloc": pmi_colloc,
        # ops/textstats.py + ops/vocab_join.py: broadcast-vs-join
        # refactor of the LM / tf-idf family (r5):
        "tfidf_keywords": tfidf_keywords_gate,
        "lm_perplexity": lm_perplexity_gate,
        "bigram_lm": bigram_lm_gate,
        "importance_weights": importance_weights_gate,
        "importance_resample": importance_resample_gate,
        # (b) new round-5 gates: the forced bucketed-join (huge-vocab
        # fallback) twins of the two broadcast textstats gates
        "lm_perplexity_join": lm_perplexity_join_gate,
        "tfidf_keywords_join": tfidf_keywords_join_gate,
        "bigram_lm_join": bigram_lm_join_gate,
        # ops/join.py _build_bloom empty-batch fix (r5):
        "bloom_semi_join": bloom_semi_join_gate,
        "semi_join": semi_join_gate,
        "anti_join": anti_join_gate,
        "bucketed_join": bucket_join,
        "range_join": range_join_gate,
        # (b) media_decode: rows-only in r4, golden-fixture oracle new r5
        "media_decode": media_decode,
        # (c) unchanged gates, oldest driver row first; r4-green ones
        # trail. First: the r4-window block (green r4).
        "asof_join": asof_join_gate,
        "sliding_window": sliding_window_gate,
        "hash_sample": hash_sample_gate,
        "stratified_sample": stratified_sample_gate,
        "hash_split": hash_split_gate,
        "pack_sequences": pack_sequences_gate,
        "partitioned_sink": partitioned_sink_gate,
        "duplicate_spans": duplicate_spans_gate,
        "approx_distinct": approx_distinct_gate,
        "sample_n": sample_n_gate,
        "group_quantile": group_quantile_gate,
        "stochastic_qpp": stochastic_qpp,
        "variant_qpp": variant_qpp,
        "sessionize": sessionize_gate,
        "windowed_agg": windowed_agg_gate,
        "qpp_correlation": qpp_correlation,
        "qpp_basic": qpp_basic,
        "qpp_sampling": qpp_sampling,
        "fdbk_rerank": fdbk_rerank,
        "rm3_expand": rm3_expand,
        "induced_rescore": induced,
        "lm_doc_weights": lm_docw,
        "sparsevec_topdocs": sparsevec_top,
        "bigram_count": bigrams,
        "srlm_rerank": srlm_rerank,
        "rocchio_expand": rocchio,
        "fdbk_term_stats": fdbk_term_stats_gate,
        "asof_join_nulls": asof_join_nulls_gate,
        "cumulative_agg_chunked": cumulative_agg_chunked_gate,
        "redact_text": redact_text_gate,
        "json_extract_agg": json_extract_agg_gate,
        "time_deltas": time_deltas_gate,
        "index_compact": index_compact,
        "token_budget": token_budget_gate,
        "bm25_topk": bm25_topk,
        "term_stats": term_stats,
        "index_append": index_append,
        "doc_stats": doc_stats,
        "bm25_topk_sharded": bm25_topk_sharded,
        "bm25_topk_ref_params": bm25_topk_ref_params,
        "lmdir_topk": lmdir_topk,
        "eval_metrics": eval_metrics,
        "rel_annotate": rel_annotate,
        "minhash_pairs": minhash_pairs,
        "simhash_pairs": simhash,
        "ngram_jaccard": ngram_jacc,
        "ann_bruteforce": ann_bruteforce,
        "ann_lsh": ann_lsh,
        "ann_ivf": ann_ivf,
        "embedding_neardup": emb_neardup,
        "repetition_stats": repetition_stats_gate,
        "group_zscore": group_zscore_gate,
        "cumulative_agg": cumulative_agg_gate,
        "cohort_retention": cohort_retention_gate,
        "minmax_norm": minmax_norm,
        "token_count": tok_count,
        "normalize_text": normalize_text_gate,
        "heavy_hitters": heavy_hitters_gate,
        "chunk_boundaries": chunk_boundaries_gate,
        "group_mad": group_mad_gate,
        "group_centroids": group_centroids_gate,
        "quantize_embeddings": quantize_embeddings_gate,
        "quantile_filter": quantile_filter_gate,
        "decontaminate": decontaminate_gate,
        "quality_score": quality,
        "lang_id": langid,
        "fingerprint": fp,
        "bpe_roundtrip": bpe_roundtrip,
    }


def oracle_sql() -> dict[str, str]:
    from lucene_msmarco_ray.ops.textstats import LANG_MARKERS, STOP_SMALL

    langs = sorted(LANG_MARKERS)
    score_cols = ",\n  ".join(
        f"len(list_filter(toks, x -> list_contains({_sql_list(LANG_MARKERS[l])}, x)))"
        f" AS s_{l}" for l in langs)
    max_expr = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    pred_branches = " ".join(
        f"WHEN s_{l} = m THEN '{l}'" for l in langs)

    oracles = {
        "term_stats": f"""WITH {_TOKS}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
FROM toks2 GROUP BY term""",

        # the appended index must reproduce the FULL corpus term stats
        "index_append": f"""WITH {_TOKS}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
FROM toks2 GROUP BY term""",

        "index_compact": f"""WITH {_TOKS}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
FROM toks2 GROUP BY term""",

        # media_decode's inputs are synthesized deterministically (sf-
        # independent) and the PNG/WAV/MP4 decode is pure arithmetic, so
        # its oracle is a precomputed golden-feature parquet committed to
        # the repo (fixtures/README.md documents regeneration); this
        # upgrades the one rows-only gate to rows+schema+hash like the
        # rest of the board.
        "media_decode": """SELECT media_id, kind, checksum
FROM read_parquet('/root/repo/fixtures/media_decode_golden.parquet')""",

        "doc_stats": f"""WITH {_TOKS}
SELECT doc_id, count(*)::BIGINT AS doc_len FROM toks2 GROUP BY doc_id""",

        "bm25_topk": _bm25_sql(0.7, 0.3),
        "bm25_topk_sharded": _bm25_sql(0.7, 0.3),
        "bm25_topk_ref_params": _bm25_sql(1.2, 0.75),
        "lmdir_topk": _lmdir_sql(1000.0),
        "scorer_fusion": f"""WITH a AS ({_bm25_sql(0.7, 0.3)}),
b AS ({_lmdir_sql(1000.0)}),
u AS (SELECT qid, doc_id, rank FROM a
      UNION ALL SELECT qid, doc_id, rank FROM b),
f AS (SELECT qid, doc_id,
             sum(1000000000000 // (60 + rank))::BIGINT AS rrf_micro,
             count(*)::BIGINT AS n_runs
      FROM u GROUP BY 1, 2)
SELECT qid, doc_id, rrf_micro, n_runs,
       row_number() OVER (PARTITION BY qid
                          ORDER BY rrf_micro DESC, doc_id)::BIGINT AS rank
FROM f QUALIFY rank <= 20""",
        "minmax_norm": _minmax_sql(0.7, 0.3),

        "dedup_exact": _dedup_exact_sql(),
        "curate_corpus": _curate_sql(),

        "pmi_colloc": """WITH t AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
uni AS (SELECT unnest(toks) AS w FROM t),
uc AS (SELECT w, count(*)::DOUBLE AS c FROM uni GROUP BY 1),
tot AS (SELECT count(*)::DOUBLE AS t FROM uni),
bg AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                    i -> [toks[i], toks[i+1]])) AS p
       FROM t WHERE len(toks) >= 2),
bc AS (SELECT p[1] AS x, p[2] AS y, count(*)::DOUBLE AS cxy
       FROM bg GROUP BY 1, 2),
btot AS (SELECT sum(cxy) AS b FROM bc)
SELECT x || '^' || y AS bigram, cxy::BIGINT AS n_xy,
       round(ln(cxy * tot.t * tot.t / (btot.b * ux.c * uy.c)), 6) AS pmi
FROM bc, tot, btot, uc ux, uc uy
WHERE ux.w = bc.x AND uy.w = bc.y AND cxy >= 5""",

        "lm_perplexity": """WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
cf AS (SELECT term, count(*)::BIGINT AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c)::BIGINT AS total FROM cf),
m AS (SELECT term,
        CAST(floor(ln(c::DOUBLE / total) * 1000000 + 0.5) AS BIGINT) AS micro
      FROM cf, tot),
agg AS (SELECT tok.doc_id, sum(m.micro)::BIGINT AS s, count(*)::BIGINT AS n
        FROM tok JOIN m USING (term) GROUP BY 1)
SELECT t.doc_id, coalesce(agg.n, 0)::BIGINT AS n_tokens,
  coalesce(floor((agg.s / 1000000.0 / agg.n) * 1000000 + 0.5) / 1000000.0,
           0.0) AS avg_logprob,
  coalesce(floor(exp(-(agg.s / 1000000.0 / agg.n)) * 1000000 + 0.5)
             / 1000000.0, 1.0) AS ppl
FROM t LEFT JOIN agg USING (doc_id)""",

        "repetition_stats": """WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
g2 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i+1])) AS gram
  FROM t WHERE len(toks) >= 2),
c2 AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
s2 AS (SELECT doc_id, round(max(c)::DOUBLE / sum(c), 6) AS f
       FROM c2 GROUP BY 1),
g3 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
  FROM t WHERE len(toks) >= 3),
c3 AS (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY 1, 2),
s3 AS (SELECT doc_id,
         round(sum(CASE WHEN c >= 2 THEN c ELSE 0 END)::DOUBLE / sum(c), 6)
           AS f
       FROM c3 GROUP BY 1)
SELECT t.doc_id, len(toks)::BIGINT AS n_tokens,
  coalesce(s2.f, 0.0) AS top_bigram_frac,
  coalesce(s3.f, 0.0) AS dup_trigram_frac
FROM t LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)""",

        "importance_weights": _importance_sql(),
        "importance_resample": f"""WITH iw AS ({_importance_sql()}),
key AS (SELECT doc_id, logw_micro,
  logw_micro / 1000000.0
    + (-ln(-ln((((CAST(doc_id AS HUGEINT) + 7) % 4294967296 * 2654435761)
                 % 4294967296 + 0.5) / 4294967296.0))) AS k
  FROM iw)
SELECT doc_id, logw_micro,
       floor(k * 1000000 + 0.5) / 1000000.0 AS gumbel_key
FROM key ORDER BY k DESC, doc_id LIMIT 100""",

        "decontaminate": """WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
gl AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 5
              THEN list_transform(generate_series(1, len(toks) - 4),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                          || ' ' || toks[i+3] || ' ' || toks[i+4])
              WHEN len(toks) >= 1 THEN [array_to_string(toks, ' ')]
              ELSE []::VARCHAR[] END AS grams
  FROM t),
g AS (SELECT DISTINCT doc_id, unnest(grams) AS gram FROM gl),
bset AS (SELECT DISTINCT gram FROM g WHERE doc_id % 100 = 0),
sh AS (SELECT g.doc_id, count(*)::BIGINT AS n_shared
       FROM g JOIN bset USING (gram) GROUP BY 1),
ng AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM g GROUP BY 1)
SELECT t.doc_id, coalesce(ng.n_grams, 0) AS n_grams,
       coalesce(sh.n_shared, 0) AS n_shared,
       (coalesce(sh.n_shared, 0) > 0) AS contaminated
FROM t LEFT JOIN ng USING (doc_id) LEFT JOIN sh USING (doc_id)""",

        "group_centroids": """WITH el AS (
  SELECT label, generate_subscripts(embedding, 1) AS i,
         CAST(floor(unnest(embedding)::DOUBLE * 1000000 + 0.5) AS BIGINT)
           AS m
  FROM embeddings),
agg AS (SELECT label, i, sum(m)::BIGINT AS s, count(*)::BIGINT AS n
        FROM el GROUP BY 1, 2)
SELECT label::BIGINT AS label, i::BIGINT AS dim, n AS n_vecs,
       floor((s / 1000000.0 / n) * 1000000 + 0.5) / 1000000.0 AS centroid
FROM agg""",

        "quantize_embeddings": """WITH el AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings),
mm AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM el GROUP BY 1),
p AS (SELECT dim, mn,
             CASE WHEN mx > mn THEN (mx - mn) / 254.0 ELSE 1.0 END AS scale
      FROM mm)
SELECT el.vec_id, el.dim::BIGINT AS dim,
  CAST(least(greatest(floor((el.v - p.mn) / p.scale + 0.5), 0), 254)
       AS BIGINT) - 127 AS code
FROM el JOIN p USING (dim)""",

        "quantile_filter": """WITH q AS (
  SELECT lang, quantile_disc(n_chars, 0.9) AS p90
  FROM documents GROUP BY 1)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN q USING (lang)
WHERE d.n_chars > q.p90""",

        "group_mad": """WITH m AS (
  SELECT lang, quantile_disc(n_chars, 0.5)::DOUBLE AS med
  FROM documents GROUP BY 1),
d AS (SELECT doc.lang, abs(doc.n_chars::DOUBLE - m.med) AS ad
      FROM documents doc JOIN m USING (lang))
SELECT m.lang, m.med, quantile_disc(d.ad, 0.5) AS mad
FROM d JOIN m USING (lang) GROUP BY 1, 2""",

        "chunk_boundaries": """WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
           AS n
  FROM documents),
pr AS (
  SELECT doc_id, n,
         unnest(generate_series(0, CAST(floor((n - 1) / 64.0) AS BIGINT)))
           AS i
  FROM t WHERE n > 0)
SELECT doc_id, i AS chunk_id, (i * 64 + 1)::BIGINT AS tok_start,
       least(n - i * 64, 64)::BIGINT AS n_tokens
FROM pr""",

        "bigram_lm": """WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
pr AS (
  SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS i, toks
  FROM t WHERE len(toks) >= 2),
pairs AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM pr),
bc AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM pairs GROUP BY 1, 2),
tok AS (SELECT unnest(toks) AS term FROM t),
uc AS (SELECT term, count(*)::BIGINT AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c)::BIGINT AS total FROM uc),
m AS (SELECT bc.w1, bc.w2,
        CAST(floor(ln(0.9 * bc.c12 / u1.c
                      + (1.0 - 0.9) * u2.c / tot.total)
                   * 1000000 + 0.5) AS BIGINT) AS micro
      FROM bc JOIN uc u1 ON u1.term = bc.w1
              JOIN uc u2 ON u2.term = bc.w2, tot),
agg AS (SELECT p.doc_id, sum(m.micro)::BIGINT AS s, count(*)::BIGINT AS n
        FROM pairs p JOIN m ON m.w1 = p.w1 AND m.w2 = p.w2 GROUP BY 1)
SELECT t.doc_id,
       coalesce(agg.n, 0)::BIGINT AS n_pairs,
       coalesce(floor((agg.s / 1000000.0 / agg.n) * 1000000 + 0.5)
                  / 1000000.0, 0.0) AS avg_logprob,
       coalesce(floor(exp(-(agg.s / 1000000.0 / agg.n)) * 1000000 + 0.5)
                  / 1000000.0, 1.0) AS ppl
FROM t LEFT JOIN agg USING (doc_id)""",

        "heavy_hitters": """WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
    AS term
  FROM documents),
cf AS (SELECT term, count(*)::BIGINT AS cf FROM tok GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS total FROM tok)
SELECT term, cf FROM cf, tot WHERE cf * 30 > total""",

        "normalize_text": """SELECT doc_id,
  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text,
  len(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))::BIGINT
    AS n_chars_norm
FROM documents""",

        "semi_join": """SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey
                AND o.o_orderpriority = '1-URGENT')""",

        # the Bloom path must be output-identical to the plain semi join
        "bloom_semi_join": """SELECT l_orderkey, l_linenumber,
  l_extendedprice
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey
                AND o.o_orderpriority = '1-URGENT')""",

        "anti_join": """SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey
                    AND o.o_orderpriority = '1-URGENT')""",

        "rrf_fuse": """WITH a AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents QUALIFY rank <= 50),
b AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rank
  FROM documents QUALIFY rank <= 50),
u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
f AS (SELECT lang, doc_id,
             sum(1000000000000 // (60 + rank))::BIGINT AS rrf_micro,
             count(*)::BIGINT AS n_runs
      FROM u GROUP BY 1, 2)
SELECT lang, doc_id, rrf_micro, n_runs,
       row_number() OVER (PARTITION BY lang
                          ORDER BY rrf_micro DESC, doc_id)::BIGINT AS rank
FROM f QUALIFY rank <= 20""",

        "cohort_retention": """WITH up AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS period
  FROM events),
c AS (SELECT user_id, period,
             min(period) OVER (PARTITION BY user_id) AS cohort
      FROM up)
SELECT cohort::BIGINT AS cohort, (period - cohort)::BIGINT AS offset,
       count(*)::BIGINT AS n_users
FROM c GROUP BY 1, 2""",

        "funnel": """WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
s1 AS (SELECT user_id, min(t) AS t FROM e
       WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.t) AS t FROM e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click'
         AND e.t > s1.t AND e.t <= s1.t + 86400000000 GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.t) AS t FROM e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase'
         AND e.t > s2.t AND e.t <= s2.t + 86400000000 GROUP BY 1)
SELECT 1::BIGINT AS step, 'view' AS event_type,
       (SELECT count(*) FROM s1)::BIGINT AS n_users
UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""",

        "cumulative_agg": """WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events)
SELECT event_id, user_id, ts_us,
  row_number() OVER w AS cum_events,
  round(sum(cents) OVER w / 100.0, 6) AS cum_value
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",

        # the chunked variant must reproduce the SAME window cumsum
        "cumulative_agg_chunked": """WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events)
SELECT event_id, user_id, ts_us,
  row_number() OVER w AS cum_events,
  round(sum(cents) OVER w / 100.0, 6) AS cum_value
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",

        # sequential-rewrite semantics: pattern 2's count runs against
        # pattern 1's OUTPUT (same as the engine's ordered kernel chain)
        "redact_text": r"""WITH s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, 'customer \w+')) AS c1,
         regexp_replace(text, 'customer \w+', '<NAME>', 'g') AS t1
  FROM documents)
SELECT doc_id,
       regexp_replace(t1, '\bvalue\b', '<V>', 'g') AS text_redacted,
       CAST(c1 + len(regexp_extract_all(t1, '\bvalue\b')) AS BIGINT)
         AS n_redactions
FROM s1""",

        "json_extract_agg": r"""SELECT event_type,
  CAST(SUM(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT))
       AS BIGINT) AS sum_value,
  CAST(COUNT(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT))
       AS BIGINT) AS n_rows
FROM events GROUP BY event_type""",

        # independent recomputation of tfidf_keywords: same fixed-point
        # micro-idf convention (floor(ln(N/df)*1e6+0.5)), rank by
        # (score DESC, term ASC) per doc — both total orders are strict
        # because terms are distinct within a doc
        "tfidf_keywords": """WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
s AS (SELECT tf.doc_id, tf.term, tf.tf,
        tf.tf * floor(ln(n.n / df.df) * 1e6 + 0.5) / 1e6 AS score
      FROM tf JOIN df USING (term) CROSS JOIN n),
r AS (SELECT *, row_number() OVER
        (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn FROM s)
SELECT doc_id, term, tf, score FROM r WHERE rn <= 5""",

        "time_deltas": """SELECT event_id, user_id,
  epoch_us(ts) AS ts_us,
  COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER
             (PARTITION BY user_id ORDER BY ts, event_id),
           -1)::BIGINT AS delta_us
FROM events""",

        "token_count": """SELECT doc_id,
  len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens,
  len(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))::BIGINT
    AS n_unique
FROM documents""",

        "quality_score": f"""WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id, len(toks)::BIGINT AS n_tokens,
  round(len(list_filter(toks, x -> list_contains({_sql_list(STOP_SMALL)}, x)))
        / len(toks)::DOUBLE, 6) AS stop_ratio,
  round(list_aggregate(list_transform(toks, x -> len(x)), 'sum')
        / len(toks)::DOUBLE, 6) AS mean_token_len,
  round(len(list_distinct(toks)) / len(toks)::DOUBLE, 6) AS uniq_ratio
FROM t""",

        "lang_id": f"""WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
s AS (SELECT doc_id,
  {score_cols}
  FROM t),
m AS (SELECT *, {max_expr} AS m FROM s)
SELECT doc_id,
  CASE WHEN m = 0 THEN 'und' {pred_branches} END AS lang_pred,
  m::BIGINT AS lang_score
FROM m""",

        "fingerprint": f"""WITH {_GRAM_CTE},
gh AS (SELECT doc_id, {_roll_sql('gram', 131)} AS h FROM g)
SELECT d.doc_id, mn.fp
FROM documents d
LEFT JOIN (SELECT doc_id, min(h) AS fp FROM gh GROUP BY 1) mn
  ON mn.doc_id = d.doc_id""",

        "ngram_jaccard": """WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
gl AS (
  SELECT doc_id, list_transform(generate_series(1, len(toks) - 2),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS grams
  FROM t WHERE len(toks) >= 3),
g AS (SELECT DISTINCT doc_id, unnest(grams) AS gram FROM gl),
n AS (SELECT doc_id, count(*)::DOUBLE AS ng FROM g GROUP BY 1),
gdf AS (SELECT gram, count(*) AS gram_df FROM g GROUP BY 1),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::DOUBLE AS shared
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  JOIN gdf ON gdf.gram = a.gram
  WHERE gdf.gram_df <= 200
  GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b,
       round(p.shared / (na.ng + nb.ng - p.shared), 6) AS jaccard
FROM p JOIN n na ON na.doc_id = p.doc_a JOIN n nb ON nb.doc_id = p.doc_b
WHERE p.shared / (na.ng + nb.ng - p.shared) >= 0.8""",

        "ann_bruteforce": """WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id IN (0, 1, 2)),
sims AS (
  SELECT q.q_id, e.vec_id,
         round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6) AS sim
  FROM q CROSS JOIN embeddings e),
ranked AS (
  SELECT q_id, vec_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
  FROM sims)
SELECT q_id, vec_id, rank::BIGINT AS rank, sim FROM ranked WHERE rank <= 10""",
        "embedding_neardup": """SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
    AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45""",

        "bucketed_join": f"""WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id, len(toks)::BIGINT AS n_tokens,
  len(list_distinct(toks))::BIGINT AS n_unique,
  round(len(list_filter(toks, x -> list_contains({_sql_list(__import__('lucene_msmarco_ray.ops.textstats', fromlist=['STOP_SMALL']).STOP_SMALL)}, x)))
        / len(toks)::DOUBLE, 6) AS stop_ratio,
  round(list_aggregate(list_transform(toks, x -> len(x)), 'sum')
        / len(toks)::DOUBLE, 6) AS mean_token_len,
  round(len(list_distinct(toks)) / len(toks)::DOUBLE, 6) AS uniq_ratio
FROM t""",

        "eval_metrics": _eval_sql(0.7, 0.3),
        "rel_annotate": _rel_annotate_sql(0.7, 0.3),
        "qpp_basic": _qpp_sql(0.7, 0.3),
        "induced_rescore": _induced_sql(0.7, 0.3),
        "lm_doc_weights": f"""WITH {_CORE},
w1 AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + 9.0 * (tf.tf / dl.dl) * (s.n / df.df)) AS w
  FROM tf JOIN dl ON dl.doc_id = tf.doc_id
  JOIN df ON df.term = tf.term CROSS JOIN stats s),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS z FROM w1 GROUP BY 1)
SELECT w1.doc_id, w1.term, round(w1.w / nrm.z, 6) AS wt
FROM w1 JOIN nrm ON nrm.doc_id = w1.doc_id""",
        "sparsevec_topdocs": _sparsevec_sql(0.7, 0.3),
        "bigram_count": _bigram_sql(),
        "minhash_pairs": _minhash_sql(),
        "dedup_components": _components_sql(),
        "dedup_components_dist": _components_sql(),
        "neardup_filter": f"""WITH RECURSIVE pairs AS ({_minhash_sql()}),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT a AS node FROM e),
reach AS (
  SELECT node, node AS label FROM nodes
  UNION
  SELECT e.b AS node, reach.label FROM reach JOIN e ON reach.node = e.a),
comp AS (SELECT node, min(label) AS component FROM reach GROUP BY 1)
SELECT d.doc_id, d.n_chars FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM comp
                  WHERE comp.node = d.doc_id
                    AND comp.node <> comp.component)""",
        "group_zscore": """WITH c AS (
  SELECT doc_id, lang, n_chars,
         CAST(floor(n_chars::DOUBLE * 100 + 0.5) AS BIGINT) AS cents
  FROM documents),
m AS (SELECT lang, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
             sum(cents * cents)::BIGINT AS s2
      FROM c GROUP BY 1),
p AS (SELECT lang, s / n / 100.0 AS mean,
             sqrt(greatest((s2 / n - (s / n) * (s / n)) / 10000.0, 0))
               AS sd
      FROM m)
SELECT c.doc_id, c.lang, c.n_chars,
  floor(p.mean * 1000000 + 0.5) / 1000000.0 AS group_mean,
  floor(p.sd * 1000000 + 0.5) / 1000000.0 AS group_std,
  floor((CASE WHEN p.sd > 0
              THEN (c.n_chars::DOUBLE - p.mean) / p.sd ELSE 0 END)
        * 1000000 + 0.5) / 1000000.0 AS zscore
FROM c JOIN p USING (lang)""",
        "simhash_pairs": _simhash_sql(),
        "ann_lsh": _ann_lsh_sql(),
        "ann_ivf": _ann_ivf_sql(),
        "qpp_correlation": _qpp_correlation_sql(0.7, 0.3),
        "stochastic_qpp": _stochastic_qpp_sql(0.7, 0.3),
        "variant_qpp": _variant_qpp_sql(0.7, 0.3),
        "sessionize": """WITH x AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 1800 SECOND
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT *,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) - 1 AS sid
      FROM x)
SELECT user_id, sid::BIGINT AS session_id, count(*)::BIGINT AS n_events,
       epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
       round(sum(value), 6) AS total_value
FROM s GROUP BY 1, 2""",
        # sessionize_chunked must satisfy the SAME global gap semantics —
        # the oracle is identical to sessionize's window-function SQL
        "sessionize_chunked": """WITH x AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 1800 SECOND
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT *,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) - 1 AS sid
      FROM x)
SELECT user_id, sid::BIGINT AS session_id, count(*)::BIGINT AS n_events,
       epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
       round(sum(value), 6) AS total_value
FROM s GROUP BY 1, 2""",
        "range_join": """SELECT v.user_id, v.event_id AS view_event,
       c.event_id AS click_event
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = v.user_id
 AND epoch_us(c.ts) >= epoch_us(v.ts)
 AND epoch_us(c.ts) <= epoch_us(v.ts) + 600000000""",
        "windowed_agg": """SELECT event_type,
  (epoch_us(ts) // 3600000000)::BIGINT AS window_id,
  count(*)::BIGINT AS n_events, round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2""",
        # sliding window w covers [w*hop, w*hop+window): event in cell c
        # (c = ts//hop) feeds windows w = c-3 .. c (window/hop = 4 hops)
        # value sums in exact int64 hundredths (the engine's fixed-point
        # contract) so the float result is bit-identical under any
        # summation order
        "sliding_window": """WITH cells AS (
  SELECT event_type, (epoch_us(ts) // 900000000)::BIGINT AS cell,
         count(*)::BIGINT AS n,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s
  FROM events GROUP BY 1, 2),
rep AS (
  SELECT event_type, cell - i AS window_id, n, s
  FROM cells CROSS JOIN (SELECT unnest(range(0, 4)) AS i))
SELECT event_type, window_id, sum(n)::BIGINT AS n_events,
       sum(s) / 100.0 AS total_value
FROM rep GROUP BY 1, 2""",
        "topk_per_group": """SELECT o_custkey, o_orderkey, o_totalprice,
       rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC,
                                     o_orderkey)::BIGINT AS rank
  FROM orders) WHERE rank <= 3""",
        "group_distinct": """SELECT l_returnflag,
       count(DISTINCT l_suppkey)::BIGINT AS n_distinct
FROM lineitem GROUP BY 1""",
        # the engine's multiplicative hash replayed in HUGEINT modular
        # arithmetic; 429496729 = floor(0.1 * 2^32)
        "hash_sample": """SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE (CAST(o_orderkey AS HUGEINT) % 4294967296 * 2654435761)
      % 4294967296 < 429496729""",
        # per-stratum thresholds: 1073741824 = floor(0.25 * 2^32),
        # 214748364 = floor(0.05 * 2^32); unlisted strata drop (default 0)
        "stratified_sample": """SELECT o_orderkey, o_orderstatus,
       o_totalprice
FROM orders
WHERE (CAST(o_orderkey AS HUGEINT) % 4294967296 * 2654435761)
      % 4294967296
      < CASE o_orderstatus WHEN 'O' THEN 1073741824
                           WHEN 'F' THEN 214748364 ELSE 0 END""",
        # edges: 3435973836 = int(0.8 * 2^32), 3865470566 = int(0.9 * 2^32)
        # (cumulative fractions, same float arithmetic as hash_split);
        # fractions sum to 1 so no WHERE — every row gets a slice
        "hash_split": """SELECT o_orderkey, o_totalprice,
       CASE WHEN (CAST(o_orderkey AS HUGEINT) % 4294967296 * 2654435761)
                 % 4294967296 < 3435973836 THEN 'train'
            WHEN (CAST(o_orderkey AS HUGEINT) % 4294967296 * 2654435761)
                 % 4294967296 < 3865470566 THEN 'val'
            ELSE 'test' END AS split
FROM orders""",
        # w=5 spans: starts 1..len-4 (range upper bound len-3, exclusive);
        # span identity = the gram string (engine uses its 62-bit hash)
        "duplicate_spans": """WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
g0 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
           i -> array_to_string(list_slice(toks, i, i + 4), ' '))) AS gram
  FROM t),
g AS (SELECT DISTINCT doc_id, gram FROM g0),
df AS (SELECT gram, count(*) AS d FROM g GROUP BY gram)
SELECT g.doc_id,
       count(*)::BIGINT AS n_spans,
       sum(CASE WHEN df.d >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans,
       round(sum(CASE WHEN df.d >= 2 THEN 1 ELSE 0 END)
             / count(*)::DOUBLE, 6) AS dup_frac
FROM g JOIN df USING (gram) GROUP BY g.doc_id""",
        # KMV sketch replay: distinct 32-bit hashes per group; below k the
        # count is exact, else (k-1) * 2^32 // (k-th smallest hash)
        "approx_distinct": """WITH h AS (
  SELECT DISTINCT l_returnflag,
         (CAST(l_partkey AS HUGEINT) % 4294967296 * 2654435761)
         % 4294967296 AS h
  FROM lineitem),
r AS (
  SELECT l_returnflag, h,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
  FROM h)
SELECT l_returnflag,
       CAST(CASE WHEN count(*) < 256 THEN count(*)
            ELSE (CAST(255 AS HUGEINT) * 4294967296)
                 // min(h) FILTER (WHERE rn = 256) END AS BIGINT)
         AS n_distinct_est
FROM r GROUP BY l_returnflag""",
        "sample_n": """SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY (CAST(o_orderkey AS HUGEINT) % 4294967296 * 2654435761)
         % 4294967296
LIMIT 500""",
        # the sink's bucket = (hash * 8) >> 32, order-preserving range map
        "partitioned_sink": """SELECT doc_id,
       CAST((CAST(doc_id AS HUGEINT) % 4294967296 * 2654435761)
            % 4294967296 * 8 // 4294967296 AS BIGINT) AS bucket
FROM documents""",
        # one window cumsum over the multiplicative-hash order replays the
        # engine's distributed two-pass prefix sum exactly (the hash is a
        # bijection on [0, 2^32), so ORDER BY h is total)
        "pack_sequences": """WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
           AS n_tokens,
         (CAST(doc_id AS HUGEINT) % 4294967296 * 2654435761) % 4294967296
           AS h
  FROM documents),
o AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS start_off
  FROM t)
SELECT doc_id, n_tokens, start_off,
       (start_off // 2048)::BIGINT AS bin_id
FROM o""",
        "token_budget": """WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
           AS n_tokens,
         (CAST(doc_id AS HUGEINT) % 4294967296 * 2654435761) % 4294967296
           AS h
  FROM documents),
o AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS start_off
  FROM t)
SELECT doc_id, n_tokens, start_off
FROM o WHERE start_off + n_tokens <= 20000""",
        "group_quantile": """SELECT l_returnflag,
       quantile_disc(l_extendedprice, 0.5) AS p50,
       quantile_disc(l_extendedprice, 0.9) AS p90
FROM lineitem GROUP BY 1""",
        "asof_join": """SELECT c.user_id, c.event_id,
       coalesce(v.event_id, -1) AS view_event
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts""",

        "asof_join_nulls": """SELECT c.user_id, c.event_id,
       coalesce(v.event_id, -1) AS view_event,
       (v.event_id IS NULL) AS view_is_null
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts""",
        "fdbk_rerank": _fdbk_rerank_sql(0.7, 0.3),

        # FdbkTermStats.java: the RM-conditional weights themselves
        "fdbk_term_stats": _ranked_cte(0.7, 0.3) + f""",
{_RMCOND}
SELECT qid, term, round(wt, 6) AS weight FROM wts""",
        "rm3_expand": _rm3_expand_sql(0.7, 0.3),
        "srlm_rerank": _srlm_rerank_sql(0.7, 0.3),
        "rocchio_expand": _rocchio_sql(0.7, 0.3),
        "qpp_sampling": _qpp_sampling_sql(0.7, 0.3),
        "bpe_roundtrip": """SELECT doc_id,
  array_to_string(list_filter(string_split(text, ' '), x -> x <> ''), ' ')
    AS recon
FROM documents""",
    }
    # the forced bucketed-join gates must reproduce the broadcast gates
    # bit-for-bit, so they share the SAME oracle strings
    oracles["lm_perplexity_join"] = oracles["lm_perplexity"]
    oracles["tfidf_keywords_join"] = oracles["tfidf_keywords"]
    oracles["bigram_lm_join"] = oracles["bigram_lm"]
    return oracles
