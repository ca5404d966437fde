"""TREC-format sources/sinks (SURVEY.md S4-S7).

* read_queries — TSV ``qid \\t text``
  (reference: src/main/java/retrieval/OneStepRetriever.java:58-66,
  src/main/java/retrieval/QueryLoader.java:25-51).
* read_qrels — whitespace rows, tokens [0]=qid [2]=docid [3]=rel, rel>0 kept
  (src/main/java/qrels/AllRelRcds.java:37-63).
* read_run — 6-col TREC ``qid Q0 docid rank score runname``, plus the 2-col
  ``qid docid`` and 3-col ``qid docid score`` minimalist variants; rows are
  re-sorted by score desc per query, ranks reassigned, truncated to
  ``num_wanted`` (src/main/java/qrels/AllRetrievedResults.java:17-146, sort
  behavior :70-96 under AUTO_SORT_TOP_DOCS, Constants.java:73).
* write_run — TREC 6-col writer (src/main/java/retrieval/
  OneStepRetriever.java:168-174; format "%s Q0 %s %d %.6f %s").

Queries/qrels/runs are small relative to the corpus: they are parsed
driver-side into Arrow and lifted to Datasets; the expensive side of every
join against them is handled by broadcast (J1/J3/J4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def read_queries(path: str) -> pd.DataFrame:
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            qid, _, text = line.partition("\t")
            rows.append({"qid": qid.strip(), "text": text})
    return pd.DataFrame(rows, columns=["qid", "text"])


def read_qrels(path: str) -> pd.DataFrame:
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            t = line.split()
            if len(t) < 4:
                continue
            rel = int(float(t[3]))
            if rel > 0:  # reference drops rel<=0 rows (AllRelRcds.java:52-63)
                rows.append({"qid": t[0], "docid": t[2], "rel": rel})
    return pd.DataFrame(rows, columns=["qid", "docid", "rel"])


def read_run(path: str, num_wanted: int | None = None,
             auto_sort: bool = True) -> pd.DataFrame:
    """→ DataFrame(qid, docid, rank, score). Handles 6/3/2-column formats."""
    rows = []
    with open(path, encoding="utf-8") as f:
        for pos, line in enumerate(f):
            t = line.split()
            if not t:
                continue
            if len(t) >= 6:
                rows.append((t[0], t[2], int(t[3]), float(t[4])))
            elif len(t) == 3:
                rows.append((t[0], t[1], 0, float(t[2])))
            elif len(t) == 2:
                # 2-col: order of appearance defines the ranking
                rows.append((t[0], t[1], 0, -float(pos)))
    df = pd.DataFrame(rows, columns=["qid", "docid", "rank", "score"])
    if auto_sort:
        df = resort_run(df, num_wanted)
    return df


def resort_run(df: pd.DataFrame, num_wanted: int | None = None) -> pd.DataFrame:
    """Re-sort by (score desc, docid asc) per query, reassign ranks 1..n,
    truncate to num_wanted — the AUTO_SORT_TOP_DOCS behavior."""
    out = []
    for qid, g in df.groupby("qid", sort=True):
        g = g.sort_values(["score", "docid"], ascending=[False, True],
                          kind="mergesort")
        if num_wanted is not None:
            g = g.head(num_wanted)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1)
        out.append(g)
    return pd.concat(out, ignore_index=True) if out else df


def _run_lines(df: pd.DataFrame, run_name: str, docid_col: str) -> str:
    """Vectorized TREC 6-col formatting for one (already sorted) frame."""
    scores = np.char.mod("%.6f", df["score"].to_numpy(dtype=np.float64))
    s = (df["qid"].astype(str) + "\tQ0\t" + df[docid_col].astype(str) + "\t"
         + df["rank"].astype(np.int64).astype(str) + "\t"
         + pd.Series(scores, index=df.index) + f"\t{run_name}\n")
    return "".join(s.tolist())


def write_run(run, path: str, run_name: str = "ray-bm25",
              docid_col: str = "doc_id") -> None:
    """Run table/Dataset → single TREC res file (trec_eval needs one file).

    A Dataset is sorted cluster-side by (qid, rank) and streamed to the file
    through ``iter_batches`` — the driver only ever holds one batch, so a
    100×-scale run spills in the object store instead of the driver heap.
    Small pandas/Arrow inputs are formatted in one vectorized pass."""
    try:
        import ray.data as rd
        if isinstance(run, rd.Dataset):
            with open(path, "w", encoding="utf-8") as f:
                for b in run.sort(["qid", "rank"]).iter_batches(
                        batch_format="pandas", batch_size=65536):
                    f.write(_run_lines(b, run_name, docid_col))
            return
    except ImportError:
        pass
    if isinstance(run, pa.Table):
        run = run.to_pandas()
    run = run.sort_values(["qid", "rank"], kind="mergesort")
    with open(path, "w", encoding="utf-8") as f:
        f.write(_run_lines(run, run_name, docid_col))
