"""String/semi-structured column operators for curation pipelines.

Two ops every large-scale text pipeline needs that the rest of the ops/
family doesn't cover:

* :func:`redact` — PII-style regex scrubbing (emails, ids, custom
  patterns). Pure Arrow RE2 kernels (``count_substring_regex`` +
  ``replace_substring_regex``): zero-copy streaming, no Python in the
  loop, no shuffle — the 100-TB shape is a pass over text blocks.
* :func:`extract_int_field` — pull a numeric field out of a
  semi-structured string column (JSON-ish props, log lines) via an RE2
  named capture group (``extract_regex``), without a JSON parser in the
  hot path. :func:`extract_field_agg` composes it with the standard
  partial-aggregate discipline (per-batch combine, then a group-count
  sized exchange).

Both use RE2 — the same dialect DuckDB's regexp_* functions use — so the
SQL oracles replay the exact semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def redact(ds, patterns: list[tuple[str, str]], text_col: str = "text",
           id_col: str = "doc_id"):
    """→ (doc_id, text_redacted, n_redactions): apply ``patterns`` as
    ordered (regex, replacement) rewrites; ``n_redactions`` counts matches
    of each pattern against the text state it actually rewrote (sequential
    semantics — a replacement can create or destroy later patterns'
    matches, and the count reflects that, exactly like a chained
    regexp_replace in SQL)."""
    pats = [(str(p), str(r)) for p, r in patterns]

    def f(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = np.zeros(len(col), dtype=np.int64)
        for pat, repl in pats:
            n += pc.count_substring_regex(col, pattern=pat) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            col = pc.replace_substring_regex(col, pattern=pat,
                                             replacement=repl)
        return pa.table({
            "doc_id": batch[id_col].cast(pa.int64()),
            "text_redacted": col,
            "n_redactions": pa.array(n),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def extract_int_field(ds, pattern: str, src_col: str, id_col: str,
                      out_col: str = "value"):
    """→ (id, out_col int64): first match of ``pattern`` (which must
    contain exactly one NAMED group, e.g. ``(?P<v>\\d+)``) cast to int64;
    null where the pattern does not match."""

    def f(batch: pa.Table) -> pa.Table:
        col = batch[src_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        st = pc.extract_regex(col, pattern=pattern)
        field = st.type.field(0).name
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            out_col: pc.struct_field(st, field).cast(pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def extract_field_agg(ds, pattern: str, src_col: str, group_col: str,
                      out_sum: str = "sum_value", out_n: str = "n_rows"):
    """Per-group sum/count of an extracted numeric field —
    → (group_col, sum_value, n_rows). Partial-aggregate discipline: each
    batch collapses to one row per group present in it, so the exchange
    carries O(groups × blocks) rows, never the events."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[src_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        st = pc.extract_regex(col, pattern=pattern)
        field = st.type.field(0).name
        fv = pc.struct_field(st, field)
        ok = pc.is_valid(fv).to_numpy(zero_copy_only=False)
        v = fv.cast(pa.int64()).fill_null(0).to_numpy(zero_copy_only=False)
        g = batch[group_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(g, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, np.where(ok, v, 0).astype(np.int64))
        # n_rows counts MATCHED rows only (mirrors COUNT(try_cast(...)))
        cnt = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(cnt, inv, ok.astype(np.int64))
        return pa.table({group_col: pa.array(uniq),
                         "__s": pa.array(sums), "__n": pa.array(cnt)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(group_col).aggregate(Sum("__s"), Sum("__n")))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({group_col: batch[group_col],
                         out_sum: batch["sum(__s)"].cast(pa.int64()),
                         out_n: batch["sum(__n)"].cast(pa.int64())})

    return agg.map_batches(rename, batch_format="pyarrow")
