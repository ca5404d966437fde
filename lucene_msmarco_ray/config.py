"""Engine configuration.

Mirrors the reference's properties-file surface (reference:
src/main/java/experiments/SettingsLoader.java:52-64 — index.dir,
retrieve.num_wanted, qpp.* knobs) as a single dataclass.

BM25 defaults are (k1=0.7, b=0.3) per BASELINE.json; the reference's only
explicit constants are k1=1.2, b=0.75 (reference:
src/main/java/indexing/SparseVecWriter.java:157) — both are supported, the
params are plain fields.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class EngineConfig:
    # --- analysis chain (reference: indexing/MsMarcoIndexer.java:25-46) ---
    analyzer: str = "english"          # "english" | "whitespace" | "simple"
    normalize_numbers: bool = True     # the _NUM_ rule (MsMarcoIndexer.java:62-64)
    stopword_file: str | None = None   # custom stop list (reference ships stop.txt)

    # --- BM25 (Lucene 8.8.0 formula; defaults per BASELINE.json) ---
    k1: float = 0.7
    b: float = 0.3

    # --- LM-Dirichlet (reference: retrieval/OneStepRetriever.java:225) ---
    mu: float = 1000.0

    # --- retrieval depths (reference: retrieval/Constants.java:28,56) ---
    num_wanted: int = 1000

    # --- index layout ---
    num_shards: int = 8                # term shards: hash(term) % num_shards
    block_size: int = 128              # postings per block-max block
    # Salted two-stage posting merge: terms whose df exceeds this many docs in
    # one build partition are split into doc-range salt buckets (SURVEY.md I6).
    salt_docs_per_bucket: int = 1 << 18

    # Forward index (per-doc term vectors) partitioned by doc-id range:
    # bucket = doc_id // fwd_docs_per_bucket. Sized so one bucket's rows are
    # a comfortable single read (~65k docs × ~60 terms ≈ 4M small rows).
    fwd_docs_per_bucket: int = 1 << 16
    # Emit the forward index during the build (kind=f rows in the same
    # tokenize pass / partitioned write). It roughly doubles the staged
    # write volume; indexes that never run the feedback/QPP family
    # (term_vectors readers) can turn it off.
    emit_fwd: bool = True

    # --- build ---
    tokenize_batch_size: int = 1024
    tokenize_concurrency: int | None = None  # None → let Ray autoscale tasks

    run_name: str = "ray-bm25"

    def with_(self, **kw) -> "EngineConfig":
        return replace(self, **kw)


DEFAULT = EngineConfig()
