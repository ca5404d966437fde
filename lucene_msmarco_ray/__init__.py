"""lucene_msmarco_ray — a Ray-Data-native full-text index + BM25 query engine.

A from-scratch reimplementation of the capabilities of the reference repo
``gdebasis/lucene-msmarco`` (a single-JVM Lucene research harness), re-expressed
as Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches`` over zero-copy
Arrow batches, actor pools for stateful stages (segment searchers, heavy
tokenizers), ``groupby`` shuffles for the wide steps (posting-list merge,
per-query analytics), and partitioned Parquet for all persistent state.

Nothing here ports reference code; the reference defines WHAT is computed
(analyzer semantics, BM25/LM-Dirichlet formulas, TREC eval metrics, feedback
models, QPP estimators), all cited by file:line in docstrings.
"""

__version__ = "0.1.0"
