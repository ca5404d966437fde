"""Doc-partitioned sharded search must be IDENTICAL to the single-reader
query-partitioned path — scores, ranks, and tie-breaks."""

import pandas as pd
import pytest

from lucene_msmarco_ray.config import EngineConfig
from lucene_msmarco_ray.index.build import build_index

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def salted_index(ray_session, tmp_path_factory):
    import ray.data as rd
    out = str(tmp_path_factory.mktemp("shidx") / "idx")
    cfg = EngineConfig(analyzer="simple", num_shards=4, block_size=16,
                       salt_docs_per_bucket=128)   # 500 docs → 4 doc shards
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    stats = build_index(ds, out, cfg, text_col="text", id_col="doc_id")
    assert stats["n_salt"] == 4
    return out


QUERIES = [{"qid": "1", "text": "table value hash"},
           {"qid": "2", "text": "window sort merge"},
           {"qid": "9", "text": "table table key"},
           {"qid": "12", "text": "zzmissing"}]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["qid", "rank"]).reset_index(drop=True) \
        .astype({"doc_id": "int64", "rank": "int64"})


@pytest.mark.parametrize("scorer,kw", [
    ("bm25", {"k1": 0.7, "b": 0.3}),
    ("lmdir", {"mu": 1000.0}),
])
def test_sharded_equals_single(salted_index, scorer, kw):
    import ray.data as rd

    from lucene_msmarco_ray.search.searcher import retrieve
    from lucene_msmarco_ray.search.sharded import retrieve_sharded
    qs = rd.from_items(QUERIES, override_num_blocks=2)
    single = _canon(retrieve(qs, salted_index, scorer=scorer, k=50,
                             **kw).to_pandas())
    qs2 = rd.from_items(QUERIES, override_num_blocks=2)
    sharded = _canon(retrieve_sharded(qs2, salted_index, scorer=scorer,
                                      k=50, **kw).to_pandas())
    pd.testing.assert_frame_equal(single, sharded)   # bit-identical scores


def test_sharded_topk_cut_is_global(salted_index):
    """k smaller than per-shard candidate counts: the merge must take the
    global best, not per-shard quotas."""
    import ray.data as rd

    from lucene_msmarco_ray.search.searcher import retrieve
    from lucene_msmarco_ray.search.sharded import retrieve_sharded
    qs = rd.from_items(QUERIES[:1], override_num_blocks=1)
    single = _canon(retrieve(qs, salted_index, scorer="bm25", k=7,
                             k1=0.7, b=0.3).to_pandas())
    qs2 = rd.from_items(QUERIES[:1], override_num_blocks=1)
    sharded = _canon(retrieve_sharded(qs2, salted_index, scorer="bm25",
                                      k=7, k1=0.7, b=0.3).to_pandas())
    assert len(sharded) == 7
    pd.testing.assert_frame_equal(single, sharded)


def test_searcher_pool_matches_retrieve_and_reuses(ray_session,
                                                   tmp_path_factory):
    """The persistent serving pool returns BIT-identical runs to the
    Dataset retrieve() path, answers a second query set on the same
    (warm) actors, caps in-flight futures, and shuts down cleanly."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from lucene_msmarco_ray.config import EngineConfig
    from lucene_msmarco_ray.index.build import build_index
    from lucene_msmarco_ray.search.searcher import retrieve
    from lucene_msmarco_ray.search.service import SearcherPool
    from lucene_msmarco_ray.sources.corpus import read_code_corpus
    from lucene_msmarco_ray.synth import generate_corpus, generate_queries

    d = tmp_path_factory.mktemp("svc")
    files = generate_corpus(300, seed=17, n_files=2, out_dir=str(d))
    idx = str(tmp_path_factory.mktemp("svcidx") / "idx")
    build_index(read_code_corpus(files), idx,
                EngineConfig(analyzer="english", num_shards=4),
                text_col="content", id_col="doc_id", key_col="doc_key")

    qtbl = generate_queries(40, seed=11)
    want = retrieve(rd.from_arrow(qtbl), idx, scorer="bm25", k=20,
                    k1=0.7, b=0.3, concurrency=2,
                    preload=True).to_pandas() \
        .sort_values(["qid", "rank"]).reset_index(drop=True)

    pool = SearcherPool(idx, n_actors=2, scorer="bm25", k=20,
                        num_cpus=0.5, k1=0.7, b=0.3)
    try:
        got = pool.query(qtbl, batch_size=7).to_pandas() \
            .sort_values(["qid", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)   # bit-identical scores
        # same pool, different query set (the serving case)
        q2 = generate_queries(25, seed=23)
        want2 = retrieve(rd.from_arrow(q2), idx, scorer="bm25", k=20,
                         k1=0.7, b=0.3, concurrency=2,
                         preload=True).to_pandas() \
            .sort_values(["qid", "rank"]).reset_index(drop=True)
        got2 = pool.query(q2, batch_size=3, inflight_per_actor=1) \
            .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got2, want2)
    finally:
        pool.shutdown()
    assert pool.actors == []


def test_searcher_pool_empty_queries_typed_schema(ray_session,
                                                  tmp_path_factory):
    import pyarrow as pa

    from lucene_msmarco_ray.config import EngineConfig
    from lucene_msmarco_ray.index.build import build_index
    from lucene_msmarco_ray.search.searcher import RUN_SCHEMA
    from lucene_msmarco_ray.search.service import SearcherPool
    from lucene_msmarco_ray.sources.corpus import read_code_corpus
    from lucene_msmarco_ray.synth import generate_corpus

    d = tmp_path_factory.mktemp("svce")
    files = generate_corpus(60, seed=3, n_files=1, out_dir=str(d))
    idx = str(tmp_path_factory.mktemp("svceidx") / "idx")
    build_index(read_code_corpus(files), idx,
                EngineConfig(analyzer="english", num_shards=2),
                text_col="content", id_col="doc_id", key_col="doc_key")
    pool = SearcherPool(idx, n_actors=1, scorer="bm25", k=5, num_cpus=0.5)
    try:
        empty = pa.table({"qid": pa.array([], pa.string()),
                          "text": pa.array([], pa.string())})
        out = pool.query(empty)
        assert out.schema.equals(RUN_SCHEMA) and out.num_rows == 0
    finally:
        pool.shutdown()
