"""S3/S8/S10/S14 source-sink ops that round 1 left untested, driven on real
indexes and synthetic inputs."""

import gzip
import json
import os
from collections import Counter

import pyarrow.dataset as pads
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_msmarco_ray.config import EngineConfig
    from lucene_msmarco_ray.index.build import build_index
    out = str(tmp_path_factory.mktemp("srcidx") / "idx")
    cfg = EngineConfig(analyzer="simple", num_shards=4,
                       salt_docs_per_bucket=128)    # salted: multi-run terms
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    build_index(ds, out, cfg, text_col="text", id_col="doc_id")
    return out


def _corpus_tokens():
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    return {int(i): txt.split() for i, txt in
            zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}


def test_convert_msmarco_v2_jsonl(ray_session, tmp_path):
    from lucene_msmarco_ray.sources.extra import convert_msmarco_v2_jsonl
    p = tmp_path / "part0.json"
    rows = [{"doc_id": "d1", "text": "hello\tworld\nagain"},
            {"doc_id": "d2", "text": "plain"}]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    out = convert_msmarco_v2_jsonl([str(p)], str(tmp_path / "out"))
    t = pads.dataset(out).to_table().sort_by("docid")
    assert t["docid"].to_pylist() == ["d1", "d2"]
    # tabs/newlines cleaned to spaces (S3 contract)
    assert t["text"].to_pylist()[0] == "hello world again"


def test_write_sparse_vecs_and_vocab(small_index, tmp_path):
    from lucene_msmarco_ray.sources.extra import dump_vocab_df, write_sparse_vecs
    vec_dir, vocab_path = write_sparse_vecs(small_index, str(tmp_path / "sv"))
    docs = _corpus_tokens()
    # vocab: one line per DISTINCT term (salt runs must not duplicate),
    # sorted, ids dense
    lines = open(vocab_path).read().splitlines()
    terms = [ln.split("\t")[0] for ln in lines]
    assert terms == sorted(set(t for v in docs.values() for t in v))
    assert [int(ln.split("\t")[1]) for ln in lines] == list(range(len(lines)))
    # every doc's sparse vec reproduces its term counts
    t = pads.dataset(vec_dir).to_table()
    assert t.num_rows == len(docs)
    got = dict(zip(t["doc_id"].to_pylist(), t["sparse_vec"].to_pylist()))
    for doc in (min(docs), max(docs)):
        exp = dict(Counter(docs[doc]))
        vec = dict((kv.split(":")[0], int(kv.split(":")[1]))
                   for kv in got[doc].split())
        assert vec == exp
    # S14: df dump aggregates across salt runs
    vp = dump_vocab_df(small_index, str(tmp_path / "vocab_df.txt"))
    df_lines = dict(ln.split("\t") for ln in open(vp).read().splitlines())
    exp_df = Counter(t for v in docs.values() for t in set(v))
    assert {k: int(v) for k, v in df_lines.items()} == dict(exp_df)


def test_write_preprocessed(ray_session, tmp_path):
    import ray.data as rd

    from lucene_msmarco_ray.sources.extra import write_preprocessed
    ds = rd.from_items([{"doc_id": 1, "text": "The Quick  Fox"},
                        {"doc_id": 2, "text": "B 42"}])
    out = write_preprocessed(ds, str(tmp_path / "pre.tsv"),
                             analyzer_name="simple")
    lines = dict(ln.split("\t") for ln in open(out).read().splitlines())
    assert lines["1"] == "the quick fox"
    assert lines["2"] == "b 42"

def test_read_parquet_sized(ray_session, tmp_path):
    """Tiny inputs stop over-splitting (1 block); the floor keeps map
    parallelism; big inputs would still split at ~32MB/block."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_msmarco_ray.sources.pq import (
        read_parquet_sized,
        sized_num_blocks,
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"a": list(range(1000))}), p)
    assert sized_num_blocks(p) == 1
    assert sized_num_blocks(p, min_blocks=16) == 16
    # a directory of files sums sizes; 3 copies still << 32MB -> 1 block
    d = tmp_path / "dir"
    d.mkdir()
    for i in range(3):
        pq.write_table(pa.table({"a": list(range(1000))}),
                       str(d / f"{i}.parquet"))
    assert sized_num_blocks(str(d)) == 1
    # synthetic large size: 100 GB at 32 MB/block = 3200 blocks
    assert sized_num_blocks(p, target_block_bytes=1024) > 1
    ds = read_parquet_sized(p)
    assert ds.count() == 1000
    assert ds.materialize().num_blocks() == 1
    ds16 = read_parquet_sized(p, min_blocks=16)
    assert ds16.count() == 1000
