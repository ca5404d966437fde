"""BPE tokenization (T7): merge learning goldens, encode/decode round-trip,
model persistence, and the Ray pretokenize + mu-sweep path.
Reference workflow: tokenization/bpe_msmarco.sh (yttm train/encode, marker
strip, whitespace-analyzer index, LM-Dirichlet mu sweep)."""

import pytest

from lucene_msmarco_ray.analysis.bpe import (
    MARKER,
    BpeModel,
    train_bpe,
)


def test_merge_learning_golden():
    # classic tiny example: 'low'x5, 'lowest'x2 — first merges are the most
    # frequent adjacent pairs with deterministic lexicographic tie-break
    freqs = {"low": 5, "lowest": 2}
    m = train_bpe(freqs, num_merges=10)
    # pairs (o,w) and (MARKER+l,o) both occur 7x; lexicographic tie-break
    # picks ('o','w') (the ▁ marker U+2581 sorts after ascii letters)
    assert m.merges[0] == ("o", "w")
    assert m.merges[1] == (MARKER + "l", "ow")
    # 'low' becomes a single symbol
    assert m.encode_word("low") == (MARKER + "low",)


def test_encode_decode_roundtrip():
    freqs = {"hello": 3, "help": 2, "world": 4}
    m = train_bpe(freqs, num_merges=20)
    text = "hello   world help hello"
    toks = m.encode(text, strip_marker=False)
    assert BpeModel.decode(toks) == "hello world help hello"
    # unseen words still segment (down to characters if needed) and decode
    toks2 = m.encode("zebra hello", strip_marker=False)
    assert BpeModel.decode(toks2) == "zebra hello"
    # marker stripping: reference `sed 's/▁//g'` behavior
    assert all(MARKER not in t for t in m.encode(text, strip_marker=True))


def test_model_save_load(tmp_path):
    m = train_bpe({"abab": 4, "ab": 2}, num_merges=5)
    p = str(tmp_path / "model.bpe.json")
    m.save(p)
    m2 = BpeModel.load(p)
    assert m2.merges == m.merges
    assert m2.encode_word("abab") == m.encode_word("abab")


def test_bpe_mu_sweep_pipeline(ray_session, tmp_path):
    """End-to-end bpe_msmarco.sh equivalent at fixture scale: encoded corpus
    indexes under the whitespace analyzer and every mu leg retrieves."""
    import ray.data as rd

    from lucene_msmarco_ray.analysis.bpe import bpe_mu_sweep
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    queries = {"1": "table value hash", "2": "window sort merge"}
    runs = bpe_mu_sweep(docs, queries, str(tmp_path / "bpe_idx"),
                        mus=(100, 1000), num_merges=30, k=10)
    assert set(runs) == {100, 1000}
    for mu, run in runs.items():
        df = run.to_pandas()
        assert len(df) > 0
        assert set(df.columns) == {"qid", "doc_id", "rank", "score"}
    # different mu ⇒ different scores (the sweep actually varies smoothing)
    s100 = runs[100].to_pandas().sort_values(["qid", "doc_id"])["score"]
    s1000 = runs[1000].to_pandas().sort_values(["qid", "doc_id"])["score"]
    assert not s100.reset_index(drop=True).equals(s1000.reset_index(drop=True))
