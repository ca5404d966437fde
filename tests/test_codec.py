import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_msmarco_ray.index.codec import (
    decode_postings,
    encode_postings,
    merge_encoded_runs,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**56 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


def test_varbyte_edge():
    assert varbyte_encode(np.array([0])) == b"\x00"
    assert varbyte_encode(np.array([127])) == b"\x7f"
    assert varbyte_encode(np.array([128])) == b"\x80\x01"
    assert varbyte_decode(b"") .size == 0


@given(
    st.sets(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=500),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(docset, data):
    docs = np.array(sorted(docset), dtype=np.int64)
    tfs = np.array(data.draw(st.lists(st.integers(1, 1000),
                                      min_size=len(docs), max_size=len(docs))))
    dls = tfs + 3
    ep = encode_postings(docs, tfs, dls, block_size=16)
    d, t = decode_postings(ep.doc_bytes, ep.tf_bytes, ep.df)
    assert d.tolist() == docs.tolist()
    assert t.tolist() == tfs.tolist()
    assert ep.df == len(docs) and ep.cf == int(tfs.sum())
    # block metadata
    nb = (len(docs) + 15) // 16
    assert len(ep.block_last_doc) == nb
    assert ep.block_last_doc[-1] == docs[-1]
    for i in range(nb):
        sl = slice(i * 16, (i + 1) * 16)
        assert ep.block_max_tf[i] == tfs[sl].max()
        assert ep.block_min_dl[i] == dls[sl].min()


def test_duplicate_doc_rejected():
    with pytest.raises(ValueError):
        encode_postings(np.array([1, 1]), np.array([1, 2]), np.array([3, 3]))


def test_merge_salted_runs():
    d1, t1 = np.arange(0, 50), np.arange(1, 51)
    d2, t2 = np.arange(100, 130), np.arange(2, 32)
    dl = lambda d: d + 5
    r1 = encode_postings(d1, t1, dl(d1), block_size=8)
    r2 = encode_postings(d2, t2, dl(d2), block_size=8)
    merged = merge_encoded_runs([r2, r1], doc_lens_lookup=dl, block_size=8)
    d, t = decode_postings(merged.doc_bytes, merged.tf_bytes, merged.df)
    assert d.tolist() == d1.tolist() + d2.tolist()
    assert t.tolist() == t1.tolist() + t2.tolist()
    assert merged.df == 80
