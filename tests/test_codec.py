import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_msmarco_ray.index.codec import (
    concat_runs,
    decode_all,
    decode_block,
    encode_term_postings,
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
    assert varbyte_decode(b"").size == 0
    with pytest.raises(ValueError):
        varbyte_decode(b"\x80\x80")


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
    tp = encode_term_postings(docs, tfs, dls, block_size=16)
    d, t = decode_all(tp)
    assert d.tolist() == docs.tolist()
    assert t.tolist() == tfs.tolist()
    assert tp.df == len(docs) and tp.cf == int(tfs.sum())
    nb = (len(docs) + 15) // 16
    assert len(tp.b_last) == nb
    assert tp.b_last[-1] == docs[-1] and tp.b_first[0] == docs[0]
    for i in range(nb):
        sl = slice(i * 16, (i + 1) * 16)
        assert tp.b_max_tf[i] == tfs[sl].max()
        assert tp.b_min_dl[i] == dls[sl].min()
        bd, bt = decode_block(tp, i)
        assert bd.tolist() == docs[sl].tolist()
        assert bt.tolist() == tfs[sl].tolist()


def test_duplicate_doc_rejected():
    with pytest.raises(ValueError):
        encode_term_postings(np.array([1, 1]), np.array([1, 2]), np.array([3, 3]))


def test_concat_salted_runs_no_decode():
    d1, t1 = np.arange(0, 50), np.arange(1, 51)
    d2, t2 = np.arange(100, 130), np.arange(2, 32)
    r1 = encode_term_postings(d1, t1, d1 + 5, block_size=8)
    r2 = encode_term_postings(d2, t2, d2 + 5, block_size=8)
    merged = concat_runs([r2, r1])  # order-insensitive
    d, t = decode_all(merged)
    assert d.tolist() == d1.tolist() + d2.tolist()
    assert t.tolist() == t1.tolist() + t2.tolist()
    assert merged.df == 80 and merged.cf == int(t1.sum() + t2.sum())
    # block decode still works across the seam
    for i in range(len(merged.b_count)):
        decode_block(merged, i)
    with pytest.raises(ValueError):
        concat_runs([r1, r1])


def test_group_encoder_matches_per_term():
    """encode_group_postings must be byte-identical to per-term encoding."""
    import numpy as np

    from lucene_msmarco_ray.index.build import (
        group_segment_table,
        rows_to_segment_table,
    )
    from lucene_msmarco_ray.index.codec import (
        encode_group_postings,
        encode_term_postings,
    )
    rng = np.random.default_rng(11)
    codes_l, doc_l, tf_l, dl_l = [], [], [], []
    for t in range(60):
        nd = int(rng.integers(1, 300))
        docs = np.sort(rng.choice(50000, nd, replace=False))
        codes_l.append(np.full(nd, t))
        doc_l.append(docs)
        tf_l.append(rng.integers(1, 9, nd))
        dl_l.append(rng.integers(5, 200, nd))
    codes = np.concatenate(codes_l)
    doc = np.concatenate(doc_l)
    tf = np.concatenate(tf_l)
    dl = np.concatenate(dl_l)
    enc = encode_group_postings(codes, doc, tf, dl, 16)
    terms = np.array([f"t{c}" for c in codes[enc["term_starts"]]])
    gt = group_segment_table(terms, 1, enc)
    bounds = np.concatenate(([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1,
                             [len(codes)]))
    tps = [encode_term_postings(doc[s:e], tf[s:e], dl[s:e], 16)
           for s, e in zip(bounds[:-1], bounds[1:])]
    rt = rows_to_segment_table([f"t{codes[s]}" for s in bounds[:-1]],
                               np.full(len(tps), 1), tps)
    assert gt.schema.equals(rt.schema)
    for col in gt.column_names:
        assert gt[col].combine_chunks().equals(rt[col].combine_chunks()), col
