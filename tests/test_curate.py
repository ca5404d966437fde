"""curate_corpus: fused filter+dedup semantics (ops/curate.py)."""

import pandas as pd


def _curate(df, **kw):
    import ray.data as rd

    from lucene_msmarco_ray.ops.curate import curate_corpus
    out = curate_corpus(rd.from_pandas(df), **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


EN = ("the cat and the dog went to the house and it is that thing "
      "of a kind in it")  # 18 tokens, en markers, has stopwords


def _docs():
    rows = [
        # two exact duplicates of an english doc -> keeper = min id
        {"doc_id": 3, "text": EN},
        {"doc_id": 1, "text": EN},
        # distinct english doc
        {"doc_id": 2, "text": EN + " extra words appended here ok"},
        # too short
        {"doc_id": 4, "text": "the and of"},
        # french -> filtered when langs=('en',)
        {"doc_id": 5, "text": ("le chat et la maison des gens que pour dans "
                               "ce il un une du les en " * 2)},
        # low uniqueness (one token repeated)
        {"doc_id": 6, "text": " ".join(["spam"] * 30)},
    ]
    return pd.DataFrame(rows)


def test_curate_filters_and_dedup(ray_session):
    out = _curate(_docs(), min_tokens=5, langs=("en",), min_uniq_ratio=0.3)
    assert out["doc_id"].tolist() == [1, 2]
    kept = out.set_index("doc_id")
    assert kept.loc[1, "dup_count"] == 2      # doc 3 collapsed into doc 1
    assert kept.loc[2, "dup_count"] == 1
    assert (kept["lang_pred"] == "en").all()
    assert (kept["n_tokens"] >= 5).all()
    assert (kept["uniq_ratio"] >= 0.3).all()


def test_curate_no_filters_keeps_all_hash_groups(ray_session):
    out = _curate(_docs())
    # 6 docs, one exact-dup pair -> 5 hash groups
    assert len(out) == 5
    assert out["dup_count"].sum() == 6
    assert 3 not in out["doc_id"].tolist()


def test_curate_feature_parity_with_textstats(ray_session):
    """Fused features must equal the standalone textstats operators."""
    import ray.data as rd

    from lucene_msmarco_ray.ops.textstats import lang_id, quality_score
    df = _docs().drop_duplicates("text")
    ds = rd.from_pandas(df)
    q = quality_score(ds).to_pandas().set_index("doc_id")
    lang = lang_id(ds).to_pandas().set_index("doc_id")
    out = _curate(df).set_index("doc_id")
    for did in out.index:
        for col in ("n_tokens", "stop_ratio", "mean_token_len", "uniq_ratio"):
            assert out.loc[did, col] == q.loc[did, col], (did, col)
        assert out.loc[did, "lang_pred"] == lang.loc[did, "lang_pred"]
