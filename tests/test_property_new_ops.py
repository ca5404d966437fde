"""Property-based parity tests for the round-3 operators: randomized
inputs against plain pandas/Counter reference implementations. Hypothesis
drives the shapes; every example runs the REAL distributed operator."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))


@st.composite
def _runs(draw):
    n_docs = draw(st.integers(2, 12))
    out = []
    for _ in range(draw(st.integers(1, 3))):
        docs = draw(st.permutations(list(range(n_docs))))
        depth = draw(st.integers(1, n_docs))
        out.append([(d, r + 1) for r, d in enumerate(docs[:depth])])
    return out


@_SET
@given(_runs())
def test_rrf_fuse_matches_reference(ray_session, runs):
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import rrf_fuse
    dss = [rd.from_arrow(pa.table({
        "qid": pa.array(["q"] * len(r)),
        "doc_id": pa.array([d for d, _ in r], pa.int64()),
        "rank": pa.array([k for _, k in r], pa.int64())}))
        for r in runs]
    out = rrf_fuse(dss, k_rrf=60).to_pandas()
    got = dict(zip(out["doc_id"], out["rrf_micro"]))
    exp: dict[int, int] = {}
    for r in runs:
        for d, k in r:
            exp[d] = exp.get(d, 0) + 10 ** 12 // (60 + k)
    assert got == exp


@_SET
@given(st.lists(st.tuples(st.integers(0, 3),
                          st.integers(-30000, 30000)),
                min_size=2, max_size=60))
def test_group_zscore_matches_reference(ray_session, rows):
    import pandas as pd
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import group_zscore
    df = pd.DataFrame(rows, columns=["g", "v"])
    df["rid"] = np.arange(len(df))
    ds = rd.from_arrow(pa.table({
        "rid": pa.array(df["rid"].to_numpy(np.int64)),
        "g": pa.array(df["g"].to_numpy(np.int64)),
        "v": pa.array(df["v"].to_numpy(np.float64))}))
    out = group_zscore(ds, ["g"], "v").to_pandas() \
        .sort_values("rid").reset_index(drop=True)
    cents = np.floor(df["v"].to_numpy(np.float64) * 100.0 + 0.5) \
        .astype(np.int64)
    for gid, grp in df.assign(c=cents).groupby("g"):
        n = float(len(grp))
        s = float(grp["c"].sum())
        s2 = float((grp["c"] * grp["c"]).sum())
        mean = s / n / 100.0
        std = np.sqrt(max((s2 / n - (s / n) * (s / n)) / 10000.0, 0.0))
        sel = out[out["g"] == gid]
        r6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6
        assert (sel["group_mean"] == r6(mean)).all()
        assert (sel["group_std"] == r6(std)).all()
        v = sel["v"].to_numpy(np.float64)
        z = (v - mean) / std if std > 0 else np.zeros(len(sel))
        assert np.array_equal(sel["zscore"].to_numpy(), r6(z))


def test_group_zscore_multicol_pipe_values(ray_session):
    """Multi-column groups whose STRING values contain '|' must not
    collide: ('a|b','c') and ('a','b|c') are distinct groups. A
    '|'-joined broadcast key would map both to 'a|b|c'."""
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import group_zscore
    rows = [
        {"rid": 0, "g1": "a|b", "g2": "c", "v": 10.0},
        {"rid": 1, "g1": "a|b", "g2": "c", "v": 20.0},
        {"rid": 2, "g1": "a", "g2": "b|c", "v": 100.0},
        {"rid": 3, "g1": "a", "g2": "b|c", "v": 300.0},
    ]
    out = group_zscore(rd.from_items(rows, override_num_blocks=2),
                       ["g1", "g2"], "v").to_pandas() \
        .sort_values("rid").reset_index(drop=True)
    assert out["group_mean"].tolist() == [15.0, 15.0, 200.0, 200.0]
    assert out["group_std"].tolist() == [5.0, 5.0, 100.0, 100.0]
    assert out["zscore"].tolist() == [-1.0, 1.0, -1.0, 1.0]


@_SET
@given(st.lists(st.sampled_from(["a", "b", "c", "dd", "ee", "f", "g", "hh"]),
                min_size=1, max_size=200),
       st.integers(2, 6))
def test_heavy_hitters_matches_counter(ray_session, toks, k):
    from collections import Counter

    import ray.data as rd

    from lucene_msmarco_ray.ops.textstats import heavy_hitters
    # spread tokens over several docs/blocks to exercise the MG merge
    docs = [" ".join(toks[i::5]) for i in range(5)]
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(docs)],
                       override_num_blocks=3)
    out = heavy_hitters(ds, k=k).to_pandas()
    counts = Counter(toks)
    total = sum(counts.values())
    exp = {t: c for t, c in counts.items() if c * k > total}
    got = {} if out.empty else dict(zip(out["term"], out["cf"]))
    assert got == exp


def test_new_ops_parallelism_invariant(ray_session):
    """The round-3 operators must emit identical results at any input
    partitioning — the property the driver's correctness gate relies on
    when it runs at a different CPU count."""
    import ray.data as rd

    from lucene_msmarco_ray.ops.events import cohort_retention, funnel_counts
    from lucene_msmarco_ray.ops.relational import group_zscore
    from lucene_msmarco_ray.ops.textstats import (bigram_lm_perplexity,
                                                  heavy_hitters)
    import datetime as dt
    rng = np.random.RandomState(3)
    texts = [" ".join(rng.choice(list("abcdefgh"), rng.randint(0, 12)))
             for _ in range(40)]
    base = dt.datetime(2024, 1, 1)
    events = [{"event_id": i, "user_id": int(rng.randint(0, 6)),
               "ts": base + dt.timedelta(seconds=int(rng.randint(0, 5000))),
               "event_type": str(rng.choice(["view", "click"])),
               "value": float(rng.randint(0, 100)) / 4}
              for i in range(120)]

    def docs(nb):
        return rd.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)],
            override_num_blocks=nb)

    def evs(nb):
        return rd.from_items(events, override_num_blocks=nb)

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for op, mk in [
        (lambda d: heavy_hitters(d, k=4), docs),
        (lambda d: bigram_lm_perplexity(d, concurrency=1), docs),
        (lambda d: funnel_counts(d, ["view", "click"], 1000), evs),
        (lambda d: cohort_retention(d, period_seconds=1000), evs),
        (lambda d: group_zscore(
            rd.from_items([{"g": e["user_id"], "rid": e["event_id"],
                            "v": e["value"]} for e in events],
                          override_num_blocks=d), ["g"], "v"),
         lambda nb: nb),
    ]:
        a = canon(op(mk(1)).to_pandas())
        b = canon(op(mk(7)).to_pandas())
        assert a.equals(b), op
