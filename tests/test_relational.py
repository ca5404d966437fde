"""General relational operators: per-group top-k (tie-breaks), distinct
counts, deterministic hash sampling (parallelism invariance), and the
two-pass exact quantile (bucket-boundary and all-equal-group edges)."""

import math

import numpy as np
import pandas as pd
import pytest


def test_topk_per_group_ties(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import topk_per_group
    rows = [{"g": "a", "id": i, "v": float(v)}
            for i, v in enumerate([5, 9, 9, 1, 9])] \
        + [{"g": "b", "id": 10 + i, "v": 2.0} for i in range(3)]
    out = topk_per_group(rd.from_items(rows, override_num_blocks=4),
                         ["g"], "v", 2, tie_cols=["id"]).to_pandas() \
        .sort_values(["g", "rank"]).reset_index(drop=True)
    # ties on v=9 break by ascending id; group b ties on v break by id
    assert list(zip(out["g"], out["id"], out["rank"])) == [
        ("a", 1, 1), ("a", 2, 2), ("b", 10, 1), ("b", 11, 2)]
    assert out["rank"].dtype == np.int64


def test_topk_ascending_and_k_larger_than_group(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import topk_per_group
    rows = [{"g": 1, "id": 0, "v": 3.0}, {"g": 1, "id": 1, "v": 1.0}]
    out = topk_per_group(rd.from_items(rows, override_num_blocks=2),
                         ["g"], "v", 5, descending=False,
                         tie_cols=["id"]).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    assert out["id"].tolist() == [1, 0] and out["rank"].tolist() == [1, 2]


def test_group_distinct_count(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import group_distinct_count
    rng = np.random.default_rng(3)
    rows = [{"g": ["x", "y"][int(rng.integers(0, 2))],
             "v": int(rng.integers(0, 7))} for _ in range(300)]
    out = group_distinct_count(
        rd.from_items(rows, override_num_blocks=5), ["g"], "v").to_pandas()
    df = pd.DataFrame(rows)
    expect = df.groupby("g")["v"].nunique()
    got = dict(zip(out["g"], out["n_distinct"]))
    assert got == expect.to_dict()
    assert out["n_distinct"].dtype == np.int64


def test_hash_sample_deterministic_across_parallelism(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import hash_sample
    rows = [{"id": i, "x": i * 2} for i in range(2000)]
    got = [sorted(hash_sample(rd.from_items(rows, override_num_blocks=nb),
                              "id", 0.25).to_pandas()["id"])
           for nb in (1, 7)]
    assert got[0] == got[1]
    # ~25% with slack; disjoint salts give a different but same-size-ish set
    assert 0.2 < len(got[0]) / 2000 < 0.3
    salted = sorted(hash_sample(rd.from_items(rows, override_num_blocks=4),
                                "id", 0.25, salt=99).to_pandas()["id"])
    assert salted != got[0] and 0.2 < len(salted) / 2000 < 0.3


def test_stratified_sample(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import (hash_sample,
                                                   stratified_sample)
    rows = [{"g": ["a", "b", "c"][i % 3], "id": i} for i in range(3000)]
    frac = {"a": 0.5, "b": 0.1}
    got = [sorted(stratified_sample(
        rd.from_items(rows, override_num_blocks=nb), "g", "id", frac)
        .to_pandas()["id"]) for nb in (1, 6)]
    assert got[0] == got[1]          # parallelism-invariant
    df = __import__("pandas").DataFrame(rows)
    out = df[df["id"].isin(got[0])]
    by = out.groupby("g").size()
    assert "c" not in by             # default=0 drops unlisted strata
    assert 0.4 < by["a"] / 1000 < 0.6 and 0.05 < by["b"] / 1000 < 0.15
    # tightening a stratum yields a SUBSET (same hash, lower threshold)
    tight = stratified_sample(rd.from_items(rows, override_num_blocks=4),
                              "g", "id", {"a": 0.2, "b": 0.1}).to_pandas()
    assert set(tight["id"]) <= set(got[0])
    # a uniform stratification equals plain hash_sample
    uni = stratified_sample(rd.from_items(rows, override_num_blocks=4),
                            "g", "id", {}, default=0.3).to_pandas()
    plain = hash_sample(rd.from_items(rows, override_num_blocks=4),
                        "id", 0.3).to_pandas()
    assert sorted(uni["id"]) == sorted(plain["id"])


def _quantile_disc(vals, q):
    s = sorted(vals)
    return s[max(1, math.ceil(q * len(s))) - 1]


def test_group_quantile_exact_vs_bruteforce(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import group_quantile
    rng = np.random.default_rng(11)
    rows = []
    for g, mk in [("neg", lambda: float(rng.normal(-5, 3))),
                  ("mix", lambda: float(rng.normal(0, 1))),
                  ("const", lambda: 42.0)]:
        rows += [{"g": g, "v": mk()} for _ in range(401)]
    ds = rd.from_items(rows, override_num_blocks=6)
    out = group_quantile(ds, ["g"], "v", [0.1, 0.5, 0.99],
                         ["p10", "p50", "p99"]).to_pandas() \
        .set_index("g")
    df = pd.DataFrame(rows)
    for g, sub in df.groupby("g"):
        for q, col in [(0.1, "p10"), (0.5, "p50"), (0.99, "p99")]:
            assert out.loc[g, col] == _quantile_disc(sub["v"], q), (g, col)


def test_group_quantile_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import group_quantile
    ds = rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    out = group_quantile(ds, ["l_returnflag"], "l_extendedprice",
                         [0.5], ["p50"]).to_pandas() \
        .sort_values("l_returnflag").reset_index(drop=True)
    con = duckdb.connect()
    ora = con.execute(
        "SELECT l_returnflag, quantile_disc(l_extendedprice, 0.5) AS p50 "
        "FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet') "
        "GROUP BY 1 ORDER BY 1").df()
    pd.testing.assert_frame_equal(out, ora, check_exact=True)


def test_hash_split(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import hash_sample, hash_split
    rows = [{"id": i} for i in range(5000)]
    frac = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = [hash_split(rd.from_items(rows, override_num_blocks=nb),
                      "id", frac).to_pandas().sort_values("id")
           .reset_index(drop=True) for nb in (1, 6)]
    assert got[0].equals(got[1])          # parallelism-invariant
    df = got[0]
    assert len(df) == 5000                # fractions sum to 1 → no drops
    by = df.groupby("split").size()
    assert 0.75 < by["train"] / 5000 < 0.85
    assert 0.07 < by["val"] / 5000 < 0.13 and 0.07 < by["test"] / 5000 < 0.13
    # first slice == hash_sample at the same fraction/salt
    train = set(df.loc[df["split"] == "train", "id"])
    plain = hash_sample(rd.from_items(rows, override_num_blocks=4),
                        "id", 0.8).to_pandas()
    assert train == set(plain["id"])
    # fractions summing to < 1 subsample (the tail is dropped)
    sub = hash_split(rd.from_items(rows, override_num_blocks=4), "id",
                     {"a": 0.2, "b": 0.1}).to_pandas()
    assert 0.25 < len(sub) / 5000 < 0.35 and set(sub["split"]) == {"a", "b"}


def test_pack_sequences(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import (_M32, _mix32,
                                                   pack_sequences)
    rows = [{"id": i, "n": 1 + (i * 7) % 40} for i in range(2000)]
    got = [pack_sequences(rd.from_items(rows, override_num_blocks=nb),
                          "id", "n", budget=256, num_parts=8)
           .to_pandas().sort_values("id").reset_index(drop=True)
           for nb in (1, 6)]
    assert got[0].equals(got[1])          # parallelism-invariant

    ref = pd.DataFrame(rows)
    ref["h"] = _mix32(ref["id"].to_numpy(), 0)
    ref = ref.sort_values("h").reset_index(drop=True)
    ref["start_off"] = ref["n"].cumsum().shift(fill_value=0)
    ref["bin_id"] = ref["start_off"] // 256
    ref = ref.drop(columns="h").sort_values("id").reset_index(drop=True)
    out = got[0][["id", "n", "start_off", "bin_id"]].astype(np.int64)
    assert out.equals(ref.astype(np.int64))
    # packing covers every token exactly once: offsets tile [0, total)
    srt = got[0].sort_values("start_off")
    assert srt["start_off"].iloc[0] == 0
    assert (srt["start_off"].to_numpy()[1:]
            == (srt["start_off"] + srt["n"]).to_numpy()[:-1]).all()


def test_approx_distinct(ray_session):
    import numpy as np
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import (approx_distinct,
                                                   group_distinct_count)
    # group a: 5000 distinct (> k → estimated); group b: 40 (< k → exact)
    rows = ([{"g": "a", "v": i} for i in range(5000)]
            + [{"g": "b", "v": i % 40} for i in range(400)])
    got = [approx_distinct(rd.from_items(rows, override_num_blocks=nb),
                           ["g"], "v", k=256).to_pandas()
           .sort_values("g").reset_index(drop=True) for nb in (1, 7)]
    assert got[0].equals(got[1])          # parallelism-invariant
    df = got[0].set_index("g")["n_distinct_est"]
    assert df["b"] == 40                  # below k → exact
    assert abs(df["a"] - 5000) / 5000 < 0.2   # ~1/sqrt(256) error regime
    # exact counterpart agrees where exact
    ex = group_distinct_count(rd.from_items(rows, override_num_blocks=4),
                              ["g"], "v").to_pandas().set_index("g")
    assert ex.loc["b", "n_distinct"] == 40


def test_sample_n(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import _mix32, sample_n
    import numpy as np
    rows = [{"id": i, "p": i * 2} for i in range(3000)]
    got = [sample_n(rd.from_items(rows, override_num_blocks=nb),
                    "id", 100).to_pandas().sort_values("id")
           .reset_index(drop=True) for nb in (1, 6)]
    assert got[0].equals(got[1]) and len(got[0]) == 100
    # matches the n smallest hashes exactly
    ids = np.arange(3000)
    h = _mix32(ids, 0)
    want = set(ids[np.argsort(h)[:100]])
    assert set(got[0]["id"]) == want
    # nesting: smaller n is a prefix of larger n
    small = sample_n(rd.from_items(rows, override_num_blocks=4),
                     "id", 25).to_pandas()
    assert set(small["id"]) <= want


def test_take_token_budget_properties(ray_session):
    """Exact-fit prefix semantics, budget monotonicity (bigger budget ⊇
    smaller), determinism across runs/blocking, and salt independence."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from lucene_msmarco_ray.ops.relational import take_token_budget
    rng = np.random.default_rng(4)
    n = 500
    tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "n_tokens": pa.array(
                        rng.integers(1, 200, n).astype(np.int64))})

    def run(budget, salt=0, nblocks=8):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        return take_token_budget(ds, budget, salt=salt).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    small = run(5_000)
    big = run(20_000)
    # every selected doc fits entirely inside the budget
    assert ((small["start_off"] + small["n_tokens"]) <= 5_000).all()
    # only whole docs are dropped: tokens used + smallest remaining doc
    # must overflow (the prefix is maximal for this order)
    # monotone: the smaller budget's selection is a subset of the bigger
    assert set(small["doc_id"]) <= set(big["doc_id"])
    assert len(big) > len(small)
    # deterministic across runs and block counts
    pd.testing.assert_frame_equal(run(5_000, nblocks=1), small)
    # a different salt draws a different (but same-budget-respecting) set
    other = run(5_000, salt=9)
    assert set(other["doc_id"]) != set(small["doc_id"])
    assert ((other["start_off"] + other["n_tokens"]) <= 5_000).all()
