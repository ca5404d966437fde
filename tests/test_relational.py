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
