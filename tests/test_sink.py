"""Resumable partitioned parquet sink (sources/sink.py)."""

import os

import pandas as pd
import pytest
import ray.data as rd

from lucene_msmarco_ray.sources.sink import (add_hash_bucket,
                                             finished_partitions,
                                             read_partitioned,
                                             write_partitioned)


def _rows(n=600):
    return [{"id": i, "val": (i * 13) % 97} for i in range(n)]


def test_write_read_roundtrip(ray_session, tmp_path):
    root = str(tmp_path / "out")
    ds = add_hash_bucket(rd.from_items(_rows(), override_num_blocks=4),
                         "id", 8)
    res = write_partitioned(ds, root, "bucket")
    assert res == {"written": 8, "skipped": 0}
    assert finished_partitions(root, "bucket") == {str(i) for i in range(8)}

    back = read_partitioned(root, "bucket").to_pandas()
    want = pd.DataFrame(_rows())
    got = back[["id", "val"]].sort_values("id").reset_index(drop=True)
    assert got.equals(want)


def test_resume_skips_committed_partitions(ray_session, tmp_path):
    root = str(tmp_path / "out")
    ds = add_hash_bucket(rd.from_items(_rows(), override_num_blocks=4),
                         "id", 6)
    write_partitioned(ds, root, "bucket")

    # record mtimes, then resume: nothing may be rewritten
    def mtimes():
        return {d: os.path.getmtime(os.path.join(root, d, "part.parquet"))
                for d in os.listdir(root)}

    before = mtimes()
    res = write_partitioned(ds, root, "bucket")
    assert res == {"written": 0, "skipped": 6}
    assert mtimes() == before

    # simulate a crash: partition 3 never committed
    os.remove(os.path.join(root, "bucket=3", "_SUCCESS"))
    assert "3" not in finished_partitions(root, "bucket")
    res = write_partitioned(ds, root, "bucket")
    assert res["written"] == 1 and res["skipped"] == 5
    after = mtimes()
    assert after.pop("bucket=3") > before.pop("bucket=3")
    assert after == before  # only the crashed partition was redone


def test_uncommitted_partition_invisible_and_crash_safe(ray_session,
                                                       tmp_path):
    root = str(tmp_path / "out")
    ds = add_hash_bucket(rd.from_items(_rows(200), override_num_blocks=2),
                         "id", 4)
    write_partitioned(ds, root, "bucket")

    # a torn write: data file without marker, plus a leftover tmp file
    os.remove(os.path.join(root, "bucket=1", "_SUCCESS"))
    with open(os.path.join(root, "bucket=2", ".part.999.tmp"), "wb") as f:
        f.write(b"garbage")

    back = read_partitioned(root, "bucket").to_pandas()
    full = pd.DataFrame(_rows(200))
    assert set(back["bucket"]) == {0, 2, 3}
    assert len(back) < 200

    # resume completes the torn partition; the roundtrip is whole again
    write_partitioned(ds, root, "bucket")
    back = read_partitioned(root, "bucket").to_pandas()
    assert back[["id", "val"]].sort_values("id") \
        .reset_index(drop=True).equals(full)


def test_deterministic_partition_bytes(ray_session, tmp_path):
    roots = []
    for nb, sub in ((1, "a"), (5, "b")):
        root = str(tmp_path / sub)
        ds = add_hash_bucket(rd.from_items(_rows(), override_num_blocks=nb),
                             "id", 4)
        write_partitioned(ds, root, "bucket")
        roots.append(root)
    for d in sorted(os.listdir(roots[0])):
        a = open(os.path.join(roots[0], d, "part.parquet"), "rb").read()
        b = open(os.path.join(roots[1], d, "part.parquet"), "rb").read()
        assert a == b  # byte-identical at any upstream parallelism


def test_explicit_partition_col_values(ray_session, tmp_path):
    root = str(tmp_path / "out")
    rows = [{"k": ["x", "y"][i % 2], "v": i} for i in range(50)]
    res = write_partitioned(rd.from_items(rows, override_num_blocks=3),
                            root, "k")
    assert res["written"] == 2
    assert finished_partitions(root, "k") == {"x", "y"}
    back = read_partitioned(root, "k").to_pandas()
    assert len(back) == 50 and set(back["k"]) == {"x", "y"}


def test_read_partitioned_empty_raises(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_partitioned(str(tmp_path / "nope"), "bucket")
