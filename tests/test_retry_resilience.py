"""Task-level fault tolerance: a stage that crashes on its first attempt
completes correctly when configured with retry_exceptions — the pattern
every long pipeline stage in this repo can adopt at 100-TB scale, where
task attrition (spot preemption, OOM kills) is routine, not exceptional."""

import os
import tempfile

import pyarrow as pa
import pytest


def _make_flaky(sentinel: str):
    """Closure (cloudpickled by value, so workers need no test-module
    import) that raises on the first call per sentinel path, succeeds
    after — simulating a transient worker failure mid-pipeline."""

    def flaky(batch: pa.Table) -> pa.Table:
        if not os.path.exists(sentinel):
            with open(sentinel, "w") as f:
                f.write("failed-once")
            raise RuntimeError("injected transient failure")
        import pyarrow.compute as pc
        return batch.set_column(
            batch.schema.get_field_index("x"), "x",
            pc.add(batch["x"], 1))

    return flaky


def test_map_batches_survives_transient_task_failure(ray_session):
    import ray.data as rd
    sentinel = os.path.join(tempfile.mkdtemp(), "failed_once")
    ds = rd.from_arrow(pa.table({"x": pa.array(range(100), pa.int64())}))
    out = ds.map_batches(
        _make_flaky(sentinel), batch_format="pyarrow",
        batch_size=None,
        # retry application exceptions — transient-failure tolerance is
        # opt-in per stage in Ray (extra kwargs pass through to
        # ray.remote); system failures (worker death) retry by default
        retry_exceptions=True, max_retries=3,
    ).to_pandas()
    assert sorted(out["x"].tolist()) == list(range(1, 101))
    assert os.path.exists(sentinel)    # the failure really happened


def test_failure_without_retry_propagates(ray_session):
    import ray.data as rd
    sentinel = os.path.join(tempfile.mkdtemp(), "failed_once")
    ds = rd.from_arrow(pa.table({"x": pa.array(range(10), pa.int64())}))
    with pytest.raises(Exception):
        ds.map_batches(_make_flaky(sentinel), batch_format="pyarrow",
                       batch_size=None).to_pandas()
