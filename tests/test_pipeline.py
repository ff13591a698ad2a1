"""Input pipeline tests: batching, background prefetch with sharded
device_put, and multi-host-shaped global assembly on the 8-device mesh."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpa_tpu.data import pipeline  # noqa: E402
from mpa_tpu.parallel import make_mesh  # noqa: E402


class TestBatchIterator:
    def test_covers_all_and_drops_tail(self):
        x = np.arange(10)
        y = np.arange(10) * 2
        batches = list(pipeline.batch_iterator((x, y), 4, rng=np.random.default_rng(0)))
        assert len(batches) == 2  # drop_last
        seen = np.concatenate([b[0] for b in batches])
        assert len(np.unique(seen)) == 8
        for bx, by in batches:
            np.testing.assert_array_equal(by, bx * 2)  # co-indexed

    def test_sequential_when_no_rng(self):
        x = np.arange(8)
        b = list(pipeline.batch_iterator((x,), 4))
        np.testing.assert_array_equal(b[0][0], [0, 1, 2, 3])


class TestPrefetch:
    def test_yields_sharded_device_arrays(self):
        mesh = make_mesh(axis_names=("data",))
        x = np.arange(32, dtype=np.float32).reshape(32, 1)
        it = pipeline.batch_iterator((x,), 16)
        out = list(pipeline.prefetch_to_device(it, mesh))
        assert len(out) == 2
        arr = out[0][0]
        assert isinstance(arr, jax.Array)
        assert len(arr.sharding.device_set) == jax.device_count()
        np.testing.assert_array_equal(np.asarray(arr), x[:16])

    def test_transform_applied_on_host_thread(self):
        mesh = make_mesh(axis_names=("data",))
        x = np.ones((16, 2), np.float32)
        it = pipeline.batch_iterator((x,), 8)
        out = list(
            pipeline.prefetch_to_device(it, mesh, transform=lambda b: (b[0] * 3,))
        )
        np.testing.assert_array_equal(np.asarray(out[0][0]), 3.0)

    def test_consumable_by_jitted_step(self):
        mesh = make_mesh(axis_names=("data",))
        x = np.random.default_rng(0).normal(size=(32, 8)).astype(np.float32)
        it = pipeline.batch_iterator((x,), 16)
        f = jax.jit(lambda a: jnp.sum(a * a))
        totals = [float(f(b[0])) for b in pipeline.prefetch_to_device(it, mesh)]
        assert len(totals) == 2 and all(np.isfinite(totals))


class TestMultiHost:
    def test_host_shard_single_process(self):
        x = np.arange(16)
        (shard,) = pipeline.host_shard((x,), 16)
        np.testing.assert_array_equal(shard, x)  # 1 process owns everything

    def test_global_batch_from_local(self):
        mesh = make_mesh(axis_names=("data",))
        x = np.random.default_rng(1).normal(size=(16, 4)).astype(np.float32)
        g = pipeline.global_batch_from_local((x,), mesh)[0]
        assert g.shape == (16, 4)
        assert len(g.sharding.device_set) == jax.device_count()
        np.testing.assert_array_equal(np.asarray(g), x)
