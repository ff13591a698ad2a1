"""Mesh construction and sharding helpers.

Design (How-to-Scale-Your-Model recipe): pick a mesh, annotate shardings, let
XLA insert the collectives. For this workload one ``data`` axis over ICI
suffices; gradients all-reduce with a single psum that XLA derives from the
replicated-params/sharded-batch layout, and BatchNorm's global-batch
reductions become cross-replica automatically because the whole sharded batch
lives inside one jit.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """A named device mesh. Default: every visible device on one 'data' axis.
    Multi-host: call ``jax.distributed.initialize()`` first; ``jax.devices()``
    then spans all hosts and the data axis rides ICI within a slice."""
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a pytree of host arrays with the leading dim sharded."""

    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1))) if np.ndim(x) else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / train state) across the mesh.

    Multi-process: device_put cannot target non-addressable devices, so each
    process contributes its (identical) local copy via
    ``jax.make_array_from_process_local_data`` — for a fully-replicated spec
    the process-local data IS the global array. PRNG key arrays (extended
    dtype, not numpy-convertible) round-trip through their uint32 key data.
    """
    sharding = NamedSharding(mesh, P())
    single = jax.process_count() == 1

    def put(x):
        if single:
            return jax.device_put(x, sharding)
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            data = np.asarray(jax.random.key_data(x))
            g = jax.make_array_from_process_local_data(sharding, data)
            return jax.random.wrap_key_data(g, impl=jax.random.key_impl(x))
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def jit_sharded_train_step(train_step, mesh: Mesh, axis: str = "data"):
    """Jit a (state, points, labels, rng) -> (state, loss) step with the batch
    sharded over ``axis`` and everything else replicated. Donates the state so
    optimizer updates are in-place in HBM."""
    repl = NamedSharding(mesh, P())
    data_sharding = NamedSharding(mesh, P(axis))

    return jax.jit(
        train_step,
        in_shardings=(repl, data_sharding, data_sharding, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
