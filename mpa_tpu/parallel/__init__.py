"""Device-mesh data parallelism over ICI.

The reference has no parallelism at all (SURVEY.md §2.8 — hardcoded
CUDA_VISIBLE_DEVICES, no torch.distributed). This layer is its TPU-native
generalization: a named mesh, batch sharding, replicated params, XLA-inserted
collectives. TP/PP/EP/CP/sequence-parallel are N/A by design at this model
scale (local K=8 attention, N <= 4096 points) — the batch dim is the scaling
axis; the ``model`` mesh axis exists for forward-compatibility and is size 1
in every shipped config.
"""

from mpa_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    jit_sharded_train_step,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "jit_sharded_train_step"]
