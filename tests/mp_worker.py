"""Worker process for the true multi-process DP test (test_multiprocess.py).

Each process owns 2 virtual CPU devices, joins a jax.distributed Gloo
coordinator, slices ITS shard of the deterministic global batch with
``pipeline.host_shard``, assembles logically-global arrays with
``pipeline.global_batch_from_local`` (jax.make_array_from_process_local_data),
and runs ONE sharded train step over the global 'data' mesh. Prints a JSON
line with the loss and a parameter checksum; the parent asserts both
processes agree with each other and with a single-process run.

Usage: python mp_worker.py <process_id> <num_processes> <coordinator_port>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(
    f"localhost:{port}", num_processes=nproc, process_id=pid
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from mpa_tpu import train as tr  # noqa: E402
from mpa_tpu.data import pipeline  # noqa: E402
from mpa_tpu.data.synthetic import synthetic_clouds  # noqa: E402
from mpa_tpu.models import MarkovClassifier  # noqa: E402
from mpa_tpu.parallel import make_mesh, replicate, jit_sharded_train_step  # noqa: E402

GLOBAL_BATCH = 16

model = MarkovClassifier(
    num_classes=4, npoints=(16, 8), channels=(16, 16, 32),
    residuals=(True, False, True), encoder_features=64,
)
# Every process regenerates the identical global batch, then keeps only its
# host_shard slice — exactly the multi-host input-feeding contract.
pts, labels = synthetic_clouds(GLOBAL_BATCH, num_points=32, num_classes=4)
local_pts, local_labels = pipeline.host_shard((pts, labels), GLOBAL_BATCH)
assert len(local_pts) == GLOBAL_BATCH // jax.process_count()

mesh = make_mesh(axis_names=("data",))
tx = tr.make_optimizer("sgd", 0.1, momentum=0.0)
state = replicate(
    tr.create_train_state(model, jax.random.key(0), pts[:2], tx), mesh
)
step = jit_sharded_train_step(tr.make_train_step(tr.smooth_cls_loss), mesh)
batch = pipeline.global_batch_from_local((local_pts, local_labels), mesh)
state, loss = step(state, batch[0], batch[1], replicate(jax.random.key(1), mesh))

checksum = float(
    sum(float(np.abs(np.asarray(x)).sum()) for x in jax.tree_util.tree_leaves(state.params))
)
print(
    "MPRESULT " + json.dumps({
        "pid": pid,
        "devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "loss": float(loss),
        "param_checksum": checksum,
    }),
    flush=True,
)
