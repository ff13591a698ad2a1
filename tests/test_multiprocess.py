"""True multi-process data parallelism (VERDICT r1 item 6): spawn 2 local
jax.distributed CPU processes (2 virtual devices each, Gloo collectives),
run pipeline.host_shard + jax.make_array_from_process_local_data + one
sharded train step end-to-end, and match the single-process result.

This executes the actual jax.process_count() > 1 path of
data/pipeline.py:host_shard/global_batch_from_local that every other test
only runs single-process.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mpa_tpu import train as tr  # noqa: E402
from mpa_tpu.data.synthetic import synthetic_clouds  # noqa: E402
from mpa_tpu.models import MarkovClassifier  # noqa: E402

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """The same one train step as mp_worker.py, unsharded in this process."""
    model = MarkovClassifier(
        num_classes=4, npoints=(16, 8), channels=(16, 16, 32),
        residuals=(True, False, True), encoder_features=64,
    )
    pts, labels = synthetic_clouds(16, num_points=32, num_classes=4)
    tx = tr.make_optimizer("sgd", 0.1, momentum=0.0)
    state = tr.create_train_state(model, jax.random.key(0), jnp.asarray(pts[:2]), tx)
    step = jax.jit(tr.make_train_step(tr.smooth_cls_loss))
    state, loss = step(state, jnp.asarray(pts), jnp.asarray(labels), jax.random.key(1))
    checksum = float(
        sum(float(np.abs(np.asarray(x)).sum()) for x in jax.tree_util.tree_leaves(state.params))
    )
    return float(loss), checksum


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(2)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("MPRESULT ")]
        assert line, f"no MPRESULT in:\n{out}\n{err[-2000:]}"
        results.append(json.loads(line[0][len("MPRESULT "):]))

    for r in results:
        assert r["devices"] == 4 and r["local_devices"] == 2, r
    # Both processes observe the identical global step (loss is a global
    # reduction; params update identically on every process).
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=1e-6)
    assert results[0]["param_checksum"] == pytest.approx(
        results[1]["param_checksum"], rel=1e-6
    )

    ref_loss, ref_checksum = _single_process_reference()
    assert results[0]["loss"] == pytest.approx(ref_loss, abs=1e-4)
    assert results[0]["param_checksum"] == pytest.approx(ref_checksum, rel=1e-5)
