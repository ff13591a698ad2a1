"""Serving export: StableHLO artifact round-trip equals live inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpa_tpu.models import get_model
from mpa_tpu import train as tr
from mpa_tpu import serve


def _tiny_cls_state():
    model = get_model(
        "markov_cls", num_classes=5, npoints=(16, 8), channels=(8, 8, 8)
    )
    pts = jax.random.normal(jax.random.key(0), (2, 32, 3), jnp.float32)
    tx = tr.make_optimizer("adam-l2", 1e-3, weight_decay=0.0)
    state = tr.create_train_state(model, jax.random.key(1), pts, tx)
    return model, state, pts


def test_export_roundtrip(tmp_path):
    model, state, pts = _tiny_cls_state()
    live = jax.jit(tr.make_eval_step())(state, pts)

    exp = serve.export_inference(model, state.params, state.batch_stats, pts)
    path = str(tmp_path / "cls.shlo")
    serve.save_exported(exp, path, manifest={"model": "markov_cls"})

    infer = serve.load_inference(path)
    out = infer(pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(live), atol=1e-6)

    import json, os

    man = json.load(open(path + ".json"))
    assert man["model"] == "markov_cls"
    assert man["platforms"] and os.path.getsize(path) > 1000


def test_exported_rejects_wrong_shape(tmp_path):
    model, state, pts = _tiny_cls_state()
    exp = serve.export_inference(model, state.params, state.batch_stats, pts)
    path = str(tmp_path / "cls.shlo")
    serve.save_exported(exp, path)
    infer = serve.load_inference(path)
    bad = jnp.zeros((2, 64, 3), jnp.float32)  # wrong N
    try:
        infer(bad)
        raised = False
    except Exception:
        raised = True
    assert raised, "shape-specialized artifact must reject mismatched input"


def test_export_cli(tmp_path):
    """End-to-end: CLI exports a fresh-init cls model artifact."""
    from mpa_tpu.cli import export as export_cli

    out = str(tmp_path / "m.shlo")
    export_cli.main([
        "--preset", "scanobjectnn_cls", "--num_points", "64",
        "--serve_batch", "2", "--out", out,
    ])
    infer = serve.load_inference(out)
    logp = infer(jnp.zeros((2, 64, 3), jnp.float32))
    assert logp.shape == (2, 15)
    assert bool(jnp.isfinite(logp).all())


def test_export_cli_restores_adam_checkpoint(tmp_path):
    """Regression (r5 review): export builds a dummy-SGD state, so the
    checkpoint restore must be weights-only — a full-template restore fails
    for any adam-trained checkpoint (same contract as cli/eval)."""
    from mpa_tpu.cli import export as export_cli
    from mpa_tpu import train as tr
    from mpa_tpu.models import get_model
    from mpa_tpu.train.checkpoint import BestCheckpointer

    model = get_model("markov_cls", num_classes=15)
    pts = jnp.zeros((2, 64, 3), jnp.float32)
    tx = tr.make_optimizer("adam-l2", 1e-3)
    state = tr.create_train_state(model, jax.random.key(0), pts, tx)
    ck = BestCheckpointer(str(tmp_path / "ckpt"))
    assert ck.save_if_best(state, 0.5)

    out = str(tmp_path / "m.shlo")
    export_cli.main([
        "--preset", "scanobjectnn_cls", "--num_points", "64",
        "--serve_batch", "2", "--out", out,
        "--checkpoint", str(tmp_path / "ckpt"),
    ])
    infer = serve.load_inference(out)
    logp = infer(jnp.zeros((2, 64, 3), jnp.float32))
    assert logp.shape == (2, 15)
    assert bool(jnp.isfinite(logp).all())


@pytest.mark.slow
def test_partseg_export_roundtrip(tmp_path):
    """Tuple-input (points, label-onehot) model exports and round-trips."""
    # The published 5-scale architecture at a scaled-down ladder.
    model = get_model("markov_partseg", npoints=(128, 64, 32, 16))
    pts = jax.random.normal(jax.random.key(0), (2, 256, 3), jnp.float32)
    onehot = jax.nn.one_hot(jnp.array([0, 2]), 16)
    tx = tr.make_optimizer("sgd", 0.0)
    state = tr.create_train_state(model, jax.random.key(1), (pts, onehot), tx)
    live = jax.jit(tr.make_eval_step())(state, (pts, onehot))

    exp = serve.export_inference(model, state.params, state.batch_stats, (pts, onehot))
    path = str(tmp_path / "seg.shlo")
    serve.save_exported(exp, path)
    out = serve.load_inference(path)((pts, onehot))
    # The artifact recompiles the same StableHLO; fusion-order fp noise is
    # ~5e-6 on this depth of model (predictions identical).
    np.testing.assert_allclose(np.asarray(out), np.asarray(live), atol=1e-4)
