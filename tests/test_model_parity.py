"""Full-model golden parity: the reference cls Model (KeepHighResolutionModule
ladder + FC head, models/repsurf/repsurf_ssg_umb.py) vs MarkovClassifier with
every weight transplanted, eval mode, deterministic FPS on both sides.

Torch side frozen into tests/fixtures/cls_model_forward.npz (builder in
tests/torch_side/cls_model.py; regenerate with MPA_REGEN_ORACLES=1)."""

import pytest
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_cache import oracle, subtree  # noqa: E402

from mpa_tpu.models import MarkovClassifier  # noqa: E402

# Mirrors torch_side.cls_model's transplant target config.
LADDER = (128, 64, 32, 16, 8)  # scaled ladder for a 256-pt test cloud


def make_jax_model(**overrides):
    kwargs = dict(
        num_classes=15,
        npoints=LADDER,
        channels=(64, 64, 64, 128, 256, 512),
        residuals=(True, False, False, True, True, True),
    )
    kwargs.update(overrides)
    return MarkovClassifier(**kwargs)


def forward_fixture():
    def build():
        from torch_side.cls_model import forward_fixture as f
        return f()

    return oracle("cls_model_forward", build)


class TestFullClsModelParity:
    @pytest.mark.slow
    def test_logits_match(self):
        f = forward_fixture()
        got = np.asarray(
            make_jax_model().apply(
                subtree(f, "variables"), jnp.asarray(f["x_logits"]), train=False
            )
        )
        np.testing.assert_allclose(got, f["want_logits"], atol=5e-4)

    @pytest.mark.slow
    def test_prediction_agreement(self):
        f = forward_fixture()
        got = np.asarray(
            make_jax_model().apply(
                subtree(f, "variables"), jnp.asarray(f["x_pred"]), train=False
            )
        )
        np.testing.assert_array_equal(
            got.argmax(-1), f["want_pred"].argmax(-1)
        )
