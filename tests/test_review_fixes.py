"""Regression tests for the round-1 code-review findings: NaN-gradient leaks
through masked zero-divisions, eval tail-batch dropping, augmentation flag
gating, and silent prefetch-thread failures."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpa_tpu import geometry  # noqa: E402
from mpa_tpu.nn import UmbrellaSurfaceConstructor, sample_and_group  # noqa: E402
from mpa_tpu.data import pipeline  # noqa: E402
from mpa_tpu.parallel import make_mesh  # noqa: E402


def finite_grads(fn, x):
    g = jax.grad(fn)(x)
    return bool(jnp.all(jnp.isfinite(g)))


class TestNanGradientGuards:
    def test_xyz2sphere_grad_at_zero(self):
        x = jnp.zeros((1, 4, 3))
        assert finite_grads(lambda p: jnp.sum(geometry.xyz2sphere(p)), x)

    def test_xyz2sphere_grad_at_pole(self):
        # |z|/rho == 1 exactly: arccos' is infinite without the clip guard.
        x = jnp.array([[[0.0, 0.0, 2.0], [0.0, 0.0, -3.0]]])
        assert finite_grads(lambda p: jnp.sum(geometry.xyz2sphere(p)), x)

    def test_sample_and_group_polar_grads(self):
        # Ball query always includes the centre's self-match -> exact-zero
        # offsets feed xyz2sphere (the repsurf_ssg_2x training path).
        r = np.random.default_rng(0)
        center = jnp.asarray(r.normal(size=(2, 64, 3)).astype(np.float32))
        normal = jnp.asarray(r.normal(size=(2, 64, 10)).astype(np.float32))

        def loss(c):
            _, _, grouped = sample_and_group(
                16, 0.4, 8, c, normal, None, return_polar=True
            )
            return jnp.sum(grouped**2)

        assert finite_grads(loss, center)

    def test_cal_normal_degenerate_marker_detected_by_repair(self):
        # Degenerates emit zero normals (gradient-safe marker); the repair
        # must treat them exactly like the reference treats NaN.
        tri = np.zeros((1, 2, 2, 3, 3), np.float32)
        tri[0, :, 1] = np.random.default_rng(0).normal(size=(2, 3, 3))  # fan 1 valid
        n = geometry.cal_normal(jnp.asarray(tri), is_group=True)
        assert bool(jnp.all(n[:, :, 0] == 0.0))  # degenerate fan marked
        c = geometry.cal_center(jnp.asarray(tri))
        rn, _ = geometry.check_nan_umbrella(n, c)
        # repaired with fan 1's valid normal
        np.testing.assert_allclose(np.asarray(rn[:, :, 0]), np.asarray(n[:, :, 1]), atol=1e-6)

    def test_umbrella_constructor_grads_with_duplicates(self):
        r = np.random.default_rng(1)
        pts = r.normal(size=(1, 32, 3)).astype(np.float32)
        pts[0, 1] = pts[0, 0]  # duplicated point -> degenerate umbrella fans
        model = UmbrellaSurfaceConstructor(k=9, random_inv=False)
        variables = jax.jit(
            lambda r, x: model.init({"params": r}, x, train=False)
        )(jax.random.key(0), jnp.asarray(pts))

        def loss(p):
            out = model.apply(variables, p, train=False)
            return jnp.sum(out**2)

        g = jax.jit(jax.grad(loss))(jnp.asarray(pts))
        assert bool(jnp.all(jnp.isfinite(g))), "NaN leaked through the repair"


class TestEvalCoversAllSamples:
    def test_batches_keep_tail(self):
        from mpa_tpu.cli.train import batches

        x = np.arange(10)
        got = [b[0] for b in batches((x,), 4, drop_last=False)]
        assert sum(len(b) for b in got) == 10
        np.testing.assert_array_equal(np.concatenate(got), x)  # sequential


class TestAugFlagGating:
    def test_scale_only_does_not_shift(self):
        # random_scale is multiplicative: the origin is a fixed point. A shift
        # would move it; scale-only must not.
        from mpa_tpu.data import augment

        pts = jnp.zeros((2, 8, 3))
        scaled = augment.random_scale(jax.random.key(0), pts)
        np.testing.assert_array_equal(np.asarray(scaled), 0.0)
        shifted = augment.random_shift(jax.random.key(0), pts)
        assert not np.allclose(np.asarray(shifted), 0.0)


class TestPrefetchErrorPropagation:
    def test_producer_exception_reaches_consumer(self):
        mesh = make_mesh(axis_names=("data",))

        def bad_iter():
            yield (np.ones((8, 2), np.float32),)
            raise ValueError("corrupt sample")

        it = pipeline.prefetch_to_device(bad_iter(), mesh)
        next(it)  # first batch fine
        with pytest.raises(ValueError, match="corrupt sample"):
            next(it)


@pytest.mark.slow
class TestRepSurf2xTrains:
    def test_loss_decreases(self):
        """The 2x model trains through the previously NaN-poisoned umbrella +
        polar grouping path (regression for the two gradient findings)."""
        from mpa_tpu.models import RepSurfSSG2x
        from mpa_tpu import train as tr
        from mpa_tpu.data.synthetic import synthetic_clouds

        model = RepSurfSSG2x(num_classes=4, umbrella_k=5)
        # B8 x 2 steps: the regression (NaN poisoning) reproduces on the very
        # first backward; the loss-decrease check only needs two curve points
        # (deterministic seeds). This test runs ~19 s/step on the image's
        # single CPU core — size is suite wall time, not coverage.
        pts, labels = synthetic_clouds(8, num_points=600, num_classes=4)
        pts_j, labels_j = jnp.asarray(pts), jnp.asarray(labels)
        # duplicate a point per cloud: degenerate umbrella fans guaranteed
        pts_j = pts_j.at[:, 1].set(pts_j[:, 0])

        tx = tr.make_optimizer("adam-l2", 1e-3)
        state = tr.create_train_state(model, jax.random.key(0), pts_j[:2], tx)
        step = jax.jit(tr.make_train_step(tr.smooth_cls_loss))
        losses = []
        for _ in range(2):
            state, loss = step(state, pts_j, labels_j, jax.random.key(1))
            losses.append(float(loss))
        assert all(np.isfinite(losses)), losses
        assert losses[-1] < losses[0], losses


class TestR4ReviewFixes:
    """Regression tests for the round-4 self-review findings: the FP part-seg
    variant must survive the CLI's unconditional window-mode kwargs, and the
    compile warmup must tolerate a train set smaller than one batch."""

    def test_partseg_fp_accepts_cli_window_kwargs(self):
        # cli/train.py passes these to every partseg-task model; before the
        # fix this raised TypeError and broke the shapenetpart_fp preset.
        from mpa_tpu.models import get_model

        m = get_model(
            "markov_partseg_fp", num_parts=8, num_categories=4,
            npoints=(32, 16, 8, 4), neighbor_mode="exact",
            fps_min_band=512, fps_min_samples=64,
        )
        assert m is not None

    def test_partseg_fp_rejects_window_mode_clearly(self):
        from mpa_tpu.models import get_model

        with pytest.raises(ValueError, match="markov_partseg"):
            get_model("markov_partseg_fp", neighbor_mode="window")

    @pytest.mark.slow
    def test_train_cli_with_subbatch_train_set(self, tmp_path):
        # Train set (4 clouds) < one drop_last batch (8): zero train steps per
        # epoch is valid — the warmup must skip instead of raising
        # StopIteration, and eval must still run.
        from mpa_tpu.cli import train as cli

        rc = cli.main([
            "--task", "completion", "--dataset", "synthetic",
            "--synthetic_train_clouds", "4", "--batch_size", "8",
            "--num_points", "64", "--epochs", "1", "--num_votes", "1",
            "--log_dir", str(tmp_path),
        ])
        assert rc in (0, None)
        log = (tmp_path / "completion_synthetic" / "train.log").read_text()
        assert "skipping compile warmup" in log
