"""Op-level profile of the part-seg train step on the real chip.

Captures a jax.profiler trace of steady-state steps and prints per-op and
per-category self-time breakdowns via mpa_tpu.utils.profiling (self-contained
xplane parsing — the image's tensorboard_plugin_profile is unusable).
Run: cd /root/repo && python scripts/profile_partseg.py [markov_partseg]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

STEPS = 10


def main():
    from mpa_tpu.models import get_model
    from mpa_tpu import train as tr
    from mpa_tpu.utils import profiling

    name = sys.argv[1] if len(sys.argv) > 1 else "markov_partseg"
    if name in ("markov_cls", "repsurf_ssg_2x"):
        B, N = 64, 1024
        model = get_model(name, num_classes=15)
        pts = jax.random.normal(jax.random.key(0), (B, N, 3), jnp.float32)
        labels = jax.random.randint(jax.random.key(1), (B,), 0, 15)
        tx = tr.make_optimizer("adam-l2", 1e-3, weight_decay=1e-4)
        state = tr.create_train_state(model, jax.random.key(2), pts[:2], tx)
        step = jax.jit(tr.make_train_step(tr.smooth_cls_loss), donate_argnums=(0,))
        args = (pts, labels, jax.random.key(3))
    elif name == "markov_semseg":
        B, N = 16, 4096
        model = get_model(name)
        pts = jax.random.normal(jax.random.key(0), (B, N, 9), jnp.float32)
        labels = jax.random.randint(jax.random.key(1), (B, N), 0, 13)
        tx = tr.make_optimizer("sgd", 0.1, weight_decay=1e-4, momentum=0.9)
        state = tr.create_train_state(model, jax.random.key(2), pts[:2], tx)
        loss_fn = lambda out, lab: tr.smooth_seg_loss(out, lab, 0.1)
        step = jax.jit(tr.make_train_step(loss_fn), donate_argnums=(0,))
        args = (pts, labels, jax.random.key(3))
    elif name in ("markov_pose", "markov_completion"):
        B, N = 64, 1024
        model = get_model(name)
        pts = jax.random.normal(jax.random.key(0), (B, N, 3), jnp.float32)
        if name == "markov_pose":
            from mpa_tpu.models import rotation_geodesic_loss

            labels = jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, 1, 1))
            loss_fn = rotation_geodesic_loss
        else:
            labels = pts
            loss_fn = tr.completion_loss
        tx = tr.make_optimizer("adam-l2", 1e-3, weight_decay=1e-4)
        state = tr.create_train_state(model, jax.random.key(2), pts[:2], tx)
        step = jax.jit(tr.make_train_step(loss_fn), donate_argnums=(0,))
        args = (pts, labels, jax.random.key(3))
    else:
        B, N = int(os.environ.get("MPA_PROFILE_B", "16")), 2048
        model = get_model(name)
        pts = jax.random.normal(jax.random.key(0), (B, N, 3), jnp.float32)
        onehot = jax.nn.one_hot(jax.random.randint(jax.random.key(1), (B,), 0, 16), 16)
        segs = jax.random.randint(jax.random.key(2), (B, N), 0, 50)
        tx = tr.make_optimizer("sgd", 0.1, weight_decay=1e-4, momentum=0.9)
        state = tr.create_train_state(model, jax.random.key(3), (pts[:2], onehot[:2]), tx)
        loss_fn = lambda out, labels: tr.smooth_seg_loss(out, labels, 0.1)
        step = jax.jit(tr.make_train_step(loss_fn), donate_argnums=(0,))
        args = ((pts, onehot), segs, jax.random.key(4))

    for _ in range(5):
        state, loss = step(state, *args)
    float(loss)

    logdir = "/tmp/mpa_profile"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(STEPS):
            state, loss = step(state, *args)
        float(loss)

    total_ms, cats = profiling.category_breakdown(logdir)
    print(f"\n== {name}: {total_ms / STEPS:.2f} ms/step device time, by category ==")
    for c in cats[:15]:
        print(f"{c['ms']/STEPS:8.3f} ms/step  n={c['count']//STEPS:5d}  {c['category']}")

    _, rows = profiling.op_breakdown(logdir)
    print("\n== top ops ==")
    for r in rows[:15]:
        src = r["source"].split("/")[-1]
        print(f"{r['ms']/STEPS:8.3f} ms/step  n={r['count']//STEPS:3d}  {r['name'][:48]:48s} {src}")


if __name__ == "__main__":
    main()
