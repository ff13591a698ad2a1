"""Op-level profile of the 16k-scene semseg train step (window mode default).

Same harness as profile_partseg.py but at the large-scene scalability shape
(B=2, N=16384) where the Morton-windowed neighbour mode is the point.
Run: cd /root/repo && python scripts/profile_semseg16k.py [exact|window]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

STEPS = 5


def main():
    from mpa_tpu.models import get_model
    from mpa_tpu import train as tr
    from mpa_tpu.utils import profiling

    mode = sys.argv[1] if len(sys.argv) > 1 else "window"
    B, N = 2, 16384
    model = get_model(
        "markov_semseg", npoints=(8192, 4096, 2048, 1024), neighbor_mode=mode
    )
    pts = jax.random.normal(jax.random.key(0), (B, N, 9), jnp.float32)
    labels = jax.random.randint(jax.random.key(1), (B, N), 0, 13)
    tx = tr.make_optimizer("sgd", 0.1, weight_decay=1e-4, momentum=0.9)
    state = tr.create_train_state(model, jax.random.key(2), pts[:1], tx)
    loss_fn = lambda out, l: tr.smooth_seg_loss(out, l, 0.1)
    step = jax.jit(tr.make_train_step(loss_fn), donate_argnums=(0,))
    args = (pts, labels, jax.random.key(3))

    for _ in range(3):
        state, loss = step(state, *args)
    float(loss)

    logdir = "/tmp/mpa_profile_semseg"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(STEPS):
            state, loss = step(state, *args)
        float(loss)

    total_ms, cats = profiling.category_breakdown(logdir)
    print(f"\n== semseg16k {mode}: {total_ms / STEPS:.2f} ms/step device time ==")
    for c in cats[:15]:
        print(f"{c['ms']/STEPS:8.3f} ms/step  n={c['count']//STEPS:5d}  {c['category']}")

    _, rows = profiling.op_breakdown(logdir)
    print("\n== top ops ==")
    for r in rows[:20]:
        src = r["source"].split("/")[-1]
        print(f"{r['ms']/STEPS:8.3f} ms/step  n={r['count']//STEPS:3d}  {r['name'][:48]:48s} {src}")


if __name__ == "__main__":
    main()
