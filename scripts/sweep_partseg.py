"""One-off measurement sweep for the part-seg step: attention dispatch
thresholds and batch size, each config timed with the bench.py fencing
methodology. Run one config per process: python scripts/sweep_partseg.py
B SMALL_N LARGE_N (prints one JSON line)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    small_n = int(sys.argv[2]) if len(sys.argv) > 2 else None
    large_n = int(sys.argv[3]) if len(sys.argv) > 3 else None

    from mpa_tpu.ops.pallas import attention_pallas as ap

    if small_n is not None:
        ap.SMALL_N_THRESHOLD = small_n
    if large_n is not None:
        ap.LARGE_N_SCATTER_THRESHOLD = large_n

    from mpa_tpu.models import get_model
    from mpa_tpu import train as tr

    N = 2048
    model = get_model("markov_partseg")
    pts = jax.random.normal(jax.random.key(0), (B, N, 3), jnp.float32)
    onehot = jax.nn.one_hot(jax.random.randint(jax.random.key(1), (B,), 0, 16), 16)
    segs = jax.random.randint(jax.random.key(2), (B, N), 0, 50)
    tx = tr.make_optimizer("sgd", 0.1, weight_decay=1e-4, momentum=0.9)
    state = tr.create_train_state(model, jax.random.key(3), (pts[:2], onehot[:2]), tx)
    loss_fn = lambda out, labels: tr.smooth_seg_loss(out, labels, 0.1)
    step = jax.jit(tr.make_train_step(loss_fn), donate_argnums=(0,))
    args = ((pts, onehot), segs, jax.random.key(4))

    for _ in range(3):
        state, loss = step(state, *args)
    float(loss)
    iters = max(1, 320 // B)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, *args)
        float(loss)
        times.append((time.perf_counter() - t0) / iters)
        time.sleep(0.2)
    times.sort()
    best, med = times[0], times[len(times) // 2]
    print(json.dumps({
        "B": B, "small_n": ap.SMALL_N_THRESHOLD,
        "large_n": ap.LARGE_N_SCATTER_THRESHOLD,
        "ms_best": round(best * 1e3, 2), "ms_median": round(med * 1e3, 2),
        "clouds_per_sec_best": round(B / best, 1),
        "clouds_per_sec_median": round(B / med, 1),
    }))


if __name__ == "__main__":
    main()
