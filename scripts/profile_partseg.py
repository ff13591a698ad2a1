"""Op-level profile of the part-seg train step on the real chip.

Captures a jax.profiler trace of a few steady-state steps and prints the
per-HLO-op time breakdown (via tensorboard_plugin_profile's xplane parser),
grouped by op category. Run: cd /root/repo && python scripts/profile_partseg.py
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from mpa_tpu.models import get_model
    from mpa_tpu import train as tr

    B, N = 16, 2048
    model = get_model("markov_partseg")
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

    logdir = "/tmp/partseg_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(10):
            state, loss = step(state, *args)
        float(loss)

    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "framework_op_stats", {"tqx": "out:json;"}
    )
    if isinstance(data, bytes):
        data = data.decode()
    stats = json.loads(data)
    rows = stats.get("table", stats).get("rows", [])
    cols = [c["label"] for c in stats.get("table", stats).get("cols", [])]
    print("cols:", cols)
    # aggregate self-time by op type
    import collections

    agg = collections.Counter()
    total = 0.0
    for r in rows:
        c = [x.get("v") for x in r["c"]]
        row = dict(zip(cols, c))
        t = float(row.get("Total self-time (us)", 0) or 0)
        agg[row.get("Type", "?")] += t
        total += t
    print(f"total self time: {total/1e3:.2f} ms over 10 steps")
    for op, t in agg.most_common(40):
        print(f"{t/10/1e3:8.3f} ms/step  {100*t/total:5.1f}%  {op}")


if __name__ == "__main__":
    main()
