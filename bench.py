"""Headline benchmarks: training throughput (clouds/sec/chip) of BOTH
reference workloads, full train step (forward + backward + optimizer update),
steady state on one chip.

- cls: MarkovClassifier, ScanObjectNN config (1024 pts, batch 32).
  Baseline 21.5 clouds/s (reference GPU epoch timestamps, BASELINE.md).
- partseg: MarkovPartSeg, ShapeNetPart config (2048 pts, batch 8).
  Baseline 29.6 clouds/s.

Batch choice: per-chip batches are set at the measured throughput-optimal
point (full sweep in docs/PERF.md: partseg B8 = 351 clouds/s vs B16 = 332,
B32 = 305; cls B32 ~= B16 > B64). The presets' global batches (32 partseg /
64 cls) are recovered by data-parallel sharding over 4/2 chips — the
TPU-idiomatic configuration — rather than by over-batching one chip past
its VMEM-tiling sweet spot.

Timing: the axon tunnel's ``block_until_ready`` returns before device work
completes (round-1 bench numbers were inflated by it); every window here ends
with a host transfer of the loss, which is a true fence. Chip rate swings in
multi-second episodes, so several windows are taken; both the best and the
median window are reported. MFU comes from XLA's compiled cost analysis over
a v5e bf16 peak of 197 TFLOP/s (these models are gather/VPU-bound, so single-
digit MFU is the honest roofline position, not a bug).

Prints ONE short (<=500 B) JSON line on stdout — the driver captures only the
tail of stdout, so the headline must survive truncation-from-the-front. The
full detail blob (per-workload blocks, serve/secondary/16k sections, notes)
goes to stderr and BENCH_DETAIL.json. Primary metric: part-seg throughput
(the harder workload).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# Persistent XLA compilation cache: the suite compiles ~12 distinct programs
# (two headline steps, the exported serve artifact, four secondary models and
# three 16k-scene modes); cold compiles dominate wall time, warm runs reuse
# them across invocations.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_bench_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_T0 = time.perf_counter()

# Soft wall-clock budget: the primary metrics always run; the optional blocks
# (serve / secondary models / 16k scenes) are skipped with a note once the
# budget is exhausted, so a cold-cache run on a slow host still prints its
# JSON line instead of being killed by an outer timeout.
try:
    _BUDGET_S = float(os.environ.get("MPA_BENCH_BUDGET_S", "2400"))
except ValueError:  # malformed env must not kill the always-run primaries
    _BUDGET_S = 2400.0


def _mark(label):
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {label}", file=sys.stderr, flush=True)


def _over_budget():
    return time.perf_counter() - _T0 > _BUDGET_S

V5E_PEAK_FLOPS = 197e12  # bf16


def _measure(step, state, args, batch, windows, iters):
    # Warmup (compile + queue drain), fenced by a host transfer.
    for _ in range(3):
        state, loss = step(state, *args)
    float(loss)
    # Self-tune iters: the first dispatch after a host fence pays the
    # ~30-40 ms axon tunnel RTT once per window (measured: 16k window_all
    # reads 52.0 ms/step at iters=3 vs 40.9 at iters=20), so each window is
    # stretched to ~3 s of steps, bounding the fence skew at ~1.5%. The
    # passed iters acts as a floor.
    t0 = time.perf_counter()
    for _ in range(4):
        state, loss = step(state, *args)
    float(loss)
    est = (time.perf_counter() - t0) / 4
    iters = max(iters, min(400, int(3.0 / max(est, 1e-4)) + 1))
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, *args)
        float(loss)  # host fence
        times.append((time.perf_counter() - t0) / iters)
        time.sleep(0.2)
    times.sort()
    best, median = times[0], times[len(times) // 2]
    return batch / best, batch / median, best


def bench_cls():
    from mpa_tpu.models import get_model
    from mpa_tpu import train as tr

    B, N = 32, 1024
    model = get_model("markov_cls", num_classes=15)
    pts = jax.random.normal(jax.random.key(0), (B, N, 3), jnp.float32)
    labels = jax.random.randint(jax.random.key(1), (B,), 0, 15)
    tx = tr.make_optimizer("adam-l2", 1e-3, weight_decay=1e-4)
    state = tr.create_train_state(model, jax.random.key(2), pts[:2], tx)
    step = jax.jit(tr.make_train_step(tr.smooth_cls_loss), donate_argnums=(0,))
    flops = _flops(step, state, (pts, labels, jax.random.key(3)))
    best, median, dt = _measure(
        step, state, (pts, labels, jax.random.key(3)), B, windows=6, iters=80
    )
    return best, median, dt, flops


def bench_partseg():
    from mpa_tpu.models import get_model
    from mpa_tpu import train as tr

    B, N = 8, 2048
    model = get_model("markov_partseg")
    pts = jax.random.normal(jax.random.key(0), (B, N, 3), jnp.float32)
    onehot = jax.nn.one_hot(jax.random.randint(jax.random.key(1), (B,), 0, 16), 16)
    segs = jax.random.randint(jax.random.key(2), (B, N), 0, 50)
    tx = tr.make_optimizer("sgd", 0.1, weight_decay=1e-4, momentum=0.9)
    state = tr.create_train_state(model, jax.random.key(3), (pts[:2], onehot[:2]), tx)
    loss_fn = lambda out, labels: tr.smooth_seg_loss(out, labels, 0.1)
    step = jax.jit(tr.make_train_step(loss_fn), donate_argnums=(0,))
    args = ((pts, onehot), segs, jax.random.key(4))
    flops = _flops(step, state, args)
    best, median, dt = _measure(step, state, args, B, windows=6, iters=40)
    return best, median, dt, flops


def _train_bench(model, inputs, labels, loss_fn, optimizer, B, *, windows, iters):
    from mpa_tpu import train as tr

    ex = jax.tree_util.tree_map(lambda a: a[:2], inputs)
    state = tr.create_train_state(model, jax.random.key(5), ex, optimizer)
    step = jax.jit(tr.make_train_step(loss_fn), donate_argnums=(0,))
    args = (inputs, labels, jax.random.key(6))
    flops = _flops(step, state, args)
    best, median, dt = _measure(step, state, args, B, windows=windows, iters=iters)
    return best, median, dt, flops


def bench_secondary():
    """Secondary metrics (VERDICT r1 item 9): the remaining registered models
    under the same fenced-timing methodology as the headline workloads —
    repsurf_ssg_umb_2x (the published golden-config cls variant) and the three
    extended heads at their preset configs (configs/presets.py)."""
    import numpy as np

    from mpa_tpu.models import get_model, rotation_geodesic_loss
    from mpa_tpu import train as tr

    r = np.random.default_rng(0)

    def pts(B, n, c=3):
        return jnp.asarray(r.normal(size=(B, n, c)).astype(np.float32))

    out = {}

    def block(name, fn):
        if _over_budget():
            out[name] = {"skipped": "bench wall-clock budget exhausted"}
            return
        try:
            best, med, dt, flops = fn()
            out[name] = {
                "clouds_per_sec_best": round(best, 1),
                "clouds_per_sec_median": round(med, 1),
                "ms_per_step": round(dt * 1e3, 2),
                "mfu_pct": round(100.0 * flops / dt / V5E_PEAK_FLOPS, 2)
                if flops
                else None,
            }
        except Exception as e:  # secondary metrics never sink the primaries
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}

    def _2x():
        B = 64
        return _train_bench(
            get_model("repsurf_ssg_2x", num_classes=15), pts(B, 1024),
            jnp.asarray(r.integers(0, 15, size=(B,)).astype(np.int32)),
            lambda o, l: tr.smooth_cls_loss(o, l, 0.1),
            tr.make_optimizer("adam-l2", 1e-3, weight_decay=1e-4),
            B, windows=4, iters=20,
        )

    def _semseg():
        B = 16  # s3dis_semseg preset: 4096-pt blocks, batch 16
        return _train_bench(
            get_model("markov_semseg"), pts(B, 4096, 9),
            jnp.asarray(r.integers(0, 13, size=(B, 4096)).astype(np.int32)),
            lambda o, l: tr.smooth_seg_loss(o, l, 0.1),
            tr.make_optimizer("sgd", 0.1, weight_decay=1e-4, momentum=0.9),
            B, windows=4, iters=5,
        )

    def _pose():
        B = 64
        rot = jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, 1, 1))
        return _train_bench(
            get_model("markov_pose"), pts(B, 1024), rot, rotation_geodesic_loss,
            tr.make_optimizer("adam-l2", 1e-3, weight_decay=1e-4),
            B, windows=4, iters=10,
        )

    def _completion():
        B = 64
        return _train_bench(
            get_model("markov_completion"), pts(B, 1024), pts(B, 1024),
            tr.completion_loss,
            tr.make_optimizer("adam-l2", 1e-3, weight_decay=1e-4),
            B, windows=4, iters=10,
        )

    block("repsurf_ssg_2x", _2x)
    block("semseg_4096", _semseg)
    block("pose_1024", _pose)
    block("completion_1024", _completion)
    return out


def bench_semseg_16k():
    """Large-scene scalability: markov_semseg at N=16384, exact vs Morton-
    windowed neighbour mode (the structural escape from the gather/scatter
    floors — docs/PERF.md). Reported as ms/step each plus the speedup."""
    import numpy as np

    from mpa_tpu.models import get_model
    from mpa_tpu import train as tr

    B, N = 2, 16384
    r = np.random.default_rng(1)
    pts = jnp.asarray(r.normal(size=(B, N, 9)).astype(np.float32))
    labels = jnp.asarray(r.integers(0, 13, size=(B, N)).astype(np.int32))
    npoints = (8192, 4096, 2048, 1024)
    res = {}
    # 'window' bands the spatial searches (feature kNN exact); 'window_all'
    # bands the feature-space kNN too — the full scalability mode (its
    # approximation quality is measured in docs/PERF.md).
    for mode in ("exact", "window", "window_all"):
        if _over_budget():
            res[f"{mode}_ms_per_step"] = {
                "skipped": "bench wall-clock budget exhausted mid-block"
            }
            break
        model = get_model("markov_semseg", npoints=npoints, neighbor_mode=mode)
        # _measure self-tunes iters upward to ~3 s windows; 12 is the floor
        # (at iters=3 the per-window tunnel-RTT fence cost understated the
        # faster modes' relative speedup by ~20%).
        _, _, dt, _ = _train_bench(
            model, pts, labels,
            lambda o, l: tr.smooth_seg_loss(o, l, 0.1),
            tr.make_optimizer("sgd", 0.1, weight_decay=1e-4, momentum=0.9),
            B, windows=3, iters=12,
        )
        res[f"{mode}_ms_per_step"] = round(dt * 1e3, 1)
    for mode in ("window", "window_all"):
        exact, banded = res.get("exact_ms_per_step"), res.get(f"{mode}_ms_per_step")
        if isinstance(exact, float) and isinstance(banded, float):
            res[f"{mode}_speedup"] = round(exact / banded, 2)
    return res


def bench_partseg_pipeline():
    """Epoch-style part-seg throughput INCLUDING the input pipeline — host
    shuffled batching, host->device transfer (prefetch thread), on-device
    keyed augmentation (scale+shift, the reference trainer's augments,
    tool/train_partseg.py:192-193) and the full train step. This is the
    apples-to-apples comparison point against the reference's 29.6 clouds/s,
    which is epoch wall-clock including its DataLoader (BASELINE.md:18)."""
    import numpy as np

    from mpa_tpu.models import get_model
    from mpa_tpu import train as tr
    from mpa_tpu.data import augment as aug
    from mpa_tpu.data import pipeline as pl
    from mpa_tpu.parallel import make_mesh

    B, N, n_clouds = 8, 2048, 640
    r = np.random.default_rng(7)
    clouds = r.normal(size=(n_clouds, N, 3)).astype(np.float32)
    cats = r.integers(0, 16, size=(n_clouds,)).astype(np.int32)
    segs = r.integers(0, 50, size=(n_clouds, N)).astype(np.int32)
    onehot_tbl = np.eye(16, dtype=np.float32)

    model = get_model("markov_partseg")
    tx = tr.make_optimizer("sgd", 0.1, weight_decay=1e-4, momentum=0.9)
    ex = (jnp.zeros((2, N, 3), jnp.float32), jnp.zeros((2, 16), jnp.float32))
    state = tr.create_train_state(model, jax.random.key(8), ex, tx)
    loss_fn = lambda out, labels: tr.smooth_seg_loss(out, labels, 0.1)
    base_step = tr.make_train_step(loss_fn)

    @jax.jit
    def step(state, pts, oh, seg, key):
        k1, k2 = jax.random.split(jax.random.fold_in(key, state.step))
        pts = aug.random_shift(k2, aug.random_scale(k1, pts))
        return base_step(state, (pts, oh), seg, key)

    mesh = make_mesh(devices=jax.devices()[:1])
    key = jax.random.key(9)

    def epoch(seed):
        it = pl.batch_iterator(
            (clouds, cats, segs), B, rng=np.random.default_rng(seed)
        )
        n = 0
        for pts, c, seg in pl.prefetch_to_device(
            it, mesh, transform=lambda b: (b[0], onehot_tbl[b[1]], b[2])
        ):
            nonlocal_state[0], loss = step(nonlocal_state[0], pts, c, seg, key)
            n += B
        float(loss)  # host fence: epoch ends when the device is drained
        return n

    nonlocal_state = [state]
    epoch(0)  # warmup: compile + cache population
    rates = []
    for e in range(1, 4):
        t0 = time.perf_counter()
        n = epoch(e)
        rates.append(n / (time.perf_counter() - t0))
    rates.sort()
    return {
        "clouds_per_sec_best": round(rates[-1], 1),
        "clouds_per_sec_median": round(rates[len(rates) // 2], 1),
        "vs_baseline_best": round(rates[-1] / 29.6, 2),
        "note": "includes host batching+transfer and on-device augmentation; "
                "in-RAM dataset (the reference holds ShapeNetPart in RAM too)",
    }


def bench_serve():
    """The DEPLOYED artifact: export the cls model via jax.export, reload it,
    and measure both fenced single-call latency and pipelined throughput.
    On this image every dispatch crosses the axon tunnel (~30 ms RTT), so the
    fenced p50 is tunnel-dominated — the on-device forward is ~2 ms (profiled;
    docs/PERF.md). The pipelined number (requests queued back-to-back, one
    fence) is the throughput a serving host would sustain."""
    import tempfile

    from mpa_tpu.models import get_model
    from mpa_tpu import train as tr, serve

    B, N = 8, 1024
    model = get_model("markov_cls", num_classes=15)
    pts = jax.random.normal(jax.random.key(0), (B, N, 3), jnp.float32)
    state = tr.create_train_state(
        model, jax.random.key(1), pts[:2], tr.make_optimizer("sgd", 0.0)
    )
    with tempfile.TemporaryDirectory() as d:
        exp = serve.export_inference(model, state.params, state.batch_stats, pts)
        path = f"{d}/m.shlo"
        serve.save_exported(exp, path)
        infer = serve.load_inference(path)
        for _ in range(5):
            out = infer(pts)
        float(out[0, 0])
        times = []
        for _ in range(40):
            t0 = time.perf_counter()
            out = infer(pts)
            float(out[0, 0])  # host fence
            times.append(time.perf_counter() - t0)
        # Pipelined: 32 requests in flight, single fence.
        piped = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(32):
                out = infer(pts)
            float(out[0, 0])
            piped.append((time.perf_counter() - t0) / 32)
    times.sort()
    piped.sort()
    p50 = times[len(times) // 2]
    return {
        "batch": B,
        "latency_ms_p50": round(p50 * 1e3, 2),
        "latency_ms_p90": round(times[int(len(times) * 0.9)] * 1e3, 2),
        "pipelined_ms_per_call": round(piped[0] * 1e3, 2),
        "pipelined_clouds_per_sec": round(B / piped[0], 1),
        "note": "fenced p50 is axon-tunnel-RTT-dominated (device fwd ~2 ms)",
    }


def _flops(step, state, args):
    try:
        cost = step.lower(state, *args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    _mark("start")
    cls_best, cls_med, cls_dt, cls_flops = bench_cls()
    _mark("cls done")
    ps_best, ps_med, ps_dt, ps_flops = bench_partseg()
    _mark("partseg done")

    def skipped():  # one dict per block: later mutation must not alias
        return {"skipped": f"bench wall-clock budget ({_BUDGET_S:.0f}s) exhausted"}

    def optional_block(label, fn):
        """Budget-gate + exception-isolate a secondary block; the label notes
        the real outcome so the stderr trace isn't misleading."""
        if _over_budget():
            _mark(f"{label} skipped (budget)")
            return skipped()
        try:
            out = fn()
            _mark(f"{label} done")
            return out
        except Exception as e:  # secondary blocks never sink the primaries
            _mark(f"{label} errored ({type(e).__name__})")
            return {"error": f"{type(e).__name__}: {e}"[:200]}

    pipeline_block = optional_block("pipeline", bench_partseg_pipeline)
    serve_block = optional_block("serve", bench_serve)
    secondary = optional_block("secondary", bench_secondary)
    semseg16k = optional_block("semseg16k", bench_semseg_16k)

    def block(best, med, dt, flops, baseline):
        return {
            "clouds_per_sec_best": round(best, 1),
            "clouds_per_sec_median": round(med, 1),
            "ms_per_step": round(dt * 1e3, 2),
            "vs_baseline_best": round(best / baseline, 2),
            "vs_baseline_median": round(med / baseline, 2),
            "mfu_pct": round(100.0 * flops / dt / V5E_PEAK_FLOPS, 2) if flops else None,
        }

    # Full detail blob: stderr + BENCH_DETAIL.json. NOT stdout — the driver
    # captures only the TAIL of stdout and parses the last line; r3's detail
    # grew past the capture and truncated the headline from the front
    # (BENCH_r03.json: parsed=null). stdout carries exactly ONE short line.
    detail = {
        "partseg": block(ps_best, ps_med, ps_dt, ps_flops, 29.6),
        "cls": block(cls_best, cls_med, cls_dt, cls_flops, 21.5),
        "partseg_input_pipeline": pipeline_block,
        "serve_cls_exported": serve_block,
        "secondary_models": secondary,
        "semseg_16k": semseg16k,
        "partseg_batch_note": "partseg B8 / cls B32 are the measured per-chip throughput-optimal batches (sweep in docs/PERF.md); the presets' global batches come from DP over chips",
        "timing_note": "host-transfer fenced (block_until_ready is unreliable on this tunnel; r1 cls numbers were inflated by it)",
        "baseline_note": "reference baselines are epoch wall-clock INCLUDING dataloading (cls, BASELINE.md:13) and eval (partseg, BASELINE.md:18); 'partseg'/'cls' above are pure on-device train-step throughput — partseg_input_pipeline carries the input-inclusive comparison",
    }
    print("[bench detail] " + json.dumps(detail), file=sys.stderr, flush=True)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass  # read-only checkout: stderr copy still has the blob

    print(headline_line(ps_best, ps_med, cls_med), flush=True)


def headline_line(ps_best, ps_med, cls_med):
    """The single stdout line the driver parses. Kept short and flat so it
    survives the driver's tail capture; guarded by tests/test_bench_contract.py."""
    headline = {
        "metric": "partseg_train_clouds_per_sec_per_chip",
        "value": round(ps_best, 1),
        "unit": "clouds/s",
        "vs_baseline": round(ps_best / 29.6, 2),
        "partseg_clouds_per_sec_median": round(ps_med, 1),
        "cls_clouds_per_sec_median": round(cls_med, 1),
        "cls_vs_baseline_median": round(cls_med / 21.5, 2),
        "detail": "stderr + BENCH_DETAIL.json",
    }
    line = json.dumps(headline)
    assert len(line) <= 500, f"headline line {len(line)}B > 500B driver cap"
    return line


if __name__ == "__main__":
    main()
