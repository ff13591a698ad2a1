"""Training CLI — the TPU-native successor of tool/train_cls_scanobjectnn.py
and tool/train_partseg.py.

Usage:
  python -m mpa_tpu.cli.train --task cls --dataset synthetic --epochs 2
  python -m mpa_tpu.cli.train --task cls --dataset scanobjectnn --data_root /data/scanobjectnn
  python -m mpa_tpu.cli.train --task partseg --dataset shapenetpart --data_root /data/shapenetpart

Defaults reproduce the reference configs (cls: Adam 1e-3/wd 1e-4/StepLR 20x0.7,
batch 64, 1024 pts, seed 2800, 3-vote eval; partseg: SGD .1/.9/1e-4 cosine,
2048 pts). Runs single-chip or data-parallel over every visible device.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from mpa_tpu.utils.config import TrainConfig, add_config_flags, resolve_config
from mpa_tpu.utils.logging import make_logger
from mpa_tpu.utils.init import set_seed
from mpa_tpu.utils.profiling import count_params
from mpa_tpu import train as tr
from mpa_tpu.models import get_model
from mpa_tpu.data import augment, synthetic_clouds
from mpa_tpu.data.shapenetpart import to_categorical, SEG_PARTS, NUM_PARTS, NUM_CATEGORIES
from mpa_tpu.parallel import make_mesh, replicate, shard_batch, jit_sharded_train_step
from mpa_tpu.train.checkpoint import BestCheckpointer
from mpa_tpu.train.votes import vote_predict

# Jitted once per process: eval metrics called per batch in evaluate().
# Dispatched eagerly, each primitive is a separate compile RPC on the
# tunneled axon backend — measured 113 s for ONE eager chamfer_distance call
# (einsum + min + mean chain) vs <1 s jitted. Module-level singletons so the
# jit cache persists across evaluate() calls.
from mpa_tpu.models import rotation_geodesic_loss  # noqa: E402

_chamfer_jit = jax.jit(tr.chamfer_distance)
_geodesic_jit = jax.jit(rotation_geodesic_loss)


def _pose_arrays(points: np.ndarray, seed: int):
    """Rotate each cloud by a random z-rotation; targets are the matrices."""
    r = np.random.default_rng(seed)
    angles = r.uniform(0, 2 * np.pi, len(points))
    c, s = np.cos(angles), np.sin(angles)
    zeros, ones = np.zeros_like(c), np.ones_like(c)
    rot = np.stack([c, -s, zeros, s, c, zeros, zeros, zeros, ones], -1).reshape(
        -1, 3, 3
    ).astype(np.float32)
    rotated = np.einsum("bij,bnj->bni", rot, points[..., :3])
    return rotated.astype(np.float32), rot


def _completion_arrays(points: np.ndarray, keep_ratio: float = 0.5):
    """Crop a half-space from each cloud; (partial, full) pairs with static
    partial size (farthest-from-plane points dropped)."""
    n_keep = int(points.shape[1] * keep_ratio)
    order = np.argsort(points[..., 0], axis=1)  # crop along x
    partial = np.take_along_axis(points, order[:, :n_keep, None], axis=1)
    return partial.astype(np.float32), points[..., :3].astype(np.float32)


def _semseg_synthetic(num_rooms: int, num_points: int, seed: int):
    from mpa_tpu.data import s3dis

    r = np.random.default_rng(seed)
    feats, labels = [], []
    for i in range(num_rooms):
        # Room density: 20000 reproduces the committed <=4k quality-pair
        # protocol exactly; above 4k, scale density so the per-block
        # sample-with-replacement factor stays at that protocol's ~2.4x
        # (a 16k block drawn from a 20000-pt room would contain only ~1.7k
        # unique points — a degenerate test of 16k neighborhoods).
        n = 20000 if num_points <= 4096 else 5 * num_points
        pts = np.zeros((n, 6), np.float32)
        pts[:, 0] = r.uniform(0, 4, n)
        pts[:, 1] = r.uniform(0, 3, n)
        pts[:, 2] = r.uniform(0, 2.5, n)
        pts[:, 3:6] = r.uniform(0, 255, (n, 3))
        lab = np.digitize(pts[:, 2], [0.8, 1.7]).astype(np.int64)  # 3 bands
        bx, by = s3dis.sample_blocks(pts, lab, num_blocks=24, num_points=num_points,
                                     rng=np.random.default_rng(seed + i))
        feats.append(bx)
        labels.append(by)
    return np.concatenate(feats), np.concatenate(labels)


def load_dataset(cfg: TrainConfig):
    """Returns (train_arrays, test_arrays) where arrays are task-specific."""
    if cfg.task == "semseg":
        if cfg.dataset == "synthetic":
            return (
                _semseg_synthetic(8, cfg.num_points, 0),
                _semseg_synthetic(2, cfg.num_points, 100),
            )
        from mpa_tpu.data import s3dis

        def split_blocks(split, blocks_per_room):
            feats, labels = [], []
            for room in s3dis.list_rooms(cfg.data_root, split=split):
                xyzrgb, lab = s3dis.load_room(room)
                bx, by = s3dis.sample_blocks(
                    xyzrgb, lab, blocks_per_room, cfg.num_points
                )
                feats.append(bx)
                labels.append(by)
            return np.concatenate(feats), np.concatenate(labels)

        return split_blocks("train", 32), split_blocks("test", 16)

    if cfg.task == "pose":
        if cfg.dataset == "modelnet40":
            from mpa_tpu.data.modelnet import load_modelnet

            tr_p, _, _ = load_modelnet(cfg.data_root, "train", 40, cfg.num_points)
            te_p, _, _ = load_modelnet(cfg.data_root, "test", 40, cfg.num_points)
        else:
            # Canonical-frame clouds: the regression target in _pose_arrays is
            # only identifiable if the underlying clouds are NOT themselves
            # randomly rotated (data/synthetic.py realistic_clouds docstring).
            from mpa_tpu.data import realistic_clouds

            tr_p, _ = realistic_clouds(
                cfg.synthetic_train_clouds, cfg.num_points, cfg.num_classes,
                seed=0, canonical_pose=True,
            )
            te_p, _ = realistic_clouds(
                128, cfg.num_points, cfg.num_classes, seed=1, canonical_pose=True
            )
        return _pose_arrays(tr_p, 0), _pose_arrays(te_p, 1)

    if cfg.task == "completion":
        if cfg.dataset == "modelnet40":
            from mpa_tpu.data.modelnet import load_modelnet

            tr_p, _, _ = load_modelnet(cfg.data_root, "train", 40, cfg.num_points)
            te_p, _, _ = load_modelnet(cfg.data_root, "test", 40, cfg.num_points)
        else:
            tr_p, _ = synthetic_clouds(
                cfg.synthetic_train_clouds, cfg.num_points, cfg.num_classes, seed=0
            )
            te_p, _ = synthetic_clouds(128, cfg.num_points, cfg.num_classes, seed=1)
        return _completion_arrays(tr_p), _completion_arrays(te_p)

    if cfg.dataset == "synthetic":
        if cfg.task == "partseg":
            # realistic_partseg, not the toy synthetic_partseg: the toy task
            # labels parts as cat*parts_per_cat + halfspace, which does NOT
            # lie inside SEG_PARTS[cat] for most categories — the category-
            # masked eval then caps ins-mIoU near 0.6 no matter the model
            # (r4). The composed-primitive task uses the real label layout.
            from mpa_tpu.data import realistic_partseg

            tr_d = realistic_partseg(256, cfg.num_points, seed=0)
            te_d = realistic_partseg(64, cfg.num_points, seed=1)
        else:
            tr_d = synthetic_clouds(512, cfg.num_points, cfg.num_classes, seed=0)
            te_d = synthetic_clouds(128, cfg.num_points, cfg.num_classes, seed=1)
        return tr_d, te_d
    if cfg.dataset == "scanobjectnn":
        from mpa_tpu.data.scanobjectnn import load_scanobjectnn

        return (
            load_scanobjectnn(cfg.data_root, "training"),
            load_scanobjectnn(cfg.data_root, "test"),
        )
    if cfg.dataset == "modelnet40":
        from mpa_tpu.data.modelnet import load_modelnet

        tr_p, tr_l, _ = load_modelnet(cfg.data_root, "train", 40, cfg.num_points)
        te_p, te_l, _ = load_modelnet(cfg.data_root, "test", 40, cfg.num_points)
        return (tr_p, tr_l), (te_p, te_l)
    if cfg.dataset == "shapenetpart":
        from mpa_tpu.data.shapenetpart import load_split

        return (
            load_split(cfg.data_root, "trainval", cfg.num_points),
            load_split(cfg.data_root, "test", cfg.num_points),
        )
    raise ValueError(f"unknown dataset {cfg.dataset}")


def batches(arrays, batch_size: int, rng=None, drop_last=True):
    """rng=None -> sequential order (eval); drop_last=False keeps the ragged
    tail batch (one extra jit specialization, but metrics cover every sample)."""
    n = len(arrays[0])
    order = rng.permutation(n) if rng is not None else np.arange(n)
    stop = n - n % batch_size if drop_last else n
    for i in range(0, stop, batch_size):
        idx = order[i : i + batch_size]
        yield tuple(a[idx] for a in arrays)


def dry_data_check(cfg) -> int:
    """--dry_data_check: prove a data root is usable before committing to a
    training run. Loads every split through the SAME loader the trainer uses,
    validates shapes/dtypes/label ranges (partseg: every seg label must fall
    inside its cloud's category part block, SEG_PARTS), and prints the epoch
    plan as one JSON line. Never touches a device. Returns a process exit
    code (0 = ok)."""
    import json

    report = {"task": cfg.task, "dataset": cfg.dataset, "data_root": cfg.data_root,
              "ok": False}
    try:
        train_arrays, test_arrays = load_dataset(cfg)
    except Exception as e:
        report["error"] = f"{type(e).__name__}: {e}"
        print(json.dumps(report))
        return 1

    problems = []
    for split, arrays in (("train", train_arrays), ("test", test_arrays)):
        info = {}
        n = len(arrays[0])
        info["clouds"] = n
        info["shapes"] = [list(np.shape(a)) for a in arrays]
        info["dtypes"] = [str(np.asarray(a).dtype) for a in arrays]
        if cfg.task == "partseg":
            pts, cats, segs = arrays
            if cats.min() < 0 or cats.max() >= NUM_CATEGORIES:
                problems.append(f"{split}: category ids outside [0,{NUM_CATEGORIES})")
            if segs.min() < 0 or segs.max() >= NUM_PARTS:
                problems.append(f"{split}: part labels outside [0,{NUM_PARTS})")
            else:
                bad = 0
                for c in range(NUM_CATEGORIES):
                    m = cats == c
                    if not m.any():
                        continue
                    allowed = np.asarray(SEG_PARTS[c])
                    bad += int((~np.isin(segs[m], allowed)).sum())
                if bad:
                    problems.append(
                        f"{split}: {bad} point labels outside their cloud's "
                        "category part block (SEG_PARTS)"
                    )
        elif cfg.task in ("cls", "semseg"):
            labels = arrays[1]
            if labels.min() < 0 or labels.max() >= cfg.num_classes:
                problems.append(
                    f"{split}: labels outside [0,{cfg.num_classes}) "
                    f"(saw {labels.min()}..{labels.max()})"
                )
        if not np.isfinite(np.asarray(arrays[0], np.float32)).all():
            problems.append(f"{split}: non-finite point coordinates")
        report[split] = info

    n_train = len(train_arrays[0])
    spe = max(1, n_train // cfg.batch_size)
    report["epoch_plan"] = {
        "batch_size": cfg.batch_size, "steps_per_epoch": spe,
        "epochs": cfg.epochs, "total_steps": spe * cfg.epochs,
        "drop_last_clouds": n_train - spe * cfg.batch_size
        if n_train >= cfg.batch_size else 0,
    }
    report["problems"] = problems
    report["ok"] = not problems
    print(json.dumps(report))
    return 0 if report["ok"] else 1


def main(argv=None):
    # Live stack dumps without killing the run: `kill -USR1 <pid>` prints
    # every thread's Python stack to stderr. The tunneled backend's stalls
    # (device RPCs blocking for minutes) are otherwise undiagnosable.
    import faulthandler
    import signal

    try:
        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except (AttributeError, ValueError):
        pass  # non-main thread or platform without SIGUSR1

    parser = argparse.ArgumentParser()
    add_config_flags(parser, TrainConfig())
    parser.add_argument("--max_steps", type=int, default=0, help="early stop for smoke runs")
    parser.add_argument("--import_torch", type=str, default=None,
                        help="reference best_model.pth to migrate and "
                             "fine-tune from (utils/torch_import)")
    parser.add_argument("--trust_torch_pickle", action="store_true",
                        help="allow full (arbitrary-code-execution) pickle "
                             "loading of --import_torch; default is the safe "
                             "weights-only loader")
    parser.add_argument("--preset", type=str, default=None,
                        help="named config preset (mpa_tpu.configs); explicit "
                             "flags still override")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu); this image pins "
                             "JAX_PLATFORMS=axon so the env route is dead")
    parser.add_argument("--dry_data_check", action="store_true",
                        help="validate --data_root (load every split through "
                             "the real loaders, check shapes/dtypes/label "
                             "ranges), print the epoch plan as JSON, and exit "
                             "without touching any device")
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg = resolve_config(parser, args, argv)

    if cfg.model == "markov_cls" and cfg.task != "cls":
        # Task-default model resolution when only --task was given.
        defaults = {
            "partseg": "markov_partseg",
            "semseg": "markov_semseg",
            "pose": "markov_pose",
            "completion": "markov_completion",
        }
        cfg = cfg.with_overrides(model=defaults[cfg.task])
        if cfg.task == "partseg":
            cfg = cfg.with_overrides(
                optimizer="sgd", learning_rate=0.1, scheduler="cos",
                num_points=2048 if cfg.dataset != "synthetic" else cfg.num_points,
            )
        if cfg.task == "semseg":
            cfg = cfg.with_overrides(
                num_classes=13 if cfg.dataset == "s3dis" else 3
            )

    if args.dry_data_check:
        return dry_data_check(cfg)

    log = make_logger(os.path.join(cfg.log_dir, f"{cfg.task}_{cfg.dataset}"))
    log.info(f"config: {cfg}")
    root_key = set_seed(cfg.seed)

    train_arrays, test_arrays = load_dataset(cfg)
    n_train = len(train_arrays[0])
    steps_per_epoch = max(1, n_train // cfg.batch_size)

    # --- model / optimizer ---------------------------------------------------
    # Segmentation ladders assume their canonical input sizes (2048/4096);
    # scale the npoint ladder for other sizes (e.g. synthetic smoke runs).
    def seg_ladder(n_levels):
        return tuple(cfg.num_points // 2 ** (i + 1) for i in range(n_levels))

    if cfg.task == "partseg":
        model = get_model(
            cfg.model, num_parts=NUM_PARTS, num_categories=NUM_CATEGORIES,
            npoints=seg_ladder(4),
            neighbor_mode=cfg.neighbor_mode,
            fps_min_band=cfg.fps_min_band,
            fps_min_samples=cfg.fps_min_samples,
        )
        loss_fn = lambda out, labels: tr.smooth_seg_loss(out, labels, cfg.label_smoothing)
    elif cfg.task == "semseg":
        model = get_model(
            cfg.model, num_classes=cfg.num_classes, npoints=seg_ladder(4),
            neighbor_mode=cfg.neighbor_mode,
            fps_min_band=cfg.fps_min_band,
            fps_min_samples=cfg.fps_min_samples,
        )
        loss_fn = lambda out, labels: tr.smooth_seg_loss(out, labels, cfg.label_smoothing)
    elif cfg.task == "pose":
        from mpa_tpu.models import rotation_geodesic_loss

        model = get_model(cfg.model)
        loss_fn = rotation_geodesic_loss
    elif cfg.task == "completion":
        model = get_model(cfg.model)
        loss_fn = tr.completion_loss
    else:
        model = get_model(cfg.model, num_classes=cfg.num_classes)
        loss_fn = lambda out, labels: tr.smooth_cls_loss(out, labels, cfg.label_smoothing)

    if cfg.scheduler == "cos":
        epoch_sched = tr.cosine_schedule(cfg.learning_rate, cfg.epochs, cfg.eta_min)
    else:
        epoch_sched = tr.step_decay_schedule(cfg.learning_rate, cfg.decay_step, cfg.decay_gamma)
    step_sched = lambda step: epoch_sched(step // steps_per_epoch)
    tx = tr.make_optimizer(cfg.optimizer, step_sched, cfg.weight_decay, cfg.momentum)

    def make_inputs(batch):
        if cfg.task == "partseg":
            pts, cats, segs = batch
            return (jnp.asarray(pts), jnp.asarray(to_categorical(cats))), jnp.asarray(segs), cats
        pts, labels = batch  # semseg/pose/completion/cls: (inputs, targets)
        return jnp.asarray(pts), jnp.asarray(labels), None

    example = next(batches(train_arrays, min(2, cfg.batch_size), np.random.default_rng(0)))
    ex_inputs, _, _ = make_inputs(example)
    state = tr.create_train_state(model, jax.random.fold_in(root_key, 0), ex_inputs, tx)
    if cfg.init:
        # Reference-parity optional re-init (tool/train_cls_scanobjectnn.py:200-202).
        from mpa_tpu.utils.init import apply_weight_init

        state = state.replace(
            params=apply_weight_init(state.params, cfg.init, jax.random.fold_in(root_key, 2))
        )
        log.info(f"re-initialized weights with --init {cfg.init}")
    if args.import_torch:
        # Migration/fine-tune path: start from a reference torch checkpoint.
        from mpa_tpu.utils.torch_import import import_reference_checkpoint

        task = "partseg" if cfg.task == "partseg" else "cls"
        template = {"params": state.params, "batch_stats": state.batch_stats}
        variables, report = import_reference_checkpoint(
            args.import_torch, task, template,
            allow_pickle=args.trust_torch_pickle,
        )
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
        log.info(
            f"imported torch checkpoint {args.import_torch} "
            f"({len(report['skipped_torch_keys'])} dead/aux keys skipped)"
        )
    log.info(f"model {cfg.model}: {count_params(state.params) / 1e6:.2f}M params; "
             f"devices: {jax.device_count()}")

    mesh = make_mesh(axis_names=cfg.mesh_axes)
    train_step = jit_sharded_train_step(tr.make_train_step(loss_fn), mesh)
    eval_step = jax.jit(tr.make_eval_step())
    state = replicate(state, mesh)
    step_rng = replicate(jax.random.fold_in(root_key, 1), mesh)

    ckpt = BestCheckpointer(os.path.join(cfg.log_dir, f"{cfg.task}_{cfg.dataset}", "checkpoints"))
    restored = ckpt.restore(state)
    if restored is not None:
        state, best = restored
        log.info(f"resumed from checkpoint (best={best:.4f})")

    from mpa_tpu.data.pipeline import prefetch_to_device

    def host_batch(batch):
        """Host-side tensor assembly (runs on the prefetch thread)."""
        if cfg.task == "partseg":
            pts, cats, segs = batch
            return (
                pts.astype(np.float32),
                to_categorical(cats),
                segs.astype(np.int32),
            )
        pts, targets = batch
        targets = (
            targets.astype(np.int32)
            if np.issubdtype(targets.dtype, np.integer)
            else targets.astype(np.float32)
        )
        return pts.astype(np.float32), targets

    data_rng = np.random.default_rng(cfg.seed)
    aug_key = jax.random.fold_in(root_key, 2)
    # Part-seg defaults to the reference's scale+shift train augmentation
    # (tool/train_partseg.py:192-193); other tasks follow the explicit flags
    # ONLY (pose/completion targets are not transformed, so augmenting their
    # inputs without opting in would corrupt training).
    do_scale = cfg.aug_scale or cfg.task == "partseg"
    do_shift = cfg.aug_shift or cfg.task == "partseg"
    use_aug = do_scale or do_shift

    @jax.jit
    def aug_fn(pts, step):
        k = jax.random.fold_in(aug_key, step)
        if do_scale:
            pts = augment.random_scale(jax.random.fold_in(k, 0), pts)
        if do_shift:
            pts = augment.random_shift(jax.random.fold_in(k, 1), pts)
        return pts

    # Pose: resample the target rotation every batch — compose a fresh keyed
    # z-rotation ON TOP of the stored (cloud, rotation) pair and rotate the
    # target with it. The supervision is free (any rotation of a valid pair
    # is a valid pair), the composed angle stays uniform, and the model never
    # memorizes a fixed cloud->rotation association — without this the eval
    # geodesic error floors at the train set's generalization gap.
    pose_key = jax.random.fold_in(root_key, 4)

    @jax.jit
    def pose_resample(pts, rot, step):
        k = jax.random.fold_in(pose_key, step)
        theta = jax.random.uniform(
            k, (pts.shape[0],), minval=0.0, maxval=2.0 * jnp.pi
        )
        c, s = jnp.cos(theta), jnp.sin(theta)
        z, o = jnp.zeros_like(c), jnp.ones_like(c)
        r2 = jnp.stack([c, -s, z, s, c, z, z, z, o], -1).reshape(-1, 3, 3)
        return (
            jnp.einsum("bij,bnj->bni", r2, pts),
            jnp.einsum("bij,bjk->bik", r2, rot),
        )

    # Warm the train-step compile BEFORE the prefetch thread starts: the
    # producer thread device_puts batches concurrently with the first step's
    # compile, and on the tunneled axon backend a minutes-long compile RPC
    # interleaved with streaming transfers has been observed to wedge the
    # whole tunnel (r4: reproducible at 4096-pt semseg, where the compile is
    # long; 512-pt runs with fast compiles never hit it). One throwaway step
    # on a full-size example batch populates the jit cache; the result is
    # discarded, so training semantics are unchanged.
    raw = next(batches(train_arrays, cfg.batch_size, np.random.default_rng(1)), None)
    if raw is None:
        # Train set smaller than one (drop_last) batch: zero train steps per
        # epoch is a valid configuration (eval still runs) — nothing to warm.
        log.info("train set < one batch; skipping compile warmup")
    else:
        warm = host_batch(raw)
        if cfg.task == "partseg":
            w_pts, w_onehot, w_labels = warm
            w_inputs = (w_pts, w_onehot)
        else:
            w_pts, w_labels = warm
            w_inputs = w_pts
        t0 = time.time()
        # The step donates its state argument, so warm up on a throwaway copy.
        warm_state = jax.tree_util.tree_map(jnp.copy, state)
        jax.block_until_ready(
            train_step(warm_state, *shard_batch((w_inputs, w_labels), mesh), step_rng)[1]
        )
        log.info(f"train step compiled in {time.time() - t0:.1f}s (warmup, discarded)")

    global_step = 0
    for epoch in range(cfg.epochs):
        t0 = time.time()
        epoch_losses, nb = [], 0
        it = batches(train_arrays, cfg.batch_size, data_rng)
        for dev_batch in prefetch_to_device(it, mesh, transform=host_batch):
            if cfg.task == "partseg":
                pts, onehot, labels = dev_batch
                inputs = (pts, onehot)
            else:
                pts, labels = dev_batch
                inputs = pts
            if cfg.task == "pose":
                pts, labels = pose_resample(pts, labels, global_step)
                inputs = pts
            if use_aug:
                pts = aug_fn(pts, global_step)
                inputs = (pts, inputs[1]) if cfg.task == "partseg" else pts
            state, loss = train_step(state, inputs, labels, step_rng)
            # Keep losses on device: a float() here would block every step and
            # defeat the prefetch/compute overlap.
            epoch_losses.append(loss)
            nb += 1
            global_step += 1
            if args.max_steps and global_step >= args.max_steps:
                break
        # Compile-free epoch mean: device_get is a pure transfer, so the
        # variable number of per-step scalars can't trigger a retrace (a
        # jitted stack-and-mean recompiles for every distinct epoch length).
        epoch_loss = float(np.mean(jax.device_get(epoch_losses))) if epoch_losses else 0.0
        log.info(
            f"epoch {epoch}: loss {epoch_loss:.4f} "
            f"({time.time() - t0:.1f}s, {nb * cfg.batch_size / max(time.time() - t0, 1e-9):.1f} clouds/s)"
        )
        log.metrics(global_step, epoch=epoch, train_loss=epoch_loss)

        if epoch >= cfg.min_val_epoch:
            metric = evaluate(cfg, state, eval_step, test_arrays, make_inputs, root_key, log, epoch)
            if ckpt.save_if_best(state, metric):
                log.info(f"new best {metric:.4f} -> checkpoint")
        if args.max_steps and global_step >= args.max_steps:
            break


def evaluate(cfg, state, eval_step, test_arrays, make_inputs, root_key, log, epoch) -> float:
    from mpa_tpu.train import metrics as M

    if cfg.task == "semseg":
        from mpa_tpu.data.s3dis import semseg_iou

        preds, tgts = [], []
        for batch in batches(test_arrays, cfg.batch_size, drop_last=False):
            inputs, labels, _ = make_inputs(batch)
            logp = np.asarray(eval_step(state, inputs))
            preds.append(logp.argmax(-1).reshape(-1))
            tgts.append(np.asarray(labels).reshape(-1))
        miou, acc, _ = semseg_iou(
            np.concatenate(preds), np.concatenate(tgts), cfg.num_classes
        )
        log.info(f"eval epoch {epoch}: block-mIoU {miou:.4f} point-acc {acc:.4f}")
        log.metrics(epoch, block_miou=miou, point_acc=acc)
        return miou

    if cfg.task == "pose":
        errs = []
        for batch in batches(test_arrays, cfg.batch_size, drop_last=False):
            inputs, targets, _ = make_inputs(batch)
            pred = eval_step(state, inputs)
            errs.append(float(_geodesic_jit(pred, targets)))
        err_deg = float(np.mean(errs)) * 180.0 / np.pi
        log.info(f"eval epoch {epoch}: mean geodesic error {err_deg:.2f} deg")
        log.metrics(epoch, geodesic_error_deg=err_deg)
        return -err_deg  # best-checkpoint keeps the maximum

    if cfg.task == "completion":
        cds = []
        for batch in batches(test_arrays, cfg.batch_size, drop_last=False):
            inputs, targets, _ = make_inputs(batch)
            coarse, fine = eval_step(state, inputs)
            cds.append(float(_chamfer_jit(fine, targets)))
        cd = float(np.mean(cds))
        log.info(f"eval epoch {epoch}: chamfer {cd:.5f}")
        log.metrics(epoch, chamfer=cd)
        return -cd

    if cfg.task == "partseg":
        preds, tgts, cats_all = [], [], []
        for batch in batches(test_arrays, cfg.batch_size, drop_last=False):
            inputs, labels, cats = make_inputs(batch)
            logp = np.asarray(eval_step(state, inputs))
            pred = M.category_masked_argmax(logp, cats, SEG_PARTS)
            preds += list(pred)
            tgts += list(np.asarray(labels))
            cats_all += list(cats)
        ins, cls_m, _ = tr.part_iou_metrics(preds, tgts, cats_all, SEG_PARTS)
        log.info(f"eval epoch {epoch}: ins-mIoU {ins:.4f} class-mIoU {cls_m:.4f}")
        log.metrics(epoch, ins_miou=ins, class_miou=cls_m)
        return ins

    votes, singles, labels_all = [], [], []
    vote_key = jax.random.fold_in(root_key, 99)
    for bi, batch in enumerate(batches(test_arrays, cfg.batch_size, drop_last=False)):
        inputs, labels, _ = make_inputs(batch)
        pool, single = vote_predict(
            lambda x: eval_step(state, x), inputs,
            jax.random.fold_in(vote_key, bi), cfg.num_votes,
        )
        votes.append(np.asarray(pool))
        singles.append(np.asarray(single))
        labels_all.append(np.asarray(labels))
    votes_np = np.concatenate(votes)
    labels_np = np.concatenate(labels_all)
    pred = votes_np.argmax(-1)
    acc = M.instance_accuracy(pred, labels_np)
    cls_acc = M.class_average_accuracy(pred, labels_np, cfg.num_classes)
    sing_acc = M.instance_accuracy(np.concatenate(singles).argmax(-1), labels_np)
    log.info(
        f"eval epoch {epoch}: vote-acc {acc:.4f} single-acc {sing_acc:.4f} class-acc {cls_acc:.4f}"
    )
    log.metrics(epoch, vote_acc=acc, single_acc=sing_acc, class_acc=cls_acc)
    return acc


if __name__ == "__main__":
    # main() returns the final eval metric for training runs (tests use it)
    # and an int exit code for --dry_data_check.
    _ret = main()
    sys.exit(_ret if isinstance(_ret, int) else 0)
