"""Full-config training-curve equivalence runs: torch reference vs mpa_tpu.

VERDICT r1 item 1 (quality-parity flank): no real datasets exist on this
image, so the strongest available full-scale evidence is — build the torch
reference model and the mpa_tpu model at the PUBLISHED configs (cls: batch 40,
1024 points, Adam 1e-3/wd 1e-4, SmoothClsLoss eps=.1 — reference
log/ScanObjectNN/res/logs/repsurf.repsurf_ssg_umb.txt:2; part-seg: batch 26,
2048 points, SGD .1/.9/1e-4, smoothed CE — log/part_seg/res/logs/
pointnet2_part_seg_msg.txt:2), transplant identical initial weights, feed both
the SAME deterministic realistic synthetic batches, and record per-step loss
plus periodic held-out eval (cls: instance/class acc; part-seg: the exact
ShapeNetPart ins-mIoU protocol). Curves are committed under golden/ as the
repo's layer-G artifacts; tests/test_golden_curves.py asserts they track.

Usage:
  python scripts/golden_equivalence.py --task cls     --side torch [--steps 500]
  python scripts/golden_equivalence.py --task cls     --side jax
  python scripts/golden_equivalence.py --task partseg --side torch [--steps 200]
  python scripts/golden_equivalence.py --task partseg --side jax
  python scripts/golden_equivalence.py --task cls     --side compare

Determinism contract: both sides derive init from torch.manual_seed(INIT_SEED)
on the identical torch model builder, and every batch is regenerated from
(DATA_SEED, step) — no state is shared between the two processes except this
file. Dropout is 0 on both sides (draws can't be shared across frameworks);
FPS starts at index 0 on both sides (the reference randomizes the start —
torch.randint, modules/pointnet2_utils.py:96).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

INIT_SEED = 2800  # the reference's own published seed
DATA_SEED = 41
VOTE_SEED = 777  # deterministic vote-TTA scale draws, shared by both sides
NUM_VOTES = 3  # the reference's training-eval vote count (tool/train_cls_scanobjectnn.py:97)


def vote_scales(n_clouds: int, votes: int = NUM_VOTES):
    """Per-vote xyz scale factors for the published vote-TTA protocol: vote 0
    is the unscaled cloud, later votes scale uniformly in [0.95, 1.05]
    (reference PointcloudScale, tool/test_classification.py:68-79,138).
    Drawn once from a fixed seed so torch and jax sides vote on IDENTICAL
    inputs."""
    rng = np.random.default_rng(VOTE_SEED)
    return [np.ones((n_clouds, 1, 1), np.float32)] + [
        rng.uniform(0.95, 1.05, (n_clouds, 1, 1)).astype(np.float32)
        for _ in range(votes - 1)
    ]

CONFIGS = {
    "cls": dict(
        batch=40, num_points=1024, num_classes=15, steps=500,
        # eval_clouds 2080 (r5; was 520): the smaller split quantized eval
        # acc in ~0.004 steps and pinned the noisy plateau at exactly the
        # same value on both sides, so the 0.02 late-regime guards spanned
        # only ~5 clouds. 4x the split puts the guards well above the
        # quantization floor (reference's own test split: 2882 clouds).
        lr=1e-3, weight_decay=1e-4, eval_every=50, eval_clouds=2080,
        # StepLR(step=20 epochs, gamma=.7); epoch = 11416/40 steps.
        steps_per_epoch=285,
        # Deterministic label noise (VERDICT r3 item 3): the clean composed-
        # primitive task saturates both curves at eval acc 1.0 by step 99,
        # making the late-regime guards trivial. Flipping 25% of train AND
        # eval labels to a uniform other class caps a clean-predictor's eval
        # acc at ~0.75, so the plateau sits strictly inside (0, 1) and the
        # drift/vote guards measure real disagreement on marginal clouds.
        # Both sides draw the SAME flips (seeded from the batch seed).
        label_noise=0.25,
    ),
    "partseg": dict(
        batch=26, num_points=2048, steps=200,
        lr=0.1, momentum=0.9, weight_decay=1e-4, eval_every=50,
        eval_clouds=104, steps_per_epoch=538,  # 13998/26
    ),
}


def lr_at(task: str, step: int) -> float:
    cfg = CONFIGS[task]
    epoch = step // cfg["steps_per_epoch"]
    if task == "cls":  # StepLR(20, 0.7)
        return cfg["lr"] * 0.7 ** (epoch // 20)
    # cosine annealing over 300 epochs, eta_min 1e-3
    return 1e-3 + 0.5 * (cfg["lr"] - 1e-3) * (1 + math.cos(math.pi * epoch / 300))


def lr_schedule(task: str):
    """lr_at as an optax schedule (jnp ops on the traced update count), so
    the JAX side anneals every step exactly like the torch side — not frozen
    at the step-0 value."""
    import jax.numpy as jnp

    cfg = CONFIGS[task]
    spe = cfg["steps_per_epoch"]
    if task == "cls":
        return lambda count: cfg["lr"] * jnp.power(0.7, (count // spe) // 20)
    return lambda count: 1e-3 + 0.5 * (cfg["lr"] - 1e-3) * (
        1 + jnp.cos(jnp.pi * (count // spe) / 300.0)
    )


# --- deterministic data ------------------------------------------------------
def _flip_labels(labels, seed: int, p: float, num_classes: int):
    """Deterministically flip a fraction p of labels to a uniform OTHER class
    (so a flipped label is never accidentally correct). Shared by both sides:
    the flips are part of the dataset, not of either framework."""
    if p <= 0:
        return labels
    rng = np.random.default_rng(seed ^ 0x5EED_CAFE)
    flip = rng.random(labels.shape) < p
    offset = rng.integers(1, num_classes, size=labels.shape)
    return np.where(flip, (labels + offset) % num_classes, labels).astype(labels.dtype)


def cls_batch(step: int):
    from mpa_tpu.data.synthetic import realistic_clouds

    cfg = CONFIGS["cls"]
    seed = DATA_SEED * 1_000_003 + step
    pts, labels = realistic_clouds(
        cfg["batch"], cfg["num_points"], cfg["num_classes"], seed=seed
    )
    return pts, _flip_labels(labels, seed, cfg["label_noise"], cfg["num_classes"])


def cls_eval_set():
    from mpa_tpu.data.synthetic import realistic_clouds

    cfg = CONFIGS["cls"]
    pts, labels = realistic_clouds(
        cfg["eval_clouds"], cfg["num_points"], cfg["num_classes"], seed=999_999
    )
    return pts, _flip_labels(labels, 999_999, cfg["label_noise"], cfg["num_classes"])


def partseg_batch(step: int):
    from mpa_tpu.data.synthetic import realistic_partseg

    cfg = CONFIGS["partseg"]
    return realistic_partseg(
        cfg["batch"], cfg["num_points"], seed=DATA_SEED * 1_000_003 + step
    )


def partseg_eval_set():
    cfg = CONFIGS["partseg"]
    from mpa_tpu.data.synthetic import realistic_partseg

    return realistic_partseg(cfg["eval_clouds"], cfg["num_points"], seed=888_888)


# --- model builders (identical init on both sides) ---------------------------
def build_cls_torch():
    import torch
    from torch_side import cls_model as CLS

    torch.manual_seed(INIT_SEED)
    tmodel = CLS._TorchModel()
    return tmodel, CLS


def build_partseg_torch():
    import torch
    from torch_side import partseg_model as SEG

    torch.manual_seed(INIT_SEED)
    tmodel = SEG._TorchPartSeg()
    return tmodel, SEG


def fast_cpu_upsample(points, knn_idx_, scale_ratio=2, dist=None):
    """Memory-efficient equivalent of the reference's dense scatter_-then-sum
    upsample (modules/pointnet2_utils.py:13-50): per coarse point s, its
    feature reaches K distinct kNN targets, contributions are summed over s
    and divided by the count of contributors with nonzero channel 0 (the
    reference's count_nonzero semantics), empty slots divide by 1."""
    import torch

    B, S, C = points.shape
    K = knn_idx_.shape[-1]
    N = S * scale_ratio
    idx = knn_idx_.long()
    flat = (torch.arange(B).view(B, 1, 1) * N + idx).reshape(-1)
    vals = points.unsqueeze(2).expand(B, S, K, C).reshape(-1, C)
    acc = torch.zeros(B * N, C)
    acc.index_add_(0, flat, vals)
    nz = (points[:, :, 0] != 0).float().unsqueeze(-1).expand(B, S, K).reshape(-1)
    cnt = torch.zeros(B * N)
    cnt.index_add_(0, flat, nz)
    cnt = torch.where(cnt == 0, torch.ones_like(cnt), cnt)
    return (acc / cnt.unsqueeze(-1)).view(B, N, C)


# --- state save / resume ------------------------------------------------------
def _torch_state_path(out_path):
    return out_path.replace(".jsonl", "_state.pt")


def _save_torch_state(tmodel, opt, step, out_path):
    import torch

    tmp = _torch_state_path(out_path) + ".tmp"
    torch.save({"model": tmodel.state_dict(), "opt": opt.state_dict(),
                "step": step}, tmp)
    os.replace(tmp, _torch_state_path(out_path))


def _resume_torch(tmodel, opt, out_path, resume):
    import torch

    sp = _torch_state_path(out_path)
    if resume and os.path.exists(sp):
        st = torch.load(sp, weights_only=True)
        tmodel.load_state_dict(st["model"])
        opt.load_state_dict(st["opt"])
        print(f"[resume] {sp} at step {st['step']}", flush=True)
        return st["step"]
    return 0


def _jax_state_path(out_path):
    return out_path.replace(".jsonl", "_state.pkl")


def _save_jax_state(params, stats, opt_state, step, out_path):
    import pickle

    import jax

    to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
    tmp = _jax_state_path(out_path) + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({"params": to_np(params), "stats": to_np(stats),
                     "opt_state": to_np(opt_state), "step": step}, f)
    os.replace(tmp, _jax_state_path(out_path))


def _resume_jax(params, stats, opt_state, out_path, resume):
    import pickle

    import jax
    import jax.numpy as jnp

    sp = _jax_state_path(out_path)
    if resume and os.path.exists(sp):
        with open(sp, "rb") as f:
            st = pickle.load(f)
        to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        print(f"[resume] {sp} at step {st['step']}", flush=True)
        return (to_j(st["params"]), to_j(st["stats"]),
                to_j(st["opt_state"]), st["step"])
    return params, stats, opt_state, 0


# --- torch runners -----------------------------------------------------------
def run_cls_torch(steps: int, out_path: str, resume: bool = False):
    import torch
    from ref_oracle import load_reference, _farthest_point_sample

    REF = load_reference()
    REF["repsurface_utils"].farthest_point_sample = (
        lambda xyz, n: _farthest_point_sample(xyz, n)
    )
    tmodel, _ = build_cls_torch()
    tmodel.train()
    cfg = CONFIGS["cls"]
    opt = torch.optim.Adam(
        tmodel.parameters(), lr=cfg["lr"], weight_decay=cfg["weight_decay"]
    )
    ex, ey = cls_eval_set()

    def smooth_nll(logp, target, eps=0.1):
        n = logp.shape[-1]
        oh = torch.nn.functional.one_hot(target, n).float()
        sm = oh * (1 - eps) + (1 - oh) * eps / (n - 1)
        return -(sm * logp).sum(-1).mean()

    def batched_logp(clouds):
        lps = []
        with torch.no_grad():
            for i in range(0, len(clouds), cfg["batch"]):
                bx = torch.from_numpy(clouds[i : i + cfg["batch"]].transpose(0, 2, 1))
                lps.append(tmodel(bx).numpy())
        return np.concatenate(lps)

    start = _resume_torch(tmodel, opt, out_path, resume)
    with open(out_path, "a" if start else "w") as f:
        for step in range(start, steps):
            lr = lr_at("cls", step)
            for g in opt.param_groups:
                g["lr"] = lr
            x, y = cls_batch(step)
            xt = torch.from_numpy(x.transpose(0, 2, 1))
            yt = torch.from_numpy(y)
            t0 = time.time()
            opt.zero_grad()
            logp = tmodel(xt)
            loss = smooth_nll(logp, yt)
            loss.backward()
            opt.step()
            rec = {
                "kind": "train", "step": step, "loss": round(float(loss.detach()), 6),
                "acc": round(float((logp.detach().argmax(-1) == yt).float().mean()), 4),
                "lr": lr, "sec": round(time.time() - t0, 2),
            }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            if (step + 1) % cfg["eval_every"] == 0 or step == steps - 1:
                tmodel.eval()
                preds, eloss, nb = [], 0.0, 0
                with torch.no_grad():
                    for i in range(0, len(ex), cfg["batch"]):
                        bx = torch.from_numpy(ex[i : i + cfg["batch"]].transpose(0, 2, 1))
                        by = torch.from_numpy(ey[i : i + cfg["batch"]])
                        lp = tmodel(bx)
                        eloss += float(smooth_nll(lp, by))
                        nb += 1
                        preds.append(lp.argmax(-1).numpy())
                tmodel.train()
                from mpa_tpu.train.metrics import (
                    class_average_accuracy, instance_accuracy,
                )

                pred = np.concatenate(preds)
                rec = {
                    "kind": "eval", "step": step,
                    "loss": round(eloss / nb, 6),
                    "acc": round(instance_accuracy(pred, ey), 4),
                    "cls_acc": round(
                        class_average_accuracy(pred, ey, cfg["num_classes"]), 4
                    ),
                }
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(f"[torch cls] {rec}", flush=True)
                _save_torch_state(tmodel, opt, step + 1, out_path)
                if step == steps - 1:
                    # published-protocol vote-TTA point: mean of log-probs
                    # over NUM_VOTES scaled votes (tool/train_cls_scanobjectnn.py:92-107)
                    tmodel.eval()
                    vote_lp = None
                    for sc in vote_scales(len(ex)):
                        lp = batched_logp(ex * sc)
                        vote_lp = lp if vote_lp is None else vote_lp + lp
                    tmodel.train()
                    vpred = np.argmax(vote_lp / NUM_VOTES, -1)
                    rec = {
                        "kind": "vote_eval", "step": step, "votes": NUM_VOTES,
                        "acc": round(instance_accuracy(vpred, ey), 4),
                        "cls_acc": round(
                            class_average_accuracy(vpred, ey, cfg["num_classes"]), 4
                        ),
                    }
                    f.write(json.dumps(rec) + "\n")
                    f.flush()
                    print(f"[torch cls] {rec}", flush=True)


def run_partseg_torch(steps: int, out_path: str, resume: bool = False):
    import torch
    import torch.nn.functional as F
    from ref_oracle import load_reference, _farthest_point_sample

    REF = load_reference()
    ref_mod = REF["pointnet2_utils"]
    ref_mod.farthest_point_sample = lambda xyz, n: _farthest_point_sample(xyz, n)
    ref_mod.upsample = fast_cpu_upsample
    tmodel, _ = build_partseg_torch()
    tmodel.train()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.eval()
    cfg = CONFIGS["partseg"]
    opt = torch.optim.SGD(
        tmodel.parameters(), lr=cfg["lr"], momentum=cfg["momentum"],
        weight_decay=cfg["weight_decay"],
    )
    ep, ec, el = partseg_eval_set()
    eoh = np.eye(16, dtype=np.float32)[ec]

    def smooth_seg_nll(logp, target, eps=0.1):
        n = logp.shape[-1]
        lp = logp.reshape(-1, n)
        tg = target.reshape(-1)
        oh = torch.nn.functional.one_hot(tg, n).float()
        sm = oh * (1 - eps) + (1 - oh) * eps / (n - 1)
        return -(sm * lp).sum(-1).mean()

    def batched_logp_seg(clouds):
        lps = []
        with torch.no_grad():
            for i in range(0, len(clouds), cfg["batch"]):
                bx = torch.from_numpy(clouds[i : i + cfg["batch"]].transpose(0, 2, 1))
                boh = torch.from_numpy(eoh[i : i + cfg["batch"], None, :])
                lps.append(F.log_softmax(tmodel(bx, boh), -1).numpy())
        return np.concatenate(lps)

    start = _resume_torch(tmodel, opt, out_path, resume)
    with open(out_path, "a" if start else "w") as f:
        for step in range(start, steps):
            lr = lr_at("partseg", step)
            for g in opt.param_groups:
                g["lr"] = lr
            x, cats, seg = partseg_batch(step)
            oh = np.eye(16, dtype=np.float32)[cats]
            xt = torch.from_numpy(x.transpose(0, 2, 1))
            st = torch.from_numpy(seg)
            t0 = time.time()
            opt.zero_grad()
            logits = tmodel(xt, torch.from_numpy(oh[:, None, :]))
            logp = F.log_softmax(logits, -1)
            loss = smooth_seg_nll(logp, st)
            loss.backward()
            opt.step()
            rec = {
                "kind": "train", "step": step, "loss": round(float(loss.detach()), 6),
                "acc": round(float((logp.detach().argmax(-1) == st).float().mean()), 4),
                "lr": lr, "sec": round(time.time() - t0, 2),
            }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            if (step + 1) % cfg["eval_every"] == 0 or step == steps - 1:
                tmodel.eval()
                from mpa_tpu.data.shapenetpart import SEG_PARTS
                from mpa_tpu.train.metrics import (
                    category_masked_argmax, part_iou_metrics, point_accuracy,
                )

                preds, eloss, nb = [], 0.0, 0
                with torch.no_grad():
                    for i in range(0, len(ep), cfg["batch"]):
                        bx = torch.from_numpy(ep[i : i + cfg["batch"]].transpose(0, 2, 1))
                        boh = torch.from_numpy(eoh[i : i + cfg["batch"], None, :])
                        bl = torch.from_numpy(el[i : i + cfg["batch"]])
                        lp = F.log_softmax(tmodel(bx, boh), -1)
                        eloss += float(smooth_seg_nll(lp, bl))
                        nb += 1
                        preds.append(
                            category_masked_argmax(
                                lp.numpy(), ec[i : i + cfg["batch"]], SEG_PARTS
                            )
                        )
                tmodel.train()
                for m in tmodel.modules():
                    if isinstance(m, torch.nn.Dropout):
                        m.eval()
                pred = np.concatenate(preds)
                ins, cls_miou, _ = part_iou_metrics(
                    list(pred), list(el), list(ec), SEG_PARTS
                )
                rec = {
                    "kind": "eval", "step": step, "loss": round(eloss / nb, 6),
                    "ins_miou": round(ins, 4), "cls_miou": round(cls_miou, 4),
                    "point_acc": round(point_accuracy(list(pred), list(el)), 4),
                }
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(f"[torch partseg] {rec}", flush=True)
                _save_torch_state(tmodel, opt, step + 1, out_path)
                if step == steps - 1:
                    # vote-TTA point (tool/test_partseg.py:143-147 protocol:
                    # scaled votes, pooled predictions, masked argmax)
                    tmodel.eval()
                    vote_lp = None
                    for sc in vote_scales(len(ep)):
                        lp = batched_logp_seg(ep * sc)
                        vote_lp = lp if vote_lp is None else vote_lp + lp
                    tmodel.train()
                    for m in tmodel.modules():
                        if isinstance(m, torch.nn.Dropout):
                            m.eval()
                    vpred = category_masked_argmax(vote_lp / NUM_VOTES, ec, SEG_PARTS)
                    vins, vcls, _ = part_iou_metrics(
                        list(vpred), list(el), list(ec), SEG_PARTS
                    )
                    rec = {
                        "kind": "vote_eval", "step": step, "votes": NUM_VOTES,
                        "ins_miou": round(vins, 4), "cls_miou": round(vcls, 4),
                        "point_acc": round(point_accuracy(list(vpred), list(el)), 4),
                    }
                    f.write(json.dumps(rec) + "\n")
                    f.flush()
                    print(f"[torch partseg] {rec}", flush=True)


# --- jax runners -------------------------------------------------------------
def _exact_tpu_kernels():
    """Select the bit-exact kernel modes for parity runs (the production
    defaults trade ~7e-5 of neighbour picks / ~0.4% gradient rounding for
    speed — docs/PERF.md). Must run before anything is traced: these are
    trace-time globals (see ops/pallas/knn_pallas.py:31-38)."""
    from mpa_tpu.ops.pallas import attention_pallas, knn_pallas

    knn_pallas.DIST_MATMUL_PRECISION = "highest"
    attention_pallas.GRAD_SCATTER_PRECISION = "hilo"
    attention_pallas.GATHER_PRECISION = "hilo3"


def run_cls_jax(steps: int, out_path: str, resume: bool = False):
    import jax
    import jax.numpy as jnp
    import optax
    from torch_side import cls_model as CLS
    from torch_side import helpers as H
    from mpa_tpu.models import MarkovClassifier
    from mpa_tpu.train.loop import make_optimizer
    from mpa_tpu.train.losses import smooth_cls_loss
    from mpa_tpu.train.metrics import class_average_accuracy, instance_accuracy

    # The parity-test helpers randomize BN affine/stats to make transplants
    # nontrivial; here both sides must share the FRESH torch init instead.
    H.randomize_bn_ = lambda bn: None
    _exact_tpu_kernels()
    tmodel, _ = build_cls_torch()
    tmodel.eval()
    variables = CLS.extract_variables(tmodel)
    del tmodel
    cfg = CONFIGS["cls"]
    jmodel = MarkovClassifier(
        num_classes=cfg["num_classes"],
        npoints=(512, 256, 128, 64, 32),
        channels=(64, 64, 64, 128, 256, 512),
        residuals=(True, False, False, True, True, True),
        dropout=0.0,
    )
    tx = make_optimizer("adam-l2", lr_schedule("cls"), cfg["weight_decay"])
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, stats, opt_state, x, y):
        def loss_fn(p):
            out, upd = jmodel.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return smooth_cls_loss(out, y), (upd["batch_stats"], out)

        (loss, (new_stats, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        u, opt_state2 = tx.update(grads, opt_state, params)
        acc = jnp.mean((jnp.argmax(out, -1) == y).astype(jnp.float32))
        return optax.apply_updates(params, u), new_stats, opt_state2, loss, acc

    @jax.jit
    def eval_fn(params, stats, x, y):
        out = jmodel.apply({"params": params, "batch_stats": stats}, x, train=False)
        return smooth_cls_loss(out, y), jnp.argmax(out, -1)

    @jax.jit
    def logp_fn(params, stats, x):
        return jmodel.apply({"params": params, "batch_stats": stats}, x, train=False)

    ex, ey = cls_eval_set()
    params, stats, opt_state, start = _resume_jax(
        params, stats, opt_state, out_path, resume
    )
    with open(out_path, "a" if start else "w") as f:
        for step in range(start, steps):
            x, y = cls_batch(step)
            t0 = time.time()
            params, stats, opt_state, loss, acc = step_fn(
                params, stats, opt_state, jnp.asarray(x), jnp.asarray(y)
            )
            rec = {
                "kind": "train", "step": step, "loss": round(float(loss), 6),
                "acc": round(float(acc), 4), "lr": lr_at("cls", step),
                "sec": round(time.time() - t0, 3),
            }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            if (step + 1) % cfg["eval_every"] == 0 or step == steps - 1:
                preds, eloss, nb = [], 0.0, 0
                for i in range(0, len(ex), cfg["batch"]):
                    l, p = eval_fn(
                        params, stats,
                        jnp.asarray(ex[i : i + cfg["batch"]]),
                        jnp.asarray(ey[i : i + cfg["batch"]]),
                    )
                    eloss += float(l)
                    nb += 1
                    preds.append(np.asarray(p))
                pred = np.concatenate(preds)
                rec = {
                    "kind": "eval", "step": step, "loss": round(eloss / nb, 6),
                    "acc": round(instance_accuracy(pred, ey), 4),
                    "cls_acc": round(
                        class_average_accuracy(pred, ey, cfg["num_classes"]), 4
                    ),
                }
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(f"[jax cls] {rec}", flush=True)
                _save_jax_state(params, stats, opt_state, step + 1, out_path)
                if step == steps - 1:
                    vote_lp = None
                    for sc in vote_scales(len(ex)):
                        lps = []
                        for i in range(0, len(ex), cfg["batch"]):
                            lps.append(np.asarray(logp_fn(
                                params, stats,
                                jnp.asarray(ex[i : i + cfg["batch"]]
                                            * sc[i : i + cfg["batch"]]),
                            )))
                        lp = np.concatenate(lps)
                        vote_lp = lp if vote_lp is None else vote_lp + lp
                    vpred = np.argmax(vote_lp / NUM_VOTES, -1)
                    rec = {
                        "kind": "vote_eval", "step": step, "votes": NUM_VOTES,
                        "acc": round(instance_accuracy(vpred, ey), 4),
                        "cls_acc": round(
                            class_average_accuracy(vpred, ey, cfg["num_classes"]), 4
                        ),
                    }
                    f.write(json.dumps(rec) + "\n")
                    f.flush()
                    print(f"[jax cls] {rec}", flush=True)


def run_partseg_jax(steps: int, out_path: str, resume: bool = False):
    import jax
    import jax.numpy as jnp
    import optax
    from torch_side import helpers as H
    from torch_side import partseg_model as SEG
    from mpa_tpu.data.shapenetpart import SEG_PARTS
    from mpa_tpu.models import MarkovPartSeg
    from mpa_tpu.train.loop import make_optimizer
    from mpa_tpu.train.losses import smooth_seg_loss
    from mpa_tpu.train.metrics import (
        category_masked_argmax, part_iou_metrics, point_accuracy,
    )

    H.randomize_bn_ = lambda bn: None
    _exact_tpu_kernels()
    tmodel, _ = build_partseg_torch()
    tmodel.eval()
    variables = SEG.extract_variables(tmodel)
    del tmodel
    cfg = CONFIGS["partseg"]
    jmodel = MarkovPartSeg(
        num_parts=50, num_categories=16, npoints=(1024, 512, 256, 128),
        residuals=(True, False, False, True, True), dropout=0.0,
    )
    tx = make_optimizer(
        "sgd", lr_schedule("partseg"), cfg["weight_decay"], momentum=cfg["momentum"]
    )
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, stats, opt_state, x, oh, seg):
        def loss_fn(p):
            out, upd = jmodel.apply(
                {"params": p, "batch_stats": stats}, (x, oh), train=True,
                mutable=["batch_stats"],
            )
            return smooth_seg_loss(out, seg), (upd["batch_stats"], out)

        (loss, (new_stats, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        u, opt_state2 = tx.update(grads, opt_state, params)
        acc = jnp.mean((jnp.argmax(out, -1) == seg).astype(jnp.float32))
        return optax.apply_updates(params, u), new_stats, opt_state2, loss, acc

    @jax.jit
    def eval_fn(params, stats, x, oh, seg):
        out = jmodel.apply(
            {"params": params, "batch_stats": stats}, (x, oh), train=False
        )
        return smooth_seg_loss(out, seg), out

    ep, ec, el = partseg_eval_set()
    eoh = np.eye(16, dtype=np.float32)[ec]
    params, stats, opt_state, start = _resume_jax(
        params, stats, opt_state, out_path, resume
    )
    with open(out_path, "a" if start else "w") as f:
        for step in range(start, steps):
            x, cats, seg = partseg_batch(step)
            oh = np.eye(16, dtype=np.float32)[cats]
            t0 = time.time()
            params, stats, opt_state, loss, acc = step_fn(
                params, stats, opt_state,
                jnp.asarray(x), jnp.asarray(oh), jnp.asarray(seg),
            )
            rec = {
                "kind": "train", "step": step, "loss": round(float(loss), 6),
                "acc": round(float(acc), 4), "lr": lr_at("partseg", step),
                "sec": round(time.time() - t0, 3),
            }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            if (step + 1) % cfg["eval_every"] == 0 or step == steps - 1:
                preds, eloss, nb = [], 0.0, 0
                for i in range(0, len(ep), cfg["batch"]):
                    l, out = eval_fn(
                        params, stats,
                        jnp.asarray(ep[i : i + cfg["batch"]]),
                        jnp.asarray(eoh[i : i + cfg["batch"]]),
                        jnp.asarray(el[i : i + cfg["batch"]]),
                    )
                    eloss += float(l)
                    nb += 1
                    preds.append(
                        category_masked_argmax(
                            np.asarray(out), ec[i : i + cfg["batch"]], SEG_PARTS
                        )
                    )
                pred = np.concatenate(preds)
                ins, cls_miou, _ = part_iou_metrics(
                    list(pred), list(el), list(ec), SEG_PARTS
                )
                rec = {
                    "kind": "eval", "step": step, "loss": round(eloss / nb, 6),
                    "ins_miou": round(ins, 4), "cls_miou": round(cls_miou, 4),
                    "point_acc": round(point_accuracy(list(pred), list(el)), 4),
                }
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(f"[jax partseg] {rec}", flush=True)
                _save_jax_state(params, stats, opt_state, step + 1, out_path)
                if step == steps - 1:
                    vote_lp = None
                    for sc in vote_scales(len(ep)):
                        lps = []
                        for i in range(0, len(ep), cfg["batch"]):
                            _, out = eval_fn(
                                params, stats,
                                jnp.asarray(ep[i : i + cfg["batch"]]
                                            * sc[i : i + cfg["batch"]]),
                                jnp.asarray(eoh[i : i + cfg["batch"]]),
                                jnp.asarray(el[i : i + cfg["batch"]]),
                            )
                            lps.append(np.asarray(out))
                        lp = np.concatenate(lps)
                        vote_lp = lp if vote_lp is None else vote_lp + lp
                    vpred = category_masked_argmax(vote_lp / NUM_VOTES, ec, SEG_PARTS)
                    vins, vcls, _ = part_iou_metrics(
                        list(vpred), list(el), list(ec), SEG_PARTS
                    )
                    rec = {
                        "kind": "vote_eval", "step": step, "votes": NUM_VOTES,
                        "ins_miou": round(vins, 4), "cls_miou": round(vcls, 4),
                        "point_acc": round(point_accuracy(list(vpred), list(el)), 4),
                    }
                    f.write(json.dumps(rec) + "\n")
                    f.flush()
                    print(f"[jax partseg] {rec}", flush=True)


# --- compare -----------------------------------------------------------------
def load_curve(path):
    train, evals, votes = [], [], []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            {"train": train, "eval": evals, "vote_eval": votes}[rec["kind"]].append(rec)
    return train, evals, votes


def compare(task: str, out_dir: str):
    ttrain, tevals, tvotes = load_curve(os.path.join(out_dir, f"{task}_torch.jsonl"))
    jtrain, jevals, jvotes = load_curve(os.path.join(out_dir, f"{task}_jax.jsonl"))
    n = min(len(ttrain), len(jtrain))
    tl = np.array([r["loss"] for r in ttrain[:n]])
    jl = np.array([r["loss"] for r in jtrain[:n]])
    diff = np.abs(tl - jl)
    # Eval-metric drift: the per-eval jax-minus-torch gap on the headline
    # metric, plus the least-squares slope of the gap over the last 4 evals
    # (in metric units per eval point) — the r2 curve showed a monotonically
    # widening partseg gap and this quantifies whether it plateaus.
    key = "ins_miou" if task == "partseg" else "acc"
    ne = min(len(tevals), len(jevals))
    gaps = [round(jevals[i][key] - tevals[i][key], 4) for i in range(ne)]
    tail = np.array(gaps[-4:], dtype=np.float64)
    slope = float(np.polyfit(np.arange(len(tail)), tail, 1)[0]) if len(tail) >= 2 else 0.0
    summary = {
        "task": task, "steps": n,
        "loss_diff_step0": float(diff[0]),
        "loss_diff_mean": float(diff.mean()),
        "loss_diff_max": float(diff.max()),
        "loss_diff_last50_mean": float(diff[-50:].mean()),
        "torch_loss_first": float(tl[0]), "torch_loss_last": float(tl[-1]),
        "jax_loss_first": float(jl[0]), "jax_loss_last": float(jl[-1]),
        "eval_metric": key,
        "eval_gap_jax_minus_torch": gaps,
        "eval_gap_tail_slope": round(slope, 5),
        "torch_evals": tevals, "jax_evals": jevals,
        "torch_vote_evals": tvotes, "jax_vote_evals": jvotes,
    }
    path = os.path.join(out_dir, f"{task}_summary.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if "evals" not in k}, indent=1))
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=("cls", "partseg"), required=True)
    ap.add_argument("--side", choices=("torch", "jax", "compare"), required=True)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--resume", action="store_true",
                    help="continue from the saved *_state checkpoint (curves "
                    "append to the existing jsonl)")
    ap.add_argument("--eval_clouds", type=int, default=None,
                    help="override the held-out eval-set size (smoke tests "
                    "only — committed curves use the default)")
    ap.add_argument("--out", default=os.path.join(REPO, "golden"))
    ap.add_argument(
        "--platform", default=None,
        help="jax platform for --side jax (e.g. cpu when no chip is reachable;"
        " default = the image's TPU)",
    )
    args = ap.parse_args()
    if args.platform and args.side == "jax":
        import jax

        jax.config.update("jax_platforms", args.platform)
    os.makedirs(args.out, exist_ok=True)
    if args.eval_clouds:
        CONFIGS[args.task]["eval_clouds"] = args.eval_clouds
    steps = args.steps or CONFIGS[args.task]["steps"]
    if args.side == "compare":
        compare(args.task, args.out)
        return
    out_path = os.path.join(args.out, f"{args.task}_{args.side}.jsonl")
    runner = {
        ("cls", "torch"): run_cls_torch,
        ("cls", "jax"): run_cls_jax,
        ("partseg", "torch"): run_partseg_torch,
        ("partseg", "jax"): run_partseg_jax,
    }[(args.task, args.side)]
    t0 = time.time()
    runner(steps, out_path, resume=args.resume)
    print(f"done: {out_path} in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
