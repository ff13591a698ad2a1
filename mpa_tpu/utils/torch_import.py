"""Import reference PyTorch checkpoints into mpa_tpu variable trees.

Migration path for users of the reference repo: a trained
``checkpoints/best_model.pth`` (written by tool/train_cls_scanobjectnn.py:295
or tool/train_partseg.py:294) loads directly into ``MarkovClassifier`` /
``MarkovPartSeg`` — no torch model required, only the state dict's key
structure, which this module mirrors:

- cls ``Model`` (models/repsurf/repsurf_ssg_umb.py:35-70): ``keepHigh.la0-5``
  (LocalMerge: ``xyz_Trans``/``feature_Trans``/``feature_Trans2``/``fc2``),
  ``keepHigh.conv3/conv4/final_class/bn``, head ``fc1/bn1/fc2/bn2/fc3``.
- part-seg ``get_model`` (models/repsurf/pointnet2_part_seg_msg.py:33-156 +
  modules/pointnet2_utils.py:711-858): ``keepHigh.la0-4[,_up]``
  (``feature_Trans1``/``feature_Trans2``), ``up_conv1-4``, ``mlp``,
  ``fuse1-5`` (``conv{s}{t}``/``conv{t}``), ``conv5/conv7``, head
  ``conv8-10`` + ``conv11``.

Weight-layout transforms (same as the golden-parity test transplants, which
verify them end-to-end to 5e-4 logits): torch ``nn.Linear`` weight [out, in]
-> flax Dense kernel [in, out] (transpose); LayerNorm/BatchNorm weight/bias
-> scale/bias (+ running stats into batch_stats). The norm KIND at each
reference ``Linear`` site (its inverted ``bn`` flag) is inferred from the
destination template: a ``batch_stats`` entry at the site means BatchNorm
(torch ``norm2``), else LayerNorm (``norm1``).

Dead reference weights (``normal_Trans`` — constructed, never called:
modules/repsurface_utils.py:418,429 — plus dropout-free extras) are skipped
and reported, as is the optimizer state (the reference's resume drops it
too, SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np


class _SD:
    """Prefix view over a flat torch state dict; tracks consumed keys."""

    def __init__(self, tensors: Dict[str, np.ndarray], used: set, prefix: str = ""):
        self._t = tensors
        self._used = used
        self._p = prefix

    def child(self, name: str) -> "_SD":
        return _SD(self._t, self._used, f"{self._p}{name}.")

    def __call__(self, name: str) -> jnp.ndarray:
        key = self._p + name
        self._used.add(key)
        return jnp.asarray(self._t[key])

    def has(self, name: str) -> bool:
        return (self._p + name) in self._t


def _dense(sd: _SD, name: str) -> dict:
    m = sd.child(name)
    return {"kernel": m("weight").T, "bias": m("bias")}


def _linear_unit(sd: _SD, name: str, t_params: dict, t_stats: dict) -> Tuple[dict, dict]:
    """Reference ``Linear`` block -> LinearUnit {params, stats}. Norm kind
    comes from the TEMPLATE (batch_stats present => BatchNorm/norm2);
    ``t_params`` is accepted for a uniform mapper signature."""
    m = sd.child(name)
    params = {"linear": _dense(m, "linear")}
    stats = {}
    is_batch = "norm" in (t_stats or {})
    norm = m.child("norm2" if is_batch else "norm1")
    params["norm"] = {"scale": norm("weight"), "bias": norm("bias")}
    if is_batch:
        stats["norm"] = {"mean": norm("running_mean"), "var": norm("running_var")}
    return params, stats


def _localtrans(sd: _SD, name: str, t_params: dict, t_stats: dict) -> Tuple[dict, dict]:
    m = sd.child(name)
    params = {
        "q": _dense(m, "q"),
        "k": _dense(m, "k"),
        "v": _dense(m, "v"),
    }
    stats = {}
    params["ffn"], s = _linear_unit(m, "ffn", t_params.get("ffn"), (t_stats or {}).get("ffn"))
    if s:
        stats["ffn"] = s
    if "conv_res" in t_params:
        params["conv_res"], s = _linear_unit(
            m, "conv_res", t_params["conv_res"], (t_stats or {}).get("conv_res")
        )
        if s:
            stats["conv_res"] = s
    return params, stats


def _localmerge(
    sd: _SD, name: str, t_params: dict, t_stats: dict, *, feature_trans_name: str
) -> Tuple[dict, dict]:
    """LocalMerge of either reference variant; which branches exist is read
    from the template (first states have only the xyz branch)."""
    m = sd.child(name)
    params, stats = {}, {}
    mapping = {
        "xyz_trans": "xyz_Trans",
        "feature_trans": feature_trans_name,
        "feature_trans2": "feature_Trans2",
    }
    for flax_name, torch_name in mapping.items():
        if flax_name in t_params:
            params[flax_name], s = _localtrans(
                m, torch_name, t_params[flax_name], (t_stats or {}).get(flax_name)
            )
            if s:
                stats[flax_name] = s
    if "fc2" in t_params:
        params["fc2"], s = _linear_unit(m, "fc2", t_params["fc2"], (t_stats or {}).get("fc2"))
        if s:
            stats["fc2"] = s
    return params, stats


def _bn(sd: _SD, name: str) -> Tuple[dict, dict]:
    m = sd.child(name)
    return (
        {"scale": m("weight"), "bias": m("bias")},
        {"mean": m("running_mean"), "var": m("running_var")},
    )


def _normalize_state_dict(ckpt: Any) -> Dict[str, np.ndarray]:
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):  # DataParallel wrapper
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def import_cls_state_dict(ckpt: Any, template_variables: Any) -> Tuple[dict, dict]:
    """Reference cls ``Model`` state dict -> MarkovClassifier variables.

    Returns ``(variables, report)``; report lists skipped torch keys.
    ``template_variables`` = variables of a freshly initialized model with
    the SAME architecture flags (e.g. ``create_train_state(...)`` output) —
    only its tree structure is read, never its values.
    """
    tensors = _normalize_state_dict(ckpt)
    used: set = set()
    sd = _SD(tensors, used)
    tp = template_variables["params"]
    ts = template_variables.get("batch_stats", {})

    kh = sd.child("keepHigh")
    tkh_p, tkh_s = tp["keep_high"], ts.get("keep_high", {})
    p, s = {}, {}
    for la in [k for k in tkh_p if k.startswith("la")]:
        p[la], s[la] = _localmerge(
            kh, la, tkh_p[la], tkh_s.get(la), feature_trans_name="feature_Trans"
        )
    for cv in ("conv3", "conv4"):
        p[cv], s[cv] = _linear_unit(kh, cv, tkh_p[cv], tkh_s.get(cv))
    p["final_class"] = _dense(kh, "final_class")
    p["final_bn"], s["final_bn"] = _bn(kh, "bn")

    params = {"keep_high": p}
    stats = {"keep_high": s}
    for i in (1, 2):
        params[f"fc{i}"] = _dense(sd, f"fc{i}")
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"bn{i}")
    params["fc3"] = _dense(sd, "fc3")

    report = {"skipped_torch_keys": sorted(set(tensors) - used)}
    return {"params": params, "batch_stats": stats}, report


def import_partseg_state_dict(ckpt: Any, template_variables: Any) -> Tuple[dict, dict]:
    """Reference part-seg ``get_model`` state dict -> MarkovPartSeg variables."""
    tensors = _normalize_state_dict(ckpt)
    used: set = set()
    sd = _SD(tensors, used)
    tp = template_variables["params"]
    ts = template_variables.get("batch_stats", {})

    kh = sd.child("keepHigh")
    tkh_p, tkh_s = tp["keep_high"], ts.get("keep_high", {})
    p, s = {}, {}
    for name in tkh_p:
        t_p, t_s = tkh_p[name], tkh_s.get(name)
        if name.startswith("la"):
            p[name], s[name] = _localmerge(
                kh, name, t_p, t_s, feature_trans_name="feature_Trans1"
            )
        elif name.startswith("fuse"):
            fm = kh.child(name)
            fp, fs = {}, {}
            for conv in t_p:
                fp[conv], cs = _linear_unit(fm, conv, t_p[conv], (t_s or {}).get(conv))
                if cs:
                    fs[conv] = cs
            p[name], s[name] = fp, fs
        else:  # up_conv1-4, mlp, conv5, conv7
            p[name], s[name] = _linear_unit(kh, name, t_p, t_s)

    params = {"keep_high": p}
    stats = {"keep_high": s}
    for name in ("conv8", "conv9", "conv10"):
        params[name], stats[name] = _linear_unit(sd, name, tp[name], ts.get(name))
    params["conv11"] = _dense(sd, "conv11")

    report = {"skipped_torch_keys": sorted(set(tensors) - used)}
    return {"params": params, "batch_stats": stats}, report


def import_reference_checkpoint(
    path: str, task: str, template_variables: Any, allow_pickle: bool = False
):
    """Load a reference ``best_model.pth`` and map it. task: 'cls'|'partseg'.

    Loads with ``weights_only=True``: the reference payload is a plain dict of
    tensors + ints (tool/train_cls_scanobjectnn.py:295-304) and needs no
    unpickling. Checkpoints are third-party files — full pickle loading is
    arbitrary code execution and only happens behind an explicit
    ``allow_pickle=True`` opt-in, with a warning.
    """
    import torch

    if allow_pickle:
        import warnings

        warnings.warn(
            "allow_pickle=True executes arbitrary code embedded in the "
            "checkpoint; only use on checkpoints you trust.",
            stacklevel=2,
        )
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    else:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    fn = {"cls": import_cls_state_dict, "partseg": import_partseg_state_dict}[task]
    return fn(ckpt, template_variables)
