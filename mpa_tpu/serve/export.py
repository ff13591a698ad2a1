"""AOT inference export: serialize a jitted eval function to StableHLO.

The reference has no deployment story — evaluation means re-running the
training-era torch module inside `tool/test_*.py` (SURVEY.md §2.7). The
TPU-native equivalent is ahead-of-time export: `jax.export` captures the
fully traced + shape-specialized inference computation (model apply in eval
mode, params/batch_stats baked in as constants or kept as arguments) as a
portable StableHLO artifact that any later JAX process — CPU dev box or TPU
serving host — can deserialize and call without the model code, with
stability guarantees across JAX versions (jax.export's compatibility
window).

Artifact layout: a single file, ``<path>`` = serialized jax.export bytes,
plus ``<path>.json`` manifest (model name, input shapes/dtypes, platforms)
for tooling and humans.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Optional, Sequence

import jax
from jax import export as jexport


def export_inference(
    model,
    params: Any,
    batch_stats: Any,
    example_input: Any,
    *,
    model_kwargs: Optional[dict] = None,
    platforms: Optional[Sequence[str]] = None,
):
    """Trace + export ``model.apply(..., train=False)`` with weights baked in.

    Args:
      model: flax module with ``__call__(inputs, *, train)``.
      params / batch_stats: trained variables (pytrees).
      example_input: pytree of arrays fixing input shapes/dtypes (the batch
        dim is exported as-is; export one artifact per serving batch size).
      model_kwargs: extra static kwargs for apply (e.g. {"rng": None}).
      platforms: lowering platforms, e.g. ("tpu",) or ("cpu", "tpu").
        Default: the current backend.

    Returns the jax.export Exported object (call ``.serialize()`` or use
    ``save_exported``).
    """
    kw = dict(model_kwargs or {})
    variables = {"params": params, "batch_stats": batch_stats or {}}

    def infer(inputs):
        return model.apply(variables, inputs, train=False, **kw)

    fn = jax.jit(infer)
    if platforms is not None:
        return jexport.export(fn, platforms=tuple(platforms))(example_input)
    return jexport.export(fn)(example_input)


def save_exported(exported, path: str, *, manifest: Optional[dict] = None) -> None:
    """Write the artifact + a JSON manifest next to it (atomic rename)."""
    data = exported.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    man = {
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "nr_devices": exported.nr_devices,
        **(manifest or {}),
    }
    with open(path + ".json", "w") as f:
        json.dump(man, f, indent=2)


def load_exported(path: str):
    """Deserialize an artifact saved by save_exported."""
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def load_inference(path: str) -> Callable:
    """Load an artifact and return a plain callable ``inputs -> outputs``."""
    exp = load_exported(path)

    def infer(inputs):
        return exp.call(inputs)

    return infer
