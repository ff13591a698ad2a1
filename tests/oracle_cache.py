"""Frozen torch-oracle fixtures.

Round 1 recomputed every reference-parity oracle (torch forward/backward of
the reference modules from /root/reference) on each test run — ~27 min of
suite wall time on the single CPU core. This cache freezes each oracle's
inputs / transplanted variables / outputs / gradients into a committed
``tests/fixtures/<name>.npz`` the first time it is computed; afterwards the
parity tests load the fixture and never import torch.

These fixtures double as the repo's layer-G golden artifacts (SURVEY.md §1 G):
a reviewer can regenerate them against /root/reference with
``MPA_REGEN_ORACLES=1 python -m pytest tests/ -k parity`` and diff.

Protocol:
  fx = oracle("some_name", builder)
where ``builder()`` returns a (possibly nested) dict of numpy-convertible
arrays. The returned value is always the flat {"a/b/c": np.ndarray} mapping;
use :func:`subtree` to pull out a nested subtree (e.g. a flax variable dict).

- Fixture exists and MPA_REGEN_ORACLES unset -> load, builder never runs
  (torch not required).
- Otherwise -> builder runs (requires torch + /root/reference), result is
  saved compressed and returned.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Dict, Mapping

import numpy as np

FIXTURE_DIR = Path(__file__).resolve().parent / "fixtures"
REGEN = os.environ.get("MPA_REGEN_ORACLES", "") not in ("", "0")

_SCALAR_KINDS = ("f", "i", "u", "b")


def _flatten(tree: Mapping, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(_flatten(v, key))
        else:
            arr = np.asarray(v)
            if arr.dtype.kind not in _SCALAR_KINDS:
                raise TypeError(f"fixture leaf {key!r} has dtype {arr.dtype}")
            out[key] = arr
    return out


def oracle(name: str, builder: Callable[[], Mapping]) -> Dict[str, np.ndarray]:
    """Return the flat fixture mapping for ``name``, computing it via
    ``builder`` only when the committed npz is absent (or regen is forced)."""
    path = FIXTURE_DIR / f"{name}.npz"
    if path.exists() and not REGEN:
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    flat = _flatten(builder())
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.stem + ".tmp.npz")  # savez appends .npz otherwise
    np.savez_compressed(tmp, **flat)
    os.replace(tmp, path)
    return flat


def subtree(flat: Mapping[str, np.ndarray], prefix: str):
    """Rebuild the nested dict under ``prefix`` from a flat fixture mapping.

    ``subtree(fx, "variables")`` -> the nested flax variable tree that was
    stored as ``variables/params/...`` keys. Raises KeyError if nothing
    matches.
    """
    pfx = prefix + "/"
    nested: Dict = {}
    found = False
    for key, val in flat.items():
        if key == prefix:
            return val
        if not key.startswith(pfx):
            continue
        found = True
        node = nested
        parts = key[len(pfx):].split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    if not found:
        raise KeyError(f"no fixture keys under {prefix!r}")
    return nested
