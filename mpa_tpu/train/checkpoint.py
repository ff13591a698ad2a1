"""Orbax checkpointing with a best-metric policy.

Reference semantics (done right): the reference torch.saves
``{epoch, metrics, model_state_dict, optimizer_state_dict}`` on new-best
metric and on resume restores weights + start_epoch but silently DROPS the
optimizer state (tool/train_cls_scanobjectnn.py:192-198 — flagged quirk,
SURVEY.md §5). Here the full train state (params + opt state + batch stats +
step) round-trips; ``restore_optimizer=False`` reproduces the quirk when
strict parity is wanted.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class BestCheckpointer:
    """Keeps the best checkpoint by a scalar metric under ``directory``."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.best_metric: Optional[float] = None

    def _path(self) -> str:
        return os.path.join(self.directory, "best")

    def save_if_best(self, state: Any, metric: float, extra: Optional[dict] = None) -> bool:
        if self.best_metric is not None and metric <= self.best_metric:
            return False
        self.best_metric = metric
        payload = {"state": state, "metric": metric}
        if extra:
            payload["extra"] = extra
        path = self._path()
        # Crash-safe save: write the new checkpoint fully, then swap. A crash
        # at any point leaves at least one complete checkpoint on disk
        # (restore() falls back to best.new / best.old).
        import shutil

        new_path, old_path = path + ".new", path + ".old"
        for stale in (new_path, old_path):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        self._ckptr.save(new_path, payload)
        self._ckptr.wait_until_finished()
        if os.path.exists(path):
            os.rename(path, old_path)
        os.rename(new_path, path)
        if os.path.exists(old_path):
            shutil.rmtree(old_path)
        return True

    def restore(self, target_state: Any, *, restore_optimizer: bool = True):
        """Restore into the structure of ``target_state``; returns
        (state, metric) or None when no checkpoint exists."""
        path = self._path()
        if not os.path.exists(path):
            # Recover from a crash mid-swap: a complete new checkpoint is
            # preferred over the previous one.
            for fallback in (path + ".new", path + ".old"):
                if os.path.exists(fallback):
                    os.rename(fallback, path)
                    break
        if not os.path.exists(path):
            return None
        if not restore_optimizer:
            # Reference-parity resume / eval: weights only, fresh optimizer.
            # Restore WITHOUT the target template — templating the full
            # TrainState requires the stored opt_state's structure to match
            # the caller's, which fails exactly in the legitimate use case
            # (eval restores a training checkpoint with a dummy SGD tx;
            # caught by the parity runbook's dry-run rehearsal, r5).
            payload = self._ckptr.restore(path)
            st = payload["state"]
            # Raw restore skips orbax's template check, so fail fast and
            # clearly on an architecture mismatch instead of deferring to a
            # cryptic flax shape error mid-apply.
            want = jax.tree_util.tree_structure(target_state.params)
            got = jax.tree_util.tree_structure(st["params"])
            if want != got:
                raise ValueError(
                    f"checkpoint under {self.directory} holds a different "
                    f"model architecture than the target state (param tree "
                    f"mismatch):\n  checkpoint: {got}\n  target:     {want}"
                )
            for a, b in zip(
                jax.tree_util.tree_leaves(st["params"]),
                jax.tree_util.tree_leaves(target_state.params),
            ):
                if a.shape != b.shape:
                    raise ValueError(
                        f"checkpoint under {self.directory} has param shape "
                        f"{a.shape} where the target expects {b.shape} — "
                        "different model configuration"
                    )
            state = target_state.replace(
                params=st["params"],
                # BN-free models round-trip an empty subtree that orbax may
                # drop entirely from the raw payload.
                batch_stats=st.get("batch_stats", target_state.batch_stats),
                step=st["step"],
            )
        else:
            payload = self._ckptr.restore(
                path, {"state": target_state, "metric": 0.0}
            )
            state = payload["state"]
        self.best_metric = float(payload["metric"])
        return state, self.best_metric
