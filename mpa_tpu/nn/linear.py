"""The basic MLP unit of every Markov block: Dense + norm + LeakyReLU(0.2).

Reference semantics: ``Linear`` (modules/repsurface_utils.py:380-404). NOTE the
reference's flag is inverted — ``bn=True`` selects LayerNorm and ``bn=False``
selects BatchNorm1d-over-channels; every live Markov block passes ``bn=False``
(BatchNorm). Here that is an explicit ``norm`` field; default 'batch' matches
the live configuration.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class LinearUnit(nn.Module):
    """Dense -> {BatchNorm | LayerNorm | none} -> optional LeakyReLU(0.2).

    BatchNorm statistics reduce over every non-channel axis, matching the
    reference's BatchNorm1d applied to ``[B, C, N]`` (stats over batch and
    points). Under a data-parallel ``jit`` with a sharded batch, XLA computes
    these reductions globally — cross-replica BN comes for free.
    """

    features: int
    norm: Optional[str] = "batch"  # 'batch' | 'layer' | None
    act: bool = True
    dtype: Any = None  # compute dtype (None = infer/fp32); norms stay fp32

    @nn.compact
    def __call__(self, x, *, train: bool = True, mid_op: Optional[Any] = None):
        """mid_op: optional LINEAR row-mixing map (e.g. a scatter-mean
        upsample) algebraically hoisted between the Dense matmul and its bias:
        ``act(norm(mid_op(x @ W) + b))``. Because mid_op commutes with the
        (bias-free) matmul, this equals applying the Dense AFTER mid_op —
        but runs the matmul on the (smaller) input rows and the row-mix at
        the (narrower) output width. mid_op must map zero rows to zero and
        constant rows to that constant or zero (scatter-mean does: unclaimed
        slots are zero, claimed slots average) so the bias lands exactly where
        the unhoisted form puts it."""
        dense = nn.Dense(self.features, dtype=self.dtype, name="linear")
        if mid_op is None:
            x = dense(x)
        else:
            # dense(0) == bias, shared params; y - b == x @ W exactly up to
            # one rounding of the subtraction.
            b = dense(jnp.zeros((1,) * (x.ndim - 1) + (x.shape[-1],), x.dtype))
            x = mid_op(dense(x) - b) + b
        if self.norm == "layer":
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        elif self.norm == "batch":
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="norm"
            )(x)
        elif self.norm is not None:
            raise ValueError(f"unknown norm: {self.norm}")
        if self.act:
            x = jax.nn.leaky_relu(x, negative_slope=0.2)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return x
