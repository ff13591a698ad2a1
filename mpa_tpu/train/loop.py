"""Jitted train/eval steps and the train state.

Replaces the reference's imperative single-GPU epoch loop
(tool/train_cls_scanobjectnn.py:233-269) with a functional, donate-buffer,
mesh-shardable step: params/opt-state replicated, batch sharded over the
``data`` axis; BatchNorm statistics reduce over the *global* batch because XLA
sees the whole sharded array inside one jit (cross-replica BN for free).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_optimizer(
    kind: str,
    learning_rate: Callable | float,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """torch-matching optimizers.

    'adam-l2': Adam with L2 folded into the gradient BEFORE the moments —
    torch's ``Adam(weight_decay=...)`` semantics (reference cls trainer,
    tool/train_cls_scanobjectnn.py:205-211), NOT decoupled AdamW.
    'sgd': heavy-ball momentum with the same in-gradient L2 (reference
    part-seg trainer, tool/train_partseg.py:148-153).
    """
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if kind == "adam-l2":
        parts.append(optax.scale_by_adam())
    elif kind == "sgd":
        parts.append(optax.trace(decay=momentum))
    else:
        raise ValueError(f"unknown optimizer {kind}")
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def create_train_state(
    model,
    rng: jax.Array,
    example_input: jnp.ndarray,
    tx: optax.GradientTransformation,
) -> TrainState:
    # Jit the init: flax otherwise runs the whole forward eagerly, dispatching
    # thousands of individual ops — minutes of latency on a tunneled TPU.
    init_fn = jax.jit(lambda r, x: model.init({"params": r}, x, train=False))
    variables = init_fn(rng, example_input)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
    )


def make_train_step(loss_fn: Callable, *, model_kwargs: Optional[dict] = None):
    """Build a jittable train step.

    loss_fn(model_out, labels) -> scalar. The step threads per-step-derived
    'dropout'/'augment' rngs (fold_in of the step counter, so one key drives
    the whole run deterministically).
    """
    mk = model_kwargs or {}

    def train_step(state: TrainState, points, labels, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {
            "dropout": jax.random.fold_in(step_rng, 0),
            "augment": jax.random.fold_in(step_rng, 1),
        }

        def loss_wrapped(params):
            out, new_state = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                points,
                train=True,
                rngs=rngs,
                mutable=["batch_stats"],
                **mk,
            )
            return loss_fn(out, labels), new_state

        (loss, new_model_state), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True
        )(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=new_model_state["batch_stats"]
        )
        return state, loss

    return train_step


def make_eval_step(*, model_kwargs: Optional[dict] = None):
    mk = model_kwargs or {}

    def eval_step(state: TrainState, points):
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            points,
            train=False,
            **mk,
        )

    return eval_step
