"""Jitted init/apply helpers for tests.

Flax's un-jitted ``model.init``/``model.apply`` run the forward eagerly,
dispatching thousands of individual XLA:CPU ops — ~30s+ for the part-seg
graph even on a warm machine. One traced compile replaces them, and the
backend compile is persistent-cached across suite runs (tests/conftest.py),
so repeat runs pay only the trace.
"""

import jax


def jit_init(model, rngs, x, **kwargs):
    return jax.jit(lambda r, a: model.init(r, a, **kwargs))(rngs, x)


def jit_apply(model, variables, x, **kwargs):
    return jax.jit(lambda v, a: model.apply(v, a, **kwargs))(variables, x)
