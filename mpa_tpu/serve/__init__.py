"""Deployment/serving: AOT export of inference functions as portable
StableHLO artifacts (jax.export)."""

from mpa_tpu.serve.export import (  # noqa: F401
    export_inference,
    load_inference,
    save_exported,
    load_exported,
)
