"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

The image's sitecustomize force-registers the axon TPU PJRT plugin and pins
JAX_PLATFORMS=axon, so the env-var route is dead by the time pytest starts;
``jax.config.update('jax_platforms', ...)`` still wins because the backend is
only initialized at first use.
"""

import os
import sys

# Make mpa_tpu importable without installation (zero-egress image: no pip).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
