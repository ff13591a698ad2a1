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

# Persistent compilation cache: the suite's wall time is dominated by XLA:CPU
# compiles of the model-level tests (the f64 multi-device parity ones
# especially); caching them makes re-runs several times faster. Keyed by HLO
# hash, so code changes invalidate naturally.
_cache_dir = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_compilation_cache"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
