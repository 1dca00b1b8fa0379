"""Test harness config: force an 8-device virtual CPU mesh.

SURVEY.md §4: multi-chip correctness is tested on a single host via
``--xla_force_host_platform_device_count=8`` — the same mesh/shard_map code
paths as real v5e-8, no TPU required. Pallas kernels auto-switch to
interpreter mode off-TPU (see ops/scoring.py).

Must run before any ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon environment pins JAX_PLATFORMS=axon via a site hook that wins over
# the env var; override through the config API (must happen pre-backend-init).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
