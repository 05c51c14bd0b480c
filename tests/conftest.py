"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Multi-device (DP / halo-exchange) code is exercised on CPU exactly as the
driver's ``dryrun_multichip`` does, per SURVEY.md §4's testing plan.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The hosted image pre-sets JAX_PLATFORMS=axon via a plugin that wins over
# the env var, so pin the platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
