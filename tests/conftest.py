"""Test configuration: force the CPU backend with 8 virtual devices.

Unit/golden tests run on CPU for determinism and speed (the real chip sits
behind a high-latency tunnel in this environment); multi-chip sharding tests
use the standard JAX trick of faking an 8-device mesh on one host.  Note the
axon sitecustomize overrides JAX_PLATFORMS, so the switch must go through
jax.config *after* import.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
